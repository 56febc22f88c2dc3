"""CenterHead (reference pcdet/models/dense_heads/center_head.py:11-355):
shared 3x3 conv + per-group separate heads (hm/center/center_z/dim/rot
[/vel]) on the BEV map, gaussian-heatmap targets, centernet focal +
gathered-L1 losses, top-k peak decode.

TPU-native: per-scene [H, W, C] forward, dense vectorized target
assignment (model_utils/centernet_utils.py), static-K decode + greedy
rotated NMS.  Multi-group heads (nuScenes CBGS) are a static python loop.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import nms as nms_mod
from ...core.module import Ctx, Params, apply_bn, init_bn
from ..backbones_2d.base_bev_backbone import _conv2d, _init_conv2d
from ..model_utils.centernet_utils import (draw_gaussians_dense,
                                           gaussian_radius, topk_peaks)
from ...utils import loss_utils as L


class CenterHead:
    def __init__(self, model_cfg, num_class: int, class_names=None,
                 grid_size=None, point_cloud_range=None,
                 input_channels=None, voxel_size=None, **kwargs):
        c = model_cfg
        self.cfg = c
        self.class_names = list(class_names)
        self.grid_size = [int(g) for g in grid_size]
        self.pc_range = [float(x) for x in point_cloud_range]
        self.voxel_size = [float(v) for v in c.get(
            "VOXEL_SIZE", voxel_size or [0.05, 0.05, 0.1])]
        self.in_ch = int(c.get("IN_CHANNELS", input_channels or 256))
        self.shared_ch = int(c.SHARED_CONV_CHANNEL)
        self.num_hm_conv = int(c.get("NUM_HM_CONV", 2))
        ta = c.TARGET_ASSIGNER_CONFIG
        self.fmap_stride = int(ta.FEATURE_MAP_STRIDE)
        self.num_max_objs = int(ta.get("NUM_MAX_OBJS", 500))
        self.gaussian_overlap = float(ta.get("GAUSSIAN_OVERLAP", 0.1))
        self.min_radius = int(ta.get("MIN_RADIUS", 2))
        self.head_order = list(c.SEPARATE_HEAD_CFG.HEAD_ORDER)
        self.head_dict = {k: dict(v) for k, v in
                          dict(c.SEPARATE_HEAD_CFG.HEAD_DICT).items()}
        self.code_size = sum(int(self.head_dict[h]["out_channels"])
                             for h in self.head_order)
        self.groups: List[List[str]] = [
            [x for x in names if x in self.class_names]
            for names in c.CLASS_NAMES_EACH_HEAD]
        self.group_class_ids = [
            [self.class_names.index(x) for x in g] for g in self.groups]
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["cls_weight"])
        self.w_loc = float(lw["loc_weight"])
        self.code_weights = [float(x) for x in lw["code_weights"]]
        pp = c.POST_PROCESSING
        self.score_thresh = float(pp.get("SCORE_THRESH", 0.1))
        self.post_range = [float(x) for x in
                           pp.POST_CENTER_LIMIT_RANGE]
        self.max_obj = int(pp.get("MAX_OBJ_PER_SAMPLE", 500))
        self.nms_cfg = pp.get("NMS_CONFIG", {})
        self.fmap_hw = (self.grid_size[1] // self.fmap_stride,
                        self.grid_size[0] // self.fmap_stride)

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "dense_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 256))
        _init_conv2d(P, next(r), prefix + ".shared_conv", 3, self.in_ch,
                     self.shared_ch)
        init_bn(P, S, prefix + ".shared_conv.bn", self.shared_ch)
        for gi, names in enumerate(self.groups):
            heads = dict(self.head_dict)
            heads["hm"] = dict(out_channels=len(names),
                               num_conv=self.num_hm_conv)
            for hname, hc in heads.items():
                n_conv = int(hc["num_conv"])
                cout = int(hc["out_channels"])
                for k in range(n_conv - 1):
                    path = f"{prefix}.heads.{gi}.{hname}.{k}"
                    _init_conv2d(P, next(r), path, 3, self.shared_ch,
                                 self.shared_ch)
                    init_bn(P, S, path + ".bn", self.shared_ch)
                path = f"{prefix}.heads.{gi}.{hname}.out"
                _init_conv2d(P, next(r), path, 3, self.shared_ch, cout)
                P[path + ".bias"] = jnp.full(
                    (cout,), -2.19 if hname == "hm" else 0.0)
        return P, S

    def forward(self, P, S, ctx: Ctx, bev,
                prefix: str = "dense_head") -> List[Dict]:
        """bev [H, W, C] -> per-group dicts of dense maps [H, W, c]."""
        x = _conv2d(bev, P[prefix + ".shared_conv.weight"])
        H, W, C = x.shape
        x = apply_bn(P, S, ctx, prefix + ".shared_conv.bn",
                     x.reshape(-1, C), jnp.ones(H * W, bool),
                     momentum=0.01, eps=1e-3).reshape(H, W, C)
        x = jnp.maximum(x, 0.0)
        outs = []
        for gi, names in enumerate(self.groups):
            heads = dict(self.head_dict)
            heads["hm"] = dict(out_channels=len(names),
                               num_conv=self.num_hm_conv)
            d = {}
            for hname, hc in heads.items():
                y = x
                for k in range(int(hc["num_conv"]) - 1):
                    path = f"{prefix}.heads.{gi}.{hname}.{k}"
                    y = _conv2d(y, P[path + ".weight"])
                    y = apply_bn(P, S, ctx, path + ".bn",
                                 y.reshape(-1, y.shape[-1]),
                                 jnp.ones(H * W, bool), momentum=0.01,
                                 eps=1e-3).reshape(y.shape)
                    y = jnp.maximum(y, 0.0)
                path = f"{prefix}.heads.{gi}.{hname}.out"
                d[hname] = _conv2d(y, P[path + ".weight"]) + \
                    P[path + ".bias"]
            outs.append(d)
        return outs

    # ------------------------------------------------------------------
    def assign_targets_single(self, gt_boxes, gt_labels, gt_valid):
        """Per scene, per head group: dense heatmaps + gathered reg
        targets (assign_target_of_single_head, center_head.py:103-157)."""
        Hf, Wf = self.fmap_hw
        G = gt_boxes.shape[0]
        out = []
        for gi, cls_ids in enumerate(self.group_class_ids):
            n_cls = len(cls_ids)
            ids = jnp.asarray(cls_ids, jnp.int32)
            in_group = (gt_labels[:, None] == ids[None, :])  # [G, n_cls]
            local_cls = jnp.argmax(in_group, axis=1).astype(jnp.int32)
            gvalid = jnp.any(in_group, axis=1) & gt_valid
            cx = (gt_boxes[:, 0] - self.pc_range[0]) / \
                self.voxel_size[0] / self.fmap_stride
            cy = (gt_boxes[:, 1] - self.pc_range[1]) / \
                self.voxel_size[1] / self.fmap_stride
            cx = jnp.clip(cx, 0.0, Wf - 0.5)
            cy = jnp.clip(cy, 0.0, Hf - 0.5)
            dxf = gt_boxes[:, 3] / self.voxel_size[0] / self.fmap_stride
            dyf = gt_boxes[:, 4] / self.voxel_size[1] / self.fmap_stride
            gvalid = gvalid & (dxf > 0) & (dyf > 0)
            radius = jnp.maximum(
                gaussian_radius(dyf, dxf, self.gaussian_overlap)
                .astype(jnp.int32), self.min_radius)
            hm = draw_gaussians_dense(
                jnp.stack([cx, cy], -1), radius, local_cls, gvalid,
                n_cls, (Hf, Wf))
            cxi = cx.astype(jnp.int32)
            cyi = cy.astype(jnp.int32)
            inds = cyi * Wf + cxi
            tgt = jnp.concatenate([
                (cx - cxi)[:, None], (cy - cyi)[:, None],
                gt_boxes[:, 2:3],
                jnp.log(jnp.maximum(gt_boxes[:, 3:6], 1e-6)),
                jnp.cos(gt_boxes[:, 6:7]), jnp.sin(gt_boxes[:, 6:7]),
            ], axis=-1)
            if self.code_size > 8:
                tgt = jnp.concatenate(
                    [tgt, jnp.zeros((G, self.code_size - 8))], -1)
            out.append(dict(heatmap=hm, target=tgt, inds=inds,
                            mask=gvalid))
        return out

    def loss(self, outs_b: List[Dict], gt_boxes, gt_labels, gt_valid):
        """Batched: outs_b is the per-group list with [B, H, W, c] maps."""
        tgts = jax.vmap(self.assign_targets_single)(gt_boxes, gt_labels,
                                                    gt_valid)
        total = 0.0
        tb = {}
        Hf, Wf = self.fmap_hw
        for gi in range(len(self.groups)):
            o = outs_b[gi]
            t = tgts[gi]
            hm_pred = jnp.clip(jax.nn.sigmoid(o["hm"]), 1e-4, 1 - 1e-4)
            # centernet focal expects [.., C] channel-last; target same
            hm_tgt = jnp.transpose(t["heatmap"], (0, 2, 3, 1))
            hm_loss = L.focal_loss_centernet(hm_pred, hm_tgt) * self.w_cls
            pred_maps = jnp.concatenate(
                [o[h] for h in self.head_order], axis=-1)  # [B, H, W, code]
            B = pred_maps.shape[0]
            flat = pred_maps.reshape(B, Hf * Wf, -1)
            picked = jnp.take_along_axis(
                flat, t["inds"][..., None].astype(jnp.int32), axis=1)
            m = t["mask"].astype(jnp.float32)[..., None]
            diff = jnp.abs(picked - t["target"]) * m
            num = jnp.maximum(jnp.sum(m), 1e-4)
            per_code = jnp.sum(diff, axis=(0, 1)) / num
            loc_loss = jnp.sum(
                per_code * jnp.asarray(self.code_weights[:per_code.shape[0]])
            ) * self.w_loc
            total = total + hm_loss + loc_loss
            tb[f"hm_loss_head_{gi}"] = hm_loss
            tb[f"loc_loss_head_{gi}"] = loc_loss
        tb["rpn_loss"] = total
        return total, tb

    # ------------------------------------------------------------------
    def _decode_groups(self, outs: List[Dict]):
        """Pre-NMS top-k peak decode over every head group: (boxes
        [M, 7], scores [M], labels [M], valid [M])."""
        Hf, Wf = self.fmap_hw
        K = min(self.max_obj, Hf * Wf)
        all_boxes, all_scores, all_labels, all_valid = [], [], [], []
        for gi, cls_ids in enumerate(self.group_class_ids):
            o = outs[gi]
            hm = jnp.transpose(jax.nn.sigmoid(o["hm"]), (2, 0, 1))
            scores, local_cls, pix, ys, xs = topk_peaks(hm, K)
            flat = {h: o[h].reshape(Hf * Wf, -1) for h in self.head_order}
            center = jnp.take(flat["center"], pix, axis=0)
            center_z = jnp.take(flat["center_z"], pix, axis=0)
            dim = jnp.exp(jnp.take(flat["dim"], pix, axis=0))
            rot = jnp.take(flat["rot"], pix, axis=0)
            angle = jnp.arctan2(rot[:, 1:2], rot[:, 0:1])
            xs = (xs[:, None] + center[:, 0:1]) * self.fmap_stride * \
                self.voxel_size[0] + self.pc_range[0]
            ys = (ys[:, None] + center[:, 1:2]) * self.fmap_stride * \
                self.voxel_size[1] + self.pc_range[1]
            boxes = jnp.concatenate([xs, ys, center_z, dim, angle], -1)
            pr = jnp.asarray(self.post_range)
            ok = jnp.all(boxes[:, :3] >= pr[:3], axis=1) & \
                jnp.all(boxes[:, :3] <= pr[3:], axis=1) & \
                (scores > self.score_thresh)
            labels = jnp.take(jnp.asarray(cls_ids, jnp.int32), local_cls)
            all_boxes.append(boxes)
            all_scores.append(scores)
            all_labels.append(labels)
            all_valid.append(ok)
        return (jnp.concatenate(all_boxes), jnp.concatenate(all_scores),
                jnp.concatenate(all_labels), jnp.concatenate(all_valid))

    def decoded_boxes(self, outs: List[Dict]):
        """RPN surface for two-stage detectors using CenterHead as the
        dense head (pv_rcnn_with_centerhead_rpn.yaml, voxel_rcnn_with_
        centerhead_dyn_voxel.yaml): pre-NMS (boxes [M, 7], class scores
        [M, K]) exactly like AnchorHeadSingle.decoded_boxes, so the RoI
        proposal layer (top-k + NMS) is head-agnostic."""
        boxes, scores, labels, valid = self._decode_groups(outs)
        sc = jnp.where(valid, scores, 0.0)
        full = jnp.zeros((boxes.shape[0], len(self.class_names)),
                         scores.dtype)
        full = full.at[jnp.arange(boxes.shape[0]), labels].set(sc)
        return boxes, full

    def generate_predicted_boxes(self, outs: List[Dict]):
        """Per scene: top-k peak decode per group + rotated NMS
        (decode_bbox_from_heatmap + generate_predicted_boxes,
        center_head.py:253-305)."""
        boxes, scores, labels, valid = self._decode_groups(outs)
        pre = int(self.nms_cfg.get("NMS_PRE_MAXSIZE", 1000))
        post = int(self.nms_cfg.get("NMS_POST_MAXSIZE", 83))
        thr = float(self.nms_cfg.get("NMS_THRESH", 0.2))
        k = min(pre, boxes.shape[0])
        s, ids = jax.lax.top_k(jnp.where(valid, scores, -1.0), k)
        b, l, v = boxes[ids], labels[ids], s > -0.5
        keep = nms_mod.greedy_nms(b, jnp.where(v, s, -1.0), v, thr,
                                  rotated=True)
        v = v & keep
        m = min(post, k)
        so, oid = jax.lax.top_k(jnp.where(v, s, -1.0), m)
        return b[oid], so, l[oid], jnp.take(v, oid)
