"""PointRCNNHead (reference pcdet/models/roi_heads/pointrcnn_head.py:
10-181): canonical RoI point pooling (roipoint_pool3d) + xyz-up/merge
1x1 convs + a per-roi PointNet SA encoder + cls/reg FCs.

TPU-native per-scene design: grouping/FPS index math is vmapped over
rois (pure ops), while every MLP/BN applies on the flattened
[R * points, C] tensor so BatchNorm statistics span all rois like the
reference's Conv2d+BN2d stacks."""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.geometry import rotate_points_along_z
from ...core.module import (Ctx, Params, apply_bn, init_bn, init_linear)
from ...core.pointnet2 import farthest_point_sample, query_and_group
from ...core.roi_pools import roipoint_pool3d
from ..dense_heads.anchor_head import ResidualCoder
from ..model_utils.model_nms_utils import class_agnostic_nms
from ...utils import loss_utils as L
from .target_assigner.cagroup_proposal_target_layer import \
    ProposalTargetLayer


class PointRCNNHead:
    def __init__(self, model_cfg, num_class: int = 1, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", True) else num_class
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 128))
        self.use_bn = bool(c.get("USE_BN", False))
        self.xyz_up = [int(x) for x in c.XYZ_UP_LAYER]
        self.num_prefix = 5                  # xyz + score + depth
        sa = c.SA_CONFIG
        self.npoints = [int(n) for n in sa.NPOINTS]
        self.radii = [float(r) for r in sa.RADIUS]
        self.nsamples = [int(n) for n in sa.NSAMPLE]
        self.sa_mlps = []
        ch = self.xyz_up[-1]
        for m in sa.MLPS:
            self.sa_mlps.append([ch + 3] + [int(x) for x in m])
            ch = int(m[-1])
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.reg_fc = [int(x) for x in c.REG_FC]
        self.num_sampled = int(c.ROI_POINT_POOL.NUM_SAMPLED_POINTS)
        self.pool_extra = [float(x) for x in
                           c.ROI_POINT_POOL.POOL_EXTRA_WIDTH]
        self.depth_norm = float(c.ROI_POINT_POOL.DEPTH_NORMALIZER)
        self.coder = ResidualCoder(7)
        tc = c.TARGET_CONFIG
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=int(tc.get("ROI_PER_IMAGE", 128)),
            fg_ratio=float(tc.get("FG_RATIO", 0.5)),
            reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.55)),
            cls_fg_thresh=float(tc.get("CLS_FG_THRESH", 0.6)),
            cls_bg_thresh=float(tc.get("CLS_BG_THRESH", 0.45)),
            cls_bg_thresh_l0=float(tc.get("CLS_BG_THRESH_LO", 0.1)),
            hard_bg_ratio=float(tc.get("HARD_BG_RATIO", 0.8)))
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["rcnn_cls_weight"])
        self.w_reg = float(lw["rcnn_reg_weight"])
        self.w_corner = float(lw.get("rcnn_corner_weight", 1.0))
        self.code_weights = [float(x) for x in lw["code_weights"]]
        self.corner_loss = bool(
            c.LOSS_CONFIG.get("CORNER_LOSS_REGULARIZATION", True))
        self.nms_cfg = c.NMS_CONFIG

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "roi_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 48))
        chans = [self.num_prefix] + self.xyz_up
        for i in range(len(chans) - 1):
            init_linear(P, next(r), f"{prefix}.xyz_up_layer.{i}",
                        chans[i], chans[i + 1],
                        bias=not self.use_bn, init="kaiming")
            if self.use_bn:
                init_bn(P, S, f"{prefix}.xyz_up_layer.{i}.bn",
                        chans[i + 1])
        co = self.xyz_up[-1]
        init_linear(P, next(r), f"{prefix}.merge_down_layer", co * 2, co,
                    bias=not self.use_bn, init="kaiming")
        if self.use_bn:
            init_bn(P, S, f"{prefix}.merge_down_layer.bn", co)
        for li, mlp in enumerate(self.sa_mlps):
            for i in range(len(mlp) - 1):
                init_linear(P, next(r),
                            f"{prefix}.SA_modules.{li}.mlps.{i}",
                            mlp[i], mlp[i + 1], bias=not self.use_bn,
                            init="kaiming")
                if self.use_bn:
                    init_bn(P, S,
                            f"{prefix}.SA_modules.{li}.mlps.{i}.bn",
                            mlp[i + 1])
        ch = self.sa_mlps[-1][-1]
        for name, fcs, nout in (("cls", self.cls_fc, self.num_class),
                                ("reg", self.reg_fc,
                                 self.coder.code_size * self.num_class)):
            ci = ch
            for i, cout in enumerate(fcs):
                init_linear(P, next(r), f"{prefix}.{name}_layers.{i}",
                            ci, cout, bias=False, init="kaiming")
                init_bn(P, S, f"{prefix}.{name}_layers.{i}.bn", cout)
                ci = cout
            init_linear(P, next(r), f"{prefix}.{name}_layers.out",
                        ci, nout, bias=True, init="normal")
        return P, S

    def _mlp(self, P, S, ctx, path, x, mask, n_layers):
        """1x1-conv MLP on [..., C] with flattened BN over all rows."""
        shape = x.shape
        flat = x.reshape(-1, shape[-1])
        m = jnp.broadcast_to(mask, shape[:-1]).reshape(-1)
        for i in range(n_layers):
            flat = flat @ P[f"{path}.{i}.weight"]
            b = P.get(f"{path}.{i}.bias")
            if b is not None:
                flat = flat + b
            if self.use_bn:
                flat = apply_bn(P, S, ctx, f"{path}.{i}.bn", flat, m)
            flat = jnp.where(m[:, None], jnp.maximum(flat, 0.0), 0.0)
        return flat.reshape(shape[:-1] + (flat.shape[-1],))

    # ------------------------------------------------------------------
    def proposal_layer(self, boxes, scores, labels, valid, train: bool):
        # reference roi_head_template.proposal_layer runs under
        # torch.no_grad(); detaching also blocks the NaN backward of
        # arctan2/decode through the canonical transform.
        boxes = jax.lax.stop_gradient(boxes)
        scores = jax.lax.stop_gradient(scores)
        nc = self.nms_cfg["TRAIN" if train else "TEST"]
        b, s, sel, v = class_agnostic_nms(
            boxes, scores, valid, nc["NMS_PRE_MAXSIZE"],
            nc["NMS_POST_MAXSIZE"], float(nc["NMS_THRESH"]))
        return b, s, jnp.take(labels, sel), v

    def roipool(self, rois, roi_valid, points, pvalid, feats,
                point_scores):
        """roipool3d_gpu (pointrcnn_head.py:85-131): sample in-box
        points, concat (score, depth, feats), canonical transform."""
        depth = jnp.linalg.norm(points, axis=-1) / self.depth_norm - 0.5
        allf = jnp.concatenate(
            [jax.lax.stop_gradient(point_scores)[:, None],
             depth[:, None], feats], axis=-1)
        big = rois.at[:, 3:6].add(2 * jnp.asarray(self.pool_extra))
        pooled, empty = roipoint_pool3d(big, roi_valid, points, pvalid,
                                        allf, self.num_sampled)
        # canonical: translate + rotate into the roi frame
        xyz = pooled[..., :3] - rois[:, None, :3]
        xyz = rotate_points_along_z(xyz, -rois[:, 6])
        pooled = jnp.concatenate([xyz, pooled[..., 3:]], -1)
        return jnp.where((roi_valid & ~empty)[:, None, None], pooled, 0.0)

    def encode_rois(self, P, S, ctx: Ctx, pooled, roi_valid, prefix):
        """xyz-up + merge + per-roi SA stack -> [R, C]."""
        R, K, _ = pooled.shape
        prefix_feats = pooled[..., :self.num_prefix]
        xyz_feats = self._mlp(P, S, ctx, prefix + ".xyz_up_layer",
                              prefix_feats, roi_valid[:, None],
                              len(self.xyz_up))
        pf = pooled[..., self.num_prefix:]
        merged = jnp.concatenate([xyz_feats, pf], -1)
        merged = merged @ P[prefix + ".merge_down_layer.weight"]
        b = P.get(prefix + ".merge_down_layer.bias")
        if b is not None:
            merged = merged + b
        if self.use_bn:
            M = merged.reshape(-1, merged.shape[-1])
            M = apply_bn(P, S, ctx, prefix + ".merge_down_layer.bn", M,
                         jnp.broadcast_to(roi_valid[:, None],
                                          (R, K)).reshape(-1))
            merged = M.reshape(R, K, -1)
        merged = jnp.where(roi_valid[:, None, None],
                           jnp.maximum(merged, 0.0), 0.0)

        xyz = pooled[..., :3]
        valid = jnp.broadcast_to(roi_valid[:, None], (R, K))
        feats = merged
        for li, mlp in enumerate(self.sa_mlps):
            npoint = self.npoints[li]
            if npoint == -1:
                grouped = jnp.concatenate([xyz, feats], -1)  # [R, K', 3+C]
                h = self._mlp(P, S, ctx,
                              f"{prefix}.SA_modules.{li}.mlps",
                              grouped, valid, len(mlp) - 1)
                h = jnp.where(valid[..., None], h, -1e10)
                out = jnp.max(h, axis=1)
                return jnp.where(roi_valid[:, None],
                                 jnp.maximum(out, -1e9), 0.0)
            idx = jax.vmap(farthest_point_sample,
                           in_axes=(0, 0, None))(xyz, valid, npoint)
            new_xyz = jnp.take_along_axis(xyz, idx[..., None], axis=1)
            new_valid = jnp.take_along_axis(valid, idx, axis=1)
            grouped, _, _ = jax.vmap(
                lambda x, v, nx, nv, f: query_and_group(
                    self.radii[li], self.nsamples[li], x, v, nx, nv,
                    feats=f, use_xyz=True))(xyz, valid, new_xyz,
                                            new_valid, feats)
            h = self._mlp(P, S, ctx, f"{prefix}.SA_modules.{li}.mlps",
                          grouped, new_valid[..., None], len(mlp) - 1)
            feats = jnp.max(h, axis=2)
            feats = jnp.where(new_valid[..., None], feats, 0.0)
            xyz, valid = new_xyz, new_valid
        # unreachable when last npoint == -1
        return jnp.max(feats, axis=1)

    def _heads(self, P, S, ctx: Ctx, shared, valid, prefix):
        outs = {}
        for name, fcs in (("cls", self.cls_fc), ("reg", self.reg_fc)):
            x = shared
            for i in range(len(fcs)):
                x = x @ P[f"{prefix}.{name}_layers.{i}.weight"]
                x = apply_bn(P, S, ctx, f"{prefix}.{name}_layers.{i}.bn",
                             x, valid)
                x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
            outs[name] = x @ P[f"{prefix}.{name}_layers.out.weight"] + \
                P[f"{prefix}.{name}_layers.out.bias"]
        return outs["cls"], outs["reg"]

    # ------------------------------------------------------------------
    def forward_train(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                      roi_valid, gt_boxes, gt_labels, gt_valid, points,
                      pvalid, feats, point_scores,
                      prefix: str = "roi_head"):
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid, gt_boxes, gt_labels,
            gt_valid, flip_gt_heading=False)
        s_rois = tgt["rois"]
        s_valid = jnp.ones(s_rois.shape[0], bool)
        gt_ct = tgt["gt_of_rois"]
        roi_ry = s_rois[:, 6] % (2 * jnp.pi)
        gt_ct = gt_ct.at[:, 0:3].add(-s_rois[:, 0:3])
        gt_ct = gt_ct.at[:, 6].add(-roi_ry)
        gt_ct = rotate_points_along_z(gt_ct[:, None, :], -roi_ry)[:, 0, :]
        heading = gt_ct[:, 6] % (2 * jnp.pi)
        opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
        heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi),
                            heading)
        heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi,
                            heading)
        gt_ct = gt_ct.at[:, 6].set(
            jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2))

        pooled = self.roipool(s_rois, s_valid, points, pvalid, feats,
                              point_scores)
        shared = self.encode_rois(P, S, ctx, pooled, s_valid, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, shared, s_valid,
                                         prefix)
        return dict(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=s_rois,
                    gt_of_rois=gt_ct, gt_of_rois_src=tgt["gt_of_rois"],
                    reg_valid_mask=tgt["reg_valid_mask"],
                    rcnn_cls_labels=tgt["rcnn_cls_labels"],
                    roi_labels=tgt["roi_labels"])

    def forward_test(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                     roi_valid, points, pvalid, feats, point_scores,
                     score_thresh=0.1, nms_thresh=0.1, max_out=128,
                     prefix: str = "roi_head"):
        pooled = self.roipool(rois, roi_valid, points, pvalid, feats,
                              point_scores)
        shared = self.encode_rois(P, S, ctx, pooled, roi_valid, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, shared, roi_valid,
                                         prefix)
        boxes = self.decode_boxes(rois, rcnn_reg)
        scores = jax.nn.sigmoid(rcnn_cls[:, 0])
        b, s, sel, v = class_agnostic_nms(
            boxes, scores, roi_valid, boxes.shape[0], max_out,
            nms_thresh, score_thresh=score_thresh)
        return dict(pred_boxes=b, pred_scores=s,
                    pred_labels=jnp.take(roi_labels, sel).astype(
                        jnp.int32),
                    pred_valid=v)

    def decode_boxes(self, rois, rcnn_reg):
        local = rois[:, :7].at[:, 0:3].set(0.0)
        dec = self.coder.decode(rcnn_reg, local)
        dec = rotate_points_along_z(dec[:, None, :], rois[:, 6])[:, 0, :]
        return dec.at[:, 0:3].add(rois[:, 0:3])

    # ------------------------------------------------------------------
    def loss(self, fwd: Dict[str, jnp.ndarray]):
        """Same structure as PVRCNNHead.loss (roi_head_template)."""
        from .pvrcnn_head import PVRCNNHead
        return PVRCNNHead.loss(self, fwd)
