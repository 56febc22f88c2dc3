"""Multi-head anchor BEV head (reference pcdet/models/dense_heads/
anchor_head_multi.py: SingleHead :9-148, AnchorHeadMulti :151-373) —
the CBGS nuScenes head: a shared 3x3 conv, then one sub-head per class
group, each with its own cls branch and per-component regression
branches (SEPARATE_REG_CONFIG REG_LIST, e.g. reg/height/size/angle/velo).

TPU-first rebuild: every sub-head is a stack of dense 3x3 NHWC
convolutions (MXU-shaped); the per-head anchor layout is anchor-major
([A_head, H, W] flattened), matching the reference's use_multihead
permute (anchor_head_multi.py:122-129); assignment/matching reuses the
static-shape machinery of AnchorHeadSingle per head (per-class IoU
matching is head-local by construction, so per-head assignment equals
the reference's global pass), with the loss normalizer global across
heads like the reference (pos_normalizer over the full anchor axis,
:269-272).  Losses: sigmoid focal cls with pos/neg class weights
(:245-263), WeightedL1 with code weights for the box residuals.
Per-scene forward; batch via vmap.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import nms as nms_mod
from ...core.module import Ctx, Params, apply_bn, init_bn
from ...utils import loss_utils as L
from ..backbones_2d.base_bev_backbone import _conv2d, _init_conv2d
from .anchor_head import ResidualCoder, bev_iou, generate_anchors, \
    limit_period as _limit_period


class AnchorHeadMulti:
    def __init__(self, model_cfg, num_class: int, class_names=None,
                 grid_size=None, point_cloud_range=None,
                 input_channels=None, **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = num_class
        self.class_names = list(class_names or
                                [a["class_name"] for a in
                                 c.ANCHOR_GENERATOR_CONFIG])
        self.anchor_cfgs = {a["class_name"]: dict(a) for a in
                            c.ANCHOR_GENERATOR_CONFIG}
        self.grid_size = list(grid_size)
        self.pc_range = list(point_cloud_range)
        self.in_ch = int(c.get("IN_CHANNELS", input_channels or 512))
        self.shared_ch = int(c.get("SHARED_CONV_NUM_FILTER", 64))
        tac = c.get("TARGET_ASSIGNER_CONFIG", {})
        bc = dict(tac.get("BOX_CODER_CONFIG",
                          c.get("BOX_CODER_CONFIG", {})) or {})
        self.coder = ResidualCoder(
            int(bc.get("code_size", 7)),
            bool(bc.get("encode_angle_by_sincos", False)))
        src = c.get("SEPARATE_REG_CONFIG", None)
        self.separate_reg = src is not None
        self.reg_list: List[Tuple[str, int]] = []
        if self.separate_reg:
            for spec in src.REG_LIST:
                name, ch = str(spec).split(":")
                self.reg_list.append((name, int(ch)))
            assert sum(ch for _, ch in self.reg_list) == \
                self.coder.code_size
            self.n_middle = int(src.get("NUM_MIDDLE_CONV", 1))
            self.mid_ch = int(src.get("NUM_MIDDLE_FILTER", 64))
        # direction classifier (second_multihead.yaml; SingleHead
        # conv_dir_cls, anchor_head_multi.py:60-66)
        self.use_dir = bool(c.get("USE_DIRECTION_CLASSIFIER", False))
        self.dir_offset = float(c.get("DIR_OFFSET", 0.78539))
        self.dir_limit_offset = float(c.get("DIR_LIMIT_OFFSET", 0.0))
        self.num_dir_bins = int(c.get("NUM_DIR_BINS", 2))

        # ---- per-head anchor tables (anchor-major flat layout) --------
        self.heads = []
        for hc in c.RPN_HEAD_CFGS:
            names = list(hc["HEAD_CLS_NAME"])
            cfgs = [self.anchor_cfgs[n] for n in names]
            grids = generate_anchors(cfgs, self.grid_size, self.pc_range)
            if len({g.shape[:2] for g in grids}) != 1:
                raise ValueError("head classes must share a stride")
            anchors, acls, mt, ut = [], [], [], []
            for n, g in zip(names, grids):
                a_cls = g.shape[2]
                # [ny, nx, a_cls, 7] -> [a_cls, ny, nx, 7]: anchor-major
                anchors.append(np.transpose(g, (2, 0, 1, 3)
                                            ).reshape(-1, 7))
                gid = self.class_names.index(n)
                cnt = a_cls * g.shape[0] * g.shape[1]
                acls += [gid] * cnt
                mt += [float(self.anchor_cfgs[n]["matched_threshold"])] \
                    * cnt
                ut += [float(self.anchor_cfgs[n]["unmatched_threshold"])] \
                    * cnt
            anc = np.concatenate(anchors, 0).astype(np.float32)
            if self.coder.box_dim > 7:
                anc = np.concatenate(
                    [anc, np.zeros((len(anc), self.coder.box_dim - 7),
                                   np.float32)], axis=1)
            self.heads.append(dict(
                names=names,
                class_ids=[self.class_names.index(n) for n in names],
                n_anchors_per_loc=sum(g.shape[2] for g in grids),
                hw=grids[0].shape[:2],
                anchors=anc,
                anchor_cls=np.asarray(acls, np.int32),
                matched=np.asarray(mt, np.float32),
                unmatched=np.asarray(ut, np.float32)))

        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["cls_weight"])
        self.w_loc = float(lw["loc_weight"])
        self.w_pos = float(lw.get("pos_cls_weight", 1.0))
        self.w_neg = float(lw.get("neg_cls_weight", 1.0))
        self.w_dir = float(lw.get("dir_weight", 0.2))
        self.code_weights = [float(x) for x in lw["code_weights"]]
        pp = kwargs.get("post_cfg", c.get("POST_PROCESSING", None))
        self.nms_cfg = (pp or c).get("NMS_CONFIG", c.get("NMS_CONFIG",
                                                         {}))
        self.score_thresh = float((pp or {}).get("SCORE_THRESH",
                                                 c.get("SCORE_THRESH",
                                                       0.1)))
        self.max_out = int(c.get("MAX_OUT", 512))

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "dense_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 4 + len(self.heads) *
                                  (3 + len(self.reg_list)) *
                                  (getattr(self, "n_middle", 0) + 2)))
        _init_conv2d(P, next(r), prefix + ".shared_conv", 3,
                     self.in_ch, self.shared_ch)
        init_bn(P, S, prefix + ".shared_conv.bn", self.shared_ch)

        def branch(path, cout, bias_init=0.0):
            cin = self.shared_ch
            for k in range(self.n_middle):
                _init_conv2d(P, next(r), f"{path}.m{k}", 3, cin,
                             self.mid_ch)
                init_bn(P, S, f"{path}.m{k}.bn", self.mid_ch)
                cin = self.mid_ch
            _init_conv2d(P, next(r), f"{path}.out", 3, cin, cout)
            P[f"{path}.out.bias"] = jnp.full((cout,), bias_init)

        def conv1x1(path, cout, bias_init=0.0, scale=0.01):
            P[f"{path}.weight"] = jax.random.normal(
                next(r), (self.shared_ch, cout)) * scale
            P[f"{path}.bias"] = jnp.full((cout,), bias_init)

        for hi, h in enumerate(self.heads):
            A = h["n_anchors_per_loc"]
            K = len(h["names"])
            if self.separate_reg:
                branch(f"{prefix}.head{hi}.cls", A * K,
                       -math.log((1 - 0.01) / 0.01))
                for name, ch in self.reg_list:
                    branch(f"{prefix}.head{hi}.{name}", A * ch)
            else:
                # SingleHead without separate reg: plain 1x1 cls/box
                # convs (anchor_head_multi.py:67-79)
                conv1x1(f"{prefix}.head{hi}.cls", A * K,
                        -math.log((1 - 0.01) / 0.01))
                conv1x1(f"{prefix}.head{hi}.box",
                        A * self.coder.code_size, scale=0.001)
            if self.use_dir:
                conv1x1(f"{prefix}.head{hi}.dir", A * self.num_dir_bins)
        return P, S

    def _branch(self, P, S, ctx, path, x):
        for k in range(self.n_middle):
            x = _conv2d(x, P[f"{path}.m{k}.weight"])
            H, W, C = x.shape
            x = apply_bn(P, S, ctx, f"{path}.m{k}.bn", x.reshape(-1, C),
                         jnp.ones(H * W, bool), momentum=0.01,
                         eps=1e-3).reshape(H, W, C)
            x = jnp.maximum(x, 0.0)
        return _conv2d(x, P[f"{path}.out.weight"]) + \
            P[f"{path}.out.bias"]

    @staticmethod
    def _anchor_major(x, A, C):
        """[H, W, A*C] conv output -> flat [A*H*W, C] (anchor-major,
        matching the reference's use_multihead permute)."""
        H, W = x.shape[:2]
        return x.reshape(H * W, A, C).transpose(1, 0, 2).reshape(-1, C)

    def forward(self, P, S, ctx: Ctx, bev, prefix: str = "dense_head"
                ) -> Dict:
        """bev [H, W, C] -> per-head flat predictions."""
        x = _conv2d(bev, P[prefix + ".shared_conv.weight"])
        H, W, C = x.shape
        x = apply_bn(P, S, ctx, prefix + ".shared_conv.bn",
                     x.reshape(-1, C), jnp.ones(H * W, bool),
                     momentum=0.01, eps=1e-3).reshape(H, W, C)
        x = jnp.maximum(x, 0.0)
        out: Dict = {}
        flat = x.reshape(-1, x.shape[-1])
        for hi, h in enumerate(self.heads):
            A = h["n_anchors_per_loc"]
            K = len(h["names"])
            if self.separate_reg:
                cls = self._branch(P, S, ctx, f"{prefix}.head{hi}.cls", x)
                out[f"cls_preds_{hi}"] = self._anchor_major(cls, A, K)
                regs = []
                for name, ch in self.reg_list:
                    rmap = self._branch(P, S, ctx,
                                        f"{prefix}.head{hi}.{name}", x)
                    regs.append(self._anchor_major(rmap, A, ch))
                out[f"box_preds_{hi}"] = jnp.concatenate(regs, axis=-1)
            else:
                cls = flat @ P[f"{prefix}.head{hi}.cls.weight"] + \
                    P[f"{prefix}.head{hi}.cls.bias"]
                box = flat @ P[f"{prefix}.head{hi}.box.weight"] + \
                    P[f"{prefix}.head{hi}.box.bias"]
                out[f"cls_preds_{hi}"] = self._anchor_major(
                    cls.reshape(*x.shape[:2], -1), A, K)
                out[f"box_preds_{hi}"] = self._anchor_major(
                    box.reshape(*x.shape[:2], -1), A,
                    self.coder.code_size)
            if self.use_dir:
                d = flat @ P[f"{prefix}.head{hi}.dir.weight"] + \
                    P[f"{prefix}.head{hi}.dir.bias"]
                out[f"dir_preds_{hi}"] = self._anchor_major(
                    d.reshape(*x.shape[:2], -1), A, self.num_dir_bins)
        return out

    # ------------------------------------------------------------------
    def _assign_head(self, h, gt_boxes, gt_labels, gt_valid):
        """Per-head static-shape assignment (same matching rule as
        AnchorHeadSingle.assign_targets; class thresholds per anchor)."""
        anchors = jnp.asarray(h["anchors"])
        acls = jnp.asarray(h["anchor_cls"])
        iou = bev_iou(anchors, gt_boxes)
        same = (acls[:, None] == gt_labels[None, :]) & gt_valid[None, :]
        iou = jnp.where(same, iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        gt_best_anchor = jnp.argmax(iou, axis=0)
        gt_best_iou = jnp.max(iou, axis=0)
        forced = jnp.zeros(anchors.shape[0], bool).at[gt_best_anchor].set(
            gt_valid & (gt_best_iou > 0))
        pos = (best_iou >= jnp.asarray(h["matched"])) | forced
        neg = best_iou < jnp.asarray(h["unmatched"])
        labels = jnp.where(pos, gt_labels[best_gt] + 1,
                           jnp.where(neg, 0, -1))
        tgt = self.coder.encode(gt_boxes[best_gt], anchors)
        tgt = jnp.where(pos[:, None], tgt, 0.0)
        return labels, tgt, pos.astype(jnp.float32)

    def loss(self, outs: Dict, gt_boxes, gt_labels, gt_valid):
        """Batched (leading scene axis).  Global pos normalizer across
        heads (reference :269-272), per-head focal cls (head-local class
        columns, :282-296) + WeightedL1 reg."""
        B = gt_boxes.shape[0]
        per_head = [jax.vmap(lambda b, l, v, h=h: self._assign_head(
            h, b, l, v))(gt_boxes, gt_labels, gt_valid)
            for h in self.heads]
        pos_total = sum(jnp.sum(rw, axis=1) for _, _, rw in per_head)
        pos_norm = jnp.maximum(pos_total, 1.0)[:, None]    # [B, 1]

        cls_total = 0.0
        loc_total = 0.0
        dir_total = 0.0
        for hi, (h, (labels, tgt, reg_w)) in enumerate(
                zip(self.heads, per_head)):
            labels = jax.lax.stop_gradient(labels)
            tgt = jax.lax.stop_gradient(tgt)
            cls_w = jnp.where(labels > 0, self.w_pos,
                              jnp.where(labels == 0, self.w_neg, 0.0)) \
                / pos_norm
            # head-local one-hot columns: global label -> position in
            # this head's class list (reference c_idx slicing :285-288)
            cids = jnp.asarray(h["class_ids"], jnp.int32)
            onehot = ((labels[..., None] - 1) == cids[None, None, :]
                      ).astype(jnp.float32)
            cls_loss = jnp.sum(L.sigmoid_focal_loss(
                outs[f"cls_preds_{hi}"], onehot, weight=cls_w)) / B
            # sin-difference angle encoding when the coder keeps a raw
            # angle residual (anchor_head_template.py:117-131)
            bp, bt = outs[f"box_preds_{hi}"], tgt
            if not self.coder.sincos:
                sin_p = jnp.sin(bp[..., 6]) * jnp.cos(bt[..., 6])
                sin_t = jnp.cos(bp[..., 6]) * jnp.sin(bt[..., 6])
                bp = bp.at[..., 6].set(sin_p)
                bt = bt.at[..., 6].set(sin_t)
            loc = L.weighted_l1(bp, bt, weights=reg_w / pos_norm,
                                code_weights=self.code_weights)
            cls_total = cls_total + cls_loss * self.w_cls
            loc_total = loc_total + jnp.sum(loc) / B * self.w_loc
            if self.use_dir and f"dir_preds_{hi}" in outs:
                anchors = jnp.asarray(h["anchors"])
                rot_gt = tgt[..., 6] + anchors[None, :, 6] \
                    if not self.coder.sincos else anchors[None, :, 6]
                offs = _limit_period(rot_gt - self.dir_offset, 0,
                                     2 * math.pi)
                dir_t = jnp.clip(
                    (offs / (2 * math.pi / self.num_dir_bins))
                    .astype(jnp.int32), 0, self.num_dir_bins - 1)
                dl = L.cross_entropy_with_logits(
                    outs[f"dir_preds_{hi}"], dir_t)
                dir_total = dir_total + \
                    jnp.sum(dl * reg_w / pos_norm) / B * self.w_dir
        total = cls_total + loc_total + dir_total
        tb = dict(rpn_loss_cls=cls_total, rpn_loss_loc=loc_total,
                  rpn_loss=total)
        if self.use_dir:
            tb["rpn_loss_dir"] = dir_total
        return total, tb

    # ------------------------------------------------------------------
    def generate_predicted_boxes(self, outs: Dict):
        """Per scene: decode every head, concatenate, multi-class NMS
        (cbgs POST_PROCESSING.NMS_CONFIG MULTI_CLASSES_NMS=True)."""
        all_boxes, all_scores = [], []
        for hi, h in enumerate(self.heads):
            anchors = jnp.asarray(h["anchors"])
            boxes = self.coder.decode(outs[f"box_preds_{hi}"], anchors)
            if self.use_dir and f"dir_preds_{hi}" in outs:
                dir_lab = jnp.argmax(outs[f"dir_preds_{hi}"], axis=-1)
                period = 2 * math.pi / self.num_dir_bins
                rot = _limit_period(boxes[..., 6] - self.dir_offset,
                                    self.dir_limit_offset, period)
                boxes = boxes.at[..., 6].set(
                    rot + self.dir_offset + period * dir_lab)
            sc = jax.nn.sigmoid(outs[f"cls_preds_{hi}"])   # [Ah, Kh]
            # scatter head-local class columns into the global class axis
            full = jnp.zeros((sc.shape[0], self.num_class), sc.dtype)
            for ci, gid in enumerate(h["class_ids"]):
                full = full.at[:, gid].set(sc[:, ci])
            all_boxes.append(boxes)
            all_scores.append(full)
        boxes = jnp.concatenate(all_boxes, 0)
        scores = jnp.concatenate(all_scores, 0)
        nc = self.nms_cfg or {}
        pre = int(nc.get("NMS_PRE_MAXSIZE", 1024))
        post = int(nc.get("NMS_POST_MAXSIZE", self.max_out))
        out_boxes, out_scores, out_labels, ok = nms_mod.multiclass_nms(
            boxes, scores, jnp.ones(boxes.shape[0], bool),
            self.score_thresh, float(nc.get("NMS_THRESH", 0.2)),
            rotated=True, per_cls_cap=min(pre, boxes.shape[0]),
            out_cap=post, flip_heading_for_iou=False)
        return out_boxes, out_scores, out_labels, ok
