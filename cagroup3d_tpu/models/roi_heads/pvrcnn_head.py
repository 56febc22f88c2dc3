"""PVRCNNHead: keypoint RoI-grid pooling + shared-FC refinement
(reference pcdet/models/roi_heads/pvrcnn_head.py:8-175 +
roi_head_template.py proposal_layer :46-103 / assign_targets :104-135 /
losses :136-241).

TPU-native: per scene with static shapes.  The proposal layer is a
class-agnostic greedy NMS over the anchor head's decoded boxes (padded
to NMS_POST_MAXSIZE); RoI-grid pooling reuses the stacked SA module over
the PFE keypoints (6^3 grid points per roi); losses are BCE on
iou-interpolated labels + smooth-L1 on encoded residuals + corner loss.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import nms as nms_mod
from ...core.geometry import rotate_points_along_z
from ...core.module import (Ctx, Params, apply_bn, dropout, init_bn,
                            init_linear)
from ..backbones_3d.voxel_set_abstraction import StackSAModuleMSG
from ..dense_heads.anchor_head import ResidualCoder
from ...utils import loss_utils as L
from .target_assigner.cagroup_proposal_target_layer import \
    ProposalTargetLayer


class PVRCNNHead:
    def __init__(self, model_cfg, num_class: int = 1, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", True) else num_class
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 128))
        gp = c.ROI_GRID_POOL
        self.grid_size = int(gp.GRID_SIZE)
        if str(gp.get("NAME", "")) == "VectorPoolAggregationModuleMSG":
            # PV-RCNN++ grid pooling (pv_rcnn_plusplus.yaml ROI_GRID_POOL)
            from ..backbones_3d.vector_pool import \
                VectorPoolAggregationModuleMSG
            self.pool_layer = VectorPoolAggregationModuleMSG(self.in_ch,
                                                             gp)
        else:
            self.pool_layer = StackSAModuleMSG(
                self.in_ch, gp["POOL_RADIUS"], gp["NSAMPLE"], gp["MLPS"])
        self.shared_fc = [int(x) for x in c.SHARED_FC]
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.reg_fc = [int(x) for x in c.REG_FC]
        self.dp_ratio = float(c.get("DP_RATIO", 0.3))
        self.coder = ResidualCoder(7)
        tc = c.TARGET_CONFIG
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=int(tc.get("ROI_PER_IMAGE", 128)),
            fg_ratio=float(tc.get("FG_RATIO", 0.5)),
            reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.55)),
            cls_fg_thresh=float(tc.get("CLS_FG_THRESH", 0.75)),
            cls_bg_thresh=float(tc.get("CLS_BG_THRESH", 0.25)),
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
        r = list(jax.random.split(rng, 24))
        p, s = self.pool_layer.init(r[0], prefix + ".roi_grid_pool_layer")
        P.update(p)
        S.update(s)
        cin = self.grid_size ** 3 * self.pool_layer.num_out
        for i, cout in enumerate(self.shared_fc):
            init_linear(P, r[1 + i], f"{prefix}.shared_fc_layer.{i}",
                        cin, cout, bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.shared_fc_layer.{i}.bn", cout)
            cin = cout
        for name, fcs, nout in (("cls", self.cls_fc, self.num_class),
                                ("reg", self.reg_fc,
                                 self.coder.code_size * self.num_class)):
            ci = self.shared_fc[-1]
            for i, cout in enumerate(fcs):
                init_linear(P, r[8 + i + (8 if name == "reg" else 0)],
                            f"{prefix}.{name}_layers.{i}", ci, cout,
                            bias=False, init="kaiming")
                init_bn(P, S, f"{prefix}.{name}_layers.{i}.bn", cout)
                ci = cout
            init_linear(P, r[7 if name == "cls" else 23],
                        f"{prefix}.{name}_layers.out", ci, nout,
                        bias=True, init="normal")
        return P, S

    # ------------------------------------------------------------------
    def proposal_layer(self, boxes, scores, labels, valid, train: bool):
        """Class-agnostic NMS (roi_head_template.py:46-103): boxes [A, 7]
        decoded anchors, scores [A] max-class sigmoid, labels [A] argmax
        (0-based -> stored 1-based like the reference's roi_labels+1).
        Returns padded (rois [M, 7], roi_scores [M], roi_labels [M],
        roi_valid [M]) with M = NMS_POST_MAXSIZE."""
        nc = self.nms_cfg["TRAIN" if train else "TEST"]
        pre = int(nc["NMS_PRE_MAXSIZE"])
        post = int(nc["NMS_POST_MAXSIZE"])
        thr = float(nc["NMS_THRESH"])
        k = min(pre, boxes.shape[0])
        s, ids = jax.lax.top_k(jnp.where(valid, scores, -1.0), k)
        b, l = boxes[ids], labels[ids]
        v = s > -0.5
        keep = nms_mod.greedy_nms(b, jnp.where(v, s, -1.0), v, thr,
                                  rotated=True)
        v = v & keep
        m = min(post, k)
        so, oid = jax.lax.top_k(jnp.where(v, s, -1.0), m)
        return b[oid], so, l[oid], jnp.take(v, oid)

    # ------------------------------------------------------------------
    def get_global_grid_points(self, rois):
        """[R, 7] -> global grid points [R, G^3, 3]
        (pvrcnn_head.py:117-141)."""
        g = self.grid_size
        idx = np.stack(np.meshgrid(np.arange(g), np.arange(g),
                                   np.arange(g), indexing="ij"),
                       -1).reshape(-1, 3)
        idx = jnp.asarray(idx, jnp.float32)
        size = rois[:, None, 3:6]
        local = (idx[None] + 0.5) / g * size - size / 2
        rot = rotate_points_along_z(local, rois[:, 6])
        return rot + rois[:, None, :3]

    def roi_grid_pool(self, P, S, ctx: Ctx, rois, roi_valid, kp, kp_valid,
                      kp_feats, kp_scores, prefix):
        """Pooled [R, G^3 * C] via the stacked SA module over keypoints,
        with keypoint features weighted by the point head's foreground
        scores (pvrcnn_head.py:85)."""
        R = rois.shape[0]
        g3 = self.grid_size ** 3
        feats = kp_feats * kp_scores[:, None]
        grid = self.get_global_grid_points(rois).reshape(R * g3, 3)
        gvalid = jnp.repeat(roi_valid, g3)
        pooled = self.pool_layer(P, S, ctx, kp, kp_valid, feats, grid,
                                 gvalid, prefix + ".roi_grid_pool_layer")
        return pooled.reshape(R, g3 * pooled.shape[-1])

    def _heads(self, P, S, ctx: Ctx, pooled, valid, prefix):
        x = pooled
        for i in range(len(self.shared_fc)):
            x = x @ P[f"{prefix}.shared_fc_layer.{i}.weight"]
            x = apply_bn(P, S, ctx, f"{prefix}.shared_fc_layer.{i}.bn",
                         x, valid)
            x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = dropout(ctx, x, self.dp_ratio)
        outs = {}
        for name, fcs in (("cls", self.cls_fc), ("reg", self.reg_fc)):
            y = x
            for i in range(len(fcs)):
                y = y @ P[f"{prefix}.{name}_layers.{i}.weight"]
                y = apply_bn(P, S, ctx, f"{prefix}.{name}_layers.{i}.bn",
                             y, valid)
                y = jnp.where(valid[:, None], jnp.maximum(y, 0.0), 0.0)
            outs[name] = y @ P[f"{prefix}.{name}_layers.out.weight"] + \
                P[f"{prefix}.{name}_layers.out.bias"]
        return outs["cls"], outs["reg"]

    # ------------------------------------------------------------------
    def sample_targets(self, ctx: Ctx, rois, roi_scores, roi_labels,
                       roi_valid, gt_boxes, gt_labels, gt_valid):
        """Proposal target sampling + canonical transform
        (roi_head_template.py:104-135); split out so PV-RCNN++ can
        sample rois BEFORE its proposal-centric PFE."""
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid, gt_boxes,
            gt_labels, gt_valid, flip_gt_heading=False)
        s_rois = tgt["rois"]
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
        tgt["gt_of_rois_ct"] = gt_ct.at[:, 6].set(
            jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2))
        return tgt

    def forward_train_sampled(self, P, S, ctx: Ctx, tgt, kp, kp_valid,
                              kp_feats, kp_scores,
                              prefix: str = "roi_head"):
        """Pool + heads over already-sampled targets (see
        sample_targets)."""
        s_rois = tgt["rois"]
        s_valid = jnp.ones(s_rois.shape[0], bool)
        pooled = self.roi_grid_pool(P, S, ctx, s_rois, s_valid, kp,
                                    kp_valid, kp_feats, kp_scores, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, pooled, s_valid,
                                         prefix)
        return dict(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=s_rois,
                    gt_of_rois=tgt["gt_of_rois_ct"],
                    gt_of_rois_src=tgt["gt_of_rois"],
                    reg_valid_mask=tgt["reg_valid_mask"],
                    rcnn_cls_labels=tgt["rcnn_cls_labels"],
                    roi_labels=tgt["roi_labels"])

    def forward_train(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                      roi_valid, gt_boxes, gt_labels, gt_valid, kp,
                      kp_valid, kp_feats, kp_scores,
                      prefix: str = "roi_head"):
        """Per scene.  rois in pcdet heading (lidar frame)."""
        tgt = self.sample_targets(ctx, rois, roi_scores, roi_labels,
                                  roi_valid, gt_boxes, gt_labels,
                                  gt_valid)
        return self.forward_train_sampled(P, S, ctx, tgt, kp, kp_valid,
                                          kp_feats, kp_scores, prefix)

    def forward_test(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                     roi_valid, kp, kp_valid, kp_feats, kp_scores,
                     score_thresh=0.1, nms_thresh=0.1, max_out=128,
                     prefix: str = "roi_head"):
        pooled = self.roi_grid_pool(P, S, ctx, rois, roi_valid, kp,
                                    kp_valid, kp_feats, kp_scores, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, pooled, roi_valid,
                                         prefix)
        boxes = self.decode_boxes(rois, rcnn_reg)
        scores = jax.nn.sigmoid(rcnn_cls[:, 0])
        v = roi_valid & (scores > score_thresh)
        keep = nms_mod.greedy_nms(boxes, jnp.where(v, scores, -1.0), v,
                                  nms_thresh, rotated=True)
        v = v & keep
        m = min(max_out, boxes.shape[0])
        so, oid = jax.lax.top_k(jnp.where(v, scores, -1.0), m)
        return dict(pred_boxes=boxes[oid], pred_scores=so,
                    pred_labels=roi_labels[oid].astype(jnp.int32),
                    pred_valid=jnp.take(v, oid))

    def decode_boxes(self, rois, rcnn_reg):
        """generate_predicted_boxes (roi_head_template.py:243-268)."""
        local = rois[:, :7].at[:, 0:3].set(0.0)
        dec = self.coder.decode(rcnn_reg, local)
        dec = rotate_points_along_z(dec[:, None, :], rois[:, 6])[:, 0, :]
        return dec.at[:, 0:3].add(rois[:, 0:3])

    # ------------------------------------------------------------------
    def loss(self, fwd: Dict[str, jnp.ndarray]):
        """Batched (leading scene axis): BCE cls + smooth-L1 reg + corner
        loss (roi_head_template.py:136-241)."""
        code = 7
        B = fwd["rois"].shape[0]
        rois = fwd["rois"].reshape(-1, fwd["rois"].shape[-1])
        gt_ct = fwd["gt_of_rois"].reshape(-1, fwd["gt_of_rois"].shape[-1])
        gt_src = fwd["gt_of_rois_src"].reshape(
            -1, fwd["gt_of_rois_src"].shape[-1])
        reg = fwd["rcnn_reg"].reshape(-1, fwd["rcnn_reg"].shape[-1])
        cls = fwd["rcnn_cls"].reshape(-1)
        cls_lab = fwd["rcnn_cls_labels"].reshape(-1)
        fg = fwd["reg_valid_mask"].reshape(-1) > 0

        # cls: BCE (with logits) on iou-interpolated labels over rois
        # with a valid label (roi_head_template.py:200-218)
        cls_valid = (cls_lab >= 0).astype(jnp.float32)
        t = jnp.maximum(cls_lab, 0.0)
        bce = jnp.maximum(cls, 0) - cls * t + \
            jnp.log1p(jnp.exp(-jnp.abs(cls)))
        loss_cls = jnp.sum(bce * cls_valid) / \
            jnp.maximum(jnp.sum(cls_valid), 1.0) * self.w_cls

        anchors = rois[:, :code].at[:, 0:3].set(0.0).at[:, 6].set(0.0)
        targets = self.coder.encode(gt_ct[:, :code], anchors)
        elt = L.weighted_smooth_l1(reg, targets,
                                   code_weights=self.code_weights)
        fg_sum = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        loss_reg = jnp.sum(elt * fg[:, None]) / fg_sum * self.w_reg
        tb = dict(rcnn_loss_cls=loss_cls, rcnn_loss_reg=loss_reg)
        total = loss_cls + loss_reg
        if self.corner_loss:
            dec = self.decode_boxes(rois, reg)
            safe = jnp.asarray([0, 0, 0, 1, 1, 1, 0.0])
            decs = jnp.where(fg[:, None], dec, safe)
            gts = jnp.where(fg[:, None], gt_src[:, :7], safe)
            lc = L.get_corner_loss_lidar(decs, gts)
            loss_corner = jnp.sum(lc * fg) / fg_sum * self.w_corner
            tb["rcnn_loss_corner"] = loss_corner
            total = total + loss_corner
        tb["rcnn_loss"] = total
        return total, tb
