"""PartA2FCHead: RoI-aware pooling + per-RoI grid convs + FC refinement
(reference pcdet/models/roi_heads/partA2_head.py:10-224).

TPU-native: the reference converts the pooled [R, G^3] grids to one
sparse tensor and runs submanifold convs on non-empty cells; here the
pooled grids stay DENSE [R, G, G, G, C] and the subm convs become masked
``lax.conv_general_dilated`` (MXU) — inputs at empty cells are zero and
outputs at empty cells are re-masked after every conv, which reproduces
submanifold semantics exactly (absent neighbors contribute zero either
way).  Occupancy comes from max-pooling a ones channel (the reference
infers it from pooled_part.sum() != 0, partA2_head.py:185, which would
also drop occupied cells whose features happen to be all zero).

Proposal layer, target assignment, shared FC trunk, decode and losses
are inherited from PVRCNNHead (identical roi_head_template machinery).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_conv, \
    init_linear
from ...core.roi_pools import roiaware_pool3d
from .pvrcnn_head import PVRCNNHead


class PartA2FCHead(PVRCNNHead):
    def __init__(self, model_cfg, num_class: int = 1, input_channels=None,
                 **kwargs):
        c = model_cfg
        rp = c.ROI_AWARE_POOL
        self.pool_size = int(rp.POOL_SIZE)
        self.num_features = int(rp.NUM_FEATURES)
        self.c0 = self.num_features // 2
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 16))
        self.seg_thresh = float(c.get("SEG_MASK_SCORE_THRESH", 0.3))
        self.disable_part = bool(c.get("DISABLE_PART", False))

        from ..dense_heads.anchor_head import ResidualCoder
        from .target_assigner.cagroup_proposal_target_layer import \
            ProposalTargetLayer
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", True) else num_class
        self.grid_size = self.pool_size
        self.shared_fc = [int(x) for x in c.SHARED_FC]
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.reg_fc = [int(x) for x in c.REG_FC]
        self.dp_ratio = float(c.get("DP_RATIO", 0.3))
        self.coder = ResidualCoder(7)
        tc = c.TARGET_CONFIG
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=int(tc.get("ROI_PER_IMAGE", 128)),
            fg_ratio=float(tc.get("FG_RATIO", 0.5)),
            reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.65)),
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
        r = iter(jax.random.split(rng, 32))
        for name, cins in (("conv_part", (4, 64)),
                           ("conv_rpn", (self.in_ch, 64))):
            couts = (64, self.c0)
            for i, (ci, co) in enumerate(zip(cins, couts)):
                init_conv(P, next(r), f"{prefix}.{name}.{i}.0", 3, ci, co,
                          init="kaiming")
                init_bn(P, S, f"{prefix}.{name}.{i}.1", co)
        cin = self.pool_size ** 3 * self.num_features
        for i, cout in enumerate(self.shared_fc):
            init_linear(P, next(r), f"{prefix}.shared_fc_layer.{i}",
                        cin, cout, bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.shared_fc_layer.{i}.bn", cout)
            cin = cout
        for name, fcs, nout in (("cls", self.cls_fc, self.num_class),
                                ("reg", self.reg_fc,
                                 self.coder.code_size * self.num_class)):
            ci = self.shared_fc[-1]
            for i, cout in enumerate(fcs):
                init_linear(P, next(r), f"{prefix}.{name}_layers.{i}",
                            ci, cout, bias=False, init="kaiming")
                init_bn(P, S, f"{prefix}.{name}_layers.{i}.bn", cout)
                ci = cout
            init_linear(P, next(r), f"{prefix}.{name}_layers.out", ci,
                        nout, bias=True, init="normal")
        return P, S

    # ------------------------------------------------------------------
    def _masked_conv_stack(self, P, S, ctx, name, x, occ, prefix):
        """Two (k3 conv + BN + relu) on dense [R, G, G, G, C] grids with
        submanifold masking (conv_part / conv_rpn)."""
        R = x.shape[0]
        G = self.pool_size
        m = occ.reshape(R * G ** 3)
        for i in range(2):
            w = P[f"{prefix}.{name}.{i}.0.kernel"]
            co = w.shape[-1]
            w = w.reshape(3, 3, 3, w.shape[-2], co)
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32)
            f = x.reshape(R * G ** 3, co)
            f = apply_bn(P, S, ctx, f"{prefix}.{name}.{i}.1", f, m,
                         momentum=0.01, eps=1e-3)
            f = jnp.where(m[:, None], jnp.maximum(f, 0.0), 0.0)
            x = f.reshape(R, G, G, G, co)
        return x

    def roiaware_pool(self, P, S, ctx: Ctx, rois, roi_valid, point_coords,
                      point_feats, part_offsets, point_scores, prefix):
        """partA2_head.py:104-151 + the rcnn conv stacks :199-205.
        Returns flattened [R, G^3 * NUM_FEATURES]."""
        G = self.pool_size
        R = rois.shape[0]
        pvalid = jnp.ones(point_coords.shape[0], bool)
        xyz = point_coords if self.disable_part else part_offsets
        seg = (point_scores >= self.seg_thresh)[:, None]
        part_f = jnp.concatenate(
            [jnp.where(seg, xyz, 0.0), point_scores[:, None],
             jnp.ones((point_coords.shape[0], 1), jnp.float32)], -1)
        pooled_part = roiaware_pool3d(rois, roi_valid, point_coords,
                                      pvalid, part_f, G, pool="avg")
        occ_a = pooled_part[..., -1] > 0
        pooled_rpn = roiaware_pool3d(rois, roi_valid, point_coords,
                                     pvalid, point_feats, G, pool="max")
        # avg over occupied counts: roiaware avg divides by the in-cell
        # count already (core/roi_pools.py); strip the occupancy channel
        pooled_part = pooled_part[..., :4]
        x_part = self._masked_conv_stack(P, S, ctx, "conv_part",
                                         pooled_part, occ_a, prefix)
        x_rpn = self._masked_conv_stack(P, S, ctx, "conv_rpn",
                                        pooled_rpn, occ_a, prefix)
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)
        return merged.reshape(R, G ** 3 * self.num_features)

    # ------------------------------------------------------------------
    def forward_train(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                      roi_valid, gt_boxes, gt_labels, gt_valid,
                      point_coords, point_feats, part_offsets,
                      point_scores, prefix: str = "roi_head"):
        from ...core.geometry import rotate_points_along_z
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid, gt_boxes,
            gt_labels, gt_valid, flip_gt_heading=False)
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

        pooled = self.roiaware_pool(P, S, ctx, s_rois, s_valid,
                                    point_coords, point_feats,
                                    part_offsets, point_scores, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, pooled, s_valid,
                                         prefix)
        return dict(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=s_rois,
                    gt_of_rois=gt_ct, gt_of_rois_src=tgt["gt_of_rois"],
                    reg_valid_mask=tgt["reg_valid_mask"],
                    rcnn_cls_labels=tgt["rcnn_cls_labels"],
                    roi_labels=tgt["roi_labels"])

    def forward_test(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                     roi_valid, point_coords, point_feats, part_offsets,
                     point_scores, score_thresh=0.1, nms_thresh=0.1,
                     max_out=128, prefix: str = "roi_head"):
        from ...core import nms as nms_mod
        pooled = self.roiaware_pool(P, S, ctx, rois, roi_valid,
                                    point_coords, point_feats,
                                    part_offsets, point_scores, prefix)
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
