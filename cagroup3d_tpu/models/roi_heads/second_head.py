"""SECONDHead: IoU-scoring second stage over dense BEV features
(reference pcdet/models/roi_heads/second_head.py:7-178).

The reference pools each RoI with an ``affine_grid`` + ``grid_sample``
over the rotated BEV rectangle of the box (second_head.py:54-110).  Here
that is a direct rotated-grid bilinear sample in BEV metric space — a
GxG endpoint-inclusive lattice over the box footprint, rotated by yaw,
mapped to feature-map coordinates and bilinearly interpolated — which
is the same sampling pattern without the normalized-coordinate detour
(dense gather + lerp: pure XLA, vmap-friendly).  The head then runs the
shared Conv1d/k1 trunk (= per-RoI linear layers) and a single IoU
regression branch; the refined "boxes" at test time are the proposals
themselves re-scored by predicted IoU (second_head.py:133-136).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import (Ctx, Params, apply_bn, dropout, init_bn,
                            init_linear)
from ...utils import loss_utils as L
from .pvrcnn_head import PVRCNNHead
from .target_assigner.cagroup_proposal_target_layer import \
    ProposalTargetLayer


def sample_bev_rotated(bev, rois, grid_size: int, bev_origin,
                       bev_cell) -> jnp.ndarray:
    """Bilinear-sample a rotated GxG grid per RoI from BEV features.

    bev [H, W, C] (H along y, W along x), rois [R, 7] metric boxes,
    bev_origin (x0, y0) metric coords of cell (0, 0)'s corner,
    bev_cell (cx, cy) metric size of one BEV cell.  Returns [R, G*G*C].
    Endpoint-inclusive grid like the reference's align_corners affine
    map (second_head.py:88-104)."""
    H, W, C = bev.shape
    R = rois.shape[0]
    g = grid_size
    lin = jnp.linspace(-0.5, 0.5, g)
    uu, vv = jnp.meshgrid(lin, lin, indexing="ij")      # [g, g] box x, y
    local = jnp.stack([uu, vv], -1).reshape(1, g * g, 2)
    ext = rois[:, None, 3:5]                            # (dx, dy)
    pts = local * ext                                   # [R, g*g, 2]
    ca, sa = jnp.cos(rois[:, 6]), jnp.sin(rois[:, 6])
    x = pts[..., 0] * ca[:, None] - pts[..., 1] * sa[:, None] + \
        rois[:, None, 0]
    y = pts[..., 0] * sa[:, None] + pts[..., 1] * ca[:, None] + \
        rois[:, None, 1]
    # metric -> fractional cell index (cell centers at +0.5)
    fx = (x - bev_origin[0]) / bev_cell[0] - 0.5
    fy = (y - bev_origin[1]) / bev_cell[1] - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        from ...core.gather import take_rows
        f = take_rows(bev.reshape(H * W, C), flat.reshape(-1))
        return jnp.where(ok.reshape(-1)[:, None], f, 0.0), ok

    f00, _ = tap(y0, x0)
    f01, _ = tap(y0, x0 + 1)
    f10, _ = tap(y0 + 1, x0)
    f11, _ = tap(y0 + 1, x0 + 1)
    wxf = wx.reshape(-1)[:, None]
    wyf = wy.reshape(-1)[:, None]
    out = (f00 * (1 - wxf) * (1 - wyf) + f01 * wxf * (1 - wyf) +
           f10 * (1 - wxf) * wyf + f11 * wxf * wyf)
    return out.reshape(R, g * g * C)


class SECONDHead(PVRCNNHead):
    """Only the members the SECOND IoU head needs; proposal layer and
    the canonical-transform-free target path come from the template
    surface shared with PVRCNNHead."""

    def __init__(self, model_cfg, num_class: int = 1, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", True) else num_class
        gp = c.ROI_GRID_POOL
        self.grid_size = int(gp.GRID_SIZE)
        self.in_ch = int(gp.get("IN_CHANNEL", input_channels or 512))
        self.downsample = int(gp.get("DOWNSAMPLE_RATIO", 8))
        self.shared_fc = [int(x) for x in c.SHARED_FC]
        self.iou_fc = [int(x) for x in c.IOU_FC]
        self.dp_ratio = float(c.get("DP_RATIO", 0.3))
        tc = c.TARGET_CONFIG
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=int(tc.get("ROI_PER_IMAGE", 128)),
            fg_ratio=float(tc.get("FG_RATIO", 0.5)),
            reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.55)),
            cls_fg_thresh=float(tc.get("CLS_FG_THRESH", 0.75)),
            cls_bg_thresh=float(tc.get("CLS_BG_THRESH", 0.25)),
            cls_bg_thresh_l0=float(tc.get("CLS_BG_THRESH_LO", 0.1)),
            hard_bg_ratio=float(tc.get("HARD_BG_RATIO", 0.8)))
        lc = c.LOSS_CONFIG
        self.iou_loss = str(lc.get("IOU_LOSS", "BinaryCrossEntropy"))
        self.w_iou = float(lc.LOSS_WEIGHTS.get("rcnn_iou_weight", 1.0))
        self.nms_cfg = c.NMS_CONFIG

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "roi_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 16))
        cin = self.in_ch * self.grid_size * self.grid_size
        for i, cout in enumerate(self.shared_fc):
            init_linear(P, next(r), f"{prefix}.shared_fc_layer.{i}",
                        cin, cout, bias=False, init="xavier")
            init_bn(P, S, f"{prefix}.shared_fc_layer.{i}.bn", cout)
            cin = cout
        ci = self.shared_fc[-1]
        for i, cout in enumerate(self.iou_fc):
            init_linear(P, next(r), f"{prefix}.iou_layers.{i}", ci, cout,
                        bias=False, init="xavier")
            init_bn(P, S, f"{prefix}.iou_layers.{i}.bn", cout)
            ci = cout
        init_linear(P, next(r), f"{prefix}.iou_layers.out", ci, 1,
                    bias=True, init="normal")
        return P, S

    # ------------------------------------------------------------------
    def _iou_branch(self, P, S, ctx: Ctx, pooled, valid, prefix):
        x = pooled
        for i in range(len(self.shared_fc)):
            x = x @ P[f"{prefix}.shared_fc_layer.{i}.weight"]
            x = apply_bn(P, S, ctx, f"{prefix}.shared_fc_layer.{i}.bn",
                         x, valid)
            x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
            if i != len(self.shared_fc) - 1 and self.dp_ratio > 0:
                x = dropout(ctx, x, self.dp_ratio)
        for i in range(len(self.iou_fc)):
            x = x @ P[f"{prefix}.iou_layers.{i}.weight"]
            x = apply_bn(P, S, ctx, f"{prefix}.iou_layers.{i}.bn", x,
                         valid)
            x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
        return (x @ P[f"{prefix}.iou_layers.out.weight"] +
                P[f"{prefix}.iou_layers.out.bias"])[:, 0]      # [R]

    def pool(self, P, S, ctx: Ctx, bev2d, rois, roi_valid,
             point_cloud_range, voxel_size, prefix):
        cell = (voxel_size[0] * self.downsample,
                voxel_size[1] * self.downsample)
        pooled = sample_bev_rotated(
            bev2d, rois, self.grid_size,
            (point_cloud_range[0], point_cloud_range[1]), cell)
        return jnp.where(roi_valid[:, None], pooled, 0.0)

    # ------------------------------------------------------------------
    def forward_train(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                      roi_valid, gt_boxes, gt_labels, gt_valid, bev2d,
                      point_cloud_range, voxel_size,
                      prefix: str = "roi_head"):
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid, gt_boxes,
            gt_labels, gt_valid, flip_gt_heading=False)
        s_rois = tgt["rois"]
        s_valid = jnp.ones(s_rois.shape[0], bool)
        pooled = self.pool(P, S, ctx, bev2d, s_rois, s_valid,
                           point_cloud_range, voxel_size, prefix)
        rcnn_iou = self._iou_branch(P, S, ctx, pooled, s_valid, prefix)
        return dict(rcnn_iou=rcnn_iou,
                    rcnn_cls_labels=tgt["rcnn_cls_labels"])

    def forward_test(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                     roi_valid, bev2d, point_cloud_range, voxel_size,
                     prefix: str = "roi_head"):
        pooled = self.pool(P, S, ctx, bev2d, rois, roi_valid,
                           point_cloud_range, voxel_size, prefix)
        rcnn_iou = self._iou_branch(P, S, ctx, pooled, roi_valid, prefix)
        return dict(rois=rois, rcnn_iou=rcnn_iou, roi_scores=roi_scores,
                    roi_labels=roi_labels, roi_valid=roi_valid)

    # ------------------------------------------------------------------
    def loss(self, fwd: Dict[str, jnp.ndarray]):
        """IoU-quality regression loss (second_head.py:144-178), batched
        over the scene axis."""
        iou = fwd["rcnn_iou"].reshape(-1)
        lab = fwd["rcnn_cls_labels"].reshape(-1)
        ok = (lab >= 0).astype(jnp.float32)
        t = jnp.maximum(lab, 0.0)
        if self.iou_loss == "BinaryCrossEntropy":
            e = jnp.maximum(iou, 0) - iou * t + \
                jnp.log1p(jnp.exp(-jnp.abs(iou)))
        elif self.iou_loss == "L2":
            e = (iou - t) ** 2
        elif self.iou_loss == "smoothL1":
            e = L.smooth_l1(iou, t, beta=1.0 / 9.0, reduction="none")
        else:
            raise NotImplementedError(self.iou_loss)
        li = jnp.sum(e * ok) / jnp.maximum(jnp.sum(ok), 1.0) * self.w_iou
        return li, dict(rcnn_loss_iou=li, rcnn_loss=li)
