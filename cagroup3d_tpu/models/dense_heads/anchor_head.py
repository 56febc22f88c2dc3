"""Anchor-based BEV head (reference pcdet/models/dense_heads/
anchor_head_template.py + anchor_head_single.py, target_assigner/
anchor_generator.py + axis_aligned_target_assigner.py, utils/
box_coder_utils.ResidualCoder).

Static-shape rebuild: anchors are a fixed [A, 7] array per scene; the
assigner is a dense anchors x padded-GT IoU matching with per-class
thresholds; losses are focal cls + smooth-L1 reg (sin-difference angle) +
direction CE.  Per-scene forward on the [H, W, C] BEV map; batch via
vmap.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import nms as nms_mod
from ...core.geometry import rotated_intersection_area
from ...core.module import Ctx, Params
from ...utils import loss_utils as L


def limit_period(val, offset=0.5, period=math.pi):
    return val - jnp.floor(val / period + offset) * period


class ResidualCoder:
    """box_coder_utils.ResidualCoder (:5-76).  code_size > 7 appends
    plain-residual extra dims (nuScenes velocity: cts = g - a, decoded
    t + a), ordered after the angle terms like the reference."""

    def __init__(self, code_size=7, encode_angle_by_sincos=False):
        self.box_dim = code_size                 # raw box width
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.sincos = encode_angle_by_sincos
        self.n_extra = code_size - 7

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(
            jnp.maximum(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.maximum(boxes[..., 3:6], 1e-5))
        diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
        xt = (boxes[..., 0] - anchors[..., 0]) / diag
        yt = (boxes[..., 1] - anchors[..., 1]) / diag
        zt = (boxes[..., 2] - anchors[..., 2]) / anchors[..., 5]
        dxt = jnp.log(boxes[..., 3] / anchors[..., 3])
        dyt = jnp.log(boxes[..., 4] / anchors[..., 4])
        dzt = jnp.log(boxes[..., 5] / anchors[..., 5])
        if self.sincos:
            rts = [jnp.cos(boxes[..., 6]) - jnp.cos(anchors[..., 6]),
                   jnp.sin(boxes[..., 6]) - jnp.sin(anchors[..., 6])]
        else:
            rts = [boxes[..., 6] - anchors[..., 6]]
        ext = [boxes[..., 7 + i] - anchors[..., 7 + i]
               for i in range(self.n_extra)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt] + rts + ext, axis=-1)

    def decode(self, enc, anchors):
        diag = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
        xg = enc[..., 0] * diag + anchors[..., 0]
        yg = enc[..., 1] * diag + anchors[..., 1]
        zg = enc[..., 2] * anchors[..., 5] + anchors[..., 2]
        dxg = jnp.exp(enc[..., 3]) * anchors[..., 3]
        dyg = jnp.exp(enc[..., 4]) * anchors[..., 4]
        dzg = jnp.exp(enc[..., 5]) * anchors[..., 5]
        na = 8 if self.sincos else 7
        if self.sincos:
            rg = jnp.arctan2(enc[..., 7] + jnp.sin(anchors[..., 6]),
                             enc[..., 6] + jnp.cos(anchors[..., 6]))
        else:
            rg = enc[..., 6] + anchors[..., 6]
        ext = [enc[..., na + i] + anchors[..., 7 + i]
               for i in range(self.n_extra)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg] + ext, axis=-1)


def generate_anchors(cfgs: List[dict], grid_size, pc_range):
    """anchor_generator.py:17-64 -> per-class grids [ny, nx, a_cls, 7].

    Kept un-flattened so the head can concatenate classes along the
    per-location anchor axis (pcdet cats class grids on dim=-3 before
    flattening, anchor_head_template.py:42), matching the prediction
    layout [y][x][per-loc anchor]."""
    out = []
    for c in cfgs:
        stride = int(c["feature_map_stride"])
        nx, ny = grid_size[0] // stride, grid_size[1] // stride
        sizes = np.asarray(c["anchor_sizes"], np.float32)
        rots = np.asarray(c["anchor_rotations"], np.float32)
        heights = np.asarray(c["anchor_bottom_heights"], np.float32)
        if c.get("align_center", False):
            xs = (pc_range[3] - pc_range[0]) / nx
            ys = (pc_range[4] - pc_range[1]) / ny
            x0, y0 = xs / 2, ys / 2
        else:
            xs = (pc_range[3] - pc_range[0]) / max(nx - 1, 1)
            ys = (pc_range[4] - pc_range[1]) / max(ny - 1, 1)
            x0, y0 = 0.0, 0.0
        xc = pc_range[0] + x0 + np.arange(nx) * xs
        yc = pc_range[1] + y0 + np.arange(ny) * ys
        # layout [ny, nx, n_height, n_size, n_rot, 7] flattened; BEV maps
        # index [H(y), W(x)] so y is the slower spatial axis
        g = np.zeros((ny, nx, len(heights), len(sizes), len(rots), 7),
                     np.float32)
        g[..., 0] = xc[None, :, None, None, None]
        g[..., 1] = yc[:, None, None, None, None]
        g[..., 2] = heights[None, None, :, None, None] + \
            sizes[None, None, None, :, 2] / 2
        g[..., 3:6] = sizes[None, None, None, :, None]
        g[..., 6] = rots[None, None, None, None, :]
        out.append(g.reshape(ny, nx, -1, 7))
    return out


def bev_iou(boxes_a, boxes_b):
    """Rotated BEV IoU [N, M] for 7-DoF boxes (broadcast pairwise)."""
    a5 = jnp.concatenate([boxes_a[:, 0:2], boxes_a[:, 3:5],
                          boxes_a[:, 6:7]], -1)
    b5 = jnp.concatenate([boxes_b[:, 0:2], boxes_b[:, 3:5],
                          boxes_b[:, 6:7]], -1)
    inter = rotated_intersection_area(a5[:, None, :], b5[None, :, :])
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-6)


class AnchorHeadSingle:
    def __init__(self, model_cfg, num_class: int, class_names=None,
                 grid_size=None, point_cloud_range=None,
                 input_channels=None, **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = num_class
        self.class_names = list(class_names or
                                [a["class_name"] for a in
                                 c.ANCHOR_GENERATOR_CONFIG])
        self.anchor_cfgs = [dict(a) for a in c.ANCHOR_GENERATOR_CONFIG]
        self.grid_size = list(grid_size)
        self.pc_range = list(point_cloud_range)
        self.in_ch = int(c.get("IN_CHANNELS", input_channels or 256))
        self.use_dir = c.get("USE_DIRECTION_CLASSIFIER", False)
        self.dir_offset = float(c.get("DIR_OFFSET", 0.78539))
        self.dir_limit_offset = float(c.get("DIR_LIMIT_OFFSET", 0.0))
        self.num_dir_bins = int(c.get("NUM_DIR_BINS", 2))
        bc = dict(c.get("BOX_CODER_CONFIG", {}) or {})
        self.coder = ResidualCoder(
            int(bc.get("code_size", 7)),
            bool(bc.get("encode_angle_by_sincos", False)))
        grids = generate_anchors(self.anchor_cfgs, self.grid_size,
                                 self.pc_range)
        if len({g.shape[:2] for g in grids}) != 1:
            raise ValueError(
                "anchor classes must share a feature_map_stride")
        # class grids concatenated along the PER-LOCATION anchor axis
        # (pcdet anchor_head_template.py:42 cats on dim=-3) so that flat
        # row i matches prediction row i of the [y][x][anchor] reshape
        loc = np.concatenate(grids, axis=2)       # [ny, nx, A_loc, 7]
        ny, nx = loc.shape[:2]
        anchors = loc.reshape(-1, 7)              # [A, 7] location-major
        if self.coder.box_dim > 7:                # zero-velocity anchors
            anchors = np.concatenate(
                [anchors, np.zeros((len(anchors),
                                    self.coder.box_dim - 7), np.float32)],
                axis=1)
        self.anchors_np = anchors                 # [A, box_dim]
        # per-location class id + match thresholds, tiled over locations
        cls_ids, mt, ut = [], [], []
        for i, (a, g) in enumerate(zip(self.anchor_cfgs, grids)):
            a_cls = g.shape[2]
            cls_ids += [i] * a_cls
            mt += [float(a["matched_threshold"])] * a_cls
            ut += [float(a["unmatched_threshold"])] * a_cls
        self.anchor_cls_np = np.tile(np.asarray(cls_ids, np.int32),
                                     ny * nx)
        self.matched_thr_np = np.tile(np.asarray(mt, np.float32), ny * nx)
        self.unmatched_thr_np = np.tile(np.asarray(ut, np.float32),
                                        ny * nx)
        self.n_anchors_per_loc = sum(
            len(a["anchor_sizes"]) * len(a["anchor_rotations"]) *
            len(a["anchor_bottom_heights"]) for a in self.anchor_cfgs)
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["cls_weight"])
        self.w_loc = float(lw["loc_weight"])
        self.w_dir = float(lw.get("dir_weight", 0.2))
        self.code_weights = [float(x) for x in lw["code_weights"]]
        self.nms_cfg = c.get("NMS_CONFIG", None)
        self.max_out = int(c.get("MAX_OUT", 512))

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "dense_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = list(jax.random.split(rng, 3))
        A = self.n_anchors_per_loc
        P[prefix + ".conv_cls.weight"] = jax.random.normal(
            r[0], (self.in_ch, A * self.num_class)) * 0.01
        P[prefix + ".conv_cls.bias"] = jnp.full(
            (A * self.num_class,), -math.log((1 - 0.01) / 0.01))
        P[prefix + ".conv_box.weight"] = jax.random.normal(
            r[1], (self.in_ch, A * self.coder.code_size)) * 0.001
        P[prefix + ".conv_box.bias"] = jnp.zeros(
            (A * self.coder.code_size,))
        if self.use_dir:
            P[prefix + ".conv_dir_cls.weight"] = jax.random.normal(
                r[2], (self.in_ch, A * self.num_dir_bins)) * 0.01
            P[prefix + ".conv_dir_cls.bias"] = jnp.zeros(
                (A * self.num_dir_bins,))
        return P, S

    def forward(self, P, S, ctx: Ctx, bev, prefix: str = "dense_head"
                ) -> Dict:
        """bev [H, W, C] -> flat per-anchor predictions."""
        H, W, C = bev.shape
        flat = bev.reshape(-1, C)
        cls = flat @ P[prefix + ".conv_cls.weight"] + \
            P[prefix + ".conv_cls.bias"]
        box = flat @ P[prefix + ".conv_box.weight"] + \
            P[prefix + ".conv_box.bias"]
        out = dict(
            cls_preds=cls.reshape(-1, self.num_class),       # [A, K]
            box_preds=box.reshape(-1, self.coder.code_size))
        if self.use_dir:
            d = flat @ P[prefix + ".conv_dir_cls.weight"] + \
                P[prefix + ".conv_dir_cls.bias"]
            out["dir_cls_preds"] = d.reshape(-1, self.num_dir_bins)
        return out

    # ------------------------------------------------------------------
    def assign_targets(self, gt_boxes, gt_labels, gt_valid):
        """axis_aligned_target_assigner.py: per-class IoU matching with
        matched/unmatched thresholds + force-match of each GT's best
        anchor.  Per scene; returns (labels i32[A] (-1 ignore, 0 bg,
        1..K fg), reg_targets [A, code], reg_weights [A])."""
        anchors = jnp.asarray(self.anchors_np)
        acls = jnp.asarray(self.anchor_cls_np)
        iou = bev_iou(anchors, gt_boxes)                     # [A, G]
        same = (acls[:, None] == gt_labels[None, :]) & gt_valid[None, :]
        iou = jnp.where(same, iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        # force match: each gt's best anchor (within its class)
        gt_best_anchor = jnp.argmax(iou, axis=0)             # [G]
        gt_best_iou = jnp.max(iou, axis=0)
        forced = jnp.zeros(anchors.shape[0], bool).at[gt_best_anchor].set(
            gt_valid & (gt_best_iou > 0))
        pos = (best_iou >= jnp.asarray(self.matched_thr_np)) | forced
        neg = best_iou < jnp.asarray(self.unmatched_thr_np)
        labels = jnp.where(pos, gt_labels[best_gt] + 1,
                           jnp.where(neg, 0, -1))
        tgt = self.coder.encode(gt_boxes[best_gt], anchors)
        tgt = jnp.where(pos[:, None], tgt, 0.0)
        reg_w = pos.astype(jnp.float32)
        return labels, tgt, reg_w

    def loss(self, outs: Dict, gt_boxes, gt_labels, gt_valid):
        """Batched (leading scene axis on outs/gts)."""
        labels, tgt, reg_w = jax.vmap(self.assign_targets)(
            gt_boxes, gt_labels, gt_valid)
        labels = jax.lax.stop_gradient(labels)
        tgt = jax.lax.stop_gradient(tgt)
        B = labels.shape[0]
        pos_norm = jnp.maximum(jnp.sum(reg_w, axis=1, keepdims=True), 1.0)
        cls_w = jnp.where(labels >= 0, 1.0, 0.0) / pos_norm
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, self.num_class),
                                self.num_class + 1)[..., 1:]
        cls_loss = jnp.sum(L.sigmoid_focal_loss(
            outs["cls_preds"], onehot, weight=cls_w)) / B * self.w_cls

        # sin-difference angle encoding (anchor_head_template.py:117-131)
        bp, bt = outs["box_preds"], tgt
        if not self.coder.sincos:
            sin_p = jnp.sin(bp[..., 6]) * jnp.cos(bt[..., 6])
            sin_t = jnp.cos(bp[..., 6]) * jnp.sin(bt[..., 6])
            bp = bp.at[..., 6].set(sin_p)
            bt = bt.at[..., 6].set(sin_t)
        loc = L.weighted_smooth_l1(bp, bt, weights=reg_w / pos_norm,
                                   code_weights=self.code_weights)
        loc_loss = jnp.sum(loc) / B * self.w_loc
        total = cls_loss + loc_loss
        tb = dict(rpn_loss_cls=cls_loss, rpn_loss_loc=loc_loss)
        if self.use_dir and "dir_cls_preds" in outs:
            anchors = jnp.asarray(self.anchors_np)
            rot_gt = tgt[..., 6] + anchors[None, :, 6] \
                if not self.coder.sincos else anchors[None, :, 6]
            offs = limit_period(rot_gt - self.dir_offset, 0, 2 * math.pi)
            dir_t = jnp.clip((offs / (2 * math.pi / self.num_dir_bins))
                             .astype(jnp.int32), 0, self.num_dir_bins - 1)
            dl = L.cross_entropy_with_logits(outs["dir_cls_preds"], dir_t)
            dir_loss = jnp.sum(dl * reg_w / pos_norm) / B * self.w_dir
            total = total + dir_loss
            tb["rpn_loss_dir"] = dir_loss
        tb["rpn_loss"] = total
        return total, tb

    # ------------------------------------------------------------------
    def decoded_boxes(self, outs: Dict):
        """Per scene: decode + direction correction, NO NMS — the raw
        (boxes [A, 7], class scores [A, K]) the two-stage proposal layer
        consumes (anchor_head_template.generate_predicted_boxes)."""
        anchors = jnp.asarray(self.anchors_np)
        boxes = self.coder.decode(outs["box_preds"], anchors)
        scores = jax.nn.sigmoid(outs["cls_preds"])           # [A, K]
        if self.use_dir and "dir_cls_preds" in outs:
            dir_lab = jnp.argmax(outs["dir_cls_preds"], axis=-1)
            period = 2 * math.pi / self.num_dir_bins
            rot = limit_period(boxes[..., 6] - self.dir_offset,
                               self.dir_limit_offset, period)
            boxes = boxes.at[..., 6].set(
                rot + self.dir_offset + period * dir_lab)
        return boxes, scores

    def generate_predicted_boxes(self, outs: Dict):
        """Per scene: decode + dir correction + class-agnostic NMS."""
        boxes, scores = self.decoded_boxes(outs)
        best = jnp.max(scores, axis=-1)
        label = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        nc = self.nms_cfg
        pre = int(nc.get("NMS_PRE_MAXSIZE", 4096)) if nc else 1024
        k = min(pre, boxes.shape[0])
        _, ids = jax.lax.top_k(best, k)
        bsel, ssel, lsel = boxes[ids], best[ids], label[ids]
        thr = float(nc.get("SCORE_THRESH", 0.1)) if nc else 0.1
        iou_thr = float(nc.get("NMS_THRESH", 0.01)) if nc else 0.01
        valid = ssel > thr
        keep = nms_mod.greedy_nms(bsel, jnp.where(valid, ssel, -1.0),
                                  valid, iou_thr, rotated=True)
        valid = valid & keep
        m = min(self.max_out, k)
        _, oid = jax.lax.top_k(jnp.where(valid, ssel, -1.0), m)
        return (bsel[oid], ssel[oid], lsel[oid],
                jnp.take(valid, oid))
