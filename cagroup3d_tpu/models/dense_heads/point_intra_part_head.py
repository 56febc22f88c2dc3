"""PointIntraPartOffsetHead: per-point foreground segmentation +
intra-object part location regression for PartA2 (reference
pcdet/models/dense_heads/point_intra_part_head.py:7-127,
point_head_template.py assign_stack_targets :50-127 w/ ret_part_labels,
get_part_layer_loss :157-170).

Per-scene static shapes.  Part labels are the canonical in-box position
(rotate point into the box frame, divide by size, +0.5); part loss is
BCE over sigmoid preds normalized by 3x the foreground count."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.geometry import rotate_points_along_z
from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...utils import loss_utils as L
from .point_head_simple import points_in_rotated_boxes
from .point_head_box import PointResidualCoder


class PointIntraPartOffsetHead:
    def __init__(self, model_cfg, num_class: int, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", False) else num_class
        self.cls_fc = [int(x) for x in c.get("CLS_FC", [])]
        self.part_fc = [int(x) for x in c.get("PART_FC", [])]
        self.reg_fc = [int(x) for x in c.get("REG_FC", [])]
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 16))
        tc = c.TARGET_CONFIG
        self.extra_width = [float(x) for x in tc.GT_EXTRA_WIDTH]
        self.coder = None
        if tc.get("BOX_CODER") is not None:
            bc = dict(tc.get("BOX_CODER_CONFIG", {}))
            self.coder = PointResidualCoder(
                use_mean_size=bool(bc.get("use_mean_size", True)),
                mean_size=bc.get("mean_size", [[3.9, 1.6, 1.56]]))
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw.get("point_cls_weight", 1.0))
        self.w_part = float(lw.get("point_part_weight", 1.0))
        self.w_box = float(lw.get("point_box_weight", 1.0))
        self.code_weights = [float(x) for x in
                             lw.get("code_weights", [1.0] * 8)]

    def init(self, rng, prefix: str = "point_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 24))
        heads = [("cls", self.cls_fc, self.num_class),
                 ("part", self.part_fc, 3)]
        if self.coder is not None:
            heads.append(("box", self.reg_fc, self.coder.code_size))
        for name, fcs, nout in heads:
            cin = self.in_ch
            for i, cout in enumerate(fcs):
                init_linear(P, next(r), f"{prefix}.{name}_layers.{i}",
                            cin, cout, bias=False, init="kaiming")
                init_bn(P, S, f"{prefix}.{name}_layers.{i}.bn", cout)
                cin = cout
            init_linear(P, next(r), f"{prefix}.{name}_layers.out",
                        cin, nout, bias=True, init="normal")
        return P, S

    def forward(self, P, S, ctx: Ctx, feats, valid,
                prefix: str = "point_head"):
        """Returns (cls_preds [N, K], part_preds [N, 3], box_preds or
        None, cls_scores [N] = max sigmoid)."""
        outs = {}
        heads = [("cls", self.cls_fc), ("part", self.part_fc)]
        if self.coder is not None:
            heads.append(("box", self.reg_fc))
        for name, fcs in heads:
            x = feats
            for i in range(len(fcs)):
                x = x @ P[f"{prefix}.{name}_layers.{i}.weight"]
                x = apply_bn(P, S, ctx, f"{prefix}.{name}_layers.{i}.bn",
                             x, valid)
                x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
            outs[name] = x @ P[f"{prefix}.{name}_layers.out.weight"] + \
                P[f"{prefix}.{name}_layers.out.bias"]
        scores = jax.nn.sigmoid(jnp.max(outs["cls"], axis=-1))
        return (outs["cls"], outs["part"], outs.get("box"),
                jnp.where(valid, scores, 0.0))

    def predicted_boxes(self, points, cls_preds, box_preds):
        """Decode per-point proposals for the anchor-free PartA2_free
        pipeline (generate_predicted_boxes, point_head_template.py:
        152-172); requires TARGET_CONFIG.BOX_CODER."""
        cls_ids = jnp.argmax(cls_preds, axis=-1).astype(jnp.int32)
        boxes = self.coder.decode(box_preds, points, cls_ids)
        return boxes, jax.nn.sigmoid(cls_preds), cls_ids

    # ------------------------------------------------------------------
    def assign_targets(self, points, pvalid, gt_boxes, gt_labels,
                       gt_valid):
        """(cls_labels i32[N], part_labels [N, 3], part_valid bool[N],
        box_t [N, code] or None).  cls: -1 ignore (in enlarged shell
        only) / 0 bg / 1..K fg."""
        inside = points_in_rotated_boxes(points, gt_boxes, gt_valid)
        big = gt_boxes.at[:, 3:6].add(2 * jnp.asarray(self.extra_width))
        inside_big = points_in_rotated_boxes(points, big, gt_valid)
        in_any = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        cls = gt_labels[first] + 1 if self.num_class > 1 else 1
        labels = jnp.where(
            in_any, cls,
            jnp.where(jnp.any(inside_big, axis=1), -1, 0))
        labels = jnp.where(pvalid, labels, -1).astype(jnp.int32)

        box = gt_boxes[first]
        local = rotate_points_along_z(
            (points - box[:, 0:3])[:, None, :], -box[:, 6])[:, 0, :]
        part = local / jnp.maximum(box[:, 3:6], 1e-5) + 0.5
        part_valid = in_any & pvalid
        part = jnp.where(part_valid[:, None], part, 0.0)
        box_t = None
        if self.coder is not None:
            box_t = self.coder.encode(box, points, gt_labels[first])
            box_t = jnp.where(part_valid[:, None], box_t, 0.0)
        return labels, part, part_valid, box_t

    def loss(self, cls_preds, part_preds, box_preds, labels, part_t,
             part_valid, box_t):
        """Batched [B, N, ...] (point_head_template :113-170)."""
        pos = (labels > 0).astype(jnp.float32)
        neg = (labels == 0).astype(jnp.float32)
        pos_norm = jnp.maximum(jnp.sum(pos, axis=1, keepdims=True), 1.0)
        cls_w = (pos + neg) / pos_norm
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, self.num_class),
                                self.num_class + 1)[..., 1:]
        B = cls_preds.shape[0]
        loss_cls = jnp.sum(L.sigmoid_focal_loss(
            cls_preds, onehot, weight=cls_w)) / B * self.w_cls

        # part: BCE(sigmoid) over fg points / (3 * pos_norm)
        p = jax.nn.sigmoid(part_preds)
        bce = -(part_t * jnp.log(jnp.clip(p, 1e-7, 1.0)) +
                (1.0 - part_t) * jnp.log(jnp.clip(1.0 - p, 1e-7, 1.0)))
        w = part_valid.astype(jnp.float32) / (3.0 * pos_norm)
        loss_part = jnp.sum(jnp.sum(bce, -1) * w) / B * self.w_part
        tb = dict(point_loss_cls=loss_cls, point_loss_part=loss_part)
        total = loss_cls + loss_part
        if box_preds is not None and box_t is not None:
            elt = L.weighted_smooth_l1(box_preds, box_t,
                                       code_weights=self.code_weights)
            wb = part_valid.astype(jnp.float32) / pos_norm
            loss_box = jnp.sum(elt * wb[..., None]) / B * self.w_box
            tb["point_loss_box"] = loss_box
            total = total + loss_box
        return total, tb
