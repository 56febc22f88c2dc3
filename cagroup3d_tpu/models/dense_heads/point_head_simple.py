"""PointHeadSimple: keypoint foreground segmentation for PV-RCNN
(reference pcdet/models/dense_heads/point_head_simple.py:7-101 +
point_head_template.py assign_stack_targets :48-96, get_cls_layer_loss
:113-131).

Static-shape per-scene rebuild: targets come from a dense
points-in-rotated-boxes test against GT and the GT_EXTRA_WIDTH-enlarged
GT (inside enlarged but not original -> ignore -1); the loss is the
pcdet sigmoid focal with per-point weights pos+neg normalized by the
positive count.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...core.geometry import rotate_points_along_z
from ...utils import loss_utils as L


def points_in_rotated_boxes(points, boxes7, boxes_valid):
    """bool [P, G]: xyz in rotated box (z-centered 7-DoF)."""
    d = points[:, None, :3] - boxes7[None, :, :3]
    c, s = jnp.cos(boxes7[:, 6]), jnp.sin(boxes7[:, 6])
    u = d[..., 0] * c[None] + d[..., 1] * s[None]
    v = -d[..., 0] * s[None] + d[..., 1] * c[None]
    inside = (jnp.abs(u) <= boxes7[None, :, 3] / 2) & \
        (jnp.abs(v) <= boxes7[None, :, 4] / 2) & \
        (jnp.abs(d[..., 2]) <= boxes7[None, :, 5] / 2)
    return inside & boxes_valid[None, :]


class PointHeadSimple:
    def __init__(self, model_cfg, num_class: int, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", False) else num_class
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 640))
        self.extra_width = [float(x) for x in
                            c.TARGET_CONFIG.GT_EXTRA_WIDTH]
        self.use_before_fusion = bool(
            c.get("USE_POINT_FEATURES_BEFORE_FUSION", False))
        self.w_cls = float(c.LOSS_CONFIG.LOSS_WEIGHTS["point_cls_weight"])

    def init(self, rng, prefix: str = "point_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        chans = [self.in_ch] + self.cls_fc
        rngs = jax.random.split(rng, len(chans) + 1)
        for i in range(len(chans) - 1):
            init_linear(P, rngs[i], f"{prefix}.cls_layers.{i}",
                        chans[i], chans[i + 1], bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.cls_layers.{i}.bn", chans[i + 1])
        init_linear(P, rngs[-1], f"{prefix}.cls_layers.out",
                    chans[-1], self.num_class, bias=True, init="kaiming")
        return P, S

    def forward(self, P, S, ctx: Ctx, feats, valid,
                prefix: str = "point_head"):
        """feats [K, C] -> (point_cls_preds [K, num_class],
        point_cls_scores [K])."""
        x = feats
        for i in range(len(self.cls_fc)):
            x = x @ P[f"{prefix}.cls_layers.{i}.weight"]
            x = apply_bn(P, S, ctx, f"{prefix}.cls_layers.{i}.bn", x,
                         valid)
            x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
        preds = x @ P[f"{prefix}.cls_layers.out.weight"] + \
            P[f"{prefix}.cls_layers.out.bias"]
        scores = jnp.max(jax.nn.sigmoid(preds), axis=-1)
        return preds, jnp.where(valid, scores, 0.0)

    def assign_targets(self, keypoints, kp_valid, gt_boxes, gt_labels,
                       gt_valid):
        """i32[K]: 0 bg, -1 ignore (in enlarged box only), else class+1
        (class-agnostic -> 1)."""
        inside = points_in_rotated_boxes(keypoints, gt_boxes, gt_valid)
        big = gt_boxes.at[:, 3:6].add(
            2 * jnp.asarray(self.extra_width))
        inside_big = points_in_rotated_boxes(keypoints, big, gt_valid)
        in_any = jnp.any(inside, axis=1)
        in_any_big = jnp.any(inside_big, axis=1)
        first = jnp.argmax(inside, axis=1)
        cls = gt_labels[first] + 1 if self.num_class > 1 else 1
        labels = jnp.where(in_any, cls,
                           jnp.where(in_any_big, -1, 0))
        return jnp.where(kp_valid, labels, -1).astype(jnp.int32)

    def loss(self, preds, labels):
        """Batched [B, K, ...] sigmoid focal with pos+neg weights over
        the positive count (point_head_template.py:113-131)."""
        pos = (labels > 0).astype(jnp.float32)
        neg = (labels == 0).astype(jnp.float32)
        cls_w = pos + neg
        pos_norm = jnp.maximum(jnp.sum(pos, axis=1, keepdims=True), 1.0)
        cls_w = cls_w / pos_norm
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, self.num_class),
                                self.num_class + 1)[..., 1:]
        B = preds.shape[0]
        loss = jnp.sum(L.sigmoid_focal_loss(
            preds, onehot, weight=cls_w)) / B * self.w_cls
        return loss, dict(point_loss_cls=loss)
