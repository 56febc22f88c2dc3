"""PointHeadBox: per-point foreground segmentation + box regression for
PointRCNN (reference pcdet/models/dense_heads/point_head_box.py:7-118,
point_head_template.py get_cls_layer_loss :113-131 / get_box_layer_loss
:133-150, utils/box_coder_utils.PointResidualCoder :144-227).

Per-scene static shapes; targets via the dense points-in-boxes test
(inside enlarged shell only -> ignore)."""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...utils import loss_utils as L
from .point_head_simple import points_in_rotated_boxes


class PointResidualCoder:
    """box_coder_utils.PointResidualCoder (:144-227): residuals to the
    point with per-class mean-size anchors, cos/sin heading."""

    def __init__(self, code_size=8, use_mean_size=True, mean_size=None):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        if use_mean_size:
            self.mean_size = np.asarray(mean_size, np.float32)
            assert self.mean_size.min() > 0

    def encode(self, gt_boxes, points, gt_classes=None):
        """gt_boxes [N, 7], points [N, 3], gt_classes [N] (0-based)."""
        g = gt_boxes.at[:, 3:6].set(
            jnp.maximum(gt_boxes[:, 3:6], 1e-5))
        if self.use_mean_size:
            anchor = jnp.take(jnp.asarray(self.mean_size),
                              jnp.clip(gt_classes, 0,
                                       len(self.mean_size) - 1), axis=0)
            diag = jnp.sqrt(anchor[:, 0] ** 2 + anchor[:, 1] ** 2)
            xt = (g[:, 0] - points[:, 0]) / diag
            yt = (g[:, 1] - points[:, 1]) / diag
            zt = (g[:, 2] - points[:, 2]) / anchor[:, 2]
            dxt = jnp.log(g[:, 3] / anchor[:, 0])
            dyt = jnp.log(g[:, 4] / anchor[:, 1])
            dzt = jnp.log(g[:, 5] / anchor[:, 2])
        else:
            xt = g[:, 0] - points[:, 0]
            yt = g[:, 1] - points[:, 1]
            zt = g[:, 2] - points[:, 2]
            dxt = jnp.log(g[:, 3])
            dyt = jnp.log(g[:, 4])
            dzt = jnp.log(g[:, 5])
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt,
                          jnp.cos(g[:, 6]), jnp.sin(g[:, 6])], -1)

    def decode(self, enc, points, pred_classes=None):
        if self.use_mean_size:
            anchor = jnp.take(jnp.asarray(self.mean_size),
                              jnp.clip(pred_classes, 0,
                                       len(self.mean_size) - 1), axis=0)
            diag = jnp.sqrt(anchor[:, 0] ** 2 + anchor[:, 1] ** 2)
            xg = enc[:, 0] * diag + points[:, 0]
            yg = enc[:, 1] * diag + points[:, 1]
            zg = enc[:, 2] * anchor[:, 2] + points[:, 2]
            dims = jnp.exp(enc[:, 3:6]) * anchor
        else:
            xg = enc[:, 0] + points[:, 0]
            yg = enc[:, 1] + points[:, 1]
            zg = enc[:, 2] + points[:, 2]
            dims = jnp.exp(enc[:, 3:6])
        rg = jnp.arctan2(enc[:, 7], enc[:, 6])
        return jnp.concatenate(
            [jnp.stack([xg, yg, zg], -1), dims, rg[:, None]], -1)


class PointHeadBox:
    def __init__(self, model_cfg, num_class: int, input_channels=None,
                 **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_class = num_class
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.reg_fc = [int(x) for x in c.REG_FC]
        self.in_ch = int(c.get("INPUT_CHANNELS", input_channels or 128))
        tc = c.TARGET_CONFIG
        self.extra_width = [float(x) for x in tc.GT_EXTRA_WIDTH]
        bc = dict(tc.get("BOX_CODER_CONFIG", {}))
        self.coder = PointResidualCoder(
            use_mean_size=bool(bc.get("use_mean_size", True)),
            mean_size=bc.get("mean_size",
                             [[3.9, 1.6, 1.56]] * num_class))
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["point_cls_weight"])
        self.w_box = float(lw["point_box_weight"])
        self.code_weights = [float(x) for x in lw["code_weights"]]

    def init(self, rng, prefix: str = "point_head"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 16))
        for name, fcs, nout in (
                ("cls", self.cls_fc, self.num_class),
                ("box", self.reg_fc, self.coder.code_size)):
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
        outs = {}
        for name, fcs in (("cls", self.cls_fc), ("box", self.reg_fc)):
            x = feats
            for i in range(len(fcs)):
                x = x @ P[f"{prefix}.{name}_layers.{i}.weight"]
                x = apply_bn(P, S, ctx, f"{prefix}.{name}_layers.{i}.bn",
                             x, valid)
                x = jnp.where(valid[:, None], jnp.maximum(x, 0.0), 0.0)
            outs[name] = x @ P[f"{prefix}.{name}_layers.out.weight"] + \
                P[f"{prefix}.{name}_layers.out.bias"]
        scores = jax.nn.sigmoid(jnp.max(outs["cls"], axis=-1))
        return outs["cls"], outs["box"], jnp.where(valid, scores, 0.0)

    # ------------------------------------------------------------------
    def assign_targets(self, points, pvalid, gt_boxes, gt_labels,
                       gt_valid):
        """(cls_labels i32[N] (-1 ignore / 0 bg / 1..K fg),
        box_labels [N, code], box_valid bool[N])."""
        inside = points_in_rotated_boxes(points, gt_boxes, gt_valid)
        big = gt_boxes.at[:, 3:6].add(2 * jnp.asarray(self.extra_width))
        inside_big = points_in_rotated_boxes(points, big, gt_valid)
        in_any = jnp.any(inside, axis=1)
        first = jnp.argmax(inside, axis=1)
        labels = jnp.where(
            in_any, gt_labels[first] + 1,
            jnp.where(jnp.any(inside_big, axis=1), -1, 0))
        labels = jnp.where(pvalid, labels, -1).astype(jnp.int32)
        box_t = self.coder.encode(gt_boxes[first], points,
                                  gt_labels[first])
        box_valid = in_any & pvalid
        box_t = jnp.where(box_valid[:, None], box_t, 0.0)
        return labels, box_t, box_valid

    def loss(self, cls_preds, box_preds, labels, box_t, box_valid):
        """Batched [B, N, ...] (point_head_template :113-150)."""
        pos = (labels > 0).astype(jnp.float32)
        neg = (labels == 0).astype(jnp.float32)
        pos_norm = jnp.maximum(jnp.sum(pos, axis=1, keepdims=True), 1.0)
        cls_w = (pos + neg) / pos_norm
        onehot = jax.nn.one_hot(jnp.clip(labels, 0, self.num_class),
                                self.num_class + 1)[..., 1:]
        B = cls_preds.shape[0]
        loss_cls = jnp.sum(L.sigmoid_focal_loss(
            cls_preds, onehot, weight=cls_w)) / B * self.w_cls
        w = box_valid.astype(jnp.float32) / pos_norm
        elt = L.weighted_smooth_l1(box_preds, box_t,
                                   code_weights=self.code_weights)
        loss_box = jnp.sum(elt * w[..., None]) / B * self.w_box
        return loss_cls + loss_box, dict(point_loss_cls=loss_cls,
                                         point_loss_box=loss_box)

    def predicted_boxes(self, points, cls_preds, box_preds):
        """Decode per-point proposals (generate_predicted_boxes,
        point_head_template.py:152-172)."""
        cls_ids = jnp.argmax(cls_preds, axis=-1).astype(jnp.int32)
        boxes = self.coder.decode(box_preds, points, cls_ids)
        return boxes, jax.nn.sigmoid(cls_preds), cls_ids
