"""NMS helpers shared by the outdoor heads (reference
pcdet/models/model_utils/model_nms_utils.py:1-66).

Static-shape: every function returns padded arrays + a validity mask
(top-k pre-selection, greedy rotated NMS from core/nms.py, top-k
post-selection) instead of the reference's ragged index lists."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import nms as nms_mod


def class_agnostic_nms(boxes, scores, valid, nms_pre: int,
                       nms_post: int, nms_thresh: float,
                       score_thresh=None, rotated: bool = True):
    """(boxes [M, 7], scores [M], sel_idx i32[M], valid [M]) with
    M = nms_post (model_nms_utils.class_agnostic_nms :4-22)."""
    if score_thresh is not None:
        valid = valid & (scores > score_thresh)
    k = min(int(nms_pre), boxes.shape[0])
    s, ids = jax.lax.top_k(jnp.where(valid, scores, -1.0), k)
    b = boxes[ids]
    v = s > -0.5
    keep = nms_mod.greedy_nms(b, jnp.where(v, s, -1.0), v, nms_thresh,
                              rotated=rotated)
    v = v & keep
    m = min(int(nms_post), k)
    so, oid = jax.lax.top_k(jnp.where(v, s, -1.0), m)
    return b[oid], so, jnp.take(ids, oid), jnp.take(v, oid)


def multi_classes_nms(boxes, cls_scores, valid, nms_pre: int,
                      per_cls_cap: int, out_cap: int, nms_thresh: float,
                      score_thresh: float = 0.1, rotated: bool = True):
    """Per-class NMS (model_nms_utils.multi_classes_nms :25-66) via the
    engine's multiclass machinery."""
    return nms_mod.multiclass_nms(
        boxes, cls_scores, valid, score_thr=score_thresh,
        iou_thr=nms_thresh, rotated=rotated, per_cls_cap=per_cls_cap,
        out_cap=out_cap, flip_heading_for_iou=False)
