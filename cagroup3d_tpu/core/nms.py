"""On-device greedy NMS over fixed-capacity candidate sets.

Replaces pcdet's 64-bit-bitmask CUDA NMS (iou3d_nms_kernel.cu nms_kernel /
nms_normal_kernel, wrappers iou3d_nms_utils.py:84-116).  The candidate set
is statically capped (reference NMS_PRE=1000, cagroup_head.py NMS_CONFIG);
suppression runs as a fori_loop in score order carrying a suppressed mask.

``rotated=True`` matches nms_gpu (rotated BEV IoU); ``rotated=False``
matches nms_normal_gpu (axis-aligned BEV IoU ignoring heading).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .geometry import iou_bev_aligned, iou_bev_rotated, pairwise

NEG_INF = -1e10


def greedy_nms(boxes7: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_thr: float, rotated: bool) -> jnp.ndarray:
    """Returns bool[N] keep mask (in the original order)."""
    n = boxes7.shape[0]
    s = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-s)
    b = boxes7[order]
    v = valid[order]
    iou_fn = iou_bev_rotated if rotated else iou_bev_aligned
    iou = pairwise(iou_fn, b, b)

    def body(i, state):
        keep, suppressed = state
        k = v[i] & ~suppressed[i]
        keep = keep.at[i].set(k)
        suppressed = suppressed | (k & (iou[i] > iou_thr))
        return keep, suppressed

    keep0 = jnp.zeros((n,), bool)
    sup0 = jnp.zeros((n,), bool)
    keep_sorted, _ = jax.lax.fori_loop(0, n, body, (keep0, sup0))
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)


def _topk_select(scores: jnp.ndarray, valid: jnp.ndarray, k: int):
    s = jnp.where(valid, scores, NEG_INF)
    top_s, idx = jax.lax.top_k(s, k)
    return idx, top_s > NEG_INF / 2


def multiclass_nms(bboxes: jnp.ndarray, scores: jnp.ndarray,
                   valid: jnp.ndarray, score_thr: float, iou_thr: float,
                   rotated: bool, per_cls_cap: int, out_cap: int,
                   flip_heading_for_iou: bool = True):
    """Per-class NMS as in CAGroup3DHead._nms (cagroup_head.py:747-797).

    bboxes [P, 7], scores [P, C] (already sigmoid*centerness), valid [P].
    Candidates per class = top ``per_cls_cap`` above ``score_thr``; final
    output = top ``out_cap`` kept detections across classes.
    ``flip_heading_for_iou``: the reference negates heading before calling
    nms_gpu (cagroup_head.py:768-771); only affects rotated IoU.

    Returns (boxes [out_cap, 7], scores [out_cap], labels i32[out_cap],
             valid [out_cap]).
    """
    P, C = scores.shape

    def per_class(cls_scores):
        cand_valid = valid & (cls_scores > score_thr)
        idx, sel_ok = _topk_select(cls_scores, cand_valid, per_cls_cap)
        b = bboxes[idx]
        s = cls_scores[idx]
        b_iou = b
        if rotated and flip_heading_for_iou:
            b_iou = b.at[:, 6].multiply(-1.0)
        keep = greedy_nms(b_iou, s, sel_ok, iou_thr, rotated)
        return b, s, keep

    b_all, s_all, k_all = jax.vmap(per_class, in_axes=1)(scores)  # [C, K, ...]
    labels = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                              k_all.shape)
    b_flat = b_all.reshape(C * per_cls_cap, -1)
    s_flat = s_all.reshape(-1)
    k_flat = k_all.reshape(-1)
    l_flat = labels.reshape(-1)

    idx, ok = _topk_select(s_flat, k_flat, out_cap)
    out_boxes = jnp.where(ok[:, None], b_flat[idx], 0.0)
    out_scores = jnp.where(ok, s_flat[idx], 0.0)
    out_labels = jnp.where(ok, l_flat[idx], 0)
    return out_boxes, out_scores, out_labels, ok


def class_agnostic_nms(bboxes: jnp.ndarray, scores: jnp.ndarray,
                       valid: jnp.ndarray, score_thr: float, iou_thr: float,
                       rotated: bool, out_cap: int,
                       flip_heading_for_iou: bool = True):
    """CAGroup3DHead.class_agnostic_nms (cagroup_head.py:705-745):
    max over classes, one NMS pass."""
    max_scores = jnp.max(scores, axis=1)
    labels = jnp.argmax(scores, axis=1).astype(jnp.int32)
    cand_valid = valid & (max_scores > score_thr)
    idx, sel_ok = _topk_select(max_scores, cand_valid, out_cap)
    b = bboxes[idx]
    s = max_scores[idx]
    l = labels[idx]
    b_iou = b
    if rotated and flip_heading_for_iou:
        b_iou = b.at[:, 6].multiply(-1.0)
    keep = greedy_nms(b_iou, s, sel_ok, iou_thr, rotated)
    return (jnp.where(keep[:, None], b, 0.0), jnp.where(keep, s, 0.0),
            jnp.where(keep, l, 0), keep)
