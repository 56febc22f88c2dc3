"""mmdet-style losses in jnp (reference: pcdet/utils/loss_utils.py,
pcdet/utils/iou3d_loss.py).

All losses are static-shape: instead of boolean indexing, callers pass
element weights/masks; ``avg_factor`` is an explicit (possibly traced)
normalizer.  Ignored labels are -1 (mapped to all-zero one-hot = pure
background in focal loss, exactly like the reference's
``target[target < 0] = num_classes`` trick, loss_utils.py:1024-1029).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.geometry import iou3d_aligned, iou3d_rotated


def sigmoid_focal_loss(pred, target_onehot, weight=None, gamma=2.0,
                       alpha=0.25, avg_factor=None):
    """pred [N, C] logits; target_onehot [N, C] in {0,1}."""
    p = jax.nn.sigmoid(pred)
    pt = (1 - p) * target_onehot + p * (1 - target_onehot)
    focal_w = (alpha * target_onehot + (1 - alpha) * (1 - target_onehot)) \
        * pt ** gamma
    bce = jnp.maximum(pred, 0) - pred * target_onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = bce * focal_w
    if weight is not None:
        if weight.ndim < loss.ndim:
            weight = weight[..., None]
        loss = loss * weight
    s = jnp.sum(loss)
    if avg_factor is not None:
        return s / (avg_factor + jnp.finfo(jnp.float32).eps)
    return s / loss.size


def focal_loss_with_labels(pred, labels, weight=None, gamma=2.0, alpha=0.25,
                           avg_factor=None, loss_weight=1.0):
    """labels i32[N] in [-1, C); -1 == background (all-zero one-hot)."""
    C = pred.shape[-1]
    oh = jax.nn.one_hot(jnp.where(labels < 0, C, labels), C + 1)[..., :C]
    return loss_weight * sigmoid_focal_loss(pred, oh, weight, gamma, alpha,
                                            avg_factor)


def binary_cross_entropy(pred, target, weight=None, avg_factor=None,
                         loss_weight=1.0):
    """Sigmoid BCE with logits (CrossEntropy use_sigmoid=True path)."""
    loss = jnp.maximum(pred, 0) - pred * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))
    if weight is not None:
        while weight.ndim < loss.ndim:
            weight = weight[..., None]
        loss = loss * weight
    s = jnp.sum(loss)
    if avg_factor is not None:
        return loss_weight * s / (avg_factor + jnp.finfo(jnp.float32).eps)
    return loss_weight * s / loss.size


def smooth_l1(pred, target, weight=None, beta=1.0, reduction="mean",
              avg_factor=None, loss_weight=1.0):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss_weight * loss
    s = jnp.sum(loss)
    if avg_factor is not None:
        return loss_weight * s / (avg_factor + jnp.finfo(jnp.float32).eps)
    if reduction == "sum":
        return loss_weight * s
    return loss_weight * s / loss.size


def weighted_smooth_l1(pred, target, weights=None, beta=1.0 / 9.0,
                       code_weights=None):
    """pcdet WeightedSmoothL1Loss (loss_utils.py:76): elementwise, no
    reduction; nan targets ignored."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)[None, :]
    n = jnp.abs(diff)
    if beta < 1e-5:
        loss = n
    else:
        loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def iou3d_loss(pred7, target7, weight=None, avg_factor=None, with_yaw=True,
               loss_weight=1.0):
    """1 - IoU3D; rotated (cal_iou_3d) or axis-aligned
    (AxisAlignedBboxOverlaps3D) per with_yaw (iou3d_loss.py:92-95).
    pred/target [N, 6|7]; weight [N]."""
    if with_yaw:
        iou = iou3d_rotated(pred7, target7)
    else:
        iou = iou3d_aligned(pred7, target7)
    loss = 1.0 - iou
    if weight is not None:
        loss = loss * weight
    s = jnp.sum(loss)
    if avg_factor is not None:
        return loss_weight * s / (avg_factor + jnp.finfo(jnp.float32).eps)
    return loss_weight * s / loss.size


def cross_entropy_with_logits(logits, labels, class_weight=None):
    """Per-element softmax CE (torch nn.CrossEntropyLoss reduction='none',
    optionally with per-class weights, as used by RBGNet's objectness /
    sample / intersection losses, rbg_head.py:88-95).

    logits [..., K], labels i32[...]; returns [...]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    lab = jnp.clip(labels, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        w = jnp.asarray(class_weight)[lab]
        nll = nll * w
    return nll


def axis_aligned_iou_corners(corners_a, corners_b):
    """IoU of corner-format axis-aligned boxes [..., 6] (x1y1z1 x2y2z2)."""
    lo = jnp.maximum(corners_a[..., :3], corners_b[..., :3])
    hi = jnp.minimum(corners_a[..., 3:6], corners_b[..., 3:6])
    whd = jnp.maximum(hi - lo, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    va = jnp.prod(jnp.maximum(corners_a[..., 3:6] - corners_a[..., :3], 0.0),
                  axis=-1)
    vb = jnp.prod(jnp.maximum(corners_b[..., 3:6] - corners_b[..., :3], 0.0),
                  axis=-1)
    return inter / jnp.maximum(va + vb - inter, 1e-9)


def axis_aligned_iou_loss(corners_pred, corners_tgt, weight=None):
    """AxisAlignedIoULoss (reduction='sum'): sum of weight * (1 - IoU)
    over corner-format boxes (loss_utils.py AxisAlignedIoULoss, used at
    rbg_head.py:452-459)."""
    loss = 1.0 - axis_aligned_iou_corners(corners_pred, corners_tgt)
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss)


def weighted_l1(pred, target, weights=None, code_weights=None):
    """WeightedL1Loss (loss_utils.py:140): elementwise |diff|, optional
    code/anchor weights, nan-target guard."""
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights)[None, :]
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(pred, target_onehot, weights=None):
    """WeightedCrossEntropyLoss (loss_utils.py:182): softmax CE against
    one-hot targets with per-anchor weights."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    loss = -jnp.sum(target_onehot * logp, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def _corners_lidar(boxes7):
    """8 corners of (x, y, z_center, dx, dy, dz, heading) boxes."""
    t = jnp.asarray([[1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
                     [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1]],
                    jnp.float32) * 0.5
    local = t[None] * boxes7[:, None, 3:6]
    c, s = jnp.cos(boxes7[:, 6]), jnp.sin(boxes7[:, 6])
    x = local[..., 0] * c[:, None] - local[..., 1] * s[:, None]
    y = local[..., 0] * s[:, None] + local[..., 1] * c[:, None]
    rot = jnp.stack([x, y, local[..., 2]], -1)
    return rot + boxes7[:, None, :3]


def get_corner_loss_lidar(pred7, gt7, beta: float = 1.0):
    """Corner loss (loss_utils.py:210): min over the flipped-heading GT of
    the mean smooth-L1 corner distance.  Returns [N]."""
    pc = _corners_lidar(pred7)
    gc = _corners_lidar(gt7)
    gt_flip = gt7.at[:, 6].add(jnp.pi)
    gcf = _corners_lidar(gt_flip)
    d = jnp.minimum(jnp.linalg.norm(pc - gc, axis=-1),
                    jnp.linalg.norm(pc - gcf, axis=-1))     # [N, 8]
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return jnp.mean(loss, axis=1)


def focal_loss_centernet(pred, gt, mask=None):
    """CornerNet/CenterNet penalty-reduced focal loss
    (loss_utils.py:265-313).  pred in (0, 1); gt gaussian heatmap."""
    eps = 1e-6
    pred = jnp.clip(pred, eps, 1.0 - eps)
    pos = (gt >= 1.0).astype(pred.dtype)
    neg = (gt < 1.0).astype(pred.dtype)
    neg_w = jnp.power(1.0 - gt, 4)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_w * neg
    if mask is not None:
        pos_loss = pos_loss * mask
        neg_loss = neg_loss * mask
    n_pos = jnp.sum(pos)
    s = -(jnp.sum(pos_loss) + jnp.sum(neg_loss))
    return jnp.where(n_pos > 0,
                     (-(jnp.sum(pos_loss) + jnp.sum(neg_loss))) /
                     jnp.maximum(n_pos, 1.0),
                     -jnp.sum(neg_loss))
