"""RBGNet utilities: ray generation, angle<->class coding, box coder
pieces, aligned 3D NMS (reference pcdet/models/dense_heads/rbg_head.py:24
generate_ray, :875 aligned_3d_nms; pcdet/utils/box_coder_utils.py:224
RBGBBoxCoder)."""
from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def generate_ray(ray_num: int) -> np.ndarray:
    """Quasi-uniform unit ray directions (rbg_head.generate_ray): rings of
    constant azimuthal angle with 4*(n-|a|) (or 1) polar samples."""
    n = int(math.ceil(np.sqrt((ray_num - 2) / 4)))
    azim_step = 0.5 * np.pi / n
    azim = 0.0
    rays = []
    for a in range(-n, n + 1):
        polar = 0.0
        size = (n - abs(a)) * 4 or 1
        step = 2 * math.pi / size
        for _ in range(size):
            polar += step
            r = np.sin(azim)
            rays.append([np.cos(polar) * r, np.sin(polar) * r, np.cos(azim)])
        azim += azim_step
    return np.array(rays)


def angle2class(angle: jnp.ndarray, num_dir_bins: int):
    """Continuous angle -> (bin class, residual) (mmdet3d convention)."""
    angle = angle % (2 * jnp.pi)
    width = 2 * jnp.pi / num_dir_bins
    shifted = angle + width / 2
    cls = jnp.floor(shifted / width).astype(jnp.int32) % num_dir_bins
    res = shifted - (cls.astype(angle.dtype) * width + width / 2)
    return cls, res


def class2angle(cls: jnp.ndarray, res: jnp.ndarray, num_dir_bins: int,
                limit_period: bool = True):
    width = 2 * jnp.pi / num_dir_bins
    angle = cls.astype(res.dtype) * width + res
    if limit_period:
        angle = jnp.where(angle > jnp.pi, angle - 2 * jnp.pi, angle)
    return angle


class RBGBBoxCoder:
    """Encode targets / decode predictions for the ray-based head
    (box_coder_utils.py:224).  Static-shape jnp port of the target
    encoding; the split/decode helpers operate on padded proposals."""

    def __init__(self, ray_num, num_dir_bins, num_sizes, with_rot=True):
        self.ray_num = ray_num
        self.num_dir_bins = num_dir_bins
        self.num_sizes = num_sizes
        self.with_rot = with_rot

    def encode(self, gt_boxes7: jnp.ndarray, gt_labels: jnp.ndarray):
        center = gt_boxes7[:, :3]
        size_half = gt_boxes7[:, 3:6] / 2
        size = gt_boxes7[:, 3:6]
        scale = jnp.linalg.norm(gt_boxes7[:, 3:6], axis=1, keepdims=True)
        if self.with_rot:
            dir_cls, dir_res = angle2class(gt_boxes7[:, 6],
                                           self.num_dir_bins)
            dir_t = gt_boxes7[:, 6]
        else:
            dir_cls = jnp.zeros_like(gt_labels)
            dir_res = jnp.zeros_like(gt_boxes7[:, 6])
            dir_t = jnp.zeros_like(gt_boxes7[:, 6])
        return dict(center=center, size_half=size_half, dir_class=dir_cls,
                    dir_res=dir_res, dir=dir_t, size_class=gt_labels,
                    size=size, scale_class=gt_labels, scale=scale)

    def decode_dir(self, dir_cls_logits: jnp.ndarray,
                   dir_res_norm: jnp.ndarray):
        """[N, num_dir_bins] logits + normalized residuals -> angles."""
        cls = jnp.argmax(dir_cls_logits, axis=-1)
        res = jnp.take_along_axis(
            dir_res_norm * (jnp.pi / self.num_dir_bins),
            cls[:, None], axis=-1)[:, 0]
        return class2angle(cls, res, self.num_dir_bins)


def aligned_3d_nms(boxes6: jnp.ndarray, scores: jnp.ndarray,
                   classes: jnp.ndarray, valid: jnp.ndarray,
                   thresh: float) -> jnp.ndarray:
    """Greedy axis-aligned 3D NMS over corner-format boxes
    (x1 y1 z1 x2 y2 z2), class-aware (IoU only counts within a class),
    rbg_head.aligned_3d_nms.  Returns bool keep mask (static shape)."""
    n = boxes6.shape[0]
    s = jnp.where(valid, scores, -1e10)
    order = jnp.argsort(-s)
    b = boxes6[order]
    cl = classes[order]
    v = valid[order]
    lo = jnp.maximum(b[:, None, :3], b[None, :, :3])
    hi = jnp.minimum(b[:, None, 3:6], b[None, :, 3:6])
    whd = jnp.maximum(hi - lo, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    vol = jnp.prod(jnp.maximum(b[:, 3:6] - b[:, :3], 0.0), axis=1)
    iou = inter / jnp.maximum(vol[:, None] + vol[None, :] - inter, 1e-9)
    iou = iou * (cl[:, None] == cl[None, :])

    def body(i, state):
        keep, suppressed = state
        k = v[i] & ~suppressed[i]
        keep = keep.at[i].set(k)
        suppressed = suppressed | (k & (iou[i] > thresh))
        return keep, suppressed

    keep_s, _ = jax.lax.fori_loop(
        0, n, body, (jnp.zeros(n, bool), jnp.zeros(n, bool)))
    return jnp.zeros(n, bool).at[order].set(keep_s)
