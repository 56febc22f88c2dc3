"""FCOS-style target assigner for the CAGroup3D one-stage head.

Vectorized, static-shape rebuild of the reference assigner
(pcdet/models/dense_heads/target_assigner/cagroup3d_assigner.py): per
class, candidate points are matched to rotated GT boxes by (1) inside-box
test, (2) top-k centerness filter per box (TOPK=18), (3) min-volume
tie-break.  Operates per scene; the per-class python loop becomes a vmap
over a stacked [n_cls, N, ...] point set.

GT comes padded: boxes [G, 7], labels [G], gt_valid [G].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....core.geometry import rotation_3d_in_axis

FLOAT_MAX = 1e8


def _bbox_targets(points, boxes7):
    """points [N, 3], boxes [G, 7] -> targets [N, G, 7]
    (dx_min, dx_max, dy_min, dy_max, dz_min, dz_max, yaw), reference
    cagroup3d_assigner.py:86-100."""
    shift = points[:, None, :] - boxes7[None, :, :3]          # [N, G, 3]
    shift = rotation_3d_in_axis(
        jnp.swapaxes(shift, 0, 1), -boxes7[:, 6], axis=2)     # [G, N, 3]
    local = jnp.swapaxes(shift, 0, 1)                         # [N, G, 3]
    centers = boxes7[None, :, :3] + local
    half = boxes7[None, :, 3:6] / 2
    d_min = centers - (boxes7[None, :, :3] - half)
    d_max = (boxes7[None, :, :3] + half) - centers
    t = jnp.stack([d_min[..., 0], d_max[..., 0], d_min[..., 1],
                   d_max[..., 1], d_min[..., 2], d_max[..., 2],
                   jnp.broadcast_to(boxes7[None, :, 6], d_min[..., 0].shape)],
                  axis=-1)
    return t


def compute_centerness(bbox_targets):
    x = bbox_targets[..., 0:2]
    y = bbox_targets[..., 2:4]
    z = bbox_targets[..., 4:6]
    c = (jnp.min(x, -1) / jnp.maximum(jnp.max(x, -1), 1e-12) *
         jnp.min(y, -1) / jnp.maximum(jnp.max(y, -1), 1e-12) *
         jnp.min(z, -1) / jnp.maximum(jnp.max(z, -1), 1e-12))
    return jnp.sqrt(jnp.maximum(c, 0.0))


def find_points_in_boxes(points, points_valid, boxes7, boxes_valid):
    """bool [N, G]: point strictly inside rotated box."""
    t = _bbox_targets(points, boxes7)
    inside = jnp.min(t[..., :6], axis=-1) > 0
    return inside & points_valid[:, None] & boxes_valid[None, :]


class CAGroup3DAssigner:
    def __init__(self, cfg):
        self.limit = cfg.LIMIT
        self.topk = cfg.TOPK
        self.n_scales = cfg.N_SCALES

    def assign(self, points, points_valid, gt_boxes, gt_labels, gt_valid):
        """points [n_cls, N, 3] (+valid) vs padded GT of the scene.

        Returns (centerness_targets [n_cls, N], bbox_targets [n_cls, N, 7],
        labels i32[n_cls, N]; label -1 = background/padding).
        """
        n_cls = points.shape[0]

        def per_class(cls_id, pts, pvalid):
            sel = gt_valid & (gt_labels == cls_id)
            t = _bbox_targets(pts, gt_boxes)                  # [N, G, 7]
            inside = (jnp.min(t[..., :6], axis=-1) > 0) & sel[None, :] \
                & pvalid[:, None]
            center = compute_centerness(t)
            center = jnp.where(inside, center, -1.0)
            k = min(self.topk + 1, center.shape[0])
            top = jax.lax.top_k(center.T, k)[0][:, -1]        # [G]
            inside_top = center > top[None, :]

            volumes = jnp.prod(gt_boxes[:, 3:6], axis=-1)
            vol = jnp.broadcast_to(volumes[None, :], inside.shape)
            vol = jnp.where(inside & inside_top, vol, FLOAT_MAX)
            min_vol = jnp.min(vol, axis=1)
            min_idx = jnp.argmin(vol, axis=1)

            labels = jnp.where((min_vol < FLOAT_MAX) & pvalid,
                               gt_labels[min_idx], -1).astype(jnp.int32)
            bt = jnp.take_along_axis(t, min_idx[:, None, None], axis=1)[:, 0]
            ct = compute_centerness(bt)
            gt_t = gt_boxes[min_idx]
            # match reference zero-fill when no gt of this class exists
            has_cls = jnp.any(sel)
            ct = jnp.where(has_cls & (labels >= 0), ct, 0.0)
            gt_t = jnp.where(has_cls, gt_t, 0.0)
            return ct, gt_t, labels

        return jax.vmap(per_class)(jnp.arange(n_cls), points, points_valid)

    @staticmethod
    def assign_semantic(points, points_valid, gt_boxes, gt_labels, gt_valid,
                        n_classes):
        """Per-voxel semantic + instance labels
        (cagroup3d_assigner.py:132-152).  Returns (labels i32[N] with -1
        background, ins_labels i32[N] with 0 background)."""
        inside = find_points_in_boxes(points, points_valid, gt_boxes,
                                      gt_valid)
        volumes = jnp.prod(gt_boxes[:, 3:6], axis=-1)
        vol = jnp.where(inside, volumes[None, :], FLOAT_MAX)
        min_vol = jnp.min(vol, axis=1)
        min_idx = jnp.argmin(vol, axis=1)
        labels = jnp.where(min_vol < FLOAT_MAX, gt_labels[min_idx],
                           -1).astype(jnp.int32)
        bk = jnp.any(inside, axis=1)
        ins = (min_idx.astype(jnp.int32) + 1) * bk.astype(jnp.int32)
        return labels, ins
