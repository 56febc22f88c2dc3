"""Host-side numpy box utilities (reference pcdet/utils/box_utils.py
subset used by the indoor pipeline)."""
from __future__ import annotations

import numpy as np


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """points [N, 3+C], scalar angle (x ==> y)."""
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], points.dtype)
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot
    return out


def boxes_to_corners_3d(boxes7: np.ndarray) -> np.ndarray:
    """[N, 7] -> [N, 8, 3] corners."""
    template = np.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], np.float32) / 2
    corners = boxes7[:, None, 3:6] * template[None]
    c, s = np.cos(boxes7[:, 6]), np.sin(boxes7[:, 6])
    x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
    y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
    out = np.stack([x, y, corners[..., 2]], -1)
    return out + boxes7[:, None, 0:3]


def mask_boxes_outside_range_numpy(boxes, limit_range, min_num_corners=1):
    """bool [N]: boxes with >= min_num_corners corners inside the range."""
    corners = boxes_to_corners_3d(boxes)            # [N, 8, 3]
    r = np.asarray(limit_range)
    inside = np.all((corners >= r[:3]) & (corners <= r[3:6]), axis=2)
    return inside.sum(axis=1) >= min_num_corners


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    out = boxes3d.copy()
    out[:, 3:6] += 2 * np.asarray(extra_width)
    return out
