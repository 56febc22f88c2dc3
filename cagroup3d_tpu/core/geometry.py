"""Box geometry: rotations, rotated/axis-aligned IoU, point-in-box tests.

TPU-native (branch-free, fully vectorized jnp) replacement for the
reference's three separate native implementations of rotated IoU:
  * pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu (polygon clipping for NMS
    and boxes_iou3d_gpu proposal matching)
  * pcdet/ops/rotated_iou (differentiable rotated IoU loss, CUDA vertex
    sort sort_vert_kernel.cu)
  * kitti_object_eval_python/rotate_iou.py (numba CUDA, eval metric)

One implementation serves all: candidate intersection vertices =
corners-inside-other + edge-pair intersections, masked angular sort around
their centroid, shoelace area.  Differentiable (gradients flow through
vertex coordinates; the sort is an index operation).

Box convention: (x, y, z, dx, dy, dz, heading); heading rotates x->y
around +z (pcdet convention, common_utils.rotate_points_along_z).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Rotations
# ---------------------------------------------------------------------------

def rotate_points_along_z(points: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """points [..., N, 3+C] rotated by angle [...] (x ==> y), pcdet semantics
    (reference pcdet/utils/common_utils.py:rotate_points_along_z):
    p_rot = p @ [[cos, sin, 0], [-sin, cos, 0], [0, 0, 1]]."""
    cosa, sina = jnp.cos(angle), jnp.sin(angle)
    x, y = points[..., 0], points[..., 1]
    xr = x * cosa[..., None] - y * sina[..., None]
    yr = x * sina[..., None] + y * cosa[..., None]
    return jnp.concatenate(
        [xr[..., None], yr[..., None], points[..., 2:]], axis=-1)


def rotation_3d_in_axis(points: jnp.ndarray, angles: jnp.ndarray,
                        axis: int = 2) -> jnp.ndarray:
    """Batched rotation matching cagroup_utils.rotation_3d_in_axis
    (einsum 'aij,jka->aik'): points [N, M, 3], angles [N]."""
    s, c = jnp.sin(angles), jnp.cos(angles)
    ones, zeros = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 1:
        rot = jnp.stack([
            jnp.stack([c, zeros, -s], -1),
            jnp.stack([zeros, ones, zeros], -1),
            jnp.stack([s, zeros, c], -1)], -2)
    elif axis in (2, -1):
        rot = jnp.stack([
            jnp.stack([c, -s, zeros], -1),
            jnp.stack([s, c, zeros], -1),
            jnp.stack([zeros, zeros, ones], -1)], -2)
    elif axis == 0:
        rot = jnp.stack([
            jnp.stack([zeros, c, -s], -1),
            jnp.stack([zeros, s, c], -1),
            jnp.stack([ones, zeros, zeros], -1)], -2)
    else:
        raise ValueError(axis)
    # reference: einsum('aij,jka->aik', points, rot_mat_T) with
    # rot_mat_T[j,k,a]; our rot is [a,j,k] so this is points @ rot.
    return jnp.einsum("amj,ajk->amk", points, rot)


def limit_period(val, offset=0.5, period=jnp.pi):
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# Rotated BEV intersection (flat pairs).
# ---------------------------------------------------------------------------

def box2corners_bev(box5: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (x, y, dx, dy, heading) -> [..., 4, 2] corners (CCW)."""
    x, y, dx, dy, a = (box5[..., i] for i in range(5))
    xs = jnp.stack([dx / 2, -dx / 2, -dx / 2, dx / 2], -1)
    ys = jnp.stack([dy / 2, dy / 2, -dy / 2, -dy / 2], -1)
    c, s = jnp.cos(a)[..., None], jnp.sin(a)[..., None]
    cx = xs * c - ys * s + x[..., None]
    cy = xs * s + ys * c + y[..., None]
    return jnp.stack([cx, cy], -1)


def _point_in_quad(pts: jnp.ndarray, box5: jnp.ndarray) -> jnp.ndarray:
    """pts [..., P, 2] inside rotated rect box5 [..., 5] -> bool [..., P]."""
    x, y, dx, dy, a = (box5[..., i] for i in range(5))
    px = pts[..., 0] - x[..., None]
    py = pts[..., 1] - y[..., None]
    c, s = jnp.cos(a)[..., None], jnp.sin(a)[..., None]
    u = px * c + py * s
    v = -px * s + py * c
    eps = 1e-6
    return (jnp.abs(u) <= dx[..., None] / 2 + eps) & \
           (jnp.abs(v) <= dy[..., None] / 2 + eps)


def _seg_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-pair intersections of two quads.

    ca, cb: [..., 4, 2].  Returns (pts [..., 16, 2], valid [..., 16]).
    """
    a0 = ca                       # [..., 4, 2]
    a1 = jnp.roll(ca, -1, axis=-2)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=-2)
    # broadcast edge pairs: i over a-edges, j over b-edges
    a0 = a0[..., :, None, :]
    a1 = a1[..., :, None, :]
    b0 = b0[..., None, :, :]
    b1 = b1[..., None, :, :]
    da = a1 - a0
    db = b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    diff = b0 - a0
    t = (diff[..., 0] * db[..., 1] - diff[..., 1] * db[..., 0])
    u = (diff[..., 0] * da[..., 1] - diff[..., 1] * da[..., 0])
    safe = jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0)
    t = t / safe
    u = u / safe
    ok = (jnp.abs(denom) > 1e-10) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pt = a0 + t[..., None] * da
    sh = pt.shape[:-3] + (16, 2)
    return pt.reshape(sh), ok.reshape(sh[:-1])


def _cyclic_prev_valid_fill(verts, valid):
    """Replace invalid slots with the previous valid vertex (cyclically),
    preserving polygon order; one-hot matmul instead of gather (TPU scalar
    gathers are slow)."""
    S = verts.shape[-2]
    idx = jnp.arange(S, dtype=jnp.int32)
    tag = jnp.where(valid, idx, -1)
    run_max = jax.lax.associative_scan(jnp.maximum, tag, axis=-1)
    last = run_max[..., -1:]
    src = jnp.where(run_max >= 0, run_max, jnp.maximum(last, 0))
    oh = jax.nn.one_hot(src, S, dtype=verts.dtype)      # [..., S, S]
    return jnp.einsum("...ij,...jk->...ik", oh, verts)


def _clip_by_edges(verts, clip_corners):
    """Sutherland-Hodgman: clip polygon ``verts`` [..., S, 2] (all slots
    valid, duplicates allowed) by the 4 half-planes of a CCW rect given by
    ``clip_corners`` [..., 4, 2].  Output [..., 2S, 2] same invariant,
    plus a nonempty flag."""
    out = verts
    nonempty = jnp.ones(verts.shape[:-2], bool)
    for e in range(4):
        p0 = clip_corners[..., e, :]
        p1 = clip_corners[..., (e + 1) % 4, :]
        ex = p1 - p0
        cur = out
        nxt = jnp.roll(out, -1, axis=-2)
        # inside = left of the directed edge (CCW rect interior)
        def side(v):
            return (ex[..., None, 0] * (v[..., 1] - p0[..., None, 1]) -
                    ex[..., None, 1] * (v[..., 0] - p0[..., None, 0]))
        s_cur = side(cur)
        s_nxt = side(nxt)
        cur_in = s_cur >= -1e-9
        nxt_in = s_nxt >= -1e-9
        denom = s_cur - s_nxt
        t = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        inter = cur + t[..., None] * (nxt - cur)
        cross = cur_in ^ nxt_in
        # emissions in order: [intersection if crossing, nxt if inside]
        S = cur.shape[-2]
        ev = jnp.stack([inter, nxt], axis=-2).reshape(
            cur.shape[:-2] + (2 * S, 2))
        em = jnp.stack([cross, nxt_in], axis=-1).reshape(
            cur.shape[:-2] + (2 * S,))
        nonempty = nonempty & jnp.any(em, axis=-1)
        out = _cyclic_prev_valid_fill(ev, em)
    return out, nonempty


def rotated_intersection_area(boxa5: jnp.ndarray, boxb5: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of rotated BEV rects; inputs [..., 5]
    broadcastable.  Branch-free Sutherland-Hodgman clipping of rect A by
    rect B's half-planes (replaces the CUDA polygon clipping of
    iou3d_nms_kernel.cu:105 and the vertex-sort kernel of
    sort_vert_kernel.cu) + shoelace.  Differentiable."""
    batch = jnp.broadcast_shapes(boxa5.shape[:-1], boxb5.shape[:-1])
    ca = jnp.broadcast_to(box2corners_bev(boxa5), batch + (4, 2))
    cb = jnp.broadcast_to(box2corners_bev(boxb5), batch + (4, 2))
    poly, nonempty = _clip_by_edges(ca, cb)
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - nxt[..., 0] * poly[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(nonempty, area, 0.0)


def rotated_intersection_area_sortbased(boxa5: jnp.ndarray,
                                        boxb5: jnp.ndarray) -> jnp.ndarray:
    """Reference implementation (corner/edge-intersection candidates +
    angular sort + shoelace); kept for cross-validation in tests."""
    ca = box2corners_bev(boxa5)
    cb = box2corners_bev(boxb5)
    a_in_b = _point_in_quad(ca, boxb5)
    b_in_a = _point_in_quad(cb, boxa5)
    xpts, xok = _seg_intersections(ca, cb)
    # broadcast pairwise inputs ([N,1,5] x [1,M,5]) to a common batch shape
    batch = jnp.broadcast_shapes(ca.shape[:-2], cb.shape[:-2])
    ca = jnp.broadcast_to(ca, batch + ca.shape[-2:])
    cb = jnp.broadcast_to(cb, batch + cb.shape[-2:])
    a_in_b = jnp.broadcast_to(a_in_b, batch + a_in_b.shape[-1:])
    b_in_a = jnp.broadcast_to(b_in_a, batch + b_in_a.shape[-1:])
    verts = jnp.concatenate([ca, cb, xpts], axis=-2)         # [..., 24, 2]
    vmask = jnp.concatenate([a_in_b, b_in_a, xok], axis=-1)  # [..., 24]

    num = jnp.sum(vmask, axis=-1, keepdims=True)
    wsum = jnp.sum(jnp.where(vmask[..., None], verts, 0.0), axis=-2,
                   keepdims=True)
    center = wsum / jnp.maximum(num[..., None], 1)
    rel = verts - center
    ang = jnp.arctan2(rel[..., 1], rel[..., 0])
    ang = jnp.where(vmask, ang, 1e9)  # invalid verts sort last
    order = jnp.argsort(ang, axis=-1)
    sv = jnp.take_along_axis(verts, order[..., None], axis=-2)
    sm = jnp.take_along_axis(vmask, order, axis=-1)
    # Replace invalid tail with the first (valid) vertex so the wraparound
    # shoelace is exact without dynamic polygon length.
    first = sv[..., :1, :]
    sv = jnp.where(sm[..., None], sv, first)
    nxt = jnp.roll(sv, -1, axis=-2)
    cross = sv[..., 0] * nxt[..., 1] - nxt[..., 0] * sv[..., 1]
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(num[..., 0] >= 3, area, 0.0)


# ---------------------------------------------------------------------------
# IoU variants (all take boxes7 = (x, y, z, dx, dy, dz, heading)).
# ---------------------------------------------------------------------------

def _bev5(b):
    return b[..., [0, 1, 3, 4, 6]]


def iou_bev_rotated(a7: jnp.ndarray, b7: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU (CUDA iou_bev, iou3d_nms_kernel.cu:227)."""
    inter = rotated_intersection_area(_bev5(a7), _bev5(b7))
    sa = a7[..., 3] * a7[..., 4]
    sb = b7[..., 3] * b7[..., 4]
    return inter / jnp.maximum(sa + sb - inter, 1e-8)


def iou_bev_aligned(a7: jnp.ndarray, b7: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned BEV IoU ignoring heading (CUDA iou_normal)."""
    lo = jnp.maximum(a7[..., :2] - a7[..., 3:5] / 2,
                     b7[..., :2] - b7[..., 3:5] / 2)
    hi = jnp.minimum(a7[..., :2] + a7[..., 3:5] / 2,
                     b7[..., :2] + b7[..., 3:5] / 2)
    wh = jnp.maximum(hi - lo, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    sa = a7[..., 3] * a7[..., 4]
    sb = b7[..., 3] * b7[..., 4]
    return inter / jnp.maximum(sa + sb - inter, 1e-8)


def _z_overlap(a7, b7):
    zmax = jnp.minimum(a7[..., 2] + a7[..., 5] / 2, b7[..., 2] + b7[..., 5] / 2)
    zmin = jnp.maximum(a7[..., 2] - a7[..., 5] / 2, b7[..., 2] - b7[..., 5] / 2)
    return jnp.maximum(zmax - zmin, 0.0)


def iou3d_rotated(a7: jnp.ndarray, b7: jnp.ndarray) -> jnp.ndarray:
    """Full 3D IoU with rotated BEV footprint (boxes_iou3d_gpu /
    rotated_iou.cal_iou_3d)."""
    inter = rotated_intersection_area(_bev5(a7), _bev5(b7)) * _z_overlap(a7, b7)
    va = a7[..., 3] * a7[..., 4] * a7[..., 5]
    vb = b7[..., 3] * b7[..., 4] * b7[..., 5]
    return inter / jnp.maximum(va + vb - inter, 1e-8)


def iou3d_aligned(a7: jnp.ndarray, b7: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned 3D IoU (AxisAlignedBboxOverlaps3D, is_aligned path)."""
    lo = jnp.maximum(a7[..., :3] - a7[..., 3:6] / 2,
                     b7[..., :3] - b7[..., 3:6] / 2)
    hi = jnp.minimum(a7[..., :3] + a7[..., 3:6] / 2,
                     b7[..., :3] + b7[..., 3:6] / 2)
    whd = jnp.maximum(hi - lo, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    va = jnp.prod(a7[..., 3:6], axis=-1)
    vb = jnp.prod(b7[..., 3:6], axis=-1)
    return inter / jnp.maximum(va + vb - inter, 1e-8)


def pairwise(fn, a7: jnp.ndarray, b7: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] x [M, 7] -> [N, M] IoU matrix for any of the fns above."""
    return fn(a7[:, None, :], b7[None, :, :])


def boxes_to_corners_3d(boxes7: jnp.ndarray) -> jnp.ndarray:
    """[N, 7] -> [N, 8, 3] corners (pcdet box_utils.boxes_to_corners_3d)."""
    template = jnp.array(
        [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
         [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], jnp.float32) / 2
    corners = boxes7[:, None, 3:6] * template[None]
    corners = rotate_points_along_z(corners, boxes7[:, 6])
    return corners + boxes7[:, None, 0:3]
