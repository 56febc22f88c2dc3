"""RoI pooling op family, TPU-native.

Replaces pcdet/ops/roiaware_pool3d (roiaware_pool3d_kernel.cu: points-in-
rotated-box + per-voxel max/avg pooling inside each RoI, used by PartA2)
and pcdet/ops/roipoint_pool3d (roipoint_pool3d_kernel.cu: sample a fixed
number of in-box points per RoI, used by PointRCNN) with static-shape jnp:
masked canonical transforms, one-hot/segment reductions, index-ordered
top-k.  Per-scene functions; batch via vmap.

Box convention: (cx, cy, cz, dx, dy, dz, heading) with z CENTER (pcdet
lidar convention of these ops) — callers using bottom-z boxes shift first.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from .gather import take_rows

BIG = 1e10


def _canonical(points, rois):
    """points [N, 3], rois [R, 7] -> local coords [R, N, 3] in each roi's
    heading-aligned frame (centered)."""
    rel = points[None, :, :] - rois[:, None, :3]
    c, s = jnp.cos(-rois[:, 6]), jnp.sin(-rois[:, 6])
    x = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    y = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    return jnp.stack([x, y, rel[..., 2]], -1)


def points_in_boxes(points, pvalid, rois, rvalid):
    """bool[R, N]: point strictly inside the rotated box."""
    local = _canonical(points, rois)
    half = rois[:, None, 3:6] / 2
    inside = jnp.all(jnp.abs(local) < half, axis=-1)
    return inside & pvalid[None, :] & rvalid[:, None]


def roiaware_pool3d(rois, rvalid, points, pvalid, feats, out_size: int,
                    pool: str = "max", roi_chunk: int = 32):
    """RoIAware pooling (roiaware_pool3d_kernel.cu): bin each roi's inside
    points into an out_size^3 canonical grid, reduce per cell.

    rois [R, 7], points [N, 3], feats [N, C] ->
    [R, out_size, out_size, out_size, C] (zeros for empty cells: CUDA
    max-pool clamps negatives of empty cells to 0 via argmax=-1 semantics).
    """
    G = out_size
    R = rois.shape[0]
    C = feats.shape[-1]

    def chunk_fn(args):
        roi_c, rv_c = args
        local = _canonical(points, roi_c)                    # [r, N, 3]
        half = roi_c[:, None, 3:6] / 2
        inside = jnp.all(jnp.abs(local) < half, axis=-1) & \
            pvalid[None, :] & rv_c[:, None]
        cell = jnp.floor((local + half) / (roi_c[:, None, 3:6] / G))
        cell = jnp.clip(cell, 0, G - 1).astype(jnp.int32)
        cid = (cell[..., 0] * G + cell[..., 1]) * G + cell[..., 2]
        r = roi_c.shape[0]
        seg = jnp.where(inside,
                        cid + (jnp.arange(r, dtype=jnp.int32) * G ** 3)
                        [:, None],
                        r * G ** 3)
        flatseg = seg.reshape(-1)
        fexp = jnp.broadcast_to(feats[None], (r,) + feats.shape
                                ).reshape(-1, C)
        if pool == "max":
            out = jnp.full((r * G ** 3 + 1, C), -BIG).at[flatseg].max(
                jnp.where(inside.reshape(-1)[:, None], fexp, -BIG))
            cnt = jnp.zeros((r * G ** 3 + 1,), jnp.int32).at[flatseg].add(
                inside.reshape(-1).astype(jnp.int32))
            out = jnp.where((cnt > 0)[:, None], out, 0.0)[:-1]
        else:
            ssum = jnp.zeros((r * G ** 3 + 1, C)).at[flatseg].add(
                jnp.where(inside.reshape(-1)[:, None], fexp, 0.0))
            cnt = jnp.zeros((r * G ** 3 + 1,), jnp.int32).at[flatseg].add(
                inside.reshape(-1).astype(jnp.int32))
            out = (ssum / jnp.maximum(cnt, 1)[:, None])[:-1]
        return out.reshape(r, G, G, G, C)

    nchunk = -(-R // roi_chunk)
    pad = nchunk * roi_chunk - R
    roi_p = jnp.pad(rois, ((0, pad), (0, 0)))
    rv_p = jnp.pad(rvalid, (0, pad))
    out = jax.lax.map(chunk_fn, (roi_p.reshape(nchunk, roi_chunk, 7),
                                 rv_p.reshape(nchunk, roi_chunk)))
    return out.reshape(nchunk * roi_chunk, G, G, G, C)[:R]


def roipoint_pool3d(rois, rvalid, points, pvalid, feats,
                    num_sampled: int = 512):
    """RoIPoint pooling (roipoint_pool3d_kernel.cu): the first
    ``num_sampled`` in-box points per roi (index order, repeating the
    first point when fewer — CUDA semantics), features concatenated.

    Returns (pooled [R, num_sampled, 3 + C], empty bool[R])."""
    N = points.shape[0]
    inside = points_in_boxes(points, pvalid, rois, rvalid)   # [R, N]
    key = jnp.where(inside, jnp.arange(N, dtype=jnp.int32)[None, :],
                    N + jnp.arange(N, dtype=jnp.int32)[None, :])
    _, idx = jax.lax.top_k(-key, num_sampled)                # smallest keys
    found = jnp.take_along_axis(inside, idx, axis=1)
    first = jnp.where(found[:, 0], idx[:, 0], 0)
    idx = jnp.where(found, idx, first[:, None])
    pooled = jnp.concatenate(
        [take_rows(points, idx), take_rows(feats, idx)], -1)
    empty = ~jnp.any(inside, axis=1)
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty
