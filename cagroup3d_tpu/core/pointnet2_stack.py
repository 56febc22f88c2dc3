"""pointnet2_stack op family, TPU-native.

The reference's "stack" kernels (pcdet/ops/pointnet2/pointnet2_stack/,
~2950 LoC CUDA) operate on ragged batches flattened into one array with
per-scene counts (xyz_batch_cnt).  The TPU-native layout is padded
[B, N, ...] with validity masks, so the stack surface reduces to the
batch ops vmapped per scene, plus the two ops unique to this family:

- ``vector_pool``: VectorPoolAggregation (vector_pool_gpu.cu:485, used by
  PV-RCNN++): per query, bin neighbors into a dense_x^3 local grid,
  average per cell, concatenate cell vectors.
- ``voxel_query``: neighbor search on a voxel hash instead of brute-force
  ball query (voxel_query_gpu.cu:113, Voxel-RCNN): served exactly by the
  engine's sorted-key lookup (core/hashing.py) over the voxel lattice.

Per-scene functions; batch via vmap.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from . import pointnet2 as pn2
from .hashing import build_index, lookup
from .gather import take_rows

# re-exported stack-surface ops (padded-batch equivalents)
farthest_point_sample = pn2.farthest_point_sample
ball_query = pn2.ball_query
three_nn = pn2.three_nn
three_interpolate = pn2.three_interpolate
group_points = pn2.group_points
query_and_group = pn2.query_and_group


def vector_pool(queries, qvalid, points, pvalid, feats, radius: float,
                nsample: int, dense: int = 3):
    """VectorPoolAggregation: per query, neighbors within ``radius`` are
    binned into a dense^3 grid of the local cube [-r, r]^3 and averaged
    per cell; output concatenates the cell vectors (+ relative xyz means).

    queries [M, 3], points [N, 3], feats [N, C] ->
    [M, dense^3 * (3 + C)].
    """
    M = queries.shape[0]
    C = feats.shape[-1]
    D3 = dense ** 3
    idx, found = pn2.ball_query(radius, nsample, points, pvalid, queries,
                                qvalid)
    # first-found replication would bias the means: build a real mask
    nb_xyz = take_rows(points, idx)                        # [M, K, 3]
    rel = nb_xyz - queries[:, None, :]
    d2 = jnp.sum(rel ** 2, axis=-1)
    real = (d2 < radius ** 2) & found[:, None] & qvalid[:, None]
    # deduplicate replicated slots: keep the first occurrence of each idx
    firsts = jnp.concatenate(
        [jnp.ones((M, 1), bool), idx[:, 1:] != idx[:, :1]], axis=1)
    keep = real & (firsts | (jnp.arange(idx.shape[1])[None, :] == 0))
    cell = jnp.floor((rel + radius) / (2 * radius / dense))
    cell = jnp.clip(cell, 0, dense - 1).astype(jnp.int32)
    cid = (cell[..., 0] * dense + cell[..., 1]) * dense + cell[..., 2]
    oh = jax.nn.one_hot(jnp.where(keep, cid, D3), D3 + 1,
                        dtype=feats.dtype)[..., :D3]       # [M, K, D3]
    nb_f = jnp.concatenate([rel, take_rows(feats, idx)], -1)
    sums = jnp.einsum("mkd,mkc->mdc", oh, nb_f)
    cnt = jnp.sum(oh, axis=1)                              # [M, D3]
    mean = sums / jnp.maximum(cnt, 1.0)[..., None]
    return mean.reshape(M, D3 * (3 + C))


def voxel_query(voxel_coords, voxel_valid, queries_lat, qvalid,
                max_range: int = 1):
    """Voxel-hash neighbor query (voxel_query_gpu.cu): for each query
    lattice coordinate, the voxel rows at all offsets within
    [-max_range, max_range]^3.  Returns i32[M, (2r+1)^3] (-1 = absent)."""
    offs = []
    r = max_range
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                offs.append((dx, dy, dz))
    return voxel_query_offsets(voxel_coords, voxel_valid, queries_lat,
                               qvalid, np.asarray(offs, np.int32))


def nearest_offsets(max_range: int, cap: int) -> np.ndarray:
    """The ``cap`` lattice offsets of [-r, r]^3 closest to the origin
    (ties broken by scan order).  Static; used to bound voxel-query
    neighborhoods: since a lattice offset addresses at most ONE voxel,
    querying the cap nearest offsets is the static-shape analogue of the
    reference's 'first nsample found' subsampling (voxel_query_gpu.cu
    scan order) with a better-than-reference proximity bias."""
    r = max_range
    offs = np.stack(np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1),
                                np.arange(-r, r + 1), indexing="ij"),
                    -1).reshape(-1, 3)
    d2 = (offs ** 2).sum(-1)
    order = np.argsort(d2, kind="stable")
    return offs[order[:min(cap, len(offs))]].astype(np.int32)


def voxel_query_offsets(voxel_coords, voxel_valid, queries_lat, qvalid,
                        offsets) -> jnp.ndarray:
    """voxel_query with an explicit static offset list i32[K, 3].
    Returns i32[M, K] voxel rows (-1 = absent)."""
    sorted_keys, row_of_rank = build_index(voxel_coords, voxel_valid)
    offs = jnp.asarray(offsets, jnp.int32)                 # [K, 3]
    q = queries_lat[None, :, :] + offs[:, None, :]
    K, M = offs.shape[0], queries_lat.shape[0]
    rows = lookup(sorted_keys, row_of_rank, q.reshape(K * M, 3),
                  jnp.broadcast_to(qvalid[None, :], (K, M)).reshape(-1))
    return rows.reshape(K, M).T
