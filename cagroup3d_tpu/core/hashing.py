"""Coordinate key packing and sorted-array lookup.

The TPU-native replacement for MinkowskiEngine's coordinate manager / GPU
hash map (used by every kernel-map construction in the reference's sparse
convs).  We pack a 3-D lattice coordinate into a single int32 key
(10 bits/axis after an offset), sort the keys once per coordinate set, and
answer "which row holds coordinate q?" with a vectorized binary search
(``jnp.searchsorted``).  Deterministic, fully batched, no dynamic shapes.

Extent budget: 1024 lattice cells per axis per stride level.  At the finest
ScanNet stride (0.02 m) that is ~20 m per axis, comfortably above indoor
scene extents; coarser strides only shrink the lattice.  Coordinates are
normalized to start near 0 at voxelization time (see voxelize.py).
"""
from __future__ import annotations

import jax.numpy as jnp

# 10 bits per axis.
_BITS = 10
_EXTENT = 1 << _BITS  # 1024
# Small slack for coordinates that go slightly negative (e.g. vote clamping
# to min_bound - stride in the dense head, cagroup_head.py:211).
_MARGIN = 8
# Sentinel key, larger than any packable key (30 bits used).
INVALID_KEY = jnp.int32((1 << 30) + 1)


def pack_coords(lat: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Pack lattice coords i32[N, 3] into sortable int32 keys.

    ``lat`` must already be divided by the tensor stride (pure lattice
    units).  Out-of-range coords and invalid rows get INVALID_KEY.
    """
    shifted = lat + _MARGIN
    in_range = jnp.all((shifted >= 0) & (shifted < _EXTENT), axis=-1)
    key = (shifted[..., 0] << (2 * _BITS)) | (shifted[..., 1] << _BITS) | shifted[..., 2]
    return jnp.where(valid & in_range, key, INVALID_KEY)


def build_index(lat: jnp.ndarray, valid: jnp.ndarray):
    """Build a lookup index over a coordinate set.

    Returns (sorted_keys i32[N], row_of_rank i32[N]): ``sorted_keys`` in
    ascending order with invalid rows pushed to the end as INVALID_KEY,
    ``row_of_rank[r]`` = original row index of the r-th smallest key.
    """
    keys = pack_coords(lat, valid)
    order = jnp.argsort(keys)
    return keys[order], order.astype(jnp.int32)


def lookup(sorted_keys: jnp.ndarray, row_of_rank: jnp.ndarray,
           query_lat: jnp.ndarray, query_valid: jnp.ndarray) -> jnp.ndarray:
    """Find the row index of each query coordinate; -1 when absent.

    query_lat: i32[Q, 3] lattice-unit coords.  Assumes the indexed
    coordinate set has no duplicate keys (true post-dedup).
    """
    qk = pack_coords(query_lat, query_valid)
    pos = jnp.searchsorted(sorted_keys, qk)
    pos = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos] == qk) & (qk != INVALID_KEY)
    return jnp.where(hit, row_of_rank[pos], -1)
