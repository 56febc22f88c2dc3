"""Sparse average pooling and lattice interpolation.

* avg_pool: ME ``MinkowskiAvgPooling(kernel_size=k, stride=s)`` for the
  DAPPM pyramid (biresnet.py:109-132).  All reference uses satisfy
  k == 2*s + 1, which lets us *scatter* each input voxel into at most 3^3
  candidate output cells instead of gathering k^3 offsets (k=33 would be
  35937 gathers).  Average is over present inputs (count-normalized),
  matching ME.

* interpolate_at: ME ``features_at_coordinates`` (biresnet.py:182,376-394)
  = trilinear interpolation on the source stride lattice; absent corners
  contribute zero without weight renormalization.
"""
from __future__ import annotations

import itertools
import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from .hashing import build_index, lookup
from .sparse import SparseTensor
from .voxelize import stride_reduce_coords
from .gather import take_rows

_DELTAS = np.array(list(itertools.product((-1, 0, 1), repeat=3)), np.int32)
_CORNERS = np.array(list(itertools.product((0, 1), repeat=3)), np.int32)

# avg_pool routes to the scatter-free membership-matmul form when the
# dense [out_cap, src_cap] membership matrix stays below this many
# entries (covers all DAPPM pools); bigger tables keep the scatter path.
# CAGROUP_POOL_MATMUL=0 disables (compile/perf bisection knob).
_POOL_MATMUL_MAX = 0 if os.environ.get("CAGROUP_POOL_MATMUL") == "0" \
    else (1 << 22)


def avg_pool(src: SparseTensor, kernel_size: int, factor: int,
             out_cap: int) -> SparseTensor:
    """Strided average pooling with k == 2*factor + 1 (asserted)."""
    assert kernel_size == 2 * factor + 1, (
        "scatter-based avg_pool requires kernel == 2*stride+1 "
        f"(got k={kernel_size}, s={factor}); all reference DAPPM pools do")
    out, _ = stride_reduce_coords(src, factor, out_cap)
    lattice = out.stride                      # coarse lattice pitch
    half = (kernel_size // 2) * src.stride    # window half-width, raw units

    sorted_keys, row_of_rank = build_index(
        jnp.floor_divide(out.coords, lattice), out.valid)

    base = jnp.floor_divide(src.coords, lattice)
    cin = src.num_channels
    feats = src.masked_feats()
    rows = []
    for d in _DELTAS:
        cand_lat = base + jnp.asarray(d, jnp.int32)
        cand_raw = cand_lat * lattice
        in_window = jnp.all(jnp.abs(src.coords - cand_raw) <= half, axis=-1)
        ok = src.valid & in_window
        rows.append(lookup(sorted_keys, row_of_rank, cand_lat, ok))
    if out.cap * src.cap <= _POOL_MATMUL_MAX:
        # Scatter-free: each (source, candidate-offset) pair targets at
        # most one output row and a source reaches a given output through
        # at most one offset, so the summed per-offset one-hots form a
        # 0/1 membership matrix M [out, src]; sum and count become ONE
        # MXU matmul instead of 27 scatter-adds (measured: the DAPPM
        # stage was 11.9 ms of the 53.5 ms eval backbone, dominated by
        # these scatters).  Dense M is small for the DAPPM pools
        # (<= 1024 x 2048 rows); larger tables keep the scatter path.
        tgt = jnp.arange(out.cap, dtype=jnp.int32)
        M = jnp.zeros((out.cap, src.cap), jnp.float32)
        for row in rows:
            M = M + (row[None, :] == tgt[:, None]).astype(jnp.float32)
        ssum = jnp.dot(M, feats, preferred_element_type=jnp.float32)
        cnt = jnp.sum(M, axis=1)
        mean = ssum / jnp.maximum(cnt, 1.0)[:, None]
    else:
        ssum = jnp.zeros((out.cap + 1, cin), src.feats.dtype)
        cnt = jnp.zeros((out.cap + 1,), jnp.int32)
        for row in rows:
            slot = jnp.where(row >= 0, row, out.cap)
            ssum = ssum.at[slot].add(
                jnp.where((row >= 0)[:, None], feats, 0.0))
            cnt = cnt.at[slot].add((row >= 0).astype(jnp.int32))
        mean = ssum[:out.cap] / jnp.maximum(cnt[:out.cap], 1)[:, None]
    mean = jnp.where(out.valid[:, None], mean, 0.0)
    return SparseTensor(out.coords, mean, out.valid, out.stride)


def interpolate_at(src: SparseTensor, query: jnp.ndarray,
                   query_valid: jnp.ndarray) -> jnp.ndarray:
    """Trilinear features at float raw-unit coordinates.  [Q, C]."""
    sorted_keys, row_of_rank = build_index(
        jnp.floor_divide(src.coords, src.stride), src.valid)
    p = query / src.stride
    c0 = jnp.floor(p).astype(jnp.int32)
    frac = p - c0
    out = jnp.zeros((query.shape[0], src.num_channels), jnp.float32)
    # bf16 rows for the 8 corner gathers (the HBM-bound cost; same
    # policy as the conv gathers, sparse_conv.gather_gemm) — weights and
    # accumulation stay f32
    feats = src.masked_feats().astype(jnp.bfloat16)
    for corner in _CORNERS:
        cc = jnp.asarray(corner, jnp.int32)
        w = jnp.prod(jnp.where(cc[None, :] == 1, frac, 1.0 - frac), axis=-1)
        row = lookup(sorted_keys, row_of_rank, c0 + cc[None, :], query_valid)
        f = take_rows(feats, jnp.maximum(row, 0)).astype(jnp.float32)
        out = out + jnp.where((row >= 0)[:, None], f * w[:, None], 0.0)
    return jnp.where(query_valid[:, None], out, 0.0)
