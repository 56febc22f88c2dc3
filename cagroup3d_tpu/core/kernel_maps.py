"""Kernel-map construction: the one primitive behind every sparse op.

MinkowskiEngine builds (input_row, output_row, kernel_offset) maps with a
GPU hash table; we build the equivalent *dense per-offset neighbor table*
``nbr[K^3, N_out]`` (row index into the source tensor, -1 = no neighbor)
with sorted-key binary search.  One primitive subsumes the reference's:

  * normal + strided convolution      (biresnet.py conv stacks)
  * transposed convolution            (biresnet.py:308-315 ``out`` block)
  * generative transposed convolution (cagroup_head.py:274 decode-at-coords)
  * convolution at arbitrary query coordinates
                                      (cagroup_roi_head.py:69 grid conv)
  * features_at_coordinates, K=1      (handled in pooling.interpolate_at)

Offset enumeration convention: ``itertools.product`` over axes x, y, z with
z fastest; odd kernels centered (-k//2..k//2), even kernels 0..k-1 (ME's
convention for even sizes).  Checkpoint converters permute reference
kernels into this order.
"""
from __future__ import annotations

import itertools
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from .hashing import build_index, lookup
from .sparse import SparseTensor


def kernel_offsets(kernel_size: int, dilation: int = 1) -> np.ndarray:
    """Static [K^3, 3] integer offsets in lattice units (z fastest)."""
    if kernel_size % 2 == 1:
        r = range(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = range(0, kernel_size)
    offs = np.array(list(itertools.product(r, r, r)), dtype=np.int32)
    return offs * dilation


def neighbor_table(src: SparseTensor, tgt_coords: jnp.ndarray,
                   tgt_valid: jnp.ndarray, offsets: np.ndarray) -> jnp.ndarray:
    """nbr i32[K, N_tgt]: source row at ``tgt + offset``, -1 when absent.

    ``offsets`` are in *raw coordinate units* (already multiplied by the
    appropriate stride).  A query only hits when the offset coordinate is
    divisible by the source stride (guards transposed-conv lattices).
    """
    offs = jnp.asarray(offsets, jnp.int32)  # [K, 3]
    sorted_keys, row_of_rank = build_index(
        jnp.floor_divide(src.coords, src.stride), src.valid)
    q = tgt_coords[None, :, :] + offs[:, None, :]  # [K, N, 3]
    div_ok = jnp.all(q % src.stride == 0, axis=-1)
    q_lat = jnp.floor_divide(q, src.stride)
    K, N = q.shape[0], q.shape[1]
    nbr = lookup(sorted_keys, row_of_rank,
                 q_lat.reshape(K * N, 3),
                 (div_ok & tgt_valid[None, :]).reshape(K * N))
    return nbr.reshape(K, N)


def neighbor_table_grouped(src: SparseTensor, tgt_coords: jnp.ndarray,
                           tgt_valid: jnp.ndarray, kernel_size: int
                           ) -> jnp.ndarray:
    """nbr i32[K^3, N] for an odd kernel whose offsets are multiples of the
    source stride (submanifold / strided conv / conv-at-aligned-coords).

    Uses the z-run window trick (hashing.lookup_z_window): one position
    search per (dx, dy) group instead of one per offset — K^2 searches
    for K^3 offsets.  Offset order matches kernel_offsets (z fastest).
    """
    from .hashing import build_index, lookup_z_window

    k = kernel_size
    assert k % 2 == 1
    h = k // 2
    s = src.stride
    sorted_keys, row_of_rank = build_index(
        jnp.floor_divide(src.coords, s), src.valid)
    N = tgt_coords.shape[0]
    base = jnp.floor_divide(tgt_coords, s)
    dz_list = list(range(-h, h + 1))
    rows = []
    for dx in range(-h, h + 1):
        # batch the k dy-groups of this dx in one lookup call
        bl = jnp.stack([base + jnp.asarray([dx, dy, 0], jnp.int32)
                        for dy in range(-h, h + 1)])       # [k, N, 3]
        nbr = lookup_z_window(sorted_keys, row_of_rank,
                              bl.reshape(k * N, 3),
                              jnp.broadcast_to(tgt_valid, (k, N)).reshape(-1),
                              dz_list)                     # [k(dz), k*N]
        nbr = nbr.reshape(k, k, N)                         # [dz, dy, N]
        rows.append(jnp.swapaxes(nbr, 0, 1))               # [dy, dz, N]
    return jnp.concatenate(rows, axis=0).reshape(k ** 3, N)


def conv_offsets(kernel_size: int, src_stride: int) -> np.ndarray:
    """Offsets for a (possibly strided) convolution: input-stride units."""
    return kernel_offsets(kernel_size) * src_stride


def transpose_offsets(kernel_size: int, out_stride: int) -> np.ndarray:
    """Offsets for (generative) transposed conv, already negated so that
    ``neighbor_table(src, tgt + off)`` finds the parent input voxel.

    ME semantics: input voxel i contributes to outputs i + o*out_stride for
    o in the kernel region, so the parent of output c at kernel index o is
    c - o*out_stride.
    """
    return -kernel_offsets(kernel_size) * out_stride
