"""Sorted-run segment sums as a Mosaic (Pallas TPU) kernel.

Serves the dense head's per-class fine re-voxelization
(core/voxelize.unique_voxels_classes_paired, the paired fine+expand map
build of reference cagroup_head.py:257-271): given per-class KEY-SORTED
rows, produce per-segment (= per unique key) feature sums and row counts
for the first ``cap`` segments.

The XLA formulation needs a [G, P, F] f32 two-level prefix scan plus
rank-search gathers (multiple full-array HBM passes over ~300 MB at head
shapes).  This kernel walks the sorted rows once, slab by slab, entirely
in VMEM:

1. slab-local run detection: head = key[i] != key[i-1] (previous slab's
   last key carried as a scalar), segment id = carried base + prefix sum
   of heads (log-step masked rolls — Mosaic has no cumsum lowering);
2. one-hot accumulate: segment ids of one slab span a window of at most
   SLAB+1 consecutive ids, so a [SLAB, W] id-match one-hot against the
   [SLAB, F] feature slab performs the whole slab's segment-sum as ONE
   MXU matmul, accumulated at the 8-aligned window base (same disjoint
   one-hot-add exactness argument as ops/pallas_conv.py);
3. early exit: the walk stops once ``cap`` segments are complete or the
   remaining rows are invalid (sorted last) — under capacity overflow
   (n_unique >> cap, the worst-case bench regime) most rows are never
   visited, which the XLA scan cannot do.

Counts ride a parallel [SLAB, 8] ones-matmul into a [cap, 8] buffer
(column 0 read back) — keeping them out of the feature matmul avoids
materializing a widened feature copy in HBM.

The row axis is CHUNKED over a second (sequential, minor) grid axis:
Mosaic lane-pads narrow blocks ((P, 1) keys to 128 lanes, (P, 64) feats
to 128), so whole-class blocks at head shapes (P = 131072) exceed
physical VMEM — measured 104.75M scoped demand at P = 65536.  Chunks of
8192 rows keep the resident set a few MB at any P; the run state (base,
prev key, stop) carries across chunks in SMEM scratch, which persists
across grid steps, and the output block (index map pinned to the class)
stays resident for accumulation.  HBM traffic is unchanged (DMAs read
the compact layout; padding exists only in VMEM).

Eval-only by construction: the cyclic overflow window used in training
(core/voxelize._window_ranks with drop_offset) intentionally emits
NON-consecutive ranks, which breaks invariant (2); the training path
keeps the XLA scan.  The chunk index comes from an SMEM iota input, NOT
pl.program_id (vmap safety rule, ops/pallas_conv.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.hashing import INVALID_KEY

_SLAB = 256
_W = 384          # covers the <= SLAB+1 segment window + 8-align slack
_CHUNK = 8192     # rows resident per grid step (VMEM, lane-padded)


def _segsum_kernel(cid_ref, keys_ref, feats_ref, out_ref, cnt_ref,
                   st_ref, *, CHUNK, F, cap):
    SLAB, W = _SLAB, _W
    NS = CHUNK // SLAB
    invalid = int(INVALID_KEY)

    @pl.when(cid_ref[0, 0, 0] == 0)
    def _init():
        out_ref[0] = jnp.zeros((cap + W, F), jnp.float32)
        cnt_ref[0] = jnp.zeros((cap + W, 8), jnp.float32)
        st_ref[0] = 0           # base: segments completed so far
        st_ref[1] = -1          # prev: last key of the previous slab
        st_ref[2] = 0           # stop: all valid rows consumed

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (SLAB, W), 1)
    ones8 = jnp.ones((SLAB, 8), jnp.bfloat16)

    base0, prev0, stop0 = st_ref[0], st_ref[1], st_ref[2]

    @pl.when((stop0 == 0) & (base0 < cap + 1))
    def _walk():
        def cond(c):
            i, base, prev, stop = c
            return (i < NS) & (base < cap + 1) & (stop == 0)

        def body(c):
            i, base, prev, _ = c
            s = pl.multiple_of(i * SLAB, SLAB)
            ks = keys_ref[0, pl.ds(s, SLAB), :]            # [SLAB, 1]
            fs = feats_ref[0, pl.ds(s, SLAB), :]           # [SLAB, F]
            valid = ks != invalid
            kprev = jnp.where(iota_r == 0, prev,
                              pltpu.roll(ks, 1, axis=0))
            head = (ks != kprev) & valid
            # inclusive prefix sum via log-step masked rolls; roll is
            # cyclic so wrapped rows are masked off
            csum = head.astype(jnp.int32)                  # [SLAB, 1]
            sh = 1
            while sh < SLAB:
                csum = csum + jnp.where(iota_r >= sh,
                                        pltpu.roll(csum, sh, axis=0), 0)
                sh *= 2
            uid = base + csum - 1
            sb = jnp.maximum(base - 1, 0)
            sb_al = pl.multiple_of((sb // 8) * 8, 8)
            keep = valid & (uid < cap)
            # one-hot via i32 broadcast arithmetic + full-shape compare
            # to a scalar: broadcasting an i1 [SLAB, 1] against
            # [SLAB, W] hits a Mosaic relayout bug ("Non-singleton
            # logical dimension is replicated"); [SLAB,1]-[SLAB,W] i32
            # subtract is the proven pattern from ops/pallas_conv.py
            qid = jnp.where(keep, uid, jnp.int32(-(1 << 20)))
            e = ((qid - sb_al - iota_w) == 0).astype(jnp.bfloat16)
            contrib = jax.lax.dot_general(
                e, fs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [W, F]
            ccontrib = jax.lax.dot_general(
                e, ones8, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [W, 8]
            out_ref[0, pl.ds(sb_al, W), :] += contrib
            cnt_ref[0, pl.ds(sb_al, W), :] += ccontrib
            nbase = base + jnp.sum(head.astype(jnp.int32))
            nprev = ks[SLAB - 1, 0]
            # sorted invalid-last: a slab whose first row is invalid
            # ends the class.  Scalar i32 compare — Mosaic cannot
            # squeeze bool vector elements to scalars.
            stop = (ks[0, 0] == invalid).astype(jnp.int32)
            return (i + 1, nbase, nprev, stop)

        _, base, prev, stop = jax.lax.while_loop(
            cond, body, (jnp.int32(0), base0, prev0, jnp.int32(0)))
        st_ref[0] = base
        st_ref[1] = prev
        st_ref[2] = stop


def sorted_segment_sums(sk: jnp.ndarray, feats_s: jnp.ndarray, cap: int,
                        interpret: bool | None = None):
    """Per-class segment sums/counts over key-sorted rows.

    sk i32[G, P] sorted packed keys (INVALID_KEY last); feats_s
    [G, P, F] sorted rows (any float dtype, summed in f32).  Returns
    (sums f32[G, cap, F], counts i32[G, cap]) for segments ranked
    0..cap-1 in key order — exactly the identity-window fine map of
    unique_voxels_classes_paired.
    """
    G, P = sk.shape
    F = feats_s.shape[-1]
    # largest divisor of P that fits the VMEM budget; gcd(P, _CHUNK) is
    # a multiple of _SLAB=256 whenever 256 | P (_CHUNK is 256 * 2^k)
    chunk = math.gcd(P, _CHUNK)
    assert chunk % _SLAB == 0 and cap % 8 == 0, (P, cap)
    nc = P // chunk
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_segsum_kernel, CHUNK=chunk, F=F, cap=cap)
    out, cnt = pl.pallas_call(
        kern,
        grid=(G, nc),
        in_specs=[
            # chunk index as data (vmap-safe program_id substitute).
            # SMEM blocks must keep the trailing dims equal to the
            # array's, so the index rides a (nc, 1, 1) array with the
            # grid axis leading.
            pl.BlockSpec((1, 1, 1), lambda g, c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, 1), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, F), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cap + _W, F), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap + _W, 8), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, cap + _W, F), jnp.float32),
            jax.ShapeDtypeStruct((G, cap + _W, 8), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((4,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(jnp.arange(nc, dtype=jnp.int32)[:, None, None], sk[..., None],
      feats_s.astype(jnp.bfloat16))
    return out[:, :cap], cnt[:, :cap, 0].astype(jnp.int32)
