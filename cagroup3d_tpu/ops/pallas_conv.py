"""Fused per-class submanifold sparse conv as a Mosaic (Pallas TPU) kernel.

Replaces the XLA gather path of ``core.sparse_conv.scan_conv_grouped_classes``
for the dense head's per-class K^3 convs (reference: the per-class
MinkowskiConvolution stacks, pcdet/models/dense_heads/cagroup_head.py:183-188
— the documented 180->400 ms per-class-loop regression, README.md:19).

The XLA path is HBM-bound: ~7 GB of 128-byte row gathers per k9 conv at
~38 GB/s effective.  This kernel keeps each class's table VMEM-resident and
converts every gather into MXU work:

1. **compute-then-gather**: per (class, dx, dy) one dense MXU matmul
   ``FWdz = feats @ W[dx, dy]`` (-> [N, K*Cout], dz-major columns) applies
   every dz weight slice to every row up front.  Gathering after the
   linear map is exact, and the matmul is dense.
2. **one-hot slab matmul**: query keys are the table keys plus a constant
   packed offset, so they stay sorted; a 128-query block's matches live in
   a contiguous rank window of the sorted table (bounds precomputed in
   XLA).  Packed keys are z-minor, so the K dz-neighbors of query q are
   the slab keys equal to tk_q + dz: a stacked equality one-hot
   E[SLAB, K, 128] contracted with the [SLAB, K*Cout] FW slab on the MXU
   performs all gathers of the block as ONE matmul, entirely in VMEM.
   A while-loop walks further slabs in the (rare) case a block's rank
   window exceeds one slab, so results are exact for any key distribution.

Requirements: coordinates sorted by packed key per class with invalid rows
at the end (what ``core.voxelize.unique_voxels_classes`` produces), stride
1 (per-class lattice units), N % 128 == 0, N >= SLAB.

Backward pass: exactness of the forward lets us take the VJP of the XLA
reference implementation (same function, different algorithm).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.hashing import INVALID_KEY, _BITS, _EXTENT, pack_coords

_LANE = 128
_SLAB = 256


def _conv_kernel(lohi_ref, keys_col_ref, keys_row_ref, feats_ref, w_ref,
                 out_ref, fw_scr, tk_scr, ztk_scr, *, K, C, Cout, N):
    h = K // 2
    NB = N // _LANE
    invalid = int(INVALID_KEY)
    zmask = _EXTENT - 1
    dxi = pl.program_id(1)

    @pl.when(dxi == 0)
    def _prologue():
        out_ref[0] = jnp.zeros((N, Cout), jnp.float32)

    dxo = dxi - h
    keys_row = keys_row_ref[0]                        # [NB, 128]
    xd = jax.lax.shift_right_logical(keys_row, 2 * _BITS)
    yd = jax.lax.shift_right_logical(keys_row, _BITS) & zmask
    valid_q = keys_row < invalid

    for dy in range(K):
        dyo = dy - h
        # FWdz = feats @ W[dx, dy]: [N, C] @ [C, K*Cout], dz-major columns
        fw_scr[:, :] = jax.lax.dot_general(
            feats_ref[0], w_ref[0, 0, dy],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        delta = dxo * (1 << (2 * _BITS)) + dyo * (1 << _BITS)
        ok = valid_q & (xd + dxo >= 0) & (xd + dxo < _EXTENT) & \
            (yd + dyo >= 0) & (yd + dyo < _EXTENT)
        tk_scr[:, :] = jnp.where(ok, keys_row + delta, -(1 << 29))
        ztk_scr[:, :] = jnp.where(ok, keys_row & zmask, -(1 << 29))

        def block(b, _, dy=dy):
            lo = lohi_ref[0, 0, dy, b, 0]
            hi = lohi_ref[0, 0, dy, b, 1]
            tkb = tk_scr[pl.ds(b, 1), :]              # [1, 128]
            ztkb = ztk_scr[pl.ds(b, 1), :]
            s0 = jnp.clip((lo - 8) & ~7, 0, N - _SLAB).astype(jnp.int32)

            def cond(c):
                return jnp.logical_not(c[1])

            def body(c):
                s, _, acc = c
                # s is 8-aligned by construction (s0 masked, += SLAB,
                # min with N-SLAB); Mosaic needs the hint to vector-load
                s = pl.multiple_of(s, 8)
                sk = keys_col_ref[0, pl.ds(s, _SLAB), :]   # [SLAB, 1]
                zs = sk & zmask
                d = sk - tkb                               # [SLAB, 128]
                zdl = zs - ztkb
                # per-dz one-hot: genuine z-neighbor iff both the packed
                # key and the z digit differ by exactly dz (the digit
                # check rejects borrows across the z field)
                fw = fw_scr[pl.ds(s, _SLAB), :]            # [SLAB, K*Cout]
                for dzi, dz in enumerate(range(-h, h + 1)):
                    e = ((d == dz) & (zdl == dz)).astype(jnp.bfloat16)
                    acc = acc + jax.lax.dot_general(
                        e, fw[:, dzi * Cout:(dzi + 1) * Cout],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [128, Cout]
                done = (s + _SLAB > hi) | (s >= N - _SLAB)
                nxt = jnp.minimum(s + _SLAB, N - _SLAB).astype(jnp.int32)
                return (nxt, done, acc)

            _, _, acc = jax.lax.while_loop(
                cond, body,
                (s0, s0 > hi, jnp.zeros((_LANE, Cout), jnp.float32)))
            q = pl.multiple_of(b * _LANE, _LANE)
            out_ref[0, pl.ds(q, _LANE), :] += acc
            return 0

        jax.lax.fori_loop(0, NB, block, 0)


def _rank_bounds(skeys, K):
    """Per-(class, dx, dy, 128-block) rank window [lo, hi] that can contain
    key matches tk+dz, dz in [-h, h].  All-XLA, flat gathers.

    skeys: i32[G, N] sorted per class.  Returns i32[G, K, K, NB, 2].
    """
    G, N = skeys.shape
    NB = N // _LANE
    h = K // 2
    rows = skeys.reshape(G, NB, _LANE)
    xd = jax.lax.shift_right_logical(rows, 2 * _BITS)
    yd = jax.lax.shift_right_logical(rows, _BITS) & (_EXTENT - 1)
    valid = rows < INVALID_KEY
    offs = jnp.arange(K, dtype=jnp.int32) - h                    # [K]
    okx = (xd[:, None] + offs[None, :, None, None] >= 0) & \
        (xd[:, None] + offs[None, :, None, None] < _EXTENT)     # [G,K,NB,L]
    oky = (yd[:, None] + offs[None, :, None, None] >= 0) & \
        (yd[:, None] + offs[None, :, None, None] < _EXTENT)
    delta = (offs[:, None] * (1 << (2 * _BITS)) +
             offs[None, :] * (1 << _BITS))                       # [K, K]
    tk = rows[:, None, None] + delta[None, :, :, None, None]
    ok = valid[:, None, None] & okx[:, :, None] & oky[:, None, :]
    big = jnp.int32(2 ** 30 + 2)
    tmin = jnp.min(jnp.where(ok, tk, big), axis=-1) - h          # [G,K,K,NB]
    tmax = jnp.max(jnp.where(ok, tk, -big), axis=-1) + h

    # counts: #keys < tmin  and  #keys <= tmax, flat two-level lookup
    R = N // _LANE
    k2 = skeys.reshape(G * R, _LANE)
    leads = skeys[:, ::_LANE]                                    # [G, R]
    Q = K * K * NB

    def counts(q, strict):                                       # q [G, Q]
        ge = q[..., None] >= leads[:, None, :]                   # [G, Q, R]
        r = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, R - 1)
        rowsq = jnp.take(k2, (r + (jnp.arange(G, dtype=jnp.int32) * R)
                              [:, None]).reshape(-1), axis=0)
        rowsq = rowsq.reshape(G, Q, _LANE)
        if strict:
            c = jnp.sum((rowsq < q[..., None]).astype(jnp.int32), axis=-1)
        else:
            c = jnp.sum((rowsq <= q[..., None]).astype(jnp.int32), axis=-1)
        return r * _LANE + c

    lo = counts(tmin.reshape(G, Q), strict=True)
    hi = counts(tmax.reshape(G, Q), strict=False) - 1
    return jnp.stack([lo, hi], axis=-1).reshape(G, K, K, NB, 2)


def _pallas_forward(coords, valid, feats, w, kernel_size: int):
    G, N, C = feats.shape
    K = kernel_size
    Cout = w.shape[-1]
    assert N % _LANE == 0 and N >= _SLAB, (N, _SLAB)
    NB = N // _LANE

    skeys = pack_coords(coords, valid)                           # [G, N]
    lohi = _rank_bounds(skeys, K)
    keys_col = skeys.reshape(G, N, 1)
    keys_row = skeys.reshape(G, NB, _LANE)
    featsb = jnp.where(valid[..., None], feats, 0.0).astype(jnp.bfloat16)
    # W [G, K(dx), K(dy), C, K(dz)*Cout]
    w2 = (w.astype(jnp.bfloat16)
          .reshape(G, K, K, K, C, Cout)        # [G, dx, dy, dz, C, O]
          .transpose(0, 1, 2, 4, 3, 5)         # [G, dx, dy, C, dz, O]
          .reshape(G, K, K, C, K * Cout))

    kern = functools.partial(_conv_kernel, K=K, C=C, Cout=Cout, N=N)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kern,
        grid=(G, K),
        in_specs=[
            pl.BlockSpec((1, 1, K, NB, 2), lambda g, dx: (g, dx, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N, 1), lambda g, dx: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, _LANE), lambda g, dx: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda g, dx: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K, C, K * Cout),
                         lambda g, dx: (g, dx, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, Cout), lambda g, dx: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N, K * Cout), jnp.bfloat16),
            pltpu.VMEM((NB, _LANE), jnp.int32),
            pltpu.VMEM((NB, _LANE), jnp.int32),
        ],
        # double-buffered blocks + the FW scratch can exceed the default
        # 16M scoped-vmem budget when this kernel sits in a large graph
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(lohi, keys_col, keys_row, featsb, w2)
    return jnp.where(valid[..., None], out, 0.0)


def subm_conv_classes_mxu(coords, valid, feats, w, kernel_size: int):
    """Per-class submanifold K^3 conv, MXU-fused forward + XLA-vjp backward.

    coords i32[G, N, 3] per-class lattice coords SORTED by packed key with
    invalid rows last (unique_voxels_classes layout); valid [G, N];
    feats [G, N, C]; w [G, K^3, C, Cout] in conv_offsets order
    (x-major, z-fastest).  Returns f32[G, N, Cout].
    """
    from ..core.sparse_conv import scan_conv_grouped_classes

    @jax.custom_vjp
    def f(coords, valid, feats, w):
        return _pallas_forward(coords, valid, feats, w, kernel_size)

    def fwd(coords, valid, feats, w):
        return f(coords, valid, feats, w), (coords, valid, feats, w)

    def bwd(res, g):
        coords, valid, feats, w = res
        _, vjp = jax.vjp(
            lambda fe, we: scan_conv_grouped_classes(
                coords, valid, fe, 1, kernel_size, we), feats, w)
        dfe, dwe = vjp(g)
        zc = np.zeros(coords.shape, jax.dtypes.float0)
        zv = np.zeros(valid.shape, jax.dtypes.float0)
        return zc, zv, dfe, dwe

    f.defvjp(fwd, bwd)
    return f(coords, valid, feats, w)
