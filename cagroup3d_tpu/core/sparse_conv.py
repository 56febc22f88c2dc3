"""Sparse convolution execution: gather -> MXU matmul -> accumulate.

Replaces MinkowskiEngine's sparse GEMM (``MinkowskiConvolution``,
``MinkowskiGenerativeConvolutionTranspose``, conv-at-query-coords).  The
kernel map is a dense per-offset neighbor table (kernel_maps.py); execution
scans the K^3 offsets, each step doing a [N, Cin] gather and an MXU matmul
against that offset's [Cin, Cout] weight slice, accumulating in f32.

Weight layout: ``w[K^3, Cin, Cout]`` (kernel-position major, matching the
offset order of kernel_maps.kernel_offsets).  The reference's ME kernels
are (K^3, Cin, Cout) too, modulo offset-order permutation handled by the
checkpoint converter.

A Pallas fast path (ops/pallas_conv.py) implements the same contraction
with the source features resident in VMEM; this module is the portable XLA
reference implementation and the autodiff path.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kernel_maps import conv_offsets, neighbor_table, transpose_offsets
from .sparse import SparseTensor
from .voxelize import stride_reduce_coords
from .gather import take_rows


def gather_gemm(feats: jnp.ndarray, nbr: jnp.ndarray, w: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                compute_dtype=jnp.float32) -> jnp.ndarray:
    """out[n] = sum_k feats[nbr[k, n]] @ w[k]  (missing neighbors skipped).

    feats: [N_src, Cin]; nbr: i32[K, N_out]; w: [K, Cin, Cout].
    """
    n_out = nbr.shape[1]
    cout = w.shape[-1]
    # cast BEFORE the gathers: the row gathers are the HBM-bound cost and
    # bf16 halves their traffic
    feats = feats.astype(compute_dtype)
    w = w.astype(compute_dtype)

    def step(acc, xs):
        w_k, nbr_k = xs
        f = take_rows(feats, jnp.maximum(nbr_k, 0))
        f = jnp.where((nbr_k >= 0)[:, None], f, 0.0)
        acc = acc + jnp.dot(f, w_k,
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((n_out, cout), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(step), acc0, (w, nbr))
    if bias is not None:
        out = out + bias
    return out


# ----------------------------------------------------------------------
# Scatter-free backward: each per-offset map n -> nbr[k, n] is a partial
# bijection (coord(out) + delta_k = coord(in) is injective in out for a
# fixed offset), so dL/dfeats is itself a gather-GEMM over the TRANSPOSED
# kernel map tnbr[k, i] = out row at coord(in) - delta_k, with w[k]^T.
# XLA's autodiff instead emits a scatter-add per offset, which lowers to
# a pathological TPU path (measured 1.9 s for ONE [65k, 64] site — vs
# ~2 ms for the equivalent gather).  dW re-gathers the forward rows
# (rematerialization; no residuals beyond the inputs).
# ----------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_gemm_t(feats, nbr, tnbr, w, bias, compute_dtype=jnp.float32):
    """gather_gemm with a known transpose table ``tnbr`` (see
    layers.py call sites; for submanifold convs tnbr = nbr[::-1])."""
    return gather_gemm(feats, nbr, w, bias, compute_dtype=compute_dtype)


def _ggt_fwd(feats, nbr, tnbr, w, bias, compute_dtype):
    out = gather_gemm(feats, nbr, w, bias, compute_dtype=compute_dtype)
    return out, (feats, nbr, tnbr, w, bias)


def _ggt_bwd(compute_dtype, res, g):
    feats, nbr, tnbr, w, bias = res
    cin = w.shape[1]
    # dfeats: gather-GEMM of g over the transposed map with w[k]^T
    w_t = jnp.swapaxes(w, 1, 2)                     # [K, Cout, Cin]
    dfeats = gather_gemm(g, tnbr, w_t, None,
                         compute_dtype=compute_dtype).astype(feats.dtype)
    # dW[k] = (masked gather of feats at nbr[k])^T @ g
    f16 = feats.astype(compute_dtype)
    g16 = g.astype(compute_dtype)

    def step(_, nbr_k):
        f = take_rows(f16, jnp.maximum(nbr_k, 0))
        f = jnp.where((nbr_k >= 0)[:, None], f, 0.0)
        dwk = jax.lax.dot_general(
            f, g16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [Cin, Cout]
        return None, dwk

    _, dw = jax.lax.scan(jax.checkpoint(step), None, nbr)
    dbias = None if bias is None else jnp.sum(g, axis=0).astype(bias.dtype)
    return (dfeats, _f0(nbr), _f0(tnbr), dw.astype(w.dtype), dbias)


gather_gemm_t.defvjp(_ggt_fwd, _ggt_bwd)


def scan_conv(src_coords: jnp.ndarray, src_valid: jnp.ndarray,
              src_feats: jnp.ndarray, src_stride: int,
              tgt_coords: jnp.ndarray, tgt_valid: jnp.ndarray,
              offsets: np.ndarray, w: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused kernel-map + conv: the coordinate lookup runs inside the
    offset scan, so no [K^3, N] neighbor table is materialized.  Used for
    large kernels (the dense head's k=9 per-class convs, 729 offsets,
    cagroup_head.py:184) where the table would dominate memory.
    """
    from .hashing import build_index, lookup

    sorted_keys, row_of_rank = build_index(
        jnp.floor_divide(src_coords, src_stride), src_valid)
    feats = jnp.where(src_valid[:, None], src_feats, 0.0)
    offs = jnp.asarray(offsets, jnp.int32)

    def step(acc, xs):
        off, w_k = xs
        q = tgt_coords + off[None, :]
        div_ok = jnp.all(q % src_stride == 0, axis=-1)
        row = lookup(sorted_keys, row_of_rank, jnp.floor_divide(q, src_stride),
                     div_ok & tgt_valid)
        f = take_rows(feats, jnp.maximum(row, 0))
        f = jnp.where((row >= 0)[:, None], f, 0.0)
        return acc + jnp.dot(f, w_k, preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((tgt_coords.shape[0], w.shape[-1]), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(step), acc0, (offs, w))
    if bias is not None:
        out = out + bias
    return jnp.where(tgt_valid[:, None], out, 0.0)


def scan_conv_grouped(src_coords, src_valid, src_feats, src_stride: int,
                      tgt_coords, tgt_valid, kernel_size: int,
                      w: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                      compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused grouped conv for odd kernels with stride-aligned targets.

    Scans over the K dx-planes; within a step the K dy-groups each do one
    z-run window lookup against an interleaved [keys|values] chunk table
    (two 128-lane row fetches answer all K dz offsets) and one
    [N, K*Cin] x [K*Cin, Cout] MXU contraction.  Feature gathers run in
    ``compute_dtype`` (bf16 halves the dominant gather traffic);
    accumulation stays f32.
    """
    from .hashing import INVALID_KEY, _MARGIN, key_extents, pack_coords
    _EXTENT = key_extents()[2]

    k = kernel_size
    assert k % 2 == 1
    h = k // 2
    s = src_stride
    M0 = src_coords.shape[0]
    pad = (-M0) % 64
    keys = pack_coords(jnp.floor_divide(src_coords, s), src_valid)
    if pad:
        keys = jnp.pad(keys, (0, pad), constant_values=int(INVALID_KEY))
    M = keys.shape[0]
    R2 = M // 64
    order = jnp.argsort(keys).astype(jnp.int32)
    skeys = keys[order]
    T, leads = _chunk_table(skeys[None], order[None])
    leads = leads[0]

    feats = jnp.where(src_valid[:, None], src_feats, 0.0).astype(compute_dtype)
    if pad:
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
    base = jnp.floor_divide(tgt_coords, s)
    zd0 = base[:, 2] + _MARGIN
    N = tgt_coords.shape[0]
    cout = w.shape[-1]
    dz_list = list(range(-h, h + 1))
    wr = w.astype(compute_dtype).reshape(k, k, k, w.shape[1], cout)

    def step(acc, dx):
        bl = base[None, :, :] + \
            jnp.stack([jnp.stack([dx, jnp.int32(dy), jnp.int32(0)])
                       for dy in range(-h, h + 1)])[:, None, :]
        qk = pack_coords(bl.reshape(k * N, 3),
                         jnp.broadcast_to(tgt_valid, (k, N)).reshape(-1))
        ge = qk[:, None] >= leads[None, :]
        c = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=1) - 1, 0, R2 - 1)
        row0 = take_rows(T, c)                              # [kN, 128]
        k0, v0 = row0[:, :64], row0[:, 64:]
        cnt = jnp.sum((k0 <= qk[:, None]).astype(jnp.int32), axis=1)
        adj = jnp.clip(jnp.where(cnt <= 32, c - 1, c + 1), 0, R2 - 1)
        row1 = take_rows(T, adj)
        k1 = jnp.where((adj == c)[:, None], INVALID_KEY, row1[:, :64])
        wk = jnp.concatenate([k0, k1], axis=1)              # [kN, 128]
        wv = jnp.concatenate([v0, row1[:, 64:]], axis=1)
        zdf = jnp.broadcast_to(zd0[None, :], (k, N)).reshape(-1)

        wslice = jax.lax.dynamic_index_in_dim(wr, dx + h, axis=0,
                                              keepdims=False)
        # resolve dz runs against the shared window
        nbr = []
        for dz in dz_list:
            tk = qk + dz
            ok = (qk != INVALID_KEY) & (zdf + dz >= 0) & (zdf + dz < _EXTENT)
            eq = wk == tk[:, None]
            hit = jnp.any(eq, axis=1) & ok
            val = jnp.sum(jnp.where(eq, wv, 0), axis=1)
            nbr.append(jnp.where(hit, val, -1))
        nbr = jnp.stack(nbr).reshape(k, k, N)               # [dz, dy, N]
        for dy in range(k):
            idx = nbr[:, dy, :]                              # [k(dz), N]
            g = take_rows(feats, jnp.maximum(idx, 0).reshape(-1))
            g = jnp.where((idx >= 0).reshape(-1)[:, None], g, 0)
            g = g.reshape(k, N, -1)                          # [dz, N, Cin]
            acc = acc + jax.lax.dot_general(
                jnp.swapaxes(g, 0, 1).reshape(N, -1),        # [N, k*Cin]
                wslice[dy].reshape(-1, cout),                # [k*Cin, Cout]
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((N, cout), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(step), acc0,
                          jnp.arange(-h, h + 1, dtype=jnp.int32))
    if bias is not None:
        out = out + bias
    return jnp.where(tgt_valid[:, None], out, 0.0)


def _f0(a):
    return np.zeros(a.shape, jax.dtypes.float0)


def _dw_only(fn_of_w, w, g):
    """dL/dw of fn_of_w at w given cotangent g.  Features are captured
    constants, so no feature scatter appears in this VJP."""
    _, pb = jax.vjp(fn_of_w, w)
    return pb(g)[0]


def _w_rev_t(w):
    """Reverse the kernel axis (offset negation under the lexicographic
    stencil enumeration) and transpose Cin/Cout: the weights of the
    transposed conv that IS the feature backward of a submanifold conv."""
    return jnp.swapaxes(w[..., ::-1, :, :], -1, -2)


def scan_conv_grouped_t(src_coords, src_valid, src_feats, src_stride: int,
                        tgt_coords, tgt_valid, kernel_size: int, w,
                        compute_dtype=jnp.bfloat16):
    """scan_conv_grouped with the scatter-free backward: both coordinate
    sets live on the same stride lattice, so dL/dfeats is the SAME
    grouped conv run in the opposite direction with offset-reversed,
    transposed weights.  dW comes from a w-only VJP (no scatters).

    NB: coordinate/mask arrays are explicit custom_vjp arguments (float0
    cotangents) — closing over them breaks under vmap."""

    @jax.custom_vjp
    def f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return scan_conv_grouped(src_coords, src_valid, src_feats,
                                 src_stride, tgt_coords, tgt_valid,
                                 kernel_size, w,
                                 compute_dtype=compute_dtype)

    def fwd(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return (f(src_coords, src_valid, tgt_coords, tgt_valid,
                  src_feats, w),
                (src_coords, src_valid, tgt_coords, tgt_valid, src_feats,
                 w))

    def bwd(res, g):
        src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w = res
        g = jnp.where(tgt_valid[:, None], g, 0.0)
        df = scan_conv_grouped(tgt_coords, tgt_valid, g, src_stride,
                               src_coords, src_valid, kernel_size,
                               _w_rev_t(w), compute_dtype=compute_dtype
                               ).astype(src_feats.dtype)
        dw = _dw_only(
            lambda ww: scan_conv_grouped(
                src_coords, src_valid, src_feats, src_stride, tgt_coords,
                tgt_valid, kernel_size, ww, compute_dtype=compute_dtype),
            w, g)
        return (_f0(src_coords), _f0(src_valid), _f0(tgt_coords),
                _f0(tgt_valid), df, dw)

    f.defvjp(fwd, bwd)
    return f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w)


def scan_conv_grouped_classes_t(coords, valid, feats, stride: int,
                                kernel_size: int, w,
                                compute_dtype=jnp.bfloat16,
                                w_groups: int = 0):
    """scan_conv_grouped_classes with the scatter-free backward (same
    construction: submanifold => transpose = reversed-offset conv)."""

    @jax.custom_vjp
    def f(coords, valid, feats, w):
        return scan_conv_grouped_classes(coords, valid, feats, stride,
                                         kernel_size, w,
                                         compute_dtype=compute_dtype,
                                         w_groups=w_groups)

    def fwd(coords, valid, feats, w):
        return f(coords, valid, feats, w), (coords, valid, feats, w)

    def bwd(res, g):
        coords, valid, feats, w = res
        g = jnp.where(valid[..., None], g, 0.0)
        df = scan_conv_grouped_classes(coords, valid, g, stride,
                                       kernel_size, _w_rev_t(w),
                                       compute_dtype=compute_dtype,
                                       w_groups=w_groups
                                       ).astype(feats.dtype)
        dw = _dw_only(
            lambda ww: scan_conv_grouped_classes(
                coords, valid, feats, stride, kernel_size, ww,
                compute_dtype=compute_dtype, w_groups=w_groups), w, g)
        return _f0(coords), _f0(valid), df, dw

    f.defvjp(fwd, bwd)
    return f(coords, valid, feats, w)


def scan_conv_at_classes_t(src_coords, src_valid, src_feats,
                           src_stride: int, tgt_coords, tgt_valid,
                           offsets: np.ndarray, w, tgt_stride: int = 1,
                           compute_dtype=jnp.bfloat16, w_groups: int = 0):
    """scan_conv_at_classes with the scatter-free backward: dL/dfeats is
    the same per-class conv-at-coords run tgt->src with NEGATED offsets
    and per-offset-transposed weights (no kernel-axis reversal — the
    offsets are explicit)."""

    @jax.custom_vjp
    def f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return scan_conv_at_classes(src_coords, src_valid, src_feats,
                                    src_stride, tgt_coords, tgt_valid,
                                    offsets, w,
                                    compute_dtype=compute_dtype,
                                    w_groups=w_groups)

    def fwd(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return (f(src_coords, src_valid, tgt_coords, tgt_valid,
                  src_feats, w),
                (src_coords, src_valid, tgt_coords, tgt_valid, src_feats,
                 w))

    def bwd(res, g):
        src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w = res
        g = jnp.where(tgt_valid[..., None], g, 0.0)
        df = scan_conv_at_classes(tgt_coords, tgt_valid, g, tgt_stride,
                                  src_coords, src_valid, -offsets,
                                  jnp.swapaxes(w, -1, -2),
                                  compute_dtype=compute_dtype,
                                  w_groups=w_groups
                                  ).astype(src_feats.dtype)
        dw = _dw_only(
            lambda ww: scan_conv_at_classes(
                src_coords, src_valid, src_feats, src_stride, tgt_coords,
                tgt_valid, offsets, ww, compute_dtype=compute_dtype,
                w_groups=w_groups),
            w, g)
        return (_f0(src_coords), _f0(src_valid), _f0(tgt_coords),
                _f0(tgt_valid), df, dw)

    f.defvjp(fwd, bwd)
    return f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w)


def generative_up_classes_t(src_coords, src_valid, src_feats, factor: int,
                            tgt_coords, tgt_valid, w,
                            compute_dtype=jnp.bfloat16, w_groups: int = 0):
    """generative_up_classes with the scatter-free backward.  Each fine
    voxel has one (parent, slot-j) pair with j equal to the ascending
    enumeration index of d = fine - parent_raw, so dL/dsrc is a per-class
    conv-at-coords over the fine table with centered kernel_offsets and
    per-slot transposed weights (odd factor only — the head's expand=3)."""
    if factor % 2 == 0:
        return generative_up_classes(src_coords, src_valid, src_feats,
                                     factor, tgt_coords, tgt_valid, w,
                                     compute_dtype=compute_dtype,
                                     w_groups=w_groups)

    @jax.custom_vjp
    def f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return generative_up_classes(src_coords, src_valid, src_feats,
                                     factor, tgt_coords, tgt_valid, w,
                                     compute_dtype=compute_dtype,
                                     w_groups=w_groups)

    def fwd(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w):
        return (f(src_coords, src_valid, tgt_coords, tgt_valid,
                  src_feats, w),
                (src_coords, src_valid, tgt_coords, tgt_valid, src_feats,
                 w))

    def bwd(res, g):
        src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w = res
        g = jnp.where(tgt_valid[..., None], g, 0.0)
        from .kernel_maps import kernel_offsets
        df = scan_conv_at_classes(tgt_coords, tgt_valid, g, 1,
                                  src_coords, src_valid,
                                  kernel_offsets(factor),
                                  jnp.swapaxes(w, -1, -2),
                                  compute_dtype=compute_dtype,
                                  w_groups=w_groups
                                  ).astype(src_feats.dtype)
        dw = _dw_only(
            lambda ww: generative_up_classes(
                src_coords, src_valid, src_feats, factor, tgt_coords,
                tgt_valid, ww, compute_dtype=compute_dtype,
                w_groups=w_groups), w, g)
        return (_f0(src_coords), _f0(src_valid), _f0(tgt_coords),
                _f0(tgt_valid), df, dw)

    f.defvjp(fwd, bwd)
    return f(src_coords, src_valid, tgt_coords, tgt_valid, src_feats, w)


def _chunk_table(skeys, svals):
    """Interleaved lookup table: each physical 128-lane row holds a
    64-key sorted chunk and its 64 values ([keys | values]), so one row
    gather fetches both.  skeys/svals [G, N] -> (T [G*R2, 128],
    leads [G, R2]) with R2 = N // 64."""
    G, N = skeys.shape
    R2 = N // 64
    k64 = skeys.reshape(G * R2, 64)
    v64 = svals.reshape(G * R2, 64)
    return jnp.concatenate([k64, v64], axis=1), skeys[:, ::64]


def scan_conv_grouped_classes(coords, valid, feats, stride: int,
                              kernel_size: int, w,
                              compute_dtype=jnp.bfloat16,
                              w_groups: int = 0) -> jnp.ndarray:
    """Per-class grouped submanifold conv with the class axis FLATTENED
    out of every gather.

    The dense head's per-class maps (cagroup_head.py class-aware grouping)
    could be vmapped over classes, but batched gathers scalarize on TPU.
    Instead all per-class sorted tables are laid out in one flat array and
    row indices get a static class offset, so stage-A/B lookups, window
    fetches and feature gathers are all plain flat row-gathers.

    coords i32[G, N, 3] (lattice units, stride==1 semantics handled by
    caller), valid [G, N], feats [G, N, C], w [G, K^3, Cin, Cout].
    Returns [G, N, Cout] f32.

    w_groups > 0: scene-folded mode — the tables carry G = B * w_groups
    groups (scenes folded into the class axis by core/scene_fold.py) but
    w has only w_groups rows, shared across scenes; the weight-apply
    einsums reshape instead of tiling the (large k^3) weights.
    """
    from .hashing import (INVALID_KEY, _LANE, _MARGIN, key_extents,
                          pack_coords)
    _EXTENT = key_extents()[2]

    G, N, Cin = feats.shape
    k = kernel_size
    assert k % 2 == 1
    h = k // 2
    cout = w.shape[-1]
    assert N % _LANE == 0, "per-class capacity must be a multiple of 128"
    R2 = N // 64

    # per-class sorted tables in interleaved [keys|values] 128-lane rows
    keys = pack_coords(jnp.floor_divide(coords, stride), valid)   # [G, N]
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    skeys = jnp.take_along_axis(keys, order, axis=1)
    T, leads = _chunk_table(skeys, order)

    feats_flat = jnp.where(valid[..., None], feats, 0.0).astype(
        compute_dtype).reshape(G * N, Cin)
    base = jnp.floor_divide(coords, stride)
    cls_row0 = (jnp.arange(G, dtype=jnp.int32) * R2)[:, None, None]
    cls_feat0 = (jnp.arange(G, dtype=jnp.int32) * N)[:, None, None]
    zd = base[..., 2] + _MARGIN               # [G, N]
    Gw = w_groups or G
    assert G % Gw == 0 and w.shape[0] == Gw, (G, Gw, w.shape)
    wr = w.astype(compute_dtype).reshape(Gw, k, k, k, Cin, cout)
    dz_list = list(range(-h, h + 1))

    def step(acc, dx):
        # bases for the k dy-groups: [G, k, N, 3]
        dyo = jnp.stack([jnp.stack([dx, jnp.int32(dy), jnp.int32(0)])
                         for dy in range(-h, h + 1)])          # [k, 3]
        bl = base[:, None, :, :] + dyo[None, :, None, :]
        qk = pack_coords(bl, jnp.broadcast_to(valid[:, None, :],
                                              (G, k, N)))     # [G, k, N]
        # stage A: 64-chunk within class by lead counting
        ge = qk[..., None] >= leads[:, None, None, :]          # [G,k,N,R2]
        c = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, R2 - 1)
        row0 = take_rows(T, (c + cls_row0).reshape(-1))     # [Q, 128]
        k0, v0 = row0[:, :64], row0[:, 64:]
        qkf = qk.reshape(-1)
        cf = (c + cls_row0).reshape(-1)
        cnt = jnp.sum((k0 <= qkf[:, None]).astype(jnp.int32), axis=1)
        # adjacent chunk on the side the +-h window can spill to
        low_side = cnt <= 32
        cl = c.reshape(-1)
        adj = jnp.where(low_side, cl - 1, cl + 1)
        adj = jnp.clip(adj, 0, R2 - 1)
        dup = adj == cl
        row1 = take_rows(T, (adj + (cf - cl)).reshape(-1))
        k1 = jnp.where(dup[:, None], INVALID_KEY, row1[:, :64])
        wk = jnp.concatenate([k0, k1], axis=1)                 # [Q, 128]
        wv = jnp.concatenate([v0, row1[:, 64:]], axis=1)
        zdf = jnp.broadcast_to(zd[:, None, :], (G, k, N)).reshape(-1)

        wslice = jax.lax.dynamic_index_in_dim(
            jnp.swapaxes(wr, 0, 1), dx + h, axis=0, keepdims=False)
        # wslice: [G, k(dy), k(dz), Cin, Cout]
        for dzi, dz in enumerate(dz_list):
            tk = qkf + dz
            ok = (qkf != INVALID_KEY) & (zdf + dz >= 0) & \
                (zdf + dz < _EXTENT)
            eq = wk == tk[:, None]
            hit = jnp.any(eq, axis=1) & ok
            row = jnp.sum(jnp.where(eq, wv, 0), axis=1)        # [G*k*N]
            row = row.reshape(G, k, N) + cls_feat0
            g = take_rows(feats_flat, row.reshape(-1))
            g = jnp.where(hit[:, None], g, 0).reshape(G, k, N, Cin)
            # accumulate: per class and dy-group matmul on MXU
            if Gw != G:      # scene-folded: scenes share each class's w
                # standard shared-batch dot shape: fold scenes into the
                # row axis ([Gw, d, B*N, C]) — the bgdnc,gdco form lowers
                # to an unsupported mixed-batch dot on the CPU backend
                Bs = G // Gw
                gb = jnp.swapaxes(g.reshape(Bs, Gw, k, N, Cin), 0, 1)
                gb = jnp.swapaxes(gb, 1, 2).reshape(Gw, k, Bs * N, Cin)
                ab = jnp.einsum("gdnc,gdco->gno", gb, wslice[:, :, dzi],
                                preferred_element_type=jnp.float32)
                ab = jnp.swapaxes(ab.reshape(Gw, Bs, N, cout), 0, 1)
                acc = acc + ab.reshape(G, N, cout)
            else:
                acc = acc + jnp.einsum(
                    "gdnc,gdco->gno", g, wslice[:, :, dzi],
                    preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((G, N, cout), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(step), acc0,
                          jnp.arange(-h, h + 1, dtype=jnp.int32))
    return jnp.where(valid[..., None], out, 0.0)


def scan_conv_at_classes(src_coords, src_valid, src_feats, src_stride: int,
                         tgt_coords, tgt_valid, offsets: np.ndarray, w,
                         compute_dtype=jnp.bfloat16,
                         w_groups: int = 0) -> jnp.ndarray:
    """Per-class conv at target coords with explicit offsets (covers the
    generative transposed conv of the head's expand path), class axis
    flattened out of every gather like scan_conv_grouped_classes.

    src_* [G, M, ...]; tgt_* [G, N, ...]; offsets raw-unit i32[K, 3]
    (sign convention of the caller); w [G, K, Cin, Cout]; w_groups as in
    scan_conv_grouped_classes (scene-folded weight sharing).
    """
    from .hashing import INVALID_KEY, _LANE, pack_coords

    G, M, Cin = src_feats.shape
    N = tgt_coords.shape[1]
    K = offsets.shape[0]
    cout = w.shape[-1]
    assert M % _LANE == 0
    R2 = M // 64

    keys = pack_coords(jnp.floor_divide(src_coords, src_stride), src_valid)
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    skeys = jnp.take_along_axis(keys, order, axis=1)
    T, leads = _chunk_table(skeys, order)
    feats_flat = jnp.where(src_valid[..., None], src_feats, 0.0).astype(
        compute_dtype).reshape(G * M, Cin)
    cls_row0 = (jnp.arange(G, dtype=jnp.int32) * R2)[:, None]
    cls_feat0 = (jnp.arange(G, dtype=jnp.int32) * M)[:, None]
    offs = jnp.asarray(offsets, jnp.int32)
    Gw = w_groups or G
    assert G % Gw == 0 and w.shape[0] == Gw, (G, Gw, w.shape)
    wc = w.astype(compute_dtype)

    def step(acc, xs):
        off, w_k = xs
        q = tgt_coords + off[None, None, :]
        div_ok = jnp.all(q % src_stride == 0, axis=-1)
        qk = pack_coords(jnp.floor_divide(q, src_stride),
                         tgt_valid & div_ok)                  # [G, N]
        # exact match lives in its lead chunk: one combined-row fetch
        ge = qk[..., None] >= leads[:, None, :]
        c = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, R2 - 1)
        row = take_rows(T, (c + cls_row0).reshape(-1))      # [Q, 128]
        rows_k, rows_v = row[:, :64], row[:, 64:]
        qf = qk.reshape(-1)
        eq = rows_k == qf[:, None]
        hit = jnp.any(eq, axis=1) & (qf != INVALID_KEY)
        row = jnp.sum(jnp.where(eq, rows_v, 0), axis=1).reshape(G, N)
        g = take_rows(feats_flat, (row + cls_feat0).reshape(-1))
        g = jnp.where(hit[:, None], g, 0).reshape(G, N, Cin)
        if Gw != G:          # scene-folded weight sharing
            Bs = G // Gw
            gb = jnp.swapaxes(g.reshape(Bs, Gw, N, Cin), 0, 1)
            ab = jnp.einsum("gnc,gco->gno", gb.reshape(Gw, Bs * N, Cin),
                            w_k, preferred_element_type=jnp.float32)
            ab = jnp.swapaxes(ab.reshape(Gw, Bs, N, -1), 0, 1)
            acc = acc + ab.reshape(G, N, -1)
        else:
            acc = acc + jnp.einsum("gnc,gco->gno", g, w_k,
                                   preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((G, N, cout), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(step), acc0,
                          (offs, jnp.swapaxes(wc, 0, 1)))
    return jnp.where(tgt_valid[..., None], out, 0.0)


def subm_conv(src: SparseTensor, w: jnp.ndarray,
              bias: Optional[jnp.ndarray] = None,
              kernel_size: int = 3) -> SparseTensor:
    """Submanifold conv: output coords == input coords (stride 1 conv)."""
    offs = conv_offsets(kernel_size, src.stride)
    nbr = neighbor_table(src, src.coords, src.valid, offs)
    feats = gather_gemm(src.masked_feats(), nbr, w, bias)
    feats = jnp.where(src.valid[:, None], feats, 0.0)
    return src.with_feats(feats)


def strided_conv(src: SparseTensor, w: jnp.ndarray,
                 bias: Optional[jnp.ndarray], kernel_size: int,
                 factor: int, out_cap: int) -> SparseTensor:
    """Downsampling conv (ME stride=factor): coords stride-reduced."""
    out, _ = stride_reduce_coords(src, factor, out_cap)
    offs = conv_offsets(kernel_size, src.stride)
    nbr = neighbor_table(src, out.coords, out.valid, offs)
    feats = gather_gemm(src.masked_feats(), nbr, w, bias)
    feats = jnp.where(out.valid[:, None], feats, 0.0)
    return SparseTensor(out.coords, feats, out.valid, out.stride)


def conv_at_coords(src: SparseTensor, tgt_coords: jnp.ndarray,
                   tgt_valid: jnp.ndarray, w: jnp.ndarray,
                   bias: Optional[jnp.ndarray], kernel_size: int,
                   out_stride: Optional[int] = None) -> SparseTensor:
    """Convolution evaluated at arbitrary target coordinates.

    ME analogue: ``conv(sp_tensor, query_coords)`` as used by the RoI
    pooling layer (cagroup_roi_head.py:69) and DAPPM/backbone fusions.
    Offsets are in source-stride units (normal conv semantics).
    """
    offs = conv_offsets(kernel_size, src.stride)
    nbr = neighbor_table(src, tgt_coords, tgt_valid, offs)
    feats = gather_gemm(src.masked_feats(), nbr, w, bias)
    feats = jnp.where(tgt_valid[:, None], feats, 0.0)
    return SparseTensor(tgt_coords, feats, tgt_valid,
                        out_stride if out_stride is not None else src.stride)


def transposed_conv(src: SparseTensor, tgt_coords: jnp.ndarray,
                    tgt_valid: jnp.ndarray, w: jnp.ndarray,
                    bias: Optional[jnp.ndarray], kernel_size: int,
                    up_factor: int) -> SparseTensor:
    """(Generative) transposed conv decoded at given target coordinates.

    Covers both ME ``MinkowskiConvolutionTranspose`` (targets = an existing
    finer coordinate map, biresnet.py:309) and
    ``MinkowskiGenerativeConvolutionTranspose`` called with explicit output
    coords (cagroup_head.py:274).  ``up_factor`` = ME stride;
    out_stride = src.stride // up_factor.
    """
    assert src.stride % up_factor == 0
    out_stride = src.stride // up_factor
    offs = transpose_offsets(kernel_size, out_stride)
    nbr = neighbor_table(src, tgt_coords, tgt_valid, offs)
    feats = gather_gemm(src.masked_feats(), nbr, w, bias)
    feats = jnp.where(tgt_valid[:, None], feats, 0.0)
    return SparseTensor(tgt_coords, feats, tgt_valid, out_stride)


def generative_up_classes(src_coords, src_valid, src_feats, factor: int,
                          tgt_coords, tgt_valid, w,
                          compute_dtype=jnp.bfloat16,
                          w_groups: int = 0) -> jnp.ndarray:
    """Generative transposed conv with kernel_size == stride == factor:
    every target voxel has EXACTLY ONE (parent, kernel-offset) pair, so the
    K^3-offset scan of scan_conv_at_classes collapses to one parent lookup,
    one row gather, and a K^3-way one-hot weight contraction.  Covers the
    dense head's expand decode (MinkowskiGenerativeConvolutionTranspose
    k=s=EXPAND_RATIO at the fine coords, cagroup_head.py:274).

    src_coords i32[G, M, 3] in RAW target units (parent lattice = coords /
    factor), sorted per class; tgt_* [G, N, ...]; w [G, K^3, Cin, Cout] in
    transpose_offsets order.  Returns f32[G, N, Cout].
    """
    from .hashing import INVALID_KEY, pack_coords

    G, M, Cin = src_feats.shape
    N = tgt_coords.shape[1]
    K3 = w.shape[1]
    k = round(K3 ** (1 / 3))
    assert k == factor and k ** 3 == K3
    Cout = w.shape[-1]

    # parent + kernel index: offset o with (t + o) % k == 0 per axis;
    # transpose_offsets[j] = -(a, b, c) with j = (a+1)*k^2+(b+1)*k+(c+1)
    h = k // 2
    r = jnp.mod(tgt_coords, k)                       # [G, N, 3] in [0, k)
    o = jnp.mod(-r, k)
    o = jnp.where(o > h, o - k, o)                   # centered offset
    digits = -o + h                                  # (a+1) etc for k=3
    j_idx = (digits[..., 0] * k + digits[..., 1]) * k + digits[..., 2]
    parent = jnp.floor_divide(tgt_coords + o, k)

    # flat two-level lookup of the parent row per class
    keys = pack_coords(jnp.floor_divide(src_coords, k), src_valid)
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    sk = jnp.take_along_axis(keys, order, axis=1)
    R = M // 128
    k2 = sk.reshape(G * R, 128)
    v2 = order.reshape(G * R, 128)
    leads = sk[:, ::128]
    qk = pack_coords(parent, tgt_valid)
    ge = qk[..., None] >= leads[:, None, :]
    c = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, R - 1)
    rowsel = (c + (jnp.arange(G, dtype=jnp.int32) * R)[:, None]).reshape(-1)
    rows_k = take_rows(k2, rowsel).reshape(G, N, 128)
    rows_v = take_rows(v2, rowsel).reshape(G, N, 128)
    eq = rows_k == qk[..., None]
    hit = jnp.any(eq, axis=-1) & (qk != INVALID_KEY)
    row = jnp.sum(jnp.where(eq, rows_v, 0), axis=-1)

    feats_flat = jnp.where(src_valid[..., None], src_feats, 0.0).astype(
        compute_dtype).reshape(G * M, Cin)
    rowf = row + (jnp.arange(G, dtype=jnp.int32) * M)[:, None]
    fpar = take_rows(feats_flat, rowf.reshape(-1)).reshape(G, N, Cin)
    fpar = jnp.where(hit[..., None], fpar, 0)

    Gw = w_groups or G
    assert G % Gw == 0 and w.shape[0] == Gw, (G, Gw, w.shape)
    wc = w.astype(compute_dtype)
    acc = jnp.zeros((G, N, Cout), jnp.float32)
    for j in range(K3):
        sel = (j_idx == j) & hit
        fj = jnp.where(sel[..., None], fpar, 0)
        if Gw != G:          # scene-folded weight sharing
            Bs = G // Gw
            fb = jnp.swapaxes(fj.reshape(Bs, Gw, N, Cin), 0, 1)
            ab = jnp.einsum("gnc,gco->gno", fb.reshape(Gw, Bs * N, Cin),
                            wc[:, j], preferred_element_type=jnp.float32)
            ab = jnp.swapaxes(ab.reshape(Gw, Bs, N, Cout), 0, 1)
            acc = acc + ab.reshape(G, N, Cout)
        else:
            acc = acc + jnp.einsum("gnc,gco->gno", fj, wc[:, j],
                                   preferred_element_type=jnp.float32)
    return jnp.where(tgt_valid[..., None], acc, 0.0)
