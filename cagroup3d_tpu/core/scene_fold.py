"""Scene-axis folding for the grouped sparse-conv ops.

The grouped ops (sparse_conv.scan_conv_grouped_classes family,
ops/pallas_conv.subm_conv_classes_mxu) deliberately FLATTEN their group
axis out of every gather — per-class tables live in one flat array and
row indices get static group offsets, so lookups are plain flat row
gathers (the fast TPU shape).  Under the detector's per-scene
``jax.vmap``, every one of those gathers re-gains a leading batch
dimension and falls back onto slower batched paths, and the Pallas
kernels' VMEM working set grows with the per-device batch (the round-2
"vmap tax" on training throughput).

These wrappers attach a ``jax.custom_batching.custom_vmap`` rule that
FOLDS the vmapped scene axis into the group axis instead: a batched
call over ``[B, G, N, ...]`` tables becomes ONE flat call over
``[B*G, N, ...]`` with the (unbatched, shared) weights applied through
``w_groups`` — no weight tiling, flat gathers stay flat, and the Pallas
grid runs one class-table per step regardless of B.

Semantics: identical to ``vmap`` of the raw op (groups never interact
inside the ops).  Caveat inherited from ``custom_vmap``: reverse-mode AD
through an UNBATCHED call of these wrappers is unsupported — use the raw
``sparse_conv`` functions for unbatched gradients (training always
differentiates through the scene vmap, eval takes no gradients).
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def _fold(x, B, batched):
    """[B, G, ...] -> [B*G, ...]; broadcast unbatched args first."""
    if not batched:
        x = jnp.broadcast_to(x[None], (B,) + x.shape)
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def _w_mode(w, B, batched, G):
    """(folded_w, w_groups): batched weights fold like tables; shared
    weights stay [G] and fold via w_groups."""
    if batched:
        return _fold(w, B, True), 0
    return w, G


@lru_cache(maxsize=None)
def _grouped_classes_t(stride: int, kernel_size: int):
    from .sparse_conv import scan_conv_grouped_classes_t as raw

    @custom_vmap
    def f(coords, valid, feats, w):
        return raw(coords, valid, feats, stride, kernel_size, w)

    @f.def_vmap
    def rule(axis_size, in_batched, coords, valid, feats, w):
        cb, vb, fb, wb = in_batched
        B = axis_size
        G = (coords.shape[1] if cb else coords.shape[0])
        wf, wg = _w_mode(w, B, wb, G)
        out = raw(_fold(coords, B, cb), _fold(valid, B, vb),
                  _fold(feats, B, fb), stride, kernel_size, wf,
                  w_groups=wg)
        return out.reshape((B, G) + out.shape[1:]), True

    return f


def folded_grouped_classes_t(coords, valid, feats, stride, kernel_size,
                             w):
    """scan_conv_grouped_classes_t with scene-vmap folding."""
    return _grouped_classes_t(int(stride), int(kernel_size))(
        coords, valid, feats, w)


@lru_cache(maxsize=None)
def _subm_mxu(kernel_size: int, stride: int, train: bool = False):
    from ..ops.pallas_conv import subm_conv_classes_mxu as raw

    @custom_vmap
    def f(coords, valid, feats, w):
        return raw(coords, valid, feats, w, kernel_size, stride,
                   train=train)

    @f.def_vmap
    def rule(axis_size, in_batched, coords, valid, feats, w):
        cb, vb, fb, wb = in_batched
        B = axis_size
        G = (coords.shape[1] if cb else coords.shape[0])
        wf, wg = _w_mode(w, B, wb, G)
        out = raw(_fold(coords, B, cb), _fold(valid, B, vb),
                  _fold(feats, B, fb), wf, kernel_size, stride,
                  w_groups=wg, train=train)
        return out.reshape((B, G) + out.shape[1:]), True

    return f


def folded_subm_mxu(coords, valid, feats, w, kernel_size, stride=1,
                    train: bool = False):
    """subm_conv_classes_mxu with scene-vmap folding (the Pallas grid
    grows to B*G steps; per-step VMEM stays one class table).  ``train``
    is the caller's ctx.train: it picks the walk-block width
    (ops/pallas_conv._qw_for)."""
    return _subm_mxu(int(kernel_size), int(stride),
                     bool(train))(coords, valid, feats, w)


@lru_cache(maxsize=None)
def _subm_single_mxu(kernel_size: int, stride: int, train: bool = False):
    from ..ops.pallas_conv import (subm_conv_classes_mxu,
                                   subm_conv_mxu as raw_single)

    @custom_vmap
    def f(coords, valid, feats, w):
        return raw_single(coords, valid, feats, w, kernel_size, stride,
                          train=train)

    @f.def_vmap
    def rule(axis_size, in_batched, coords, valid, feats, w):
        cb, vb, fb, wb = in_batched
        B = axis_size

        def b(x, batched):
            return x if batched else jnp.broadcast_to(x[None],
                                                      (B,) + x.shape)

        # scenes become the group axis (G = B); shared weights ride
        # w_groups=1, so the Pallas grid runs one scene-table per step
        # and per-step VMEM no longer grows with the batch
        out = subm_conv_classes_mxu(
            b(coords, cb), b(valid, vb), b(feats, fb),
            w if wb else w[None], kernel_size, stride,
            w_groups=0 if wb else 1, train=train)
        return out, True

    return f


@lru_cache(maxsize=None)
def _paired_maps(cap_fine: int, cap_coarse: int, factor: int,
                 with_drop: bool, train: bool = False):
    from .voxelize import unique_voxels_classes_paired as raw

    if with_drop:
        @custom_vmap
        def f(lat, feats, sel, drop):
            return raw(lat, feats, sel, cap_fine, cap_coarse, factor,
                       drop_offset=drop, return_stats=True, train=train)
    else:
        @custom_vmap
        def f(lat, feats, sel):
            return raw(lat, feats, sel, cap_fine, cap_coarse, factor,
                       return_stats=True, train=train)

    @f.def_vmap
    def rule(axis_size, in_batched, lat, feats, sel, *rest):
        lb, fb, sb = in_batched[0], in_batched[1], in_batched[2]
        B = axis_size
        if not fb:
            feats = jnp.broadcast_to(feats[None], (B,) + feats.shape)
        G = lat.shape[1] if lb else lat.shape[0]
        drop = None
        if with_drop:
            drop = rest[0]
            db = in_batched[3]
            if not db:
                drop = jnp.broadcast_to(drop[None], (B,) + drop.shape)
            # per-scene scalar -> per-group vector over B*G tables
            drop = jnp.repeat(drop.reshape(B), G)
        fine, coarse, (of_f, of_c) = raw(
            _fold(lat, B, lb),
            feats.reshape((B * feats.shape[1],) + feats.shape[2:]),
            _fold(sel, B, sb), cap_fine, cap_coarse, factor,
            drop_offset=drop, feats_groups=B, return_stats=True,
            train=train)

        def unf(x):
            return x.reshape((B, G) + x.shape[1:])

        out = (tuple(unf(x) for x in fine),
               tuple(unf(x) for x in coarse),
               (of_f.reshape(B, G), of_c.reshape(B, G)))
        batched = ((True,) * 3, (True,) * 3, (True, True))
        return out, batched

    return f


def folded_paired_maps(lat, feats, sel, cap_fine, cap_coarse, factor,
                       drop_offset=None, train: bool = False):
    """unique_voxels_classes_paired with scene-vmap folding: the head's
    fine+expand map build runs over B*n_cls flat tables with one sort.
    Returns (fine triple, coarse triple, (of_fine [G], of_coarse [G]))
    — per-group overflow counts instead of the stats-dict side channel
    (dicts can't cross the custom_vmap boundary).  ``train`` must be
    the caller's ctx.train: it disables the VJP-less Pallas segsum
    fast path inside the raw builder."""
    if drop_offset is not None:
        return _paired_maps(int(cap_fine), int(cap_coarse), int(factor),
                            True, bool(train))(lat, feats, sel, drop_offset)
    return _paired_maps(int(cap_fine), int(cap_coarse), int(factor),
                        False, bool(train))(lat, feats, sel)


def folded_subm_single_mxu(coords, valid, feats, w, kernel_size,
                           stride=1, train: bool = False):
    """Single-table (backbone) MXU conv with scene-vmap folding: under
    the per-scene vmap the batch folds into the class-group axis of
    subm_conv_classes_mxu, keeping per-grid-step VMEM at one scene's
    table (the round-2 blocker for MXU_TRAIN).  ``train`` picks the
    walk-block width (ops/pallas_conv._qw_for)."""
    return _subm_single_mxu(int(kernel_size), int(stride),
                            bool(train))(coords, valid, feats, w)


@lru_cache(maxsize=None)
def _generative_up_t(factor: int):
    from .sparse_conv import generative_up_classes_t as raw

    @custom_vmap
    def f(src_coords, src_valid, src_feats, tgt_coords, tgt_valid, w):
        return raw(src_coords, src_valid, src_feats, factor, tgt_coords,
                   tgt_valid, w)

    @f.def_vmap
    def rule(axis_size, in_batched, src_coords, src_valid, src_feats,
             tgt_coords, tgt_valid, w):
        scb, svb, sfb, tcb, tvb, wb = in_batched
        B = axis_size
        G = (src_coords.shape[1] if scb else src_coords.shape[0])
        wf, wg = _w_mode(w, B, wb, G)
        out = raw(_fold(src_coords, B, scb), _fold(src_valid, B, svb),
                  _fold(src_feats, B, sfb), factor,
                  _fold(tgt_coords, B, tcb), _fold(tgt_valid, B, tvb),
                  wf, w_groups=wg)
        return out.reshape((B, G) + out.shape[1:]), True

    return f


def folded_generative_up_t(src_coords, src_valid, src_feats, factor,
                           tgt_coords, tgt_valid, w):
    """generative_up_classes_t with scene-vmap folding."""
    return _generative_up_t(int(factor))(src_coords, src_valid,
                                         src_feats, tgt_coords,
                                         tgt_valid, w)


@lru_cache(maxsize=None)
def _at_classes_t(src_stride: int, offsets_key, tgt_stride: int):
    from .sparse_conv import scan_conv_at_classes_t as raw
    offsets = np.frombuffer(offsets_key, np.int32).reshape(-1, 3)

    @custom_vmap
    def f(src_coords, src_valid, src_feats, tgt_coords, tgt_valid, w):
        return raw(src_coords, src_valid, src_feats, src_stride,
                   tgt_coords, tgt_valid, offsets, w,
                   tgt_stride=tgt_stride)

    @f.def_vmap
    def rule(axis_size, in_batched, src_coords, src_valid, src_feats,
             tgt_coords, tgt_valid, w):
        scb, svb, sfb, tcb, tvb, wb = in_batched
        B = axis_size
        G = (src_coords.shape[1] if scb else src_coords.shape[0])
        wf, wg = _w_mode(w, B, wb, G)
        out = raw(_fold(src_coords, B, scb), _fold(src_valid, B, svb),
                  _fold(src_feats, B, sfb), src_stride,
                  _fold(tgt_coords, B, tcb), _fold(tgt_valid, B, tvb),
                  offsets, wf, tgt_stride=tgt_stride, w_groups=wg)
        return out.reshape((B, G) + out.shape[1:]), True

    return f


def folded_at_classes_t(src_coords, src_valid, src_feats, src_stride,
                        tgt_coords, tgt_valid, offsets, w,
                        tgt_stride=1):
    """scan_conv_at_classes_t with scene-vmap folding."""
    key = np.ascontiguousarray(np.asarray(offsets, np.int32)).tobytes()
    return _at_classes_t(int(src_stride), key, int(tgt_stride))(
        src_coords, src_valid, src_feats, tgt_coords, tgt_valid, w)


# ---------------------------------------------------------------------
# single-table gather-GEMM fold (the backbone path, layers.gather_gemm):
# a batched [B, N_src] feature table with per-scene neighbor tables
# [B, K, N] folds into one flat [B*N_src] table with row indices offset
# by b*N_src — K batched gathers become K flat row gathers.
# ---------------------------------------------------------------------
def _offset_nbr(nbr, B, N_src, batched):
    """[B, K, N] neighbor rows -> flat [K, B*N] rows into the folded
    feature table (missing rows stay -1)."""
    if not batched:
        nbr = jnp.broadcast_to(nbr[None], (B,) + nbr.shape)
    off = (jnp.arange(B, dtype=nbr.dtype) * N_src)[:, None, None]
    nbr = jnp.where(nbr >= 0, nbr + off, -1)           # [B, K, N]
    return jnp.swapaxes(nbr, 0, 1).reshape(nbr.shape[1], -1)


def _unfold_rows(out, B):
    return out.reshape((B, out.shape[0] // B) + out.shape[1:])


@lru_cache(maxsize=None)
def _gather_gemm_fold(with_bias: bool, with_tnbr: bool):
    from .sparse_conv import gather_gemm, gather_gemm_t

    def raw(feats, nbr, w, bias, tnbr):
        if with_tnbr:
            return gather_gemm_t(feats, nbr, tnbr, w, bias, jnp.bfloat16)
        return _ck_gather_gemm(feats, nbr, w, bias)

    if with_bias and with_tnbr:
        @custom_vmap
        def f(feats, nbr, w, bias, tnbr):
            return raw(feats, nbr, w, bias, tnbr)
    elif with_tnbr:
        @custom_vmap
        def f(feats, nbr, w, tnbr):
            return raw(feats, nbr, w, None, tnbr)
    elif with_bias:
        @custom_vmap
        def f(feats, nbr, w, bias):
            return raw(feats, nbr, w, bias, None)
    else:
        @custom_vmap
        def f(feats, nbr, w):
            return raw(feats, nbr, w, None, None)

    @f.def_vmap
    def rule(axis_size, in_batched, feats, nbr, w, *rest):
        fb, nb, wb = in_batched[0], in_batched[1], in_batched[2]
        rest_b = in_batched[3:]
        B = axis_size
        bias = tnbr = None
        bias_b = tnbr_b = False
        if with_bias:
            bias, bias_b = rest[0], rest_b[0]
        if with_tnbr:
            tnbr, tnbr_b = rest[-1], rest_b[-1]
        if wb or (with_bias and bias_b):
            # per-scene weights can't share one flat GEMM; fall back to
            # an explicit map (not used by any current model)
            args = (feats, nbr, w) + tuple(rest)
            bt = (fb, nb, wb) + tuple(rest_b)
            ex = tuple(a if b else jnp.broadcast_to(a[None],
                                                    (B,) + a.shape)
                       for a, b in zip(args, bt))
            return jax.lax.map(lambda xs: raw(
                xs[0], xs[1], xs[2],
                xs[3] if with_bias else None,
                xs[-1] if with_tnbr else None), ex), True
        N_src = feats.shape[1] if fb else feats.shape[0]
        N_out = nbr.shape[-1]
        ff = _fold(feats, B, fb)
        # nbr values index the SOURCE table (offset by b*N_src); tnbr
        # values index the OUTPUT/cotangent rows (offset by b*N_out) —
        # they differ for down/up/conv-at convs
        nf = _offset_nbr(nbr, B, N_src, nb)
        tf = _offset_nbr(tnbr, B, N_out, tnbr_b) if with_tnbr else None
        out = raw(ff, nf, w, bias, tf)
        return _unfold_rows(out, B), True

    return f


@jax.checkpoint
def _ck_gather_gemm(feats, nbr, w, bias):
    """Rematerialized like layers._gather_gemm_remat (the folded call
    must not save per-offset gathered residuals either)."""
    from .sparse_conv import gather_gemm
    return gather_gemm(feats, nbr, w, bias, compute_dtype=jnp.bfloat16)


def folded_gather_gemm(feats, nbr, w, bias=None, tnbr=None):
    """layers.gather_gemm with scene-vmap folding (bf16 gathers, f32
    accumulation, remat / scatter-free VJP semantics preserved)."""
    if tnbr is not None and bias is not None:
        return _gather_gemm_fold(True, True)(feats, nbr, w, bias, tnbr)
    if tnbr is not None:
        return _gather_gemm_fold(False, True)(feats, nbr, w, tnbr)
    if bias is not None:
        return _gather_gemm_fold(True, False)(feats, nbr, w, bias)
    return _gather_gemm_fold(False, False)(feats, nbr, w)


@lru_cache(maxsize=None)
def _take_rows_fold():
    from .gather import take_rows

    def raw(feats, idx):
        f = take_rows(feats, jnp.maximum(idx, 0))
        return jnp.where((idx >= 0)[..., None], f, 0)

    @custom_vmap
    def f(feats, idx):
        return raw(feats, idx)

    @f.def_vmap
    def rule(axis_size, in_batched, feats, idx):
        fb, ib = in_batched
        B = axis_size
        N_src = feats.shape[1] if fb else feats.shape[0]
        ff = _fold(feats, B, fb)
        if not ib:
            idx = jnp.broadcast_to(idx[None], (B,) + idx.shape)
        off = (jnp.arange(B, dtype=idx.dtype) * N_src).reshape(
            (B,) + (1,) * (idx.ndim - 1))
        fi = jnp.where(idx >= 0, idx + off, -1).reshape(-1)
        out = raw(ff, fi)
        return out.reshape((B, -1) + out.shape[1:]), True

    return f


def folded_take_rows(feats, idx):
    """Masked row gather (idx -1 -> zeros) with scene-vmap folding: the
    batched [B, N, C] table flattens so the take stays a flat row gather
    under the detector's per-scene vmap (the single-parent up-conv fast
    path, layers._up_single_parent)."""
    return _take_rows_fold()(feats, idx)
