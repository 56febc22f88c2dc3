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
def _subm_mxu(kernel_size: int, stride: int):
    from ..ops.pallas_conv import subm_conv_classes_mxu as raw

    @custom_vmap
    def f(coords, valid, feats, w):
        return raw(coords, valid, feats, w, kernel_size, stride)

    @f.def_vmap
    def rule(axis_size, in_batched, coords, valid, feats, w):
        cb, vb, fb, wb = in_batched
        B = axis_size
        G = (coords.shape[1] if cb else coords.shape[0])
        wf, wg = _w_mode(w, B, wb, G)
        out = raw(_fold(coords, B, cb), _fold(valid, B, vb),
                  _fold(feats, B, fb), wf, kernel_size, stride,
                  w_groups=wg)
        return out.reshape((B, G) + out.shape[1:]), True

    return f


def folded_subm_mxu(coords, valid, feats, w, kernel_size, stride=1):
    """subm_conv_classes_mxu with scene-vmap folding (the Pallas grid
    grows to B*G steps; per-step VMEM stays one class table)."""
    return _subm_mxu(int(kernel_size), int(stride))(coords, valid,
                                                    feats, w)


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
