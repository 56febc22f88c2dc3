"""Model-facing layer helpers over the sparse engine.

Wraps core ops with (a) flat-dict parameter addressing (paths mirror the
reference torch state_dict, see core/module.py) and (b) a per-forward
cache of neighbor tables / stride reductions keyed by coordinate-array
identity: many layers convolve over the same coordinate set (every
submanifold conv at a given stride), and the reference relies on ME's
coordinate manager for exactly this reuse.  Caching also guarantees that
parallel stride reductions of the same coords (e.g. biresnet ``layer3``
vs ``down3``) produce the *same* tensor, making residual adds row-aligned.
"""
from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

from ..core.kernel_maps import (conv_offsets, kernel_offsets,
                                neighbor_table, neighbor_table_grouped,
                                transpose_offsets)
from ..core.module import Ctx, Params, apply_bn
from ..core.norm import elu, relu
from ..core.sparse import SparseTensor
from ..core.sparse_conv import gather_gemm as _gather_gemm
from ..core.sparse_conv import gather_gemm_t as _gather_gemm_t
from ..core.voxelize import stride_reduce_coords


import jax as _jax


@_jax.checkpoint
def _gather_gemm_remat(feats, nbr, w, bias):
    return _gather_gemm(feats, nbr, w, bias, compute_dtype=jnp.bfloat16)


@_jax.checkpoint
def _gather_gemm_remat_nobias(feats, nbr, w):
    return _gather_gemm(feats, nbr, w, None, compute_dtype=jnp.bfloat16)


def gather_gemm(feats, nbr, w, bias=None, tnbr=None, fold=False):
    """Backbone conv gathers run in bf16 (f32 accumulation) and are
    REMATERIALIZED: without jax.checkpoint the scan saves every gathered
    [N, Cin] step as a residual (~gigabytes across the backbone), which
    OOMs HBM for full-size training.

    With a transpose table ``tnbr`` the scatter-free custom VJP is used
    (core/sparse_conv.gather_gemm_t) — the backward is two gather-GEMMs
    instead of K scatter-adds, which are pathological on TPU.

    With ``fold=True`` (ctx.scene_fold — set when the ctx lives inside
    the detector's per-scene vmap) the batched feature table +
    per-scene neighbor tables collapse into one flat table with offset
    rows (core/scene_fold.folded_gather_gemm), so the K per-offset
    gathers stay flat row gathers.  Unbatched reverse-mode AD requires
    fold=False (custom_vmap limitation)."""
    if fold:
        from ..core.scene_fold import folded_gather_gemm
        return folded_gather_gemm(feats, nbr, w, bias=bias, tnbr=tnbr)
    if tnbr is not None:
        return _gather_gemm_t(feats, nbr, tnbr, w, bias, jnp.bfloat16)
    if bias is None:
        return _gather_gemm_remat_nobias(feats, nbr, w)
    return _gather_gemm_remat(feats, nbr, w, bias)


def _cached(ctx: Ctx, key, fn):
    cache = getattr(ctx, "cache", None)
    if cache is None:
        cache = {}
        ctx.cache = cache
    if key not in cache:
        cache[key] = fn()
    return cache[key]


def _nbr(ctx: Ctx, src: SparseTensor, tgt_coords, tgt_valid, offsets):
    key = ("nbr", id(src.coords), id(tgt_coords), offsets.tobytes(), src.stride)
    # pin the keyed arrays so their id()s stay unique for the cache lifetime
    return _cached(ctx, key, lambda: (src.coords, tgt_coords,
                                      neighbor_table(src, tgt_coords,
                                                     tgt_valid, offsets)))[2]


def _nbr_odd(ctx: Ctx, src: SparseTensor, tgt_coords, tgt_valid, k: int):
    """Grouped-lookup neighbor table for odd stride-aligned kernels."""
    key = ("nbrg", id(src.coords), id(tgt_coords), k, src.stride)
    return _cached(ctx, key, lambda: (src.coords, tgt_coords,
                                      neighbor_table_grouped(
                                          src, tgt_coords, tgt_valid, k)))[2]


def _tnbr(ctx: Ctx, src: SparseTensor, tgt: SparseTensor,
          raw_offsets) -> jnp.ndarray:
    """Transposed kernel map for the scatter-free conv backward: for each
    SOURCE row, the target row at ``src_coord - offset`` (per offset).
    Only materialized in training (the eval graph never differentiates).
    """
    key = ("tnbr", id(src.coords), id(tgt.coords), raw_offsets.tobytes(),
           tgt.stride)

    def build():
        tgt_ix = SparseTensor(tgt.coords,
                              jnp.zeros((tgt.coords.shape[0], 1)),
                              tgt.valid, tgt.stride)
        return (src.coords, tgt.coords,
                neighbor_table(tgt_ix, src.coords, src.valid,
                               -raw_offsets))

    return _cached(ctx, key, build)[2]


def reduce_coords(ctx: Ctx, st: SparseTensor, factor: int, cap: int):
    key = ("reduce", id(st.coords), factor, cap)
    stats = getattr(ctx, "stats", None)
    out, _ = _cached(ctx, key,
                     lambda: (st.coords,) + stride_reduce_coords(
                         st, factor, cap, stats=stats,
                         stat_name=f"stride{st.stride * factor}"))[1:]
    return out


# Under vmap (batched training) Pallas blocks grow by the batch factor,
# so training needs headroom: 26M keeps the stride>=2 backbone tables
# (N*C <= 2M).  Batch-1 eval can afford the stride-1 stem conv1.0.
# NEGATIVE RESULT (round 5, v5e): routing the 65536-row 64->64 stem
# conv1.3 to the MXU kernel (CAGROUP_MXU_EVAL_MB=72, needs the 100M
# scoped limit) measured 71.9 ms e2e vs 69.9 at the 52M default —
# standalone the kernel wins 2.99 vs 15.82 ms (tools/bench_backbone.py),
# but in the full program XLA fuses the stem's gathers (the prefix-DCE
# stem stage is 7.0 ms TOTAL) and the MXU path's XLA-side prep (rank
# windows + bf16 table pad at 65k rows) erases the win.  52M is the
# measured-best eval budget; the env override exists for experiments.
_MXU_VMEM_BUDGET_TRAIN = 26 * 1024 * 1024
_MXU_VMEM_BUDGET_EVAL = int(os.environ.get("CAGROUP_MXU_EVAL_MB",
                                           52)) * 1024 * 1024


def _use_mxu(st: SparseTensor, ctx: Ctx, k: int, cout: int) -> bool:
    import jax
    from ..ops.pallas_conv import mxu_conv_vmem_bytes
    # scene_fold: the batch folds into the Pallas grid axis, so per-step
    # VMEM stays one table regardless of batch — eval budget applies.
    # Measured on v5e: the TRAINING vmap still ~doubles the kernel's
    # scoped-vmem peak vs the same blocks in eval (the batch grid dim is
    # double-buffered too: the 65536-row stem needs 97M in train vs
    # fitting 52M in eval), so charge 2x under ctx.train — this keeps
    # the stride>=2 backbone and head tables on the MXU kernel and
    # routes only the stride-1 stem to the XLA path in training.
    need = mxu_conv_vmem_bytes(st.cap, st.num_channels, cout, k)
    if ctx.train:
        # Mosaic additionally sizes its DMA buffers AGAINST the scoped
        # limit under the train vmap (observed: the 32768-row conv's
        # scoped request lands at limit+256K for ANY limit), so the
        # 32768-row stride-2 table can never fit — 48M excludes it and
        # keeps the <=16384-row backbone + head tables on the kernel.
        need *= 2
    if ctx.train and not getattr(ctx, "scene_fold", False):
        # non-folded (plain-vmap) training: the 26M constant was derived
        # BEFORE the x2 charge above existed; doubling the budget keeps
        # the effective un-doubled threshold at 26M so e.g. the ~15M k9
        # head tables stay on the MXU kernel (round-4 ADVICE).
        budget = 2 * _MXU_VMEM_BUDGET_TRAIN
    else:
        budget = 48 * 1024 * 1024 if ctx.train else _MXU_VMEM_BUDGET_EVAL
    # The kernel compiles with scoped vmem limited to CAGROUP_VMEM_MB
    # (ops/pallas_conv.py); keep the routing gate under that limit minus
    # the observed Mosaic DMA slack (~28M: 52M estimates worked at the
    # old 80M limit, and the 68.2M stem estimate works at 96M), so a
    # lowered env limit falls back to XLA instead of failing Mosaic
    # compilation (round-4 ADVICE).
    import os
    limit = int(os.environ.get("CAGROUP_VMEM_MB", 80)) * 1024 * 1024
    budget = min(budget, limit - 28 * 1024 * 1024)
    return (jax.default_backend() == "tpu"
            and (not ctx.train or getattr(ctx, "mxu_train", False))
            and k % 2 == 1
            and st.cap % 128 == 0 and st.cap >= 192
            and need <= budget)


def subm(params: Params, ctx: Ctx, path: str, st: SparseTensor,
         k: int) -> SparseTensor:
    if k == 1:  # 1x1 conv == plain matmul, no kernel map needed
        f = st.masked_feats() @ params[path + ".kernel"][0]
        b = params.get(path + ".bias")
        if b is not None:
            f = f + b
        return st.with_feats(jnp.where(st.valid[:, None], f, 0.0))
    w = params[path + ".kernel"]
    if _use_mxu(st, ctx, k, w.shape[-1]):
        # MXU-fused one-hot slab kernel (ops/pallas_conv.py); the
        # coordinate sets come from unique_voxels and are key-sorted.
        # Scene-folded under the detector's vmap: batch folds into the
        # kernel's group/grid axis (per-step VMEM stays one table).
        if getattr(ctx, "scene_fold", False):
            from ..core.scene_fold import folded_subm_single_mxu
            f = folded_subm_single_mxu(st.coords, st.valid,
                                       st.masked_feats(), w, k,
                                       st.stride, train=ctx.train)
        else:
            from ..ops.pallas_conv import subm_conv_mxu
            f = subm_conv_mxu(st.coords, st.valid, st.masked_feats(), w,
                              k, st.stride, train=ctx.train)
        b = params.get(path + ".bias")
        if b is not None:
            f = f + b
        return st.with_feats(jnp.where(st.valid[:, None], f, 0.0))
    nbr = _nbr_odd(ctx, st, st.coords, st.valid, k)
    # submanifold transpose map is the offset-reversed table (the
    # lexicographic stencil enumeration satisfies off[i] = -off[K-1-i])
    tnbr = nbr[::-1] if ctx.train else None
    f = gather_gemm(st.masked_feats(), nbr, params[path + ".kernel"],
                    params.get(path + ".bias"), tnbr=tnbr,
                    fold=getattr(ctx, "scene_fold", False))
    return st.with_feats(jnp.where(st.valid[:, None], f, 0.0))


def _use_mxu_at(src: SparseTensor, ctx: Ctx, k: int, cout: int,
                q_cap: int) -> bool:
    """MXU gate for the conv-at-coords form (strided ``down`` convs):
    eval-only (the custom-vjp backward is exercised elsewhere; training
    keeps the scatter-free tnbr path that the scan/vmap machinery is
    tuned for), un-folded only (the folded table layout is the subm
    kernel's)."""
    import os

    import jax
    from ..ops.pallas_conv import mxu_conv_vmem_bytes
    need = mxu_conv_vmem_bytes(src.cap, src.num_channels, cout, k,
                               NQ=q_cap)
    # same clamp as _use_mxu: never admit a table the CAGROUP_VMEM_MB
    # scoped-vmem compiler limit (minus observed Mosaic DMA slack)
    # could reject at compile time
    limit = int(os.environ.get("CAGROUP_VMEM_MB", 80)) * 1024 * 1024
    budget = min(_MXU_VMEM_BUDGET_EVAL, limit - 28 * 1024 * 1024)
    return (os.environ.get("CAGROUP_MXU_AT", "1") != "0"
            and jax.default_backend() == "tpu"
            and not ctx.train
            and not getattr(ctx, "scene_fold", False)
            and k % 2 == 1
            and src.cap % 128 == 0 and src.cap >= 192
            and q_cap % 128 == 0
            and need <= budget)


def down(params: Params, ctx: Ctx, path: str, st: SparseTensor, k: int,
         factor: int, cap: int) -> SparseTensor:
    out = reduce_coords(ctx, st, factor, cap)
    w = params[path + ".kernel"]
    if k % 2 == 1 and k >= 3 and _use_mxu_at(st, ctx, k, w.shape[-1],
                                             out.cap):
        # MXU conv-at-coords: queries are the reduced coords scaled onto
        # the source lattice (out.coords are multiples of stride*factor,
        # so // stride is an order-preserving lattice scaling — the
        # unique_voxels sort survives and the kernel's sorted-query
        # contract holds).
        from ..ops.pallas_conv import conv_at_coords_mxu
        qlat = jnp.floor_divide(out.coords, st.stride)
        f = conv_at_coords_mxu(st.coords, st.valid, st.masked_feats(),
                               st.stride, qlat, out.valid, k, w,
                               train=ctx.train)
        b = params.get(path + ".bias")
        if b is not None:
            f = f + b
        return SparseTensor(out.coords,
                            jnp.where(out.valid[:, None], f, 0.0),
                            out.valid, out.stride)
    offs = conv_offsets(k, st.stride)
    if k % 2 == 1:
        nbr = _nbr_odd(ctx, st, out.coords, out.valid, k)
    else:
        nbr = _nbr(ctx, st, out.coords, out.valid, offs)
    tnbr = _tnbr(ctx, st, out, offs) if ctx.train else None
    f = gather_gemm(st.masked_feats(), nbr, params[path + ".kernel"],
                    params.get(path + ".bias"), tnbr=tnbr,
                    fold=getattr(ctx, "scene_fold", False))
    return SparseTensor(out.coords, jnp.where(out.valid[:, None], f, 0.0),
                        out.valid, out.stride)


def conv_at(params: Params, ctx: Ctx, path: str, src: SparseTensor,
            tgt_coords, tgt_valid, k: int,
            out_stride: Optional[int] = None) -> SparseTensor:
    offs = conv_offsets(k, src.stride)
    if k % 2 == 1:
        nbr = _nbr_odd(ctx, src, tgt_coords, tgt_valid, k)
    else:
        nbr = _nbr(ctx, src, tgt_coords, tgt_valid, offs)
    os = out_stride if out_stride is not None else src.stride
    tnbr = None
    if ctx.train:
        tgt_st = SparseTensor(tgt_coords,
                              jnp.zeros((tgt_coords.shape[0], 1)),
                              tgt_valid, os)
        tnbr = _tnbr(ctx, src, tgt_st, offs)
    f = gather_gemm(src.masked_feats(), nbr, params[path + ".kernel"],
                    params.get(path + ".bias"), tnbr=tnbr,
                    fold=getattr(ctx, "scene_fold", False))
    return SparseTensor(tgt_coords, jnp.where(tgt_valid[:, None], f, 0.0),
                        tgt_valid, os)


def _up_single_parent(params: Params, ctx: Ctx, path: str,
                      src: SparseTensor, tgt_coords, tgt_valid, k: int,
                      out_stride: int) -> SparseTensor:
    """Exact-tiling transposed conv (k == up_factor, e.g. the backbone's
    ``out.0`` k2 s4->s2, reference biresnet.py:308-315): the kernel
    region tiles one source-stride period, so per component exactly one
    of the k offsets lands on the source lattice — every target voxel
    has exactly ONE parent.  The general path's K^3 hash lookups + K^3
    row gathers (the HBM-bound cost) collapse to one lookup + one
    gather; the per-row kernel weight W[parity(tgt)] is applied as K^3
    shared matmuls selected by a parity one-hot (MXU work, no gather).
    """
    import numpy as np
    w = params[path + ".kernel"]            # [k^3, Cin, Cout]
    S = src.stride
    rem = jnp.remainder(tgt_coords, S)      # multiples of out_stride
    parent = tgt_coords - rem
    ko = jnp.floor_divide(rem, out_stride)  # [N, 3] in [0, k)
    nbr = neighbor_table(src, parent, tgt_valid,
                         np.zeros((1, 3), np.int32))
    idx = nbr[0]
    feats = src.masked_feats().astype(jnp.bfloat16)
    if getattr(ctx, "scene_fold", False):
        from ..core.scene_fold import folded_take_rows
        f = folded_take_rows(feats, idx)
    else:
        from ..core.gather import take_rows
        f = take_rows(feats, jnp.maximum(idx, 0))
        f = jnp.where((idx >= 0)[:, None], f, 0)
    # kernel_offsets order for even k: 0..k-1 per axis, x-major z-fastest
    oid = (ko[:, 0] * k + ko[:, 1]) * k + ko[:, 2]
    out = jnp.zeros((tgt_coords.shape[0], w.shape[-1]), jnp.float32)
    for o in range(k ** 3):
        yo = jnp.dot(f, w[o].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        out = out + jnp.where((oid == o)[:, None], yo, 0.0)
    b = params.get(path + ".bias")
    if b is not None:
        out = out + b
    return SparseTensor(tgt_coords,
                        jnp.where(tgt_valid[:, None], out, 0.0),
                        tgt_valid, out_stride)


def up(params: Params, ctx: Ctx, path: str, src: SparseTensor, tgt_coords,
       tgt_valid, k: int, up_factor: int) -> SparseTensor:
    assert src.stride % up_factor == 0
    out_stride = src.stride // up_factor
    import os as _os
    if k == up_factor and not ctx.train \
            and _os.environ.get("CAGROUP_UP_SP", "1") != "0":
        # eval fast path: single-parent decode (see _up_single_parent);
        # training keeps the tnbr scatter-free VJP machinery below.
        # CAGROUP_UP_SP=0 disables (compile/perf bisection knob).
        return _up_single_parent(params, ctx, path, src, tgt_coords,
                                 tgt_valid, k, out_stride)
    offs = transpose_offsets(k, out_stride)
    nbr = _nbr(ctx, src, tgt_coords, tgt_valid, offs)
    tnbr = None
    if ctx.train:
        tgt_st = SparseTensor(tgt_coords,
                              jnp.zeros((tgt_coords.shape[0], 1)),
                              tgt_valid, out_stride)
        tnbr = _tnbr(ctx, src, tgt_st, offs)
    f = gather_gemm(src.masked_feats(), nbr, params[path + ".kernel"],
                    params.get(path + ".bias"), tnbr=tnbr,
                    fold=getattr(ctx, "scene_fold", False))
    return SparseTensor(tgt_coords, jnp.where(tgt_valid[:, None], f, 0.0),
                        tgt_valid, out_stride)


def bn(params: Params, state: Params, ctx: Ctx, path: str,
       st: SparseTensor, momentum: float = 0.1) -> SparseTensor:
    f = apply_bn(params, state, ctx, path, st.feats, st.valid,
                 momentum=momentum)
    return st.with_feats(f)


def act(st: SparseTensor, kind: str = "relu") -> SparseTensor:
    fn = relu if kind == "relu" else elu
    return st.with_feats(jnp.where(st.valid[:, None], fn(st.feats), 0.0))
