"""Fused submanifold sparse conv as a Mosaic (Pallas TPU) kernel.

Replaces the XLA gather paths of ``core.sparse_conv`` for the dense head's
per-class K^3 convs (reference: the per-class MinkowskiConvolution stacks,
pcdet/models/dense_heads/cagroup_head.py:183-188 — the documented
180->400 ms per-class-loop regression, README.md:19) and the backbone's
k3 submanifold convs (biresnet.py layer stacks).

The XLA path is HBM-bound row gathers at ~38 GB/s effective.  This kernel
keeps the (per-class) table VMEM-resident and converts every gather into
MXU work:

1. **one-hot slab gathers**: query keys are the table keys plus a constant
   packed offset, so they stay sorted; a 128-query block's matches live in
   a contiguous rank window of the sorted table (bounds precomputed in
   XLA).  Packed keys are z-minor, so the K dz-neighbors of query q are
   the slab keys equal to tk_q + dz: per dz, a key-equality one-hot times
   the [SLAB, C] feature slab on the MXU performs the block's 128 gathers
   as one matmul, entirely in VMEM.  A while-loop walks further slabs in
   the (rare) case a block's rank window exceeds one slab, so results are
   exact for any key distribution (one-hot adds across passes are disjoint
   row copies — exact in bf16).
2. **fused weight apply**: the K gathered [128, C] tiles concatenate to
   [128, K*C] and one matmul against the (dz-major) [K*C, Cout] weight
   slice accumulates the output block.  Identical FLOPs to the dense conv;
   no scratch tensors, so the whole working set is feats + out and the
   kernel serves tables up to ~32k rows.

Requirements: coordinates sorted by packed key (per class) with invalid
rows at the end (what ``core.voxelize.unique_voxels`` family produces),
N % 128 == 0, N >= SLAB.

Backward pass (also MXU-fused, ``CAGROUP_XLA_BWD=1`` opts out):
dfeats is the SAME submanifold conv with offset-reversed transposed
weights (one more ``_pallas_forward``), and dW re-runs the slab walk
with the weight-apply matmul transposed (``_dw_kernel``:
dW[dx, dy] += tile[QW, K*C]^T @ gout[QW, Cout]) — both gradients stay
one-hot matmuls in VMEM, no scatters.  Exactness of the forward also
lets the XLA fallback take the VJP of the reference implementation
(same math, different algorithm).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.hashing import INVALID_KEY, key_extents, key_shifts, \
    pack_coords

_LANE = 128
# Query-block width (lanes) and its slab length.  A NAIVE QW=256 (one
# [SLAB, 256] one-hot) produces WRONG results on real v5e hardware while
# passing in interpret mode (Mosaic lowering miscompile, ~7% rel err).
# The DEFAULT is the two-128-lane workaround: the rank-window walk runs
# once per 256-query block (halving window visits, the per-walk
# overhead) but every one-hot compare stays [SLAB, 128] — two compares +
# two MXU matmuls per dz whose results concatenate along the query rows
# (exactness gated by tools/tpu_smoke.py on-chip; bitwise-identical to
# QW=128 since one-hot gathers are exact row copies).  Measured e2e on
# v5e at full caps: 65.3 ms/scene vs 69.9 at QW=128 (round 5).
# CAGROUP_QW256=0 opts back into 128-query blocks everywhere, =1
# forces them in TRAINING too.  Measured on v5e (round 5): eval e2e
# 65.3-66.3 ms at QW=256 vs 69.9 at 128; the B=2 train step is
# QW-INSENSITIVE (1015 ms forced-256 vs 1021 mode-dependent-128 —
# noise; the apparent 954 -> ~1015 shift pre-dates this change and
# tracks the DAPPM/up-conv rewrite).  The unset default stays
# mode-dependent (256 eval / 128 train) to keep the training graph at
# the configuration round-4 measured and to hold the dW walk narrow.
def _qw_for(train: bool) -> int:
    v = os.environ.get("CAGROUP_QW256")
    if v == "0":
        return _LANE
    if v == "1":
        return 256
    return _LANE if train else 256
# SLAB sweep on v5e (k9, G=18, N=4096, C=64): 128 -> 59.3 ms,
# 160 -> 46.6, 192 -> 45.6, 256 -> 48.7.  192 balances one-hot width
# against multi-slab window visits; e2e confirms (full-caps bench at
# QW=128: 160 -> 75.9 ms, 192 -> 69.9, 224 -> 69.5).  QW=256 e2e sweep:
# SLAB 256 -> 69.6 ms, 320 -> 65.3-66.3 (best), 384 -> Mosaic
# scoped-vmem reject on the 65k-row stem conv (102.97M > limit).
# CAGROUP_SLAB / CAGROUP_SLAB256 override for tuning experiments (read
# at import; must divide the pad logic's 8-grid).
_SLAB_FOR = {128: int(os.environ.get("CAGROUP_SLAB", 192)),
             256: int(os.environ.get("CAGROUP_SLAB256", 320))}


def _mxu_bwd_enabled():
    """Backward stays on the MXU kernels unless CAGROUP_XLA_BWD=1."""
    return os.environ.get("CAGROUP_XLA_BWD") != "1"


def _gather_tile(sk, fs, tkd, K):
    """One slab's gathered [QW, K*C] one-hot tile (dz-major columns).

    ``tkd[dzi]`` is a LIST of [1, 128] per-half target-key rows (one for
    QW=128, two for QW=256).  Every one-hot compare stays [SLAB, 128]:
    a single [SLAB, 256] compare form MISCOMPILES on v5e Mosaic (~7%
    rel err, silently), and lane-slicing a [1, 256] vector for the
    compare hits "Invalid input layout" on the broadcast — so the halves
    are carried as separate 128-lane scratch ROWS end to end.  Per dz,
    the per-half [128, C] matmul results concatenate along the query
    rows.  Exactness is gated on-chip by tools/tpu_smoke.py."""
    gs = []
    for dzi in range(K):
        halves = []
        for tkh in tkd[dzi]:
            e = (sk == tkh).astype(jnp.bfloat16)
            halves.append(jax.lax.dot_general(
                e, fs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # [128, C]
        g = halves[0] if len(halves) == 1 else \
            jnp.concatenate(halves, axis=0)                  # [QW, C]
        gs.append(g)
    return jnp.concatenate(gs, axis=1)                       # [QW, K*C]


def _conv_kernel(nz_ref, lo_ref, hi_ref, keys_col_ref, keys_row_ref,
                 feats_ref, w_ref, out_ref, tk_scr, ztk_scr, *, K, C,
                 Cout, N, NQ, QW, SLAB):
    """Grid is (G,) ONLY, with the dx offset scanned inside the kernel:
    vmap prepends batch grid dimensions, so any pl.program_id(i) use for
    semantics would silently read the wrong axis under batching (the
    round-2 NaN bug).  This body never touches program_id; batching just
    adds leading index_map dims.

    N: source-table rows (keys_col/feats); NQ: query rows (keys_row/out).
    NQ == N for submanifold convs; conv-at-coords passes a separate
    sorted query key table (the RoI head's grid_conv,
    cagroup_roi_head.py:69)."""
    h = K // 2
    NB = NQ // QW           # walk blocks (rank windows, weight applies)
    R = QW // _LANE         # 128-lane scratch rows per walk block
    invalid = int(INVALID_KEY)
    (ex, ey, ez), (sx, sy) = key_extents(), key_shifts()
    zmask = ez - 1

    out_ref[0] = jnp.zeros((NQ, Cout), jnp.float32)
    # query rows stay 128-lane-granular regardless of QW: Mosaic cannot
    # broadcast a lane-SLICE of a [1, 256] vector ("Invalid input
    # layout"), so QW=256 blocks consume R=2 natural scratch rows
    keys_row = keys_row_ref[0]                        # [NQ/128, 128]
    xd = jax.lax.shift_right_logical(keys_row, sx)
    yd = jax.lax.shift_right_logical(keys_row, sy) & (ey - 1)
    valid_q = keys_row < invalid

    def dx_body(dxi, _):
        dxo = dxi - h

        def dy_body(dy, _, dxi=dxi, dxo=dxo):
            dyo = dy - h
            delta = dxo * (1 << sx) + dyo * (1 << sy)

            def _block(b, _, dxi=dxi, dy=dy):
                lo = lo_ref[0, dxi, dy, b]
                hi = hi_ref[0, dxi, dy, b]

                # Empty rank window => no key in the table can match any
                # query of this block at this (dx, dy): skip the walk AND
                # the weight-apply matmul.  For k9 (81 (dx,dy) pairs over
                # sparse per-class tables) most windows are empty and the
                # unconditional [QW, K*C] @ [K*C, Cout] accumulates of
                # zero tiles dominated kernel time.
                @pl.when(lo <= hi)
                def _nonempty(dxi=dxi, dy=dy, b=b, lo=lo, hi=hi):
                    _gather_apply(dxi, dy, b, lo, hi)
                return 0

            def _gather_apply(dxi, dy, b, lo, hi):
                tk_rows = [tk_scr[pl.ds(b * R + hh, 1), :]
                           for hh in range(R)]        # R x [1, 128]
                ztk_rows = [ztk_scr[pl.ds(b * R + hh, 1), :]
                            for hh in range(R)]
                s0 = jnp.maximum((lo - 8) & ~7, 0).astype(jnp.int32)

                # Per-dz TARGET keys, hoisted out of the slab walk:
                # query q's dz-neighbor key is tk + dz, valid iff the z
                # digit stays inside its field (the same query-side range
                # check as the XLA path, core/sparse_conv.py) — borrows
                # can then never alias another (x, y) column, so the walk
                # needs NO per-element z-digit verification.  This
                # replaces the former d/zs/zdl/select machinery (5 full
                # [SLAB, QW] VPU passes per slab) with [1, 128]-row setup
                # here and one broadcast compare per (dz, half) in the
                # walk.  NOTE: the compares must stay i32 — v5e Mosaic
                # vector compares are 32-bit only (i16 cmpi and bf16
                # cmpf both fail to lower; round-4 finding).
                tkd = []
                for dz in range(-h, h + 1):
                    row = []
                    for tkh, ztkh in zip(tk_rows, ztk_rows):
                        zv = (ztkh + dz >= 0) & (ztkh + dz < ez)
                        row.append(jnp.where(zv, tkh + dz, -(1 << 29)))
                    tkd.append(row)

                def slab_tile(s):
                    """One slab's gathered [QW, K*C] tile (dz-major)."""
                    sk = keys_col_ref[0, pl.ds(s, SLAB), :]    # [SLAB, 1]
                    fs = feats_ref[0, pl.ds(s, SLAB), :]       # [SLAB, C]
                    return _gather_tile(sk, fs, tkd, K)

                def apply_w(g):
                    # fused weight apply: [128, K*C] @ [K*C, Cout]
                    # (dz-major rows)
                    contrib = jax.lax.dot_general(
                        g.astype(jnp.bfloat16), w_ref[0, dxi, dy],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    q = pl.multiple_of(b * QW, _LANE)
                    out_ref[0, pl.ds(q, QW), :] += contrib

                # Dense submanifold tables put a block's whole window in
                # ONE slab almost always; straight-line code there lets
                # Mosaic schedule without the loop-carried [QW, K*C]
                # accumulator of the general walk (the while_loop's
                # vreg-resident carry is most of the per-walk overhead).
                @pl.when(hi < s0 + SLAB)
                def _single_slab():
                    apply_w(slab_tile(pl.multiple_of(s0, 8)))

                @pl.when(hi >= s0 + SLAB)
                def _multi_slab():
                    def cond(c):
                        return jnp.logical_not(c[1])

                    def body(c):
                        s, _, g = c
                        # s is 8-aligned by construction (s0 masked,
                        # += SLAB); Mosaic needs the hint to load.  The
                        # table is padded with SLAB INVALID rows
                        # (_prep_tables), so slabs advance on a fixed
                        # non-overlapping grid with no N-SLAB clamp — and
                        # therefore no double-count guard (the former
                        # `fresh`/cov machinery is gone too).
                        s = pl.multiple_of(s, 8)
                        g = g + slab_tile(s)
                        return (s + SLAB, s + SLAB > hi, g)

                    _, _, g = jax.lax.while_loop(
                        cond, body,
                        (s0, jnp.bool_(False),
                         jnp.zeros((QW, K * C), jnp.float32)))
                    apply_w(g)

            # whole-(dx, dy) skip: sparse class tables leave entire
            # offset planes without a single key match (precomputed in
            # XLA from the rank windows) — skip the scratch writes and
            # the block loop outright
            @pl.when(nz_ref[0, dxi, dy] > 0)
            def _plane(dyo=dyo, delta=delta, _block=_block):
                ok = valid_q & (xd + dxo >= 0) & (xd + dxo < ex) & \
                    (yd + dyo >= 0) & (yd + dyo < ey)
                tk_scr[:, :] = jnp.where(ok, keys_row + delta, -(1 << 29))
                ztk_scr[:, :] = jnp.where(ok, keys_row & zmask,
                                          -(1 << 29))
                jax.lax.fori_loop(0, NB, _block, 0)
            return 0

        # The dy plane loop stays python-unrolled for ALL K: a fori_loop
        # variant (measured round 5) made the k9 microbench 50.9 ms vs
        # 45.6 unrolled — Mosaic schedules the static bodies better —
        # and bought nothing on compile (the k9 Mosaic compile is ~6 s;
        # the e2e cold-compile cost lives in XLA's optimization of the
        # 35 MB eval program, not in the kernels).
        for dy in range(K):
            dy_body(dy, 0)
        return 0

    jax.lax.fori_loop(0, K, dx_body, 0)


# A paired-block kernel variant (two adjacent 128-query blocks sharing
# one rank-window walk over the UNION of their windows, every tensor
# kept 128 lanes wide) was built and measured on v5e (k9, G=18, N=4096,
# C=64): 64.6 ms vs 45.7 ms for the base kernel — the union window
# widens the walk more than the shared fetch saves, so it was removed
# (round-3 CAGROUP_QW_PAIR experiment).  The remaining lever for
# amortizing slab fetches is a true QW=256 one-hot, blocked on the
# Mosaic miscompile noted at _QW above.


def _rank_bounds(qkeys, skeys, K):
    """Per-(class, dx, dy, 128-query-block) rank window [lo, hi] of the
    SOURCE table that can contain key matches tk+dz, dz in [-h, h].
    All-XLA, flat gathers.

    qkeys: i32[G, NQ] sorted query keys (== skeys for submanifold convs);
    skeys: i32[G, N] sorted source keys.  Returns i32[G, K, K, NBq, 2].
    """
    G, N = skeys.shape
    NB = qkeys.shape[1] // _LANE
    h = K // 2
    (ex, ey, ez), (sx, sy) = key_extents(), key_shifts()
    rows = qkeys.reshape(G, NB, _LANE)
    xd = jax.lax.shift_right_logical(rows, sx)
    yd = jax.lax.shift_right_logical(rows, sy) & (ey - 1)
    valid = rows < INVALID_KEY
    offs = jnp.arange(K, dtype=jnp.int32) - h                    # [K]
    okx = (xd[:, None] + offs[None, :, None, None] >= 0) & \
        (xd[:, None] + offs[None, :, None, None] < ex)          # [G,K,NB,L]
    oky = (yd[:, None] + offs[None, :, None, None] >= 0) & \
        (yd[:, None] + offs[None, :, None, None] < ey)
    delta = (offs[:, None] * (1 << sx) +
             offs[None, :] * (1 << sy))                          # [K, K]
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
    return lo.reshape(G, K, K, NB), hi.reshape(G, K, K, NB)


def _prep_tables(coords, valid, feats, kernel_size, stride, qlat, qvalid,
                 train=False):
    """Shared forward/backward prep: packed sorted keys, rank windows,
    bf16 feature table.  Returns (lo, hi, keys_col, keys_row, featsb,
    (K, C, N, NQ, QW, SLAB, NB)).  ``train`` picks the walk-block width
    (_qw_for)."""
    G, N, C = feats.shape
    K = kernel_size
    lat = jnp.floor_divide(coords, stride) if stride != 1 else coords
    skeys = pack_coords(lat, valid)                              # [G, N]
    qkeys = skeys if qlat is None else pack_coords(qlat, qvalid)
    NQ = qkeys.shape[1]
    qw = _qw_for(train)
    QW = qw if NQ % qw == 0 and N >= _SLAB_FOR[qw] else _LANE
    SLAB = _SLAB_FOR[QW]
    assert NQ % QW == 0 and N % _LANE == 0 and N >= SLAB, (NQ, N, QW)
    NB = NQ // QW

    lo, hi = _rank_bounds(qkeys, skeys, K)
    if QW != _LANE:
        r = QW // _LANE
        lo = jnp.min(lo.reshape(G, K, K, NB, r), axis=-1)
        hi = jnp.max(hi.reshape(G, K, K, NB, r), axis=-1)
    # SLAB rows of INVALID/zero padding: the kernels' slab walk advances
    # on a fixed 8-aligned grid with NO clamp at N-SLAB (rank windows end
    # at hi <= N-1, so reads stay inside N+SLAB), which removes the
    # double-count guard from the walk's VPU critical path.  INVALID keys
    # can never satisfy d == zdl == dz (|dz| < ez << INVALID - max key).
    keys_col = jnp.pad(skeys, ((0, 0), (0, SLAB)),
                       constant_values=int(INVALID_KEY)).reshape(
        G, N + SLAB, 1)
    # query rows ALWAYS at 128-lane granularity (QW=256 walk blocks
    # consume two rows each — see _conv_kernel's layout note)
    keys_row = qkeys.reshape(G, NQ // _LANE, _LANE)
    featsb = jnp.pad(
        jnp.where(valid[..., None], feats, 0.0).astype(jnp.bfloat16),
        ((0, 0), (0, SLAB), (0, 0)))
    return lo, hi, keys_col, keys_row, featsb, (K, C, N, NQ, QW, SLAB, NB)


def _pallas_forward(coords, valid, feats, w, kernel_size: int,
                    stride: int = 1, qlat=None, qvalid=None,
                    w_groups: int = 0, train: bool = False):
    """qlat/qvalid: optional separate sorted query lattice (conv-at-
    coords), in units of the SOURCE lattice // stride.

    w_groups > 0: scene-folded mode — tables carry G = B * w_groups
    groups but w has only w_groups rows shared across scenes; the weight
    BlockSpec indexes g % w_groups, so no weight tiling in HBM."""
    G = feats.shape[0]
    K = kernel_size
    Cout = w.shape[-1]
    Gw = w_groups or G
    assert G % Gw == 0 and w.shape[0] == Gw, (G, Gw, w.shape)

    lo, hi, keys_col, keys_row, featsb, \
        (K, C, N, NQ, QW, SLAB, NB) = _prep_tables(
            coords, valid, feats, kernel_size, stride, qlat, qvalid,
            train=train)
    # W [G, K(dx), K(dy), K(dz)*C (dz-major rows), Cout]; the whole dx
    # axis rides in the class block (dx is scanned inside the kernel)
    w2 = (w.astype(jnp.bfloat16)
          .reshape(Gw, K, K, K, C, Cout)       # [Gw, dx, dy, dz, C, O]
          .reshape(Gw, K, K, K * C, Cout))

    # per-(dx, dy) any-nonempty-window flags: whole offset planes skip
    # inside the kernel (sparse class tables leave most planes matchless)
    nz = jnp.sum((lo <= hi).astype(jnp.int32), axis=-1)    # [G, K, K]

    kern = functools.partial(
        _conv_kernel,
        K=K, C=C, Cout=Cout, N=N, NQ=NQ, QW=QW, SLAB=SLAB)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, K), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, K, NB), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, K, NB), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N + SLAB, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ // _LANE, _LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N + SLAB, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, K, K * C, Cout),
                         lambda g: (g % Gw, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NQ, Cout), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, NQ, Cout), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NQ // _LANE, _LANE), jnp.int32),
            pltpu.VMEM((NQ // _LANE, _LANE), jnp.int32),
        ],
        # double-buffered blocks can exceed the default 16M scoped-vmem
        # budget for the larger backbone tables, and the TRAINING vmap
        # roughly doubles the peak again (batch grid dim double-buffered:
        # the 32768-row stride-2 conv peaks at 64.25M under vmap vs
        # fitting 52M in eval) — 80M default leaves headroom on the 128M
        # chip; CAGROUP_VMEM_MB overrides (96-100M compiles and runs
        # fine, admitting the 65536-row 64->64 stem table — measured a
        # NET e2e loss though, see _MXU_VMEM_BUDGET_EVAL in
        # models/layers.py)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ.get("CAGROUP_VMEM_MB", 80))
            * 1024 * 1024),
        interpret=interpret,
    )(nz, lo, hi, keys_col, keys_row, featsb, w2)
    ov = valid if qlat is None else qvalid
    return jnp.where(ov[..., None], out, 0.0)


def mxu_conv_vmem_bytes(N, C, Cout, K, NQ=None):
    """Rough VMEM working set of the fused conv (double-buffered blocks).

    NQ: separate query count for the conv-at-coords form (the out block
    scales with the query table, not the source table)."""
    if NQ is None:
        NQ = N
    Np = N + _SLAB_FOR[256]        # + slab-walk pad rows (_prep_tables)
    return (2 * Np * C * 2         # feats bf16, double-buffered
            + 2 * NQ * Cout * 4    # out f32, double-buffered
            + 2 * K ** 3 * C * Cout * 2  # weight block (full dx axis)
            + Np * 8 + _LANE * 8 * 4)


def _dw_kernel(lo_ref, hi_ref, keys_col_ref, keys_row_ref, feats_ref,
               gout_ref, dw_ref, tk_scr, ztk_scr, *, K, C, Cout, N, NQ,
               QW, SLAB):
    """Weight-gradient twin of ``_conv_kernel``: the same rank-window
    slab walk re-gathers each query block's [QW, K*C] neighbor tile, and
    the weight-apply matmul of the forward becomes its transpose —
    dW[dx, dy] += tile^T @ gout_block, one [K*C, QW] x [QW, Cout] MXU
    contraction per block.  No weight input; gout rides where the
    forward's out lived.  Same no-program_id discipline (vmap safety)."""
    h = K // 2
    NB = NQ // QW
    R = QW // _LANE
    invalid = int(INVALID_KEY)
    (ex, ey, ez), (sx, sy) = key_extents(), key_shifts()
    zmask = ez - 1

    keys_row = keys_row_ref[0]                        # [NQ/128, 128]
    xd = jax.lax.shift_right_logical(keys_row, sx)
    yd = jax.lax.shift_right_logical(keys_row, sy) & (ey - 1)
    valid_q = keys_row < invalid

    def dx_body(dxi, _):
        dxo = dxi - h
        for dy in range(K):
            dyo = dy - h
            delta = dxo * (1 << sx) + dyo * (1 << sy)
            ok = valid_q & (xd + dxo >= 0) & (xd + dxo < ex) & \
                (yd + dyo >= 0) & (yd + dyo < ey)
            tk_scr[:, :] = jnp.where(ok, keys_row + delta, -(1 << 29))
            ztk_scr[:, :] = jnp.where(ok, keys_row & zmask, -(1 << 29))

            def block(b, acc, dy=dy):
                lo = lo_ref[0, dxi, dy, b]
                hi = hi_ref[0, dxi, dy, b]

                def nonempty(acc, b=b, dy=dy, lo=lo, hi=hi):
                    tk_rows = [tk_scr[pl.ds(b * R + hh, 1), :]
                               for hh in range(R)]    # R x [1, 128]
                    ztk_rows = [ztk_scr[pl.ds(b * R + hh, 1), :]
                                for hh in range(R)]
                    s0 = jnp.maximum((lo - 8) & ~7, 0).astype(jnp.int32)

                    # hoisted per-(dz, half) target keys (see _conv_kernel)
                    tkd = []
                    for dz in range(-h, h + 1):
                        row = []
                        for tkh, ztkh in zip(tk_rows, ztk_rows):
                            zv = (ztkh + dz >= 0) & (ztkh + dz < ez)
                            row.append(
                                jnp.where(zv, tkh + dz, -(1 << 29)))
                        tkd.append(row)

                    def slab_tile(s):
                        sk = keys_col_ref[0, pl.ds(s, SLAB), :]  # [SLAB, 1]
                        fs = feats_ref[0, pl.ds(s, SLAB), :]     # [SLAB, C]
                        return _gather_tile(sk, fs, tkd, K)

                    def apply_t(g):
                        qpos = pl.multiple_of(b * QW, _LANE)
                        gb = gout_ref[0, pl.ds(qpos, QW), :]   # [QW, Cout]
                        # transposed weight apply: [K*C, QW] @ [QW, Cout]
                        return acc + jax.lax.dot_general(
                            g.astype(jnp.bfloat16), gb,
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

                    def single(_):
                        # straight-line single-slab fast path (see
                        # _conv_kernel): no loop-carried [QW, K*C] carry
                        return apply_t(slab_tile(pl.multiple_of(s0, 8)))

                    def multi(_):
                        def cond(c):
                            return jnp.logical_not(c[1])

                        def body(c):
                            # padded table (see _conv_kernel): fixed slab
                            # grid, no clamp, no double-count guard
                            s, _, g = c
                            s = pl.multiple_of(s, 8)
                            return (s + SLAB, s + SLAB > hi,
                                    g + slab_tile(s))

                        _, _, g = jax.lax.while_loop(
                            cond, body,
                            (s0, jnp.bool_(False),
                             jnp.zeros((QW, K * C), jnp.float32)))
                        return apply_t(g)

                    return jax.lax.cond(hi < s0 + SLAB, single, multi, 0)

                # empty rank window: skip walk AND matmul (same gate as
                # the forward kernel; most windows are empty for k9)
                return jax.lax.cond(lo <= hi, nonempty, lambda a: a, acc)

            acc = jax.lax.fori_loop(
                0, NB, block, jnp.zeros((K * C, Cout), jnp.float32))
            dw_ref[0, dxi, dy] = acc
        return 0

    jax.lax.fori_loop(0, K, dx_body, 0)


def _pallas_dw(coords, valid, feats, gout, kernel_size: int,
               stride: int = 1, qlat=None, qvalid=None,
               w_groups: int = 0, train: bool = False):
    """dL/dW of ``_pallas_forward`` given output cotangent ``gout``
    [G, NQ, Cout] (pre-masked by query validity).  Returns
    [Gw, K, K, K*C, Cout] f32 with the scene axis already reduced when
    ``w_groups`` shares weights across folded scenes."""
    G = feats.shape[0]
    Cout = gout.shape[-1]
    lo, hi, keys_col, keys_row, featsb, \
        (K, C, N, NQ, QW, SLAB, NB) = _prep_tables(
            coords, valid, feats, kernel_size, stride, qlat, qvalid,
            train=train)
    goutb = gout.astype(jnp.bfloat16)

    kern = functools.partial(_dw_kernel, K=K, C=C, Cout=Cout, N=N, NQ=NQ,
                             QW=QW, SLAB=SLAB)
    interpret = jax.default_backend() != "tpu"
    dw = pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, K, NB), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, K, K, NB), lambda g: (g, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, N + SLAB, 1), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ // _LANE, _LANE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N + SLAB, C), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NQ, Cout), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, K, K * C, Cout),
                               lambda g: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, K, K, K * C, Cout),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NQ // _LANE, _LANE), jnp.int32),
            pltpu.VMEM((NQ // _LANE, _LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(lo, hi, keys_col, keys_row, featsb, goutb)
    if w_groups and w_groups != G:
        dw = dw.reshape((G // w_groups, w_groups) + dw.shape[1:]).sum(0)
    return dw


def _dw_to_w_layout(dw, K, C, w_like):
    """[Gw, K, K, K*C, Cout] (dz-major rows) -> w's [Gw, K^3, Cin, Cout]."""
    Gw, Cout = dw.shape[0], dw.shape[-1]
    return dw.reshape(Gw, K, K, K, C, Cout) \
             .reshape(Gw, K ** 3, C, Cout).astype(w_like.dtype)


def subm_conv_classes_mxu(coords, valid, feats, w, kernel_size: int,
                          stride: int = 1, w_groups: int = 0,
                          train: bool = False):
    """(Per-class) submanifold K^3 conv, MXU-fused forward + XLA-vjp
    backward.

    coords i32[G, N, 3] lattice coords SORTED by packed key of
    coords//stride with invalid rows last (unique_voxels* layout);
    valid [G, N]; feats [G, N, C]; w [G, K^3, Cin, Cout] in conv_offsets
    order (x-major, z-fastest).  Returns f32[G, N, Cout].

    w_groups: scene-folded weight sharing (see _pallas_forward).
    """
    from ..core.sparse_conv import scan_conv_grouped_classes

    @jax.custom_vjp
    def f(coords, valid, feats, w):
        return _pallas_forward(coords, valid, feats, w, kernel_size,
                               stride, w_groups=w_groups, train=train)

    def fwd(coords, valid, feats, w):
        return f(coords, valid, feats, w), (coords, valid, feats, w)

    def bwd(res, g):
        # scatter-free either way; default keeps the backward on the MXU
        # kernels: dfeats IS the same submanifold conv with reversed,
        # transposed weights (one more _pallas_forward), and dW is the
        # fused transposed weight-apply (_dw_kernel).  CAGROUP_XLA_BWD=1
        # opts back into the XLA z-run paths (core/sparse_conv.py).
        from ..core.sparse_conv import _dw_only, _w_rev_t
        coords, valid, feats, w = res
        g = jnp.where(valid[..., None], g, 0.0)
        if _mxu_bwd_enabled():
            dfe = _pallas_forward(
                coords, valid, g, _w_rev_t(w), kernel_size, stride,
                w_groups=w_groups, train=train).astype(feats.dtype)
            dwe = _dw_to_w_layout(
                _pallas_dw(coords, valid, feats, g, kernel_size, stride,
                           w_groups=w_groups, train=train),
                kernel_size, feats.shape[-1], w)
        else:
            dfe = scan_conv_grouped_classes(
                coords, valid, g, stride, kernel_size, _w_rev_t(w),
                w_groups=w_groups
            ).astype(feats.dtype)
            dwe = _dw_only(
                lambda we: scan_conv_grouped_classes(
                    coords, valid, feats, stride, kernel_size, we,
                    w_groups=w_groups), w, g)
        zc = np.zeros(coords.shape, jax.dtypes.float0)
        zv = np.zeros(valid.shape, jax.dtypes.float0)
        return zc, zv, dfe, dwe

    f.defvjp(fwd, bwd)
    return f(coords, valid, feats, w)


def subm_conv_mxu(st_coords, st_valid, st_feats, w, kernel_size: int,
                  stride: int, train: bool = False):
    """Single-table wrapper (backbone subm convs): adds the class axis."""
    out = subm_conv_classes_mxu(st_coords[None], st_valid[None],
                                st_feats[None], w[None], kernel_size,
                                stride, train=train)
    return out[0]


def conv_at_coords_mxu(src_coords, src_valid, src_feats, src_stride: int,
                       qlat, qvalid, kernel_size: int, w,
                       train: bool = False):
    """Single-table conv-at-coords: evaluate a K^3 conv over the source
    sparse tensor AT a separate sorted query lattice (the RoI head's
    grid_conv on backbone voxels, reference cagroup_roi_head.py:69).

    src_coords i32[N, 3] raw-lattice coords (key-sorted by
    coords//stride); qlat i32[NQ, 3] query coords in src//stride units,
    key-sorted with invalid rows last (unique_voxels layout);
    w [K^3, Cin, Cout].  MXU-fused forward + XLA-vjp backward
    (core.sparse_conv.scan_conv_grouped).
    """
    from ..core.sparse_conv import scan_conv_grouped

    @jax.custom_vjp
    def f(src_coords, src_valid, src_feats, qlat, qvalid, w):
        return _pallas_forward(
            src_coords[None], src_valid[None], src_feats[None], w[None],
            kernel_size, src_stride, qlat=qlat[None],
            qvalid=qvalid[None], train=train)[0]

    def fwd(src_coords, src_valid, src_feats, qlat, qvalid, w):
        return f(src_coords, src_valid, src_feats, qlat, qvalid, w), \
            (src_coords, src_valid, src_feats, qlat, qvalid, w)

    def bwd(res, g):
        # scatter-free (see core/sparse_conv.py scan_conv_grouped_t);
        # default keeps both grads on the MXU kernels with the tables'
        # roles swapped: dfeats is a conv-at-coords FROM the query table
        # AT the source lattice with reversed, transposed weights
        from ..core.sparse_conv import _dw_only, _w_rev_t
        src_coords, src_valid, src_feats, qlat, qvalid, w = res
        g = jnp.where(qvalid[:, None], g, 0.0)
        NQ, N = qlat.shape[0], src_coords.shape[0]
        slab = _SLAB_FOR[_LANE]
        if _mxu_bwd_enabled() and NQ % _LANE == 0 and NQ >= slab \
                and N % _LANE == 0 and N >= slab:
            src_lat = jnp.floor_divide(src_coords, src_stride) \
                if src_stride != 1 else src_coords
            dfe = _pallas_forward(
                qlat[None], qvalid[None], g[None], _w_rev_t(w)[None],
                kernel_size, 1, qlat=src_lat[None],
                qvalid=src_valid[None], train=train
            )[0].astype(src_feats.dtype)
            dwe = _dw_to_w_layout(
                _pallas_dw(src_coords[None], src_valid[None],
                           src_feats[None], g[None], kernel_size,
                           src_stride, qlat=qlat[None],
                           qvalid=qvalid[None], train=train),
                kernel_size, src_feats.shape[-1], w[None])[0]
        else:
            dfe = scan_conv_grouped(
                qlat * src_stride, qvalid, g, src_stride, src_coords,
                src_valid, kernel_size,
                _w_rev_t(w)).astype(src_feats.dtype)
            dwe = _dw_only(
                lambda we: scan_conv_grouped(
                    src_coords, src_valid, src_feats, src_stride,
                    qlat * src_stride, qvalid, kernel_size, we), w, g)
        z = lambda a: np.zeros(a.shape, jax.dtypes.float0)
        return (z(src_coords), z(src_valid), dfe, z(qlat), z(qvalid), dwe)

    f.defvjp(fwd, bwd)
    return f(src_coords, src_valid, src_feats, qlat, qvalid, w)
