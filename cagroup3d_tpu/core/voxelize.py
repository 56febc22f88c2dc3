"""Quantization + deduplication (voxelization) with static capacity.

Replaces MinkowskiEngine's ``SparseTensor(coordinates=..., features=...)``
quantization (reference: detector input voxelization cagroup3d.py:18-25,
dense-head per-class re-voxelization with UNWEIGHTED_AVERAGE
cagroup_head.py:254-271, RoI grid dedup cagroup_roi_head.py:54-68).

Algorithm: pack coords to int32 keys -> single sort -> head-flag unique ->
segment-sum features.  Everything is O(P log P) with static shapes; voxels
beyond ``cap`` uniques are dropped deterministically (largest keys first).
"""
from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp

from .hashing import INVALID_KEY, pack_coords
from .sparse import PAD_COORD, SparseTensor


def arrival_rank(lat: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Per-point rank within its voxel in ARRIVAL order: the i-th valid
    point landing in a voxel gets rank i (spconv's point-to-voxel fill
    order, reference data_processor.py transform_points_to_voxels —
    the voxelizer keeps the first MAX_POINTS_PER_VOXEL points of the
    already-shuffled array).  Invalid rows get a large rank.

    lat i32[P, 3]; valid [P].  Returns i32[P]."""
    keys = pack_coords(lat, valid)
    P = keys.shape[0]
    idx = jnp.arange(P, dtype=jnp.int32)
    order = jnp.argsort(keys, stable=True).astype(jnp.int32)
    sk = jnp.take(keys, order)
    is_new = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    start = jnp.maximum.accumulate(jnp.where(is_new, idx, 0))
    pos = idx - start
    rank = jnp.zeros((P,), jnp.int32).at[order].set(pos)
    return jnp.where(valid, rank, jnp.int32(1 << 30))


def unique_voxels(lat: jnp.ndarray, feats: jnp.ndarray, valid: jnp.ndarray,
                  cap: int, mode: str = "mean", stats: dict = None,
                  stat_name: str = "unique", drop_offset=None
                  ) -> Tuple[SparseTensor, jnp.ndarray]:
    """Deduplicate lattice coords, reducing features per voxel.

    Args:
      lat: i32[P, 3] lattice coords (already divided by any stride).
      feats: f32[P, F].
      valid: bool[P].
      cap: static output capacity.
      mode: 'mean' == ME UNWEIGHTED_AVERAGE; 'first' == one representative
        per voxel (deterministic stand-in for ME RANDOM_SUBSAMPLE).

    Returns:
      (SparseTensor with stride=1 semantics over `lat` units,
       inverse i32[P]: output row of each input point, -1 if dropped).
    """
    import jax
    from .gather import take1, take_rows

    P0 = lat.shape[0]
    # pad to a lane multiple: _count_sorted degrades to a full [cap, P]
    # compare when P % 128 != 0 (CH=1), and the chunked prefix sums lose
    # their 128-wide blocks
    P = -(-P0 // 128) * 128
    if P != P0:
        lat = jnp.pad(lat, ((0, P - P0), (0, 0)))
        feats = jnp.pad(feats, ((0, P - P0), (0, 0)))
        valid = jnp.pad(valid, (0, P - P0))
    keys = pack_coords(lat, valid)
    iota = jnp.arange(P, dtype=jnp.int32)
    # NB: the 1-D (dimension=0) variadic sort lowers to a catastrophic
    # path on TPU (measured 91 ms at P=100k); the identical sort with a
    # unit batch dim and dimension=1 runs in 2.4 ms.  Keep the batch dim.
    sk, order = jax.lax.sort((keys[None], iota[None]), dimension=1,
                             num_keys=1)
    sk, order = sk[0], order[0]
    head = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    ok = sk != INVALID_KEY
    uid_sorted = jnp.cumsum((head & ok).astype(jnp.int32)) - 1
    ok_sorted = ok & (uid_sorted < cap)
    if stats is not None:
        n_unique = jnp.sum((head & ok).astype(jnp.int32))
        stats[f"overflow/{stat_name}"] = jnp.maximum(n_unique - cap, 0)

    # per-voxel row ranges by rank counting on the sorted uid sequence
    # (see unique_voxels_classes_paired) — replaces the per-row scatters,
    # which dominate on TPU (scatter cost is per ROW)
    n_uni = jnp.sum((head & ok).astype(jnp.int32))
    vq = _window_ranks(n_uni, cap, drop_offset)                  # [1, cap]
    uid2 = jnp.where(ok, uid_sorted, jnp.int32(1 << 30))[None]   # [1, P]
    start = _count_sorted(uid2, vq, strict=True)[0]              # [cap]
    end = _count_sorted(uid2, vq, strict=False)[0] - 1
    cnt = jnp.maximum(end - start + 1, 0)
    out_valid = cnt > 0

    first_row = take1(order, jnp.clip(start, 0, P - 1))          # [cap]
    out_coords = jnp.where(out_valid[:, None],
                           take_rows(lat, first_row), PAD_COORD)

    # Inverse map in original row order (one int scatter; callers need it
    # for vote targets / RoI scatter-back).
    if drop_offset is None:
        slot = uid_sorted
        kept = ok_sorted
    else:
        o_eff = jnp.where(n_uni > cap,
                          jnp.asarray(drop_offset, jnp.int32) %
                          jnp.maximum(n_uni, 1), 0)
        wrap = jnp.where(n_uni > cap,
                         jnp.maximum(o_eff + cap - n_uni, 0), 0)
        r = uid_sorted
        slot = jnp.where(r < wrap, r, r - o_eff + wrap)
        kept = ok & ((r < wrap) | (r >= o_eff)) & (slot < cap) & \
            (slot >= 0)
    uid = jnp.zeros((P,), jnp.int32).at[order].set(
        jnp.where(kept, slot, -1))[:P0]

    if mode == "mean":
        F = feats.shape[-1]
        fs = take_rows(jnp.where(valid[:, None], feats, 0.0), order)
        CH = 128
        NCH = P // CH
        local = jnp.cumsum(fs.reshape(NCH, CH, F).astype(jnp.float32),
                           axis=1)
        tot = local[:, -1, :]
        choff = jnp.concatenate(
            [jnp.zeros_like(tot[:1]), jnp.cumsum(tot, axis=0)[:-1]], 0)
        localf = local.reshape(P, F)

        def prefix_at(p):
            return take_rows(localf, p) + take_rows(choff, p // CH)

        s_end = prefix_at(jnp.maximum(end, 0))
        s_before = prefix_at(jnp.maximum(start - 1, 0))
        s_before = jnp.where((start > 0)[:, None], s_before, 0.0)
        out_feats = ((s_end - s_before) /
                     jnp.maximum(cnt, 1)[:, None]).astype(feats.dtype)
    elif mode == "first":
        out_feats = take_rows(feats, first_row)
    else:
        raise ValueError(mode)

    out_feats = jnp.where(out_valid[:, None], out_feats, 0.0)
    st = SparseTensor(out_coords, out_feats, out_valid, stride=1)
    return st, uid


def unique_voxels_classes(lat: jnp.ndarray, feats: jnp.ndarray,
                          valid: jnp.ndarray, cap: int, mode: str = "mean",
                          stats: dict = None, stat_name: str = "classes"):
    """Class-batched unique_voxels with the class axis flattened out of
    every scatter/gather (batched scatters scalarize on TPU).

    lat i32[G, P, 3], feats [G, P, F], valid [G, P] ->
    (coords [G, cap, 3], feats [G, cap, F], valid [G, cap]).
    """
    G, P, _ = lat.shape
    F = feats.shape[-1]
    keys = pack_coords(lat, valid)                       # [G, P]
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)  # batched sort is ok
    sk = jnp.take_along_axis(keys, order, axis=1)
    head = jnp.concatenate([jnp.ones((G, 1), bool), sk[:, 1:] != sk[:, :-1]],
                           axis=1)
    uid_sorted = jnp.cumsum(head.astype(jnp.int32), axis=1) - 1
    ok_sorted = (sk != INVALID_KEY) & (uid_sorted < cap)
    if stats is not None:
        n_unique = jnp.sum((head & (sk != INVALID_KEY)).astype(jnp.int32),
                           axis=1)
        stats[f"overflow/{stat_name}"] = jnp.sum(
            jnp.maximum(n_unique - cap, 0))

    cls0 = (jnp.arange(G, dtype=jnp.int32) * (cap + 1))[:, None]
    slot = jnp.where(head & ok_sorted, uid_sorted, cap) + cls0   # [G, P]
    lat_sorted = jnp.take_along_axis(lat, order[..., None], axis=1)
    out_coords = (jnp.full((G * (cap + 1), 3), PAD_COORD, jnp.int32)
                  .at[slot.reshape(-1)].set(lat_sorted.reshape(-1, 3)))
    out_coords = out_coords.reshape(G, cap + 1, 3)[:, :cap]

    clsP = (jnp.arange(G, dtype=jnp.int32) * P)[:, None]
    uid = jnp.zeros((G * P,), jnp.int32).at[
        (order + clsP).reshape(-1)].set(
            jnp.where(ok_sorted, uid_sorted, -1).reshape(-1)).reshape(G, P)
    seg = jnp.where(uid >= 0, uid, cap) + cls0
    cnt = jnp.zeros((G * (cap + 1),), jnp.int32).at[seg.reshape(-1)].add(
        1).reshape(G, cap + 1)[:, :cap]
    if mode == "mean":
        ssum = jnp.zeros((G * (cap + 1), F), feats.dtype).at[
            seg.reshape(-1)].add(
                jnp.where(valid[..., None], feats, 0.0).reshape(-1, F))
        out_feats = ssum.reshape(G, cap + 1, F)[:, :cap] / \
            jnp.maximum(cnt, 1)[..., None]
    elif mode == "first":
        out_feats = jnp.zeros((G * (cap + 1), F), feats.dtype).at[
            slot.reshape(-1)].set(
                jnp.take_along_axis(feats, order[..., None], axis=1)
                .reshape(-1, F)).reshape(G, cap + 1, F)[:, :cap]
    else:
        raise ValueError(mode)
    out_valid = cnt > 0
    out_feats = jnp.where(out_valid[..., None], out_feats, 0.0)
    return out_coords, out_feats, out_valid


def voxelize_points(points: jnp.ndarray, feats: jnp.ndarray,
                    valid: jnp.ndarray, voxel_size, cap: int,
                    mode: str = "mean") -> Tuple[SparseTensor, jnp.ndarray]:
    """Metric points -> voxel grid (floor(p / voxel_size)), then dedup.

    voxel_size may be scalar or per-axis [3] (the dense head's class-aware
    anisotropic voxel sizes, cagroup_head.py:75-106).
    """
    lat = jnp.floor(points / jnp.asarray(voxel_size)).astype(jnp.int32)
    return unique_voxels(lat, feats, valid, cap, mode)


def stride_reduce_coords(st: SparseTensor, factor: int, cap: int,
                         stats: dict = None, stat_name: str = "stride"
                         ) -> Tuple[SparseTensor, jnp.ndarray]:
    """Coordinate set of a strided (downsampling) conv/pool output.

    ME semantics: out coords = unique(floor(c / (stride*factor)) *
    stride*factor) on the coarser lattice.  Features are NOT carried (the
    conv computes them); we pass zeros.
    """
    new_stride = st.stride * factor
    lat = jnp.floor_divide(st.coords, new_stride)
    dummy = jnp.zeros((st.cap, 1), st.feats.dtype)
    ded, inv = unique_voxels(lat, dummy, st.valid, cap, mode="first",
                             stats=stats, stat_name=stat_name)
    out = SparseTensor(
        coords=jnp.where(ded.valid[:, None], ded.coords * new_stride,
                         PAD_COORD),
        feats=jnp.zeros((cap, st.num_channels), st.feats.dtype),
        valid=ded.valid,
        stride=new_stride,
    )
    return out, inv


def _count_sorted(u: jnp.ndarray, m, strict: bool) -> jnp.ndarray:
    """Per class, #entries of the SORTED i32[G, P] sequence ``u`` that are
    < q (strict) or <= q (not) for queries q = 0..m-1 (or an explicit
    query array i32[G, m]).  Two-level lookup: block leads narrow the
    block, one gathered 128-row block refines — ~P/128 row gathers per
    class instead of a P-row scatter."""
    import jax

    G, P = u.shape
    CH = 128 if P % 128 == 0 else 1
    R = P // CH
    leads = u[:, ::CH]                                    # [G, R]
    if isinstance(m, int):
        q = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None], (G, m))
    else:
        q = m
        m = q.shape[1]
    # pick the single block where the q-boundary crosses.  u is NOT
    # unique (uid runs), so the lead comparison must match the count's
    # strictness: strict -> block of the first element >= q (all blocks
    # with lead < q precede or contain it), non-strict -> first > q.
    if strict:
        ge = q[:, :, None] > leads[:, None, :]            # lead < q
    else:
        ge = q[:, :, None] >= leads[:, None, :]           # lead <= q
    r = jnp.clip(jnp.sum(ge.astype(jnp.int32), axis=-1) - 1, 0, R - 1)
    # batched row fetch (take_along_axis keeps the class batch dim; the
    # flattened unbatched take hits the slow TPU gather path)
    rows = jnp.take_along_axis(u.reshape(G, R, CH), r[..., None], axis=1)
    if strict:
        c = jnp.sum((rows < q[..., None]).astype(jnp.int32), axis=-1)
    else:
        c = jnp.sum((rows <= q[..., None]).astype(jnp.int32), axis=-1)
    return r * CH + c


def _count_sorted_lt(u, m):
    return _count_sorted(u, m, strict=True)


def _count_sorted_le(u, m):
    return _count_sorted(u, m, strict=False)


def _window_ranks(n_unique, cap: int, drop_offset):
    """Voxel ranks kept under capacity overflow: a CYCLIC window
    [o, o+cap) mod n of the key-rank order instead of always the
    smallest keys (round-2 verdict item 9: the smallest-keys policy
    sheds a deterministic spatial corner slab; the rotated window keeps
    the output key-sorted — slots in ascending rank — while the dropped
    region moves every step).  drop_offset None -> o = 0 (deterministic
    eval).  n_unique i32[G] (or scalar); returns i32[G, cap] ranks."""
    s = jnp.arange(cap, dtype=jnp.int32)[None]
    n = jnp.asarray(n_unique, jnp.int32).reshape(-1, 1)
    if drop_offset is None:
        return jnp.broadcast_to(s, (n.shape[0], cap))
    do = jnp.asarray(drop_offset, jnp.int32)
    if do.ndim:                     # per-group offsets (scene-folded)
        do = do.reshape(-1, 1)
    o = jnp.where(n > cap, do % jnp.maximum(n, 1), 0)
    # no overflow -> identity window (wrap MUST be 0, else ranks
    # [0, cap-n) would be emitted twice: once at slot s and again at
    # slot s + cap - n)
    wrap = jnp.where(n > cap, jnp.maximum(o + cap - n, 0), 0)
    return jnp.where(s < wrap, s, s + o - wrap)


def unique_voxels_classes_paired(lat: jnp.ndarray, feats: jnp.ndarray,
                                 valid: jnp.ndarray, cap_fine: int,
                                 cap_coarse: int, coarse_factor: int,
                                 stats: dict = None, drop_offset=None,
                                 feats_groups: int = 0,
                                 return_stats: bool = False,
                                 train: bool = False):
    """Build the fine map AND its ``coarse_factor``-times-coarser map with
    one FULL-SIZE sort (the dense head's per-class fine + expand
    re-voxelizations, cagroup_head.py:257-271).

    The fine map is a flat-scatter segment mean over the [G, P] sort.
    The coarse map is then built FROM THE FINE MAP: coarse lattice =
    fine // factor, and a count-weighted mean of fine-voxel means equals
    the point mean exactly, so the second sort is over cap_fine rows
    instead of P (the fine caps are 16x smaller than the candidate pool).
    Features flow in bf16 (the gathers and scatter-adds are HBM-bound);
    accumulation error for tens-of-points means is ~1e-2 relative, inside
    conv input precision.  Divergence from two independent builds: points
    whose fine voxel was capacity-dropped don't reach the coarse map
    (counted in stats; capacity overflow is already a flagged condition).

    lat i32[G, P, 3] FINE lattice coords; feats [P, F] (shared across
    classes); valid [G, P] per-class selection.
    Returns ((coords, feats, valid) fine, (coords, feats, valid) coarse).

    feats_groups > 0 (scene-folded, core/scene_fold.py): feats is
    [feats_groups * P, F] — G = B * n_cls tables where consecutive
    n_cls groups share scene b's feature block (row offset b * P).
    drop_offset may be a per-group i32[G] vector in that mode.
    return_stats: additionally return per-group overflow counts
    (of_fine i32[G], of_coarse i32[G]) as a third element instead of
    (only) mutating ``stats`` — the scene-fold custom_vmap boundary
    cannot carry dict side-channels.
    """
    import jax

    G, P, _ = lat.shape
    F = feats.shape[-1]
    keys = pack_coords(lat, valid)                        # [G, P]
    # one sort carries the permutation alongside the keys: measured
    # 4.4 ms at [18, 65536] vs 12.3 ms for argsort + a row gather of the
    # keys (row-granularity gathers dominate).  The variadic sort is
    # expensive to COMPILE (~334 s cold through the remote service) but
    # the persistent compile cache amortizes it.
    iota = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (G, P))
    sk, order = jax.lax.sort((keys, iota), dimension=1, num_keys=1)
    # sorted lattice coords by UNPACKING the sorted keys (pure ALU; avoids
    # a 1.2M-row gather of 12-byte rows)
    from .hashing import _MARGIN, key_extents, key_shifts
    (ex, ey, ez), (sx, sy) = key_extents(), key_shifts()
    lat_s = jnp.stack(
        [(jax.lax.shift_right_logical(sk, sx) & (ex - 1)),
         (jax.lax.shift_right_logical(sk, sy) & (ey - 1)),
         sk & (ez - 1)], axis=-1) - _MARGIN               # [G, P, 3]
    from .gather import take_rows
    order_rows = order
    if feats_groups:
        # folded scenes: group g gathers from scene (g*feats_groups//G)'s
        # feature block
        blk = (jnp.arange(G, dtype=jnp.int32) * feats_groups) // G
        order_rows = order + (blk * P)[:, None]
    feats_s = take_rows(feats.astype(jnp.bfloat16), order_rows.reshape(-1))
    # [G*P, F] bf16 (batched gather formulation; core/gather.py)

    # ---- fine map ----
    head = jnp.concatenate(
        [jnp.ones((G, 1), bool), sk[:, 1:] != sk[:, :-1]], axis=1)
    ok = sk != INVALID_KEY
    uid = jnp.cumsum((head & ok).astype(jnp.int32), axis=1) - 1
    n_unique_f = jnp.sum((head & ok).astype(jnp.int32), axis=1)
    of_fine = jnp.maximum(n_unique_f - cap_fine, 0)        # [G]
    if stats is not None:
        stats["overflow/head_fine"] = jnp.sum(of_fine)
    # The Pallas segsum kernel has no VJP, so the fast path is EVAL
    # ONLY.  ``train`` is the explicit gate (threaded from the head's
    # ctx.train); drop_offset-is-None alone used to stand in for it,
    # which would route a future differentiated caller that merely
    # omits drop_offset into a trace-time pallas_call failure far from
    # the cause (round-4 ADVICE).
    if (not train and drop_offset is None
            and jax.default_backend() == "tpu"
            and P % 256 == 0 and cap_fine % 8 == 0
            and os.environ.get("CAGROUP_SEGSUM", "1") != "0"):
        # eval fast path: one-pass Pallas segmented sum over the sorted
        # rows (ops/pallas_segsum.py) replaces the f32 two-level prefix
        # scan + rank-search gathers below; identity window only (the
        # training cyclic drop window emits non-consecutive ranks)
        from ..ops.pallas_segsum import sorted_segment_sums
        f_sum, f_cnt = sorted_segment_sums(
            sk, feats_s.reshape(G, P, F), cap_fine)
        f_valid = f_cnt > 0
        # first row of segment j = #rows of segments < j (sorted layout)
        start = jnp.concatenate(
            [jnp.zeros((G, 1), jnp.int32),
             jnp.cumsum(f_cnt, axis=1)[:, :-1]], axis=1)
        f_coords = jnp.take_along_axis(
            lat_s, jnp.clip(start, 0, P - 1)[..., None], axis=1)
        f_coords = jnp.where(f_valid[..., None], f_coords, PAD_COORD)
        f_feats = jnp.where(
            f_valid[..., None],
            f_sum / jnp.maximum(f_cnt, 1)[..., None], 0.0)
        return _paired_coarse(
            G, F, cap_fine, cap_coarse, coarse_factor, stats,
            return_stats, of_fine, f_coords, f_feats, f_valid, f_sum,
            f_cnt)
    # per-voxel row ranges by RANK COUNTING on the (non-decreasing) uid
    # sequence instead of head/tail scatters: three 1.2M-row scatters
    # become two 74k-row block gathers (scatter/gather cost on TPU is
    # per ROW, so this is ~16x less index traffic)
    n_uni_g = jnp.sum((head & ok).astype(jnp.int32), axis=1)
    vq = _window_ranks(n_uni_g, cap_fine, drop_offset)  # [G, cap_fine]
    uid2 = jnp.where(ok, uid, jnp.int32(1 << 30))     # sorted (invalid last)
    start = _count_sorted(uid2, vq, strict=True)      # [G, cap_fine]
    end = _count_sorted(uid2, vq, strict=False) - 1
    # segment sums via a TWO-LEVEL f32 prefix scan + boundary gathers:
    # a chunk-local cumsum (log 128 = 7 shifted adds) plus a tiny
    # chunk-offset scan halves the HBM passes of the full-width scan
    # (log P = 16), and both beat a 1.2M-row scatter-add by ~5x on TPU
    CH = 128 if P % 128 == 0 else 1
    NCH = P // CH
    fs3 = feats_s.reshape(G, NCH, CH, F).astype(jnp.float32)
    local = jnp.cumsum(fs3, axis=2)                  # [G, NCH, CH, F]
    tot = local[:, :, -1, :]                         # [G, NCH, F]
    choff = jnp.concatenate(
        [jnp.zeros_like(tot[:, :1]), jnp.cumsum(tot, axis=1)[:, :-1]],
        axis=1)                                      # [G, NCH, F]
    f_cnt = jnp.maximum(end - start + 1, 0)
    # voxel coords: gather the first row of each segment
    f_coords = jnp.take_along_axis(
        lat_s, jnp.clip(start, 0, P - 1)[..., None], axis=1)
    f_coords = jnp.where((f_cnt > 0)[..., None], f_coords, PAD_COORD)
    localg = local.reshape(G, P, F)

    def prefix_at(p):
        """S[p] = choff[p // CH] + local[p] (p [G, cap_fine] >= 0);
        per-class batched take_along_axis (the flattened unbatched take
        hits the slow TPU gather path)."""
        a = jnp.take_along_axis(localg, p[..., None], axis=1)
        b = jnp.take_along_axis(choff, (p // CH)[..., None], axis=1)
        return (a + b).reshape(G * cap_fine, F)

    s_end = prefix_at(jnp.maximum(end, 0))
    s_before = prefix_at(jnp.maximum(start - 1, 0))
    s_before = jnp.where((start.reshape(-1) > 0)[:, None], s_before, 0.0)
    f_sum = (s_end - s_before).reshape(G, cap_fine, F)
    f_valid = f_cnt > 0
    f_feats = jnp.where(
        f_valid[..., None],
        f_sum / jnp.maximum(f_cnt, 1)[..., None], 0.0)

    return _paired_coarse(G, F, cap_fine, cap_coarse, coarse_factor,
                          stats, return_stats, of_fine, f_coords,
                          f_feats, f_valid, f_sum, f_cnt)


def _paired_coarse(G, F, cap_fine, cap_coarse, coarse_factor, stats,
                   return_stats, of_fine, f_coords, f_feats, f_valid,
                   f_sum, f_cnt):
    """Coarse (expand) map from the fine map: count-weighted means over
    the ``coarse_factor``-reduced lattice (shared by the XLA and the
    Pallas-segsum fine paths of unique_voxels_classes_paired)."""
    lat_c = jnp.floor_divide(f_coords, coarse_factor)
    keys_c = pack_coords(lat_c, f_valid)
    order2 = jnp.argsort(keys_c, axis=1).astype(jnp.int32)
    sk_c = jnp.take_along_axis(keys_c, order2, axis=1)
    lat_c_s = jnp.take_along_axis(lat_c, order2[..., None], axis=1)
    sum_s = jnp.take_along_axis(f_sum, order2[..., None], axis=1
                                ).reshape(G * cap_fine, F)
    cnt_s = jnp.take_along_axis(f_cnt, order2, axis=1).reshape(-1)

    head2 = jnp.concatenate(
        [jnp.ones((G, 1), bool), sk_c[:, 1:] != sk_c[:, :-1]], axis=1)
    ok2 = sk_c != INVALID_KEY
    uid2 = jnp.cumsum((head2 & ok2).astype(jnp.int32), axis=1) - 1
    keep2 = ok2 & (uid2 < cap_coarse)
    n_unique2 = jnp.sum((head2 & ok2).astype(jnp.int32), axis=1)
    of_coarse = jnp.maximum(n_unique2 - cap_coarse, 0)     # [G]
    if stats is not None:
        stats["overflow/head_expand"] = jnp.sum(of_coarse)
    cls2 = (jnp.arange(G, dtype=jnp.int32) * (cap_coarse + 1))[:, None]
    slot2 = jnp.where(head2 & keep2, uid2, cap_coarse) + cls2
    c_coords = (jnp.full((G * (cap_coarse + 1), 3), PAD_COORD, jnp.int32)
                .at[slot2.reshape(-1)].set(lat_c_s.reshape(-1, 3)))
    c_coords = c_coords.reshape(G, cap_coarse + 1, 3)[:, :cap_coarse]
    seg2 = jnp.where(keep2, uid2, cap_coarse) + cls2
    c_cnt = jnp.zeros((G * (cap_coarse + 1),), jnp.int32).at[
        seg2.reshape(-1)].add(jnp.where(keep2, cnt_s.reshape(G, cap_fine),
                                        0).reshape(-1))
    c_cnt = c_cnt.reshape(G, cap_coarse + 1)[:, :cap_coarse]
    c_sum = jnp.zeros((G * (cap_coarse + 1), F), jnp.float32).at[
        seg2.reshape(-1)].add(sum_s.astype(jnp.float32))
    c_sum = c_sum.reshape(G, cap_coarse + 1, F)[:, :cap_coarse]
    c_valid = c_cnt > 0
    c_feats = jnp.where(
        c_valid[..., None],
        c_sum / jnp.maximum(c_cnt, 1)[..., None], 0.0)
    if return_stats:
        return ((f_coords, f_feats, f_valid),
                (c_coords, c_feats, c_valid), (of_fine, of_coarse))
    return (f_coords, f_feats, f_valid), (c_coords, c_feats, c_valid)



def spconv_reduce_lat(lat, valid, kernel, stride, padding, cap: int,
                      stats: dict = None, stat_name: str = "spconv",
                      in_extent=None):
    """Output lattice of an spconv-style strided SparseConv3d (spconv
    semantics, unlike ME's floor-divide: output o exists iff some input
    lies in its receptive field o*s - p + [0, k)).

    Per input i and axis a the candidate outputs are
    o in [ceil((i + p - k + 1)/s), floor((i + p)/s)] — for (k=3, s=2,
    p=1) that is {floor(i/2), floor((i+1)/2)} — so a small static
    enumeration covers the pool exactly.

    lat i32[N, 3] input lattice; kernel/stride/padding int or triples.
    in_extent: optional input spatial extent triple; when given, outputs
    are clamped to the dense output extent (X + 2p - k)//s + 1 — spconv
    never creates voxels past the grid edge, and an unclamped candidate
    at the top edge (e.g. i=X-1, k=3, s=2, p=1) would.
    Returns (out_lat [cap, 3] in OUTPUT lattice units, out_valid [cap]).
    """
    import numpy as np
    k = np.broadcast_to(np.asarray(kernel), (3,)).astype(int)
    s = np.broadcast_to(np.asarray(stride), (3,)).astype(int)
    p = np.broadcast_to(np.asarray(padding), (3,)).astype(int)
    out_extent = None
    if in_extent is not None:
        ext = np.broadcast_to(np.asarray(in_extent), (3,)).astype(int)
        out_extent = (ext + 2 * p - k) // s + 1
    # per-input candidate count: width of [ceil((i+p-k+1)/s),
    # floor((i+p)/s)] maximised over i's alignment = 1 + (k-1)//s
    # (independent of p; the old p-based formula undercounted for
    # k=3,s=2,p=1 and could MISS outputs whose aligned input is absent).
    # Over-enumeration is safe: invalid candidates fail the receptive-
    # field check below.
    n_opts = [1 + (kk - 1) // ss for kk, ss in zip(k, s)]
    sj = jnp.asarray(s, jnp.int32)
    pj = jnp.asarray(p, jnp.int32)
    kj = jnp.asarray(k, jnp.int32)
    base = jnp.stack(
        [(lat[:, a] + int(p[a]) - int(k[a]) + 1 + int(s[a]) - 1)
         // int(s[a]) for a in range(3)], -1)  # ceil div, first candidate
    cands, oks = [], []
    for dx in range(n_opts[0]):
        for dy in range(n_opts[1]):
            for dz in range(n_opts[2]):
                o = base + jnp.asarray([dx, dy, dz], jnp.int32)
                lo = o * sj - pj
                okc = jnp.all((lat >= lo) & (lat < lo + kj), axis=-1) & \
                    jnp.all(o >= 0, axis=-1) & valid
                if out_extent is not None:
                    okc = okc & jnp.all(
                        o < jnp.asarray(out_extent, jnp.int32), axis=-1)
                cands.append(o)
                oks.append(okc)
    lat_c = jnp.concatenate(cands, axis=0)
    ok_c = jnp.concatenate(oks, axis=0)
    dummy = jnp.zeros((lat_c.shape[0], 1), jnp.float32)
    ded, _ = unique_voxels(lat_c, dummy, ok_c, cap, mode="first",
                           stats=stats, stat_name=stat_name)
    return ded.coords, ded.valid
