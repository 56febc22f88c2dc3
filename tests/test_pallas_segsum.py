"""Sorted-run segment-sum kernel (ops/pallas_segsum.py) vs the XLA
fine-map machinery it replaces in unique_voxels_classes_paired."""
import numpy as np
import jax
import jax.numpy as jnp

from cagroup3d_tpu.core.hashing import INVALID_KEY, pack_coords
from cagroup3d_tpu.ops.pallas_segsum import sorted_segment_sums


def _sorted_case(rs, G, P, F, side, occ):
    lat = rs.randint(0, side, (G, P, 3)).astype(np.int32)
    valid = rs.rand(G, P) < occ
    feats = rs.randn(G, P, F).astype(np.float32)
    keys = np.asarray(pack_coords(jnp.asarray(lat), jnp.asarray(valid)))
    order = np.argsort(keys, axis=1, kind="stable")
    sk = np.take_along_axis(keys, order, axis=1)
    fs = np.take_along_axis(feats, order[..., None], axis=1)
    fs[sk == int(INVALID_KEY)] = 0.0
    return sk, fs


def _ref_segments(sk, fs, cap):
    """Numpy oracle: per class, sums/counts of the first ``cap`` key
    runs (invalid rows excluded)."""
    G, P = sk.shape
    F = fs.shape[-1]
    sums = np.zeros((G, cap, F), np.float32)
    cnts = np.zeros((G, cap), np.int64)
    for g in range(G):
        uid = -1
        prev = None
        for i in range(P):
            if sk[g, i] == int(INVALID_KEY):
                break
            if prev is None or sk[g, i] != prev:
                uid += 1
                prev = sk[g, i]
            if uid < cap:
                sums[g, uid] += fs[g, i]
                cnts[g, uid] += 1
    return sums, cnts


def test_segsum_matches_oracle():
    rs = np.random.RandomState(3)
    G, P, F, cap = 4, 1024, 32, 64  # overflow regime: n_unique >> cap
    sk, fs = _sorted_case(rs, G, P, F, side=12, occ=0.8)
    out, cnt = sorted_segment_sums(jnp.asarray(sk),
                                   jnp.asarray(fs), cap,
                                   interpret=True)
    rsums, rcnts = _ref_segments(sk, fs.astype(np.float32), cap)
    assert (np.asarray(cnt) == rcnts).all()
    err = np.abs(np.asarray(out) - rsums).max() / \
        (np.abs(rsums).max() + 1e-9)
    assert err < 2e-2, err  # bf16 rows, f32 accumulate


def test_segsum_no_overflow_and_empty_class():
    rs = np.random.RandomState(5)
    G, P, F, cap = 3, 512, 16, 256  # n_unique < cap; one class empty
    lat = rs.randint(0, 5, (G, P, 3)).astype(np.int32)
    valid = rs.rand(G, P) < 0.5
    valid[2] = False
    feats = rs.randn(G, P, F).astype(np.float32)
    keys = np.asarray(pack_coords(jnp.asarray(lat), jnp.asarray(valid)))
    order = np.argsort(keys, axis=1, kind="stable")
    sk = np.take_along_axis(keys, order, axis=1)
    fs = np.take_along_axis(feats, order[..., None], axis=1)
    fs[sk == int(INVALID_KEY)] = 0.0
    out, cnt = sorted_segment_sums(jnp.asarray(sk), jnp.asarray(fs),
                                   cap, interpret=True)
    rsums, rcnts = _ref_segments(sk, fs.astype(np.float32), cap)
    assert (np.asarray(cnt) == rcnts).all()
    assert (np.asarray(cnt)[2] == 0).all()
    err = np.abs(np.asarray(out) - rsums).max() / \
        (np.abs(rsums).max() + 1e-9)
    assert err < 2e-2, err


def test_segsum_multi_chunk_state_carry(monkeypatch):
    """Runs spanning chunk boundaries: force small chunks so the (base,
    prev, stop) SMEM carry across grid steps is exercised."""
    import cagroup3d_tpu.ops.pallas_segsum as S
    monkeypatch.setattr(S, "_CHUNK", 512)
    rs = np.random.RandomState(11)
    G, P, F, cap = 2, 2048, 16, 128  # nc = 4 chunks
    sk, fs = _sorted_case(rs, G, P, F, side=9, occ=0.9)
    out, cnt = S.sorted_segment_sums(jnp.asarray(sk), jnp.asarray(fs),
                                     cap, interpret=True)
    rsums, rcnts = _ref_segments(sk, fs.astype(np.float32), cap)
    assert (np.asarray(cnt) == rcnts).all()
    err = np.abs(np.asarray(out) - rsums).max() / \
        (np.abs(rsums).max() + 1e-9)
    assert err < 2e-2, err


def test_segsum_non_pow2_rows():
    """P = 256*5 is not divisible by _CHUNK: the chunk size must fall
    back to gcd(P, _CHUNK) = 256 instead of asserting."""
    rs = np.random.RandomState(13)
    G, P, F, cap = 2, 1280, 16, 64
    sk, fs = _sorted_case(rs, G, P, F, side=10, occ=0.7)
    out, cnt = sorted_segment_sums(jnp.asarray(sk), jnp.asarray(fs),
                                   cap, interpret=True)
    rsums, rcnts = _ref_segments(sk, fs.astype(np.float32), cap)
    assert (np.asarray(cnt) == rcnts).all()
    err = np.abs(np.asarray(out) - rsums).max() / \
        (np.abs(rsums).max() + 1e-9)
    assert err < 2e-2, err


def test_paired_maps_fast_path_matches_xla(monkeypatch):
    """unique_voxels_classes_paired with the segsum fast path forced
    (interpret) against the XLA scan path."""
    from cagroup3d_tpu.core import voxelize as V

    rs = np.random.RandomState(7)
    G, P, F = 3, 512, 16
    cap_f, cap_c = 64, 32
    lat = jnp.asarray(rs.randint(0, 14, (G, P, 3)).astype(np.int32))
    feats = jnp.asarray(rs.randn(P, F).astype(np.float32))
    sel = jnp.asarray(rs.rand(G, P) < 0.7)

    (fc0, ff0, fv0), (cc0, cf0, cv0), (o0f, o0c) = \
        V.unique_voxels_classes_paired(lat, feats, sel, cap_f, cap_c, 3,
                                       return_stats=True)

    import cagroup3d_tpu.ops.pallas_segsum as S
    orig = S.sorted_segment_sums
    monkeypatch.setattr(
        S, "sorted_segment_sums",
        lambda sk, fs, cap, interpret=None: orig(sk, fs, cap,
                                                 interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    (fc1, ff1, fv1), (cc1, cf1, cv1), (o1f, o1c) = \
        V.unique_voxels_classes_paired(lat, feats, sel, cap_f, cap_c, 3,
                                       return_stats=True)

    assert (np.asarray(fv0) == np.asarray(fv1)).all()
    assert (np.asarray(fc0) == np.asarray(fc1)).all()
    assert (np.asarray(cv0) == np.asarray(cv1)).all()
    assert (np.asarray(cc0) == np.asarray(cc1)).all()
    assert (np.asarray(o0f) == np.asarray(o1f)).all()
    assert (np.asarray(o0c) == np.asarray(o1c)).all()
    for a, b in ((ff0, ff1), (cf0, cf1)):
        err = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(a)).max() + 1e-9)
        assert err < 2e-2, err
