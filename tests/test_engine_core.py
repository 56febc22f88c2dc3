"""Golden tests for the sparse voxel engine against numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.core import (
    SparseTensor, PAD_COORD, unique_voxels, voxelize_points,
    stride_reduce_coords, kernel_offsets, neighbor_table, subm_conv,
    strided_conv, conv_at_coords, transposed_conv, avg_pool, interpolate_at,
    build_index, lookup,
)


def make_sparse(coords, feats, cap, stride=1):
    n = len(coords)
    c = np.full((cap, 3), 1 << 20, np.int32)
    f = np.zeros((cap, feats.shape[1]), np.float32)
    v = np.zeros(cap, bool)
    c[:n] = coords
    f[:n] = feats
    v[:n] = True
    return SparseTensor(jnp.asarray(c), jnp.asarray(f), jnp.asarray(v), stride)


def random_sparse(rng, n, channels, extent=30, stride=1, cap=None):
    cap = cap or n + 16
    # unique coords
    coords = rng.randint(0, extent, size=(3 * n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)[:n] * stride
    feats = rng.randn(len(coords), channels).astype(np.float32)
    return make_sparse(coords, feats, cap, stride), coords, feats


class TestLookup:
    def test_hit_and_miss(self, rng):
        st, coords, feats = random_sparse(rng, 50, 4)
        sk, ror = build_index(jnp.asarray(coords), jnp.ones(len(coords), bool))
        q = np.concatenate([coords[:10], coords[:10] + 1000])
        res = lookup(sk, ror, jnp.asarray(q), jnp.ones(len(q), bool))
        res = np.asarray(res)
        for i in range(10):
            assert np.all(coords[res[i]] == q[i])
        assert np.all(res[10:] == -1)

    def test_negative_margin(self, rng):
        coords = np.array([[-3, 0, 5], [0, 0, 0], [2, -1, 3]], np.int32)
        sk, ror = build_index(jnp.asarray(coords), jnp.ones(3, bool))
        res = np.asarray(lookup(sk, ror, jnp.asarray(coords), jnp.ones(3, bool)))
        assert list(res) == [0, 1, 2]


class TestVoxelize:
    def test_mean_dedup(self, rng):
        pts = rng.rand(200, 3).astype(np.float32) * 2.0
        feats = rng.randn(200, 5).astype(np.float32)
        st, inv = voxelize_points(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.ones(200, bool), 0.5, cap=128)
        lat = np.floor(pts / 0.5).astype(np.int32)
        uniq, uinv = np.unique(lat, axis=0, return_inverse=True)
        assert int(st.num_valid()) == len(uniq)
        got_coords = np.asarray(st.coords)[np.asarray(st.valid)]
        # voxel -> mean features oracle
        ref = {tuple(u): feats[uinv == i].mean(0) for i, u in enumerate(uniq)}
        got_feats = np.asarray(st.feats)[np.asarray(st.valid)]
        for c, f in zip(got_coords, got_feats):
            np.testing.assert_allclose(f, ref[tuple(c)], rtol=1e-5, atol=1e-5)
        # inverse map consistency
        inv = np.asarray(inv)
        coords_all = np.asarray(st.coords)
        for p in range(200):
            assert inv[p] >= 0
            assert tuple(coords_all[inv[p]]) == tuple(lat[p])

    def test_overflow_drop(self, rng):
        pts = rng.rand(100, 3).astype(np.float32) * 10
        feats = np.ones((100, 1), np.float32)
        st, inv = voxelize_points(jnp.asarray(pts), jnp.asarray(feats),
                                  jnp.ones(100, bool), 0.1, cap=16)
        assert int(st.num_valid()) <= 16

    def test_stride_reduce(self, rng):
        st, coords, _ = random_sparse(rng, 40, 3, extent=16, stride=2)
        out, _ = stride_reduce_coords(st, 2, cap=64)
        assert out.stride == 4
        exp = np.unique(coords // 4 * 4, axis=0)
        got = np.asarray(out.coords)[np.asarray(out.valid)]
        got = got[np.lexsort(got.T[::-1])]
        np.testing.assert_array_equal(got, exp[np.lexsort(exp.T[::-1])])


def naive_conv(src_coords, src_feats, tgt_coords, w, offsets, bias=None):
    """Numpy oracle: out[i] = sum_k feats[src == tgt[i]+off[k]] @ w[k]."""
    table = {tuple(c): i for i, c in enumerate(src_coords)}
    out = np.zeros((len(tgt_coords), w.shape[-1]), np.float32)
    for i, t in enumerate(tgt_coords):
        for k, o in enumerate(offsets):
            j = table.get(tuple(t + o))
            if j is not None:
                out[i] += src_feats[j] @ w[k]
    if bias is not None:
        out += bias
    return out


class TestSparseConv:
    def test_subm_conv_matches_oracle(self, rng):
        st, coords, feats = random_sparse(rng, 60, 8)
        w = rng.randn(27, 8, 6).astype(np.float32) * 0.1
        b = rng.randn(6).astype(np.float32)
        out = subm_conv(st, jnp.asarray(w), jnp.asarray(b), 3)
        offs = kernel_offsets(3)
        exp = naive_conv(coords, feats, coords, w, offs, b)
        got = np.asarray(out.feats)[:len(coords)]
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_strided_conv(self, rng):
        st, coords, feats = random_sparse(rng, 60, 4, extent=20, stride=2)
        w = rng.randn(27, 4, 4).astype(np.float32) * 0.1
        out = strided_conv(st, jnp.asarray(w), None, 3, 2, out_cap=64)
        assert out.stride == 4
        out_coords = np.asarray(out.coords)[np.asarray(out.valid)]
        offs = kernel_offsets(3) * 2  # input-stride units
        exp = naive_conv(coords, feats, out_coords, w, offs)
        valid = np.asarray(out.valid)
        got = np.asarray(out.feats)[valid]
        # rows in engine order; oracle computed on the same coord list
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-4)

    def test_conv_at_coords(self, rng):
        st, coords, feats = random_sparse(rng, 50, 4, extent=12, stride=2)
        q = rng.randint(0, 24, size=(20, 3)).astype(np.int32) * 2
        w = rng.randn(125, 4, 4).astype(np.float32) * 0.1
        out = conv_at_coords(st, jnp.asarray(q), jnp.ones(20, bool),
                             jnp.asarray(w), None, 5)
        offs = kernel_offsets(5) * 2
        exp = naive_conv(coords, feats, q, w, offs)
        np.testing.assert_allclose(np.asarray(out.feats), exp, rtol=1e-4,
                                   atol=1e-4)

    def test_generative_transpose(self, rng):
        # stride-3 input, decode at arbitrary stride-1 coords (head pattern,
        # cagroup_head.py:274)
        coarse = np.unique(rng.randint(0, 8, (40, 3)), axis=0).astype(np.int32) * 3
        feats = rng.randn(len(coarse), 4).astype(np.float32)
        st = make_sparse(coarse, feats, len(coarse) + 8, stride=3)
        fine = rng.randint(0, 24, size=(30, 3)).astype(np.int32)
        w = rng.randn(27, 4, 5).astype(np.float32) * 0.1
        out = transposed_conv(st, jnp.asarray(fine), jnp.ones(30, bool),
                              jnp.asarray(w), None, 3, up_factor=3)
        assert out.stride == 1
        # oracle: parent i contributes to c = i + o (o in centered 3^3),
        # weight index = offset index of o
        offs = kernel_offsets(3)
        table = {tuple(c): i for i, c in enumerate(coarse)}
        exp = np.zeros((30, 5), np.float32)
        for n, c in enumerate(fine):
            for k, o in enumerate(offs):
                parent = c - o
                if np.all(parent % 3 == 0):
                    j = table.get(tuple(parent))
                    if j is not None:
                        exp[n] += feats[j] @ w[k]
        np.testing.assert_allclose(np.asarray(out.feats), exp, rtol=1e-4,
                                   atol=1e-4)


class TestGroupedLookup:
    @pytest.mark.parametrize("k,stride", [(3, 1), (5, 2), (9, 1), (3, 4)])
    def test_matches_generic_table(self, rng, k, stride):
        from cagroup3d_tpu.core.kernel_maps import neighbor_table_grouped
        st, coords, feats = random_sparse(rng, 80, 4, extent=14,
                                          stride=stride)
        # query at the source coords plus some arbitrary aligned targets
        extra = rng.randint(0, 16, size=(24, 3)).astype(np.int32) * stride
        tgt = np.concatenate([coords, extra])
        tv = jnp.ones(len(tgt), bool)
        offs = kernel_offsets(k) * stride
        ref = np.asarray(neighbor_table(st, jnp.asarray(tgt), tv, offs))
        got = np.asarray(neighbor_table_grouped(st, jnp.asarray(tgt), tv, k))
        np.testing.assert_array_equal(got, ref)

    def test_scan_conv_grouped_classes_matches_oracle(self, rng):
        from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped_classes
        G, N, C = 3, 128, 4
        coords = np.full((G, N, 3), 1 << 20, np.int32)
        valid = np.zeros((G, N), bool)
        feats = np.zeros((G, N, C), np.float32)
        per_cls = []
        for g in range(G):
            c = np.unique(rng.randint(0, 10, (200, 3)).astype(np.int32),
                          axis=0)[: 64 + g * 10]
            f = rng.randn(len(c), C).astype(np.float32)
            coords[g, :len(c)] = c
            valid[g, :len(c)] = True
            feats[g, :len(c)] = f
            per_cls.append((c, f))
        w = rng.randn(G, 27, C, 5).astype(np.float32) * 0.1
        out = np.asarray(scan_conv_grouped_classes(
            jnp.asarray(coords), jnp.asarray(valid), jnp.asarray(feats), 1,
            3, jnp.asarray(w), compute_dtype=jnp.float32))
        for g in range(G):
            c, f = per_cls[g]
            exp = naive_conv(c, f, c, w[g], kernel_offsets(3))
            np.testing.assert_allclose(out[g, :len(c)], exp, rtol=1e-4,
                                       atol=1e-4)
        assert (out[~valid] == 0).all()

    def test_scan_conv_grouped_matches_oracle(self, rng):
        from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped
        st, coords, feats = random_sparse(rng, 60, 8)
        w = rng.randn(27, 8, 6).astype(np.float32) * 0.1
        b = rng.randn(6).astype(np.float32)
        out = scan_conv_grouped(st.coords, st.valid, st.feats, 1, st.coords,
                                st.valid, 3, jnp.asarray(w), jnp.asarray(b),
                                compute_dtype=jnp.float32)
        exp = naive_conv(coords, feats, coords, w, kernel_offsets(3), b)
        np.testing.assert_allclose(np.asarray(out)[:len(coords)], exp,
                                   rtol=1e-4, atol=1e-4)


class TestPooling:
    def test_avg_pool_oracle(self, rng):
        st, coords, feats = random_sparse(rng, 60, 3, extent=16, stride=1)
        out = avg_pool(st, kernel_size=5, factor=2, out_cap=64)
        assert out.stride == 2
        out_coords = np.asarray(out.coords)[np.asarray(out.valid)]
        got = np.asarray(out.feats)[np.asarray(out.valid)]
        for oc, g in zip(out_coords, got):
            mask = np.all(np.abs(coords - oc) <= 2, axis=1)
            assert mask.any()
            np.testing.assert_allclose(g, feats[mask].mean(0), rtol=1e-4,
                                       atol=1e-4)

    def test_avg_pool_scatter_matmul_agree(self, rng, monkeypatch):
        """The scatter fallback (big tables) == the membership-matmul
        fast path avg_pool defaults to for the DAPPM-sized pools."""
        from cagroup3d_tpu.core import pooling
        st, coords, feats = random_sparse(rng, 200, 3, extent=24, stride=1)
        fast = avg_pool(st, kernel_size=5, factor=2, out_cap=128)
        monkeypatch.setattr(pooling, "_POOL_MATMUL_MAX", 0)
        slow = avg_pool(st, kernel_size=5, factor=2, out_cap=128)
        np.testing.assert_allclose(np.asarray(fast.feats),
                                   np.asarray(slow.feats),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(fast.valid),
                                      np.asarray(slow.valid))

    def test_interpolate_trilinear(self, rng):
        # regular grid so interpolation is exact for linear functions
        g = np.arange(0, 6)
        coords = np.array(np.meshgrid(g, g, g)).reshape(3, -1).T.astype(np.int32)
        feats = (coords @ np.array([[1.0], [2.0], [3.0]])).astype(np.float32)
        st = make_sparse(coords, feats, len(coords) + 8, stride=1)
        q = rng.rand(20, 3).astype(np.float32) * 4 + 0.5
        out = interpolate_at(st, jnp.asarray(q), jnp.ones(20, bool))
        exp = q @ np.array([[1.0], [2.0], [3.0]])
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-4)

    def test_interpolate_on_strided_lattice(self, rng):
        g = np.arange(0, 5) * 4
        coords = np.array(np.meshgrid(g, g, g)).reshape(3, -1).T.astype(np.int32)
        feats = (coords @ np.array([[0.5], [1.0], [-1.0]])).astype(np.float32)
        st = make_sparse(coords, feats, len(coords) + 8, stride=4)
        q = np.array([[4.0, 4.0, 4.0], [6.0, 2.0, 10.0]], np.float32)
        out = interpolate_at(st, jnp.asarray(q), jnp.ones(2, bool))
        exp = q @ np.array([[0.5], [1.0], [-1.0]])
        np.testing.assert_allclose(np.asarray(out), exp, rtol=1e-4, atol=1e-4)


def test_unique_voxels_overflow_counter(rng):
    import jax.numpy as jnp
    from cagroup3d_tpu.core.voxelize import unique_voxels, \
        unique_voxels_classes

    lat = jnp.asarray(rng.randint(0, 6, (500, 3)).astype(np.int32))
    feats = jnp.asarray(rng.randn(500, 4).astype(np.float32))
    valid = jnp.ones(500, bool)
    n_unique = len(np.unique(np.asarray(lat), axis=0))
    stats = {}
    st, _ = unique_voxels(lat, feats, valid, cap=64, stats=stats,
                          stat_name="t")
    assert int(stats["overflow/t"]) == max(n_unique - 64, 0) > 0
    stats2 = {}
    st2, _ = unique_voxels(lat, feats, valid, cap=1024, stats=stats2,
                           stat_name="t")
    assert int(stats2["overflow/t"]) == 0

    latc = jnp.asarray(rng.randint(0, 6, (3, 500, 3)).astype(np.int32))
    featc = jnp.asarray(rng.randn(3, 500, 4).astype(np.float32))
    vc = jnp.ones((3, 500), bool)
    stats3 = {}
    unique_voxels_classes(latc, featc, vc, cap=64, stats=stats3,
                          stat_name="c")
    expect = sum(max(len(np.unique(np.asarray(latc[g]), axis=0)) - 64, 0)
                 for g in range(3))
    assert int(stats3["overflow/c"]) == expect


def test_unique_voxels_classes_paired_matches_two_calls(rng):
    import jax.numpy as jnp
    from cagroup3d_tpu.core.voxelize import (unique_voxels_classes,
                                             unique_voxels_classes_paired)

    G, P, F = 3, 700, 8
    pts = rng.rand(P, 3).astype(np.float32) * 3
    vox = (rng.rand(G, 3) * 0.3 + 0.1).astype(np.float32)
    feats = rng.randn(P, F).astype(np.float32)
    sel = rng.rand(G, P) < 0.5
    lat = np.floor(pts[None] / vox[:, None, :]).astype(np.int32)
    lat_c = np.floor(pts[None] / (vox[:, None, :] * 3)).astype(np.int32)
    np.testing.assert_array_equal(lat_c, np.floor_divide(lat, 3))

    fb = jnp.broadcast_to(jnp.asarray(feats)[None], (G, P, F))
    # fine cap must hold every unique voxel: the paired builder derives
    # the coarse map from the fine map, so fine overflow (a flagged
    # condition) is the one documented divergence
    stats = {}
    fc0, ff0, fv0 = unique_voxels_classes(jnp.asarray(lat), fb,
                                          jnp.asarray(sel), 512)
    cc0, cf0, cv0 = unique_voxels_classes(jnp.asarray(lat_c), fb,
                                          jnp.asarray(sel), 128)
    (fc, ff, fv), (cc, cf, cv) = unique_voxels_classes_paired(
        jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(sel), 512, 128, 3,
        stats=stats)
    assert int(stats["overflow/head_fine"]) == 0
    np.testing.assert_array_equal(np.asarray(fc), np.asarray(fc0))
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(fv0))
    np.testing.assert_allclose(np.asarray(ff), np.asarray(ff0), rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_array_equal(np.asarray(cc), np.asarray(cc0))
    np.testing.assert_array_equal(np.asarray(cv), np.asarray(cv0))
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf0), rtol=2e-2,
                               atol=2e-2)


def test_generative_up_classes_matches_scan(rng):
    import jax.numpy as jnp
    from cagroup3d_tpu.core.kernel_maps import transpose_offsets
    from cagroup3d_tpu.core.sparse_conv import (generative_up_classes,
                                                scan_conv_at_classes)

    G, M, N, C = 2, 128, 256, 16
    src_lat = np.unique(rng.randint(0, 8, (M * 2, 3)), axis=0)[:M]
    src = np.zeros((G, M, 3), np.int32)
    sv = np.zeros((G, M), bool)
    for g in range(G):
        n = M - 10 * g
        src[g, :n] = src_lat[:n] * 3            # raw units, stride 3
        sv[g, :n] = True
    feats = rng.randn(G, M, C).astype(np.float32)
    tgt = rng.randint(0, 24, (G, N, 3)).astype(np.int32)
    tv = rng.rand(G, N) < 0.9
    w = rng.randn(G, 27, C, C).astype(np.float32) * 0.1
    offs = transpose_offsets(3, 1)
    ref = scan_conv_at_classes(jnp.asarray(src), jnp.asarray(sv),
                               jnp.asarray(feats), 3, jnp.asarray(tgt),
                               jnp.asarray(tv), offs, jnp.asarray(w))
    out = generative_up_classes(jnp.asarray(src), jnp.asarray(sv),
                                jnp.asarray(feats), 3, jnp.asarray(tgt),
                                jnp.asarray(tv), jnp.asarray(w))
    err = np.abs(np.asarray(ref) - np.asarray(out)).max() / \
        (np.abs(np.asarray(ref)).max() + 1e-9)
    assert err < 2e-2, err


def test_overflow_drop_window_rotates():
    """With drop_offset set, capacity overflow sheds a rotated rank
    window instead of always the largest keys; output stays key-sorted
    and the inverse map points at the kept slots (round-2 verdict 9)."""
    import numpy as np
    import jax.numpy as jnp
    from cagroup3d_tpu.core.voxelize import unique_voxels
    from cagroup3d_tpu.core.hashing import pack_coords

    rs = np.random.RandomState(0)
    P, CAP = 400, 64
    lat = jnp.asarray(rs.randint(0, 12, (P, 3)).astype(np.int32))
    feats = jnp.asarray(rs.randn(P, 4).astype(np.float32))
    valid = jnp.ones(P, bool)

    st0, inv0 = unique_voxels(lat, feats, valid, CAP, mode="mean")
    kept_sets = []
    for off in (None, 7, 12345, 999999):
        st, inv = unique_voxels(lat, feats, valid, CAP, mode="mean",
                                drop_offset=off)
        keys = np.asarray(pack_coords(st.coords, st.valid))
        kv = keys[np.asarray(st.valid)]
        assert (np.diff(kv) > 0).all(), "output must stay key-sorted"
        assert int(st.valid.sum()) == CAP
        kept_sets.append({tuple(r) for r in
                          np.asarray(st.coords)[np.asarray(st.valid)]})
        # inverse agrees with the output table
        invn = np.asarray(inv)
        cn = np.asarray(st.coords)
        latn = np.asarray(lat)
        for i in range(0, P, 37):
            if invn[i] >= 0:
                assert (cn[invn[i]] == latn[i]).all()
        # per-voxel means are exact for kept voxels
        ref = {}
        for i in range(P):
            ref.setdefault(tuple(latn[i]), []).append(
                np.asarray(feats)[i])
        fn = np.asarray(st.feats)
        for s in range(CAP):
            m = np.mean(ref[tuple(cn[s])], axis=0)
            np.testing.assert_allclose(fn[s], m, rtol=1e-5, atol=1e-5)
    # different offsets keep different windows
    assert kept_sets[1] != kept_sets[2]
    # offset None == offset-free behavior
    assert kept_sets[0] == {tuple(r) for r in
                            np.asarray(st0.coords)[np.asarray(st0.valid)]}


def test_overflow_drop_window_no_overflow_identity():
    """drop_offset with NO overflow must be the identity: every voxel
    exactly once, matching the offset-None map (regression: wrap was
    cap-n when n<cap, duplicating ranks < wrap and corrupting training
    maps)."""
    import numpy as np
    import jax.numpy as jnp
    from cagroup3d_tpu.core.voxelize import unique_voxels

    rs = np.random.RandomState(1)
    P, CAP = 256, 128
    lat = jnp.asarray(rs.randint(0, 4, (P, 3)).astype(np.int32))  # <=64 uniq
    feats = jnp.asarray(rs.randn(P, 4).astype(np.float32))
    valid = jnp.asarray(rs.rand(P) > 0.2)

    st0, inv0 = unique_voxels(lat, feats, valid, CAP, mode="mean")
    for off in (0, 3, 98765):
        st, inv = unique_voxels(lat, feats, valid, CAP, mode="mean",
                                drop_offset=off)
        np.testing.assert_array_equal(np.asarray(st.valid),
                                      np.asarray(st0.valid))
        np.testing.assert_array_equal(np.asarray(st.coords),
                                      np.asarray(st0.coords))
        np.testing.assert_allclose(np.asarray(st.feats),
                                   np.asarray(st0.feats), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv0))
        coords = np.asarray(st.coords)[np.asarray(st.valid)]
        assert len({tuple(r) for r in coords}) == len(coords)
