"""Scene-axis folding (core/scene_fold.py): vmapping the folded grouped
conv ops over scenes must be EXACT vs a per-scene python loop of the raw
ops, for both forward values and gradients (grad-of-vmap), including the
w_groups weight-sharing path that avoids tiling the k^3 weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.core import sparse_conv as sc
from cagroup3d_tpu.core.scene_fold import (folded_at_classes_t,
                                           folded_generative_up_t,
                                           folded_grouped_classes_t)
from cagroup3d_tpu.core.voxelize import unique_voxels_classes
from cagroup3d_tpu.core.kernel_maps import transpose_offsets


B, G, CAP, C = 3, 2, 256, 8


def _tables(rng, seed_shift=0, cap=CAP, n_pts=180):
    """Per-scene per-class sorted tables via unique_voxels_classes."""
    coords, valids, feats = [], [], []
    for b in range(B):
        rs = np.random.RandomState(100 + b + seed_shift)
        lat = rs.randint(0, 12, (G, n_pts, 3)).astype(np.int32)
        f = rs.randn(G, n_pts, C).astype(np.float32)
        v = rs.rand(G, n_pts) > 0.1
        oc, of, ov = unique_voxels_classes(jnp.asarray(lat),
                                           jnp.asarray(f),
                                           jnp.asarray(v), cap)
        coords.append(oc)
        valids.append(ov)
        feats.append(of)
    return (jnp.stack(coords), jnp.stack(valids), jnp.stack(feats))


@pytest.fixture(scope="module")
def tables():
    return _tables(np.random)


def test_folded_grouped_classes_forward_and_grad(tables):
    coords, valid, feats = tables
    w = jnp.asarray(np.random.RandomState(7).randn(G, 27, C, C)
                    .astype(np.float32) * 0.1)

    def folded_loss(feats, w):
        out = jax.vmap(lambda c, v, f: folded_grouped_classes_t(
            c, v, f, 1, 3, w))(coords, valid, feats)
        return jnp.sum(out ** 2), out

    (loss_f, out_f), grads_f = jax.value_and_grad(
        folded_loss, argnums=(0, 1), has_aux=True)(feats, w)

    def ref_loss(feats, w):
        outs = [sc.scan_conv_grouped_classes_t(coords[b], valid[b],
                                               feats[b], 1, 3, w)
                for b in range(B)]
        out = jnp.stack(outs)
        return jnp.sum(out ** 2), out

    (loss_r, out_r), grads_r = jax.value_and_grad(
        ref_loss, argnums=(0, 1), has_aux=True)(feats, w)

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss_f), float(loss_r), rtol=1e-5)
    for gf, gr in zip(grads_f, grads_r):
        gf, gr = np.asarray(gf), np.asarray(gr)
        # both paths accumulate in bf16 with different summation orders;
        # bound the dW noise relative to the gradient scale (the f32
        # exactness of the fold itself is pinned below in
        # test_w_groups_matches_tiled_f32)
        np.testing.assert_allclose(gf, gr, rtol=1e-2,
                                   atol=5e-3 * np.abs(gr).max())


def test_folded_unbatched_matches_raw(tables):
    coords, valid, feats = tables
    w = jnp.asarray(np.random.RandomState(8).randn(G, 27, C, C)
                    .astype(np.float32) * 0.1)
    out_f = folded_grouped_classes_t(coords[0], valid[0], feats[0], 1, 3,
                                     w)
    out_r = sc.scan_conv_grouped_classes_t(coords[0], valid[0], feats[0],
                                           1, 3, w)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-6, atol=1e-6)


def test_folded_generative_up(rng):
    src_c, src_v, src_f = _tables(np.random, seed_shift=50, cap=128,
                                  n_pts=90)
    # fine targets: children of the coarse lattice (x3)
    rs = np.random.RandomState(3)
    tgt_c, tgt_v, _ = _tables(np.random, seed_shift=60, cap=256,
                              n_pts=120)
    w = jnp.asarray(rs.randn(G, 27, C, C).astype(np.float32) * 0.1)

    def folded_loss(sf, w):
        out = jax.vmap(lambda sc_, sv_, f_, tc_, tv_:
                       folded_generative_up_t(sc_ * 3, sv_, f_, 3, tc_,
                                              tv_, w))(
            src_c, src_v, sf, tgt_c, tgt_v)
        return jnp.sum(out ** 2)

    gf_f, gw_f = jax.grad(folded_loss, argnums=(0, 1))(src_f, w)

    def ref_loss(sf, w):
        outs = [sc.generative_up_classes_t(src_c[b] * 3, src_v[b], sf[b],
                                           3, tgt_c[b], tgt_v[b], w)
                for b in range(B)]
        return jnp.sum(jnp.stack(outs) ** 2)

    gf_r, gw_r = jax.grad(ref_loss, argnums=(0, 1))(src_f, w)
    np.testing.assert_allclose(
        np.asarray(gf_f), np.asarray(gf_r), rtol=1e-2,
        atol=5e-3 * float(np.abs(np.asarray(gf_r)).max() + 1e-6))
    np.testing.assert_allclose(
        np.asarray(gw_f), np.asarray(gw_r), rtol=1e-2,
        atol=5e-3 * float(np.abs(np.asarray(gw_r)).max() + 1e-6))


def test_folded_at_classes(rng):
    src_c, src_v, src_f = _tables(np.random, seed_shift=70, cap=128,
                                  n_pts=90)
    tgt_c, tgt_v, _ = _tables(np.random, seed_shift=80, cap=256,
                              n_pts=120)
    offs = transpose_offsets(3, 1)
    rs = np.random.RandomState(5)
    w = jnp.asarray(rs.randn(G, offs.shape[0], C, C)
                    .astype(np.float32) * 0.1)

    def folded(sf):
        out = jax.vmap(lambda a, b_, f_, c_, d_: folded_at_classes_t(
            a * 3, b_, f_, 3, c_, d_, offs, w, tgt_stride=1))(
            src_c, src_v, sf, tgt_c, tgt_v)
        return jnp.sum(out ** 2)

    def ref(sf):
        outs = [sc.scan_conv_at_classes_t(src_c[b] * 3, src_v[b], sf[b],
                                          3, tgt_c[b], tgt_v[b], offs, w,
                                          tgt_stride=1)
                for b in range(B)]
        return jnp.sum(jnp.stack(outs) ** 2)

    np.testing.assert_allclose(float(folded(src_f)), float(ref(src_f)),
                               rtol=1e-5)
    ga, gb = (np.asarray(jax.grad(folded)(src_f)),
              np.asarray(jax.grad(ref)(src_f)))
    np.testing.assert_allclose(ga, gb, rtol=1e-2,
                               atol=5e-3 * (np.abs(gb).max() + 1e-6))


def test_w_groups_matches_tiled_f32(tables):
    """w_groups weight sharing == explicitly tiled weights, and the
    folded dW == per-scene dW, EXACT in f32 compute (the bf16 default
    differs only by summation order)."""
    coords, valid, feats = tables
    Gf = B * G
    cf = coords.reshape(Gf, CAP, 3)
    vf = valid.reshape(Gf, CAP)
    ff = feats.reshape(Gf, CAP, C)
    rs = np.random.RandomState(11)
    w = jnp.asarray(rs.randn(G, 27, C, C).astype(np.float32) * 0.1)
    out_shared = sc.scan_conv_grouped_classes(cf, vf, ff, 1, 3, w,
                                              compute_dtype=jnp.float32,
                                              w_groups=G)
    out_tiled = sc.scan_conv_grouped_classes(cf, vf, ff, 1, 3,
                                             jnp.tile(w, (B, 1, 1, 1)),
                                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out_shared),
                               np.asarray(out_tiled), rtol=1e-5,
                               atol=1e-5)

    def folded(w):
        return jnp.sum(sc.scan_conv_grouped_classes(
            cf, vf, ff, 1, 3, w, compute_dtype=jnp.float32,
            w_groups=G) ** 2)

    def ref(w):
        outs = [sc.scan_conv_grouped_classes(
            coords[b], valid[b], feats[b], 1, 3, w,
            compute_dtype=jnp.float32) for b in range(B)]
        return jnp.sum(jnp.stack(outs) ** 2)

    gf, gr = np.asarray(jax.grad(folded)(w)), np.asarray(jax.grad(ref)(w))
    np.testing.assert_allclose(gf, gr, rtol=1e-4,
                               atol=1e-5 * np.abs(gr).max())


def test_head_train_path_uses_fold(rng):
    """End-to-end: CAGroup3D forward_train (scene-vmapped head) is
    finite and grads flow with the folded ops in place."""
    from test_detector import synthetic_batch, tiny_cfg
    from cagroup3d_tpu.models import build_network
    cfg = tiny_cfg()
    model = build_network(cfg, num_class=cfg.DENSE_HEAD.N_CLASSES)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = synthetic_batch(np.random.RandomState(0), B=2)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1), 0.0)
        return loss, tb

    (loss, tb), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    g = grads["dense_head.cls_individual_out.0.kernel"]
    assert float(jnp.abs(g).sum()) > 0


def test_folded_gather_gemm_matches_vmap(rng):
    """Backbone path: folded gather-GEMM under vmap == raw per-scene,
    forward and grad-of-vmap, with and without the transpose table."""
    from cagroup3d_tpu.core.scene_fold import folded_gather_gemm
    from cagroup3d_tpu.core import sparse_conv as scv
    rs = np.random.RandomState(0)
    Bn, N, K, Cin, Co = 3, 96, 5, 8, 8
    feats = jnp.asarray(rs.randn(Bn, N, Cin).astype(np.float32))
    nbr = jnp.asarray(rs.randint(-1, N, (Bn, K, N)).astype(np.int32))
    w = jnp.asarray(rs.randn(K, Cin, Co).astype(np.float32) * 0.1)
    bias = jnp.asarray(rs.randn(Co).astype(np.float32))

    def folded(feats, w):
        out = jax.vmap(lambda f, n: folded_gather_gemm(f, n, w, bias))(
            feats, nbr)
        return jnp.sum(out ** 2)

    def ref(feats, w):
        outs = [scv.gather_gemm(feats[b], nbr[b], w, bias,
                                compute_dtype=jnp.bfloat16)
                for b in range(Bn)]
        return jnp.sum(jnp.stack(outs) ** 2)

    np.testing.assert_allclose(float(folded(feats, w)),
                               float(ref(feats, w)), rtol=1e-4)
    gf = jax.grad(folded, argnums=(0, 1))(feats, w)
    gr = jax.grad(ref, argnums=(0, 1))(feats, w)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-2,
                                   atol=5e-3 * (np.abs(b).max() + 1e-6))

    # tnbr (scatter-free VJP) path: submanifold reversed table
    tnbr = nbr[:, ::-1]

    def folded_t(feats, w):
        out = jax.vmap(lambda f, n, t: folded_gather_gemm(
            f, n, w, tnbr=t))(feats, nbr, tnbr)
        return jnp.sum(out ** 2)

    def ref_t(feats, w):
        outs = [scv.gather_gemm_t(feats[b], nbr[b], tnbr[b], w, None,
                                  jnp.bfloat16) for b in range(Bn)]
        return jnp.sum(jnp.stack(outs) ** 2)

    np.testing.assert_allclose(float(folded_t(feats, w)),
                               float(ref_t(feats, w)), rtol=1e-4)
    gf = jax.grad(folded_t, argnums=(0, 1))(feats, w)
    gr = jax.grad(ref_t, argnums=(0, 1))(feats, w)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-2,
                                   atol=5e-3 * (np.abs(b).max() + 1e-6))


def test_backbone_fold_gated_on_ctx():
    """Ctx(axis_name=None) keeps the raw path: unbatched reverse-mode AD
    through the backbone still works (test_biresnet contract)."""
    from cagroup3d_tpu.core.module import Ctx
    assert Ctx(train=True).scene_fold is False
    assert Ctx(train=True, axis_name="scene").scene_fold is True


def test_folded_gather_gemm_downconv_shapes(rng):
    """tnbr offsets use the OUTPUT row count: down-conv shaped tables
    (N_out != N_src) — the case that NaN'd the backbone stem grads."""
    from cagroup3d_tpu.core.scene_fold import folded_gather_gemm
    from cagroup3d_tpu.core import sparse_conv as scv
    rs = np.random.RandomState(1)
    Bn, N_src, N_out, K, Cin, Co = 3, 128, 48, 5, 8, 8
    feats = jnp.asarray(rs.randn(Bn, N_src, Cin).astype(np.float32))
    nbr = jnp.asarray(rs.randint(-1, N_src,
                                 (Bn, K, N_out)).astype(np.int32))
    tnbr = jnp.asarray(rs.randint(-1, N_out,
                                  (Bn, K, N_src)).astype(np.int32))
    w = jnp.asarray(rs.randn(K, Cin, Co).astype(np.float32) * 0.1)

    def folded(feats, w):
        out = jax.vmap(lambda f, n, t: folded_gather_gemm(
            f, n, w, tnbr=t))(feats, nbr, tnbr)
        return jnp.sum(out ** 2)

    def ref(feats, w):
        outs = [scv.gather_gemm_t(feats[b], nbr[b], tnbr[b], w, None,
                                  jnp.bfloat16) for b in range(Bn)]
        return jnp.sum(jnp.stack(outs) ** 2)

    np.testing.assert_allclose(float(folded(feats, w)),
                               float(ref(feats, w)), rtol=1e-4)
    gf = jax.grad(folded, argnums=(0, 1))(feats, w)
    gr = jax.grad(ref, argnums=(0, 1))(feats, w)
    for a, b in zip(gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=1e-2,
                                   atol=5e-3 * (np.abs(b).max() + 1e-6))


def test_folded_paired_maps_matches_vmap(rng):
    """Head map build: folded fine+expand re-voxelization under vmap ==
    per-scene raw op (coords/feats/valid and overflow counts), with and
    without drop_offset, including feature gradients."""
    from cagroup3d_tpu.core.scene_fold import folded_paired_maps
    from cagroup3d_tpu.core.voxelize import unique_voxels_classes_paired
    rs = np.random.RandomState(2)
    Bn, Gc, P, F = 2, 3, 256, 4
    capf, capc, factor = 128, 64, 3
    lat = jnp.asarray(rs.randint(0, 20, (Bn, Gc, P, 3)).astype(np.int32))
    feats = jnp.asarray(rs.randn(Bn, P, F).astype(np.float32))
    sel = jnp.asarray(rs.rand(Bn, Gc, P) > 0.3)
    drop = jnp.asarray(rs.randint(0, 1 << 20, (Bn,)).astype(np.int32))

    def folded(feats):
        return jax.vmap(lambda l, f, s, d: folded_paired_maps(
            l, f, s, capf, capc, factor, drop_offset=d))(
            lat, feats, sel, drop)

    fine, coarse, (of_f, of_c) = folded(feats)
    for b in range(Bn):
        rf, rc, (rof, roc) = unique_voxels_classes_paired(
            lat[b], feats[b], sel[b], capf, capc, factor,
            drop_offset=drop[b], return_stats=True)
        for got, ref in zip(fine, rf):
            np.testing.assert_allclose(np.asarray(got[b]),
                                       np.asarray(ref), atol=2e-2)
        for got, ref in zip(coarse, rc):
            np.testing.assert_allclose(np.asarray(got[b]),
                                       np.asarray(ref), atol=2e-2)
        np.testing.assert_array_equal(np.asarray(of_f[b]),
                                      np.asarray(rof))
        np.testing.assert_array_equal(np.asarray(of_c[b]),
                                      np.asarray(roc))

    # gradient flows into per-scene feature blocks identically
    def loss_folded(feats):
        fine, coarse, _ = folded(feats)
        return jnp.sum(fine[1] ** 2) + jnp.sum(coarse[1] ** 2)

    def loss_ref(feats):
        tot = 0.0
        for b in range(Bn):
            rf, rc = unique_voxels_classes_paired(
                lat[b], feats[b], sel[b], capf, capc, factor,
                drop_offset=drop[b])
            tot = tot + jnp.sum(rf[1] ** 2) + jnp.sum(rc[1] ** 2)
        return tot

    gf = np.asarray(jax.grad(loss_folded)(feats))
    gr = np.asarray(jax.grad(loss_ref)(feats))
    np.testing.assert_allclose(gf, gr, rtol=1e-2,
                               atol=5e-3 * (np.abs(gr).max() + 1e-6))

    # no-drop (eval) variant
    fine2, coarse2, _ = jax.vmap(lambda l, f, s: folded_paired_maps(
        l, f, s, capf, capc, factor))(lat, feats, sel)
    rf2, rc2 = unique_voxels_classes_paired(
        lat[0], feats[0], sel[0], capf, capc, factor)
    np.testing.assert_allclose(np.asarray(fine2[1][0]),
                               np.asarray(rf2[1]), atol=2e-2)


def test_folded_pallas_w_groups_interpret(tables):
    """Pallas kernel with w_groups (folded scenes share per-class
    weights via the g % Gw BlockSpec) == raw per-scene kernel, interpret
    mode.  Covers folded_subm_mxu and the single-table fold."""
    from cagroup3d_tpu.core.scene_fold import (folded_subm_mxu,
                                               folded_subm_single_mxu)
    from cagroup3d_tpu.ops.pallas_conv import (subm_conv_classes_mxu,
                                               subm_conv_mxu)
    coords, valid, feats = tables
    rs = np.random.RandomState(21)
    w = jnp.asarray(rs.randn(G, 27, C, C).astype(np.float32) * 0.1)

    out_f = jax.vmap(lambda c, v, f: folded_subm_mxu(c, v, f, w, 3))(
        coords, valid, feats)
    for b in range(B):
        ref = subm_conv_classes_mxu(coords[b], valid[b], feats[b], w, 3)
        np.testing.assert_allclose(np.asarray(out_f[b]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    # single-table (backbone) fold: scenes become the group axis
    w1 = jnp.asarray(rs.randn(27, C, C).astype(np.float32) * 0.1)
    c1, v1, f1 = coords[:, 0], valid[:, 0], feats[:, 0]   # [B, CAP, ...]
    out_s = jax.vmap(lambda c, v, f: folded_subm_single_mxu(
        c, v, f, w1, 3))(c1, v1, f1)
    for b in range(B):
        ref = subm_conv_mxu(c1[b], v1[b], f1[b], w1, 3, 1)
        np.testing.assert_allclose(np.asarray(out_s[b]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    # grad-of-vmap through the folded Pallas op (bwd = the fused MXU
    # backward with w_groups scene reduction) vs the folded XLA op
    def loss(feats, w):
        out = jax.vmap(lambda c, v, f: folded_subm_mxu(c, v, f, w, 3))(
            coords, valid, feats)
        return jnp.sum(out ** 2)

    def loss_ref(feats, w):
        from cagroup3d_tpu.core.scene_fold import folded_grouped_classes_t
        out = jax.vmap(lambda c, v, f: folded_grouped_classes_t(
            c, v, f, 1, 3, w))(coords, valid, feats)
        return jnp.sum(out ** 2)

    gf, gw = jax.grad(loss, argnums=(0, 1))(feats, w)
    grf, grw = jax.grad(loss_ref, argnums=(0, 1))(feats, w)
    for a, b in ((gf, grf), (gw, grw)):
        e = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert e < 5e-2, e
