"""MXU-fused per-class conv (ops/pallas_conv.py) vs the XLA reference
implementation, in Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cagroup3d_tpu.core.voxelize import unique_voxels_classes
from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped_classes
from cagroup3d_tpu.ops.pallas_conv import subm_conv_classes_mxu


@pytest.fixture(scope="module")
def case():
    rs = np.random.RandomState(0)
    G, P, C, CAP = 3, 600, 64, 256
    lat = rs.randint(0, 14, (G, P, 3)).astype(np.int32)
    feats = rs.randn(G, P, C).astype(np.float32)
    valid = rs.rand(G, P) > 0.2
    fc, ff, fv = unique_voxels_classes(
        jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(valid), CAP,
        mode="mean")
    w = jnp.asarray(rs.randn(G, 5 ** 3, C, C).astype(np.float32) * 0.1)
    return fc, ff, fv, w


def test_forward_matches_xla(case):
    fc, ff, fv, w = case
    ref = scan_conv_grouped_classes(fc, fv, ff, 1, 5, w)
    out = subm_conv_classes_mxu(fc, fv, ff, w, 5)
    r, o = np.asarray(ref), np.asarray(out)
    err = np.abs(r - o).max() / (np.abs(r).max() + 1e-9)
    assert err < 2e-2, err
    # invalid rows must be exactly zero
    assert (o[~np.asarray(fv)] == 0).all()


def test_grads_match_xla(case):
    fc, ff, fv, w = case

    def loss_mxu(f, ww):
        return jnp.sum(subm_conv_classes_mxu(fc, fv, f, ww, 5) ** 2)

    def loss_ref(f, ww):
        return jnp.sum(scan_conv_grouped_classes(fc, fv, f, 1, 5, ww) ** 2)

    g1 = jax.grad(loss_mxu, argnums=(0, 1))(ff, w)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(ff, w)
    for a, b in zip(g1, g2):
        e = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert e < 5e-2, e


def test_mxu_bwd_matches_xla_bwd(case, monkeypatch):
    """The fused MXU backward (_dw_kernel + reversed-weight
    _pallas_forward) against the XLA backward of the SAME op, selected
    via CAGROUP_XLA_BWD — isolates the backward kernels from forward
    noise."""
    fc, ff, fv, w = case

    def loss(f, ww):
        return jnp.sum(subm_conv_classes_mxu(fc, fv, f, ww, 5) ** 2)

    monkeypatch.delenv("CAGROUP_XLA_BWD", raising=False)
    g_mxu = jax.grad(loss, argnums=(0, 1))(ff, w)
    monkeypatch.setenv("CAGROUP_XLA_BWD", "1")
    g_xla = jax.grad(loss, argnums=(0, 1))(ff, w)
    for a, b in zip(g_mxu, g_xla):
        e = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert e < 2e-2, e


def test_sparse_occupancy_and_empty_class(case):
    """Classes with very few (or zero) valid voxels must still be exact:
    the rank-window while-loop and invalid-tail guards are the risk."""
    rs = np.random.RandomState(1)
    G, P, C, CAP = 2, 300, 64, 256
    lat = rs.randint(0, 40, (G, P, 3)).astype(np.int32)  # sparse: few nbrs
    feats = rs.randn(G, P, C).astype(np.float32)
    valid = np.zeros((G, P), bool)
    valid[0, :40] = True          # class 0: sparse; class 1: empty
    fc, ff, fv = unique_voxels_classes(
        jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(valid), CAP,
        mode="mean")
    w = jnp.asarray(rs.randn(G, 27, C, C).astype(np.float32) * 0.1)
    ref = scan_conv_grouped_classes(fc, fv, ff, 1, 3, w)
    out = subm_conv_classes_mxu(fc, fv, ff, w, 3)
    err = np.abs(np.asarray(ref) - np.asarray(out)).max() / \
        (np.abs(np.asarray(ref)).max() + 1e-9)
    assert err < 2e-2, err


def test_vmapped_matches_unbatched(case):
    """vmap prepends grid dims to pallas_call; the kernel must not read
    program_id for semantics (round-2 regression: under vmap the dx axis
    silently read the class index)."""
    fc, ff, fv, w = case
    B = 2
    ffb = jnp.stack([ff, ff * 0.5])
    out_b = jax.vmap(lambda f: subm_conv_classes_mxu(fc, fv, f, w, 5))(ffb)
    ref0 = subm_conv_classes_mxu(fc, fv, ff, w, 5)
    ref1 = subm_conv_classes_mxu(fc, fv, ff * 0.5, w, 5)
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(ref0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_b[1]), np.asarray(ref1),
                               rtol=1e-4, atol=1e-5)


def test_multislab_tail_clamp_no_double_count():
    """A rank window that reaches past N-SLAB forces the final slab to
    clamp to [N-SLAB, N); the rows it shares with the previous slab must
    not contribute twice (round-2 advisor finding: the one-hot matmul
    re-added them).

    Construction: x=0 holds 128 query voxels at y=2j; x=1 holds 256
    voxels at y=j.  The dx=+1 pass of the x=0 block targets a window of
    ~256 x=1 rows > SLAB(192), and with N=384 the walk's second slab
    clamps to N-SLAB=192 < first slab end, overlapping it.
    """
    rs = np.random.RandomState(2)
    C, CAP = 32, 384
    lat = np.zeros((1, 384, 3), np.int32)
    lat[0, :128, 0] = 0
    lat[0, :128, 1] = np.arange(128) * 2
    lat[0, 128:, 0] = 1
    lat[0, 128:, 1] = np.arange(256)
    feats = rs.randn(1, 384, C).astype(np.float32)
    valid = np.ones((1, 384), bool)
    from cagroup3d_tpu.core import hashing
    old = (hashing.XBITS, hashing.YBITS, hashing.ZBITS)
    hashing.set_key_bits(5, 12, 5)   # y up to 256+margin needs 9+ bits
    try:
        fc, ff, fv = unique_voxels_classes(
            jnp.asarray(lat), jnp.asarray(feats), jnp.asarray(valid), CAP,
            mode="mean")
        w = jnp.asarray(rs.randn(1, 27, C, C).astype(np.float32) * 0.1)
        ref = scan_conv_grouped_classes(fc, fv, ff, 1, 3, w)
        out = subm_conv_classes_mxu(fc, fv, ff, w, 3)
        err = np.abs(np.asarray(ref) - np.asarray(out)).max() / \
            (np.abs(np.asarray(ref)).max() + 1e-9)
        assert err < 2e-2, err
    finally:
        hashing.set_key_bits(*old)


def test_down_routes_to_conv_at_coords(monkeypatch):
    """layers.down's MXU routing (strided source, queries = reduced
    coords scaled back onto the source lattice) against the XLA gather
    path it replaces."""
    from cagroup3d_tpu.core.module import Ctx
    from cagroup3d_tpu.core.sparse import SparseTensor
    from cagroup3d_tpu.core.voxelize import unique_voxels
    from cagroup3d_tpu.models import layers

    rs = np.random.RandomState(7)
    P, C, CAP, OCAP = 900, 32, 512, 256
    stride = 2
    lat = rs.randint(0, 10, (P, 3)).astype(np.int32)
    feats = rs.randn(P, C).astype(np.float32)
    valid = rs.rand(P) > 0.2
    ded, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                           jnp.asarray(valid), CAP, mode="mean")
    st = SparseTensor(jnp.where(ded.valid[:, None],
                                ded.coords * stride, ded.coords),
                      ded.feats, ded.valid, stride)
    params = {"d.kernel": jnp.asarray(
        rs.randn(27, C, C).astype(np.float32) * 0.1),
        "d.bias": jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)}

    ref = layers.down(params, Ctx(train=False), "d", st, 3, 2, OCAP)
    monkeypatch.setattr(layers, "_use_mxu_at", lambda *a, **k: True)
    out = layers.down(params, Ctx(train=False), "d", st, 3, 2, OCAP)
    assert out.stride == ref.stride == stride * 2
    err = np.abs(np.asarray(out.feats) - np.asarray(ref.feats)).max() / \
        (np.abs(np.asarray(ref.feats)).max() + 1e-9)
    assert err < 2e-2, err


def test_conv_at_coords_matches_xla():
    """conv-at-coords variant (queries != table; the RoI head's
    grid_conv) against scan_conv_grouped."""
    from cagroup3d_tpu.core.voxelize import unique_voxels
    from cagroup3d_tpu.core.sparse_conv import scan_conv_grouped
    from cagroup3d_tpu.ops.pallas_conv import conv_at_coords_mxu

    rs = np.random.RandomState(4)
    P, C, CAP, QCAP = 700, 32, 512, 256
    lat = rs.randint(0, 12, (P, 3)).astype(np.int32)
    feats = rs.randn(P, C).astype(np.float32)
    valid = rs.rand(P) > 0.2
    st, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                          jnp.asarray(valid), CAP, mode="mean")
    qpts = rs.randint(0, 12, (600, 3)).astype(np.int32)
    qv = rs.rand(600) > 0.3
    qded, _ = unique_voxels(jnp.asarray(qpts),
                            jnp.zeros((600, 1), np.float32),
                            jnp.asarray(qv), QCAP, mode="first")
    w = jnp.asarray(rs.randn(125, C, C).astype(np.float32) * 0.1)
    out = conv_at_coords_mxu(st.coords, st.valid, st.masked_feats(), 1,
                             qded.coords, qded.valid, 5, w)
    ref = scan_conv_grouped(st.coords, st.valid, st.feats, 1,
                            qded.coords, qded.valid, 5, w)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max() / \
        (np.abs(np.asarray(ref)).max() + 1e-9)
    assert err < 2e-2, err
    assert (np.asarray(out)[~np.asarray(qded.valid)] == 0).all()

    # gradients flow through the XLA-vjp backward
    def loss(f, ww):
        return jnp.sum(conv_at_coords_mxu(
            st.coords, st.valid, f, 1, qded.coords, qded.valid, 5,
            ww) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1))(st.masked_feats(), w)

    def loss_ref(f, ww):
        return jnp.sum(scan_conv_grouped(
            st.coords, st.valid, f, 1, qded.coords, qded.valid, 5,
            ww) ** 2)

    g2 = jax.grad(loss_ref, argnums=(0, 1))(st.masked_feats(), w)
    for a, b in zip(g1, g2):
        e = np.abs(np.asarray(a) - np.asarray(b)).max() / \
            (np.abs(np.asarray(b)).max() + 1e-9)
        assert e < 5e-2, e
