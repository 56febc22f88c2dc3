"""The scatter-free conv backwards (transposed kernel maps / w-only
VJPs) must agree with plain XLA autodiff of the same ops."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.core.hashing import pack_coords
from cagroup3d_tpu.core.sparse import SparseTensor
from cagroup3d_tpu.core import sparse_conv as sc
from cagroup3d_tpu.core.kernel_maps import (conv_offsets, kernel_offsets,
                                            neighbor_table,
                                            neighbor_table_grouped,
                                            transpose_offsets)


def _sorted_coords(rng, n, lo=0, hi=28, stride=1):
    """Unique lattice coords key-sorted with invalid rows last."""
    pts = np.unique(rng.randint(lo, hi, (4 * n, 3)), axis=0)
    pts = pts[rng.permutation(len(pts))[:n]] * stride
    m = len(pts)
    coords = np.zeros((n, 3), np.int32)
    coords[:m] = pts
    valid = np.arange(n) < m
    keys = np.asarray(pack_coords(jnp.asarray(coords // stride),
                                  jnp.asarray(valid)))
    order = np.argsort(keys, kind="stable")
    return jnp.asarray(coords[order]), jnp.asarray(valid[order])


def _check_grads(f_ref, f_new, args, argnums=(0, 1), atol=2e-2):
    gref = jax.grad(lambda *a: jnp.sum(f_ref(*a) * co), argnums)(*args)
    gnew = jax.grad(lambda *a: jnp.sum(f_new(*a) * co), argnums)(*args)
    for a, b in zip(gref, gnew):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=atol, rtol=2e-2)


co = None   # cotangent, set per test


def test_gather_gemm_t_matches_autodiff(rng):
    global co
    n = 256
    coords, valid = _sorted_coords(rng, n)
    st = SparseTensor(coords, jnp.zeros((n, 1)), valid, 1)
    k = 3
    nbr = neighbor_table_grouped(st, coords, valid, k)
    tnbr = nbr[::-1]
    feats = jnp.asarray(rng.randn(n, 8), jnp.float32)
    w = jnp.asarray(rng.randn(k ** 3, 8, 6) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(6), jnp.float32)
    co = jnp.asarray(rng.randn(n, 6), jnp.float32)

    f_ref = lambda fe, we: sc.gather_gemm(fe, nbr, we, bias)
    f_new = lambda fe, we: sc.gather_gemm_t(fe, nbr, tnbr, we, bias)
    _check_grads(f_ref, f_new, (feats, w))
    # bias grad too
    gb_ref = jax.grad(lambda b: jnp.sum(f_ref(feats, w) * co) * 0 +
                      jnp.sum(sc.gather_gemm(feats, nbr, w, b) * co))(bias)
    gb_new = jax.grad(lambda b: jnp.sum(
        sc.gather_gemm_t(feats, nbr, tnbr, w, b) * co))(bias)
    np.testing.assert_allclose(np.asarray(gb_ref), np.asarray(gb_new),
                               atol=1e-3, rtol=1e-3)


def test_gather_gemm_t_strided_map(rng):
    """down-conv style: src stride 1 -> out stride 2, tnbr built by
    querying the out table with negated offsets."""
    global co
    n, m = 256, 128
    coords, valid = _sorted_coords(rng, n)
    st = SparseTensor(coords, jnp.zeros((n, 1)), valid, 1)
    from cagroup3d_tpu.core.voxelize import stride_reduce_coords
    out, _ = stride_reduce_coords(st, 2, m)
    offs = conv_offsets(3, 1)
    nbr = neighbor_table(st, out.coords, out.valid, offs)
    out_ix = SparseTensor(out.coords, jnp.zeros((m, 1)), out.valid, 2)
    tnbr = neighbor_table(out_ix, coords, valid, -offs)
    feats = jnp.asarray(rng.randn(n, 8), jnp.float32)
    w = jnp.asarray(rng.randn(27, 8, 6) * 0.1, jnp.float32)
    co = jnp.asarray(rng.randn(m, 6), jnp.float32)
    _check_grads(lambda fe, we: sc.gather_gemm(fe, nbr, we, None),
                 lambda fe, we: sc.gather_gemm_t(fe, nbr, tnbr, we, None),
                 (feats, w))


def test_scan_conv_grouped_classes_t(rng):
    global co
    G, n = 3, 256
    cs, vs = zip(*[_sorted_coords(rng, n) for _ in range(G)])
    coords = jnp.stack(cs)
    valid = jnp.stack(vs)
    feats = jnp.asarray(rng.randn(G, n, 8), jnp.float32)
    w = jnp.asarray(rng.randn(G, 27, 8, 6) * 0.1, jnp.float32)
    co = jnp.asarray(rng.randn(G, n, 6), jnp.float32)
    _check_grads(
        lambda fe, we: sc.scan_conv_grouped_classes(coords, valid, fe, 1,
                                                    3, we),
        lambda fe, we: sc.scan_conv_grouped_classes_t(coords, valid, fe,
                                                      1, 3, we),
        (feats, w))


def test_scan_conv_grouped_t(rng):
    global co
    n, m = 256, 128
    coords, valid = _sorted_coords(rng, n, stride=2)
    q, qv = _sorted_coords(rng, m, stride=2)
    feats = jnp.asarray(rng.randn(n, 8), jnp.float32)
    w = jnp.asarray(rng.randn(27, 8, 6) * 0.1, jnp.float32)
    co = jnp.asarray(rng.randn(m, 6), jnp.float32)
    _check_grads(
        lambda fe, we: sc.scan_conv_grouped(coords, valid, fe, 2, q, qv,
                                            3, we),
        lambda fe, we: sc.scan_conv_grouped_t(coords, valid, fe, 2, q,
                                              qv, 3, we),
        (feats, w))


def test_generative_up_classes_t(rng):
    global co
    G, m, n, e = 2, 128, 256, 3
    cs, vs = zip(*[_sorted_coords(rng, m, hi=10) for _ in range(G)])
    src = jnp.stack(cs) * e                 # raw units, parent lattice e
    sv = jnp.stack(vs)
    ts, tvs = [], []
    for g in range(G):
        t, tv = _sorted_coords(rng, n, hi=29)
        ts.append(t)
        tvs.append(tv)
    tgt = jnp.stack(ts)
    tv = jnp.stack(tvs)
    feats = jnp.asarray(rng.randn(G, m, 8), jnp.float32)
    w = jnp.asarray(rng.randn(G, 27, 8, 6) * 0.1, jnp.float32)
    co = jnp.asarray(rng.randn(G, n, 6), jnp.float32)
    _check_grads(
        lambda fe, we: sc.generative_up_classes(src, sv, fe, e, tgt, tv,
                                                we),
        lambda fe, we: sc.generative_up_classes_t(src, sv, fe, e, tgt,
                                                  tv, we),
        (feats, w))


def test_scan_conv_at_classes_t(rng):
    global co
    G, m, n = 2, 128, 256
    cs, vs = zip(*[_sorted_coords(rng, m) for _ in range(G)])
    src = jnp.stack(cs)
    sv = jnp.stack(vs)
    ts, tvs = zip(*[_sorted_coords(rng, n) for _ in range(G)])
    tgt = jnp.stack(ts)
    tv = jnp.stack(tvs)
    offs = transpose_offsets(3, 1)
    feats = jnp.asarray(rng.randn(G, m, 8), jnp.float32)
    w = jnp.asarray(rng.randn(G, 27, 8, 6) * 0.1, jnp.float32)
    co = jnp.asarray(rng.randn(G, n, 6), jnp.float32)
    _check_grads(
        lambda fe, we: sc.scan_conv_at_classes(src, sv, fe, 1, tgt, tv,
                                               offs, we),
        lambda fe, we: sc.scan_conv_at_classes_t(src, sv, fe, 1, tgt, tv,
                                                 offs, we, tgt_stride=1),
        (feats, w))
