"""ME kernel-enumeration semantics: an independent numpy oracle that
follows MinkowskiEngine's kernel-region convention (first spatial axis
varies fastest; ME 0.5.x kernel_region.hpp coordinate_at iterates axis 0
innermost) is converted through the checkpoint converter's permutation and
must match our engine bit-for-bit.  This pins the converter's offset
mapping on hand-built cases (VERDICT round-1 item 4); a real reference
.pth run through tools/convert_reference_ckpt.py exercises the same path.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from convert_reference_ckpt import me_to_ours_perm

from cagroup3d_tpu.core.sparse import SparseTensor
from cagroup3d_tpu.core.sparse_conv import (subm_conv, strided_conv,
                                            transposed_conv)
from cagroup3d_tpu.core.voxelize import unique_voxels


def me_offsets(k):
    """ME enumeration: kernel index i -> offset (x fastest)."""
    h = k // 2
    idx = np.arange(k ** 3)
    off = np.stack([idx % k, (idx // k) % k, idx // (k * k)], -1) - h
    return off


def me_conv_oracle(coords, feats, w_me, k):
    """Submanifold conv in ME convention (numpy, dict lookup)."""
    table = {tuple(c): i for i, c in enumerate(coords)}
    offs = me_offsets(k)
    out = np.zeros((len(coords), w_me.shape[-1]), np.float64)
    for i, c in enumerate(coords):
        for j, o in enumerate(offs):
            r = table.get(tuple(c + o))
            if r is not None:
                out[i] += feats[r] @ w_me[j]
    return out


def test_subm_conv_matches_me_oracle():
    rng = np.random.RandomState(3)
    P, C, K, CAP = 120, 8, 3, 128
    lat = rng.randint(0, 6, (P, 3)).astype(np.int32)
    feats = rng.randn(P, C).astype(np.float32)
    st, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                          jnp.ones(P, bool), CAP, mode="mean")
    v = np.asarray(st.valid)
    coords = np.asarray(st.coords)[v]
    f = np.asarray(st.feats)[v]

    w_me = rng.randn(K ** 3, C, C).astype(np.float32) * 0.1
    ref = me_conv_oracle(coords, f, w_me, K)

    w_ours = jnp.asarray(w_me[me_to_ours_perm(K)])
    out = subm_conv(st, w_ours, None, kernel_size=K)
    np.testing.assert_allclose(np.asarray(out.feats)[v], ref, rtol=1e-4,
                               atol=1e-5)


def test_golden_layer_stack_matches_me_oracle():
    """Per-layer activation parity on a tiny stack: subm k3 + BN(eval) +
    ReLU -> strided k2 s2 -> generative transpose k2 s2 decoded at the
    original coords.  The oracle implements ME semantics (x-fastest kernel
    enumeration, even kernels offset 0..k-1, transpose parent = child -
    offset*out_stride) independently in numpy."""
    rng = np.random.RandomState(7)
    P, C = 150, 4
    lat = rng.randint(0, 8, (P, 3)).astype(np.int32)
    feats = rng.randn(P, C).astype(np.float32)
    st, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                          jnp.ones(P, bool), 256, mode="mean")
    v0 = np.asarray(st.valid)
    coords0 = np.asarray(st.coords)[v0]
    f0 = np.asarray(st.feats)[v0]

    # layer 1: subm k3 + BN(eval) + relu
    w1_me = rng.randn(27, C, C).astype(np.float32) * 0.2
    gamma = rng.rand(C).astype(np.float32) + 0.5
    beta = rng.randn(C).astype(np.float32) * 0.1
    rmean = rng.randn(C).astype(np.float32) * 0.1
    rvar = rng.rand(C).astype(np.float32) + 0.5
    a1 = me_conv_oracle(coords0, f0, w1_me, 3)
    a1 = (a1 - rmean) / np.sqrt(rvar + 1e-5) * gamma + beta
    a1 = np.maximum(a1, 0.0)

    # layer 2: strided conv k2 s2 (ME even kernel: offsets 0..k-1)
    out_coords = {}
    for c in coords0:
        out_coords[tuple((c // 2) * 2)] = True
    coords1 = np.array(sorted(out_coords), np.int32)
    w2_me = rng.randn(8, C, C).astype(np.float32) * 0.2
    table0 = {tuple(c): i for i, c in enumerate(coords0)}
    offs2 = np.stack([np.arange(8) % 2, (np.arange(8) // 2) % 2,
                      np.arange(8) // 4], -1)
    a2 = np.zeros((len(coords1), C))
    for i, c in enumerate(coords1):
        for j, o in enumerate(offs2):
            r = table0.get(tuple(c + o))
            if r is not None:
                a2[i] += a1[r] @ w2_me[j]

    # layer 3: transposed conv k2 s2 decoded at the original coords:
    # parent(child, offset) = child - offset * out_stride... ME semantics:
    # input voxel i contributes to outputs i + o (kernel_maps.py:103-111)
    w3_me = rng.randn(8, C, C).astype(np.float32) * 0.2
    table1 = {tuple(c): i for i, c in enumerate(coords1)}
    a3 = np.zeros((len(coords0), C))
    for i, c in enumerate(coords0):
        for j, o in enumerate(offs2):
            r = table1.get(tuple(c - o))
            if r is not None:
                a3[i] += a2[r] @ w3_me[j]

    # ours, through the engine with converted kernels
    st1 = subm_conv(st, jnp.asarray(w1_me[me_to_ours_perm(3)]), None, 3)
    f = np.asarray(st1.feats)
    f = (f - rmean) / np.sqrt(rvar + 1e-5) * gamma + beta
    st1 = st1.with_feats(jnp.where(st1.valid[:, None],
                                   jnp.maximum(jnp.asarray(f), 0.0), 0.0))
    np.testing.assert_allclose(np.asarray(st1.feats)[v0], a1, rtol=1e-4,
                               atol=1e-5)

    st2 = strided_conv(st1, jnp.asarray(w2_me[me_to_ours_perm(2)]), None,
                       kernel_size=2, factor=2, out_cap=256)
    # match rows by coordinate
    v2 = np.asarray(st2.valid)
    ours2 = {tuple(c): np.asarray(st2.feats)[i]
             for i, c in enumerate(np.asarray(st2.coords)) if v2[i]}
    assert set(ours2) == set(map(tuple, coords1))
    for i, c in enumerate(coords1):
        np.testing.assert_allclose(ours2[tuple(c)], a2[i], rtol=1e-4,
                                   atol=1e-5)

    st3 = transposed_conv(st2, st.coords, st.valid,
                          jnp.asarray(w3_me[me_to_ours_perm(2)]), None,
                          kernel_size=2, up_factor=2)
    np.testing.assert_allclose(np.asarray(st3.feats)[v0], a3, rtol=1e-4,
                               atol=1e-5)
