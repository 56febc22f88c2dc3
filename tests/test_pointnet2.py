"""pointnet2 op family vs numpy oracles."""
import numpy as np
import jax.numpy as jnp

from cagroup3d_tpu.core import pointnet2 as pn2


def test_fps_spreads_points(rng):
    # two distant clusters: FPS must pick from both
    a = rng.rand(50, 3).astype(np.float32)
    b = rng.rand(50, 3).astype(np.float32) + 10.0
    xyz = np.concatenate([a, b])
    idx = np.asarray(pn2.farthest_point_sample(
        jnp.asarray(xyz), jnp.ones(100, bool), 8))
    assert (idx < 50).any() and (idx >= 50).any()
    assert len(np.unique(idx)) == 8


def test_fps_ignores_invalid(rng):
    xyz = rng.rand(64, 3).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[10:20] = True
    idx = np.asarray(pn2.farthest_point_sample(jnp.asarray(xyz),
                                               jnp.asarray(valid), 16))
    assert ((idx >= 10) & (idx < 20)).all()


def test_ball_query_oracle(rng):
    P, M, K, r = 200, 16, 8, 0.3
    xyz = rng.rand(P, 3).astype(np.float32)
    centers = rng.rand(M, 3).astype(np.float32)
    idx, found = pn2.ball_query(r, K, jnp.asarray(xyz), jnp.ones(P, bool),
                                jnp.asarray(centers), jnp.ones(M, bool),
                                chunk=8)
    idx, found = np.asarray(idx), np.asarray(found)
    for m in range(M):
        d = np.linalg.norm(xyz - centers[m], axis=1)
        inball = np.nonzero(d < r)[0]
        if len(inball) == 0:
            assert not found[m]
            continue
        exp = inball[:K]
        got = idx[m]
        # first len(exp) slots are the first points by index; rest replicate
        np.testing.assert_array_equal(np.sort(np.unique(got)),
                                      np.sort(exp[:K]))
        assert (got[len(exp):] == exp[0]).all()


def test_three_nn_interpolate(rng):
    known = rng.rand(32, 3).astype(np.float32)
    feats = rng.randn(32, 5).astype(np.float32)
    unknown = rng.rand(10, 3).astype(np.float32)
    dist, idx = pn2.three_nn(jnp.asarray(unknown), jnp.ones(10, bool),
                             jnp.asarray(known), jnp.ones(32, bool))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for i in range(10):
        d = np.linalg.norm(known - unknown[i], axis=1)
        exp = np.sort(d)[:3]
        np.testing.assert_allclose(np.sort(dist[i]), exp, rtol=1e-4)
    out = np.asarray(pn2.three_interpolate(jnp.asarray(feats),
                                           jnp.asarray(idx),
                                           jnp.asarray(dist)))
    # weights sum to 1 -> interpolation of a constant field is exact
    const = np.ones((32, 2), np.float32) * 3.5
    out_c = np.asarray(pn2.three_interpolate(jnp.asarray(const),
                                             jnp.asarray(idx),
                                             jnp.asarray(dist)))
    np.testing.assert_allclose(out_c, 3.5, rtol=1e-5)
    assert out.shape == (10, 5)


def test_query_and_group_zero_query(rng):
    xyz = rng.rand(50, 3).astype(np.float32)
    feats = rng.randn(50, 4).astype(np.float32)
    centers = np.array([[0.5, 0.5, 0.5], [50.0, 50, 50]], np.float32)
    out, idx, found = pn2.query_and_group(
        0.4, 8, jnp.asarray(xyz), jnp.ones(50, bool), jnp.asarray(centers),
        jnp.ones(2, bool), feats=jnp.asarray(feats), zero_query=True)
    out = np.asarray(out)
    assert out.shape == (2, 8, 7)
    assert np.asarray(found)[0] and not np.asarray(found)[1]
    assert (out[1] == 0).all()
