"""roiaware_pool3d / roipoint_pool3d / pointnet2_stack extras vs numpy
oracles (reference pcdet/ops/{roiaware_pool3d,roipoint_pool3d,
pointnet2/pointnet2_stack})."""
import numpy as np
import jax
import jax.numpy as jnp

from cagroup3d_tpu.core.roi_pools import (points_in_boxes, roiaware_pool3d,
                                          roipoint_pool3d)
from cagroup3d_tpu.core.pointnet2_stack import vector_pool, voxel_query


def _canon_np(p, roi):
    rel = p - roi[:3]
    c, s = np.cos(-roi[6]), np.sin(-roi[6])
    return np.array([rel[0] * c - rel[1] * s, rel[0] * s + rel[1] * c,
                     rel[2]])


def test_roiaware_pool3d_oracle(rng):
    N, R, C, G = 300, 5, 6, 4
    pts = rng.rand(N, 3).astype(np.float32) * 4 - 2
    feats = rng.randn(N, C).astype(np.float32)
    rois = np.zeros((R, 7), np.float32)
    rois[:, :3] = rng.rand(R, 3) * 2 - 1
    rois[:, 3:6] = rng.rand(R, 3) * 1.5 + 0.5
    rois[:, 6] = rng.rand(R) * np.pi - np.pi / 2
    out = np.asarray(roiaware_pool3d(
        jnp.asarray(rois), jnp.ones(R, bool), jnp.asarray(pts),
        jnp.ones(N, bool), jnp.asarray(feats), G, pool="max"))
    ref = np.zeros((R, G, G, G, C), np.float32)
    for r in range(R):
        cells = {}
        for i in range(N):
            lc = _canon_np(pts[i], rois[r])
            half = rois[r, 3:6] / 2
            if np.all(np.abs(lc) < half):
                cell = np.clip(np.floor((lc + half) /
                                        (rois[r, 3:6] / G)), 0,
                               G - 1).astype(int)
                cells.setdefault(tuple(cell), []).append(feats[i])
        for (a, b, c_), fs in cells.items():
            ref[r, a, b, c_] = np.max(fs, axis=0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_roipoint_pool3d_oracle(rng):
    N, R, C, S = 200, 4, 5, 16
    pts = rng.rand(N, 3).astype(np.float32) * 4 - 2
    feats = rng.randn(N, C).astype(np.float32)
    rois = np.zeros((R, 7), np.float32)
    rois[:, :3] = rng.rand(R, 3) * 2 - 1
    rois[:, 3:6] = rng.rand(R, 3) * 1.0 + 0.3
    rois[:, 6] = rng.rand(R) * np.pi
    pooled, empty = roipoint_pool3d(
        jnp.asarray(rois), jnp.ones(R, bool), jnp.asarray(pts),
        jnp.ones(N, bool), jnp.asarray(feats), num_sampled=S)
    pooled, empty = np.asarray(pooled), np.asarray(empty)
    inside = np.asarray(points_in_boxes(
        jnp.asarray(pts), jnp.ones(N, bool), jnp.asarray(rois),
        jnp.ones(R, bool)))
    for r in range(R):
        ids = np.nonzero(inside[r])[0]
        assert empty[r] == (len(ids) == 0)
        if len(ids) == 0:
            assert (pooled[r] == 0).all()
            continue
        exp = ids[:S]
        exp = np.concatenate([exp, np.full(S - len(exp), exp[0],
                                           int)])[:S]
        np.testing.assert_allclose(pooled[r, :, :3], pts[exp], atol=1e-6)
        np.testing.assert_allclose(pooled[r, :, 3:], feats[exp], atol=1e-6)


def test_vector_pool_means(rng):
    M, N, C = 8, 120, 4
    q = rng.rand(M, 3).astype(np.float32)
    pts = rng.rand(N, 3).astype(np.float32)
    feats = rng.randn(N, C).astype(np.float32)
    radius, dense, K = 0.4, 2, 32
    out = np.asarray(vector_pool(jnp.asarray(q), jnp.ones(M, bool),
                                 jnp.asarray(pts), jnp.ones(N, bool),
                                 jnp.asarray(feats), radius, K, dense))
    D3 = dense ** 3
    out = out.reshape(M, D3, 3 + C)
    for m in range(M):
        cells = {}
        neighbors = [i for i in range(N)
                     if np.sum((pts[i] - q[m]) ** 2) < radius ** 2][:K]
        for i in neighbors:
            rel = pts[i] - q[m]
            cell = np.clip(np.floor((rel + radius) /
                                    (2 * radius / dense)), 0,
                           dense - 1).astype(int)
            cid = (cell[0] * dense + cell[1]) * dense + cell[2]
            cells.setdefault(cid, []).append(
                np.concatenate([rel, feats[i]]))
        for cid in range(D3):
            if cid in cells:
                np.testing.assert_allclose(
                    out[m, cid], np.mean(cells[cid], axis=0), rtol=1e-4,
                    atol=1e-5)
            else:
                np.testing.assert_allclose(out[m, cid], 0.0, atol=1e-6)


def test_voxel_query(rng):
    M, V = 20, 150
    coords = np.unique(rng.randint(0, 10, (V, 3)), axis=0).astype(np.int32)
    V = len(coords)
    q = rng.randint(0, 10, (M, 3)).astype(np.int32)
    rows = np.asarray(voxel_query(jnp.asarray(coords),
                                  jnp.ones(V, bool), jnp.asarray(q),
                                  jnp.ones(M, bool), max_range=1))
    table = {tuple(c): i for i, c in enumerate(coords)}
    k = 0
    for dx in range(-1, 2):
        for dy in range(-1, 2):
            for dz in range(-1, 2):
                for m in range(M):
                    want = table.get(tuple(q[m] + np.array([dx, dy, dz])),
                                     -1)
                    assert rows[m, k] == want, (m, k)
                k += 1


def test_corner_loss_and_weighted_losses(rng):
    import jax.numpy as jnp
    from cagroup3d_tpu.utils import loss_utils as L

    boxes = np.zeros((4, 7), np.float32)
    boxes[:, 3:6] = 1.0
    pred = boxes.copy()
    pred[:, 0] += 0.1
    cl = np.asarray(L.get_corner_loss_lidar(jnp.asarray(pred),
                                            jnp.asarray(boxes)))
    assert (cl > 0).all() and (cl < 0.1).all()
    # heading flip invariance: gt rotated by pi gives the same loss
    flip = boxes.copy()
    flip[:, 6] += np.pi
    cl2 = np.asarray(L.get_corner_loss_lidar(jnp.asarray(pred),
                                             jnp.asarray(flip)))
    np.testing.assert_allclose(cl, cl2, atol=1e-5)

    p = jnp.asarray(rng.randn(6, 3).astype(np.float32))
    t = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), 3)
    w = jnp.ones(6)
    ce = np.asarray(L.weighted_cross_entropy(p, t, w))
    ref = -np.asarray(jax.nn.log_softmax(p))[np.arange(6),
                                             [0, 1, 2, 0, 1, 2]]
    np.testing.assert_allclose(ce, ref, rtol=1e-5)

    l1 = np.asarray(L.weighted_l1(p, p * 0, code_weights=[1.0, 2.0, 0.5]))
    np.testing.assert_allclose(
        l1, np.abs(np.asarray(p)) * np.array([1.0, 2.0, 0.5]), rtol=1e-5)

    heat = jnp.zeros((8, 8)).at[4, 4].set(1.0).at[3, 4].set(0.6)
    predh = jnp.full((8, 8), 0.1).at[4, 4].set(0.9)
    fl = float(L.focal_loss_centernet(predh, heat))
    assert np.isfinite(fl) and fl > 0

