"""Rotated IoU and NMS vs numpy/Monte-Carlo oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.core import geometry, nms


def mc_intersection_area(a5, b5, n=400):
    """Monte-Carlo oracle for rotated rect intersection area."""
    xs = np.linspace(-0.5, 0.5, n)
    gx, gy = np.meshgrid(xs, xs)
    # sample in box a's frame
    pa = np.stack([gx.ravel() * a5[2], gy.ravel() * a5[3]], -1)
    c, s = np.cos(a5[4]), np.sin(a5[4])
    world = pa @ np.array([[c, s], [-s, c]]) + a5[:2]
    # in box b?
    rel = world - b5[:2]
    c, s = np.cos(b5[4]), np.sin(b5[4])
    u = rel[:, 0] * c + rel[:, 1] * s
    v = -rel[:, 0] * s + rel[:, 1] * c
    inside = (np.abs(u) <= b5[2] / 2) & (np.abs(v) <= b5[3] / 2)
    return inside.mean() * a5[2] * a5[3]


class TestRotatedIoU:
    @pytest.mark.parametrize("seed", range(5))
    def test_intersection_vs_mc(self, seed):
        r = np.random.RandomState(seed)
        a = np.array([r.randn() * 0.5, r.randn() * 0.5,
                      r.rand() * 2 + 0.5, r.rand() * 2 + 0.5,
                      r.rand() * np.pi - np.pi / 2], np.float32)
        b = np.array([r.randn() * 0.5, r.randn() * 0.5,
                      r.rand() * 2 + 0.5, r.rand() * 2 + 0.5,
                      r.rand() * np.pi - np.pi / 2], np.float32)
        got = float(geometry.rotated_intersection_area(jnp.asarray(a),
                                                       jnp.asarray(b)))
        exp = mc_intersection_area(a, b)
        assert abs(got - exp) < 0.03 * max(exp, 0.1)

    @pytest.mark.parametrize("seed", range(8))
    def test_sh_matches_sortbased(self, seed):
        r = np.random.RandomState(100 + seed)
        a5 = np.concatenate([r.randn(16, 2), r.rand(16, 2) * 2 + 0.3,
                             r.rand(16, 1) * 6 - 3], -1).astype(np.float32)
        b5 = np.concatenate([r.randn(16, 2), r.rand(16, 2) * 2 + 0.3,
                             r.rand(16, 1) * 6 - 3], -1).astype(np.float32)
        got = np.asarray(geometry.rotated_intersection_area(
            jnp.asarray(a5)[:, None], jnp.asarray(b5)[None, :]))
        exp = np.asarray(geometry.rotated_intersection_area_sortbased(
            jnp.asarray(a5)[:, None], jnp.asarray(b5)[None, :]))
        np.testing.assert_allclose(got, exp, atol=2e-3)

    def test_identical_boxes(self):
        a = jnp.array([1.0, 2.0, 2.0, 3.0, 0.3])
        area = float(geometry.rotated_intersection_area(a, a))
        np.testing.assert_allclose(area, 6.0, rtol=1e-4)

    def test_disjoint(self):
        a = jnp.array([0.0, 0.0, 1.0, 1.0, 0.2])
        b = jnp.array([10.0, 0.0, 1.0, 1.0, -0.4])
        assert float(geometry.rotated_intersection_area(a, b)) == 0.0

    def test_axis_aligned_matches_rotated_at_zero_yaw(self):
        r = np.random.RandomState(3)
        a7 = np.concatenate([r.randn(8, 3), r.rand(8, 3) + 0.5,
                             np.zeros((8, 1))], -1).astype(np.float32)
        b7 = np.concatenate([r.randn(8, 3), r.rand(8, 3) + 0.5,
                             np.zeros((8, 1))], -1).astype(np.float32)
        r1 = geometry.pairwise(geometry.iou_bev_rotated, jnp.asarray(a7),
                               jnp.asarray(b7))
        r2 = geometry.pairwise(geometry.iou_bev_aligned, jnp.asarray(a7),
                               jnp.asarray(b7))
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)

    def test_iou3d_identity(self):
        a = jnp.array([[0.0, 0, 0, 2, 3, 1, 0.7]])
        iou = geometry.pairwise(geometry.iou3d_rotated, a, a)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], rtol=1e-4)


def naive_nms(boxes, scores, thr, iou_fn):
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if iou_fn(boxes[i], boxes[j]) > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def np_iou_aligned_bev(a, b):
    lo = np.maximum(a[:2] - a[3:5] / 2, b[:2] - b[3:5] / 2)
    hi = np.minimum(a[:2] + a[3:5] / 2, b[:2] + b[3:5] / 2)
    wh = np.maximum(hi - lo, 0)
    inter = wh[0] * wh[1]
    return inter / max(a[3] * a[4] + b[3] * b[4] - inter, 1e-8)


class TestNMS:
    def test_greedy_matches_naive(self):
        r = np.random.RandomState(0)
        n = 40
        boxes = np.concatenate([
            r.rand(n, 2) * 4, np.zeros((n, 1)),
            r.rand(n, 2) * 2 + 0.5, np.ones((n, 1)),
            np.zeros((n, 1))], -1).astype(np.float32)
        scores = r.rand(n).astype(np.float32)
        keep = nms.greedy_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), 0.3, rotated=False)
        got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
        exp = naive_nms(boxes, scores, 0.3, np_iou_aligned_bev)
        assert got == exp

    def test_multiclass_shapes(self):
        r = np.random.RandomState(1)
        P, C = 64, 4
        boxes = np.concatenate([
            r.rand(P, 2) * 4, np.zeros((P, 1)),
            r.rand(P, 2) + 0.5, np.ones((P, 1)), np.zeros((P, 1))],
            -1).astype(np.float32)
        scores = r.rand(P, C).astype(np.float32) * 0.5
        b, s, l, v = nms.multiclass_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(P, bool),
            score_thr=0.05, iou_thr=0.5, rotated=False,
            per_cls_cap=32, out_cap=48)
        assert b.shape == (48, 7) and s.shape == (48,)
        v = np.asarray(v)
        assert v.any()
        # all valid scores above threshold and sorted descending
        sv = np.asarray(s)[v]
        assert (sv > 0.05).all()
        assert (np.diff(sv) <= 1e-6).all()
