"""RBGNet utilities: rays, angle coding, aligned 3D NMS."""
import numpy as np
import jax.numpy as jnp

from cagroup3d_tpu.models.model_utils.rbgnet_utils import (
    aligned_3d_nms, angle2class, class2angle, generate_ray, RBGBBoxCoder)


def test_generate_ray_unit_vectors():
    rays = generate_ray(66)
    assert len(rays) >= 66 - 4  # ring construction over-generates slightly
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0, rtol=1e-6)
    # covers both hemispheres
    assert rays[:, 2].min() < -0.9 and rays[:, 2].max() > 0.9


def test_angle_class_roundtrip():
    angles = jnp.asarray(np.linspace(-np.pi + 0.01, np.pi - 0.01, 37))
    cls, res = angle2class(angles, 12)
    back = class2angle(cls, res, 12)
    # round trip modulo 2pi
    d = np.abs(((np.asarray(back) - np.asarray(angles) + np.pi) %
                (2 * np.pi)) - np.pi)
    assert d.max() < 1e-5


def test_coder_encode():
    coder = RBGBBoxCoder(66, 12, 10, with_rot=True)
    boxes = jnp.asarray(np.array([[1, 2, 3, 2, 4, 6, 0.5]], np.float32))
    labels = jnp.asarray(np.array([3], np.int32))
    t = coder.encode(boxes, labels)
    np.testing.assert_allclose(np.asarray(t["size_half"]), [[1, 2, 3]])
    np.testing.assert_allclose(np.asarray(t["scale"]),
                               [[np.sqrt(4 + 16 + 36)]], rtol=1e-6)


def naive_aligned_nms(boxes, scores, classes, thresh):
    order = np.argsort(-scores)
    keep = []
    vol = np.prod(np.maximum(boxes[:, 3:6] - boxes[:, :3], 0), axis=1)
    for i in order:
        ok = True
        for j in keep:
            if classes[i] != classes[j]:
                continue
            lo = np.maximum(boxes[i, :3], boxes[j, :3])
            hi = np.minimum(boxes[i, 3:6], boxes[j, 3:6])
            inter = np.prod(np.maximum(hi - lo, 0))
            if inter / max(vol[i] + vol[j] - inter, 1e-9) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_aligned_3d_nms_matches_naive(rng):
    n = 40
    lo = rng.rand(n, 3).astype(np.float32) * 3
    hi = lo + rng.rand(n, 3).astype(np.float32) + 0.3
    boxes = np.concatenate([lo, hi], 1)
    scores = rng.rand(n).astype(np.float32)
    classes = rng.randint(0, 3, n)
    keep = aligned_3d_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(classes), jnp.ones(n, bool), 0.25)
    got = sorted(np.nonzero(np.asarray(keep))[0].tolist())
    exp = naive_aligned_nms(boxes, scores, classes, 0.25)
    assert got == exp
