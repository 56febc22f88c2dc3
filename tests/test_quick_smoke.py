"""Quick smoke tier (`pytest -m quick`): tiny-shape checks of every
load-bearing engine primitive against independent numpy oracles.

Engineered for minimal XLA-CPU compile cost (shapes stay tiny, graphs
stay small) so the tier finishes in well under a minute warm; the full
modules (test_me_semantics, test_geometry_nms, test_engine_core, ...)
remain the thorough tier.
"""
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from cagroup3d_tpu.core import geometry  # noqa: E402
from cagroup3d_tpu.core.nms import greedy_nms  # noqa: E402
from cagroup3d_tpu.core.sparse_conv import subm_conv  # noqa: E402
from cagroup3d_tpu.core.voxelize import unique_voxels  # noqa: E402

pytestmark = pytest.mark.quick


def test_voxelize_mean_matches_numpy():
    rng = np.random.RandomState(0)
    P, CAP = 60, 64
    lat = rng.randint(0, 4, (P, 3)).astype(np.int32)
    feats = rng.randn(P, 2).astype(np.float32)
    st, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                          jnp.ones(P, bool), CAP, mode="mean")
    v = np.asarray(st.valid)
    got = {tuple(c): f for c, f in
           zip(np.asarray(st.coords)[v], np.asarray(st.feats)[v])}
    exp = {}
    for c, f in zip(lat, feats):
        exp.setdefault(tuple(c), []).append(f)
    assert set(got) == set(exp)
    for c in exp:
        np.testing.assert_allclose(got[c], np.mean(exp[c], 0), rtol=1e-5)


def test_subm_conv_matches_oracle_tiny():
    from convert_reference_ckpt import me_to_ours_perm
    from test_me_semantics import me_conv_oracle

    rng = np.random.RandomState(1)
    P, C, K, CAP = 50, 4, 3, 64
    lat = rng.randint(0, 4, (P, 3)).astype(np.int32)
    feats = rng.randn(P, C).astype(np.float32)
    st, _ = unique_voxels(jnp.asarray(lat), jnp.asarray(feats),
                          jnp.ones(P, bool), CAP, mode="mean")
    v = np.asarray(st.valid)
    w_me = rng.randn(K ** 3, C, C).astype(np.float32) * 0.1
    ref = me_conv_oracle(np.asarray(st.coords)[v], np.asarray(st.feats)[v],
                         w_me, K)
    out = subm_conv(st, jnp.asarray(w_me[me_to_ours_perm(K)]), None,
                    kernel_size=K)
    np.testing.assert_allclose(np.asarray(out.feats)[v], ref, rtol=1e-4,
                               atol=1e-5)


def test_rotated_iou_sanity():
    a = jnp.asarray([[0, 0, 0, 2.0, 3.0, 1.0, 0.4]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geometry.pairwise(geometry.iou3d_rotated, a, a)),
        [[1.0]], atol=1e-4)
    b = jnp.asarray([[10, 10, 10, 1.0, 1.0, 1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geometry.pairwise(geometry.iou3d_rotated, a, b)),
        [[0.0]], atol=1e-6)
    # axis-aligned pair with known overlap: 1x1x1 boxes offset by 0.5 in x
    c = jnp.asarray([[0, 0, 0, 1.0, 1.0, 1.0, 0.0]], jnp.float32)
    d = jnp.asarray([[0.5, 0, 0, 1.0, 1.0, 1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(geometry.pairwise(geometry.iou3d_rotated, c, d)),
        [[0.5 / 1.5]], atol=1e-4)


def test_greedy_nms_tiny():
    # three boxes: 0 and 1 overlap heavily, 2 is far away
    boxes = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0],
                         [0.1, 0, 0, 2, 2, 2, 0.0],
                         [9, 9, 9, 2, 2, 2, 0.0]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = greedy_nms(boxes, scores, jnp.ones(3, bool), iou_thr=0.5,
                      rotated=True)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_focal_loss_matches_closed_form():
    from cagroup3d_tpu.utils.loss_utils import sigmoid_focal_loss
    logits = jnp.asarray([[2.0, -1.0]], jnp.float32)
    onehot = jnp.asarray([[1.0, 0.0]], jnp.float32)
    got = np.asarray(sigmoid_focal_loss(logits, onehot, gamma=2.0,
                                        alpha=0.25, avg_factor=1.0))
    p = 1 / (1 + np.exp(-np.asarray(logits)))
    pt = np.where(np.asarray(onehot) > 0, p, 1 - p)
    alpha_t = np.where(np.asarray(onehot) > 0, 0.25, 0.75)
    exp = (-alpha_t * (1 - pt) ** 2 * np.log(pt)).sum()
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_box_coder_roundtrip():
    # reference semantics (cagroup_utils.py:122-127,176-182): sincos mode
    # encodes cos/sin of the box yaw directly and decode re-adds the
    # anchor yaw, so the roundtrip is exact only in the canonical frame
    # (anchor yaw 0 — how the RoI head uses it)
    from cagroup3d_tpu.models.model_utils.cagroup_utils import \
        CAGroupResidualCoder
    coder = CAGroupResidualCoder(code_size=7, encode_angle_by_sincos=True)
    rois = jnp.asarray([[1.0, 2.0, 0.5, 2.0, 1.5, 1.0, 0.0]], jnp.float32)
    gts = jnp.asarray([[1.2, 1.8, 0.6, 2.2, 1.4, 1.2, 0.5]], jnp.float32)
    enc = coder.encode(gts, rois)
    dec = coder.decode(enc, rois)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gts), atol=1e-4)


def test_kernel_perm_involution():
    from convert_reference_ckpt import me_to_ours_perm
    for k in (2, 3, 5):
        p = me_to_ours_perm(k)
        assert (p[p] == np.arange(k ** 3)).all()
