"""CenterPoint: gaussian-heatmap targets, centernet losses, peak decode
(reference pcdet/models/dense_heads/center_head.py +
model_utils/centernet_utils.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg


def centerpoint_cfg():
    c = second_cfg()
    c.NAME = "CenterPoint"
    c.VFE = EasyDict(dict(NAME="MeanVFE", NUM_POINT_FEATURES=4))
    c.DENSE_HEAD = EasyDict(dict(
        NAME="CenterHead", CLASS_AGNOSTIC=False,
        CLASS_NAMES_EACH_HEAD=[["Car", "Pedestrian"]],
        SHARED_CONV_CHANNEL=32, USE_BIAS_BEFORE_NORM=True,
        NUM_HM_CONV=2,
        VOXEL_SIZE=[0.25, 0.25, 0.1],
        SEPARATE_HEAD_CFG=dict(
            HEAD_ORDER=["center", "center_z", "dim", "rot"],
            HEAD_DICT={"center": dict(out_channels=2, num_conv=2),
                       "center_z": dict(out_channels=1, num_conv=2),
                       "dim": dict(out_channels=3, num_conv=2),
                       "rot": dict(out_channels=2, num_conv=2)}),
        TARGET_ASSIGNER_CONFIG=dict(FEATURE_MAP_STRIDE=8,
                                    NUM_MAX_OBJS=500,
                                    GAUSSIAN_OVERLAP=0.1, MIN_RADIUS=2),
        LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
            cls_weight=1.0, loc_weight=2.0, code_weights=[1.0] * 8)),
        POST_PROCESSING=dict(
            SCORE_THRESH=0.01,
            POST_CENTER_LIMIT_RANGE=[-75.2, -75.2, -4, 75.2, 75.2, 4],
            MAX_OBJ_PER_SAMPLE=100,
            NMS_CONFIG=dict(NMS_THRESH=0.7, NMS_PRE_MAXSIZE=128,
                            NMS_POST_MAXSIZE=64)),
    ))
    return c


@pytest.fixture(scope="module")
def model_and_params():
    cfg = centerpoint_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_centerpoint_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    assert float(tb["hm_loss_head_0"]) > 0
    assert float(tb["loc_loss_head_0"]) > 0
    for key in ("dense_head.heads.0.hm.out.weight",
                "dense_head.heads.0.dim.out.weight",
                "dense_head.shared_conv.weight",
                "backbone_3d.conv1.0.0.kernel"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_centerpoint_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape[2] == 7
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_gaussian_targets():
    """Dense gaussian drawing matches the reference's windowed formula
    at the peak and support boundary."""
    from cagroup3d_tpu.models.model_utils.centernet_utils import (
        draw_gaussians_dense, gaussian_radius)
    centers = jnp.asarray([[10.3, 20.7], [40.0, 5.0]])
    radii = jnp.asarray([3, 2], jnp.int32)
    cls_ids = jnp.asarray([0, 1], jnp.int32)
    valid = jnp.asarray([True, True])
    hm = draw_gaussians_dense(centers, radii, cls_ids, valid, 2, (64, 64))
    assert hm.shape == (2, 64, 64)
    # peak == 1 at the rounded center, right class channel
    assert float(hm[0, 20, 10]) == pytest.approx(1.0)
    assert float(hm[1, 5, 40]) == pytest.approx(1.0)
    assert float(hm[1, 20, 10]) == 0.0
    # outside the radius window -> exactly 0
    assert float(hm[0, 20, 14]) == 0.0
    assert float(hm[0, 20, 13]) > 0.0
    # radii sane
    r = gaussian_radius(jnp.asarray([4.0]), jnp.asarray([8.0]), 0.1)
    assert float(r[0]) > 0


def test_heatmap_loss_decreases_at_target():
    """A prediction matching the target heatmap has lower focal loss
    than a uniform one."""
    from cagroup3d_tpu.models.model_utils.centernet_utils import \
        draw_gaussians_dense
    from cagroup3d_tpu.utils import loss_utils as L
    hm = draw_gaussians_dense(
        jnp.asarray([[16.0, 16.0]]), jnp.asarray([3], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]), 1, (32, 32))
    tgt = jnp.transpose(hm, (1, 2, 0))[None]
    good = jnp.clip(tgt, 1e-3, 1 - 1e-3)
    flat = jnp.full_like(tgt, 0.5)
    assert float(L.focal_loss_centernet(good, tgt)) < \
        float(L.focal_loss_centernet(flat, tgt))
