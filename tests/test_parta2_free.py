"""PartA2_free end-to-end: anchor-free Part-A2 built through detector
NAME PointRCNN with a UNetV2 backbone (reference tools/cfgs/kitti_models/
PartA2_free.yaml) — point-head box proposals (PointResidualCoder) at
stride-1 voxel centroids + PartA2FCHead refinement."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch
from test_parta2 import parta2_cfg


def parta2_free_cfg():
    c = parta2_cfg()
    c.NAME = "PointRCNN"
    del c["DENSE_HEAD"]
    del c["MAP_TO_BEV"]
    del c["BACKBONE_2D"]
    c.CLASS_NAMES = ["Car", "Pedestrian"]
    c.BACKBONE_3D["RETURN_ENCODED_TENSOR"] = False
    c.POINT_HEAD = EasyDict(dict(
        NAME="PointIntraPartOffsetHead", CLS_FC=[16], PART_FC=[16],
        REG_FC=[16], CLASS_AGNOSTIC=False,
        TARGET_CONFIG=dict(
            GT_EXTRA_WIDTH=[0.2, 0.2, 0.2],
            BOX_CODER="PointResidualCoder",
            BOX_CODER_CONFIG=dict(
                use_mean_size=True,
                mean_size=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]])),
        LOSS_CONFIG=dict(LOSS_REG="WeightedSmoothL1Loss",
                         LOSS_WEIGHTS=dict(
                             point_cls_weight=1.0,
                             point_box_weight=1.0,
                             point_part_weight=1.0,
                             code_weights=[1.0] * 8))))
    return c


@pytest.fixture(scope="module")
def model_and_params():
    cfg = parta2_free_cfg()
    model = build_network(cfg, num_class=2)
    from cagroup3d_tpu.models.detectors.parta2_free import PartA2FreeNet
    assert isinstance(model, PartA2FreeNet)
    P, S = model.init(jax.random.PRNGKey(0))
    assert not any(k.startswith("dense_head") for k in P)
    return model, P, S


def test_parta2_free_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=2, P=512)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["point_loss_box"]) > 0
    assert float(tb["rcnn_loss_reg"]) > 0
    for key in ("backbone_3d.conv2.0.0.kernel",
                "backbone_3d.inv_conv2.0.kernel",
                "point_head.box_layers.out.weight",
                "point_head.part_layers.out.weight",
                "roi_head.reg_layers.out.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_parta2_free_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1, P=512)
    out = jax.jit(model.forward_eval)(P, S, batch)
    assert out["pred_boxes"].shape[0] == 1
    assert out["pred_boxes"].shape[-1] == 7
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    n = out["pred_valid"].sum()
    assert out["pred_scores"].shape == out["pred_valid"].shape
    assert int(n) >= 0
