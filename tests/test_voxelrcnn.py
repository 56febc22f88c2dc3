"""Voxel R-CNN end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/voxel_rcnn.py + voxelrcnn_head.py +
voxel_pool_modules.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg


def voxelrcnn_cfg():
    c = second_cfg()
    c.NAME = "VoxelRCNN"
    c.VFE = EasyDict(dict(NAME="MeanVFE", NUM_POINT_FEATURES=4))
    c.ROI_HEAD = EasyDict(dict(
        NAME="VoxelRCNNHead", CLASS_AGNOSTIC=True,
        SHARED_FC=[32, 32], CLS_FC=[32], REG_FC=[32], DP_RATIO=0.3,
        NMS_CONFIG=dict(
            TRAIN=dict(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=64,
                       NMS_THRESH=0.8),
            TEST=dict(NMS_PRE_MAXSIZE=256, NMS_POST_MAXSIZE=32,
                      NMS_THRESH=0.7)),
        ROI_GRID_POOL=dict(
            FEATURES_SOURCE=["x_conv2", "x_conv3", "x_conv4"],
            PRE_MLP=True, GRID_SIZE=4,
            POOL_LAYERS=dict(
                x_conv2=dict(MLPS=[[16, 16]], QUERY_RANGES=[[2, 2, 2]],
                             POOL_RADIUS=[0.4], NSAMPLE=[16],
                             POOL_METHOD="max_pool"),
                x_conv3=dict(MLPS=[[16, 16]], QUERY_RANGES=[[2, 2, 2]],
                             POOL_RADIUS=[0.8], NSAMPLE=[16],
                             POOL_METHOD="max_pool"),
                x_conv4=dict(MLPS=[[16, 16]], QUERY_RANGES=[[2, 2, 2]],
                             POOL_RADIUS=[1.6], NSAMPLE=[16],
                             POOL_METHOD="max_pool"))),
        TARGET_CONFIG=dict(BOX_CODER="ResidualCoder", ROI_PER_IMAGE=32,
                           FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
                           CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.75,
                           CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
                           HARD_BG_RATIO=0.8,
                           # -1: random-init proposals never reach IoU
                           # 0.55; every roi counts as fg so reg/corner
                           # grads are exercised
                           REG_FG_THRESH=-1.0),
        LOSS_CONFIG=dict(CLS_LOSS="BinaryCrossEntropy",
                         REG_LOSS="smooth-l1",
                         CORNER_LOSS_REGULARIZATION=True,
                         LOSS_WEIGHTS=dict(
                             rcnn_cls_weight=1.0, rcnn_reg_weight=1.0,
                             rcnn_corner_weight=1.0,
                             code_weights=[1.0] * 7))))
    c.POST_PROCESSING = EasyDict(dict(
        RECALL_THRESH_LIST=[0.3, 0.5, 0.7], SCORE_THRESH=0.1,
        NMS_CONFIG=dict(NMS_THRESH=0.1, NMS_POST_MAXSIZE=32)))
    return c


@pytest.fixture(scope="module")
def model_and_params():
    cfg = voxelrcnn_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_voxelrcnn_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=2, P=512)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["rcnn_loss_reg"]) > 0
    for key in ("backbone_3d.conv2.0.0.kernel",
                "roi_head.roi_grid_pool_layers.0.mlps_in.0.weight",
                "roi_head.roi_grid_pool_layers.2.mlps_pos.0.weight",
                "roi_head.reg_layers.out.weight",
                "dense_head.conv_box.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_voxelrcnn_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1, P=512)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_nearest_offsets_static():
    from cagroup3d_tpu.core.pointnet2_stack import nearest_offsets
    o = nearest_offsets(2, 7)
    assert o.shape == (7, 3)
    assert tuple(o[0]) == (0, 0, 0)
    d2 = (o ** 2).sum(-1)
    assert (np.diff(d2) >= 0).all()
    full = nearest_offsets(1, 100)
    assert full.shape == (27, 3)
