"""PV-RCNN end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/pv_rcnn.py + voxel_set_abstraction.py +
pvrcnn_head.py + point_head_simple.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg, PC_RANGE


def pvrcnn_cfg():
    c = second_cfg()
    c.NAME = "PVRCNN"
    c.VFE = EasyDict(dict(NAME="MeanVFE", NUM_POINT_FEATURES=4))
    c.PFE = EasyDict(dict(
        NAME="VoxelSetAbstraction",
        POINT_SOURCE="raw_points", NUM_KEYPOINTS=256,
        NUM_OUTPUT_FEATURES=32, SAMPLE_METHOD="FPS",
        FEATURES_SOURCE=["bev", "x_conv3", "x_conv4", "raw_points"],
        SA_LAYER=dict(
            raw_points=dict(MLPS=[[8, 8]], POOL_RADIUS=[0.8],
                            NSAMPLE=[8]),
            x_conv3=dict(DOWNSAMPLE_FACTOR=4, MLPS=[[16, 16]],
                         POOL_RADIUS=[1.2], NSAMPLE=[8],
                         INPUT_CHANNELS=64),
            x_conv4=dict(DOWNSAMPLE_FACTOR=8, MLPS=[[16, 16]],
                         POOL_RADIUS=[2.4], NSAMPLE=[8],
                         INPUT_CHANNELS=64),
        )))
    c.POINT_HEAD = EasyDict(dict(
        NAME="PointHeadSimple", CLS_FC=[32], CLASS_AGNOSTIC=True,
        USE_POINT_FEATURES_BEFORE_FUSION=True,
        TARGET_CONFIG=dict(GT_EXTRA_WIDTH=[0.2, 0.2, 0.2]),
        LOSS_CONFIG=dict(LOSS_REG="smooth-l1",
                         LOSS_WEIGHTS=dict(point_cls_weight=1.0))))
    c.ROI_HEAD = EasyDict(dict(
        NAME="PVRCNNHead", CLASS_AGNOSTIC=True,
        SHARED_FC=[32, 32], CLS_FC=[32], REG_FC=[32], DP_RATIO=0.3,
        NMS_CONFIG=dict(
            TRAIN=dict(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=64,
                       NMS_THRESH=0.8),
            TEST=dict(NMS_PRE_MAXSIZE=256, NMS_POST_MAXSIZE=32,
                      NMS_THRESH=0.7)),
        ROI_GRID_POOL=dict(GRID_SIZE=4, MLPS=[[16, 16]],
                           POOL_RADIUS=[0.8], NSAMPLE=[8],
                           POOL_METHOD="max_pool"),
        TARGET_CONFIG=dict(BOX_CODER="ResidualCoder", ROI_PER_IMAGE=32,
                           FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
                           CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.75,
                           CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
                           HARD_BG_RATIO=0.8,
                           # -1: random-init proposals never reach IoU 0.55; every
                           # roi counts as fg so reg/corner grads are exercised
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
    cfg = pvrcnn_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_pvrcnn_modules_built(model_and_params):
    model, P, S = model_and_params
    assert model.pfe is not None
    assert model.point_head is not None
    assert model.roi_head is not None
    # channel plumbing: point head sees before-fusion width
    assert model.point_head.in_ch == \
        model.pfe.num_point_features_before_fusion
    assert model.roi_head.in_ch == model.pfe.num_point_features


def test_pvrcnn_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    for k, v in tb.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(tb["point_loss_cls"]) > 0
    assert float(tb["rcnn_loss"]) > 0
    # gradients reach every stage
    for key in ("pfe.vsa_point_feature_fusion.weight",
                "point_head.cls_layers.out.weight",
                "roi_head.reg_layers.out.weight",
                "dense_head.conv_box.weight",
                "backbone_3d.conv1.0.0.kernel"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_pvrcnn_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert out["pred_labels"].dtype == jnp.int32


def test_point_head_targets():
    from cagroup3d_tpu.models.dense_heads.point_head_simple import \
        PointHeadSimple
    cfg = pvrcnn_cfg().POINT_HEAD
    head = PointHeadSimple(cfg, num_class=2, input_channels=8)
    kp = jnp.asarray([[0.0, 0, 0], [5, 5, 0], [0.55, 0, 0]])
    kp_valid = jnp.ones(3, bool)
    gt = jnp.asarray([[0.0, 0, 0, 1, 1, 1, 0.0]])
    labels = head.assign_targets(kp, kp_valid, gt,
                                 jnp.asarray([0]), jnp.asarray([True]))
    # inside -> fg(1), far -> bg(0), in enlarged shell only -> ignore(-1)
    assert labels.tolist() == [1, 0, -1]
