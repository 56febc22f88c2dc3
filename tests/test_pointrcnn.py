"""PointRCNN end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/point_rcnn.py + pointnet2_backbone.py +
point_head_box.py + pointrcnn_head.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch


def pointrcnn_cfg():
    return EasyDict(dict(
        NAME="PointRCNN",
        POINT_CLOUD_RANGE=[0.0, -8.0, -3.0, 16.0, 8.0, 1.1],
        CLASS_NAMES=["Car", "Pedestrian"],
        BACKBONE_3D=dict(
            NAME="PointNet2MSG", IN_CHANNELS=4,
            SA_CONFIG=dict(
                NPOINTS=[256, 64, 16],
                RADIUS=[[0.2, 0.6], [0.6, 1.2], [1.2, 2.4]],
                NSAMPLE=[[8, 8], [8, 8], [8, 8]],
                MLPS=[[[8, 8], [8, 8]],
                      [[16, 16], [16, 16]],
                      [[16, 32], [16, 32]]]),
            FP_MLPS=[[32, 32], [32, 32], [64, 64]]),
        POINT_HEAD=dict(
            NAME="PointHeadBox", CLS_FC=[32], REG_FC=[32],
            CLASS_AGNOSTIC=False,
            USE_POINT_FEATURES_BEFORE_FUSION=False,
            TARGET_CONFIG=dict(
                GT_EXTRA_WIDTH=[0.2, 0.2, 0.2],
                BOX_CODER="PointResidualCoder",
                BOX_CODER_CONFIG=dict(
                    use_mean_size=True,
                    mean_size=[[3.9, 1.6, 1.56], [0.8, 0.6, 1.73]])),
            LOSS_CONFIG=dict(
                LOSS_REG="WeightedSmoothL1Loss",
                LOSS_WEIGHTS=dict(point_cls_weight=1.0,
                                  point_box_weight=1.0,
                                  code_weights=[1.0] * 8))),
        ROI_HEAD=dict(
            NAME="PointRCNNHead", CLASS_AGNOSTIC=True,
            ROI_POINT_POOL=dict(POOL_EXTRA_WIDTH=[0.0, 0.0, 0.0],
                                NUM_SAMPLED_POINTS=64,
                                DEPTH_NORMALIZER=70.0),
            XYZ_UP_LAYER=[32, 32], CLS_FC=[32], REG_FC=[32],
            DP_RATIO=0.0, USE_BN=False,
            SA_CONFIG=dict(NPOINTS=[32, 8, -1],
                           RADIUS=[0.2, 0.4, 100],
                           NSAMPLE=[8, 8, 8],
                           MLPS=[[32, 16], [16, 16], [16, 32]]),
            NMS_CONFIG=dict(
                TRAIN=dict(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=64,
                           NMS_THRESH=0.8),
                TEST=dict(NMS_PRE_MAXSIZE=256, NMS_POST_MAXSIZE=32,
                          NMS_THRESH=0.85)),
            TARGET_CONFIG=dict(BOX_CODER="ResidualCoder",
                               ROI_PER_IMAGE=32, FG_RATIO=0.5,
                               SAMPLE_ROI_BY_EACH_CLASS=True,
                               CLS_SCORE_TYPE="roi_iou",
                               CLS_FG_THRESH=0.6, CLS_BG_THRESH=0.45,
                               CLS_BG_THRESH_LO=0.1, HARD_BG_RATIO=0.8,
                               REG_FG_THRESH=-1.0),
            LOSS_CONFIG=dict(CLS_LOSS="BinaryCrossEntropy",
                             REG_LOSS="smooth-l1",
                             CORNER_LOSS_REGULARIZATION=True,
                             LOSS_WEIGHTS=dict(
                                 rcnn_cls_weight=1.0,
                                 rcnn_reg_weight=1.0,
                                 rcnn_corner_weight=1.0,
                                 code_weights=[1.0] * 7))),
        POST_PROCESSING=dict(RECALL_THRESH_LIST=[0.3, 0.5, 0.7],
                             SCORE_THRESH=0.1,
                             NMS_CONFIG=dict(NMS_THRESH=0.1,
                                             NMS_POST_MAXSIZE=32)),
    ))


@pytest.fixture(scope="module")
def model_and_params():
    cfg = pointrcnn_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def small_batch(rng, B=2):
    b = outdoor_batch(rng, B=B, P=512)
    return b


def test_pointrcnn_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = small_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["point_loss_cls"]) > 0
    assert float(tb["point_loss_box"]) > 0
    for key in ("backbone_3d.SA_modules.0.mlps.0.0.conv.weight",
                "backbone_3d.FP_modules.0.mlp.0.conv.weight",
                "point_head.box_layers.out.weight",
                "roi_head.reg_layers.out.weight",
                "roi_head.xyz_up_layer.0.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_pointrcnn_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = small_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_point_residual_coder_roundtrip():
    from cagroup3d_tpu.models.dense_heads.point_head_box import \
        PointResidualCoder
    rs = np.random.RandomState(0)
    coder = PointResidualCoder(mean_size=[[3.9, 1.6, 1.56],
                                          [0.8, 0.6, 1.73]])
    boxes = jnp.asarray(np.concatenate(
        [rs.rand(10, 3) * 10, rs.rand(10, 3) * 2 + 0.5,
         rs.rand(10, 1) * np.pi - np.pi / 2], -1).astype(np.float32))
    pts = jnp.asarray(rs.rand(10, 3).astype(np.float32) * 10)
    cls = jnp.asarray(rs.randint(0, 2, 10), jnp.int32)
    enc = coder.encode(boxes, pts, cls)
    dec = coder.decode(enc, pts, cls)
    np.testing.assert_allclose(np.asarray(dec[:, :6]),
                               np.asarray(boxes[:, :6]), atol=1e-4)
    d = (np.asarray(dec[:, 6]) - np.asarray(boxes[:, 6]) + np.pi) % \
        (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0, atol=1e-4)
