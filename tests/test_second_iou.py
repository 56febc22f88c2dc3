"""SECOND-IoU end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/second_net_iou.py + roi_heads/second_head.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg


def second_iou_cfg():
    c = second_cfg()
    c.NAME = "SECONDNetIoU"
    c.ROI_HEAD = EasyDict(dict(
        NAME="SECONDHead", CLASS_AGNOSTIC=True,
        SHARED_FC=[32, 32], IOU_FC=[32], DP_RATIO=0.3,
        NMS_CONFIG=dict(
            TRAIN=dict(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=64,
                       NMS_THRESH=0.8),
            TEST=dict(NMS_PRE_MAXSIZE=256, NMS_POST_MAXSIZE=32,
                      NMS_THRESH=0.7)),
        ROI_GRID_POOL=dict(GRID_SIZE=7, IN_CHANNEL=32,
                           DOWNSAMPLE_RATIO=8),
        TARGET_CONFIG=dict(BOX_CODER="ResidualCoder", ROI_PER_IMAGE=32,
                           FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
                           CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.75,
                           CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
                           HARD_BG_RATIO=0.8, REG_FG_THRESH=0.55),
        LOSS_CONFIG=dict(IOU_LOSS="BinaryCrossEntropy",
                         LOSS_WEIGHTS=dict(rcnn_iou_weight=1.0,
                                           code_weights=[1.0] * 7))))
    c.POST_PROCESSING = EasyDict(dict(
        RECALL_THRESH_LIST=[0.3, 0.5, 0.7], SCORE_THRESH=0.1,
        NMS_CONFIG=dict(SCORE_TYPE="weighted_iou_cls",
                        SCORE_WEIGHTS=dict(iou=0.5, cls=0.5),
                        NMS_THRESH=0.1, NMS_POST_MAXSIZE=32)))
    return c


def _bev_in_channels(c):
    # the test's BaseBEVBackbone sums its up filters
    return sum(c.BACKBONE_2D.NUM_UPSAMPLE_FILTERS)


@pytest.fixture(scope="module")
def model_and_params():
    cfg = second_iou_cfg()
    cfg.ROI_HEAD.ROI_GRID_POOL.IN_CHANNEL = _bev_in_channels(cfg)
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_second_iou_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=2, P=512)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["rcnn_loss_iou"]) > 0
    for key in ("roi_head.shared_fc_layer.0.weight",
                "roi_head.iou_layers.out.weight",
                "dense_head.conv_box.weight",
                "backbone_2d.blocks.0.0.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_second_iou_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1, P=512)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert out["pred_scores"].shape == (1, 32)


def test_bev_rotated_sampler_matches_dense_reference(rng):
    """Axis-aligned box: rotated grid-sample equals direct bilinear
    interpolation at the analytic grid points."""
    from cagroup3d_tpu.models.roi_heads.second_head import \
        sample_bev_rotated
    H, W, C = 16, 16, 3
    bev = jnp.asarray(rng.rand(H, W, C), jnp.float32)
    # one axis-aligned roi centred mid-map
    roi = jnp.asarray([[4.0, 4.0, 0.0, 2.0, 2.0, 1.0, 0.0]], jnp.float32)
    g = 3
    out = sample_bev_rotated(bev, roi, g, (0.0, 0.0), (0.5, 0.5))
    out = np.asarray(out).reshape(g, g, C)
    lin = np.linspace(-0.5, 0.5, g)
    for i, u in enumerate(lin):
        for j, v in enumerate(lin):
            x = 4.0 + u * 2.0
            y = 4.0 + v * 2.0
            fx = x / 0.5 - 0.5
            fy = y / 0.5 - 0.5
            x0, y0 = int(np.floor(fx)), int(np.floor(fy))
            wx, wy = fx - x0, fy - y0
            ref = (np.asarray(bev)[y0, x0] * (1 - wx) * (1 - wy) +
                   np.asarray(bev)[y0, x0 + 1] * wx * (1 - wy) +
                   np.asarray(bev)[y0 + 1, x0] * (1 - wx) * wy +
                   np.asarray(bev)[y0 + 1, x0 + 1] * wx * wy)
            np.testing.assert_allclose(out[i, j], ref, rtol=1e-5)
