"""Part-A2 end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/PartA2_net.py + spconv_unet.py + partA2_head.py +
point_intra_part_head.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg


def parta2_cfg():
    c = second_cfg()
    c.NAME = "PartA2Net"
    c.BACKBONE_3D = EasyDict(dict(
        NAME="UNetV2", IN_CHANNELS=4,
        CAPS={1: 4096, 2: 2048, 4: 1024, 8: 512}))
    c.POINT_HEAD = EasyDict(dict(
        NAME="PointIntraPartOffsetHead", CLS_FC=[], PART_FC=[],
        CLASS_AGNOSTIC=True,
        TARGET_CONFIG=dict(GT_EXTRA_WIDTH=[0.2, 0.2, 0.2]),
        LOSS_CONFIG=dict(LOSS_REG="smooth-l1", LOSS_WEIGHTS=dict(
            point_cls_weight=1.0, point_part_weight=1.0))))
    c.ROI_HEAD = EasyDict(dict(
        NAME="PartA2FCHead", CLASS_AGNOSTIC=True,
        SHARED_FC=[32, 32], CLS_FC=[32], REG_FC=[32], DP_RATIO=0.3,
        SEG_MASK_SCORE_THRESH=0.3,
        NMS_CONFIG=dict(
            TRAIN=dict(NMS_PRE_MAXSIZE=512, NMS_POST_MAXSIZE=64,
                       NMS_THRESH=0.8),
            TEST=dict(NMS_PRE_MAXSIZE=256, NMS_POST_MAXSIZE=32,
                      NMS_THRESH=0.7)),
        ROI_AWARE_POOL=dict(POOL_SIZE=4, NUM_FEATURES=32,
                            MAX_POINTS_PER_VOXEL=64),
        TARGET_CONFIG=dict(BOX_CODER="ResidualCoder", ROI_PER_IMAGE=32,
                           FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
                           CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.75,
                           CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
                           HARD_BG_RATIO=0.8,
                           # random-init proposals never clear IoU 0.65;
                           # make every sampled roi fg so reg/corner
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
    cfg = parta2_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_parta2_train_loss_grads(model_and_params, rng):
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
    assert float(tb["point_loss_part"]) >= 0
    for key in ("backbone_3d.conv2.0.0.kernel",
                "backbone_3d.conv_up_t4.conv1.kernel",
                "backbone_3d.inv_conv2.0.kernel",
                "backbone_3d.conv5.0.0.kernel",
                "point_head.part_layers.out.weight",
                "roi_head.conv_part.0.0.kernel",
                "roi_head.conv_rpn.1.0.kernel",
                "roi_head.reg_layers.out.weight",
                "dense_head.conv_box.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_parta2_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1, P=512)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_unet_decoder_coords(rng):
    """The decoder's inverse convs land on the encoder's coordinate
    tables (spconv indice_key semantics)."""
    from cagroup3d_tpu.core.module import Ctx
    from cagroup3d_tpu.models.backbones_3d import UNetV2

    cfg = EasyDict(dict(IN_CHANNELS=4,
                        CAPS={1: 2048, 2: 1024, 4: 512, 8: 256}))
    bb = UNetV2(cfg, grid_size=(64, 64, 40))
    P, S = bb.init(jax.random.PRNGKey(0))
    from cagroup3d_tpu.core.sparse import SparseTensor
    n = 2048
    lat = jnp.asarray(rng.randint(0, 40, (n, 3)), jnp.int32)
    valid = jnp.ones((n,), bool)
    from cagroup3d_tpu.core.voxelize import unique_voxels
    st, _ = unique_voxels(lat, jnp.asarray(rng.rand(n, 4), jnp.float32),
                          valid, 2048, mode="mean")
    ctx = Ctx(train=False, axis_name=None, rng=jax.random.PRNGKey(0))
    out = jax.jit(lambda P, S: bb(P, S, ctx, st))(P, S)
    assert out["point_features"].shape == (2048, 16)
    # decoder output rides the stride-1 (conv1) coordinate table
    np.testing.assert_array_equal(
        np.asarray(out["point_coords"]),
        np.asarray(out["multi_scale_3d_features"]["x_conv1"].coords))
    assert np.isfinite(np.asarray(out["point_features"])).all()
