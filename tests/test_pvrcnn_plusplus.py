"""PV-RCNN++ end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/pv_rcnn_plusplus.py + VectorPoolAggregation
modules in pointnet2_stack/pointnet2_modules.py:160-470)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network
from test_outdoor import outdoor_batch, second_cfg


def _vp_cfg(local_agg, reduced, radii=(0.4, 0.8), extra=None):
    c = dict(
        NAME="VectorPoolAggregationModuleMSG", NUM_GROUPS=2,
        LOCAL_AGGREGATION_TYPE=local_agg,
        NUM_REDUCED_CHANNELS=reduced,
        NUM_CHANNELS_OF_LOCAL_AGGREGATION=8,
        MSG_POST_MLPS=[16],
        GROUP_CFG_0=dict(NUM_LOCAL_VOXEL=[2, 2, 2],
                         MAX_NEIGHBOR_DISTANCE=radii[0],
                         NEIGHBOR_NSAMPLE=-1, POST_MLPS=[8, 8]),
        GROUP_CFG_1=dict(NUM_LOCAL_VOXEL=[2, 2, 2],
                         MAX_NEIGHBOR_DISTANCE=radii[1],
                         NEIGHBOR_NSAMPLE=-1, POST_MLPS=[8, 8]))
    c.update(extra or {})
    return EasyDict(c)


def pvrcnn_pp_cfg():
    c = second_cfg()
    c.NAME = "PVRCNNPlusPlus"
    c.VFE = EasyDict(dict(NAME="MeanVFE", NUM_POINT_FEATURES=4))
    c.PFE = EasyDict(dict(
        NAME="VoxelSetAbstraction",
        POINT_SOURCE="raw_points", NUM_KEYPOINTS=256,
        NUM_OUTPUT_FEATURES=32, SAMPLE_METHOD="SPC",
        SPC_SAMPLING=dict(NUM_SECTORS=6, SAMPLE_RADIUS_WITH_ROI=1.6),
        FEATURES_SOURCE=["bev", "x_conv3", "x_conv4", "raw_points"],
        SA_LAYER=dict(
            raw_points=_vp_cfg("local_interpolation", 1, extra=dict(
                FILTER_NEIGHBOR_WITH_ROI=True,
                RADIUS_OF_NEIGHBOR_WITH_ROI=2.4)),
            x_conv3=_vp_cfg("local_interpolation", 32,
                            radii=(1.2, 2.4),
                            extra=dict(DOWNSAMPLE_FACTOR=4,
                                       INPUT_CHANNELS=64)),
            x_conv4=_vp_cfg("voxel_avg_pool", 32, radii=(2.4, 4.8),
                            extra=dict(DOWNSAMPLE_FACTOR=8,
                                       INPUT_CHANNELS=64)),
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
        ROI_GRID_POOL=_vp_cfg("voxel_random_choice", 16,
                              radii=(0.8, 1.6),
                              extra=dict(GRID_SIZE=4)),
        TARGET_CONFIG=dict(BOX_CODER="ResidualCoder", ROI_PER_IMAGE=32,
                           FG_RATIO=0.5, SAMPLE_ROI_BY_EACH_CLASS=True,
                           CLS_SCORE_TYPE="roi_iou", CLS_FG_THRESH=0.75,
                           CLS_BG_THRESH=0.25, CLS_BG_THRESH_LO=0.1,
                           HARD_BG_RATIO=0.8, REG_FG_THRESH=-1.0),
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
    cfg = pvrcnn_pp_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_pvrcnn_pp_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["rcnn_loss"]) > 0
    assert float(tb["point_loss_cls"]) > 0
    for key in ("pfe.SA_raw_points.layer_0.sep_agg.weight",
                "pfe.SA_x_conv3.layer_1.post_mlps.0.weight",
                "pfe.SA_x_conv4.layer_0.sep_agg.weight",
                "pfe.SA_raw_points.msg_post_mlps.0.weight",
                "roi_head.roi_grid_pool_layer.layer_0.sep_agg.weight",
                "roi_head.reg_layers.out.weight",
                "dense_head.conv_box.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_pvrcnn_pp_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = outdoor_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 32, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_vector_pool_local_interp_empty_far_field(rng):
    """Grid centers with no support inside the cutoff produce zero
    vectors (reference three_nn_for_vector_pool -1-idx semantics)."""
    from cagroup3d_tpu.models.backbones_3d.vector_pool import \
        masked_three_nn_within
    pts = jnp.asarray(rng.rand(32, 3), jnp.float32)
    far = jnp.asarray([[100.0, 100.0, 100.0], [0.5, 0.5, 0.5]],
                      jnp.float32)
    dist, idx, ok = masked_three_nn_within(
        far, jnp.ones(2, bool), pts, jnp.ones(32, bool), 1.0)
    assert not bool(ok[0])
    assert bool(ok[1])


def test_filter_points_near_rois(rng):
    from cagroup3d_tpu.models.backbones_3d.vector_pool import \
        filter_points_near_rois
    pts = jnp.asarray([[0.0, 0, 0], [10.0, 0, 0]], jnp.float32)
    rois = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    keep = filter_points_near_rois(pts, jnp.ones(2, bool), rois,
                                   jnp.ones(1, bool), 1.0)
    assert bool(keep[0]) and not bool(keep[1])
