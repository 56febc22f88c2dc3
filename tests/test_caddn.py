"""CaDDN end-to-end on a tiny synthetic config (reference
pcdet/models/detectors/caddn.py + image_vfe stack)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network

PC_RANGE = [0.0, -3.2, -2.0, 6.4, 3.2, 1.2]     # grid 16 x 16 x 8 @ 0.4
IMG_H, IMG_W = 64, 80


def caddn_cfg():
    return EasyDict(dict(
        NAME="CaDDN",
        CLASS_NAMES=["Car", "Pedestrian"],
        POINT_CLOUD_RANGE=PC_RANGE,
        VOXEL_SIZE=[0.4, 0.4, 0.4],
        VFE=dict(
            NAME="ImageVFE",
            FFN=dict(
                NAME="DepthFFN",
                DDN=dict(NAME="DDNConv", BACKBONE_NAME="conv",
                         ARGS=dict(trunk_channels=16)),
                CHANNEL_REDUCE=dict(in_channels=16, out_channels=8,
                                    kernel_size=1, stride=1, bias=False),
                DISCRETIZE=dict(mode="LID", num_bins=12, depth_min=0.5,
                                depth_max=6.4),
                LOSS=dict(NAME="DDNLoss",
                          ARGS=dict(weight=3.0, alpha=0.25, gamma=2.0,
                                    fg_weight=13, bg_weight=1))),
            F2V=dict(NAME="FrustumToVoxel",
                     SAMPLER=dict(mode="bilinear",
                                  padding_mode="zeros"))),
        MAP_TO_BEV=dict(NAME="Conv2DCollapse", NUM_BEV_FEATURES=8,
                        ARGS=dict(kernel_size=1, stride=1, bias=False)),
        BACKBONE_2D=dict(NAME="BaseBEVBackbone", IN_CHANNELS=8,
                         LAYER_NUMS=[2, 2], LAYER_STRIDES=[1, 2],
                         NUM_FILTERS=[16, 32],
                         UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[16, 16]),
        DENSE_HEAD=dict(
            NAME="AnchorHeadSingle", CLASS_AGNOSTIC=False,
            USE_DIRECTION_CLASSIFIER=True, DIR_OFFSET=0.78539,
            DIR_LIMIT_OFFSET=0.0, NUM_DIR_BINS=2,
            ANCHOR_GENERATOR_CONFIG=[
                dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-1.78], align_center=False,
                     feature_map_stride=1, matched_threshold=0.6,
                     unmatched_threshold=0.45),
                dict(class_name="Pedestrian",
                     anchor_sizes=[[0.8, 0.6, 1.73]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-0.6], align_center=False,
                     feature_map_stride=1, matched_threshold=0.5,
                     unmatched_threshold=0.35)],
            TARGET_ASSIGNER_CONFIG=dict(
                NAME="AxisAlignedTargetAssigner", POS_FRACTION=-1.0,
                SAMPLE_SIZE=512, NORM_BY_NUM_EXAMPLES=False,
                MATCH_HEIGHT=False, BOX_CODER="ResidualCoder"),
            LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                cls_weight=1.0, loc_weight=2.0, dir_weight=0.2,
                code_weights=[1.0] * 7))),
        POST_PROCESSING=dict(RECALL_THRESH_LIST=[0.3, 0.5, 0.7],
                             SCORE_THRESH=0.1,
                             NMS_CONFIG=dict(NMS_THRESH=0.1,
                                             NMS_PRE_MAXSIZE=256,
                                             NMS_POST_MAXSIZE=32)),
    ))


def caddn_batch(rng, B=2):
    # camera at lidar origin looking +x: cam axes (right=-y, down=-z,
    # fwd=+x)
    l2c = np.zeros((4, 4), np.float32)
    l2c[0, 1] = -1.0    # cam x = -lidar y
    l2c[1, 2] = -1.0    # cam y = -lidar z
    l2c[2, 0] = 1.0     # cam z = +lidar x
    l2c[3, 3] = 1.0
    f = 40.0
    K = np.array([[f, 0, IMG_W / 2, 0],
                  [0, f, IMG_H / 2, 0],
                  [0, 0, 1, 0]], np.float32)
    n_gt = 3
    gt = np.zeros((B, n_gt, 8), np.float32)
    gt[..., 0] = rng.uniform(1.5, 5.5, (B, n_gt))
    gt[..., 1] = rng.uniform(-2.0, 2.0, (B, n_gt))
    gt[..., 2] = rng.uniform(-1.2, 0.2, (B, n_gt))
    gt[..., 3:6] = rng.uniform(0.8, 2.0, (B, n_gt, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, n_gt))
    gt[..., 7] = rng.randint(1, 3, (B, n_gt))
    boxes2d = np.zeros((B, n_gt, 4), np.float32)
    boxes2d[..., 0] = rng.uniform(0, IMG_W / 2, (B, n_gt))
    boxes2d[..., 1] = rng.uniform(0, IMG_H / 2, (B, n_gt))
    boxes2d[..., 2] = boxes2d[..., 0] + rng.uniform(8, 20, (B, n_gt))
    boxes2d[..., 3] = boxes2d[..., 1] + rng.uniform(8, 20, (B, n_gt))
    return {
        "images": jnp.asarray(rng.rand(B, IMG_H, IMG_W, 3), jnp.float32),
        "depth_maps": jnp.asarray(
            rng.uniform(0.5, 6.4, (B, IMG_H // 4, IMG_W // 4)),
            jnp.float32),
        "gt_boxes2d": jnp.asarray(boxes2d),
        "gt_boxes2d_valid": jnp.ones((B, n_gt), bool),
        "trans_lidar_to_cam": jnp.asarray(np.tile(l2c, (B, 1, 1))),
        "trans_cam_to_img": jnp.asarray(np.tile(K, (B, 1, 1))),
        "gt_boxes": jnp.asarray(gt),
        "gt_valid": jnp.ones((B, n_gt), bool),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = caddn_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    return model, P, S


def test_caddn_train_loss_grads(model_and_params, rng):
    model, P, S = model_and_params
    batch = caddn_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    assert float(tb["ddn_loss"]) > 0
    for key in ("vfe.ffn.ddn.stem.0.weight",
                "vfe.ffn.ddn.depth_head.weight",
                "vfe.ffn.channel_reduce.weight",
                "map_to_bev.block.weight",
                "backbone_2d.blocks.0.0.weight",
                "dense_head.conv_box.weight"):
        assert float(jnp.abs(grads[key]).sum()) > 0, key


def test_caddn_eval(model_and_params, rng):
    model, P, S = model_and_params
    batch = caddn_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape[0] == 1
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_frustum_projection_roundtrip(rng):
    """A voxel center straight ahead of the camera projects to the image
    center and the correct LID depth bin."""
    from cagroup3d_tpu.models.backbones_3d.image_vfe import (ImageVFE,
                                                            bin_depths)
    cfg = caddn_cfg()
    vfe = ImageVFE(cfg.VFE, grid_size=[16, 16, 8],
                   point_cloud_range=PC_RANGE)
    b = caddn_batch(np.random.RandomState(0), B=1)
    grid = vfe.voxel_grid_image_coords(b["trans_lidar_to_cam"][0],
                                       b["trans_cam_to_img"][0])
    # voxel (8, 8, 4): center x=3.4, y=0.0(+.5*0.4-3.2=0.2-...) compute:
    x = PC_RANGE[0] + (8 + 0.5) * 0.4
    y = PC_RANGE[1] + (8 + 0.5) * 0.4
    z = PC_RANGE[2] + (4 + 0.5) * 0.4
    u, v, d = np.asarray(grid[8, 8, 4])
    # cam: right = -y, down = -z, depth = x
    f = 40.0
    assert abs(u - (f * (-y) / x + IMG_W / 2) / 4) < 1e-3
    assert abs(v - (f * (-z) / x + IMG_H / 2) / 4) < 1e-3
    expect = float(bin_depths(jnp.float32(x), "LID", 0.5, 6.4, 12))
    assert abs(d - expect) < 1e-3


def test_fg_mask(rng):
    from cagroup3d_tpu.models.backbones_3d.image_vfe import \
        compute_fg_mask
    boxes = jnp.asarray([[4.0, 8.0, 12.0, 16.0]])
    m = compute_fg_mask(boxes, jnp.ones(1, bool), (8, 8), 4)
    m = np.asarray(m)
    assert m[2, 1] and m[3, 2] and not m[1, 0] and not m[4, 3]
