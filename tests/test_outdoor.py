"""SECOND / PointPillar outdoor stack: tiny configs, synthetic LiDAR-ish
scenes, train loss + grads + eval (reference pcdet/models/detectors/
second_net.py, pointpillar.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.models import build_network

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


def second_cfg():
    return EasyDict(dict(
        NAME="SECONDNet",
        POINT_CLOUD_RANGE=PC_RANGE,
        VOXEL_SIZE=[0.25, 0.25, 0.1],         # grid 64 x 64 x 41
        INPUT_CAP=4096,
        VFE=dict(NAME="MeanVFE", NUM_POINT_FEATURES=4),
        BACKBONE_3D=dict(NAME="VoxelBackBone8x", IN_CHANNELS=1,
                         CAPS={1: 4096, 2: 2048, 4: 1024, 8: 512}),
        MAP_TO_BEV=dict(NAME="HeightCompression", NUM_BEV_FEATURES=256),
        BACKBONE_2D=dict(NAME="BaseBEVBackbone", IN_CHANNELS=256,
                         LAYER_NUMS=[2, 2], LAYER_STRIDES=[1, 2],
                         NUM_FILTERS=[32, 64], UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[32, 32]),
        DENSE_HEAD=dict(
            NAME="AnchorHeadSingle", CLASS_AGNOSTIC=False,
            IN_CHANNELS=64,
            USE_DIRECTION_CLASSIFIER=True, DIR_OFFSET=0.78539,
            DIR_LIMIT_OFFSET=0.0, NUM_DIR_BINS=2,
            ANCHOR_GENERATOR_CONFIG=[
                dict(class_name="Car", anchor_sizes=[[3.9, 1.6, 1.56]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-1.78],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.6, unmatched_threshold=0.45),
                dict(class_name="Pedestrian",
                     anchor_sizes=[[0.8, 0.6, 1.73]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-0.6],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.5, unmatched_threshold=0.35),
            ],
            LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                cls_weight=1.0, loc_weight=2.0, dir_weight=0.2,
                code_weights=[1.0] * 7)),
            NMS_CONFIG=dict(SCORE_THRESH=0.1, NMS_THRESH=0.01,
                            NMS_PRE_MAXSIZE=512),
            MAX_OUT=64,
        ),
        POST_PROCESSING=dict(RECALL_THRESH_LIST=[0.3, 0.5, 0.7]),
    ))


def pillar_cfg():
    c = second_cfg()
    c.NAME = "PointPillar"
    c.VOXEL_SIZE = [0.25, 0.25, 4.0]
    c.VFE = EasyDict(dict(NAME="PillarVFE", NUM_POINT_FEATURES=4,
                          WITH_DISTANCE=False, USE_ABSOLUTE_XYZ=True,
                          NUM_FILTERS=[32]))
    c.pop("BACKBONE_3D")
    c.MAP_TO_BEV = EasyDict(dict(NAME="PointPillarScatter",
                                 NUM_BEV_FEATURES=32))
    c.BACKBONE_2D.IN_CHANNELS = 32
    for a in c.DENSE_HEAD.ANCHOR_GENERATOR_CONFIG:
        a["feature_map_stride"] = 1
    c.DENSE_HEAD.NMS_CONFIG.NMS_PRE_MAXSIZE = 512
    return c


def outdoor_batch(rng, B=2, P=2000, G=6):
    pts = np.zeros((B, P, 4), np.float32)
    pvalid = np.zeros((B, P), bool)
    gt = np.zeros((B, G, 8), np.float32)
    gt_valid = np.zeros((B, G), bool)
    for b in range(B):
        n = P - 100 * b
        n_obj = 3
        ctr = np.stack([rng.rand(n_obj) * 12 + 2, rng.rand(n_obj) * 12 - 6,
                        rng.rand(n_obj) * 0.5 - 1.5], -1)
        size = np.stack([rng.rand(n_obj) * 2 + 2, rng.rand(n_obj) + 1,
                         rng.rand(n_obj) + 1], -1)
        yaw = rng.rand(n_obj) * np.pi - np.pi / 2
        per = n // (n_obj + 1)
        for i in range(n_obj):
            lo = i * per
            u = (rng.rand(per, 3) - 0.5) * 0.9 * size[i]
            c, s = np.cos(yaw[i]), np.sin(yaw[i])
            x = u[:, 0] * c - u[:, 1] * s
            y = u[:, 0] * s + u[:, 1] * c
            pts[b, lo:lo + per, :3] = ctr[i] + np.stack([x, y, u[:, 2]], -1)
            gt[b, i, :3] = ctr[i]
            gt[b, i, 3:6] = size[i]
            gt[b, i, 6] = yaw[i]
            gt[b, i, 7] = i % 2
            gt_valid[b, i] = True
        pts[b, n_obj * per:n, 0] = rng.rand(n - n_obj * per) * 15
        pts[b, n_obj * per:n, 1] = rng.rand(n - n_obj * per) * 14 - 7
        pts[b, n_obj * per:n, 2] = -1.7
        pts[b, :n, 3] = rng.rand(n)
        pvalid[b, :n] = True
    return dict(points=jnp.asarray(pts), points_valid=jnp.asarray(pvalid),
                gt_boxes=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid))


@pytest.mark.parametrize("cfg_fn", [second_cfg, pillar_cfg])
def test_outdoor_train_loss_grads(rng, cfg_fn):
    cfg = cfg_fn()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = outdoor_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    for k, v in tb.items():
        assert np.isfinite(float(v)), (k, v)
    for k, v in upd.items():
        assert v.shape == S[k].shape, k
    key = "dense_head.conv_box.weight"
    assert float(jnp.abs(grads[key]).sum()) > 0
    # positives must exist (anchors cover the GT)
    assert float(tb["rpn_loss_loc"]) > 0


def test_outdoor_eval(rng):
    cfg = second_cfg()
    model = build_network(cfg, num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = outdoor_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 64, 7)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
