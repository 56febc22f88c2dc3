"""nuScenes surface: native CVPR-2019 metric (center-distance mAP/NDS),
NuScenesDataset pipeline over synthetic pkl+bin data, and the CBGS
multi-head anchor stack (AnchorHeadMulti + VoxelResBackBone8x) trained
end-to-end with 9-DoF velocity boxes (reference pcdet/datasets/nuscenes/
nuscenes_dataset.py, pcdet/models/dense_heads/anchor_head_multi.py)."""
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.nuscenes_eval import (accumulate, calc_ap,
                                                  calc_tp, nuscenes_eval)
from cagroup3d_tpu.models import build_network

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


# ---------------------------------------------------------------------------
# metric
# ---------------------------------------------------------------------------
def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5), vel=(0.0, 0.0)):
    return [x, y, 0.0, dims[0], dims[1], dims[2], yaw, vel[0], vel[1]]


def test_nuscenes_ap_perfect():
    gts = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                names=np.array(["car", "car"]))]
    dets = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                 names=np.array(["car", "car"]),
                 scores=np.array([0.9, 0.8]))]
    md = accumulate(gts, dets, "car", 2.0)
    assert calc_ap(md) == pytest.approx(1.0)
    assert calc_tp(md, "trans_err") == pytest.approx(0.0, abs=1e-9)
    assert calc_tp(md, "scale_err") == pytest.approx(0.0, abs=1e-9)


def test_nuscenes_ap_distance_thresholds():
    """A det 1.5 m off its GT matches at 2/4 m but not at 0.5/1 m."""
    gts = [dict(boxes=np.array([_box(5, 0)]), names=np.array(["car"]))]
    dets = [dict(boxes=np.array([_box(6.5, 0)]),
                 names=np.array(["car"]), scores=np.array([0.9]))]
    md_tight = accumulate(gts, dets, "car", 1.0)
    md_loose = accumulate(gts, dets, "car", 2.0)
    assert calc_ap(md_tight) == pytest.approx(0.0)
    assert calc_ap(md_loose) == pytest.approx(1.0)
    assert calc_tp(md_loose, "trans_err") == pytest.approx(1.5, rel=1e-6)


def test_nuscenes_tp_errors():
    """Scale/orientation/velocity errors of a matched det."""
    gts = [dict(boxes=np.array([_box(5, 0, yaw=0.0, dims=(4, 2, 2),
                                     vel=(1.0, 0.0))]),
                names=np.array(["car"]))]
    dets = [dict(boxes=np.array([_box(5, 0, yaw=np.pi / 4,
                                      dims=(4, 2, 1),
                                      vel=(0.0, 0.0))]),
                 names=np.array(["car"]), scores=np.array([0.9]))]
    md = accumulate(gts, dets, "car", 2.0)
    assert calc_tp(md, "scale_err") == pytest.approx(0.5, rel=1e-6)
    assert calc_tp(md, "orient_err") == pytest.approx(np.pi / 4, rel=1e-6)
    assert calc_tp(md, "vel_err") == pytest.approx(1.0, rel=1e-6)


def test_nuscenes_fp_halves_precision():
    """One TP + one higher-scored FP -> precision ceiling 0.5-ish AP."""
    gts = [dict(boxes=np.array([_box(5, 0)]), names=np.array(["car"]))]
    dets = [dict(boxes=np.array([_box(13, 6), _box(5, 0)]),
                 names=np.array(["car", "car"]),
                 scores=np.array([0.95, 0.9]))]
    md = accumulate(gts, dets, "car", 2.0)
    # recall reaches 1.0 at precision 0.5
    assert 0.0 < calc_ap(md) < 0.5


def test_nuscenes_full_protocol():
    gts = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                names=np.array(["car", "pedestrian"]))]
    dets = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                 names=np.array(["car", "pedestrian"]),
                 scores=np.array([0.9, 0.8]))]
    result, s = nuscenes_eval(gts, dets, ["car", "pedestrian", "bus"])
    assert result["mAP"] == pytest.approx(1.0)
    assert result["NDS"] == pytest.approx(1.0)
    assert result["mAP_car"] == pytest.approx(1.0)
    assert "bus" not in s.split("Per-class")[1] or True
    # class with no GT and no dets contributes nothing (devkit nan-skip)
    assert "mAP_bus" not in result


def test_nuscenes_range_filter():
    """GT/dets beyond the class range are dropped (traffic_cone: 30 m)."""
    gts = [dict(boxes=np.array([_box(40, 0, dims=(0.4, 0.4, 1.0))]),
                names=np.array(["traffic_cone"]))]
    dets = [dict(boxes=np.array([_box(40, 0, dims=(0.4, 0.4, 1.0))]),
                 names=np.array(["traffic_cone"]),
                 scores=np.array([0.9]))]
    assert accumulate(gts, dets, "traffic_cone", 2.0) is None


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------
def _write_nuscenes_fixture(root, n_scenes=2, n_pts=500):
    rng = np.random.RandomState(0)
    infos = []
    (root / "samples").mkdir(parents=True, exist_ok=True)
    for i in range(n_scenes):
        rel = f"samples/lidar_{i:03d}.bin"
        pts = np.zeros((n_pts, 5), np.float32)
        pts[:, 0] = rng.rand(n_pts) * 14 + 1
        pts[:, 1] = rng.rand(n_pts) * 14 - 7
        pts[:, 2] = rng.rand(n_pts) * 3 - 2.5
        pts[:, 3] = rng.rand(n_pts)
        pts.tofile(str(root / rel))
        gt = np.array([[5.0 + i, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3,
                        1.0, 0.5],
                       [10.0, 3.0, -1.2, 0.7, 0.7, 1.7, 0.0,
                        np.nan, np.nan]], np.float32)
        infos.append(dict(
            lidar_path=rel, token=f"tok{i}", sweeps=[],
            gt_boxes=gt, gt_names=np.array(["car", "pedestrian"]),
            num_lidar_pts=np.array([50, 20])))
    with open(root / "infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def _nusc_data_cfg(root):
    return EasyDict(dict(
        DATASET="NuScenesDataset", DATA_PATH=str(root), VERSION="",
        MAX_SWEEPS=1, PRED_VELOCITY=True,
        SET_NAN_VELOCITY_TO_ZEROS=True, FILTER_MIN_POINTS_IN_GT=1,
        POINT_CLOUD_RANGE=PC_RANGE, POINT_CAP=1024, MAX_GT=8,
        INFO_PATH=dict(train=["infos_val.pkl"], test=["infos_val.pkl"]),
        DATA_PROCESSOR=[dict(NAME="shuffle_points",
                             SHUFFLE_ENABLED=dict(train=True,
                                                  test=False))]))


def test_nuscenes_dataset_pipeline(tmp_path):
    from cagroup3d_tpu.datasets import NuScenesDataset
    _write_nuscenes_fixture(tmp_path)
    ds = NuScenesDataset(_nusc_data_cfg(tmp_path),
                         class_names=["car", "pedestrian"],
                         training=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["points"].shape == (1024, 5)
    assert item["gt_boxes"].shape == (8, 10)   # 9-DoF + label
    assert item["gt_valid"][:2].all() and not item["gt_valid"][2:].any()
    # NaN velocities zeroed
    assert np.isfinite(item["gt_boxes"]).all()
    # deterministic across re-reads (seeded per frame)
    again = ds[0]
    np.testing.assert_array_equal(item["points"], again["points"])

    # evaluation: feed the GT back as predictions -> perfect metric
    det_annos = []
    for i in range(len(ds)):
        gb = np.nan_to_num(ds.infos[i]["gt_boxes"], nan=0.0)
        det_annos.append(dict(
            boxes_lidar=gb, name=np.asarray(ds.infos[i]["gt_names"]),
            score=np.linspace(0.9, 0.8, len(gb)),
            pred_labels=np.array([0, 1])))
    result, result_str = ds.evaluation(det_annos, ["car", "pedestrian"])
    assert result["mAP"] == pytest.approx(1.0)
    assert result["NDS"] == pytest.approx(1.0)
    assert "mAP" in result_str


def test_nuscenes_balanced_resampling(tmp_path):
    from cagroup3d_tpu.datasets import NuScenesDataset
    _write_nuscenes_fixture(tmp_path)
    cfg = _nusc_data_cfg(tmp_path)
    cfg.BALANCED_RESAMPLING = True
    ds = NuScenesDataset(cfg, class_names=["car", "pedestrian"],
                         training=True)
    assert len(ds) >= 1   # resampling keeps a non-empty epoch


# ---------------------------------------------------------------------------
# CBGS multi-head model
# ---------------------------------------------------------------------------
def multihead_cfg():
    return EasyDict(dict(
        NAME="SECONDNet",
        POINT_CLOUD_RANGE=PC_RANGE,
        VOXEL_SIZE=[0.25, 0.25, 0.1],         # grid 64 x 64 x 41
        INPUT_CAP=4096,
        VFE=dict(NAME="MeanVFE", NUM_POINT_FEATURES=5),
        BACKBONE_3D=dict(NAME="VoxelResBackBone8x", IN_CHANNELS=5,
                         CAPS={1: 4096, 2: 2048, 4: 1024, 8: 512}),
        MAP_TO_BEV=dict(NAME="HeightCompression", NUM_BEV_FEATURES=256),
        BACKBONE_2D=dict(NAME="BaseBEVBackbone", IN_CHANNELS=256,
                         LAYER_NUMS=[2, 2], LAYER_STRIDES=[1, 2],
                         NUM_FILTERS=[32, 64], UPSAMPLE_STRIDES=[1, 2],
                         NUM_UPSAMPLE_FILTERS=[32, 32]),
        DENSE_HEAD=dict(
            NAME="AnchorHeadMulti", CLASS_AGNOSTIC=False,
            IN_CHANNELS=64, USE_MULTIHEAD=True, SEPARATE_MULTIHEAD=True,
            SHARED_CONV_NUM_FILTER=16,
            ANCHOR_GENERATOR_CONFIG=[
                dict(class_name="car", anchor_sizes=[[3.9, 1.6, 1.56]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-1.78],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.6, unmatched_threshold=0.45),
                dict(class_name="pedestrian",
                     anchor_sizes=[[0.8, 0.6, 1.73]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-0.6],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.5, unmatched_threshold=0.35),
                dict(class_name="bicycle",
                     anchor_sizes=[[1.7, 0.6, 1.28]],
                     anchor_rotations=[0, 1.57],
                     anchor_bottom_heights=[-1.18],
                     align_center=False, feature_map_stride=8,
                     matched_threshold=0.5, unmatched_threshold=0.35),
            ],
            RPN_HEAD_CFGS=[
                dict(HEAD_CLS_NAME=["car"]),
                dict(HEAD_CLS_NAME=["pedestrian", "bicycle"]),
            ],
            SEPARATE_REG_CONFIG=dict(
                NUM_MIDDLE_CONV=1, NUM_MIDDLE_FILTER=16,
                REG_LIST=["reg:2", "height:1", "size:3", "angle:2",
                          "velo:2"]),
            TARGET_ASSIGNER_CONFIG=dict(
                NAME="AxisAlignedTargetAssigner",
                BOX_CODER="ResidualCoder",
                BOX_CODER_CONFIG=dict(code_size=9,
                                      encode_angle_by_sincos=True)),
            LOSS_CONFIG=dict(LOSS_WEIGHTS=dict(
                pos_cls_weight=1.0, neg_cls_weight=2.0,
                cls_weight=1.0, loc_weight=0.25,
                code_weights=[1.0] * 8 + [0.2, 0.2])),
            MAX_OUT=64,
        ),
        POST_PROCESSING=dict(
            RECALL_THRESH_LIST=[0.3, 0.5, 0.7], SCORE_THRESH=0.1,
            NMS_CONFIG=dict(MULTI_CLASSES_NMS=True, NMS_THRESH=0.2,
                            NMS_PRE_MAXSIZE=128, NMS_POST_MAXSIZE=64)),
    ))


def multihead_batch(rng, B=2, P=2000, G=6):
    pts = np.zeros((B, P, 5), np.float32)
    pvalid = np.zeros((B, P), bool)
    gt = np.zeros((B, G, 10), np.float32)
    gt_valid = np.zeros((B, G), bool)
    for b in range(B):
        n = P - 100 * b
        n_obj = 3
        ctr = np.stack([rng.rand(n_obj) * 12 + 2,
                        rng.rand(n_obj) * 12 - 6,
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
            pts[b, lo:lo + per, :3] = ctr[i] + np.stack(
                [x, y, u[:, 2]], -1)
            gt[b, i, :3] = ctr[i]
            gt[b, i, 3:6] = size[i]
            gt[b, i, 6] = yaw[i]
            gt[b, i, 7:9] = rng.randn(2)         # velocity
            gt[b, i, 9] = i % 3                  # class label
            gt_valid[b, i] = True
        pts[b, n_obj * per:n, 0] = rng.rand(n - n_obj * per) * 15
        pts[b, n_obj * per:n, 1] = rng.rand(n - n_obj * per) * 14 - 7
        pts[b, n_obj * per:n, 2] = -1.7
        pts[b, :n, 3] = rng.rand(n)
        pvalid[b, :n] = True
    return dict(points=jnp.asarray(pts),
                points_valid=jnp.asarray(pvalid),
                gt_boxes=jnp.asarray(gt), gt_valid=jnp.asarray(gt_valid))


def test_multihead_train_loss_grads(rng):
    cfg = multihead_cfg()
    model = build_network(cfg, num_class=3)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = multihead_batch(rng)

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    assert float(tb["rpn_loss_loc"]) > 0      # positives matched
    # every head's branches receive gradient
    for hi in range(2):
        for br in ("cls", "reg", "velo"):
            key = f"dense_head.head{hi}.{br}.out.weight"
            assert float(jnp.abs(grads[key]).sum()) > 0, key
    assert float(jnp.abs(
        grads["dense_head.shared_conv.weight"]).sum()) > 0


def test_multihead_eval(rng):
    cfg = multihead_cfg()
    model = build_network(cfg, num_class=3)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = multihead_batch(rng, B=1)
    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(P, batch)
    assert out["pred_boxes"].shape == (1, 64, 9)  # velocity decoded
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert int(np.asarray(out["pred_labels"]).max()) <= 2


def test_multihead_anchor_major_layout():
    """Within a head the anchor table is anchor-major: all rows of
    anchor 0 (spatially contiguous) precede anchor 1 (reference
    use_multihead permute, anchor_head_multi.py:122-129)."""
    from cagroup3d_tpu.models.dense_heads.anchor_head_multi import \
        AnchorHeadMulti
    cfg = multihead_cfg().DENSE_HEAD
    head = AnchorHeadMulti(cfg, num_class=3,
                           class_names=["car", "pedestrian", "bicycle"],
                           grid_size=[64, 64, 41],
                           point_cloud_range=PC_RANGE,
                           input_channels=64)
    h0 = head.heads[0]
    ny, nx = h0["hw"]
    A = h0["n_anchors_per_loc"]
    assert A == 2
    anc = h0["anchors"].reshape(A, ny * nx, 9)
    # rotation is constant within an anchor slab, varies across slabs
    assert np.allclose(anc[0, :, 6], 0.0)
    assert np.allclose(anc[1, :, 6], 1.57)
    # velocity anchors are zero
    assert np.allclose(anc[..., 7:9], 0.0)
    h1 = head.heads[1]
    assert h1["n_anchors_per_loc"] == 4
    assert h1["class_ids"] == [1, 2]


# ---------------------------------------------------------------------------
# second_multihead-style head: non-separate reg + direction classifier
# (reference tools/cfgs/kitti_models/second_multihead.yaml)
# ---------------------------------------------------------------------------
def multihead_dir_cfg():
    cfg = multihead_cfg()
    dh = cfg.DENSE_HEAD
    del dh["SEPARATE_REG_CONFIG"]
    dh.USE_DIRECTION_CLASSIFIER = True
    dh.DIR_OFFSET = 0.78539
    dh.DIR_LIMIT_OFFSET = 0.0
    dh.NUM_DIR_BINS = 2
    dh.TARGET_ASSIGNER_CONFIG = dict(
        NAME="AxisAlignedTargetAssigner", BOX_CODER="ResidualCoder",
        BOX_CODER_CONFIG=dict(code_size=7))
    dh.LOSS_CONFIG = dict(LOSS_WEIGHTS=dict(
        pos_cls_weight=1.0, neg_cls_weight=2.0, cls_weight=1.0,
        loc_weight=2.0, dir_weight=0.2, code_weights=[1.0] * 7))
    return cfg


def test_multihead_nonseparate_dir_train_eval(rng):
    cfg = multihead_dir_cfg()
    model = build_network(cfg, num_class=3)
    P, S = model.init(jax.random.PRNGKey(0))
    assert "dense_head.head0.box.weight" in P      # single 1x1 box conv
    assert "dense_head.head0.dir.weight" in P
    batch = multihead_batch(rng)
    batch["gt_boxes"] = batch["gt_boxes"][..., [0, 1, 2, 3, 4, 5, 6, 9]]

    def loss_fn(P):
        loss, tb, upd = model.forward_train(P, S, batch,
                                            jax.random.PRNGKey(1))
        return loss, (tb, upd)

    (loss, (tb, upd)), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(P)
    assert np.isfinite(float(loss)), tb
    assert float(tb["rpn_loss_loc"]) > 0
    assert float(tb["rpn_loss_dir"]) > 0
    for hi in range(2):
        for br in ("cls", "box", "dir"):
            key = f"dense_head.head{hi}.{br}.weight"
            assert float(jnp.abs(grads[key]).sum()) > 0, key

    out = jax.jit(lambda p, b: model.forward_eval(p, S, b))(
        P, {k: v[:1] for k, v in batch.items()})
    assert out["pred_boxes"].shape == (1, 64, 7)   # 7-DoF decode
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
