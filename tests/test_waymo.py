"""Waymo surface: native AP/APH LEVEL_1/LEVEL_2 protocol, WaymoDataset
pipeline over synthetic per-sequence pkl+npy data, and the fake-camera
KITTI-metric bridge (reference pcdet/datasets/waymo/waymo_dataset.py,
waymo_eval.py, kitti/kitti_utils.py)."""
import pickle

import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.waymo_eval import waymo_evaluation

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5)):
    return [x, y, 0.0, dims[0], dims[1], dims[2], yaw]


def _gt(boxes, names, diff=None, npts=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    n = len(boxes)
    return dict(gt_boxes_lidar=boxes, name=np.asarray(names),
                difficulty=np.asarray(diff if diff is not None
                                      else [0] * n),
                num_points_in_gt=np.asarray(npts if npts is not None
                                            else [100] * n))


def _det(boxes, names, scores):
    return dict(boxes_lidar=np.asarray(boxes, np.float32).reshape(-1, 7),
                name=np.asarray(names), score=np.asarray(scores))


# ---------------------------------------------------------------------------
# metric
# ---------------------------------------------------------------------------
def test_waymo_ap_perfect():
    gts = [_gt([_box(5, 0), _box(10, 3)], ["Vehicle", "Vehicle"])]
    dets = [_det([_box(5, 0), _box(10, 3)], ["Vehicle", "Vehicle"],
                 [0.9, 0.8])]
    ap, s = waymo_evaluation(dets, gts, ["Vehicle"])
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH"] == pytest.approx(1.0)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    assert "VEHICLE" in s


def test_waymo_aph_penalizes_heading():
    gts = [_gt([_box(5, 0, yaw=0.0)], ["Vehicle"])]
    # heading off by pi/2: AP unaffected (IoU of the square-ish overlap
    # region still clears nothing here, so use same dims), APH halved+
    dets = [_det([_box(5, 0, yaw=np.pi)], ["Vehicle"], [0.9])]
    ap, _ = waymo_evaluation(dets, gts, ["Vehicle"])
    # a pi flip leaves the box footprint identical -> AP 1, APH 0
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/APH"] == \
        pytest.approx(0.0, abs=1e-6)


def test_waymo_level_split():
    """A sparse gt (<=5 pts) is LEVEL_2: its match is ignored for L1
    (neither TP nor FP) but counts for L2."""
    gts = [_gt([_box(5, 0), _box(10, 3)], ["Vehicle", "Vehicle"],
               diff=[0, 0], npts=[100, 3])]
    dets = [_det([_box(5, 0), _box(10, 3)], ["Vehicle", "Vehicle"],
                 [0.9, 0.8])]
    ap, _ = waymo_evaluation(dets, gts, ["Vehicle"])
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == pytest.approx(1.0)
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)
    # only the L2-matched det present -> nothing left for L1 ranking
    gts2 = [_gt([_box(10, 3)], ["Vehicle"], diff=[0], npts=[3])]
    dets2 = [_det([_box(10, 3)], ["Vehicle"], [0.8])]
    ap2, _ = waymo_evaluation(dets2, gts2, ["Vehicle"])
    assert ap2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == 0.0
    assert ap2["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(1.0)


def test_waymo_fp_and_zero_point_drop():
    """A high-scored FP caps precision; zero-point gts are dropped."""
    gts = [_gt([_box(5, 0), _box(12, -3)], ["Vehicle", "Vehicle"],
               npts=[100, 0])]
    dets = [_det([_box(9, 5), _box(5, 0)], ["Vehicle", "Vehicle"],
                 [0.95, 0.9])]
    ap, _ = waymo_evaluation(dets, gts, ["Vehicle"])
    # 1 counted gt, det2 TP at precision 1/2 after the FP
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == pytest.approx(0.5)


def test_waymo_class_thresholds():
    """Vehicle needs IoU 0.7; the same offset that fails a Vehicle
    passes a Pedestrian (0.5)."""
    # 0.9 m shift on a 4x2 box -> 3D IoU 0.63 (< 0.7); 0.15 m on a
    # 0.9x0.9 pedestrian -> 0.71 (> 0.5)
    gts = [_gt([_box(5, 0), _box(10, 3, dims=(0.9, 0.9, 1.7))],
               ["Vehicle", "Pedestrian"])]
    dets = [_det([_box(5 + 0.9, 0),
                  _box(10, 3 + 0.15, dims=(0.9, 0.9, 1.7))],
                 ["Vehicle", "Pedestrian"], [0.9, 0.9])]
    ap, _ = waymo_evaluation(dets, gts, ["Vehicle", "Pedestrian"])
    assert ap["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP"] == 0.0
    assert ap["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/AP"] == \
        pytest.approx(1.0)


# ---------------------------------------------------------------------------
# kitti-format bridge
# ---------------------------------------------------------------------------
def test_transform_lidar_annos_to_kitti():
    from cagroup3d_tpu.datasets.waymo_dataset import \
        transform_lidar_annos_to_kitti
    annos = [dict(name=np.array(["Vehicle"]),
                  boxes_lidar=np.array([[2.0, 3.0, 1.0, 4.0, 2.0, 1.5,
                                         0.3]], np.float32))]
    out = transform_lidar_annos_to_kitti(annos, {"Vehicle": "Car"})[0]
    assert out["name"][0] == "Car"
    # camera frame: x=-y_l, y=-z_l(bottom), z=x_l
    np.testing.assert_allclose(out["location"][0],
                               [-3.0, -(1.0 - 0.75), 2.0], rtol=1e-6)
    np.testing.assert_allclose(out["dimensions"][0], [4.0, 1.5, 2.0])
    assert out["rotation_y"][0] == pytest.approx(-0.3 - np.pi / 2)
    assert out["bbox"].shape == (1, 4)


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------
def _write_waymo_fixture(root, n_frames=2, n_pts=400):
    seq = "segment-12345_with_camera_labels"
    tag = "waymo_processed_data_v0_5_0"
    (root / "ImageSets").mkdir(parents=True)
    (root / "ImageSets" / "val.txt").write_text(seq + ".tfrecord\n")
    seq_dir = root / tag / seq
    seq_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    infos = []
    for k in range(n_frames):
        pts = np.zeros((n_pts, 6), np.float32)
        pts[:, 0] = rng.rand(n_pts) * 14 + 1
        pts[:, 1] = rng.rand(n_pts) * 14 - 7
        pts[:, 2] = rng.rand(n_pts) * 3 - 2.5
        pts[:, 3] = rng.rand(n_pts) * 2          # raw intensity
        pts[:, 4] = rng.rand(n_pts)              # elongation
        pts[:, 5] = -1                           # in a labeled zone
        pts[-10:, 5] = 1                         # NLZ points
        np.save(seq_dir / f"{k:04d}.npy", pts)
        boxes = np.array([[5.0 + k, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3],
                          [10.0, 3.0, -1.2, 0.9, 0.9, 1.7, 0.0]],
                         np.float32)
        infos.append(dict(
            point_cloud=dict(lidar_sequence=seq, sample_idx=k),
            frame_id=f"{seq}_{k}",
            annos=dict(name=np.array(["Vehicle", "Pedestrian"]),
                       difficulty=np.array([0, 0]),
                       num_points_in_gt=np.array([60, 20]),
                       gt_boxes_lidar=boxes)))
    with open(seq_dir / f"{seq}.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def _waymo_data_cfg(root):
    return EasyDict(dict(
        DATASET="WaymoDataset", DATA_PATH=str(root),
        PROCESSED_DATA_TAG="waymo_processed_data_v0_5_0",
        POINT_CLOUD_RANGE=PC_RANGE, POINT_CAP=1024, MAX_GT=8,
        DATA_SPLIT=dict(train="train", test="val"),
        SAMPLED_INTERVAL=dict(train=1, test=1),
        FILTER_EMPTY_BOXES_FOR_TRAIN=True,
        DISABLE_NLZ_FLAG_ON_POINTS=False,
        DATA_PROCESSOR=[dict(NAME="shuffle_points",
                             SHUFFLE_ENABLED=dict(train=True,
                                                  test=False))]))


def test_waymo_dataset_pipeline(tmp_path):
    from cagroup3d_tpu.datasets import WaymoDataset
    _write_waymo_fixture(tmp_path)
    ds = WaymoDataset(_waymo_data_cfg(tmp_path),
                      class_names=["Vehicle", "Pedestrian"],
                      training=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["points"].shape == (1024, 5)
    assert item["gt_boxes"].shape == (8, 8)
    assert item["gt_valid"][:2].all() and not item["gt_valid"][2:].any()
    # intensity tanh-squashed into (-1, 1)
    valid = item["points_valid"]
    assert np.abs(item["points"][valid][:, 3]).max() < 1.0
    # deterministic re-read
    np.testing.assert_array_equal(item["points"], ds[0]["points"])

    # GT fed back as predictions -> perfect native metric
    det_annos = []
    for info in ds.infos:
        a = info["annos"]
        det_annos.append(dict(boxes_lidar=a["gt_boxes_lidar"],
                              name=a["name"],
                              score=np.array([0.9, 0.8])))
    result, s = ds.evaluation(det_annos, ["Vehicle", "Pedestrian"],
                              eval_metric="waymo")
    assert result["OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP"] == \
        pytest.approx(1.0)
    assert result["OBJECT_TYPE_TYPE_PEDESTRIAN_LEVEL_2/APH"] == \
        pytest.approx(1.0)

    # the KITTI-metric bridge runs end-to-end and returns the R40 keys
    result_k, s_k = ds.evaluation(
        [dict(d, pred_labels=np.array([1, 2])) for d in det_annos],
        ["Vehicle", "Pedestrian"], eval_metric="kitti")
    assert any("3d" in k for k in result_k)


def test_waymo_nlz_filter_and_sequence_variants(tmp_path):
    """NLZ points dropped when the flag is honored; sequence pkl found
    through the name-variant probe."""
    from cagroup3d_tpu.datasets import WaymoDataset
    _write_waymo_fixture(tmp_path)
    cfg = _waymo_data_cfg(tmp_path)
    ds = WaymoDataset(cfg, class_names=["Vehicle"], training=False)
    seq = ds.infos[0]["point_cloud"]["lidar_sequence"]
    raw = np.load(tmp_path / cfg.PROCESSED_DATA_TAG / seq / "0000.npy")
    pts = ds.get_lidar(seq, 0)
    assert len(pts) == (raw[:, 5] == -1).sum()
    # a pkl saved without the _with_camera_labels suffix is still found
    # when the ImageSets entry carries the suffix (waymo_dataset.py:
    # check_sequence_name_with_all_version)
    bare = tmp_path / cfg.PROCESSED_DATA_TAG / "segment-99"
    bare.mkdir(parents=True)
    (bare / "segment-99.pkl").write_bytes(b"x")
    probe = WaymoDataset._check_sequence_name(
        tmp_path / cfg.PROCESSED_DATA_TAG /
        "segment-99_with_camera_labels" /
        "segment-99_with_camera_labels.pkl")
    assert probe == bare / "segment-99.pkl"
