"""Lyft surface: native competition mAP (3D-IoU threshold sweep),
LyftDataset multi-sweep pipeline over synthetic pkl+bin data, and the
KITTI-metric bridge (reference pcdet/datasets/lyft/lyft_dataset.py,
lyft_mAP_eval/lyft_eval.py)."""
import pickle

import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.lyft_dataset import lyft_map_eval

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


def _box(x, y, yaw=0.0, dims=(4.0, 2.0, 1.5)):
    return [x, y, 0.0, dims[0], dims[1], dims[2], yaw]


# ---------------------------------------------------------------------------
# metric
# ---------------------------------------------------------------------------
def test_lyft_map_perfect():
    gts = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                names=np.array(["car", "car"]))]
    dets = [dict(boxes=np.array([_box(5, 0), _box(10, 3)]),
                 names=np.array(["car", "car"]),
                 scores=np.array([0.9, 0.8]))]
    aps = lyft_map_eval(gts, dets, ["car"], [0.5, 0.75, 0.95])
    np.testing.assert_allclose(aps[0], 1.0)


def test_lyft_map_threshold_sweep():
    """A det passing IoU 0.5 but not 0.75 scores on low thresholds
    only (the COCO-style sweep the competition metric averages)."""
    gts = [dict(boxes=np.array([_box(5, 0)]), names=np.array(["car"]))]
    dets = [dict(boxes=np.array([_box(5.9, 0)]),   # IoU ~0.63
                 names=np.array(["car"]), scores=np.array([0.9]))]
    aps = lyft_map_eval(gts, dets, ["car"], [0.5, 0.75])
    assert aps[0, 0] == pytest.approx(1.0)
    assert aps[0, 1] == pytest.approx(0.0)


def test_lyft_map_fp_and_classes():
    gts = [dict(boxes=np.array([_box(5, 0)]), names=np.array(["car"]))]
    dets = [dict(boxes=np.array([_box(12, 5), _box(5, 0)]),
                 names=np.array(["car", "car"]),
                 scores=np.array([0.95, 0.9]))]
    aps = lyft_map_eval(gts, dets, ["car", "pedestrian"], [0.5])
    assert aps[0, 0] == pytest.approx(0.5)
    assert aps[1, 0] == 0.0   # no gt for pedestrian -> skipped (0)


# ---------------------------------------------------------------------------
# dataset
# ---------------------------------------------------------------------------
def _write_lyft_fixture(root, n_scenes=2, n_pts=400):
    rng = np.random.RandomState(0)
    (root / "trainval" / "lidar").mkdir(parents=True)
    infos = []
    for i in range(n_scenes):
        rel = f"lidar/host-a_{i:03d}.bin"
        pts = np.zeros((n_pts, 5), np.float32)
        pts[:, 0] = rng.rand(n_pts) * 14 + 1
        pts[:, 1] = rng.rand(n_pts) * 14 - 7
        pts[:, 2] = rng.rand(n_pts) * 3 - 2.5
        pts[:, 3] = rng.rand(n_pts) * 100
        raw = pts.reshape(-1)
        # ragged tail: lyft dumps sometimes carry a partial point
        np.concatenate([raw, np.zeros(3, np.float32)]).tofile(
            str(root / "trainval" / rel))
        gt = np.array([[5.0 + i, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3],
                       [10.0, 3.0, -1.2, 0.7, 0.7, 1.7, 0.0]],
                      np.float32)
        infos.append(dict(
            lidar_path=rel, token=f"tok{i}", sweeps=[],
            gt_boxes=gt, gt_names=np.array(["car", "pedestrian"]),
            num_lidar_pts=np.array([50, 20])))
    with open(root / "trainval" / "lyft_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def _lyft_data_cfg(root):
    return EasyDict(dict(
        DATASET="LyftDataset", DATA_PATH=str(root), VERSION="trainval",
        MAX_SWEEPS=1, FILTER_MIN_POINTS_IN_GT=1,
        EVAL_LYFT_IOU_LIST=[0.5, 0.75],
        POINT_CLOUD_RANGE=PC_RANGE, POINT_CAP=1024, MAX_GT=8,
        DATA_SPLIT=dict(train="train", test="val"),
        INFO_PATH=dict(train=["lyft_infos_val.pkl"],
                       test=["lyft_infos_val.pkl"]),
        DATA_PROCESSOR=[dict(NAME="shuffle_points",
                             SHUFFLE_ENABLED=dict(train=True,
                                                  test=False))]))


def test_lyft_dataset_pipeline(tmp_path):
    from cagroup3d_tpu.datasets import LyftDataset
    _write_lyft_fixture(tmp_path)
    ds = LyftDataset(_lyft_data_cfg(tmp_path),
                     class_names=["car", "pedestrian"], training=False)
    assert len(ds) == 2
    item = ds[0]
    assert item["points"].shape == (1024, 5)    # xyz + intensity + lag
    assert item["gt_boxes"].shape == (8, 8)
    assert item["gt_valid"][:2].all() and not item["gt_valid"][2:].any()
    np.testing.assert_array_equal(item["points"], ds[0]["points"])

    # GT fed back as predictions -> perfect competition mAP
    det_annos = []
    for info in ds.infos:
        det_annos.append(dict(
            boxes_lidar=np.asarray(info["gt_boxes"]),
            name=np.asarray(info["gt_names"]),
            score=np.array([0.9, 0.8]),
            pred_labels=np.array([0, 1])))
    result, s = ds.evaluation(det_annos, ["car", "pedestrian"],
                              eval_metric="lyft")
    assert result["mAP"] == pytest.approx(1.0)
    assert result["AP_car"] == pytest.approx(1.0)
    assert "mAP" in s

    # KITTI bridge runs end-to-end
    result_k, _ = ds.evaluation(det_annos, ["car", "pedestrian"],
                                eval_metric="kitti")
    assert any("3d" in k for k in result_k)


def test_lyft_ego_point_removal():
    from cagroup3d_tpu.datasets import LyftDataset
    pts = np.array([[0.5, 0.2, 0, 0], [5.0, 0.2, 0, 0],
                    [0.5, 3.0, 0, 0]], np.float32)
    out = LyftDataset.remove_ego_points(pts)
    assert len(out) == 2   # only the near-origin point dropped
