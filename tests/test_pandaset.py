"""PandaSet surface: native quaternion world<->ego geometry, dataframe
pipeline, category remap, world-frame prediction dump, and the opt-in
IoU-sweep mAP (reference pcdet/datasets/pandaset/pandaset_dataset.py)."""
import json
import pickle

import numpy as np
import pandas as pd
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.pandaset_dataset import (
    ego_to_lidar_points, lidar_points_to_ego)

PC_RANGE = [0.0, -8.0, -3.0, 16.0, 8.0, 1.1]


def _pose(x=0.0, y=0.0, z=0.0, yaw=0.0):
    return dict(position=dict(x=x, y=y, z=z),
                heading=dict(w=float(np.cos(yaw / 2)), x=0.0, y=0.0,
                             z=float(np.sin(yaw / 2))))


def test_pose_roundtrip():
    rng = np.random.RandomState(0)
    pose = _pose(3.0, -2.0, 1.5, yaw=0.7)
    pts = rng.randn(50, 3) * 10
    back = ego_to_lidar_points(lidar_points_to_ego(pts, pose), pose)
    np.testing.assert_allclose(back, pts, atol=1e-9)


def test_yaw_pose_geometry():
    """A world point 1 m ahead of a yawed ego lands on the ego y axis
    (pandaset ego: y forward)."""
    yaw = 0.6
    pose = _pose(10.0, 5.0, 0.0, yaw=yaw)
    world = np.array([[10.0 - np.sin(yaw), 5.0 + np.cos(yaw), 0.0]])
    ego = lidar_points_to_ego(world, pose)
    np.testing.assert_allclose(ego, [[0.0, 1.0, 0.0]], atol=1e-9)


# ---------------------------------------------------------------------------
def _write_pandaset_fixture(root, yaw=0.5, n_pts=400):
    seq = "002"
    lidar_dir = root / "dataset" / seq / "lidar"
    cub_dir = root / "dataset" / seq / "annotations" / "cuboids"
    lidar_dir.mkdir(parents=True)
    cub_dir.mkdir(parents=True)
    pose = _pose(100.0, 50.0, 2.0, yaw=yaw)
    json.dump([pose], open(lidar_dir / "poses.json", "w"))

    rng = np.random.RandomState(0)
    # normative-frame targets, converted back to world for the fixture
    norm = np.zeros((n_pts, 3))
    norm[:, 0] = rng.rand(n_pts) * 14 + 1
    norm[:, 1] = rng.rand(n_pts) * 14 - 7
    norm[:, 2] = rng.rand(n_pts) * 3 - 2.5
    ego = np.stack([-norm[:, 1], norm[:, 0], norm[:, 2]], 1)
    world = ego_to_lidar_points(ego, pose)
    df = pd.DataFrame(dict(
        x=world[:, 0], y=world[:, 1], z=world[:, 2],
        i=rng.rand(n_pts) * 255, t=np.zeros(n_pts),
        d=np.r_[np.zeros(n_pts - 20), np.ones(20)]))
    df.to_pickle(lidar_dir / "00.pkl.gz")

    # two cuboids: one Car-mapped pickup, one Pedestrian
    norm_boxes = np.array([[5.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3],
                           [10.0, 3.0, -1.2, 0.7, 0.7, 1.7, 0.0]])
    ego_c = np.stack([-norm_boxes[:, 1], norm_boxes[:, 0],
                      norm_boxes[:, 2]], 1)
    world_c = ego_to_lidar_points(ego_c, pose)
    zrot = -yaw   # arctan2 convention for a pure-yaw pose
    cub = pd.DataFrame({
        "position.x": world_c[:, 0], "position.y": world_c[:, 1],
        "position.z": world_c[:, 2],
        "dimensions.x": norm_boxes[:, 4],     # pandaset dx = our dy
        "dimensions.y": norm_boxes[:, 3],
        "dimensions.z": norm_boxes[:, 5],
        "yaw": norm_boxes[:, 6] - zrot,
        "label": ["Pickup Truck", "Pedestrian"],
        "cuboids.sensor_id": [-1, -1]})
    cub.to_pickle(cub_dir / "00.pkl.gz")

    infos = [dict(sequence=seq, frame_idx=0,
                  lidar_path=f"dataset/{seq}/lidar/00.pkl.gz",
                  cuboids_path=f"dataset/{seq}/annotations/cuboids/"
                               f"00.pkl.gz")]
    with open(root / "pandaset_infos_val.pkl", "wb") as f:
        pickle.dump(infos, f)
    return norm_boxes


def _panda_cfg(root):
    return EasyDict(dict(
        DATASET="PandasetDataset", DATA_PATH=str(root),
        POINT_CLOUD_RANGE=PC_RANGE, POINT_CAP=1024, MAX_GT=8,
        LIDAR_DEVICE=0,
        TRAINING_CATEGORIES={"Pickup Truck": "Car",
                             "Pedestrian": "Pedestrian"},
        INFO_PATH=dict(train=["pandaset_infos_val.pkl"],
                       test=["pandaset_infos_val.pkl"]),
        DATA_PROCESSOR=[dict(NAME="shuffle_points",
                             SHUFFLE_ENABLED=dict(train=True,
                                                  test=False))]))


def test_pandaset_pipeline(tmp_path):
    from cagroup3d_tpu.datasets import PandasetDataset
    norm_boxes = _write_pandaset_fixture(tmp_path)
    ds = PandasetDataset(_panda_cfg(tmp_path),
                         class_names=["Car", "Pedestrian"],
                         training=False)
    assert len(ds) == 1
    item = ds[0]
    assert item["points"].shape == (1024, 4)
    # device filter dropped the 20 pandarGT points
    assert int(item["points_valid"].sum()) == 380
    # boxes land at the normative-frame targets, labels remapped
    got = item["gt_boxes"][item["gt_valid"]]
    np.testing.assert_allclose(got[0, :6], norm_boxes[0, :6], atol=1e-5)
    assert got[0, 6] == pytest.approx(0.3, abs=1e-5)
    assert got[0, 7] == 0    # Pickup Truck -> Car
    assert got[1, 7] == 1
    # intensity normalized to [0, 1]
    assert item["points"][item["points_valid"], 3].max() <= 1.0
    np.testing.assert_array_equal(item["points"], ds[0]["points"])

    # default evaluation is the reference's explicit no-op
    r, s = ds.evaluation([], ["Car"])
    assert r == {} and "not implemented" in s

    # opt-in IoU-sweep mAP: GT as predictions -> 1.0
    dets = [dict(boxes_lidar=np.asarray(got[:, :7]),
                 name=np.array(["Car", "Pedestrian"]),
                 score=np.array([0.9, 0.8]),
                 pred_labels=np.array([0, 1]))]
    r2, _ = ds.evaluation(dets, ["Car", "Pedestrian"],
                          eval_metric="lyft")
    assert r2["mAP"] == pytest.approx(1.0)


def test_pandaset_prediction_dump(tmp_path):
    from cagroup3d_tpu.datasets import PandasetDataset
    _write_pandaset_fixture(tmp_path)
    ds = PandasetDataset(_panda_cfg(tmp_path),
                         class_names=["Car", "Pedestrian"],
                         training=False)
    item = ds[0]
    batch = ds.collate_batch([item])
    pred = dict(pred_boxes=item["gt_boxes"][item["gt_valid"]][:, :7],
                pred_scores=np.array([0.9, 0.8]),
                pred_labels=np.array([0, 1]))
    out_dir = tmp_path / "preds"
    annos = ds.generate_prediction_dicts(batch, [pred],
                                         ["Car", "Pedestrian"],
                                         output_path=out_dir)
    df = pd.read_pickle(out_dir / "002" / "predictions" / "cuboids" /
                        "00.pkl.gz")
    # world-frame dump matches the fixture cuboids
    cub = pd.read_pickle(tmp_path / "dataset" / "002" / "annotations" /
                         "cuboids" / "00.pkl.gz")
    np.testing.assert_allclose(df["position.x"], cub["position.x"],
                               atol=1e-4)
    np.testing.assert_allclose(
        np.mod(df["yaw"], 2 * np.pi), np.mod(cub["yaw"], 2 * np.pi),
        atol=1e-5)
    assert list(df["label"]) == ["Car", "Pedestrian"]
    assert "preds" in annos[0]
