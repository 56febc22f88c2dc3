"""Outdoor augmentation: DataBaseSampler gt-paste + world transforms
wired through KittiDataset (reference pcdet/datasets/augmentor/
database_sampler.py, data_augmentor.py)."""
import pickle

import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.augmentor import (DataAugmentor,
                                              DataBaseSampler,
                                              points_in_boxes_np)
from cagroup3d_tpu.datasets.kitti_dataset import KittiDataset


def make_db(root, n_car=8, n_ped=6, rs=None):
    """Synthetic gt database: per-object .bin crops + dbinfos pkl."""
    rs = rs or np.random.RandomState(0)
    (root / "gt_database").mkdir(parents=True, exist_ok=True)
    infos = {"Car": [], "Pedestrian": []}
    for name, n, size in (("Car", n_car, [3.9, 1.6, 1.56]),
                          ("Pedestrian", n_ped, [0.8, 0.6, 1.73])):
        for i in range(n):
            npts = 20 + i
            # object points stored box-centered (reference crops subtract
            # the box center, kitti_dataset.create_groundtruth_database)
            pts = np.zeros((npts, 4), np.float32)
            pts[:, :3] = (rs.rand(npts, 3) - 0.5) * np.asarray(size) * 0.9
            pts[:, 3] = rs.rand(npts)
            rel = f"gt_database/{name}_{i}.bin"
            pts.tofile(str(root / rel))
            box = np.asarray(
                [10.0 + 6 * i, -20 + 5 * i + (0 if name == "Car" else 2.5),
                 -1.0, size[0], size[1], size[2],
                 rs.rand() * np.pi - np.pi / 2], np.float32)
            infos[name].append(dict(
                name=name, path=rel, box3d_lidar=box,
                num_points_in_gt=npts, difficulty=0,
                image_idx="000000", gt_idx=i))
    with open(root / "kitti_dbinfos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    return infos


def sampler_cfg():
    return EasyDict(dict(
        NAME="gt_sampling",
        DB_INFO_PATH=["kitti_dbinfos_train.pkl"],
        PREPARE={"filter_by_min_points": ["Car:5", "Pedestrian:5"],
                 "filter_by_difficulty": [-1]},
        SAMPLE_GROUPS=["Car:4", "Pedestrian:3"],
        NUM_POINT_FEATURES=4,
        DATABASE_WITH_FAKELIDAR=False,
        REMOVE_EXTRA_WIDTH=[0.0, 0.0, 0.0],
        LIMIT_WHOLE_SCENE=True,
    ))


def test_database_sampler_pastes_boxes_and_points(tmp_path):
    np.random.seed(0)
    make_db(tmp_path)
    sampler = DataBaseSampler(tmp_path, sampler_cfg(),
                              ["Car", "Pedestrian"])
    # scene: ground plane points + one existing Car
    rs = np.random.RandomState(1)
    pts = np.zeros((5000, 4), np.float32)
    pts[:, 0] = rs.rand(5000) * 70
    pts[:, 1] = rs.rand(5000) * 80 - 40
    pts[:, 2] = -1.8
    gt = np.asarray([[30.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3]], np.float32)
    names = np.asarray(["Car"])
    out = sampler(dict(points=pts.copy(), gt_boxes=gt.copy(),
                       gt_names=names,
                       gt_boxes_mask=np.ones(1, bool)))
    n_new = len(out["gt_boxes"]) - 1
    assert n_new > 0, "no boxes pasted"
    # LIMIT_WHOLE_SCENE: 1 existing Car -> at most 3 new cars + 3 peds
    assert n_new <= 6
    new_boxes = out["gt_boxes"][1:]
    # pasted object points exist inside each pasted box
    inside = points_in_boxes_np(out["points"], new_boxes)
    assert (inside.sum(axis=0) >= 5).all(), inside.sum(axis=0)
    # no pasted box collides with the original or another pasted box
    from cagroup3d_tpu.datasets.indoor_eval import rotated_intersection_np
    allb = out["gt_boxes"]
    inter = rotated_intersection_np(allb[:, [0, 1, 3, 4, 6]],
                                    allb[:, [0, 1, 3, 4, 6]])
    np.fill_diagonal(inter, 0.0)
    assert inter.max() < 1e-4
    assert len(out["gt_names"]) == len(out["gt_boxes"])
    assert "gt_boxes_mask" not in out


def test_database_sampler_respects_filters(tmp_path):
    np.random.seed(0)
    infos = make_db(tmp_path)
    cfg = sampler_cfg()
    cfg.PREPARE = {"filter_by_min_points": ["Car:1000", "Pedestrian:5"]}
    sampler = DataBaseSampler(tmp_path, cfg, ["Car", "Pedestrian"])
    assert len(sampler.db_infos["Car"]) == 0       # all below 1000 pts
    assert len(sampler.db_infos["Pedestrian"]) == len(infos["Pedestrian"])


def make_kitti_tree(root, n_frames=2, with_db=True):
    (root / "training" / "velodyne").mkdir(parents=True, exist_ok=True)
    rs = np.random.RandomState(2)
    infos = []
    for i in range(n_frames):
        idx = f"{i:06d}"
        pts = np.zeros((4000, 4), np.float32)
        pts[:, 0] = rs.rand(4000) * 70
        pts[:, 1] = rs.rand(4000) * 80 - 40
        pts[:, 2] = -1.8 + rs.rand(4000) * 0.1
        pts.tofile(str(root / "training" / "velodyne" / f"{idx}.bin"))
        infos.append(dict(
            point_cloud=dict(lidar_idx=idx),
            calib=dict(R0_rect=np.eye(4, dtype=np.float32),
                       Tr_velo_to_cam=np.eye(4, dtype=np.float32)),
            annos=dict(
                name=np.asarray(["Car"]),
                gt_boxes_lidar=np.asarray(
                    [[30.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.3]], np.float32),
            )))
    with open(root / "kitti_infos_train.pkl", "wb") as f:
        pickle.dump(infos, f)
    if with_db:
        make_db(root, rs=rs)
    return infos


def kitti_cfg(root):
    return EasyDict(dict(
        DATASET="KittiDataset", DATA_PATH=str(root),
        POINT_CLOUD_RANGE=[0, -40, -3, 70.4, 40, 1],
        DATA_SPLIT={"train": "train", "test": "val"},
        INFO_PATH={"train": ["kitti_infos_train.pkl"], "test": []},
        FOV_POINTS_ONLY=True, POINT_CAP=8192, MAX_GT=32,
        DATA_AUGMENTOR=dict(
            DISABLE_AUG_LIST=["placeholder"],
            AUG_CONFIG_LIST=[
                sampler_cfg(),
                dict(NAME="random_world_flip", ALONG_AXIS_LIST=["x"]),
                dict(NAME="random_world_rotation",
                     WORLD_ROT_ANGLE=[-0.78539816, 0.78539816]),
                dict(NAME="random_world_scaling",
                     WORLD_SCALE_RANGE=[0.95, 1.05]),
            ]),
        DATA_PROCESSOR=[
            dict(NAME="mask_points_and_boxes_outside_range",
                 REMOVE_OUTSIDE_BOXES=True),
            dict(NAME="shuffle_points",
                 SHUFFLE_ENABLED={"train": True, "test": False}),
        ],
    ))


def test_kitti_dataset_runs_full_aug_list(tmp_path):
    np.random.seed(0)
    make_kitti_tree(tmp_path)
    ds = KittiDataset(kitti_cfg(tmp_path), ["Car", "Pedestrian"],
                      root_path=tmp_path, training=True)
    assert ds.augmentor is not None and len(ds.augmentor.queue) == 4
    item = ds[0]
    # gt_sampling pasted extra objects beyond the single scene Car
    n_gt = int(item["gt_valid"].sum())
    assert n_gt > 1, "gt_sampling added no boxes through the dataset"
    assert item["points"].shape == (8192, 4)
    boxes = item["gt_boxes"][item["gt_valid"]]
    pts = item["points"][item["points_valid"]]
    inside = points_in_boxes_np(pts, boxes[:, :7])
    # every (non-edge-cropped) pasted box kept its object points
    assert (inside.sum(axis=0) >= 3).sum() >= n_gt - 1

    # eval mode: no augmentor, deterministic sampling
    cfg = kitti_cfg(tmp_path)
    cfg.INFO_PATH["test"] = ["kitti_infos_train.pkl"]
    ds_eval = KittiDataset(cfg, ["Car", "Pedestrian"],
                           root_path=tmp_path, training=False)
    assert ds_eval.augmentor is None
    a, b = ds_eval[0], ds_eval[0]
    np.testing.assert_array_equal(a["points"], b["points"])
