"""Raw-KITTI -> infos/gt-database generation (kitti_infos.py vs the
reference get_infos/create_groundtruth_database schemas), round-tripped
through KittiDataset and the gt-sampling DataBaseSampler."""
import pickle

import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.kitti_infos import (
    create_groundtruth_database, create_kitti_infos, get_infos,
    parse_calib_file, parse_label_file, fov_flag, _difficulty)


CALIB_TXT = """P0: 707.0493 0 604.0814 0 0 707.0493 180.5066 0 0 0 1 0
P1: 707.0493 0 604.0814 -379.7842 0 707.0493 180.5066 0 0 0 1 0
P2: 707.0493 0 604.0814 45.75831 0 707.0493 180.5066 -0.3454157 0 0 1 0.004981016
P3: 707.0493 0 604.0814 -334.1081 0 707.0493 180.5066 2.33966 0 0 1 0.003201153
R0_rect: 0.9999128 0.01009263 -0.008511932 -0.01012729 0.9999406 -0.004037671 0.008470675 0.004123522 0.9999556
Tr_velo_to_cam: 0.006927964 -0.9999722 -0.002757829 -0.02457729 -0.001162982 0.002749836 -0.9999955 -0.06127237 0.9999753 0.006931141 0.003111131 -0.3321029
Tr_imu_to_velo: 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""

# car 10 m ahead of the camera (z=10 in camera frame -> x~10 lidar)
LABEL_TXT = (
    "Car 0.00 0 -1.58 200.0 150.0 400.0 300.0 1.56 1.6 3.9 "
    "-2.0 1.7 10.0 -1.4\n"
    "Pedestrian 0.20 1 0.5 600.0 160.0 640.0 200.0 1.73 0.6 0.8 "
    "2.0 1.6 15.0 0.7\n"
    "DontCare -1 -1 -10 500 160 520 180 -1 -1 -1 -1000 -1000 -1000 -10\n"
)


def make_raw_kitti(root, ids=("000000", "000001")):
    rs = np.random.RandomState(0)
    sub = root / "training"
    for d in ("velodyne", "calib", "label_2", "image_2"):
        (sub / d).mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(exist_ok=True)
    (root / "ImageSets" / "train.txt").write_text("\n".join(ids[:1]))
    (root / "ImageSets" / "val.txt").write_text("\n".join(ids[1:]))
    from PIL import Image
    for idx in ids:
        (sub / "calib" / f"{idx}.txt").write_text(CALIB_TXT)
        (sub / "label_2" / f"{idx}.txt").write_text(LABEL_TXT)
        Image.new("RGB", (1242, 375)).save(sub / "image_2" / f"{idx}.png")
        # scatter points; add a dense cluster at the Car's lidar location
        pts = np.zeros((4000, 4), np.float32)
        pts[:, 0] = rs.rand(4000) * 30 + 1
        pts[:, 1] = rs.rand(4000) * 10 - 5
        pts[:, 2] = rs.rand(4000) * 0.5 - 1.5
        pts[:500, 0] = 10.0 + rs.randn(500) * 0.5
        pts[:500, 1] = 2.0 + rs.randn(500) * 0.3
        pts[:500, 2] = -0.8 + rs.randn(500) * 0.3
        pts[:, 3] = rs.rand(4000)
        pts.tofile(str(sub / "velodyne" / f"{idx}.bin"))


def test_parse_calib():
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write(CALIB_TXT)
        p = f.name
    c = parse_calib_file(p)
    os.unlink(p)
    assert c["P2"].shape == (4, 4) and c["P2"][3, 3] == 1.0
    assert c["R0_rect"].shape == (4, 4)
    assert abs(np.linalg.det(c["R0_rect"][:3, :3]) - 1.0) < 1e-3
    assert c["Tr_velo_to_cam"].shape == (4, 4)


def test_parse_label_and_difficulty(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text(LABEL_TXT)
    a = parse_label_file(p)
    assert list(a["name"]) == ["Car", "Pedestrian", "DontCare"]
    assert a["dimensions"].shape == (3, 3)
    # dimensions are [l, h, w] camera order (get_infos)
    np.testing.assert_allclose(a["dimensions"][0], [3.9, 1.56, 1.6])
    assert a["index"].tolist() == [0, 1, -1]
    # Car: height 151 px, trunc 0, occ 0 -> easy
    assert a["difficulty"][0] == 0
    # Pedestrian: 41 px, trunc 0.2, occ 1 -> moderate
    assert a["difficulty"][1] == 1
    assert _difficulty([0, 0, 0, 10], 0.9, 3) == -1


def test_get_infos_schema_and_lidar_boxes(tmp_path):
    make_raw_kitti(tmp_path)
    infos = get_infos(tmp_path, "train", ["000000"])
    assert len(infos) == 1
    info = infos[0]
    assert info["point_cloud"]["lidar_idx"] == "000000"
    assert tuple(info["image"]["image_shape"]) == (375, 1242)
    annos = info["annos"]
    gb = annos["gt_boxes_lidar"]
    assert gb.shape == (2, 7)          # DontCare excluded
    # camera z=10 -> lidar x ~ 10; camera x=-2 -> lidar y ~ +2
    assert abs(gb[0, 0] - 10.0) < 0.5
    assert abs(gb[0, 1] - 2.0) < 0.5
    # dims reorder to (l, w, h)
    np.testing.assert_allclose(gb[0, 3:6], [3.9, 1.6, 1.56], atol=1e-5)
    # the dense cluster sits inside the Car box
    assert annos["num_points_in_gt"][0] > 100
    assert annos["num_points_in_gt"][2] == -1   # DontCare

    # fov flag: points behind the camera are excluded
    pts = np.array([[10, 0, 0, 0], [-10, 0, 0, 0]], np.float32)
    fl = fov_flag(pts, info["image"]["image_shape"], info["calib"])
    assert fl[0] and not fl[1]


def test_full_pipeline_roundtrip(tmp_path):
    """create_kitti_infos -> KittiDataset loads them -> DataBaseSampler
    pastes from the generated gt database."""
    make_raw_kitti(tmp_path)
    create_kitti_infos(tmp_path, class_names=["Car", "Pedestrian"])
    for fn in ("kitti_infos_train.pkl", "kitti_infos_val.pkl",
               "kitti_infos_trainval.pkl", "kitti_dbinfos_train.pkl"):
        assert (tmp_path / fn).exists(), fn
    with open(tmp_path / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert "Car" in db and db["Car"][0]["num_points_in_gt"] > 100
    # db object points are centered on their box
    obj = np.fromfile(str(tmp_path / db["Car"][0]["path"]),
                      np.float32).reshape(-1, 4)
    assert np.abs(obj[:, :3]).max() < 4.0

    from cagroup3d_tpu.datasets import KittiDataset
    cfg = EasyDict(dict(
        DATASET="KittiDataset", DATA_PATH=str(tmp_path),
        POINT_CLOUD_RANGE=[0, -40, -3, 70.4, 40, 1],
        DATA_SPLIT={"train": "train", "test": "val"},
        INFO_PATH={"train": ["kitti_infos_train.pkl"],
                   "test": ["kitti_infos_val.pkl"]},
        FOV_POINTS_ONLY=True, POINT_CAP=8192, MAX_GT=32,
        DATA_AUGMENTOR=dict(
            DISABLE_AUG_LIST=["placeholder"],
            AUG_CONFIG_LIST=[dict(
                NAME="gt_sampling",
                DB_INFO_PATH=["kitti_dbinfos_train.pkl"],
                PREPARE=dict(filter_by_min_points=["Car:5"],
                             filter_by_difficulty=[-1]),
                SAMPLE_GROUPS=["Car:5"], NUM_POINT_FEATURES=4,
                REMOVE_EXTRA_WIDTH=[0.0, 0.0, 0.0],
                LIMIT_WHOLE_SCENE=True)]),
        DATA_PROCESSOR=[dict(NAME="shuffle_points",
                             SHUFFLE_ENABLED={"train": True,
                                              "test": False})]))
    np.random.seed(0)
    ds = KittiDataset(cfg, ["Car", "Pedestrian"], training=True)
    assert len(ds) == 1
    item = ds[0]
    assert item["points"].shape == (8192, 4)
    assert item["gt_valid"].sum() >= 2     # original + pasted
    ds_eval = KittiDataset(cfg, ["Car", "Pedestrian"], training=False)
    assert len(ds_eval) == 1
