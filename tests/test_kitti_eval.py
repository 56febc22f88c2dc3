"""Official KITTI eval protocol (cagroup3d_tpu/datasets/kitti_eval.py):
C++ kernel vs python mirror, and end-to-end AP on hand-built cases
(reference pcdet/datasets/kitti/kitti_object_eval_python/eval.py)."""
import numpy as np
import pytest

from cagroup3d_tpu.datasets import kitti_eval as KE


def rand_frame(rs, n_gt, n_dt):
    def bboxes(n):
        x1 = rs.rand(n) * 1000
        y1 = rs.rand(n) * 300
        w = rs.rand(n) * 200 + 10
        h = rs.rand(n) * 120 + 20
        return np.stack([x1, y1, x1 + w, y1 + h], -1)
    names = ["Car", "Pedestrian", "Van", "DontCare"]
    gt = dict(
        name=np.asarray([names[rs.randint(4)] for _ in range(n_gt)]),
        truncated=rs.rand(n_gt) * 0.6,
        occluded=rs.randint(0, 4, n_gt),
        alpha=rs.rand(n_gt) * np.pi * 2 - np.pi,
        bbox=bboxes(n_gt),
        location=np.stack([rs.rand(n_gt) * 40 - 20,
                           rs.rand(n_gt) * 3 - 1,
                           rs.rand(n_gt) * 60 + 5], -1),
        dimensions=np.stack([rs.rand(n_gt) * 3 + 2, rs.rand(n_gt) + 1,
                             rs.rand(n_gt) + 1], -1),
        rotation_y=rs.rand(n_gt) * np.pi - np.pi / 2,
    )
    dt = dict(
        name=np.asarray([names[rs.randint(3)] for _ in range(n_dt)]),
        alpha=rs.rand(n_dt) * np.pi * 2 - np.pi,
        bbox=bboxes(n_dt),
        location=np.stack([rs.rand(n_dt) * 40 - 20,
                           rs.rand(n_dt) * 3 - 1,
                           rs.rand(n_dt) * 60 + 5], -1),
        dimensions=np.stack([rs.rand(n_dt) * 3 + 2, rs.rand(n_dt) + 1,
                             rs.rand(n_dt) + 1], -1),
        rotation_y=rs.rand(n_dt) * np.pi - np.pi / 2,
        score=rs.rand(n_dt),
    )
    return gt, dt


def test_native_kernel_matches_python_mirror():
    if KE._load_native() is None:
        pytest.skip("no native kernel (toolchain unavailable)")
    rs = np.random.RandomState(0)
    for metric in (0, 1, 2):
        frames = []
        for _ in range(12):
            gt, dt = rand_frame(rs, rs.randint(0, 8), rs.randint(0, 10))
            ov = KE._frame_overlaps([gt], [dt], metric)[0]
            nv, ig, idt, dc = KE.clean_data(gt, dt, 0, 1)
            frames.append(dict(
                overlaps=ov,
                gt_datas=np.concatenate([gt["bbox"],
                                         gt["alpha"][:, None]], 1),
                dt_datas=np.concatenate([dt["bbox"], dt["alpha"][:, None],
                                         dt["score"][:, None]], 1),
                ignored_gt=np.asarray(ig, np.int64),
                ignored_det=np.asarray(idt, np.int64),
                dc_bboxes=dc))
        thresholds = np.linspace(0.05, 0.95, 13)
        native = KE._stats_batch(frames, metric, 0.5, thresholds, True)
        # python path: force the fallback
        lib, KE._LIB = KE._LIB, None
        try:
            py = KE._stats_batch(frames, metric, 0.5, thresholds, True)
        finally:
            KE._LIB = lib
        np.testing.assert_allclose(native, py, rtol=1e-10, atol=1e-10)


def perfect_case(n_frames=15, n_obj=3):
    """Detections == ground truth (easy boxes) -> AP 100 everywhere.
    Needs >= 41 valid GT: with fewer, only num_gt of the 41 recall
    samples fill and AP quantizes to num_gt/41 (reference behavior)."""
    gt_annos, dt_annos = [], []
    rs = np.random.RandomState(1)
    for f in range(n_frames):
        loc = np.stack([rs.rand(n_obj) * 30 - 15,
                        np.full(n_obj, 1.6),
                        rs.rand(n_obj) * 40 + 10], -1)
        dims = np.tile(np.asarray([[3.9, 1.56, 1.6]]), (n_obj, 1))
        ry = rs.rand(n_obj) * np.pi - np.pi / 2
        bbox = np.stack([rs.rand(n_obj) * 900,
                         rs.rand(n_obj) * 200,
                         np.zeros(n_obj), np.zeros(n_obj)], -1)
        bbox[:, 2] = bbox[:, 0] + 120
        bbox[:, 3] = bbox[:, 1] + 90          # height 90 > easy's 40 px
        gt_annos.append(dict(
            name=np.asarray(["Car"] * n_obj),
            truncated=np.zeros(n_obj), occluded=np.zeros(n_obj),
            alpha=ry.copy(), bbox=bbox, location=loc, dimensions=dims,
            rotation_y=ry))
        dt_annos.append(dict(
            name=np.asarray(["Car"] * n_obj),
            alpha=ry.copy(), bbox=bbox.copy(), location=loc.copy(),
            dimensions=dims.copy(), rotation_y=ry.copy(),
            score=rs.rand(n_obj) * 0.5 + 0.5))
    return gt_annos, dt_annos


def test_perfect_detections_ap_100():
    gt, dt = perfect_case()
    result_str, ret = KE.get_official_eval_result(gt, dt, ["Car"])
    for k in ("Car_3d/easy_R40", "Car_3d/moderate_R40", "Car_3d/hard_R40",
              "Car_bev/easy_R40", "Car_image/easy_R40"):
        assert ret[k] > 99.0, (k, ret[k], result_str)
    assert "Car AP@0.70, 0.70, 0.70" in result_str
    assert "Car_aos/easy_R40" in ret          # alpha valid -> AOS computed
    assert ret["Car_aos/easy_R40"] > 99.0


def test_misses_and_fps_reduce_ap():
    gt, dt = perfect_case(n_frames=30, n_obj=4)
    # drop half the detections and add far-away false positives
    for d in dt:
        for k in ("name", "alpha", "bbox", "location", "dimensions",
                  "rotation_y", "score"):
            d[k] = d[k][:2]
        d["location"] = np.concatenate(
            [d["location"], [[500.0, 1.6, 500.0]]])
        d["bbox"] = np.concatenate([d["bbox"], [[0, 0, 100, 100]]])
        for k, v in (("name", "Car"), ("alpha", 0.0),
                     ("rotation_y", 0.0), ("score", 0.99)):
            d[k] = np.concatenate([d[k], [v]])
        d["dimensions"] = np.concatenate(
            [d["dimensions"], [[3.9, 1.56, 1.6]]])
    _, ret = KE.get_official_eval_result(gt, dt, ["Car"])
    assert 10.0 < ret["Car_3d/easy_R40"] < 60.0, ret["Car_3d/easy_R40"]


def test_difficulty_buckets():
    """A GT with a short image bbox is ignored for easy but counted for
    moderate/hard (MIN_HEIGHT 40/25/25)."""
    gt, dt = perfect_case(n_frames=45, n_obj=2)
    for f in range(45):
        gt[f]["bbox"][1, 3] = gt[f]["bbox"][1, 1] + 30  # height 30 px
        dt[f]["bbox"][1, 3] = dt[f]["bbox"][1, 1] + 30
        # drop the short object's detection: easy unaffected (that GT is
        # ignored there), moderate/hard miss it
        for k in ("name", "alpha", "bbox", "location", "dimensions",
                  "rotation_y", "score"):
            dt[f][k] = dt[f][k][:1]
    _, ret = KE.get_official_eval_result(gt, dt, ["Car"])
    assert ret["Car_3d/easy_R40"] > 99.0
    assert ret["Car_3d/moderate_R40"] < 60.0


def test_van_ignored_for_car():
    """Van GT neither penalizes nor rewards Car detections (clean_data
    valid_class==0 path)."""
    gt, dt = perfect_case(n_frames=45, n_obj=2)
    for g in gt:
        g["name"] = np.asarray(["Car", "Van"])
    _, ret = KE.get_official_eval_result(gt, dt, ["Car"])
    # detection on the Van box is absorbed (not a FP), Car still perfect
    assert ret["Car_3d/easy_R40"] > 99.0


def test_camera_lidar_roundtrip():
    from cagroup3d_tpu.datasets.kitti_dataset import (
        boxes_camera_to_lidar, boxes_lidar_to_camera)
    rs = np.random.RandomState(3)
    R0 = np.eye(3, dtype=np.float32)
    # a non-trivial rigid V2C (rotation about z + translation)
    a = 0.3
    V2C = np.asarray([[np.cos(a), -np.sin(a), 0, 0.2],
                      [np.sin(a), np.cos(a), 0, -0.1],
                      [0, 0, 1, 0.5]], np.float32)
    cam = np.concatenate(
        [rs.rand(10, 3) * 20, rs.rand(10, 3) * 2 + 1,
         rs.rand(10, 1) * np.pi - np.pi / 2], -1).astype(np.float32)
    lidar = boxes_camera_to_lidar(cam, R0, V2C)
    back = boxes_lidar_to_camera(lidar, R0, V2C)
    np.testing.assert_allclose(back[:, :6], cam[:, :6], atol=1e-4)
    # heading round-trips modulo 2pi
    d = (back[:, 6] - cam[:, 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(d, 0, atol=1e-4)
