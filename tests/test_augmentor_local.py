"""Local (per-object) augmentations + frustum dropouts + SE-SSD pyramid
aug + the sample_points processor (reference augmentor_utils.py:146-704,
data_processor.py:145-175).  Used by pointpillar_newaugs /
pointpillar_pyramid_aug / pointrcnn_iou configs."""
import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.datasets.augmentor import (
    boxes_to_pyramids, get_points_in_box_mask, global_frustum_dropout,
    local_frustum_dropout, local_pyramid_dropout, local_pyramid_sparsify,
    local_pyramid_swap, local_rotation, local_scaling,
    points_in_pyramids_mask, random_local_translation)
from cagroup3d_tpu.datasets.dataset import (parse_sample_points,
                                            sample_points_depth_split)


def _scene(n_out=200, seed=0):
    """Two disjoint boxes + background points."""
    rng = np.random.RandomState(seed)
    boxes = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.3],
                      [10.0, 0.0, 0.0, 2.0, 2.0, 2.0, -0.2]], np.float32)
    in_a = rng.uniform(-0.8, 0.8, (50, 3)) + boxes[0, :3]
    in_b = rng.uniform(-0.8, 0.8, (60, 3)) + boxes[1, :3]
    bg = rng.uniform(-20, 30, (n_out, 3))
    bg = bg[~(get_points_in_box_mask(bg, boxes[0]) |
              get_points_in_box_mask(bg, boxes[1]))]
    pts = np.concatenate([in_a, in_b, bg]).astype(np.float32)
    inten = rng.rand(len(pts), 1).astype(np.float32)
    return boxes, np.concatenate([pts, inten], axis=1), len(in_a), len(in_b)


def test_points_in_box_mask_margin():
    box = np.array([0, 0, 0, 2.0, 2.0, 2.0, 0.0], np.float32)
    pts = np.array([[1.05, 0, 0], [1.15, 0, 0], [0, 0, 1.05]], np.float32)
    m = get_points_in_box_mask(pts, box)
    assert m[0] and not m[1]          # 0.1 xy margin
    assert not m[2]                   # no z margin


def test_local_translation_moves_only_members():
    np.random.seed(0)
    boxes, pts, na, nb = _scene()
    before = pts.copy()
    b2, p2 = random_local_translation(boxes.copy(), pts.copy(),
                                      [0.5, 1.0], ["x"])
    # background untouched
    np.testing.assert_array_equal(p2[na + nb:], before[na + nb:])
    # members moved with their box (x only)
    off_a = b2[0, 0] - boxes[0, 0]
    assert 0.5 <= off_a <= 1.0
    np.testing.assert_allclose(p2[:na, 0] - before[:na, 0], off_a,
                               rtol=1e-6)
    np.testing.assert_array_equal(p2[:na, 1:3], before[:na, 1:3])


def test_local_rotation_about_center():
    np.random.seed(1)
    boxes, pts, na, nb = _scene()
    before = pts.copy()
    b2, p2 = local_rotation(boxes.copy(), pts.copy(), [0.3, 0.3])
    assert b2[0, 6] == pytest.approx(boxes[0, 6] + 0.3)
    # member radii about the box center preserved
    r0 = np.linalg.norm(before[:na, :3] - boxes[0, :3], axis=1)
    r1 = np.linalg.norm(p2[:na, :3] - b2[0, :3], axis=1)
    np.testing.assert_allclose(r0, r1, rtol=1e-5)
    np.testing.assert_array_equal(p2[na + nb:], before[na + nb:])


def test_local_scaling_scales_dims_and_members():
    np.random.seed(2)
    boxes, pts, na, nb = _scene()
    before = pts.copy()
    b2, p2 = local_scaling(boxes.copy(), pts.copy(), [1.1, 1.3])
    s = b2[0, 3] / boxes[0, 3]
    assert 1.1 <= s <= 1.3
    np.testing.assert_allclose(b2[0, 3:6], boxes[0, 3:6] * s, rtol=1e-6)
    d0 = before[:na, :3] - boxes[0, :3]
    d1 = p2[:na, :3] - b2[0, :3]
    np.testing.assert_allclose(d1, d0 * s, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(p2[na + nb:], before[na + nb:])


def test_global_frustum_dropout_top():
    np.random.seed(3)
    boxes = np.array([[0, 0, 5.0, 1, 1, 1, 0],
                      [0, 0, -5.0, 1, 1, 1, 0]], np.float32)
    pts = np.stack([np.zeros(100), np.zeros(100),
                    np.linspace(-10, 10, 100)], axis=1).astype(np.float32)
    b2, p2, keep = global_frustum_dropout(boxes, pts, [0.3, 0.3], "top")
    thr = 10 - 0.3 * 20
    assert (p2[:, 2] < thr).all() and len(p2) < 100
    assert len(b2) == 1 and b2[0, 2] == -5.0
    assert keep.tolist() == [False, True]


def test_local_frustum_dropout_removes_member_slab():
    np.random.seed(4)
    boxes, pts, na, nb = _scene()
    n_before = len(pts)
    b2, p2 = local_frustum_dropout(boxes.copy(), pts.copy(),
                                   [0.4, 0.4], "top")
    assert len(p2) < n_before
    # every surviving member of box 0 is below the cut
    m = get_points_in_box_mask(p2, boxes[0])
    thr = boxes[0, 2] + boxes[0, 5] / 2 - 0.4 * boxes[0, 5]
    assert (p2[m, 2] < thr).all()


def test_pyramids_partition_box_points():
    """The six face pyramids tile the box: every inside point lies in
    >= 1 pyramid, points far outside in none."""
    boxes = np.array([[0, 0, 0, 2.0, 3.0, 1.5, 0.4]], np.float32)
    rng = np.random.RandomState(0)
    inside = rng.uniform(-0.45, 0.45, (200, 3)) * boxes[0, 3:6]
    c, s = np.cos(0.4), np.sin(0.4)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    inside = inside @ rot.T
    outside = rng.uniform(5, 10, (50, 3))
    pyr = boxes_to_pyramids(boxes)
    m_in = points_in_pyramids_mask(inside, pyr)
    m_out = points_in_pyramids_mask(outside, pyr)
    assert m_in.any(axis=1).all()
    assert not m_out.any()


def test_pyramid_dropout_drops_one_face():
    np.random.seed(5)
    boxes, pts, na, nb = _scene()
    n0 = len(pts)
    _, p2, pyr = local_pyramid_dropout(boxes.copy(), pts.copy(),
                                       dropout_prob=1.0)
    assert len(p2) < n0                      # some member points dropped
    assert len(pyr) == 0                     # all boxes consumed
    # background survives
    assert len(p2) >= n0 - na - nb


def test_pyramid_sparsify_caps_points():
    np.random.seed(6)
    boxes, pts, na, nb = _scene()
    _, p2, _ = local_pyramid_sparsify(boxes.copy(), pts.copy(),
                                      prob=1.0, max_num_pts=3)
    assert len(p2) < len(pts)


def test_pyramid_swap_preserves_count_and_containment():
    np.random.seed(7)
    boxes, pts, na, nb = _scene()
    _, p2 = local_pyramid_swap(boxes.copy(), pts.copy(), prob=1.0,
                               max_num_pts=1)
    assert len(p2) == len(pts)               # swap moves, never drops
    # intensities stay in [0, 1] after min-max remap
    assert p2[:, 3].min() >= -1e-6 and p2[:, 3].max() <= 1 + 1e-6


def test_sample_points_keeps_far_points():
    rs = np.random.RandomState(0)
    near = rs.uniform(-5, 5, (1000, 3))
    far = rs.uniform(50, 60, (20, 3))
    pts = np.concatenate([near, far]).astype(np.float32)
    out = sample_points_depth_split(pts, 100, np.random.RandomState(1))
    assert len(out) == 100
    d = np.linalg.norm(out[:, :3], axis=1)
    assert (d >= 40).sum() == 20             # all far points kept


def test_sample_points_upsamples_with_duplicates():
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    out = sample_points_depth_split(pts, 16, np.random.RandomState(0))
    assert len(out) == 16


def test_parse_sample_points():
    cfg = EasyDict(dict(DATA_PROCESSOR=[
        dict(NAME="sample_points",
             NUM_POINTS={"train": 16384, "test": -1})]))
    assert parse_sample_points(cfg, "train") == 16384
    assert parse_sample_points(cfg, "test") is None
    assert parse_sample_points(EasyDict(dict()), "train") is None


def test_augmentor_pipeline_dispatch():
    """DataAugmentor resolves every new stage name from a config list
    (the pointpillar_newaugs AUG_CONFIG_LIST surface)."""
    from cagroup3d_tpu.datasets.augmentor import DataAugmentor
    np.random.seed(8)
    aug_cfg = EasyDict(dict(AUG_CONFIG_LIST=[
        dict(NAME="random_local_rotation",
             LOCAL_ROT_ANGLE=[-0.15, 0.15]),
        dict(NAME="random_local_scaling",
             LOCAL_SCALE_RANGE=[0.95, 1.05]),
        dict(NAME="random_local_translation",
             LOCAL_TRANSLATION_RANGE=[-0.1, 0.1],
             ALONG_AXIS_LIST=["x", "y"]),
        dict(NAME="random_world_frustum_dropout",
             INTENSITY_RANGE=[0.0, 0.05], DIRECTION=["top", "bottom"]),
        dict(NAME="random_local_frustum_dropout",
             INTENSITY_RANGE=[0.0, 0.1], DIRECTION=["top"]),
        dict(NAME="random_local_pyramid_aug", DROP_PROB=0.25,
             SPARSIFY_PROB=0.05, SPARSIFY_MAX_NUM=50, SWAP_PROB=0.1,
             SWAP_MAX_NUM=50),
    ]))
    aug = DataAugmentor("/tmp", aug_cfg, ["Car"], logger=None)
    boxes, pts, _, _ = _scene()
    dd = dict(points=pts, gt_boxes=boxes,
              gt_names=np.array(["Car", "Car"]),
              gt_boxes_mask=np.array([True, True]))
    out = aug.forward(dd)
    assert out["points"].shape[1] == 4
    assert len(out["gt_boxes"]) == len(out["gt_names"])
