"""Datasets, augmentor, collate, and the indoor mAP evaluator."""
import pickle
from pathlib import Path

import numpy as np
import pytest

from cagroup3d_tpu.config import EasyDict, cfg_from_yaml_file
from cagroup3d_tpu.datasets import build_dataloader
from cagroup3d_tpu.datasets.indoor_eval import (d3_box_overlap, indoor_eval,
                                                rotated_intersection_np)


def make_scannet_tree(tmp_path, n_scenes=3, n_points=2000, n_gt=4):
    rng = np.random.RandomState(0)
    root = tmp_path / "scannet"
    (root / "points").mkdir(parents=True)
    (root / "instance_mask").mkdir()
    (root / "semantic_mask").mkdir()
    infos = []
    for i in range(n_scenes):
        sid = f"scene{i:04d}_00"
        pts = np.concatenate([rng.rand(n_points, 3) * 5,
                              rng.rand(n_points, 3)], 1).astype(np.float32)
        pts.tofile(root / "points" / f"{sid}.bin")
        ins = rng.randint(0, 8, n_points).astype(np.int64)
        ins.tofile(root / "instance_mask" / f"{sid}.bin")
        sem = rng.choice([3, 4, 5, 39, 40], n_points).astype(np.int64)
        sem.tofile(root / "semantic_mask" / f"{sid}.bin")
        loc = rng.rand(n_gt, 3) * 4 + 0.5
        dims = rng.rand(n_gt, 3) + 0.3
        names = np.array(["chair", "table", "bed", "unknownthing"])[:n_gt]
        infos.append(dict(
            point_cloud=dict(lidar_idx=sid),
            annos=dict(
                gt_num=n_gt, name=names, location=loc, dimensions=dims,
                gt_boxes_upright_depth=np.concatenate(
                    [loc, dims, np.zeros((n_gt, 1))], 1).astype(np.float32),
                index=np.arange(n_gt),
                **{"class": np.array([2, 4, 1, 0])[:n_gt]},
                axis_align_matrix=np.eye(4, dtype=np.float32),
            )))
    for split in ("train", "val"):
        with open(root / f"scannet_infos_{split}.pkl", "wb") as f:
            pickle.dump(infos, f)
    return root


CLASS_NAMES = ['cabinet', 'bed', 'chair', 'sofa', 'table', 'door', 'window',
               'bookshelf', 'picture', 'counter', 'desk', 'curtain',
               'refrigerator', 'showercurtrain', 'toilet', 'sink', 'bathtub',
               'garbagebin']


def scannet_cfg(root):
    import yaml
    with open("tools/cfgs/dataset_configs/scannet_dataset.yaml") as f:
        c = EasyDict(yaml.safe_load(f))
    c.DATA_PATH = str(root)
    c.POINT_CAP = 4096
    c.MAX_GT = 16
    return c


class TestScannetDataset:
    def test_load_and_collate(self, tmp_path):
        root = make_scannet_tree(tmp_path)
        c = scannet_cfg(root)
        ds, loader, _ = build_dataloader(c, CLASS_NAMES, batch_size=2,
                                         training=True)
        assert len(ds) == 3 * 10  # REPEAT 10
        batches = list(iter(loader))
        assert len(batches) == len(loader)
        b = batches[0]
        assert b["points"].shape == (2, 4096, 6)
        assert b["gt_boxes"].shape == (2, 16, 8)
        assert b["semantic_mask"].shape == (2, 4096)
        # gt filtered to known classes: 'unknownthing' dropped
        nv = b["gt_valid"].sum(1)
        assert (nv <= 3).all() and (nv > 0).all()
        # semantic ids mapped to [0, 18]
        assert b["semantic_mask"].max() <= 18
        # class ids valid
        cls = b["gt_boxes"][..., 7][b["gt_valid"]]
        assert cls.min() >= 0 and cls.max() < 18

    def test_eval_mode_no_shuffle(self, tmp_path):
        root = make_scannet_tree(tmp_path)
        c = scannet_cfg(root)
        ds, loader, _ = build_dataloader(c, CLASS_NAMES, batch_size=1,
                                         training=False)
        assert len(ds) == 3  # REPEAT 1 at test time
        b = next(iter(loader))
        assert b["points_valid"][0].sum() > 0


class TestIndoorEval:
    def test_rotated_intersection_identity(self):
        a = np.array([[0, 0, 2.0, 3.0, 0.4]], np.float32)
        inter = rotated_intersection_np(a, a)
        np.testing.assert_allclose(inter, [[6.0]], rtol=1e-4)

    def test_d3_overlap_matches_engine(self):
        from cagroup3d_tpu.core import geometry
        import jax.numpy as jnp
        r = np.random.RandomState(0)
        a = np.concatenate([r.rand(6, 3) * 2, r.rand(6, 3) + 0.5,
                            r.rand(6, 1) - 0.5], 1).astype(np.float32)
        b = np.concatenate([r.rand(5, 3) * 2, r.rand(5, 3) + 0.5,
                            r.rand(5, 1) - 0.5], 1).astype(np.float32)
        got = d3_box_overlap(a, b)
        exp = np.asarray(geometry.pairwise(geometry.iou3d_rotated,
                                           jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, exp, atol=1e-3)

    def test_perfect_predictions_give_ap1(self):
        rng = np.random.RandomState(1)
        gt_annos, dt_annos = [], []
        for i in range(4):
            n = 3
            boxes = np.concatenate([rng.rand(n, 3) * 4,
                                    rng.rand(n, 3) + 0.5,
                                    np.zeros((n, 1))], 1).astype(np.float32)
            labels = np.array([0, 1, 2])
            gt_annos.append(dict(gt_num=n, gt_boxes_upright_depth=boxes,
                                 **{"class": labels}))
            dt_annos.append(dict(labels_3d=labels, boxes_3d=boxes,
                                 scores_3d=np.ones(n) * 0.9))
        label2cat = {i: f"c{i}" for i in range(3)}
        ret = indoor_eval(gt_annos, dt_annos, [0.25, 0.5], label2cat)
        assert ret["mAP_0.25"] == pytest.approx(1.0)
        assert ret["mAP_0.50"] == pytest.approx(1.0)
        assert ret["mAR_0.50"] == pytest.approx(1.0)

    def test_wrong_predictions_give_ap0(self):
        gt_annos = [dict(gt_num=1,
                         gt_boxes_upright_depth=np.array(
                             [[0, 0, 0, 1, 1, 1, 0]], np.float32),
                         **{"class": np.array([0])})]
        dt_annos = [dict(labels_3d=np.array([0]),
                         boxes_3d=np.array([[5, 5, 5, 1, 1, 1, 0]],
                                           np.float32),
                         scores_3d=np.array([0.9]))]
        ret = indoor_eval(gt_annos, dt_annos, [0.25], {0: "c0"})
        assert ret["mAP_0.25"] == pytest.approx(0.0)

    def test_report_is_reference_shaped_ascii_table(self, capsys):
        """Per-class AP/AR report structurally matches the reference's
        AsciiTable (scannet_object_eval_python/eval.py:296-331): grid
        borders, classes/AP/AR header, one row per class, Overall
        footing row behind its own border."""
        gt_annos = [dict(gt_num=2,
                         gt_boxes_upright_depth=np.array(
                             [[0, 0, 0, 1, 1, 1, 0],
                              [3, 3, 0, 1, 1, 1, 0]], np.float32),
                         **{"class": np.array([0, 1])})]
        dt_annos = [dict(labels_3d=np.array([0, 1]),
                         boxes_3d=np.array([[0, 0, 0, 1, 1, 1, 0],
                                            [3, 3, 0, 1, 1, 1, 0]],
                                           np.float32),
                         scores_3d=np.array([0.9, 0.8]))]
        indoor_eval(gt_annos, dt_annos, [0.25, 0.5],
                    {0: "chair", 1: "table"})
        out = capsys.readouterr().out
        lines = [ln for ln in out.splitlines() if ln.strip()]
        assert lines[0].startswith("+-") and lines[0].endswith("-+")
        assert lines[1].split("|")[1:6] == [
            " classes ", " AP_0.25 ", " AR_0.25 ", " AP_0.50 ", " AR_0.50 "]
        assert any("chair" in ln for ln in lines)
        assert any("table" in ln for ln in lines)
        # Overall row is the footing row: border line directly above it
        ov = next(i for i, ln in enumerate(lines) if "Overall" in ln)
        assert lines[ov - 1].startswith("+-")
        assert lines[ov + 1].startswith("+-")


def test_rank_sharded_eval_merge_matches_single_process():
    """Loader rank-sharding + merge_results_dist must reproduce the
    single-process scene order (reference DistributedSampler +
    common_utils.merge_results_dist)."""
    from cagroup3d_tpu.datasets import DataLoader
    from cagroup3d_tpu.utils import commu_utils

    class FakeDS:
        def __len__(self):
            return 11

        def __getitem__(self, i):
            return {"scene_id": i}

        def collate_batch(self, items):
            return {"scene_id": [it["scene_id"] for it in items]}

    ds = FakeDS()
    world = 2

    def run_rank(rank):
        loader = DataLoader(ds, batch_size=1, shuffle=False, seed=0,
                            rank=rank, world_size=world, drop_last=False)
        out = []
        for b in loader:
            out += list(b["scene_id"])
        return out

    shards = [run_rank(r) for r in range(world)]
    # monkeypatch the collective with the collected shards
    orig = commu_utils.all_gather
    commu_utils.all_gather = lambda data: shards
    try:
        merged = commu_utils.merge_results_dist(shards[0],
                                                total_size=len(ds))
    finally:
        commu_utils.all_gather = orig

    single = []
    loader = DataLoader(ds, batch_size=1, shuffle=False, seed=0,
                        rank=0, world_size=1, drop_last=False)
    for b in loader:
        single += list(b["scene_id"])
    assert merged == single
    assert len(merged) == len(ds)
