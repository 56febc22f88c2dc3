"""nuScenes dataset (reference pcdet/datasets/nuscenes/
nuscenes_dataset.py, condensed to the train/eval path).

Loads pcdet-format nuscenes_infos_*sweeps_*.pkl (lidar-frame 9-DoF
gt_boxes with velocity + per-sweep transform matrices), accumulates
multi-sweep point clouds with per-point time lag as the 5th feature,
applies CBGS class-balanced resampling for training
(nuscenes_dataset.py:39-74), runs the outdoor augmentor (gt-sampling +
world transforms), and pads everything to static caps.

Evaluation: the reference shells out to the external `nuscenes` devkit
(nuscenes_dataset.py:198-252); here the official center-distance
mAP/NDS protocol is computed natively (see nuscenes_eval.py).
"""
from __future__ import annotations

import pickle
import zlib
from pathlib import Path
from typing import Dict, List

import numpy as np

from .dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, root_path=None,
                 training=True, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        root = Path(root_path or dataset_cfg.DATA_PATH)
        version = dataset_cfg.get("VERSION", "")
        self.root_path = root / version if version and \
            (root / version).exists() else root
        self.max_sweeps = int(dataset_cfg.get("MAX_SWEEPS", 1))
        self.pred_velocity = bool(dataset_cfg.get("PRED_VELOCITY", False))
        self.box_dim = 9 if self.pred_velocity else 7
        self.point_cap = int(dataset_cfg.get("POINT_CAP", 65536))
        self.max_gt = int(dataset_cfg.get("MAX_GT", 128))

        self.infos: List[Dict] = []
        key = "train" if training else "test"
        for pkl in dataset_cfg.get("INFO_PATH", {}).get(key, []):
            p = self.root_path / pkl
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if training and dataset_cfg.get("BALANCED_RESAMPLING", False):
            self.infos = self.balanced_infos_resampling(self.infos)
        if logger:
            logger.info(f"nuScenes: {len(self.infos)} samples")

        aug_cfg = dataset_cfg.get("DATA_AUGMENTOR", None)
        self.augmentor = None
        if training and aug_cfg is not None:
            from .augmentor import DataAugmentor
            self.augmentor = DataAugmentor(self.root_path, aug_cfg,
                                           class_names, logger=logger)
        from .dataset import parse_sample_points
        self.sample_num_points = parse_sample_points(
            dataset_cfg, self.mode)
        self.shuffle_points = False
        for proc in dataset_cfg.get("DATA_PROCESSOR", []):
            if proc.get("NAME") == "shuffle_points":
                self.shuffle_points = bool(dict(proc.get(
                    "SHUFFLE_ENABLED", {})).get(self.mode, False))

    def __len__(self):
        return len(self.infos)

    # ------------------------------------------------------------------
    def balanced_infos_resampling(self, infos):
        """CBGS resampling (nuscenes_dataset.py:39-74): duplicate scenes
        so each class contributes ~1/num_classes of the samples."""
        if not self.class_names or not infos:
            return infos
        cls_infos = {n: [] for n in self.class_names}
        for info in infos:
            for name in set(np.asarray(info["gt_names"]).tolist()):
                if name in cls_infos:
                    cls_infos[name].append(info)
        dup = sum(len(v) for v in cls_infos.values())
        if dup == 0:
            return infos
        frac = 1.0 / len(self.class_names)
        out = []
        rs = np.random.RandomState(0)
        for name, ci in cls_infos.items():
            if not ci:
                continue
            ratio = frac / (len(ci) / dup)
            pick = rs.choice(len(ci), int(len(ci) * ratio))
            out += [ci[i] for i in pick]
        return out or infos

    # ------------------------------------------------------------------
    def get_lidar_with_sweeps(self, index: int, rs) -> np.ndarray:
        """[:, 5] x y z intensity time_lag (nuscenes_dataset.py:76-109)."""
        info = self.infos[index]
        f = self.root_path / info["lidar_path"]
        pts = np.fromfile(str(f), np.float32).reshape(-1, 5)[:, :4]
        out = [np.concatenate(
            [pts, np.zeros((len(pts), 1), np.float32)], axis=1)]
        sweeps = info.get("sweeps", [])
        n_extra = min(self.max_sweeps - 1, len(sweeps))
        if n_extra > 0:
            for k in rs.choice(len(sweeps), n_extra, replace=False):
                sw = sweeps[k]
                sf = self.root_path / sw["lidar_path"]
                if not sf.exists():
                    continue
                sp = np.fromfile(str(sf), np.float32).reshape(-1, 5)[:, :4]
                # remove ego points (within 1 m of the sweep sensor)
                keep = ~((np.abs(sp[:, 0]) < 1.0) &
                         (np.abs(sp[:, 1]) < 1.0))
                sp = sp[keep]
                T = sw.get("transform_matrix", None)
                if T is not None:
                    hom = np.hstack([sp[:, :3],
                                     np.ones((len(sp), 1), np.float32)])
                    sp[:, :3] = (hom @ np.asarray(T, np.float32).T)[:, :3]
                lag = float(sw.get("time_lag", 0.0))
                out.append(np.concatenate(
                    [sp, np.full((len(sp), 1), lag, np.float32)], axis=1))
        return np.concatenate(out, axis=0)

    # ------------------------------------------------------------------
    def __getitem__(self, index):
        info = self.infos[index]
        frame_id = Path(info["lidar_path"]).stem
        rs = np.random.RandomState(
            zlib.crc32(frame_id.encode()) & 0x7FFFFFFF)
        points = self.get_lidar_with_sweeps(index, rs)

        gt_boxes = np.zeros((0, self.box_dim), np.float32)
        gt_names = np.zeros((0,), dtype="<U32")
        if "gt_boxes" in info:
            gb = np.asarray(info["gt_boxes"], np.float32)
            gn = np.asarray(info["gt_names"])
            if self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT", 0) and \
                    "num_lidar_pts" in info:
                m = np.asarray(info["num_lidar_pts"]) >= int(
                    self.dataset_cfg.FILTER_MIN_POINTS_IN_GT)
                gb, gn = gb[m], gn[m]
            if self.dataset_cfg.get("SET_NAN_VELOCITY_TO_ZEROS", False):
                gb = np.nan_to_num(gb, nan=0.0)
            if gb.shape[1] > self.box_dim:
                gb = gb[:, :self.box_dim]
            elif gb.shape[1] < self.box_dim:
                gb = np.concatenate(
                    [gb, np.zeros((len(gb), self.box_dim - gb.shape[1]),
                                  np.float32)], axis=1)
            gt_boxes, gt_names = gb, gn

        data_dict = dict(points=points, gt_boxes=gt_boxes,
                         gt_names=gt_names, frame_id=frame_id)
        return self._prepare(data_dict, rs)

    def _prepare(self, data_dict, rs):
        """Augment (train) + range mask + class filter + pad (shared
        outdoor prep with velocity-wide boxes)."""
        from .dataset import prepare_outdoor_sample
        return prepare_outdoor_sample(
            data_dict, rs, augmentor=self.augmentor,
            shuffle_points=self.shuffle_points,
            class_names=self.class_names,
            pc_range=self.dataset_cfg.POINT_CLOUD_RANGE,
            point_cap=self.point_cap, max_gt=self.max_gt,
            box_dim=self.box_dim,
            sample_num_points=self.sample_num_points)

    def collate_batch(self, batch_list, n_classes=None):
        out = {}
        for k in batch_list[0]:
            if k == "frame_id":
                out[k] = [d[k] for d in batch_list]
            else:
                out[k] = np.stack([d[k] for d in batch_list])
        return out

    # ------------------------------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts,
                                  class_names, output_path=None):
        """pcdet prediction annos (nuscenes_dataset.py:153-196)."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            frame_id = np.asarray(batch_dict["frame_id"])[i] \
                if "frame_id" in batch_dict else i
            boxes = np.asarray(pd["pred_boxes"], np.float32)
            labels = np.asarray(pd["pred_labels"])
            annos.append(dict(
                frame_id=frame_id,
                boxes_lidar=boxes,
                score=np.asarray(pd["pred_scores"], np.float32),
                pred_labels=labels,
                name=np.asarray([class_names[int(l)] for l in labels])))
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Native nuScenes protocol over the infos' GT."""
        from .nuscenes_eval import nuscenes_eval
        gts, dets = [], []
        for i, det in enumerate(det_annos):
            info = self.infos[i]
            gb = np.asarray(info.get("gt_boxes", np.zeros((0, 9))),
                            np.float32)
            gn = np.asarray(info.get("gt_names", np.zeros(0, "<U32")))
            gts.append(dict(boxes=np.nan_to_num(gb, nan=0.0), names=gn))
            dets.append(dict(boxes=det["boxes_lidar"],
                             names=det["name"],
                             scores=det["score"]))
        result_dict, result_str = nuscenes_eval(gts, dets, class_names)
        return result_dict, result_str
