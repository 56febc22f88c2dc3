"""KITTI dataset (reference pcdet/datasets/kitti/kitti_dataset.py +
utils/calibration_kitti.py, condensed to the train/eval path).

Loads pcdet-format kitti_infos_*.pkl (camera-frame annos + calib
matrices embedded per info), converts boxes to the lidar frame
(box_utils.boxes3d_kitti_camera_to_lidar), reads velodyne .bin points,
applies the outdoor augmentations, and pads to static caps.

Evaluation: a 3D-IoU AP over the lidar-frame boxes at the configured
RECALL thresholds via the area-AP machinery (indoor_eval).  The official
KITTI 40-point R11/R40 protocol with difficulty buckets
(kitti_object_eval_python, 1583 LoC numba) is a TODO — numbers here are
comparable across our runs, not against the leaderboard.
"""
from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List

import numpy as np

from .dataset import DatasetTemplate


def rect_to_lidar(pts_rect, R0, V2C):
    """calibration_kitti.Calibration.rect_to_lidar."""
    pts_hom = np.hstack([pts_rect, np.ones((len(pts_rect), 1),
                                           np.float32)])
    R0_ext = np.eye(4, dtype=np.float32)
    R0_ext[:3, :3] = R0
    V2C_ext = np.vstack([V2C, np.array([0, 0, 0, 1], np.float32)])
    return (pts_hom @ np.linalg.inv(R0_ext @ V2C_ext).T)[:, :3]


def boxes_camera_to_lidar(boxes_cam, R0, V2C):
    """box_utils.boxes3d_kitti_camera_to_lidar:92-108."""
    xyz, r = boxes_cam[:, 0:3], boxes_cam[:, 6:7]
    l, h, w = boxes_cam[:, 3:4], boxes_cam[:, 4:5], boxes_cam[:, 5:6]
    xyz_lidar = rect_to_lidar(xyz, R0, V2C)
    xyz_lidar[:, 2] += h[:, 0] / 2
    return np.concatenate([xyz_lidar, l, w, h, -(r + np.pi / 2)], axis=-1)


class KittiDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, root_path=None,
                 training=True, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.split = dataset_cfg.DATA_SPLIT["train" if training else
                                            "test"]
        root = Path(root_path or dataset_cfg.DATA_PATH)
        self.root_split = root / ("training" if self.split != "test"
                                  else "testing")
        self.infos: List[Dict] = []
        key = "train" if training else "test"
        for pkl in dataset_cfg.INFO_PATH.get(key, []):
            p = root / pkl
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if logger:
            logger.info(f"KITTI {self.split}: {len(self.infos)} samples")
        self.point_cap = int(dataset_cfg.get("POINT_CAP", 65536))
        self.max_gt = int(dataset_cfg.get("MAX_GT", 64))
        self.fov_only = bool(dataset_cfg.get("FOV_POINTS_ONLY", True))

    def __len__(self):
        return len(self.infos)

    def get_points(self, idx: str) -> np.ndarray:
        f = self.root_split / "velodyne" / f"{idx}.bin"
        return np.fromfile(f, np.float32).reshape(-1, 4)

    def __getitem__(self, index):
        info = self.infos[index]
        sample_idx = info["point_cloud"]["lidar_idx"]
        points = self.get_points(sample_idx)
        calib = info.get("calib", {})
        R0 = np.asarray(calib.get("R0_rect", np.eye(4)))[:3, :3]
        V2C = np.asarray(calib.get("Tr_velo_to_cam",
                                   np.eye(4)))[:3, :4]

        gt_boxes = np.zeros((0, 7), np.float32)
        gt_names = np.zeros((0,), dtype="<U16")
        annos = info.get("annos")
        if annos is not None:
            mask = annos["name"] != "DontCare"
            if "gt_boxes_lidar" in annos:
                gt_boxes = annos["gt_boxes_lidar"][mask].astype(np.float32)
            else:
                loc = annos["location"][mask]
                dims = annos["dimensions"][mask]   # l, h, w
                rots = annos["rotation_y"][mask]
                cam = np.concatenate(
                    [loc, dims, rots[..., None]], axis=1).astype(np.float32)
                gt_boxes = boxes_camera_to_lidar(cam, R0, V2C)
            gt_names = annos["name"][mask]

        data_dict = dict(points=points, gt_boxes=gt_boxes,
                         gt_names=gt_names, frame_id=sample_idx)
        return self.prepare_outdoor_data(data_dict)

    def prepare_outdoor_data(self, data_dict):
        """Range mask + class filter + pad (augmentation hooks TODO:
        gt_sampling needs the db pkl)."""
        pts = data_dict["points"]
        rng = np.asarray(self.dataset_cfg.POINT_CLOUD_RANGE)
        keep = np.all((pts[:, :3] >= rng[:3]) & (pts[:, :3] < rng[3:6]),
                      axis=1)
        pts = pts[keep]
        boxes = data_dict["gt_boxes"]
        names = data_dict["gt_names"]
        cls_mask = np.isin(names, self.class_names)
        boxes, names = boxes[cls_mask], names[cls_mask]
        labels = np.asarray([self.class_names.index(n) for n in names],
                            np.int32) if len(names) else \
            np.zeros((0,), np.int32)

        P, G = self.point_cap, self.max_gt
        out_pts = np.zeros((P, pts.shape[1]), np.float32)
        out_val = np.zeros((P,), bool)
        n = min(len(pts), P)
        sel = np.random.choice(len(pts), n, replace=False) \
            if len(pts) > P else np.arange(len(pts))
        out_pts[:n] = pts[sel][:n]
        out_val[:n] = True
        gb = np.zeros((G, 8), np.float32)
        gv = np.zeros((G,), bool)
        m = min(len(boxes), G)
        gb[:m, :7] = boxes[:m, :7]
        gb[:m, 7] = labels[:m]
        gv[:m] = True
        return dict(points=out_pts, points_valid=out_val, gt_boxes=gb,
                    gt_valid=gv, frame_id=data_dict["frame_id"])

    # ------------------------------------------------------------------
    def generate_prediction_dicts(self, batch_dict, pred_dicts,
                                  class_names, output_path=None):
        annos = []
        for i, pd in enumerate(pred_dicts):
            annos.append(dict(
                frame_id=np.asarray(batch_dict["frame_id"])[i]
                if "frame_id" in batch_dict else i,
                boxes_lidar=np.asarray(pd["pred_boxes"]),
                score=np.asarray(pd["pred_scores"]),
                pred_labels=np.asarray(pd["pred_labels"]),
                name=np.asarray([class_names[int(l)]
                                 for l in pd["pred_labels"]]),
            ))
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """3D-IoU area-AP per class at [0.7, 0.5, 0.5]-style thresholds
        (see module docstring for the caveat vs the official protocol)."""
        from .indoor_eval import indoor_eval
        gt_annos, dt_annos = [], []
        for i, det in enumerate(det_annos):
            info = self.infos[i]
            annos = info.get("annos", {})
            mask = annos.get("name", np.zeros(0)) != "DontCare" \
                if "name" in annos else np.zeros(0, bool)
            boxes = annos.get("gt_boxes_lidar",
                              np.zeros((0, 7)))[mask] \
                if "gt_boxes_lidar" in annos else np.zeros((0, 7))
            names = annos.get("name", np.zeros(0, dtype="<U16"))[mask] \
                if "name" in annos else []
            labs = np.asarray([class_names.index(n) for n in names
                               if n in class_names], np.int64)
            keep = np.asarray([n in class_names for n in names], bool)
            gt_annos.append({
                "gt_num": int(keep.sum()),
                "gt_boxes_upright_depth": np.asarray(boxes)[keep][:, :7]
                if len(boxes) else np.zeros((0, 7)),
                "class": labs})
            dt_annos.append(dict(boxes_3d=det["boxes_lidar"][:, :7],
                                 scores_3d=det["score"],
                                 labels_3d=det["pred_labels"]))
        label2cat = {i: n for i, n in enumerate(class_names)}
        ret = indoor_eval(gt_annos, dt_annos, [0.5, 0.7], label2cat)
        return ret, ""
