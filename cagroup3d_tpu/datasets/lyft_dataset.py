"""Lyft Level-5 dataset (reference pcdet/datasets/lyft/lyft_dataset.py,
condensed to the train/eval path).

Loads pcdet-format lyft_infos_*.pkl under `<root>/<VERSION>` (7-DoF
lidar-frame gt_boxes; velocity is stored separately and unused by the
shipped configs), accumulates multi-sweep clouds with per-point time
lag as the 5th feature (lyft packs 5 floats per point; the trailing
ring index is dropped, lyft_dataset.py:42-79), removes ego points
(|x| < 1.5, |y| < 1.0), and pads to static caps.

Evaluation (lyft_dataset.py:183-205): `eval_metric: kitti` uses the
fake-camera KITTI bridge; `eval_metric: lyft` computes the Lyft
competition metric natively — per-class VOC-area AP averaged over the
3D-IoU threshold sweep EVAL_LYFT_IOU_LIST ([0.5 .. 0.95], the COCO
style mAP the lyft devkit's mAP_evaluation implements) on the engine's
exact rotated 3D IoU, with no lyft_dataset_sdk dependency.
"""
from __future__ import annotations

import pickle
import zlib
from pathlib import Path
from typing import Dict, List, Sequence

import numpy as np

from .dataset import DatasetTemplate, prepare_outdoor_sample
from .indoor_eval import d3_box_overlap


def lyft_map_eval(gts: List[Dict], dets: List[Dict],
                  class_names: Sequence[str],
                  iou_thresholds: Sequence[float]):
    """Native lyft devkit metric (lyft_mAP_eval/lyft_eval.py:
    get_average_precisions): per class, greedy score-ordered matching
    at each 3D-IoU threshold, VOC-area AP, averaged over thresholds.
    gts[i]: boxes [N, 7] + names; dets[i]: boxes/names/scores."""
    aps = np.zeros((len(class_names), len(iou_thresholds)))
    for ci, cls in enumerate(class_names):
        scores, ious_per_det, n_gt = [], [], 0
        # gather per-frame det->gt IoU rows once; threshold sweep reuses
        for gt, det in zip(gts, dets):
            gm = np.asarray(gt["names"]) == cls
            dm = np.asarray(det["names"]) == cls
            gb = np.asarray(gt["boxes"], np.float32)[gm]
            db = np.asarray(det["boxes"], np.float32)[dm]
            ds = np.asarray(det["scores"], np.float32)[dm]
            n_gt += len(gb)
            if len(db) == 0:
                continue
            iou = d3_box_overlap(db[:, :7], gb[:, :7]) if len(gb) \
                else np.zeros((len(db), 0), np.float32)
            scores.append(ds)
            ious_per_det.append(iou)
        if n_gt == 0:
            continue
        for ti, thr in enumerate(iou_thresholds):
            tps = []
            for ds, iou in zip(scores, ious_per_det):
                taken = np.zeros(iou.shape[1], bool)
                tp = np.zeros(len(ds), np.float32)
                for i in np.argsort(-ds, kind="stable"):
                    row = np.where(taken, -1.0, iou[i]) if iou.shape[1] \
                        else np.zeros(0)
                    if row.size and row.max() >= thr:
                        tp[i] = 1.0
                        taken[int(np.argmax(row))] = True
                tps.append(tp)
            if not tps:
                continue
            allscores = np.concatenate(scores)
            alltp = np.concatenate(tps)
            order = np.argsort(-allscores, kind="stable")
            tp_cum = np.cumsum(alltp[order])
            recall = tp_cum / n_gt
            precision = tp_cum / np.arange(1, len(tp_cum) + 1)
            precision = np.maximum.accumulate(precision[::-1])[::-1]
            r_prev = np.concatenate([[0.0], recall[:-1]])
            aps[ci, ti] = float(np.sum((recall - r_prev) * precision))
    return aps


class LyftDataset(DatasetTemplate):
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
        self.iou_list = list(dataset_cfg.get(
            "EVAL_LYFT_IOU_LIST", [0.5, 0.55, 0.6, 0.65, 0.7, 0.75,
                                   0.8, 0.85, 0.9, 0.95]))

        self.infos: List[Dict] = []
        key = "train" if training else "test"
        for pkl in dataset_cfg.get("INFO_PATH", {}).get(key, []):
            p = self.root_path / pkl
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if logger:
            logger.info(f"Lyft: {len(self.infos)} samples")

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
    @staticmethod
    def _read_packed(path: Path) -> np.ndarray:
        """Lyft bins pack 5 floats/point; trim ragged tails
        (lyft_dataset.py:44-49)."""
        pts = np.fromfile(str(path), np.float32)
        pts = pts[: len(pts) - len(pts) % 5]
        return pts.reshape(-1, 5)[:, :4]

    @staticmethod
    def remove_ego_points(points, center_radius=1.0):
        mask = ~((np.abs(points[:, 0]) < center_radius * 1.5) &
                 (np.abs(points[:, 1]) < center_radius))
        return points[mask]

    def get_lidar_with_sweeps(self, index: int, rs) -> np.ndarray:
        """[:, 5] x y z intensity time_lag (lyft_dataset.py:58-79)."""
        info = self.infos[index]
        pts = self._read_packed(self.root_path / info["lidar_path"])
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
                sp = self.remove_ego_points(self._read_packed(sf))
                T = sw.get("transform_matrix", None)
                if T is not None:
                    hom = np.hstack([sp[:, :3],
                                     np.ones((len(sp), 1), np.float32)])
                    sp[:, :3] = (hom @ np.asarray(T, np.float32).T)[:, :3]
                lag = float(sw.get("time_lag", 0.0))
                out.append(np.concatenate(
                    [sp, np.full((len(sp), 1), lag, np.float32)],
                    axis=1))
        return np.concatenate(out, axis=0)

    # ------------------------------------------------------------------
    def __getitem__(self, index):
        info = self.infos[index]
        frame_id = Path(info["lidar_path"]).stem
        rs = np.random.RandomState(
            zlib.crc32(frame_id.encode()) & 0x7FFFFFFF)
        points = self.get_lidar_with_sweeps(index, rs)

        gt_boxes = np.zeros((0, 7), np.float32)
        gt_names = np.zeros((0,), dtype="<U32")
        if "gt_boxes" in info:
            gt_boxes = np.asarray(info["gt_boxes"], np.float32)[:, :7]
            gt_names = np.asarray(info["gt_names"])
            min_pts = int(self.dataset_cfg.get("FILTER_MIN_POINTS_IN_GT",
                                               0))
            if min_pts and "num_lidar_pts" in info:
                m = np.asarray(info["num_lidar_pts"]) >= min_pts
                gt_boxes, gt_names = gt_boxes[m], gt_names[m]

        return prepare_outdoor_sample(
            dict(points=points, gt_boxes=gt_boxes, gt_names=gt_names,
                 frame_id=frame_id),
            rs, augmentor=self.augmentor,
            shuffle_points=self.shuffle_points,
            class_names=self.class_names,
            pc_range=self.dataset_cfg.POINT_CLOUD_RANGE,
            point_cap=self.point_cap, max_gt=self.max_gt,
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
        """pcdet prediction annos (lyft_dataset.py:110-152)."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            frame_id = np.asarray(batch_dict["frame_id"])[i] \
                if "frame_id" in batch_dict else i
            labels = np.asarray(pd["pred_labels"])
            annos.append(dict(
                frame_id=frame_id,
                boxes_lidar=np.asarray(pd["pred_boxes"], np.float32),
                score=np.asarray(pd["pred_scores"], np.float32),
                pred_labels=labels,
                name=np.asarray([class_names[int(l)] for l in labels])))
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """lyft_dataset.py:183-205: kitti bridge or native Lyft mAP."""
        if not self.infos or "gt_boxes" not in self.infos[0]:
            return {}, "No ground-truth boxes for evaluation"
        metric = kwargs.get("eval_metric", "lyft")
        if metric == "kitti":
            import copy
            from .kitti_eval import get_official_eval_result
            from .waymo_dataset import transform_lidar_annos_to_kitti
            m = {"car": "Car", "pedestrian": "Pedestrian",
                 "truck": "Truck", "bicycle": "Cyclist",
                 "motorcycle": "Cyclist"}
            eval_det = copy.deepcopy(det_annos)
            eval_gt = [dict(gt_names=np.asarray(i["gt_names"]).copy(),
                            gt_boxes_lidar=np.asarray(
                                i["gt_boxes"], np.float64)[:, :7])
                       for i in self.infos]
            transform_lidar_annos_to_kitti(eval_det, m)
            transform_lidar_annos_to_kitti(eval_gt, m)
            result_str, result_dict = get_official_eval_result(
                eval_gt, eval_det,
                sorted({m[c] for c in class_names if c in m}))
            return result_dict, result_str
        gts = [dict(boxes=np.asarray(i["gt_boxes"], np.float32)[:, :7],
                    names=np.asarray(i["gt_names"]))
               for i in self.infos]
        dets = [dict(boxes=d["boxes_lidar"][:, :7], names=d["name"],
                     scores=d["score"]) for d in det_annos]
        aps = lyft_map_eval(gts, dets, class_names, self.iou_list)
        result = {f"AP_{c}": float(aps[i].mean())
                  for i, c in enumerate(class_names)}
        result["mAP"] = float(aps.mean())
        lines = [f"{c}: {result[f'AP_{c}']:.4f}" for c in class_names]
        lines.append(f"mAP (IoU {self.iou_list[0]}..{self.iou_list[-1]})"
                     f": {result['mAP']:.4f}")
        return result, "\n".join(lines)
