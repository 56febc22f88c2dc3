"""Waymo Open Dataset (reference pcdet/datasets/waymo/waymo_dataset.py,
condensed to the train/eval path).

Loads the pcdet-preprocessed layout: per-sequence info pkls under
`<root>/<PROCESSED_DATA_TAG>/<sequence>/<sequence>.pkl` listed by
`ImageSets/<split>.txt`, and per-frame point npys
`<sequence>/%04d.npy` with columns [x, y, z, intensity, elongation,
NLZ_flag] (waymo_dataset.py:158-166).  Intensity is tanh-squashed, and
no-label-zone points are dropped unless DISABLE_NLZ_FLAG_ON_POINTS.

The raw-TFRecord preprocessing (waymo_utils.process_single_sequence)
requires the `waymo_open_dataset` package and is out of scope; this
class consumes its outputs, which is the surface every model config
uses.

Evaluation supports both reference protocols (waymo_dataset.py:267-319):
`eval_metric: kitti` maps classes onto the KITTI R11/R40 machinery via
the fake-camera transform, and `eval_metric: waymo` runs the native
AP/APH LEVEL_1/LEVEL_2 protocol (see waymo_eval.py).
"""
from __future__ import annotations

import pickle
import zlib
from pathlib import Path
from typing import Dict, List

import numpy as np

from .dataset import DatasetTemplate, prepare_outdoor_sample


def transform_lidar_annos_to_kitti(annos: List[Dict],
                                   map_name_to_kitti: Dict[str, str]):
    """kitti_utils.transform_annotations_to_kitti_format (:5-49):
    synthesize the camera-frame fields the official KITTI eval consumes
    from lidar boxes (fake bbox [0,0,50,50], camera axes x=-y_l,
    y=-z_l, z=x_l, bottom-center origin).  Mutates and returns annos."""
    for anno in annos:
        if "name" not in anno:
            anno["name"] = anno.pop("gt_names")
        anno["name"] = np.asarray(
            [map_name_to_kitti.get(n, n) for n in anno["name"]])
        n = len(anno["name"])
        anno["bbox"] = np.zeros((n, 4))
        anno["bbox"][:, 2:4] = 50
        anno["truncated"] = np.zeros(n)
        anno["occluded"] = np.zeros(n)
        boxes = np.asarray(anno["boxes_lidar"] if "boxes_lidar" in anno
                           else anno["gt_boxes_lidar"],
                           np.float64).copy()
        if len(boxes) > 0:
            boxes[:, 2] -= boxes[:, 5] / 2
            loc = np.stack([-boxes[:, 1], -boxes[:, 2], boxes[:, 0]], 1)
            anno["location"] = loc
            anno["dimensions"] = boxes[:, [3, 5, 4]]      # l, h, w
            anno["rotation_y"] = -boxes[:, 6] - np.pi / 2
            anno["alpha"] = -np.arctan2(-boxes[:, 1], boxes[:, 0]) \
                + anno["rotation_y"]
        else:
            anno["location"] = anno["dimensions"] = np.zeros((0, 3))
            anno["rotation_y"] = anno["alpha"] = np.zeros(0)
    return annos


class WaymoDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, root_path=None,
                 training=True, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        root = Path(root_path or dataset_cfg.DATA_PATH)
        self.root_path = root
        self.data_path = root / dataset_cfg.get(
            "PROCESSED_DATA_TAG", "waymo_processed_data")
        self.split = dataset_cfg.DATA_SPLIT["train" if training
                                            else "test"]
        split_file = root / "ImageSets" / f"{self.split}.txt"
        self.sample_sequence_list = [
            x.strip() for x in open(split_file).readlines()] \
            if split_file.exists() else []

        self.infos: List[Dict] = []
        skipped = 0
        for seq_file in self.sample_sequence_list:
            seq = Path(seq_file).stem
            p = self._check_sequence_name(
                self.data_path / seq / f"{seq}.pkl")
            if not p.exists():
                skipped += 1
                continue
            with open(p, "rb") as f:
                self.infos.extend(pickle.load(f))
        interval = int(dict(dataset_cfg.get("SAMPLED_INTERVAL", {})
                            ).get(self.mode, 1))
        if interval > 1:
            self.infos = self.infos[::interval]
        if logger:
            logger.info(f"Waymo {self.split}: {len(self.infos)} samples"
                        f" ({skipped} sequences skipped)")

        self.nlz_filter = not bool(dataset_cfg.get(
            "DISABLE_NLZ_FLAG_ON_POINTS", False))
        self.filter_empty_boxes = bool(dataset_cfg.get(
            "FILTER_EMPTY_BOXES_FOR_TRAIN", False))
        aug_cfg = dataset_cfg.get("DATA_AUGMENTOR", None)
        self.augmentor = None
        if training and aug_cfg is not None:
            from .augmentor import DataAugmentor
            self.augmentor = DataAugmentor(root, aug_cfg, class_names,
                                           logger=logger)
        from .dataset import parse_sample_points
        self.sample_num_points = parse_sample_points(
            dataset_cfg, self.mode)
        self.shuffle_points = False
        for proc in dataset_cfg.get("DATA_PROCESSOR", []):
            if proc.get("NAME") == "shuffle_points":
                self.shuffle_points = bool(dict(proc.get(
                    "SHUFFLE_ENABLED", {})).get(self.mode, False))

    @staticmethod
    def _check_sequence_name(p: Path) -> Path:
        """waymo_dataset.check_sequence_name_with_all_version
        (:120-134): tolerate the tag variants in preprocessed dumps."""
        if p.exists():
            return p
        for pre in ("training", "validation", "testing"):
            q = Path(str(p).replace("segment", pre + "_segment"))
            if q.exists():
                return q
        q = Path(str(p).replace("_with_camera_labels", ""))
        return q if q.exists() else p

    def __len__(self):
        return len(self.infos)

    def get_lidar(self, sequence_name: str, sample_idx: int) -> np.ndarray:
        """[N, 5] x y z tanh(intensity) elongation
        (waymo_dataset.py:158-166)."""
        f = self.data_path / sequence_name / f"{sample_idx:04d}.npy"
        feats = np.load(f)
        pts, nlz = feats[:, 0:5], feats[:, 5]
        if self.nlz_filter:
            pts = pts[nlz == -1]
        pts = pts.astype(np.float32)
        pts[:, 3] = np.tanh(pts[:, 3])
        return pts

    def __getitem__(self, index):
        info = self.infos[index]
        pc = info["point_cloud"]
        points = self.get_lidar(pc["lidar_sequence"], pc["sample_idx"])
        frame_id = info.get("frame_id",
                            f'{pc["lidar_sequence"]}_{pc["sample_idx"]}')

        gt_boxes = np.zeros((0, 7), np.float32)
        gt_names = np.zeros((0,), dtype="<U16")
        annos = info.get("annos")
        if annos is not None:
            mask = np.asarray(annos["name"]) != "unknown"
            gt_boxes = np.asarray(annos["gt_boxes_lidar"],
                                  np.float32)[mask][:, :7]
            gt_names = np.asarray(annos["name"])[mask]
            if self.training and self.filter_empty_boxes and \
                    "num_points_in_gt" in annos:
                ne = np.asarray(annos["num_points_in_gt"])[mask] > 0
                gt_boxes, gt_names = gt_boxes[ne], gt_names[ne]

        rs = np.random.RandomState(
            zlib.crc32(str(frame_id).encode()) & 0x7FFFFFFF)
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
        """pcdet prediction annos (waymo_dataset.py:222-267)."""
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
        """waymo_dataset.py:269-319: `eval_metric` selects the KITTI
        protocol (fake-camera transform) or the native Waymo AP/APH."""
        if not self.infos or "annos" not in self.infos[0]:
            return {}, "No ground-truth boxes for evaluation"
        import copy
        eval_det = copy.deepcopy(det_annos)
        eval_gt = [copy.deepcopy(info["annos"]) for info in self.infos]
        metric = kwargs.get("eval_metric", "waymo")
        if metric == "kitti":
            from .kitti_eval import get_official_eval_result
            m = {"Vehicle": "Car", "Pedestrian": "Pedestrian",
                 "Cyclist": "Cyclist", "Sign": "Sign", "Car": "Car"}
            transform_lidar_annos_to_kitti(eval_det, m)
            transform_lidar_annos_to_kitti(eval_gt, m)
            result_str, result_dict = get_official_eval_result(
                eval_gt, eval_det, [m[c] for c in class_names])
            return result_dict, result_str
        from .waymo_eval import waymo_evaluation
        ap_dict, result_str = waymo_evaluation(
            eval_det, eval_gt, class_names, distance_thresh=1000)
        return ap_dict, result_str
