"""PandaSet (Hesai) dataset (reference pcdet/datasets/pandaset/
pandaset_dataset.py, condensed to the train/eval path).

The reference leans on the `pandaset` devkit for pose handling; here the
two geometry primitives (world<->ego via a position + heading
quaternion, pandaset.geometry.lidar_points_to_ego) are implemented
natively, so the only dependency is pandas for the pkl.gz frame
dataframes the dataset ships.

Layout consumed (pandaset_dataset.get_infos:358-384):
  <root>/dataset/<seq>/lidar/{NN}.pkl.gz        points dataframe
                               poses.json       per-frame pose dicts
  <root>/dataset/<seq>/annotations/cuboids/{NN}.pkl.gz
plus pcdet-style pandaset_infos_*.pkl listing (sequence, frame_idx,
lidar_path, cuboids_path).

Coordinate chain (pandaset_dataset.py:150-255): world points -> ego via
the inverse pose, then pandaset-ego (x right, y forward) -> normative
(x forward, y left) by swapping axes and negating y; box yaws get the
ego heading's z-rotation added.  Intensity is normalized from [0, 255].

The reference's `evaluation` is an explicit no-op ("no official one",
:438-444); parity keeps that default, and `eval_metric: lyft` opts into
the engine's native IoU-sweep mAP as a usable stand-in.
"""
from __future__ import annotations

import json
import pickle
import zlib
from pathlib import Path
from typing import Dict, List

import numpy as np

from .dataset import DatasetTemplate, prepare_outdoor_sample


def quat_to_rot(w, x, y, z):
    """Unit-quaternion -> rotation matrix."""
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
         2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
         2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x),
         1 - 2 * (x * x + y * y)]], np.float64)


def _pose_rt(pose: Dict):
    h, p = pose["heading"], pose["position"]
    R = quat_to_rot(h["w"], h["x"], h["y"], h["z"])
    t = np.array([p["x"], p["y"], p["z"]], np.float64)
    return R, t


def lidar_points_to_ego(points: np.ndarray, pose: Dict) -> np.ndarray:
    """pandaset.geometry.lidar_points_to_ego: inverse rigid transform."""
    R, t = _pose_rt(pose)
    return ((points - t) @ R).astype(np.float64)    # R^-1 = R^T, row form


def ego_to_lidar_points(points: np.ndarray, pose: Dict) -> np.ndarray:
    R, t = _pose_rt(pose)
    return (points @ R.T + t).astype(np.float64)


class PandasetDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, root_path=None,
                 training=True, logger=None):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path,
                         logger=logger)
        self.root_path = Path(root_path or dataset_cfg.DATA_PATH)
        self.lidar_device = int(dataset_cfg.get("LIDAR_DEVICE", 0))
        self.categories = dict(dataset_cfg.get("TRAINING_CATEGORIES",
                                               {}) or {})
        self.infos: List[Dict] = []
        key = "train" if training else "test"
        for pkl in dataset_cfg.get("INFO_PATH", {}).get(key, []):
            p = self.root_path / pkl
            if p.exists():
                with open(p, "rb") as f:
                    self.infos.extend(pickle.load(f))
        if logger:
            logger.info(f"PandaSet: {len(self.infos)} samples")
        self._poses: Dict[str, List[Dict]] = {}

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
    def _get_pose(self, info) -> Dict:
        seq = str(info["sequence"]).zfill(3)
        if seq not in self._poses:
            with open(self.root_path / "dataset" / seq / "lidar" /
                      "poses.json") as f:
                self._poses[seq] = json.load(f)
        return self._poses[seq][int(info["frame_idx"])]

    def _resolve(self, path) -> Path:
        p = Path(path)
        return p if p.is_absolute() else self.root_path / p

    def _get_lidar_points(self, info, pose) -> np.ndarray:
        """[N, 4] normative-frame xyz + [0,1] intensity
        (pandaset_dataset.py:150-185)."""
        import pandas as pd
        frame = pd.read_pickle(self._resolve(info["lidar_path"]))
        if self.lidar_device != -1 and "d" in frame:
            frame = frame[frame.d == self.lidar_device]
        world = frame[["x", "y", "z"]].to_numpy(np.float64)
        inten = frame["i"].to_numpy(np.float64) / 255.0
        ego = lidar_points_to_ego(world, pose)
        ego = ego[:, [1, 0, 2]]
        ego[:, 1] = -ego[:, 1]
        return np.concatenate([ego, inten[:, None]],
                              axis=1).astype(np.float32)

    def _get_annotations(self, info, pose):
        """Normative-frame 7-DoF boxes + remapped labels + the ego
        z-rotation (pandaset_dataset.py:187-255)."""
        import pandas as pd
        cub = pd.read_pickle(self._resolve(info["cuboids_path"]))
        if self.lidar_device != -1 and "cuboids.sensor_id" in cub:
            cub = cub[cub["cuboids.sensor_id"] != 1 - self.lidar_device]
        centers = cub[["position.x", "position.y",
                       "position.z"]].to_numpy(np.float64)
        dims = cub[["dimensions.x", "dimensions.y",
                    "dimensions.z"]].to_numpy(np.float64)
        yaws = cub["yaw"].to_numpy(np.float64)
        labels = np.asarray([self.categories.get(l, l)
                             for l in cub["label"].to_numpy()])
        ego_c = lidar_points_to_ego(centers, pose)
        # ego heading of the world y axis -> yaw offset (the reference
        # assumes negligible pitch, :225-236)
        yax = lidar_points_to_ego(
            np.array([[0, 0, 0], [0, 1.0, 0]]), pose)
        d = yax[1] - yax[0]
        zrot = float(np.arctan2(-d[0], d[1]))
        boxes = np.stack([ego_c[:, 1], -ego_c[:, 0], ego_c[:, 2],
                          dims[:, 1], dims[:, 0], dims[:, 2],
                          yaws + zrot], axis=1)
        return boxes.astype(np.float32), labels, zrot

    # ------------------------------------------------------------------
    def __getitem__(self, index):
        info = self.infos[index]
        pose = self._get_pose(info)
        points = self._get_lidar_points(info, pose)
        boxes, labels, zrot = self._get_annotations(info, pose)
        frame_id = f'{str(info["sequence"]).zfill(3)}_' \
                   f'{int(info["frame_idx"]):02d}'
        rs = np.random.RandomState(
            zlib.crc32(frame_id.encode()) & 0x7FFFFFFF)
        out = prepare_outdoor_sample(
            dict(points=points, gt_boxes=boxes, gt_names=labels,
                 frame_id=frame_id),
            rs, augmentor=self.augmentor,
            shuffle_points=self.shuffle_points,
            class_names=self.class_names,
            pc_range=self.dataset_cfg.POINT_CLOUD_RANGE,
            point_cap=self.point_cap, max_gt=self.max_gt,
            sample_num_points=self.sample_num_points)
        out["zrot_world_to_ego"] = np.float32(zrot)
        out["pose"] = np.array(
            [pose["position"]["x"], pose["position"]["y"],
             pose["position"]["z"], pose["heading"]["w"],
             pose["heading"]["x"], pose["heading"]["y"],
             pose["heading"]["z"]], np.float32)
        return out

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
        """Normative-frame annos + the world-frame cuboid dataframe
        dump the reference writes (pandaset_dataset.py:257-355)."""
        annos = []
        for i, pd_ in enumerate(pred_dicts):
            frame_id = np.asarray(batch_dict["frame_id"])[i] \
                if "frame_id" in batch_dict else i
            boxes = np.asarray(pd_["pred_boxes"], np.float32)
            labels = np.asarray(pd_["pred_labels"])
            anno = dict(
                frame_id=frame_id,
                boxes_lidar=boxes,
                score=np.asarray(pd_["pred_scores"], np.float32),
                pred_labels=labels,
                name=np.asarray([class_names[int(l)] for l in labels]))
            if output_path is not None and "pose" in batch_dict:
                import pandas as pd
                p = np.asarray(batch_dict["pose"])[i]
                pose = dict(position=dict(x=p[0], y=p[1], z=p[2]),
                            heading=dict(w=p[3], x=p[4], y=p[5],
                                         z=p[6]))
                zrot = float(np.asarray(
                    batch_dict["zrot_world_to_ego"])[i])
                ego = np.stack([-boxes[:, 1], boxes[:, 0],
                                boxes[:, 2]], 1)
                world = ego_to_lidar_points(ego, pose)
                df = pd.DataFrame({
                    "position.x": world[:, 0],
                    "position.y": world[:, 1],
                    "position.z": world[:, 2],
                    "dimensions.x": boxes[:, 4],
                    "dimensions.y": boxes[:, 3],
                    "dimensions.z": boxes[:, 5],
                    "yaw": (boxes[:, 6] - zrot) % (2 * np.pi),
                    "label": anno["name"],
                    "score": anno["score"]})
                seq, fr = str(frame_id).split("_")
                out_dir = Path(output_path) / seq / "predictions" / \
                    "cuboids"
                out_dir.mkdir(parents=True, exist_ok=True)
                df.to_pickle(out_dir / f"{fr}.pkl.gz")
                anno["preds"] = df
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """No official PandaSet protocol (reference returns empty,
        :438-444); `eval_metric: lyft` opts into the native IoU-sweep
        mAP over the ego-frame GT."""
        if kwargs.get("eval_metric") != "lyft" or not self.infos:
            return {}, ("Evaluation is not implemented for Pandaset as "
                        "there is no official one.")
        from .lyft_dataset import lyft_map_eval
        gts = []
        for info in self.infos:
            boxes, labels, _ = self._get_annotations(
                info, self._get_pose(info))
            gts.append(dict(boxes=boxes, names=labels))
        dets = [dict(boxes=d["boxes_lidar"][:, :7], names=d["name"],
                     scores=d["score"]) for d in det_annos]
        iou_list = list(kwargs.get("iou_thresholds",
                                   [0.5, 0.55, 0.6, 0.65, 0.7, 0.75,
                                    0.8, 0.85, 0.9, 0.95]))
        aps = lyft_map_eval(gts, dets, class_names, iou_list)
        result = {f"AP_{c}": float(aps[i].mean())
                  for i, c in enumerate(class_names)}
        result["mAP"] = float(aps.mean())
        return result, "\n".join(f"{k}: {v:.4f}"
                                 for k, v in result.items())
