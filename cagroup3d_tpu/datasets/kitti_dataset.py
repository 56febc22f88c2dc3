"""KITTI dataset (reference pcdet/datasets/kitti/kitti_dataset.py +
utils/calibration_kitti.py, condensed to the train/eval path).

Loads pcdet-format kitti_infos_*.pkl (camera-frame annos + calib
matrices embedded per info), converts boxes to the lidar frame
(box_utils.boxes3d_kitti_camera_to_lidar), reads velodyne .bin points,
applies the outdoor augmentations, and pads to static caps.

Evaluation: the official KITTI protocol (R11/R40 AP over
easy/moderate/hard buckets for bbox/bev/3d/aos; see kitti_eval.py —
reference kitti_object_eval_python/eval.py) when the infos carry full
camera annos; a lidar-frame 3D-IoU area-AP fallback otherwise.
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


def lidar_to_rect(pts_lidar, R0, V2C):
    """calibration_kitti.Calibration.lidar_to_rect (forward of
    rect_to_lidar)."""
    pts_hom = np.hstack([pts_lidar,
                         np.ones((len(pts_lidar), 1), np.float32)])
    R0_ext = np.eye(4, dtype=np.float32)
    R0_ext[:3, :3] = R0
    V2C_ext = np.vstack([V2C, np.array([0, 0, 0, 1], np.float32)])
    return (pts_hom @ (R0_ext @ V2C_ext).T)[:, :3]


def boxes_lidar_to_camera(boxes7, R0, V2C):
    """box_utils.boxes3d_lidar_to_kitti_camera: lidar (x,y,z ctr,l,w,h,r)
    -> camera (x,y,z bottom, l,h,w, ry)."""
    xyz = boxes7[:, 0:3].copy()
    l, w, h = boxes7[:, 3:4], boxes7[:, 4:5], boxes7[:, 5:6]
    xyz[:, 2] -= h[:, 0] / 2
    xyz_cam = lidar_to_rect(xyz, R0, V2C)
    r = -boxes7[:, 6:7] - np.pi / 2
    return np.concatenate([xyz_cam, l, h, w, r], axis=-1)


def boxes_camera_to_imageboxes(boxes_cam, P2, image_shape=None):
    """box_utils.boxes3d_kitti_camera_to_imageboxes: project the 8
    camera-frame corners through P2 and take the axis-aligned hull."""
    n = len(boxes_cam)
    if n == 0:
        return np.zeros((0, 4), np.float32)
    l, h, w = boxes_cam[:, 3], boxes_cam[:, 4], boxes_cam[:, 5]
    ry = boxes_cam[:, 6]
    xs = np.stack([l / 2, l / 2, -l / 2, -l / 2] * 2, -1)
    ys = np.stack([np.zeros(n)] * 4 + [-h] * 4, -1)
    zs = np.stack([w / 2, -w / 2, -w / 2, w / 2] * 2, -1)
    c, s = np.cos(ry)[:, None], np.sin(ry)[:, None]
    x = c * xs + s * zs
    z = -s * xs + c * zs
    corners = np.stack([x, ys, z], -1) + boxes_cam[:, None, 0:3]  # [n,8,3]
    hom = np.concatenate([corners, np.ones((n, 8, 1))], -1)
    img = hom @ np.asarray(P2).T                                  # [n,8,3]
    uv = img[..., :2] / np.maximum(img[..., 2:3], 1e-6)
    boxes = np.concatenate([uv.min(1), uv.max(1)], -1).astype(np.float32)
    if image_shape is not None:
        boxes[:, 0] = np.clip(boxes[:, 0], 0, image_shape[1] - 1)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, image_shape[0] - 1)
        boxes[:, 2] = np.clip(boxes[:, 2], 0, image_shape[1] - 1)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, image_shape[0] - 1)
    return boxes


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
        # train-time augmentation incl. gt_sampling (DataBaseSampler);
        # reference wires this via DataAugmentor (kitti_dataset.py uses
        # DatasetTemplate.prepare_data -> data_augmentor.forward)
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
        self.depth_downsample = 1
        for proc in dataset_cfg.get("DATA_PROCESSOR", []):
            if proc.get("NAME") == "shuffle_points":
                self.shuffle_points = bool(dict(proc.get(
                    "SHUFFLE_ENABLED", {})).get(self.mode, False))
            if proc.get("NAME") == "downsample_depth_map":
                self.depth_downsample = int(proc["DOWNSAMPLE_FACTOR"])
        self.get_item_list = list(dataset_cfg.get("GET_ITEM_LIST",
                                                  ["points"]))
        # static image canvas for the camera pipeline (CaDDN): KITTI
        # images vary by a few pixels; pad/crop to a fixed shape so the
        # batch stacks (reference pads in collate_batch to the max)
        self.image_shape = tuple(dataset_cfg.get("IMAGE_SHAPE",
                                                 (375, 1242)))

    def __len__(self):
        return len(self.infos)

    def collate_batch(self, batch_list, n_classes=None):
        """Items are already padded to static caps by
        prepare_outdoor_data — just stack (the template collate assumes
        6-feature indoor points)."""
        out = {}
        for k in batch_list[0]:
            if k == "frame_id":
                out[k] = [d[k] for d in batch_list]
            else:
                out[k] = np.stack([d[k] for d in batch_list])
        return out

    def get_points(self, idx: str) -> np.ndarray:
        f = self.root_split / "velodyne" / f"{idx}.bin"
        return np.fromfile(f, np.float32).reshape(-1, 4)

    def _pad_canvas(self, img: np.ndarray) -> np.ndarray:
        """Pad/crop HxW(xC) to the static image canvas."""
        H, W = self.image_shape
        out = np.zeros((H, W) + img.shape[2:], np.float32)
        h = min(H, img.shape[0])
        w = min(W, img.shape[1])
        out[:h, :w] = img[:h, :w]
        return out

    def get_image(self, idx: str) -> np.ndarray:
        """[H, W, 3] float 0..1 (reference kitti_dataset.get_image:68-82,
        images from training/image_2)."""
        from PIL import Image
        f = self.root_split / "image_2" / f"{idx}.png"
        img = np.asarray(Image.open(f), np.float32) / 255.0
        return self._pad_canvas(img)

    def get_depth_map(self, idx: str) -> np.ndarray:
        """[H/ds, W/ds] metres (get_depth_map:93-107: uint16 png / 256,
        then the downsample_depth_map processor)."""
        from PIL import Image
        f = self.root_split / "depth_2" / f"{idx}.png"
        d = np.asarray(Image.open(f), np.float32) / 256.0
        d = self._pad_canvas(d)
        ds = self.depth_downsample
        if ds > 1:
            H, W = d.shape[0] // ds * ds, d.shape[1] // ds * ds
            d = d[:H, :W].reshape(H // ds, ds, W // ds, ds).mean((1, 3))
        return d

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
                gb = np.asarray(annos["gt_boxes_lidar"], np.float32)
                # reference get_infos excludes DontCare rows from
                # gt_boxes_lidar already (kitti_dataset.py:192-200);
                # some custom pickles keep full-length arrays
                gt_boxes = gb if len(gb) == int(mask.sum()) \
                    else gb[mask]
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
        out = self.prepare_outdoor_data(data_dict)

        # camera-pipeline extras (reference kitti_dataset.py:414-422)
        if "images" in self.get_item_list:
            out["images"] = self.get_image(sample_idx)
        if "depth_maps" in self.get_item_list:
            out["depth_maps"] = self.get_depth_map(sample_idx)
        if "calib_matricies" in self.get_item_list:
            l2c = np.eye(4, dtype=np.float32)
            l2c[:3, :4] = np.asarray(R0 @ V2C, np.float32)
            P2 = np.asarray(calib.get("P2", np.zeros((3, 4))),
                            np.float32)[:3, :4]
            out["trans_lidar_to_cam"] = l2c
            out["trans_cam_to_img"] = P2
        if "gt_boxes2d" in self.get_item_list:
            G = self.max_gt
            b2 = np.zeros((G, 4), np.float32)
            bv = np.zeros((G,), bool)
            if annos is not None and "bbox" in annos:
                bb = annos["bbox"][annos["name"] != "DontCare"]
                m = min(len(bb), G)
                b2[:m] = bb[:m]
                bv[:m] = True
            out["gt_boxes2d"] = b2
            out["gt_boxes2d_valid"] = bv
        return out

    def prepare_outdoor_data(self, data_dict):
        """Augment (train) + range mask + class filter + pad."""
        # per-frame seeded RNG: eval must be deterministic across runs
        # (reference asserts set_random_seed; round-2 advisor flag)
        import zlib
        from .dataset import prepare_outdoor_sample
        rs = np.random.RandomState(
            zlib.crc32(str(data_dict["frame_id"]).encode()) & 0x7FFFFFFF)
        return prepare_outdoor_sample(
            data_dict, rs, augmentor=self.augmentor,
            shuffle_points=self.shuffle_points,
            class_names=self.class_names,
            pc_range=self.dataset_cfg.POINT_CLOUD_RANGE,
            point_cap=self.point_cap, max_gt=self.max_gt,
            sample_num_points=self.sample_num_points)

    # ------------------------------------------------------------------
    def _info_for_frame(self, frame_id):
        if not hasattr(self, "_by_frame"):
            self._by_frame = {
                str(i["point_cloud"]["lidar_idx"]): i for i in self.infos}
        return self._by_frame.get(str(frame_id))

    def generate_prediction_dicts(self, batch_dict, pred_dicts,
                                  class_names, output_path=None):
        """pcdet-format prediction annos (kitti_dataset.py:
        generate_prediction_dicts): lidar boxes + the camera-frame fields
        (location/dimensions/rotation_y/alpha/bbox) the official eval
        consumes, via the per-frame calib from the infos."""
        annos = []
        for i, pd in enumerate(pred_dicts):
            frame_id = np.asarray(batch_dict["frame_id"])[i] \
                if "frame_id" in batch_dict else i
            boxes_lidar = np.asarray(pd["pred_boxes"], np.float32)
            n = len(boxes_lidar)
            anno = dict(
                frame_id=frame_id,
                boxes_lidar=boxes_lidar,
                score=np.asarray(pd["pred_scores"], np.float32),
                pred_labels=np.asarray(pd["pred_labels"]),
                name=np.asarray([class_names[int(l)]
                                 for l in pd["pred_labels"]]),
                truncated=np.zeros(n, np.float32),
                occluded=np.zeros(n, np.float32),
            )
            info = self._info_for_frame(frame_id)
            calib = (info or {}).get("calib", {})
            if n and "R0_rect" in calib:
                R0 = np.asarray(calib["R0_rect"])[:3, :3]
                V2C = np.asarray(calib["Tr_velo_to_cam"])[:3, :4]
                cam = boxes_lidar_to_camera(boxes_lidar[:, :7], R0, V2C)
                anno["location"] = cam[:, 0:3]
                anno["dimensions"] = cam[:, 3:6]      # l, h, w
                anno["rotation_y"] = cam[:, 6]
                anno["alpha"] = (-np.arctan2(-boxes_lidar[:, 1],
                                             boxes_lidar[:, 0]) + cam[:, 6])
                if "P2" in calib:
                    shape = (info.get("image", {}) or {}).get("image_shape")
                    anno["bbox"] = boxes_camera_to_imageboxes(
                        cam, np.asarray(calib["P2"]), shape)
                else:
                    anno["bbox"] = np.tile(
                        np.asarray([[0, 0, 100, 100]], np.float32), (n, 1))
            else:
                anno["location"] = np.zeros((n, 3), np.float32)
                anno["dimensions"] = np.zeros((n, 3), np.float32)
                anno["rotation_y"] = np.zeros(n, np.float32)
                anno["alpha"] = np.full(n, -10.0, np.float32)
                anno["bbox"] = np.tile(
                    np.asarray([[0, 0, 100, 100]], np.float32), (n, 1))
            annos.append(anno)
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        """Official KITTI protocol (R11/R40, easy/moderate/hard,
        bbox/bev/3d/aos) when the infos carry full camera annos;
        falls back to the indoor-style 3D AP otherwise."""
        if not self.infos or "annos" not in self.infos[0]:
            return {}, ""
        gt0 = self.infos[0]["annos"]
        if all(k in gt0 for k in
               ("occluded", "truncated", "bbox", "location")):
            from .kitti_eval import get_official_eval_result
            gt_annos = [dict(info["annos"]) for info in self.infos]
            result_str, result_dict = get_official_eval_result(
                gt_annos, det_annos, class_names)
            return result_dict, result_str
        return self._evaluation_lidar_fallback(det_annos, class_names)

    def _evaluation_lidar_fallback(self, det_annos, class_names):
        """3D-IoU area-AP over lidar boxes (pre-round-3 stand-in; kept
        for infos without camera annos, e.g. synthetic pipelines)."""
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
