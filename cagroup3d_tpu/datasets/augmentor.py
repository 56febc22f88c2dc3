"""Indoor data augmentation pipeline (numpy, host-side).

Rebuild of pcdet/datasets/augmentor/{data_augmentor,augmentor_utils}.py
for the indoor path: global_alignment, point_seg_class_mapping,
random_world_flip / rotation / rotation_mmdet3d / scaling / translation,
indoor_point_sample.  Matches the reference math exactly (including the
mmdet3d rotation sign and the y-flip heading transform); random streams
use numpy RandomState like the reference.
"""
from __future__ import annotations

from functools import partial

import numpy as np


def rotate_points_along_z_np(points, angle):
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=points.dtype)
    out = points.copy()
    out[:, :3] = points[:, :3] @ rot
    return out


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def global_alignment(points, axis_align_matrix, rotation_axis=2):
    rot = axis_align_matrix[:3, :3]
    trans = axis_align_matrix[:3, -1]
    assert np.allclose(np.linalg.det(rot), 1.0, atol=1e-5)
    points = points.copy()
    points[:, :3] = points[:, :3] @ rot.T + trans
    return points


def point_seg_class_mapping(semantic_mask, valid_cat_ids, max_cat_id):
    max_cat_id = int(max_cat_id)
    neg = len(valid_cat_ids)
    lut = np.full(max_cat_id + 1, neg, dtype=np.int64)
    for idx, cid in enumerate(valid_cat_ids):
        lut[cid] = idx
    return lut[np.clip(semantic_mask, 0, max_cat_id)]


def random_flip_along_x(gt_boxes, points):
    if np.random.choice([False, True]):
        gt_boxes[:, 1] = -gt_boxes[:, 1]
        gt_boxes[:, 6] = -gt_boxes[:, 6]
        points[:, 1] = -points[:, 1]
        if gt_boxes.shape[1] > 8:          # velocity vy (nuScenes boxes)
            gt_boxes[:, 8] = -gt_boxes[:, 8]
    return gt_boxes, points


def random_flip_along_y(gt_boxes, points):
    if np.random.choice([False, True]):
        gt_boxes[:, 0] = -gt_boxes[:, 0]
        gt_boxes[:, 6] = -(gt_boxes[:, 6] + np.pi)
        points[:, 0] = -points[:, 0]
        if gt_boxes.shape[1] > 8:          # velocity vx
            gt_boxes[:, 7] = -gt_boxes[:, 7]
    return gt_boxes, points


def global_rotation(gt_boxes, points, rot_range, mmdet3d_sign=False):
    noise = np.random.uniform(rot_range[0], rot_range[1])
    points = rotate_points_along_z_np(points, noise)
    gt_boxes[:, 0:3] = rotate_points_along_z_np(gt_boxes[:, 0:3], noise)
    if mmdet3d_sign:
        gt_boxes[:, 6] -= noise
    else:
        gt_boxes[:, 6] += noise
    if gt_boxes.shape[1] > 8:              # rotate the velocity vector
        vel = np.concatenate([gt_boxes[:, 7:9],
                              np.zeros((len(gt_boxes), 1))], axis=1)
        gt_boxes[:, 7:9] = rotate_points_along_z_np(vel, noise)[:, :2]
    return gt_boxes, points


def global_scaling(gt_boxes, points, scale_range):
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    s = np.random.uniform(scale_range[0], scale_range[1])
    points[:, :3] *= s
    gt_boxes[:, :6] *= s
    return gt_boxes, points


def random_translation(gt_boxes, points, std, axes=("x", "y", "z")):
    ax_map = {"x": 0, "y": 1, "z": 2}
    for a in axes:
        off = np.random.normal(0, std, 1)
        points[:, ax_map[a]] += off
        gt_boxes[:, ax_map[a]] += off
    return gt_boxes, points


def points_random_sampling(points, num_samples, return_choices=False):
    replace = points.shape[0] < num_samples
    choices = np.random.choice(points.shape[0], num_samples, replace=replace)
    return (points[choices], choices) if return_choices else points[choices]


def points_in_boxes_np(points, boxes7):
    """bool [P, N]: point inside rotated 3D box (numpy, host-side)."""
    if len(boxes7) == 0 or len(points) == 0:
        return np.zeros((len(points), len(boxes7)), bool)
    d = points[:, None, :3] - boxes7[None, :, :3]
    c, s = np.cos(boxes7[:, 6]), np.sin(boxes7[:, 6])
    u = d[..., 0] * c[None] + d[..., 1] * s[None]
    v = -d[..., 0] * s[None] + d[..., 1] * c[None]
    return (np.abs(u) <= boxes7[None, :, 3] / 2) & \
        (np.abs(v) <= boxes7[None, :, 4] / 2) & \
        (np.abs(d[..., 2]) <= boxes7[None, :, 5] / 2)


class DataBaseSampler:
    """GT-paste augmentation for outdoor training (reference
    pcdet/datasets/augmentor/database_sampler.py:14-248): sample
    pre-cropped object point clouds from a gt database and paste them
    into the scene collision-free.

    TPU-note: this is pure host-side numpy; the device never sees ragged
    shapes.  Collision tests use the same rotated-BEV intersection as the
    evaluator (indoor_eval.rotated_intersection_np) instead of the
    reference's CUDA/CPU iou3d kernels.
    """

    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        from pathlib import Path
        import pickle
        self.root_path = Path(root_path)
        self.cfg = sampler_cfg
        self.class_names = list(class_names)
        self.logger = logger
        self.num_point_features = int(sampler_cfg.get(
            "NUM_POINT_FEATURES", 4))
        self.remove_extra_width = [float(x) for x in sampler_cfg.get(
            "REMOVE_EXTRA_WIDTH", [0.0, 0.0, 0.0])]
        self.limit_whole_scene = bool(sampler_cfg.get(
            "LIMIT_WHOLE_SCENE", False))

        self.db_infos = {c: [] for c in self.class_names}
        for rel in sampler_cfg.get("DB_INFO_PATH", []):
            p = self.root_path / rel
            if not p.exists():
                if logger:
                    logger.warning(f"gt_sampling: missing db infos {p}")
                continue
            with open(p, "rb") as f:
                infos = pickle.load(f)
            for c in self.class_names:
                self.db_infos[c].extend(infos.get(c, []))

        for fn_name, val in dict(sampler_cfg.get("PREPARE", {})).items():
            self.db_infos = getattr(self, fn_name)(self.db_infos, val)

        self.sample_groups = {}
        from .indoor_eval import rotated_intersection_np  # noqa: F401
        self._bev_inter = rotated_intersection_np
        for spec in sampler_cfg.get("SAMPLE_GROUPS", []):
            name, num = str(spec).split(":")
            if name not in self.class_names:
                continue
            self.sample_groups[name] = dict(
                target=int(num), pointer=len(self.db_infos[name]),
                indices=np.arange(len(self.db_infos[name])))

    # -- PREPARE filters ------------------------------------------------
    def filter_by_difficulty(self, db_infos, removed_difficulty):
        return {k: [i for i in v
                    if i.get("difficulty", 0) not in removed_difficulty]
                for k, v in db_infos.items()}

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for spec in min_gt_points_list:
            name, num = str(spec).split(":")
            if int(num) > 0 and name in db_infos:
                db_infos[name] = [i for i in db_infos[name]
                                  if i.get("num_points_in_gt", 0) >=
                                  int(num)]
        return db_infos

    # -------------------------------------------------------------------
    def _draw(self, name, n):
        """Epoch-permuted round-robin draw (sample_with_fixed_number,
        database_sampler.py:117-136)."""
        grp = self.sample_groups[name]
        infos = self.db_infos[name]
        if grp["pointer"] + n > len(infos):
            grp["indices"] = np.random.permutation(len(infos))
            grp["pointer"] = 0
        picked = [infos[i] for i in
                  grp["indices"][grp["pointer"]:grp["pointer"] + n]]
        grp["pointer"] += n
        return picked

    def __call__(self, data_dict):
        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"].astype(str)
        W = gt_boxes.shape[1] if gt_boxes.size else 7   # 7, or 9 w/ velo
        existed = gt_boxes[:, :7].copy()
        accepted = []
        accepted_boxes = []

        for name, grp in self.sample_groups.items():
            n = grp["target"]
            if self.limit_whole_scene:
                n -= int(np.sum(gt_names == name))
            n = min(n, len(self.db_infos[name]))
            if n <= 0:
                continue
            cands = self._draw(name, n)
            boxes = np.stack([np.asarray(c["box3d_lidar"],
                                         np.float32)[:W] for c in cands])
            if boxes.shape[1] < W:       # db boxes without velocity
                boxes = np.concatenate(
                    [boxes, np.zeros((len(boxes), W - boxes.shape[1]),
                                     np.float32)], axis=1)
            # collision-free: zero BEV overlap vs existing + accepted
            bev = boxes[:, [0, 1, 3, 4, 6]]
            i1 = self._bev_inter(bev, existed[:, [0, 1, 3, 4, 6]])
            i2 = self._bev_inter(bev, bev)
            np.fill_diagonal(i2, 0.0)
            ok = (i1.max(1, initial=0.0) + i2.max(1)) == 0
            for i in np.flatnonzero(ok):
                accepted.append(cands[i])
                accepted_boxes.append(boxes[i])
                existed = np.concatenate([existed, boxes[i:i + 1, :7]])

        if not accepted:
            return data_dict
        sampled_boxes = np.stack(accepted_boxes)

        obj_pts = []
        keep_boxes = []
        keep_names = []
        for info, box in zip(accepted, sampled_boxes):
            f = self.root_path / info["path"]
            if not f.exists():
                continue
            pts = np.fromfile(str(f), np.float32).reshape(
                -1, self.num_point_features).copy()
            pts[:, :3] += box[:3]
            obj_pts.append(pts)
            keep_boxes.append(box)
            keep_names.append(info["name"])
        if not keep_boxes:
            return data_dict
        sampled_boxes = np.stack(keep_boxes)
        obj_pts = np.concatenate(obj_pts, axis=0)
        sampled_names = np.asarray(keep_names)

        # carve out the pasted footprints, then paste objects in front
        from ..utils.box_utils import enlarge_box3d
        points = data_dict["points"]
        big = enlarge_box3d(sampled_boxes, self.remove_extra_width)
        inside = points_in_boxes_np(points, big).any(axis=1)
        points = np.concatenate([obj_pts[:, :points.shape[1]],
                                 points[~inside]], axis=0)

        mask = data_dict.get("gt_boxes_mask",
                             np.ones(len(gt_boxes), bool))
        data_dict["points"] = points
        data_dict["gt_boxes"] = np.concatenate(
            [gt_boxes[mask][:, :W], sampled_boxes], axis=0)
        data_dict["gt_names"] = np.concatenate(
            [gt_names[mask], sampled_names])
        data_dict.pop("gt_boxes_mask", None)
        return data_dict


class DataAugmentor:
    """Pipeline driver (data_augmentor.py:19-24,295-326)."""

    def __init__(self, root_path, augmentor_configs, class_names,
                 logger=None):
        self.root_path = root_path
        self.class_names = class_names
        self.logger = logger
        self.queue = []
        aug_list = augmentor_configs.AUG_CONFIG_LIST
        disable = augmentor_configs.get("DISABLE_AUG_LIST", [])
        for cfg in aug_list:
            if cfg.NAME in disable:
                continue
            if cfg.NAME == "gt_sampling":
                sampler = DataBaseSampler(root_path, cfg, class_names,
                                          logger=logger)
                self.queue.append(
                    lambda data_dict, _s=sampler: _s(data_dict))
                continue
            self.queue.append(partial(getattr(self, cfg.NAME), config=cfg))

    # -- pipeline stages -------------------------------------------------
    def global_alignment(self, data_dict, config):
        data_dict["points"] = global_alignment(
            data_dict["points"], data_dict["axis_align_matrix"],
            config.get("rotation_axis", 2))
        return data_dict

    def point_seg_class_mapping(self, data_dict, config):
        if "semantic_mask" in data_dict:
            data_dict["semantic_mask"] = point_seg_class_mapping(
                data_dict["semantic_mask"], config["valid_cat_ids"],
                config["max_cat_id"])
        return data_dict

    def random_world_flip(self, data_dict, config):
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        for ax in config["ALONG_AXIS_LIST"]:
            fn = {"x": random_flip_along_x, "y": random_flip_along_y}[ax]
            gt, pts = fn(gt, pts)
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_world_rotation(self, data_dict, config):
        rr = config["WORLD_ROT_ANGLE"]
        rr = rr if isinstance(rr, list) else [-rr, rr]
        gt, pts = global_rotation(data_dict["gt_boxes"],
                                  data_dict["points"], rr)
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_world_rotation_mmdet3d(self, data_dict, config):
        rr = config["WORLD_ROT_ANGLE"]
        rr = rr if isinstance(rr, list) else [-rr, rr]
        gt, pts = global_rotation(data_dict["gt_boxes"],
                                  data_dict["points"], rr, mmdet3d_sign=True)
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_world_scaling(self, data_dict, config):
        gt, pts = global_scaling(data_dict["gt_boxes"], data_dict["points"],
                                 config["WORLD_SCALE_RANGE"])
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_world_translation(self, data_dict, config):
        std = config["NOISE_TRANSLATE_STD"]
        if std == 0:
            return data_dict
        gt, pts = random_translation(data_dict["gt_boxes"],
                                     data_dict["points"], std,
                                     config["ALONG_AXIS_LIST"])
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def indoor_point_sample(self, data_dict, config):
        pts, choices = points_random_sampling(
            data_dict["points"], config["num_points"], return_choices=True)
        data_dict["points"] = pts
        for k in ("instance_mask", "semantic_mask"):
            if data_dict.get(k) is not None:
                data_dict[k] = data_dict[k][choices]
        return data_dict

    # --------------------------------------------------------------------
    def forward(self, data_dict):
        for fn in self.queue:
            data_dict = fn(data_dict=data_dict)
        data_dict["gt_boxes"][:, 6] = limit_period(
            data_dict["gt_boxes"][:, 6], offset=0.5, period=2 * np.pi)
        if "gt_boxes_mask" in data_dict:
            m = data_dict.pop("gt_boxes_mask")
            data_dict["gt_boxes"] = data_dict["gt_boxes"][m]
            data_dict["gt_names"] = data_dict["gt_names"][m]
        return data_dict
