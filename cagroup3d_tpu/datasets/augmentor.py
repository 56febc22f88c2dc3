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


def get_points_in_box_mask(points, box):
    """bool [P]: reference get_points_in_box (augmentor_utils.py:496-514):
    rotated-BEV test with 0.1 m xy margin, axis z test, used by every
    local (per-object) augmentation."""
    d = points[:, :3] - box[:3]
    c, s = np.cos(-box[6]), np.sin(-box[6])
    lx = d[:, 0] * c - d[:, 1] * s
    ly = d[:, 0] * s + d[:, 1] * c
    m = 0.1
    return (np.abs(d[:, 2]) <= box[5] / 2.0) & \
        (np.abs(lx) <= box[3] / 2.0 + m) & (np.abs(ly) <= box[4] / 2.0 + m)


def random_local_translation(gt_boxes, points, offset_range, axes):
    """Per-object translation (random_local_translation_along_{x,y,z},
    augmentor_utils.py:200-264): each box and its member points shift by
    an independent uniform offset along each requested axis."""
    ax_map = {"x": 0, "y": 1, "z": 2}
    for a in axes:
        col = ax_map[a]
        for i in range(len(gt_boxes)):
            off = np.random.uniform(offset_range[0], offset_range[1])
            mask = get_points_in_box_mask(points, gt_boxes[i])
            points[mask, col] += off
            gt_boxes[i, col] += off
    return gt_boxes, points


def local_rotation(gt_boxes, points, rot_range):
    """Per-object rotation about the box center (augmentor_utils.py:
    368-413); heading and (9-DoF) velocity rotate with the box."""
    for i in range(len(gt_boxes)):
        ang = np.random.uniform(rot_range[0], rot_range[1])
        mask = get_points_in_box_mask(points, gt_boxes[i])
        ctr = gt_boxes[i, :3].copy()
        points[mask] = rotate_points_along_z_np(points[mask] -
                                                np.pad(ctr, (0, points.shape[1] - 3)), ang)
        points[mask, :3] += ctr
        gt_boxes[i, 6] += ang
        if gt_boxes.shape[1] > 8:
            v = np.array([[gt_boxes[i, 7], gt_boxes[i, 8], 0.0]])
            gt_boxes[i, 7:9] = rotate_points_along_z_np(v, ang)[0, :2]
    return gt_boxes, points


def local_scaling(gt_boxes, points, scale_range):
    """Per-object scaling about the box center (augmentor_utils.py:
    334-365): member points scale radially, box dims scale."""
    if scale_range[1] - scale_range[0] < 1e-3:
        return gt_boxes, points
    for i in range(len(gt_boxes)):
        s = np.random.uniform(scale_range[0], scale_range[1])
        mask = get_points_in_box_mask(points, gt_boxes[i])
        points[mask, :3] = (points[mask, :3] - gt_boxes[i, :3]) * s + \
            gt_boxes[i, :3]
        gt_boxes[i, 3:6] *= s
    return gt_boxes, points


_FRUSTUM_AXIS = dict(top=(2, +1), bottom=(2, -1), left=(1, +1),
                     right=(1, -1))


def global_frustum_dropout(gt_boxes, points, intensity_range, direction):
    """Scene-edge slab dropout (global_frustum_dropout_*, augmentor_utils
    .py:266-331): cut a fraction of the scene extent off one side; boxes
    whose center falls in the slab are dropped too."""
    col, sign = _FRUSTUM_AXIS[direction]
    t = np.random.uniform(intensity_range[0], intensity_range[1])
    lo, hi = np.min(points[:, col]), np.max(points[:, col])
    if sign > 0:
        thr = hi - t * (hi - lo)
        keep_p, keep_b = points[:, col] < thr, gt_boxes[:, col] < thr
    else:
        thr = lo + t * (hi - lo)
        keep_p, keep_b = points[:, col] > thr, gt_boxes[:, col] > thr
    return gt_boxes[keep_b], points[keep_p], keep_b


def local_frustum_dropout(gt_boxes, points, intensity_range, direction):
    """Per-object slab dropout (local_frustum_dropout_*, augmentor_utils
    .py:416-493): per box, remove member points beyond a threshold cut
    from one face inward by a random fraction of the box extent."""
    col, sign = _FRUSTUM_AXIS[direction]
    dim = dict(top=5, bottom=5, left=4, right=4)[direction]
    for i in range(len(gt_boxes)):
        t = np.random.uniform(intensity_range[0], intensity_range[1])
        mask = get_points_in_box_mask(points, gt_boxes[i])
        c, d = gt_boxes[i, col], gt_boxes[i, dim]
        if sign > 0:
            drop = mask & (points[:, col] >= (c + d / 2) - t * d)
        else:
            drop = mask & (points[:, col] <= (c - d / 2) + t * d)
        points = points[~drop]
    return gt_boxes, points


# -- pyramid (SE-SSD) augmentation --------------------------------------
_PYR_ORDERS = np.array([[0, 1, 5, 4], [4, 5, 6, 7], [7, 6, 2, 3],
                        [3, 2, 1, 0], [1, 2, 6, 5], [0, 4, 7, 3]])


def boxes_to_pyramids(boxes7):
    """[N, 6, 5, 3]: per box, six face pyramids = apex (box center) +
    the 4 corners of one face (get_pyramids, augmentor_utils.py:516-539;
    same corner orders so the face indexing matches)."""
    from ..utils.box_utils import boxes_to_corners_3d
    corners = boxes_to_corners_3d(boxes7)            # [N, 8, 3]
    pyr = np.empty((len(boxes7), 6, 5, 3), np.float32)
    pyr[:, :, 0] = boxes7[:, None, :3]
    for f, order in enumerate(_PYR_ORDERS):
        pyr[:, f, 1:] = corners[:, order]
    return pyr


def points_in_pyramid_mask(points, pyr):
    """bool [P]: point inside the convex hull of apex + base quad.
    Half-space test against the 5 faces (replaces the reference's
    scipy-Delaunay in_hull, box_utils.in_hull)."""
    apex, base = pyr[0], pyr[1:]                     # [3], [4, 3]
    centroid = (apex + base.sum(0)) / 5.0
    faces = [(base[0], base[1], base[2])]            # base quad (planar)
    for k in range(4):
        faces.append((apex, base[k], base[(k + 1) % 4]))
    ok = np.ones(len(points), bool)
    eps = 1e-6
    for a, b, c in faces:
        n = np.cross(b - a, c - a)
        if np.dot(n, centroid - a) > 0:              # orient outward
            n = -n
        ok &= (points[:, :3] - a) @ n <= eps
    return ok


def points_in_pyramids_mask(points, pyramids):
    """bool [P, M] over flattened pyramids [M, 5, 3]."""
    pyramids = pyramids.reshape(-1, 5, 3)
    out = np.zeros((len(points), len(pyramids)), bool)
    for i, pyr in enumerate(pyramids):
        out[:, i] = points_in_pyramid_mask(points, pyr)
    return out


def local_pyramid_dropout(gt_boxes, points, dropout_prob, pyramids=None):
    """Drop all points of one random face pyramid per selected box
    (local_pyramid_dropout, augmentor_utils.py:557-571).  Returns the
    surviving boxes' pyramids for chaining."""
    if pyramids is None:
        pyramids = boxes_to_pyramids(gt_boxes[:, :7])
    if len(pyramids):
        face = np.random.randint(0, 6, len(pyramids))
        sel = np.random.uniform(0, 1, len(pyramids)) <= dropout_prob
        if sel.any():
            drop = pyramids[sel, face[sel]]          # [S, 5, 3]
            hit = points_in_pyramids_mask(points, drop)
            points = points[~hit.any(-1)]
        pyramids = pyramids[~sel]
    return gt_boxes, points, pyramids


def local_pyramid_sparsify(gt_boxes, points, prob, max_num_pts,
                           pyramids=None):
    """Downsample one random face pyramid per selected box to
    max_num_pts points (local_pyramid_sparsify, augmentor_utils.py:
    573-604)."""
    if pyramids is None:
        pyramids = boxes_to_pyramids(gt_boxes[:, :7])
    if len(pyramids):
        face = np.random.randint(0, 6, len(pyramids))
        sel = np.random.uniform(0, 1, len(pyramids)) <= prob
        if sel.any():
            cand = pyramids[sel, face[sel]]
            masks = points_in_pyramids_mask(points, cand)
            counts = masks.sum(0)
            busy = counts > max_num_pts
            if busy.any():
                masks = masks[:, busy]
                remain = points[~masks.any(-1)]
                kept = []
                for j in range(masks.shape[1]):
                    member = points[masks[:, j]]
                    idx = np.random.choice(len(member), max_num_pts,
                                           replace=False)
                    kept.append(member[idx])
                points = np.concatenate([remain] + kept, axis=0)
        pyramids = pyramids[~sel]
    return gt_boxes, points, pyramids


def _pyramid_frame(pyr):
    """Affine frame of a face pyramid: base corner p0 + edge vectors
    (u along p0->p1, v along p0->p3, w from the base-surface center to
    the apex), matching the reference's (alpha, beta, gamma)
    parametrization (local_pyramid_swap get_points_ratio)."""
    apex, base = pyr[0], pyr[1:]
    sc = base.mean(0)
    return base[0], base[1] - base[0], base[3] - base[0], apex - sc, sc


def pyramid_ratios(points, pyr):
    p0, u, v, w, sc = _pyramid_frame(pyr)
    a = (points[:, :3] - p0) @ u / max((u * u).sum(), 1e-9)
    b = (points[:, :3] - p0) @ v / max((v * v).sum(), 1e-9)
    g = (points[:, :3] - sc) @ w / max((w * w).sum(), 1e-9)
    return a, b, g


def pyramid_points_from_ratios(ratios, pyr):
    a, b, g = ratios
    p0, u, v, w, sc = _pyramid_frame(pyr)
    return a[:, None] * u + b[:, None] * v + p0 + g[:, None] * w


def local_pyramid_swap(gt_boxes, points, prob, max_num_pts,
                       pyramids=None):
    """Swap the point sets of same-face pyramids between two boxes via
    the (alpha, beta, gamma) affine parametrization; intensity is
    min-max remapped into the destination's range (local_pyramid_swap,
    augmentor_utils.py:607-704)."""
    if pyramids is None:
        pyramids = boxes_to_pyramids(gt_boxes[:, :7])
    if len(pyramids) < 2:
        return gt_boxes, points
    sel_box = np.random.uniform(0, 1, len(pyramids)) <= prob
    if not sel_box.any():
        return gt_boxes, points
    masks = points_in_pyramids_mask(points, pyramids)   # [P, N*6]
    counts = masks.sum(0).reshape(len(pyramids), 6)
    rich = counts > max_num_pts                          # swappable
    src_list, dst_list = [], []
    for i in np.flatnonzero(sel_box):
        faces = np.flatnonzero(rich[i])
        if not len(faces):
            continue
        f = np.random.choice(faces)
        partners = np.flatnonzero(rich[:, f] &
                                  (np.arange(len(pyramids)) != i))
        if not len(partners):
            continue
        j = np.random.choice(partners)
        src_list.append((i, f))
        dst_list.append((j, f))
        rich[i, f] = rich[j, f] = False                  # use once
    if not src_list:
        return gt_boxes, points

    def _remap_intensity(col, ref_col):
        lo, hi = ref_col.min(), ref_col.max()
        r = (col - col.min()) / max(col.max() - col.min(), 1e-6)
        return r * (hi - lo) + lo

    swap_masks = []
    for (i, f), (j, _) in zip(src_list, dst_list):
        swap_masks.append(masks[:, i * 6 + f])
        swap_masks.append(masks[:, j * 6 + f])
    any_swap = np.any(swap_masks, axis=0)
    out = [points[~any_swap]]
    for (i, f), (j, _) in zip(src_list, dst_list):
        pa, pb = pyramids[i, f], pyramids[j, f]
        pts_a, pts_b = points[masks[:, i * 6 + f]], \
            points[masks[:, j * 6 + f]]
        new_a = pts_b.copy()
        new_a[:, :3] = pyramid_points_from_ratios(
            pyramid_ratios(pts_b, pb), pa)
        new_b = pts_a.copy()
        new_b[:, :3] = pyramid_points_from_ratios(
            pyramid_ratios(pts_a, pa), pb)
        if points.shape[1] > 3:
            new_a[:, -1] = _remap_intensity(pts_b[:, -1], pts_a[:, -1])
            new_b[:, -1] = _remap_intensity(pts_a[:, -1], pts_b[:, -1])
        out += [new_a, new_b]
    return gt_boxes, np.concatenate(out, axis=0)


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

    def random_local_translation(self, data_dict, config):
        gt, pts = random_local_translation(
            data_dict["gt_boxes"], data_dict["points"],
            config["LOCAL_TRANSLATION_RANGE"], config["ALONG_AXIS_LIST"])
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_local_rotation(self, data_dict, config):
        rr = config["LOCAL_ROT_ANGLE"]
        rr = rr if isinstance(rr, list) else [-rr, rr]
        gt, pts = local_rotation(data_dict["gt_boxes"],
                                 data_dict["points"], rr)
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_local_scaling(self, data_dict, config):
        gt, pts = local_scaling(data_dict["gt_boxes"], data_dict["points"],
                                config["LOCAL_SCALE_RANGE"])
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_world_frustum_dropout(self, data_dict, config):
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        keep = np.arange(len(gt))
        for direction in config["DIRECTION"]:
            # keep names/mask aligned with the surviving boxes (the
            # reference drops gt_boxes rows only — a latent misalignment
            # it ships with; we align the parallel arrays)
            gt, pts, kb = global_frustum_dropout(
                gt, pts, config["INTENSITY_RANGE"], direction)
            keep = keep[kb]
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        if len(keep) < len(data_dict["gt_names"]):
            data_dict["gt_names"] = data_dict["gt_names"][keep]
            if "gt_boxes_mask" in data_dict:
                data_dict["gt_boxes_mask"] = \
                    data_dict["gt_boxes_mask"][keep]
        return data_dict

    def random_local_frustum_dropout(self, data_dict, config):
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        for direction in config["DIRECTION"]:
            gt, pts = local_frustum_dropout(gt, pts,
                                            config["INTENSITY_RANGE"],
                                            direction)
        data_dict["gt_boxes"], data_dict["points"] = gt, pts
        return data_dict

    def random_local_pyramid_aug(self, data_dict, config):
        """SE-SSD pyramid dropout -> sparsify -> swap chain
        (data_augmentor.py:222-245)."""
        gt, pts = data_dict["gt_boxes"], data_dict["points"]
        gt, pts, pyr = local_pyramid_dropout(gt, pts, config["DROP_PROB"])
        gt, pts, pyr = local_pyramid_sparsify(gt, pts,
                                              config["SPARSIFY_PROB"],
                                              config["SPARSIFY_MAX_NUM"],
                                              pyr)
        gt, pts = local_pyramid_swap(gt, pts, config["SWAP_PROB"],
                                     config["SWAP_MAX_NUM"], pyr)
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
