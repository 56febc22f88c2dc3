"""SUN RGB-D dataset (rebuild of
pcdet/datasets/sunrgbd/sunrgbd_dataset.py): 7-DoF yaw boxes from
gt_boxes_upright_depth, REPEAT=4, no instance/semantic masks."""
from __future__ import annotations

import copy

import numpy as np

from .scannet_dataset import ScannetDataset


class SunrgbdDataset(ScannetDataset):
    def get_lidar(self, idx):
        f = self.root_path / "points" / (str(idx).zfill(6) + ".bin")
        return np.fromfile(str(f), dtype=np.float32).reshape(-1, 6)

    def get_axis_align_matrix(self, info):
        return np.eye(4, dtype=np.float32)

    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        sample_idx = info["point_cloud"]["lidar_idx"]
        get_item_list = self.dataset_cfg.get("GET_ITEM_LIST", ["points"])
        d = {"frame_id": sample_idx}
        if info["annos"]["gt_num"] != 0:
            annos = info["annos"]
            b = annos["gt_boxes_upright_depth"]
            d["gt_names"] = annos["name"]
            d["gt_boxes"] = np.concatenate(
                [b[:, :3], b[:, 3:6], b[:, 6:7]], axis=1).astype(np.float32)
        else:
            d["gt_names"] = np.array([])
            d["gt_boxes"] = np.zeros((0, 7), np.float32)
        if "points" in get_item_list:
            d["points"] = self.get_lidar(sample_idx)
        d["axis_align_matrix"] = self.get_axis_align_matrix(info)
        d = self.prepare_data(d)
        if self.training and self.filter_empty_gt and \
                len(d["gt_boxes"]) == 0:
            return self[np.random.randint(len(self))]
        return d
