"""Dataset registry + build_dataloader (pcdet public surface,
reference pcdet/datasets/__init__.py:51-80).

The loader is a plain-python iterator with background-thread prefetch
producing static-shape padded numpy batches (no torch DataLoader /
DistributedSampler: multi-host sharding is by-rank slicing of the index
list, the TPU-native analogue)."""
from __future__ import annotations

import queue as queue_mod
import threading
from typing import Iterator, Optional

import numpy as np

from .dataset import DatasetTemplate
from .scannet_dataset import ScannetDataset
from .sunrgbd_dataset import SunrgbdDataset
from .indoor_eval import indoor_eval

from .kitti_dataset import KittiDataset
from .nuscenes_dataset import NuScenesDataset
from .waymo_dataset import WaymoDataset
from .lyft_dataset import LyftDataset
from .pandaset_dataset import PandasetDataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "ScannetDataset": ScannetDataset,
    "SunrgbdDataset": SunrgbdDataset,
    "KittiDataset": KittiDataset,
    "NuScenesDataset": NuScenesDataset,
    "WaymoDataset": WaymoDataset,
    "LyftDataset": LyftDataset,
    "PandasetDataset": PandasetDataset,
}


class DataLoader:
    """Batched, optionally shuffled, rank-sharded loader with prefetch."""

    def __init__(self, dataset, batch_size, shuffle=False, seed=0,
                 rank=0, world_size=1, drop_last=True, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.world_size
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # rank sharding (replaces DistributedSampler)
        idx = idx[self.rank::self.world_size]
        nb = len(idx) // self.batch_size if self.drop_last \
            else -(-len(idx) // self.batch_size)
        return [idx[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def __iter__(self) -> Iterator[dict]:
        batches = self._indices()
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            for b in batches:
                items = [self.dataset[int(i)] for i in b]
                q.put(self.dataset.collate_batch(items))
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, seed=None, logger=None,
                     training=True, merge_all_iters_to_one_epoch=False,
                     total_epochs=0, rank=0, world_size=1):
    dataset = __all__[dataset_cfg.DATASET](
        dataset_cfg=dataset_cfg, class_names=class_names,
        root_path=root_path, training=training, logger=logger)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=training,
                        seed=seed or 0, rank=rank, world_size=world_size,
                        drop_last=training)
    return dataset, loader, loader
