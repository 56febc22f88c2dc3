"""Capacity autotuner: scan a dataset and recommend static capacities.

The engine's shapes are fixed at compile time (INPUT_CAP, backbone
per-stride CAPS, FINE/EXPAND_CAP, GRID_CAP); the right values are
dataset statistics, not constants.  This tool replays the input pipeline
over N samples, measures voxel counts at every stride, simulates the
head's per-class selection at the eval threshold, and prints a CAPS
block (P99 x margin, rounded up to multiples of 128).

Usage:
  python tools/tune_caps.py --cfg_file tools/cfgs/scannet_models/CAGroup3D.yaml \
      --num_samples 50 [--percentile 99] [--margin 1.2]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def round128(x):
    return int(-(-x // 128) * 128)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", required=True)
    ap.add_argument("--num_samples", type=int, default=50)
    ap.add_argument("--percentile", type=float, default=99.0)
    ap.add_argument("--margin", type=float, default=1.2)
    ap.add_argument("--sem_thr", type=float, default=0.05,
                    help="eval-time semantic threshold (worst case)")
    ap.add_argument("--sel_frac", type=float, default=0.3,
                    help="assumed fraction of voxels above the semantic "
                         "threshold per class (upper bound without a "
                         "trained model)")
    args = ap.parse_args()

    from cagroup3d_tpu.config import cfg, cfg_from_yaml_file
    from cagroup3d_tpu.datasets import build_dataloader

    cfg_from_yaml_file(args.cfg_file, cfg)
    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=1, training=False)

    voxel = float(cfg.MODEL.VOXEL_SIZE)
    from cagroup3d_tpu.models.dense_heads.cagroup_head import (
        SCANNET_VOXELS, SUNRGBD_VOXELS)
    n_cls = len(cfg.CLASS_NAMES)
    vox_list = np.clip(np.array(
        SCANNET_VOXELS if n_cls == 18 else SUNRGBD_VOXELS) / 2, 0.04, 1.0)

    strides = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]
    counts = {s: [] for s in strides}
    fine_counts = []
    n = 0
    for i in range(min(args.num_samples, len(dataset))):
        d = dataset[i]
        pts = d["points"][:, :3]
        lat = np.floor(pts / voxel).astype(np.int64)
        for s in strides:
            ls = lat // s
            key = (ls[:, 0] << 42) + (ls[:, 1] << 21) + ls[:, 2]
            counts[s].append(len(np.unique(key)))
        # head fine maps: per class, selected points re-voxelized at the
        # class voxel size (x2: voted + original)
        nsel = int(len(pts) * args.sel_frac)
        sel = pts[np.random.choice(len(pts), min(nsel, len(pts)),
                                   replace=False)]
        for c in range(n_cls):
            lc = np.floor(sel / vox_list[c]).astype(np.int64)
            key = (lc[:, 0] << 42) + (lc[:, 1] << 21) + lc[:, 2]
            fine_counts.append(2 * len(np.unique(key)))
        n += 1
    if n == 0:
        print("no samples readable; check DATA_PATH")
        return

    p = args.percentile
    print(f"# measured over {n} samples, P{p:.0f} x {args.margin}")
    print(f"INPUT_CAP: {round128(np.percentile(counts[1], p) * args.margin)}")
    print("BACKBONE_3D:\n  CAPS:")
    for s in strides:
        v = round128(max(np.percentile(counts[s], p) * args.margin, 128))
        print(f"    {s}: {v}")
    fc = round128(np.percentile(fine_counts, p) * args.margin)
    print(f"DENSE_HEAD:\n  FINE_CAP: {fc}\n  EXPAND_CAP: {round128(fc / 3)}")


if __name__ == "__main__":
    main()
