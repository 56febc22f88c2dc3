"""Capacity autotuner: scan scenes and recommend static capacities.

The engine's shapes are fixed at compile time (INPUT_CAP, backbone
per-stride CAPS, FINE/EXPAND_CAP, GRID_CAP); the right values are
dataset statistics, not constants.  This tool measures voxel counts at
every stride + the head's per-class fine-map sizes over scenes from one
of three sources, and prints a CAPS block (P99 x margin, rounded up to
multiples of 128):

  --cfg_file ...    replay the real input pipeline (needs data on disk)
  --synthetic N     N ScanNet-statistics synthetic rooms
                    (cagroup3d_tpu/utils/synthetic.py) — no data needed
  --stats FILE      occupancy stats JSON dumped earlier (--dump_stats),
                    e.g. produced on a machine that has the real data

Validate any tuned caps with `python tools/overfit_check.py --ab`
(bounds the mAP cost of the overflow-drop policy) and re-run bench.py
at the tuned values (BENCH_INPUT_CAP / BENCH_FINE_CAP).

Usage:
  python tools/tune_caps.py --synthetic 50 [--percentile 99] [--margin 1.2]
  python tools/tune_caps.py --cfg_file tools/cfgs/scannet_models/CAGroup3D.yaml \
      --num_samples 50 --dump_stats occupancy.json
  python tools/tune_caps.py --stats occupancy.json
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STRIDES = [1, 2, 4, 8, 16, 32, 64, 128, 256, 512]


def round128(x):
    return int(-(-x // 128) * 128)


def measure_scene(pts, voxel, vox_list, sel_frac, rng):
    """Occupancy of one scene: unique voxels per stride + per-class
    fine-map sizes (selected points re-voxelized at the class voxel
    size, x2 for voted + original coords — cagroup_head.py grouping)."""
    lat = np.floor(pts / voxel).astype(np.int64)
    per_stride = {}
    for s in STRIDES:
        ls = lat // s
        key = (ls[:, 0] << 42) + (ls[:, 1] << 21) + ls[:, 2]
        per_stride[s] = len(np.unique(key))
    nsel = int(len(pts) * sel_frac)
    sel = pts[rng.choice(len(pts), min(nsel, len(pts)), replace=False)]
    fine = []
    for vox_c in vox_list:
        lc = np.floor(sel / vox_c).astype(np.int64)
        key = (lc[:, 0] << 42) + (lc[:, 1] << 21) + lc[:, 2]
        fine.append(2 * len(np.unique(key)))
    return per_stride, fine


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--cfg_file", help="replay the real input pipeline")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="N synthetic ScanNet-statistics rooms")
    src.add_argument("--stats", help="occupancy stats JSON from "
                                     "--dump_stats")
    ap.add_argument("--num_samples", type=int, default=50)
    ap.add_argument("--percentile", type=float, default=99.0)
    ap.add_argument("--margin", type=float, default=1.2)
    ap.add_argument("--voxel", type=float, default=0.02)
    ap.add_argument("--n_classes", type=int, default=18)
    ap.add_argument("--sem_thr", type=float, default=0.05,
                    help="eval-time semantic threshold (worst case)")
    ap.add_argument("--sel_frac", type=float, default=0.3,
                    help="assumed fraction of voxels above the semantic "
                         "threshold per class (upper bound without a "
                         "trained model)")
    ap.add_argument("--dump_stats", metavar="FILE",
                    help="write the raw occupancy stats as JSON (feed "
                         "back later with --stats)")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    counts = {s: [] for s in STRIDES}
    fine_counts = []

    if args.stats:
        blob = json.load(open(args.stats))
        counts = {int(k): v for k, v in blob["per_stride"].items()}
        fine_counts = blob["fine"]
        n = blob["n_scenes"]
    else:
        from cagroup3d_tpu.models.dense_heads.cagroup_head import (
            SCANNET_VOXELS, SUNRGBD_VOXELS)
        n_cls = args.n_classes
        scenes = []
        if args.synthetic:
            from cagroup3d_tpu.utils.synthetic import synthetic_scene

            def scenes():
                for _ in range(args.synthetic):
                    pts, _ = synthetic_scene(rng, n_points=100_000,
                                             n_classes=n_cls)
                    yield pts[:, :3]
        else:
            from cagroup3d_tpu.config import cfg, cfg_from_yaml_file
            from cagroup3d_tpu.datasets import build_dataloader
            cfg_from_yaml_file(args.cfg_file, cfg)
            dataset, _, _ = build_dataloader(
                dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
                batch_size=1, training=False)
            args.voxel = float(cfg.MODEL.VOXEL_SIZE)
            n_cls = len(cfg.CLASS_NAMES)

            def scenes():
                for i in range(min(args.num_samples, len(dataset))):
                    yield dataset[i]["points"][:, :3]

        vox_list = np.clip(np.array(
            SCANNET_VOXELS if n_cls == 18 else SUNRGBD_VOXELS) / 2,
            0.04, 1.0)
        n = 0
        for pts in scenes():
            per_stride, fine = measure_scene(pts, args.voxel, vox_list,
                                             args.sel_frac, rng)
            for s in STRIDES:
                counts[s].append(per_stride[s])
            fine_counts.extend(fine)
            n += 1
        if n == 0:
            print("no samples readable; check DATA_PATH")
            return

    if args.dump_stats:
        json.dump(dict(n_scenes=n, per_stride=counts, fine=fine_counts),
                  open(args.dump_stats, "w"))
        print(f"# stats written to {args.dump_stats}", file=sys.stderr)

    p = args.percentile
    print(f"# measured over {n} scenes, P{p:.0f} x {args.margin}")
    print(f"INPUT_CAP: {round128(np.percentile(counts[1], p) * args.margin)}")
    print("BACKBONE_3D:\n  CAPS:")
    for s in STRIDES:
        v = round128(max(np.percentile(counts[s], p) * args.margin, 128))
        print(f"    {s}: {v}")
    fc = round128(np.percentile(fine_counts, p) * args.margin)
    print(f"DENSE_HEAD:\n  FINE_CAP: {fc}\n  EXPAND_CAP: {round128(fc / 3)}")


if __name__ == "__main__":
    main()
