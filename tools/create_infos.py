"""Dataset preparation CLI (reference: the per-dataset ``__main__``
blocks, e.g. ``python -m pcdet.datasets.kitti.kitti_dataset
create_kitti_infos tools/cfgs/dataset_configs/kitti_dataset.yaml``).

Usage:
    python tools/create_infos.py --dataset kitti \
        --data_path data/kitti [--save_path ...] \
        [--class_names Car Pedestrian Cyclist]

Generates kitti_infos_{train,val,trainval,test}.pkl and the
gt-sampling database (gt_database/ + kitti_dbinfos_train.pkl) from a
raw KITTI tree (ImageSets/, training/{velodyne,calib,label_2,image_2}).

nuScenes/Waymo/Lyft/Pandaset info generation requires the vendor
devkits (nuscenes-devkit, waymo-open-dataset, lyft_dataset_sdk,
pandaset-devkit), which do not ship in this environment; those datasets
consume pre-generated pcdet info pickles (see each dataset's docstring).
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="kitti",
                        choices=["kitti"])
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--save_path", type=str, default=None)
    parser.add_argument("--class_names", type=str, nargs="+",
                        default=["Car", "Pedestrian", "Cyclist"])
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    from cagroup3d_tpu.utils.common_utils import create_logger
    logger = create_logger()
    if args.dataset == "kitti":
        from cagroup3d_tpu.datasets.kitti_infos import create_kitti_infos
        create_kitti_infos(args.data_path, args.save_path,
                           workers=args.workers,
                           class_names=args.class_names, logger=logger)


if __name__ == "__main__":
    main()
