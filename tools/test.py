"""Evaluation CLI (rebuild of reference tools/test.py): single checkpoint
or --eval_all watcher over the checkpoint dir."""
import argparse
import datetime
import glob
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--dist", action="store_true", default=False,
                        help="multi-host eval (jax.distributed)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--eval_all", action="store_true", default=False)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from cagroup3d_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def eval_ckpt(args, cfg, ckpt_path, model, eval_step, dataset, loader,
              logger, result_dir, epoch_id):
    import jax
    from cagroup3d_tpu.training.checkpoint import load_checkpoint
    from cagroup3d_tpu.training.eval_utils import eval_one_epoch

    ck = load_checkpoint(ckpt_path)
    params, state = ck["params"], ck["state"]
    logger.info(f"loaded {ckpt_path} (epoch {ck.get('epoch')})")
    return eval_one_epoch(model, eval_step, params, state, dataset, loader,
                          epoch_id, logger, result_dir=result_dir,
                          class_names=cfg.CLASS_NAMES, dist=args.dist)


def main():
    args, cfg = parse_config()
    import jax
    from cagroup3d_tpu.datasets import build_dataloader
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.parallel import make_mesh, make_eval_step
    from cagroup3d_tpu.utils.common_utils import create_logger

    if args.dist:
        jax.distributed.initialize()
    from cagroup3d_tpu.utils.common_utils import get_dist_info
    rank, world_size = get_dist_info()

    batch_size = args.batch_size or 1
    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / "eval"
    eval_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(
        eval_dir / f"log_eval_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt")

    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, logger=logger, training=False,
        rank=rank, world_size=world_size)

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    eval_step = make_eval_step(model)

    if args.eval_all:
        ckpt_dir = Path(args.ckpt_dir or (output_dir / "ckpt"))
        evaluated = set()
        wait_start = time.time()
        while True:
            cands = sorted(glob.glob(str(ckpt_dir / "checkpoint_epoch_*.pkl")),
                           key=os.path.getmtime)
            todo = [c for c in cands if c not in evaluated and
                    int(re.findall(r"epoch_(\d+)", c)[0]) > args.start_epoch]
            if not todo:
                if time.time() - wait_start > args.max_waiting_mins * 60:
                    break
                time.sleep(30)
                continue
            wait_start = time.time()
            for c in todo:
                epoch_id = int(re.findall(r"epoch_(\d+)", c)[0])
                eval_ckpt(args, cfg, c, model, eval_step, dataset, loader,
                          logger, eval_dir / f"epoch_{epoch_id}", epoch_id)
                evaluated.add(c)
    else:
        assert args.ckpt is not None, "--ckpt required without --eval_all"
        eval_ckpt(args, cfg, args.ckpt, model, eval_step, dataset, loader,
                  logger, eval_dir, epoch_id=cfg.OPTIMIZATION.NUM_EPOCHS)


if __name__ == "__main__":
    main()
