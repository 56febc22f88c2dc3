"""Training CLI (rebuild of reference tools/train.py).

Single-host usage (all local TPU chips form the dp mesh automatically):
  python tools/train.py --cfg_file tools/cfgs/scannet_models/CAGroup3D.yaml
Multi-host: launch one process per host with --dist and jax.distributed
coordinator env vars; the mesh then spans all hosts over ICI/DCN.
"""
import argparse
import datetime
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, default=None,
                        help="specify the config for training")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--fix_random_seed", action="store_true",
                        default=True)
    parser.add_argument("--max_ckpt_save_num", type=int, default=5)
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="optimizer steps per device dispatch "
                             "(lax.scan; amortizes host round trips "
                             "through remote-TPU tunnels)")
    parser.add_argument("--dist", action="store_true", default=False,
                        help="multi-host: call jax.distributed.initialize")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from cagroup3d_tpu.config import (cfg, cfg_from_list, cfg_from_yaml_file)
    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    import jax
    import jax.numpy as jnp

    if args.dist:
        jax.distributed.initialize()

    from cagroup3d_tpu.datasets import build_dataloader
    from cagroup3d_tpu.models import build_network
    from cagroup3d_tpu.parallel import make_mesh, make_train_step
    from cagroup3d_tpu.training.optimization import build_optimizer
    from cagroup3d_tpu.training.train_loop import auto_resume, train_model
    from cagroup3d_tpu.training.checkpoint import load_checkpoint
    from cagroup3d_tpu.utils.common_utils import (create_logger,
                                                  get_dist_info,
                                                  set_random_seed)

    rank, world = get_dist_info()
    batch_size = args.batch_size or \
        cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * len(jax.local_devices())
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    output_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / \
        f"log_train_{datetime.datetime.now():%Y%m%d-%H%M%S}.txt"
    logger = create_logger(log_file, rank=rank)
    logger.info(f"devices: {jax.devices()}, batch_size(global/host): "
                f"{batch_size}")

    if args.fix_random_seed:
        set_random_seed(0)

    dataset, train_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, logger=logger, training=True,
        rank=rank, world_size=world)

    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES), dataset=dataset)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    if args.ckpt is not None:
        ck = load_checkpoint(args.ckpt)
        params, state = ck["params"], ck["state"]

    steps_per_epoch = max(len(train_loader), 1)
    tx, schedule = build_optimizer(cfg.OPTIMIZATION, steps_per_epoch,
                               total_epochs=epochs)
    opt_state = tx.init(params)

    params, state, opt_state, start_epoch, start_it = auto_resume(
        str(ckpt_dir), params, state, opt_state, logger)

    mesh = make_mesh()
    train_step = make_train_step(model, tx, mesh=mesh)

    logger.info("**********************Start training**********************")
    from cagroup3d_tpu.utils.metrics import profile_ctx
    with mesh, profile_ctx(args.profile_dir):
        train_model(model, tx, schedule, train_step, params, state,
                    opt_state, train_loader, epochs, str(ckpt_dir), logger,
                    start_epoch=start_epoch, start_it=start_it,
                    max_ckpt_save_num=args.max_ckpt_save_num,
                    metrics_path=str(output_dir / "metrics.jsonl"),
                    steps_per_dispatch=args.steps_per_dispatch)
    logger.info("**********************End training**********************")


if __name__ == "__main__":
    main()
