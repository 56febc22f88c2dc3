"""Optimizer + LR schedule (reference tools/train_utils/optimization/):
adam/adamW/sgd with LambdaLR-style step decay at DECAY_STEP_LIST epochs
x LR_DECAY, optional linear warmup, global-norm gradient clipping."""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import optax


def build_lr_schedule(opt_cfg, steps_per_epoch: int):
    base_lr = float(opt_cfg.LR)
    decay_steps: List[int] = [int(e) * steps_per_epoch
                              for e in opt_cfg.get("DECAY_STEP_LIST", [])]
    decay = float(opt_cfg.get("LR_DECAY", 0.1))
    lr_clip = float(opt_cfg.get("LR_CLIP", 1e-7))
    warmup = bool(opt_cfg.get("LR_WARMUP", False))
    warmup_steps = int(opt_cfg.get("WARMUP_EPOCH", 1)) * steps_per_epoch

    def schedule(step):
        factor = jnp.ones((), jnp.float32)
        for ds in decay_steps:
            factor = jnp.where(step >= ds, factor * decay, factor)
        lr = jnp.maximum(base_lr * factor, lr_clip)
        if warmup:
            w = jnp.clip((step + 1) / max(warmup_steps, 1), 0.0, 1.0)
            lr = lr * w
        return lr

    return schedule


def build_optimizer(opt_cfg, steps_per_epoch: int):
    schedule = build_lr_schedule(opt_cfg, steps_per_epoch)
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))
    if name in ("adamW", "adamw"):
        tx = optax.adamw(schedule, weight_decay=wd)
    elif name in ("adam", "adam_onecycle"):
        tx = optax.adam(schedule)
    elif name == "sgd":
        tx = optax.sgd(schedule, momentum=float(opt_cfg.get("MOMENTUM", 0.9)))
    else:
        raise NotImplementedError(name)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule
