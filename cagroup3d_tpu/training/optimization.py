"""Optimizer + LR schedule (reference tools/train_utils/optimization/):
adam/adamW/sgd with LambdaLR-style step decay at DECAY_STEP_LIST epochs
x LR_DECAY, optional cosine warmup, adam_onecycle (fastai OneCycle lr +
momentum annealing, fastai_optim.py / learning_schedules_fastai.py),
global-norm gradient clipping."""
from __future__ import annotations

from typing import List

import jax.numpy as jnp
import optax


def _annealing_cos(start, end, pct):
    """learning_schedules_fastai.py:55-59."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_schedules(opt_cfg, total_steps: int):
    """OneCycle lr + momentum schedules (learning_schedules_fastai.py:61-79):
    cosine lr_max/div -> lr_max over PCT_START, then lr_max -> lr_max/div/1e4;
    momentum moms[0] -> moms[1] and back."""
    lr_max = float(opt_cfg.LR)
    moms = [float(m) for m in opt_cfg.get("MOMS", [0.95, 0.85])]
    div = float(opt_cfg.get("DIV_FACTOR", 10.0))
    pct = float(opt_cfg.get("PCT_START", 0.4))
    a1 = int(total_steps * pct)
    a2 = max(total_steps - a1, 1)
    low_lr = lr_max / div

    def lr_fn(step):
        p1 = jnp.clip(step / max(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        up = _annealing_cos(low_lr, lr_max, p1)
        down = _annealing_cos(lr_max, low_lr / 1e4, p2)
        return jnp.where(step < a1, up, down)

    def mom_fn(step):
        p1 = jnp.clip(step / max(a1, 1), 0.0, 1.0)
        p2 = jnp.clip((step - a1) / a2, 0.0, 1.0)
        up = _annealing_cos(moms[0], moms[1], p1)
        down = _annealing_cos(moms[1], moms[0], p2)
        return jnp.where(step < a1, up, down)

    return lr_fn, mom_fn


def build_lr_schedule(opt_cfg, steps_per_epoch: int, total_epochs: int = 0):
    base_lr = float(opt_cfg.LR)
    if opt_cfg.OPTIMIZER == "adam_onecycle":
        total = max(int(total_epochs) * steps_per_epoch, 1)
        return onecycle_schedules(opt_cfg, total)[0]
    decay_steps: List[int] = [int(e) * steps_per_epoch
                              for e in opt_cfg.get("DECAY_STEP_LIST", [])]
    decay = float(opt_cfg.get("LR_DECAY", 0.1))
    lr_clip = float(opt_cfg.get("LR_CLIP", 1e-7))
    warmup = bool(opt_cfg.get("LR_WARMUP", False))
    warmup_steps = max(int(opt_cfg.get("WARMUP_EPOCH", 1)) * steps_per_epoch,
                       1)
    eta_min = base_lr / float(opt_cfg.get("DIV_FACTOR", 10.0))

    def schedule(step):
        factor = jnp.ones((), jnp.float32)
        for ds in decay_steps:
            factor = jnp.where(step >= ds, factor * decay, factor)
        lr = jnp.maximum(base_lr * factor, lr_clip)
        if warmup:
            # CosineWarmupLR (optimization/__init__.py:59-63): cosine ramp
            # eta_min -> lr over WARMUP_EPOCH epochs
            p = jnp.clip(step / warmup_steps, 0.0, 1.0)
            w = eta_min + (lr - eta_min) * (1.0 - jnp.cos(jnp.pi * p)) / 2.0
            lr = jnp.where(step < warmup_steps, w, lr)
        return lr

    return schedule


def build_optimizer(opt_cfg, steps_per_epoch: int, total_epochs: int = 0):
    name = opt_cfg.OPTIMIZER
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))
    if name == "adam_onecycle":
        # reference: Adam(betas=(0.9, 0.99)) under fastai OptimWrapper with
        # true (decoupled) weight decay; OneCycle drives lr AND beta1
        total = max(int(total_epochs) * steps_per_epoch, 1)
        lr_fn, mom_fn = onecycle_schedules(opt_cfg, total)

        @optax.inject_hyperparams
        def _adam(learning_rate, b1):
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale_by_adam(b1=b1, b2=0.99),
                optax.scale_by_learning_rate(learning_rate),
            )

        tx = _adam(learning_rate=lr_fn, b1=mom_fn)
        schedule = lr_fn
    else:
        schedule = build_lr_schedule(opt_cfg, steps_per_epoch, total_epochs)
        if name in ("adamW", "adamw"):
            tx = optax.adamw(schedule, weight_decay=wd)
        elif name == "adam":
            tx = optax.adam(schedule)
        elif name == "sgd":
            tx = optax.sgd(schedule,
                           momentum=float(opt_cfg.get("MOMENTUM", 0.9)))
        else:
            raise NotImplementedError(name)
    if clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx, schedule
