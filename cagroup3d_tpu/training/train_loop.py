"""Training loop (rebuild of tools/train_utils/train_utils.py):
epoch loop with tqdm-style logging, per-iter timing meters, checkpoint
save/prune/auto-resume, LR from the optax schedule."""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .checkpoint import (latest_checkpoint, load_checkpoint,
                         prune_checkpoints, save_checkpoint)
from ..utils.metrics import LogBuffer, MetricsWriter


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = self.avg = 0.0

    def update(self, v, n=1):
        self.val = v
        self.sum += v * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def make_scanned_step(train_step, k: int):
    """Run k optimizer steps in ONE dispatch (lax.scan over stacked
    batches): through a remote-TPU tunnel, per-step output-handle round
    trips dominate wall time (~10x at full size); scanning amortizes
    them (measured 45 s/step dispatched -> 3.6 s/step device-bound)."""

    def scanned(params, state, opt_state, batches, rngs, epoch):
        def one(carry, xs):
            p, s, o = carry
            b, r = xs
            p, s, o, loss, tb = train_step(p, s, o, b, r, epoch)
            return (p, s, o), (loss, tb)
        (p, s, o), (losses, tbs) = jax.lax.scan(
            one, (params, state, opt_state), (batches, rngs))
        return p, s, o, losses[-1], {kk: v[-1] for kk, v in tbs.items()}

    return jax.jit(scanned)


def train_model(model, tx, schedule, train_step, params, state, opt_state,
                train_loader, total_epochs: int, ckpt_dir: str,
                logger, start_epoch: int = 0, start_it: int = 0,
                max_ckpt_save_num: int = 5, log_interval: int = 50,
                rng=None, metrics_path=None, steps_per_dispatch: int = 1):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    it = start_it
    metrics = MetricsWriter(metrics_path)
    log_buffer = LogBuffer()
    k_scan = max(int(steps_per_dispatch), 1)
    scanned_step = make_scanned_step(train_step, k_scan) if k_scan > 1 \
        else None
    pending = []
    for epoch in range(start_epoch, total_epochs):
        train_loader.set_epoch(epoch)
        data_meter, batch_meter = AverageMeter(), AverageMeter()
        t_end = time.time()
        for batch_np in train_loader:
            data_time = time.time() - t_end
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                     if k != "frame_id"}
            rng, sub = jax.random.split(rng)
            if scanned_step is not None:
                pending.append((batch, sub))
                if len(pending) < k_scan:
                    t_end = time.time()
                    continue
                batches = jax.tree.map(lambda *xs: jnp.stack(xs),
                                       *[b for b, _ in pending])
                rngs = jnp.stack([r for _, r in pending])
                pending = []
                params, state, opt_state, loss, tb = scanned_step(
                    params, state, opt_state, batches, rngs,
                    jnp.float32(epoch))
                it += k_scan
            else:
                params, state, opt_state, loss, tb = train_step(
                    params, state, opt_state, batch, sub, jnp.float32(epoch))
                it += 1
            batch_time = time.time() - t_end
            t_end = time.time()
            data_meter.update(data_time)
            batch_meter.update(batch_time)
            if it % log_interval == 0 or it == 1:
                loss_v = float(loss)  # host sync point
                lr = float(schedule(it))
                tb_s = {k: round(float(v), 4) for k, v in tb.items()}
                log_buffer.update(tb_s)
                log_buffer.average(log_interval)
                metrics.write(it, dict(loss=loss_v, lr=lr, **tb_s),
                              prefix="train/")
                logger.info(
                    f"epoch {epoch} it {it} loss {loss_v:.4f} lr {lr:.2e} "
                    f"d_time {data_meter.avg:.3f} b_time {batch_meter.avg:.3f} "
                    f"{log_buffer.output}")
        # checkpoint
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"checkpoint_epoch_{epoch + 1}.pkl")
        save_checkpoint(path, params, state, opt_state, epoch + 1, it)
        prune_checkpoints(ckpt_dir, keep=max_ckpt_save_num)
        logger.info(f"saved {path}")
    metrics.close()
    return params, state, opt_state, it


def auto_resume(ckpt_dir: str, params, state, opt_state, logger):
    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return params, state, opt_state, 0, 0
    ckpt = load_checkpoint(path)
    logger.info(f"auto-resuming from {path} (epoch {ckpt['epoch']})")
    return (ckpt["params"], ckpt["state"],
            ckpt["opt_state"] if ckpt["opt_state"] is not None else opt_state,
            ckpt["epoch"], ckpt["it"])
