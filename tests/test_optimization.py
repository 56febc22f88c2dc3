"""LR schedule parity with the reference curves
(tools/train_utils/optimization/learning_schedules_fastai.py)."""
import numpy as np
import jax.numpy as jnp
import optax
import pytest

from cagroup3d_tpu.config import EasyDict
from cagroup3d_tpu.training.optimization import (build_lr_schedule,
                                                 build_optimizer,
                                                 onecycle_schedules)


def annealing_cos_np(start, end, pct):
    return end + (start - end) / 2.0 * (np.cos(np.pi * pct) + 1.0)


def test_onecycle_matches_closed_form():
    cfg = EasyDict(dict(OPTIMIZER="adam_onecycle", LR=3e-3, MOMS=[0.95, 0.85],
                        DIV_FACTOR=10.0, PCT_START=0.4, WEIGHT_DECAY=0.01))
    total = 1000
    lr_fn, mom_fn = onecycle_schedules(cfg, total)
    a1 = int(total * 0.4)
    low = 3e-3 / 10.0
    for step in [0, 100, a1 - 1, a1, a1 + 1, 700, total - 1]:
        if step < a1:
            lr_ref = annealing_cos_np(low, 3e-3, step / a1)
            mom_ref = annealing_cos_np(0.95, 0.85, step / a1)
        else:
            p = (step - a1) / (total - a1)
            lr_ref = annealing_cos_np(3e-3, low / 1e4, p)
            mom_ref = annealing_cos_np(0.85, 0.95, p)
        np.testing.assert_allclose(float(lr_fn(step)), lr_ref, rtol=1e-4)
        np.testing.assert_allclose(float(mom_fn(step)), mom_ref, rtol=1e-4)
    # shape: rises then falls, ends tiny
    lrs = np.array([float(lr_fn(s)) for s in range(0, total, 20)])
    assert lrs.argmax() == np.abs(np.arange(0, total, 20) - a1).argmin()
    assert float(lr_fn(total - 1)) < low / 100


def test_onecycle_optimizer_steps():
    cfg = EasyDict(dict(OPTIMIZER="adam_onecycle", LR=3e-3, MOMS=[0.95, 0.85],
                        DIV_FACTOR=10.0, PCT_START=0.4, WEIGHT_DECAY=0.01,
                        GRAD_NORM_CLIP=10.0))
    tx, sched = build_optimizer(cfg, steps_per_epoch=10, total_epochs=10)
    params = {"w": jnp.ones((4,))}
    st = tx.init(params)
    g = {"w": jnp.full((4,), 0.1)}
    for _ in range(3):
        upd, st = tx.update(g, st, params)
        params = optax.apply_updates(params, upd)
    assert np.isfinite(np.asarray(params["w"])).all()


def test_step_decay_with_cosine_warmup():
    cfg = EasyDict(dict(OPTIMIZER="adamW", LR=1e-3, WEIGHT_DECAY=1e-4,
                        DECAY_STEP_LIST=[7, 9], LR_DECAY=0.1, LR_CLIP=1e-7,
                        LR_WARMUP=True, WARMUP_EPOCH=1, DIV_FACTOR=10.0))
    spe = 100
    sched = build_lr_schedule(cfg, spe, total_epochs=10)
    # cosine ramp from LR/DIV to LR over the first epoch
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(50)),
                               1e-4 + (1e-3 - 1e-4) * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-5)
    # step decay at epochs 7 and 9
    np.testing.assert_allclose(float(sched(7 * spe)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(9 * spe)), 1e-5, rtol=1e-5)
