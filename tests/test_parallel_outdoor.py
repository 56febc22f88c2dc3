"""Multi-chip (8-device CPU mesh) pjit training/eval for the OUTDOOR
stack: the full dp-sharded train step (replicated params, batch-sharded
scenes, psum'd grads via jit partitioning) runs and updates params for
SECOND and CenterPoint; eval matches the unsharded result."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from cagroup3d_tpu.models import build_network
from cagroup3d_tpu.parallel import (batch_sharding, make_eval_step,
                                    make_mesh, make_train_step)
from test_centerpoint import centerpoint_cfg
from test_outdoor import outdoor_batch, second_cfg


def _shard(batch, mesh):
    dp = batch_sharding(mesh)
    return {k: jax.device_put(v, dp) for k, v in batch.items()}


@pytest.mark.parametrize("cfg_fn", [second_cfg, centerpoint_cfg],
                         ids=["second", "centerpoint"])
def test_outdoor_pjit_train_step(cfg_fn, rng):
    mesh = make_mesh()
    model = build_network(cfg_fn(), num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(P)
    batch = outdoor_batch(rng, B=8, P=1024)
    with mesh:
        step = make_train_step(model, tx, mesh=mesh, donate=False)
        P2, S2, opt2, loss, tb = step(P, S, opt, _shard(batch, mesh),
                                      jax.random.PRNGKey(1), 0.0)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in tb.items()}
    # params actually moved
    moved = sum(float(jnp.abs(P2[k] - P[k]).sum()) for k in P)
    assert moved > 0


def test_outdoor_pjit_eval_matches_unsharded(rng):
    mesh = make_mesh()
    model = build_network(second_cfg(), num_class=2)
    P, S = model.init(jax.random.PRNGKey(0))
    batch = outdoor_batch(rng, B=8, P=1024)
    ref = jax.jit(model.forward_eval)(P, S, batch)
    with mesh:
        step = make_eval_step(model, mesh=mesh)
        got = step(P, S, _shard(batch, mesh), 0.0)
    for k in ("pred_boxes", "pred_scores"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-4, atol=1e-4)
