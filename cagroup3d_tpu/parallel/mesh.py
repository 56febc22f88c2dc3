"""Device mesh + pjit train/eval steps.

TPU-native replacement for the reference's DistributedDataParallel +
NCCL stack (tools/train.py:142-144, pcdet/utils/common_utils.py:135-177):
a 1-D "dp" mesh over all chips, batch sharded on its leading axis,
parameters replicated.  XLA inserts the gradient all-reduces over ICI;
BatchNorm statistics and loss normalizers are computed with jnp
reductions over the (globally sharded) scene axis, so they are
cross-replica by construction — SyncBN semantics without a wrapper.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np
    return Mesh(np.array(devices), ("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh):
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def make_train_step(model, tx, mesh: Optional[Mesh] = None,
                    donate: bool = True, nan_guard: Optional[bool] = None):
    """Returns jitted step(params, state, opt_state, batch, rng, cur_epoch)
    -> (params, state, opt_state, loss, tb).

    nan_guard (or env CAGROUP_NAN_GUARD=1): wrap the whole step in
    ``checkify`` float checks — every op is instrumented for nan/inf and
    the step RAISES with the op's source location on the first
    non-finite value (SURVEY §5's debugging-hooks plan; the reference
    has no analogue).  Debug mode: adds per-step host sync + compile
    cost, and runs without explicit shardings/donation.
    """
    if nan_guard is None:
        import os
        nan_guard = os.environ.get("CAGROUP_NAN_GUARD") == "1"

    def step(params, state, opt_state, batch, rng, cur_epoch):
        def loss_fn(p):
            loss, tb, upd = model.forward_train(p, state, batch, rng,
                                                cur_epoch)
            return loss, (tb, upd)

        (loss, (tb, upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_state = dict(state)
        new_state.update(upd)
        return params, new_state, opt_state, loss, tb

    if nan_guard:
        from jax.experimental import checkify
        checked = jax.jit(checkify.checkify(
            step, errors=checkify.float_checks))

        def guarded(*args):
            err, out = checked(*args)
            err.throw()   # raises ValueError w/ source location on nan/inf
            return out

        return guarded

    kwargs = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        dp = batch_sharding(mesh)
        kwargs = dict(
            in_shardings=(rep, rep, rep, dp, rep, rep),
            out_shardings=(rep, rep, rep, rep, rep),
        )
    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums, **kwargs)


def make_eval_step(model, mesh: Optional[Mesh] = None):
    def step(params, state, batch, cur_epoch):
        return model.forward_eval(params, state, batch, cur_epoch)

    kwargs = {}
    if mesh is not None:
        rep = replicated_sharding(mesh)
        dp = batch_sharding(mesh)
        kwargs = dict(in_shardings=(rep, rep, dp, rep), out_shardings=dp)
    return jax.jit(step, **kwargs)
