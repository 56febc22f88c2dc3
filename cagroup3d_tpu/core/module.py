"""Lightweight functional module system.

Parameters live in a single flat dict ``{path: array}`` with paths named
after the reference's torch ``state_dict`` keys (e.g.
``backbone_3d.layer1.0.conv1.kernel``).  This keeps the whole model a
plain pytree (pjit/optax friendly) and makes reference-checkpoint
conversion a key-for-key mapping.  Trainable parameters and batch-norm
running statistics are kept in two separate flat dicts ("params" /
"state"); apply functions record state updates on a `Ctx` object that is
threaded through the forward pass.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .norm import masked_batch_norm

Params = Dict[str, jnp.ndarray]


class Ctx:
    """Per-call context: train flag, BN cross-batch axis, rng, BN updates."""

    def __init__(self, train: bool = False, axis_name: Optional[str] = None,
                 rng: Optional[jax.Array] = None):
        self.train = train
        self.axis_name = axis_name
        self.updates: Params = {}
        # traced runtime counters (e.g. capacity-overflow drops); merged
        # into tb_dict / eval warnings by the detectors
        self.stats: Params = {}
        self._rng = rng
        # scene-axis folding (core/scene_fold.py): when this ctx lives
        # inside the detector's per-scene vmap (axis_name set), conv
        # gathers fold the batch axis into flat tables.  custom_vmap
        # does not support UNBATCHED reverse-mode AD, so the fold is
        # gated on actually being vmapped.
        self.scene_fold = axis_name is not None

    def next_rng(self) -> jax.Array:
        assert self._rng is not None, "Ctx needs an rng for stochastic ops"
        self._rng, sub = jax.random.split(self._rng)
        return sub


def merge_state(state: Params, updates: Params) -> Params:
    out = dict(state)
    out.update(updates)
    return out


# ---------------------------------------------------------------------------
# Initializers (match the reference's torch/ME init choices).
# ---------------------------------------------------------------------------

def kaiming_conv(rng, k3: int, cin: int, cout: int, dtype=jnp.float32):
    """ME.utils.kaiming_normal_(kernel, mode='fan_out', nonlinearity='relu')
    (biresnet.py:329): std = sqrt(2 / fan_out), fan_out = k3 * cout."""
    std = math.sqrt(2.0 / (k3 * cout))
    return jax.random.normal(rng, (k3, cin, cout), dtype) * std

def normal_conv(rng, k3: int, cin: int, cout: int, std=0.01, dtype=jnp.float32):
    return jax.random.normal(rng, (k3, cin, cout), dtype) * std

def me_default_conv(rng, k3: int, cin: int, cout: int, dtype=jnp.float32):
    """ME MinkowskiConvolution default init: kaiming_uniform-ish over
    fan = k3*cin."""
    bound = math.sqrt(1.0 / (k3 * cin))
    return jax.random.uniform(rng, (k3, cin, cout), dtype, -bound, bound)

def xavier_linear(rng, cin: int, cout: int, dtype=jnp.float32):
    std = math.sqrt(2.0 / (cin + cout))
    return jax.random.normal(rng, (cin, cout), dtype) * std

def normal_linear(rng, cin: int, cout: int, std=0.001, dtype=jnp.float32):
    return jax.random.normal(rng, (cin, cout), dtype) * std


def init_conv(params: Params, rng, path: str, k: int, cin: int, cout: int,
              bias: bool = False, init: str = "me") -> None:
    k3 = k ** 3
    if init == "kaiming":
        params[path + ".kernel"] = kaiming_conv(rng, k3, cin, cout)
    elif init == "normal":
        params[path + ".kernel"] = normal_conv(rng, k3, cin, cout)
    else:
        params[path + ".kernel"] = me_default_conv(rng, k3, cin, cout)
    if bias:
        params[path + ".bias"] = jnp.zeros((cout,))


def init_bn(params: Params, state: Params, path: str, c: int) -> None:
    params[path + ".weight"] = jnp.ones((c,))
    params[path + ".bias"] = jnp.zeros((c,))
    state[path + ".running_mean"] = jnp.zeros((c,))
    state[path + ".running_var"] = jnp.ones((c,))


def init_linear(params: Params, rng, path: str, cin: int, cout: int,
                bias: bool = True, init: str = "xavier") -> None:
    if init == "xavier":
        params[path + ".weight"] = xavier_linear(rng, cin, cout)
    elif init == "normal":
        params[path + ".weight"] = normal_linear(rng, cin, cout)
    else:
        bound = math.sqrt(1.0 / cin)
        params[path + ".weight"] = jax.random.uniform(
            rng, (cin, cout), jnp.float32, -bound, bound)
    if bias:
        params[path + ".bias"] = jnp.zeros((cout,))


# ---------------------------------------------------------------------------
# Apply helpers.
# ---------------------------------------------------------------------------

def apply_bn(params: Params, state: Params, ctx: Ctx, path: str,
             x: jnp.ndarray, mask: jnp.ndarray, momentum: float = 0.1,
             eps: float = 1e-5) -> jnp.ndarray:
    y, (rm, rv) = masked_batch_norm(
        x, mask, params[path + ".weight"], params[path + ".bias"],
        state[path + ".running_mean"], state[path + ".running_var"],
        train=ctx.train, momentum=momentum, eps=eps,
        axis_name=ctx.axis_name)
    if ctx.train:
        ctx.updates[path + ".running_mean"] = rm
        ctx.updates[path + ".running_var"] = rv
    return y


def apply_linear(params: Params, path: str, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ params[path + ".weight"]
    b = params.get(path + ".bias")
    return y + b if b is not None else y


def dropout(ctx: Ctx, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    if not ctx.train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
