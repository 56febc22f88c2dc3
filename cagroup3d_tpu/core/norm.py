"""Masked batch norm + activations over valid voxels.

Replaces ME.MinkowskiBatchNorm (torch BN1d over the voxel axis,
biresnet.py:5) with a mask-aware functional version.  Training statistics
are computed over valid voxels only and, when an ``axis_name`` is bound
(vmap over scenes / pjit data-parallel axis), reduced across it with psum —
giving SyncBatchNorm semantics by default (the reference only gets this
with --sync_bn, train.py:118).

Running stats follow torch convention: running = (1-m)*running + m*batch,
momentum 0.1 (biresnet.py:6), unbiased variance in the running buffer,
biased in the normalizer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def masked_batch_norm(x: jnp.ndarray, mask: jnp.ndarray, weight, bias,
                      running_mean, running_var, train: bool,
                      momentum: float = 0.1, eps: float = 1e-5,
                      axis_name: Optional[str] = None):
    """Returns (y, (new_running_mean, new_running_var))."""
    m = mask.astype(x.dtype)[:, None]
    if train:
        cnt = jnp.sum(m)
        s = jnp.sum(x * m, axis=0)
        ss = jnp.sum(x * x * m, axis=0)
        if axis_name is not None:
            cnt = jax.lax.psum(cnt, axis_name)
            s = jax.lax.psum(s, axis_name)
            ss = jax.lax.psum(ss, axis_name)
        cnt = jnp.maximum(cnt, 1.0)
        mean = s / cnt
        var = jnp.maximum(ss / cnt - mean * mean, 0.0)
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        new_rm = (1 - momentum) * running_mean + momentum * mean
        new_rv = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean, running_var
        new_rm, new_rv = running_mean, running_var
    y = (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias
    return jnp.where(mask[:, None], y, 0.0), (new_rm, new_rv)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)
