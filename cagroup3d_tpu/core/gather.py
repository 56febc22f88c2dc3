"""Fast gather formulations for TPU.

XLA lowers UNBATCHED gathers (jnp.take of a rank-1 array, or of rows
narrower than a lane) to a pathological path on TPU — measured on v5e:
``jnp.take(f32[100k, 3], i32[65536], axis=0)`` = 369 ms and
``jnp.take(i32[100k], i32[65536])`` = 41 ms, while the IDENTICAL gather
expressed with a unit leading batch dimension via take_along_axis runs
in ~2 ms.  Every hot-path gather should go through these helpers.

(Under vmap the batch dim exists anyway, so these are equally correct
and fast in batched training.)
"""
from __future__ import annotations

import jax.numpy as jnp


def take1(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """a [N] gathered at idx [...] -> [...]; unit-batch take_along_axis."""
    flat = idx.reshape(-1)
    out = jnp.take_along_axis(a[None], flat[None], axis=1)[0]
    return out.reshape(idx.shape)


def take_rows(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """a [N, C] row-gathered at idx [...] -> [..., C]."""
    flat = idx.reshape(-1)
    out = jnp.take_along_axis(a[None], flat[None, :, None], axis=1)[0]
    return out.reshape(idx.shape + (a.shape[-1],))
