"""Static-shape sparse voxel tensor for TPU.

This is the TPU-native replacement for MinkowskiEngine's ``SparseTensor``
(reference: pcdet/models/detectors/cagroup3d.py:18-25 creates one from raw
points; every backbone/head op consumes them).  Instead of a dynamic
coordinate manager we use *fixed-capacity padded arrays*: a tensor holds up
to ``cap`` voxels, of which the first/arbitrary subset is ``valid``.  All
engine ops (conv, pool, interpolation, re-voxelization) preserve static
shapes so the whole model compiles to a single XLA program.

Coordinates are kept in "lattice units scaled by stride" exactly like
MinkowskiEngine: a tensor at ``stride=s`` has integer coords that are
multiples of ``s``.  Batch handling is done OUTSIDE this structure: one
SparseTensor per scene, batched via ``jax.vmap`` (the TPU-idiomatic way to
express the reference's batch-index column).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

# Coordinates of invalid (padding) rows.  Chosen so that any kernel offset
# added to it stays far outside the packable range -> lookups always miss.
PAD_COORD = jnp.int32(1 << 20)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SparseTensor:
    """A fixed-capacity sparse voxel tensor (single scene).

    Attributes:
      coords: i32[cap, 3] voxel coordinates (multiples of ``stride``);
        padding rows hold PAD_COORD.
      feats:  f32[cap, C] features; padding rows are zero.
      valid:  bool[cap] row-validity mask.
      stride: static int tensor stride (ME ``tensor_stride``).
    """

    coords: jnp.ndarray
    feats: jnp.ndarray
    valid: jnp.ndarray
    stride: int = dataclasses.field(metadata=dict(static=True))

    @property
    def cap(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    def with_feats(self, feats: jnp.ndarray) -> "SparseTensor":
        """New tensor sharing coords/valid with different features."""
        return SparseTensor(self.coords, feats, self.valid, self.stride)

    def masked_feats(self) -> jnp.ndarray:
        return jnp.where(self.valid[:, None], self.feats, 0.0)


def make_empty(cap: int, channels: int, stride: int = 1,
               dtype=jnp.float32) -> SparseTensor:
    return SparseTensor(
        coords=jnp.full((cap, 3), PAD_COORD, dtype=jnp.int32),
        feats=jnp.zeros((cap, channels), dtype=dtype),
        valid=jnp.zeros((cap,), dtype=bool),
        stride=stride,
    )
