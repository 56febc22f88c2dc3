"""Sparse -> dense BEV (reference pcdet/models/backbones_2d/map_to_bev_
module/height_compression.py + pointpillar_scatter.py).

HeightCompression: scatter the final sparse level into a dense
[D, H, W, C] grid and fold D into channels -> [H, W, D*C] (NHWC; the
reference's NCHW [C*D, H, W] is a layout choice only).
PointPillarScatter: pillars -> [H, W, C].
Per-scene; batch via vmap.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...core.module import Ctx, Params
from ...core.sparse import SparseTensor


def _scatter_dense(st: SparseTensor, grid_dhw, C):
    """coords (x, y, z) lattice -> dense [D(z), H(y), W(x), C]."""
    D, H, W = grid_dhw
    x, y, z = st.coords[:, 0], st.coords[:, 1], st.coords[:, 2]
    ok = st.valid & (x >= 0) & (x < W) & (y >= 0) & (y < H) & \
        (z >= 0) & (z < D)
    flat = jnp.where(ok, (z * H + y) * W + x, D * H * W)
    dense = jnp.zeros((D * H * W + 1, C), st.feats.dtype).at[flat].set(
        jnp.where(ok[:, None], st.feats, 0.0))[:-1]
    return dense.reshape(D, H, W, C)


class HeightCompression:
    def __init__(self, model_cfg, grid_size=None, **kwargs):
        self.num_bev_features = int(model_cfg.NUM_BEV_FEATURES)
        # final sparse grid dims (x, y, z) AFTER the backbone's stride-8 +
        # z-compression; from the dataset grid in the detector
        self.grid_size = None if grid_size is None else tuple(grid_size)

    def init(self, rng, prefix="map_to_bev") -> Tuple[Params, Params]:
        return {}, {}

    def __call__(self, P, S, ctx: Ctx, st: SparseTensor, grid_xyz,
                 prefix="map_to_bev"):
        """grid_xyz: (W, H, D) of the final sparse lattice."""
        W, H, D = grid_xyz
        C = st.num_channels
        dense = _scatter_dense(st, (D, H, W), C)       # [D, H, W, C]
        bev = jnp.transpose(dense, (1, 2, 0, 3)).reshape(H, W, D * C)
        assert D * C == self.num_bev_features, (D, C, self.num_bev_features)
        return bev                                      # [H, W, D*C]


class PointPillarScatter:
    def __init__(self, model_cfg, grid_size=None, **kwargs):
        self.num_bev_features = int(model_cfg.NUM_BEV_FEATURES)

    def init(self, rng, prefix="map_to_bev") -> Tuple[Params, Params]:
        return {}, {}

    def __call__(self, P, S, ctx: Ctx, st: SparseTensor, grid_xyz,
                 prefix="map_to_bev"):
        W, H, _ = grid_xyz
        C = st.num_channels
        dense = _scatter_dense(st, (1, H, W), C)
        return dense[0]                                 # [H, W, C]
