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


class Conv2DCollapse:
    """Dense voxel volume -> BEV by folding Z into channels + 1x1 conv
    (reference pcdet/models/backbones_2d/map_to_bev/conv2d_collapse.py:
    1-38; CaDDN).  Input here is the image VFE's [Z, Y, X, C] volume."""

    def __init__(self, model_cfg, grid_size=None, **kwargs):
        self.num_bev_features = int(model_cfg.NUM_BEV_FEATURES)
        self.num_heights = int(grid_size[2]) if grid_size is not None \
            else None
        self.k = int(model_cfg.get("ARGS", {}).get("kernel_size", 1))

    def init(self, rng, prefix="map_to_bev") -> Tuple[Params, Params]:
        import math
        import jax
        P: Params = {}
        S: Params = {}
        cin = self.num_bev_features * self.num_heights
        cout = self.num_bev_features
        std = math.sqrt(2.0 / (self.k * self.k * cout))
        P[prefix + ".block.weight"] = jax.random.normal(
            rng, (self.k, self.k, cin, cout)) * std
        from ...core.module import init_bn
        init_bn(P, S, prefix + ".block.bn", cout)
        return P, S

    def __call__(self, P, S, ctx: Ctx, voxel_features,
                 prefix="map_to_bev"):
        """voxel_features [Z, Y, X, C] -> [Y, X, C]."""
        import jax
        from ...core.module import apply_bn
        Z, H, W, C = voxel_features.shape
        x = jnp.transpose(voxel_features, (1, 2, 0, 3)).reshape(
            H, W, Z * C)
        x = jax.lax.conv_general_dilated(
            x[None], P[prefix + ".block.weight"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        x = apply_bn(P, S, ctx, prefix + ".block.bn",
                     x.reshape(-1, x.shape[-1]), jnp.ones(H * W, bool),
                     momentum=0.01, eps=1e-3).reshape(H, W, -1)
        return jnp.maximum(x, 0.0)


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
