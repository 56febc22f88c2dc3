"""Voxel feature encoders (reference pcdet/models/backbones_3d/vfe/):
MeanVFE (mean_vfe.py) and PillarVFE (pillar_vfe.py) over the static-cap
voxel layout.  Per-scene functional modules; batch via vmap.

Our dataloader hands raw padded points; voxelization happens on-device
(unique_voxels), so a VFE here is (points -> voxel features) in one step:
  MeanVFE:   per-voxel mean of point features (== ME UNWEIGHTED_AVERAGE)
  PillarVFE: per-pillar PointNet (linear+BN+ReLU+max) over decorated
             points (xyz, intensity.., cluster offset, center offset)

Point-per-voxel capping: the spconv voxelizer (reference data_processor
.py transform_points_to_voxels) keeps only the FIRST
MAX_POINTS_PER_VOXEL points per voxel of the (shuffled) point array;
the static VFEs then reduce over that capped set.  ``max_points_per_
voxel`` reproduces this with an arrival-rank mask (core.voxelize
.arrival_rank); the Dyn* VFEs reduce over ALL points (reference
dynamic_{mean,pillar}_vfe.py) and pass None.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...core.sparse import SparseTensor
from ...core.voxelize import arrival_rank, unique_voxels


def _cap_points(lat, pvalid, max_points):
    if max_points is None:
        return pvalid
    return pvalid & (arrival_rank(lat, pvalid) < max_points)


class MeanVFE:
    """mean_vfe.py: voxel feature = mean of its points' features."""

    def __init__(self, model_cfg, num_point_features: int = 4,
                 max_points_per_voxel=None, **kwargs):
        self.num_point_features = num_point_features
        self.max_points = max_points_per_voxel

    def init(self, rng, prefix="vfe") -> Tuple[Params, Params]:
        return {}, {}

    def __call__(self, P, S, ctx: Ctx, points, pvalid, voxel_size,
                 pc_range, cap: int, prefix="vfe"):
        """points [N, 3+F] raw; returns SparseTensor (stride 1 lattice).
        Voxel feature = mean of the FULL point feature vector incl. xyz
        (reference mean_vfe.py:25-30 averages points_mean over all
        num_point_features columns), so the backbone's input_channels
        equals num_point_features (4 on KITTI)."""
        xyz = points[:, :3] - jnp.asarray(pc_range[:3])
        lat = jnp.floor(xyz / jnp.asarray(voxel_size)).astype(jnp.int32)
        pvalid = _cap_points(lat, pvalid, self.max_points)
        st, _ = unique_voxels(
            lat, points[:, :self.num_point_features], pvalid, cap,
            mode="mean", stats=getattr(ctx, "stats", None),
            stat_name="vfe")
        return st


class PillarVFE:
    """pillar_vfe.py: decorated points -> shared linear+BN+ReLU -> per-
    pillar max.  USE_NORM assumed true, single NUM_FILTERS layer (the
    PointPillar config)."""

    def __init__(self, model_cfg, num_point_features: int = 4,
                 max_points_per_voxel=None, **kwargs):
        c = model_cfg
        self.with_distance = bool(c.get("WITH_DISTANCE", False))
        self.use_absolute_xyz = bool(c.get("USE_ABSLOTE_XYZ",
                                           c.get("USE_ABSOLUTE_XYZ", True)))
        self.num_filters = [int(x) for x in c.NUM_FILTERS]
        n_in = num_point_features + 6
        if self.with_distance:
            n_in += 1
        if not self.use_absolute_xyz:
            n_in -= 3
        self.n_in = n_in
        self.num_point_features = self.num_filters[-1]
        self.max_points = max_points_per_voxel

    def init(self, rng, prefix="vfe") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        chans = [self.n_in] + self.num_filters
        rngs = jax.random.split(rng, len(chans))
        for i in range(len(chans) - 1):
            init_linear(P, rngs[i], f"{prefix}.pfn_layers.{i}.linear",
                        chans[i], chans[i + 1], bias=False, init="xavier")
            init_bn(P, S, f"{prefix}.pfn_layers.{i}.norm", chans[i + 1])
        return P, S

    def __call__(self, P, S, ctx: Ctx, points, pvalid, voxel_size,
                 pc_range, cap: int, prefix="vfe"):
        """Pillar lattice: z collapsed (voxel_size z = full range)."""
        vs = jnp.asarray(voxel_size)
        rng0 = jnp.asarray(pc_range[:3])
        xyz = points[:, :3] - rng0
        lat = jnp.floor(xyz / vs).astype(jnp.int32)
        lat = lat.at[:, 2].set(0)
        pvalid = _cap_points(lat, pvalid, self.max_points)
        st, inv = unique_voxels(lat, points[:, :1] * 0, pvalid, cap,
                                mode="mean",
                                stats=getattr(ctx, "stats", None),
                                stat_name="vfe")
        # cluster mean per pillar
        seg = jnp.where(inv >= 0, inv, cap)
        cnt = jnp.zeros((cap + 1,)).at[seg].add(
            pvalid.astype(jnp.float32))
        xyz_sum = jnp.zeros((cap + 1, 3)).at[seg].add(
            jnp.where(pvalid[:, None], points[:, :3], 0.0))
        mean_xyz = xyz_sum / jnp.maximum(cnt, 1.0)[:, None]
        f_cluster = points[:, :3] - mean_xyz[jnp.clip(inv, 0, cap - 1)]
        center = (lat.astype(jnp.float32) + 0.5) * vs + rng0
        f_center = points[:, :3] - center
        parts = [points[:, :3], points[:, 3:]] if self.use_absolute_xyz \
            else [points[:, 3:]]
        parts += [f_cluster, f_center]
        if self.with_distance:
            parts.append(jnp.linalg.norm(points[:, :3], axis=1,
                                         keepdims=True))
        feats = jnp.concatenate(parts, axis=-1)
        ok = pvalid & (inv >= 0)
        x = feats
        for i in range(len(self.num_filters)):
            x = x @ P[f"{prefix}.pfn_layers.{i}.linear.weight"]
            x = apply_bn(P, S, ctx, f"{prefix}.pfn_layers.{i}.norm", x, ok,
                         momentum=0.01, eps=1e-3)
            x = jnp.where(ok[:, None], jnp.maximum(x, 0.0), 0.0)
        # per-pillar max over member points
        C = x.shape[-1]
        pooled = jnp.full((cap + 1, C), -1e10).at[seg].max(
            jnp.where(ok[:, None], x, -1e10))[:cap]
        pooled = jnp.where(st.valid[:, None], pooled, 0.0)
        return SparseTensor(st.coords, pooled, st.valid, stride=1)
