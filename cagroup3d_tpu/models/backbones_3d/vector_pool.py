"""VectorPool aggregation (PV-RCNN++), TPU-native.

Reference: pcdet/ops/pointnet2/pointnet2_stack/pointnet2_modules.py
``VectorPoolLocalInterpolateModule`` (:160-246),
``VectorPoolAggregationModule`` (:247-421) and
``VectorPoolAggregationModuleMSG`` (:423-470), backed by the
``vector_pool_with_voxel_query`` / ``three_nn_for_vector_pool_by_two_step``
CUDA kernels (vector_pool_gpu.cu).

TPU design notes:
- Static padded shapes everywhere: queries [M], supports [N] with valid
  masks; neighbor search is chunked masked distance math (the CUDA
  two-step neighbor gather is a memory optimisation, not semantics).
- ``voxel_avg_pool`` bins neighbors into the local voxel grid and
  averages per cell (exactly core/pointnet2_stack.vector_pool).
  ``voxel_random_choice`` — a CUDA cost hack that keeps one arbitrary
  point per cell — is mapped onto the same per-cell average (strictly
  more informative, same tensor layout); divergence documented here.
- The separable local aggregation (Conv1d groups=total_voxels) is a
  per-voxel-slot einsum on the MXU.
"""
from __future__ import annotations

import itertools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.gather import take_rows
from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...core.pointnet2_stack import vector_pool

BIG = 1e10


def dense_voxel_offsets(radius: float, num_voxels) -> np.ndarray:
    """Grid-center offsets of the local voxel grid in [-R, R]^3
    (get_dense_voxels_by_center, pointnet2_modules.py:338-360)."""
    axes = []
    for n in num_voxels:
        step = 2.0 * radius / n
        axes.append(np.arange(-radius + step / 2, radius, step,
                              dtype=np.float32)[:n])
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    return grid.astype(np.float32)


def masked_three_nn_within(queries, qvalid, points, pvalid,
                           max_dist: float, chunk: int = 1024):
    """3-NN among points within ``max_dist`` per query; empty -> idx 0 with
    ok=False (three_nn_for_vector_pool_by_two_step semantics: -1 idx for
    grid centers with no neighbor in range).  Returns (dist [Q, 3],
    idx i32[Q, 3], ok bool[Q])."""
    Q = queries.shape[0]

    def per_chunk(cq, cv):
        d2 = jnp.sum((cq[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(pvalid[None, :] & cv[:, None], d2, BIG)
        neg_topv, topi = jax.lax.top_k(-d2, 3)
        dist2 = -neg_topv
        ok = dist2[:, 0] < max_dist * max_dist
        dist = jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(dist2, 0.0)))
        return dist, topi.astype(jnp.int32), ok

    nchunk = -(-Q // chunk)
    pad = nchunk * chunk - Q
    cq = jnp.pad(queries, ((0, pad), (0, 0)))
    cv = jnp.pad(qvalid, (0, pad))
    dist, idx, ok = jax.lax.map(
        lambda t: per_chunk(*t),
        (cq.reshape(nchunk, chunk, 3), cv.reshape(nchunk, chunk)))
    return (dist.reshape(-1, 3)[:Q], idx.reshape(-1, 3)[:Q],
            ok.reshape(-1)[:Q])


def filter_points_near_rois(points, pvalid, rois, rvalid, radius: float):
    """sample_points_with_roi (voxel_set_abstraction.py:45-76): keep
    points whose distance to the nearest roi center is below that roi's
    half-diagonal + radius.  Returns bool[N]."""
    d2 = jnp.sum((points[:, None, :] - rois[None, :, 0:3]) ** 2, axis=-1)
    d2 = jnp.where(rvalid[None, :], d2, BIG)
    nearest = jnp.argmin(d2, axis=1)
    min_d = jnp.sqrt(jnp.take_along_axis(d2, nearest[:, None], 1)[:, 0])
    half_diag = jnp.linalg.norm(rois[:, 3:6] / 2, axis=-1)
    thr = jnp.take(half_diag, nearest) + radius
    return pvalid & (min_d < thr) & jnp.any(rvalid)


class VectorPoolAggregationModule:
    """One group (pointnet2_modules.py:247-421)."""

    def __init__(self, input_channels: int, num_local_voxel=(3, 3, 3),
                 local_aggregation_type="local_interpolation",
                 num_reduced_channels=30,
                 num_channels_of_local_aggregation=32, post_mlps=(128,),
                 max_neighbor_distance=None, neighbor_nsample=-1,
                 neighbor_distance_multiplier=2.0):
        self.num_local_voxel = [int(x) for x in num_local_voxel]
        self.total_voxels = int(np.prod(self.num_local_voxel))
        self.agg_type = local_aggregation_type
        assert self.agg_type in ("local_interpolation", "voxel_avg_pool",
                                 "voxel_random_choice")
        self.in_ch = int(input_channels)
        self.c_r = int(num_reduced_channels or input_channels)
        self.c_agg = int(num_channels_of_local_aggregation)
        self.radius = float(max_neighbor_distance)
        self.nsample = int(neighbor_nsample)
        self.dist_mult = float(neighbor_distance_multiplier)
        self.post_mlps = [int(x) for x in post_mlps]
        if self.agg_type == "local_interpolation":
            self.c_in_voxel = self.c_r + 9
            self.offsets = dense_voxel_offsets(self.radius,
                                               self.num_local_voxel)
        else:
            self.c_in_voxel = self.c_r + 3
            assert len(set(self.num_local_voxel)) == 1, \
                "voxel-query modes assume a cubic local grid"
        self.out_channels = self.post_mlps[-1]

    def init(self, P: Params, S: Params, rng, prefix: str):
        r = iter(jax.random.split(rng, 8 + len(self.post_mlps)))
        T = self.total_voxels
        # separable aggregation: per-voxel-slot [c_in_voxel, c_agg]
        import math
        std = math.sqrt(2.0 / self.c_in_voxel)
        P[f"{prefix}.sep_agg.weight"] = jax.random.normal(
            next(r), (T, self.c_in_voxel, self.c_agg)) * std
        init_bn(P, S, f"{prefix}.sep_agg.bn", T * self.c_agg)
        cin = T * self.c_agg
        for i, cout in enumerate(self.post_mlps):
            init_linear(P, next(r), f"{prefix}.post_mlps.{i}", cin, cout,
                        bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.post_mlps.{i}.bn", cout)
            cin = cout

    def __call__(self, P, S, ctx: Ctx, xyz, xyz_valid, feats, new_xyz,
                 new_valid, prefix: str):
        M = new_xyz.shape[0]
        T = self.total_voxels
        # channel reduction by folding + sum (pointnet2_modules.py:399)
        N, C = feats.shape
        assert C % self.c_r == 0, (C, self.c_r)
        f_r = jnp.sum(feats.reshape(N, -1, self.c_r), axis=1)

        if self.agg_type == "local_interpolation":
            centers = (new_xyz[:, None, :] +
                       jnp.asarray(self.offsets)[None, :, :]
                       ).reshape(M * T, 3)
            cvalid = jnp.repeat(new_valid, T)
            dist, idx, ok = masked_three_nn_within(
                centers, cvalid, xyz, xyz_valid,
                self.radius * self.dist_mult)
            recip = 1.0 / (dist + 1e-8)
            w = recip / jnp.maximum(jnp.sum(recip, 1, keepdims=True),
                                    1e-8)
            nf = take_rows(f_r, idx)                   # [MT, 3, C_r]
            interp = jnp.sum(nf * w[..., None], axis=1)
            near = take_rows(xyz, idx)                 # [MT, 3, 3]
            rel = (centers[:, None, :] - near).reshape(M * T, 9)
            v = jnp.concatenate([interp, rel], axis=-1)
            v = jnp.where((ok & cvalid)[:, None], v, 0.0)
            vec = v.reshape(M, T * self.c_in_voxel)
        else:
            vec = vector_pool(new_xyz, new_valid, xyz, xyz_valid, f_r,
                              self.radius,
                              max(self.nsample, 32)
                              if self.nsample > 0 else 64,
                              dense=self.num_local_voxel[0])
            # core layout per cell: [rel(3), feats]; reference voxel-query
            # layout: [local_xyz(3), feats] -- same
            vec = vec.reshape(M, T * self.c_in_voxel)

        # separable aggregation (Conv1d groups=T, k=1) on the MXU
        h = jnp.einsum("mtc,tcd->mtd",
                       vec.reshape(M, T, self.c_in_voxel),
                       P[f"{prefix}.sep_agg.weight"])
        h = h.reshape(M, T * self.c_agg)
        h = apply_bn(P, S, ctx, f"{prefix}.sep_agg.bn", h, new_valid)
        h = jnp.where(new_valid[:, None], jnp.maximum(h, 0.0), 0.0)
        for i in range(len(self.post_mlps)):
            h = h @ P[f"{prefix}.post_mlps.{i}.weight"]
            h = apply_bn(P, S, ctx, f"{prefix}.post_mlps.{i}.bn", h,
                         new_valid)
            h = jnp.where(new_valid[:, None], jnp.maximum(h, 0.0), 0.0)
        return h


class VectorPoolAggregationModuleMSG:
    """Multi-group wrapper + MSG post MLPs
    (pointnet2_modules.py:423-470)."""

    def __init__(self, input_channels: int, config):
        c = config
        self.cfg = c
        self.num_groups = int(c.NUM_GROUPS)
        self.groups = []
        c_in = 0
        for k in range(self.num_groups):
            gc = c[f"GROUP_CFG_{k}"]
            g = VectorPoolAggregationModule(
                input_channels=input_channels,
                num_local_voxel=gc.NUM_LOCAL_VOXEL,
                post_mlps=gc.POST_MLPS,
                max_neighbor_distance=gc.MAX_NEIGHBOR_DISTANCE,
                neighbor_nsample=int(gc.get("NEIGHBOR_NSAMPLE", -1)),
                local_aggregation_type=c.LOCAL_AGGREGATION_TYPE,
                num_reduced_channels=c.get("NUM_REDUCED_CHANNELS", None),
                num_channels_of_local_aggregation=
                c.NUM_CHANNELS_OF_LOCAL_AGGREGATION)
            self.groups.append(g)
            c_in += g.out_channels
        c_in += 3                                    # use_xyz
        self.msg_post_mlps = [int(x) for x in c.MSG_POST_MLPS]
        self.out_channels = self.msg_post_mlps[-1]
        self.num_out = self.out_channels             # StackSAModuleMSG alias

    def init(self, rng, prefix: str) -> Tuple[Params, Params]:
        """Drop-in for StackSAModuleMSG.init: returns fresh (P, S)."""
        P: Params = {}
        S: Params = {}
        rngs = jax.random.split(rng, self.num_groups +
                                len(self.msg_post_mlps))
        for k, g in enumerate(self.groups):
            g.init(P, S, rngs[k], f"{prefix}.layer_{k}")
        cin = sum(g.out_channels for g in self.groups) + 3
        for i, cout in enumerate(self.msg_post_mlps):
            init_linear(P, rngs[self.num_groups + i],
                        f"{prefix}.msg_post_mlps.{i}", cin, cout,
                        bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.msg_post_mlps.{i}.bn", cout)
            cin = cout
        return P, S

    def __call__(self, P, S, ctx: Ctx, xyz, xyz_valid, feats, new_xyz,
                 new_valid, prefix: str):
        outs = [g(P, S, ctx, xyz, xyz_valid, feats, new_xyz, new_valid,
                  f"{prefix}.layer_{k}")
                for k, g in enumerate(self.groups)]
        h = jnp.concatenate([new_xyz] + outs, axis=-1)
        for i in range(len(self.msg_post_mlps)):
            h = h @ P[f"{prefix}.msg_post_mlps.{i}.weight"]
            h = apply_bn(P, S, ctx, f"{prefix}.msg_post_mlps.{i}.bn", h,
                         new_valid)
            h = jnp.where(new_valid[:, None], jnp.maximum(h, 0.0), 0.0)
        return h
