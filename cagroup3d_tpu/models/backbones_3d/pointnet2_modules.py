"""PointNet++ set-abstraction / feature-propagation modules (functional).

Building blocks for the point-based model family (RBGNet, PointRCNN —
reference pcdet/models/backbones_3d/pointnet2_backbone.py and
pointnet2_fbs_backbone.py) over the TPU-native op family in
core/pointnet2.py.  Per-scene; batch via vmap.  Parameters live in the
flat-dict system (core/module.py).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core import pointnet2 as pn2
from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear


def init_shared_mlp(P: Params, S: Params, rng, path: str,
                    channels: List[int]) -> None:
    """Conv2d-k1 + BN + ReLU stack == per-point Linear + BN + ReLU."""
    rngs = jax.random.split(rng, len(channels) - 1)
    for i in range(len(channels) - 1):
        init_linear(P, rngs[i], f"{path}.{i}.conv", channels[i],
                    channels[i + 1], bias=False, init="xavier")
        init_bn(P, S, f"{path}.{i}.bn", channels[i + 1])


def apply_shared_mlp(P: Params, S: Params, ctx: Ctx, path: str,
                     x: jnp.ndarray, mask: jnp.ndarray,
                     n_layers: int) -> jnp.ndarray:
    """x [..., C]; mask broadcastable to x[..., 0]."""
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    m = jnp.broadcast_to(mask, shape[:-1]).reshape(-1)
    for i in range(n_layers):
        flat = flat @ P[f"{path}.{i}.conv.weight"]
        flat = apply_bn(P, S, ctx, f"{path}.{i}.bn", flat, m)
        flat = jnp.where(m[:, None], jnp.maximum(flat, 0.0), 0.0)
    return flat.reshape(shape[:-1] + (flat.shape[-1],))


class SAModule:
    """Set abstraction: sample centers (FPS by default), ball-query group,
    shared MLP, max-pool (PointnetSAModule semantics)."""

    def __init__(self, npoint: int, radius: float, nsample: int,
                 mlp: List[int], use_xyz: bool = True,
                 zero_query: bool = False):
        self.npoint = npoint
        self.radius = radius
        self.nsample = nsample
        self.mlp = ([mlp[0] + 3] if use_xyz else [mlp[0]]) + mlp[1:]
        self.use_xyz = use_xyz
        self.zero_query = zero_query

    def init(self, rng, path: str) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        init_shared_mlp(P, S, rng, path + ".mlps.0", self.mlp)
        return P, S

    def __call__(self, P, S, ctx: Ctx, path: str, xyz, feats, valid,
                 sample_idx: Optional[jnp.ndarray] = None):
        """xyz [N, 3], feats [N, C] or None, valid [N].
        Returns (new_xyz [M, 3], new_feats [M, C'], new_valid [M],
        sample_idx [M])."""
        if sample_idx is None:
            sample_idx = pn2.farthest_point_sample(xyz, valid, self.npoint)
        new_xyz = jnp.take(xyz, sample_idx, axis=0)
        new_valid = jnp.take(valid, sample_idx, axis=0)
        grouped, idx, found = pn2.query_and_group(
            self.radius, self.nsample, xyz, valid, new_xyz, new_valid,
            feats=feats, use_xyz=self.use_xyz, zero_query=self.zero_query)
        h = apply_shared_mlp(P, S, ctx, path + ".mlps.0", grouped,
                             new_valid[:, None], len(self.mlp) - 1)
        new_feats = jnp.max(h, axis=1)
        new_feats = jnp.where(new_valid[:, None], new_feats, 0.0)
        return new_xyz, new_feats, new_valid, sample_idx


class FPModule:
    """Feature propagation: three-NN inverse-distance interpolation of the
    coarse features onto the fine points + shared MLP."""

    def __init__(self, mlp: List[int]):
        self.mlp = mlp

    def init(self, rng, path: str) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        init_shared_mlp(P, S, rng, path + ".mlp", self.mlp)
        return P, S

    def __call__(self, P, S, ctx: Ctx, path: str, fine_xyz, fine_feats,
                 fine_valid, coarse_xyz, coarse_feats, coarse_valid):
        dist, idx = pn2.three_nn(fine_xyz, fine_valid, coarse_xyz,
                                 coarse_valid)
        interp = pn2.three_interpolate(coarse_feats, idx, dist)
        if fine_feats is not None:
            x = jnp.concatenate([interp, fine_feats], axis=-1)
        else:
            x = interp
        x = apply_shared_mlp(P, S, ctx, path + ".mlp", x, fine_valid,
                             len(self.mlp) - 1)
        return jnp.where(fine_valid[:, None], x, 0.0)


class SAModuleMSG:
    """Multi-scale-grouping set abstraction (PointnetSAModuleMSG,
    reference pointnet2_batch/pointnet2_modules.py): one FPS center set,
    several (radius, nsample, mlp) groups, channel-concat outputs."""

    def __init__(self, npoint: int, radii: List[float],
                 nsamples: List[int], mlps: List[List[int]],
                 use_xyz: bool = True):
        assert len(radii) == len(nsamples) == len(mlps)
        self.npoint = npoint
        self.radii = [float(r) for r in radii]
        self.nsamples = [int(n) for n in nsamples]
        self.use_xyz = use_xyz
        self.mlps = [([m[0] + 3] if use_xyz else [m[0]]) + m[1:]
                     for m in mlps]
        self.num_out = sum(m[-1] for m in self.mlps)

    def init(self, rng, path: str) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        for gi, m in enumerate(self.mlps):
            init_shared_mlp(P, S, jax.random.fold_in(rng, gi),
                            f"{path}.mlps.{gi}", m)
        return P, S

    def __call__(self, P, S, ctx: Ctx, path: str, xyz, feats, valid,
                 sample_idx: Optional[jnp.ndarray] = None):
        if sample_idx is None:
            sample_idx = pn2.farthest_point_sample(xyz, valid, self.npoint)
        new_xyz = jnp.take(xyz, sample_idx, axis=0)
        new_valid = jnp.take(valid, sample_idx, axis=0)
        outs = []
        for gi, (radius, nsample, m) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            grouped, _, _ = pn2.query_and_group(
                radius, nsample, xyz, valid, new_xyz, new_valid,
                feats=feats, use_xyz=self.use_xyz)
            h = apply_shared_mlp(P, S, ctx, f"{path}.mlps.{gi}", grouped,
                                 new_valid[:, None], len(m) - 1)
            outs.append(jnp.max(h, axis=1))
        new_feats = jnp.concatenate(outs, axis=-1)
        new_feats = jnp.where(new_valid[:, None], new_feats, 0.0)
        return new_xyz, new_feats, new_valid, sample_idx
