"""VoteModule (reference pcdet/models/model_utils/vote_module.py):
generate votes (offsets + residual features) from seed points, with a
Chamfer-distance vote loss.  Functional, per scene."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear


def chamfer_distance(src, src_valid, dst, dst_valid, criterion="l2"):
    """Two-sided masked Chamfer distance (loss_utils.chamfer_distance).
    Returns (loss_src [N], loss_dst [M], idx_src, idx_dst)."""
    d2 = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    big = 1e10
    d2 = jnp.where(dst_valid[None, :], d2, big)
    d2 = jnp.where(src_valid[:, None], d2, big)
    src_min = jnp.min(jnp.where(dst_valid[None, :], d2, big), axis=1)
    dst_min = jnp.min(jnp.where(src_valid[:, None], d2, big), axis=0)
    if criterion == "l1":
        src_min, dst_min = jnp.sqrt(src_min), jnp.sqrt(dst_min)
    src_min = jnp.where(src_valid, src_min, 0.0)
    dst_min = jnp.where(dst_valid, dst_min, 0.0)
    return (src_min, dst_min,
            jnp.argmin(d2, axis=1).astype(jnp.int32),
            jnp.argmin(d2, axis=0).astype(jnp.int32))


class VoteModule:
    def __init__(self, model_cfg):
        c = model_cfg
        self.in_channels = c["IN_CHANNELS"]
        self.vote_per_seed = c.get("VOTE_PER_SEED", 1)
        self.gt_per_seed = c.get("GT_PER_SEED", 3)
        self.conv_channels = list(c.get("CONV_CHANNELS", (16, 16)))
        self.norm_feats = c.get("NORM_FEATS", True)
        self.with_res_feat = c.get("WITH_RES_FEAT", True)
        self.vote_xyz_range = c.get("VOTE_XYZ_RANGE", None)
        self.loss_dst_weight = c.get("VOTE_LOSS", {}).get(
            "LOSS_DST_WEIGHT", 10.0)

    def init(self, rng, prefix: str = "vote_module") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        chans = [self.in_channels] + self.conv_channels
        rngs = jax.random.split(rng, len(chans))
        for i in range(len(chans) - 1):
            init_linear(P, rngs[i], f"{prefix}.vote_conv.{i}.conv",
                        chans[i], chans[i + 1], bias=True, init="uniform")
            init_bn(P, S, f"{prefix}.vote_conv.{i}.bn", chans[i + 1])
        out_ch = (3 + self.in_channels if self.with_res_feat else 3) \
            * self.vote_per_seed
        init_linear(P, rngs[-1], f"{prefix}.conv_out", chans[-1], out_ch,
                    bias=True, init="uniform")
        return P, S

    def __call__(self, P, S, ctx: Ctx, seed_xyz, seed_feats, seed_valid,
                 prefix: str = "vote_module"):
        """seed_xyz [N, 3], seed_feats [N, C] -> (vote_xyz [N*V, 3],
        vote_feats [N*V, C], offsets [N*V, 3], vote_valid [N*V])."""
        x = seed_feats
        for i in range(len(self.conv_channels)):
            x = x @ P[f"{prefix}.vote_conv.{i}.conv.weight"] + \
                P[f"{prefix}.vote_conv.{i}.conv.bias"]
            x = apply_bn(P, S, ctx, f"{prefix}.vote_conv.{i}.bn", x,
                         seed_valid)
            x = jnp.where(seed_valid[:, None], jnp.maximum(x, 0.0), 0.0)
        votes = x @ P[f"{prefix}.conv_out.weight"] + \
            P[f"{prefix}.conv_out.bias"]
        N = seed_xyz.shape[0]
        V = self.vote_per_seed
        votes = votes.reshape(N, V, -1)
        offset = votes[..., :3]
        if self.vote_xyz_range is not None:
            r = jnp.asarray(self.vote_xyz_range)
            offset = jnp.clip(offset, -r, r)
        vote_xyz = (seed_xyz[:, None, :] + offset).reshape(N * V, 3)
        if self.with_res_feat:
            res = votes[..., 3:]
            vote_feats = (seed_feats[:, None, :] + res).reshape(N * V, -1)
            if self.norm_feats:
                norm = jnp.linalg.norm(vote_feats, axis=-1, keepdims=True)
                vote_feats = vote_feats / jnp.maximum(norm, 1e-8)
        else:
            vote_feats = jnp.repeat(seed_feats, V, axis=0)
        vote_valid = jnp.repeat(seed_valid, V)
        vote_feats = jnp.where(vote_valid[:, None], vote_feats, 0.0)
        return vote_xyz, vote_feats, offset.reshape(N * V, 3), vote_valid

    def get_loss(self, seed_xyz, vote_xyz, seed_valid, vote_target_mask,
                 vote_targets):
        """Chamfer vote loss (vote_module.py:get_loss): distance from each
        vote to the nearest of the gt_per_seed targets of its seed."""
        N = seed_xyz.shape[0]
        weight = (vote_target_mask & seed_valid).astype(jnp.float32)
        weight = weight / jnp.maximum(jnp.sum(weight), 1.0)
        vt = (seed_xyz[:, None, :].repeat(self.gt_per_seed, 1) +
              vote_targets.reshape(N, self.gt_per_seed, 3))
        vx = vote_xyz.reshape(N, self.vote_per_seed, 3)
        d2 = jnp.sum((vx[:, :, None, :] - vt[:, None, :, :]) ** 2, axis=-1)
        dmin = jnp.min(d2, axis=2)                  # [N, V]
        loss = jnp.sum(jnp.sum(dmin, axis=1) * weight) * self.loss_dst_weight
        return loss
