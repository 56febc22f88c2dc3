"""PointNet2 backbone with foreground-biased sampling (RBGNet).

TPU-native rebuild of pcdet/models/backbones_3d/pointnet2_fbs_backbone.py
(PointNet2_FBS_SSG): 4 set-abstraction levels; level 0 samples by plain
FPS, levels 1+ mix foreground-biased sampling — a per-level 2-channel
foreground MLP scores every point, the TOPK highest-margin points form the
foreground set, FG_NSAMPLE centers are FPS'd from it and the rest from the
complement (``_fbs_sample_points``, reference :136-210) — followed by
feature-propagation levels.  Outputs the final fp level plus per-level
foreground scores and index chains for the sample loss
(rbg_head.py:436-463).

Per-scene functional module; batch via vmap.  Static shapes: NPOINTS/TOPK/
FG_NSAMPLE are static, invalid points are masked out of FPS/top-k.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...core import pointnet2 as pn2
from ...core.module import Ctx, Params, init_bn, init_linear
from .pointnet2_modules import FPModule, SAModule, apply_shared_mlp, \
    init_shared_mlp


class PointNet2FBSBackbone:
    """cfg surface mirrors the reference SA_CONFIG/FP_MLPS exactly."""

    def __init__(self, model_cfg, input_channels: int = 6, **kwargs):
        c = model_cfg
        sa = c.SA_CONFIG
        self.npoints: List[int] = [int(x) for x in sa.NPOINTS]
        self.radii = [float(x) for x in sa.RADIUS]
        self.nsamples = [int(x) for x in sa.NSAMPLE]
        self.mlps = [list(m) for m in sa.MLPS]
        self.fbs_mlps_cfg = [list(m) for m in sa.get(
            "FBS_MLPS", [[-1, -1]] * len(self.npoints))]
        self.topk = [int(x) for x in sa.get("TOPK", [-1] * len(self.npoints))]
        self.fg_nsample = [int(x) for x in sa.get(
            "FG_NSAMPLE", [-1] * len(self.npoints))]
        self.fp_mlps = [list(m) for m in c.get("FP_MLPS", [])]
        # reference: features = points[:, 4:] (rgb); input_channels counts
        # [bi, xyz, rgb] style columns minus bi/xyz
        self.in_channels = int(c.get("IN_CHANNELS", 3))

        self.sa_modules = []
        ch = self.in_channels
        self.sa_out = []
        for i in range(len(self.npoints)):
            self.sa_modules.append(SAModule(
                self.npoints[i], self.radii[i], self.nsamples[i],
                [ch] + self.mlps[i]))
            self.sa_out.append(self.mlps[i][-1])
            ch = self.mlps[i][-1]
        self.fp_modules = []
        skip = [self.in_channels] + self.sa_out
        src = skip[-1]
        for k, m in enumerate(self.fp_mlps):
            tgt = skip[-2 - k]
            self.fp_modules.append(FPModule([src + tgt] + m))
            src = m[-1]
        self.num_point_features = self.fp_mlps[0][-1] if self.fp_mlps \
            else self.sa_out[-1]

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "backbone_3d") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        rngs = jax.random.split(rng, 2 * len(self.sa_modules) +
                                len(self.fp_modules))
        k = 0
        for i, m in enumerate(self.sa_modules):
            p, s = m.init(rngs[k], f"{prefix}.SA_modules.{i}")
            P.update(p)
            S.update(s)
            k += 1
            if self._fbs_use(i):
                cin = self.sa_out[i - 1]
                chans = [cin] + self.fbs_mlps_cfg[i]
                path = f"{prefix}.SA_modules.{i}.fbs_mlps.0"
                init_shared_mlp(P, S, rngs[k], path, chans)
                init_linear(P, jax.random.fold_in(rngs[k], 7),
                            f"{path}.{len(chans) - 1}", chans[-1], 2,
                            bias=True, init="uniform")
            k += 1
        for i, m in enumerate(self.fp_modules):
            p, s = m.init(rngs[k], f"{prefix}.FP_modules.{i}")
            P.update(p)
            S.update(s)
            k += 1
        return P, S

    def _fbs_use(self, i: int) -> bool:
        return i != 0 and self.topk[i] > 0

    # ------------------------------------------------------------------
    def _fbs_sample(self, P, S, ctx, path, xyz, feats, valid, level):
        """2-channel foreground scores -> top-k margin mask -> FPS over the
        foreground set (FG_NSAMPLE) + FPS over the complement (reference
        _fbs_sample_points; FPS replaces its per-batch python loops).
        Returns (idx i32[npoint], scores [N, 2])."""
        chans = len(self.fbs_mlps_cfg[level])
        h = apply_shared_mlp(P, S, ctx, path, feats, valid, chans)
        scores = h @ P[f"{path}.{chans}.weight"] + P[f"{path}.{chans}.bias"]
        sm = jax.nn.softmax(scores, axis=-1)
        margin = jnp.where(valid, sm[:, 1] - sm[:, 0], -1e10)
        topk = self.topk[level]
        fg_n = self.fg_nsample[level]
        npoint = self.npoints[level]
        _, top_idx = jax.lax.top_k(margin, topk)
        fg_mask = jnp.zeros(xyz.shape[0], bool).at[top_idx].set(True) & valid
        fg_idx = pn2.farthest_point_sample(xyz, fg_mask, fg_n)
        if npoint > fg_n:
            bg_idx = pn2.farthest_point_sample(xyz, valid & ~fg_mask,
                                               npoint - fg_n)
            idx = jnp.concatenate([fg_idx, bg_idx])
        else:
            idx = fg_idx
        return idx.astype(jnp.int32), scores

    def __call__(self, P, S, ctx: Ctx, xyz, feats, valid,
                 prefix: str = "backbone_3d"):
        """xyz [N, 3], feats [N, C] (rgb) or None, valid [N].  Returns
        dict(fp_xyz, fp_features, fp_valid, fp_indices, sa_scores [per
        fbs level: ([Ni, 2], indices into original points)], points_cat)."""
        xs, fs, vs = [xyz], [feats], [valid]
        idxs = [jnp.arange(xyz.shape[0], dtype=jnp.int32)]
        sa_scores = []   # (scores [N_i, 2], orig_indices [N_i]) per level
        for i, m in enumerate(self.sa_modules):
            if self._fbs_use(i):
                idx, score = self._fbs_sample(
                    P, S, ctx, f"{prefix}.SA_modules.{i}.fbs_mlps.0",
                    xs[-1], fs[-1], vs[-1], i)
                sa_scores.append((score, idxs[-1]))
            else:
                idx = pn2.farthest_point_sample(xs[-1], vs[-1],
                                                self.npoints[i])
            nx, nf, nv, _ = m(P, S, ctx, f"{prefix}.SA_modules.{i}",
                              xs[-1], fs[-1], vs[-1], sample_idx=idx)
            xs.append(nx)
            fs.append(nf)
            vs.append(nv)
            idxs.append(jnp.take(idxs[-1], idx))
        fp_x, fp_f, fp_v = xs[-1], fs[-1], vs[-1]
        fp_i = idxs[-1]
        for i, m in enumerate(self.fp_modules):
            fine = -2 - i
            fp_f = m(P, S, ctx, f"{prefix}.FP_modules.{i}",
                     xs[fine], fs[fine], vs[fine], fp_x, fp_f, fp_v)
            fp_x, fp_v, fp_i = xs[fine], vs[fine], idxs[fine]
        return dict(fp_xyz=fp_x, fp_features=fp_f, fp_valid=fp_v,
                    fp_indices=fp_i, sa_scores=sa_scores,
                    points_cat=xyz, points_valid=valid)
