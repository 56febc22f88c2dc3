"""PointNet2 backbone with foreground-biased sampling (RBGNet).

Rebuild of pcdet/models/backbones_3d/pointnet2_fbs_backbone.py
(PointNet2_FBS_SSG): 4 set-abstraction levels whose sampling mixes FPS
with top-k by a learned per-point foreground score (``_fbs_sample_points``
:136), followed by feature-propagation levels; outputs per-level
fp_xyz/fp_features and the foreground score maps for the sample loss.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ...core import pointnet2 as pn2
from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from .pointnet2_modules import FPModule, SAModule, apply_shared_mlp, \
    init_shared_mlp


class PointNet2FBSBackbone:
    def __init__(self, model_cfg, **kwargs):
        c = model_cfg
        sa = c.get("SA_CONFIG", {})
        self.npoints: List[int] = list(sa.get("NPOINTS",
                                              [2048, 1024, 512, 256]))
        self.radii = list(sa.get("RADIUS", [0.2, 0.4, 0.8, 1.2]))
        self.nsamples = list(sa.get("NSAMPLE", [64, 32, 16, 16]))
        self.mlps = [list(m) for m in sa.get(
            "MLPS", [[64, 64, 128], [128, 128, 256], [128, 128, 256],
                     [128, 128, 256]])]
        self.fp_mlps = [list(m) for m in c.get(
            "FP_MLPS", [[256, 256], [256, 256]])]
        self.fbs_ratio = float(c.get("FBS_RATIO", 0.5))
        in_ch = int(c.get("IN_CHANNELS", 3))  # rgb features
        self.in_channels = in_ch

        self.sa_modules = []
        ch = in_ch
        self.sa_out = []
        for i in range(len(self.npoints)):
            self.sa_modules.append(SAModule(
                self.npoints[i], self.radii[i], self.nsamples[i],
                [ch] + self.mlps[i]))
            ch = self.mlps[i][-1]
            self.sa_out.append(ch)
        self.fp_modules = []
        for i, m in enumerate(self.fp_mlps):
            # fp level i fuses sa_out[-1-i] (coarse) into sa_out[-2-i]
            cin = self.sa_out[-1 - i] + self.sa_out[-2 - i]
            self.fp_modules.append(FPModule([cin] + m))
        self.num_point_features = self.fp_mlps[-1][-1] if self.fp_mlps \
            else self.sa_out[-1]

    def init(self, rng, prefix: str = "backbone_3d") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        rngs = jax.random.split(rng, len(self.sa_modules) * 2 +
                                len(self.fp_modules))
        k = 0
        for i, m in enumerate(self.sa_modules):
            p, s = m.init(rngs[k], f"{prefix}.SA_modules.{i}")
            P.update(p)
            S.update(s)
            k += 1
            # foreground score MLP per level (sa_masks_score supervision)
            cin = self.in_channels if i == 0 else self.sa_out[i - 1]
            init_shared_mlp(P, S, rngs[k],
                            f"{prefix}.fbs_mlps.{i}", [cin, max(cin, 16)])
            init_linear(P, jax.random.fold_in(rngs[k], 1),
                        f"{prefix}.fbs_mlps.{i}.out", max(cin, 16), 1,
                        bias=True, init="uniform")
            k += 1
        for i, m in enumerate(self.fp_modules):
            p, s = m.init(rngs[k], f"{prefix}.FP_modules.{i}")
            P.update(p)
            S.update(s)
            k += 1
        return P, S

    def _fbs_sample(self, P, S, ctx, path, xyz, feats, valid, npoint):
        """Half the samples by FPS, half by top foreground score
        (_fbs_sample_points semantics).  Returns (idx [npoint], score [N])."""
        score_h = apply_shared_mlp(P, S, ctx, path,
                                   feats if feats is not None else xyz,
                                   valid, 1)
        score = (score_h @ P[path + ".out.weight"] +
                 P[path + ".out.bias"])[:, 0]
        n_fg = int(npoint * self.fbs_ratio)
        fg_idx = jax.lax.top_k(jnp.where(valid, score, -1e10), n_fg)[1]
        fps_idx = pn2.farthest_point_sample(xyz, valid, npoint - n_fg)
        return jnp.concatenate([fg_idx.astype(jnp.int32), fps_idx]), score

    def __call__(self, P, S, ctx: Ctx, xyz, feats, valid,
                 prefix: str = "backbone_3d"):
        """xyz [N, 3], feats [N, C] (e.g. rgb) or None, valid [N].
        Returns dict(fp_xyz, fp_features, fp_valid, sa_scores)."""
        xs, fs, vs = [xyz], [feats], [valid]
        scores = []
        for i, m in enumerate(self.sa_modules):
            idx, score = self._fbs_sample(
                P, S, ctx, f"{prefix}.fbs_mlps.{i}", xs[-1], fs[-1], vs[-1],
                self.npoints[i])
            scores.append(score)
            nx, nf, nv, _ = m(P, S, ctx, f"{prefix}.SA_modules.{i}",
                              xs[-1], fs[-1], vs[-1], sample_idx=idx)
            xs.append(nx)
            fs.append(nf)
            vs.append(nv)
        fp_x, fp_f, fp_v = xs[-1], fs[-1], vs[-1]
        for i, m in enumerate(self.fp_modules):
            fine = -2 - i
            fp_f = m(P, S, ctx, f"{prefix}.FP_modules.{i}",
                     xs[fine], fs[fine], vs[fine], fp_x, fp_f, fp_v)
            fp_x, fp_v = xs[fine], vs[fine]
        return dict(fp_xyz=fp_x, fp_features=fp_f, fp_valid=fp_v,
                    sa_scores=scores)
