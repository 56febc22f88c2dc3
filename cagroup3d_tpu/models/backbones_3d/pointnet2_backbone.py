"""PointNet2MSG backbone for PointRCNN (reference
pcdet/models/backbones_3d/pointnet2_backbone.py:9-95): 4 multi-scale
set-abstraction levels + feature-propagation decoder back to the raw
points.  Per-scene with static caps; batch via vmap."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .pointnet2_modules import FPModule, SAModuleMSG


class PointNet2MSG:
    def __init__(self, model_cfg, input_channels: int = 4, **kwargs):
        c = model_cfg
        sa = c.SA_CONFIG
        self.npoints = [int(n) for n in sa.NPOINTS]
        ch_in = int(c.get("IN_CHANNELS", input_channels)) - 3
        self.sa_modules = []
        skip = [ch_in]
        for k in range(len(self.npoints)):
            mlps = [list(m) for m in sa.MLPS[k]]
            ch_out = 0
            for m in mlps:
                m.insert(0, ch_in)
                ch_out += m[-1]
            self.sa_modules.append(SAModuleMSG(
                self.npoints[k], sa.RADIUS[k], sa.NSAMPLE[k], mlps,
                use_xyz=bool(sa.get("USE_XYZ", True))))
            skip.append(ch_out)
            ch_in = ch_out
        self.fp_modules = []
        fp_mlps = [list(m) for m in c.FP_MLPS]
        for k in range(len(fp_mlps)):
            pre = fp_mlps[k + 1][-1] if k + 1 < len(fp_mlps) else ch_out
            self.fp_modules.append(FPModule([pre + skip[k]] + fp_mlps[k]))
        self.num_point_features = fp_mlps[0][-1]

    def init(self, rng, prefix: str = "backbone_3d"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        for i, m in enumerate(self.sa_modules):
            p, s = m.init(jax.random.fold_in(rng, i),
                          f"{prefix}.SA_modules.{i}")
            P.update(p)
            S.update(s)
        for i, m in enumerate(self.fp_modules):
            p, s = m.init(jax.random.fold_in(rng, 100 + i),
                          f"{prefix}.FP_modules.{i}")
            P.update(p)
            S.update(s)
        return P, S

    def __call__(self, P, S, ctx: Ctx, points, pvalid,
                 prefix: str = "backbone_3d"):
        """points [N, 3+F] -> per-point features [N, C] at the raw
        points (the FP decoder propagates back to level 0)."""
        xyz = points[:, :3]
        feats = points[:, 3:] if points.shape[1] > 3 else None
        l_xyz, l_feats, l_valid = [xyz], [feats], [pvalid]
        for i, m in enumerate(self.sa_modules):
            nx, nf, nv, _ = m(P, S, ctx, f"{prefix}.SA_modules.{i}",
                              l_xyz[i], l_feats[i], l_valid[i])
            l_xyz.append(nx)
            l_feats.append(nf)
            l_valid.append(nv)
        for i in range(-1, -(len(self.fp_modules) + 1), -1):
            l_feats[i - 1] = self.fp_modules[i](
                P, S, ctx, f"{prefix}.FP_modules.{len(self.fp_modules) + i}",
                l_xyz[i - 1], l_feats[i - 1], l_valid[i - 1],
                l_xyz[i], l_feats[i], l_valid[i])
        return l_feats[0]
