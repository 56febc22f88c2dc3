"""Dense BEV backbone (reference pcdet/models/backbones_2d/
base_bev_backbone.py): per-level [Conv2d s2 + (Conv2d)xN] stacks with
transposed-conv upsampling and channel concat.  Plain XLA convolutions
(NHWC) — dense 2D convs are exactly what the MXU wants.  Per-scene
([H, W, C]); batch via vmap."""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn


def _init_conv2d(P, rng, path, k, cin, cout):
    import math
    std = math.sqrt(2.0 / (k * k * cout))
    P[path + ".weight"] = jax.random.normal(
        rng, (k, k, cin, cout)) * std


def _conv2d(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x[None], w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


def _deconv2d(x, w, stride):
    return jax.lax.conv_transpose(
        x[None], w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]


class BaseBEVBackbone:
    def __init__(self, model_cfg, input_channels: int = 256, **kwargs):
        c = model_cfg
        self.layer_nums = [int(x) for x in c.get("LAYER_NUMS", [])]
        self.strides = [int(x) for x in c.get("LAYER_STRIDES", [])]
        self.filters = [int(x) for x in c.get("NUM_FILTERS", [])]
        self.up_strides = [int(x) for x in c.get("UPSAMPLE_STRIDES", [])]
        self.up_filters = [int(x) for x in c.get("NUM_UPSAMPLE_FILTERS",
                                                 [])]
        self.in_ch = int(c.get("IN_CHANNELS", input_channels))
        self.num_bev_features = sum(self.up_filters) if self.up_filters \
            else self.filters[-1]

    def init(self, rng, prefix: str = "backbone_2d"
             ) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 64))
        cin = self.in_ch
        for li, (n, f) in enumerate(zip(self.layer_nums, self.filters)):
            _init_conv2d(P, next(r), f"{prefix}.blocks.{li}.0", 3, cin, f)
            init_bn(P, S, f"{prefix}.blocks.{li}.0.bn", f)
            for j in range(1, n + 1):
                _init_conv2d(P, next(r), f"{prefix}.blocks.{li}.{j}", 3,
                             f, f)
                init_bn(P, S, f"{prefix}.blocks.{li}.{j}.bn", f)
            cin = f
        for li, (us, uf) in enumerate(zip(self.up_strides,
                                          self.up_filters)):
            _init_conv2d(P, next(r), f"{prefix}.deblocks.{li}",
                         max(us, 1) if us > 1 else 3,
                         self.filters[li], uf)
            init_bn(P, S, f"{prefix}.deblocks.{li}.bn", uf)
        return P, S

    def __call__(self, P, S, ctx: Ctx, bev, prefix: str = "backbone_2d"):
        """bev [H, W, C] -> [H', W', sum(up_filters)]."""
        ups = []
        x = bev
        for li, n in enumerate(self.layer_nums):
            x = _conv2d(x, P[f"{prefix}.blocks.{li}.0.weight"],
                        self.strides[li])
            H, W, C = x.shape
            x = apply_bn(P, S, ctx, f"{prefix}.blocks.{li}.0.bn",
                         x.reshape(-1, C), jnp.ones(H * W, bool),
                         momentum=0.01, eps=1e-3).reshape(H, W, C)
            x = jnp.maximum(x, 0.0)
            for j in range(1, n + 1):
                x = _conv2d(x, P[f"{prefix}.blocks.{li}.{j}.weight"])
                x = apply_bn(P, S, ctx, f"{prefix}.blocks.{li}.{j}.bn",
                             x.reshape(-1, C), jnp.ones(x.shape[0] *
                                                        x.shape[1], bool),
                             momentum=0.01, eps=1e-3).reshape(x.shape)
                x = jnp.maximum(x, 0.0)
            if li < len(self.up_strides):
                us = self.up_strides[li]
                if us > 1:
                    u = _deconv2d(x, P[f"{prefix}.deblocks.{li}.weight"],
                                  us)
                else:
                    u = _conv2d(x, P[f"{prefix}.deblocks.{li}.weight"])
                Hu, Wu, Cu = u.shape
                u = apply_bn(P, S, ctx, f"{prefix}.deblocks.{li}.bn",
                             u.reshape(-1, Cu), jnp.ones(Hu * Wu, bool),
                             momentum=0.01, eps=1e-3).reshape(u.shape)
                ups.append(jnp.maximum(u, 0.0))
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0] if ups else x
