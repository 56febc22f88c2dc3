"""BiResNet: bilateral fully-sparse 3D backbone with DAPPM neck.

TPU-native rebuild of the reference backbone
(pcdet/models/backbones_3d/biresnet.py): a low-resolution ResNet branch
(strides 2..64 relative to the input lattice) and a high-resolution
branch held at stride 4, fused by 1x1 "compression" convs +
trilinear features-at-coordinates and strided "down" convs, a DAPPM
multi-scale average-pooling pyramid on the deepest map, and a transposed
conv output head decoded at the stride-2 coordinate map.

Parameter paths mirror the reference torch state_dict
(e.g. ``layer1.0.conv1.kernel``, ``spp.scale1.3.kernel``) so checkpoint
conversion is key-for-key.  All per-stride capacities are static.

Per-scene module: batch via jax.vmap with axis_name for SyncBN.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, init_bn, init_conv
from ...core.pooling import avg_pool, interpolate_at
from ...core.sparse import SparseTensor
from ..layers import act, bn, conv_at, down, reduce_coords, subm, up

DEFAULT_CAPS = {1: 65536, 2: 32768, 4: 16384, 8: 8192, 16: 4096, 32: 2048,
                64: 1024, 128: 512, 256: 256, 512: 128}


def _rngs(rng, n):
    return list(jax.random.split(rng, n))


class BiResNet:
    """Functional module; holds only static config."""

    def __init__(self, model_cfg, **kwargs):
        self.in_channels = model_cfg.get("IN_CHANNELS", 3)
        self.out_channels = model_cfg.get("OUT_CHANNELS", 64)
        self.layers = model_cfg.get("LAYERS", [2, 2, 2, 2])
        self.planes = model_cfg.get("PLANES", 64)
        self.spp_planes = model_cfg.get("SPP_PLANES", 128)
        caps = model_cfg.get("CAPS", None)
        self.caps = dict(DEFAULT_CAPS)
        if caps:
            self.caps.update({int(k): int(v) for k, v in dict(caps).items()})
        self.num_point_features = self.out_channels

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def _init_basic_block(self, P, S, rng, p, cin, cout, stride):
        r = _rngs(rng, 3)
        init_conv(P, r[0], p + ".conv1", 3, cin, cout, init="kaiming")
        init_bn(P, S, p + ".norm1", cout)
        init_conv(P, r[1], p + ".conv2", 3, cout, cout, init="kaiming")
        init_bn(P, S, p + ".norm2", cout)
        if stride != 1 or cin != cout:
            init_conv(P, r[2], p + ".downsample.0", 1, cin, cout,
                      init="kaiming")
            init_bn(P, S, p + ".downsample.1", cout)

    def _init_bottleneck(self, P, S, rng, p, cin, planes, stride):
        r = _rngs(rng, 4)
        cout = planes * 2
        init_conv(P, r[0], p + ".conv1", 1, cin, planes, init="kaiming")
        init_bn(P, S, p + ".norm1", planes)
        init_conv(P, r[1], p + ".conv2", 3, planes, planes, init="kaiming")
        init_bn(P, S, p + ".norm2", planes)
        init_conv(P, r[2], p + ".conv3", 1, planes, cout, init="kaiming")
        init_bn(P, S, p + ".norm3", cout)
        if stride != 1 or cin != cout:
            init_conv(P, r[3], p + ".downsample.0", 1, cin, cout,
                      init="kaiming")
            init_bn(P, S, p + ".downsample.1", cout)

    def _init_layer(self, P, S, rng, p, cin, cout, blocks, stride):
        r = _rngs(rng, blocks)
        self._init_basic_block(P, S, r[0], p + ".0", cin, cout, stride)
        for i in range(1, blocks):
            self._init_basic_block(P, S, r[i], f"{p}.{i}", cout, cout, 1)

    def init(self, rng, prefix: str = "backbone_3d") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        pl, hr, spp = self.planes, self.planes * 2, self.spp_planes
        r = _rngs(rng, 32)
        pre = prefix
        # stem: conv1 = [conv, BN, ReLU, conv, BN, ReLU]
        init_conv(P, r[0], pre + ".conv1.0", 3, self.in_channels, pl,
                  init="kaiming")
        init_bn(P, S, pre + ".conv1.1", pl)
        init_conv(P, r[1], pre + ".conv1.3", 3, pl, pl, init="kaiming")
        init_bn(P, S, pre + ".conv1.4", pl)
        self._init_layer(P, S, r[2], pre + ".layer1", pl, pl, self.layers[0], 2)
        self._init_layer(P, S, r[3], pre + ".layer2", pl, pl * 2,
                         self.layers[1], 2)
        self._init_layer(P, S, r[4], pre + ".layer3", pl * 2, pl * 4,
                         self.layers[2], 2)
        self._init_layer(P, S, r[5], pre + ".layer4", pl * 4, pl * 8,
                         self.layers[3], 2)
        init_conv(P, r[6], pre + ".compression3.0", 1, pl * 4, hr,
                  init="kaiming")
        init_bn(P, S, pre + ".compression3.1", hr)
        init_conv(P, r[7], pre + ".compression4.0", 1, pl * 8, hr,
                  init="kaiming")
        init_bn(P, S, pre + ".compression4.1", hr)
        init_conv(P, r[8], pre + ".down3.0", 3, hr, pl * 4, init="kaiming")
        init_bn(P, S, pre + ".down3.1", pl * 4)
        init_conv(P, r[9], pre + ".down4.0", 3, hr, pl * 4, init="kaiming")
        init_bn(P, S, pre + ".down4.1", pl * 4)
        init_conv(P, r[10], pre + ".down4.3", 3, pl * 4, pl * 8,
                  init="kaiming")
        init_bn(P, S, pre + ".down4.4", pl * 8)
        self._init_layer(P, S, r[11], pre + ".layer3_", pl * 2, hr, 2, 1)
        self._init_layer(P, S, r[12], pre + ".layer4_", hr, hr, 2, 1)
        self._init_bottleneck(P, S, r[13], pre + ".layer5_.0", hr, hr, 1)
        self._init_bottleneck(P, S, r[14], pre + ".layer5.0", pl * 8, pl * 8, 2)
        # DAPPM on planes*16 input
        cin = pl * 16
        init_bn(P, S, pre + ".spp.scale0.0", cin)
        init_conv(P, r[15], pre + ".spp.scale0.2", 1, cin, spp, init="kaiming")
        for i in range(1, 5):
            init_bn(P, S, f"{pre}.spp.scale{i}.1", cin)
            init_conv(P, r[15 + i], f"{pre}.spp.scale{i}.3", 1, cin, spp,
                      init="kaiming")
            init_bn(P, S, f"{pre}.spp.process{i}.0", spp)
            init_conv(P, r[24 + i], f"{pre}.spp.process{i}.2", 3, spp, spp,
                      init="kaiming")
        init_bn(P, S, pre + ".spp.compression.0", spp * 5)
        init_conv(P, r[20], pre + ".spp.compression.2", 1, spp * 5, pl * 4,
                  init="kaiming")
        init_bn(P, S, pre + ".spp.shortcut.0", cin)
        init_conv(P, r[21], pre + ".spp.shortcut.2", 1, cin, pl * 4,
                  init="kaiming")
        # out head
        init_conv(P, r[22], pre + ".out.0", 2, pl * 4, pl * 4, init="kaiming")
        init_bn(P, S, pre + ".out.1", pl * 4)
        init_conv(P, r[23], pre + ".out.3", 1, pl * 4, self.out_channels,
                  init="kaiming")
        init_bn(P, S, pre + ".out.4", self.out_channels)
        return P, S

    # ------------------------------------------------------------------
    # apply
    # ------------------------------------------------------------------
    def _basic_block(self, P, S, ctx, p, x: SparseTensor, stride, cap,
                     no_relu) -> SparseTensor:
        if stride == 1:
            out = subm(P, ctx, p + ".conv1", x, 3)
        else:
            out = down(P, ctx, p + ".conv1", x, 3, stride, cap)
        out = act(bn(P, S, ctx, p + ".norm1", out))
        out = bn(P, S, ctx, p + ".norm2", subm(P, ctx, p + ".conv2", out, 3))
        if (p + ".downsample.0.kernel") in P:
            if stride == 1:
                res = subm(P, ctx, p + ".downsample.0", x, 1)
            else:
                res = down(P, ctx, p + ".downsample.0", x, 1, stride, cap)
            res = bn(P, S, ctx, p + ".downsample.1", res)
        else:
            res = x
        out = out.with_feats(out.feats + res.feats)
        return out if no_relu else act(out)

    def _bottleneck(self, P, S, ctx, p, x: SparseTensor, stride, cap,
                    no_relu=True) -> SparseTensor:
        out = act(bn(P, S, ctx, p + ".norm1", subm(P, ctx, p + ".conv1", x, 1)))
        if stride == 1:
            out = subm(P, ctx, p + ".conv2", out, 3)
        else:
            out = down(P, ctx, p + ".conv2", out, 3, stride, cap)
        out = act(bn(P, S, ctx, p + ".norm2", out))
        out = bn(P, S, ctx, p + ".norm3", subm(P, ctx, p + ".conv3", out, 1))
        if (p + ".downsample.0.kernel") in P:
            if stride == 1:
                res = subm(P, ctx, p + ".downsample.0", x, 1)
            else:
                res = down(P, ctx, p + ".downsample.0", x, 1, stride, cap)
            res = bn(P, S, ctx, p + ".downsample.1", res)
        else:
            res = x
        out = out.with_feats(out.feats + res.feats)
        return out if no_relu else act(out)

    def _layer(self, P, S, ctx, p, x, blocks, stride, cap):
        x = self._basic_block(P, S, ctx, p + ".0", x, stride, cap,
                              no_relu=False)
        for i in range(1, blocks):
            x = self._basic_block(P, S, ctx, f"{p}.{i}", x, 1, cap,
                                  no_relu=(i == blocks - 1))
        return x

    def _bn_relu_conv(self, P, S, ctx, bn_path, conv_path, x, k):
        return subm(P, ctx, conv_path, act(bn(P, S, ctx, bn_path, x)), k)

    def _dappm(self, P, S, ctx, pre, x: SparseTensor) -> SparseTensor:
        caps = self.caps
        xs = []
        xs.append(self._bn_relu_conv(P, S, ctx, pre + ".scale0.0",
                                     pre + ".scale0.2", x, 1))
        qcoords = x.coords.astype(jnp.float32)
        pools = [(5, 2), (9, 4), (17, 8), (33, 16)]
        for i, (k, s) in enumerate(pools, start=1):
            pooled = avg_pool(x, k, s, caps.get(x.stride * s, 128))
            y = self._bn_relu_conv(P, S, ctx, f"{pre}.scale{i}.1",
                                   f"{pre}.scale{i}.3", pooled, 1)
            feat = interpolate_at(y, qcoords, x.valid)
            merged = x.with_feats(feat + xs[i - 1].feats)
            xs.append(self._bn_relu_conv(P, S, ctx, f"{pre}.process{i}.0",
                                         f"{pre}.process{i}.2", merged, 3))
        cat = x.with_feats(jnp.concatenate([t.feats for t in xs], axis=-1))
        out = self._bn_relu_conv(P, S, ctx, pre + ".compression.0",
                                 pre + ".compression.2", cat, 1)
        sc = self._bn_relu_conv(P, S, ctx, pre + ".shortcut.0",
                                pre + ".shortcut.2", x, 1)
        return out.with_feats(out.feats + sc.feats)

    def __call__(self, P: Params, S: Params, ctx: Ctx,
                 st: SparseTensor, prefix: str = "backbone_3d",
                 stop_after: str = None) -> SparseTensor:
        """``stop_after``: profiling cut point (tools/profile_backbone.py)
        — returns the named prefix's live tensors so XLA dead-code
        -eliminates the rest; cuts keep BOTH bilateral branches live."""
        pre = prefix
        caps = self.caps
        nblk = self.layers
        base = st.stride

        # stem (stride 1)
        x = act(bn(P, S, ctx, pre + ".conv1.1",
                   subm(P, ctx, pre + ".conv1.0", st, 3)))
        x = act(bn(P, S, ctx, pre + ".conv1.4",
                   subm(P, ctx, pre + ".conv1.3", x, 3)))
        if stop_after == "stem":
            return x

        l1 = self._layer(P, S, ctx, pre + ".layer1", x, nblk[0], 2,
                         caps[base * 2])
        if stop_after == "layer1":
            return l1
        l2 = self._layer(P, S, ctx, pre + ".layer2", act(l1), nblk[1], 2,
                         caps[base * 4])
        if stop_after == "layer2":
            return l2
        l3 = self._layer(P, S, ctx, pre + ".layer3", act(l2), nblk[2], 2,
                         caps[base * 8])
        x_ = self._layer(P, S, ctx, pre + ".layer3_", act(l2), 2, 1,
                         caps[base * 4])

        d3 = bn(P, S, ctx, pre + ".down3.1",
                down(P, ctx, pre + ".down3.0", act(x_), 3, 2, caps[base * 8]))
        xm = l3.with_feats(l3.feats + d3.feats)  # same coord set (cached reduce)
        c3 = bn(P, S, ctx, pre + ".compression3.1",
                subm(P, ctx, pre + ".compression3.0", act(l3), 1))
        x_ = x_.with_feats(x_.feats + interpolate_at(
            c3, x_.coords.astype(jnp.float32), x_.valid))
        if stop_after == "fuse3":
            return xm, x_

        l4 = self._layer(P, S, ctx, pre + ".layer4", act(xm), nblk[3], 2,
                         caps[base * 16])
        x_ = self._layer(P, S, ctx, pre + ".layer4_", act(x_), 2, 1,
                         caps[base * 4])

        d4 = bn(P, S, ctx, pre + ".down4.1",
                down(P, ctx, pre + ".down4.0", act(x_), 3, 2, caps[base * 8]))
        d4 = bn(P, S, ctx, pre + ".down4.4",
                down(P, ctx, pre + ".down4.3", act(d4), 3, 2, caps[base * 16]))
        xm = l4.with_feats(l4.feats + d4.feats)
        c4 = bn(P, S, ctx, pre + ".compression4.1",
                subm(P, ctx, pre + ".compression4.0", act(l4), 1))
        x_ = x_.with_feats(x_.feats + interpolate_at(
            c4, x_.coords.astype(jnp.float32), x_.valid))
        if stop_after == "fuse4":
            return xm, x_

        x_ = self._bottleneck(P, S, ctx, pre + ".layer5_.0", act(x_), 1,
                              caps[base * 4])
        l5 = self._bottleneck(P, S, ctx, pre + ".layer5.0", act(xm), 2,
                              caps[base * 32])
        if stop_after == "layer5":
            return l5, x_
        sppo = self._dappm(P, S, ctx, pre + ".spp", l5)
        x_ = x_.with_feats(x_.feats + interpolate_at(
            sppo, x_.coords.astype(jnp.float32), x_.valid))
        if stop_after == "spp":
            return x_

        # out head: transpose k2 s2 decoded at the stride-2 map (= layer1
        # coords, ME coordinate-manager reuse biresnet.py:397)
        y = up(P, ctx, pre + ".out.0", x_, l1.coords, l1.valid, 2, 2)
        y = act(bn(P, S, ctx, pre + ".out.1", y))
        y = subm(P, ctx, pre + ".out.3", y, 1)
        y = act(bn(P, S, ctx, pre + ".out.4", y))
        return y
