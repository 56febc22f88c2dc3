"""UNetV2: sparse-conv UNet for point-wise features (reference
pcdet/models/backbones_3d/spconv_unet.py:49-212).

Encoder is VoxelBackBone8x (shared layout/params).  The decoder's
SparseInverseConv3d restores the *input* coordinate set of the strided
conv that created its indice_key (spconv semantics).  TPU-native: each
level's coordinates are a static sorted table, so the inverse conv is a
``scan_conv`` evaluated AT the upper level's coords with transposed
offsets — a source voxel o (own lattice units, stride s transition with
padding p) contributes to target i iff o*s - p + j == i for a kernel
position j, i.e. q = i + (p - j) must be divisible by s and hit o.  No
kernel-map replay machinery is required.

UR block (spconv_unet.py:135-143): basic-block on the lateral encoder
tensor, channel-concat with the decoder bottom (same coordinate table by
construction), subm k3 merge, paired channel reduction + residual add,
then the inverse conv up one level.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_conv
from ...core.sparse import SparseTensor
from ...core.sparse_conv import scan_conv
from ..layers import subm
from .spconv_backbone import VoxelBackBone8x, _triple


def inverse_conv(P, path: str, src: SparseTensor, tgt_coords, tgt_valid,
                 k, s: int, p) -> SparseTensor:
    """SparseInverseConv3d: src (own lattice units, one s-strided
    transition below the target level) -> features at tgt_coords (the
    transition's input coordinate set)."""
    kk, pp = _triple(k), _triple(p)
    offs = np.array([[pp[0] - a, pp[1] - b, pp[2] - c]
                     for a in range(kk[0]) for b in range(kk[1])
                     for c in range(kk[2])], np.int32)
    f = scan_conv(src.coords * s, src.valid, src.masked_feats(), s,
                  tgt_coords, tgt_valid, offs, P[path + ".kernel"])
    return SparseTensor(tgt_coords, f, tgt_valid, 1)


class UNetV2(VoxelBackBone8x):
    """Encoder = VoxelBackBone8x; adds the 4 UR decoder stages and
    returns stride-1 point features (spconv_unet.py:162-212)."""

    def __init__(self, model_cfg, input_channels: int = 4, grid_size=None,
                 **kwargs):
        super().__init__(model_cfg, input_channels=input_channels,
                         grid_size=grid_size, **kwargs)
        self.return_encoded = bool(
            model_cfg.get("RETURN_ENCODED_TENSOR", True))
        self.num_point_features = 16

    def init(self, rng, prefix: str = "backbone_3d") -> Tuple[Params, Params]:
        P, S = super().init(rng, prefix)
        r = iter(jax.random.split(jax.random.fold_in(rng, 17), 24))
        pre = prefix

        def blk(path, cin, cout):
            init_conv(P, next(r), path + ".0", 3, cin, cout, init="kaiming")
            init_bn(P, S, path + ".1", cout)

        def basic(path, c):
            init_conv(P, next(r), path + ".conv1", 3, c, c, init="kaiming")
            init_bn(P, S, path + ".bn1", c)
            init_conv(P, next(r), path + ".conv2", 3, c, c, init="kaiming")
            init_bn(P, S, path + ".bn2", c)

        basic(pre + ".conv_up_t4", 64)
        blk(pre + ".conv_up_m4", 128, 64)
        blk(pre + ".inv_conv4", 64, 64)
        basic(pre + ".conv_up_t3", 64)
        blk(pre + ".conv_up_m3", 128, 64)
        blk(pre + ".inv_conv3", 64, 32)
        basic(pre + ".conv_up_t2", 32)
        blk(pre + ".conv_up_m2", 64, 32)
        blk(pre + ".inv_conv2", 32, 16)
        basic(pre + ".conv_up_t1", 16)
        blk(pre + ".conv_up_m1", 32, 16)
        blk(pre + ".conv5.0", 16, 16)
        return P, S

    # ------------------------------------------------------------------
    def _bn(self, P, S, ctx, path, st, relu=True):
        f = apply_bn(P, S, ctx, path, st.feats, st.valid,
                     momentum=0.01, eps=1e-3)
        if relu:
            f = jnp.maximum(f, 0.0)
        return st.with_feats(jnp.where(st.valid[:, None], f, 0.0))

    def _basic_block(self, P, S, ctx, pre, st):
        """SparseBasicBlock (spconv_unet.py:11-46)."""
        idt = st.feats
        x = self._bn(P, S, ctx, pre + ".bn1",
                     subm(P, ctx, pre + ".conv1", st, 3))
        x = self._bn(P, S, ctx, pre + ".bn2",
                     subm(P, ctx, pre + ".conv2", x, 3), relu=False)
        f = jnp.maximum(x.feats + idt, 0.0)
        return st.with_feats(jnp.where(st.valid[:, None], f, 0.0))

    @staticmethod
    def _channel_reduction(feats, cout):
        """view(n, cout, -1).sum(2) (spconv_unet.py:145-160): paired sum
        of consecutive channels."""
        n, cin = feats.shape
        return feats.reshape(n, cout, cin // cout).sum(axis=2)

    def _ur_block(self, P, S, ctx, pre_t, pre_m, lateral: SparseTensor,
                  bottom_feats):
        """Basic-block lateral + concat bottom + merge + reduce/add.
        Returns the merged tensor on the lateral's coordinate table
        (spconv_unet.py:135-143); the caller applies the inverse conv."""
        x_trans = self._basic_block(P, S, ctx, pre_t, lateral)
        cat = jnp.concatenate([bottom_feats, x_trans.feats], axis=-1)
        x = lateral.with_feats(cat)
        x_m = self._bn(P, S, ctx, pre_m + ".1",
                       subm(P, ctx, pre_m + ".0", x, 3))
        red = self._channel_reduction(cat, x_m.num_channels)
        f = x_m.feats + red
        return lateral.with_feats(jnp.where(lateral.valid[:, None], f, 0.0))

    def __call__(self, P, S, ctx: Ctx, st: SparseTensor,
                 prefix: str = "backbone_3d") -> Dict:
        pre = prefix
        out = super().__call__(P, S, ctx, st, prefix)
        ms = out["multi_scale_3d_features"]
        x1, x2, x3, x4 = ms["x_conv1"], ms["x_conv2"], ms["x_conv3"], \
            ms["x_conv4"]

        def inv(path, src, tgt, p):
            y = inverse_conv(P, f"{pre}.{path}.0", src, tgt.coords,
                             tgt.valid, 3, 2, p)
            return self._bn(P, S, ctx, f"{pre}.{path}.1", y)

        # [x_conv4 -> x_conv3]; conv4's spconv pad (0,1,1) is (z,y,x) ->
        # ours (1,1,0)
        m4 = self._ur_block(P, S, ctx, f"{pre}.conv_up_t4",
                            f"{pre}.conv_up_m4", x4, x4.feats)
        x_up4 = inv("inv_conv4", m4, x3, (1, 1, 0))
        m3 = self._ur_block(P, S, ctx, f"{pre}.conv_up_t3",
                            f"{pre}.conv_up_m3", x3, x_up4.feats)
        x_up3 = inv("inv_conv3", m3, x2, 1)
        m2 = self._ur_block(P, S, ctx, f"{pre}.conv_up_t2",
                            f"{pre}.conv_up_m2", x2, x_up3.feats)
        x_up2 = inv("inv_conv2", m2, x1, 1)
        m1 = self._ur_block(P, S, ctx, f"{pre}.conv_up_t1",
                            f"{pre}.conv_up_m1", x1, x_up2.feats)
        x_up1 = self._bn(P, S, ctx, f"{pre}.conv5.0.1",
                         subm(P, ctx, f"{pre}.conv5.0.0", m1, 3))

        out["point_features"] = x_up1.feats
        out["point_coords"] = x_up1.coords     # stride-1 lattice units
        out["point_valid"] = x_up1.valid
        if not self.return_encoded:
            out.pop("encoded_spconv_tensor")
        return out
