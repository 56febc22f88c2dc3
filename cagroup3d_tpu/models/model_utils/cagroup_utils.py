"""CAGroup3D model utilities (reference
pcdet/models/model_utils/cagroup_utils.py): residual box coder, bias
init.  ``reduce_mean`` becomes lax.pmean / plain batch means in the
pjit/vmap world (see dense head loss)."""
from __future__ import annotations

import math

import jax.numpy as jnp


def bias_init_with_prob(prior_prob: float) -> float:
    return float(-math.log((1 - prior_prob) / prior_prob))


class CAGroupResidualCoder:
    """Residual encoding vs rois (cagroup_utils.py:91-197): xyz normalized
    by anchor BEV diagonal / dz, log-ratio dims, optional direct sincos
    yaw."""

    def __init__(self, code_size=6, encode_angle_by_sincos=False, **kwargs):
        self.code_size = code_size
        self.encode_angle_by_sincos = encode_angle_by_sincos
        if encode_angle_by_sincos:
            self.code_size += 1

    def encode(self, boxes, anchors):
        anchors = anchors.at[..., 3:6].set(
            jnp.maximum(anchors[..., 3:6], 1e-5))
        boxes = boxes.at[..., 3:6].set(jnp.maximum(boxes[..., 3:6], 1e-5))
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        xg, yg, zg = boxes[..., 0], boxes[..., 1], boxes[..., 2]
        dxg, dyg, dzg = boxes[..., 3], boxes[..., 4], boxes[..., 5]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = [(xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
               jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza)]
        if self.code_size > 6:
            rg = boxes[..., 6]
            if self.encode_angle_by_sincos:
                out += [jnp.cos(rg), jnp.sin(rg)]  # direct delta-theta
            else:
                out += [rg - anchors[..., 6]]
        return jnp.stack(out, axis=-1)

    def decode(self, encodings, anchors):
        xa, ya, za = anchors[..., 0], anchors[..., 1], anchors[..., 2]
        dxa, dya, dza = anchors[..., 3], anchors[..., 4], anchors[..., 5]
        xt, yt, zt = encodings[..., 0], encodings[..., 1], encodings[..., 2]
        dxt, dyt, dzt = encodings[..., 3], encodings[..., 4], encodings[..., 5]
        diag = jnp.sqrt(dxa ** 2 + dya ** 2)
        out = [xt * diag + xa, yt * diag + ya, zt * dza + za,
               jnp.exp(dxt) * dxa, jnp.exp(dyt) * dya, jnp.exp(dzt) * dza]
        if self.code_size > 6:
            ra = anchors[..., 6]
            if self.encode_angle_by_sincos:
                sint, cost = encodings[..., 7], encodings[..., 6]
                cost = jnp.where((jnp.abs(sint) + jnp.abs(cost)) < 1e-8,
                                 1e-8, cost)  # NaN-safe for padded rows
                rg = jnp.arctan2(sint, cost) + ra
            else:
                rg = encodings[..., 6] + ra
            out += [rg]
        return jnp.stack(out, axis=-1)
