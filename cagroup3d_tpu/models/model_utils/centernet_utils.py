"""CenterNet utilities, TPU-native (reference
pcdet/models/model_utils/centernet_utils.py:1-216).

The reference draws per-object gaussian windows into the heatmap with a
python loop + numpy slicing and decodes with CUDA gathers; here both are
dense vectorized ops: target heatmaps are a max over per-object gaussian
fields evaluated on the full [H, W] grid (one fused elementwise pass —
exactly what the VPU wants), and the top-k decode is lax.top_k over the
flattened map.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_radius(height, width, min_overlap=0.5):
    """Vectorized (centernet_utils.py:9-35)."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0.0))) / 2
    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0.0))) / 2
    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def draw_gaussians_dense(centers, radii, cls_ids, valid, num_classes,
                         fmap_hw):
    """Dense heatmap [num_classes, H, W] = max over objects of the
    reference's windowed gaussian (draw_gaussian_to_heatmap,
    centernet_utils.py:47-70: sigma = (2r+1)/6, support |dx|,|dy| <= r,
    max-composited).

    centers f32[G, 2] (x, y) fmap coords; radii i32[G]; cls_ids i32[G]
    (0-based); valid bool[G].
    """
    H, W = fmap_hw
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    # the reference evaluates the gaussian on an integer grid centered at
    # the ROUNDED center (gaussian2D about the window center)
    cx = jnp.floor(centers[:, 0]).astype(jnp.float32)
    cy = jnp.floor(centers[:, 1]).astype(jnp.float32)
    dx = xs[None, None, :] - cx[:, None, None]            # [G, 1, W]
    dy = ys[None, :, None] - cy[:, None, None]            # [G, H, 1]
    r = radii.astype(jnp.float32)[:, None, None]
    sigma = (2.0 * r + 1.0) / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    support = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r) & \
        valid[:, None, None]
    g = jnp.where(support, g, 0.0)                        # [G, H, W]
    onehot = jax.nn.one_hot(cls_ids, num_classes, axis=0)  # [C, G]
    return jnp.max(g[None] * onehot[..., None, None], axis=1)


def topk_peaks(heatmap, K):
    """heatmap [C, H, W] -> (scores [K], class_ids [K], ys [K], xs [K])
    (reference _topk, centernet_utils.py:136-152, batch folded out)."""
    C, H, W = heatmap.shape
    flat = heatmap.reshape(-1)
    scores, inds = jax.lax.top_k(flat, K)
    cls_ids = (inds // (H * W)).astype(jnp.int32)
    pix = inds % (H * W)
    ys = (pix // W).astype(jnp.float32)
    xs = (pix % W).astype(jnp.float32)
    return scores, cls_ids, pix.astype(jnp.int32), ys, xs
