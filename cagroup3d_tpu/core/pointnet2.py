"""PointNet++ op family, TPU-native.

Replaces pcdet/ops/pointnet2/pointnet2_batch CUDA kernels
(pointnet2_utils.py: FarthestPointSampling :10, BallQuery :200,
ThreeNN :76, ThreeInterpolate :108, GroupingOperation :156,
QueryAndGroup :231) with static-shape jnp: FPS as a fori_loop of
masked argmax over a running min-distance field; ball query and k-NN as
(optionally chunked) dense distance computations with top-k selection.
Per-scene functions; batch via vmap.  These back the RBGNet /
PointNet2-family models.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from .gather import take_rows

BIG = 1e10


def farthest_point_sample(xyz: jnp.ndarray, valid: jnp.ndarray,
                          n_samples: int) -> jnp.ndarray:
    """i32[n_samples] indices; starts at the first valid point (CUDA kernel
    starts at index 0).  Invalid points are never selected (their distance
    is -inf); if fewer valid points than n_samples, indices repeat."""
    P = xyz.shape[0]
    start = jnp.argmax(valid).astype(jnp.int32)

    def body(i, state):
        idxs, dist = state
        last = idxs[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(valid, d, -BIG))
        nxt = jnp.argmax(dist).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return idxs, dist

    idxs0 = jnp.full((n_samples,), start, jnp.int32)
    dist0 = jnp.where(valid, BIG, -BIG)
    idxs, _ = jax.lax.fori_loop(1, n_samples, body, (idxs0, dist0))
    return idxs


def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               xyz_valid: jnp.ndarray, centers: jnp.ndarray,
               centers_valid: jnp.ndarray, chunk: int = 512):
    """For each center: indices of the first ``nsample`` points (by index
    order, CUDA semantics) within ``radius``; empty slots replicate the
    first found (or 0 if none).  Returns (idx i32[M, nsample],
    any_found bool[M])."""
    P = xyz.shape[0]
    M = centers.shape[0]

    def per_chunk(c_xyz, c_valid):
        d2 = jnp.sum((c_xyz[:, None, :] - xyz[None, :, :]) ** 2, axis=-1)
        inball = (d2 < radius ** 2) & xyz_valid[None, :] & c_valid[:, None]
        order_key = jnp.where(inball, jnp.arange(P, dtype=jnp.int32)[None, :],
                              jnp.int32(P) + jnp.arange(P, dtype=jnp.int32))
        neg = -order_key
        topv, topi = jax.lax.top_k(neg, nsample)   # smallest keys
        found = (-topv) < P
        first = jnp.where(found[:, 0], topi[:, 0], 0)
        idx = jnp.where(found, topi, first[:, None])
        return idx.astype(jnp.int32), found[:, 0]

    nchunk = -(-M // chunk)
    pad = nchunk * chunk - M
    cz = jnp.pad(centers, ((0, pad), (0, 0)))
    cv = jnp.pad(centers_valid, (0, pad))
    idx, any_found = jax.lax.map(
        lambda t: per_chunk(*t),
        (cz.reshape(nchunk, chunk, 3), cv.reshape(nchunk, chunk)))
    return (idx.reshape(nchunk * chunk, nsample)[:M],
            any_found.reshape(-1)[:M])


def three_nn(unknown: jnp.ndarray, unknown_valid: jnp.ndarray,
             known: jnp.ndarray, known_valid: jnp.ndarray):
    """3 nearest known points per unknown point.  Returns
    (dist [N, 3], idx i32[N, 3])."""
    d2 = jnp.sum((unknown[:, None, :] - known[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(known_valid[None, :], d2, BIG)
    neg = -d2
    topv, topi = jax.lax.top_k(neg, 3)
    # The reference ThreeNN op (pointnet2_batch/pointnet2_utils.py:76) is
    # marked non-differentiable and ThreeInterpolate's backward treats the
    # weights as constants; stop_gradient matches that AND avoids the
    # sqrt(0) -> inf backward when a known point coincides with an unknown
    # one (always true at FP levels: the SA centers are raw-point subsets).
    dist = jax.lax.stop_gradient(jnp.sqrt(jnp.maximum(-topv, 0.0)))
    return dist, topi.astype(jnp.int32)


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray,
                      dist: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance-weighted interpolation (ThreeInterpolate).
    feats [M, C], idx [N, 3], dist [N, 3] -> [N, C]."""
    recip = 1.0 / jnp.maximum(dist * dist, 1e-8)
    w = recip / jnp.sum(recip, axis=1, keepdims=True)
    g = take_rows(feats, idx)                      # [N, 3, C]
    return jnp.sum(g * w[..., None], axis=1)


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """GatherOperation: feats [P, C], idx [M] -> [M, C]."""
    return take_rows(feats, idx)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """GroupingOperation: feats [P, C], idx [M, K] -> [M, K, C]."""
    return jnp.take(feats, idx, axis=0)


def query_and_group(radius, nsample, xyz, xyz_valid, centers, centers_valid,
                    feats=None, use_xyz=True, zero_query: bool = False):
    """QueryAndGroup (+ rbgnet_utils.ZeroQueryAndGroup when ``zero_query``:
    groups where the ball found nothing are zeroed instead of replicating
    the first neighbor)."""
    idx, any_found = ball_query(radius, nsample, xyz, xyz_valid, centers,
                                centers_valid)
    grouped_xyz = group_points(xyz, idx) - centers[:, None, :]
    parts = [grouped_xyz] if use_xyz else []
    if feats is not None:
        parts.append(group_points(feats, idx))
    out = jnp.concatenate(parts, axis=-1)
    if zero_query:
        out = jnp.where(any_found[:, None, None], out, 0.0)
    return out, idx, any_found
