"""RBGNet head: vote -> aggregate -> ray-based grouping -> predict.

TPU-native rebuild of pcdet/models/dense_heads/rbg_head.py (RBGHead :73,
RayBasedGrouping :970-1168): per proposal, 66 quasi-uniform rays scaled by
a predicted scale; coarse bins along each ray are tested for surface
intersection (ball-query emptiness against an FPS subsample of the scene),
an intersection classifier gates the per-bin features, fine bins are
importance-resampled by inverse-CDF from the coarse hit distribution, and
the gated bin/ray features are reduced into one pooled vector per proposal
that conditions the box regression.

Everything is static-shape per scene (proposals P, rays R, bins fixed);
the detector vmaps over scenes.  The reference's per-batch python loops
(e.g. _fbs_sample_points, selected_points_list padding) become masked
dense ops; ball-query-vs-instance-points becomes a masked min-distance
test (``_any_within``) — identical semantics, no ragged tensors.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core import pointnet2 as pn2
from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...utils import loss_utils as L
from ..backbones_3d.pointnet2_modules import SAModule
from ..model_utils.rbgnet_utils import (RBGBBoxCoder, aligned_3d_nms,
                                        generate_ray)
from ..model_utils.vote_module import VoteModule, chamfer_distance
from .target_assigner.cagroup3d_assigner import find_points_in_boxes


# ----------------------------------------------------------------------
# small functional MLP: BasicBlock1D stack (conv+BN+ReLU), reference
# rbgnet_utils.MLP -> paths {p}.mlp.layer{i}.conv/.bn
# ----------------------------------------------------------------------
def _init_mlp(P, S, rng, path, channels: List[int], bias=True):
    rngs = jax.random.split(rng, max(len(channels) - 1, 1))
    for i in range(len(channels) - 1):
        init_linear(P, rngs[i], f"{path}.mlp.layer{i}.conv", channels[i],
                    channels[i + 1], bias=bias, init="kaiming")
        init_bn(P, S, f"{path}.mlp.layer{i}.bn", channels[i + 1])


def _apply_mlp(P, S, ctx, path, x, mask, n_layers):
    for i in range(n_layers):
        x = x @ P[f"{path}.mlp.layer{i}.conv.weight"]
        b = P.get(f"{path}.mlp.layer{i}.conv.bias")
        if b is not None:
            x = x + b
        x = apply_bn(P, S, ctx, f"{path}.mlp.layer{i}.bn", x, mask)
        x = jnp.where(mask[:, None], jnp.maximum(x, 0.0), 0.0)
    return x


def _any_within(queries, points, pvalid, radius, chunk=1024,
                point_group=None, query_group=None):
    """bool[Q]: any valid point within ``radius`` of each query; when
    group ids are given, only points of the query's group count (replaces
    ball_query(r, 1) against per-instance padded point lists,
    rbg_head.py:806-819)."""
    Q = queries.shape[0]
    nchunk = -(-Q // chunk)
    pad = nchunk * chunk - Q
    q = jnp.pad(queries, ((0, pad), (0, 0)))
    qg = None
    if query_group is not None:
        qg = jnp.pad(query_group, (0, pad)).reshape(nchunk, chunk)

    def per_chunk(args):
        cq, cg = args
        d2 = jnp.sum((cq[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        ok = pvalid[None, :]
        if cg is not None:
            ok = ok & (point_group[None, :] == cg[:, None])
        return jnp.any((d2 < radius ** 2) & ok, axis=1)

    if qg is None:
        hits = jax.lax.map(lambda c: per_chunk((c, None)),
                           q.reshape(nchunk, chunk, 3))
    else:
        hits = jax.lax.map(per_chunk, (q.reshape(nchunk, chunk, 3), qg))
    return hits.reshape(-1)[:Q]


class RayBasedGrouping:
    def __init__(self, cfg):
        self.ray_num = int(cfg.RAY_NUM)
        self.seed_feat_dim = int(cfg.SEED_FEAT_DIM)
        self.sample_bin_num = int(cfg.SAMPLE_BIN_NUM)
        self.sa_radius = float(cfg.SA_RADIUS)
        self.scale_ratio = float(cfg.SCALE_RATIO)
        self.fps_num_sample = int(cfg.FPS_NUM_SAMPLE)
        self.sa_num_sample = int(cfg.SA_NUM_SAMPLE)
        self.fine_sample_bin_num = int(cfg.FINE_SAMPLE_BIN_NUM)
        self.fine_sa_radius = float(cfg.FINE_SA_RADIUS)
        self.fine_sa_num_sample = int(cfg.FINE_SA_NUM_SAMPLE)
        self.reduce = self.seed_feat_dim // 4          # 64
        self.half = self.reduce // 2                   # 32
        self.rays = generate_ray(self.ray_num)         # [R, 3]

    def init(self, P, S, rng, pre):
        r = list(jax.random.split(rng, 10))
        d, h, half = self.seed_feat_dim, self.seed_feat_dim // 2, self.half
        _init_mlp(P, S, r[0], f"{pre}.seed_feat_reduce", [d, h, self.reduce])
        # zero-query SA shared conv: [reduce+3 -> half]
        for name, ri in [("fine_seed_aggregation", r[1]),
                         ("coarse_seed_aggregation", r[2])]:
            init_linear(P, ri, f"{pre}.{name}.mlps.0.0.conv",
                        self.reduce + 3, half, bias=False, init="kaiming")
            init_bn(P, S, f"{pre}.{name}.mlps.0.0.bn", half)
        _init_mlp(P, S, r[3], f"{pre}.fine_intersection_module",
                  [half + h, half, 2])
        _init_mlp(P, S, r[4], f"{pre}.coarse_intersection_module",
                  [half + h, half, 2])
        _init_mlp(P, S, r[5], f"{pre}.fine_bin_reduce_dim",
                  [self.fine_sample_bin_num * half, half])
        _init_mlp(P, S, r[6], f"{pre}.fine_ray_reduce_dim",
                  [self.ray_num * half, d, h])
        _init_mlp(P, S, r[7], f"{pre}.coarse_bin_reduce_dim",
                  [self.sample_bin_num * half, half])
        _init_mlp(P, S, r[8], f"{pre}.coarse_ray_reduce_dim",
                  [self.ray_num * half, d, h])
        _init_mlp(P, S, r[9], f"{pre}.fuse_layer", [d, d, h])

    # ------------------------------------------------------------------
    def coarse_positions(self, centers, scale_pred):
        """[P, B5, R, 3]: bins at bin_id/B5 for bin_id B5..1 (descending,
        rbg_head.py:1100-1104)."""
        Pn = centers.shape[0]
        rays = jnp.asarray(self.rays, jnp.float32)              # [R, 3]
        rv = rays[None, :, :] * scale_pred[:, None, None]       # [P, R, 3]
        fr = jnp.asarray([b / self.sample_bin_num for b in
                          range(self.sample_bin_num, 0, -1)], jnp.float32)
        rel = rv[:, None, :, :] * (self.scale_ratio * fr)[None, :, None,
                                                          None]
        return centers[:, None, None, :] + rel                  # [P,B5,R,3]

    def fine_fractions(self, coarse_hits):
        """Inverse-CDF importance resampling of fine bin fractions from the
        (gated) coarse hit distribution (rbg_head.py:1119-1168).
        coarse_hits [P, B5, R] (0/1 floats) -> [P, B3, R] ray fractions."""
        B5, B3 = self.sample_bin_num, self.fine_sample_bin_num
        w = jnp.transpose(coarse_hits, (0, 2, 1)) + 1e-5        # [P, R, B5]
        pdf = w / jnp.sum(w, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        u = jnp.linspace(1e-4, 1.0 - 1e-5, B3)                  # [B3]
        # searchsorted right: #cdf entries <= u
        inds = jnp.sum((cdf[:, :, None, :] <= u[None, None, :, None])
                       .astype(jnp.int32), axis=-1)             # [P, R, B3]
        below = jnp.maximum(inds - 1, 0)
        above = jnp.minimum(inds, B5)
        bins = jnp.asarray(list(range(B5, 0, -1)) + [0], jnp.int32)
        centers = jnp.asarray([b / B5 for b in range(1, B5 + 1)],
                              jnp.float32)
        bins_above = jnp.take(bins, above)                      # [P, R, B3]
        # reference gathers bin_center_positions[bins_g] = (bins_g+1)/B5
        # directly (rbg_head.py:1150-1156, no -1 shift) — match it for
        # checkpoint parity; bins_g == B5 (first cdf entry) would index
        # out of range in torch too, clip like the reference's implicit
        # [B5]-sized gather bound
        c_above = jnp.take(centers, jnp.clip(bins_above, 0, B5 - 1))
        hi = c_above + self.sa_radius
        lo = c_above - self.sa_radius
        cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
        denom = cdf_a - cdf_b
        denom = jnp.where(denom < 1e-5, 1.0, denom)
        t = (u[None, None, :] - cdf_b) / denom
        fine = hi - t * (hi - lo)                               # [P, R, B3]
        return jnp.transpose(fine, (0, 2, 1))                   # [P, B3, R]

    def fine_positions(self, centers, scale_pred, fine_frac):
        rays = jnp.asarray(self.rays, jnp.float32)
        rv = rays[None, :, :] * scale_pred[:, None, None]       # [P, R, 3]
        rel = rv[:, None, :, :] * (self.scale_ratio *
                                   fine_frac)[..., None]        # [P,B3,R,3]
        return centers[:, None, None, :] + rel

    def _zero_query_sa(self, P, S, ctx, path, pos_flat, tgt_xyz, tgt_feats,
                       tgt_valid, radius, nsample):
        """ZeroQueryAndGroup + one conv block + max-pool; outputs zeroed
        where the ball found nothing (reference zero_query semantics,
        pointnet2_fbs_backbone.py:247-262)."""
        M = pos_flat.shape[0]
        grouped, idx, found = pn2.query_and_group(
            radius, nsample, tgt_xyz, tgt_valid, pos_flat,
            jnp.ones((M,), bool), feats=tgt_feats, use_xyz=True,
            zero_query=True)
        h = grouped.reshape(M * nsample, -1)
        h = h @ P[f"{path}.mlps.0.0.conv.weight"]
        h = apply_bn(P, S, ctx, f"{path}.mlps.0.0.bn", h,
                     jnp.repeat(found, nsample))
        h = jnp.maximum(h, 0.0).reshape(M, nsample, -1)
        out = jnp.max(h, axis=1)
        return jnp.where(found[:, None], out, 0.0), found

    def _branch(self, P, S, ctx, pre, name, positions, tgt_xyz, tgt_feats,
                tgt_valid, agg_feats, radius, nsample, n_bins):
        """One grouping branch (coarse or fine): zero-query SA, intersection
        classifier, gating, bin+ray reduction.  positions [P, B, R, 3].
        Returns (ray_feats [P, h], intersec_scores [P, B*R, 2],
        gated_hits [P, B, R])."""
        Pn, B, R, _ = positions.shape
        half = self.half
        flat = positions.reshape(-1, 3)
        feats, found = self._zero_query_sa(
            P, S, ctx, f"{pre}.{name}_seed_aggregation", flat, tgt_xyz,
            tgt_feats, tgt_valid, radius, nsample)              # [PBR, 32]
        agg_rep = jnp.repeat(agg_feats, B * R, axis=0)          # [PBR, h]
        sc_in = jnp.concatenate([agg_rep, feats], axis=-1)
        # reference MLP puts BasicBlock1D (conv+BN+ReLU) on EVERY layer,
        # including the 2-channel score output (rbgnet_utils.MLP)
        scores = _apply_mlp(P, S, ctx, f"{pre}.{name}_intersection_module",
                            sc_in, jnp.ones(sc_in.shape[0], bool), 2)
        mask = jnp.argmax(scores, axis=-1)                       # 0/1
        gated = jnp.where(mask[:, None] == 1, feats, 0.0)
        gated = gated.reshape(Pn, B, R, half)
        # bin reduce: channels ordered (c, bin) like the reference reshape
        v = jnp.transpose(gated, (0, 2, 3, 1)).reshape(Pn * R, half * B)
        v = _apply_mlp(P, S, ctx, f"{pre}.{name}_bin_reduce_dim", v,
                       jnp.ones(Pn * R, bool), 1)                # [PR, 32]
        # ray reduce: channels ordered (c, ray)
        v = jnp.transpose(v.reshape(Pn, R, half), (0, 2, 1)).reshape(
            Pn, half * R)
        v = _apply_mlp(P, S, ctx, f"{pre}.{name}_ray_reduce_dim", v,
                       jnp.ones(Pn, bool), 2)                    # [P, h]
        hits = mask.reshape(Pn, B, R).astype(jnp.float32)
        return v, scores.reshape(Pn, B * R, 2), hits

    def __call__(self, P, S, ctx, pre, seed_xyz, seed_feats, seed_valid,
                 scale_pred, centers, points, points_valid, agg_feats):
        """Per scene.  Returns (pooled [P, h], fine_scores [P, B3*R, 2],
        coarse_scores [P, B5*R, 2])."""
        # FPS subsample of the raw scene + seed-feature interpolation
        t_idx = pn2.farthest_point_sample(points, points_valid,
                                          self.fps_num_sample)
        tgt_xyz = jnp.take(points, t_idx, axis=0)
        tgt_valid = jnp.take(points_valid, t_idx)
        dist, idx3 = pn2.three_nn(tgt_xyz, tgt_valid, seed_xyz, seed_valid)
        interp = pn2.three_interpolate(seed_feats, idx3, dist)
        interp = _apply_mlp(P, S, ctx, f"{pre}.seed_feat_reduce", interp,
                            tgt_valid, 2)                        # [T, 64]

        coarse_pos = self.coarse_positions(centers, scale_pred)
        coarse_feats, coarse_scores, coarse_hits = self._branch(
            P, S, ctx, pre, "coarse", coarse_pos, tgt_xyz, interp,
            tgt_valid, agg_feats, self.sa_radius, self.sa_num_sample,
            self.sample_bin_num)

        # fine bins resampled from the *data* hit distribution gated by the
        # classifier (rbg_head.py:1059-1063: targets *= intersection_mask)
        data_hits = _any_within(
            coarse_pos.reshape(-1, 3), tgt_xyz, tgt_valid,
            self.sa_radius).reshape(coarse_hits.shape).astype(jnp.float32)
        gated_hits = data_hits * coarse_hits
        fine_frac = self.fine_fractions(gated_hits)
        fine_pos = self.fine_positions(centers, scale_pred, fine_frac)
        fine_feats, fine_scores, _ = self._branch(
            P, S, ctx, pre, "fine", fine_pos, tgt_xyz, interp, tgt_valid,
            agg_feats, self.fine_sa_radius, self.fine_sa_num_sample,
            self.fine_sample_bin_num)

        fuse_in = jnp.concatenate([fine_feats, coarse_feats], axis=-1)
        pooled = _apply_mlp(P, S, ctx, f"{pre}.fuse_layer", fuse_in,
                            jnp.ones(fuse_in.shape[0], bool), 2)
        return pooled, fine_scores, coarse_scores


class RBGHead:
    def __init__(self, model_cfg, num_class: int, **kwargs):
        c = model_cfg
        self.cfg = c
        self.num_classes = int(c.get("NUM_CLASSES", num_class))
        self.ray_num = int(c.RAY_NUM)
        self.num_proposal = int(c.VOTE_AGGREGATION_CFG.NUM_POINTS)
        self.gt_per_seed = int(c.VOTE_MODULE_CFG.GT_PER_SEED)
        self.fps_num_sample = int(c.FPS_NUM_SAMPLE)
        self.threshold = float(c.THRESHOLD)
        self.sample_bin_num = int(c.SAMPLE_BIN_NUM)
        self.fine_threshold = float(c.FINE_THRESHOLD)
        self.fine_sample_bin_num = int(c.FINE_SAMPLE_BIN_NUM)
        self.scale_ratio = float(c.SCALE_RATIO)
        self.num_dir_bins = int(c.BOX_CODER.NUM_DIR_BINS)
        self.with_rot = bool(c.BOX_CODER.WITH_ROT)
        self.coder = RBGBBoxCoder(self.ray_num, self.num_dir_bins,
                                  int(c.BOX_CODER.NUM_SIZE), self.with_rot)
        self.vote_module = VoteModule(c.VOTE_MODULE_CFG)
        self.rbg = RayBasedGrouping(c.RAY_BASED_GROUP)
        self.lw = dict(c.LOSS_CONFIG.LOSS_WEIGHTS)
        self.train_cfg = c.TRAIN
        self.test_cfg = c.TEST
        agg = c.VOTE_AGGREGATION_CFG
        self.vote_aggregation = SAModule(
            int(agg.NUM_POINTS), float(agg.RADIUS), int(agg.NUM_SAMPLE),
            list(agg.MLP_CHANNELS), use_xyz=bool(agg.get("USE_XYZ", True)))
        self.pred_in = int(c.PRED_LAYER_CFG.IN_CHANNELS)
        self.pred_shared = list(c.PRED_LAYER_CFG.SHARED_CONV_CHANNELS)
        self.rays = generate_ray(self.ray_num)

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "point_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = list(jax.random.split(rng, 8))
        pre = prefix
        p, s = self.vote_module.init(r[0], f"{pre}.vote_module")
        P.update(p)
        S.update(s)
        p, s = self.vote_aggregation.init(r[1], f"{pre}.vote_aggregation")
        P.update(p)
        S.update(s)
        _init_mlp(P, S, r[2], f"{pre}.scale_prediction",
                  [self.pred_in] + self.pred_shared)
        init_linear(P, jax.random.fold_in(r[2], 1),
                    f"{pre}.scale_prediction.mlp.conv_scale",
                    self.pred_shared[-1], 1, bias=True, init="uniform")
        _init_mlp(P, S, r[3], f"{pre}.fuse_feat",
                  [2 * self.pred_in, self.pred_in])
        self.rbg.init(P, S, r[4], f"{pre}.raybasedgrouping")
        _init_mlp(P, S, r[5], f"{pre}.share_pred",
                  [self.pred_in] + self.pred_shared)
        init_linear(P, r[6], f"{pre}.conv_cls", self.pred_shared[-1],
                    self.num_classes + 2, bias=True, init="uniform")
        init_linear(P, r[7], f"{pre}.conv_reg", self.pred_shared[-1],
                    3 + self.num_dir_bins * 2 + 3, bias=True, init="uniform")
        return P, S

    # ------------------------------------------------------------------
    def forward(self, P, S, ctx: Ctx, bb: Dict, prefix: str = "point_head"
                ) -> Dict:
        """bb: per-scene backbone outputs (fp_xyz/fp_features/fp_valid/
        points_cat/...).  Returns the per-scene results dict."""
        pre = prefix
        seed_xyz = bb["fp_xyz"]
        seed_feats = bb["fp_features"]
        seed_valid = bb["fp_valid"]

        vote_xyz, vote_feats, vote_offset, vote_valid = self.vote_module(
            P, S, ctx, seed_xyz, seed_feats, seed_valid,
            prefix=f"{pre}.vote_module")

        # aggregation (rbg_head.py:208-241): 'vote' = FPS on the vote
        # space; 'seed' = FPS on the seed space, centers are the seeds'
        # votes (1 vote/seed, so the index sets coincide)
        mode = str(self.train_cfg.SAMPLE_MODE if ctx.train
                   else self.test_cfg.SAMPLE_MODE)
        if mode == "seed":
            idx = pn2.farthest_point_sample(seed_xyz, seed_valid,
                                            self.num_proposal)
        else:
            idx = None
        agg_xyz, agg_feats, agg_valid, _ = self.vote_aggregation(
            P, S, ctx, f"{pre}.vote_aggregation", vote_xyz, vote_feats,
            vote_valid, sample_idx=idx)

        ones = jnp.ones(agg_xyz.shape[0], bool)
        h = _apply_mlp(P, S, ctx, f"{pre}.scale_prediction", agg_feats,
                       ones, len(self.pred_shared))
        scale_res_norm = (h @
                          P[f"{pre}.scale_prediction.mlp.conv_scale.weight"]
                          + P[f"{pre}.scale_prediction.mlp.conv_scale.bias"])
        scale_pred = jnp.exp(scale_res_norm)[:, 0]               # [P]

        pooled, fine_scores, coarse_scores = self.rbg(
            P, S, ctx, f"{pre}.raybasedgrouping", seed_xyz, seed_feats,
            seed_valid, scale_pred, agg_xyz, bb["points_cat"],
            bb["points_valid"], agg_feats)

        fused = _apply_mlp(P, S, ctx, f"{pre}.fuse_feat",
                           jnp.concatenate([agg_feats, pooled], -1), ones, 1)
        ph = _apply_mlp(P, S, ctx, f"{pre}.share_pred", fused, ones,
                        len(self.pred_shared))
        cls_pred = ph @ P[f"{pre}.conv_cls.weight"] + \
            P[f"{pre}.conv_cls.bias"]
        reg_pred = ph @ P[f"{pre}.conv_reg.weight"] + \
            P[f"{pre}.conv_reg.bias"]

        nb = self.num_dir_bins
        out = dict(
            seed_points=seed_xyz, seed_valid=seed_valid,
            vote_points=vote_xyz, vote_offset=vote_offset,
            aggregated_points=agg_xyz,
            scale_res_norm=scale_res_norm[:, 0],
            scale_pred=scale_pred,
            center=agg_xyz + reg_pred[:, 0:3],
            dir_class=reg_pred[:, 3:3 + nb],
            dir_res_norm=reg_pred[:, 3 + nb:3 + 2 * nb],
            size_res_norm=reg_pred[:, 3 + 2 * nb:6 + 2 * nb],
            obj_scores=cls_pred[:, :2],
            sem_scores=cls_pred[:, 2:],
            fine_intersec_score=fine_scores,
            coarse_intersec_score=coarse_scores,
        )
        return out

    # ------------------------------------------------------------------
    # eval (rbg_head.py:832-968)
    # ------------------------------------------------------------------
    def generate_predicted_boxes(self, out: Dict, points, points_valid,
                                 max_out: int = 0):
        """Per scene: decode boxes, drop near-empty ones, aligned 3D NMS,
        per-class proposals.  Returns (boxes [M, 7], scores [M],
        labels i32[M], valid [M]); M = P (top scores) when max_out == 0
        uses P * num_classes rows like the reference PER_CLASS_PROPOSAL."""
        Pn = out["center"].shape[0]
        K = self.num_classes
        obj = jax.nn.softmax(out["obj_scores"], axis=-1)[:, 1]
        sem = jax.nn.softmax(out["sem_scores"], axis=-1)
        size = jnp.exp(out["size_res_norm"])
        if self.with_rot:
            yaw = self.coder.decode_dir(out["dir_class"],
                                        out["dir_res_norm"])
        else:
            yaw = jnp.zeros(Pn)
        boxes = jnp.concatenate([out["center"], size, yaw[:, None]], -1)

        inside = find_points_in_boxes(points, points_valid, boxes,
                                      jnp.ones(Pn, bool))        # [N, P]
        nonempty = jnp.sum(inside.astype(jnp.int32), axis=0) > 5

        # axis-aligned bound of the (possibly rotated) box
        c, s = jnp.abs(jnp.cos(yaw)), jnp.abs(jnp.sin(yaw))
        ex = (c * size[:, 0] + s * size[:, 1]) / 2
        ey = (s * size[:, 0] + c * size[:, 1]) / 2
        lo = jnp.stack([boxes[:, 0] - ex, boxes[:, 1] - ey,
                        boxes[:, 2] - size[:, 2] / 2], -1)
        hi = jnp.stack([boxes[:, 0] + ex, boxes[:, 1] + ey,
                        boxes[:, 2] + size[:, 2] / 2], -1)
        corners = jnp.concatenate([lo, hi], -1)
        cls_id = jnp.argmax(sem, axis=-1)
        keep = aligned_3d_nms(corners, obj, cls_id, nonempty,
                              float(self.test_cfg.NMS_THR))
        selected = keep & (obj > float(self.test_cfg.SCORE_THR))

        if bool(self.test_cfg.get("PER_CLASS_PROPOSAL", True)):
            boxes_t = jnp.tile(boxes, (K, 1))
            scores_t = (obj[None, :] * sem.T).reshape(-1)        # [K*P]
            labels_t = jnp.repeat(jnp.arange(K, dtype=jnp.int32), Pn)
            valid_t = jnp.tile(selected, (K,))
            if max_out and max_out < K * Pn:
                srt = jnp.where(valid_t, scores_t, -1.0)
                _, ids = jax.lax.top_k(srt, max_out)
                return (boxes_t[ids], scores_t[ids], labels_t[ids],
                        valid_t[ids])
            return boxes_t, scores_t, labels_t, valid_t
        return boxes, obj, cls_id, selected

    # ------------------------------------------------------------------
    # targets + loss (rbg_head.py:292-834)
    # ------------------------------------------------------------------
    def _targets_single(self, out, points, points_valid, sem_mask, ins_mask,
                        gt_boxes, gt_labels, gt_valid, ins_cap: int):
        """Per-scene targets.  gt_boxes [G, 7] (mmdet3d convention)."""
        Pn = self.num_proposal
        G = gt_boxes.shape[0]
        N = points.shape[0]
        centers_gt = gt_boxes[:, :3]
        agg = out["aggregated_points"]

        # vote targets on raw points
        if self.with_rot:
            inside = find_points_in_boxes(points, points_valid, gt_boxes,
                                          gt_valid)              # [N, G]
            rank = jnp.cumsum(inside.astype(jnp.int32), axis=1)
            votes, first = [], None
            for j in range(self.gt_per_seed):
                sel_j = inside & (rank == j + 1)
                has_j = jnp.any(sel_j, axis=1)
                bj = jnp.argmax(sel_j, axis=1)
                vj = centers_gt[bj] - points
                if j == 0:
                    first = vj
                    votes.append(jnp.where(has_j[:, None], vj, 0.0))
                else:
                    votes.append(jnp.where(has_j[:, None], vj, first))
            vote_t = jnp.concatenate(votes, -1)
            vote_m = jnp.any(inside, axis=1) & points_valid
            # instance id for intersection targets: first containing box
            pt_ins = jnp.where(jnp.any(inside, 1),
                               jnp.argmax(inside, 1).astype(jnp.int32), -1)
        else:
            ins = jnp.clip(ins_mask, 0, ins_cap - 1)
            ins_ok = points_valid & (ins_mask >= 0) & (ins_mask < ins_cap) \
                & (sem_mask < self.num_classes)
            seg = jnp.where(ins_ok, ins, ins_cap)
            big = 1e9
            pmin = jnp.full((ins_cap + 1, 3), big).at[seg].min(
                jnp.where(ins_ok[:, None], points, big))[:ins_cap]
            pmax = jnp.full((ins_cap + 1, 3), -big).at[seg].max(
                jnp.where(ins_ok[:, None], points, -big))[:ins_cap]
            icenter = 0.5 * (pmin + pmax)
            vt = icenter[ins] - points
            vote_m = ins_ok
            vote_t = jnp.tile(jnp.where(vote_m[:, None], vt, 0.0),
                              (1, self.gt_per_seed))
            # instance -> nearest gt match for the ray targets
            d = jnp.sum((points[:, None, :] - centers_gt[None]) ** 2, -1)
            d = jnp.where(gt_valid[None, :] & ins_ok[:, None], d, big)
            pt_ins_gt = jnp.argmin(d, axis=1).astype(jnp.int32)
            pt_ins = jnp.where(ins_ok, pt_ins_gt, -1)

        # proposal -> gt assignment by nearest center
        d2 = jnp.sum((agg[:, None, :] - centers_gt[None]) ** 2, -1)
        d2 = jnp.where(gt_valid[None, :], d2, 1e10)
        assignment = jnp.argmin(d2, axis=1).astype(jnp.int32)
        euclid = jnp.sqrt(jnp.min(d2, axis=1) + 1e-6)
        pos_thr = float(self.train_cfg.POS_DISTANCE_THR)
        neg_thr = float(self.train_cfg.NEG_DISTANCE_THR)
        obj_mask = ((euclid < pos_thr) | (euclid > neg_thr)).astype(
            jnp.float32)

        a_box = gt_boxes[assignment]
        a_center = a_box[:, :3]
        a_half = a_box[:, 3:6] / 2
        canonical = agg - a_center
        if self.with_rot:
            ang = -a_box[:, 6]
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            canonical = jnp.stack(
                [canonical[:, 0] * ca - canonical[:, 1] * sa,
                 canonical[:, 0] * sa + canonical[:, 1] * ca,
                 canonical[:, 2]], -1)
        dist6 = jnp.concatenate([a_half - canonical, a_half + canonical],
                                -1)
        inside_m = jnp.all(dist6 >= 0.0, axis=-1)
        obj_t = ((euclid < pos_thr) & inside_m).astype(jnp.int32)

        # dir/size/scale/sem targets of the assigned gt
        enc = self.coder.encode(gt_boxes, gt_labels)
        dir_cls_t = enc["dir_class"][assignment]
        dir_res_t = enc["dir_res"][assignment] / (np.pi / self.num_dir_bins)
        size_t = enc["size"][assignment]
        scale_t = enc["scale"][assignment, 0]
        sem_t = gt_labels[assignment]

        # ray intersection targets against the instance points of the
        # assigned gt among an FPS subsample (rbg_head.py:737-830)
        t_idx = pn2.farthest_point_sample(points, points_valid,
                                          self.fps_num_sample)
        s_xyz = jnp.take(points, t_idx, axis=0)
        s_valid = jnp.take(points_valid, t_idx)
        s_ins = jnp.take(pt_ins, t_idx)

        scale_pred = jax.lax.stop_gradient(out["scale_pred"])
        coarse_pos = self.rbg.coarse_positions(agg, scale_pred)
        B5, B3, R = (self.sample_bin_num, self.fine_sample_bin_num,
                     self.ray_num)
        cflat = coarse_pos.reshape(-1, 3)
        qgrp = jnp.repeat(assignment, B5 * R)
        coarse_obj = _any_within(cflat, s_xyz, s_valid & (s_ins >= 0),
                                 self.threshold, point_group=s_ins,
                                 query_group=qgrp)
        coarse_valid = _any_within(cflat, s_xyz, s_valid, self.threshold)
        # fine positions re-derived exactly like the forward (gated by the
        # *data* hits; the train-time forward uses the same construction)
        data_hits = coarse_valid.reshape(Pn, B5, R).astype(jnp.float32)
        fine_frac = self.rbg.fine_fractions(data_hits)
        fine_pos = self.rbg.fine_positions(agg, scale_pred, fine_frac)
        fflat = fine_pos.reshape(-1, 3)
        qgrp_f = jnp.repeat(assignment, B3 * R)
        fine_obj = _any_within(fflat, s_xyz, s_valid & (s_ins >= 0),
                               self.fine_threshold, point_group=s_ins,
                               query_group=qgrp_f)
        fine_valid = _any_within(fflat, s_xyz, s_valid, self.fine_threshold)

        return dict(
            vote_t=vote_t, vote_m=vote_m,
            obj_t=obj_t, obj_mask=obj_mask,
            dir_cls_t=dir_cls_t, dir_res_t=dir_res_t,
            sem_t=sem_t, size_t=size_t, scale_t=scale_t,
            a_center=a_center,
            coarse_t=coarse_obj.reshape(Pn, B5 * R).astype(jnp.int32),
            coarse_v=coarse_valid.reshape(Pn, B5 * R).astype(jnp.int32),
            fine_t=fine_obj.reshape(Pn, B3 * R).astype(jnp.int32),
            fine_v=fine_valid.reshape(Pn, B3 * R).astype(jnp.int32),
        )

    def loss(self, outs: Dict, bbs: Dict, batch: Dict, ins_cap: int = 128):
        """Batched loss.  outs: vmapped head outputs; bbs: vmapped backbone
        outputs; batch: points/gt arrays (scene-normalized frames)."""
        gt_boxes = batch["gt_boxes"]
        gt_labels = batch["gt_labels"]
        gt_valid = batch["gt_valid"]
        points = batch["points"]
        points_valid = batch["points_valid"]
        sem_mask = batch.get("semantic_mask")
        ins_mask = batch.get("instance_mask")
        B = gt_boxes.shape[0]
        if sem_mask is None:
            sem_mask = jnp.full(points.shape[:2], self.num_classes,
                                jnp.int32)
            ins_mask = jnp.zeros(points.shape[:2], jnp.int32)

        tg = jax.vmap(lambda o, p, pv, sm, im, gb, gl, gv:
                      self._targets_single(o, p, pv, sm, im, gb, gl, gv,
                                           ins_cap))(
            outs, points, points_valid, sem_mask, ins_mask, gt_boxes,
            gt_labels, gt_valid)
        tg = jax.tree.map(jax.lax.stop_gradient, tg)

        lw = self.lw
        eps = 1e-6
        obj_t = tg["obj_t"]
        obj_w = tg["obj_mask"] / (jnp.sum(tg["obj_mask"]) + eps)
        box_w = obj_t.astype(jnp.float32) / (jnp.sum(obj_t) + eps)

        # vote loss: targets on raw points, gathered at the seed indices
        def vote_one(bb_i, out_i, vt, vm):
            idx = bb_i["fp_indices"]
            return self.vote_module.get_loss(
                out_i["seed_points"], out_i["vote_points"],
                out_i["seed_valid"], jnp.take(vm, idx), jnp.take(vt, idx,
                                                                 axis=0))
        vote_loss = jnp.mean(jax.vmap(vote_one)(bbs, outs, tg["vote_t"],
                                                tg["vote_m"]))

        # objectness (CE weights [0.2, 0.8])
        obj_loss = jnp.sum(L.cross_entropy_with_logits(
            outs["obj_scores"], obj_t, class_weight=[0.2, 0.8]) * obj_w)

        # center chamfer (both directions, x10 each)
        def center_one(c, cv, g, gv):
            s2t, t2s, _, _ = chamfer_distance(c, cv, g, gv)
            return s2t, t2s
        ones_p = jnp.ones(obj_t.shape, bool)
        s2t, t2s = jax.vmap(center_one)(
            outs["center"], ones_p, gt_boxes[..., :3], gt_valid)
        gt_w = gt_valid.astype(jnp.float32) / \
            (jnp.sum(gt_valid.astype(jnp.float32)) + eps)
        center_loss = 10.0 * jnp.sum(s2t * box_w) + \
            10.0 * jnp.sum(t2s * gt_w)

        # direction
        dir_cls_loss = jnp.sum(L.cross_entropy_with_logits(
            outs["dir_class"], tg["dir_cls_t"]) * box_w)
        onehot = jax.nn.one_hot(tg["dir_cls_t"], self.num_dir_bins)
        dir_res_pred = jnp.sum(outs["dir_res_norm"] * onehot, -1)
        dir_res_loss = jnp.sum(L.smooth_l1(
            dir_res_pred, tg["dir_res_t"], beta=1.0 / 25.0,
            reduction="none") * box_w)

        # size / scale (smooth-l1 on exp'd residuals, beta 1/16)
        size_pred = jnp.exp(outs["size_res_norm"])
        size_loss = jnp.sum(L.smooth_l1(size_pred, tg["size_t"],
                                        beta=1.0 / 16.0, reduction="none")
                            * box_w[..., None])
        scale_pred = jnp.exp(outs["scale_res_norm"])
        scale_loss = jnp.sum(L.smooth_l1(scale_pred, tg["scale_t"],
                                         beta=1.0 / 16.0, reduction="none")
                             * box_w)

        # semantic
        sem_loss = jnp.sum(L.cross_entropy_with_logits(
            outs["sem_scores"], tg["sem_t"]) * box_w)

        # intersection losses
        def intersec(scores, t, v):
            w = (obj_t[..., None] * v).astype(jnp.float32)
            w = w / (jnp.sum(w) + eps)
            ls = L.cross_entropy_with_logits(scores, t,
                                             class_weight=[0.5, 0.5])
            return jnp.sum(ls * w)
        fine_il = intersec(outs["fine_intersec_score"], tg["fine_t"],
                           tg["fine_v"])
        coarse_il = intersec(outs["coarse_intersec_score"], tg["coarse_t"],
                             tg["coarse_v"])

        # iou loss on axis-aligned corners
        c_pred = jnp.concatenate([outs["center"] - size_pred / 2,
                                  outs["center"] + size_pred / 2], -1)
        c_tgt = jnp.concatenate([tg["a_center"] - tg["size_t"] / 2,
                                 tg["a_center"] + tg["size_t"] / 2], -1)
        iou_loss = L.axis_aligned_iou_loss(c_pred, c_tgt, weight=box_w)

        # foreground sample losses per FBS level
        fg = (sem_mask < self.num_classes).astype(jnp.int32)
        sample_losses = []
        n_levels = len(bbs["sa_scores"]) if isinstance(
            bbs.get("sa_scores"), (list, tuple)) else 0
        for li in range(n_levels):
            score, sidx = bbs["sa_scores"][li]

            def one(sc, si, f):
                # reference weighting (rbg_head.py:441-446): uniform
                # ones/sum over the whole [B, Ni] tensor, i.e. a plain
                # mean over B*Ni.  Ni is static per level here, so the
                # per-scene mean + cross-scene mean below is identical.
                t = jnp.take(f, si)
                w = jnp.ones(t.shape, jnp.float32)
                w = w / jnp.sum(w)
                return jnp.sum(L.cross_entropy_with_logits(
                    sc, t, class_weight=[0.2, 0.8]) * w)
            sample_losses.append(jnp.mean(jax.vmap(one)(score, sidx, fg)))

        total = (vote_loss
                 + lw["scale_loss_weight"] * scale_loss
                 + lw["obj_loss_weight"] * obj_loss
                 + sem_loss + center_loss
                 + lw["dir_class_loss_weight"] * dir_cls_loss
                 + lw["dir_res_loss_weight"] * dir_res_loss
                 + lw["size_loss_weight"] * size_loss
                 + lw["intersection_loss_weight"] * (fine_il + coarse_il)
                 + lw["iou_loss_weight"] * iou_loss)
        tb = dict(vote_loss=vote_loss, scale_res_loss=scale_loss,
                  objectness_loss=obj_loss, semantic_loss=sem_loss,
                  center_loss=center_loss, dir_class_loss=dir_cls_loss,
                  dir_res_loss=dir_res_loss, size_res_loss=size_loss,
                  fine_intersec_loss=fine_il, coarse_intersec_loss=coarse_il,
                  iou_loss=iou_loss)
        for i, sl in enumerate(sample_losses):
            total = total + lw["sample_loss_weight"] * sl
            tb[f"sample_loss_{i}"] = sl
        tb["loss_all"] = total
        return total, tb
