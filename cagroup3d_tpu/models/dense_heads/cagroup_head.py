"""CAGroup3D one-stage head: semantic + vote + class-aware local grouping.

TPU-native rebuild of pcdet/models/dense_heads/cagroup_head.py.  The
reference loops over classes in Python, re-voxelizing selected voxels per
class with MinkowskiEngine (the documented 180->400 ms regression,
README.md:19).  Here the class axis is a *tensor axis*: selection masks,
re-voxelization, the per-class conv stacks (k9 fine / k5 expanded /
generative-transpose k3s3 / 1x1 fuse) and the shared prediction heads all
run batched over [n_cls, CAP, ...] with stacked weights — one compiled
program, MXU-shaped batched matmuls, no host loop.

Per-scene module: the detector vmaps it over scenes.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.hashing import build_index, lookup
from ...core.kernel_maps import transpose_offsets
from ...core.module import (Ctx, Params, init_bn, init_conv, me_default_conv,
                            normal_conv)
from ...core.norm import elu, masked_batch_norm
from ...core.sparse import SparseTensor
from ...core.sparse_conv import (scan_conv_at_classes,
                                 scan_conv_grouped_classes)
from ...core import nms as nms_mod
from ..layers import act, bn, subm
from ..model_utils.cagroup_utils import bias_init_with_prob
from .target_assigner.cagroup3d_assigner import (CAGroup3DAssigner,
                                                 find_points_in_boxes)

# Per-class anisotropic voxel sizes (cagroup_head.py:75-106).
SCANNET_VOXELS = [
    [0.2309, 0.2435, 0.2777], [0.5631, 0.5528, 0.3579],
    [0.1840, 0.1845, 0.2155], [0.4187, 0.4536, 0.2503],
    [0.2938, 0.3203, 0.1899], [0.1595, 0.1787, 0.5250],
    [0.2887, 0.2174, 0.3445], [0.2497, 0.3147, 0.5063],
    [0.0634, 0.1262, 0.1612], [0.4332, 0.5691, 0.0810],
    [0.3088, 0.4212, 0.2627], [0.4130, 0.1966, 0.5044],
    [0.1995, 0.2133, 0.3897], [0.1260, 0.1137, 0.5254],
    [0.1781, 0.1774, 0.2218], [0.1526, 0.1520, 0.0904],
    [0.3453, 0.3164, 0.1491], [0.1426, 0.1477, 0.1741]]
SUNRGBD_VOXELS = [
    [0.6343, 0.4861, 0.2782], [0.2373, 0.3839, 0.2155],
    [0.2771, 0.5602, 0.2536], [0.1776, 0.1659, 0.2482],
    [0.2097, 0.1363, 0.2269], [0.2086, 0.4039, 0.2209],
    [0.1586, 0.3008, 0.3519], [0.1502, 0.1896, 0.2050],
    [0.1214, 0.3213, 0.5067], [0.2298, 0.4195, 0.1418]]


def _bn_stacked(P, S, ctx: Ctx, path: str, x, mask):
    """Per-class batch norm over stacked [n_cls, N, C] maps; each class has
    its own statistics (the reference has n_cls separate BN layers)."""
    def one(w, b, rm, rv, xi, mi):
        return masked_batch_norm(xi, mi, w, b, rm, rv, train=ctx.train,
                                 axis_name=ctx.axis_name)
    y, (rm, rv) = jax.vmap(one)(
        P[path + ".weight"], P[path + ".bias"],
        S[path + ".running_mean"], S[path + ".running_var"], x, mask)
    if ctx.train:
        ctx.updates[path + ".running_mean"] = rm
        ctx.updates[path + ".running_var"] = rv
    return y


class CAGroup3DHead:
    def __init__(self, model_cfg, yaw_parametrization="fcaf3d",
                 predict_boxes=True, **kwargs):
        c = model_cfg
        self.n_classes = c.N_CLASSES
        self.out_channels = c.OUT_CHANNELS
        self.n_reg_outs = c.N_REG_OUTS
        self.voxel_size = c.VOXEL_SIZE
        self.semantic_threshold = c.SEMANTIC_THR
        self.expand = c.EXPAND_RATIO
        self.with_yaw = c.WITH_YAW
        self.use_sem_score = c.get("USE_SEM_SCORE", False)
        self.cls_kernel = c.CLS_KERNEL
        self.yaw_parametrization = yaw_parametrization
        self.predict_boxes = predict_boxes
        self.assigner = CAGroup3DAssigner(c.ASSIGNER)
        self.nms_cfg = c.get("NMS_CONFIG", None)
        self.loss_cfg = c
        if self.n_classes == 18:
            vox = SCANNET_VOXELS
        elif self.n_classes == 10:
            vox = SUNRGBD_VOXELS
        else:  # non-standard class counts (tests): cycle the ScanNet table
            vox = [SCANNET_VOXELS[i % len(SCANNET_VOXELS)]
                   for i in range(self.n_classes)]
        self.voxel_size_list = np.clip(np.array(vox) / 2.0, 0.04, 1.0)
        self.gt_per_seed = 3
        # static capacities
        self.fine_cap = int(c.get("FINE_CAP", 4096))
        self.expand_cap = int(c.get("EXPAND_CAP", 2048))
        assert self.fine_cap % 128 == 0 and self.expand_cap % 128 == 0, \
            "FINE_CAP/EXPAND_CAP must be multiples of 128 (lane-row tables)"
        self.max_rois = int(c.get("MAX_ROIS", 256))
        self.nms_per_cls_cap = int(c.get("NMS_PER_CLS_CAP", 256))

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "dense_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        C, n_cls = self.out_channels, self.n_classes
        r = list(jax.random.split(rng, 24))
        pre = prefix
        n_off = 9 if self.with_yaw else 3
        # offset_block: [k1, BN, ELU, k1, BN, ELU, k1(out 3|9)]
        init_conv(P, r[0], pre + ".offset_block.0", 1, C, C)
        init_bn(P, S, pre + ".offset_block.1", C)
        init_conv(P, r[1], pre + ".offset_block.3", 1, C, C)
        init_bn(P, S, pre + ".offset_block.4", C)
        init_conv(P, r[2], pre + ".offset_block.6", 1, C, n_off)
        # feature_offset: [k3, BN, ELU]; 3x channels for sunrgbd 3-vote
        f_out = 3 * C if self.with_yaw else C
        init_conv(P, r[3], pre + ".feature_offset.0", 3, C, f_out)
        init_bn(P, S, pre + ".feature_offset.1", f_out)
        # shared prediction convs (normal std=.01 init, cagroup_head.py:190)
        P[pre + ".semantic_conv.kernel"] = normal_conv(r[4], 1, C, n_cls)
        P[pre + ".semantic_conv.bias"] = jnp.full((n_cls,),
                                                  bias_init_with_prob(0.01))
        P[pre + ".centerness_conv.kernel"] = normal_conv(r[5], 1, C, 1)
        P[pre + ".reg_conv.kernel"] = normal_conv(r[6], 1, C, self.n_reg_outs)
        P[pre + ".cls_conv.kernel"] = normal_conv(r[7], 1, C, n_cls)
        P[pre + ".cls_conv.bias"] = jnp.full((n_cls,),
                                             bias_init_with_prob(0.01))
        P[pre + ".scales.scale"] = jnp.ones((n_cls,))
        # per-class stacks (stacked leading class axis)
        k3 = self.cls_kernel ** 3
        P[pre + ".cls_individual_out.0.kernel"] = jax.vmap(
            lambda k: normal_conv(k, k3, C, C))(
                jax.random.split(r[8], n_cls))
        P[pre + ".cls_individual_expand_out.0.kernel"] = jax.vmap(
            lambda k: me_default_conv(k, 125, C, C))(
                jax.random.split(r[9], n_cls))
        P[pre + ".cls_individual_up.0.kernel"] = jax.vmap(
            lambda k: me_default_conv(k, 27, C, C))(
                jax.random.split(r[10], n_cls))
        P[pre + ".cls_individual_fuse.0.kernel"] = jax.vmap(
            lambda k: me_default_conv(k, 1, 2 * C, C))(
                jax.random.split(r[11], n_cls))
        for name, ch in [("cls_individual_out.1", C),
                         ("cls_individual_expand_out.1", C),
                         ("cls_individual_up.1.0", C),
                         ("cls_individual_fuse.1", C)]:
            P[f"{pre}.{name}.weight"] = jnp.ones((n_cls, ch))
            P[f"{pre}.{name}.bias"] = jnp.zeros((n_cls, ch))
            S[f"{pre}.{name}.running_mean"] = jnp.zeros((n_cls, ch))
            S[f"{pre}.{name}.running_var"] = jnp.ones((n_cls, ch))
        return P, S

    # ------------------------------------------------------------------
    def forward(self, P: Params, S: Params, ctx: Ctx, st: SparseTensor,
                semantic_threshold, prefix: str = "dense_head",
                stop_after: str = None) -> Dict[str, jnp.ndarray]:
        """st: backbone output (stride 2 on the base lattice), per scene.

        stop_after: profiling cut (tools/profile_head.py, same idea as
        biresnet's stop_after): "sem_offsets" | "maps" | "cls_convs" |
        "up_fuse" return partial dicts so XLA dead-code-eliminates the
        rest of the head; production callers leave it None."""
        pre = prefix
        v = self.voxel_size
        n_cls, C = self.n_classes, self.out_channels
        N2 = st.cap

        sem = subm(P, ctx, pre + ".semantic_conv", st, 1).feats  # [N2, n_cls]

        # offset block (1x1 convs = plain MLP over features)
        x = act(bn(P, S, ctx, pre + ".offset_block.1",
                   subm(P, ctx, pre + ".offset_block.0", st, 1)), "elu")
        x = act(bn(P, S, ctx, pre + ".offset_block.4",
                   subm(P, ctx, pre + ".offset_block.3", x, 1)), "elu")
        voxel_offsets = subm(P, ctx, pre + ".offset_block.6", x, 1).feats
        offset_feats = act(bn(P, S, ctx, pre + ".feature_offset.1",
                              subm(P, ctx, pre + ".feature_offset.0", st, 3)),
                           "elu").feats

        # scene bounds (cagroup_head.py:209-211)
        big = 1e9
        cvalid = st.valid[:, None]
        cmax = jnp.max(jnp.where(cvalid, st.coords, -big), axis=0)
        cmin = jnp.min(jnp.where(cvalid, st.coords, big), axis=0)
        max_bound = (cmax + st.stride) * v
        min_bound = (cmin - st.stride) * v

        pts_metric = st.coords.astype(jnp.float32) * v  # [N2, 3]
        n_votes = 3 if self.with_yaw else 1
        off = jax.lax.stop_gradient(voxel_offsets).reshape(N2, n_votes, 3)
        voted = jnp.clip(pts_metric[:, None, :] + off, min_bound, max_bound)

        # class selection (sigmoid(sem) > thr, plus a pad voxel so every
        # class map is non-empty, cagroup_head.py:207,227-231)
        sel = jax.nn.sigmoid(sem) > semantic_threshold          # [N2, n_cls]
        pad_idx = jnp.argmax(st.valid)
        sel = sel.at[pad_idx, :].set(True)
        sel = sel & st.valid[:, None]

        # fused per-class point set: voted votes + original voxels
        pts_all = jnp.concatenate(
            [voted.reshape(N2 * n_votes, 3), pts_metric], axis=0)
        if self.with_yaw:
            feats_all = jnp.concatenate(
                [offset_feats.reshape(N2 * n_votes, C), st.feats], axis=0)
            sel_all = jnp.concatenate(
                [jnp.repeat(sel, n_votes, axis=0), sel], axis=0)
        else:
            feats_all = jnp.concatenate([offset_feats, st.feats], axis=0)
            sel_all = jnp.concatenate([sel, sel], axis=0)     # [2*N2, n_cls]

        if stop_after == "sem_offsets":
            return dict(semantic_scores=sem, voxel_offsets=voxel_offsets,
                        offset_feats=offset_feats, voted=voted, sel=sel)

        vox_sizes = jnp.asarray(self.voxel_size_list, jnp.float32)

        # class-batched re-voxelization: BOTH maps from one sort (the
        # coarse lattice is fine_lat // expand and packed-key order is
        # monotone under that division, core/voxelize.py); scene-folded
        # under the detector's vmap (core/scene_fold.folded_paired_maps)
        from ...core.scene_fold import folded_paired_maps
        sel_t = jnp.swapaxes(sel_all, 0, 1)                  # [n_cls, 2N]
        lat_f = jnp.floor(pts_all[None] /
                          vox_sizes[:, None, :]).astype(jnp.int32)
        (fc, ff, fv), (cc, cf, cv), (of_f, of_c) = folded_paired_maps(
            lat_f, feats_all, sel_t, self.fine_cap, self.expand_cap,
            self.expand, drop_offset=getattr(ctx, "drop_offset", None),
            train=ctx.train)
        ctx.stats["overflow/head_fine"] = jnp.sum(of_f)
        ctx.stats["overflow/head_expand"] = jnp.sum(of_c)
        fine = SparseTensor(fc, ff, fv, 1)
        coarse = SparseTensor(cc, cf, cv, 1)
        if stop_after == "maps":
            return dict(semantic_scores=sem, fine_feats=ff,
                        coarse_feats=cf, fine_valid=fv, coarse_valid=cv)
        # fine: stacked [n_cls, FINE_CAP, ...] on the per-class lattice
        # (stride 1); coarse on the x{expand} lattice.

        # per-class k9/k5 convs: MXU-fused Pallas kernel on TPU (one-hot
        # slab matmuls over the VMEM-resident sorted table, ops/
        # pallas_conv.py); XLA grouped z-run gathers elsewhere.  The
        # unique_voxels_classes output is key-sorted, which the MXU
        # kernel requires.
        def _cls_conv(st_cls, kernel_size, w):
            # folded variants: under the detector's scene vmap the batch
            # axis folds into the class-group axis (core/scene_fold.py)
            # so gathers stay flat and the Pallas grid stays per-class
            if jax.default_backend() == "tpu" \
                    and self.loss_cfg.get("MXU_HEAD", True) \
                    and st_cls.coords.shape[1] >= 256:
                from ...core.scene_fold import folded_subm_mxu
                return folded_subm_mxu(
                    st_cls.coords, st_cls.valid, st_cls.feats, w,
                    kernel_size, train=ctx.train)
            from ...core.scene_fold import folded_grouped_classes_t
            return folded_grouped_classes_t(
                st_cls.coords, st_cls.valid, st_cls.feats, 1, kernel_size,
                w)

        f_out = _cls_conv(fine, self.cls_kernel,
                          P[pre + ".cls_individual_out.0.kernel"])
        f_out = _bn_stacked(P, S, ctx, pre + ".cls_individual_out.1", f_out,
                            fine.valid)
        f_out = jnp.where(fine.valid[..., None], elu(f_out), 0.0)

        # expanded map: k5 on the coarse lattice (its own units)
        e_out = _cls_conv(coarse, 5,
                          P[pre + ".cls_individual_expand_out.0.kernel"])
        e_out = _bn_stacked(P, S, ctx, pre + ".cls_individual_expand_out.1",
                            e_out, coarse.valid)
        e_out = jnp.where(coarse.valid[..., None], elu(e_out), 0.0)
        if stop_after == "cls_convs":
            return dict(semantic_scores=sem, f_out=f_out, e_out=e_out)

        # generative transpose k3 s3 decoded at the fine coords; with
        # kernel == stride each fine voxel has exactly one parent, so the
        # 27-offset scan collapses to one lookup + one-hot weights
        if self.expand == 3:
            from ...core.scene_fold import folded_generative_up_t
            up_out = folded_generative_up_t(
                coarse.coords * self.expand, coarse.valid, e_out,
                self.expand, fine.coords, fine.valid,
                P[pre + ".cls_individual_up.0.kernel"])
        else:
            from ...core.scene_fold import folded_at_classes_t
            k_up = transpose_offsets(3, 1)
            up_out = folded_at_classes_t(
                coarse.coords * self.expand, coarse.valid, e_out,
                self.expand, fine.coords, fine.valid, k_up,
                P[pre + ".cls_individual_up.0.kernel"], tgt_stride=1)
        up_out = _bn_stacked(P, S, ctx, pre + ".cls_individual_up.1.0",
                             up_out, fine.valid)
        up_out = jnp.where(fine.valid[..., None], elu(up_out), 0.0)

        # fuse [up, fine] -> 1x1 conv
        fused = jnp.concatenate([up_out, f_out], axis=-1)
        w_fuse = P[pre + ".cls_individual_fuse.0.kernel"][:, 0]  # [n_cls,2C,C]
        fused = jnp.einsum("knc,kcd->knd", fused, w_fuse)
        fused = _bn_stacked(P, S, ctx, pre + ".cls_individual_fuse.1", fused,
                            fine.valid)
        fused = jnp.where(fine.valid[..., None], elu(fused), 0.0)
        if stop_after == "up_fuse":
            return dict(semantic_scores=sem, fused=fused)

        # shared heads (1x1 convs) + per-class scale on distances
        w_center = P[pre + ".centerness_conv.kernel"][0]
        w_reg = P[pre + ".reg_conv.kernel"][0]
        w_cls = P[pre + ".cls_conv.kernel"][0]
        centerness = fused @ w_center                          # [n_cls,N,1]
        reg = fused @ w_reg
        cls_score = fused @ w_cls + P[pre + ".cls_conv.bias"]
        scales = P[pre + ".scales.scale"][:, None, None]
        reg_dist = jnp.exp(jnp.clip(reg[..., :6] * scales, -10.0, 10.0))
        bbox_pred = jnp.concatenate([reg_dist, reg[..., 6:]], axis=-1)
        points = fine.coords.astype(jnp.float32) * vox_sizes[:, None, :]

        return dict(
            semantic_scores=sem,
            semantic_valid=st.valid,
            semantic_points=pts_metric,
            voxel_offsets=voxel_offsets,
            centernesses=centerness,
            bbox_preds=bbox_pred,
            cls_scores=cls_score,
            points=points,
            points_valid=fine.valid,
        )

    # ------------------------------------------------------------------
    def bbox_pred_to_bbox(self, points, bbox_pred):
        """cagroup_head.py:654-703; returns [..., 6] (no yaw) or [..., 7]."""
        x = points[..., 0] + (bbox_pred[..., 1] - bbox_pred[..., 0]) / 2
        y = points[..., 1] + (bbox_pred[..., 3] - bbox_pred[..., 2]) / 2
        z = points[..., 2] + (bbox_pred[..., 5] - bbox_pred[..., 4]) / 2
        base = jnp.stack([
            x, y, z,
            bbox_pred[..., 0] + bbox_pred[..., 1],
            bbox_pred[..., 2] + bbox_pred[..., 3],
            bbox_pred[..., 4] + bbox_pred[..., 5]], axis=-1)
        if bbox_pred.shape[-1] == 6:
            return base
        if self.yaw_parametrization == "naive":
            return jnp.concatenate([base, bbox_pred[..., 6:7]], axis=-1)
        # guard exactly-zero (padded) rows: sqrt/atan2 at (0,0) produce NaN
        # cotangents even under a zero loss weight
        s6, c7 = bbox_pred[..., 6], bbox_pred[..., 7]
        degenerate = (jnp.abs(s6) + jnp.abs(c7)) < 1e-8
        c7 = jnp.where(degenerate, 1e-8, c7)
        if self.yaw_parametrization == "sin-cos":
            norm = jnp.sqrt(s6 ** 2 + c7 ** 2 + 1e-12)
            yaw = jnp.arctan2(s6 / norm, c7 / norm)
            return jnp.concatenate([base, yaw[..., None]], axis=-1)
        # fcaf3d: sin(2a)ln(q), cos(2a)ln(q)
        scale = (bbox_pred[..., 0] + bbox_pred[..., 1] +
                 bbox_pred[..., 2] + bbox_pred[..., 3])
        q = jnp.exp(jnp.sqrt(s6 ** 2 + c7 ** 2 + 1e-12))
        alpha = 0.5 * jnp.arctan2(s6, c7)
        return jnp.stack([
            x, y, z, scale / (1 + q), scale / (1 + q) * q,
            bbox_pred[..., 5] + bbox_pred[..., 4], alpha], axis=-1)

    def get_bboxes(self, out: Dict[str, jnp.ndarray], training: bool = False):
        """Per scene: flatten class maps, NMS_PRE top-k, decode, per-class
        NMS (cagroup_head.py:579-624).  Returns padded
        (boxes [R, 7], scores [R], labels [R], valid [R])."""
        ncl = self.n_classes
        flat = lambda a: a.reshape((-1,) + a.shape[2:])
        centerness = flat(out["centernesses"])            # [M, 1]
        bbox_pred = flat(out["bbox_preds"])
        cls_score = flat(out["cls_scores"])
        points = flat(out["points"])
        valid = out["points_valid"].reshape(-1)

        scores = jax.nn.sigmoid(cls_score) * jax.nn.sigmoid(centerness)
        max_scores = jnp.max(jnp.where(valid[:, None], scores, -1.0), axis=1)
        nms_pre = int(self.nms_cfg.NMS_PRE)
        k = min(nms_pre, scores.shape[0])
        _, ids = jax.lax.top_k(jnp.where(valid, max_scores, -1e10), k)
        bbox_pred, scores, points = bbox_pred[ids], scores[ids], points[ids]
        valid = valid[ids]

        boxes = self.bbox_pred_to_bbox(points, bbox_pred)
        if boxes.shape[-1] == 6:
            boxes = jnp.concatenate(
                [boxes, jnp.zeros_like(boxes[..., :1])], axis=-1)
        return nms_mod.multiclass_nms(
            boxes, scores, valid,
            score_thr=float(self.nms_cfg.SCORE_THR),
            iou_thr=float(self.nms_cfg.IOU_THR),
            rotated=self.with_yaw,
            per_cls_cap=self.nms_per_cls_cap,
            out_cap=self.max_rois)

    # ------------------------------------------------------------------
    # loss (cagroup_head.py:322-555)
    # ------------------------------------------------------------------
    def _vote_targets_scannet(self, voxel_points, voxel_valid, scene_points,
                              scene_valid, sem_mask, ins_mask, gt_boxes,
                              gt_valid, ins_cap: int):
        """Instance-center vote targets (cagroup_head.py:454-498): each
        stride-2 voxel votes for the GT center matched to the instance of
        its nearest raw scene point."""
        n_classes = self.n_classes
        ins = jnp.clip(ins_mask, 0, ins_cap - 1)
        ins_ok = scene_valid & (ins_mask < ins_cap) & (ins_mask >= 0)
        seg = jnp.where(ins_ok, ins, ins_cap)
        big = 1e9
        pmin = jnp.full((ins_cap + 1, 3), big).at[seg].min(
            jnp.where(ins_ok[:, None], scene_points, big))[:ins_cap]
        pmax = jnp.full((ins_cap + 1, 3), -big).at[seg].max(
            jnp.where(ins_ok[:, None], scene_points, -big))[:ins_cap]
        cnt = jnp.zeros((ins_cap + 1,), jnp.int32).at[seg].add(
            ins_ok.astype(jnp.int32))[:ins_cap]
        center = 0.5 * (pmin + pmax)
        # semantic of the instance: min semantic over its points (instances
        # are semantically uniform; reference reads the first point)
        isem = jnp.full((ins_cap + 1,), n_classes + 1, jnp.int32).at[seg].min(
            jnp.where(ins_ok, sem_mask, n_classes + 1))[:ins_cap]
        ins_valid = (cnt > 0) & (isem < n_classes) & jnp.any(gt_valid)
        # match instance center to nearest gt center
        d = jnp.sum((center[:, None, :] - gt_boxes[None, :, :3]) ** 2, -1)
        d = jnp.where(gt_valid[None, :], d, big)
        match = jnp.argmin(d, axis=1)
        ins_center = jnp.where(ins_valid[:, None], gt_boxes[match, :3],
                               -10000.0)

        nn_idx = nearest_point_index(voxel_points, voxel_valid, scene_points,
                                     scene_valid)
        vox_ins = jnp.clip(ins_mask[nn_idx], 0, ins_cap - 1)
        tgt_center = ins_center[vox_ins]
        offset_t = tgt_center - voxel_points
        offset_m = jnp.all(offset_t > -100.0, axis=-1) & voxel_valid
        offset_t = jnp.where(offset_t < -100.0, 0.0, offset_t)
        return offset_t, offset_m

    def _vote_targets_yaw(self, voxel_points, voxel_valid, gt_boxes,
                          gt_valid):
        """SUN RGB-D 3-vote targets (cagroup_head.py:418-452): first three
        containing GT boxes in index order; unfilled slots replicate the
        first."""
        inside = find_points_in_boxes(voxel_points, voxel_valid, gt_boxes,
                                      gt_valid)                  # [N, G]
        rank = jnp.cumsum(inside.astype(jnp.int32), axis=1)
        votes = []
        first_box = None
        for j in range(self.gt_per_seed):
            sel_j = inside & (rank == j + 1)
            has_j = jnp.any(sel_j, axis=1)
            box_j = jnp.argmax(sel_j, axis=1)
            vote_j = gt_boxes[box_j, :3] - voxel_points
            if j == 0:
                first_box = vote_j
                votes.append(jnp.where(has_j[:, None], vote_j, 0.0))
            else:
                votes.append(jnp.where(has_j[:, None], vote_j, first_box))
        mask = jnp.any(inside, axis=1) & voxel_valid
        vt = jnp.concatenate(votes, axis=-1)          # [N, 9]
        vt = jnp.where(mask[:, None], vt, 0.0)
        return vt, mask

    def loss(self, outs: Dict[str, jnp.ndarray], gt_boxes, gt_labels,
             gt_valid, scene_points, scene_valid, sem_mask=None,
             ins_mask=None, ins_cap: int = 128):
        """Batched loss; all inputs have a leading scene axis.

        outs: head forward outputs stacked over scenes (vmapped forward).
        gt_boxes [B, G, 7] (one-stage convention), gt_labels i32[B, G],
        gt_valid [B, G]; scene_points [B, P, 3] raw points (normalized
        frame), sem/ins masks i32[B, P] (ScanNet) or None (SUN RGB-D).
        Returns (loss, tb_dict).
        """
        c = self.loss_cfg
        off_cfg = c.get("LOSS_OFFSET", None)
        beta = float(off_cfg.BETA) if off_cfg else 0.04

        def _lw(key):
            sub = c.get(key, None)
            return float(sub.get("LOSS_WEIGHT", 1.0)) if sub else 1.0

        w_vote = _lw("LOSS_OFFSET")
        w_bbox = _lw("LOSS_BBOX")
        w_cls = _lw("LOSS_CLS")
        w_sem = _lw("LOSS_SEM")
        w_cen = _lw("LOSS_CENTERNESS")

        def targets_single(out, boxes, labels, bvalid, spts, svalid, sm, im):
            sem_labels, _ = self.assigner.assign_semantic(
                out["semantic_points"], out["semantic_valid"], boxes, labels,
                bvalid, self.n_classes)
            ct, bt, lab = self.assigner.assign(
                out["points"], out["points_valid"], boxes, labels, bvalid)
            if self.with_yaw:
                vt, vm = self._vote_targets_yaw(
                    out["semantic_points"], out["semantic_valid"], boxes,
                    bvalid)
            else:
                vt, vm = self._vote_targets_scannet(
                    out["semantic_points"], out["semantic_valid"], spts,
                    svalid, sm, im, boxes, bvalid, ins_cap)
            return sem_labels, ct, bt, lab, vt, vm

        if sem_mask is None:
            B, Pn = scene_points.shape[:2]
            sem_mask = jnp.zeros((B, Pn), jnp.int32)
            ins_mask = jnp.zeros((B, Pn), jnp.int32)
        sem_labels, ctgt, btgt, labels, vtgt, vmask = jax.vmap(
            targets_single)(outs, gt_boxes, gt_labels, gt_valid,
                            scene_points, scene_valid, sem_mask, ins_mask)
        sem_labels = jax.lax.stop_gradient(sem_labels)
        ctgt, btgt = map(jax.lax.stop_gradient, (ctgt, btgt))
        vtgt = jax.lax.stop_gradient(vtgt)

        from ...utils import loss_utils as L

        B = gt_boxes.shape[0]
        sem_valid = outs["semantic_valid"]                    # [B, N2]
        pts_valid = outs["points_valid"].reshape(B, -1)       # [B, M]
        labels_f = labels.reshape(B, -1)
        pos = (labels_f >= 0) & pts_valid

        # reduce_mean-style normalizers: mean of per-image counts
        sem_n_pos = jnp.maximum(
            jnp.mean(jnp.sum((sem_labels >= 0) & sem_valid, axis=1)
                     .astype(jnp.float32)), 1.0)
        n_pos = jnp.maximum(
            jnp.mean(jnp.sum(pos, axis=1).astype(jnp.float32)), 1.0)
        cdenorm = jnp.maximum(
            jnp.mean(jnp.sum(jnp.where(pos, ctgt.reshape(B, -1), 0.0),
                             axis=1)), 1e-6)

        def per_scene(out, semlab, ct, bt, lab, vt, vm):
            semv = out["semantic_valid"]
            pv = out["points_valid"].reshape(-1)
            labf = lab.reshape(-1)
            posm = (labf >= 0) & pv
            l_sem = L.focal_loss_with_labels(
                out["semantic_scores"], semlab,
                weight=semv.astype(jnp.float32), avg_factor=sem_n_pos)
            cls_flat = out["cls_scores"].reshape(-1, self.n_classes)
            l_cls = L.focal_loss_with_labels(
                cls_flat, labf, weight=pv.astype(jnp.float32),
                avg_factor=n_pos)
            cen_flat = out["centernesses"].reshape(-1)
            ctf = ct.reshape(-1)
            l_cen = L.binary_cross_entropy(
                cen_flat, ctf, weight=posm.astype(jnp.float32),
                avg_factor=n_pos)
            # centerness-weighted IoU bbox loss
            pts_flat = out["points"].reshape(-1, 3)
            bp_flat = out["bbox_preds"].reshape(-1, out["bbox_preds"].shape[-1])
            decoded = self.bbox_pred_to_bbox(pts_flat, bp_flat)
            btf = bt.reshape(-1, 7)
            w = jnp.where(posm, ctf, 0.0)
            # guard degenerate padded boxes for the IoU kernel
            safe_dec = jnp.where(posm[:, None], decoded,
                                 jnp.array([0, 0, 0, 1, 1, 1, 0.0])[
                                     :decoded.shape[-1]])
            safe_tgt = jnp.where(posm[:, None], btf,
                                 jnp.array([0, 0, 0, 1, 1, 1, 0.0]))
            l_bbox = L.iou3d_loss(safe_dec, safe_tgt, weight=w,
                                  avg_factor=cdenorm,
                                  with_yaw=self.with_yaw)
            # vote loss
            vo = out["voxel_offsets"]
            n_real = jnp.maximum(jnp.sum(semv.astype(jnp.float32)), 1.0)
            if self.with_yaw:
                wv = (vm.astype(jnp.float32) /
                      (jnp.sum(vm.astype(jnp.float32)) + 1e-6))[:, None]
                base = jnp.tile(out["semantic_points"], (1, self.gt_per_seed))
                l_vote = L.smooth_l1(base + vo, base + vt,
                                     weight=wv * semv[:, None], beta=beta,
                                     reduction="sum")
            else:
                wv = (vm.astype(jnp.float32) / n_real + 1e-6)[:, None]
                l_vote = L.smooth_l1(vo, vt, weight=wv * semv[:, None],
                                     beta=beta, reduction="sum")
            return (w_sem * l_sem, w_cls * l_cls, w_cen * l_cen,
                    w_bbox * l_bbox, w_vote * l_vote)

        losses = jax.vmap(per_scene)(outs, sem_labels, ctgt, btgt, labels,
                                     vtgt, vmask)
        l_sem, l_cls, l_cen, l_bbox, l_vote = [jnp.mean(x) for x in losses]
        total = l_sem + l_cls + l_cen + l_bbox + l_vote
        tb = dict(loss_sem=l_sem, loss_cls=l_cls, loss_centerness=l_cen,
                  loss_bbox=l_bbox, loss_vote=l_vote, one_stage_loss=total)
        return total, tb


def nearest_point_index(queries, qvalid, points, pvalid, chunk: int = 4096):
    """argmin_j ||q_i - p_j||^2 over valid points, chunked over j to bound
    memory (replaces the knn CUDA op, pcdet/ops/knn, used at
    cagroup_head.py:480 with k=1)."""
    Pn = points.shape[0]
    nchunk = -(-Pn // chunk)
    pad = nchunk * chunk - Pn
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pv = jnp.pad(pvalid, (0, pad))
    pts = pts.reshape(nchunk, chunk, 3)
    pv = pv.reshape(nchunk, chunk)
    base = (jnp.arange(nchunk) * chunk).astype(jnp.int32)

    def body(carry, xs):
        best_d, best_i = carry
        p, v, b = xs
        d = jnp.sum((queries[:, None, :] - p[None, :, :]) ** 2, axis=-1)
        d = jnp.where(v[None, :], d, jnp.inf)
        cd = jnp.min(d, axis=1)
        ci = jnp.argmin(d, axis=1).astype(jnp.int32) + b
        upd = cd < best_d
        return (jnp.where(upd, cd, best_d), jnp.where(upd, ci, best_i)), None

    init = (jnp.full((queries.shape[0],), jnp.inf),
            jnp.zeros((queries.shape[0],), jnp.int32))
    (bd, bi), _ = jax.lax.scan(body, init, (pts, pv, base))
    return bi
