"""CAGroup3D two-stage RoI head: fully sparse RoI grid pooling + MLP
refinement.

TPU-native rebuild of pcdet/models/roi_heads/cagroup_roi_head.py.  Per
roi, a 7^3 grid of points is generated, deduplicated on the backbone's
stride-2 lattice, convolved at those query coordinates (k=5 conv-at-coords
on backbone voxels, SimplePoolingLayer cagroup_roi_head.py:69), scattered
back per-roi and center-pooled with one dense [343*C -> C] matmul (the
"fake grid" k=7 conv evaluated at the grid center, :74-91), then refined
by a Linear+BN+ReLU MLP.  Everything static-shape, per scene (vmapped by
the detector).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.geometry import rotate_points_along_z
from ...core.module import (Ctx, Params, apply_bn, apply_linear, dropout,
                            init_bn, init_conv, init_linear)
from ...core.norm import elu, relu
from ...core.sparse import SparseTensor
from ...core.sparse_conv import scan_conv_grouped
from ...core.voxelize import unique_voxels
from ...core import nms as nms_mod
from ..model_utils.cagroup_utils import CAGroupResidualCoder
from ...utils import loss_utils as L
from .target_assigner.cagroup_proposal_target_layer import ProposalTargetLayer


class CAGroup3DRoIHead:
    def __init__(self, model_cfg, **kwargs):
        c = model_cfg
        self.num_class = c.NUM_CLASSES
        self.code_size = c.CODE_SIZE
        self.grid_size = c.GRID_SIZE
        self.voxel_size = c.VOXEL_SIZE
        self.coord_key = c.COORD_KEY
        self.mlps = c.MLPS
        self.enlarge_ratio = c.get("ENLARGE_RATIO", False)
        self.reg_fc = c.get("REG_FC", [256, 256])
        self.dp_ratio = c.get("DP_RATIO", 0.3)
        self.test_score_thr = c.get("TEST_SCORE_THR", 0.01)
        self.test_iou_thr = c.get("TEST_IOU_THR", 0.5)
        self.roi_per_image = c.get("ROI_PER_IMAGE", 128)
        self.roi_conv_kernel = c.get("ROI_CONV_KERNEL", 5)
        self.encode_angle_by_sincos = c.get("ENCODE_SINCOS", False)
        self.use_iou_loss = c.get("USE_IOU_LOSS", False)
        self.loss_weight = c.LOSS_WEIGHTS
        self.grid_cap = int(c.get("GRID_CAP", 16384))
        self.nms_per_cls_cap = int(c.get("NMS_PER_CLS_CAP", 128))
        self.max_out = int(c.get("MAX_OUT", 128))
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=self.roi_per_image,
            fg_ratio=c.get("ROI_FG_RATIO", 0.9),
            reg_fg_thresh=c.get("REG_FG_THRESH", 0.3))
        self.box_coder = CAGroupResidualCoder(
            code_size=self.code_size,
            encode_angle_by_sincos=self.encode_angle_by_sincos)
        self.code_weights = c.LOSS_WEIGHTS.CODE_WEIGHT

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "roi_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = list(jax.random.split(rng, 8))
        pre = prefix
        mlp = self.mlps[0]  # [in, mid, out], default [64, 128, 128]
        k3 = self.roi_conv_kernel ** 3
        g3 = self.grid_size ** 3
        pl = pre + ".roi_grid_pool_layers.0"
        init_conv(P, r[0], pl + ".grid_conv", self.roi_conv_kernel, mlp[0],
                  mlp[1], init="normal")
        init_bn(P, S, pl + ".grid_bn", mlp[1])
        init_conv(P, r[1], pl + ".pooling_conv", self.grid_size, mlp[1],
                  mlp[2], init="normal")
        init_bn(P, S, pl + ".pooling_bn", mlp[2])
        cin = sum(m[-1] for m in self.mlps)
        idx = 0
        for k, cout in enumerate(self.reg_fc):
            init_linear(P, r[2 + k], f"{pre}.reg_fc_layers.{idx}", cin, cout,
                        bias=False, init="xavier")
            init_bn(P, S, f"{pre}.reg_fc_layers.{idx + 1}", cout)
            idx += 4 if k != len(self.reg_fc) - 1 else 3
            cin = cout
        ncode = self.code_size + (1 if self.encode_angle_by_sincos else 0)
        init_linear(P, r[6], pre + ".reg_pred_layer", cin, ncode, bias=True,
                    init="normal")
        return P, S

    # ------------------------------------------------------------------
    def get_dense_grid_points(self, rois):
        """[R, 7] -> local grid points [R, G^3, 3]
        (cagroup_roi_head.py:214-224)."""
        g = self.grid_size
        idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                                   indexing="ij"), -1).reshape(-1, 3)
        idx = jnp.asarray(idx, jnp.float32)
        size = rois[:, None, 3:6]
        return (idx[None] + 0.5) / g * size - size / 2

    def roi_grid_pool(self, P, S, ctx: Ctx, st: SparseTensor, rois,
                      roi_valid, prefix):
        """rois [R, 7] (pcdet heading) -> pooled [R, C_out]."""
        pl = prefix + ".roi_grid_pool_layers.0"
        R = rois.shape[0]
        g3 = self.grid_size ** 3
        local = self.get_dense_grid_points(rois)              # [R, G3, 3]
        if self.code_size > 6:
            local = rotate_points_along_z(local, rois[:, 6])
        pts = (local + rois[:, None, :3]).reshape(R * g3, 3)
        pvalid = jnp.repeat(roi_valid, g3)

        cell = self.voxel_size * self.coord_key
        lat = jnp.floor(pts / cell).astype(jnp.int32)
        ded, inv = unique_voxels(lat, jnp.zeros((R * g3, 1)), pvalid,
                                 self.grid_cap, mode="first",
                                 stats=ctx.stats, stat_name="roi_grid")
        qcoords = ded.coords * self.coord_key       # raw units on st lattice
        w = P[pl + ".grid_conv.kernel"]
        use_mxu = (jax.default_backend() == "tpu" and
                   self.coord_key == st.stride and
                   ded.cap % 128 == 0 and st.cap % 128 == 0 and
                   (not ctx.train or getattr(ctx, "mxu_train", False)))
        if use_mxu:
            # conv-at-coords on the MXU kernel: queries are the deduped
            # grid lattice (key-sorted by construction), source is the
            # (key-sorted) backbone table
            from ...ops.pallas_conv import conv_at_coords_mxu
            f = conv_at_coords_mxu(st.coords, st.valid, st.masked_feats(),
                                   st.stride, ded.coords, ded.valid,
                                   self.roi_conv_kernel, w,
                                   train=ctx.train)
        else:
            from ...core.sparse_conv import scan_conv_grouped_t
            f = scan_conv_grouped_t(st.coords, st.valid, st.feats,
                                    st.stride, qcoords, ded.valid,
                                    self.roi_conv_kernel, w)
        f = apply_bn(P, S, ctx, pl + ".grid_bn", f, ded.valid)
        f = jnp.where(ded.valid[:, None], elu(f), 0.0)

        # scatter back to per-roi grids; dropped grid points (cap overflow
        # or invalid rois) get zero features
        per_pt = jnp.where((inv >= 0)[:, None],
                           jnp.take(f, jnp.maximum(inv, 0), axis=0), 0.0)
        grid_feats = per_pt.reshape(R, g3, -1)

        # center pooling: k=G conv on the dense fake grid at its center ==
        # one [G3*C -> C] contraction per roi
        w = P[pl + ".pooling_conv.kernel"]                    # [G3, C, C2]
        pooled = jnp.einsum("rgc,gcd->rd", grid_feats, w)
        pooled = apply_bn(P, S, ctx, pl + ".pooling_bn", pooled, roi_valid)
        return jnp.where(roi_valid[:, None], pooled, 0.0)

    def reg_branch(self, P, S, ctx: Ctx, feats, valid, prefix):
        x = feats
        idx = 0
        for k in range(len(self.reg_fc)):
            x = apply_linear(P, f"{prefix}.reg_fc_layers.{idx}", x)
            x = apply_bn(P, S, ctx, f"{prefix}.reg_fc_layers.{idx + 1}", x,
                         valid)
            x = jnp.where(valid[:, None], relu(x), 0.0)
            if k != len(self.reg_fc) - 1:
                if self.dp_ratio > 0:
                    x = dropout(ctx, x, self.dp_ratio)
                idx += 4
            else:
                idx += 3
        return apply_linear(P, prefix + ".reg_pred_layer", x)

    # ------------------------------------------------------------------
    def forward_train(self, P, S, ctx: Ctx, st: SparseTensor, rois,
                      roi_scores, roi_labels, roi_valid, gt_boxes, gt_labels,
                      gt_valid, prefix: str = "roi_head"):
        """Per scene, training: sample targets then pool+regress.  rois come
        from one-stage NMS in mmdet3d heading; flipped here
        (reoder_rois_for_refining, cagroup_roi_head.py:358)."""
        rois_pc = rois.at[:, 6].multiply(-1.0)
        if self.enlarge_ratio:
            rois_pc = rois_pc.at[:, 3:6].multiply(self.enlarge_ratio)
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois_pc, roi_scores, roi_labels, roi_valid,
            gt_boxes, gt_labels, gt_valid)
        s_rois = tgt["rois"]
        s_valid = jnp.ones(s_rois.shape[0], bool)

        # canonical transform of gt into roi frame (assign_targets, :291-326)
        gt_ct = tgt["gt_of_rois"]
        roi_ry = s_rois[:, 6] % (2 * jnp.pi)
        gt_yaw = gt_ct[:, 6] % (2 * jnp.pi)
        gt_ct = gt_ct.at[:, 0:3].add(-s_rois[:, 0:3])
        gt_ct = gt_ct.at[:, 6].set(gt_yaw - roi_ry)
        if self.code_size > 6:
            gt_ct = rotate_points_along_z(gt_ct[:, None, :],
                                          -roi_ry)[:, 0, :]
            heading = gt_ct[:, 6] % (2 * jnp.pi)
            opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
            heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi),
                                heading)
            heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi,
                                heading)
            heading = jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2)
            gt_ct = gt_ct.at[:, 6].set(heading)

        pooled = self.roi_grid_pool(P, S, ctx, st, s_rois, s_valid, prefix)
        rcnn_reg = self.reg_branch(P, S, ctx, pooled, s_valid, prefix)
        return dict(rcnn_reg=rcnn_reg, rois=s_rois,
                    gt_of_rois=gt_ct, gt_of_rois_src=tgt["gt_of_rois"],
                    reg_valid_mask=tgt["reg_valid_mask"],
                    roi_labels=tgt["roi_labels"],
                    roi_scores=tgt["roi_scores"])

    def forward_test(self, P, S, ctx: Ctx, st: SparseTensor, rois,
                     roi_scores, roi_labels, roi_valid,
                     prefix: str = "roi_head"):
        """Per scene, eval: pool+regress all rois, decode, per-class NMS."""
        rois_pc = rois.at[:, 6].multiply(-1.0)
        if self.enlarge_ratio:
            rois_pc = rois_pc.at[:, 3:6].multiply(self.enlarge_ratio)
        pooled = self.roi_grid_pool(P, S, ctx, st, rois_pc, roi_valid, prefix)
        rcnn_reg = self.reg_branch(P, S, ctx, pooled, roi_valid, prefix)
        boxes = self.decode_boxes(rois_pc, rcnn_reg)
        # per-class NMS with roi scores/labels (_nms, :433-475)
        onehot = jax.nn.one_hot(roi_labels, self.num_class)
        scores = roi_scores[:, None] * onehot  # restrict to own class
        b, s, l, v = nms_mod.multiclass_nms(
            boxes, scores, roi_valid & (jnp.abs(rois_pc).sum(-1) > 0),
            score_thr=self.test_score_thr, iou_thr=self.test_iou_thr,
            rotated=self.code_size > 6, per_cls_cap=self.nms_per_cls_cap,
            out_cap=self.max_out, flip_heading_for_iou=False)
        if self.code_size > 6:
            b = b.at[:, 6].multiply(-1.0)  # back to mmdet3d heading
        else:
            b = b.at[:, 6].set(0.0)
        return dict(batch_box_preds=b, batch_score_preds=s,
                    batch_cls_preds=l, batch_pred_valid=v,
                    rcnn_reg=rcnn_reg)

    def decode_boxes(self, rois_pc, rcnn_reg):
        """generate_predicted_boxes (cagroup_roi_head.py:477-510)."""
        code = self.code_size
        local = rois_pc[:, :code].at[:, 0:3].set(0.0)
        dec = self.box_coder.decode(rcnn_reg, local)
        if code > 6:
            dec = rotate_points_along_z(dec[:, None, :],
                                        rois_pc[:, 6])[:, 0, :]
        dec = dec.at[:, 0:3].add(rois_pc[:, 0:3])
        if code == 6:
            dec = jnp.concatenate([dec, jnp.zeros_like(dec[:, :1])], axis=-1)
        return dec

    # ------------------------------------------------------------------
    def loss(self, fwd: Dict[str, jnp.ndarray]):
        """Batched (leading scene axis) second-stage loss
        (get_box_reg_layer_loss, cagroup_roi_head.py:551-615)."""
        code = self.code_size
        B = fwd["rois"].shape[0]
        rois = fwd["rois"].reshape(-1, fwd["rois"].shape[-1])
        gt_ct = fwd["gt_of_rois"].reshape(-1, fwd["gt_of_rois"].shape[-1])
        reg = fwd["rcnn_reg"].reshape(-1, fwd["rcnn_reg"].shape[-1])
        fg = fwd["reg_valid_mask"].reshape(-1) > 0

        anchors = rois[:, :code].at[:, 0:3].set(0.0)
        if code > 6:
            anchors = anchors.at[:, 6].set(0.0)
        targets = self.box_coder.encode(gt_ct[:, :code], anchors)
        elt = L.weighted_smooth_l1(reg, targets,
                                   code_weights=self.code_weights)
        fg_sum = jnp.maximum(jnp.sum(fg.astype(jnp.float32)), 1.0)
        loss_reg = jnp.sum(elt * fg[:, None]) / fg_sum
        loss_reg = loss_reg * self.loss_weight.RCNN_REG_WEIGHT
        tb = dict(rcnn_loss_reg=loss_reg)
        total = loss_reg if self.loss_weight.RCNN_REG_WEIGHT > 0 else 0.0
        if self.use_iou_loss:
            dec = self.decode_boxes(rois, reg)
            gt_src = fwd["gt_of_rois_src"].reshape(-1, 7)
            safe = jnp.array([0, 0, 0, 1, 1, 1, 0.0])
            decs = jnp.where(fg[:, None], dec, safe)
            gts = jnp.where(fg[:, None], gt_src[:, :7], safe)
            liou = L.iou3d_loss(decs, gts, weight=fg.astype(jnp.float32),
                                avg_factor=fg_sum,
                                with_yaw=self.code_size > 6)
            liou = liou * self.loss_weight.RCNN_IOU_WEIGHT
            tb["rcnn_loss_iou"] = liou
            total = (loss_reg if self.loss_weight.RCNN_REG_WEIGHT > 0
                     else 0.0) + liou
        tb["loss_two_stage"] = total
        return total, tb
