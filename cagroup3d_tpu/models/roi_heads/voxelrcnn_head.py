"""VoxelRCNNHead: RoI-grid pooling directly from the 3D sparse-conv
feature volumes via voxel-hash neighbor queries (reference
pcdet/models/roi_heads/voxelrcnn_head.py:1-262 +
ops/pointnet2/pointnet2_stack/voxel_pool_modules.py
NeighborVoxelSAModuleMSG :8-130).

TPU-native design: per-scene static shapes.  A lattice offset addresses
at most one voxel, so the reference's voxel_query + 'first nsample
found' subsampling becomes a static gather over the ``nsample`` nearest
lattice offsets (core/pointnet2_stack.nearest_offsets) — same sample
budget, proximity-biased instead of scan-order-biased.  Each source's
pool is: mlp_in (1x1 + BN) on the voxel features, gather neighbors per
RoI grid point, positional mlp on relative centers, relu(add), masked
max-pool, mlp_out (1x1 + BN + relu); sources concatenate channel-wise
(voxel_pool_modules.py:90-130).  Shared FC / cls / reg trunk, proposal
layer, target assignment and losses are inherited from PVRCNNHead
(identical in the reference's roi_head_template).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...core.pointnet2_stack import nearest_offsets, voxel_query_offsets
from .pvrcnn_head import PVRCNNHead


class VoxelRCNNHead(PVRCNNHead):
    def __init__(self, model_cfg, num_class: int = 1, input_channels=None,
                 backbone_channels=None, voxel_size=None,
                 point_cloud_range=None, **kwargs):
        c = model_cfg
        gp = c.ROI_GRID_POOL
        self.sources = list(gp.FEATURES_SOURCE)
        self.voxel_size = [float(v) for v in (voxel_size or [0.05] * 3)]
        self.pc_range = [float(v) for v in
                         (point_cloud_range or [0, -40, -3, 70.4, 40, 1])]
        backbone_channels = backbone_channels or {}
        self.pools = []      # per source: list of (offsets, radius, mlp)
        c_out = 0
        for src in self.sources:
            lc = gp.POOL_LAYERS[src]
            groups = []
            for gi in range(len(lc.MLPS)):
                cin = int(backbone_channels.get(
                    src, lc.get("INPUT_CHANNELS", 16)))
                mlp = [cin] + [int(x) for x in lc.MLPS[gi]]
                offs = nearest_offsets(int(lc.QUERY_RANGES[gi][0]),
                                       int(lc.NSAMPLE[gi]))
                groups.append((offs, float(lc.POOL_RADIUS[gi]), mlp))
                c_out += mlp[-1]
            self.pools.append(groups)
        self.pool_out_channels = c_out

        # PVRCNNHead.__init__ builds the FC trunk/coder/target layer; we
        # only need its non-pool members, so replicate the relevant tail
        from ..dense_heads.anchor_head import ResidualCoder
        from .target_assigner.cagroup_proposal_target_layer import \
            ProposalTargetLayer
        self.cfg = c
        self.num_class = 1 if c.get("CLASS_AGNOSTIC", True) else num_class
        self.grid_size = int(gp.GRID_SIZE)
        self.shared_fc = [int(x) for x in c.SHARED_FC]
        self.cls_fc = [int(x) for x in c.CLS_FC]
        self.reg_fc = [int(x) for x in c.REG_FC]
        self.dp_ratio = float(c.get("DP_RATIO", 0.3))
        self.coder = ResidualCoder(7)
        tc = c.TARGET_CONFIG
        self.proposal_target_layer = ProposalTargetLayer(
            roi_per_image=int(tc.get("ROI_PER_IMAGE", 128)),
            fg_ratio=float(tc.get("FG_RATIO", 0.5)),
            reg_fg_thresh=float(tc.get("REG_FG_THRESH", 0.55)),
            cls_fg_thresh=float(tc.get("CLS_FG_THRESH", 0.75)),
            cls_bg_thresh=float(tc.get("CLS_BG_THRESH", 0.25)),
            cls_bg_thresh_l0=float(tc.get("CLS_BG_THRESH_LO", 0.1)),
            hard_bg_ratio=float(tc.get("HARD_BG_RATIO", 0.8)))
        lw = c.LOSS_CONFIG.LOSS_WEIGHTS
        self.w_cls = float(lw["rcnn_cls_weight"])
        self.w_reg = float(lw["rcnn_reg_weight"])
        self.w_corner = float(lw.get("rcnn_corner_weight", 1.0))
        self.code_weights = [float(x) for x in lw["code_weights"]]
        self.corner_loss = bool(
            c.LOSS_CONFIG.get("CORNER_LOSS_REGULARIZATION", True))
        self.nms_cfg = c.NMS_CONFIG

    # ------------------------------------------------------------------
    def init(self, rng, prefix: str = "roi_head") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        r = iter(jax.random.split(rng, 64))
        for k, groups in enumerate(self.pools):
            for gi, (_, _, mlp) in enumerate(groups):
                base = f"{prefix}.roi_grid_pool_layers.{k}"
                init_linear(P, next(r), f"{base}.mlps_in.{gi}",
                            mlp[0], mlp[1], bias=False, init="kaiming")
                init_bn(P, S, f"{base}.mlps_in.{gi}.bn", mlp[1])
                init_linear(P, next(r), f"{base}.mlps_pos.{gi}",
                            3, mlp[1], bias=False, init="kaiming")
                init_bn(P, S, f"{base}.mlps_pos.{gi}.bn", mlp[1])
                init_linear(P, next(r), f"{base}.mlps_out.{gi}",
                            mlp[1], mlp[2], bias=False, init="kaiming")
                init_bn(P, S, f"{base}.mlps_out.{gi}.bn", mlp[2])
        cin = self.grid_size ** 3 * self.pool_out_channels
        for i, cout in enumerate(self.shared_fc):
            init_linear(P, next(r), f"{prefix}.shared_fc_layer.{i}",
                        cin, cout, bias=False, init="kaiming")
            init_bn(P, S, f"{prefix}.shared_fc_layer.{i}.bn", cout)
            cin = cout
        for name, fcs, nout in (("cls", self.cls_fc, self.num_class),
                                ("reg", self.reg_fc,
                                 self.coder.code_size * self.num_class)):
            ci = self.shared_fc[-1]
            for i, cout in enumerate(fcs):
                init_linear(P, next(r), f"{prefix}.{name}_layers.{i}",
                            ci, cout, bias=False, init="kaiming")
                init_bn(P, S, f"{prefix}.{name}_layers.{i}.bn", cout)
                ci = cout
            init_linear(P, next(r), f"{prefix}.{name}_layers.out", ci,
                        nout, bias=True, init="normal")
        return P, S

    # ------------------------------------------------------------------
    def roi_grid_pool_voxel(self, P, S, ctx: Ctx, rois, roi_valid, multi,
                            prefix):
        """multi: {src: (SparseTensor, stride)}.  Returns
        [R, G^3 * pool_out_channels] (voxelrcnn_head.py roi_grid_pool
        :107-193)."""
        R = rois.shape[0]
        g3 = self.grid_size ** 3
        grid = self.get_global_grid_points(rois).reshape(R * g3, 3)
        gvalid = jnp.repeat(roi_valid, g3)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        lo = jnp.asarray(self.pc_range[:3], jnp.float32)
        outs = []
        for k, src in enumerate(self.sources):
            st, stride = multi[src]
            lvs = vs * stride                 # this level's voxel size
            centers = lo + (st.coords.astype(jnp.float32) + 0.5) * lvs
            lat = jnp.floor((grid - lo) / lvs).astype(jnp.int32)
            base = f"{prefix}.roi_grid_pool_layers.{k}"
            for gi, (offs, radius, mlp) in enumerate(self.pools[k]):
                fin = st.masked_feats() @ P[f"{base}.mlps_in.{gi}.weight"]
                fin = apply_bn(P, S, ctx, f"{base}.mlps_in.{gi}.bn",
                               fin, st.valid)
                rows = voxel_query_offsets(st.coords, st.valid, lat,
                                           gvalid, offs)   # [M, K]
                nb_xyz = jnp.take(centers, jnp.maximum(rows, 0), axis=0)
                rel = nb_xyz - grid[:, None, :]
                ok = (rows >= 0) & \
                    (jnp.sum(rel ** 2, -1) < radius * radius)
                pos = rel.reshape(-1, 3) @ P[f"{base}.mlps_pos.{gi}.weight"]
                pos = apply_bn(P, S, ctx, f"{base}.mlps_pos.{gi}.bn",
                               pos, ok.reshape(-1))
                g = jnp.take(fin, jnp.maximum(rows, 0).reshape(-1),
                             axis=0)
                h = jnp.maximum(g + pos, 0.0)               # relu(add)
                h = jnp.where(ok.reshape(-1)[:, None], h, -1e9)
                h = jnp.max(h.reshape(R * g3, offs.shape[0], -1), axis=1)
                any_ok = jnp.any(ok, axis=1)
                h = jnp.where(any_ok[:, None], jnp.maximum(h, -1e8), 0.0)
                o = h @ P[f"{base}.mlps_out.{gi}.weight"]
                o = apply_bn(P, S, ctx, f"{base}.mlps_out.{gi}.bn", o,
                             gvalid)
                outs.append(jnp.where(gvalid[:, None],
                                      jnp.maximum(o, 0.0), 0.0))
        pooled = jnp.concatenate(outs, axis=-1)
        return pooled.reshape(R, g3 * self.pool_out_channels)

    # ------------------------------------------------------------------
    def forward_train(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                      roi_valid, gt_boxes, gt_labels, gt_valid, multi,
                      prefix: str = "roi_head"):
        from ...core.geometry import rotate_points_along_z
        tgt = self.proposal_target_layer(
            ctx.next_rng(), rois, roi_scores,
            roi_labels.astype(jnp.int32), roi_valid, gt_boxes,
            gt_labels, gt_valid, flip_gt_heading=False)
        s_rois = tgt["rois"]
        s_valid = jnp.ones(s_rois.shape[0], bool)
        gt_ct = tgt["gt_of_rois"]
        roi_ry = s_rois[:, 6] % (2 * jnp.pi)
        gt_ct = gt_ct.at[:, 0:3].add(-s_rois[:, 0:3])
        gt_ct = gt_ct.at[:, 6].add(-roi_ry)
        gt_ct = rotate_points_along_z(gt_ct[:, None, :], -roi_ry)[:, 0, :]
        heading = gt_ct[:, 6] % (2 * jnp.pi)
        opposite = (heading > jnp.pi * 0.5) & (heading < jnp.pi * 1.5)
        heading = jnp.where(opposite, (heading + jnp.pi) % (2 * jnp.pi),
                            heading)
        heading = jnp.where(heading > jnp.pi, heading - 2 * jnp.pi,
                            heading)
        gt_ct = gt_ct.at[:, 6].set(
            jnp.clip(heading, -jnp.pi / 2, jnp.pi / 2))

        pooled = self.roi_grid_pool_voxel(P, S, ctx, s_rois, s_valid,
                                          multi, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, pooled, s_valid,
                                         prefix)
        return dict(rcnn_cls=rcnn_cls, rcnn_reg=rcnn_reg, rois=s_rois,
                    gt_of_rois=gt_ct, gt_of_rois_src=tgt["gt_of_rois"],
                    reg_valid_mask=tgt["reg_valid_mask"],
                    rcnn_cls_labels=tgt["rcnn_cls_labels"],
                    roi_labels=tgt["roi_labels"])

    def forward_test(self, P, S, ctx: Ctx, rois, roi_scores, roi_labels,
                     roi_valid, multi, score_thresh=0.1, nms_thresh=0.1,
                     max_out=128, prefix: str = "roi_head"):
        from ...core import nms as nms_mod
        pooled = self.roi_grid_pool_voxel(P, S, ctx, rois, roi_valid,
                                          multi, prefix)
        rcnn_cls, rcnn_reg = self._heads(P, S, ctx, pooled, roi_valid,
                                         prefix)
        boxes = self.decode_boxes(rois, rcnn_reg)
        scores = jax.nn.sigmoid(rcnn_cls[:, 0])
        v = roi_valid & (scores > score_thresh)
        keep = nms_mod.greedy_nms(boxes, jnp.where(v, scores, -1.0), v,
                                  nms_thresh, rotated=True)
        v = v & keep
        m = min(max_out, boxes.shape[0])
        so, oid = jax.lax.top_k(jnp.where(v, scores, -1.0), m)
        return dict(pred_boxes=boxes[oid], pred_scores=so,
                    pred_labels=roi_labels[oid].astype(jnp.int32),
                    pred_valid=jnp.take(v, oid))
