"""PV-RCNN++ detector (reference pcdet/models/detectors/
pv_rcnn_plusplus.py:1-58): proposals are generated and (in training)
target-sampled BEFORE the keypoint PFE, so VoxelSetAbstraction can run
sectorized-proposal-centric (SPC) sampling and ROI-filtered neighbor
aggregation with VectorPool modules; the RoI head pools keypoints with
VectorPoolAggregationModuleMSG.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .pv_rcnn import PVRCNN


class PVRCNNPlusPlus(PVRCNN):
    def _scene_props(self, P, S, train, points, pvalid, rng,
                     axis_name="scene"):
        """Backbone + anchor head + proposal layer (pre-PFE,
        pv_rcnn_plusplus.py:10-18)."""
        from ...core.module import Ctx
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        st = self.vfe(P, S, ctx, points, pvalid, self.voxel_size,
                      self.point_cloud_range, self.input_cap)
        bb = self.backbone_3d(P, S, ctx, st)
        final = bb["encoded_spconv_tensor"]
        bev = self.map_to_bev_module(P, S, ctx, final, self._final_grid())
        bev2d = self.backbone_2d(P, S, ctx, bev)
        head_out = self.dense_head.forward(P, S, ctx, bev2d)
        boxes, cls_scores = self.dense_head.decoded_boxes(head_out)
        best = jnp.max(cls_scores, axis=-1)
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
        props = self.roi_head.proposal_layer(
            boxes, best, labels, jnp.ones(best.shape[0], bool),
            train=train)
        return ctx, bb, bev, head_out, props

    def _pfe_point_head(self, P, S, ctx, points, pvalid, bev, bb, rois,
                        roi_valid):
        multi = {name: (t, bb["multi_scale_3d_strides"][name])
                 for name, t in bb["multi_scale_3d_features"].items()}
        kp, kp_valid, kp_feats, kp_before = self.pfe(
            P, S, ctx, points, pvalid, bev, multi,
            bev_stride=bb["encoded_spconv_tensor_stride"],
            rois=rois, roi_valid=roi_valid)
        ph_in = kp_before if self.point_head.use_before_fusion \
            else kp_feats
        point_preds, point_scores = self.point_head.forward(
            P, S, ctx, ph_in, kp_valid)
        return kp, kp_valid, kp_feats, point_preds, point_scores

    # ------------------------------------------------------------------
    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            ctx, bb, bev, head_out, props = self._scene_props(
                P, S, True, points, pvalid, r)
            rois, roi_scores, roi_labels, roi_valid = props
            # sample roi targets BEFORE the pfe (pv_rcnn_plusplus.py:20-26)
            tgt = self.roi_head.sample_targets(
                ctx, rois, roi_scores, roi_labels, roi_valid, boxes,
                labels, bvalid)
            s_rois = tgt["rois"]
            s_valid = jnp.ones(s_rois.shape[0], bool)
            kp, kp_valid, kp_feats, point_preds, point_scores = \
                self._pfe_point_head(P, S, ctx, points, pvalid, bev, bb,
                                     s_rois, s_valid)
            point_labels = self.point_head.assign_targets(
                kp, kp_valid, boxes, labels, bvalid)
            roi_out = self.roi_head.forward_train_sampled(
                P, S, ctx, tgt, kp, kp_valid, kp_feats, point_scores)
            return (head_out, point_preds, point_labels, roi_out,
                    ctx.updates, ctx.stats)

        (head_outs, point_preds, point_labels, roi_outs, updates,
         stats) = jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], gt_boxes, gt_labels,
            gt_valid, rngs)

        loss_rpn, tb = self.dense_head.loss(head_outs, gt_boxes,
                                            gt_labels, gt_valid)
        loss_point, tb_p = self.point_head.loss(point_preds, point_labels)
        loss_rcnn, tb_r = self.roi_head.loss(roi_outs)
        tb.update(tb_p)
        tb.update(tb_r)
        loss = loss_rpn + loss_point + loss_rcnn
        for k, v in stats.items():
            tb[k] = jnp.sum(v).astype(jnp.float32)
        tb["loss_all"] = loss
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def forward_eval(self, P, S, batch: Dict, cur_epoch=None) -> Dict:
        B = batch["points"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)
        pp = self.model_cfg.get("POST_PROCESSING", {})
        score_thr = float(pp.get("SCORE_THRESH", 0.1))
        nms_cfg = pp.get("NMS_CONFIG", {})
        nms_thr = float(nms_cfg.get("NMS_THRESH", 0.1))
        max_out = int(nms_cfg.get("NMS_POST_MAXSIZE", 128))

        def scene(points, pvalid, r, axis_name="scene"):
            ctx, bb, bev, head_out, props = self._scene_props(
                P, S, False, points, pvalid, r, axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
            kp, kp_valid, kp_feats, point_preds, point_scores = \
                self._pfe_point_head(P, S, ctx, points, pvalid, bev, bb,
                                     rois, roi_valid)
            return self.roi_head.forward_test(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid, kp,
                kp_valid, kp_feats, point_scores,
                score_thresh=score_thr, nms_thresh=nms_thr,
                max_out=max_out)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
