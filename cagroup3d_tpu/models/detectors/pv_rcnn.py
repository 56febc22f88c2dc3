"""PV-RCNN detector (reference pcdet/models/detectors/pv_rcnn.py:1-31):
SECOND's one-stage pipeline + VoxelSetAbstraction keypoints +
PointHeadSimple foreground scores + PVRCNNHead refinement.

Per-scene forward vmapped over the batch; loss = rpn + point + rcnn
(pv_rcnn.py:24-31).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .second_net import SECONDNet


class PVRCNN(SECONDNet):
    def init(self, rng) -> Tuple[Params, Params]:
        P, S = super().init(rng)
        rngs = jax.random.split(jax.random.fold_in(rng, 1), 3)
        for m, pre, r in ((self.pfe, "pfe", rngs[0]),
                          (self.point_head, "point_head", rngs[1]),
                          (self.roi_head, "roi_head", rngs[2])):
            p, s = m.init(r, pre)
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _scene_full(self, P, S, train, points, pvalid, rng,
                    axis_name="scene"):
        """Backbone + anchor head + VSA keypoints + point head;
        returns everything the two-stage needs."""
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        st = self.vfe(P, S, ctx, points, pvalid, self.voxel_size,
                      self.point_cloud_range, self.input_cap)
        bb = self.backbone_3d(P, S, ctx, st)
        final = bb["encoded_spconv_tensor"]
        bev = self.map_to_bev_module(P, S, ctx, final, self._final_grid())
        bev2d = self.backbone_2d(P, S, ctx, bev)
        head_out = self.dense_head.forward(P, S, ctx, bev2d)

        multi = {name: (t, bb["multi_scale_3d_strides"][name])
                 for name, t in bb["multi_scale_3d_features"].items()}
        kp, kp_valid, kp_feats, kp_before = self.pfe(
            P, S, ctx, points, pvalid, bev, multi,
            bev_stride=bb["encoded_spconv_tensor_stride"])
        ph_in = kp_before if self.point_head.use_before_fusion \
            else kp_feats
        point_preds, point_scores = self.point_head.forward(
            P, S, ctx, ph_in, kp_valid)

        boxes, cls_scores = self.dense_head.decoded_boxes(head_out)
        best = jnp.max(cls_scores, axis=-1)
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
        rois, roi_scores, roi_labels, roi_valid = \
            self.roi_head.proposal_layer(
                boxes, best, labels, jnp.ones(best.shape[0], bool),
                train=train)
        return (ctx, head_out, kp, kp_valid, kp_feats, point_preds,
                point_scores, (rois, roi_scores, roi_labels, roi_valid))

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            (ctx, head_out, kp, kp_valid, kp_feats, point_preds,
             point_scores, props) = self._scene_full(
                P, S, True, points, pvalid, r)
            rois, roi_scores, roi_labels, roi_valid = props
            point_labels = self.point_head.assign_targets(
                kp, kp_valid, boxes, labels, bvalid)
            roi_out = self.roi_head.forward_train(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                boxes, labels, bvalid, kp, kp_valid, kp_feats,
                point_scores)
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
            (ctx, head_out, kp, kp_valid, kp_feats, point_preds,
             point_scores, props) = self._scene_full(
                P, S, False, points, pvalid, r, axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
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
