"""Anchor-free Part-A2 ("PartA2_free", reference tools/cfgs/kitti_models/
PartA2_free.yaml built through detector NAME PointRCNN,
pcdet/models/detectors/point_rcnn.py): MeanVFE -> UNetV2 point-wise
features -> PointIntraPartOffsetHead predicting per-point class / intra-
part offsets / boxes (PointResidualCoder) at the stride-1 voxel
centroids -> PartA2FCHead RoI-aware refinement.

Loss = point + rcnn (no anchor RPN; the reference template simply skips
the absent MAP_TO_BEV/BACKBONE_2D/DENSE_HEAD slots)."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .parta2_net import PartA2Net


class PartA2FreeNet(PartA2Net):
    def init(self, rng) -> Tuple[Params, Params]:
        P, S = {}, {}
        rngs = jax.random.split(rng, 4)
        for m, pre, r in ((self.vfe, "vfe", rngs[0]),
                          (self.backbone_3d, "backbone_3d", rngs[1]),
                          (self.point_head, "point_head", rngs[2]),
                          (self.roi_head, "roi_head", rngs[3])):
            p, s = m.init(r, pre)
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _scene_full(self, P, S, train, points, pvalid, rng,
                    axis_name="scene"):
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        st = self.vfe(P, S, ctx, points, pvalid, self.voxel_size,
                      self.point_cloud_range, self.input_cap)
        bb = self.backbone_3d(P, S, ctx, st)

        # stride-1 voxel centers in metric frame (spconv_unet.py:207-211)
        lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        pc = lo + (bb["point_coords"].astype(jnp.float32) + 0.5) * vs
        pv = bb["point_valid"]
        pf = bb["point_features"]
        cls_preds, part_preds, box_preds, scores = \
            self.point_head.forward(P, S, ctx, pf, pv)
        part = jax.nn.sigmoid(part_preds)

        # proposals decoded from the point head itself (point_rcnn.py
        # forward -> point_head generate_predicted_boxes -> roi proposal
        # layer), replacing PartA2's anchor RPN
        # detach: the reference proposal layer runs under torch.no_grad
        # (roi_head_template.py); also blocks arctan2(0, 0) NaN cotangents
        # from the decode flowing into masked-out box predictions
        boxes, cls_sig, cls_ids = self.point_head.predicted_boxes(
            pc, jax.lax.stop_gradient(cls_preds),
            jax.lax.stop_gradient(box_preds))
        best = jnp.where(pv, jnp.max(cls_sig, axis=-1), 0.0)
        props = self.roi_head.proposal_layer(boxes, best, cls_ids, pv,
                                             train=train)
        return (ctx, None, pc, pv, pf, part, scores,
                (cls_preds, part_preds, box_preds), props)

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            (ctx, _, pc, pv, pf, part, scores, point_preds, props) = \
                self._scene_full(P, S, True, points, pvalid, r)
            rois, roi_scores, roi_labels, roi_valid = props
            tgts = self.point_head.assign_targets(pc, pv, boxes, labels,
                                                  bvalid)
            roi_out = self.roi_head.forward_train(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                boxes, labels, bvalid, pc, pf, part, scores)
            return point_preds, tgts, roi_out, ctx.updates, ctx.stats

        (point_preds, tgts, roi_outs, updates, stats) = \
            jax.vmap(scene, axis_name="scene")(
                batch["points"], batch["points_valid"], gt_boxes,
                gt_labels, gt_valid, rngs)

        cls_p, part_p, box_p = point_preds
        labels_t, part_t, part_valid, box_t = tgts
        loss_point, tb = self.point_head.loss(
            cls_p, part_p, box_p, labels_t, part_t, part_valid, box_t)
        loss_rcnn, tb_r = self.roi_head.loss(roi_outs)
        tb.update(tb_r)
        loss = loss_point + loss_rcnn
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
            (ctx, _, pc, pv, pf, part, scores, point_preds, props) = \
                self._scene_full(P, S, False, points, pvalid, r,
                                 axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
            return self.roi_head.forward_test(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                pc, pf, part, scores, score_thresh=score_thr,
                nms_thresh=nms_thr, max_out=max_out)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
