"""PointRCNN detector (reference pcdet/models/detectors/point_rcnn.py:
1-32): PointNet2MSG backbone -> PointHeadBox per-point proposals ->
PointRCNNHead canonical refinement.  Loss = point + rcnn."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .detector3d_template import Detector3DTemplate


class PointRCNN(Detector3DTemplate):
    def __init__(self, model_cfg, num_class: int, dataset=None):
        super().__init__(model_cfg=model_cfg, num_class=num_class,
                         dataset=dataset)
        pcr = model_cfg.get("POINT_CLOUD_RANGE", None)
        if pcr is None and dataset is not None:
            pcr = list(dataset.point_cloud_range)
        self.point_cloud_range = [float(x) for x in pcr] if pcr else None
        self.module_list = self.build_networks()
        if self.class_names is None:
            self.class_names = list(model_cfg.get("CLASS_NAMES", []))

    def build_backbone_3d(self):
        cfg = self._cfg("BACKBONE_3D")
        if cfg is None:
            return None
        from ..backbones_3d.pointnet2_backbone import PointNet2MSG
        return PointNet2MSG(cfg)

    def build_point_head(self):
        cfg = self._cfg("POINT_HEAD")
        if cfg is None:
            return None
        from ..dense_heads.point_head_box import PointHeadBox
        return PointHeadBox(
            cfg, num_class=self.num_class,
            input_channels=self.backbone_3d.num_point_features)

    def build_roi_head(self):
        cfg = self._cfg("ROI_HEAD")
        if cfg is None:
            return None
        from ..roi_heads.pointrcnn_head import PointRCNNHead
        return PointRCNNHead(
            cfg, num_class=self.num_class,
            input_channels=self.backbone_3d.num_point_features)

    def init(self, rng) -> Tuple[Params, Params]:
        P, S = {}, {}
        rngs = jax.random.split(rng, 3)
        for m, pre, r in ((self.backbone_3d, "backbone_3d", rngs[0]),
                          (self.point_head, "point_head", rngs[1]),
                          (self.roi_head, "roi_head", rngs[2])):
            p, s = m.init(r, pre)
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _scene(self, P, S, train, points, pvalid, rng, axis_name="scene"):
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        feats = self.backbone_3d(P, S, ctx, points, pvalid)
        cls_preds, box_preds, scores = self.point_head.forward(
            P, S, ctx, feats, pvalid)
        boxes, cls_sig, cls_ids = self.point_head.predicted_boxes(
            points[:, :3], cls_preds, box_preds)
        best = jnp.max(cls_sig, axis=-1)
        rois, roi_scores, roi_labels, roi_valid = \
            self.roi_head.proposal_layer(boxes, best, cls_ids, pvalid,
                                         train=train)
        return (ctx, feats, cls_preds, box_preds, scores,
                (rois, roi_scores, roi_labels, roi_valid))

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            (ctx, feats, cls_preds, box_preds, scores, props) = \
                self._scene(P, S, True, points, pvalid, r)
            labels_t, box_t, box_v = self.point_head.assign_targets(
                points[:, :3], pvalid, boxes, labels, bvalid)
            rois, roi_scores, roi_labels, roi_valid = props
            roi_out = self.roi_head.forward_train(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                boxes, labels, bvalid, points[:, :3], pvalid, feats,
                scores)
            return (cls_preds, box_preds, labels_t, box_t, box_v,
                    roi_out, ctx.updates, ctx.stats)

        (cls_preds, box_preds, labels_t, box_t, box_v, roi_outs, updates,
         stats) = jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], gt_boxes, gt_labels,
            gt_valid, rngs)

        loss_point, tb = self.point_head.loss(cls_preds, box_preds,
                                              labels_t, box_t, box_v)
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
            (ctx, feats, cls_preds, box_preds, scores, props) = \
                self._scene(P, S, False, points, pvalid, r,
                            axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
            return self.roi_head.forward_test(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                points[:, :3], pvalid, feats, scores,
                score_thresh=score_thr, nms_thresh=nms_thr,
                max_out=max_out)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
