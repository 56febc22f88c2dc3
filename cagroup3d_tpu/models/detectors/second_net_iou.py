"""SECONDNetIoU detector (reference pcdet/models/detectors/
second_net_iou.py:7-180): SECOND's one-stage pipeline + a SECONDHead
second stage that re-scores proposals with a predicted IoU.  Eval fuses
IoU and classification scores (SCORE_TYPE iou/cls/weighted_iou_cls/
num_pts_iou_cls, second_net_iou.py:37-149) before a class-agnostic NMS;
the output boxes are the proposals themselves.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core import nms as nms_mod
from ...core.module import Params
from .second_net import SECONDNet


class SECONDNetIoU(SECONDNet):
    def init(self, rng) -> Tuple[Params, Params]:
        P, S = super().init(rng)
        p, s = self.roi_head.init(jax.random.fold_in(rng, 1), "roi_head")
        P.update(p)
        S.update(s)
        return P, S

    def _proposals(self, head_out, train: bool):
        boxes, cls_scores = self.dense_head.decoded_boxes(head_out)
        best = jnp.max(cls_scores, axis=-1)
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
        return self.roi_head.proposal_layer(
            boxes, best, labels, jnp.ones(best.shape[0], bool),
            train=train)

    # ------------------------------------------------------------------
    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]
        pcr = self.point_cloud_range
        vs = self.voxel_size

        def scene(points, pvalid, boxes, labels, bvalid, r):
            ctx, out, bev2d = self._scene_bev(P, S, True, points, pvalid,
                                              r)
            rois, roi_scores, roi_labels, roi_valid = \
                self._proposals(out, train=True)
            roi_out = self.roi_head.forward_train(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                boxes, labels, bvalid, bev2d, pcr, vs)
            return out, roi_out, ctx.updates, ctx.stats

        outs, roi_outs, updates, stats = jax.vmap(
            scene, axis_name="scene")(
            batch["points"], batch["points_valid"], gt_boxes, gt_labels,
            gt_valid, rngs)
        loss_rpn, tb = self.dense_head.loss(outs, gt_boxes, gt_labels,
                                            gt_valid)
        loss_rcnn, tb_r = self.roi_head.loss(roi_outs)
        tb.update(tb_r)
        loss = loss_rpn + loss_rcnn
        for k, v in stats.items():
            tb[k] = jnp.sum(v).astype(jnp.float32)
        tb["loss_all"] = loss
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def _scene_bev(self, P, S, train, points, pvalid, rng,
                   axis_name="scene"):
        """SECOND's per-scene pipeline, also returning the 2D BEV map
        the IoU head pools from."""
        from ...core.module import Ctx
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        st = self.vfe(P, S, ctx, points, pvalid, self.voxel_size,
                      self.point_cloud_range, self.input_cap)
        if getattr(self, "backbone_3d", None) is not None:
            bb = self.backbone_3d(P, S, ctx, st)
            final = bb["encoded_spconv_tensor"]
        else:
            final = st
        bev = self.map_to_bev_module(P, S, ctx, final, self._final_grid())
        bev2d = self.backbone_2d(P, S, ctx, bev)
        out = self.dense_head.forward(P, S, ctx, bev2d)
        return ctx, out, bev2d

    # ------------------------------------------------------------------
    def _fused_scores(self, iou_s, cls_s, labels, boxes, points, pvalid):
        """Score fusion (second_net_iou.py:37-73 cal_scores_by_npoints /
        set_nms_score_by_class and the SCORE_TYPE dispatch :120-149)."""
        pp = self.model_cfg.get("POST_PROCESSING", {})
        nc = pp.get("NMS_CONFIG", {})
        stype = str(nc.get("SCORE_TYPE", "iou") or "iou")
        if stype == "iou":
            return iou_s
        if stype == "cls":
            return cls_s
        if stype == "weighted_iou_cls":
            w = nc.SCORE_WEIGHTS
            return float(w.iou) * iou_s + float(w.cls) * cls_s
        if stype == "num_pts_iou_cls":
            from ...core.roi_pools import points_in_boxes
            thr = nc.SCORE_THRESH
            c_thr, i_thr = float(thr.cls), float(thr.iou)
            inside = points_in_boxes(points[:, :3], pvalid, boxes,
                                     jnp.ones(boxes.shape[0], bool))
            npts = jnp.sum(inside, axis=1).astype(jnp.float32)
            alpha = jnp.clip((npts - c_thr) / (i_thr - c_thr), 0.0, 1.0)
            return (1 - alpha) * cls_s + alpha * iou_s
        if stype == "score_by_class":
            by = nc.SCORE_BY_CLASS
            use_iou = jnp.asarray(
                [1.0 if str(by.get(c, "iou")) == "iou" else 0.0
                 for c in self.class_names], jnp.float32)
            pick = jnp.take(use_iou,
                            jnp.clip(labels, 0,
                                     len(self.class_names) - 1))
            return pick * iou_s + (1 - pick) * cls_s
        raise NotImplementedError(stype)

    def forward_eval(self, P, S, batch: Dict, cur_epoch=None) -> Dict:
        B = batch["points"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)
        pp = self.model_cfg.get("POST_PROCESSING", {})
        score_thr = float(pp.get("SCORE_THRESH", 0.1))
        nc = pp.get("NMS_CONFIG", {})
        nms_thr = float(nc.get("NMS_THRESH", 0.1))
        max_out = int(nc.get("NMS_POST_MAXSIZE", 128))
        pcr = self.point_cloud_range
        vs = self.voxel_size

        def scene(points, pvalid, r, axis_name="scene"):
            ctx, out, bev2d = self._scene_bev(P, S, False, points,
                                              pvalid, r,
                                              axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = \
                self._proposals(out, train=False)
            ro = self.roi_head.forward_test(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                bev2d, pcr, vs)
            iou_s = jax.nn.sigmoid(ro["rcnn_iou"])
            cls_s = roi_scores          # already sigmoid from the RPN
            fused = self._fused_scores(iou_s, cls_s, roi_labels, rois,
                                       points, pvalid)
            v = roi_valid & (fused > score_thr)
            keep = nms_mod.greedy_nms(rois, jnp.where(v, fused, -1.0), v,
                                      nms_thr, rotated=True)
            v = v & keep
            m = min(max_out, rois.shape[0])
            so, oid = jax.lax.top_k(jnp.where(v, fused, -1.0), m)
            return dict(pred_boxes=rois[oid], pred_scores=so,
                        pred_labels=roi_labels[oid].astype(jnp.int32),
                        pred_valid=jnp.take(v, oid))

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
