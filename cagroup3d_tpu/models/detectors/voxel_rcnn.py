"""Voxel R-CNN detector (reference pcdet/models/detectors/
voxel_rcnn.py:1-32): SECOND's one-stage pipeline + VoxelRCNNHead
refining proposals directly from the sparse-conv feature volumes
(no keypoint PFE).  Loss = rpn + rcnn."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .second_net import SECONDNet


class VoxelRCNN(SECONDNet):
    def build_roi_head(self):
        cfg = self._cfg("ROI_HEAD")
        if cfg is None:
            return None
        from ..roi_heads.voxelrcnn_head import VoxelRCNNHead
        bb = getattr(self, "backbone_3d", None)
        return VoxelRCNNHead(
            cfg, num_class=self.num_class,
            backbone_channels=getattr(bb, "backbone_channels", None),
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range)

    def init(self, rng) -> Tuple[Params, Params]:
        P, S = super().init(rng)
        p, s = self.roi_head.init(jax.random.fold_in(rng, 7), "roi_head")
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
        bev = self.map_to_bev_module(P, S, ctx,
                                     bb["encoded_spconv_tensor"],
                                     self._final_grid())
        bev2d = self.backbone_2d(P, S, ctx, bev)
        head_out = self.dense_head.forward(P, S, ctx, bev2d)
        multi = {name: (t, bb["multi_scale_3d_strides"][name])
                 for name, t in bb["multi_scale_3d_features"].items()}

        boxes, cls_scores = self.dense_head.decoded_boxes(head_out)
        best = jnp.max(cls_scores, axis=-1)
        labels = jnp.argmax(cls_scores, axis=-1).astype(jnp.int32)
        rois, roi_scores, roi_labels, roi_valid = \
            self.roi_head.proposal_layer(
                boxes, best, labels, jnp.ones(best.shape[0], bool),
                train=train)
        return ctx, head_out, multi, (rois, roi_scores, roi_labels,
                                      roi_valid)

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            ctx, head_out, multi, props = self._scene_full(
                P, S, True, points, pvalid, r)
            rois, roi_scores, roi_labels, roi_valid = props
            roi_out = self.roi_head.forward_train(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                boxes, labels, bvalid, multi)
            return head_out, roi_out, ctx.updates, ctx.stats

        head_outs, roi_outs, updates, stats = \
            jax.vmap(scene, axis_name="scene")(
                batch["points"], batch["points_valid"], gt_boxes,
                gt_labels, gt_valid, rngs)

        loss_rpn, tb = self.dense_head.loss(head_outs, gt_boxes,
                                            gt_labels, gt_valid)
        loss_rcnn, tb_r = self.roi_head.loss(roi_outs)
        tb.update(tb_r)
        loss = loss_rpn + loss_rcnn
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
            ctx, head_out, multi, props = self._scene_full(
                P, S, False, points, pvalid, r, axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
            return self.roi_head.forward_test(
                P, S, ctx, rois, roi_scores, roi_labels, roi_valid,
                multi, score_thresh=score_thr, nms_thresh=nms_thr,
                max_out=max_out)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
