"""CaDDN detector (reference pcdet/models/detectors/caddn.py:1-38):
monocular 3D detection — image -> depth-distribution frustum features ->
voxel grid -> BEV conv collapse -> BEV backbone -> anchor head.
Loss = RPN + depth distribution (caddn.py:24-38).

Batch keys (dataset GET_ITEM_LIST ["images", "depth_maps",
"calib_matricies", "gt_boxes2d"], reference CaDDN.yaml):
  images            f32[B, H, W, 3]   (0..1)
  depth_maps        f32[B, H/ds, W/ds] (already downsampled, like the
                    reference's downsample_depth_map processor)
  gt_boxes2d        f32[B, N, 4] (u1, v1, u2, v2) + gt_boxes2d_valid
  trans_lidar_to_cam f32[B, 4, 4]; trans_cam_to_img f32[B, 3, 4]
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .second_net import SECONDNet


class CaDDN(SECONDNet):
    def build_vfe(self):
        cfg = self._cfg("VFE")
        from ..backbones_3d.image_vfe import ImageVFE
        return ImageVFE(cfg, grid_size=self.grid_size,
                        point_cloud_range=self.point_cloud_range,
                        depth_downsample_factor=4)

    def build_map_to_bev_module(self):
        cfg = self._cfg("MAP_TO_BEV")
        from ..backbones_2d.map_to_bev import Conv2DCollapse
        return Conv2DCollapse(cfg, grid_size=self.grid_size)

    def build_backbone_3d(self):
        return None     # camera-only: no 3D backbone (caddn has none)

    def init(self, rng) -> Tuple[Params, Params]:
        P, S = {}, {}
        rngs = jax.random.split(rng, 4)
        for (m, pre), r in zip(
                ((self.vfe, "vfe"),
                 (self.map_to_bev_module, "map_to_bev"),
                 (self.backbone_2d, "backbone_2d"),
                 (self.dense_head, "dense_head")), rngs):
            p, s = m.init(r, pre)
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _scene_img(self, P, S, train, image, l2c, c2i, rng,
                   axis_name="scene"):
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        vox, logits = self.vfe(P, S, ctx, image, l2c, c2i)
        bev = self.map_to_bev_module(P, S, ctx, vox)
        bev2d = self.backbone_2d(P, S, ctx, bev)
        out = self.dense_head.forward(P, S, ctx, bev2d)
        return ctx, out, logits

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["images"].shape[0]
        rngs = jax.random.split(rng, B)
        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(image, l2c, c2i, r):
            ctx, out, logits = self._scene_img(P, S, True, image, l2c,
                                               c2i, r)
            return out, logits, ctx.updates, ctx.stats

        outs, logits, updates, stats = jax.vmap(
            scene, axis_name="scene")(
            batch["images"], batch["trans_lidar_to_cam"],
            batch["trans_cam_to_img"], rngs)
        loss_rpn, tb = self.dense_head.loss(outs, gt_boxes, gt_labels,
                                            gt_valid)
        loss_depth, tb_d = self.vfe.loss(
            logits, batch["depth_maps"], batch["gt_boxes2d"],
            batch["gt_boxes2d_valid"])
        tb.update(tb_d)
        loss = loss_rpn + loss_depth
        for k, v in stats.items():
            tb[k] = jnp.sum(v).astype(jnp.float32)
        tb["loss_all"] = loss
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def forward_eval(self, P, S, batch: Dict, cur_epoch=None) -> Dict:
        B = batch["images"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)

        def scene(image, l2c, c2i, r, axis_name="scene"):
            ctx, out, _ = self._scene_img(P, S, False, image, l2c, c2i,
                                          r, axis_name=axis_name)
            boxes, scores, labels, valid = \
                self.dense_head.generate_predicted_boxes(out)
            return dict(pred_boxes=boxes, pred_scores=scores,
                        pred_labels=labels, pred_valid=valid)

        if B == 1:
            out = scene(batch["images"][0],
                        batch["trans_lidar_to_cam"][0],
                        batch["trans_cam_to_img"][0], rngs[0],
                        axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["images"], batch["trans_lidar_to_cam"],
            batch["trans_cam_to_img"], rngs)
