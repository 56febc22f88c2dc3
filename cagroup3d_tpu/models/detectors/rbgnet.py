"""RBGNet detector: PointNet2-FBS backbone + ray-based-grouping head.

TPU-native rebuild of pcdet/models/detectors/rbgnet.py (:5-108): module
slots = backbone_3d + point_head; loss is delegated entirely to the head;
eval follows the reference's batch-1 protocol.  Whole-batch forward is one
jittable function (per-scene work vmapped with axis_name "scene")."""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .detector3d_template import Detector3DTemplate


class RBGNet(Detector3DTemplate):
    def __init__(self, model_cfg, num_class: int, dataset=None):
        super().__init__(model_cfg=model_cfg, num_class=num_class,
                         dataset=dataset)
        self.module_list = self.build_networks()
        self.ins_cap = int(model_cfg.get("INS_CAP", 128))
        self.max_out = int(model_cfg.get("MAX_OUT", 1024))

    def init(self, rng) -> Tuple[Params, Params]:
        r1, r2 = jax.random.split(rng)
        P, S = {}, {}
        for (p, s) in [self.backbone_3d.init(r1), self.point_head.init(r2)]:
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _scene(self, P, S, train: bool, points, pvalid, rng,
               axis_name="scene"):
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        xyz = points[:, :3]
        rgb = points[:, 3:6] / 255.0            # rbgnet.py:12
        bb = self.backbone_3d(P, S, ctx, xyz, rgb, pvalid)
        out = self.point_head.forward(P, S, ctx, bb)
        return ctx, bb, out

    def forward_train(self, P: Params, S: Params, batch: Dict, rng,
                      cur_epoch=None) -> Tuple[jnp.ndarray, Dict, Params]:
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)

        def scene(points, pvalid, r):
            ctx, bb, out = self._scene(P, S, True, points, pvalid, r)
            return bb, out, ctx.updates

        bbs, outs, updates = jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)

        loss_batch = dict(
            points=batch["points"][..., :3],
            points_valid=batch["points_valid"],
            gt_boxes=batch["gt_boxes"][..., :7],
            gt_labels=batch["gt_boxes"][..., 7].astype(jnp.int32),
            gt_valid=batch["gt_valid"],
            semantic_mask=batch.get("semantic_mask"),
            instance_mask=batch.get("instance_mask"),
        )
        loss, tb = self.point_head.loss(outs, bbs, loss_batch,
                                        ins_cap=self.ins_cap)
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def forward_eval(self, P: Params, S: Params, batch: Dict,
                     cur_epoch=None) -> Dict:
        B = batch["points"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)

        def scene(points, pvalid, r, axis_name="scene"):
            _, bb, out = self._scene(P, S, False, points, pvalid, r,
                                     axis_name=axis_name)
            boxes, scores, labels, valid = \
                self.point_head.generate_predicted_boxes(
                    out, points[:, :3], pvalid, max_out=self.max_out)
            return dict(pred_boxes=boxes, pred_scores=scores,
                        pred_labels=labels, pred_valid=valid)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
