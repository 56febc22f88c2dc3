"""CAGroup3D detector: voxelization -> BiResNet -> one-stage head ->
RoI head, with loss assembly.

TPU-native rebuild of pcdet/models/detectors/cagroup3d.py.  The whole
forward (all scenes) is one jittable function: per-scene work is vmapped
with axis_name "scene" (SyncBN semantics; under pjit the batch axis spans
all devices, so BN stats and loss normalizers are globally reduced
automatically).

Frame normalization: per scene, the voxel lattice is shifted so min
coordinate = 0 (keeps coordinates packable, see core/hashing.py); GT and
raw points are shifted into the same frame, and predictions are shifted
back at the end.  This moves the (arbitrary) quantization grid origin
relative to the reference but is mAP-neutral (the reference's origin is
already arbitrary under translation augmentation).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from ...core.sparse import SparseTensor
from ...core.voxelize import unique_voxels
from .detector3d_template import Detector3DTemplate


class CAGroup3D(Detector3DTemplate):
    def __init__(self, model_cfg, num_class: int, dataset=None):
        super().__init__(model_cfg=model_cfg, num_class=num_class,
                         dataset=dataset)
        self.module_list = self.build_networks()
        self.voxel_size = model_cfg.VOXEL_SIZE
        self.semantic_min_threshold = model_cfg.SEMANTIC_MIN_THR
        self.semantic_iter_value = model_cfg.SEMANTIC_ITER_VALUE
        self.semantic_value = model_cfg.SEMANTIC_THR
        self.input_cap = int(model_cfg.get("INPUT_CAP",
                                           self.backbone_3d.caps[1]))
        self.ins_cap = int(model_cfg.get("INS_CAP", 128))
        # GT-as-proposal augmentation (off by default; not in the
        # reference): appends jittered GT boxes to the one-stage
        # proposals in train mode so the RoI branch sees foreground
        # samples from step 0 (and the multi-chip dryrun exercises the
        # second-stage gradient path with an untrained one-stage net)
        self.roi_gt_aug = float(model_cfg.get("ROI_GT_AUG", 0.0))

    def init(self, rng) -> Tuple[Params, Params]:
        r1, r2, r3 = jax.random.split(rng, 3)
        P, S = {}, {}
        for (p, s) in [self.backbone_3d.init(r1), self.dense_head.init(r2),
                       self.roi_head.init(r3)]:
            P.update(p)
            S.update(s)
        return P, S

    def semantic_threshold(self, cur_epoch):
        return jnp.maximum(
            self.semantic_value - cur_epoch * self.semantic_iter_value,
            self.semantic_min_threshold)

    # ------------------------------------------------------------------
    def _voxelize_scene(self, points, valid, stats=None,
                        drop_offset=None):
        """points [P, 6] (xyz, rgb 0..255) -> (SparseTensor stride 1,
        origin metric [3], normalized points [P, 3])."""
        v = self.voxel_size
        xyz = points[:, :3]
        rgb = points[:, 3:6] / 255.0
        lat = jnp.floor(xyz / v).astype(jnp.int32)
        big = jnp.int32(1 << 20)
        min_lat = jnp.min(jnp.where(valid[:, None], lat, big), axis=0)
        min_lat = jnp.where(min_lat == big, 0, min_lat)
        lat = lat - min_lat[None, :]
        origin = min_lat.astype(jnp.float32) * v
        st, _ = unique_voxels(lat, rgb, valid, self.input_cap, mode="first",
                              stats=stats, stat_name="input",
                              drop_offset=drop_offset)
        return st, origin, xyz - origin[None, :]

    def _forward_scene(self, P: Params, train: bool, S: Params, points,
                       pvalid, sem_thr, rng, axis_name="scene"):
        """Single scene forward up to one-stage proposals."""
        ctx = Ctx(train=train, axis_name=axis_name, rng=rng)
        # opt-in: MXU conv kernels during training (vmapped Pallas blocks
        # grow with the per-device batch; safe for B <= 2)
        # Default ON since round 4: with the stride-1 stem (and the
        # 32768-row stride-2 table) routed to the XLA path by the VMEM
        # gate, the MXU kernels bring the measured full-caps B=2 train
        # step from 1380 to 986 ms on v5e (tools/bench_train.py).
        ctx.mxu_train = bool(self.model_cfg.get("MXU_TRAIN", True))
        # train: capacity overflow sheds a randomly rotated rank window
        # instead of a fixed spatial corner slab (core/voxelize.py)
        drop_off = jax.random.randint(ctx.next_rng(), (), 0, 1 << 30) \
            if train else None
        ctx.drop_offset = drop_off
        st, origin, pts_norm = self._voxelize_scene(points, pvalid,
                                                    stats=ctx.stats,
                                                    drop_offset=drop_off)
        feat = self.backbone_3d(P, S, ctx, st)
        head_out = self.dense_head.forward(P, S, ctx, feat, sem_thr)
        rois, roi_scores, roi_labels, roi_valid = \
            self.dense_head.get_bboxes(head_out, training=train)
        return ctx, st, origin, pts_norm, feat, head_out, \
            (rois, roi_scores, roi_labels, roi_valid)

    # ------------------------------------------------------------------
    def forward_train(self, P: Params, S: Params, batch: Dict, rng,
                      cur_epoch) -> Tuple[jnp.ndarray, Dict, Params]:
        """Returns (loss, tb_dict, state_updates)."""
        sem_thr = self.semantic_threshold(cur_epoch)
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)

        gt_boxes = batch["gt_boxes"][..., :7]
        gt_labels = batch["gt_boxes"][..., 7].astype(jnp.int32)
        gt_valid = batch["gt_valid"]

        def scene(points, pvalid, boxes, labels, bvalid, r):
            ctx, st, origin, pts_norm, feat, head_out, props = \
                self._forward_scene(P, True, S, points, pvalid, sem_thr, r)
            boxes_n = boxes.at[:, :3].add(-origin[None, :])
            rois, roi_scores, roi_labels, roi_valid = props
            if self.roi_gt_aug > 0:
                # jittered GT as extra proposals (mmdet3d heading, like
                # the one-stage rois: the RoI head flips the sign back)
                k1, k2 = jax.random.split(ctx.next_rng())
                scale = self.roi_gt_aug
                jc = jax.random.normal(k1, boxes_n[:, :3].shape) * \
                    scale * boxes_n[:, 3:6]
                js = 1.0 + jax.random.normal(k2, boxes_n[:, 3:6].shape) * \
                    scale * 0.5
                aug = jnp.concatenate(
                    [boxes_n[:, :3] + jc,
                     jnp.maximum(boxes_n[:, 3:6] * js, 1e-3),
                     -boxes_n[:, 6:7]], axis=-1)
                rois = jnp.concatenate([rois, aug], axis=0)
                roi_scores = jnp.concatenate(
                    [roi_scores, jnp.where(bvalid, 0.99, 0.0)], axis=0)
                roi_labels = jnp.concatenate([roi_labels, labels], axis=0)
                roi_valid = jnp.concatenate([roi_valid, bvalid], axis=0)
            roi_out = self.roi_head.forward_train(
                P, S, ctx, feat, rois, roi_scores,
                roi_labels.astype(jnp.int32), roi_valid, boxes_n, labels,
                bvalid)
            return head_out, roi_out, origin, pts_norm, ctx.updates, \
                ctx.stats

        head_outs, roi_outs, origins, pts_norm, updates, stats = jax.vmap(
            scene, axis_name="scene")(
                batch["points"], batch["points_valid"], gt_boxes, gt_labels,
                gt_valid, rngs)

        gt_boxes_n = gt_boxes.at[..., :3].add(
            -origins[:, None, :])
        loss_one, tb = self.dense_head.loss(
            head_outs, gt_boxes_n, gt_labels, gt_valid,
            pts_norm, batch["points_valid"],
            batch.get("semantic_mask"), batch.get("instance_mask"),
            ins_cap=self.ins_cap)
        loss_two, tb2 = self.roi_head.loss(roi_outs)
        tb.update(tb2)
        loss = loss_one + loss_two
        tb["loss_all"] = loss
        # capacity-overflow counters (dropped voxels), summed over scenes
        for k, v in stats.items():
            tb[k] = jnp.sum(v).astype(jnp.float32)
        # BN updates are psum-identical across the scene axis; take slice 0
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def forward_eval(self, P: Params, S: Params, batch: Dict,
                     cur_epoch=None) -> Dict:
        """Returns padded predictions per scene (boxes in the original
        metric frame, mmdet3d heading convention like the reference)."""
        sem_thr = self.semantic_threshold(
            cur_epoch if cur_epoch is not None else 1000.0)
        B = batch["points"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)

        def scene(points, pvalid, r, axis_name="scene"):
            ctx, st, origin, pts_norm, feat, head_out, props = \
                self._forward_scene(P, False, S, points, pvalid, sem_thr, r,
                                    axis_name=axis_name)
            rois, roi_scores, roi_labels, roi_valid = props
            out = self.roi_head.forward_test(
                P, S, ctx, feat, rois, roi_scores,
                roi_labels.astype(jnp.int32), roi_valid)
            boxes = out["batch_box_preds"].at[:, :3].add(origin[None, :])
            overflow = sum(jnp.sum(v) for v in ctx.stats.values()) \
                if ctx.stats else jnp.int32(0)
            return dict(pred_boxes=boxes,
                        pred_scores=out["batch_score_preds"],
                        pred_labels=out["batch_cls_preds"],
                        pred_valid=out["batch_pred_valid"],
                        overflow=overflow)

        if B == 1:
            # batch-1 eval (the reference's eval protocol): skip the scene
            # vmap — batched-by-1 gathers scalarize on TPU
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
