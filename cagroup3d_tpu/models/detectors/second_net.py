"""SECOND and PointPillar detectors (reference pcdet/models/detectors/
second_net.py, pointpillar.py): VFE -> sparse/pillar backbone -> dense
BEV -> anchor head.  Whole-batch forward is one jittable function
(per-scene work vmapped)."""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params
from .detector3d_template import Detector3DTemplate


class SECONDNet(Detector3DTemplate):
    def __init__(self, model_cfg, num_class: int, dataset=None):
        super().__init__(model_cfg=model_cfg, num_class=num_class,
                         dataset=dataset)
        # range/voxel size: model cfg override, else the dataset's
        # (reference reads grid_size from the dataset pipeline)
        pcr = model_cfg.get("POINT_CLOUD_RANGE", None)
        if pcr is None and dataset is not None:
            pcr = list(dataset.point_cloud_range)
        vs = model_cfg.get("VOXEL_SIZE", None)
        if vs is None and dataset is not None:
            for proc in dataset.dataset_cfg.get("DATA_PROCESSOR", []):
                # calculate_grid_size: CaDDN's processor carries the
                # voxel size without voxelizing (camera-only pipeline)
                # _placeholder: the dynamic-VFE configs carry VOXEL_SIZE
                # without host voxelization (ours is on-device anyway)
                if proc.get("NAME") in (
                        "transform_points_to_voxels",
                        "transform_points_to_voxels_placeholder",
                        "calculate_grid_size"):
                    vs = list(proc["VOXEL_SIZE"])
        self.point_cloud_range = [float(x) for x in pcr]
        self.voxel_size = [float(x) for x in vs]
        r = self.point_cloud_range
        self.grid_size = [
            int(round((r[3 + i] - r[i]) / self.voxel_size[i]))
            for i in range(3)]
        # outdoor lattices exceed the default 10-bit/axis key packing
        # (KITTI: 1408 x 1600 x 40); widen per-axis bits to fit
        import math
        from ...core import hashing
        need = [math.ceil(math.log2(g + 2 * hashing._MARGIN))
                for g in self.grid_size]
        cur = (hashing.XBITS, hashing.YBITS, hashing.ZBITS)
        bits = [max(n, c) for n, c in zip(need, cur)]
        if tuple(bits) != cur:
            # widen only; if that busts the 30-bit budget, shrink z to
            # what this grid actually needs (z lattices are shallow)
            if sum(bits) > 30:
                bits[2] = max(need[2], 30 - bits[0] - bits[1])
            hashing.set_key_bits(*bits)
        self.input_cap = int(model_cfg.get("INPUT_CAP", 65536))
        if self.class_names is None:
            dh = model_cfg.get("DENSE_HEAD", None)
            if dh is None:      # anchor-free PartA2_free: no dense head
                pass
            elif dh.get("ANCHOR_GENERATOR_CONFIG") is not None:
                self.class_names = [a["class_name"] for a in
                                    dh.ANCHOR_GENERATOR_CONFIG]
            else:   # CenterHead: classes come from the head groups
                self.class_names = [c for g in dh.CLASS_NAMES_EACH_HEAD
                                    for c in g]
        self.module_list = self.build_networks()

    def init(self, rng) -> Tuple[Params, Params]:
        P, S = {}, {}
        rngs = jax.random.split(rng, 4)
        mods = [(self.vfe, "vfe"),
                (getattr(self, "backbone_3d", None), "backbone_3d"),
                (self.backbone_2d, "backbone_2d"),
                (self.dense_head, "dense_head")]
        for (m, pre), r in zip(mods, rngs):
            if m is None:
                continue
            p, s = m.init(r, pre)
            P.update(p)
            S.update(s)
        return P, S

    # ------------------------------------------------------------------
    def _final_grid(self):
        """(W, H, D) of the final sparse level fed to HeightCompression."""
        gx, gy, gz = self.grid_size
        if self.model_cfg.MAP_TO_BEV.NAME == "PointPillarScatter":
            return (gx, gy, 1)
        # VoxelBackBone8x computes its per-level extents from the spconv
        # sparse_shape (z extent gz+1, spconv_backbone.py:75); KITTI
        # gz=40 -> z chain 41,21,11,5,2 so D*C = 2*128 = 256
        bb = getattr(self, "backbone_3d", None)
        if bb is not None and getattr(bb, "final_extent", None):
            return tuple(bb.final_extent)
        z = gz + 1
        for _ in range(2):
            z = (z + 2 * 1 - 3) // 2 + 1
        z = (z - 3) // 2 + 1
        z = (z - 3) // 2 + 1
        return (gx // 8, gy // 8, z)

    def _scene(self, P, S, train, points, pvalid, rng, axis_name="scene"):
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
        return ctx, out

    def forward_train(self, P, S, batch: Dict, rng, cur_epoch=None):
        B = batch["points"].shape[0]
        rngs = jax.random.split(rng, B)

        def scene(points, pvalid, r):
            ctx, out = self._scene(P, S, True, points, pvalid, r)
            return out, ctx.updates, ctx.stats

        outs, updates, stats = jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)
        # last column is the class label; boxes are 7-dim, or 9-dim with
        # velocity (nuScenes PRED_VELOCITY)
        loss, tb = self.dense_head.loss(
            outs, batch["gt_boxes"][..., :-1],
            batch["gt_boxes"][..., -1].astype(jnp.int32),
            batch["gt_valid"])
        for k, v in stats.items():
            tb[k] = jnp.sum(v).astype(jnp.float32)
        tb["loss_all"] = loss
        state_updates = {k: v[0] for k, v in updates.items()}
        return loss, tb, state_updates

    def forward_eval(self, P, S, batch: Dict, cur_epoch=None) -> Dict:
        B = batch["points"].shape[0]
        rngs = jax.random.split(jax.random.PRNGKey(0), B)

        def scene(points, pvalid, r, axis_name="scene"):
            ctx, out = self._scene(P, S, False, points, pvalid, r,
                                   axis_name=axis_name)
            boxes, scores, labels, valid = \
                self.dense_head.generate_predicted_boxes(out)
            return dict(pred_boxes=boxes, pred_scores=scores,
                        pred_labels=labels, pred_valid=valid)

        if B == 1:
            out = scene(batch["points"][0], batch["points_valid"][0],
                        rngs[0], axis_name=None)
            return {k: v[None] for k, v in out.items()}
        return jax.vmap(scene, axis_name="scene")(
            batch["points"], batch["points_valid"], rngs)


class PointPillar(SECONDNet):
    """pointpillar.py: identical pipeline with PillarVFE +
    PointPillarScatter (no 3D backbone)."""
    pass
