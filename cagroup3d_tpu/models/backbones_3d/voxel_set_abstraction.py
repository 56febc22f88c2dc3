"""VoxelSetAbstraction PFE + stacked multi-scale-grouping SA module
(reference pcdet/models/backbones_3d/pfe/voxel_set_abstraction.py:123-411
and ops/pointnet2/pointnet2_stack/pointnet2_modules.StackSAModuleMSG).

TPU-native design: everything is per scene with static shapes (the
detector vmaps over scenes), so the reference's ragged batch-count
machinery disappears: keypoints are a fixed-K FPS sample (repeating when
a scene has fewer valid points, like the reference's repeat-fill,
voxel_set_abstraction.py:257-261), ball queries are chunked dense
distance top-k (core/pointnet2.ball_query), and empty balls zero their
group like the stack CUDA kernels.  BEV features are gathered with
bilinear interpolation on the dense [H, W, C] map.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ...core.module import Ctx, Params, apply_bn, init_bn, init_linear
from ...core.pointnet2 import farthest_point_sample, query_and_group


def bilinear_interpolate(im, x, y):
    """im [H, W, C], x/y [N] fractional indices (x -> W axis)
    (voxel_set_abstraction.py:11-41)."""
    H, W, _ = im.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    Ia = im[y0, x0]
    Ib = im[y1, x0]
    Ic = im[y0, x1]
    Id = im[y1, x1]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (Ia * wa[:, None] + Ib * wb[:, None] + Ic * wc[:, None] +
            Id * wd[:, None])


class StackSAModuleMSG:
    """Multi-radius grouping + shared MLPs + max-pool
    (pointnet2_stack/pointnet2_modules.py StackSAModuleMSG).  Functional:
    params live in the flat dict under ``prefix``."""

    def __init__(self, input_channels: int, radii: List[float],
                 nsamples: List[int], mlps: List[List[int]],
                 use_xyz: bool = True):
        assert len(radii) == len(nsamples) == len(mlps)
        self.radii = [float(r) for r in radii]
        self.nsamples = [int(n) for n in nsamples]
        self.use_xyz = use_xyz
        self.mlps = []
        for m in mlps:
            cin = input_channels + (3 if use_xyz else 0)
            self.mlps.append([cin] + [int(c) for c in m])
        self.num_out = sum(m[-1] for m in self.mlps)

    def init(self, rng, prefix: str) -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        for gi, chans in enumerate(self.mlps):
            rngs = jax.random.split(jax.random.fold_in(rng, gi),
                                    len(chans))
            for li in range(len(chans) - 1):
                init_linear(P, rngs[li], f"{prefix}.mlps.{gi}.{li}",
                            chans[li], chans[li + 1], bias=False,
                            init="kaiming")
                init_bn(P, S, f"{prefix}.mlps.{gi}.{li}.bn",
                        chans[li + 1])
        return P, S

    def __call__(self, P, S, ctx: Ctx, xyz, xyz_valid, feats, new_xyz,
                 new_valid, prefix: str):
        """xyz [N, 3] source points (+ feats [N, C] or None), new_xyz
        [M, 3] query centers.  Returns [M, num_out]."""
        outs = []
        for gi, (radius, nsample) in enumerate(zip(self.radii,
                                                   self.nsamples)):
            grouped, _, _ = query_and_group(
                radius, nsample, xyz, xyz_valid, new_xyz, new_valid,
                feats=feats, use_xyz=self.use_xyz, zero_query=True)
            x = grouped                              # [M, nsample, Cin]
            chans = self.mlps[gi]
            for li in range(len(chans) - 1):
                x = x @ P[f"{prefix}.mlps.{gi}.{li}.weight"]
                M, K, C = x.shape
                x = apply_bn(P, S, ctx, f"{prefix}.mlps.{gi}.{li}.bn",
                             x.reshape(M * K, C),
                             jnp.repeat(new_valid, K)).reshape(M, K, C)
                x = jnp.maximum(x, 0.0)
            outs.append(jnp.max(x, axis=1))          # [M, C_out]
        out = jnp.concatenate(outs, axis=-1)
        return jnp.where(new_valid[:, None], out, 0.0)


class VoxelSetAbstraction:
    def __init__(self, model_cfg, voxel_size=None, point_cloud_range=None,
                 num_bev_features=None, num_rawpoint_features=4, **kwargs):
        c = model_cfg
        self.cfg = c
        self.voxel_size = [float(v) for v in voxel_size]
        self.pc_range = [float(v) for v in point_cloud_range]
        self.num_keypoints = int(c.NUM_KEYPOINTS)
        self.sample_method = str(c.get("SAMPLE_METHOD", "FPS"))
        self.spc_cfg = c.get("SPC_SAMPLING", None)
        self.sources = list(c.FEATURES_SOURCE)
        sa_cfg = c.SA_LAYER
        self.sa_layers = {}
        self.downsample = {}
        self.roi_filter = {}         # src -> radius (PV-RCNN++ neighbor
        #                              filtering, voxel_set_abstraction.py:
        #                              284-332 filter_neighbors_with_roi)

        def build_layer(sc, cin):
            if str(sc.get("NAME", "")) == "VectorPoolAggregationModuleMSG":
                from .vector_pool import VectorPoolAggregationModuleMSG
                return VectorPoolAggregationModuleMSG(cin, sc)
            return StackSAModuleMSG(cin, sc["POOL_RADIUS"],
                                    sc["NSAMPLE"], sc["MLPS"])

        c_in = 0
        for src in self.sources:
            if src in ("bev", "raw_points"):
                continue
            sc = sa_cfg[src]
            self.downsample[src] = int(sc.get("DOWNSAMPLE_FACTOR", 1))
            cin = sc.get("INPUT_CHANNELS")
            if cin is None:
                m0 = sc["MLPS"][0]
                cin = m0[0] if isinstance(m0, (list, tuple)) else m0
            self.sa_layers[src] = build_layer(sc, int(cin))
            if sc.get("FILTER_NEIGHBOR_WITH_ROI", False):
                self.roi_filter[src] = float(
                    sc["RADIUS_OF_NEIGHBOR_WITH_ROI"])
            c_in += self.sa_layers[src].num_out
        if "bev" in self.sources:
            self.c_bev = int(num_bev_features)
            c_in += self.c_bev
        if "raw_points" in self.sources:
            sc = sa_cfg["raw_points"]
            self.sa_rawpoints = build_layer(sc, num_rawpoint_features - 3)
            if sc.get("FILTER_NEIGHBOR_WITH_ROI", False):
                self.roi_filter["raw_points"] = float(
                    sc["RADIUS_OF_NEIGHBOR_WITH_ROI"])
            c_in += self.sa_rawpoints.num_out
        self.c_in = c_in
        self.num_point_features = int(c.NUM_OUTPUT_FEATURES)
        self.num_point_features_before_fusion = c_in

    def init(self, rng, prefix: str = "pfe") -> Tuple[Params, Params]:
        P: Params = {}
        S: Params = {}
        i = 0
        for src in self.sources:
            if src == "bev":
                continue
            layer = self.sa_rawpoints if src == "raw_points" \
                else self.sa_layers[src]
            p, s = layer.init(jax.random.fold_in(rng, i),
                              f"{prefix}.SA_{src}")
            P.update(p)
            S.update(s)
            i += 1
        init_linear(P, jax.random.fold_in(rng, 99),
                    prefix + ".vsa_point_feature_fusion",
                    self.c_in, self.num_point_features, bias=False,
                    init="kaiming")
        init_bn(P, S, prefix + ".vsa_point_feature_fusion.bn",
                self.num_point_features)
        return P, S

    def get_keypoints(self, points, pvalid, rois=None, roi_valid=None):
        """FPS over raw xyz -> [K, 3] keypoints (POINT_SOURCE raw_points,
        SAMPLE_METHOD FPS; repeats when fewer valid points).

        SAMPLE_METHOD SPC (PV-RCNN++, voxel_set_abstraction.py:206-225):
        restrict to points near proposals (sample_points_with_roi), then
        FPS.  The reference splits that FPS into per-sector FPS runs
        purely to parallelise the sequential CUDA kernel
        (sector_fps :78-122); one masked FPS over the roi-filtered set
        pursues the same spatial-uniformity objective with static
        shapes, so sectorisation is deliberately not replicated."""
        if self.sample_method == "SPC":
            from .vector_pool import filter_points_near_rois
            assert rois is not None
            near = filter_points_near_rois(
                points[:, :3], pvalid, rois, roi_valid,
                float(self.spc_cfg.SAMPLE_RADIUS_WITH_ROI))
            # fall back to all valid points if no roi survives
            near = jnp.where(jnp.any(near), near, pvalid)
            idx = farthest_point_sample(points[:, :3], near,
                                        self.num_keypoints)
            kp = points[idx, :3]
            return kp, jnp.broadcast_to(jnp.any(near), (kp.shape[0],))
        idx = farthest_point_sample(points[:, :3], pvalid,
                                    self.num_keypoints)
        kp = points[idx, :3]
        return kp, jnp.broadcast_to(jnp.any(pvalid), (kp.shape[0],))

    def __call__(self, P, S, ctx: Ctx, points, pvalid, bev,
                 multi_scale: Dict, bev_stride: int,
                 prefix: str = "pfe", rois=None, roi_valid=None):
        """Per scene.  points [P, 3+F] raw; bev [H, W, Cbev]; multi_scale:
        {name: (SparseTensor in own lattice units, downsample_factor)}.
        rois/roi_valid: proposals for SPC sampling + neighbor filtering
        (PV-RCNN++).  Returns (keypoints [K, 3], kp_valid,
        features [K, C], features_before_fusion [K, c_in])."""
        kp, kp_valid = self.get_keypoints(points, pvalid, rois, roi_valid)

        def src_valid(src, valid, xyz):
            r = self.roi_filter.get(src)
            if r is None or rois is None:
                return valid
            from .vector_pool import filter_points_near_rois
            near = filter_points_near_rois(xyz, valid, rois, roi_valid, r)
            return jnp.where(jnp.any(near), near, valid)

        feats_list = []
        if "bev" in self.sources:
            x_idx = (kp[:, 0] - self.pc_range[0]) / self.voxel_size[0] \
                / bev_stride
            y_idx = (kp[:, 1] - self.pc_range[1]) / self.voxel_size[1] \
                / bev_stride
            feats_list.append(bilinear_interpolate(bev, x_idx, y_idx))
        if "raw_points" in self.sources:
            f = points[:, 3:] if points.shape[1] > 3 else None
            feats_list.append(self.sa_rawpoints(
                P, S, ctx, points[:, :3],
                src_valid("raw_points", pvalid, points[:, :3]), f, kp,
                kp_valid, f"{prefix}.SA_raw_points"))
        for src, layer in self.sa_layers.items():
            st, factor = multi_scale[src]
            centers = (st.coords.astype(jnp.float32) + 0.5) * \
                jnp.asarray(self.voxel_size) * factor + \
                jnp.asarray(self.pc_range[:3])
            feats_list.append(layer(
                P, S, ctx, centers,
                src_valid(src, st.valid, centers), st.masked_feats(),
                kp, kp_valid, f"{prefix}.SA_{src}"))
        before = jnp.concatenate(feats_list, axis=-1)    # [K, c_in]
        fused = before @ P[prefix + ".vsa_point_feature_fusion.weight"]
        fused = apply_bn(P, S, ctx, prefix + ".vsa_point_feature_fusion.bn",
                         fused, kp_valid)
        fused = jnp.where(kp_valid[:, None], jnp.maximum(fused, 0.0), 0.0)
        return kp, kp_valid, fused, before
