"""Detector template: module-slot topology + registries + checkpoint IO.

Rebuild of pcdet/models/detectors/detector3d_template.py: detectors are
assembled from the fixed 8-slot topology (vfe, backbone_3d, map_to_bev,
pfe, backbone_2d, dense_head, point_head, roi_head), each slot built from
its registry by config NAME.  The functional-JAX twist: modules are
stateless builders exposing ``init`` (flat param/state dicts) and apply
methods; the template concatenates their dicts.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax

from ...core.module import Params


class Detector3DTemplate:
    module_topology = [
        "vfe", "backbone_3d", "map_to_bev_module", "pfe", "backbone_2d",
        "dense_head", "point_head", "roi_head",
    ]

    def __init__(self, model_cfg, num_class: int, dataset=None):
        self.model_cfg = model_cfg
        self.num_class = num_class
        self.dataset = dataset
        self.class_names = getattr(dataset, "class_names", None)

    # ------------------------------------------------------------------
    def build_networks(self) -> List:
        modules = []
        for name in self.module_topology:
            mod = getattr(self, f"build_{name}")()
            if mod is not None:
                setattr(self, name, mod)
                modules.append(mod)
        return modules

    def _cfg(self, key):
        return self.model_cfg.get(key, None)

    def build_vfe(self):
        cfg = self._cfg("VFE")
        if cfg is None:
            return None  # indoor models voxelize on-device (cagroup3d.py)
        from ..backbones_3d.vfe import MeanVFE, PillarVFE
        # DynMeanVFE / DynPillarVFE (reference dynamic_{mean,pillar}_vfe
        # .py) reduce over ALL points of a voxel; the static VFEs see
        # only the first MAX_POINTS_PER_VOXEL points the spconv
        # voxelizer kept (data_processor.py transform_points_to_voxels),
        # reproduced here with an arrival-rank cap (vfe._cap_points).
        reg = {"MeanVFE": MeanVFE, "PillarVFE": PillarVFE,
               "DynMeanVFE": MeanVFE, "DynPillarVFE": PillarVFE}
        mp = None
        ds = getattr(self, "dataset", None)
        if cfg.NAME in ("MeanVFE", "PillarVFE") and ds is not None:
            for proc in ds.dataset_cfg.get("DATA_PROCESSOR", []):
                if proc.get("NAME") == "transform_points_to_voxels":
                    mp = int(proc.get("MAX_POINTS_PER_VOXEL", 0)) or None
        return reg[cfg.NAME](cfg,
                             num_point_features=int(cfg.get(
                                 "NUM_POINT_FEATURES", 4)),
                             max_points_per_voxel=mp)

    def build_backbone_3d(self):
        cfg = self._cfg("BACKBONE_3D")
        if cfg is None:
            return None
        from ..backbones_3d import __all__ as registry
        # channel count flows from the VFE's output dim (pcdet passes
        # model_info_dict['num_point_features']); detectors without a
        # VFE keep each backbone's own default
        kw = {}
        vfe_out = getattr(getattr(self, "vfe", None),
                          "num_point_features", None)
        if vfe_out is not None:
            kw["input_channels"] = int(vfe_out)
        return registry[cfg.NAME](
            cfg, grid_size=getattr(self, "grid_size", None), **kw)

    def build_map_to_bev_module(self):
        cfg = self._cfg("MAP_TO_BEV")
        if cfg is None:
            return None
        from ..backbones_2d import __all__ as registry
        return registry[cfg.NAME](cfg)

    def build_pfe(self):
        cfg = self._cfg("PFE")
        if cfg is None:
            return None
        from ..backbones_3d.voxel_set_abstraction import \
            VoxelSetAbstraction
        mb = self._cfg("MAP_TO_BEV")
        return VoxelSetAbstraction(
            cfg, voxel_size=getattr(self, "voxel_size", None),
            point_cloud_range=getattr(self, "point_cloud_range", None),
            num_bev_features=int(mb.NUM_BEV_FEATURES) if mb else None,
            num_rawpoint_features=int(self._cfg("VFE").get(
                "NUM_POINT_FEATURES", 4)) if self._cfg("VFE") else 4)

    def build_backbone_2d(self):
        cfg = self._cfg("BACKBONE_2D")
        if cfg is None:
            return None
        from ..backbones_2d import __all__ as registry
        return registry[cfg.NAME](cfg)

    def build_dense_head(self):
        cfg = self._cfg("DENSE_HEAD")
        if cfg is None:
            return None
        from ..dense_heads import __all__ as registry
        # channels flow from the preceding 2D backbone (pcdet passes
        # model_info_dict['num_bev_features'])
        in_ch = getattr(getattr(self, "backbone_2d", None),
                        "num_bev_features", None)
        return registry[cfg.NAME](
            cfg, num_class=self.num_class, class_names=self.class_names,
            grid_size=getattr(self, "grid_size", None),
            point_cloud_range=getattr(self, "point_cloud_range", None),
            voxel_size=getattr(self, "voxel_size", None),
            input_channels=in_ch,
            post_cfg=self._cfg("POST_PROCESSING"))

    def build_point_head(self):
        cfg = self._cfg("POINT_HEAD")
        if cfg is None:
            return None
        from ..dense_heads import __all__ as registry
        pfe = getattr(self, "pfe", None)
        in_ch = None
        if pfe is not None:
            in_ch = pfe.num_point_features_before_fusion if cfg.get(
                "USE_POINT_FEATURES_BEFORE_FUSION", False) \
                else pfe.num_point_features
        if in_ch is None:   # point-feature backbones (UNetV2, PointNet2)
            in_ch = getattr(getattr(self, "backbone_3d", None),
                            "num_point_features", None)
        return registry[cfg.NAME](cfg, num_class=self.num_class,
                                  input_channels=in_ch)

    def build_roi_head(self):
        cfg = self._cfg("ROI_HEAD")
        if cfg is None:
            return None
        from ..roi_heads import __all__ as registry
        pfe = getattr(self, "pfe", None)
        in_ch = getattr(pfe, "num_point_features", None)
        if in_ch is None:
            in_ch = getattr(getattr(self, "backbone_3d", None),
                            "num_point_features", None)
        return registry[cfg.NAME](
            cfg, num_class=self.num_class, input_channels=in_ch)

    # ------------------------------------------------------------------
    def init(self, rng) -> Tuple[Params, Params]:
        raise NotImplementedError

    def load_params_from_file(self, filename, logger=None, to_cpu=False):
        """Load a native checkpoint or a converted reference one (both are
        flat param/state pickles; see training/checkpoint.py and
        tools/convert_reference_ckpt.py)."""
        from ...training.checkpoint import load_checkpoint
        ckpt = load_checkpoint(filename)
        if logger:
            logger.info(f"==> Loading parameters from {filename} "
                        f"(version {ckpt.get('version')})")
        return ckpt["params"], ckpt["state"]
