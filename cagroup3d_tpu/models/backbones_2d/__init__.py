from .base_bev_backbone import BaseBEVBackbone
from .map_to_bev import HeightCompression, PointPillarScatter

__all__ = {
    "BaseBEVBackbone": BaseBEVBackbone,
    "HeightCompression": HeightCompression,
    "PointPillarScatter": PointPillarScatter,
}
