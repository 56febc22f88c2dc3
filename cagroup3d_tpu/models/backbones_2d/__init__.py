from .base_bev_backbone import BaseBEVBackbone
from .map_to_bev import (Conv2DCollapse, HeightCompression,
                         PointPillarScatter)

__all__ = {
    "BaseBEVBackbone": BaseBEVBackbone,
    "HeightCompression": HeightCompression,
    "PointPillarScatter": PointPillarScatter,
    "Conv2DCollapse": Conv2DCollapse,
}
