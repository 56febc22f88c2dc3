from .cagroup_roi_head import CAGroup3DRoIHead
from .pvrcnn_head import PVRCNNHead
from .pointrcnn_head import PointRCNNHead
from .voxelrcnn_head import VoxelRCNNHead
from .parta2_head import PartA2FCHead
from .second_head import SECONDHead

__all__ = {
    "CAGroup3DRoIHead": CAGroup3DRoIHead,
    "PVRCNNHead": PVRCNNHead,
    "PointRCNNHead": PointRCNNHead,
    "VoxelRCNNHead": VoxelRCNNHead,
    "PartA2FCHead": PartA2FCHead,
    "SECONDHead": SECONDHead,
}
