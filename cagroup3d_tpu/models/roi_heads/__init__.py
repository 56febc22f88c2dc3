from .cagroup_roi_head import CAGroup3DRoIHead
from .pvrcnn_head import PVRCNNHead
from .pointrcnn_head import PointRCNNHead
from .voxelrcnn_head import VoxelRCNNHead

__all__ = {
    "CAGroup3DRoIHead": CAGroup3DRoIHead,
    "PVRCNNHead": PVRCNNHead,
    "PointRCNNHead": PointRCNNHead,
    "VoxelRCNNHead": VoxelRCNNHead,
}
