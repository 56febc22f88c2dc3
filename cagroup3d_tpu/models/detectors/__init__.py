from .cagroup3d import CAGroup3D
from .rbgnet import RBGNet
from .second_net import PointPillar, SECONDNet
from .pv_rcnn import PVRCNN
from .centerpoint import CenterPoint
from .point_rcnn import PointRCNN
from .voxel_rcnn import VoxelRCNN
from .parta2_net import PartA2Net
from .second_net_iou import SECONDNetIoU
from .pv_rcnn_plusplus import PVRCNNPlusPlus
from .caddn import CaDDN

__all__ = {
    "CAGroup3D": CAGroup3D,
    "RBGNet": RBGNet,
    "SECONDNet": SECONDNet,
    "PointPillar": PointPillar,
    "PVRCNN": PVRCNN,
    "CenterPoint": CenterPoint,
    "PointRCNN": PointRCNN,
    "VoxelRCNN": VoxelRCNN,
    "PartA2Net": PartA2Net,
    "SECONDNetIoU": SECONDNetIoU,
    "PVRCNNPlusPlus": PVRCNNPlusPlus,
    "CaDDN": CaDDN,
}


def build_detector(model_cfg, num_class, dataset):
    return __all__[model_cfg.NAME](model_cfg=model_cfg, num_class=num_class,
                                   dataset=dataset)
