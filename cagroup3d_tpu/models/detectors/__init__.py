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
    cls = __all__[model_cfg.NAME]
    # "PartA2_free": the reference builds it through detector NAME
    # PointRCNN with a UNetV2 voxel backbone + PartA2FCHead (the generic
    # template skips the absent anchor-RPN slots); our per-detector
    # dataflows dispatch on the backbone here.
    if model_cfg.NAME == "PointRCNN" and \
            model_cfg.get("BACKBONE_3D", {}).get("NAME") == "UNetV2":
        from .parta2_free import PartA2FreeNet
        cls = PartA2FreeNet
    return cls(model_cfg=model_cfg, num_class=num_class, dataset=dataset)
