from .biresnet import BiResNet
from .pointnet2_fbs_backbone import PointNet2FBSBackbone
from .spconv_backbone import VoxelBackBone8x, VoxelResBackBone8x
from .pointnet2_backbone import PointNet2MSG
from .spconv_unet import UNetV2

__all__ = {
    "BiResNet": BiResNet,
    "PointNet2_FBS_SSG": PointNet2FBSBackbone,
    "PointNet2FBSBackbone": PointNet2FBSBackbone,
    "VoxelBackBone8x": VoxelBackBone8x,
    "VoxelResBackBone8x": VoxelResBackBone8x,
    "PointNet2MSG": PointNet2MSG,
    "UNetV2": UNetV2,
}
