from .anchor_head import AnchorHeadSingle
from .cagroup_head import CAGroup3DHead
from .rbg_head import RBGHead

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "CAGroup3DHead": CAGroup3DHead,
    "RBGHead": RBGHead,
}
