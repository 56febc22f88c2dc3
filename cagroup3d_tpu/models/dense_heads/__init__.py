from .cagroup_head import CAGroup3DHead
from .rbg_head import RBGHead

__all__ = {
    "CAGroup3DHead": CAGroup3DHead,
    "RBGHead": RBGHead,
}
