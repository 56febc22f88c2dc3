from .anchor_head import AnchorHeadSingle
from .anchor_head_multi import AnchorHeadMulti
from .cagroup_head import CAGroup3DHead
from .rbg_head import RBGHead
from .point_head_simple import PointHeadSimple
from .center_head import CenterHead
from .point_head_box import PointHeadBox
from .point_intra_part_head import PointIntraPartOffsetHead

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
    "AnchorHeadMulti": AnchorHeadMulti,
    "CAGroup3DHead": CAGroup3DHead,
    "RBGHead": RBGHead,
    "PointHeadSimple": PointHeadSimple,
    "CenterHead": CenterHead,
    "PointHeadBox": PointHeadBox,
    "PointIntraPartOffsetHead": PointIntraPartOffsetHead,
}
