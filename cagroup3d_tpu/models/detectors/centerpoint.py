"""CenterPoint detector (reference pcdet/models/detectors/
centerpoint.py:1-51): SECOND's voxel pipeline with the CenterHead —
the dense head's forward/loss/decode contracts match SECONDNet's, so
the whole detector is the shared per-scene vmapped pipeline."""
from __future__ import annotations

from .second_net import SECONDNet


class CenterPoint(SECONDNet):
    pass
