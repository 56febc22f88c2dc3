"""Every shipped model yaml builds a network (config <-> implementation
key-surface parity; reference configs under tools/cfgs are the public
model zoo surface, pcdet tools/cfgs/*)."""
import glob
import os

import pytest

from cagroup3d_tpu.config import EasyDict, cfg_from_yaml_file
from cagroup3d_tpu.models import build_network

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(REPO, "tools/cfgs/*_models/*.yaml")))


class _DatasetStub:
    """What detectors read off the dataset at build time."""

    def __init__(self, data_cfg):
        self.dataset_cfg = data_cfg
        self.point_cloud_range = data_cfg.get("POINT_CLOUD_RANGE")
        self.class_names = None


@pytest.mark.parametrize(
    "yaml_path", YAMLS, ids=[os.path.basename(p) for p in YAMLS])
def test_config_builds(yaml_path):
    cfg = EasyDict()
    cfg_from_yaml_file(yaml_path, cfg)
    assert cfg.CLASS_NAMES and cfg.MODEL.get("NAME")
    ds = _DatasetStub(cfg.DATA_CONFIG)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset=ds)
    assert model is not None
    # every detector exposes the template surface the harness relies on
    for attr in ("forward_train", "forward_eval", "init"):
        assert callable(getattr(model, attr)), attr
