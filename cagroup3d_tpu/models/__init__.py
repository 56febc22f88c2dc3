"""Model registry + build_network (pcdet public surface,
reference pcdet/models/__init__.py)."""
from .detectors import build_detector


def build_network(model_cfg, num_class, dataset=None):
    return build_detector(model_cfg=model_cfg, num_class=num_class,
                          dataset=dataset)
