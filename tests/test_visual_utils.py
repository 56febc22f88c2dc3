"""Headless renderer writes a valid PNG; the open3d module degrades
with a clear error instead of crashing at import (reference
tools/visual_utils/: open3d/mayavi viewers)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_headless_draw_scenes(tmp_path):
    from visual_utils.headless_vis_utils import draw_scenes
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 4) * 5
    gt = np.array([[2.0, 1.0, 0.0, 4.0, 2.0, 1.5, 0.3]])
    det = np.array([[2.1, 1.0, 0.0, 4.1, 2.0, 1.5, 0.35],
                    [-3.0, 4.0, 0.0, 0.8, 0.8, 1.7, 0.0]])
    out = draw_scenes(pts, gt_boxes=gt, ref_boxes=det,
                      ref_labels=np.array([0, 1]),
                      ref_scores=np.array([0.9, 0.4]),
                      save_path=tmp_path / "scene.png", title="t")
    data = Path(out).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 10_000


def test_open3d_module_surface():
    from visual_utils import open3d_vis_utils as o3
    corners, lines = o3.translate_boxes_to_lineset(
        np.array([0, 0, 0, 4.0, 2.0, 1.5, 0.0]))
    assert corners.shape == (8, 3)
    assert lines.shape == (14, 2)
    np.testing.assert_allclose(np.abs(corners).max(0), [2.0, 1.0, 0.75])
    try:
        import open3d  # noqa: F401
        has_o3d = True
    except ImportError:
        has_o3d = False
    if not has_o3d:
        with pytest.raises(ImportError, match="headless"):
            o3.draw_scenes(np.zeros((4, 3)))
