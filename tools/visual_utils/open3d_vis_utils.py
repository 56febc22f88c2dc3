"""Interactive open3d viewer (reference tools/visual_utils/
open3d_vis_utils.py:1-116, rebuilt numpy-first: corners come from
cagroup3d_tpu.utils.box_utils, no torch).  open3d is an optional
dependency — TPU pods are headless, so the importable default is
tools.visual_utils.headless_vis_utils; this module raises a clear
error at call time when open3d is missing."""
import numpy as np

from cagroup3d_tpu.utils.box_utils import boxes_to_corners_3d

box_colormap = [
    [1, 1, 1],
    [0, 1, 0],
    [0, 1, 1],
    [1, 1, 0],
]

# the 12 edges + the two face crosses the reference adds (:95-99)
BOX_LINES = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 0],
     [4, 5], [5, 6], [6, 7], [7, 4],
     [0, 4], [1, 5], [2, 6], [3, 7],
     [0, 5], [1, 4]], np.int64)


def _require_open3d():
    try:
        import open3d
        return open3d
    except ImportError as e:     # pragma: no cover - env has no open3d
        raise ImportError(
            "open3d is not installed on this host; use "
            "tools.visual_utils.headless_vis_utils.draw_scenes(..., "
            "save_path=...) for a headless PNG render, or pip install "
            "open3d on a workstation") from e


def get_coor_colors(obj_labels):
    """1 = ground, >1 = instance clusters -> rgb [N, 3]."""
    import matplotlib
    colors = list(matplotlib.colors.XKCD_COLORS.values())
    color_list = colors[:int(obj_labels.max()) + 1]
    rgba = np.array([matplotlib.colors.to_rgba_array(c)
                     for c in color_list])
    return rgba[obj_labels].squeeze()[:, :3]


def translate_boxes_to_lineset(box7):
    """[7] box -> (corners [8, 3], lines [14, 2])."""
    corners = boxes_to_corners_3d(np.asarray(box7, np.float32)[None])[0]
    return corners, BOX_LINES


def draw_box(vis, boxes, color=(0, 1, 0), ref_labels=None, score=None):
    open3d = _require_open3d()
    for i in range(boxes.shape[0]):
        corners, lines = translate_boxes_to_lineset(boxes[i])
        ls = open3d.geometry.LineSet()
        ls.points = open3d.utility.Vector3dVector(corners)
        ls.lines = open3d.utility.Vector2iVector(lines)
        if ref_labels is None:
            ls.paint_uniform_color(color)
        else:
            ls.paint_uniform_color(
                box_colormap[int(ref_labels[i]) % len(box_colormap)])
        vis.add_geometry(ls)
    return vis


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True):
    open3d = _require_open3d()
    points = np.asarray(points)
    vis = open3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)
    if draw_origin:
        vis.add_geometry(
            open3d.geometry.TriangleMesh.create_coordinate_frame(
                size=1.0, origin=[0, 0, 0]))
    pts = open3d.geometry.PointCloud()
    pts.points = open3d.utility.Vector3dVector(points[:, :3])
    pts.colors = open3d.utility.Vector3dVector(
        np.ones((points.shape[0], 3)) if point_colors is None
        else point_colors)
    vis.add_geometry(pts)
    if gt_boxes is not None:
        vis = draw_box(vis, np.asarray(gt_boxes), (0, 0, 1))
    if ref_boxes is not None:
        vis = draw_box(vis, np.asarray(ref_boxes), (0, 1, 0),
                       ref_labels, ref_scores)
    vis.run()
    vis.destroy_window()
