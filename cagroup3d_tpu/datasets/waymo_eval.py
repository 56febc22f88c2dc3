"""Waymo Open Dataset detection metrics, computed natively.

The reference (pcdet/datasets/waymo/waymo_eval.py:1-246) shells out to
the `waymo_open_dataset` TensorFlow metric ops with the config

    breakdown: OBJECT_TYPE, difficulties {levels: 1, 2}
    iou_thresholds: [0.0(unknown), 0.7(Vehicle), 0.5(Pedestrian),
                     0.5(Sign/Truck), 0.5(Cyclist)], box TYPE_3D

Neither TF nor the WOD pip package is a sane dependency for a TPU/JAX
framework, so this module re-implements the protocol in numpy on top of
the engine's exact rotated-BEV x z-extent 3D IoU (indoor_eval.
d3_box_overlap):

* GT difficulty: labels with difficulty 0 are promoted to LEVEL_1 when
  num_points_in_gt > 5 and LEVEL_2 otherwise (waymo_eval.py:44-47);
  boxes with no lidar points are dropped (:48).
* LEVEL_1 AP counts only L1 ground truths; detections matched to an
  L2-only box are *ignored* (neither TP nor FP).  LEVEL_2 counts all.
* Matching is greedy in descending score order per frame (the reference
  config requests Hungarian; for the one-threshold single-class-at-a-
  time case greedy-by-score differs only on pathological ties).
* AP integrates the exact precision envelope over recall (the TF code
  samples 101 score cutoffs; exact integration is the cutoff->inf
  limit).
* APH weights every true positive by its heading accuracy
  h = max(0, 1 - |wrap(theta_dt - theta_gt)| / pi) in both the
  precision numerator and the recall numerator (Waymo's definition).

Heading is canonicalised with limit_period(period=2*pi)
(waymo_eval.py:82) before the difference.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from .indoor_eval import d3_box_overlap

# class -> 3D IoU threshold (waymo_eval.py:95-100)
IOU_THRESHOLDS = {
    "Vehicle": 0.7, "Car": 0.7, "Truck": 0.5,
    "Pedestrian": 0.5, "Cyclist": 0.5, "Sign": 0.5,
}


def limit_period(val, offset=0.5, period=np.pi):
    return val - np.floor(val / period + offset) * period


def _heading_accuracy(dt_yaw, gt_yaw):
    d = np.abs(limit_period(dt_yaw - gt_yaw, 0.5, 2 * np.pi))
    d = np.minimum(d, 2 * np.pi - d)
    return np.maximum(0.0, 1.0 - d / np.pi)


def _ap_from_matches(scores, tp_w, ignored, n_gt):
    """Exact-envelope AP over (score, weight) matches.

    scores: detection scores; tp_w: TP weight per det (0 for FP, 1 for
    an unweighted TP, heading accuracy for APH); ignored: dets to drop
    from the ranking entirely.
    """
    if n_gt == 0:
        return 0.0
    keep = ~ignored
    scores, tp_w = scores[keep], tp_w[keep]
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="stable")
    tp_w = tp_w[order]
    tp_cum = np.cumsum(tp_w)
    n_det = np.arange(1, len(tp_w) + 1)
    recall = tp_cum / n_gt
    precision = tp_cum / n_det
    # precision envelope, integrate over recall deltas
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    r_prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - r_prev) * precision))


def _match_frame(dt_boxes, dt_scores, gt_boxes, thr):
    """Greedy score-ordered matching.  Returns per-det matched gt index
    (-1 = unmatched)."""
    n_dt, n_gt = len(dt_boxes), len(gt_boxes)
    assign = np.full(n_dt, -1, np.int64)
    if n_dt == 0 or n_gt == 0:
        return assign
    iou = d3_box_overlap(dt_boxes[:, :7], gt_boxes[:, :7])
    taken = np.zeros(n_gt, bool)
    for i in np.argsort(-dt_scores, kind="stable"):
        row = np.where(taken, -1.0, iou[i])
        j = int(np.argmax(row))
        if row[j] >= thr:
            assign[i] = j
            taken[j] = True
    return assign


def waymo_evaluation(det_annos: List[Dict], gt_annos: List[Dict],
                     class_names: Sequence[str],
                     distance_thresh: float = 1000.0):
    """det_annos[i]: name/score/boxes_lidar for frame i; gt_annos[i]:
    name/difficulty/num_points_in_gt/gt_boxes_lidar.  Returns
    (ap_dict, result_str) with the reference's key layout
    `OBJECT_TYPE_TYPE_<CLS>_LEVEL_<L>/AP(H)`."""
    assert len(det_annos) == len(gt_annos), \
        f"{len(det_annos)} vs {len(gt_annos)}"
    per_cls = {n: dict(scores=[], tp=[], tph=[], ign=[],
                       n_gt=[0, 0]) for n in class_names}

    for det, gt in zip(det_annos, gt_annos):
        g_boxes = np.asarray(gt.get("gt_boxes_lidar",
                                    np.zeros((0, 7))), np.float32)
        g_names = np.asarray(gt.get("name", np.zeros(0, "<U16")))
        g_diff = np.asarray(gt.get("difficulty",
                                   np.zeros(len(g_boxes))), np.int64)
        g_npts = np.asarray(gt.get("num_points_in_gt",
                                   np.full(len(g_boxes), 100)), np.int64)
        # difficulty promotion + empty-box drop (waymo_eval.py:44-48)
        g_diff = np.where(g_diff == 0,
                          np.where(g_npts > 5, 1, 2), g_diff)
        keep = (g_npts > 0) & (np.linalg.norm(g_boxes[:, :2], axis=1)
                               < distance_thresh + 0.5)
        g_boxes, g_names, g_diff = g_boxes[keep], g_names[keep], \
            g_diff[keep]

        d_boxes = np.asarray(det.get("boxes_lidar",
                                     np.zeros((0, 7))), np.float32)
        d_names = np.asarray(det.get("name", np.zeros(0, "<U16")))
        d_scores = np.asarray(det.get("score", np.zeros(0)), np.float32)
        keep = np.linalg.norm(d_boxes[:, :2], axis=1) \
            < distance_thresh + 0.5 if len(d_boxes) else \
            np.zeros(0, bool)
        d_boxes, d_names, d_scores = d_boxes[keep], d_names[keep], \
            d_scores[keep]

        for cls in class_names:
            thr = IOU_THRESHOLDS.get(cls, 0.5)
            gm = g_names == cls
            dm = d_names == cls
            gb, gd = g_boxes[gm], g_diff[gm]
            db, ds = d_boxes[dm], d_scores[dm]
            acc = per_cls[cls]
            acc["n_gt"][0] += int((gd == 1).sum())
            acc["n_gt"][1] += len(gb)
            if len(db) == 0:
                continue
            assign = _match_frame(db, ds, gb, thr)
            matched = assign >= 0
            h = np.zeros(len(db), np.float32)
            lvl = np.zeros(len(db), np.int64)
            if matched.any():
                mi = np.flatnonzero(matched)
                h[mi] = _heading_accuracy(db[mi, 6], gb[assign[mi], 6])
                lvl[mi] = gd[assign[mi]]
            acc["scores"].append(ds)
            acc["tp"].append(matched.astype(np.float32))
            acc["tph"].append(h * matched)
            acc["ign"].append(lvl)          # 0 FP, 1 L1 TP, 2 L2 TP

    ap_dict, lines = {}, []
    for cls in class_names:
        acc = per_cls[cls]
        if acc["scores"]:
            scores = np.concatenate(acc["scores"])
            tp = np.concatenate(acc["tp"])
            tph = np.concatenate(acc["tph"])
            lvl = np.concatenate(acc["ign"])
        else:
            scores = tp = tph = np.zeros(0, np.float32)
            lvl = np.zeros(0, np.int64)
        for level in (1, 2):
            if level == 1:
                ignored = lvl == 2          # matched an L2-only gt
                tp_l, tph_l = tp * (lvl == 1), tph * (lvl == 1)
                n_gt = acc["n_gt"][0]
            else:
                ignored = np.zeros(len(scores), bool)
                tp_l, tph_l = tp, tph
                n_gt = acc["n_gt"][1]
            ap = _ap_from_matches(scores, tp_l, ignored, n_gt)
            aph = _ap_from_matches(scores, tph_l, ignored, n_gt)
            key = f"OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}"
            ap_dict[key + "/AP"] = ap
            ap_dict[key + "/APH"] = aph
            lines.append(f"{key}: AP {ap:.4f} APH {aph:.4f} "
                         f"(n_gt {n_gt})")
    return ap_dict, "\n".join(lines)
