"""Native nuScenes detection metric (the official CVPR-2019 protocol).

The reference delegates evaluation to the external `nuscenes` devkit
(reference pcdet/datasets/nuscenes/nuscenes_dataset.py:198-252 builds a
results_nusc.json and runs nuscenes.eval.detection.evaluate.NuScenesEval;
nuscenes_utils.format_nuscene_results renders the table).  That devkit is
an external dependency, so this module re-implements the metric itself —
the same algorithm the devkit's algo.py/accumulate + calc_ap/calc_tp
define:

* matching by 2D (x, y) center distance, thresholds {0.5, 1, 2, 4} m,
  greedy over confidence-ranked predictions, one match per GT;
* per-class AP = normalized area of the 101-point interpolated
  precision/recall curve with min_recall = min_precision = 0.1;
  mAP = mean over classes and thresholds;
* TP metrics at the 2 m threshold, averaged over the recall range
  [0.1, max_recall]: ATE (center distance), ASE (1 - IoU of the
  translation/yaw-aligned boxes), AOE (yaw difference, period pi for
  barriers), AVE (velocity L2, when velocities are available);
* NDS = (5 * mAP + sum_tp (1 - min(1, tp))) / (5 + n_tp).

Divergence (documented): AAE (attribute error) needs per-box attribute
predictions, which no detector in this framework emits (the reference
fills attributes with per-class defaults when exporting json,
nuscenes_utils.py:223-251); it is excluded from the TP set, so NDS here
averages over the 4 available TP metrics.  Class-range filtering uses
the detection_cvpr_2019 ranges.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL = 101

# detection_cvpr_2019 class_range (m); classes absent here default 50.
CLASS_RANGE = {
    "car": 50, "truck": 50, "bus": 50, "trailer": 50,
    "construction_vehicle": 50, "pedestrian": 40, "motorcycle": 40,
    "bicycle": 40, "traffic_cone": 30, "barrier": 30,
}
# devkit: cones have no orientation, cones/barriers no velocity.
NO_ORIENT = {"traffic_cone"}
NO_VELOCITY = {"traffic_cone", "barrier"}


def _yaw_diff(a, b, period):
    d = (a - b) % period
    return np.minimum(d, period - d)


def _aligned_iou(dims_a, dims_b):
    """3D IoU after aligning translation and yaw: intersection of the
    per-axis min sizes over the union (devkit scale_iou)."""
    inter = np.prod(np.minimum(dims_a, dims_b), axis=-1)
    union = np.prod(dims_a, axis=-1) + np.prod(dims_b, axis=-1) - inter
    return inter / np.maximum(union, 1e-9)


def _cummean(x):
    if len(x) == 0:
        return x
    return np.cumsum(x) / (np.arange(len(x)) + 1)


def accumulate(gts: List[Dict], dets: List[Dict], class_name: str,
               dist_th: float):
    """One (class, distance-threshold) PR sweep over all scenes.

    gts/dets: per-scene dicts with 'boxes' [N, >=7] (x y z dx dy dz yaw
    [vx vy]), 'names' [N]; dets additionally 'scores' [N].  Returns the
    101-point metric-data dict (or None when the class has no GT).
    """
    rng = CLASS_RANGE.get(class_name, 50.0)
    npos = 0
    g_per_scene = []
    for g in gts:
        m = (np.asarray(g["names"]) == class_name)
        b = np.asarray(g["boxes"], np.float64)[m]
        if len(b):
            b = b[np.linalg.norm(b[:, :2], axis=1) <= rng]
        npos += len(b)
        g_per_scene.append(b)
    if npos == 0:
        return None

    rows = []                 # (score, scene, box)
    for si, d in enumerate(dets):
        m = (np.asarray(d["names"]) == class_name)
        b = np.asarray(d["boxes"], np.float64)[m]
        s = np.asarray(d["scores"], np.float64)[m]
        if len(b):
            keep = np.linalg.norm(b[:, :2], axis=1) <= rng
            b, s = b[keep], s[keep]
        for bi in range(len(b)):
            rows.append((s[bi], si, b[bi]))
    rows.sort(key=lambda r: -r[0])

    taken = [np.zeros(len(g), bool) for g in g_per_scene]
    tp, fp, conf = [], [], []
    err_t, err_s, err_o, err_v = [], [], [], []
    period = np.pi if class_name == "barrier" else 2 * np.pi
    for score, si, box in rows:
        g = g_per_scene[si]
        free = ~taken[si]
        best = -1
        if free.any():
            dist = np.linalg.norm(g[:, :2] - box[None, :2], axis=1)
            dist = np.where(free, dist, np.inf)
            j = int(np.argmin(dist))
            if dist[j] < dist_th:
                best = j
        conf.append(score)
        if best >= 0:
            taken[si][best] = True
            tp.append(1.0)
            fp.append(0.0)
            gt = g[best]
            err_t.append(float(np.linalg.norm(gt[:2] - box[:2])))
            err_s.append(1.0 - float(_aligned_iou(gt[3:6], box[3:6])))
            err_o.append(float(_yaw_diff(gt[6], box[6], period)))
            if gt.shape[0] >= 9 and box.shape[0] >= 9:
                err_v.append(float(np.linalg.norm(gt[7:9] - box[7:9])))
            else:
                err_v.append(np.nan)
        else:
            tp.append(0.0)
            fp.append(1.0)

    tp_c = np.cumsum(tp)
    fp_c = np.cumsum(fp)
    prec = tp_c / np.maximum(tp_c + fp_c, 1e-9)
    rec = tp_c / npos
    rec_i = np.linspace(0, 1, N_RECALL)
    out = dict(
        recall=rec_i,
        precision=np.interp(rec_i, rec, prec, right=0),
        confidence=np.interp(rec_i, rec, conf, right=0) if len(rec)
        else np.zeros(N_RECALL),
    )
    # TP-metric curves: cumulative mean over confidence-ranked TPs,
    # re-sampled onto the recall grid through the confidence curve
    # (devkit accumulate():117-133)
    conf_tp = np.asarray([c for c, t in zip(conf, tp) if t], np.float64)
    for key, arr in (("trans_err", err_t), ("scale_err", err_s),
                     ("orient_err", err_o), ("vel_err", err_v)):
        a = np.asarray(arr, np.float64)
        ok = ~np.isnan(a)
        if not ok.any():
            out[key] = np.full(N_RECALL, np.nan)
            continue
        cm = _cummean(a[ok])
        out[key] = np.interp(out["confidence"][::-1], conf_tp[ok][::-1],
                             cm[::-1])[::-1]
    return out


def calc_ap(md) -> float:
    """devkit calc_ap: drop recall < 0.1, clip precision at 0.1,
    renormalize."""
    prec = np.copy(md["precision"])[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def calc_tp(md, key: str) -> float:
    """devkit calc_tp: mean of the error curve over [0.1, max_recall]."""
    nz = np.nonzero(md["confidence"])[0]
    if len(nz) == 0:
        return 1.0
    first, last = round(100 * MIN_RECALL) + 1, nz[-1]
    if last < first:
        return 1.0
    seg = md[key][first:last + 1]
    if np.isnan(seg).all():
        return np.nan
    return float(np.nanmean(seg))


TP_KEYS = ("trans_err", "scale_err", "orient_err", "vel_err")
TP_NAMES = {"trans_err": "mATE", "scale_err": "mASE",
            "orient_err": "mAOE", "vel_err": "mAVE"}


def nuscenes_eval(gts: List[Dict], dets: List[Dict],
                  class_names: Sequence[str]):
    """Full protocol.  Returns (result_dict, result_str) in the shape of
    nuscenes_utils.format_nuscene_results."""
    ap: Dict[str, Dict[float, float]] = {}
    tp_err: Dict[str, Dict[str, float]] = {}
    for cls in class_names:
        ap[cls] = {}
        for th in DIST_THRESHOLDS:
            md = accumulate(gts, dets, cls, th)
            ap[cls][th] = calc_ap(md) if md is not None else np.nan
            if th == DIST_TH_TP and md is not None:
                # classes with no GT are skipped entirely (consistent
                # with the nan-skip on their AP above)
                errs = {}
                for key in TP_KEYS:
                    if (key == "orient_err" and cls in NO_ORIENT) or \
                       (key == "vel_err" and cls in NO_VELOCITY):
                        errs[key] = np.nan
                    else:
                        errs[key] = calc_tp(md, key)
                tp_err[cls] = errs

    result = {}
    cls_aps = []
    for cls in class_names:
        vals = [v for v in ap[cls].values() if not np.isnan(v)]
        if vals:
            cls_ap = float(np.mean(vals))
            cls_aps.append(cls_ap)
            result[f"mAP_{cls}"] = cls_ap
        for th, v in ap[cls].items():
            if not np.isnan(v):
                result[f"AP_{cls}_{th}"] = float(v)
    mean_ap = float(np.mean(cls_aps)) if cls_aps else 0.0

    tp_means = {}
    for key in TP_KEYS:
        vals = [tp_err[c][key] for c in tp_err
                if not np.isnan(tp_err[c][key])]
        if vals:
            tp_means[key] = float(np.mean(vals))
    nds_terms = [5.0 * mean_ap]
    for key in TP_KEYS:
        if key in tp_means:
            nds_terms.append(1.0 - min(1.0, tp_means[key]))
    nds = float(sum(nds_terms) / (5.0 + (len(nds_terms) - 1))) \
        if len(nds_terms) > 1 else mean_ap

    result["mAP"] = mean_ap
    result["NDS"] = nds
    for key, v in tp_means.items():
        result[TP_NAMES[key]] = v

    lines = [f"mAP: {mean_ap:.4f}", f"NDS: {nds:.4f}"]
    for key in TP_KEYS:
        if key in tp_means:
            lines.append(f"{TP_NAMES[key]}: {tp_means[key]:.4f}")
    lines.append("Per-class AP (mean over distance thresholds):")
    for cls in class_names:
        if f"mAP_{cls}" in result:
            lines.append(f"  {cls}: {result[f'mAP_{cls}']:.4f}")
    return result, "\n".join(lines)
