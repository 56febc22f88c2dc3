"""Eval harness (rebuild of tools/eval_utils/eval_utils.py):
run the jitted eval forward over the val loader, unpad predictions,
generate prediction dicts, run the dataset's indoor mAP evaluation."""
from __future__ import annotations

import pickle
import time
from pathlib import Path
from typing import Dict, List

import numpy as np
import jax.numpy as jnp


def statistics_info(recall_dict, pred_boxes, gt_boxes,
                    thresh_list=(0.25, 0.5)):
    """Accumulate recall counters (reference eval_utils.py:12-19 /
    detector3d_template.generate_recall_record): a GT box is recalled at
    threshold t if some prediction overlaps it with 3D IoU > t."""
    from ..datasets.indoor_eval import d3_box_overlap

    if not recall_dict:
        recall_dict = {"gt": 0}
        for t in thresh_list:
            recall_dict[f"rcnn_{t}"] = 0
    n_gt = len(gt_boxes)
    recall_dict["gt"] += n_gt
    if n_gt == 0:
        return recall_dict
    if len(pred_boxes) == 0:
        return recall_dict
    iou = d3_box_overlap(np.asarray(pred_boxes[:, :7]),
                         np.asarray(gt_boxes[:, :7]))
    best = iou.max(axis=0)
    for t in thresh_list:
        recall_dict[f"rcnn_{t}"] += int((best > t).sum())
    return recall_dict


def eval_one_epoch(model, eval_step, params, state, dataset, loader,
                   epoch_id, logger, result_dir: Path = None,
                   class_names=None, dist: bool = False):
    """When ``dist`` and the loader is rank-sharded, per-rank det_annos are
    merged across processes (reference eval_utils.py:75-78 +
    common_utils.merge_results_dist) and only rank 0 evaluates."""
    from ..utils import commu_utils

    class_names = class_names or dataset.class_names
    det_annos: List[Dict] = []
    total_time = 0.0
    n_scenes = 0
    recall_dict: Dict = {}
    for batch_np in loader:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if k in ("points", "points_valid")}
        t0 = time.time()
        preds = eval_step(params, state, batch, jnp.float32(epoch_id))
        overflow = preds.pop("overflow", None)
        if overflow is not None and int(np.sum(np.asarray(overflow))) > 0:
            logger.warning(
                f"capacity overflow: {int(np.sum(np.asarray(overflow)))} "
                f"voxels dropped this batch — raise the capacity knobs "
                f"(INPUT_CAP/FINE_CAP/CAPS, see tools/tune_caps.py)")
        boxes = np.asarray(preds["pred_boxes"])
        total_time += time.time() - t0
        scores = np.asarray(preds["pred_scores"])
        labels = np.asarray(preds["pred_labels"])
        valid = np.asarray(preds["pred_valid"])
        B = boxes.shape[0]
        n_scenes += B
        pred_dicts = []
        for b in range(B):
            v = valid[b]
            pred_dicts.append(dict(pred_boxes=boxes[b][v],
                                   pred_scores=scores[b][v],
                                   pred_labels=labels[b][v]))
            if "gt_boxes" in batch_np:
                gt = batch_np["gt_boxes"][b][batch_np["gt_valid"][b]]
                recall_dict = statistics_info(recall_dict, boxes[b][v], gt)
        det_annos += dataset.generate_prediction_dicts(
            batch_np, pred_dicts, class_names)
    if dist:
        det_annos = commu_utils.merge_results_dist(
            det_annos, total_size=len(dataset))
        recall_dict = {k: int(v) for k, v in commu_utils.reduce_dict(
            recall_dict, average=False).items()} if recall_dict else {}
        if commu_utils.get_rank() != 0:
            return {}
    logger.info(f"eval: {n_scenes} scenes, "
                f"{total_time / max(n_scenes, 1) * 1e3:.1f} ms/scene "
                f"(incl. host transfer)")
    if recall_dict.get("gt", 0) > 0:
        for k, v in recall_dict.items():
            if k != "gt":
                logger.info(f"recall_{k}: {v / recall_dict['gt']:.4f}")
    if result_dir is not None:
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / "result.pkl", "wb") as f:
            pickle.dump(det_annos, f)
    ret_dict, result_str = dataset.evaluation(det_annos, class_names)
    if isinstance(result_str, str) and result_str:
        for line in result_str.strip().splitlines():
            logger.info(line)
    for k, v in sorted(ret_dict.items()):
        logger.info(f"{k}: {float(v):.4f}")
    return ret_dict
