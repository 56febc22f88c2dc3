"""RoI sampling for second-stage training.

Static-shape rebuild of
pcdet/models/roi_heads/target_assigner/cagroup_proposal_target_layer.py:
per scene, proposals are IoU-matched to same-class GT
(get_max_iou_with_same_class via boxes_iou3d_gpu), then ROI_PER_IMAGE=128
rois are sampled: up to fg_ratio*128 foreground (IoU>=0.3, random
permutation), the rest background split 80/20 hard (0.1<=IoU<0.3) / easy
(<0.1) with replacement.  Sampling runs on-device with jax PRNG;
data-dependent counts are handled by slot masks instead of boolean
indexing.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ....core.geometry import iou3d_rotated, pairwise


def _rand_perm_order(rng, mask):
    """Indices ordered: rows with mask first (random order), rest after."""
    r = jax.random.uniform(rng, mask.shape)
    key = jnp.where(mask, r, r + 2.0)
    return jnp.argsort(key)


class ProposalTargetLayer:
    def __init__(self, roi_per_image=128, fg_ratio=0.5, reg_fg_thresh=0.3,
                 cls_fg_thresh=0.55, cls_bg_thresh=0.15, cls_bg_thresh_l0=0.1,
                 hard_bg_ratio=0.8):
        self.roi_per_image = roi_per_image
        self.fg_ratio = fg_ratio
        self.reg_fg_thresh = reg_fg_thresh
        self.cls_fg_thresh = cls_fg_thresh
        self.cls_bg_thresh = cls_bg_thresh
        self.cls_bg_thresh_l0 = cls_bg_thresh_l0
        self.hard_bg_ratio = hard_bg_ratio

    def max_iou_with_same_class(self, rois, roi_labels, roi_valid, gt_boxes,
                                gt_labels, gt_valid):
        iou = pairwise(iou3d_rotated, rois[:, :7], gt_boxes[:, :7])
        same = roi_labels[:, None] == gt_labels[None, :]
        iou = jnp.where(same & gt_valid[None, :] & roi_valid[:, None], iou,
                        -1.0)
        max_ov = jnp.maximum(jnp.max(iou, axis=1), 0.0)
        asg = jnp.argmax(iou, axis=1)
        return max_ov, asg

    def sample(self, rng, max_overlaps, roi_valid):
        """Returns i32[roi_per_image] sampled indices (reference
        subsample_rois, cagroup_proposal_target_layer.py:127-172)."""
        n_roi = self.roi_per_image
        fg_thresh = min(self.reg_fg_thresh, self.cls_fg_thresh)
        fg_mask = (max_overlaps >= fg_thresh) & roi_valid
        easy_mask = (max_overlaps < self.cls_bg_thresh_l0) & roi_valid
        hard_mask = ((max_overlaps < self.reg_fg_thresh) &
                     (max_overlaps >= self.cls_bg_thresh_l0)) & roi_valid
        n_fg = jnp.sum(fg_mask)
        n_hard = jnp.sum(hard_mask)
        n_easy = jnp.sum(easy_mask)

        r1, r2, r3, r4 = jax.random.split(rng, 4)
        fg_sorted = _rand_perm_order(r1, fg_mask)
        hard_sorted = _rand_perm_order(r2, hard_mask)
        easy_sorted = _rand_perm_order(r3, easy_mask)

        fg_cap = int(round(self.fg_ratio * n_roi))
        has_bg = (n_hard + n_easy) > 0
        fg_take = jnp.where(has_bg, jnp.minimum(fg_cap, n_fg), n_roi)
        fg_take = jnp.minimum(fg_take, jnp.maximum(n_fg, 0))

        slots = jnp.arange(n_roi)
        is_fg_slot = slots < fg_take

        n_bg = n_roi - fg_take
        hard_num = jnp.minimum(
            jnp.floor(n_bg * self.hard_bg_ratio).astype(jnp.int32), n_hard)
        hard_num = jnp.where(n_easy > 0, hard_num,
                             jnp.where(n_hard > 0, n_bg, 0))
        bg_slot = slots - fg_take
        is_hard_slot = bg_slot < hard_num

        rint = jax.random.randint(r4, (n_roi,), 0, 1 << 30)
        # fg with replacement when no bg exists; without otherwise
        fg_idx_norep = fg_sorted[jnp.clip(slots, 0, fg_sorted.shape[0] - 1)]
        fg_idx_rep = fg_sorted[rint % jnp.maximum(n_fg, 1)]
        fg_idx = jnp.where(n_fg >= fg_take, fg_idx_norep, fg_idx_rep)
        hard_idx = hard_sorted[rint % jnp.maximum(n_hard, 1)]
        easy_idx = easy_sorted[rint % jnp.maximum(n_easy, 1)]
        bg_idx = jnp.where(is_hard_slot & (n_hard > 0), hard_idx,
                           jnp.where(n_easy > 0, easy_idx, hard_idx))
        return jnp.where(is_fg_slot, fg_idx, bg_idx).astype(jnp.int32)

    def __call__(self, rng, rois, roi_scores, roi_labels, roi_valid,
                 gt_boxes, gt_labels, gt_valid,
                 flip_gt_heading: bool = True) -> Dict[str, jnp.ndarray]:
        """Per scene.  rois [R, 7] (pcdet heading); gt_boxes [G, 7] in
        mmdet3d heading for the CAGroup path (flipped here as in the
        reference, :97) or already-pcdet heading for the outdoor zoo
        (``flip_gt_heading=False``; pcdet proposal_target_layer.py:66)."""
        gt_pc = gt_boxes.at[:, 6].multiply(-1.0) if flip_gt_heading \
            else gt_boxes
        max_ov, asg = self.max_iou_with_same_class(
            rois, roi_labels, roi_valid, gt_pc, gt_labels, gt_valid)
        sel = self.sample(rng, max_ov, roi_valid)

        s_rois = rois[sel]
        s_ious = max_ov[sel]
        s_scores = roi_scores[sel]
        s_labels = roi_labels[sel]
        s_gt = gt_pc[asg[sel]]
        s_gt_label = gt_labels[asg[sel]]

        reg_valid = (s_ious > self.reg_fg_thresh).astype(jnp.int32)
        fgm = s_ious > self.cls_fg_thresh
        bgm = s_ious < self.cls_bg_thresh
        interval = (~fgm) & (~bgm)
        cls_labels = fgm.astype(jnp.float32)
        cls_labels = jnp.where(
            interval,
            (s_ious - self.cls_bg_thresh) /
            (self.cls_fg_thresh - self.cls_bg_thresh), cls_labels)
        return dict(rois=s_rois, gt_of_rois=s_gt, gt_label_of_rois=s_gt_label,
                    gt_iou_of_rois=s_ious, roi_scores=s_scores,
                    roi_labels=s_labels, reg_valid_mask=reg_valid,
                    rcnn_cls_labels=cls_labels)
