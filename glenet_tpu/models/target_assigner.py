"""Anchor-to-gt target assignment, fully vectorized JAX (per sample; vmap
over the batch).

Matching semantics follow the reference AxisAlignedTargetAssigner /
WeightedAxisAlignedTargetAssigner (identical matching; the weighted variant
additionally carries per-anchor (7,) gt label-uncertainty,
pcdet/models/dense_heads/target_assigner/weighted_axis_aligned_target_assigner.py:137-222):
  per class, with that class's anchor subset:
    - IoU = nearest-BEV IoU (or 3D IoU if match_height)
    - anchors with IoU >= matched_threshold -> positive (argmax gt)
    - force-match: for every gt with nonzero best overlap, its best anchor(s)
      are positive even below threshold
    - anchors with IoU < unmatched_threshold -> background (0); the rest -1
      (ignored)
    - box targets encode the argmax gt against the anchor
    - label uncertainty: positives take the matched gt's (7,) variance;
      background anchors keep 0.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import iou3d
from ..utils import box_utils, common


class TargetDict(NamedTuple):
    box_cls_labels: jnp.ndarray    # (num_anchors,) int32: -1 ignore, 0 bg, else class id
    box_reg_targets: jnp.ndarray   # (num_anchors, code_size)
    reg_weights: jnp.ndarray       # (num_anchors,) pos-normalized in head
    label_uncertainty: jnp.ndarray  # (num_anchors, 7)


def assign_targets_single_class(anchors, gt_boxes, gt_valid, gt_unc,
                                class_id, matched_thr, unmatched_thr,
                                box_coder, match_height=False):
    """One class's anchors vs that class's (masked) gt boxes.

    Args:
        anchors: (Na, 7); gt_boxes: (M, 7); gt_valid: (M,) bool (True only
        for gts of this class); gt_unc: (M, 7).
    """
    na = anchors.shape[0]
    if match_height:
        iou = iou3d.boxes_iou3d(anchors, gt_boxes)
    else:
        iou = box_utils.boxes3d_nearest_bev_iou(anchors, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)              # (Na, M)

    anchor_to_gt_max = iou.max(axis=1)
    anchor_to_gt_argmax = iou.argmax(axis=1)

    gt_to_anchor_max = iou.max(axis=0)                         # (M,)
    # gts with zero best overlap are not force-matched (reference :160-161)
    force_eligible = gt_valid & (gt_to_anchor_max > 0)
    force_mat = (iou == gt_to_anchor_max[None, :]) & force_eligible[None, :]
    anchor_forced = force_mat.any(axis=1)                      # (Na,)
    forced_gt = force_mat.argmax(axis=1)                       # first match

    positive = anchor_to_gt_max >= matched_thr
    background = anchor_to_gt_max < unmatched_thr

    labels = jnp.full((na,), -1, jnp.int32)
    labels = jnp.where(background, 0, labels)
    labels = jnp.where(anchor_forced | positive, class_id, labels)

    # effective gt for box targets is always the argmax gt (reference :204)
    fg = positive | anchor_forced
    tgt_gt = gt_boxes[anchor_to_gt_argmax]
    enc = box_coder.encode(tgt_gt, anchors)
    box_targets = jnp.where(fg[:, None], enc, 0.0)

    # label uncertainty: forced anchors from the forcing gt, positives from
    # the argmax gt (positives override, reference :167-173)
    unc = jnp.zeros((na, 7), gt_unc.dtype)
    unc = jnp.where(anchor_forced[:, None], gt_unc[forced_gt], unc)
    unc = jnp.where(positive[:, None], gt_unc[anchor_to_gt_argmax], unc)
    return labels, box_targets, unc


def assign_targets(anchor_set, gt_boxes_with_cls, gt_mask, gt_uncertainty,
                   box_coder, match_height=False):
    """Per-sample assignment over all classes.

    Args:
        anchor_set: anchors.AnchorSet (static)
        gt_boxes_with_cls: (M, 8) — 7 box dims + class id (1-based float)
        gt_mask: (M,) bool
        gt_uncertainty: (M, 7) per-gt label variance (or ones)
    Returns TargetDict with flat (num_anchors,) leading dim.
    """
    h, w = anchor_set.feature_map_size
    gt_boxes = gt_boxes_with_cls[:, :7]
    gt_cls = gt_boxes_with_cls[:, 7].astype(jnp.int32)

    labels_per_class, targets_per_class, unc_per_class = [], [], []
    anchors_hw = jnp.asarray(anchor_set.anchors)               # (H, W, A, 7)
    for ci, name in enumerate(anchor_set.class_names):
        sl = anchor_set.class_slices[ci]
        anchors_c = anchors_hw[:, :, sl].reshape(-1, 7)
        valid_c = gt_mask & (gt_cls == ci + 1)
        labels, box_t, unc = assign_targets_single_class(
            anchors_c, gt_boxes, valid_c, gt_uncertainty,
            class_id=ci + 1,
            matched_thr=anchor_set.matched_thresholds[name],
            unmatched_thr=anchor_set.unmatched_thresholds[name],
            box_coder=box_coder, match_height=match_height)
        a_c = sl.stop - sl.start
        labels_per_class.append(labels.reshape(h, w, a_c))
        targets_per_class.append(box_t.reshape(h, w, a_c, -1))
        unc_per_class.append(unc.reshape(h, w, a_c, 7))

    labels = jnp.concatenate(labels_per_class, axis=2).reshape(-1)
    box_targets = jnp.concatenate(targets_per_class, axis=2)
    box_targets = box_targets.reshape(-1, box_targets.shape[-1])
    unc = jnp.concatenate(unc_per_class, axis=2).reshape(-1, 7)

    return TargetDict(
        box_cls_labels=labels,
        box_reg_targets=box_targets,
        reg_weights=(labels > 0).astype(jnp.float32),
        label_uncertainty=unc,
    )


def atss_assign_targets(anchor_set, gt_boxes_with_cls, gt_mask,
                        gt_uncertainty, box_coder, topk: int = 9,
                        match_height: bool = False):
    """ATSS adaptive assignment (reference atss_target_assigner.py:7-141).

    Per gt: the `topk` center-closest anchors are candidates; the adaptive
    IoU threshold is mean + std (unbiased) of candidate IoUs; positives are
    candidates above it whose center lies inside the gt's BEV rectangle.
    Each anchor takes its max-IoU positive gt; every gt's globally best
    anchor is force-matched (later gts win ties, matching torch scatter
    semantics).  Returns TargetDict over the full flat anchor set.
    """
    _BIG = 1e9
    anchors = jnp.asarray(anchor_set.flat_anchors, jnp.float32)   # (N, 7)
    n = anchors.shape[0]
    gt_boxes = gt_boxes_with_cls[:, :7]
    gt_cls = gt_boxes_with_cls[:, 7].astype(jnp.int32)
    m = gt_boxes.shape[0]

    if match_height:
        iou = iou3d.boxes_iou3d(anchors, gt_boxes)                # (N, M)
    else:
        iou = iou3d.boxes_iou_bev_blocked(anchors, gt_boxes)
    iou = jnp.where(gt_mask[None, :], iou, 0.0)

    dist = jnp.linalg.norm(anchors[None, :, 0:3] - gt_boxes[:, None, 0:3],
                           axis=-1)                               # (M, N)
    k = min(topk, n)
    _, topk_idxs = jax.lax.top_k(-dist, k)                        # (M, K)
    cand_ious = jnp.take_along_axis(iou.T, topk_idxs, axis=1)     # (M, K)
    mean = cand_ious.mean(axis=1)
    std = jnp.sqrt(jnp.clip(
        ((cand_ious - mean[:, None]) ** 2).sum(axis=1) / max(k - 1, 1),
        0.0, None))
    thresh = mean + std + 1e-6
    is_pos = cand_ious >= thresh[:, None]                         # (M, K)

    # candidate anchor center inside the gt BEV rect (reference's exact
    # 'bugfixed' lw ordering, atss_target_assigner.py:108-112)
    cand_xyz = anchors[topk_idxs][..., 0:3]                       # (M, K, 3)
    local = common.rotate_points_along_z(
        cand_xyz - gt_boxes[:, None, 0:3], -gt_boxes[:, 6])
    xy_local = local[..., 0:2]
    lw = gt_boxes[:, None, 3:5][..., ::-1]                        # (M, 1, 2)
    is_in = ((xy_local <= lw / 2) & (xy_local >= -lw / 2)).all(-1)
    is_pos = is_pos & is_in & gt_mask[:, None]

    # anchor -> best positive gt
    pos_nm = jnp.zeros((n, m), bool)
    cols = jnp.broadcast_to(jnp.arange(m)[:, None], (m, k))
    pos_nm = pos_nm.at[topk_idxs.reshape(-1), cols.reshape(-1)].max(
        is_pos.reshape(-1))
    iou_inf = jnp.where(pos_nm, iou, -_BIG)
    best_val = iou_inf.max(axis=1)
    best_gt = iou_inf.argmax(axis=1)

    # force-match every valid gt's globally best anchor
    for mi in range(m):
        a_star = jnp.argmax(iou[:, mi])
        ok = gt_mask[mi]
        best_gt = best_gt.at[a_star].set(
            jnp.where(ok, mi, best_gt[a_star]))
        best_val = best_val.at[a_star].set(
            jnp.where(ok, iou[a_star, mi], best_val[a_star]))

    matched = best_val > -_BIG / 2
    labels = jnp.where(matched & gt_mask[best_gt], gt_cls[best_gt], 0)
    targets = box_coder.encode(gt_boxes[best_gt], anchors)
    pos = labels > 0
    targets = jnp.where(pos[:, None], targets, 0.0)
    unc = jnp.where(pos[:, None], gt_uncertainty[best_gt], 1.0)
    return TargetDict(
        box_cls_labels=labels.astype(jnp.int32),
        box_reg_targets=targets,
        reg_weights=pos.astype(jnp.float32),
        label_uncertainty=unc,
    )
