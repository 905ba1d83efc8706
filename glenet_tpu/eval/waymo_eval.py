"""Waymo detection metrics (mAP / mAPH, L1 / L2) — a numpy re-implementation
of the protocol the reference wraps via TF `detection_metrics`
(pcdet/datasets/waymo/waymo_eval.py:23-178, config :89-112):

  - 3D IoU matching, per-class thresholds Vehicle 0.7 / Pedestrian 0.5 /
    Truck 0.5 / Cyclist 0.5;
  - gt difficulty: annotator level, else 2 if num_points_in_gt <= 5 else 1
    (:44-47); zero-point gts dropped;
  - LEVEL_1 scores only difficulty-1 gts (difficulty-2 gts are ignore
    regions: detections matching them are neither TP nor FP); LEVEL_2
    scores all gts;
  - PR curve over 101 score cutoffs, precision made monotone, AP = area
    under PR; mAPH weights every true positive by its heading accuracy
    (1 - |wrapped heading error| / pi).

Divergence from the official package (documented): matching is greedy by
detection score instead of Hungarian.  With one-to-one matching at a fixed
IoU threshold the two differ only in rare multi-overlap ties; the official
tool needs TF + the waymo-open-dataset wheel, neither of which is
installable in this environment.

The reference feeds frame-indexed flat arrays; here annos follow our
dataset convention: per-frame dicts with 'name', 'boxes_lidar'
((N, 7) center boxes), 'score' (det only), optional 'num_points_in_gt' /
'difficulty' (gt only).
"""
from __future__ import annotations

import numpy as np

CLASS_IOU = {'Vehicle': 0.7, 'Pedestrian': 0.5, 'Truck': 0.5,
             'Cyclist': 0.5}
N_CUTOFFS = 101


def _iou3d(boxes_a, boxes_b):
    import jax.numpy as jnp
    from ..ops import iou3d
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)))
    return np.asarray(iou3d.boxes_iou3d(
        jnp.asarray(boxes_a, jnp.float32), jnp.asarray(boxes_b, jnp.float32)))


def _heading_accuracy(dh):
    dh = np.abs((dh + np.pi) % (2 * np.pi) - np.pi)
    return np.clip(1.0 - dh / np.pi, 0.0, 1.0)


def _match_frame(det_boxes, det_scores, gt_boxes, iou_thresh):
    """Greedy score-ordered one-to-one matching.

    Returns matched gt index per det (-1 unmatched) and heading accuracy
    per matched det."""
    nd, ng = len(det_boxes), len(gt_boxes)
    match = np.full(nd, -1, np.int64)
    ha = np.zeros(nd)
    if nd == 0 or ng == 0:
        return match, ha
    iou = _iou3d(det_boxes, gt_boxes)
    taken = np.zeros(ng, bool)
    for d in np.argsort(-det_scores):
        cand = np.where(~taken & (iou[d] >= iou_thresh))[0]
        if cand.size:
            g = cand[np.argmax(iou[d][cand])]
            match[d] = g
            taken[g] = True
            ha[d] = _heading_accuracy(det_boxes[d, 6] - gt_boxes[g, 6])
    return match, ha


def _gt_difficulty(anno, mask):
    diff = np.asarray(anno.get('difficulty',
                               np.zeros(mask.sum(), np.int64)))
    if diff.shape[0] != mask.sum():
        diff = diff[mask]
    diff = diff.copy()
    npts = anno.get('num_points_in_gt')
    if npts is not None:
        npts = np.asarray(npts)[mask] if np.asarray(npts).shape[0] != \
            mask.sum() else np.asarray(npts)
        zero = diff == 0
        diff[(npts > 5) & zero] = 1
        diff[(npts <= 5) & zero] = 2
    else:
        diff[diff == 0] = 1
    return diff


def _ap_from_curve(recalls, precisions):
    order = np.argsort(recalls)
    r = np.concatenate([[0.0], recalls[order], [recalls[order][-1]]]) \
        if len(recalls) else np.array([0.0])
    p = np.concatenate([[0.0], precisions[order], [0.0]]) \
        if len(precisions) else np.array([0.0])
    # monotone precision from the high-recall end
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    return float(np.sum((r[1:] - r[:-1]) * p[1:]))


def evaluate_class_level(det_annos, gt_annos, class_name, level):
    """AP and APH for one class at one difficulty level."""
    iou_thresh = CLASS_IOU[class_name]
    all_scores, all_tp_w, all_is_tp = [], [], []
    n_gt_eligible = 0
    for det, gt in zip(det_annos, gt_annos):
        gmask = np.asarray([n == class_name for n in gt['name']], bool)
        gboxes = np.asarray(gt['boxes_lidar']).reshape(len(gmask), -1) \
            if len(gmask) else np.zeros((0, 7))
        gboxes = gboxes[:, :7][gmask]
        diff = _gt_difficulty(gt, gmask)
        npts = gt.get('num_points_in_gt')
        if npts is not None:
            keep = np.asarray(npts)[gmask] > 0
            gboxes, diff = gboxes[keep], diff[keep]
        eligible = diff <= level
        n_gt_eligible += int(eligible.sum())

        dmask = np.asarray([n == class_name for n in det['name']], bool)
        dboxes = np.asarray(det['boxes_lidar']).reshape(len(dmask), -1) \
            if len(dmask) else np.zeros((0, 7))
        dboxes = dboxes[:, :7][dmask]
        dscores = np.asarray(det['score'])[dmask]
        match, ha = _match_frame(dboxes, dscores, gboxes, iou_thresh)

        is_tp = (match >= 0) & eligible[np.clip(match, 0, None)]
        ignored = (match >= 0) & ~eligible[np.clip(match, 0, None)]
        use = ~ignored                     # ignore-region matches dropped
        all_scores.append(dscores[use])
        all_is_tp.append(is_tp[use])
        all_tp_w.append(np.where(is_tp[use], ha[use], 0.0))

    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    is_tp = np.concatenate(all_is_tp) if all_is_tp else np.zeros(0, bool)
    tp_w = np.concatenate(all_tp_w) if all_tp_w else np.zeros(0)
    if n_gt_eligible == 0:
        return 0.0, 0.0

    cutoffs = np.linspace(0.0, 1.0, N_CUTOFFS)
    recalls, precisions, precisions_h = [], [], []
    for c in cutoffs:
        sel = scores >= c
        nd = int(sel.sum())
        if nd == 0:
            continue
        tp = int(is_tp[sel].sum())
        recalls.append(tp / n_gt_eligible)
        precisions.append(tp / nd)
        precisions_h.append(float(tp_w[sel].sum()) / nd)
    recalls = np.asarray(recalls)
    ap = _ap_from_curve(recalls, np.asarray(precisions))
    aph = _ap_from_curve(recalls, np.asarray(precisions_h))
    return ap * 100.0, aph * 100.0


def waymo_evaluation(det_annos, gt_annos, class_names):
    """Returns (result_str, ret_dict) in the reference's key style:
    'OBJECT_TYPE_TYPE_{CLS}_LEVEL_{1,2}/AP' and '/APH'."""
    ret = {}
    lines = []
    for cls in class_names:
        if cls not in CLASS_IOU:
            continue
        for level in (1, 2):
            ap, aph = evaluate_class_level(det_annos, gt_annos, cls, level)
            key = f'OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}'
            ret[f'{key}/AP'] = ap
            ret[f'{key}/APH'] = aph
            lines.append(f'{key}: AP {ap:.4f}  APH {aph:.4f}')
    return '\n'.join(lines), ret
