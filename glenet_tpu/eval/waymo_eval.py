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

Matching follows the official protocol: at every score cutoff the
surviving detections are re-matched one-to-one to gts by Hungarian
assignment maximizing total IoU over pairs above the class threshold
(with thresholds >= 0.5 this also maximizes match cardinality, since any
two matches outweigh one).  Frames whose det x gt pair count exceeds
`HUNGARIAN_BUDGET` fall back to greedy score-ordered matching — the two
differ only in rare multi-overlap ties.  (The official tool itself needs
TF + the waymo-open-dataset wheel, neither installable here.)

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
# above this det x gt pair count, per-cutoff Hungarian falls back to greedy
HUNGARIAN_BUDGET = 250_000


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


def _match_once(gain, hungarian):
    """One-to-one matching of a (nd, ng) gain matrix (IoU where the pair
    clears the class threshold, else 0).  Returns matched gt index per det
    (-1 unmatched).  Hungarian maximizes total matched IoU; the greedy
    fallback walks rows in order (rows are pre-sorted by score)."""
    nd, ng = gain.shape
    match = np.full(nd, -1, np.int64)
    if hungarian:
        from scipy.optimize import linear_sum_assignment
        rows, cols = linear_sum_assignment(gain, maximize=True)
        hit = gain[rows, cols] > 0.0
        match[rows[hit]] = cols[hit]
        return match
    taken = np.zeros(ng, bool)
    for d in range(nd):
        cand = np.where(~taken & (gain[d] > 0.0))[0]
        if cand.size:
            g = cand[np.argmax(gain[d][cand])]
            match[d] = g
            taken[g] = True
    return match


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


def evaluate_class(det_annos, gt_annos, class_name, levels=(1, 2)):
    """{level: (AP, APH)} for one class.  Matching is level-independent
    (eligibility only classifies matches afterwards), so both difficulty
    levels share one IoU matrix and one Hungarian solve per frame/cutoff."""
    iou_thresh = CLASS_IOU[class_name]
    cutoffs = np.linspace(0.0, 1.0, N_CUTOFFS)
    tp = {lv: np.zeros(N_CUTOFFS) for lv in levels}
    tp_h = {lv: np.zeros(N_CUTOFFS) for lv in levels}
    n_det = {lv: np.zeros(N_CUTOFFS) for lv in levels}
    n_gt_eligible = {lv: 0 for lv in levels}
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
        eligible = {lv: diff <= lv for lv in levels}
        for lv in levels:
            n_gt_eligible[lv] += int(eligible[lv].sum())

        dmask = np.asarray([n == class_name for n in det['name']], bool)
        dboxes = np.asarray(det['boxes_lidar']).reshape(len(dmask), -1) \
            if len(dmask) else np.zeros((0, 7))
        dboxes = dboxes[:, :7][dmask]
        dscores = np.asarray(det['score'])[dmask]
        nd, ng = len(dboxes), len(gboxes)
        if nd == 0:
            continue
        order = np.argsort(-dscores)
        dboxes, dscores = dboxes[order], dscores[order]
        if ng:
            iou = _iou3d(dboxes, gboxes)
            gain = np.where(iou >= iou_thresh, iou, 0.0)
            ha = _heading_accuracy(dboxes[:, 6:7] - gboxes[None, :, 6])
        hungarian = nd * ng <= HUNGARIAN_BUDGET
        # number of dets surviving each cutoff (scores sorted descending);
        # matching depends only on that count, so cache per count
        counts = np.searchsorted(-dscores, -cutoffs, side='right')
        by_count = {}
        for ci in range(N_CUTOFFS):
            k = int(counts[ci])
            if k == 0:
                continue
            if ng == 0:
                for lv in levels:
                    n_det[lv][ci] += k
                continue
            if k not in by_count:
                match = _match_once(gain[:k], hungarian)
                per_level = {}
                for lv in levels:
                    is_tp = (match >= 0) & \
                        eligible[lv][np.clip(match, 0, None)]
                    ignored = (match >= 0) & \
                        ~eligible[lv][np.clip(match, 0, None)]
                    hsum = float(ha[np.arange(k)[is_tp],
                                    match[is_tp]].sum())
                    per_level[lv] = (int(is_tp.sum()), hsum,
                                     k - int(ignored.sum()))
                by_count[k] = per_level
            for lv in levels:
                t, th, n = by_count[k][lv]
                tp[lv][ci] += t
                tp_h[lv][ci] += th
                n_det[lv][ci] += n

    out = {}
    for lv in levels:
        if n_gt_eligible[lv] == 0:
            out[lv] = (0.0, 0.0)
            continue
        valid = n_det[lv] > 0
        recalls = tp[lv][valid] / n_gt_eligible[lv]
        precisions = tp[lv][valid] / n_det[lv][valid]
        precisions_h = tp_h[lv][valid] / n_det[lv][valid]
        out[lv] = (_ap_from_curve(recalls, precisions) * 100.0,
                   _ap_from_curve(recalls, precisions_h) * 100.0)
    return out


def evaluate_class_level(det_annos, gt_annos, class_name, level):
    """AP and APH for one class at one difficulty level."""
    return evaluate_class(det_annos, gt_annos, class_name,
                          levels=(level,))[level]


def waymo_evaluation(det_annos, gt_annos, class_names):
    """Returns (result_str, ret_dict) in the reference's key style:
    'OBJECT_TYPE_TYPE_{CLS}_LEVEL_{1,2}/AP' and '/APH'."""
    ret = {}
    lines = []
    for cls in class_names:
        if cls not in CLASS_IOU:
            continue
        by_level = evaluate_class(det_annos, gt_annos, cls)
        for level, (ap, aph) in sorted(by_level.items()):
            key = f'OBJECT_TYPE_TYPE_{cls.upper()}_LEVEL_{level}'
            ret[f'{key}/AP'] = ap
            ret[f'{key}/APH'] = aph
            lines.append(f'{key}: AP {ap:.4f}  APH {aph:.4f}')
    return '\n'.join(lines), ret
