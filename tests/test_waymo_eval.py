"""Waymo mAP/mAPH protocol: perfect detections, heading penalties,
difficulty levels, ignore-region semantics."""
import numpy as np
import pytest

from glenet_tpu.eval import waymo_eval


def make_frame(rng, n, cls='Vehicle', n_points=50):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = rng.uniform(-40, 40, n)
    boxes[:, 1] = np.linspace(-40, 40, n) + rng.uniform(-2, 2, n)
    boxes[:, 2] = 1.0
    boxes[:, 3:6] = [4.7, 2.1, 1.7]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return {'name': np.array([cls] * n), 'boxes_lidar': boxes,
            'num_points_in_gt': np.full(n, n_points),
            'difficulty': np.zeros(n, np.int64)}


def as_det(gt, score=0.9, heading_offset=0.0):
    d = {'name': gt['name'].copy(), 'boxes_lidar': gt['boxes_lidar'].copy(),
         'score': np.full(len(gt['name']), score)}
    d['boxes_lidar'][:, 6] += heading_offset
    return d


def test_perfect_detections_100(rng):
    gts = [make_frame(rng, 5, n_points=50) for _ in range(4)]
    dets = [as_det(g) for g in gts]
    _, ret = waymo_eval.waymo_evaluation(dets, gts, ['Vehicle'])
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] > 99.0
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] > 99.0
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'] > 99.0


def test_heading_error_hits_aph_not_ap(rng):
    gts = [make_frame(rng, 5) for _ in range(4)]
    dets = [as_det(g, heading_offset=np.pi) for g in gts]
    _, ret = waymo_eval.waymo_evaluation(dets, gts, ['Vehicle'])
    # pi heading error: boxes still overlap (rotated 180 deg -> same rect)
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] > 99.0
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'] < 1.0


def test_level2_includes_sparse_gts(rng):
    """Half the gts have <=5 points: they count for L2 only; L1 treats
    their matches as ignored (not FP)."""
    gts, dets = [], []
    for _ in range(4):
        g = make_frame(rng, 6)
        g['num_points_in_gt'] = np.array([50, 50, 50, 3, 3, 3])
        gts.append(g)
        dets.append(as_det(g))
    _, ret = waymo_eval.waymo_evaluation(dets, gts, ['Vehicle'])
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] > 99.0  # no FP from L2
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] > 99.0


def test_missing_detections_halve_ap(rng):
    gts, dets = [], []
    for _ in range(6):
        g = make_frame(rng, 6)
        gts.append(g)
        d = as_det(g)
        d = {k: v[:3] for k, v in d.items()}      # detect half
        dets.append(d)
    _, ret = waymo_eval.waymo_evaluation(dets, gts, ['Vehicle'])
    ap = ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP']
    assert 40.0 < ap < 60.0


def test_hungarian_recovers_multi_overlap():
    """Two heavily-overlapping gts, two dets: the higher-scored det's BEST
    gt is the only gt the lower-scored det clears the 0.7 threshold with.
    Greedy-by-score strands the second det (1 TP); the official per-cutoff
    Hungarian matching recovers both (AP 100)."""
    gt = {'name': np.array(['Vehicle'] * 2),
          'boxes_lidar': np.array([[0.0, 0, 1, 4, 2, 2, 0],
                                   [0.4, 0, 1, 4, 2, 2, 0]], np.float32),
          'num_points_in_gt': np.full(2, 50),
          'difficulty': np.zeros(2, np.int64)}
    det = {'name': np.array(['Vehicle'] * 2),
           'boxes_lidar': np.array([[0.1, 0, 1, 4, 2, 2, 0],
                                    [-0.35, 0, 1, 4, 2, 2, 0]], np.float32),
           'score': np.array([0.95, 0.90])}
    _, ret = waymo_eval.waymo_evaluation([det], [gt], ['Vehicle'])
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] > 99.0

    # the greedy fallback (oversized frames) documents the divergence:
    # det A takes gt1, det B clears the threshold with no remaining gt
    orig = waymo_eval.HUNGARIAN_BUDGET
    waymo_eval.HUNGARIAN_BUDGET = 0
    try:
        _, ret = waymo_eval.waymo_evaluation([det], [gt], ['Vehicle'])
    finally:
        waymo_eval.HUNGARIAN_BUDGET = orig
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'] < 99.0


def test_false_positives_reduce_precision(rng):
    gts, dets = [], []
    for _ in range(4):
        g = make_frame(rng, 4)
        gts.append(g)
        d = as_det(g, score=0.9)
        fp = make_frame(rng, 4)
        fp['boxes_lidar'][:, 0] += 300.0          # far away -> FP
        d2 = {'name': np.concatenate([d['name'], fp['name']]),
              'boxes_lidar': np.concatenate([d['boxes_lidar'],
                                             fp['boxes_lidar']]),
              'score': np.concatenate([d['score'],
                                       np.full(4, 0.95)])}
        dets.append(d2)
    _, ret = waymo_eval.waymo_evaluation(dets, gts, ['Vehicle'])
    ap = ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP']
    assert ap < 90.0
