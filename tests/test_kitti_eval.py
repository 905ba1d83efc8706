"""KITTI AP evaluator vs a direct-transcription python oracle of the
official matching algorithm, plus analytic sanity cases."""
import numpy as np
import pytest

from glenet_tpu.eval import kitti_eval


# ---------------------------------------------------------------------------
# pure-python oracle (direct transcription of the official numba matcher)
# ---------------------------------------------------------------------------

def oracle_compute_statistics(overlaps, gt_ig, det_ig, det_scores,
                              gt_alpha, det_alpha, dc_overlaps, metric,
                              min_overlap, thresh=0.0, compute_fp=False,
                              compute_aos=False):
    det_size, gt_size = len(det_ig), len(gt_ig)
    assigned = [False] * det_size
    ignored_threshold = [False] * det_size
    if compute_fp:
        for i in range(det_size):
            if det_scores[i] < thresh:
                ignored_threshold[i] = True
    NO_DET = -10000000
    tp = fp = fn = 0
    similarity = 0.0
    thresholds, delta = [], []
    for i in range(gt_size):
        if gt_ig[i] == -1:
            continue
        det_idx, valid_det, max_ov, assigned_ig = -1, NO_DET, 0, False
        for j in range(det_size):
            if det_ig[j] == -1 or assigned[j] or ignored_threshold[j]:
                continue
            ov = overlaps[j, i]
            sc = det_scores[j]
            if not compute_fp and ov > min_overlap and sc > valid_det:
                det_idx, valid_det = j, sc
            elif (compute_fp and ov > min_overlap
                  and (ov > max_ov or assigned_ig) and det_ig[j] == 0):
                max_ov, det_idx, valid_det, assigned_ig = ov, j, 1, False
            elif (compute_fp and ov > min_overlap and valid_det == NO_DET
                  and det_ig[j] == 1):
                det_idx, valid_det, assigned_ig = j, 1, True
        if valid_det == NO_DET and gt_ig[i] == 0:
            fn += 1
        elif valid_det != NO_DET and (gt_ig[i] == 1 or det_ig[det_idx] == 1):
            assigned[det_idx] = True
        elif valid_det != NO_DET:
            tp += 1
            thresholds.append(det_scores[det_idx])
            if compute_aos:
                delta.append(gt_alpha[i] - det_alpha[det_idx])
            assigned[det_idx] = True
    if compute_fp:
        for i in range(det_size):
            if not (assigned[i] or det_ig[i] in (-1, 1)
                    or ignored_threshold[i]):
                fp += 1
        nstuff = 0
        if metric == 0 and dc_overlaps is not None:
            for c in range(dc_overlaps.shape[1]):
                for j in range(det_size):
                    if (assigned[j] or det_ig[j] in (-1, 1)
                            or ignored_threshold[j]):
                        continue
                    if dc_overlaps[j, c] > min_overlap:
                        assigned[j] = True
                        nstuff += 1
        fp -= nstuff
        if compute_aos:
            tmp = [0.0] * fp + [(1.0 + np.cos(d)) / 2.0 for d in delta]
            similarity = float(np.sum(tmp)) if (tp > 0 or fp > 0) else -1
    return tp, fp, fn, similarity, thresholds


def random_annos(rng, n_frames=6, perfect=False):
    gt_annos, dt_annos = [], []
    for _ in range(n_frames):
        g = rng.randint(1, 6)
        names = np.array(['Car'] * g)
        bbox = np.zeros((g, 4))
        bbox[:, 0] = rng.uniform(0, 1000, g)
        bbox[:, 1] = rng.uniform(0, 200, g)
        bbox[:, 2] = bbox[:, 0] + rng.uniform(50, 150, g)
        bbox[:, 3] = bbox[:, 1] + rng.uniform(45, 120, g)
        loc = np.stack([rng.uniform(-20, 20, g), rng.uniform(0, 2, g),
                        rng.uniform(5, 60, g)], 1)
        dims = np.stack([rng.uniform(3.5, 4.5, g), rng.uniform(1.4, 1.8, g),
                         rng.uniform(1.5, 1.8, g)], 1)  # (l, h, w)
        ry = rng.uniform(-np.pi, np.pi, g)
        gt = {'name': names, 'bbox': bbox, 'location': loc,
              'dimensions': dims, 'rotation_y': ry,
              'alpha': rng.uniform(-np.pi, np.pi, g),
              'occluded': rng.randint(0, 3, g),
              'truncated': rng.uniform(0, 0.4, g)}
        gt_annos.append(gt)

        if perfect:
            dt = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                  for k, v in gt.items()}
            dt['score'] = rng.uniform(0.5, 1.0, g)
            dt_annos.append(dt)
        else:
            d = rng.randint(0, 7)
            dbox = np.zeros((d, 4))
            dbox[:, 0] = rng.uniform(0, 1000, d)
            dbox[:, 1] = rng.uniform(0, 200, d)
            dbox[:, 2] = dbox[:, 0] + rng.uniform(50, 150, d)
            dbox[:, 3] = dbox[:, 1] + rng.uniform(20, 120, d)
            # make some detections match gts
            for j in range(min(d, g)):
                if rng.rand() < 0.6:
                    dbox[j] = bbox[j] + rng.uniform(-5, 5, 4)
            dt_annos.append({
                'name': np.array(['Car'] * d),
                'bbox': dbox,
                'location': np.stack([rng.uniform(-20, 20, d),
                                      rng.uniform(0, 2, d),
                                      rng.uniform(5, 60, d)], 1),
                'dimensions': np.stack([rng.uniform(3.5, 4.5, d),
                                        rng.uniform(1.4, 1.8, d),
                                        rng.uniform(1.5, 1.8, d)], 1),
                'rotation_y': rng.uniform(-np.pi, np.pi, d),
                'alpha': rng.uniform(-np.pi, np.pi, d),
                'score': rng.uniform(0, 1, d),
            })
    return gt_annos, dt_annos


def test_matcher_vs_oracle_bbox(rng):
    gt_annos, dt_annos = random_annos(rng, n_frames=10)
    import jax.numpy as jnp
    for f in range(len(gt_annos)):
        gt, dt = gt_annos[f], dt_annos[f]
        _, gt_ig, det_ig, dc = kitti_eval.clean_data(gt, dt, 0, 1)
        ov = kitti_eval.image_box_overlap(dt['bbox'], gt['bbox'])
        dc_ov = (kitti_eval.image_box_overlap(dt['bbox'], dc, 0)
                 if len(dc) else np.zeros((len(det_ig), 1)))
        for thresh in (0.0, 0.3, 0.6):
            for compute_fp in (False, True):
                want = oracle_compute_statistics(
                    ov, gt_ig, det_ig, dt['score'], gt['alpha'], dt['alpha'],
                    dc_ov, 0, 0.7, thresh, compute_fp, compute_aos=True)
                got = kitti_eval._match_single(
                    jnp.asarray(ov, jnp.float32), jnp.asarray(gt_ig),
                    jnp.asarray(det_ig), jnp.asarray(dt['score'], jnp.float32),
                    jnp.asarray(gt['alpha'], jnp.float32),
                    jnp.asarray(dt['alpha'], jnp.float32),
                    jnp.asarray(dc_ov, jnp.float32),
                    0.7, thresh, compute_fp, True)
                tp, fp, fn, sim, tp_scores = got
                assert int(tp) == want[0], (f, thresh, compute_fp)
                assert int(fp) == want[1], (f, thresh, compute_fp)
                assert int(fn) == want[2], (f, thresh, compute_fp)
                if compute_fp and want[3] != -1:
                    np.testing.assert_allclose(float(sim), want[3], atol=1e-4)
                if not compute_fp:
                    got_scores = np.sort(np.asarray(tp_scores)[
                        np.asarray(tp_scores) > kitti_eval._NO_SCORE / 2])
                    np.testing.assert_allclose(
                        got_scores, np.sort(want[4]), atol=1e-5)


def test_perfect_detections_ap_100(rng):
    # need >= 41 valid gts so all 41 recall sample points are reachable
    # (with fewer gts the official metric itself caps below 100)
    gt_annos, dt_annos = random_annos(rng, n_frames=40, perfect=True)
    # force everything easy so no gt is ignored
    for gt in gt_annos:
        gt['occluded'][:] = 0
        gt['truncated'][:] = 0.0
        gt['bbox'][:, 3] = gt['bbox'][:, 1] + 60
    for dt, gt in zip(dt_annos, gt_annos):
        dt['bbox'] = gt['bbox'].copy()
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, 'Car')
    assert ret['Car_3d/moderate_R40'] > 99.0, result
    assert ret['Car_bev/easy_R40'] > 99.0
    assert ret['Car_image/hard_R11'] > 99.0


def test_no_detections_ap_0(rng):
    gt_annos, _ = random_annos(rng, n_frames=4)
    dt_annos = [{'name': np.array([]), 'bbox': np.zeros((0, 4)),
                 'location': np.zeros((0, 3)), 'dimensions': np.zeros((0, 3)),
                 'rotation_y': np.zeros(0), 'alpha': np.zeros(0),
                 'score': np.zeros(0)} for _ in gt_annos]
    result, ret = kitti_eval.get_official_eval_result(gt_annos, dt_annos, 'Car')
    assert ret['Car_3d/moderate_R40'] == 0.0


def test_get_thresholds_spacing():
    scores = np.linspace(0.01, 0.99, 200)
    th = kitti_eval.get_thresholds(scores.copy(), num_gt=200)
    assert len(th) <= 41
    assert (np.diff(th) < 0).all()  # descending
