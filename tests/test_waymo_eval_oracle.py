"""Transcription oracle for eval/waymo_eval.py.

The official Waymo metric tool (waymo-open-dataset TF ops, wrapped by the
reference in pcdet/datasets/waymo/waymo_eval.py:23-178) is not installable
here, so — mirroring the kitti_eval testing approach — this file contains
an INDEPENDENT, deliberately naive transcription of the protocol:

  per score cutoff: drop detections below the cutoff, Hungarian-match the
  survivors to gts one-to-one maximizing IoU over pairs clearing the class
  threshold; a detection matched to an eligible gt is a TP (weighted by
  heading accuracy for APH), matched to an ineligible gt it is IGNORED
  (neither TP nor FP), unmatched it is an FP; recall = TP / eligible gts,
  precision = TP / (TP + FP); AP integrates the recall-sorted PR curve
  with precision made monotone from the high-recall end.

No caching, no shared helpers with the production code (except the
IoU kernel, which has its own brute-force oracle in test_iou3d.py).
The production evaluator must agree to float tolerance on randomized
scenarios and on hand-built edge cases.
"""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from glenet_tpu.eval import waymo_eval


def naive_iou3d(a, b):
    import jax.numpy as jnp

    from glenet_tpu.ops import iou3d
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    return np.asarray(iou3d.boxes_iou3d(
        jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))


def naive_evaluate_class(det_annos, gt_annos, class_name, level):
    """Straight-line transcription of the protocol, one cutoff at a time."""
    thr = waymo_eval.CLASS_IOU[class_name]
    cutoffs = np.linspace(0.0, 1.0, waymo_eval.N_CUTOFFS)

    frames = []
    n_eligible = 0
    for det, gt in zip(det_annos, gt_annos):
        gsel = np.array([n == class_name for n in gt['name']], bool)
        gb = np.asarray(gt['boxes_lidar'], np.float64).reshape(len(gsel), 7)
        gb = gb[gsel][:, :7]
        diff = np.asarray(gt.get('difficulty',
                                 np.zeros(gsel.sum(), np.int64)))
        if diff.shape[0] != gsel.sum():
            diff = diff[gsel]
        diff = diff.copy()
        npts = gt.get('num_points_in_gt')
        if npts is not None:
            npts = np.asarray(npts)
            if npts.shape[0] != gsel.sum():
                npts = npts[gsel]
            diff[(npts > 5) & (diff == 0)] = 1
            diff[(npts <= 5) & (diff == 0)] = 2
            keep = npts > 0
            gb, diff = gb[keep], diff[keep]
        else:
            diff[diff == 0] = 1
        eligible = diff <= level
        n_eligible += int(eligible.sum())

        dsel = np.array([n == class_name for n in det['name']], bool)
        db = np.asarray(det['boxes_lidar'], np.float64).reshape(len(dsel), 7)
        db = db[dsel][:, :7]
        ds = np.asarray(det['score'])[dsel]
        frames.append((db, ds, gb, eligible))

    tps, fps, hsums = [], [], []
    for cut in cutoffs:
        tp = fp = 0
        hsum = 0.0
        for db, ds, gb, eligible in frames:
            keep = ds >= cut
            db_k, ds_k = db[keep], ds[keep]
            nd, ng = len(db_k), len(gb)
            if nd == 0:
                continue
            if ng == 0:
                fp += nd
                continue
            iou = naive_iou3d(db_k, gb)
            gain = np.where(iou >= thr, iou, 0.0)
            rows, cols = linear_sum_assignment(gain, maximize=True)
            matched = np.full(nd, -1, np.int64)
            for r, c in zip(rows, cols):
                if gain[r, c] > 0.0:
                    matched[r] = c
            for d in range(nd):
                g = matched[d]
                if g < 0:
                    fp += 1
                elif eligible[g]:
                    tp += 1
                    dh = db_k[d, 6] - gb[g, 6]
                    dh = abs((dh + np.pi) % (2 * np.pi) - np.pi)
                    hsum += max(0.0, 1.0 - dh / np.pi)
                # matched-but-ineligible: ignored
        tps.append(tp)
        fps.append(fp)
        hsums.append(hsum)

    if n_eligible == 0:
        return 0.0, 0.0
    tps, fps, hsums = map(np.asarray, (tps, fps, hsums))
    valid = (tps + fps) > 0
    rec = tps[valid] / n_eligible
    prec = tps[valid] / (tps + fps)[valid]
    prec_h = hsums[valid] / (tps + fps)[valid]

    def ap(r, p):
        o = np.argsort(r)
        r, p = r[o], p[o]
        r = np.concatenate([[0.0], r, [r[-1] if len(r) else 0.0]])
        p = np.concatenate([[0.0], p, [0.0]])
        for i in range(len(p) - 2, -1, -1):
            p[i] = max(p[i], p[i + 1])
        return float(np.sum((r[1:] - r[:-1]) * p[1:])) * 100.0

    return ap(rec, prec), ap(rec, prec_h)


def random_scenario(rng, n_frames=4, max_gt=6, max_det=9):
    det_annos, gt_annos = [], []
    classes = ['Vehicle', 'Pedestrian', 'Cyclist']
    for _ in range(n_frames):
        ng = rng.randint(0, max_gt + 1)
        gtb = np.stack([
            rng.uniform(-30, 30, ng), rng.uniform(-30, 30, ng),
            rng.uniform(-1.5, 0.5, ng),
            rng.uniform(3.5, 5.0, ng), rng.uniform(1.5, 2.2, ng),
            rng.uniform(1.4, 1.9, ng), rng.uniform(-np.pi, np.pi, ng),
        ], 1) if ng else np.zeros((0, 7))
        gt_annos.append({
            'name': np.array(rng.choice(classes, ng)),
            'boxes_lidar': gtb,
            'difficulty': rng.randint(0, 3, ng),
            'num_points_in_gt': rng.randint(0, 40, ng),
        })
        nd = rng.randint(0, max_det + 1)
        det_rows, det_names = [], []
        for d in range(nd):
            if ng and rng.rand() < 0.7:
                base = gtb[rng.randint(ng)].copy()
                base[:3] += rng.normal(0, 0.4, 3)
                base[3:6] *= rng.uniform(0.85, 1.15, 3)
                base[6] += rng.normal(0, 0.4)
                det_rows.append(base)
            else:
                det_rows.append(np.array([
                    rng.uniform(-30, 30), rng.uniform(-30, 30),
                    rng.uniform(-1.5, 0.5), rng.uniform(3.5, 5.0),
                    rng.uniform(1.5, 2.2), rng.uniform(1.4, 1.9),
                    rng.uniform(-np.pi, np.pi)]))
            det_names.append(rng.choice(classes))
        det_annos.append({
            'name': np.array(det_names),
            'boxes_lidar': (np.stack(det_rows) if det_rows
                            else np.zeros((0, 7))),
            'score': rng.rand(nd),
        })
    return det_annos, gt_annos


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_matches_naive_transcription_random(seed):
    rng = np.random.RandomState(seed)
    det_annos, gt_annos = random_scenario(rng)
    for cls in ['Vehicle', 'Pedestrian', 'Cyclist']:
        for level in (1, 2):
            want = naive_evaluate_class(det_annos, gt_annos, cls, level)
            got = waymo_eval.evaluate_class_level(
                det_annos, gt_annos, cls, level)
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=(
                f'{cls} L{level} seed {seed}'))


def test_matches_naive_on_ignored_overlap():
    """A det matched to a difficulty-2 gt must be ignored at LEVEL_1 (not
    an FP), changing precision for the OTHER detections."""
    gt = {
        'name': np.array(['Vehicle', 'Vehicle']),
        'boxes_lidar': np.array([[0, 0, 0, 4, 2, 1.6, 0.0],
                                 [10, 0, 0, 4, 2, 1.6, 0.0]]),
        'difficulty': np.array([1, 2]),
        'num_points_in_gt': np.array([30, 3]),
    }
    det = {
        'name': np.array(['Vehicle', 'Vehicle']),
        'boxes_lidar': np.array([[0, 0, 0, 4, 2, 1.6, 0.0],
                                 [10, 0, 0, 4, 2, 1.6, 0.0]]),
        'score': np.array([0.9, 0.8]),
    }
    for level in (1, 2):
        want = naive_evaluate_class([det], [gt], 'Vehicle', level)
        got = waymo_eval.evaluate_class_level([det], [gt], 'Vehicle', level)
        np.testing.assert_allclose(got, want, atol=1e-6)
    ap1, _ = waymo_eval.evaluate_class_level([det], [gt], 'Vehicle', 1)
    assert ap1 == pytest.approx(100.0, abs=1e-4)


def test_matches_naive_heading_flip():
    """A 180-degree heading flip keeps AP at 100 but halves APH weight."""
    gt = {
        'name': np.array(['Vehicle']),
        'boxes_lidar': np.array([[0, 0, 0, 4, 2, 1.6, 0.0]]),
        'difficulty': np.array([1]),
        'num_points_in_gt': np.array([30]),
    }
    det = {
        'name': np.array(['Vehicle']),
        'boxes_lidar': np.array([[0, 0, 0, 4, 2, 1.6, np.pi]]),
        'score': np.array([0.9]),
    }
    want = naive_evaluate_class([det], [gt], 'Vehicle', 2)
    got = waymo_eval.evaluate_class_level([det], [gt], 'Vehicle', 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[0] == pytest.approx(100.0, abs=1e-4)
    assert got[1] == pytest.approx(0.0, abs=1e-4)
