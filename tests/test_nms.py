import jax.numpy as jnp
import numpy as np

from glenet_tpu.ops import iou3d, nms


def random_boxes(rng, n, spread=10.0):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-spread, spread, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:6] = rng.uniform(1.5, 4.5, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


def np_greedy_nms(boxes, scores, thresh):
    """Oracle: classic greedy NMS using the (tested) rotated IoU op."""
    iou = iou3d.boxes_bev_iou_np(boxes, boxes)
    order = np.argsort(-scores)
    keep, suppressed = [], np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.array(keep)


def test_nms_matches_oracle(rng):
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0.01, 1.0, 64).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.1)
    idx, valid = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_max=64, post_max=64)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # kept in score order
    assert (np.diff(scores[got]) <= 1e-6).all()


def test_nms_post_max_truncates(rng):
    boxes = random_boxes(rng, 128, spread=100.0)  # mostly disjoint
    scores = rng.uniform(0.01, 1.0, 128).astype(np.float32)
    idx, valid = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.1,
                             pre_max=128, post_max=10)
    assert np.asarray(valid).sum() == 10


def test_nms_suppresses_duplicates():
    base = np.array([[0, 0, 0, 4, 2, 1.5, 0.2]], np.float32)
    boxes = np.concatenate([base, base + 0.01, base + 0.02,
                            base + np.array([[20, 0, 0, 0, 0, 0, 0]], np.float32)])
    scores = np.array([0.9, 0.8, 0.7, 0.6], np.float32)
    idx, valid = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             pre_max=4, post_max=4)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, [0, 3])


def np_variance_voting_oracle(boxes, scores, variance, iou_threshold,
                              score_threshold=0.0, std_iou_sigma=0.05):
    """Independent numpy re-derivation of the reference nms_func semantics
    (iou3d_nms_utils.py:227-273)."""
    boxes = boxes.copy()
    scores = scores.copy()
    ious_all = iou3d.boxes_bev_iou_np(boxes, boxes)
    undone = scores >= score_threshold
    kept = []
    while undone.sum() > 0:
        live_idx = np.nonzero(undone)[0]
        idx = live_idx[scores[live_idx].argmax()]
        top = boxes[idx].copy()
        ious = ious_all[:, idx]
        cluster = undone & (ious > iou_threshold)
        klbox = boxes[cluster].copy()
        if top[6] > 0:
            klbox[np.abs(klbox[:, 6] - top[6]) >= np.pi * 3 / 2, 6] += 2 * np.pi
        else:
            klbox[np.abs(klbox[:, 6] - top[6]) >= np.pi * 3 / 2, 6] -= 2 * np.pi
        kliou = ious[cluster]
        klvar = variance[cluster]
        pi = np.exp(-(1 - kliou) ** 2 / std_iou_sigma).reshape(-1, 1) / klvar
        pi[np.abs(klbox[:, 6] - top[6]) >= np.pi / 4, 6] = 0
        pi = pi / pi.sum(0)
        boxes[idx, :7] = (pi * klbox[:, :7]).sum(0)
        kept.append((idx, scores[idx], boxes[idx].copy()))
        undone[idx] = False
        scores[undone] *= (ious_all[undone, idx] < iou_threshold)
        undone[scores < score_threshold] = False
        # the reference loop relies on score zeroing + per-iter idx removal;
        # replicate exactly: entries zeroed stay undone (score_threshold=0)
        # but can never win argmax over positive scores; once all positive
        # scores are consumed the remaining zeros get popped one per iter.
        if scores[undone].max(initial=0) <= 0:
            break
    return kept


def test_variance_voting_matches_oracle(rng):
    n = 48
    boxes = random_boxes(rng, n, spread=6.0)
    boxes[:, 6] = np.clip(boxes[:, 6], -np.pi + 1e-3, np.pi - 1e-3)
    scores = rng.uniform(0.05, 1.0, n).astype(np.float32)
    variance = rng.uniform(0.01, 1.0, (n, 7)).astype(np.float32)

    want = np_variance_voting_oracle(boxes, scores, variance, 0.3)
    idx, valid, voted, kept_scores = nms.variance_voting_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(variance), 0.3,
        pre_max=n, post_max=n)
    idx = np.asarray(idx)[np.asarray(valid)]
    voted = np.asarray(voted)[np.asarray(valid)]
    kept_scores = np.asarray(kept_scores)[np.asarray(valid)]

    want_idx = np.array([w[0] for w in want])
    np.testing.assert_array_equal(idx, want_idx)
    want_boxes = np.stack([w[2] for w in want])
    # f32 (device) vs f64 (oracle): the voting weight exp(-(1-iou)^2/0.05)
    # amplifies iou rounding ~28x near the threshold, so allow 1% slack.
    np.testing.assert_allclose(voted, want_boxes, rtol=1e-2, atol=1e-2)
    want_scores = np.array([w[1] for w in want])
    np.testing.assert_allclose(kept_scores, want_scores, rtol=1e-5)


def test_variance_voting_moves_box_toward_cluster():
    # two overlapping boxes; the low-var neighbor should pull the vote
    boxes = np.array([
        [0.0, 0, 0, 4, 2, 1.5, 0.0],
        [0.5, 0, 0, 4, 2, 1.5, 0.0],
    ], np.float32)
    scores = np.array([0.9, 0.5], np.float32)
    variance = np.array([[1.0] * 7, [1e-4] * 7], np.float32)
    idx, valid, voted, _ = nms.variance_voting_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(variance), 0.3,
        pre_max=2, post_max=2)
    voted = np.asarray(voted)[np.asarray(valid)]
    # kept box is box 0 but voted x should be ~0.5 (dominated by low-var box)
    assert np.asarray(idx)[0] == 0
    assert abs(voted[0, 0] - 0.5) < 0.01


def test_multi_classes_nms(rng):
    boxes = random_boxes(rng, 40, spread=30.0)
    cls_scores = rng.uniform(0, 1, (40, 2)).astype(np.float32)
    idx, valid, labels, scores = nms.multi_classes_nms(
        jnp.asarray(boxes), jnp.asarray(cls_scores), 0.1, num_class=2,
        pre_max=40, post_max=40)
    idx, valid = np.asarray(idx), np.asarray(valid)
    labels, scores = np.asarray(labels), np.asarray(scores)
    # per-class keeps match single-class NMS on that class's scores
    for k in (1, 2):
        want = np_greedy_nms(boxes, cls_scores[:, k - 1].copy(), 0.1)
        got = idx[valid & (labels == k)]
        np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # merged order is by descending score
    s = scores[valid]
    assert (np.diff(s) <= 1e-6).all()


def np_soft_nms_oracle(boxes, scores, score_threshold=0.1, soft_sigma=0.3):
    """Transcription of reference softnms (:313-356) without voting."""
    scores = scores.copy()
    iou = iou3d.boxes_bev_iou_np(boxes, boxes)
    undone = scores >= score_threshold
    kept = []
    while undone.sum() > 0:
        live = np.nonzero(undone)[0]
        i = live[scores[live].argmax()]
        kept.append((i, scores[i]))
        undone[i] = False
        scale = np.exp(-iou[i] ** 2 / soft_sigma)
        scores[undone] *= scale[undone]
        undone[scores < score_threshold] = False
    return kept


def test_soft_nms_matches_oracle(rng):
    boxes = random_boxes(rng, 32, spread=8.0)
    scores = rng.uniform(0.05, 1.0, 32).astype(np.float32)
    want = np_soft_nms_oracle(boxes, scores)
    idx, valid, final = nms.soft_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        score_threshold=0.1, soft_sigma=0.3, pre_max=32, post_max=32)
    idx = np.asarray(idx)[np.asarray(valid)]
    final = np.asarray(final)[np.asarray(valid)]
    np.testing.assert_array_equal(idx, [w[0] for w in want])
    np.testing.assert_allclose(final, [w[1] for w in want],
                               rtol=1e-3, atol=1e-4)


def test_lazy_nms_matches_dense(rng):
    """The lazy kept-buffer path (pre_max > 2*_LAZY_BLK) must return the
    same keeps as the dense-matrix path, including when post_max caps the
    keep count (buffer overflow + early exit)."""
    n = 1500
    boxes = random_boxes(rng, n, spread=60.0)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.2)
    for post_max in (16, 200, 1024):
        idx, valid = nms.nms_bev(jnp.asarray(boxes), jnp.asarray(scores),
                                 0.2, pre_max=n, post_max=post_max)
        assert n > 2 * nms._LAZY_BLK  # actually exercises the lazy path
        got = np.asarray(idx)[np.asarray(valid)]
        np.testing.assert_array_equal(got, want[:post_max])


def test_lazy_nms_score_threshold_and_vmap(rng):
    import jax
    n = 700
    boxes = np.stack([random_boxes(rng, n, spread=40.0) for _ in range(2)])
    scores = rng.uniform(0.0, 1.0, (2, n)).astype(np.float32)
    idx, valid = jax.vmap(
        lambda b, s: nms.nms_bev(b, s, 0.3, pre_max=n, post_max=64,
                                 score_threshold=0.5))(
        jnp.asarray(boxes), jnp.asarray(scores))
    for b in range(2):
        live = scores[b] > 0.5
        masked = np.where(live, scores[b], -1.0)
        want = np_greedy_nms(boxes[b], masked, 0.3)
        want = want[live[want]]
        got = np.asarray(idx[b])[np.asarray(valid[b])]
        np.testing.assert_array_equal(got, want[:64])
