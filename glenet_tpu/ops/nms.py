"""Fixed-slot NMS kernels (pure JAX; no host round-trip).

Replaces the reference CUDA blockwise-mask NMS (iou3d_nms_kernel.cu:267-313)
and — crucially — the CPU variance-voting NMS the reference runs per frame at
eval time (pcdet/ops/iou3d_nms/iou3d_nms_utils.py:200-273).

TPU formulation (round 2 — the round-1 greedy fori_loop recomputed a
rotated-IoU row per sequential iteration, dominating two-stage model time):
  1. for small candidate counts the full (pre_max x pre_max) rotated-IoU
     matrix is computed ONCE, fully parallel on the VPU (candidates are
     pre-sorted by score, so greedy order == row order);
  2. the greedy suppression pass runs as parallel locally-first
     confirmation rounds (see greedy_keep): each round decides every
     candidate with no earlier undecided suppressor in two (P, P)
     any-reduces — sequential depth = max suppression-chain length
     (typically < 10), not P/64 blocks of unrolled scalar steps;
  3. variance voting is vectorized after the keep pass: every box's
     "suppressor" (the first kept box overlapping it) is a min-reduce over
     the mask matrix, and cluster averages become one segment-sum.

Large candidate counts (the train-time proposal NMS runs at
NMS_PRE_MAXSIZE=9000, reference GLENet_VR.yaml) use a LAZY kept-buffer
pass instead (`_greedy_keep_lazy`): a box's keep decision only ever
depends on its IoU against *kept* higher-scored boxes, and only the first
`post_max` keeps are returned, so the full (P, P) matrix (81M rotated
polygon clips at P=9000 — profiled at ~1.8 s/step of the GLENet-VR train
step) is unnecessary.  Blocks of 256 score-ordered candidates compute IoU
against (a) a (post_max,) buffer of kept-box corners and (b) themselves,
run the exact in-block greedy pass, and append their keeps to the buffer;
the while_loop exits as soon as post_max boxes are kept.  Work is
O(P * (post_max + 256)) clips worst-case (~15x fewer at 9000/512) and
typically far less via the early exit.

All outputs are fixed-shape: (post_max,) indices + validity mask (+ voted
boxes), so the caller stays inside jit.

NOTE: the greedy passes use `lax.while_loop`, which has no JVP rule —
callers must `stop_gradient` boxes/scores first (the proposal layers do;
the reference also detaches proposals, roi_head_template.py:51).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import iou3d

_NEG_INF = -1e9


def _topk_boxes(boxes, scores, pre_max):
    order = jnp.argsort(-scores)[:pre_max]
    return boxes[order], scores[order], order


def _fixpoint_keep(a, live):
    """Exact greedy keep via parallel locally-first-confirmation rounds:
    per round, every candidate with NO earlier *undecided* candidate
    suppressing it is decidable — kept iff no confirmed keep suppresses
    it.  Exact (when i is decidable, all of i's potential greedy
    suppressors are final) and terminating (the earliest undecided
    candidate is always decidable); rounds = max suppression-chain depth.

    a: (P, P) bool with a[j, i] = "j suppresses i AND j earlier than i".
    """
    def cond(state):
        return state[0].any()

    def body(state):
        undecided, keep = state
        # 8 rounds per loop iteration: the while_loop's per-iteration
        # device overhead dominates when chains are long (dense-overlap
        # inputs), and on typical clustered data 8 rounds converge in
        # ONE iteration (extra rounds on converged state are no-ops)
        for _ in range(8):
            blocked = (a & undecided[:, None]).any(axis=0)
            new_keep = undecided & ~blocked
            keep = keep | new_keep
            new_supp = (a & new_keep[:, None]).any(axis=0)
            undecided = undecided & ~new_keep & ~new_supp
        return undecided, keep

    _, keep = jax.lax.while_loop(
        cond, body, (live, jnp.zeros(live.shape, bool)))
    return keep


def greedy_keep(supp_mat, live):
    """Greedy NMS keep flags over score-sorted candidates.

    Parallel locally-first-confirmation fixpoint (see _fixpoint_keep),
    8 rounds per device-loop iteration.  Measured at P=4096 on the real
    chip: 11 ms even on uniform-random dense-overlap boxes (the
    adversarial case for chain depth) — 20x faster than a sequential
    256-block hybrid (nested-loop iteration overhead) and free of the
    round-2 64-row pass's P-deep unrolled scalar chain.

    Args:
        supp_mat: (P, P) bool — True where box row would suppress box col
                  (diagonal True is fine: self-suppression is ignored).
        live: (P,) bool — candidates above the score threshold.
    Returns:
        keep: (P,) bool.
    """
    p = supp_mat.shape[0]
    idx = jnp.arange(p)
    return _fixpoint_keep(supp_mat & (idx[:, None] < idx[None, :]), live)


_LAZY_BLK = 256


def _greedy_keep_lazy(boxes_s, live, iou_threshold, post_max: int,
                      blk: int = _LAZY_BLK):
    """Greedy NMS keep flags without materializing the (P, P) IoU matrix.

    Exactness: a candidate is suppressed iff it overlaps a *kept*
    higher-scored box, so IoU against non-kept boxes is never needed.  The
    kept-corner buffer is capped at `post_max` slots: a box kept at rank
    >= post_max can only suppress candidates ranked after it, all of which
    are dropped by the post_max cut anyway — so both the cap and the early
    exit (stop once post_max boxes are kept) leave the returned first
    `post_max` keeps identical to the full greedy pass.

    Args:
        boxes_s: (P, 7) score-sorted candidates.
        live: (P,) bool — above the score threshold.
    Returns:
        keep: (P,) bool (entries after the early-exit point are False;
        only the first post_max True entries are meaningful).
    """
    p0 = boxes_s.shape[0]
    pad = (-p0) % blk
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        live = jnp.pad(live, (0, pad))
    p = p0 + pad
    corners = iou3d.box_to_bev_corners(boxes_s)            # (P, 4, 2)
    areas = boxes_s[:, 3] * boxes_s[:, 4]
    k = post_max

    def cond(state):
        b, n_kept = state[0], state[1]
        return (b < p // blk) & (n_kept < k)

    def body(state):
        b, n_kept, keep, buf_c, buf_a = state
        base = b * blk
        c_blk = jax.lax.dynamic_slice(corners, (base, 0, 0), (blk, 4, 2))
        a_blk = jax.lax.dynamic_slice(areas, (base,), (blk,))
        live_blk = jax.lax.dynamic_slice(live, (base,), (blk,))
        ov_prev = iou3d._pairwise(c_blk, buf_c)            # (blk, k)
        iou_prev = ov_prev / jnp.clip(
            a_blk[:, None] + buf_a[None, :] - ov_prev, 1e-6, None)
        # unfilled buffer slots hold degenerate zero-corner quads whose
        # half-plane test is vacuously true — mask them out explicitly
        filled = jnp.arange(k) < n_kept
        free = live_blk & ~((iou_prev > iou_threshold)
                            & filled[None, :]).any(axis=1)
        ov_blk = iou3d._pairwise(c_blk, c_blk)             # (blk, blk)
        iou_blk = ov_blk / jnp.clip(
            a_blk[:, None] + a_blk[None, :] - ov_blk, 1e-6, None)
        keep_blk = greedy_keep(iou_blk > iou_threshold, free)
        rank = jnp.cumsum(keep_blk) - 1
        slot = jnp.where(keep_blk, n_kept + rank, k).astype(jnp.int32)
        buf_c = buf_c.at[slot].set(c_blk, mode='drop')     # slot >= k dropped
        buf_a = buf_a.at[slot].set(a_blk, mode='drop')
        keep = jax.lax.dynamic_update_slice(keep, keep_blk, (base,))
        n_kept = n_kept + keep_blk.sum().astype(jnp.int32)
        return b + 1, n_kept, keep, buf_c, buf_a

    state = (jnp.int32(0), jnp.int32(0), jnp.zeros((p,), bool),
             jnp.zeros((k, 4, 2), jnp.float32), jnp.zeros((k,), jnp.float32))
    state = jax.lax.while_loop(cond, body, state)
    return state[2][:p0]


def _first_k_kept(keep, k):
    """Indices of the first k True entries of `keep` (score order) +
    validity.  Static shapes via rank-scatter."""
    p = keep.shape[0]
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < k), rank, k)
    idx = jnp.zeros((k + 1,), jnp.int32).at[slot].set(
        jnp.arange(p, dtype=jnp.int32), mode='drop')[:k]
    valid = jnp.arange(k) < keep.sum()
    return idx, valid


@partial(jax.jit, static_argnames=('pre_max', 'post_max'))
def nms_bev(boxes, scores, iou_threshold, pre_max: int = 4096,
            post_max: int = 500, score_threshold: float = 0.0):
    """Greedy rotated-BEV-IoU NMS.

    Args:
        boxes: (N, 7); scores: (N,)
    Returns:
        keep_idx: (post_max,) int32 indices into the input arrays
        keep_valid: (post_max,) bool
    """
    n = boxes.shape[0]
    pre_max = min(pre_max, n)
    boxes_s, scores_s, order = _topk_boxes(boxes, scores, pre_max)
    live = scores_s > score_threshold
    if pre_max <= 2 * _LAZY_BLK:
        iou = iou3d.boxes_iou_bev_blocked(boxes_s, boxes_s)
        keep = greedy_keep(iou > iou_threshold, live)
    else:
        keep = _greedy_keep_lazy(boxes_s, live, iou_threshold, post_max)
    keep_idx, keep_valid = _first_k_kept(keep, post_max)
    return order[keep_idx], keep_valid


@partial(jax.jit, static_argnames=('pre_max', 'post_max'))
def nms_normal(boxes, scores, iou_threshold, pre_max: int = 4096,
               post_max: int = 500, score_threshold: float = 0.0):
    """Axis-aligned (heading-ignored) NMS — reference nms_normal_gpu (:328)."""
    from ..utils import box_utils
    n = boxes.shape[0]
    pre_max = min(pre_max, n)
    boxes_s, scores_s, order = _topk_boxes(boxes, scores, pre_max)
    aligned = jnp.concatenate([
        boxes_s[:, 0:2] - boxes_s[:, 3:5] / 2,
        boxes_s[:, 0:2] + boxes_s[:, 3:5] / 2], axis=1)
    live = scores_s > score_threshold
    iou = box_utils.boxes_iou_normal(aligned, aligned)
    keep = greedy_keep(iou > iou_threshold, live)
    keep_idx, keep_valid = _first_k_kept(keep, post_max)
    return order[keep_idx], keep_valid


@partial(jax.jit, static_argnames=('pre_max', 'post_max', 'soft_mode'))
def soft_nms(boxes, scores, score_threshold: float = 0.1,
             soft_sigma: float = 0.3, soft_mode: str = 'gaussian',
             pre_max: int = 1024, post_max: int = 256):
    """Soft-NMS (reference iou3d_nms_utils.softnms :313-356, w/o voting):
    per greedy iteration, remaining scores are rescaled by
    exp(-iou^2/sigma) (gaussian) or (1-iou when iou >= sigma) (linear);
    kept boxes are those ending with score > score_threshold.

    Returns keep_idx (post_max,), keep_valid, final_scores (post_max,).
    """
    n = boxes.shape[0]
    pre_max = min(pre_max, n)
    boxes_s, scores_s, order = _topk_boxes(boxes, scores, pre_max)
    iou_mat = iou3d.boxes_iou_bev_blocked(boxes_s, boxes_s)
    live = jnp.where(scores_s >= score_threshold, scores_s, _NEG_INF)

    def body(k, state):
        live, keep_idx, keep_valid, keep_scores = state
        i = jnp.argmax(live)
        valid = live[i] > _NEG_INF / 2
        cur_score = live[i]
        iou = iou_mat[i]
        if soft_mode == 'gaussian':
            scale = jnp.exp(-iou ** 2 / soft_sigma)
        else:
            scale = jnp.where(iou >= soft_sigma, 1.0 - iou, 1.0)
        live = jnp.where(valid, live * scale, live)
        live = jnp.where(live < score_threshold, _NEG_INF, live)
        live = live.at[i].set(_NEG_INF)
        keep_idx = keep_idx.at[k].set(jnp.where(valid, i, 0))
        keep_valid = keep_valid.at[k].set(valid)
        keep_scores = keep_scores.at[k].set(jnp.where(valid, cur_score, 0.0))
        return live, keep_idx, keep_valid, keep_scores

    init = (live, jnp.zeros((post_max,), jnp.int32),
            jnp.zeros((post_max,), bool), jnp.zeros((post_max,), jnp.float32))
    _, keep_idx, keep_valid, keep_scores = jax.lax.fori_loop(
        0, post_max, body, init)
    return order[keep_idx], keep_valid, keep_scores


@partial(jax.jit, static_argnames=('num_class', 'pre_max', 'post_max'))
def multi_classes_nms(boxes, cls_scores, iou_threshold, num_class: int,
                      pre_max: int = 1024, post_max: int = 128,
                      score_threshold: float = 0.0):
    """Per-class NMS (reference model_nms_utils.multi_classes_nms :66-104):
    run class-k NMS over all boxes scored by class k, then merge the
    per-class keeps by score into fixed slots.

    Args: boxes (N, 7); cls_scores (N, num_class).
    Returns: keep_idx (num_class*post_max,), keep_valid, keep_labels
    (1-based), keep_scores — sorted by score descending.
    """
    all_idx, all_valid, all_scores, all_labels = [], [], [], []
    for k in range(num_class):
        sk = cls_scores[:, k]
        idx, valid = nms_bev(boxes, sk, iou_threshold, pre_max=pre_max,
                             post_max=post_max,
                             score_threshold=score_threshold)
        all_idx.append(idx)
        all_valid.append(valid)
        all_scores.append(jnp.where(valid, sk[idx], 0.0))
        all_labels.append(jnp.full((post_max,), k + 1, jnp.int32))
    idx = jnp.concatenate(all_idx)
    valid = jnp.concatenate(all_valid)
    scores = jnp.concatenate(all_scores)
    labels = jnp.concatenate(all_labels)
    order = jnp.argsort(-scores)
    return idx[order], valid[order], labels[order], scores[order]


@partial(jax.jit, static_argnames=('pre_max', 'post_max'))
def variance_voting_nms(boxes, scores, variance, iou_threshold,
                        pre_max: int = 4096, post_max: int = 500,
                        score_threshold: float = 0.0,
                        std_iou_sigma: float = 0.05):
    """GLENet variance-voting NMS (device-side, fixed slots).

    Semantics from reference iou3d_nms_utils.nms_func (:227-273):
      - headings pre-wrapped with limit_period(offset=0.5, period=2*pi)
        (caller's responsibility, see new_nms_gpu :213-215)
      - per kept box: cluster = {undone boxes with IoU(orig) > thresh},
        heading of cluster members shifted +-2*pi toward the top box when
        |dh| >= 3*pi/2; per-dim weights pi = exp(-(1-iou)^2/sigma) / var with
        the heading weight zeroed where |dh| >= pi/4 (after shift); the kept
        box becomes the per-dim pi-weighted average of the cluster.
      - suppression: cluster members (IoU > thresh) have score zeroed.
    IoUs are always computed against the ORIGINAL boxes (the reference
    precomputes ious_all once), so voting updates never affect suppression.

    Args:
        boxes: (N, 7), scores: (N,), variance: (N, 7) (exp of predicted
        log-variance).
    Returns:
        keep_idx (post_max,) int32, keep_valid (post_max,) bool,
        voted_boxes (post_max, 7), keep_scores (post_max,)
    """
    n = boxes.shape[0]
    pre_max = min(pre_max, n)
    boxes_s, scores_s, order = _topk_boxes(boxes, scores, pre_max)
    var_s = variance[order]
    live = scores_s >= score_threshold
    iou = iou3d.boxes_iou_bev_blocked(boxes_s, boxes_s)        # (P, P)
    supp = iou > iou_threshold
    keep = greedy_keep(supp, live)

    # suppressor(j): first kept box overlapping j — the greedy iteration at
    # which j joined a cluster.  kept boxes are their own suppressor.
    p = boxes_s.shape[0]
    member = keep[:, None] & supp & live[None, :]              # (P, P)
    supp_by = jnp.where(member, jnp.arange(p)[:, None], p)
    suppressor = supp_by.min(axis=0)                           # (P,), p=none
    in_cluster = suppressor < p
    sup_safe = jnp.where(in_cluster, suppressor, 0)

    # heading alignment toward the suppressor (top) box
    h = boxes_s[:, 6]
    h_top = h[sup_safe]
    dh = h - h_top
    shift = jnp.where(jnp.abs(dh) >= np.pi * 3 / 2,
                      jnp.where(h_top > 0, 2 * np.pi, -2 * np.pi), 0.0)
    h_shifted = h + shift
    member_boxes = jnp.concatenate([boxes_s[:, :6], h_shifted[:, None]], 1)

    iou_to_top = jnp.take_along_axis(iou, sup_safe[None, :], axis=0)[0]
    w_iou = jnp.exp(-(1.0 - iou_to_top) ** 2 / std_iou_sigma)[:, None]
    pi = w_iou / var_s                                         # (P, 7)
    heading_ok = jnp.abs(h_shifted - h_top) < np.pi / 4
    pi = pi.at[:, 6].set(jnp.where(heading_ok, pi[:, 6], 0.0))
    pi = jnp.where(in_cluster[:, None], pi, 0.0)

    # cluster-segment sums -> voted box per kept slot
    num = jnp.zeros((p + 1, 7)).at[sup_safe].add(
        jnp.where(in_cluster[:, None], pi * member_boxes, 0.0))
    den = jnp.zeros((p + 1, 7)).at[sup_safe].add(pi)
    voted_all = num[:p] / jnp.clip(den[:p], 1e-20, None)

    keep_idx, keep_valid = _first_k_kept(keep, post_max)
    voted = jnp.where(keep_valid[:, None], voted_all[keep_idx], 0.0)
    kept_scores = jnp.where(keep_valid, scores_s[keep_idx], 0.0)
    return order[keep_idx], keep_valid, voted, kept_scores
