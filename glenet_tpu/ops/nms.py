"""Fixed-slot NMS kernels (pure JAX; no host round-trip).

Replaces the reference CUDA blockwise-mask NMS (iou3d_nms_kernel.cu:267-313)
and — crucially — the CPU variance-voting NMS the reference runs per frame at
eval time (pcdet/ops/iou3d_nms/iou3d_nms_utils.py:200-273).  Both are
expressed as a greedy `lax.fori_loop` over a *static* number of output slots:
each iteration picks the argmax-score live box, computes its rotated-IoU row
against all candidates on the fly (no N x N matrix materialized), suppresses,
and (for the variance-voting variant) replaces the kept box with the
KL-weighted average of its high-IoU cluster.

All outputs are fixed-shape: (post_max,) indices + validity mask (+ voted
boxes), so the caller stays inside jit.
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
    corners = iou3d.box_to_bev_corners(boxes_s)
    area = boxes_s[:, 3] * boxes_s[:, 4]
    live = jnp.where(scores_s > score_threshold, scores_s, _NEG_INF)

    def body(k, state):
        live, keep_idx, keep_valid = state
        i = jnp.argmax(live)
        valid = live[i] > _NEG_INF / 2
        # rotated IoU of box i against all candidates
        overlap = iou3d._row_overlap(boxes_s[i], corners)
        iou = overlap / jnp.clip(area[i] + area - overlap, 1e-6, None)
        suppress = valid & (iou > iou_threshold)
        live = jnp.where(suppress, _NEG_INF, live)
        live = live.at[i].set(_NEG_INF)
        keep_idx = keep_idx.at[k].set(jnp.where(valid, i, 0))
        keep_valid = keep_valid.at[k].set(valid)
        return live, keep_idx, keep_valid

    keep_idx = jnp.zeros((post_max,), jnp.int32)
    keep_valid = jnp.zeros((post_max,), bool)
    live, keep_idx, keep_valid = jax.lax.fori_loop(
        0, post_max, body, (live, keep_idx, keep_valid))
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
    live = jnp.where(scores_s > score_threshold, scores_s, _NEG_INF)

    def body(k, state):
        live, keep_idx, keep_valid = state
        i = jnp.argmax(live)
        valid = live[i] > _NEG_INF / 2
        iou = box_utils.boxes_iou_normal(aligned[i][None], aligned)[0]
        suppress = valid & (iou > iou_threshold)
        live = jnp.where(suppress, _NEG_INF, live)
        live = live.at[i].set(_NEG_INF)
        keep_idx = keep_idx.at[k].set(jnp.where(valid, i, 0))
        keep_valid = keep_valid.at[k].set(valid)
        return live, keep_idx, keep_valid

    keep_idx = jnp.zeros((post_max,), jnp.int32)
    keep_valid = jnp.zeros((post_max,), bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, post_max, body, (live, keep_idx, keep_valid))
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
    corners = iou3d.box_to_bev_corners(boxes_s)
    area = boxes_s[:, 3] * boxes_s[:, 4]
    live = jnp.where(scores_s >= score_threshold, scores_s, _NEG_INF)

    def body(k, state):
        live, keep_idx, keep_valid, keep_scores = state
        i = jnp.argmax(live)
        valid = live[i] > _NEG_INF / 2
        cur_score = live[i]
        overlap = iou3d._row_overlap(boxes_s[i], corners)
        iou = overlap / jnp.clip(area[i] + area - overlap, 1e-6, None)
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
    corners = iou3d.box_to_bev_corners(boxes_s)
    area = boxes_s[:, 3] * boxes_s[:, 4]
    live = jnp.where(scores_s >= score_threshold, scores_s, _NEG_INF)

    def body(k, state):
        live, keep_idx, keep_valid, voted, kept_scores = state
        i = jnp.argmax(live)
        valid = live[i] > _NEG_INF / 2
        top_box = boxes_s[i]
        overlap = iou3d._row_overlap(top_box, corners)
        iou = overlap / jnp.clip(area[i] + area - overlap, 1e-6, None)
        undone = live > _NEG_INF / 2
        cluster = undone & (iou > iou_threshold)

        # heading alignment toward the top box
        dh = boxes_s[:, 6] - top_box[6]
        shift = jnp.where(
            jnp.abs(dh) >= np.pi * 3 / 2,
            jnp.where(top_box[6] > 0, 2 * np.pi, -2 * np.pi), 0.0)
        headings = boxes_s[:, 6] + shift
        cluster_boxes = jnp.concatenate(
            [boxes_s[:, :6], headings[:, None]], axis=1)

        w_iou = jnp.exp(-(1.0 - iou) ** 2 / std_iou_sigma)[:, None]
        pi = w_iou / var_s                                    # (pre, 7)
        heading_ok = jnp.abs(headings - top_box[6]) < np.pi / 4
        pi = pi.at[:, 6].set(jnp.where(heading_ok, pi[:, 6], 0.0))
        pi = jnp.where(cluster[:, None], pi, 0.0)
        denom = jnp.clip(pi.sum(axis=0), 1e-20, None)
        voted_box = (pi * cluster_boxes).sum(axis=0) / denom
        voted_box = jnp.where(valid, voted_box, jnp.zeros(7))

        live = jnp.where(cluster, _NEG_INF, live)
        live = live.at[i].set(_NEG_INF)
        keep_idx = keep_idx.at[k].set(jnp.where(valid, i, 0))
        keep_valid = keep_valid.at[k].set(valid)
        voted = voted.at[k].set(voted_box)
        kept_scores = kept_scores.at[k].set(jnp.where(valid, scores_s[i], 0.0))
        return live, keep_idx, keep_valid, voted, kept_scores

    keep_idx = jnp.zeros((post_max,), jnp.int32)
    keep_valid = jnp.zeros((post_max,), bool)
    voted = jnp.zeros((post_max, 7), jnp.float32)
    kept_scores = jnp.zeros((post_max,), jnp.float32)
    _, keep_idx, keep_valid, voted, kept_scores = jax.lax.fori_loop(
        0, post_max, body, (live, keep_idx, keep_valid, voted, kept_scores))
    return order[keep_idx], keep_valid, voted, kept_scores
