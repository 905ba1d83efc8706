"""Detection losses (pure-functional JAX).

Math contracts follow the reference pcdet/utils/loss_utils.py:
  - sigmoid_focal_loss (:8-71): alpha/gamma focal with stable BCE-with-logits.
  - weighted_smooth_l1 (:74-138): beta knee, per-code weights, nan-target mask.
  - weighted_cross_entropy (:182-207).
  - corner_loss_lidar (:210-233): min over heading flip, smooth-L1 beta=1.
KL-divergence regression loss with label variance follows
pcdet/models/dense_heads/anchor_head_kl_label.py:131-221.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import box_utils


def sigmoid_bce_with_logits(logits, targets):
    """Numerically-stable BCE: max(x,0) - x*z + log1p(exp(-|x|))."""
    return (jnp.clip(logits, 0, None) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def sigmoid_focal_loss(logits, targets, weights, gamma: float = 2.0, alpha: float = 0.25):
    """Args: logits/targets (B, N, C); weights (B, N) or (B, N, C).
    Returns elementwise (B, N, C) weighted focal loss."""
    pred_sigmoid = jax.nn.sigmoid(logits)
    alpha_weight = targets * alpha + (1 - targets) * (1 - alpha)
    pt = targets * (1.0 - pred_sigmoid) + (1.0 - targets) * pred_sigmoid
    focal_weight = alpha_weight * jnp.power(pt, gamma)
    loss = focal_weight * sigmoid_bce_with_logits(logits, targets)
    if weights.ndim == loss.ndim - 1:
        weights = weights[..., None]
    return loss * weights


def smooth_l1(diff, beta: float = 1.0 / 9.0):
    if beta < 1e-5:
        return jnp.abs(diff)
    n = jnp.abs(diff)
    return jnp.where(n < beta, 0.5 * n ** 2 / beta, n - 0.5 * beta)


def weighted_smooth_l1(preds, targets, weights=None, beta: float = 1.0 / 9.0,
                       code_weights=None):
    """(B, N, C) elementwise smooth L1; nan targets are ignored (treated as
    zero-residual, reference loss_utils.py:123)."""
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, jnp.float32)
    loss = smooth_l1(diff, beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_l1(preds, targets, weights=None, code_weights=None):
    targets = jnp.where(jnp.isnan(targets), preds, targets)
    diff = preds - targets
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, jnp.float32)
    loss = jnp.abs(diff)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


def weighted_cross_entropy(logits, one_hot_targets, weights):
    """(B, N, C) logits/one-hot -> (B, N) weighted CE."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.sum(one_hot_targets * logp, axis=-1)
    return loss * weights


def corner_loss_lidar(pred_boxes, gt_boxes, mask=None):
    """(N, 7) boxes -> (N,) corner loss (min over pi heading flip).

    Reference: pcdet/utils/loss_utils.py:210-233 (smooth-L1 with beta=1 on
    per-corner distances, mean over the 8 corners).
    """
    pred_corners = box_utils.boxes_to_corners_3d(pred_boxes)
    gt_corners = box_utils.boxes_to_corners_3d(gt_boxes)
    gt_flip = gt_boxes.at[:, 6].add(np.pi)
    gt_corners_flip = box_utils.boxes_to_corners_3d(gt_flip)
    dist = jnp.minimum(
        jnp.linalg.norm(pred_corners - gt_corners, axis=2),
        jnp.linalg.norm(pred_corners - gt_corners_flip, axis=2))  # (N, 8)
    loss = smooth_l1(dist, beta=1.0).mean(axis=1)
    if mask is not None:
        loss = loss * mask
    return loss


def odiou_3d_loss(gboxes, qboxes, weights, batch_size):
    """SE-SSD differentiable orientation-distance IoU loss.

    odiou = 1 - IoU3D + d_center^2 / mbr_diag3d^2 + 1.25 (1 - |cos dtheta|);
    loss = 2 * sum(odiou * weights) / batch_size.
    Reference: pcdet/utils/loss_utils.py odiou_3D (:1110-1190) — the
    convex-hull autograd pipeline is replaced by our differentiable
    dense-candidate rotated overlap (ops/iou3d).

    Args: gboxes, qboxes (N, 7) row-aligned; weights (N,).
    """
    from ..ops import iou3d
    g = jnp.clip(gboxes, -200.0, 200.0)
    q = jnp.clip(qboxes, -200.0, 200.0)
    valid = ((g[:, 3:6] > 0).all(axis=1) & (q[:, 3:6] > 0).all(axis=1))

    angle_factor = 1.25 * (1.0 - jnp.abs(jnp.cos(q[:, 6] - g[:, 6])))

    cg = iou3d.box_to_bev_corners(g)                      # (N, 4, 2)
    cq = iou3d.box_to_bev_corners(q)
    inter_area = iou3d.overlap_bev_corners(cg, cq)
    inter_h = jnp.clip(
        jnp.minimum(g[:, 2] + g[:, 5] / 2, q[:, 2] + q[:, 5] / 2)
        - jnp.maximum(g[:, 2] - g[:, 5] / 2, q[:, 2] - q[:, 5] / 2), 0, None)
    vol_inc = inter_area * inter_h
    vol_union = (g[:, 3] * g[:, 4] * g[:, 5] + q[:, 3] * q[:, 4] * q[:, 5]
                 - vol_inc)
    ious = vol_inc / jnp.clip(vol_union, 1e-7, None)

    # minimum (axis-aligned) bounding rectangle of both corner sets
    all_corners = jnp.concatenate([cg, cq], axis=1)       # (N, 8, 2)
    mbr_min = all_corners.min(axis=1)
    mbr_max = all_corners.max(axis=1)
    mbr_diag_bev_sq = ((mbr_max - mbr_min) ** 2).sum(axis=1)
    mbr_diag_3d_sq = mbr_diag_bev_sq + inter_h ** 2 + 1e-7
    d_center_sq = ((g[:, 0:3] - q[:, 0:3]) ** 2).sum(axis=1)

    odious = 1.0 - ious + d_center_sq / mbr_diag_3d_sq + angle_factor
    odious = jnp.where(valid, odious, 0.0)
    return 2.0 * (odious * weights).sum() / batch_size


def add_sin_difference(boxes1, boxes2, dim: int = 6):
    """Encode heading residual via sin(a-b) = sin a cos b - cos a sin b.

    Reference: anchor_head_template.py add_sin_difference.
    """
    rad_pred = jnp.sin(boxes1[..., dim:dim + 1]) * jnp.cos(boxes2[..., dim:dim + 1])
    rad_tg = jnp.cos(boxes1[..., dim:dim + 1]) * jnp.sin(boxes2[..., dim:dim + 1])
    boxes1 = jnp.concatenate(
        [boxes1[..., :dim], rad_pred, boxes1[..., dim + 1:]], axis=-1)
    boxes2 = jnp.concatenate(
        [boxes2[..., :dim], rad_tg, boxes2[..., dim + 1:]], axis=-1)
    return boxes1, boxes2


def kl_label_reg_loss(box_preds, box_std_preds, box_reg_targets, reg_weights,
                      label_uncertainty, code_weights=None, beta: float = 1.0 / 9.0):
    """GLENet KL-divergence regression loss with per-label variance.

    Given predicted log-variance s (clamped >= -50) and label log-variance
    t = log(sigma_label^2 + 1e-10), per positive anchor and code dim:

        L = exp(-s) * smoothL1(sin-diff residual) + exp(t - s) - 0.5 * (t - s)

    weighted by pos-normalized reg_weights, summed, / batch_size.
    Reference: anchor_head_kl_label.py:131-221.

    Args:
        box_preds:        (B, N, C) encoded residual predictions
        box_std_preds:    (B, N, C) predicted log variance
        box_reg_targets:  (B, N, C) encoded residual targets
        reg_weights:      (B, N) pos-normalized anchor weights
        label_uncertainty:(B, N, C) per-anchor gt label variance (>= 0;
                          the assigner fills 0 for background anchors)
    Returns: (scalar loc_loss_sum, dict of unreduced parts) — caller divides
        by batch size and applies loc_weight.
    """
    s = jnp.clip(box_std_preds, -50.0, None)
    t = jnp.log(label_uncertainty + 1e-10)
    preds_sin, targets_sin = add_sin_difference(box_preds, box_reg_targets)
    l1 = weighted_smooth_l1(preds_sin, targets_sin, weights=reg_weights,
                            beta=beta, code_weights=code_weights)
    w = reg_weights[..., None]
    loss_src = jnp.exp(-s) * l1
    loss_square = jnp.exp(t - s) * w
    loss_log = -0.5 * (t - s) * w
    parts = {
        'loc_loss_src': loss_src.sum(),
        'loc_loss_square': loss_square.sum(),
        'loc_loss_log': loss_log.sum(),
    }
    return parts['loc_loss_src'] + parts['loc_loss_square'] + parts['loc_loss_log'], parts
