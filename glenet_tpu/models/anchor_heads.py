"""Anchor-based dense heads: forward modules (flax.linen) + pure-functional
loss / decode companions.

Design note: unlike the reference's stateful heads
(pcdet/models/dense_heads/anchor_head_*.py) that stash tensors in
`forward_ret_dict`, here the module only computes conv outputs; target
assignment, losses, and decoding are pure functions called by the train /
eval step.  Semantics:
  - AnchorHeadSingle: anchor_head_single.py:7-75 +
    anchor_head_template.py:109-280 (focal cls, sin-diff smooth-L1,
    direction-bin CE, dir-corrected decode).
  - AnchorHeadKLLabel (GLENet-S): anchor_head_kl_label.py:10-252 — extra
    log-variance branch (init std 1e-4), KLD reg loss against per-label
    variance.
  - AnchorHeadKLLabelIoU (GLENet-C): :255-438 — extra IoU branch with
    target 2*IoU(pred, gt)-1 and iou-rectified confidence at decode.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iou3d
from ..utils import common, losses


def _head_conv(features, name, kernel_init=None, bias_init=None):
    return nn.Conv(features, (1, 1), padding='VALID', name=name,
                   kernel_init=kernel_init or nn.initializers.lecun_normal(),
                   bias_init=bias_init or nn.initializers.zeros)


class AnchorHeadSingle(nn.Module):
    """1x1 conv heads on BEV features. Input (B, H, W, C)."""
    num_class: int
    num_anchors_per_location: int
    code_size: int = 7
    num_dir_bins: int = 0  # 0 = no direction classifier

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = self.num_anchors_per_location
        # focal-style bias init for the cls head (reference init pi=0.01)
        cls_bias = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))
        cls = _head_conv(a * self.num_class, 'conv_cls', bias_init=cls_bias)(x)
        box = _head_conv(a * self.code_size, 'conv_box',
                         kernel_init=nn.initializers.normal(0.001))(x)
        out = {
            'cls_preds': cls.reshape(*x.shape[:3], a, self.num_class),
            'box_preds': box.reshape(*x.shape[:3], a, self.code_size),
        }
        if self.num_dir_bins > 0:
            d = _head_conv(a * self.num_dir_bins, 'conv_dir_cls')(x)
            out['dir_cls_preds'] = d.reshape(*x.shape[:3], a, self.num_dir_bins)
        return out


class AnchorHeadKLLabel(nn.Module):
    """AnchorHeadSingle + optional log-variance / IoU branches.

    with_std_branch + not with_iou_branch -> AnchorHeadKLLabel (GLENet-S);
    both -> AnchorHeadKLLabelIoU (GLENet-C); iou only -> AnchorHeadIoU
    (CIA-SSD, anchor_head_iou.py:10-222)."""
    num_class: int
    num_anchors_per_location: int
    code_size: int = 7
    num_dir_bins: int = 0
    with_iou_branch: bool = False
    with_std_branch: bool = True
    with_guide: bool = False   # AnchorHeadKLLabelIoUGuide (:441-518)

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = self.num_anchors_per_location
        cls_bias = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))
        cls = _head_conv(a * self.num_class, 'conv_cls', bias_init=cls_bias)(x)
        box = _head_conv(a * self.code_size, 'conv_box',
                         kernel_init=nn.initializers.normal(0.001))(x)
        out = {
            'cls_preds': cls.reshape(*x.shape[:3], a, self.num_class),
            'box_preds': box.reshape(*x.shape[:3], a, self.code_size),
        }
        std_raw = None
        if self.with_std_branch:
            std_raw = _head_conv(a * self.code_size, 'conv_box_std',
                                 kernel_init=nn.initializers.normal(0.0001))(x)
            out['box_std_preds'] = std_raw.reshape(*x.shape[:3], a,
                                                   self.code_size)
        if self.num_dir_bins > 0:
            d = _head_conv(a * self.num_dir_bins, 'conv_dir_cls')(x)
            out['dir_cls_preds'] = d.reshape(*x.shape[:3], a, self.num_dir_bins)
        if self.with_iou_branch:
            iou = _head_conv(a * self.num_class, 'conv_iou',
                             kernel_init=nn.initializers.normal(0.001))(x)
            if self.with_guide:
                # variance-guided IoU rescaling (anchor_head_kl_label.py
                # :449-471): sigmoid(1x1-conv MLP of the std map) gates iou
                h = _head_conv(64, 'std_conv1',
                               kernel_init=nn.initializers.normal(0.001))(
                    std_raw)
                h = nn.relu(h)
                gate = _head_conv(1, 'std_conv2',
                                  kernel_init=nn.initializers.normal(0.001))(h)
                iou = iou * jax.nn.sigmoid(gate)
            out['iou_preds'] = iou.reshape(*x.shape[:3], a, self.num_class)
        return out


class AnchorHeadMulti(nn.Module):
    """Grouped-class multi-head (reference anchor_head_multi.py:151-373):
    a shared 3x3 conv, then one small head per class group with its own
    cls/box/dir 1x1 convs over that group's anchors.

    Output contract matches AnchorHeadSingle's global (B, H, W, A_total, .)
    layout: per-head outputs are concatenated along the anchor axis (class
    groups are contiguous in the anchor set) and each head's class logits
    land in its global class columns, with a -20 constant logit
    (sigmoid ~ 0) for classes a head never predicts — so every loss/decode
    companion works unchanged.
    """
    num_class: int
    class_names: tuple            # global class order
    anchors_per_class: tuple      # per-class anchors per location (s*r)
    head_groups: tuple            # tuple of tuples of class names
    code_size: int = 7
    num_dir_bins: int = 0
    shared_ch: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .layers import ConvBlock
        if self.shared_ch:
            x = ConvBlock(self.shared_ch, 3, 1, padding=1,
                          axis_name=self.axis_name,
                          name='shared_conv')(x, train=train)
        b, h, w = x.shape[:3]
        name_to_idx = {n: i for i, n in enumerate(self.class_names)}
        cls_bias = nn.initializers.constant(-np.log((1 - 0.01) / 0.01))

        cls_out, box_out, dir_out = [], [], []
        for hi, group in enumerate(self.head_groups):
            idxs = [name_to_idx[n] for n in group]
            a_h = sum(self.anchors_per_class[i] for i in idxs)
            n_h = len(group)
            cls = _head_conv(a_h * n_h, f'head{hi}_conv_cls',
                             bias_init=cls_bias)(x)
            cls = cls.reshape(b, h, w, a_h, n_h)
            full = jnp.full((b, h, w, a_h, self.num_class), -20.0, x.dtype)
            for col, ci in enumerate(idxs):
                full = full.at[..., ci].set(cls[..., col])
            cls_out.append(full)
            box = _head_conv(a_h * self.code_size, f'head{hi}_conv_box',
                             kernel_init=nn.initializers.normal(0.001))(x)
            box_out.append(box.reshape(b, h, w, a_h, self.code_size))
            if self.num_dir_bins > 0:
                d = _head_conv(a_h * self.num_dir_bins,
                               f'head{hi}_conv_dir_cls')(x)
                dir_out.append(d.reshape(b, h, w, a_h, self.num_dir_bins))

        out = {'cls_preds': jnp.concatenate(cls_out, axis=3),
               'box_preds': jnp.concatenate(box_out, axis=3)}
        if dir_out:
            out['dir_cls_preds'] = jnp.concatenate(dir_out, axis=3)
        return out


# ---------------------------------------------------------------------------
# Pure-functional loss / decode companions
# ---------------------------------------------------------------------------

def _flatten_preds(out):
    """(B, H, W, A, C) head outputs -> (B, N, C)."""
    return {k: v.reshape(v.shape[0], -1, v.shape[-1]) for k, v in out.items()}


def cls_loss(cls_preds, box_cls_labels, num_class):
    """Focal classification loss (reference template :109-143).

    Args: cls_preds (B, N, num_class); box_cls_labels (B, N) int.
    Returns scalar (summed / batch), pre-cls_weight.
    """
    batch_size = cls_preds.shape[0]
    cared = box_cls_labels >= 0
    positives = box_cls_labels > 0
    negatives = box_cls_labels == 0
    cls_weights = (negatives + positives).astype(jnp.float32)
    pos_normalizer = jnp.clip(positives.sum(axis=1, keepdims=True), 1, None)
    cls_weights = cls_weights / pos_normalizer

    labels = jnp.where(cared, box_cls_labels, 0)
    if num_class == 1:
        labels = jnp.where(positives, 1, labels)
    one_hot = jax.nn.one_hot(labels, num_class + 1, dtype=cls_preds.dtype)[..., 1:]
    loss = losses.sigmoid_focal_loss(cls_preds, one_hot, cls_weights)
    return loss.sum() / batch_size


def get_direction_targets(anchors, box_reg_targets, dir_offset, num_bins):
    """(B, N) int direction-bin targets (reference template :156-171)."""
    rot_gt = box_reg_targets[..., 6] + anchors[..., 6]
    offset_rot = common.limit_period(rot_gt - dir_offset, 0, 2 * np.pi)
    dir_cls = jnp.floor(offset_rot / (2 * np.pi / num_bins)).astype(jnp.int32)
    return jnp.clip(dir_cls, 0, num_bins - 1)


def dir_loss(dir_cls_preds, dir_targets, positives, num_bins):
    """Direction-bin CE loss, pos-normalized (template :210-221)."""
    batch_size = dir_cls_preds.shape[0]
    weights = positives.astype(jnp.float32)
    weights = weights / jnp.clip(weights.sum(axis=-1, keepdims=True), 1.0, None)
    one_hot = jax.nn.one_hot(dir_targets, num_bins, dtype=dir_cls_preds.dtype)
    loss = losses.weighted_cross_entropy(dir_cls_preds, one_hot, weights)
    return loss.sum() / batch_size


def reg_loss_smooth_l1(box_preds, box_reg_targets, box_cls_labels,
                       code_weights=None):
    """Sin-difference smooth-L1 regression loss (template :173-203)."""
    batch_size = box_preds.shape[0]
    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    preds_sin, targets_sin = losses.add_sin_difference(box_preds, box_reg_targets)
    loss = losses.weighted_smooth_l1(preds_sin, targets_sin, reg_weights,
                                     code_weights=code_weights)
    return loss.sum() / batch_size


def reg_loss_kl_label(box_preds, box_std_preds, box_reg_targets,
                      box_cls_labels, label_uncertainty, code_weights=None):
    """GLENet KLD regression loss (anchor_head_kl_label.py:131-221)."""
    batch_size = box_preds.shape[0]
    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    total, parts = losses.kl_label_reg_loss(
        box_preds, box_std_preds, box_reg_targets, reg_weights,
        label_uncertainty, code_weights=code_weights)
    return total / batch_size, {k: v / batch_size for k, v in parts.items()}


def reg_loss_kl(box_preds, box_std_preds, box_reg_targets, box_cls_labels,
                code_weights=None):
    """Predicted-variance KL loss without label variance:
    exp(-s) * smoothL1 + 0.5 * s * w (anchor_head_kl.py:144-145)."""
    batch_size = box_preds.shape[0]
    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    preds_sin, targets_sin = losses.add_sin_difference(box_preds, box_reg_targets)
    l1 = losses.weighted_smooth_l1(preds_sin, targets_sin, reg_weights,
                                   code_weights=code_weights)
    s = box_std_preds
    loss = jnp.exp(-s) * l1 + 0.5 * s * reg_weights[..., None]
    return loss.sum() / batch_size


def reg_loss_odiou(box_preds, box_reg_targets, box_cls_labels, flat_anchors,
                   box_coder):
    """SE-SSD od-IoU regression loss on decoded boxes
    (anchor_head_sessd.py:171-258)."""
    batch_size = box_preds.shape[0]
    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)
    anchors = jnp.broadcast_to(flat_anchors[None],
                               (batch_size, *flat_anchors.shape))
    pred_boxes = box_coder.decode(box_preds, anchors).reshape(-1, 7)
    gt_boxes = jax.lax.stop_gradient(
        box_coder.decode(box_reg_targets, anchors)).reshape(-1, 7)
    return losses.odiou_3d_loss(gt_boxes, pred_boxes,
                                reg_weights.reshape(-1), batch_size)


def iou_branch_loss(iou_preds, box_preds, box_reg_targets, box_cls_labels,
                    flat_anchors, box_coder):
    """IoU-prediction branch loss (anchor_head_kl_label.py:394-438).

    Target = 2 * IoU3D(decoded pred, decoded gt) - 1 on positives,
    smooth-L1, pos-normalized.
    """
    batch_size = iou_preds.shape[0]
    positives = box_cls_labels > 0
    reg_weights = positives.astype(jnp.float32)
    reg_weights = reg_weights / jnp.clip(
        positives.sum(axis=1, keepdims=True).astype(jnp.float32), 1.0, None)

    anchors = jnp.broadcast_to(flat_anchors[None], (batch_size, *flat_anchors.shape))
    pred_boxes = box_coder.decode(box_preds, anchors)
    gt_boxes = box_coder.decode(box_reg_targets, anchors)

    def per_sample(pb, gb):
        return iou3d.boxes_aligned_iou3d(pb, gb)
    iou_target = jax.vmap(per_sample)(pred_boxes[..., :7], gt_boxes[..., :7])
    iou_target = jax.lax.stop_gradient(2.0 * iou_target - 1.0)
    # masked positions contribute 0 via reg_weights
    loss = losses.weighted_smooth_l1(
        iou_preds[..., 0:1], iou_target[..., None], reg_weights)
    return loss.sum() / batch_size


def decode_predictions(out, flat_anchors, box_coder, dir_offset=0.78539,
                       dir_limit_offset=0.0, num_dir_bins=2):
    """Head outputs -> decoded (B, N, num_class) scores + (B, N, 7) boxes.

    Matches template :233-280 incl. direction-bin heading correction.
    Returns dict with raw (un-sigmoided) cls logits; callers apply sigmoid /
    iou rectification per model config.
    """
    flat = _flatten_preds(out)
    b = flat['cls_preds'].shape[0]
    anchors = jnp.broadcast_to(flat_anchors[None], (b, *flat_anchors.shape))
    boxes = box_coder.decode(flat['box_preds'], anchors)
    if 'dir_cls_preds' in flat and num_dir_bins > 0:
        dir_labels = flat['dir_cls_preds'].argmax(axis=-1)
        period = 2 * np.pi / num_dir_bins
        dir_rot = common.limit_period(
            boxes[..., 6] - dir_offset, dir_limit_offset, period)
        heading = dir_rot + dir_offset + period * dir_labels.astype(boxes.dtype)
        boxes = jnp.concatenate([boxes[..., :6], heading[..., None],
                                 boxes[..., 7:]], axis=-1)
    result = {'batch_cls_preds': flat['cls_preds'], 'batch_box_preds': boxes}
    if 'box_std_preds' in flat:
        result['batch_box_std_preds'] = flat['box_std_preds']
    if 'iou_preds' in flat:
        result['batch_iou_preds'] = flat['iou_preds']
    return result
