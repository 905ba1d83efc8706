"""Point-based heads (PointRCNN first stage).

PointHeadBox semantics per reference pcdet/models/dense_heads/
point_head_box.py + point_head_template.py:
  - targets: points inside a gt box take its class; points inside the
    0.2 m-enlarged box (but outside the box) are ignored (-1);
  - cls: sigmoid focal over classes, normalized by positive count;
  - reg: PointResidualCoder encodings (class mean sizes), weighted
    smooth-L1 over fg points;
  - predict: decode per-point boxes, score = max sigmoid cls.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import box_utils, losses
from .layers import MaskedBatchNorm


class PointHeadBox(nn.Module):
    num_class: int
    code_size: int = 8
    cls_fc: Sequence[int] = (256, 256)
    reg_fc: Sequence[int] = (256, 256)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, point_features, mask, train: bool = True):
        """point_features (N, C), mask (N,) -> cls (N, num_class),
        box (N, code_size)."""
        def stack(x, sizes, name):
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, mask=mask, use_running_average=not train)
                x = nn.relu(x)
            return x

        h_cls = stack(point_features, self.cls_fc, 'cls')
        cls = nn.Dense(self.num_class, name='cls_out')(h_cls)
        h_reg = stack(point_features, self.reg_fc, 'reg')
        box = nn.Dense(self.code_size, name='box_out',
                       kernel_init=nn.initializers.normal(0.001))(h_reg)
        return {'point_cls_preds': cls, 'point_box_preds': box}


class PointIntraPartOffsetHead(nn.Module):
    """Part-aware point head (PartA2, reference point_intra_part_head.py):
    per-point (voxel-point) foreground segmentation + intra-object part
    location in [0,1]^3.  PartA2.yaml uses empty CLS_FC/PART_FC, i.e.
    single linear output layers."""
    num_class: int = 1
    cls_fc: Sequence[int] = ()
    part_fc: Sequence[int] = ()
    reg_fc: Sequence[int] = ()
    code_size: int = 0   # > 0 adds the anchor-free box branch (PartA2_free,
    #                      point_intra_part_head.py:31-37 REG_FC box_layers)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, point_features, mask, train: bool = True):
        def stack(x, sizes, name):
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, mask=mask, use_running_average=not train)
                x = nn.relu(x)
            return x

        cls = nn.Dense(self.num_class, name='cls_out')(
            stack(point_features, self.cls_fc, 'cls'))
        part = nn.Dense(3, name='part_out')(
            stack(point_features, self.part_fc, 'part'))
        out = {'point_cls_preds': cls, 'point_part_preds': part}
        if self.code_size > 0:
            out['point_box_preds'] = nn.Dense(
                self.code_size, name='box_out',
                kernel_init=nn.initializers.normal(0.001))(
                stack(point_features, self.reg_fc, 'reg'))
        return out


def assign_part_targets(points_xyz, points_mask, gt_boxes, gt_mask,
                        extra_width=(0.2, 0.2, 0.2)):
    """Seg labels (1 fg / -1 ignore / 0 bg, class-agnostic) + intra-part
    location targets in [0,1]^3 (point_head_template.py:114-122:
    rotate(point - center, -heading) / dims + 0.5)."""
    from ..utils import common
    inside = box_utils.points_in_boxes(points_xyz, gt_boxes[:, :7])
    inside = inside & gt_mask[None, :]
    m = gt_boxes.shape[0]
    enlarged = gt_boxes[:, :7] + jnp.concatenate(
        [jnp.zeros((m, 3)),
         jnp.broadcast_to(jnp.asarray(extra_width), (m, 3)),
         jnp.zeros((m, 1))], axis=1)
    inside_big = box_utils.points_in_boxes(points_xyz, enlarged) \
        & gt_mask[None, :]
    box_idx = inside.argmax(axis=1)
    is_fg = inside.any(axis=1) & points_mask
    is_ignore = inside_big.any(axis=1) & ~is_fg & points_mask
    seg = jnp.where(is_fg, 1, 0)
    seg = jnp.where(is_ignore, -1, seg)

    gt_of = gt_boxes[box_idx]                                  # (N, 8)
    local = common.rotate_points_along_z(
        (points_xyz - gt_of[:, 0:3])[:, None, :], -gt_of[:, 6])[:, 0]
    part = jnp.clip(local / gt_of[:, 3:6] + 0.5, 0.0, 1.0)
    part = jnp.where(is_fg[:, None], part, 0.0)
    return seg, part, is_fg


def intra_part_loss(out, seg_labels, part_labels, fg_mask, loss_weights):
    """Focal seg + BCE part over fg (point_head_template.py:131-168)."""
    cls_preds = out['point_cls_preds']
    cared = seg_labels >= 0
    pos = seg_labels > 0
    num_class = cls_preds.shape[-1]
    one_hot = jax.nn.one_hot(jnp.clip(seg_labels, 0, None), num_class + 1,
                             dtype=cls_preds.dtype)[:, 1:]
    w = cared.astype(jnp.float32) / jnp.clip(pos.sum(), 1.0, None)
    cls_loss = losses.sigmoid_focal_loss(
        cls_preds[None], one_hot[None], w[None]).sum()
    cls_loss = cls_loss * loss_weights.get('point_cls_weight', 1.0)

    part_prob = jax.nn.sigmoid(out['point_part_preds'])
    bce = -(part_labels * jnp.log(jnp.clip(part_prob, 1e-7, None))
            + (1 - part_labels) * jnp.log(jnp.clip(1 - part_prob, 1e-7,
                                                   None)))
    part_loss = (bce.mean(axis=-1) * fg_mask).sum() \
        / jnp.clip(fg_mask.sum(), 1.0, None)
    part_loss = part_loss * loss_weights.get('point_part_weight', 1.0)
    return cls_loss, part_loss


def assign_point_targets(points_xyz, points_mask, gt_boxes, gt_mask,
                         box_coder, extra_width=(0.2, 0.2, 0.2)):
    """Per-sample point targets (point_head_template.py assign_stack_targets).

    Returns cls labels (N,) int (-1 ignored, 0 bg, else class), encoded box
    targets (N, code), fg mask (N,)."""
    inside = box_utils.points_in_boxes(points_xyz, gt_boxes[:, :7])  # (N, M)
    inside = inside & gt_mask[None, :]
    enlarged = gt_boxes[:, :7] + jnp.concatenate(
        [jnp.zeros((gt_boxes.shape[0], 3)),
         jnp.broadcast_to(jnp.asarray(extra_width), (gt_boxes.shape[0], 3)),
         jnp.zeros((gt_boxes.shape[0], 1))], axis=1)
    inside_big = box_utils.points_in_boxes(points_xyz, enlarged) & gt_mask[None, :]

    box_idx = inside.argmax(axis=1)
    is_fg = inside.any(axis=1) & points_mask
    is_ignore = inside_big.any(axis=1) & ~is_fg & points_mask

    cls = jnp.where(is_fg, gt_boxes[box_idx, 7].astype(jnp.int32), 0)
    cls = jnp.where(is_ignore, -1, cls)
    targets = box_coder.encode(gt_boxes[box_idx, :7], points_xyz,
                               gt_boxes[box_idx, 7].astype(jnp.int32))
    targets = jnp.where(is_fg[:, None], targets, 0.0)
    return cls, targets, is_fg


def point_head_loss(out, cls_labels, box_targets, fg_mask, num_class,
                    loss_weights):
    """Focal cls + smooth-L1 reg (point_head_template losses)."""
    cls_preds = out['point_cls_preds']
    cared = cls_labels >= 0
    pos = cls_labels > 0
    one_hot = jax.nn.one_hot(jnp.clip(cls_labels, 0, None), num_class + 1,
                             dtype=cls_preds.dtype)[:, 1:]
    w = cared.astype(jnp.float32) / jnp.clip(pos.sum(), 1.0, None)
    cls_loss = losses.sigmoid_focal_loss(
        cls_preds[None], one_hot[None], w[None]).sum()
    cls_loss = cls_loss * loss_weights.get('point_cls_weight', 1.0)

    reg = losses.weighted_smooth_l1(
        out['point_box_preds'][None], box_targets[None],
        fg_mask.astype(jnp.float32)[None] / jnp.clip(pos.sum(), 1.0, None))
    reg_loss = reg.sum() * loss_weights.get('point_box_weight', 1.0)
    return cls_loss, reg_loss
