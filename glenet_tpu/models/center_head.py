"""CenterPoint head: gaussian heatmap targets, CenterNet focal loss,
per-location box regression, top-k decode.

Semantics per reference pcdet/models/dense_heads/center_head.py:103-322 and
model_utils/centernet_utils.py (gaussian radius, heatmap draw, topk decode),
vectorized for TPU: heatmaps are built as a max over per-gt gaussian maps
(static MAX_GT objects) instead of sequential draws.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MaskedBatchNorm


def gaussian_radius(dx, dy, min_overlap=0.5):
    """CenterNet radius rule (centernet_utils.py gaussian_radius)."""
    a1 = 1
    b1 = dx + dy
    c1 = dx * dy * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.clip(b1 ** 2 - 4 * a1 * c1, 0, None))
    r1 = (b1 + sq1) / 2
    a2 = 4
    b2 = 2 * (dx + dy)
    c2 = (1 - min_overlap) * dx * dy
    sq2 = jnp.sqrt(jnp.clip(b2 ** 2 - 4 * a2 * c2, 0, None))
    r2 = (b2 + sq2) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (dx + dy)
    c3 = (min_overlap - 1) * dx * dy
    sq3 = jnp.sqrt(jnp.clip(b3 ** 2 - 4 * a3 * c3, 0, None))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def assign_targets_single(gt_boxes, gt_mask, num_classes, feature_map_size,
                          feature_map_stride, voxel_size, pc_range,
                          gaussian_overlap=0.1, min_radius=2):
    """One sample: (M, 8) gt -> heatmap (C, H, W), target boxes (M, 8+),
    flat inds (M,), mask (M,).  H = y, W = x."""
    w, h = feature_map_size  # (x, y)
    x, y, z = gt_boxes[:, 0], gt_boxes[:, 1], gt_boxes[:, 2]
    coord_x = (x - pc_range[0]) / voxel_size[0] / feature_map_stride
    coord_y = (y - pc_range[1]) / voxel_size[1] / feature_map_stride
    coord_x = jnp.clip(coord_x, 0, w - 0.5)
    coord_y = jnp.clip(coord_y, 0, h - 0.5)
    center_int_x = coord_x.astype(jnp.int32)
    center_int_y = coord_y.astype(jnp.int32)

    dxf = gt_boxes[:, 3] / voxel_size[0] / feature_map_stride
    dyf = gt_boxes[:, 4] / voxel_size[1] / feature_map_stride
    radius = jnp.clip(gaussian_radius(dxf, dyf, gaussian_overlap)
                      .astype(jnp.int32), min_radius, None).astype(jnp.float32)
    valid = gt_mask & (dxf > 0) & (dyf > 0)

    # vectorized gaussian draw: max over objects per class
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    sigma = radius / 3.0
    d2 = ((xs[None] - center_int_x[:, None, None].astype(jnp.float32)) ** 2
          + (ys[None] - center_int_y[:, None, None].astype(jnp.float32)) ** 2)
    g = jnp.exp(-d2 / (2 * jnp.clip(sigma, 1e-3, None)[:, None, None] ** 2))
    # zero beyond the radius box (reference draws a (2r+1)^2 patch)
    within = ((jnp.abs(xs[None] - center_int_x[:, None, None]) <= radius[:, None, None])
              & (jnp.abs(ys[None] - center_int_y[:, None, None]) <= radius[:, None, None]))
    g = jnp.where(within & valid[:, None, None], g, 0.0)
    cls_ids = gt_boxes[:, 7].astype(jnp.int32) - 1
    onehot = jax.nn.one_hot(cls_ids, num_classes, dtype=g.dtype)  # (M, C)
    heatmap = (g[:, None] * onehot[:, :, None, None]).max(axis=0)  # (C, H, W)

    inds = center_int_y * w + center_int_x
    ret = jnp.concatenate([
        (coord_x - center_int_x.astype(jnp.float32))[:, None],
        (coord_y - center_int_y.astype(jnp.float32))[:, None],
        z[:, None],
        jnp.log(jnp.clip(gt_boxes[:, 3:6], 1e-5, None)),
        jnp.cos(gt_boxes[:, 6])[:, None],
        jnp.sin(gt_boxes[:, 6])[:, None],
    ], axis=1)
    return heatmap, ret, inds, valid.astype(jnp.int32)


class CenterHead(nn.Module):
    """Single-group CenterPoint head (all classes in one head)."""
    num_class: int
    shared_ch: int = 64
    use_bias_before_norm: bool = False   # cfg USE_BIAS_BEFORE_NORM
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x (B, H, W, C) -> dict of dense maps."""
        h = nn.Conv(self.shared_ch, (3, 3), padding='SAME',
                    use_bias=self.use_bias_before_norm)(x)
        h = MaskedBatchNorm(axis_name=self.axis_name)(
            h, use_running_average=not train)
        h = nn.relu(h)

        def head(out_ch, name, bias_init=0.0):
            # SeparateHead branch (center_head.py:22-27): [Conv3x3 no-bias,
            # BN, ReLU] x (num_conv-1) + final biased Conv3x3; num_conv=2
            # (the HEAD_DICT/NUM_HM_CONV default in every reference config)
            y = nn.Conv(self.shared_ch, (3, 3), padding='SAME',
                        use_bias=self.use_bias_before_norm,
                        name=f'{name}_0')(h)
            y = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'{name}_bn0')(
                y, use_running_average=not train)
            y = nn.relu(y)
            return nn.Conv(out_ch, (3, 3), padding='SAME', name=f'{name}_1',
                           bias_init=nn.initializers.constant(bias_init))(y)

        return {
            'hm': head(self.num_class, 'hm', bias_init=-2.19),  # focal init
            'center': head(2, 'center'),
            'center_z': head(1, 'center_z'),
            'dim': head(3, 'dim'),
            'rot': head(2, 'rot'),
        }


def centernet_focal_loss(pred_hm, gt_hm):
    """CenterNet focal (loss_utils.py FocalLossCenterNet)."""
    pred = jnp.clip(jax.nn.sigmoid(pred_hm), 1e-4, 1 - 1e-4)
    pos = (gt_hm == 1.0).astype(pred.dtype)
    neg_weights = jnp.power(1 - gt_hm, 4)
    pos_loss = -jnp.log(pred) * jnp.power(1 - pred, 2) * pos
    neg_loss = -jnp.log(1 - pred) * jnp.power(pred, 2) * neg_weights * (1 - pos)
    num_pos = jnp.clip(pos.sum(), 1.0, None)
    return (pos_loss.sum() + neg_loss.sum()) / num_pos


def center_reg_loss(pred_maps, target_boxes, inds, mask):
    """L1 at gt indices (loss_utils.py RegLossCenterNet).

    pred_maps: (B, H, W, 8) concat [center(2), z(1), dim(3), rot(2)];
    target_boxes (B, M, 8); inds (B, M) flat y*w+x; mask (B, M)."""
    b, h, w, c = pred_maps.shape
    flat = pred_maps.reshape(b, h * w, c)
    gathered = jnp.take_along_axis(
        flat, inds[..., None].astype(jnp.int32), axis=1)      # (B, M, C)
    diff = jnp.abs(gathered - target_boxes) * mask[..., None]
    return diff.sum() / jnp.clip(mask.sum(), 1.0, None)


def decode_center_boxes(out, k, voxel_size, pc_range, feature_map_stride,
                        score_thresh=0.0):
    """Top-k decode (centernet_utils decode_bbox_from_heatmap).

    Returns boxes (B, K, 7), scores (B, K), labels (B, K) (1-based)."""
    hm = jax.nn.sigmoid(out['hm'])                             # (B, H, W, C)
    b, h, w, c = hm.shape
    flat = hm.reshape(b, h * w * c)
    k = min(k, h * w * c)
    scores, idx = jax.lax.top_k(flat, k)
    cls_id = idx % c
    spatial = idx // c
    ys = (spatial // w).astype(jnp.float32)
    xs = (spatial % w).astype(jnp.float32)

    def gather_map(m):
        return jnp.take_along_axis(
            m.reshape(b, h * w, m.shape[-1]), spatial[..., None], axis=1)

    center = gather_map(out['center'])
    center_z = gather_map(out['center_z'])
    dim = jnp.exp(gather_map(out['dim']))
    rot = gather_map(out['rot'])
    angle = jnp.arctan2(rot[..., 1], rot[..., 0])

    x = (xs + center[..., 0]) * feature_map_stride * voxel_size[0] + pc_range[0]
    y = (ys + center[..., 1]) * feature_map_stride * voxel_size[1] + pc_range[1]
    boxes = jnp.stack([x, y, center_z[..., 0],
                       dim[..., 0], dim[..., 1], dim[..., 2], angle], axis=-1)
    scores = jnp.where(scores >= score_thresh, scores, 0.0)
    return boxes, scores, cls_id + 1
