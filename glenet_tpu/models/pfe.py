"""Point-feature extraction: VoxelSetAbstraction (PV-RCNN).

Semantics per reference pcdet/models/backbones_3d/pfe/
voxel_set_abstraction.py:124-415:
  - NUM_KEYPOINTS FPS-sampled keypoints from the raw points (repeat-fill
    when a scene has fewer points);
  - per-keypoint features aggregated from multiple sources:
      'bev'        — bilinear interpolation of the HeightCompression BEV map
                     (:176-204, bilinear_interpolate_torch :11-42);
      'raw_points' — stack-SA ball query over the raw cloud;
      'x_conv1..4' — stack-SA over voxel-center clouds of the sparse
                     backbone levels (voxel centers :386-391);
  - concat -> Linear+BN+ReLU fusion to NUM_OUTPUT_FEATURES (:167-172).

PointHeadSimple (pcdet/models/dense_heads/point_head_simple.py): a cls-only
MLP supervising keypoint foreground-ness on the pre-fusion features; its
sigmoid score re-weights keypoint features in the PVRCNN roi head
(pvrcnn_head.py:85).

TPU design: fixed keypoint count per sample, all sources aggregated with
static-budget point lists + masks (the dense backbone levels carry
ids/mask alongside their dense tensors).  Everything vmapped over batch.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointnet2 as pn2
from ..ops import sparse
from .layers import MaskedBatchNorm
from .pointnet2_backbone import SharedMLP


def bilinear_interpolate(im, x, y):
    """im (H, W, C), x (N,), y (N,) -> (N, C)
    (voxel_set_abstraction.py:11-42, clamp-to-edge)."""
    h, w = im.shape[:2]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)
    ia = im[y0c, x0c]
    ib = im[y1c, x0c]
    ic = im[y0c, x1c]
    id_ = im[y1c, x1c]
    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)
    return (ia * wa[:, None] + ib * wb[:, None] + ic * wc[:, None]
            + id_ * wd[:, None])


class StackSAModuleMSG(nn.Module):
    """Keypoint aggregation from one point source: per-radius ball query +
    shared MLP + max pool, concatenated (pointnet2_stack StackSAModuleMSG
    semantics; use_xyz=True)."""
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, kp_xyz, src_xyz, src_feats, src_mask,
                 train: bool = True):
        """kp_xyz (B, M, 3); src_xyz (B, N, 3); src_feats (B, N, C) or None;
        src_mask (B, N) -> (B, M, sum(mlps[-1]))."""
        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radii, self.nsamples)):
            idx, empty = jax.vmap(
                lambda x, nx, m: pn2.ball_query(radius, nsample, x, nx, m))(
                src_xyz, kp_xyz, src_mask)
            grouped_xyz = jax.vmap(lambda x, ii: x[ii])(src_xyz, idx)
            grouped_xyz = grouped_xyz - kp_xyz[:, :, None, :]
            if src_feats is not None:
                grouped_feats = jax.vmap(lambda f, ii: f[ii])(src_feats, idx)
                grouped = jnp.concatenate([grouped_xyz, grouped_feats], -1)
            else:
                grouped = grouped_xyz
            h = SharedMLP(tuple(self.mlps[i]), axis_name=self.axis_name,
                          name=f'mlp_r{i}')(grouped, mask=None, train=train)
            h = jnp.where(empty[..., None, None], 0.0, h)
            outs.append(h.max(axis=2))
        return jnp.concatenate(outs, axis=-1)


def sparse_level_points(level, voxel_size, pc_range):
    """Voxel-center point cloud (xyz, feats, mask) of a backbone level.

    Sparse levels use (features, ids); dense levels gather feature rows from
    the dense tensor at their active-site ids."""
    ids, mask = level['ids'], level['mask']
    nx, ny, nz = level['grid']
    stride = level['stride']

    def centers(ids_s, mask_s):
        z, y, x = sparse.delinearize(jnp.where(mask_s, ids_s, 0),
                                     (nx, ny, nz))
        vs = jnp.asarray(voxel_size, jnp.float32) * stride
        origin = jnp.asarray(pc_range[:3], jnp.float32)
        xyz = (jnp.stack([x, y, z], -1).astype(jnp.float32) + 0.5) * vs \
            + origin
        return xyz

    xyz = jax.vmap(centers)(ids, mask)
    if level['kind'] == 'sparse':
        feats = level['features']
    else:
        c = level['features'].shape[-1]

        def gather(dense_s, ids_s, mask_s):
            flat = dense_s.reshape(-1, c)
            safe = jnp.where(mask_s, ids_s, 0)
            return jnp.where(mask_s[:, None], flat[safe], 0.0)
        feats = jax.vmap(gather)(level['features'], ids, mask)
    return xyz, feats, mask


class VoxelSetAbstraction(nn.Module):
    model_cfg: Any
    voxel_size: tuple
    pc_range: tuple
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points, points_mask, multi_scale, bev_features,
                 bev_stride: int, rois=None, roi_valid=None,
                 train: bool = True):
        """points (B, P, 3+F) raw; bev_features (B, H, W, C).
        rois (B, R, 7) + roi_valid (B, R): required for SAMPLE_METHOD=SPC
        and FILTER_NEIGHBOR_WITH_ROI (PV-RCNN++).
        Returns dict: keypoints (B, K, 3), point_features (B, K, Cout),
        point_features_before_fusion (B, K, Cin)."""
        from flax.core import unfreeze
        from ..config import Cfg
        from . import vector_pool as vpool
        mcfg = Cfg(unfreeze(self.model_cfg))
        k = int(mcfg.NUM_KEYPOINTS)
        xyz = points[..., :3]

        fps_mask = points_mask
        if mcfg.get('SAMPLE_METHOD', 'FPS') == 'SPC':
            # sectorized-proposal-centric sampling
            # (voxel_set_abstraction.py:206-225): roi-proximity filter +
            # FPS.  sector_fps is a GPU parallelization of global FPS; on
            # TPU the masked global FPS is computed directly.
            assert rois is not None and roi_valid is not None
            spc = mcfg.SPC_SAMPLING
            fps_mask = jax.vmap(functools.partial(
                vpool.sample_points_with_roi_mask,
                sample_radius=float(spc.SAMPLE_RADIUS_WITH_ROI)))(
                xyz, points_mask, rois[..., :7], roi_valid)
            # degenerate scenes (no roi near any point): fall back to all
            fps_mask = jnp.where(fps_mask.any(-1, keepdims=True),
                                 fps_mask, points_mask)
        fps_idx = jax.vmap(
            lambda x, m: pn2.farthest_point_sample(x, k, m))(xyz, fps_mask)
        keypoints = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)

        def aggregate(cfg_s, kp, sxyz, sfeats, smask, name):
            """One feature source: StackSA (PV-RCNN) or VectorPool MSG
            (PV-RCNN++), with optional roi-proximity neighbor filter."""
            if cfg_s.get('FILTER_NEIGHBOR_WITH_ROI', False):
                assert rois is not None and roi_valid is not None
                smask = jax.vmap(functools.partial(
                    vpool.sample_points_with_roi_mask,
                    sample_radius=float(
                        cfg_s.RADIUS_OF_NEIGHBOR_WITH_ROI)))(
                    sxyz, smask, rois[..., :7], roi_valid)
            if cfg_s.get('NAME', '') == 'VectorPoolAggregationModuleMSG':
                if sfeats is None:
                    sfeats = jnp.ones((*sxyz.shape[:2], 1), sxyz.dtype)
                return vpool.VectorPoolAggregationMSG(
                    model_cfg=dict(cfg_s), axis_name=self.axis_name,
                    name=f'vp_{name}')(sxyz, smask, sfeats, keypoints,
                                       train=train)
            return StackSAModuleMSG(
                radii=tuple(cfg_s.POOL_RADIUS),
                nsamples=tuple(cfg_s.NSAMPLE),
                mlps=tuple(tuple(m) for m in cfg_s.MLPS),
                axis_name=self.axis_name, name=f'sa_{name}')(
                kp, sxyz, sfeats, smask, train=train)

        feats_list = []
        sources = list(mcfg.FEATURES_SOURCE)
        if 'bev' in sources:
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x0, y0 = self.pc_range[0], self.pc_range[1]

            def interp(kp, bev):
                xi = (kp[:, 0] - x0) / vx / bev_stride
                yi = (kp[:, 1] - y0) / vy / bev_stride
                return bilinear_interpolate(bev, xi, yi)
            feats_list.append(jax.vmap(interp)(keypoints, bev_features))

        sa_cfg = mcfg.SA_LAYER
        if 'raw_points' in sources:
            raw_feats = points[..., 3:] if points.shape[-1] > 3 else None
            feats_list.append(aggregate(
                sa_cfg['raw_points'], keypoints, xyz, raw_feats,
                points_mask, 'raw_points'))

        for src in sources:
            if src in ('bev', 'raw_points'):
                continue
            sxyz, sfeats, smask = sparse_level_points(
                multi_scale[src], self.voxel_size, self.pc_range)
            feats_list.append(aggregate(
                sa_cfg[src], keypoints, sxyz, sfeats, smask, src))

        before_fusion = jnp.concatenate(feats_list, axis=-1)
        h = nn.Dense(int(mcfg.NUM_OUTPUT_FEATURES), use_bias=False,
                     name='fusion')(before_fusion)
        h = MaskedBatchNorm(axis_name=self.axis_name, name='fusion_bn')(
            h, use_running_average=not train)
        fused = nn.relu(h)
        return {'keypoints': keypoints, 'point_features': fused,
                'point_features_before_fusion': before_fusion}


def assign_keypoint_seg_targets(kp_xyz, gt_boxes, gt_mask,
                                extra_width=(0.2, 0.2, 0.2)):
    """Class-agnostic keypoint segmentation labels (point_head_simple.py
    assign_targets -> assign_stack_targets): 1 inside a gt box, -1 in the
    enlarged shell, 0 background.  Per sample: kp_xyz (K, 3)."""
    from ..utils import box_utils
    inside = box_utils.points_in_boxes(kp_xyz, gt_boxes[:, :7])
    inside = inside & gt_mask[None, :]
    m = gt_boxes.shape[0]
    enlarged = gt_boxes[:, :7] + jnp.concatenate(
        [jnp.zeros((m, 3)),
         jnp.broadcast_to(jnp.asarray(extra_width), (m, 3)),
         jnp.zeros((m, 1))], axis=1)
    inside_big = box_utils.points_in_boxes(kp_xyz, enlarged) & gt_mask[None, :]
    is_fg = inside.any(axis=1)
    is_ignore = inside_big.any(axis=1) & ~is_fg
    return jnp.where(is_ignore, -1, is_fg.astype(jnp.int32))


def keypoint_seg_loss(cls_preds, cls_labels, num_class: int = 1):
    """Sigmoid focal, normalized by fg count (point_head_template.py
    get_cls_layer_loss).  cls_preds (N, num_class), cls_labels (N,)."""
    from ..utils import losses
    cared = cls_labels >= 0
    pos = cls_labels > 0
    one_hot = jax.nn.one_hot(jnp.clip(cls_labels, 0, None), num_class + 1,
                             dtype=cls_preds.dtype)[:, 1:]
    w = cared.astype(jnp.float32) / jnp.clip(pos.sum(), 1.0, None)
    return losses.sigmoid_focal_loss(
        cls_preds[None], one_hot[None], w[None]).sum()


class PointHeadSimple(nn.Module):
    """Cls-only keypoint supervision head (point_head_simple.py:9-85)."""
    num_class: int = 1
    cls_fc: Sequence[int] = (256, 256)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = True):
        x = feats
        for i, c in enumerate(self.cls_fc):
            x = nn.Dense(c, use_bias=False, name=f'cls_{i}')(x)
            x = MaskedBatchNorm(axis_name=self.axis_name, name=f'cls_bn{i}')(
                x, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(self.num_class, name='cls_out')(x)
