"""PointRCNN RoI refinement head.

Semantics per reference pcdet/models/roi_heads/pointrcnn_head.py:10-179:
  - pooled per-roi point sets (roipoint_pool3d, 512 pts) carrying
    [xyz(3), point_score(1), point_depth(1), backbone feats(C)];
  - xyz canonicalized to the roi frame (center-shift + rotate by -heading);
  - xyz_up_layer MLP on the 5 prefix channels, concatenated with the
    backbone features and merged down;
  - a 3-level single-scale-grouping PointNet SA stack (last level groups
    all) -> shared feature -> cls/reg 1x1-conv stacks.

The reference runs with USE_BN=False (pointrcnn.yaml:76) for the xyz_up /
merge_down layers but BN always inside make_fc_layers
(roi_head_template.py:35-49); both behaviors are preserved.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pointnet2 as pn2
from .layers import MaskedBatchNorm


class PlainMLP(nn.Module):
    """1x1-conv stack without BN (USE_BN=False path): Dense+bias+ReLU."""
    channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f'mlp_{i}')(x)
            x = nn.relu(x)
        return x


class SetAbstractionSSG(nn.Module):
    """Single-scale-grouping SA level (PointnetSAModule,
    pointnet2_modules.py:102-119).  npoint=None -> group all."""
    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    use_bn: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, mask, train: bool = True):
        """xyz (B, N, 3), features (B, N, C), mask (B, N) ->
        (new_xyz (B, M, 3) or None, new_feats (B, M, C'), new_mask)."""
        if self.npoint is None:
            # group all: every valid point relative to origin
            grouped = jnp.concatenate([xyz, features], axis=-1)[:, None]
            new_mask = mask.any(axis=1, keepdims=True)
            valid = mask[:, None, :, None]
            h = self._mlp(grouped, train)
            h = jnp.where(valid, h, -1e9)
            pooled = h.max(axis=2)
            pooled = jnp.where(new_mask[..., None], pooled, 0.0)
            return None, pooled, new_mask

        fps_idx = jax.vmap(
            lambda x, m: pn2.farthest_point_sample(x, self.npoint, m))(
            xyz, mask)
        new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
        new_mask = jnp.take_along_axis(mask, fps_idx, axis=1)
        idx, empty = jax.vmap(
            lambda x, nx, m: pn2.ball_query(
                self.radius, self.nsample, x, nx, m))(xyz, new_xyz, mask)
        grouped_xyz = jax.vmap(lambda x, ii: x[ii])(xyz, idx)
        grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
        grouped_feats = jax.vmap(lambda f, ii: f[ii])(features, idx)
        grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
        h = self._mlp(grouped, train)
        h = jnp.where(empty[..., None, None], 0.0, h)
        return new_xyz, h.max(axis=2), new_mask & ~empty

    def _mlp(self, x, train):
        for i, c in enumerate(self.mlp):
            if self.use_bn:
                x = nn.Dense(c, use_bias=False, name=f'mlp_{i}')(x)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'bn_{i}')(
                    x, use_running_average=not train)
            else:
                x = nn.Dense(c, name=f'mlp_{i}')(x)
            x = nn.relu(x)
        return x


class PointRCNNHead(nn.Module):
    """model_cfg keys: XYZ_UP_LAYER, CLS_FC, REG_FC, DP_RATIO, USE_BN,
    SA_CONFIG{NPOINTS, RADIUS, NSAMPLE, MLPS}."""
    model_cfg: Any
    num_class: int = 1
    code_size: int = 7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, pooled, empty, train: bool = True):
        """pooled: (BR, S, 5 + C) canonical-frame pooled features
        ([xyz, score, depth, feats...], already zeroed for empty rois);
        empty: (BR,) bool.
        Returns rcnn_cls (BR, num_class), rcnn_reg (BR, code_size)."""
        from flax.core import unfreeze
        from ..config import Cfg
        mcfg = Cfg(unfreeze(self.model_cfg))
        use_bn = bool(mcfg.get('USE_BN', False))
        n_prefix = 5

        xyz_in = pooled[..., :n_prefix]
        if use_bn:
            h = xyz_in
            for i, c in enumerate(mcfg.XYZ_UP_LAYER):
                h = nn.Dense(c, use_bias=False, name=f'xyz_up_{i}')(h)
                h = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'xyz_up_bn_{i}')(
                    h, use_running_average=not train)
                h = nn.relu(h)
            xyz_feats = h
        else:
            xyz_feats = PlainMLP(tuple(mcfg.XYZ_UP_LAYER),
                                 name='xyz_up')(xyz_in)
        pt_feats = pooled[..., n_prefix:]
        merged = jnp.concatenate([xyz_feats, pt_feats], axis=-1)
        c_out = mcfg.XYZ_UP_LAYER[-1]
        if use_bn:
            merged = nn.Dense(c_out, use_bias=False, name='merge_down')(merged)
            merged = MaskedBatchNorm(axis_name=self.axis_name,
                                     name='merge_down_bn')(
                merged, use_running_average=not train)
            merged = nn.relu(merged)
        else:
            merged = nn.relu(nn.Dense(c_out, name='merge_down')(merged))

        sa = mcfg.SA_CONFIG
        xyz = pooled[..., :3]
        mask = ~jnp.broadcast_to(empty[:, None], xyz.shape[:2])
        feats = merged
        for li in range(len(sa.NPOINTS)):
            npoint = None if sa.NPOINTS[li] == -1 else int(sa.NPOINTS[li])
            xyz, feats, mask = SetAbstractionSSG(
                npoint=npoint, radius=float(sa.RADIUS[li]),
                nsample=int(sa.NSAMPLE[li]), mlp=tuple(sa.MLPS[li]),
                use_bn=use_bn, axis_name=self.axis_name,
                name=f'sa_{li}')(xyz, feats, mask, train=train)
        shared = feats[:, 0]                                   # (BR, C)

        def fc_stack(x, sizes, out_ch, name, out_init):
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if i == 0 and mcfg.get('DP_RATIO', 0) > 0:
                    x = nn.Dropout(mcfg.DP_RATIO,
                                   deterministic=not train)(x)
            return nn.Dense(out_ch, name=f'{name}_out',
                            kernel_init=out_init)(x)

        rcnn_cls = fc_stack(shared, mcfg.CLS_FC, self.num_class, 'cls',
                            nn.initializers.lecun_normal())
        rcnn_reg = fc_stack(shared, mcfg.REG_FC, self.code_size, 'reg',
                            nn.initializers.normal(0.001))
        return {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg}


def pool_prefix_features(points_xyz, point_feats, point_scores,
                         depth_normalizer: float):
    """Assemble [score, depth, feats] per point
    (pointrcnn_head.py:106-115)."""
    depth = jnp.linalg.norm(points_xyz, axis=-1) / depth_normalizer - 0.5
    return jnp.concatenate(
        [point_scores[:, None], depth[:, None], point_feats], axis=1)


def canonicalize_pooled(pooled, rois, empty):
    """Shift + rotate pooled xyz into each roi's canonical frame
    (pointrcnn_head.py:117-131).  pooled (R, S, 3+C), rois (R, 7)."""
    from ..utils import common
    xyz = pooled[..., :3] - rois[:, None, 0:3]
    xyz = common.rotate_points_along_z(xyz, -rois[:, 6])
    out = jnp.concatenate([xyz, pooled[..., 3:]], axis=-1)
    return jnp.where(empty[:, None, None], 0.0, out)
