"""Voxel feature encoders (flax.linen, fixed-shape, mask-aware).

Behavioral contracts from the reference:
  - MeanVFE: mean of raw point features per voxel
    (pcdet/models/backbones_3d/vfe/mean_vfe.py:6-31).
  - PillarVFE: PointNet-style pillar encoder with cluster-relative and
    pillar-center-relative offsets (pillar_vfe.py:52-123).
  - Dynamic variants use segment reductions over point->voxel ids instead of
    the padded voxel table (dynamic_mean_vfe.py / dynamic_pillar_vfe.py,
    torch_scatter replaced by jax segment ops).

All inputs are per-sample (no batch dim) — detectors vmap over the batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import MaskedBatchNorm


class MeanVFE(nn.Module):
    """voxels (V, P, C), num_points (V,) -> (V, C) mean features."""

    @nn.compact
    def __call__(self, voxels, voxel_num_points, train: bool = True):
        denom = jnp.clip(voxel_num_points.astype(voxels.dtype), 1.0, None)
        return voxels.sum(axis=1) / denom[:, None]


class PFNLayer(nn.Module):
    features: int
    last_layer: bool = False
    use_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, point_mask, train: bool = True):
        """x: (V, P, Cin), point_mask: (V, P) -> (V, P, out) or (V, out)."""
        out = self.features if self.last_layer else self.features // 2
        x = nn.Dense(out, use_bias=not self.use_norm)(x)
        if self.use_norm:
            x = MaskedBatchNorm(axis_name=self.axis_name)(
                x, mask=point_mask, use_running_average=not train)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, 0.0)
        x_max = x.max(axis=1)                                    # (V, out)
        if self.last_layer:
            return x_max
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max[:, None], x.shape)], axis=-1)


class PillarVFE(nn.Module):
    num_filters: Sequence[int]
    voxel_size: tuple
    point_cloud_range: tuple
    use_absolute_xyz: bool = True
    with_distance: bool = False
    use_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, voxels, voxel_num_points, voxel_coords,
                 train: bool = True):
        """voxels (V, P, C) raw point features, coords (V, 3) as (z, y, x).

        Returns (V, num_filters[-1]) pillar features.
        """
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        npts = jnp.clip(voxel_num_points.astype(voxels.dtype), 1.0, None)

        points_mean = voxels[:, :, :3].sum(axis=1, keepdims=True) / npts[:, None, None]
        f_cluster = voxels[:, :, :3] - points_mean

        cz = voxel_coords[:, 0].astype(voxels.dtype)
        cy = voxel_coords[:, 1].astype(voxels.dtype)
        cx = voxel_coords[:, 2].astype(voxels.dtype)
        f_center = jnp.stack([
            voxels[:, :, 0] - (cx[:, None] * vx + (vx / 2 + x0)),
            voxels[:, :, 1] - (cy[:, None] * vy + (vy / 2 + y0)),
            voxels[:, :, 2] - (cz[:, None] * vz + (vz / 2 + z0)),
        ], axis=-1)

        if self.use_absolute_xyz:
            feats = [voxels, f_cluster, f_center]
        else:
            feats = [voxels[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[:, :, :3], axis=2, keepdims=True))
        features = jnp.concatenate(feats, axis=-1)

        point_mask = (jnp.arange(voxels.shape[1])[None, :]
                      < voxel_num_points[:, None])
        features = jnp.where(point_mask[..., None], features, 0.0)

        filters = list(self.num_filters)
        for i, f in enumerate(filters):
            features = PFNLayer(
                f, last_layer=(i == len(filters) - 1),
                use_norm=self.use_norm, axis_name=self.axis_name,
            )(features, point_mask, train=train)
        return features


class DynamicMeanVFE(nn.Module):
    """Scatter-based mean VFE: points (N, C) + per-point voxel slot ids.

    Equivalent of dynamic_mean_vfe.py (torch_scatter mean) using
    jax.ops.segment_sum with a static voxel budget (`num_voxels` is passed
    at call time so the batch can be flattened into the segment axis).
    """

    @nn.compact
    def __call__(self, points, point_voxel_idx, num_voxels: int,
                 train: bool = True):
        from ..ops import scatter
        return scatter.segment_mean(points, point_voxel_idx, num_voxels)


class DynamicPillarVFE(nn.Module):
    """Scatter-based pillar encoder (dynamic_pillar_vfe.py:43-142):
    per-point [xyz, feats, cluster-offset, center-offset] -> PFNLayerV2
    stack where each layer is Linear+BN+ReLU followed by a per-pillar
    scatter-max (concatenated back onto the points between layers).

    points (N, C); point_voxel_idx (N,) slot ids (-1 dropped);
    voxel_coords (V, 3) as (z, y, x) -> (V, num_filters[-1]).
    """
    num_filters: Sequence[int]
    voxel_size: tuple
    point_cloud_range: tuple
    use_absolute_xyz: bool = True
    with_distance: bool = False
    use_norm: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points, point_voxel_idx, voxel_coords,
                 num_voxels: int, train: bool = True):
        from ..ops import scatter
        vx, vy, vz = self.voxel_size
        x0, y0, z0 = self.point_cloud_range[:3]
        valid = point_voxel_idx >= 0
        xyz = points[:, :3]

        # cluster offset: point - mean xyz of its pillar
        mean_xyz = scatter.segment_mean(
            jnp.where(valid[:, None], xyz, 0.0), point_voxel_idx,
            num_voxels)
        safe_idx = jnp.where(valid, point_voxel_idx, 0)
        f_cluster = xyz - mean_xyz[safe_idx]

        # center offset: point - its voxel center
        cz, cy, cx = (voxel_coords[:, 0], voxel_coords[:, 1],
                      voxel_coords[:, 2])
        centers = jnp.stack(
            [cx.astype(xyz.dtype) * vx + (vx / 2 + x0),
             cy.astype(xyz.dtype) * vy + (vy / 2 + y0),
             cz.astype(xyz.dtype) * vz + (vz / 2 + z0)], axis=1)
        f_center = xyz - centers[safe_idx]

        feats = ([points, f_cluster, f_center] if self.use_absolute_xyz
                 else [points[:, 3:], f_cluster, f_center])
        if self.with_distance:
            feats.append(jnp.linalg.norm(xyz, axis=1, keepdims=True))
        x = jnp.concatenate(feats, axis=-1)
        x = jnp.where(valid[:, None], x, 0.0)

        filters = list(self.num_filters)
        for i, f in enumerate(filters):
            last = i == len(filters) - 1
            x = nn.Dense(f, use_bias=not self.use_norm, name=f'pfn_{i}')(x)
            if self.use_norm:
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'pfn_bn{i}')(
                    x, mask=valid, use_running_average=not train)
            x = nn.relu(x)
            x = jnp.where(valid[:, None], x, 0.0)
            x_max = scatter.segment_max(x, point_voxel_idx, num_voxels)
            if last:
                return x_max                                  # (V, f)
            x = jnp.concatenate([x, x_max[safe_idx]], axis=-1)
            x = jnp.where(valid[:, None], x, 0.0)
