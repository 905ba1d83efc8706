"""PointNet++ backbone (PointRCNN's point-based feature extractor).

Structure per reference pcdet/models/backbones_3d/pointnet2_backbone.py
(PointNet2MSG): 4 set-abstraction levels with multi-scale grouping
(config SA_CONFIG: NPOINTS, RADIUS, NSAMPLE, MLPS) followed by 4 feature-
propagation levels interpolating back to the full point set (FP_MLPS).
Outputs per-point features for the point head.

All modules take batched (B, N, ...) tensors: the pure geometry ops
(FPS, ball query, three-nn) are vmapped internally while the shared MLPs +
BatchNorm run on the full batch so normalization statistics span it.

TPU notes: FPS is a sequential lax.fori_loop (npoint iterations of O(N)
vector work); ball query builds an (M, N) mask — fine at PointRCNN scales
(16384 points in, 4096/1024/256/64 keypoints).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import pointnet2 as pn2
from .layers import MaskedBatchNorm


class SharedMLP(nn.Module):
    channels: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask=None, train: bool = True):
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, use_bias=False, name=f'mlp_{i}')(x)
            x = MaskedBatchNorm(axis_name=self.axis_name, name=f'bn_{i}')(
                x, mask=mask, use_running_average=not train)
            x = nn.relu(x)
        return x


class SetAbstractionMSG(nn.Module):
    """One SA level: FPS centers + per-radius ball-query grouping + shared
    MLP + max pool, concatenated over radii.  Batched (B, ...) I/O."""
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, mask, train: bool = True):
        """xyz (B, N, 3), features (B, N, C) or None, mask (B, N) ->
        (new_xyz (B, M, 3), new_feats (B, M, sum(mlps[-1])), new_mask)."""
        fps_idx = jax.vmap(
            lambda x, m: pn2.farthest_point_sample(x, self.npoint, m))(
            xyz, mask)
        new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
        new_mask = jnp.take_along_axis(mask, fps_idx, axis=1)

        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radii, self.nsamples)):
            idx, empty = jax.vmap(
                lambda x, nx, m: pn2.ball_query(radius, nsample, x, nx, m))(
                xyz, new_xyz, mask)
            grouped_xyz = jax.vmap(lambda x, ii: x[ii])(xyz, idx)  # (B,M,S,3)
            grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
            if features is not None:
                grouped_feats = jax.vmap(lambda f, ii: f[ii])(features, idx)
                grouped = jnp.concatenate([grouped_xyz, grouped_feats], -1)
            else:
                grouped = grouped_xyz
            h = SharedMLP(self.mlps[i], axis_name=self.axis_name,
                          name=f'mlp_r{i}')(grouped, mask=None, train=train)
            h = jnp.where(empty[..., None, None], 0.0, h)
            outs.append(h.max(axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1), new_mask


class FeaturePropagation(nn.Module):
    """FP level: three-nn interpolation + unary MLP on concat(skip, up)."""
    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz_to, feats_to, mask_to, xyz_from, feats_from,
                 mask_from, train: bool = True):
        def interp(xt, xf, ff, mf):
            dist, idx = pn2.three_nn(xt, xf, mf)
            return pn2.three_interpolate(ff, idx, dist)
        up = jax.vmap(interp)(xyz_to, xyz_from, feats_from, mask_from)
        h = up if feats_to is None else jnp.concatenate([feats_to, up], -1)
        return SharedMLP(self.mlp, axis_name=self.axis_name)(
            h, mask=mask_to, train=train)


class PointNet2MSG(nn.Module):
    """Full SA/FP stack on batched inputs."""
    sa_npoints: Sequence[int] = (4096, 1024, 256, 64)
    sa_radii: Sequence[Sequence[float]] = (
        (0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0))
    sa_nsamples: Sequence[Sequence[int]] = (
        (16, 32), (16, 32), (16, 32), (16, 32))
    sa_mlps: Sequence = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)))
    fp_mlps: Sequence = ((128, 128), (256, 256), (512, 512), (512, 512))
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, points, mask, train: bool = True):
        """points (B, N, 3 + C), mask (B, N) -> (B, N, fp[0][-1])."""
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        xyzs, featss, masks = [xyz], [feats], [mask]
        for li in range(len(self.sa_npoints)):
            nx, nf, nm = SetAbstractionMSG(
                npoint=self.sa_npoints[li], radii=self.sa_radii[li],
                nsamples=self.sa_nsamples[li], mlps=self.sa_mlps[li],
                axis_name=self.axis_name, name=f'sa_{li}')(
                xyzs[-1], featss[-1], masks[-1], train=train)
            xyzs.append(nx)
            featss.append(nf)
            masks.append(nm)

        up = featss[-1]
        for li in range(len(self.fp_mlps) - 1, -1, -1):
            up = FeaturePropagation(
                mlp=self.fp_mlps[li], axis_name=self.axis_name,
                name=f'fp_{li}')(
                xyzs[li], featss[li], masks[li],
                xyzs[li + 1], up, masks[li + 1], train=train)
        return up
