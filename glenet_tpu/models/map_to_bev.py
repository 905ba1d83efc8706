"""Sparse/pillar features -> dense BEV canvas.

  - PointPillarScatter: scatter (V, C) pillar features onto an (H, W, C)
    canvas by their (y, x) coords (reference
    pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py:14-37).
  - HeightCompression: densify a sparse 3D volume and fold z into channels
    (reference height_compression.py:10-26) — consumes the sparse backbone's
    output table.

Per-sample (no batch dim); detectors vmap over the batch.  NHWC layout.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PointPillarScatter(nn.Module):
    grid_size: tuple  # (nx, ny, nz) with nz == 1

    @nn.compact
    def __call__(self, pillar_features, voxel_coords, voxel_mask,
                 train: bool = True):
        """(V, C) features + (V, 3) coords (z, y, x) -> (ny, nx, C) canvas."""
        nx, ny, nz = self.grid_size
        assert nz == 1
        y = voxel_coords[:, 1]
        x = voxel_coords[:, 2]
        flat = jnp.where(voxel_mask, y * nx + x, ny * nx)  # invalid -> dropped
        canvas = jnp.zeros((ny * nx, pillar_features.shape[-1]),
                           pillar_features.dtype)
        canvas = canvas.at[flat].set(
            jnp.where(voxel_mask[:, None], pillar_features, 0.0), mode='drop')
        return canvas.reshape(ny, nx, pillar_features.shape[-1])


class HeightCompression(nn.Module):
    """Densify sparse 3D features and fold depth into channels.

    Input: (V, C) features at (V, 3) coords (z, y, x) on a (nx, ny, nz)
    grid (the sparse backbone's final stride-8, z-compressed grid).
    Output: (ny, nx, C * nz) BEV features.
    """
    grid_size: tuple  # (nx, ny, nz) of the feature map (post-stride)

    @nn.compact
    def __call__(self, features, coords, mask, train: bool = True):
        nx, ny, nz = self.grid_size
        c = features.shape[-1]
        flat = jnp.where(
            mask,
            coords[:, 0] * (ny * nx) + coords[:, 1] * nx + coords[:, 2],
            nz * ny * nx)
        dense = jnp.zeros((nz * ny * nx, c), features.dtype)
        dense = dense.at[flat].set(
            jnp.where(mask[:, None], features, 0.0), mode='drop')
        dense = dense.reshape(nz, ny, nx, c)
        # (nz, ny, nx, c) -> (ny, nx, nz * c).  Note: z-outer/channel-inner
        # flattening (torch reference flattens channel-outer); a torch weight
        # converter must permute the consuming conv's input channels.
        dense = jnp.transpose(dense, (1, 2, 0, 3))
        return dense.reshape(ny, nx, nz * c)
