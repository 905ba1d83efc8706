"""RoI-aware voxel pooling — TPU equivalent of the reference
roiaware_pool3d CUDA extension (pcdet/ops/roiaware_pool3d/src/
roiaware_pool3d_kernel.cu:23-312): pool per-point features into a fixed
(G, G, G) voxel grid inside each (rotated) roi, max or avg per cell.

TPU formulation: canonical-transform all points into every roi's frame
(vectorized), compute each in-roi point's cell index, and do ONE
scatter-max / scatter-add over (R * G^3) cells — no per-box loops.
Differentiable (JAX scatter ops carry gradients, matching the reference's
backward kernels).  Per-sample pure function; vmap over batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import common

_NEG = -1e9


def roiaware_pool3d(points_xyz, point_features, rois, out_size: int,
                    method: str = 'max', points_mask=None):
    """Args:
        points_xyz: (P, 3); point_features: (P, C); rois: (R, 7);
        method: 'max' | 'avg'; points_mask: (P,) validity.
    Returns:
        pooled: (R, G, G, G, C) with grid axes ordered (x, y, z) as the
        reference kernel lays them out; empty cells are 0.
    """
    g = out_size
    p = points_xyz.shape[0]
    r = rois.shape[0]
    c = point_features.shape[1]

    # canonical coords of every point in every roi frame: (R, P, 3)
    shifted = points_xyz[None, :, :] - rois[:, None, 0:3]
    local = common.rotate_points_along_z(shifted, -rois[:, 6])
    dims = rois[:, None, 3:6]                                  # (R, 1, 3)
    inbox = (jnp.abs(local) < dims / 2 + 1e-5).all(axis=-1)
    if points_mask is not None:
        inbox = inbox & points_mask[None, :]

    cell = jnp.floor((local + dims / 2) / (dims / g)).astype(jnp.int32)
    cell = jnp.clip(cell, 0, g - 1)                            # (R, P, 3)
    flat = (cell[..., 0] * g * g + cell[..., 1] * g + cell[..., 2]
            + jnp.arange(r, dtype=jnp.int32)[:, None] * g ** 3)
    flat = jnp.where(inbox, flat, r * g ** 3)                  # dump slot

    vals = jnp.broadcast_to(point_features[None], (r, p, c)).reshape(-1, c)
    flat = flat.reshape(-1)
    if method == 'max':
        acc = jnp.full((r * g ** 3 + 1, c), _NEG, point_features.dtype)
        acc = acc.at[flat].max(vals, mode='drop')
        occupied = acc > _NEG / 2
        pooled = jnp.where(occupied, acc, 0.0)[:r * g ** 3]
    elif method == 'avg':
        acc = jnp.zeros((r * g ** 3 + 1, c), point_features.dtype)
        acc = acc.at[flat].add(jnp.where(
            (flat < r * g ** 3)[:, None], vals, 0.0), mode='drop')
        cnt = jnp.zeros((r * g ** 3 + 1, 1), point_features.dtype).at[
            flat].add(jnp.where((flat < r * g ** 3)[:, None], 1.0, 0.0),
                      mode='drop')
        pooled = (acc / jnp.clip(cnt, 1.0, None))[:r * g ** 3]
    else:
        raise ValueError(method)
    return pooled.reshape(r, g, g, g, c)
