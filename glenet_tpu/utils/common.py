"""Core geometry helpers (pure JAX, jittable).

Semantics match the reference's pcdet/utils/common_utils.py:35-82 (rotate
points along z, limit_period) but are written as functional, batched JAX ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap angle into [-offset*period, (1-offset)*period).

    Reference: pcdet/utils/common_utils.py:66-70.
    """
    return val - jnp.floor(val / period + offset) * period


def limit_period_np(val, offset: float = 0.5, period: float = 2 * np.pi):
    return val - np.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., ) angles -> (..., 3, 3) rotation matrices about +z."""
    cosa = jnp.cos(angle)
    sina = jnp.sin(angle)
    zeros = jnp.zeros_like(angle)
    ones = jnp.ones_like(angle)
    rot = jnp.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1).reshape(*angle.shape, 3, 3)
    return rot


def rotate_points_along_z(points, angle):
    """Rotate points around the z axis (counter-clockwise for +angle).

    Args:
        points: (B, N, 3 + C) or (N, 3 + C)
        angle:  (B,) or scalar, radians
    Returns: rotated points, same shape.

    Matches reference pcdet/utils/common_utils.py:35-57 (x' = x cos + y sin ...
    using the row-vector convention points @ R).
    """
    squeeze = points.ndim == 2
    if squeeze:
        points = points[None]
        angle = jnp.atleast_1d(angle)
    rot = rotation_matrix_z(angle)  # (B, 3, 3)
    xyz = jnp.einsum('bnd,bde->bne', points[..., :3], rot)
    out = jnp.concatenate([xyz, points[..., 3:]], axis=-1)
    return out[0] if squeeze else out


def rotate_points_along_z_np(points: np.ndarray, angle) -> np.ndarray:
    """Numpy mirror for the host data pipeline."""
    squeeze = points.ndim == 2
    if squeeze:
        points = points[None]
        angle = np.atleast_1d(angle)
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(angle), np.ones_like(angle)
    rot = np.stack([
        cosa, sina, zeros,
        -sina, cosa, zeros,
        zeros, zeros, ones,
    ], axis=-1).reshape(-1, 3, 3)
    xyz = np.einsum('bnd,bde->bne', points[..., :3], rot)
    out = np.concatenate([xyz, points[..., 3:]], axis=-1)
    return out[0] if squeeze else out


def get_voxel_centers(voxel_coords, downsample_times, voxel_size, point_cloud_range):
    """Voxel (z, y, x) integer coords -> metric centers.

    Reference: pcdet/utils/common_utils.py:226-243.
    Args:
        voxel_coords: (N, 3) int, [z_idx, y_idx, x_idx]
    Returns: (N, 3) float [x, y, z] centers.
    """
    coords = voxel_coords[:, ::-1].astype(jnp.float32)  # -> (x, y, z)
    voxel_size = jnp.asarray(voxel_size, jnp.float32) * downsample_times
    pc_range = jnp.asarray(point_cloud_range[:3], jnp.float32)
    return (coords + 0.5) * voxel_size + pc_range


def create_logger(log_file=None, rank: int = 0, log_level=None):
    import logging
    log_level = log_level if log_level is not None else logging.INFO
    logger = logging.getLogger(__name__ + f'.rank{rank}')
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger
