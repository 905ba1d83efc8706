"""PointNet++ primitives — TPU equivalents of the reference CUDA kernels
(pcdet/ops/pointnet2/{batch,stack}/src, SURVEY.md §2.4): ball query,
farthest point sampling, grouping, and three-nn inverse-distance
interpolation.  All static-shape, mask-aware, vectorized (vmap over batch).

Design notes:
  - ball_query: full (M, N) distance matrix + "first nsample within radius"
    selection via masked top-k on arrival order (the CUDA kernel takes the
    first nsample encountered in index order; we replicate that order).
  - farthest_point_sampling: the classic sequential loop as lax.fori_loop
    over the sample count with an O(N) distance-update per step.
  - three_nn / three_interpolate: top-3 nearest by full distance matrix.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e10


def square_distance(a, b):
    """(N, 3) x (M, 3) -> (N, M) squared euclidean distances."""
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)


@partial(jax.jit, static_argnames=('nsample',))
def ball_query(radius: float, nsample: int, xyz, new_xyz, xyz_mask=None):
    """Args:
        xyz: (N, 3) source points; new_xyz: (M, 3) query centers;
        xyz_mask: (N,) validity.
    Returns:
        idx (M, nsample) int32 — indices into xyz; empty slots repeat the
        first hit (CUDA kernel behavior); empty_mask (M,) True when no
        point is in the ball.
    """
    d2 = square_distance(new_xyz, xyz)                     # (M, N)
    within = d2 < radius ** 2
    if xyz_mask is not None:
        within = within & xyz_mask[None, :]
    n = xyz.shape[0]
    order = jnp.arange(n, dtype=jnp.float32)
    # first nsample in index order: rank by (not-within, index)
    key = jnp.where(within, order, _BIG + order)
    _, idx = jax.lax.top_k(-key, nsample)                  # smallest keys
    got = jnp.take_along_axis(within, idx, axis=1)
    first = idx[:, :1]
    idx = jnp.where(got, idx, first)
    empty = ~got[:, 0]
    return idx.astype(jnp.int32), empty


@partial(jax.jit, static_argnames=('npoint',))
def farthest_point_sample(xyz, npoint: int, mask=None):
    """(N, 3) -> (npoint,) int32 FPS indices (sampling_gpu.cu semantics:
    start from index 0, iteratively take the farthest)."""
    n = xyz.shape[0]
    valid = mask if mask is not None else jnp.ones(n, bool)
    d = jnp.full((n,), _BIG)

    def body(i, state):
        d, last, out = state
        dist = ((xyz - xyz[last]) ** 2).sum(-1)
        d = jnp.minimum(d, dist)
        d_masked = jnp.where(valid, d, -1.0)
        nxt = jnp.argmax(d_masked)
        out = out.at[i].set(nxt)
        return d, nxt, out

    out = jnp.zeros((npoint,), jnp.int32)
    first = jnp.argmax(valid)  # first valid index
    out = out.at[0].set(first)
    _, _, out = jax.lax.fori_loop(1, npoint, body,
                                  (d, first.astype(jnp.int32), out))
    return out


def group_points(features, idx):
    """features (N, C), idx (M, nsample) -> (M, nsample, C)."""
    return features[idx]


@jax.jit
def three_nn(unknown, known, known_mask=None):
    """(N, 3) x (M, 3) -> (dist (N, 3), idx (N, 3)): 3 nearest knowns."""
    d2 = square_distance(unknown, known)
    if known_mask is not None:
        d2 = jnp.where(known_mask[None, :], d2, _BIG)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.clip(-neg, 0, None)), idx.astype(jnp.int32)


@jax.jit
def three_interpolate(features, idx, dist):
    """Inverse-distance-weighted interpolation (interpolate_gpu.cu).

    features (M, C); idx (N, 3); dist (N, 3) -> (N, C)."""
    w = 1.0 / jnp.clip(dist, 1e-8, None) ** 2
    w = w / w.sum(axis=1, keepdims=True)
    gathered = features[idx]                               # (N, 3, C)
    return (gathered * w[..., None]).sum(axis=1)
