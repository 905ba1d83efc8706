"""VectorPool aggregation (PV-RCNN++) — TPU-native redesign.

Semantics per reference pcdet/ops/pointnet2/pointnet2_stack/
pointnet2_modules.py:160-469 (VectorPoolLocalInterpolateModule,
VectorPoolAggregationModule, VectorPoolAggregationModuleMSG) and the
vector_pool CUDA kernels (pcdet/ops/pointnet2/pointnet2_stack/src/
vector_pool_gpu.cu:19-485):

  - each query point owns a dense local sub-voxel grid (e.g. 3x3x3) of
    half-extent MAX_NEIGHBOR_DISTANCE;
  - `local_interpolation`: every sub-voxel center inverse-distance
    interpolates the 3 nearest support points (within a cube/ball of
    2x the distance, neighbour_distance_multiplier=2.0), concatenated
    with the 3 relative offsets to those neighbors (9 dims);
  - `voxel_avg_pool` / `voxel_random_choice`: support points are binned
    into the sub-voxel grid and averaged / one representative taken,
    concatenated with the 3-dim pooled local offset;
  - features are first channel-reduced by summing groups of C/r channels
    (pointnet2_modules.py:399);
  - a *separate* (grouped) linear layer mixes each sub-voxel's channels
    independently (Conv1d groups=total_voxels, :279-283), then shared
    post-MLPs;
  - the MSG wrapper runs NUM_GROUPS configs and fuses with the absolute
    query xyz (:458-469).

TPU design: fixed-slot batches + masks everywhere (no ragged stacks, no
batch_cnt bookkeeping).  The CUDA hash-grid / two-step neighbor kernels
become blocked dense distance computations: queries are processed in
lax.map chunks so the (chunk x N) distance matrix stays HBM-bounded, with
the 3-NN extracted by three masked min-reductions (cheaper than top_k at
these N) and the sub-voxel binning turned into 27 mask-matmuls that ride
the MXU.  `sample_points_with_roi` + `sector_fps`
(pcdet/ops/pointnet2/pointnet2_stack/pointnet2_utils.py:400-459) become a
proximity mask + global masked FPS: sector-FPS is a GPU parallelization
trick approximating global FPS, which we can run directly.
"""
from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MaskedBatchNorm

BIG = 1e10


def local_grid_offsets(rmax: float, num_voxel) -> jnp.ndarray:
    """Dense sub-voxel center offsets, (G, 3).

    Mirrors get_dense_voxels_by_center (pointnet2_modules.py:337-359):
    centers at -R + R/n + i * 2R/n, meshgrid in x-major order."""
    grids = []
    for n in num_voxel:
        step = 2.0 * rmax / n
        grids.append(jnp.arange(n, dtype=jnp.float32) * step
                     + (-rmax + rmax / n))
    gx, gy, gz = jnp.meshgrid(*grids, indexing='ij')
    return jnp.stack([gx.reshape(-1), gy.reshape(-1), gz.reshape(-1)], -1)


def _auto_chunk(requested: int, n_support: int) -> int:
    """Cap the chunk so each (chunk x N) matrix stays ~32M f32 (128 MB).
    ~3-4 such intermediates are live at once inside `block` (d2/d,
    in_range, ok), bounding the peak near 0.5 GB regardless of support
    size — Waymo scenes carry ~180k raw points, where an uncapped
    1024-row chunk would be ~740 MB *per matrix*."""
    cap = max(64, (32 * 1024 * 1024) // max(n_support, 1))
    return int(min(requested, cap))


def _chunked_queries(fn, queries, chunk: int):
    """Run fn over (Q, ...) queries in lax.map chunks of `chunk` rows."""
    q = queries.shape[0]
    pad = (-q) % chunk
    padded = jnp.pad(queries, [(0, pad)] + [(0, 0)] * (queries.ndim - 1))
    blocks = padded.reshape(-1, chunk, *queries.shape[1:])
    out = jax.lax.map(fn, blocks)
    out = jax.tree_util.tree_map(
        lambda o: o.reshape(-1, *o.shape[2:])[:q], out)
    return out


def three_nn_within(query, support, support_mask, rmax: float,
                    neighbor_type: int = 0, chunk: int = 1024):
    """3 nearest support points within rmax of each query.

    query (Q, 3); support (N, 3); support_mask (N,).
    neighbor_type: 1 = ball (euclidean), else cube (max-|coord| diff)
    — three_nn_for_vector_pool_by_two_step semantics.
    Returns dist (Q, 3), idx (Q, 3), valid (Q, 3)."""
    chunk = _auto_chunk(chunk, support.shape[0])

    def block(qb):
        d2 = (jnp.sum(qb ** 2, -1, keepdims=True)
              + jnp.sum(support ** 2, -1)[None, :]
              - 2.0 * qb @ support.T)                       # (c, N)
        d = jnp.sqrt(jnp.clip(d2, 0.0, None))
        if neighbor_type == 1:
            in_range = d < rmax
        else:
            # accumulate per-axis so no (c, N, 3) tensor materializes
            in_range = jnp.ones(d.shape, bool)
            for a in range(3):
                in_range &= jnp.abs(qb[:, None, a]
                                    - support[None, :, a]) < rmax
        ok = in_range & support_mask[None, :]
        d = jnp.where(ok, d, BIG)
        idxs, dists, valids = [], [], []
        for _ in range(3):
            i = jnp.argmin(d, axis=1)
            dv = jnp.take_along_axis(d, i[:, None], axis=1)[:, 0]
            idxs.append(i)
            dists.append(dv)
            valids.append(dv < BIG)
            d = d.at[jnp.arange(d.shape[0]), i].set(BIG)
        return (jnp.stack(dists, -1), jnp.stack(idxs, -1),
                jnp.stack(valids, -1))

    return _chunked_queries(block, query, chunk)


def interpolate_into_grids(support_xyz, support_feats, support_mask,
                           new_xyz, grid_offsets, rmax: float,
                           neighbor_type: int = 0,
                           distance_multiplier: float = 2.0,
                           chunk: int = 1024):
    """`local_interpolation` path (pointnet2_modules.py:200-244,361-381).

    support_xyz (N, 3), support_feats (N, C), new_xyz (M, 3),
    grid_offsets (G, 3) -> (M, G, C + 9)."""
    m = new_xyz.shape[0]
    g = grid_offsets.shape[0]
    centers = (new_xyz[:, None, :] + grid_offsets[None]).reshape(m * g, 3)
    dist, idx, valid = three_nn_within(
        centers, support_xyz, support_mask, rmax * distance_multiplier,
        neighbor_type=neighbor_type, chunk=chunk)
    # inverse-distance weights; invalid neighbors get ~zero weight
    dist = jnp.where(valid, dist, BIG)
    w = 1.0 / (dist + 1e-8)
    w = w / jnp.clip(w.sum(-1, keepdims=True), 1e-8, None)
    feats = support_feats[idx]                               # (MG, 3, C)
    interp = (feats * w[..., None]).sum(axis=1)              # (MG, C)
    local = (centers[:, None, :] - support_xyz[idx]).reshape(m * g, 9)
    out = jnp.concatenate([interp, local], axis=-1)
    # rows with no in-range neighbor are zeroed (:224-238 empty_mask)
    out = jnp.where(valid[:, :1], out, 0.0)
    return out.reshape(m, g, -1)


def pool_into_grids(support_xyz, support_feats, support_mask, new_xyz,
                    rmax: float, num_voxel, avg: bool,
                    nsample: int = -1, chunk: int = 2048):
    """`voxel_avg_pool` / `voxel_random_choice` path (vector_pool_gpu.cu
    query_three_nn... / vector_pool kernels; pooling_type 0=avg 1=choice).

    Bins support points into each query's local sub-voxel grid.
    nsample > 0 caps each query at its FIRST nsample in-range support
    points in support order — the reference kernel's scan-order break
    (vector_pool_gpu.cu:341), a perf cap, not a random subsample.
    Returns (M, G, C + 3): pooled features ++ pooled local offset."""
    chunk = _auto_chunk(chunk, support_xyz.shape[0])
    g_total = int(num_voxel[0] * num_voxel[1] * num_voxel[2])
    n = support_xyz.shape[0]
    c = support_feats.shape[-1]
    steps = jnp.asarray(
        [2.0 * rmax / num_voxel[0], 2.0 * rmax / num_voxel[1],
         2.0 * rmax / num_voxel[2]], jnp.float32)
    strides = jnp.asarray(
        [num_voxel[1] * num_voxel[2], num_voxel[2], 1], jnp.int32)

    feats_ext = jnp.concatenate(
        [support_feats, jnp.ones((n, 1), support_feats.dtype)], -1)

    def block(qb):                                           # (cq, 3)
        rel = support_xyz[None, :, :] - qb[:, None, :]       # (cq, N, 3)
        inside = jnp.all(jnp.abs(rel) < rmax, axis=-1) & support_mask[None]
        if nsample > 0:
            rank = jnp.cumsum(inside.astype(jnp.int32), axis=1)
            inside = inside & (rank <= nsample)
        cell = jnp.clip(((rel + rmax) / steps).astype(jnp.int32),
                        0, jnp.asarray(num_voxel, jnp.int32) - 1)
        gid = (cell * strides).sum(-1)                       # (cq, N)

        def per_voxel(carry, gi):
            sel = inside & (gid == gi)                       # (cq, N)
            if avg:
                s = sel.astype(support_feats.dtype)
                pooled = s @ feats_ext                       # (cq, C+1)
                cnt = jnp.clip(pooled[:, -1:], 1.0, None)
                pf = pooled[:, :-1] / cnt
                px = jnp.einsum('qn,qnd->qd', s, rel) / cnt
                any_ = sel.any(-1)
            else:
                first = jnp.argmax(sel, axis=1)              # (cq,)
                any_ = sel.any(-1)
                pf = support_feats[first]
                px = jnp.take_along_axis(rel, first[:, None, None],
                                         axis=1)[:, 0]
            pf = jnp.where(any_[:, None], pf, 0.0)
            px = jnp.where(any_[:, None], px, 0.0)
            return carry, jnp.concatenate([px, pf], -1)      # (cq, 3+C)

        _, per = jax.lax.scan(per_voxel, 0,
                              jnp.arange(g_total, dtype=jnp.int32))
        return jnp.transpose(per, (1, 0, 2))                 # (cq, G, 3+C)

    return _chunked_queries(block, new_xyz, chunk)


def sample_points_with_roi_mask(points, points_mask, rois, roi_valid,
                                sample_radius: float):
    """Keep points within `sample_radius` of any roi, by center distance
    minus half the roi diagonal (pointnet2_utils.sample_points_with_roi).

    points (N, 3); rois (R, 7+) -> mask (N,)."""
    d = jnp.linalg.norm(points[:, None, :] - rois[None, :, :3], axis=-1)
    half_diag = jnp.linalg.norm(rois[:, 3:6], axis=-1) / 2.0
    near = (d - half_diag[None, :]) < sample_radius
    near = near & roi_valid[None, :]
    return near.any(-1) & points_mask


class VectorPoolAggregation(nn.Module):
    """One VectorPool group (VectorPoolAggregationModule)."""
    num_local_voxel: Sequence[int]
    max_neighbor_distance: float
    neighbor_nsample: int = -1
    local_aggregation_type: str = 'local_interpolation'
    num_reduced_channels: int = 30
    num_local_agg_channels: int = 32
    post_mlps: Sequence[int] = (128,)
    neighbor_type: int = 0
    distance_multiplier: float = 2.0
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, new_xyz, train: bool = True):
        """xyz (B, N, 3); feats (B, N, C); new_xyz (B, M, 3)
        -> (B, M, post_mlps[-1])."""
        b, n, c = feats.shape
        r = self.num_reduced_channels
        assert c % r == 0, f'input channels {c} not a multiple of {r}'
        feats = feats.reshape(b, n, -1, r).sum(axis=2)       # (B, N, r)
        g_vox = tuple(int(v) for v in self.num_local_voxel)
        g = g_vox[0] * g_vox[1] * g_vox[2]

        if self.local_aggregation_type == 'local_interpolation':
            # the 3-NN search has no nsample analogue here; all shipped
            # interpolation groups use -1 (all neighbors within range)
            assert self.neighbor_nsample == -1, (
                'NEIGHBOR_NSAMPLE > 0 with local_interpolation is not '
                'implemented (reference three-nn candidate cap); the '
                'shipped configs use -1 for interpolation groups')
            offsets = local_grid_offsets(self.max_neighbor_distance, g_vox)
            vec = jax.vmap(functools.partial(
                interpolate_into_grids, grid_offsets=offsets,
                rmax=self.max_neighbor_distance,
                neighbor_type=self.neighbor_type,
                distance_multiplier=self.distance_multiplier))(
                xyz, feats, xyz_mask, new_xyz)               # (B, M, G, r+9)
        else:
            avg = self.local_aggregation_type == 'voxel_avg_pool'
            vec = jax.vmap(functools.partial(
                pool_into_grids, rmax=self.max_neighbor_distance,
                num_voxel=g_vox, avg=avg,
                nsample=self.neighbor_nsample))(
                xyz, feats, xyz_mask, new_xyz)               # (B, M, G, 3+r)

        # grouped per-voxel linear (Conv1d groups=G, :279-283)
        cin = vec.shape[-1]
        w = self.param('separate_w', nn.initializers.kaiming_normal(),
                       (g, cin, self.num_local_agg_channels))
        h = jnp.einsum('bmgc,gcd->bmgd', vec, w)
        h = h.reshape(b, -1, g * self.num_local_agg_channels)
        h = MaskedBatchNorm(axis_name=self.axis_name, name='separate_bn')(
            h, use_running_average=not train)
        h = nn.relu(h)

        for i, ch in enumerate(self.post_mlps):
            h = nn.Dense(ch, use_bias=False, name=f'post_{i}')(h)
            h = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'post_bn{i}')(
                h, use_running_average=not train)
            h = nn.relu(h)
        return h


class VectorPoolAggregationMSG(nn.Module):
    """VectorPoolAggregationModuleMSG (:423-469): NUM_GROUPS VectorPool
    groups, concat ++ absolute query xyz, shared MSG post-MLPs."""
    model_cfg: Any
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, xyz_mask, feats, new_xyz, train: bool = True):
        from flax.core import unfreeze
        from ..config import Cfg
        mcfg = Cfg(unfreeze(self.model_cfg))
        outs = []
        for k in range(int(mcfg.NUM_GROUPS)):
            gcfg = mcfg[f'GROUP_CFG_{k}']
            outs.append(VectorPoolAggregation(
                num_local_voxel=tuple(gcfg.NUM_LOCAL_VOXEL),
                max_neighbor_distance=float(gcfg.MAX_NEIGHBOR_DISTANCE),
                neighbor_nsample=int(gcfg.NEIGHBOR_NSAMPLE),
                local_aggregation_type=str(mcfg.LOCAL_AGGREGATION_TYPE),
                num_reduced_channels=int(
                    mcfg.get('NUM_REDUCED_CHANNELS') or feats.shape[-1]),
                num_local_agg_channels=int(
                    mcfg.NUM_CHANNELS_OF_LOCAL_AGGREGATION),
                post_mlps=tuple(gcfg.POST_MLPS),
                axis_name=self.axis_name, name=f'group_{k}')(
                xyz, xyz_mask, feats, new_xyz, train=train))
        h = jnp.concatenate(outs + [new_xyz], axis=-1)       # use_xyz (:446)
        for i, ch in enumerate(mcfg.MSG_POST_MLPS):
            h = nn.Dense(int(ch), use_bias=False, name=f'msg_{i}')(h)
            h = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'msg_bn{i}')(
                h, use_running_average=not train)
            h = nn.relu(h)
        return h
