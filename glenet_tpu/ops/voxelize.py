"""Static-shape voxelization, fused on-device.

Replaces the reference's host-side spconv/cumm `Point2VoxelCPU3d`
(pcdet/datasets/processor/data_processor.py:15-60) with a jittable JAX op:
the data loader ships raw padded points (B, MAX_PTS, C) + mask to the device
and voxelization happens inside the compiled step (sort + unique + scatter),
feeding the VFE without a host round-trip.

Contract (matching VoxelGeneratorWrapper semantics):
  - points outside `point_cloud_range` are dropped,
  - at most `max_points_per_voxel` points kept per voxel (in input order),
  - at most `max_voxels` voxels kept,
  - output coords are (z, y, x) integer indices; empty slots are -1.
Voxel slot order is by linearized voxel id (not first-occurrence order as in
the reference) — no consumer depends on voxel order.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import sparse


def _select_voxels_first_occurrence(vid_sorted, sort_idx, n_cells: int,
                                    max_voxels: int):
    """Pick up to max_voxels occupied voxel ids, prioritized by the FIRST
    original point index that touched each voxel (reference first-come
    semantics).  Returns the chosen ids sorted ascending, sentinel-padded
    to (max_voxels,)."""
    n = vid_sorted.shape[0]
    first_of_run = jnp.concatenate(
        [jnp.array([True]), vid_sorted[1:] != vid_sorted[:-1]])
    run_id = jnp.cumsum(first_of_run) - 1                      # (N,)
    # first original-index per run; invalid runs land in segment N-1+
    first_occ = jax.ops.segment_min(sort_idx, run_id, num_segments=n)
    run_vid = jax.ops.segment_min(vid_sorted, run_id, num_segments=n)
    valid_run = run_vid < n_cells
    priority = jnp.where(valid_run, first_occ, n)
    order = jnp.argsort(priority)[:max_voxels]
    chosen = jnp.where(valid_run[order], run_vid[order], n_cells)
    if chosen.shape[0] < max_voxels:        # fewer points than voxel slots
        chosen = jnp.concatenate([
            chosen, jnp.full((max_voxels - chosen.shape[0],), n_cells,
                             chosen.dtype)])
    return jnp.sort(chosen)


@partial(jax.jit, static_argnames=('max_voxels', 'max_points_per_voxel',
                                   'grid_size', 'voxel_size', 'pc_range'))
def voxelize(points, points_mask, voxel_size, pc_range, grid_size,
             max_voxels: int, max_points_per_voxel: int):
    """Args:
        points: (N, C) float — first 3 channels are xyz
        points_mask: (N,) bool — validity of each padded point slot
        voxel_size: (vx, vy, vz) static tuple
        pc_range: (x0, y0, z0, x1, y1, z1) static tuple
        grid_size: (nx, ny, nz) static tuple
    Returns dict:
        voxels:           (max_voxels, max_points_per_voxel, C)
        voxel_coords:     (max_voxels, 3) int32 (z, y, x), -1 pad
        voxel_num_points: (max_voxels,) int32
        voxel_mask:       (max_voxels,) bool
        point_voxel_idx:  (N,) int32 — voxel slot of each point (-1 dropped);
                          enables dynamic (scatter-based) VFEs.
    """
    nx, ny, nz = grid_size
    vsize = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(pc_range[:3], jnp.float32)

    xyz = points[:, :3]
    coords = jnp.floor((xyz - origin) / vsize).astype(jnp.int32)   # (N, 3) x,y,z
    in_range = ((coords >= 0).all(axis=1)
                & (coords[:, 0] < nx) & (coords[:, 1] < ny) & (coords[:, 2] < nz)
                & points_mask)

    # linear voxel id; invalid points get a sentinel beyond the grid
    n_cells = nx * ny * nz
    vid = (coords[:, 2] * (ny * nx) + coords[:, 1] * nx + coords[:, 0])
    vid = jnp.where(in_range, vid, n_cells)

    # sort points by (vid, original index) — stable sort keeps input order
    sort_idx = jnp.argsort(vid, stable=True)
    vid_sorted = vid[sort_idx]

    # unique voxel ids with FIRST-OCCURRENCE overflow priority: when the
    # scene has more than max_voxels occupied cells, the reference keeps
    # voxels in point order (Point2VoxelCPU3d first-come; random under
    # shuffle_points) — NOT by voxel id.  Selecting the lowest ids instead
    # would systematically evict high-z voxels (e.g. every car voxel once
    # the ground plane fills the budget).
    uniq = _select_voxels_first_occurrence(vid_sorted, sort_idx, n_cells,
                                           max_voxels)
    voxel_mask = uniq < n_cells

    # rank of each sorted point within its voxel run
    first_of_run = jnp.concatenate(
        [jnp.array([True]), vid_sorted[1:] != vid_sorted[:-1]])
    run_start = jnp.maximum.accumulate(
        jnp.where(first_of_run, jnp.arange(vid_sorted.shape[0]), 0))
    rank = jnp.arange(vid_sorted.shape[0]) - run_start

    # voxel slot per sorted point (selection is a subset of the ids, so
    # membership must be checked, not just the insertion position).
    # merged_searchsorted: one bitonic sort instead of jnp.searchsorted's
    # HBM-latency-bound binary-search while-loop (~10 ms/step saved).
    slot = sparse.merged_searchsorted(uniq, vid_sorted[None, :])[0]
    slot_c = jnp.clip(slot, 0, max_voxels - 1)
    member = uniq[slot_c] == vid_sorted
    valid_pt = ((vid_sorted < n_cells) & member
                & (rank < max_points_per_voxel) & (slot < max_voxels))
    slot_checked = jnp.where(valid_pt, slot, max_voxels)
    rank_c = jnp.where(valid_pt, rank, max_points_per_voxel)

    voxels = jnp.zeros((max_voxels, max_points_per_voxel, points.shape[1]),
                       points.dtype)
    voxels = voxels.at[slot_checked, rank_c].set(points[sort_idx], mode='drop')

    voxel_num_points = jnp.zeros((max_voxels,), jnp.int32).at[slot_checked].add(
        valid_pt.astype(jnp.int32), mode='drop')

    # decode coords back from linear id (z, y, x)
    z = uniq // (ny * nx)
    rem = uniq % (ny * nx)
    y = rem // nx
    x = rem % nx
    voxel_coords = jnp.where(
        voxel_mask[:, None],
        jnp.stack([z, y, x], axis=1), -1).astype(jnp.int32)

    # map back: per original point, its voxel slot (or -1)
    point_voxel = jnp.full((points.shape[0],), -1, jnp.int32)
    point_voxel = point_voxel.at[sort_idx].set(
        jnp.where(valid_pt, slot, -1).astype(jnp.int32))

    return {
        'voxels': voxels,
        'voxel_coords': voxel_coords,
        'voxel_num_points': voxel_num_points,
        'voxel_mask': voxel_mask,
        'point_voxel_idx': point_voxel,
    }


@partial(jax.jit, static_argnames=('max_voxels', 'grid_size', 'voxel_size',
                                   'pc_range'))
def voxelize_dynamic(points, points_mask, voxel_size, pc_range, grid_size,
                     max_voxels: int):
    """Dynamic voxelization: per-point voxel slot WITHOUT a per-voxel point
    cap and WITHOUT materializing the (V, P, C) gather tensor — feeds the
    scatter-based dynamic VFEs (reference dynamic_pillar_vfe.py:1-142 /
    dynamic_mean_vfe.py, which use torch_scatter over all points).

    Returns dict: voxel_coords (max_voxels, 3) int32 (z, y, x) -1-pad,
    voxel_mask (max_voxels,), point_voxel_idx (N,) int32 (-1 = dropped).
    """
    nx, ny, nz = grid_size
    vsize = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    coords = jnp.floor((points[:, :3] - origin) / vsize).astype(jnp.int32)
    in_range = ((coords >= 0).all(axis=1)
                & (coords[:, 0] < nx) & (coords[:, 1] < ny)
                & (coords[:, 2] < nz) & points_mask)
    n_cells = nx * ny * nz
    vid = coords[:, 2] * (ny * nx) + coords[:, 1] * nx + coords[:, 0]
    vid = jnp.where(in_range, vid, n_cells)
    sort_idx = jnp.argsort(vid, stable=True)
    uniq = _select_voxels_first_occurrence(vid[sort_idx], sort_idx,
                                           n_cells, max_voxels)
    voxel_mask = uniq < n_cells
    slot = sparse.merged_searchsorted(uniq, vid[None, :])[0]
    hit = (slot < max_voxels) & in_range
    hit = hit & (jnp.where(hit, uniq[jnp.clip(slot, 0, max_voxels - 1)],
                           n_cells) == vid)
    point_voxel = jnp.where(hit, slot, -1).astype(jnp.int32)
    z = uniq // (ny * nx)
    rem = uniq % (ny * nx)
    voxel_coords = jnp.where(
        voxel_mask[:, None],
        jnp.stack([z, rem // nx, rem % nx], axis=1), -1).astype(jnp.int32)
    return {'voxel_coords': voxel_coords, 'voxel_mask': voxel_mask,
            'point_voxel_idx': point_voxel}


def compute_grid_size(pc_range, voxel_size):
    grid = (np.asarray(pc_range[3:6]) - np.asarray(pc_range[0:3])) / np.asarray(voxel_size)
    grid = np.round(grid).astype(np.int64)
    return tuple(int(g) for g in grid)  # (nx, ny, nz)
