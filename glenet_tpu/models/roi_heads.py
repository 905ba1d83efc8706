"""RoI refinement stack: proposal layer, roi target sampling, multi-scale
grid pooling, and the VoxelRCNN(+KL-label) heads.

Semantics per the reference:
  - proposal_layer (roi_head_template.py:51-129): per-sample class-agnostic
    NMS over dense-head decoded boxes -> fixed (num_rois) proposals.
  - ProposalTargetLayer (proposal_target_layer.py:28-239): per sample match
    rois to gts (same-class 3D IoU), subsample ROI_PER_IMAGE with
    FG_RATIO (fg >= min(REG_FG, CLS_FG)), bg split hard/easy by
    CLS_BG_THRESH_LO with HARD_BG_RATIO; roi-iou soft cls labels; carries
    gt_uncertaintys_of_rois.
  - canonical transform + heading flip (roi_head_template.py:130-161).
  - VoxelRCNNKLLabelIoUHead (voxelrcnn_kl_label_iou_head.py:10-182):
    shared/cls/reg FC stacks, reg_std branch (init std 1e-4) + BN-ReLU-FC-
    BN-ReLU-FC-Sigmoid variance->confidence scalar multiplying sigmoid(cls)
    then re-logit'd; KLD reg loss over fg rois + corner loss.

TPU-native redesign of RoI grid pooling: the reference's voxel-query
(pcdet/ops/pointnet2/pointnet2_stack voxel_query_gpu.cu) walks up to 9^3
cells per grid point collecting <=16 neighbors — a scatter/walk pattern that
doesn't map to the MXU/VPU.  Here each of the 6^3 grid points aggregates the
8 ENCLOSING voxel corners of each feature map instead: per corner,
h = mlp_in(feat) + mlp_pos(rel_xyz); pooled = max over corners; mlp_out —
the same information flow (multi-scale neighborhood aggregation with
position encoding and max pooling) with pure coordinate arithmetic: sorted-
id binary search on sparse levels, direct index math on dense levels.
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iou3d, sparse
from ..utils import common, losses

_BIG = 1e9


# ---------------------------------------------------------------------------
# proposal target sampling (pure function, per sample, train only)
# ---------------------------------------------------------------------------

def sample_rois_single(rng, rois, roi_scores, roi_labels, gt_boxes, gt_mask,
                       gt_unc, cfg):
    """Subsample ROI_PER_IMAGE rois with fg/bg ratios (reference
    proposal_target_layer.py:65-239).  Static shapes; rng for sampling.

    Returns dict with rois (R, 7), gt_of_rois (R, 8), roi_ious (R,),
    roi_labels (R,), gt_unc_of_rois (R, 7), and masks.
    """
    r = int(cfg.ROI_PER_IMAGE)
    fg_per_image = int(round(cfg.FG_RATIO * r))
    reg_fg_thresh = float(cfg.REG_FG_THRESH)
    cls_fg_thresh = float(cfg.CLS_FG_THRESH)
    cls_bg_thresh = float(cfg.CLS_BG_THRESH)
    cls_bg_lo = float(cfg.CLS_BG_THRESH_LO)
    hard_bg_ratio = float(cfg.HARD_BG_RATIO)
    fg_thresh = min(reg_fg_thresh, cls_fg_thresh)

    # same-class max IoU (SAMPLE_ROI_BY_EACH_CLASS)
    iou = iou3d.boxes_iou3d(rois[:, :7], gt_boxes[:, :7])       # (N, M)
    same_cls = roi_labels[:, None] == gt_boxes[None, :, 7].astype(jnp.int32)
    iou = jnp.where(same_cls & gt_mask[None, :], iou, -1.0)
    max_iou = jnp.clip(iou.max(axis=1), 0.0, None)
    gt_assign = iou.argmax(axis=1)

    # category masks
    fg = max_iou >= fg_thresh
    easy_bg = max_iou < cls_bg_lo
    hard_bg = (max_iou < reg_fg_thresh) & (max_iou >= cls_bg_lo)

    k_fg, k_hard, k_easy = jax.random.split(rng, 3)

    def ranked_pick(mask, key, count):
        """Random permutation of mask's True entries; returns (count,) idx +
        validity. With replacement when fewer than count (reference uses
        randint for bg)."""
        n = mask.shape[0]
        scores = jnp.where(mask, jax.random.uniform(key, (n,)), _BIG)
        order = jnp.argsort(scores)[:count]
        valid = mask[order]
        return order, valid

    n_fg_avail = fg.sum()
    n_hard = hard_bg.sum()
    n_easy = easy_bg.sum()

    fg_idx, fg_valid = ranked_pick(fg, k_fg, fg_per_image)
    n_fg = jnp.minimum(n_fg_avail, fg_per_image)
    n_bg = r - n_fg

    # bg: hard_num = min(n_bg * ratio, avail); easy fills the rest; when one
    # pool is empty the other fills everything (sampled with replacement)
    hard_want = jnp.where(n_easy > 0,
                          jnp.minimum((n_bg * hard_bg_ratio).astype(jnp.int32),
                                      n_hard),
                          n_bg)
    hard_want = jnp.where(n_hard > 0, hard_want, 0)
    easy_want = n_bg - hard_want

    def pick_with_replacement(mask, key, count_static):
        n = mask.shape[0]
        avail = jnp.clip(mask.sum(), 1, None)
        idx_sorted = jnp.argsort(jnp.where(mask, 0, 1))          # True first
        rnd = jax.random.randint(key, (count_static,), 0, 1_000_000) % avail
        return idx_sorted[rnd]

    hard_idx = pick_with_replacement(hard_bg, k_hard, r)
    easy_idx = pick_with_replacement(easy_bg, k_easy, r)

    # compose the final (R,) index list: [fg x n_fg, hard x hard_want,
    # easy x easy_want] with static-shape masking
    slots = jnp.arange(r)
    take_fg = slots < n_fg
    take_hard = (slots >= n_fg) & (slots < n_fg + hard_want)
    sel = jnp.where(take_fg, fg_idx[jnp.clip(slots, 0, fg_per_image - 1)],
                    jnp.where(take_hard, hard_idx[slots], easy_idx[slots]))
    # degenerate: nothing available at all -> fall back to top-score rois
    any_pool = (n_fg_avail + n_hard + n_easy) > 0
    sel = jnp.where(any_pool, sel, slots % rois.shape[0])

    out_rois = rois[sel]
    out_iou = max_iou[sel]
    out_labels = roi_labels[sel]
    out_scores = roi_scores[sel]
    gt_sel = gt_assign[sel]
    out_gt = gt_boxes[gt_sel]
    out_unc = gt_unc[gt_sel]

    reg_valid = (out_iou > reg_fg_thresh).astype(jnp.int32)

    if cfg.get('CLS_SCORE_TYPE', 'roi_iou') == 'cls':
        # hard labels with an ignored band (proposal_target_layer.py:43-50)
        cls_labels = (out_iou > cls_fg_thresh).astype(jnp.float32)
        ignore = (out_iou > cls_bg_thresh) & (out_iou < cls_fg_thresh)
        cls_labels = jnp.where(ignore, -1.0, cls_labels)
    else:
        # roi_iou soft labels (CLS_SCORE_TYPE: roi_iou)
        fg_m = out_iou > cls_fg_thresh
        bg_m = out_iou < cls_bg_thresh
        interval = (~fg_m) & (~bg_m)
        cls_labels = fg_m.astype(jnp.float32)
        cls_labels = jnp.where(
            interval,
            (out_iou - cls_bg_thresh) / (cls_fg_thresh - cls_bg_thresh),
            cls_labels)

    return {
        'rois': out_rois, 'gt_of_rois_src': out_gt, 'roi_ious': out_iou,
        'roi_labels': out_labels, 'roi_scores': out_scores,
        'gt_unc_of_rois': out_unc, 'reg_valid_mask': reg_valid,
        'rcnn_cls_labels': cls_labels,
    }


def canonical_gt_of_rois(rois, gt_of_rois_src):
    """Gt boxes in the roi canonical frame + heading flip into [-pi/2, pi/2]
    (reference roi_head_template.py:138-160)."""
    roi_center = rois[:, 0:3]
    roi_ry = rois[:, 6] % (2 * np.pi)
    gt = gt_of_rois_src[:, :7]
    shifted = gt[:, 0:3] - roi_center
    local = common.rotate_points_along_z(shifted[:, None, :], -roi_ry)[:, 0]
    heading = (gt[:, 6] - roi_ry) % (2 * np.pi)
    opposite = (heading > np.pi * 0.5) & (heading < np.pi * 1.5)
    heading = jnp.where(opposite, (heading + np.pi) % (2 * np.pi), heading)
    heading = jnp.where(heading > np.pi, heading - 2 * np.pi, heading)
    heading = jnp.clip(heading, -np.pi / 2, np.pi / 2)
    return jnp.concatenate([local, gt[:, 3:6], heading[:, None]], axis=1)


# ---------------------------------------------------------------------------
# RoI grid pooling
# ---------------------------------------------------------------------------

def roi_grid_points(rois, grid_size: int):
    """(R, 7) rois -> (R, G^3, 3) global grid point coords
    (reference voxelrcnn_head.py:196-215)."""
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing='ij'), axis=-1).reshape(-1, 3)
    # reference uses nonzero() order of a ones-cube: x fastest via meshgrid?
    # torch nonzero on (g,g,g) returns row-major (d0, d1, d2) == our 'ij'.
    dense_idx = jnp.asarray(idx, jnp.float32)                    # (G^3, 3)
    sizes = rois[:, 3:6]
    local = (dense_idx[None] + 0.5) / g * sizes[:, None] - sizes[:, None] / 2
    rotated = common.rotate_points_along_z(local, rois[:, 6])
    return rotated + rois[:, None, 0:3]


class CornerAggregation(nn.Module):
    """Per-scale pooling: 8 enclosing voxel corners -> mlp_in + mlp_pos ->
    relu -> max -> mlp_out.  (TPU-native analogue of
    NeighborVoxelSAModuleMSG, voxel_pool_modules.py:8-130.)"""
    mlp_mid: int
    mlp_out: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, corner_feats, rel_xyz, corner_valid, train=True):
        """corner_feats (Q, 8, C); rel_xyz (Q, 8, 3) metric offsets grid
        point -> corner center; corner_valid (Q, 8)."""
        from .layers import MaskedBatchNorm
        h = nn.Dense(self.mlp_mid, use_bias=False, name='mlp_in')(corner_feats)
        h = MaskedBatchNorm(axis_name=self.axis_name, name='bn_in')(
            h, mask=corner_valid, use_running_average=not train)
        p = nn.Dense(self.mlp_mid, use_bias=False, name='mlp_pos')(rel_xyz)
        p = MaskedBatchNorm(axis_name=self.axis_name, name='bn_pos')(
            p, mask=corner_valid, use_running_average=not train)
        h = nn.relu(h + p)
        h = jnp.where(corner_valid[..., None], h, 0.0)
        pooled = h.max(axis=1)                                   # (Q, mid)
        out = nn.Dense(self.mlp_out, use_bias=False, name='mlp_out')(pooled)
        out = MaskedBatchNorm(axis_name=self.axis_name, name='bn_out')(
            out, use_running_average=not train)
        return nn.relu(out)


def ball_taps(query_range, radius, voxel_size_lvl):
    """Static scan-ordered (dz, dy, dx) taps that can contain a neighbor
    within `radius` of a query point anywhere in its cell.

    The reference voxel_query kernel scans dz (outer) / dy / dx (inner)
    over +-query_range and accepts neighbors whose CENTER lies within
    the metric radius of the (continuous) grid point
    (voxel_query_gpu.cu:39-85).  A tap at cell offset d can produce an
    accepted neighbor only if max(0, |d| - 0.5) * vs is within the ball
    per axis — everything else is pruned statically (cuts ~729 taps to
    ~150-250); the exact metric test still runs per query at runtime.
    Returns (T, 3) int32 in the kernel's scan order.
    """
    zr, yr, xr = (int(v) for v in query_range)
    vx, vy, vz = (float(v) for v in voxel_size_lvl)
    taps = []
    for dz in range(-zr, zr + 1):
        mz = max(0.0, abs(dz) - 0.5) * vz
        for dy in range(-yr, yr + 1):
            my = max(0.0, abs(dy) - 0.5) * vy
            for dx in range(-xr, xr + 1):
                mx = max(0.0, abs(dx) - 0.5) * vx
                if mx * mx + my * my + mz * mz <= radius * radius + 1e-6:
                    taps.append((dz, dy, dx))
    return np.asarray(taps, np.int32)


def voxel_query_select(query_xyz, v2p_flat, taps, grid, vs, origin,
                       radius, nsample: int):
    """First-`nsample` active neighbors in scan order within the metric
    ball, per query (reference voxel_query_gpu.cu semantics incl. the
    replicate-first-hit padding of unfilled slots).

    Args:
        query_xyz: (Q, 3) metric grid points;
        v2p_flat: (n_cells,) int32 — active-slot index per cell, -1 empty
            (reference generate_voxel2pinds);
        taps: (T, 3) int32 scan-ordered (dz, dy, dx) from ball_taps;
        grid: (nx, ny, nz) level grid; vs: (3,) metric voxel size at this
        level; origin: (3,) pc_range[:3].
    Returns:
        slot16: (Q, nsample) int32 neighbor slots (replicate-first
            padding; 0 when the ball is empty);
        center16: (Q, nsample, 3) neighbor voxel centers (0 when empty);
        empty: (Q,) bool — no neighbor at all (reference
            empty_ball_mask).
    """
    nx, ny, nz = grid
    cells = jnp.floor((query_xyz - origin) / vs).astype(jnp.int32)  # x,y,z
    tz = cells[None, :, 2] + taps[:, 0:1]                     # (T, Q)
    ty = cells[None, :, 1] + taps[:, 1:2]
    tx = cells[None, :, 0] + taps[:, 2:3]
    in_rng = ((tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny)
              & (tx >= 0) & (tx < nx))
    tid = jnp.where(in_rng, tz * (ny * nx) + ty * nx + tx, 0)
    slot = jnp.where(in_rng,
                     jnp.take(v2p_flat, tid.reshape(-1),
                              mode='clip').reshape(tid.shape), -1)
    center = (jnp.stack([tx, ty, tz], axis=-1).astype(jnp.float32)
              + 0.5) * vs + origin                            # (T, Q, 3)
    d2 = jnp.sum((center - query_xyz[None]) ** 2, axis=-1)
    valid = in_rng & (slot >= 0) & (d2 <= radius * radius)    # (T, Q)

    t = taps.shape[0]
    big = t + 1
    keys = jnp.where(valid, jnp.arange(t, dtype=jnp.int32)[:, None],
                     big).T                                   # (Q, T)
    k = min(nsample, t)
    neg_vals, sel = jax.lax.top_k(-keys, k)                   # (Q, k)
    if k < nsample:       # coarse levels can have fewer taps than slots
        pad = nsample - k
        neg_vals = jnp.pad(neg_vals, ((0, 0), (0, pad)),
                           constant_values=-big)
        sel = jnp.pad(sel, ((0, 0), (0, pad)))
    ok = neg_vals > -big
    slot_qt = slot.T                                          # (Q, T)
    s16 = jnp.take_along_axis(slot_qt, sel, axis=1)
    c16 = jnp.take_along_axis(
        jnp.transpose(center, (1, 0, 2)), sel[..., None], axis=1)
    empty = ~ok[:, 0]
    # unfilled slots replicate the FIRST hit (voxel_query_gpu.cu:70-76);
    # empty balls -> slot 0 + zeroed features/rel downstream
    s16 = jnp.where(ok, s16, s16[:, :1])
    c16 = jnp.where(ok[..., None], c16, c16[:, :1])
    s16 = jnp.where(empty[:, None], 0, s16)
    return s16, c16, empty


class VoxelQueryPool(nn.Module):
    """Reference-faithful per-scale RoI pooling
    (NeighborVoxelSAModuleMSG, voxel_pool_modules.py:8-130): mlp_in
    (linear+BN over the active voxels) -> voxel_query first-16 grouping
    -> pos MLP on (neighbor center - grid point) -> relu(sum) ->
    max/avg pool over nsample -> mlp_out.  BN over the grouped tensors
    is UNMASKED (the reference normalizes over every grouped slot,
    empties included).  Selected by ROI_GRID_POOL.POOL_MODE ==
    'voxel_query' — makes reference VoxelRCNN checkpoints convert
    exactly (weight_converter.convert_voxelrcnn_head_voxel_query)."""
    mlp_mid: int
    mlp_out_ch: int
    query_range: tuple
    radius: float
    nsample: int
    pool_method: str
    grid: tuple
    stride: int
    voxel_size: tuple
    pc_range: tuple
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, feats, active_mask, v2p_flat, grid_pts,
                 train: bool = True):
        """feats (B, N, C) active-voxel features (zeros at invalid);
        active_mask (B, N); v2p_flat (B, n_cells) int32 slot-or--1;
        grid_pts (B, Q, 3).  Returns (B, Q, mlp_out_ch)."""
        from .layers import MaskedBatchNorm
        b, n, _ = feats.shape
        q = grid_pts.shape[1]
        h = nn.Dense(self.mlp_mid, use_bias=False, name='mlp_in')(feats)
        # torch-default eps: the reference pool layers use plain
        # BatchNorm1d/2d (voxel_pool_modules.py:35-49), not pcdet's 1e-3
        h = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                            name='bn_in')(
            h, mask=active_mask, use_running_average=not train)
        h = jnp.where(active_mask[..., None], h, 0.0)

        vs = tuple(float(v) * self.stride for v in self.voxel_size)
        taps = jnp.asarray(ball_taps(self.query_range, self.radius, vs))
        vs_a = jnp.asarray(vs, jnp.float32)
        origin = jnp.asarray(self.pc_range[:3], jnp.float32)

        def one(qxyz, v2p):
            return voxel_query_select(qxyz, v2p, taps, self.grid, vs_a,
                                      origin, self.radius, self.nsample)

        s16, c16, empty = jax.vmap(one)(grid_pts, v2p_flat)   # (B,Q,ns)
        grouped = sparse._take_rows_merged(h, s16)            # (B,Q,ns,mid)
        grouped = jnp.where(empty[..., None, None], 0.0, grouped)
        rel = c16 - grid_pts[:, :, None, :]
        rel = jnp.where(empty[..., None, None], 0.0, rel)

        p = nn.Dense(self.mlp_mid, use_bias=False, name='mlp_pos')(rel)
        p = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                            name='bn_pos')(
            p, use_running_average=not train)                 # unmasked
        g = nn.relu(grouped + p)
        if self.pool_method == 'avg_pool':
            pooled = g.mean(axis=2)
        else:
            pooled = g.max(axis=2)                            # (B,Q,mid)
        out = nn.Dense(self.mlp_out_ch, use_bias=False,
                       name='mlp_out')(pooled)
        out = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                              name='bn_out')(
            out, use_running_average=not train)               # unmasked
        return nn.relu(out)


_CORNER_OFFS = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                    indexing='ij'), -1).reshape(8, 3)


def gather_corners_sparse(query_xyz, feats, ids, mask, grid, stride,
                          voxel_size, pc_range):
    """Corners from a sparse level: merged-sort lookup on the sorted ids.

    query_xyz (Q, 3) -> (feats (Q, 8, C), rel (Q, 8, 3), valid (Q, 8))."""
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    # continuous voxel coords of the query, minus half (corner convention)
    cont = (query_xyz - origin) / vs - 0.5
    base = jnp.floor(cont).astype(jnp.int32)                     # (Q, 3) xyz
    offs = jnp.asarray(_CORNER_OFFS, jnp.int32)                  # (8, 3) zyx? use xyz
    cx = base[:, None, 0] + offs[None, :, 0]
    cy = base[:, None, 1] + offs[None, :, 1]
    cz = base[:, None, 2] + offs[None, :, 2]
    valid = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
             & (cz >= 0) & (cz < nz))
    tid = jnp.where(valid, cz * (ny * nx) + cy * nx + cx, n_cells)
    v = ids.shape[0]
    # merged-sort lookup: jnp.searchsorted is a while-loop of row gathers
    # (HBM latency-bound) — with level caps sized for real dilation the
    # corner lookup dominates the roi stack unless it sorts instead
    pos = jnp.clip(sparse.merged_searchsorted(
        ids, tid.reshape(1, -1))[0], 0, v - 1)
    found = (ids[pos] == tid.reshape(-1)) & (tid.reshape(-1) < n_cells)
    pos = jnp.where(found, pos, v)
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0)
    cf = padded[pos].reshape(*tid.shape, feats.shape[1])         # (Q, 8, C)
    centers = (jnp.stack([cx, cy, cz], -1).astype(jnp.float32) + 0.5) * vs \
        + origin
    rel = centers - query_xyz[:, None, :]
    return cf, rel, found.reshape(tid.shape) & valid


def gather_corners_dense(query_xyz, dense_feats, occ, grid, stride,
                         voxel_size, pc_range):
    """Corners from a dense level (B-less, (D, H, W, C)): direct indexing."""
    nx, ny, nz = grid
    vs = jnp.asarray(voxel_size, jnp.float32) * stride
    origin = jnp.asarray(pc_range[:3], jnp.float32)
    cont = (query_xyz - origin) / vs - 0.5
    base = jnp.floor(cont).astype(jnp.int32)
    offs = jnp.asarray(_CORNER_OFFS, jnp.int32)
    cx = base[:, None, 0] + offs[None, :, 0]
    cy = base[:, None, 1] + offs[None, :, 1]
    cz = base[:, None, 2] + offs[None, :, 2]
    valid = ((cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny)
             & (cz >= 0) & (cz < nz))
    flat = jnp.where(valid, cz * (ny * nx) + cy * nx + cx, nz * ny * nx)
    c = dense_feats.shape[-1]
    # mode='fill' gathers: no concatenated full-map +1-row copy (that copy
    # is ~400 MB/sample at the level-3 grid and was the batch-4 HBM spike)
    cf = jnp.take(dense_feats.reshape(-1, c), flat.reshape(-1), axis=0,
                  mode='fill', fill_value=0).reshape(*flat.shape, c)
    cv = jnp.take(occ.reshape(-1), flat.reshape(-1),
                  mode='fill', fill_value=False).reshape(flat.shape)
    centers = (jnp.stack([cx, cy, cz], -1).astype(jnp.float32) + 0.5) * vs \
        + origin
    rel = centers - query_xyz[:, None, :]
    return cf, rel, valid & cv


class VoxelRCNNHead(nn.Module):
    """RoI refinement head (plain + KL-label-IoU variants).

    model_cfg keys used: SHARED_FC, CLS_FC, REG_FC, DP_RATIO, ROI_GRID_POOL
    (FEATURES_SOURCE, GRID_SIZE, POOL_LAYERS{src: MLPS}), plus `kl_label`
    switch for the reg_std/confidence branches.
    """
    model_cfg: Any
    voxel_size: tuple
    pc_range: tuple
    code_size: int = 7
    kl_label: bool = True
    ple: bool = False   # VoxelRCNNKLLabelIoUPleHead (MMoE expert gates)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rois, multi_scale, train: bool = True):
        """rois: (B, R, 7); multi_scale: backbone dict.
        Returns dict rcnn_cls (B*R, 1), rcnn_reg (B*R, C), rcnn_reg_std."""
        from flax.core import unfreeze
        from ..config import Cfg
        from .layers import MaskedBatchNorm
        mcfg = Cfg(unfreeze(self.model_cfg))  # linen froze the dict field
        pool_cfg = mcfg.ROI_GRID_POOL
        g = int(pool_cfg.GRID_SIZE)
        b, r = rois.shape[:2]
        flat_rois = rois.reshape(b * r, -1)
        grid_pts = roi_grid_points(flat_rois, g)                 # (BR, G3, 3)
        grid_pts = grid_pts.reshape(b, r * g ** 3, 3)

        pooled = []
        for src in pool_cfg.FEATURES_SOURCE:
            level = dict(multi_scale[src])
            # fusion barrier between the backbone outputs and the corner
            # gathers (scatter-add backward); see PERF_NOTES.md on the TPU
            # backward fault under investigation
            level['features'] = jax.lax.optimization_barrier(
                level['features'])
            lay_cfg = pool_cfg.POOL_LAYERS[src]
            mlps = lay_cfg['MLPS'][0]
            stride = level['stride']
            if str(pool_cfg.get('POOL_MODE', 'corner')) == 'voxel_query':
                # reference-faithful NeighborVoxelSAModuleMSG pooling:
                # exact weight conversion from VoxelRCNN checkpoints
                nx_l, ny_l, nz_l = level['grid']
                n_cells = nx_l * ny_l * nz_l
                if level['kind'] == 'sparse':
                    f2d, amask = level['features'], level['mask']
                    ids_b = level['ids']
                    bsz, v = ids_b.shape
                    midx = (jnp.where(amask, ids_b, n_cells)
                            + jnp.arange(bsz, dtype=jnp.int32)[:, None]
                            * (n_cells + 1)).reshape(-1)
                    v2p = jnp.full((bsz * (n_cells + 1),), -1, jnp.int32
                                   ).at[midx].set(
                        jnp.tile(jnp.arange(v, dtype=jnp.int32), bsz),
                        mode='drop').reshape(bsz, n_cells + 1)[:, :n_cells]
                else:
                    df = level['features']
                    bsz = df.shape[0]
                    f2d = df.reshape(bsz, n_cells, df.shape[-1])
                    amask = level['occ'].reshape(bsz, n_cells)
                    v2p = jnp.where(
                        amask, jnp.arange(n_cells, dtype=jnp.int32)[None],
                        -1)
                agg = VoxelQueryPool(
                    mlp_mid=mlps[0], mlp_out_ch=mlps[1],
                    query_range=tuple(int(x)
                                      for x in lay_cfg['QUERY_RANGES'][0]),
                    radius=float(lay_cfg['POOL_RADIUS'][0]),
                    nsample=int(lay_cfg['NSAMPLE'][0]),
                    pool_method=str(lay_cfg.get('POOL_METHOD',
                                                'max_pool')),
                    grid=level['grid'], stride=stride,
                    voxel_size=tuple(self.voxel_size),
                    pc_range=tuple(self.pc_range),
                    axis_name=self.axis_name, name=f'pool_{src}')(
                    f2d, amask, v2p, grid_pts, train)
                pooled.append(agg.reshape(b * r * g ** 3, -1))
                continue
            if level['kind'] == 'sparse':
                gather = jax.vmap(functools.partial(
                    gather_corners_sparse, grid=level['grid'], stride=stride,
                    voxel_size=self.voxel_size, pc_range=self.pc_range))
                cf, rel, cv = gather(grid_pts, level['features'],
                                     level['ids'], level['mask'])
            else:
                gather = jax.vmap(functools.partial(
                    gather_corners_dense, grid=level['grid'], stride=stride,
                    voxel_size=self.voxel_size, pc_range=self.pc_range))
                cf, rel, cv = gather(grid_pts, level['features'], level['occ'])
            q = b * r * g ** 3
            # remat: recompute the aggregation in the backward instead of
            # saving fused residuals (also sidesteps a TPU backward-fusion
            # fault observed when the full pooled graph is differentiated)
            AggRemat = nn.remat(CornerAggregation, static_argnums=(4,))
            agg = AggRemat(
                mlp_mid=mlps[0], mlp_out=mlps[1],
                axis_name=self.axis_name, name=f'pool_{src}')(
                cf.reshape(q, 8, -1), rel.reshape(q, 8, 3),
                cv.reshape(q, 8), train)
            pooled.append(agg)
        feats = jnp.concatenate(pooled, axis=-1)                 # (Q, sumC)
        feats = feats.reshape(b * r, g ** 3 * feats.shape[-1])

        def fc_stack(x, sizes, name):
            # torch-default eps: the reference head FCs use plain
            # BatchNorm1d (voxelrcnn_head.py:40-80), not pcdet's 1e-3
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if i == 0 and train and mcfg.get("DP_RATIO", 0) > 0:
                    x = nn.Dropout(mcfg.DP_RATIO,
                                   deterministic=not train)(x)
            return x

        if self.ple:
            return self._ple_tail(feats, mcfg, train)

        shared = fc_stack(feats, mcfg.SHARED_FC, 'shared')
        cls_feat = fc_stack(shared, mcfg.CLS_FC, 'cls_fc')
        ori_cls = nn.Dense(1, name='cls_pred')(cls_feat)
        reg_feat = fc_stack(shared, mcfg.REG_FC, 'reg_fc')
        reg = nn.Dense(self.code_size, name='reg_pred',
                       kernel_init=nn.initializers.normal(0.001))(reg_feat)
        out = {'rcnn_cls': ori_cls, 'rcnn_reg': reg}

        if self.kl_label:
            reg_std = nn.Dense(self.code_size, name='reg_std',
                               kernel_init=nn.initializers.normal(0.0001))(reg_feat)
            # variance -> confidence scalar (voxelrcnn_kl_label_iou_head.py
            # :14-73): BN - ReLU - FC(64) - BN - ReLU - FC(1) - sigmoid
            h = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                                name='std_bn0')(
                reg_std, use_running_average=not train)
            h = nn.relu(h)
            h = nn.Dense(64, name='std_fc1',
                         kernel_init=nn.initializers.normal(0.0001))(h)
            h = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                                name='std_bn1')(
                h, use_running_average=not train)
            h = nn.relu(h)
            conf = jax.nn.sigmoid(nn.Dense(
                1, name='std_fc2',
                kernel_init=nn.initializers.normal(0.0001))(h))
            p = jax.nn.sigmoid(ori_cls) * conf
            out['rcnn_cls'] = jnp.log((p + 1e-6) / (1 - p + 1e-6))
            out['rcnn_reg_std'] = reg_std
        return out

    def _ple_tail(self, feats, mcfg, train):
        """PLE/MMoE expert-gate tail (VoxelRCNNKLLabelIoUPleHead,
        voxelrcnn_kl_label_iou_head.py:183-448): shared FC -> InitBlock
        (3 experts, per-task softmax gates) -> LastBlock -> cls head from
        task-a features, reg + reg_std heads from task-b features.  No
        variance->confidence coupling in this variant."""
        from .layers import MaskedBatchNorm
        ch = int(mcfg.get('PLE_CHANNELS', 256))

        def dense_bn_relu(x, n, name):
            x = nn.Dense(n, use_bias=False, name=f'{name}_fc')(x)
            x = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'{name}_bn')(
                x, use_running_average=not train)
            return nn.relu(x)

        shared = dense_bn_relu(feats, ch, 'shared')

        # InitBlock (:183-227)
        ea = dense_bn_relu(shared, ch, 'init_expert_a')
        eb = dense_bn_relu(shared, ch, 'init_expert_b')
        es = dense_bn_relu(shared, ch, 'init_expert_share')
        wa = jax.nn.softmax(nn.Dense(2, name='init_gate_a')(shared), axis=1)
        wb = jax.nn.softmax(nn.Dense(2, name='init_gate_b')(shared), axis=1)
        ws = jax.nn.softmax(nn.Dense(3, name='init_gate_share')(shared),
                            axis=1)
        out_a = ea * wa[:, 0:1] + es * wa[:, 1:2]
        out_b = eb * wb[:, 0:1] + es * wb[:, 1:2]
        out_s = ea * ws[:, 0:1] + eb * ws[:, 1:2] + es * ws[:, 2:3]

        # LastBlock (:278-318)
        ea2 = dense_bn_relu(out_a, ch, 'last_expert_a')
        eb2 = dense_bn_relu(out_b, ch, 'last_expert_b')
        es2 = dense_bn_relu(out_s, ch, 'last_expert_share')
        wa2 = jax.nn.softmax(nn.Dense(2, name='last_gate_a')(out_a), axis=1)
        wb2 = jax.nn.softmax(nn.Dense(2, name='last_gate_b')(out_b), axis=1)
        out_a = ea2 * wa2[:, 0:1] + es2 * wa2[:, 1:2]
        out_b = eb2 * wb2[:, 0:1] + es2 * wb2[:, 1:2]

        cls_feat = dense_bn_relu(out_a, ch, 'cls_fc')
        rcnn_cls = nn.Dense(1, name='cls_pred')(cls_feat)
        reg_feat = dense_bn_relu(out_b, ch, 'reg_fc')
        rcnn_reg = nn.Dense(self.code_size, name='reg_pred')(reg_feat)
        reg_std = nn.Dense(self.code_size, name='reg_std',
                           kernel_init=nn.initializers.normal(0.0001))(
            reg_feat)
        return {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg,
                'rcnn_reg_std': reg_std}


class PVRCNNHead(nn.Module):
    """PV-RCNN RoI grid pooling head (reference roi_heads/pvrcnn_head.py:8):
    6^3 grid points per roi aggregate keypoint features with multi-radius
    ball queries (StackSAModuleMSG), then shared/cls/reg FC stacks identical
    in shape to the reference's make_fc_layers."""
    model_cfg: Any
    code_size: int = 7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rois, kp_xyz, kp_feats, train: bool = True):
        """rois (B, R, 7); kp_xyz (B, K, 3); kp_feats (B, K, C) —
        already weighted by keypoint fg scores (pvrcnn_head.py:85).
        Returns dict rcnn_cls (B*R, 1), rcnn_reg (B*R, code_size)."""
        from flax.core import unfreeze
        from ..config import Cfg
        from .layers import MaskedBatchNorm
        from .pfe import StackSAModuleMSG
        mcfg = Cfg(unfreeze(self.model_cfg))
        pool_cfg = mcfg.ROI_GRID_POOL
        g = int(pool_cfg.GRID_SIZE)
        b, r = rois.shape[:2]
        flat_rois = rois.reshape(b * r, -1)
        grid_pts = roi_grid_points(flat_rois, g).reshape(b, r * g ** 3, 3)

        kp_mask = jnp.ones(kp_xyz.shape[:2], bool)
        if pool_cfg.get('NAME', '') == 'VectorPoolAggregationModuleMSG':
            # PV-RCNN++ roi grid pooling (pvrcnn_head_plus semantics:
            # pointnet2_modules VectorPoolAggregationModuleMSG over the
            # weighted keypoint features, queries = roi grid points)
            from .vector_pool import VectorPoolAggregationMSG
            pooled = VectorPoolAggregationMSG(
                model_cfg=dict(pool_cfg), axis_name=self.axis_name,
                name='roi_grid_vpool')(
                kp_xyz, kp_mask, kp_feats, grid_pts, train=train)
        else:
            pooled = StackSAModuleMSG(
                radii=tuple(pool_cfg.POOL_RADIUS),
                nsamples=tuple(pool_cfg.NSAMPLE),
                mlps=tuple(tuple(m) for m in pool_cfg.MLPS),
                axis_name=self.axis_name, name='roi_grid_pool')(
                grid_pts, kp_xyz, kp_feats, kp_mask, train=train)
        feats = pooled.reshape(b * r, g ** 3 * pooled.shape[-1])

        def fc_stack(x, sizes, name):
            # torch-default eps: the reference head FCs use plain
            # BatchNorm1d (voxelrcnn_head.py:40-80), not pcdet's 1e-3
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(eps=1e-5, axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if i == 0 and train and mcfg.get('DP_RATIO', 0) > 0:
                    x = nn.Dropout(mcfg.DP_RATIO,
                                   deterministic=not train)(x)
            return x

        shared = fc_stack(feats, mcfg.SHARED_FC, 'shared')
        cls_feat = fc_stack(shared, mcfg.CLS_FC, 'cls_fc')
        rcnn_cls = nn.Dense(1, name='cls_pred')(cls_feat)
        reg_feat = fc_stack(shared, mcfg.REG_FC, 'reg_fc')
        rcnn_reg = nn.Dense(self.code_size, name='reg_pred',
                            kernel_init=nn.initializers.normal(0.001))(reg_feat)
        return {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg}


class SECONDHead(nn.Module):
    """CIA-SSD-style IoU-scoring RoI head (reference roi_heads/
    second_head.py:7-180, used by second_iou.yaml / SECONDNetIoU):
    a rotated GRID_SIZE^2 bilinear grid-sample of the BEV feature map per
    roi (the reference's affine_grid/grid_sample), shared FC stack, and a
    single IoU logit.  No box refinement — predicted boxes are the rois.
    """
    model_cfg: Any
    voxel_size: tuple
    pc_range: tuple
    code_size: int = 7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rois, spatial_2d, train: bool = True):
        """rois (B, R, 7); spatial_2d (B, H, W, C)."""
        from flax.core import unfreeze
        from ..config import Cfg
        from .layers import MaskedBatchNorm
        from .pfe import bilinear_interpolate
        mcfg = Cfg(unfreeze(self.model_cfg))
        pool_cfg = mcfg.ROI_GRID_POOL
        g = int(pool_cfg.GRID_SIZE)
        ds = float(pool_cfg.DOWNSAMPLE_RATIO)
        b, r = rois.shape[:2]
        h, w, c = spatial_2d.shape[1:]

        vx, vy = self.voxel_size[0] * ds, self.voxel_size[1] * ds
        x0, y0 = self.pc_range[0], self.pc_range[1]
        # normalized grid at half-pixel offsets (affine_grid
        # align_corners=False convention)
        lin = (2.0 * (np.arange(g) + 0.5) / g - 1.0).astype(np.float32)
        gy, gx = np.meshgrid(lin, lin, indexing='ij')
        gx = jnp.asarray(gx.reshape(-1))                   # (G^2,)
        gy = jnp.asarray(gy.reshape(-1))

        def pool_one(rois_s, feat_s):
            cx = (rois_s[:, 0] - x0) / vx                  # feature px
            cy = (rois_s[:, 1] - y0) / vy
            hx = rois_s[:, 3] / vx / 2
            hy = rois_s[:, 4] / vy / 2
            ca, sa = jnp.cos(rois_s[:, 6]), jnp.sin(rois_s[:, 6])
            u = cx[:, None] + hx[:, None] * (gx[None] * ca[:, None]
                                             - gy[None] * sa[:, None])
            v = cy[:, None] + hy[:, None] * (gx[None] * sa[:, None]
                                             + gy[None] * ca[:, None])
            return bilinear_interpolate(
                feat_s, u.reshape(-1), v.reshape(-1)).reshape(
                rois_s.shape[0], g * g, c)

        pooled = jax.vmap(pool_one)(rois, spatial_2d)      # (B, R, G^2, C)
        pooled = jax.lax.stop_gradient(pooled)             # reference .detach()
        feats = pooled.reshape(b * r, g * g * c)

        x = feats
        n_shared = len(mcfg.SHARED_FC)
        for i, s in enumerate(mcfg.SHARED_FC):
            x = nn.Dense(s, use_bias=False, name=f'shared_{i}')(x)
            x = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'shared_bn{i}')(
                x, use_running_average=not train)
            x = nn.relu(x)
            if i != n_shared - 1 and train and mcfg.get('DP_RATIO', 0) > 0:
                x = nn.Dropout(mcfg.DP_RATIO, deterministic=not train)(x)
        for i, s in enumerate(mcfg.IOU_FC):
            x = nn.Dense(s, use_bias=False, name=f'iou_{i}')(x)
            x = MaskedBatchNorm(axis_name=self.axis_name,
                                name=f'iou_bn{i}')(
                x, use_running_average=not train)
            x = nn.relu(x)
        rcnn_iou = nn.Dense(1, name='iou_pred')(x)
        # boxes are unrefined rois: zero residuals decode back to the roi
        return {'rcnn_cls': rcnn_iou,
                'rcnn_reg': jnp.zeros((b * r, self.code_size)),
                'no_reg_loss': True}


class PartA2FCHead(nn.Module):
    """Part-aggregation RoI head (reference roi_heads/partA2_head.py:10-224):
    roiaware-pool the UNet voxel-point features (max) and the part/seg
    features (avg) into per-roi (G, G, G) grids, run two small 3D conv
    stacks over each (occupancy-masked dense convs — the TPU analogue of
    the reference's per-roi sparse subm convs), concat, flatten, shared FC
    + cls/reg stacks."""
    model_cfg: Any
    code_size: int = 7
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rois, point_coords, point_feats, part_feats,
                 point_mask, train: bool = True):
        """rois (B, R, 7); point_coords (B, V, 3); point_feats (B, V, C);
        part_feats (B, V, 4); point_mask (B, V)."""
        from flax.core import unfreeze
        from ..config import Cfg
        from ..ops import roiaware_pool
        from .layers import MaskedBatchNorm
        from .spconv_backbone import DenseConvBN
        mcfg = Cfg(unfreeze(self.model_cfg))
        pool_cfg = mcfg.ROI_AWARE_POOL
        g = int(pool_cfg.POOL_SIZE)
        c0 = int(pool_cfg.NUM_FEATURES) // 2
        b, r = rois.shape[:2]

        pooled_part = jax.vmap(functools.partial(
            roiaware_pool.roiaware_pool3d, out_size=g, method='avg'))(
            point_coords, part_feats, rois, points_mask=point_mask)
        pooled_rpn = jax.vmap(functools.partial(
            roiaware_pool.roiaware_pool3d, out_size=g, method='max'))(
            point_coords, point_feats, rois, points_mask=point_mask)
        pooled_part = pooled_part.reshape(b * r, g, g, g, -1)
        pooled_rpn = pooled_rpn.reshape(b * r, g, g, g, -1)
        # occupancy from the part grid (partA2_head.py:186-188)
        occ = (pooled_part != 0).any(axis=-1)

        def conv_stack(x, occ, name):
            x, _ = DenseConvBN(64, 3, 1, 1, submanifold=True,
                               axis_name=self.axis_name,
                               name=f'{name}_0')(x, occ, train=train)
            x, _ = DenseConvBN(c0, 3, 1, 1, submanifold=True,
                               axis_name=self.axis_name,
                               name=f'{name}_1')(x, occ, train=train)
            return x

        x_part = conv_stack(pooled_part, occ, 'conv_part')
        x_rpn = conv_stack(pooled_rpn, occ, 'conv_rpn')
        merged = jnp.concatenate([x_rpn, x_part], axis=-1)     # (BR,g,g,g,2c0)
        feats = merged.reshape(b * r, -1)

        def fc_stack(x, sizes, name, dropout_at=None):
            for i, s in enumerate(sizes):
                x = nn.Dense(s, use_bias=False, name=f'{name}_{i}')(x)
                x = MaskedBatchNorm(axis_name=self.axis_name,
                                    name=f'{name}_bn{i}')(
                    x, use_running_average=not train)
                x = nn.relu(x)
                if (dropout_at is not None and i in dropout_at and train
                        and mcfg.get('DP_RATIO', 0) > 0):
                    x = nn.Dropout(mcfg.DP_RATIO,
                                   deterministic=not train)(x)
            return x

        # reference: dropout after each shared FC except the last
        n_shared = len(mcfg.SHARED_FC)
        shared = fc_stack(feats, mcfg.SHARED_FC, 'shared',
                          dropout_at=set(range(n_shared - 1)))
        cls_feat = fc_stack(shared, mcfg.CLS_FC, 'cls_fc', dropout_at={0})
        rcnn_cls = nn.Dense(1, name='cls_pred')(cls_feat)
        reg_feat = fc_stack(shared, mcfg.REG_FC, 'reg_fc', dropout_at={0})
        rcnn_reg = nn.Dense(self.code_size, name='reg_pred',
                            kernel_init=nn.initializers.normal(0.001))(reg_feat)
        return {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg}


# ---------------------------------------------------------------------------
# decode + losses (pure)
# ---------------------------------------------------------------------------

def decode_rcnn_boxes(rois, rcnn_reg, box_coder):
    """rois (B, R, 7), rcnn_reg (B*R, C) -> (B, R, 7) global boxes
    (reference template :288-316)."""
    b, r = rois.shape[:2]
    flat_rois = rois.reshape(b * r, -1)
    local_rois = flat_rois.at[:, 0:3].set(0.0)
    dec = box_coder.decode(rcnn_reg, local_rois[:, :box_coder.code_size])
    rotated = common.rotate_points_along_z(dec[:, None, :], flat_rois[:, 6])[:, 0]
    rotated = rotated.at[:, 0:3].add(flat_rois[:, 0:3])
    return rotated.reshape(b, r, -1)


def rcnn_cls_loss(rcnn_cls, rcnn_cls_labels):
    """BCE on iou-derived soft labels (template :246-272)."""
    logits = rcnn_cls.reshape(-1)
    labels = rcnn_cls_labels.reshape(-1)
    loss = losses.sigmoid_bce_with_logits(logits, labels)
    valid = (labels >= 0).astype(jnp.float32)
    return (loss * valid).sum() / jnp.clip(valid.sum(), 1.0, None)


def rcnn_reg_loss(rcnn_reg, rcnn_reg_std, rois, gt_of_rois_ct,
                  gt_of_rois_src, gt_unc_of_rois, reg_valid_mask, box_coder,
                  loss_weights, kl_label=True, corner_weight=1.0,
                  code_weights=None):
    """KL (or plain smooth-L1) reg loss over fg rois + corner loss
    (voxelrcnn_kl_label_iou_head.py:93-180 / roi_head_template :163-244)."""
    b, r = rois.shape[:2]
    n = b * r
    flat_rois = rois.reshape(n, -1)[:, :box_coder.code_size]
    rois_anchor = flat_rois.at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    reg_targets = box_coder.encode(gt_of_rois_ct.reshape(n, -1)[:, :7],
                                   rois_anchor)
    fg = reg_valid_mask.reshape(n) > 0
    fg_sum = jnp.clip(fg.sum(), 1, None).astype(jnp.float32)
    rcnn_reg = rcnn_reg.reshape(n, -1)

    l1 = losses.weighted_smooth_l1(
        rcnn_reg[None], reg_targets[None], code_weights=code_weights)[0]
    w = loss_weights['rcnn_reg_weight']
    metrics = {}
    if kl_label:
        s = jnp.clip(rcnn_reg_std.reshape(n, -1), -50.0, None)
        t = jnp.log(gt_unc_of_rois.reshape(n, -1) + 1e-10)
        fgf = fg[:, None].astype(jnp.float32)
        src = (jnp.exp(-s) * l1 * fgf).sum() / fg_sum * w
        square = (jnp.exp(t - s) * fgf).sum() / fg_sum * w
        log_t = (-0.5 * (t - s) * fgf).sum() / fg_sum * w
        reg_loss = src + square + log_t
        metrics.update({'rcnn_loss_reg_src': src,
                        'rcnn_loss_reg_square': square,
                        'rcnn_loss_reg_log': log_t})
    else:
        reg_loss = (l1 * fg[:, None]).sum() / fg_sum * w

    # corner loss on fg rois (masked; fg_sum-normalized mean)
    local_anchor = flat_rois.at[:, 0:3].set(0.0)
    dec = box_coder.decode(rcnn_reg, local_anchor)
    dec = common.rotate_points_along_z(dec[:, None, :], flat_rois[:, 6])[:, 0]
    dec = dec.at[:, 0:3].add(flat_rois[:, 0:3])
    corner = losses.corner_loss_lidar(
        dec[:, :7], gt_of_rois_src.reshape(n, -1)[:, :7])
    corner = (corner * fg).sum() / fg_sum * corner_weight
    metrics['rcnn_loss_corner'] = corner
    return reg_loss + corner, metrics
