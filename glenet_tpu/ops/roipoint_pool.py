"""RoI point pooling — TPU equivalent of the reference roipoint_pool3d CUDA
extension (pcdet/ops/roipoint_pool3d/src/roipoint_pool3d_kernel.cu:38-164,
wrapped by roipoint_pool3d_utils.py).

Semantics replicated exactly:
  - rois are enlarged by `extra_width` (box_utils.enlarge_box3d: dims +=
    extra, center unchanged);
  - for each roi, the FIRST `num_sampled` in-box point indices in point
    order are taken (get_pooled_idx);
  - fewer than num_sampled hits -> cyclic duplication (idx[k % cnt]);
  - zero hits -> pooled output all zeros + empty flag.

Static shapes throughout: the selection is a rank-scatter (cumsum of the
in-box mask gives each hit its slot) instead of the CUDA sequential walk.
Per-sample pure function; vmap over the batch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import box_utils


def roipoint_pool3d(points_xyz, point_features, rois, num_sampled: int,
                    extra_width=(0.0, 0.0, 0.0), points_mask=None):
    """Args:
        points_xyz: (P, 3); point_features: (P, C); rois: (R, 7);
        points_mask: (P,) validity (padded slots excluded).
    Returns:
        pooled: (R, num_sampled, 3 + C) — raw xyz + features (canonical
                transform is the caller's job, as in the reference);
        empty: (R,) bool — no point in the (enlarged) roi.
    """
    p = points_xyz.shape[0]
    r = rois.shape[0]
    enlarged = rois.at[:, 3:6].add(jnp.asarray(extra_width, rois.dtype))
    inbox = box_utils.points_in_boxes(points_xyz, enlarged)      # (P, R)
    if points_mask is not None:
        inbox = inbox & points_mask[:, None]
    inbox = inbox.T                                              # (R, P)

    cnt = inbox.sum(axis=1)                                      # (R,)
    rank = jnp.cumsum(inbox, axis=1) - 1                         # slot per hit
    slot = jnp.where(inbox & (rank < num_sampled), rank, num_sampled)
    # scatter point index into its slot (one extra dump column)
    idx0 = jnp.zeros((r, num_sampled + 1), jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(r)[:, None], (r, p))
    pidx = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None], (r, p))
    idx0 = idx0.at[rows, slot].set(pidx, mode='drop')
    idx0 = idx0[:, :num_sampled]                                 # (R, S)

    # cyclic duplicate fill: slot k >= cnt reads slot k % cnt
    k = jnp.arange(num_sampled)[None, :]
    safe_cnt = jnp.clip(cnt, 1, None)[:, None]
    read = jnp.where(k < safe_cnt, k, k % safe_cnt)
    idx = jnp.take_along_axis(idx0, read, axis=1)                # (R, S)

    feats = jnp.concatenate([points_xyz, point_features], axis=1)
    pooled = feats[idx]                                          # (R, S, 3+C)
    empty = cnt == 0
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty
