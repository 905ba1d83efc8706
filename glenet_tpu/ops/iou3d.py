"""Rotated BEV overlap / IoU and 3D IoU — pure JAX, TPU-friendly.

Replaces the reference CUDA kernels (pcdet/ops/iou3d_nms/src/iou3d_nms_kernel.cu
box_overlap :104-226, iou_bev :227, pairwise :236-266 and
pcdet/ops/iou3d/src/iou3d_kernel.cu iou_3d :256, aligned overlap :284) with a
vectorized Sutherland–Hodgman convex-polygon clip over fixed-size (8-vertex)
padded polygons, vmapped over box pairs.  Everything is static-shape; no
data-dependent control flow, so XLA maps it onto the VPU cleanly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Max vertices of the intersection of two convex quads.
_MAX_V = 8
_EPS = 1e-8


def box_to_bev_corners(boxes):
    """(..., 7) -> (..., 4, 2) BEV corners in CCW order."""
    # CCW template: (+,+) (-,+) (-,-) (+,-)
    template = jnp.asarray(
        [[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32) / 2.0
    corners = boxes[..., None, 3:5] * template            # (..., 4, 2)
    cosa = jnp.cos(boxes[..., 6])[..., None]
    sina = jnp.sin(boxes[..., 6])[..., None]
    x = corners[..., 0] * cosa - corners[..., 1] * sina
    y = corners[..., 0] * sina + corners[..., 1] * cosa
    return jnp.stack([x, y], axis=-1) + boxes[..., None, 0:2]


def _clip_by_edge(verts, count, p1, p2):
    """Clip CCW polygon (verts[:count]) by half-plane left of edge p1->p2.

    verts: (_MAX_V, 2); count: scalar int32. Returns (new_verts, new_count).
    """
    v = verts.shape[0]
    idx = jnp.arange(v)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    cur = verts
    nxt = verts[nxt_idx]
    edge = p2 - p1

    def signed_side(q):
        return edge[0] * (q[..., 1] - p1[1]) - edge[1] * (q[..., 0] - p1[0])

    d_cur = signed_side(cur)
    d_nxt = signed_side(nxt)
    cur_in = d_cur >= 0
    nxt_in = d_nxt >= 0
    valid_edge = idx < count

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    inter = cur + t[:, None] * (nxt - cur)

    # Sutherland–Hodgman emission per edge: cur if inside, intersection if
    # the edge crosses the clip line.
    emit_pts = jnp.stack([cur, inter], axis=1).reshape(2 * v, 2)
    emit_valid = jnp.stack(
        [valid_edge & cur_in, valid_edge & (cur_in != nxt_in)],
        axis=1).reshape(2 * v)

    pos = jnp.cumsum(emit_valid) - 1
    pos = jnp.where(emit_valid, pos, 2 * v)  # out-of-range -> dropped
    new_verts = jnp.zeros((v, 2), verts.dtype).at[pos].set(emit_pts, mode='drop')
    new_count = emit_valid.sum().astype(jnp.int32)
    return new_verts, new_count


def _polygon_area(verts, count):
    """Shoelace area of verts[:count] (CCW positive)."""
    v = verts.shape[0]
    idx = jnp.arange(v)
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = verts[nxt_idx]
    cross = verts[:, 0] * nxt[:, 1] - nxt[:, 0] * verts[:, 1]
    cross = jnp.where(idx < count, cross, 0.0)
    return 0.5 * jnp.abs(cross.sum())


def _pair_overlap_bev(corners_a, corners_b):
    """Overlap area of two CCW quads given as (4, 2) corners."""
    verts = jnp.zeros((_MAX_V, 2), jnp.float32).at[:4].set(corners_a)
    count = jnp.int32(4)
    for k in range(4):
        p1 = corners_b[k]
        p2 = corners_b[(k + 1) % 4]
        verts, count = _clip_by_edge(verts, count, p1, p2)
    return _polygon_area(verts, count)


def _row_overlap(box_a, corners_b):
    """One box vs (M, 4, 2) corners -> (M,) overlap areas."""
    corners_a = box_to_bev_corners(box_a[None])[0]
    return jax.vmap(lambda cb: _pair_overlap_bev(corners_a, cb))(corners_b)


@jax.jit
def boxes_overlap_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV overlap areas."""
    corners_b = box_to_bev_corners(boxes_b)
    return jax.vmap(lambda ba: _row_overlap(ba, corners_b))(boxes_a)


@jax.jit
def boxes_iou_bev(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) rotated BEV IoU."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    area_a = (boxes_a[:, 3] * boxes_a[:, 4])[:, None]
    area_b = (boxes_b[:, 3] * boxes_b[:, 4])[None, :]
    return overlap / jnp.clip(area_a + area_b - overlap, 1e-6, None)


@jax.jit
def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7) x (M, 7) -> (N, M) 3D IoU.

    Semantics match iou3d_nms_utils.boxes_iou3d_gpu (reference :88-121):
    rotated BEV overlap x z-extent overlap / union of volumes.
    """
    overlap_bev = boxes_overlap_bev(boxes_a, boxes_b)
    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0, None)
    overlap_3d = overlap_bev * overlap_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, 1e-6, None)


@jax.jit
def boxes_aligned_iou3d(boxes_a, boxes_b):
    """Elementwise 3D IoU of row-aligned boxes: (N, 7) x (N, 7) -> (N,).

    Replaces the reference iou3d_cuda.boxes_aligned_overlap_bev_gpu path
    (pcdet/ops/iou3d/src/iou3d_kernel.cu:284) used for IoU-branch targets.
    """
    corners_a = box_to_bev_corners(boxes_a)
    corners_b = box_to_bev_corners(boxes_b)
    overlap_bev = jax.vmap(_pair_overlap_bev)(corners_a, corners_b)
    a_max = boxes_a[:, 2] + boxes_a[:, 5] / 2
    a_min = boxes_a[:, 2] - boxes_a[:, 5] / 2
    b_max = boxes_b[:, 2] + boxes_b[:, 5] / 2
    b_min = boxes_b[:, 2] - boxes_b[:, 5] / 2
    overlap_h = jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0, None)
    overlap_3d = overlap_bev * overlap_h
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return overlap_3d / jnp.clip(vol_a + vol_b - overlap_3d, 1e-6, None)


def boxes_bev_iou_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """Host/numpy convenience wrapper (runs the JAX op, returns numpy)."""
    return np.asarray(boxes_iou_bev(jnp.asarray(boxes_a, jnp.float32),
                                    jnp.asarray(boxes_b, jnp.float32)))
