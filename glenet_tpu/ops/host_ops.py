"""ctypes bindings for the native host-side data-pipeline kernels
(native/host_ops.cpp) with transparent numpy fallbacks.

The TPU compute path is XLA/Pallas; these cover the single-core HOST hot
loops (gt-sampling collision tests, point-in-rotated-box masks for
augmentation and gt-database creation) that the reference accelerates with
numba JITs.  Build once with `make -C native`; when the shared library is
absent everything degrades to the vectorized numpy implementations.
"""
from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = Path(__file__).resolve().parents[2] / 'native' / 'libglenet_host.so'
    if so.exists():
        lib = ctypes.CDLL(str(so))
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
        u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
        lib.points_in_rboxes.argtypes = [f32p, ctypes.c_int64, f32p,
                                         ctypes.c_int64, u8p]
        lib.rbox_collision.argtypes = [f32p, ctypes.c_int64, f32p,
                                       ctypes.c_int64, u8p]
        _LIB = lib
    else:
        _LIB = False
    return _LIB


def native_available() -> bool:
    return bool(_load())


def points_in_rboxes(points, boxes):
    """(N, 3) x (M, 7) -> (N, M) bool — point inside rotated box (z within
    dz/2, exact rotated xy; matches utils.box_utils.points_in_boxes_np)."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    boxes = np.ascontiguousarray(boxes[:, :7], np.float32)
    n, m = len(points), len(boxes)
    lib = _load()
    if lib and n and m:
        out = np.empty((n, m), np.uint8)
        lib.points_in_rboxes(points, n, boxes, m, out)
        return out.astype(bool)
    from ..utils import box_utils
    return box_utils.points_in_boxes_np(points, boxes)


def rbox_collision(boxes_a, boxes_b):
    """(A, 7) x (B, 7) -> (A, B) bool rotated BEV rectangle overlap (SAT)."""
    a = np.ascontiguousarray(boxes_a[:, :7], np.float32)
    b = np.ascontiguousarray(boxes_b[:, :7], np.float32)
    na, nb = len(a), len(b)
    lib = _load()
    if lib and na and nb:
        out = np.empty((na, nb), np.uint8)
        lib.rbox_collision(a, na, b, nb, out)
        return out.astype(bool)
    from ..datasets import augmentor_utils as au
    ca = au._bev_corners(a[:, [0, 1, 3, 4, 6]])
    cb = au._bev_corners(b[:, [0, 1, 3, 4, 6]])
    return au._sat_overlap(ca, cb)
