"""Native host-op kernels (C++ via ctypes) vs the numpy references."""
import numpy as np
import pytest

from glenet_tpu.ops import host_ops


def rand_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    b[:, 2] = rng.uniform(-2, 1, n)
    b[:, 3:6] = rng.uniform(1, 5, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_native_points_in_rboxes_matches_numpy(rng):
    from glenet_tpu.utils import box_utils
    pts = rng.uniform(-25, 25, (500, 3)).astype(np.float32)
    boxes = rand_boxes(rng, 20)
    got = host_ops.points_in_rboxes(pts, boxes)
    want = box_utils.points_in_boxes_np(pts, boxes)
    # exact boundary points may differ by <=/<' conventions at f32 eps;
    # random continuous data never lands on boundaries
    np.testing.assert_array_equal(got, want)


def test_native_rbox_collision_matches_sat(rng):
    from glenet_tpu.datasets import augmentor_utils as au
    a = rand_boxes(rng, 16)
    b = rand_boxes(rng, 24)
    got = host_ops.rbox_collision(a, b)
    ca = au._bev_corners(a[:, [0, 1, 3, 4, 6]])
    cb = au._bev_corners(b[:, [0, 1, 3, 4, 6]])
    want = au._sat_overlap(ca, cb)
    np.testing.assert_array_equal(got, want)


def test_native_library_builds():
    """The shared library should be buildable in this environment (the
    fallback keeps working without it)."""
    import subprocess
    from pathlib import Path
    root = Path(host_ops.__file__).resolve().parents[2]
    r = subprocess.run(['make', '-C', str(root / 'native')],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert host_ops.native_available()
