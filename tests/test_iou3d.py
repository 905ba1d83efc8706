import jax.numpy as jnp
import numpy as np
import pytest

from glenet_tpu.ops import iou3d
from glenet_tpu.utils import box_utils


def make_box(x, y, z, dx, dy, dz, heading):
    return np.array([[x, y, z, dx, dy, dz, heading]], np.float32)


def monte_carlo_bev_overlap(box_a, box_b, n=400_000, seed=0):
    """Brute-force oracle: rasterize the bounding region, count points
    inside both rotated rectangles."""
    rng = np.random.RandomState(seed)
    lo = np.minimum(box_a[0, :2], box_b[0, :2]) - max(box_a[0, 3:5].max(), box_b[0, 3:5].max())
    hi = np.maximum(box_a[0, :2], box_b[0, :2]) + max(box_a[0, 3:5].max(), box_b[0, 3:5].max())
    pts = rng.uniform(lo, hi, size=(n, 2))
    area_total = np.prod(hi - lo)

    def inside(box, pts):
        d = pts - box[0, :2]
        c, s = np.cos(-box[0, 6]), np.sin(-box[0, 6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[0, 3] / 2) & (np.abs(ly) <= box[0, 4] / 2)

    both = inside(box_a, pts) & inside(box_b, pts)
    return both.mean() * area_total


def test_identical_boxes():
    b = make_box(0, 0, 0, 4, 2, 1.5, 0.3)
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[1.0]], atol=1e-5)
    iou3 = np.asarray(iou3d.boxes_iou3d(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(iou3, [[1.0]], atol=1e-5)


def test_axis_aligned_overlap():
    a = make_box(0, 0, 0, 2, 2, 2, 0)
    b = make_box(1, 0, 0, 2, 2, 2, 0)
    ov = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov, [[2.0]], atol=1e-5)  # 1 x 2 strip
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[2.0 / 6.0]], atol=1e-5)


def test_disjoint():
    a = make_box(0, 0, 0, 2, 2, 2, 0.5)
    b = make_box(10, 10, 0, 2, 2, 2, 1.0)
    iou = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-6)


def test_rotated_45_square():
    # unit square vs itself rotated 45 deg: intersection is a regular octagon
    # with area 2*(sqrt(2)-1) for unit squares.
    a = make_box(0, 0, 0, 1, 1, 1, 0)
    b = make_box(0, 0, 0, 1, 1, 1, np.pi / 4)
    ov = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov, [[2 * (np.sqrt(2) - 1)]], atol=1e-5)


def test_containment():
    a = make_box(0, 0, 0, 4, 4, 4, 0.7)
    b = make_box(0, 0, 0, 2, 2, 2, 0.7)
    ov = np.asarray(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ov, [[4.0]], atol=1e-4)


@pytest.mark.parametrize('seed', [1, 2, 3])
def test_random_vs_monte_carlo(seed):
    rng = np.random.RandomState(seed)
    for _ in range(5):
        a = make_box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                     rng.uniform(1, 4), rng.uniform(1, 4), 2,
                     rng.uniform(-np.pi, np.pi))
        b = make_box(rng.uniform(-2, 2), rng.uniform(-2, 2), 0,
                     rng.uniform(1, 4), rng.uniform(1, 4), 2,
                     rng.uniform(-np.pi, np.pi))
        got = float(iou3d.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
        want = monte_carlo_bev_overlap(a, b, seed=seed)
        assert abs(got - want) < 0.05, (got, want)


def test_height_overlap_in_3d_iou():
    a = make_box(0, 0, 0, 2, 2, 2, 0)
    b = make_box(0, 0, 1, 2, 2, 2, 0)  # half z-overlap
    iou = float(iou3d.boxes_iou3d(jnp.asarray(a), jnp.asarray(b))[0, 0])
    # overlap = 4 * 1 = 4; union = 8 + 8 - 4 = 12
    np.testing.assert_allclose(iou, 4 / 12, atol=1e-5)


def test_aligned_iou3d_matches_pairwise(rng):
    n = 16
    boxes_a = np.zeros((n, 7), np.float32)
    boxes_a[:, :3] = rng.uniform(-5, 5, (n, 3))
    boxes_a[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes_a[:, 6] = rng.uniform(-np.pi, np.pi, n)
    boxes_b = boxes_a + rng.uniform(-0.3, 0.3, (n, 7)).astype(np.float32)
    aligned = np.asarray(iou3d.boxes_aligned_iou3d(
        jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    full = np.asarray(iou3d.boxes_iou3d(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
    np.testing.assert_allclose(aligned, np.diag(full), rtol=1e-4, atol=1e-5)


def test_nearest_bev_iou_axis_aligned_case(rng):
    # for heading=0 boxes, nearest-bev iou == exact rotated iou
    n = 8
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = rng.uniform(-5, 5, (n, 2))
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    exact = np.asarray(iou3d.boxes_iou_bev(jnp.asarray(boxes), jnp.asarray(boxes)))
    approx = np.asarray(box_utils.boxes3d_nearest_bev_iou(
        jnp.asarray(boxes), jnp.asarray(boxes)))
    np.testing.assert_allclose(approx, exact, atol=1e-4)


def test_corners_roundtrip():
    b = make_box(1, 2, 3, 4, 2, 1.5, 0.3)
    corners = np.asarray(box_utils.boxes_to_corners_3d(jnp.asarray(b)))
    assert corners.shape == (1, 8, 3)
    np.testing.assert_allclose(corners.mean(axis=1), b[:, :3], atol=1e-5)
    corners_np = box_utils.boxes_to_corners_3d_np(b)
    np.testing.assert_allclose(corners, corners_np, atol=1e-5)


def test_points_in_boxes(rng):
    boxes = make_box(0, 0, 0, 2, 4, 2, np.pi / 2)  # rotated: extends 2 in x? no, dy=4 along y rotated to x
    pts = np.array([[1.5, 0, 0], [0, 1.5, 0], [0, 0, 2.0]], np.float32)
    got = box_utils.points_in_boxes_np(pts, boxes)
    # after 90 deg rotation the box spans x in [-2, 2], y in [-1, 1]
    np.testing.assert_array_equal(got[:, 0], [True, False, False])
    got_jax = np.asarray(box_utils.points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    np.testing.assert_array_equal(got, got_jax)
