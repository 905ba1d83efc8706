"""Augmentation geometry: noise_per_object collision/consistency invariants,
translations, local rot/scale, frustum dropouts, SE-SSD pyramid augs."""
import numpy as np
import pytest

from glenet_tpu.datasets import augmentor_utils as au


def make_box(x, y, ry=0.0, dims=(3.9, 1.6, 1.56), z=-1.0):
    return np.array([x, y, z, *dims, ry], np.float64)


def points_in(box, n, rng, shrink=0.9):
    local = rng.uniform(-0.5, 0.5, (n, 3)) * np.asarray(box[3:6]) * shrink
    c, s = np.cos(box[6]), np.sin(box[6])
    x = local[:, 0] * c - local[:, 1] * s + box[0]
    y = local[:, 0] * s + local[:, 1] * c + box[1]
    z = local[:, 2] + box[2]
    return np.stack([x, y, z, np.ones(n)], 1)


def test_sat_overlap_oracle(rng):
    """SAT rectangle overlap matches the IoU-based oracle."""
    from glenet_tpu.ops.iou3d import boxes_bev_iou_np
    n = 24
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-6, 6, (n, 2))
    boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    corners = au._bev_corners(boxes[:, [0, 1, 3, 4, 6]])
    got = au._sat_overlap(corners, corners)
    iou = boxes_bev_iou_np(boxes, boxes)
    want = iou > 1e-6
    # ignore edge-touching ambiguity: compare where IoU is clearly 0 or > 1e-3
    decisive = (iou < 1e-7) | (iou > 1e-3)
    np.testing.assert_array_equal(got[decisive], want[decisive])


def test_noise_per_object_moves_box_and_points(rng):
    box = make_box(5, 0, 0.3)
    pts = points_in(box, 50, rng)
    gt, new_pts = au.noise_per_object(
        box[None], pts, rotation_perturb=(0.5, 0.5),
        center_noise_std=(1e-9, 1e-9, 1e-9), num_try=1,
        rng=np.random.RandomState(0))
    # heading rotated by exactly 0.5; points still inside the moved box
    assert abs(gt[0, 6] - (0.3 + 0.5)) < 1e-6
    assert au.get_points_in_box(new_pts, gt[0]).all()
    # point-box relative geometry preserved (rigid transform)
    d_old = np.linalg.norm(pts[:, :2] - box[:2], axis=1)
    d_new = np.linalg.norm(new_pts[:, :2] - gt[0, :2], axis=1)
    np.testing.assert_allclose(d_old, d_new, atol=1e-6)


def test_noise_per_object_collision_rejected(rng):
    """Two adjacent boxes with noise that would always collide -> no noise."""
    b1 = make_box(5, 0)
    b2 = make_box(5, 1.8)      # 0.2 m gap in y
    pts = np.concatenate([points_in(b1, 20, rng), points_in(b2, 20, rng)])
    gt, _ = au.noise_per_object(
        np.stack([b1, b2]), pts, rotation_perturb=(0.0, 0.0),
        center_noise_std=(1e-9, 1.0, 1e-9),  # y-noise would collide often
        num_try=8, rng=np.random.RandomState(3))
    # boxes never end up overlapping
    corners = au._bev_corners(gt[:, [0, 1, 3, 4, 6]])
    assert not au._sat_overlap(corners[:1], corners[1:])[0, 0]


def test_world_and_local_translation(rng):
    box = make_box(5, 0)
    far = np.array([[20.0, 8.0, -1.0, 1.0]])
    pts = np.concatenate([points_in(box, 30, rng), far])
    gt, p = au.random_translation_along_axis(
        box[None], pts, 0.5, 'x', np.random.RandomState(0))
    shift = gt[0, 0] - box[0]
    np.testing.assert_allclose(p[:, 0] - pts[:, 0], shift, atol=1e-9)

    gt, p = au.random_local_translation_along_axis(
        box[None], pts, [0.2, 0.4], 'y', np.random.RandomState(0))
    shift = gt[0, 1] - box[1]
    assert 0.2 <= shift <= 0.4
    np.testing.assert_allclose(p[:30, 1] - pts[:30, 1], shift, atol=1e-9)
    assert p[30, 1] == pts[30, 1]        # far point untouched


def test_local_rotation_and_scaling(rng):
    box = make_box(5, 0, 0.2)
    pts = points_in(box, 40, rng)
    gt, p = au.local_rotation(box[None], pts, [0.3, 0.3],
                              np.random.RandomState(0))
    assert abs(gt[0, 6] - 0.5) < 1e-9
    assert au.get_points_in_box(p, gt[0]).all()

    gt, p = au.local_scaling(box[None], pts, [1.15, 1.25],
                             np.random.RandomState(0))
    scale = gt[0, 3] / box[3]
    assert 1.15 <= scale <= 1.25
    np.testing.assert_allclose(gt[0, 3:6], box[3:6] * scale, rtol=1e-9)
    assert au.get_points_in_box(p, gt[0]).all()


def test_global_frustum_dropout(rng):
    pts = rng.uniform(-1, 1, (200, 4))
    boxes = np.stack([make_box(0, 0, z=0.9), make_box(0, 0, z=-0.9)])
    gt, p, keep_b = au.global_frustum_dropout(
        boxes, pts, [0.3, 0.3], 'top', np.random.RandomState(0))
    thr = pts[:, 2].max() - 0.3 * (pts[:, 2].max() - pts[:, 2].min())
    assert (p[:, 2] < thr).all()
    assert keep_b.tolist() == [False, True]


def test_local_frustum_dropout(rng):
    box = make_box(5, 0)
    pts = points_in(box, 100, rng)
    gt, p = au.local_frustum_dropout(
        box[None], pts, [0.5, 0.5], 'top', np.random.RandomState(0))
    thr = (box[2] + box[5] / 2) - 0.5 * box[5]
    assert (p[:, 2] < thr).all()
    assert len(p) < 100


def test_pyramid_dropout_and_sparsify(rng):
    box = make_box(5, 0, 0.0)
    pts = points_in(box, 300, rng)
    gt, p, pyr = au.local_pyramid_dropout(
        box[None], pts, 1.0, np.random.RandomState(0))
    assert len(p) < 300                 # one face pyramid dropped
    assert pyr.shape[0] == 0            # dropped boxes leave the pyramid set

    gt, p2, pyr = au.local_pyramid_sparsify(
        box[None], pts, 1.0, 10, np.random.RandomState(1))
    assert len(p2) < 300


def test_pyramid_swap(rng):
    b1 = make_box(5, 0)
    b2 = make_box(15, 5, 0.7)
    pts = np.concatenate([points_in(b1, 200, rng), points_in(b2, 200, rng)])
    gt, p = au.local_pyramid_swap(
        np.stack([b1, b2]), pts, 1.0, 5, np.random.RandomState(2))
    # total point count preserved (swap moves, never deletes)
    assert len(p) == 400
    # swapped points live inside their destination boxes (loose: margin box)
    in1 = au.get_points_in_box(p, b1)
    in2 = au.get_points_in_box(p, b2)
    assert (in1 | in2).mean() > 0.95


def test_augmentor_queue_integration(rng):
    """Config-driven queue runs the new augs end-to-end."""
    from glenet_tpu.config import Cfg
    from glenet_tpu.datasets.augmentor import DataAugmentor
    cfg = Cfg({'AUG_CONFIG_LIST': [
        {'NAME': 'noise_per_object',
         'GT_ROTATION_NOISE': [-0.2, 0.2],
         'GT_LOC_NOISE_STD': [0.2, 0.2, 0.1], 'NUM_TRY': 10},
        {'NAME': 'random_world_translation',
         'ALONG_AXIS_LIST': ['x', 'y'], 'NOISE_TRANSLATE_STD': 0.2},
        {'NAME': 'random_local_frustum_dropout',
         'DIRECTION': ['top'], 'INTENSITY_RANGE': [0.1, 0.2]},
        {'NAME': 'random_local_pyramid_aug', 'DROP_PROB': 0.3,
         'SPARSIFY_PROB': 0.3, 'SPARSIFY_MAX_NUM': 20,
         'SWAP_PROB': 0.3, 'SWAP_MAX_NUM': 20},
    ]})
    aug = DataAugmentor(None, cfg, ['Car'], seed=0)
    box = make_box(5, 0)
    d = {'gt_boxes': box[None].astype(np.float32),
         'points': points_in(box, 100, rng).astype(np.float32),
         'gt_boxes_mask': np.ones(1, bool),
         'gt_names': np.array(['Car'])}
    out = aug(d)
    assert np.isfinite(out['gt_boxes']).all()
    assert np.isfinite(out['points']).all()
