import jax.numpy as jnp
import numpy as np

from glenet_tpu.ops import scatter, voxelize


VOXEL_SIZE = (0.5, 0.5, 0.5)
PC_RANGE = (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)
GRID = voxelize.compute_grid_size(PC_RANGE, VOXEL_SIZE)  # (8, 8, 4)


def run(points, mask=None, max_voxels=32, max_points=4):
    points = np.asarray(points, np.float32)
    if mask is None:
        mask = np.ones(len(points), bool)
    return voxelize.voxelize(
        jnp.asarray(points), jnp.asarray(mask), VOXEL_SIZE, PC_RANGE, GRID,
        max_voxels=max_voxels, max_points_per_voxel=max_points)


def test_grid_size():
    assert GRID == (8, 8, 4)


def test_basic_grouping():
    pts = [
        [0.1, 0.1, 0.1, 1.0],   # voxel (0,0,0)
        [0.2, 0.3, 0.2, 2.0],   # voxel (0,0,0)
        [1.7, 0.1, 0.1, 3.0],   # voxel (0,0,3) in x
        [10.0, 0.1, 0.1, 4.0],  # out of range
    ]
    out = run(pts)
    n_vox = int(out['voxel_mask'].sum())
    assert n_vox == 2
    counts = np.asarray(out['voxel_num_points'])[:n_vox]
    assert sorted(counts.tolist()) == [1, 2]
    coords = np.asarray(out['voxel_coords'])[:n_vox]
    # coords are (z, y, x)
    assert [0, 0, 0] in coords.tolist()
    assert [0, 0, 3] in coords.tolist()
    # dropped point has voxel idx -1
    assert int(out['point_voxel_idx'][3]) == -1


def test_max_points_per_voxel_cap():
    pts = [[0.1, 0.1, 0.1, float(i)] for i in range(10)]
    out = run(pts, max_points=4)
    n_vox = int(out['voxel_mask'].sum())
    assert n_vox == 1
    assert int(out['voxel_num_points'][0]) == 4
    # first 4 points in input order are kept
    feats = np.asarray(out['voxels'][0, :, 3])
    np.testing.assert_array_equal(feats, [0, 1, 2, 3])


def test_max_voxels_cap():
    pts = [[0.25 + 0.5 * i, 0.25, 0.25, 0.0] for i in range(8)]
    out = run(pts, max_voxels=4)
    assert int(out['voxel_mask'].sum()) == 4


def test_mask_respected():
    pts = [[0.1, 0.1, 0.1, 1.0], [0.1, 0.1, 0.1, 2.0]]
    out = run(pts, mask=np.array([True, False]))
    assert int(out['voxel_num_points'][0]) == 1
    assert float(out['voxels'][0, 0, 3]) == 1.0


def test_mean_vfe_equivalence():
    """Mean of points per voxel via the voxel table == segment_mean via
    point_voxel_idx (the dynamic-VFE path)."""
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 4, (200, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 2, 200)
    feats = np.concatenate([pts, rng.randn(200, 1).astype(np.float32)], axis=1)
    out = run(feats, max_voxels=256, max_points=32)
    n_vox = int(out['voxel_mask'].sum())

    table_mean = (np.asarray(out['voxels']).sum(axis=1)
                  / np.clip(np.asarray(out['voxel_num_points'])[:, None], 1, None))
    seg_mean = np.asarray(scatter.segment_mean(
        jnp.asarray(feats), out['point_voxel_idx'], 256))
    np.testing.assert_allclose(table_mean[:n_vox], seg_mean[:n_vox],
                               rtol=1e-4, atol=1e-5)


def test_segment_max():
    data = jnp.asarray(np.array([[1.0], [5.0], [3.0]], np.float32))
    ids = jnp.asarray(np.array([0, 0, -1]))
    out = np.asarray(scatter.segment_max(data, ids, 2))
    assert out[0, 0] == 5.0
    assert out[1, 0] == 0.0  # empty segment filled


def test_voxel_overflow_keeps_first_occurrence_order():
    """When occupied voxels exceed max_voxels, selection follows FIRST point
    order (reference Point2VoxelCPU3d first-come), NOT voxel-id order —
    low-z filler (ground) must not evict later-listed high-z voxels."""
    vs, pr, grid = (1.0, 1.0, 1.0), (0, 0, 0, 16, 16, 4), (16, 16, 4)
    # 12 "car" points first (z=3 plane), then 64 "ground" points (z=0)
    car = np.stack([np.arange(12, dtype=np.float32) + 0.5,
                    np.full(12, 0.5, np.float32),
                    np.full(12, 3.5, np.float32)], 1)
    gx, gy = np.meshgrid(np.arange(8), np.arange(8))
    ground = np.stack([gx.ravel() + 0.5, gy.ravel() + 0.5,
                       np.full(64, 0.5)], 1).astype(np.float32)
    pts = np.concatenate([car, ground])
    mask = np.ones(len(pts), bool)
    out = voxelize.voxelize(jnp.asarray(pts), jnp.asarray(mask), vs, pr, grid,
                           max_voxels=32, max_points_per_voxel=4)
    coords = np.asarray(out['voxel_coords'])
    vm = np.asarray(out['voxel_mask'])
    # all 12 car voxels (z-index 3) listed first in point order -> kept
    assert (coords[vm][:, 0] == 3).sum() == 12
    # the remaining 20 slots go to the earliest-listed ground voxels
    assert (coords[vm][:, 0] == 0).sum() == 20
    pvi = np.asarray(out['point_voxel_idx'])
    assert (pvi[:12] >= 0).all()             # every car point mapped
    # dropped ground points marked -1
    assert (pvi[12:] == -1).sum() == 44
    # dynamic variant: same selection
    dyn = voxelize.voxelize_dynamic(jnp.asarray(pts), jnp.asarray(mask), vs,
                                   pr, grid, max_voxels=32)
    np.testing.assert_array_equal(np.asarray(dyn['voxel_coords']), coords)
    assert (np.asarray(dyn['point_voxel_idx'])[:12] >= 0).all()


def test_detector_predict_uses_test_voxel_budget():
    """predict must run under the TEST MAX_NUMBER_OF_VOXELS budget and agree
    with the train-budget net when the scene fits in both."""
    import copy
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import jax
    from test_second import TINY_SECOND, make_batch
    from glenet_tpu.models.detectors import build_detector
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.DATA_CONFIG.DATA_PROCESSOR[0].MAX_NUMBER_OF_VOXELS = {
        'train': 256, 'test': 512}
    det = build_detector(cfg)
    assert det.max_voxels == 256 and det.max_voxels_test == 512
    assert det.net_eval is not det.net
    rng = np.random.RandomState(0)
    batch = make_batch(rng, n_points=200)      # << 256 occupied voxels
    variables = det.init(jax.random.PRNGKey(0), batch)
    p_eval = jax.jit(lambda v, b: det.predict(v, b))(variables, batch)
    assert np.isfinite(np.asarray(p_eval['final_boxes'])).all()
    # same params through the train-budget net give identical boxes when
    # nothing overflows either budget
    det2 = build_detector(cfg)
    det2.net_eval = det2.net
    p_train = jax.jit(lambda v, b: det2.predict(v, b))(variables, batch)
    np.testing.assert_allclose(np.asarray(p_eval['final_boxes']),
                               np.asarray(p_train['final_boxes']),
                               atol=1e-4)


def test_voxelize_more_slots_than_points():
    """max_voxels > n_points must still produce (max_voxels,) aligned
    outputs (coords/mask padded with sentinels, voxels array matching)."""
    pts = np.random.RandomState(0).uniform(0, 10, (50, 3)).astype(np.float32)
    out = voxelize.voxelize(jnp.asarray(pts), jnp.ones(50, bool),
                            (1.0, 1.0, 1.0), (0, 0, 0, 16, 16, 16),
                            (16, 16, 16), max_voxels=128,
                            max_points_per_voxel=4)
    assert out['voxel_coords'].shape == (128, 3)
    assert out['voxels'].shape == (128, 4, 3)
    assert out['voxel_mask'].sum() <= 50
    dyn = voxelize.voxelize_dynamic(jnp.asarray(pts), jnp.ones(50, bool),
                                    (1.0, 1.0, 1.0), (0, 0, 0, 16, 16, 16),
                                    (16, 16, 16), max_voxels=128)
    assert dyn['voxel_coords'].shape == (128, 3)
