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
