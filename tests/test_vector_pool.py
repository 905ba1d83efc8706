"""VectorPool (PV-RCNN++) primitive tests vs numpy oracles.

Oracle semantics from reference pointnet2_stack/pointnet2_modules.py
(get_dense_voxels_by_center :337-359, local interpolation :200-244) and
vector_pool_gpu.cu binning."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glenet_tpu.models import vector_pool as vp


def test_local_grid_offsets_match_reference_formula():
    r, nv = 0.8, (3, 3, 3)
    got = np.asarray(vp.local_grid_offsets(r, nv))
    # reference: torch.arange(-R + R/n, R - R/n + 1e-5, 2R/n), meshgrid ij
    xs = np.arange(-r + r / 3, r - r / 3 + 1e-5, 2 * r / 3)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing='ij')
    want = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == (27, 3)


def test_three_nn_within_cube_oracle():
    rng = np.random.RandomState(0)
    support = rng.uniform(-2, 2, (64, 3)).astype(np.float32)
    mask = rng.rand(64) > 0.25
    query = rng.uniform(-2, 2, (10, 3)).astype(np.float32)
    rmax = 1.0
    dist, idx, valid = vp.three_nn_within(
        jnp.asarray(query), jnp.asarray(support), jnp.asarray(mask),
        rmax, neighbor_type=0, chunk=4)
    dist, idx, valid = map(np.asarray, (dist, idx, valid))
    for q in range(10):
        diff = np.abs(support - query[q])
        ok = (diff < rmax).all(1) & mask
        d = np.linalg.norm(support - query[q], axis=1)
        d[~ok] = np.inf
        order = np.argsort(d)[:3]
        n_ok = int(ok.sum())
        for j in range(min(3, n_ok)):
            assert valid[q, j]
            assert idx[q, j] == order[j]
            np.testing.assert_allclose(dist[q, j], d[order[j]], rtol=1e-4)
        for j in range(min(3, n_ok), 3):
            assert not valid[q, j]


def test_pool_into_grids_avg_oracle():
    rng = np.random.RandomState(1)
    support = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    feats = rng.randn(128, 4).astype(np.float32)
    mask = rng.rand(128) > 0.2
    new_xyz = rng.uniform(-0.5, 0.5, (6, 3)).astype(np.float32)
    rmax, nv = 0.6, (2, 2, 2)
    out = np.asarray(vp.pool_into_grids(
        jnp.asarray(support), jnp.asarray(feats), jnp.asarray(mask),
        jnp.asarray(new_xyz), rmax, nv, avg=True, chunk=4))
    assert out.shape == (6, 8, 7)
    for m in range(6):
        rel = support - new_xyz[m]
        inside = (np.abs(rel) < rmax).all(1) & mask
        cell = np.clip(((rel + rmax) / (2 * rmax / 2)).astype(int), 0, 1)
        gid = cell[:, 0] * 4 + cell[:, 1] * 2 + cell[:, 2]
        for g in range(8):
            sel = inside & (gid == g)
            if sel.sum() == 0:
                np.testing.assert_allclose(out[m, g], 0.0, atol=1e-6)
            else:
                np.testing.assert_allclose(out[m, g, :3],
                                           rel[sel].mean(0), atol=1e-4)
                np.testing.assert_allclose(out[m, g, 3:],
                                           feats[sel].mean(0), atol=1e-4)


def test_pool_into_grids_nsample_caps_scan_order():
    """nsample > 0 pools only each query's FIRST nsample in-range support
    points in support order (reference vector_pool_gpu.cu:341 break)."""
    rng = np.random.RandomState(3)
    support = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
    feats = rng.randn(128, 4).astype(np.float32)
    mask = np.ones(128, bool)
    new_xyz = rng.uniform(-0.5, 0.5, (5, 3)).astype(np.float32)
    rmax, nv, k = 0.6, (2, 2, 2), 7
    capped = np.asarray(vp.pool_into_grids(
        jnp.asarray(support), jnp.asarray(feats), jnp.asarray(mask),
        jnp.asarray(new_xyz), rmax, nv, avg=True, nsample=k, chunk=4))
    for m in range(5):
        rel = support - new_xyz[m]
        inside = (np.abs(rel) < rmax).all(1)
        # oracle: mask off everything after the k-th in-range point
        order_rank = np.cumsum(inside)
        keep = inside & (order_rank <= k)
        oracle = np.asarray(vp.pool_into_grids(
            jnp.asarray(support), jnp.asarray(feats), jnp.asarray(keep),
            jnp.asarray(new_xyz[m:m + 1]), rmax, nv, avg=True, chunk=4))
        np.testing.assert_allclose(capped[m], oracle[0], atol=1e-5)


def test_pool_into_grids_choice_picks_member():
    rng = np.random.RandomState(2)
    support = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    feats = rng.randn(64, 2).astype(np.float32)
    mask = np.ones(64, bool)
    new_xyz = np.zeros((1, 3), np.float32)
    rmax, nv = 0.8, (2, 2, 2)
    out = np.asarray(vp.pool_into_grids(
        jnp.asarray(support), jnp.asarray(feats), jnp.asarray(mask),
        jnp.asarray(new_xyz), rmax, nv, avg=False, chunk=2))
    rel = support
    inside = (np.abs(rel) < rmax).all(1)
    cell = np.clip(((rel + rmax) / rmax).astype(int), 0, 1)
    gid = cell[:, 0] * 4 + cell[:, 1] * 2 + cell[:, 2]
    for g in range(8):
        members = np.where(inside & (gid == g))[0]
        if len(members) == 0:
            np.testing.assert_allclose(out[0, g], 0.0, atol=1e-6)
        else:
            # the chosen representative must be an actual member
            dists = np.abs(feats[members] - out[0, g, 3:]).sum(1)
            assert dists.min() < 1e-5


def test_interpolate_into_grids_idw():
    """One query grid at origin with 3 obvious neighbors -> IDW weights."""
    support = np.array([[0.1, 0, 0], [0, 0.2, 0], [0, 0, 0.4],
                        [5, 5, 5]], np.float32)
    feats = np.array([[1.0], [2.0], [3.0], [100.0]], np.float32)
    mask = np.ones(4, bool)
    new_xyz = np.zeros((1, 3), np.float32)
    offsets = jnp.zeros((1, 3))
    out = np.asarray(vp.interpolate_into_grids(
        jnp.asarray(support), jnp.asarray(feats), jnp.asarray(mask),
        jnp.asarray(new_xyz), offsets, rmax=0.5, neighbor_type=0,
        distance_multiplier=2.0, chunk=2))
    d = np.array([0.1, 0.2, 0.4])
    w = (1 / d) / (1 / d).sum()
    want = (w * np.array([1.0, 2.0, 3.0])).sum()
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-4)
    # local offsets: center - neighbor xyz
    np.testing.assert_allclose(out[0, 0, 1:4], [-0.1, 0, 0], atol=1e-5)


def test_sample_points_with_roi_mask():
    points = np.array([[0, 0, 0], [10, 0, 0], [3.2, 0, 0]], np.float32)
    rois = np.array([[0, 0, 0, 4, 2, 1.5, 0.3]], np.float32)
    m = np.asarray(vp.sample_points_with_roi_mask(
        jnp.asarray(points), jnp.ones(3, bool), jnp.asarray(rois),
        jnp.ones(1, bool), sample_radius=1.6))
    # half diag = norm(4,2,1.5)/2 = 2.36; keep if d - 2.36 < 1.6 (d < 3.96)
    assert m.tolist() == [True, False, True]


def test_vector_pool_aggregation_msg_shapes():
    from glenet_tpu.config import Cfg
    cfg = Cfg({
        'NUM_GROUPS': 2, 'LOCAL_AGGREGATION_TYPE': 'local_interpolation',
        'NUM_REDUCED_CHANNELS': 2, 'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 8,
        'MSG_POST_MLPS': [16],
        'GROUP_CFG_0': {'NUM_LOCAL_VOXEL': [2, 2, 2],
                        'MAX_NEIGHBOR_DISTANCE': 0.4,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [8, 8]},
        'GROUP_CFG_1': {'NUM_LOCAL_VOXEL': [3, 3, 3],
                        'MAX_NEIGHBOR_DISTANCE': 0.8,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [8, 8]},
    })
    mod = vp.VectorPoolAggregationMSG(model_cfg=dict(cfg))
    rng = np.random.RandomState(3)
    xyz = jnp.asarray(rng.uniform(-2, 2, (2, 32, 3)), jnp.float32)
    mask = jnp.ones((2, 32), bool)
    feats = jnp.asarray(rng.randn(2, 32, 4), jnp.float32)
    new_xyz = jnp.asarray(rng.uniform(-1, 1, (2, 5, 3)), jnp.float32)
    vs = mod.init(jax.random.PRNGKey(0), xyz, mask, feats, new_xyz,
                  train=False)
    out = mod.apply(vs, xyz, mask, feats, new_xyz, train=False)
    assert out.shape == (2, 5, 16)
    assert np.isfinite(np.asarray(out)).all()
