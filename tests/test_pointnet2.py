"""PointNet++ primitives vs brute-force numpy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from glenet_tpu.ops import pointnet2 as pn2


def test_ball_query_first_in_order(rng):
    xyz = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    centers = xyz[:10] + 0.01
    idx, empty = pn2.ball_query(1.0, 8, jnp.asarray(xyz), jnp.asarray(centers))
    idx = np.asarray(idx)
    d = np.sqrt(((centers[:, None] - xyz[None]) ** 2).sum(-1))
    for m in range(10):
        inside = np.nonzero(d[m] < 1.0)[0]
        want = inside[:8]
        got = idx[m][:len(want)]
        np.testing.assert_array_equal(got, want)
        # padding repeats the first hit
        if len(want) < 8:
            assert (idx[m][len(want):] == want[0]).all()
    assert not np.asarray(empty).any()


def test_ball_query_empty(rng):
    xyz = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    centers = np.array([[100.0, 100, 100]], np.float32)
    idx, empty = pn2.ball_query(0.5, 4, jnp.asarray(xyz), jnp.asarray(centers))
    assert bool(empty[0])


def test_fps_spreads_points(rng):
    # two well-separated clusters: FPS with npoint=2 must take one from each
    a = rng.normal(0, 0.1, (50, 3)).astype(np.float32)
    b = (rng.normal(0, 0.1, (50, 3)) + 10).astype(np.float32)
    xyz = np.concatenate([a, b])
    idx = np.asarray(pn2.farthest_point_sample(jnp.asarray(xyz), 2))
    assert (idx[0] < 50) != (idx[1] < 50)


def test_fps_respects_mask(rng):
    xyz = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[10:20] = True
    idx = np.asarray(pn2.farthest_point_sample(jnp.asarray(xyz), 5,
                                               jnp.asarray(mask)))
    assert ((idx >= 10) & (idx < 20)).all()


def test_three_interpolate_exact_at_known(rng):
    known = rng.uniform(-5, 5, (30, 3)).astype(np.float32)
    feats = rng.randn(30, 8).astype(np.float32)
    # query exactly at known points -> exact features
    dist, idx = pn2.three_nn(jnp.asarray(known), jnp.asarray(known))
    out = np.asarray(pn2.three_interpolate(jnp.asarray(feats), idx, dist))
    np.testing.assert_allclose(out, feats, rtol=1e-4, atol=1e-4)


def test_three_nn_matches_numpy(rng):
    unknown = rng.uniform(-5, 5, (20, 3)).astype(np.float32)
    known = rng.uniform(-5, 5, (40, 3)).astype(np.float32)
    dist, idx = pn2.three_nn(jnp.asarray(unknown), jnp.asarray(known))
    d = np.sqrt(((unknown[:, None] - known[None]) ** 2).sum(-1))
    want_idx = np.argsort(d, axis=1)[:, :3]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), 1),
                                  np.sort(want_idx, 1))


@pytest.mark.slow
def test_pointnet2_msg_backbone_shapes(rng):
    """Tiny PointNet2MSG forward: per-point features come back at full
    resolution with finite values."""
    import jax
    from glenet_tpu.models.pointnet2_backbone import PointNet2MSG
    n = 512
    pts = rng.uniform(-5, 5, (n, 4)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[-50:] = False
    bb = PointNet2MSG(
        sa_npoints=(128, 32, 16, 8),
        sa_radii=((0.5, 1.0),) * 4,
        sa_nsamples=((8, 16),) * 4,
        sa_mlps=(((8, 8), (8, 8)), ((8, 16), (8, 16)),
                 ((16, 16), (16, 16)), ((16, 32), (16, 32))),
        fp_mlps=((16, 16), (16, 16), (32, 32), (32, 32)))
    bpts = jnp.asarray(pts)[None]
    bmask = jnp.asarray(mask)[None]
    variables = bb.init(jax.random.PRNGKey(0), bpts, bmask, train=False)
    out = bb.apply(variables, bpts, bmask, train=False)
    assert out.shape == (1, n, 16)
    assert np.isfinite(np.asarray(out)).all()
