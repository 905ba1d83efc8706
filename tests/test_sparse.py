"""Sparse conv primitives vs dense-conv oracle.

Submanifold conv == dense conv (with zeros at inactive sites) evaluated at
the active sites; strided sparse conv == the full dense strided conv (every
nonzero dense output site is an active site by the spconv rule)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glenet_tpu.ops import sparse

GRID = (10, 8, 6)  # (nx, ny, nz)


@pytest.fixture
def f32_gather(monkeypatch):
    """Pin gather_gemm to full f32 for tight-tolerance oracle comparisons
    (production defaults to bf16 gathers; see test_gather_gemm_bf16)."""
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)


def make_sparse(rng, n_active, cap, cin):
    nx, ny, nz = GRID
    n_cells = nx * ny * nz
    cells = rng.choice(n_cells, size=n_active, replace=False)
    cells.sort()
    ids = np.full((cap,), n_cells, np.int64)
    ids[:n_active] = cells
    mask = np.zeros((cap,), bool)
    mask[:n_active] = True
    feats = np.where(mask[:, None], rng.randn(cap, cin), 0).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(ids.astype(np.int32)), jnp.asarray(mask)


def densify(feats, ids, mask):
    return np.asarray(sparse.to_dense(feats, ids, mask, GRID))


def dense_conv(dense_in, w_dense, stride=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1))):
    """dense_in (nz, ny, nx, C); w_dense (kz, ky, kx, Cin, Cout)."""
    out = jax.lax.conv_general_dilated(
        dense_in[None], w_dense, window_strides=stride, padding=padding,
        dimension_numbers=('NHWDC'[0] + 'ZYXC'[0:3] + 'C', 'ZYXIO', 'N' + 'ZYX' + 'C'))
    return np.asarray(out[0])


def test_subm_conv_matches_dense(rng, f32_gather):
    cin, cout = 4, 8
    feats, ids, mask = make_sparse(rng, 40, 64, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    nbr = sparse.subm_neighbor_table(ids, mask, GRID, 3)
    out = np.asarray(sparse.gather_gemm(feats, nbr, jnp.asarray(w)))

    dense_in = densify(feats, ids, mask)
    w_dense = w.reshape(3, 3, 3, cin, cout)
    dense_out = dense_conv(jnp.asarray(dense_in), jnp.asarray(w_dense))

    # compare at active sites
    ids_np, mask_np = np.asarray(ids), np.asarray(mask)
    nx, ny, nz = GRID
    for slot in np.nonzero(mask_np)[0]:
        z, r = divmod(int(ids_np[slot]), ny * nx)
        y, x = divmod(r, nx)
        np.testing.assert_allclose(out[slot], dense_out[z, y, x],
                                   rtol=1e-4, atol=1e-4)


def test_strided_conv_matches_dense(rng, f32_gather):
    cin, cout = 4, 6
    feats, ids, mask = make_sparse(rng, 30, 64, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, GRID, 3, 2, 1, out_cap=64)
    table = sparse.strided_gather_table(ids, mask, out_ids, out_mask, GRID,
                                        3, 2, 1)
    out = sparse.gather_gemm(feats, table, jnp.asarray(w))
    ogrid = sparse.out_grid_size(GRID, 3, 2, 1)
    sparse_dense_out = np.asarray(sparse.to_dense(
        jnp.where(out_mask[:, None], out, 0), out_ids, out_mask, ogrid))

    dense_in = densify(feats, ids, mask)
    w_dense = w.reshape(3, 3, 3, cin, cout)
    dense_out = dense_conv(jnp.asarray(dense_in), jnp.asarray(w_dense),
                           stride=(2, 2, 2))
    np.testing.assert_allclose(sparse_dense_out, dense_out, rtol=1e-4, atol=1e-4)


def test_strided_asymmetric_padding(rng, f32_gather):
    """conv4-style: kernel 3, stride 2, padding (0, 1, 1)."""
    cin, cout = 3, 5
    feats, ids, mask = make_sparse(rng, 25, 48, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, GRID, 3, 2, (0, 1, 1), out_cap=64)
    table = sparse.strided_gather_table(ids, mask, out_ids, out_mask, GRID,
                                        3, 2, (0, 1, 1))
    out = sparse.gather_gemm(feats, table, jnp.asarray(w))
    ogrid = sparse.out_grid_size(GRID, 3, 2, (0, 1, 1))
    got = np.asarray(sparse.to_dense(
        jnp.where(out_mask[:, None], out, 0), out_ids, out_mask, ogrid))

    dense_in = densify(feats, ids, mask)
    w_dense = w.reshape(3, 3, 3, cin, cout)
    want = dense_conv(jnp.asarray(dense_in), jnp.asarray(w_dense),
                      stride=(2, 2, 2),
                      padding=((0, 0), (1, 1), (1, 1)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zcompress_conv(rng, f32_gather):
    """conv_out-style: kernel (3,1,1), stride (2,1,1), padding 0."""
    cin, cout = 4, 8
    feats, ids, mask = make_sparse(rng, 30, 64, cin)
    w = rng.randn(3, cin, cout).astype(np.float32) * 0.1

    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, GRID, (3, 1, 1), (2, 1, 1), (0, 0, 0), out_cap=64)
    table = sparse.strided_gather_table(
        ids, mask, out_ids, out_mask, GRID, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    out = sparse.gather_gemm(feats, table, jnp.asarray(w))
    ogrid = sparse.out_grid_size(GRID, (3, 1, 1), (2, 1, 1), (0, 0, 0))
    got = np.asarray(sparse.to_dense(
        jnp.where(out_mask[:, None], out, 0), out_ids, out_mask, ogrid))

    dense_in = densify(feats, ids, mask)
    w_dense = w.reshape(3, 1, 1, cin, cout)
    want = dense_conv(jnp.asarray(dense_in), jnp.asarray(w_dense),
                      stride=(2, 1, 1), padding=((0, 0), (0, 0), (0, 0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_out_cap_overflow_drops_but_stays_valid(rng):
    """With a too-small out_cap the op keeps a subset, still correct values."""
    cin, cout = 2, 2
    feats, ids, mask = make_sparse(rng, 40, 64, cin)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, GRID, 3, 2, 1, out_cap=8)
    assert int(out_mask.sum()) <= 8
    table = sparse.strided_gather_table(ids, mask, out_ids, out_mask, GRID, 3, 2, 1)
    out = sparse.gather_gemm(feats, table, jnp.asarray(w))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_backbone_shapes(rng):
    """VoxelBackBone8x on a KITTI-like (but tiny) grid compiles and produces
    the expected BEV shape."""
    from glenet_tpu.models.spconv_backbone import VoxelBackBone8x
    grid = (32, 32, 8)  # nx, ny, nz -> sparse z 9
    cap = 256
    bb = VoxelBackBone8x(grid_size=grid, max_voxels=cap)

    nx, ny, nz = grid
    nzs = nz + 1
    n_cells = nx * ny * nzs
    rngs = np.random.RandomState(1)
    cells = np.sort(rngs.choice(n_cells, 200, replace=False))
    ids = np.full((cap,), n_cells, np.int64)
    ids[:200] = cells
    z, r = np.divmod(ids, ny * nx)
    y, x = np.divmod(r, nx)
    coords = np.stack([z, y, x], 1).astype(np.int32)
    mask = np.zeros((cap,), bool)
    mask[:200] = True
    feats = rngs.randn(cap, 4).astype(np.float32)

    batch = lambda a: jnp.asarray(a)[None]
    variables = bb.init(jax.random.PRNGKey(0), batch(feats), batch(coords),
                        batch(mask), train=False)
    out = bb.apply(variables, batch(feats), batch(coords), batch(mask),
                   train=False)
    # grid: 32 -> 16 -> 8 -> 4 (xy); z: 9 -> 5 -> 3 -> 2 -> conv_out -> ?
    assert out['bev_features'].shape[1:3] == (4, 4)
    assert out['num_bev_features'] == out['bev_features'].shape[-1]
    assert np.isfinite(np.asarray(out['bev_features'])).all()
    assert set(out['multi_scale']) == {'x_conv1', 'x_conv2', 'x_conv3', 'x_conv4'}


def test_res_backbone_shapes(rng):
    """VoxelResBackBone8x (residual basic blocks) forward."""
    from glenet_tpu.models.spconv_backbone import VoxelBackBone8x
    grid = (32, 32, 24)
    cap = 256
    bb = VoxelBackBone8x(grid_size=grid, max_voxels=cap, residual=True,
                         channels=(16, 32, 64, 128))
    nx, ny, nzs = grid[0], grid[1], grid[2] + 1
    n_cells = nx * ny * nzs
    rngs = np.random.RandomState(1)
    cells = np.sort(rngs.choice(n_cells, 200, replace=False))
    ids = np.full((cap,), n_cells, np.int64)
    ids[:200] = cells
    z, r = np.divmod(ids, ny * nx)
    y, x = np.divmod(r, nx)
    coords = np.stack([z, y, x], 1).astype(np.int32)
    mask = np.zeros((cap,), bool)
    mask[:200] = True
    feats = rngs.randn(cap, 4).astype(np.float32)
    batch = lambda a: jnp.asarray(a)[None]
    variables = bb.init(jax.random.PRNGKey(0), batch(feats), batch(coords),
                        batch(mask), train=False)
    out = bb.apply(variables, batch(feats), batch(coords), batch(mask),
                   train=False)
    assert out['multi_scale']['x_conv4']['features'].shape[-1] == 128
    assert np.isfinite(np.asarray(out['bev_features'])).all()


def test_out_cap_overflow_is_spatially_uniform():
    """Under overflow, dropped sites must be spread uniformly across the
    scene (hash priority), NOT truncated to the lowest (z, y) slab — that
    crops the field of view for every downstream consumer."""
    nx, ny, nz = 64, 64, 4
    grid = (nx, ny, nz)
    rngs = np.random.RandomState(0)
    # one occupied voxel per (y, x) column on a plane -> 4096 sites
    ys, xs = np.meshgrid(np.arange(ny), np.arange(nx), indexing='ij')
    cells = (1 * (ny * nx) + ys.ravel() * nx + xs.ravel()).astype(np.int64)
    cells = np.sort(rngs.permutation(cells))
    ids = jnp.asarray(cells)
    mask = jnp.ones_like(ids, dtype=bool)
    cap = 512
    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, grid, 3, 2, 1, out_cap=cap)
    onx, ony, _ = sparse.out_grid_size(grid, 3, 2, 1)
    kept = np.asarray(out_ids[out_mask])
    oy = (kept % (ony * onx)) // onx
    # kept sites must span (almost) the full y range, both halves populated
    assert oy.min() < ony // 8 and oy.max() > ony - ony // 8
    lo, hi = (oy < ony // 2).sum(), (oy >= ony // 2).sum()
    assert min(lo, hi) / max(lo, hi) > 0.6, (lo, hi)


def test_level_caps_cover_strided_dilation():
    """level_caps must cover the spconv dilation of a realistic cloud: a
    stride-2 conv of V scattered sites activates ~3-4x V output sites."""
    nx, ny, nz = 256, 256, 16
    grid = (nx, ny, nz)
    rngs = np.random.RandomState(1)
    v = 4096
    cells = np.sort(rngs.choice(nx * ny * nz, v, replace=False).astype(np.int64))
    ids, mask = jnp.asarray(cells), jnp.ones(v, bool)
    caps = sparse.level_caps(v)
    out_ids, out_mask = sparse.strided_output_sites(
        ids, mask, grid, 3, 2, 1, out_cap=8 * v)
    n_active = int(out_mask.sum())
    assert n_active > v, 'dilation must grow the active set'
    assert caps[1] >= n_active, (caps[1], n_active)


def test_gather_gemm_low_mem_path_matches(monkeypatch):
    """bf16 K-chunked path (large-V fallback) tracks the f32 einsum."""
    rng = np.random.RandomState(0)
    v, k, cin, cout = 64, 27, 16, 24
    feats = jnp.asarray(rng.randn(v, cin), jnp.float32)
    idx = jnp.asarray(rng.randint(0, v + 1, (k, v)), jnp.int32)
    w = jnp.asarray(rng.randn(k, cin, cout) * 0.1, jnp.float32)

    want = sparse.gather_gemm(feats, idx, w)
    monkeypatch.setattr(sparse, 'GATHER_BYTES_BUDGET', 4096)
    got = sparse.gather_gemm(feats, idx, w)
    # bf16 gathers: ~3 decimal digits of feature mantissa
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # grads flow through the scan path
    g = jax.grad(lambda f: sparse.gather_gemm(f, idx, w).sum())(feats)
    assert np.isfinite(np.asarray(g)).all()


def test_gather_gemm_bf16_close_to_f32(rng, monkeypatch):
    """Production gathers run in bf16 (f32 accumulation); verify they stay
    within bf16 rounding of the f32 path."""
    cin, cout = 8, 16
    feats, ids, mask = make_sparse(rng, 40, 64, cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    nbr = sparse.subm_neighbor_table(ids, mask, GRID, 3)
    got = np.asarray(sparse.gather_gemm(feats, nbr, w))
    assert got.dtype == np.float32
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)
    want = np.asarray(sparse.gather_gemm(feats, nbr, w))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_xblock_matches_row_table(rng, f32_gather):
    """The x-block gather path (contiguous 3-row block gathers) must equal
    the row-table gather_gemm for both subm and strided 3^3 convs."""
    cin, cout = 5, 7
    feats, ids, mask = make_sparse(rng, 40, 64, cin)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    nbr = sparse.subm_neighbor_table(ids, mask, GRID, 3)
    want = np.asarray(sparse.gather_gemm(feats, nbr, w))
    q, tbl = sparse.subm_xblock_table(ids, mask, GRID)
    got = np.asarray(sparse.gather_gemm_xblocks(feats, q, tbl, w))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    for stride, padding in [(2, 1), (2, (0, 1, 1)), (1, 1)]:
        out_ids, out_mask = sparse.strided_output_sites(
            ids, mask, GRID, 3, stride, padding, out_cap=64)
        table = sparse.strided_gather_table(
            ids, mask, out_ids, out_mask, GRID, 3, stride, padding)
        want = np.asarray(sparse.gather_gemm(feats, table, w))
        q, tbl = sparse.strided_xblock_table(
            ids, mask, out_ids, out_mask, GRID, stride, padding)
        got = np.asarray(sparse.gather_gemm_xblocks(feats, q, tbl, w))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                   err_msg=f'stride={stride} pad={padding}')


def test_subm_custom_vjp_grad_parity(rng, f32_gather):
    """subm_gather_gemm_xblocks's gather-only backward (flipped-tap
    transpose conv over the same table) must match default AD of the plain
    forward exactly — for d_features AND d_weights, under vmap."""
    cin, cout = 4, 8
    b_feats, b_q, b_tbl = [], [], []
    for s in range(2):
        feats, ids, mask = make_sparse(np.random.RandomState(100 + s),
                                       40, 64, cin)
        q, tbl = sparse.subm_xblock_table(ids, mask, GRID)
        b_feats.append(feats)
        b_q.append(q)
        b_tbl.append(tbl)
    feats = jnp.stack(b_feats)
    q = jnp.stack(b_q)
    tbl = jnp.stack(b_tbl)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    cot = jnp.asarray(rng.randn(2, 64, cout).astype(np.float32))

    def loss(fn, feats, w):
        out = jax.vmap(fn, in_axes=(0, 0, 0, None))(feats, q, tbl, w)
        return jnp.sum(out * cot)

    df_ref, dw_ref = jax.grad(
        lambda f, w: loss(sparse.gather_gemm_xblocks, f, w),
        argnums=(0, 1))(feats, w)
    df, dw = jax.grad(
        lambda f, w: loss(sparse.subm_gather_gemm_xblocks, f, w),
        argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-5)

    out_ref = jax.vmap(sparse.gather_gemm_xblocks,
                       in_axes=(0, 0, 0, None))(feats, q, tbl, w)
    out = jax.vmap(sparse.subm_gather_gemm_xblocks,
                   in_axes=(0, 0, 0, None))(feats, q, tbl, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_batched_contractions_match_vmapped(rng, f32_gather):
    """gather_gemm_b / gather_gemm_xblocks_b / subm_gather_gemm_xblocks_b
    (one flat batch-merged take) == vmap of the per-sample forms."""
    cin, cout = 4, 8
    b_feats, b_ids, b_mask = [], [], []
    for s in range(2):
        feats, ids, mask = make_sparse(np.random.RandomState(200 + s),
                                       37 + s, 64, cin)
        b_feats.append(feats)
        b_ids.append(ids)
        b_mask.append(mask)
    feats = jnp.stack(b_feats)
    ids = jnp.stack(b_ids)
    mask = jnp.stack(b_mask)
    w27 = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    q, tbl = jax.vmap(lambda i, m: sparse.subm_xblock_table(i, m, GRID))(
        ids, mask)
    ref = jax.vmap(sparse.gather_gemm_xblocks,
                   in_axes=(0, 0, 0, None))(feats, q, tbl, w27)
    np.testing.assert_allclose(
        np.asarray(sparse.gather_gemm_xblocks_b(feats, q, tbl, w27)),
        np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sparse.subm_gather_gemm_xblocks_b(feats, q, tbl, w27)),
        np.asarray(ref), rtol=1e-5, atol=1e-6)

    nbr = jax.vmap(lambda i, m: sparse.subm_neighbor_table(
        i, m, GRID, 3))(ids, mask)
    ref2 = jax.vmap(sparse.gather_gemm, in_axes=(0, 0, None))(
        feats, nbr, w27)
    np.testing.assert_allclose(
        np.asarray(sparse.gather_gemm_b(feats, nbr, w27)),
        np.asarray(ref2), rtol=1e-5, atol=1e-6)

    # batched custom-VJP grads == default AD of the vmapped plain form
    cot = jnp.asarray(rng.randn(2, 64, cout).astype(np.float32))
    df_ref, dw_ref = jax.grad(
        lambda f, w: jnp.sum(jax.vmap(
            sparse.gather_gemm_xblocks, in_axes=(0, 0, 0, None))(
            f, q, tbl, w) * cot), argnums=(0, 1))(feats, w27)
    df, dw = jax.grad(
        lambda f, w: jnp.sum(
            sparse.subm_gather_gemm_xblocks_b(f, q, tbl, w) * cot),
        argnums=(0, 1))(feats, w27)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-4, atol=1e-5)


def test_gather_gemm_b_low_mem_path_matches(monkeypatch):
    rng = np.random.RandomState(3)
    cin, cout = 4, 8
    feats, ids, mask = make_sparse(rng, 40, 64, cin)
    feats = jnp.stack([feats, feats * 0.5])
    ids = jnp.stack([ids, ids])
    mask = jnp.stack([mask, mask])
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    nbr = jax.vmap(lambda i, m: sparse.subm_neighbor_table(
        i, m, GRID, 3))(ids, mask)
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)
    ref = np.asarray(sparse.gather_gemm_b(feats, nbr, w))
    monkeypatch.setattr(sparse, 'GATHER_BYTES_BUDGET', 4096)
    low = np.asarray(sparse.gather_gemm_b(feats, nbr, w))
    np.testing.assert_allclose(low, ref, rtol=1e-4, atol=1e-5)


def test_gather_gemm_b_low_mem_inverse_shape(monkeypatch):
    """Low-memory K-chunked path with Vout != Vin (inverse-conv shape):
    regression for the (B, K, Vout) pad/accumulator using the features'
    V (crashed PartA2_free's UNet decoder at the 16k eval budget)."""
    rng = np.random.RandomState(5)
    cin, cout, v_in, v_out = 4, 6, 32, 48
    feats = jnp.asarray(rng.randn(2, v_in, cin).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, v_in + 1,
                                  size=(2, 27, v_out)).astype(np.int32))
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)
    ref = np.asarray(sparse.gather_gemm_b(feats, nbr, w))
    assert ref.shape == (2, v_out, cout)
    monkeypatch.setattr(sparse, 'GATHER_BYTES_BUDGET', 4096)
    low = np.asarray(sparse.gather_gemm_b(feats, nbr, w))
    np.testing.assert_allclose(low, ref, rtol=1e-4, atol=1e-5)


def test_to_dense_expand_matches_scatter_and_grads():
    """to_dense_expand == to_dense (values + occupancy), and its custom
    VJP (gather) == default AD of the scatter form."""
    rng = np.random.RandomState(11)
    feats1, ids1, mask1 = make_sparse(rng, 60, 96, 5)
    feats2, ids2, mask2 = make_sparse(rng, 33, 96, 5)
    feats = jnp.stack([feats1, feats2])
    ids = jnp.stack([ids1, ids2])
    mask = jnp.stack([mask1, mask2])

    dense, occ = jax.jit(
        lambda f: sparse.to_dense_expand(f, ids, mask, GRID))(feats)
    ref = np.stack([densify(feats1, ids1, mask1),
                    densify(feats2, ids2, mask2)])
    np.testing.assert_allclose(np.asarray(dense), ref, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(occ), (np.abs(ref).sum(-1) > 0)
        | np.asarray(jnp.stack([
            sparse.to_dense(jnp.ones_like(mask1, jnp.float32)[:, None],
                            ids1, mask1, GRID)[..., 0] > 0,
            sparse.to_dense(jnp.ones_like(mask2, jnp.float32)[:, None],
                            ids2, mask2, GRID)[..., 0] > 0])))

    def loss_new(f):
        d, _ = sparse.to_dense_expand(f, ids, mask, GRID)
        return jnp.sum(jnp.sin(d) * d)

    def loss_ref(f):
        d = jax.vmap(lambda ff, ii, mm: sparse.to_dense(
            ff, ii, mm, GRID))(f, ids, mask)
        return jnp.sum(jnp.sin(d) * d)

    g_new = jax.jit(jax.grad(loss_new))(feats)
    g_ref = jax.jit(jax.grad(loss_ref))(feats)
    np.testing.assert_allclose(np.asarray(g_new),
                               np.asarray(jnp.where(mask[..., None],
                                                    g_ref, 0.0)),
                               atol=1e-5)


def test_to_dense_expand_bf16_dtype():
    rng = np.random.RandomState(3)
    feats, ids, mask = make_sparse(rng, 20, 32, 4)
    dense, occ = sparse.to_dense_expand(
        feats[None], ids[None], mask[None], GRID, jnp.bfloat16)
    assert dense.dtype == jnp.bfloat16
    ref = densify(feats, ids, mask)
    np.testing.assert_allclose(np.asarray(dense[0], np.float32), ref,
                               atol=0.02, rtol=0.01)
