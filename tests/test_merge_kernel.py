"""Oracle test: the Pallas merge-resolve kernel (interpret mode on CPU)
must match merged_searchsorted_deltas exactly on sorted query streams,
including sentinel-padded tables, duplicate sentinels, and queries
starting below the table."""
import jax
import jax.numpy as jnp
import numpy as np

from glenet_tpu.ops import merge_kernel, sparse


def _case(rng, v, n_active, g, vq, n_cells):
    cells = np.sort(rng.choice(n_cells, size=n_active, replace=False))
    ids = np.full((v,), n_cells, np.int64)
    ids[:n_active] = cells
    shifts = rng.randint(-n_cells // 4, n_cells // 4, size=(g,))
    base = np.take(ids, np.clip(np.arange(vq), 0, v - 1))
    queries = np.stack([np.clip(base + s, -1, None) for s in shifts])
    return ids.astype(np.int32), queries.astype(np.int32)


def test_kernel_matches_merged_searchsorted():
    rng = np.random.RandomState(0)
    n_cells = 480
    b_ids, b_q = [], []
    for s in range(2):
        ids, queries = _case(np.random.RandomState(s), 64, 40 + s, 3, 64,
                             n_cells)
        b_ids.append(ids)
        b_q.append(queries)
    ids = jnp.asarray(np.stack(b_ids))
    queries = jnp.asarray(np.stack(b_q))

    pos_k, d0_k, d1_k, d2_k = merge_kernel.resolve_sorted_queries(
        ids, queries, interpret=True)

    for bi in range(2):
        pos_r, d0_r, d1_r, d2_r = sparse.merged_searchsorted_deltas(
            ids[bi], queries[bi])
        np.testing.assert_array_equal(np.asarray(pos_k[bi]),
                                      np.asarray(pos_r))
        np.testing.assert_array_equal(np.asarray(d0_k[bi]),
                                      np.asarray(d0_r))
        np.testing.assert_array_equal(np.asarray(d1_k[bi]),
                                      np.asarray(d1_r))
        np.testing.assert_array_equal(np.asarray(d2_k[bi]),
                                      np.asarray(d2_r))


def test_kernel_all_sentinel_table():
    """Table of pure sentinels (empty active set) and queries above it."""
    n_cells = 1000
    ids = jnp.full((1, 32), n_cells, jnp.int32)
    queries = jnp.asarray(
        np.sort(np.random.RandomState(1).randint(
            0, n_cells + 1, size=(1, 1, 40))).astype(np.int32))
    pos, d0, d1, d2 = merge_kernel.resolve_sorted_queries(
        ids, queries, interpret=True)
    ref = sparse.merged_searchsorted_deltas(ids[0], queries[0])
    np.testing.assert_array_equal(np.asarray(pos[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(d0[0]), np.asarray(ref[1]))


def test_kernel_table_builds_match_sort_path(monkeypatch):
    """subm/strided xblock tables built via the merge kernel must be
    contraction-equivalent to the sort-path tables (q and hit bits may
    differ only at gated-off invalid taps, so equality is asserted on the
    gather_gemm_xblocks_b OUTPUT)."""
    from glenet_tpu.ops import merge_kernel as mk
    rng = np.random.RandomState(7)
    grid = (10, 8, 6)
    n_cells = 480
    cin, cout = 4, 8

    def make(seed, n_active, cap):
        r = np.random.RandomState(seed)
        cells = np.sort(r.choice(n_cells, size=n_active, replace=False))
        ids = np.full((cap,), n_cells, np.int64)
        ids[:n_active] = cells
        mask = np.zeros((cap,), bool)
        mask[:n_active] = True
        feats = np.where(mask[:, None], r.randn(cap, cin),
                         0).astype(np.float32)
        return ids.astype(np.int32), mask, feats

    ids, mask, feats = zip(*[make(10 + s, 40 + s, 64) for s in range(2)])
    ids = jnp.asarray(np.stack(ids))
    mask = jnp.asarray(np.stack(mask))
    feats = jnp.asarray(np.stack(feats))
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)

    q_ref, tbl_ref = sparse.subm_xblock_table_b(ids, mask, grid)
    out_ref = sparse.gather_gemm_xblocks_b(feats, q_ref, tbl_ref, w)
    monkeypatch.setattr(mk, 'ENABLED', True)
    monkeypatch.setattr(mk, 'INTERPRET', True)
    q_k, tbl_k = sparse.subm_xblock_table_b(ids, mask, grid)
    out_k = sparse.gather_gemm_xblocks_b(feats, q_k, tbl_k, w)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)

    # strided: output sites first (unchanged path), then both tables
    monkeypatch.setattr(mk, 'ENABLED', False)
    oi, om = jax.vmap(lambda i, m: sparse.strided_output_sites(
        i, m, grid, 3, 2, 1, 48))(ids, mask)
    qs_ref, ts_ref = sparse.strided_xblock_table_b(
        ids, mask, oi, om, grid, 2, 1)
    outs_ref = sparse.gather_gemm_xblocks_b(feats, qs_ref, ts_ref, w)
    monkeypatch.setattr(mk, 'ENABLED', True)
    qs_k, ts_k = sparse.strided_xblock_table_b(
        ids, mask, oi, om, grid, 2, 1)
    outs_k = sparse.gather_gemm_xblocks_b(feats, qs_k, ts_k, w)
    np.testing.assert_allclose(np.asarray(outs_k), np.asarray(outs_ref),
                               rtol=1e-5, atol=1e-6)
