"""Microbenchmark: sparse-conv gather strategies on the real TPU chip.

The subm sparse conv is HBM-gather-bound (PERF_NOTES.md): XLA row gathers
of 64-256 B rows run at ~0.5 GB/s.  This script measures, at KITTI L1/L2
scale, the candidate replacements:

  table:      searchsorted (binary search) vs merge-sort neighbor table
  gather:     naive row gather  (27, V) rows
              bf16 row gather
              block-3 slice gather (9 gathers of (3, C) slices)
              windowed one-hot matmul (monotone-position trick)

Run:  python tools/bench_sparse_gather.py
All timings chain ITER iterations inside one jit and do a single device
round trip (the axon tunnel adds ~30 ms per dispatch).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from glenet_tpu.ops import sparse

GRID = (1408, 1600, 41)       # KITTI L1 sparse grid (nx, ny, nz)
V = 16384
C = 16
ITER = 8


def make_ids(rng, v=V, grid=GRID):
    """Clustered active-voxel ids: ground-plane band + object clusters."""
    nx, ny, nz = grid
    n_ground = int(v * 0.6)
    x = rng.randint(0, nx, n_ground)
    y = rng.randint(0, ny, n_ground)
    z = rng.randint(0, 6, n_ground)
    pts = [(z, y, x)]
    n_left = v - n_ground
    n_clusters = 40
    per = n_left // n_clusters
    for _ in range(n_clusters):
        cx, cy = rng.randint(100, nx - 100), rng.randint(100, ny - 100)
        x = np.clip(cx + rng.randint(-40, 40, per), 0, nx - 1)
        y = np.clip(cy + rng.randint(-16, 16, per), 0, ny - 1)
        z = rng.randint(0, 30, per)
        pts.append((z, y, x))
    z = np.concatenate([p[0] for p in pts])
    y = np.concatenate([p[1] for p in pts])
    x = np.concatenate([p[2] for p in pts])
    ids = np.unique(z.astype(np.int64) * ny * nx + y * nx + x)
    ids = ids[:v]
    out = np.full(v, nx * ny * nz, np.int64)
    out[:len(ids)] = ids
    mask = out < nx * ny * nz
    return jnp.asarray(out.astype(np.int32)), jnp.asarray(mask)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITER
    print(f'{name:42s} {dt * 1e3:9.3f} ms/call')
    return dt


def chain(f, is_int=False):
    """Repeat f ITER times inside one jit with a value-preserving data
    dependency between iterations (defeats CSE of identical calls)."""
    @jax.jit
    def run(x, *args):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITER):
            if is_int:
                xi = x + (acc == jnp.inf).astype(x.dtype)   # always +0
            else:
                xi = x + acc.astype(x.dtype) * 0            # not folded (NaN)
            y = f(xi, *args)
            acc = acc + y.sum().astype(jnp.float32) * 1e-9
        return acc
    return run


def main():
    rng = np.random.RandomState(0)
    ids, mask = make_ids(rng)
    feats = jnp.asarray(rng.randn(V, C).astype(np.float32))
    w = jnp.asarray(rng.randn(27, C, C).astype(np.float32) * 0.1)
    print(f'devices: {jax.devices()}  V={V} C={C} grid={GRID} '
          f'active={int(mask.sum())}')

    # ---- neighbor position lookup: binary search vs combined sort --------
    queries = jnp.stack([ids + d for d in
                         (-GRID[0] * GRID[1], -GRID[0], 0, GRID[0],
                          GRID[0] * GRID[1], -GRID[0] - 1, GRID[0] + 1,
                          -GRID[0] * GRID[1] + 1, GRID[0] * GRID[1] - 1)])
    f_ss = chain(lambda qq: jnp.searchsorted(ids, qq).astype(jnp.float32),
                 is_int=True)
    timeit('lookup: jnp.searchsorted 9xV', f_ss, queries)
    f_mg = chain(lambda qq: sparse.merged_searchsorted(ids, qq)
                 .astype(jnp.float32), is_int=True)
    timeit('lookup: merged sort 9xV', f_mg, queries)
    np.testing.assert_array_equal(
        np.asarray(sparse.merged_searchsorted(ids, queries)),
        np.asarray(jnp.searchsorted(ids, queries)))
    print('  merged_searchsorted matches jnp.searchsorted')

    f_tbl = chain(lambda i: sparse.subm_neighbor_table(i, mask, GRID, 3)
                  .astype(jnp.float32), is_int=True)
    timeit('table: subm_neighbor_table (merge)', f_tbl, ids)

    nbr = sparse.subm_neighbor_table(ids, mask, GRID, 3)
    nbr = jax.block_until_ready(nbr)

    # ---- gathers ----------------------------------------------------------
    f_cur = chain(lambda f: sparse.gather_gemm(f, nbr, w))
    timeit('gather_gemm: naive row gather f32', f_cur, feats)

    fb = feats.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    f_bf = chain(lambda f: sparse.gather_gemm(f, nbr, wb).astype(jnp.float32))
    timeit('gather_gemm: naive row gather bf16', f_bf, fb)

    # gather only (no gemm)
    def gath(f):
        padded = jnp.concatenate([f, jnp.zeros((1, C), f.dtype)], 0)
        return padded[nbr]
    timeit('gather only: rows f32', chain(gath), feats)

    # one-hot windowed
    for (B, W) in [(256, 1024), (512, 2048), (1024, 4096)]:
        def onehot_gemm(f, B=B, W=W):
            return windowed_gather_gemm(f, ids, nbr, w, B, W)
        timeit(f'windowed one-hot gemm B={B} W={W}', chain(onehot_gemm), feats)
        def onehot_gemm_b(f, B=B, W=W):
            return windowed_gather_gemm(f, ids, nbr, wb, B, W)
        timeit(f'windowed one-hot gemm bf16 B={B} W={W}',
               chain(onehot_gemm_b), fb)

    # overflow diagnostics
    for (B, W) in [(256, 1024), (512, 2048)]:
        ov = window_overflow_count(ids, nbr, B, W)
        print(f'  overflow count B={B} W={W}: {int(ov)}')


def window_starts(nbr, B):
    """(K, nblk) window start = first valid position in each block,
    clamped monotone."""
    k, v = nbr.shape
    nblk = v // B
    pos = nbr.reshape(k, nblk, B)
    # invalid entries hold V (padding row); min over block gives start
    return pos.min(axis=2)


def window_overflow_count(ids, nbr, B, W):
    k, v = nbr.shape
    nblk = v // B
    pos = nbr.reshape(k, nblk, B)
    start = pos.min(axis=2, keepdims=True)
    valid = pos < v
    local = pos - start
    return (valid & (local >= W)).sum()


def windowed_gather_gemm(feats, ids, nbr, w, B, W):
    """out[v] = sum_k feats[nbr[k, v]] @ w[k] via contiguous windows +
    one-hot MXU alignment.  Positions within each (tap, block) window are
    monotone; entries beyond W are dropped (measured overflow==0 at 4x
    slack on clustered scenes)."""
    v, c = feats.shape
    k = nbr.shape[0]
    co = w.shape[-1]
    nblk = v // B
    pos = nbr.reshape(k, nblk, B)
    start = jnp.clip(pos.min(axis=2), 0, v - 1)            # (K, nblk)
    padded = jnp.concatenate([feats, jnp.zeros((1, c), feats.dtype)], 0)

    def get_window(s):
        return jax.lax.dynamic_slice(padded, (s, 0), (W, c))
    windows = jax.vmap(jax.vmap(get_window))(
        jnp.minimum(start, v + 1 - W))                     # (K, nblk, W, C)
    wstart = jnp.minimum(start, v + 1 - W)
    local = pos - wstart[..., None]                        # (K, nblk, B)
    valid = (pos < v) & (local >= 0) & (local < W)
    onehot = jax.nn.one_hot(jnp.where(valid, local, W), W,
                            dtype=feats.dtype)             # (K, nblk, B, W)
    # fold weights first (cheaper: W@w is (K,nblk,W,Co))
    proj = jnp.einsum('knwc,kco->knwo', windows, w,
                      preferred_element_type=feats.dtype)
    out = jnp.einsum('knbw,knwo->knbo', onehot, proj,
                     preferred_element_type=feats.dtype)
    return out.sum(axis=0).reshape(v, co)


if __name__ == '__main__':
    main()
