"""Chip validation for ops/merge_kernel.resolve_sorted_queries: exact
equality vs merged_searchsorted_deltas at real table scales + honest
dependency-carried timing of both paths.

Run on the TPU (compiled Mosaic path, not interpret mode):
    python tools/validate_merge_kernel.py [V] [VQ]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from glenet_tpu.ops import merge_kernel, sparse
from glenet_tpu.utils import jax_cache

jax_cache.enable()

B = 2
G = 9


def main():
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 140_000
    vq = int(sys.argv[2]) if len(sys.argv) > 2 else 160_000
    n_cells = 21 * 800 * 704
    rng = np.random.RandomState(0)

    ids_rows, q_rows = [], []
    for b in range(B):
        n_active = int(v * 0.75)
        cells = np.sort(rng.choice(n_cells, size=n_active, replace=False))
        ids = np.full((v,), n_cells, np.int64)
        ids[:n_active] = cells
        base = np.take(ids, np.clip(np.arange(vq), 0, v - 1))
        shifts = rng.randint(-800 * 704 - 704, 800 * 704 + 704, size=(G,))
        q_rows.append(np.stack(
            [np.clip(base + s, -(2 ** 27), 2 ** 27) for s in shifts]))
        ids_rows.append(ids)
    ids = jnp.asarray(np.stack(ids_rows).astype(np.int32))
    queries = jnp.asarray(np.stack(q_rows).astype(np.int32))

    # --- exactness ---------------------------------------------------------
    out_k = merge_kernel.resolve_sorted_queries(ids, queries)
    out_k = jax.device_get(out_k)
    for b in range(B):
        ref = sparse.merged_searchsorted_deltas(ids[b], queries[b])
        ref = jax.device_get(ref)
        for name, a, r in zip(('pos', 'd0', 'd1', 'd2'), out_k, ref):
            bad = np.nonzero(a[b] != r)
            assert a[b].shape == r.shape
            if bad[0].size:
                i, j = bad[0][0], bad[1][0]
                raise AssertionError(
                    f'sample {b} {name}: {bad[0].size} mismatches; first '
                    f'at [{i},{j}] kernel={a[b][i, j]} ref={r[i, j]} '
                    f'query={np.asarray(queries)[b, i, j]}')
    print(f'EXACT MATCH at V={v} VQ={vq} (B={B}, G={G})')

    # --- timing (dependency-carried, host-fetch sync) ----------------------
    def timed(fn, iters=6):
        o = fn(queries)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        q = queries
        for _ in range(iters):
            o = fn(q)
            q = jnp.bitwise_xor(q, (o[0][..., :1] & 0))  # dep-carry, no-op
        float(np.asarray(o[0][0, 0, :8]).sum())           # host fetch
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters

    t_kernel = timed(jax.jit(
        lambda q: merge_kernel.resolve_sorted_queries(ids, q)))
    t_sort = timed(jax.jit(
        lambda q: jax.vmap(sparse.merged_searchsorted_deltas)(ids, q)))
    print(f'merge kernel: {t_kernel * 1e3:8.2f} ms')
    print(f'sort path:    {t_sort * 1e3:8.2f} ms   '
          f'({t_sort / t_kernel:.1f}x)')


if __name__ == '__main__':
    main()
