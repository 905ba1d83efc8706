"""Microbench: which gather formulation is fastest at the REAL sparse-conv
shapes (conv3_down scale: table 140k rows x 96 lanes bf16, 9x160k queries,
batch 2)?  The round-4 predict trace shows these gathers at ~40 ns/row.

Honest timing: each form runs ITERS times inside ONE jitted lax.scan whose
carry perturbs the indices (so gathers can't be hoisted/elided) and whose
output sums ALL lanes (so XLA can't narrow the gather).  Wall time of the
single dispatch / ITERS ~= device time per gather, no tunnel effects.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from glenet_tpu.utils import jax_cache

jax_cache.enable()

B = 2
V = 140_000          # conv3_down input active sites (level-2 cap at 40k)
Q = 9 * 160_000      # 9 tap groups x level-3 output cap
C3 = 96              # 3 * Cin at Cin=32, merged minor axis
ITERS = 6


def timed_scan(gather_sum, tab, idx):
    """gather_sum(tab, idx) -> scalar f32 consuming every gathered lane."""
    @jax.jit
    def run(tab, idx):
        def body(carry, _):
            s = gather_sum(tab, (idx + carry) % V)
            return (s.astype(jnp.int32) % 3).astype(jnp.int32), s
        return lax.scan(body, jnp.int32(0), None, length=ITERS)[1]
    # host-fetch the value: over the axon tunnel block_until_ready on a
    # small output returns before execution (PERF_NOTES methodology)
    float(np.asarray(run(tab, idx)).sum())
    t0 = time.perf_counter()
    float(np.asarray(run(tab, idx)).sum())
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(B, V + 3, C3).astype(np.float32))
    tab_bf = tab.astype(jnp.bfloat16)
    idx_rand = jnp.asarray(rng.randint(0, V, size=(B, Q)).astype(np.int32))
    idx_sort = jnp.sort(idx_rand, axis=-1)

    def s(x):
        return x.astype(jnp.float32).sum()

    def form_a(t, i):            # flat, single sample
        return s(jnp.take(t[0], i[0], axis=0, mode='clip'))

    def form_b(t, i):            # vmapped take (today's model form)
        return s(jax.vmap(lambda tt, ii: jnp.take(tt, ii, axis=0,
                                                  mode='clip'))(t, i))

    def form_c(t, i):            # one flat take from batch-merged operand
        merged = t.reshape(-1, t.shape[-1])
        off = (jnp.arange(t.shape[0], dtype=jnp.int32)
               * t.shape[1])[:, None]
        return s(jnp.take(merged, (i + off).reshape(-1), axis=0,
                          mode='clip'))

    r = {}
    r['A flat 1-sample bf16'] = (timed_scan(form_a, tab_bf, idx_rand), Q)
    r['B vmap batch2 bf16'] = (timed_scan(form_b, tab_bf, idx_rand), B * Q)
    r['C merged-flat batch2 bf16'] = (timed_scan(form_c, tab_bf, idx_rand),
                                      B * Q)
    r['D vmap batch2 f32'] = (timed_scan(form_b, tab, idx_rand), B * Q)
    r['E merged-flat bf16 sorted'] = (timed_scan(form_c, tab_bf, idx_sort),
                                      B * Q)

    ids_i32 = jnp.asarray(
        np.sort(rng.randint(0, 2 ** 26, size=(B, V)).astype(np.int32)))
    idq = idx_rand[..., :Q // 3]

    def form_f(t, i):            # single-lane int32 id lookups (x3 shape)
        return 3.0 * s(jax.vmap(lambda tt, ii: jnp.take(
            tt, ii, mode='clip'))(t, i))

    r['F 1-lane int32 lookup (x3 cost)'] = (
        3 * timed_scan(form_f, ids_i32, idq) / 1, B * Q)

    def form_h(t, i):            # flat single-lane int32 lookup, merged
        merged = t.reshape(-1)
        off = (jnp.arange(t.shape[0], dtype=jnp.int32)
               * t.shape[1])[:, None]
        return 3.0 * s(jnp.take(merged, (i + off).reshape(-1),
                                mode='clip'))

    r['H merged-flat 1-lane int32 (x3)'] = (
        3 * timed_scan(form_h, ids_i32, idq), B * Q)

    for name, (dt, rows) in r.items():
        gbs = rows * (C3 * 2) / dt / 1e9
        print(f'{name:34s} {dt * 1e3:8.2f} ms   '
              f'{dt / rows * 1e9:6.2f} ns/row  (~{gbs:5.0f} GB/s if 192B rows)')


if __name__ == '__main__':
    main()
