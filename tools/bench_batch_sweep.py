"""Throughput-optimal batch probe: GLENet-VR predict + train step at a
given batch size on the real chip (dependency-carried, strict sync).

Usage: BENCH_BATCH=4 python tools/bench_batch_sweep.py [predict|train|both]

One batch size per process: an HBM OOM at a candidate batch must not take
down the rest of the sweep.  Prints one summary line per phase:
    SWEEP <phase> batch=<B> ms=<ms> scans_per_s=<v>
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from glenet_tpu.utils import jax_cache

jax_cache.enable()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    import jax
    import jax.numpy as jnp
    import optax

    import bench_model as bm
    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector

    batch_size = bm.BATCH
    cfg = cfg_from_yaml_file(
        str(Path(__file__).resolve().parent.parent
            / 'configs/kitti_models/GLENet_VR.yaml'))
    det = build_detector(cfg)
    rng = np.random.RandomState(0)
    batch = bm.make_batch(rng)
    variables = det.init(jax.random.PRNGKey(0), batch)

    if which in ('predict', 'both'):
        @jax.jit
        def predict(variables, batch, carry):
            pts = batch['points'] + carry * 1e-30
            b = dict(batch, points=pts)
            out = det.predict(variables, b)
            return out, jnp.tanh(jnp.sum(out['final_scores']))

        carry = jnp.zeros(())
        t0 = time.perf_counter()
        out, carry = predict(variables, batch, carry)
        jax.block_until_ready(carry)
        print(f'predict compile+run: {time.perf_counter() - t0:.1f}s',
              flush=True)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out, carry = predict(variables, batch, carry)
        bm._sync(out)
        dt = (time.perf_counter() - t0) / n
        print(f'SWEEP predict batch={batch_size} ms={dt * 1e3:.1f} '
              f'scans_per_s={batch_size / dt:.2f}', flush=True)

    if which in ('train', 'both'):
        tx = optax.adam(1e-3)
        params = variables['params']
        mstate = {k: v for k, v in variables.items() if k != 'params'}
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, mstate, opt_state, batch, key):
            def lf(p):
                return det.loss_fn({'params': p, **mstate}, batch, rng=key)
            (loss, (metrics, new_state)), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            updates, opt_state2 = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), new_state,
                    opt_state2, loss)

        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        params, mstate, opt_state, loss = train_step(
            params, mstate, opt_state, batch, key)
        jax.block_until_ready(loss)
        print(f'train compile+run: {time.perf_counter() - t0:.1f}s',
              flush=True)
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            params, mstate, opt_state, loss = train_step(
                params, mstate, opt_state, batch, jax.random.PRNGKey(i))
        bm._sync(params)
        dt = (time.perf_counter() - t0) / n
        print(f'SWEEP train batch={batch_size} ms={dt * 1e3:.1f} '
              f'scans_per_s={batch_size / dt:.2f}', flush=True)


if __name__ == '__main__':
    main()
