"""Full-model step timing on the real chip: SECOND / GLENet-S / GLENet-VR
forward, train step, and predict at KITTI scale with synthetic clustered
scenes.

All timing loops are DEPENDENCY-CARRIED: iteration i+1's input depends on
iteration i's output, so the chip cannot overlap or elide executions.  The
round-2 version timed overlapped dispatches of identical programs, which
measured dispatch rate, not execution — producing numbers up to 2000x
faster than physics allows (see PERF_NOTES.md "Round-2 numbers retracted").
Every measurement is cross-checked against compiled.cost_analysis() FLOPs:
implied FLOP/s above the chip's bf16 peak raises an AssertionError.

Sync rule (measured, axon tunnel): jax.block_until_ready on a SCALAR
output returns ~instantly without waiting for execution (0.12 ms reported
for a 1.93 TFLOP program); blocking on a LARGE output array USUALLY
agrees with the device trace and with a host fetch to <5% — but round 5
observed it, too, returning pre-execution on occasion (0.25 ms reported
for a 1.73-TFLOP loop; the physicality assert caught it).  So every
timing loop here blocks on the full output tree AND host-fetches one
element of the largest output leaf at loop end (`_sync`): a host fetch
cannot complete before the data exists.  The fetch costs one tunnel
round trip (~30-60 ms) amortized over the loop.

Usage: python tools/bench_model.py [second|glenet_vr|all]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import os

BATCH = int(os.environ.get('BENCH_BATCH', '2'))
MAX_POINTS = 32768
V5E_PEAK_FLOPS = 197e12    # bf16 peak, one v5e chip


def _flops_of(lowered_jit, *args):
    """cost_analysis() FLOPs of a jitted fn at the given args (0 if the
    backend reports none)."""
    compiled = lowered_jit.lower(*args).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost.get('flops', 0.0)) if cost else 0.0


def _check_physical(name, what, dt, flops):
    """Assert a measured step time is physically possible on one chip."""
    if flops <= 0 or dt <= 0:
        return
    implied = flops / dt
    assert implied <= V5E_PEAK_FLOPS, (
        f'[{name}] {what}: {dt * 1e3:.2f} ms for {flops / 1e12:.2f} TFLOP '
        f'implies {implied / 1e12:.0f} TFLOP/s > {V5E_PEAK_FLOPS / 1e12:.0f}'
        f' TFLOP/s peak — the timing loop is broken (overlap/elision)')
    print(f'[{name}] {what}: {flops / 1e12:.2f} TFLOP/step, '
          f'MFU {implied / V5E_PEAK_FLOPS:.3f}')


def _sync(tree):
    """Force + wait for execution of `tree`: block_until_ready plus a
    host fetch of one element of the largest leaf (block_until_ready
    alone has been observed returning pre-execution over the axon
    tunnel; a data fetch cannot)."""
    import jax
    import numpy as np
    jax.block_until_ready(tree)
    big = max(jax.tree_util.tree_leaves(tree), key=lambda x: x.size)
    return np.asarray(jax.numpy.ravel(big)[0])


def make_scene(rng, n_points=MAX_POINTS):
    """Clustered KITTI-like scene: ground plane + car-sized clusters."""
    n_ground = int(n_points * 0.55)
    pts = np.zeros((n_points, 4), np.float32)
    pts[:n_ground, 0] = rng.uniform(0, 69.12, n_ground)
    pts[:n_ground, 1] = rng.uniform(-39.68, 39.68, n_ground)
    pts[:n_ground, 2] = rng.normal(-1.6, 0.1, n_ground)
    i = n_ground
    while i < n_points:
        n = min(rng.randint(200, 1500), n_points - i)
        cx, cy = rng.uniform(5, 60), rng.uniform(-30, 30)
        pts[i:i + n, 0] = cx + rng.normal(0, 1.5, n)
        pts[i:i + n, 1] = cy + rng.normal(0, 0.8, n)
        pts[i:i + n, 2] = rng.uniform(-1.6, 0.2, n)
        i += n
    pts[:, 3] = rng.uniform(0, 1, n_points)
    return pts


def make_batch(rng, n_gt=16):
    import jax.numpy as jnp
    pts = np.stack([make_scene(rng) for _ in range(BATCH)])
    gt = np.zeros((BATCH, n_gt, 8), np.float32)
    gt_mask = np.zeros((BATCH, n_gt), bool)
    for b in range(BATCH):
        for g in range(8):
            gt[b, g] = [rng.uniform(5, 60), rng.uniform(-30, 30), -1.0,
                        3.9, 1.6, 1.56, rng.uniform(-3, 3), 1]
            gt_mask[b, g] = True
    return {
        'points': jnp.asarray(pts),
        'points_mask': jnp.ones((BATCH, MAX_POINTS), bool),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.asarray(gt_mask),
        'gt_uncertainty': jnp.ones((BATCH, n_gt, 7), np.float32) * 0.1,
    }


def bench_one(cfg_path, name):
    import jax
    import jax.numpy as jnp
    import optax

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector

    cfg = cfg_from_yaml_file(cfg_path)
    det = build_detector(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)

    t0 = time.perf_counter()
    variables = det.init(jax.random.PRNGKey(0), batch)
    print(f'[{name}] init: {time.perf_counter() - t0:.1f}s')

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
        return (optax.apply_updates(params, updates), new_state, opt_state2,
                loss)

    # carry: a scalar derived from iteration i's output, mixed (at 1e-30
    # scale — numerically invisible) into iteration i+1's points so the
    # executions form a dependency chain the chip cannot overlap or elide
    @jax.jit
    def fwd(variables, batch, carry):
        pts = batch['points'] + carry * 1e-30
        out = det.net.apply(variables, pts, batch['points_mask'],
                            train=False)
        # reduce every leaf to a scalar: keeps ALL computation live (no
        # DCE) but avoids materializing the multi-GB forward tree as
        # program outputs each iteration — returning the raw tree
        # measured 6.5 s/it of allocator/handle churn where predict (a
        # computational superset with small outputs) runs in 0.55 s
        sums = jax.tree_util.tree_map(
            lambda x: jnp.sum(x.astype(jnp.float32)), out)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return sums, jnp.tanh(jnp.sum(leaf))

    @jax.jit
    def predict(variables, batch, carry):
        pts = batch['points'] + carry * 1e-30
        b = dict(batch, points=pts)
        out = det.predict(variables, b)
        return out, jnp.tanh(jnp.sum(out['final_scores']))

    # -- forward -------------------------------------------------------------
    carry = jnp.zeros(())
    t0 = time.perf_counter()
    out, carry = fwd(variables, batch, carry)
    jax.block_until_ready(carry)
    print(f'[{name}] fwd compile+run: {time.perf_counter() - t0:.1f}s')
    n = 10
    fwd_flops = _flops_of(fwd, variables, batch, carry)
    t0 = time.perf_counter()
    for _ in range(n):
        out, carry = fwd(variables, batch, carry)
    _sync(out)                          # see header sync rule
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] fwd: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s)')
    _check_physical(name, 'fwd', dt, fwd_flops)

    # -- predict -------------------------------------------------------------
    carry = jnp.zeros(())
    t0 = time.perf_counter()
    out, carry = predict(variables, batch, carry)
    jax.block_until_ready(carry)
    print(f'[{name}] predict compile+run: {time.perf_counter() - t0:.1f}s')
    pred_flops = _flops_of(predict, variables, batch, carry)
    t0 = time.perf_counter()
    for _ in range(n):
        out, carry = predict(variables, batch, carry)
    _sync(out)                          # see header sync rule
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] predict: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s)')
    _check_physical(name, 'predict', dt, pred_flops)

    # -- train step (dependency-carried via params feedback) -----------------
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, mstate, opt_state, loss = train_step(
        params, mstate, opt_state, batch, key)
    jax.block_until_ready(loss)
    print(f'[{name}] train compile+run: {time.perf_counter() - t0:.1f}s')
    train_flops = _flops_of(train_step, params, mstate, opt_state, batch,
                            key)
    t0 = time.perf_counter()
    for i in range(n):
        params, mstate, opt_state, loss = train_step(
            params, mstate, opt_state, batch, jax.random.PRNGKey(i))
    _sync(params)                       # see header sync rule
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] train step: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s), loss={float(loss):.3f}')
    _check_physical(name, 'train', dt, train_flops)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    root = Path(__file__).resolve().parent.parent
    targets = {
        'second': root / 'configs/kitti_models/second.yaml',
        'glenet_vr': root / 'configs/kitti_models/GLENet_VR.yaml',
    }
    for name, path in targets.items():
        if which in (name, 'all'):
            bench_one(str(path), name)


if __name__ == '__main__':
    main()
