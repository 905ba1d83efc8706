"""Full-model step timing on the real chip: SECOND / GLENet-S / GLENet-VR
forward, train step, and predict at KITTI scale with synthetic clustered
scenes.  Chains N steps inside jit where possible; otherwise does one
warm-up then times a loop of dispatches (the axon tunnel adds ~30 ms per
round trip — reported numbers subtract nothing, so they are upper bounds).

Usage: python tools/bench_model.py [second|glenet_vr|all]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = 2
MAX_POINTS = 32768


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

    @jax.jit
    def fwd(variables, batch):
        return det.net.apply(variables, batch['points'],
                             batch['points_mask'], train=False)

    predict = jax.jit(lambda v, b: det.predict(v, b))

    # -- forward -------------------------------------------------------------
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(variables, batch))
    print(f'[{name}] fwd compile+run: {time.perf_counter() - t0:.1f}s')
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] fwd: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s)')

    # -- predict -------------------------------------------------------------
    t0 = time.perf_counter()
    out = jax.block_until_ready(predict(variables, batch))
    print(f'[{name}] predict compile+run: {time.perf_counter() - t0:.1f}s')
    t0 = time.perf_counter()
    for _ in range(n):
        out = predict(variables, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] predict: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s)')

    # -- train step ----------------------------------------------------------
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, mstate, opt_state, loss = train_step(
        params, mstate, opt_state, batch, key)
    jax.block_until_ready(loss)
    print(f'[{name}] train compile+run: {time.perf_counter() - t0:.1f}s')
    t0 = time.perf_counter()
    for i in range(n):
        params, mstate, opt_state, loss = train_step(
            params, mstate, opt_state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    print(f'[{name}] train step: {dt * 1e3:.1f} ms/batch '
          f'({BATCH / dt:.1f} scans/s), loss={float(loss):.3f}')


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
