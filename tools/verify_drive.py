"""Verification drive: exercise the round-2 surfaces end-to-end on the real
TPU chip — vectorized NMS (incl. degenerate inputs), PointRCNN two-stage,
PV-RCNN, GLENet-VR full-scale train/predict, and the multichip dryrun.

Run: python tools/verify_drive.py
"""
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tests'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print('devices:', jax.devices())

    # ---- 1. NMS on TPU: normal, degenerate, voting ------------------------
    from glenet_tpu.ops import nms as nms_ops
    rng = np.random.RandomState(0)
    n = 300
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 3:6] = [3.9, 1.6, 1.56]
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    idx, valid = nms_ops.nms_bev(jnp.asarray(boxes), jnp.asarray(scores),
                                 0.1, pre_max=256, post_max=64)
    print(f'nms_bev: kept={int(valid.sum())}')
    assert 0 < int(valid.sum()) <= 64
    # all below threshold -> nothing kept
    idx, valid = nms_ops.nms_bev(jnp.asarray(boxes),
                                 jnp.asarray(scores * 0.0), 0.1,
                                 pre_max=256, post_max=64,
                                 score_threshold=0.5)
    assert int(valid.sum()) == 0, 'expected zero keeps below threshold'
    print('nms_bev degenerate (all below threshold): OK')
    var = np.abs(rng.uniform(0.01, 1.0, (n, 7))).astype(np.float32)
    idx, valid, voted, ks = nms_ops.variance_voting_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(var), 0.1,
        pre_max=256, post_max=64)
    assert np.isfinite(np.asarray(voted)).all()
    print(f'variance_voting_nms: kept={int(valid.sum())}, voted finite')

    # ---- 2. tiny PointRCNN two-stage + PV-RCNN on TPU ----------------------
    from glenet_tpu.models.detectors import build_detector
    from test_second import make_batch
    from test_pointrcnn import make_two_stage_cfg
    from test_pvrcnn import make_pvrcnn_cfg
    from test_parta2 import make_parta2_cfg

    for name, cfg in [('pointrcnn2', make_two_stage_cfg()),
                      ('pvrcnn', make_pvrcnn_cfg()),
                      ('parta2', make_parta2_cfg())]:
        det = build_detector(cfg)
        batch = make_batch(np.random.RandomState(1), n_points=256)
        variables = det.init(jax.random.PRNGKey(0), batch)
        tx = optax.adam(1e-3)
        params = variables['params']
        mstate = {k: v for k, v in variables.items() if k != 'params'}
        opt_state = tx.init(params)

        @jax.jit
        def step(params, mstate, opt_state, key, det=det, batch=batch,
                 tx=tx):
            def lf(p):
                return det.loss_fn({'params': p, **mstate}, batch, rng=key)
            (loss, (m, new_state)), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            gn = optax.global_norm(grads)
            updates, opt_state2 = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), new_state,
                    opt_state2, loss, gn)

        losses = []
        for i in range(3):
            params, mstate, opt_state, loss, gn = step(
                params, mstate, opt_state, jax.random.PRNGKey(i))
            losses.append(float(loss))
            assert np.isfinite(float(gn)), f'{name}: non-finite grad norm'
        preds = jax.jit(lambda v, b, det=det: det.predict(v, b))(
            {'params': params, **mstate}, batch)
        assert np.isfinite(np.asarray(preds['final_boxes'])).all()
        print(f'{name}: 3 TPU train steps losses={np.round(losses, 3)}, '
              f'predict finite OK')

    # ---- 3. GLENet-VR full KITTI scale: train steps + predict --------------
    from glenet_tpu.config import cfg_from_yaml_file
    sys.path.insert(0, str(ROOT / 'tools'))
    from bench_model import make_batch as make_full_batch
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/GLENet_VR.yaml'))
    det = build_detector(cfg)
    batch = make_full_batch(np.random.RandomState(2))
    t0 = time.time()
    variables = det.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    params = variables['params']
    mstate = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = tx.init(params)

    @jax.jit
    def vr_step(params, mstate, opt_state, key):
        def lf(p):
            return det.loss_fn({'params': p, **mstate}, batch, rng=key)
        (loss, (m, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        gn = optax.global_norm(grads)
        updates, opt_state2 = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), new_state,
                opt_state2, loss, gn)

    losses = []
    for i in range(3):
        params, mstate, opt_state, loss, gn = vr_step(
            params, mstate, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
        assert np.isfinite(float(gn))
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **mstate}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
    nkept = int(np.asarray(preds['final_valid']).sum())
    print(f'glenet_vr full-scale: 3 TPU train steps '
          f'losses={np.round(losses, 2)} (decreasing={losses[-1] < losses[0]}),'
          f' predict kept={nkept}, total {time.time() - t0:.0f}s')

    # ---- 4. PV-RCNN++ tiny: CenterHead proposals -> SPC -> VectorPool ------
    from test_pvrcnn_plusplus import make_pvpp_cfg
    from test_second import make_batch as make_tiny_batch
    cfg = make_pvpp_cfg()
    det = build_detector(cfg)
    tb = make_tiny_batch(np.random.RandomState(5))
    t0 = time.time()
    variables = det.init(jax.random.PRNGKey(0), tb)
    params = variables['params']
    mstate = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = (tx := optax.adam(1e-3)).init(params)

    @jax.jit
    def pvpp_step(params, mstate, opt_state, key):
        def lf(p):
            return det.loss_fn({'params': p, **mstate}, tb, rng=key)
        (loss, (m, ns)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        gn = optax.global_norm(grads)
        u, o2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, u), ns, o2, loss, gn

    losses = []
    for i in range(3):
        params, mstate, opt_state, loss, gn = pvpp_step(
            params, mstate, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
        assert np.isfinite(float(gn)), 'pvpp grad not finite'
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **mstate}, tb)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
    # degenerate: no valid points / no gt in sample 0
    tb2 = dict(tb)
    tb2['points_mask'] = tb['points_mask'].at[0].set(False)
    preds2 = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **mstate}, tb2)
    assert np.isfinite(np.asarray(preds2['final_boxes'])).all()
    print(f'pvrcnn++ tiny: 3 TPU train steps losses={np.round(losses, 2)}, '
          f'predict finite (incl. empty-scene batch), {time.time()-t0:.0f}s')

    # ---- 5. demo CLI with HTML/PLY scene export ----------------------------
    import tempfile
    tmp = Path(tempfile.mkdtemp())
    pts = np.zeros((4000, 4), np.float32)
    rng2 = np.random.RandomState(7)
    pts[:, 0] = rng2.uniform(0, 60, 4000)
    pts[:, 1] = rng2.uniform(-30, 30, 4000)
    pts[:, 2] = rng2.normal(-1.6, 0.3, 4000)
    pts.tofile(tmp / '000000.bin')
    r = subprocess.run(
        [sys.executable, str(ROOT / 'tools/demo.py'),
         '--cfg_file', str(ROOT / 'configs/kitti_models/pointpillar.yaml'),
         '--data_path', str(tmp / '000000.bin'),
         '--output', str(tmp / 'det.json'),
         '--html_dir', str(tmp / 'html'), '--ply_dir', str(tmp / 'ply')],
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-1000:]
    assert (tmp / 'html/000000.html').exists()
    assert (tmp / 'ply/000000.ply').exists()
    print('demo CLI + scene export: OK '
          f'({(tmp / "html/000000.html").stat().st_size} html bytes)')

    # ---- 6. multichip dryrun (virtual 8-device CPU mesh) -------------------
    r = subprocess.run([sys.executable, str(ROOT / '__graft_entry__.py'),
                        'multichip', '8'],
                       capture_output=True, text=True, timeout=1200)
    print(r.stdout.strip().splitlines()[-1] if r.stdout else r.stderr[-500:])
    assert r.returncode == 0, 'multichip dryrun failed'
    print('ALL VERIFY CHECKS PASSED')


if __name__ == '__main__':
    main()
