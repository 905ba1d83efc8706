"""Stage-2 recovery evidence for converted checkpoints (VERDICT r3 #8).

Context: tools/convert_weights.py maps every reference GLENet-VR stage-1
parameter (VFE, sparse backbone, BEV backbone, KL anchor head) onto our
modules with proven parity (tests/test_sparse_transplant_parity.py), but
the RoI stage cannot convert exactly: our corner-aggregation pooling
parameterizes a different function than the reference's voxel-query
pooling (utils/weight_converter.py).  The documented migration recipe is
therefore "convert stage 1, re-initialize stage 2, fine-tune briefly".
This script MEASURES that recipe on the convergence harness:

  1. load a converged GLENet-VR checkpoint (from tools/convergence_ap.py,
     /tmp/conv_GLENet_VR/variables.msgpack) — its stage-1 weights stand in
     for a converted reference checkpoint (same situation: stage 1 good,
     stage 2 unusable);
  2. RE-INITIALIZE the RoI head (params + its BN stats) from scratch;
  3. fine-tune ONLY the RoI head (stage-1 grads zeroed) for N steps;
  4. score with the official KITTI evaluator: AP should recover to ~100
     in a small fraction of the original schedule.

Usage: python tools/stage2_recovery.py [n_steps] [peak_lr]
Merges a 'GLENet_VR_stage2_recovery' entry into CONVERGENCE_AP.json.
Reference workflow being mirrored: /root/reference/README.md:176-186
(pretrained GLENet-VR checkpoints -> eval/fine-tune).
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tools'))

import numpy as np

import convergence_ap as ca

N_FROZEN_KEYS = ('vfe', 'backbone_3d', 'map_to_bev', 'backbone_2d',
                 'dense_head')


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.eval import kitti_eval
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.utils import jax_cache
    from glenet_tpu.utils.calibration_kitti import Calibration

    jax_cache.enable()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    peak_lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3

    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/GLENet_VR.yaml'))
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    det = build_detector(cfg)

    scenes = [ca.make_scene(s) for s in range(ca.N_SCENES)]
    batches = ca.make_batches(scenes, ca.BATCH, ca.MAX_POINTS, ca.N_GT)

    ckpt = Path('/tmp/conv_GLENet_VR/variables.msgpack')
    if not ckpt.exists():
        sys.exit('run tools/convergence_ap.py for GLENet_VR first '
                 f'(missing {ckpt})')

    fresh = det.init(jax.random.PRNGKey(7), batches[0])
    trained = serialization.from_bytes(fresh, ckpt.read_bytes())

    # --- step 2: stage-1 weights from the "converted" checkpoint, stage-2
    # (roi_head) from scratch — exactly what a reference-user gets after
    # tools/convert_weights.py ---------------------------------------------
    variables = jax.tree_util.tree_map(lambda x: x, trained)  # shallow copy
    n_reinit = 0
    for coll in variables:
        if isinstance(variables[coll], dict) and 'roi_head' in variables[coll]:
            variables[coll] = dict(variables[coll])
            variables[coll]['roi_head'] = fresh[coll]['roi_head']
            n_reinit += 1
    print(f'roi_head re-initialized in {n_reinit} collections', flush=True)

    # --- step 3: fine-tune ONLY the roi head ------------------------------
    params = variables['params']
    mstate = {k: v for k, v in variables.items() if k != 'params'}
    sched = optax.cosine_onecycle_schedule(max(n_steps, 4), peak_lr,
                                           pct_start=0.3)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=0.01))
    opt_state = tx.init(params)

    def zero_frozen(grads):
        return {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                    if k != 'roi_head' else v)
                for k, v in grads.items()}

    @jax.jit
    def step(params, mstate, opt_state, batch, key):
        def lf(p):
            return det.loss_fn({'params': p, **mstate}, batch, rng=key)
        (loss, (m, ns)), grads = jax.value_and_grad(lf, has_aux=True)(params)
        grads = zero_frozen(grads)
        u, o2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, u), ns, o2, loss

    t0 = time.time()
    loss = float('nan')
    for i in range(n_steps):
        b = batches[i % len(batches)]
        params, mstate, opt_state, loss = step(
            params, mstate, opt_state, b, jax.random.PRNGKey(500 + i))
        if i % 25 == 0 or i == n_steps - 1:
            print(f'step {i}: loss={float(loss):.3f} '
                  f'({time.time() - t0:.0f}s)', flush=True)

    from glenet_tpu.train.bn_refresh import refresh_detector_stats
    variables = refresh_detector_stats(det, {'params': params, **mstate},
                                       batches)
    params = variables['params']
    mstate = {k: v for k, v in variables.items() if k != 'params'}

    # --- step 4: official eval --------------------------------------------
    predict = jax.jit(lambda v, b: det.predict(v, b))
    calib = Calibration(ca.CALIB)
    gt_annos, dt_annos = [], []
    for bi, b in enumerate(batches):
        preds = predict({'params': params, **mstate}, b)
        fb = np.asarray(preds['final_boxes'])
        fs = np.asarray(preds['final_scores'])
        fv = np.asarray(preds['final_valid'])
        for k in range(fb.shape[0]):
            gt, gm = scenes[bi * ca.BATCH + k][1], scenes[bi * ca.BATCH + k][2]
            gt_annos.append(ca.to_annos(gt[gm][:, :7], None, calib))
            dt_annos.append(ca.to_annos(fb[k][fv[k]], fs[k][fv[k]], calib))
    result_str, ret = kitti_eval.get_official_eval_result(
        gt_annos, dt_annos, ['Car'])
    print(result_str)

    out = {
        'model': 'GLENet_VR stage-1 kept / roi_head reinit + frozen-stage-1 '
                 'fine-tune (converted-checkpoint recovery recipe)',
        'n_scenes': ca.N_SCENES, 'n_steps': n_steps,
        'final_loss': float(loss),
        'Car_3d_moderate_R40': ret.get('Car_3d/moderate_R40'),
        'Car_bev_moderate_R40': ret.get('Car_bev/moderate_R40'),
        'wall_clock_s': round(time.time() - t0, 1),
    }
    ca.merge_entry('GLENet_VR_stage2_recovery', out)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
