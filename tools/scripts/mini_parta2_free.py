"""Staged accuracy probe for PartA2_free (VERDICT r2 #1: 3D mod R40 42.06
while every other family overfits to ~100).

Overfits the full PartA2_free config on a tiny range and measures best-IoU
per gt at three stages — stage-1 point-box decode (pre-NMS), post-NMS rois,
and rcnn-refined final boxes — in eval mode after exact BN re-estimation.
Distinguishes: (a) stage-1 box branch broken; (b) proposal NMS starving the
rcnn; (c) rcnn refinement regressing good rois; (d) everything fine ->
harness/undertraining issue.

Usage: python tools/scripts/mini_parta2_free.py [n_steps] [peak_lr]
"""
import functools
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tools'))

import numpy as np
import jax
import jax.numpy as jnp

from glenet_tpu.utils import jax_cache
jax_cache.enable()

from convergence_ap import car_surface_points
from glenet_tpu.config import cfg_from_yaml_file
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.ops import iou3d


def make_scene(seed, n_gt=4):
    rng = np.random.RandomState(seed)
    gt = np.zeros((n_gt, 8), np.float32)
    placed = []
    for g in range(n_gt):
        for _ in range(20):
            cx, cy = rng.uniform(4, 20), rng.uniform(-6, 6)
            if all((cx - px) ** 2 + (cy - py) ** 2 > 30 for px, py in placed):
                break
        placed.append((cx, cy))
        dims = [rng.uniform(3.6, 4.3), rng.uniform(1.5, 1.8),
                rng.uniform(1.4, 1.7)]
        gt[g] = [placed[-1][0], placed[-1][1], -1.0 + dims[2] / 2 - 0.8,
                 *dims, rng.uniform(-np.pi, np.pi), 1]
    pts = [car_surface_points(rng, gt[g, :7], n=250) for g in range(n_gt)]
    n_ground = 4000 - sum(len(p) for p in pts)
    ground = np.stack([rng.uniform(0, 24, n_ground),
                       rng.uniform(-7.8, 7.8, n_ground),
                       rng.normal(-1.8, 0.05, n_ground)], 1)
    xyz = np.concatenate(pts + [ground])[:4000]
    inten = rng.uniform(0, 1, (len(xyz), 1))
    return (np.concatenate([xyz, inten], 1).astype(np.float32), gt,
            np.ones(len(gt), bool))


def best_iou_per_gt(gtb, boxes, valid=None):
    if valid is not None:
        boxes = boxes[np.asarray(valid)]
    if len(boxes) == 0:
        return [float('nan')] * len(gtb)
    ious = np.asarray(iou3d.boxes_iou3d(
        jnp.asarray(gtb), jnp.asarray(boxes[:, :7])))
    return np.round(ious.max(axis=1), 3).tolist()


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    peak_lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/PartA2_free.yaml'))
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -8., -3., 24., 8., 1.]
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 3000, 'test': 3000}
    pp = cfg.MODEL.POST_PROCESSING
    pp.SCORE_THRESH = 0.0
    if 'POST_SCORE_THRESH' in pp:
        pp.POST_SCORE_THRESH = 0.0
    det = build_detector(cfg)

    scenes = [make_scene(s) for s in range(2)]
    pts = jnp.asarray(np.stack([s[0] for s in scenes]))
    gt = jnp.asarray(np.stack([s[1] for s in scenes]))
    gm = jnp.asarray(np.stack([s[2] for s in scenes]))
    batch = {'points': pts, 'points_mask': jnp.ones(pts.shape[:2], bool),
             'gt_boxes': gt, 'gt_mask': gm,
             'gt_uncertainty': jnp.full((*gt.shape[:2], 7), 0.05,
                                        jnp.float32)}

    variables = det.init(jax.random.PRNGKey(0), batch)

    import optax
    sched = optax.cosine_onecycle_schedule(n_steps, peak_lr)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adam(learning_rate=sched))
    opt = tx.init(variables['params'])

    @jax.jit
    def step(v, o, b, key):
        def lf(p):
            return det.loss_fn({**v, 'params': p}, b, train=True, rng=key)
        (loss, (mets, mut)), g = jax.value_and_grad(lf, has_aux=True)(
            v['params'])
        up, o2 = tx.update(g, o)
        p = optax.apply_updates(v['params'], up)
        return {**v, 'params': p, **mut}, o2, loss, mets

    # eval-mode full forward (returns the staged outputs)
    fwd_eval = jax.jit(lambda v, b: det.net_eval.apply(
        v, b['points'], b['points_mask'], train=False,
        rngs={'roi_sampler': jax.random.PRNGKey(0)}))
    predict = jax.jit(lambda v, b: det.predict(v, b))

    def stage_probe(v, label):
        out = fwd_eval(v, batch)
        pred = jax.device_get(predict(v, batch))
        po = out['part_head']
        coords = np.asarray(po['point_coords'])
        pmask = np.asarray(po['point_mask'])
        cls = np.asarray(jax.nn.sigmoid(po['point_cls_preds']))
        enc = po['point_box_preds']
        labels = jnp.argmax(po['point_cls_preds'], axis=-1) + 1
        ptboxes = np.asarray(jax.vmap(
            lambda e, x, lab: det.point_coder.decode(e, x, lab))(
            enc, jnp.asarray(coords), labels))
        props = jax.device_get(out['proposals'])
        for s in range(2):
            gtb = np.asarray(gt[s][np.asarray(gm[s])])[:, :7]
            sc = cls[s].max(-1) * pmask[s]
            top = np.argsort(-sc)[:512]
            print(f'  [{label}] s{s} '
                  f'ptbox={best_iou_per_gt(gtb, ptboxes[s][top])} '
                  f'roi={best_iou_per_gt(gtb, np.asarray(props["rois"][s]), props["roi_valid"][s])} '
                  f'final={best_iou_per_gt(gtb, np.asarray(pred["final_boxes"][s]), pred["final_valid"][s])} '
                  f'kept={int(np.asarray(pred["final_valid"][s]).sum())}',
                  flush=True)

    t0 = time.time()
    ckpt = Path('/tmp/pa2free_probe_vars.msgpack')
    if ckpt.exists() and '--resume' in sys.argv:
        from flax import serialization
        variables = serialization.from_bytes(variables, ckpt.read_bytes())
        print(f'resumed trained variables from {ckpt}', flush=True)
    else:
        for i in range(n_steps):
            variables, opt, loss, mets = step(variables, opt, batch,
                                              jax.random.PRNGKey(i))
            if i % 100 == 0 or i == n_steps - 1:
                m = {k: round(float(x), 3) for k, x in mets.items()}
                print(f'step {i}: loss={float(loss):.3f} {m}', flush=True)

        from glenet_tpu.train.bn_refresh import refresh_detector_stats
        variables = refresh_detector_stats(det, variables, [batch] * 8)
        from flax import serialization
        ckpt.write_bytes(serialization.to_bytes(variables))
        print(f'bn refreshed; saved {ckpt}; staged IoUs (eval mode):',
              flush=True)
    stage_probe(variables, 'eval+bn')
    print('total', round(time.time() - t0, 1), 's')


if __name__ == '__main__':
    main()
