"""CPU mini-overfit probe for the PartA2_free recall gap: tiny range,
2 scenes, per-term loss telemetry + stage-1 proposal recall every 50
steps.  Diagnoses whether the 42-AP convergence result is undertraining
(losses still falling) or a structural bug (a term plateaus while
proposals miss objects)."""
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))

import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

from glenet_tpu.utils import jax_cache
jax_cache.enable()

sys.path.insert(0, str(ROOT / 'tools'))
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
            np.ones(n_gt, bool))


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/PartA2_free.yaml'))
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -8., -3., 24., 8., 1.]
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 3000, 'test': 3000}
    # small NMS buffers: the 9000-slot kept-buffer fori_loop dominates
    # CPU step time and is irrelevant to the regression-convergence probe
    for mode in ('TRAIN', 'TEST'):
        nc = cfg.MODEL.ROI_HEAD.NMS_CONFIG[mode]
        nc.NMS_PRE_MAXSIZE = 1024
        nc.NMS_POST_MAXSIZE = min(100, int(nc.NMS_POST_MAXSIZE))
    det = build_detector(cfg)

    scenes = [make_scene(s) for s in range(2)]
    pts = jnp.asarray(np.stack([s[0] for s in scenes]))
    gt = jnp.asarray(np.stack([s[1] for s in scenes]))
    gm = jnp.asarray(np.stack([s[2] for s in scenes]))
    batch = {'points': pts, 'points_mask': jnp.ones(pts.shape[:2], bool),
             'gt_boxes': gt, 'gt_mask': gm,
             'gt_uncertainty': jnp.ones((*gt.shape[:2], 7), jnp.float32)}

    variables = det.init(jax.random.PRNGKey(0), batch)

    import optax
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(1e-3))
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

    predict = jax.jit(lambda v, b: det.predict(v, b))
    fwd_eval = jax.jit(lambda v, b: det.net_eval.apply(
        v, b['points'], b['points_mask'], train=False))

    def stage_probe(v):
        """Best IoU vs each gt at all three stages: per-point decoded
        boxes, NMS proposals (rois), final rcnn-refined detections."""
        out = fwd_eval(v, batch)
        part = jax.device_get(out['part_head'])
        prop = jax.device_get(out['proposals'])
        pred = jax.device_get(predict(v, batch))
        from glenet_tpu.utils import box_coder as bc_lib
        ph_cfg = cfg.MODEL.POINT_HEAD
        coder = bc_lib.build_box_coder(
            ph_cfg.TARGET_CONFIG.BOX_CODER,
            **dict(ph_cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {})))
        lab = np.argmax(part['point_cls_preds'], -1) + 1
        ptb = np.asarray(jax.vmap(coder.decode)(
            jnp.asarray(part['point_box_preds']),
            jnp.asarray(part['point_coords']), jnp.asarray(lab)))
        for s in range(2):
            gtb = np.asarray(gt[s][np.asarray(gm[s])])[:, :7]
            pm = part['point_mask'][s]
            for name, bx, valid in (
                    ('ptbox', ptb[s], pm),
                    ('roi', prop['rois'][s], prop['roi_valid'][s]),
                    ('final', pred['final_boxes'][s],
                     np.asarray(pred['final_scores'][s]) > 0.05)):
                ious = np.asarray(iou3d.boxes_iou3d(
                    jnp.asarray(gtb), jnp.asarray(bx)))
                ious = np.where(np.asarray(valid)[None, :], ious, 0.0)
                best = ious.max(axis=1)
                print(f'   s{s} {name}: best-IoU/gt='
                      f'{np.round(best, 2).tolist()} '
                      f'(h={np.round(gtb[:, 6], 2).tolist()})', flush=True)

    def probe(v):
        pred = predict(v, batch)
        fb = np.asarray(pred['final_boxes'])
        fs = np.asarray(pred['final_scores'])
        rec, matched_scores = [], []
        for s in range(2):
            gtb = np.asarray(gt[s][np.asarray(gm[s])])[:, :7]
            got = 0
            for gi in range(len(gtb)):
                ious = np.asarray(iou3d.boxes_iou3d(
                    jnp.asarray(gtb[gi:gi + 1]), jnp.asarray(fb[s])))[0]
                best = ious.argmax()
                if ious[best] > 0.5:
                    got += 1
                    matched_scores.append(float(fs[s][best]))
            rec.append(got / len(gtb))
        return rec, (np.round(matched_scores, 2).tolist()
                     if matched_scores else [])

    t0 = time.time()
    for i in range(n_steps):
        variables, opt, loss, mets = step(variables, opt, batch,
                                          jax.random.PRNGKey(i))
        if i % 50 == 0 or i == n_steps - 1:
            m = {k: round(float(x), 3) for k, x in mets.items()}
            rec, ms = probe(variables)
            print(f'step {i}: loss={float(loss):.3f} {m}\n'
                  f'   recall@0.5={rec} matched_scores={ms}',
                  flush=True)
            if i % 100 == 0 or i == n_steps - 1:
                stage_probe(variables)
    print('total', round(time.time() - t0, 1), 's')


if __name__ == '__main__':
    main()
