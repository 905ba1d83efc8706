"""CPU probe for the Waymo APH gap (VERDICT r2 weak #4): overfit a KL
anchor head (GLENet_S config, tiny range) and measure heading error at
three stages — dir-bin accuracy at positive anchors, pre-NMS decoded
heading per gt, and post variance-voting final heading per gt.

Distinguishes: (a) dir classifier not learning -> flips at decode;
(b) decode right but variance voting corrupts heading; (c) both fine ->
evaluator-side or Waymo-specific issue.

Usage: python tools/scripts/mini_kl_heading.py [n_steps] [model_yaml]
"""
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tools'))

import os

import jax
if os.environ.get('KL_PROBE_CPU', '0') == '1':
    jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

from glenet_tpu.utils import jax_cache
jax_cache.enable()

from convergence_ap import car_surface_points
from glenet_tpu.config import cfg_from_yaml_file
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.models import anchor_heads
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


def wrap(dh):
    return np.abs((dh + np.pi) % (2 * np.pi) - np.pi)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    model_yaml = (sys.argv[2] if len(sys.argv) > 2
                  else 'configs/kitti_models/GLENet_S.yaml')
    cfg = cfg_from_yaml_file(str(ROOT / model_yaml))
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [0, -8., -3., 24., 8., 1.]
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 3000, 'test': 3000}
    pp = cfg.MODEL.POST_PROCESSING
    pp.SCORE_THRESH = 0.0
    if 'POST_SCORE_THRESH' in pp:
        pp.POST_SCORE_THRESH = 0.0
    pp.NMS_CONFIG.NMS_PRE_MAXSIZE = 1024
    pp.NMS_CONFIG.NMS_POST_MAXSIZE = 100
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

    net = det
    flat_anchors = jnp.asarray(net.anchor_set.flat_anchors)

    fwd_train = jax.jit(lambda v, b: det.net.apply(
        v, b['points'], b['points_mask'], train=True,
        mutable=['batch_stats'], rngs={'dropout': jax.random.PRNGKey(0)})[0])

    def heading_probe(v, mode='eval'):
        raw = (fwd_train(v, batch) if mode == 'train'
               else fwd_eval(v, batch))
        out = raw['dense_head']
        decoded = anchor_heads.decode_predictions(
            out, flat_anchors, net.box_coder,
            dir_offset=net.dir_offset,
            dir_limit_offset=net.dir_limit_offset,
            num_dir_bins=net.num_dir_bins)
        boxes = np.asarray(decoded['batch_box_preds'])
        scores = np.asarray(jax.nn.sigmoid(decoded['batch_cls_preds']))
        scores = scores.max(-1)
        pred = jax.device_get(predict(v, batch))

        # dir-bin accuracy at positive anchors (train-style assignment)
        from glenet_tpu.models import target_assigner
        targets = jax.vmap(
            lambda gb, gmask, gu: target_assigner.assign_targets(
                net.anchor_set, gb, gmask, gu, net.box_coder,
                match_height=net.match_height)
        )(batch['gt_boxes'], batch['gt_mask'], batch['gt_uncertainty'])
        anc = jnp.broadcast_to(flat_anchors[None],
                               (2, *flat_anchors.shape))
        dir_t = anchor_heads.get_direction_targets(
            anc, targets.box_reg_targets, net.dir_offset, net.num_dir_bins)
        flat = anchor_heads._flatten_preds(out)
        dir_pred = np.asarray(flat['dir_cls_preds'].argmax(-1))
        pos = np.asarray(targets.box_cls_labels > 0)
        dir_acc = (dir_pred == np.asarray(dir_t))[pos].mean()

        for s in range(2):
            gtb = np.asarray(gt[s][np.asarray(gm[s])])[:, :7]
            # pre-NMS: best-scoring box with IoU>0.5 per gt
            ious = np.asarray(iou3d.boxes_iou3d(
                jnp.asarray(gtb), jnp.asarray(boxes[s][:, :7])))
            pre_err = []
            for gi in range(len(gtb)):
                cand = np.where(ious[gi] > 0.5)[0]
                if len(cand) == 0:
                    pre_err.append(float('nan'))
                    continue
                best = cand[scores[s][cand].argmax()]
                pre_err.append(wrap(boxes[s][best, 6] - gtb[gi, 6]))
            # post-NMS final
            fb = np.asarray(pred['final_boxes'][s])
            fv = np.asarray(pred['final_valid'][s])
            ious_f = np.asarray(iou3d.boxes_iou3d(
                jnp.asarray(gtb), jnp.asarray(fb[:, :7])))
            ious_f = np.where(fv[None], ious_f, 0.0)
            post_err = []
            for gi in range(len(gtb)):
                best = ious_f[gi].argmax()
                post_err.append(wrap(fb[best, 6] - gtb[gi, 6])
                                if ious_f[gi, best] > 0.5 else float('nan'))
            print(f'   [{mode}] s{s} dir_acc={dir_acc:.3f} '
                  f'pre_err={np.round(pre_err, 2).tolist()} '
                  f'post_err={np.round(post_err, 2).tolist()}', flush=True)

    t0 = time.time()
    for i in range(n_steps):
        variables, opt, loss, mets = step(variables, opt, batch,
                                          jax.random.PRNGKey(i))
        if i % 100 == 0 or i == n_steps - 1:
            m = {k: round(float(x), 3) for k, x in mets.items()}
            print(f'step {i}: loss={float(loss):.3f} {m}', flush=True)
            heading_probe(variables)
            heading_probe(variables, mode='train')
    # final: eval-mode after exact BN stat re-estimation (the convergence
    # harness always refreshes; the raw running averages may lag badly)
    from glenet_tpu.train.bn_refresh import refresh_detector_stats
    variables = refresh_detector_stats(det, variables, [batch] * 8)
    print('after bn_refresh:', flush=True)
    heading_probe(variables)
    print('total', round(time.time() - t0, 1), 's')


if __name__ == '__main__':
    main()
