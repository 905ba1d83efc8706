"""Miss analysis for the GLENet_S 24-scene holdout score (val 3D mod
R40 84.1 vs bev 91.4, train 100.0 — CONVERGENCE_AP GLENet_S_holdout).

Re-forwards the UNSEEN holdout scenes (seeds 1000+, identical to
tools/convergence_ap.py) with the saved run variables and buckets every
gt by its best-detection IoU:
    miss      best 3D IoU < 0.1   (nothing detected there)
    poor-loc  0.1 <= IoU < 0.7    (detected but below the Car gate)
    hit       IoU >= 0.7
For poor-loc gts it decomposes the error (center xy / z, size, yaw) to
say WHERE the 0.7 gate is lost, and reports whether the best-IoU box is
outscored by false positives (a ranking problem rather than a
localization problem).  CPU-friendly (forward only).

Usage: python tools/scripts/s_holdout_miss_analysis.py [n_holdout]
"""
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tools'))

import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
from flax import serialization

from glenet_tpu.utils import jax_cache
jax_cache.enable()

import convergence_ap as ca
from glenet_tpu.config import cfg_from_yaml_file
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.ops import iou3d


def main():
    n_holdout = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/GLENet_S.yaml'))
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == 'transform_points_to_voxels':
            mv = proc.MAX_NUMBER_OF_VOXELS
            if isinstance(mv, dict):
                mv['test'] = 40000
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    det = build_detector(cfg)

    val_scenes = [ca.make_scene(1000 + s) for s in range(n_holdout)]
    batches = ca.make_batches(val_scenes, ca.BATCH, ca.MAX_POINTS, ca.N_GT)
    tmpl = det.init(jax.random.PRNGKey(0), batches[0])
    variables = serialization.from_bytes(
        tmpl, Path('/tmp/conv_GLENet_S/variables.msgpack').read_bytes())
    print('variables loaded', flush=True)

    predict = jax.jit(lambda v, b: det.predict(v, b))
    buckets = {'miss': 0, 'poor': 0, 'hit': 0}
    rows = []
    for bi, b in enumerate(batches):
        preds = predict(variables, b)
        fb = np.asarray(preds['final_boxes'])
        fs = np.asarray(preds['final_scores'])
        fv = np.asarray(preds['final_valid'])
        print(f'batch {bi}: kept={fv.sum(1)}', flush=True)
        for k in range(fb.shape[0]):
            si = bi * ca.BATCH + k
            gt, gm = val_scenes[si][1], val_scenes[si][2]
            gtb = gt[gm][:, :7]
            dtb, dts = fb[k][fv[k]], fs[k][fv[k]]
            if not len(dtb):
                buckets['miss'] += len(gtb)
                continue
            ious = np.asarray(iou3d.boxes_iou3d(
                jnp.asarray(gtb), jnp.asarray(dtb)))
            for gi in range(len(gtb)):
                bi_best = ious[gi].argmax()
                iou = ious[gi, bi_best]
                if iou < 0.1:
                    buckets['miss'] += 1
                    rows.append((si, gi, iou, 0.0, 'miss', None))
                elif iou < 0.7:
                    buckets['poor'] += 1
                    d = dtb[bi_best]
                    g = gtb[gi]
                    err = {
                        'dxy': float(np.linalg.norm(d[:2] - g[:2])),
                        'dz': float(d[2] - g[2]),
                        'dsize': [round(float(a - b2), 2)
                                  for a, b2 in zip(d[3:6], g[3:6])],
                        'dyaw': float((d[6] - g[6] + np.pi)
                                      % (2 * np.pi) - np.pi),
                        'rank_of_best': int(
                            (dts > dts[bi_best]).sum()),
                        'score': float(dts[bi_best]),
                    }
                    rows.append((si, gi, iou, dts[bi_best], 'poor', err))
                else:
                    buckets['hit'] += 1
    print('buckets:', buckets)
    for si, gi, iou, sc, kind, err in rows:
        print(f'scene {si} gt{gi}: {kind} IoU={iou:.3f} {err}')


if __name__ == '__main__':
    main()
