"""Root-cause validation for the PartA2_free harness score: re-evaluate
the SAVED 1500-step variables with the proposal stage's POST slots
unstarved (TEST NMS_POST_MAXSIZE 100 -> 512 = the TRAIN value; all other
config identical to the reference yaml).

Mechanism being tested (see PERF_NOTES / NEXT_ROUND round-5 notes): at
16-scene overfit the focal cls loss saturates ~650 points/scene above
sigmoid 0.998, score ceases to rank localization quality, and the
point-wise boxes are diverse (median IoU-to-gt ~0.3) — so greedy BEV NMS
at the reference's weak TEST threshold (0.85) fills all 100 POST slots
with higher-scoring objects' mutually-low-overlap boxes before ever
reaching the clusters of objects whose max score is 0.995-0.996.
Probe evidence (tools/scripts/dump_pa2free_proposals.py on the saved
variables): every gt has healthy stage-1 cls (max point score >= 0.995)
and healthy decode (best point-box IoU 0.77-0.93, >=100 boxes above 0.7
for the MISSED gts) — yet missed gts get best-roi IoU 0.000 post-NMS.

If AP recovers with POST=512 while nothing else changes, the 62.5 is a
proposal-slot-starvation artifact of overfit-scale score saturation, not
a pipeline defect.  Runs on CPU (the chip stays on the queue);
forward-only, ~15 min.

Usage: python tools/scripts/pa2free_eval_only.py [nms_post]
"""
import sys
import time
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
from glenet_tpu.eval import kitti_eval
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.utils.calibration_kitti import Calibration


def main():
    nms_post = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cfg = cfg_from_yaml_file(
        str(ROOT / 'configs/kitti_models/PartA2_free.yaml'))
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == 'transform_points_to_voxels':
            mv = proc.MAX_NUMBER_OF_VOXELS
            if isinstance(mv, dict):
                mv['test'] = 16000
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    cfg.MODEL.ROI_HEAD.NMS_CONFIG.TEST.NMS_POST_MAXSIZE = nms_post
    det = build_detector(cfg)

    scenes = [ca.make_scene(s) for s in range(ca.N_SCENES)]
    batches = ca.make_batches(scenes, ca.BATCH, ca.MAX_POINTS, ca.N_GT)
    tmpl = det.init(jax.random.PRNGKey(0), batches[0])
    variables = serialization.from_bytes(
        tmpl, Path('/tmp/conv_PartA2_free/variables.msgpack').read_bytes())
    print('variables loaded', flush=True)

    predict = jax.jit(lambda v, b: det.predict(v, b))
    calib = Calibration(ca.CALIB)
    gt_annos, dt_annos = [], []
    t0 = time.time()
    for bi, b in enumerate(batches):
        preds = predict(variables, b)
        fb = np.asarray(preds['final_boxes'])
        fs = np.asarray(preds['final_scores'])
        fv = np.asarray(preds['final_valid'])
        print(f'batch {bi}: kept={fv.sum(1)} ({time.time() - t0:.0f}s)',
              flush=True)
        for k in range(fb.shape[0]):
            scene_idx = bi * ca.BATCH + k
            gt, gm = scenes[scene_idx][1], scenes[scene_idx][2]
            gt_annos.append(ca.to_annos(gt[gm][:, :7], None, calib))
            dt_annos.append(ca.to_annos(fb[k][fv[k]], fs[k][fv[k]], calib))
    result_str, ret = kitti_eval.get_official_eval_result(
        gt_annos, dt_annos, ['Car'])
    print(result_str)
    print(f'RESULT nms_post={nms_post} '
          f'Car_3d_moderate_R40={ret.get("Car_3d/moderate_R40")}')


if __name__ == '__main__':
    main()
