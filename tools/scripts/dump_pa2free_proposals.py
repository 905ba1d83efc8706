"""Forward-dump for the PartA2_free recall gap: load the converged
convergence-harness variables, run net_eval on scenes 0..1, and print
stage-1 proposal coverage + rcnn scores per gt box, split by heading
sign.  Pinpoints whether missed (+heading) objects lack proposals or
get scored out by the rcnn head."""
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / 'tools'))

import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp

import convergence_ap as ca
from flax import serialization
from glenet_tpu.config import cfg_from_yaml_file
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.ops import iou3d


def main():
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/PartA2_free.yaml'))
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == 'transform_points_to_voxels':
            mv = proc.MAX_NUMBER_OF_VOXELS
            if isinstance(mv, dict):
                mv['test'] = 16000
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    det = build_detector(cfg)

    scenes = [ca.make_scene(s) for s in range(2)]
    batch = ca.make_batches(scenes, 2, ca.MAX_POINTS, ca.N_GT)[0]

    tmpl = det.init(jax.random.PRNGKey(0), batch)
    variables = serialization.from_bytes(
        tmpl, Path('/tmp/conv_PartA2_free/variables.msgpack').read_bytes())
    print('params loaded', flush=True)

    fwd = jax.jit(lambda v, b: det.net_eval.apply(
        v, b['points'], b['points_mask'], train=False))
    out = fwd(variables, batch)
    prop = jax.device_get(out['proposals'])
    rcnn = jax.device_get(out['rcnn'])
    part = jax.device_get(
        {k: out['part_head'][k] for k in
         ('point_cls_preds', 'point_coords', 'point_mask')})
    b, r = prop['rois'].shape[:2]
    rcnn_scores = jax.device_get(
        jax.nn.sigmoid(jnp.asarray(rcnn['rcnn_cls']))).reshape(b, r)

    for s in range(2):
        gt, gm = scenes[s][1], scenes[s][2]
        gtb = gt[gm][:, :7]
        rois = prop['rois'][s]
        rv = prop['roi_valid'][s]
        rs = prop['roi_scores'][s]
        ious = np.asarray(iou3d.boxes_iou3d(
            jnp.asarray(gtb), jnp.asarray(rois)))
        ious = np.where(rv[None, :], ious, 0.0)
        print(f'--- scene {s}: {len(gtb)} gt, {rv.sum()} valid rois')
        for gi in range(len(gtb)):
            bi = ious[gi].argmax()
            print(f'  gt{gi} h={gtb[gi, 6]:+.2f}: best-roi IoU='
                  f'{ious[gi, bi]:.3f} stage1_score={rs[bi]:.3f} '
                  f'rcnn_score={rcnn_scores[s, bi]:.3f}')
        # stage-1 point scores near each gt center
        coords = part['point_coords'][s]
        pm = part['point_mask'][s]
        cls = 1.0 / (1.0 + np.exp(-part['point_cls_preds'][s]))
        best = cls.max(-1) * pm
        for gi in range(len(gtb)):
            d = np.linalg.norm(coords[:, :2] - gtb[gi, :2], axis=1)
            near = (d < 2.0) & pm
            print(f'  gt{gi} h={gtb[gi, 6]:+.2f}: n_near={near.sum()} '
                  f'stage1 point score max={best[near].max() if near.any() else -1:.3f} '
                  f'mean={best[near].mean() if near.any() else -1:.3f}')


if __name__ == '__main__' and len(sys.argv) == 1:
    main()

def best_point_boxes():
    """Per-point decoded boxes: distribution of IoU-vs-gt over fg points."""
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/kitti_models/PartA2_free.yaml'))
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == 'transform_points_to_voxels':
            mv = proc.MAX_NUMBER_OF_VOXELS
            if isinstance(mv, dict):
                mv['test'] = 16000
    det = build_detector(cfg)
    scenes = [ca.make_scene(s) for s in range(2)]
    batch = ca.make_batches(scenes, 2, ca.MAX_POINTS, ca.N_GT)[0]
    tmpl = det.init(jax.random.PRNGKey(0), batch)
    variables = serialization.from_bytes(
        tmpl, Path('/tmp/conv_PartA2_free/variables.msgpack').read_bytes())
    fwd = jax.jit(lambda v, b: det.net_eval.apply(
        v, b['points'], b['points_mask'], train=False))
    out = fwd(variables, batch)
    part = out['part_head']
    coords = jax.device_get(part['point_coords'])
    pm = jax.device_get(part['point_mask'])
    enc = jnp.asarray(part['point_box_preds'])
    lab = jnp.argmax(jnp.asarray(part['point_cls_preds']), -1) + 1
    from glenet_tpu.utils import box_coder as bc_lib
    ph_cfg = cfg.MODEL.POINT_HEAD
    coder = bc_lib.build_box_coder(
        ph_cfg.TARGET_CONFIG.BOX_CODER,
        **dict(ph_cfg.TARGET_CONFIG.get('BOX_CODER_CONFIG', {})))
    boxes = jax.vmap(lambda e, x, l: coder.decode(e, x, l))(
        enc, jnp.asarray(coords), lab)
    boxes = jax.device_get(boxes)
    for s in range(2):
        gt, gm = scenes[s][1], scenes[s][2]
        gtb = gt[gm][:, :7]
        ious = np.asarray(iou3d.boxes_iou3d(
            jnp.asarray(gtb), jnp.asarray(boxes[s, :, :7])))
        ious = np.where(pm[s][None, :], ious, 0.0)
        print(f'--- scene {s}')
        for gi in range(len(gtb)):
            row = ious[gi]
            # points whose coords are inside the gt bev footprint
            d = np.linalg.norm(coords[s][:, :2] - gtb[gi, :2], axis=1)
            near = (d < 2.0) & pm[s]
            print(f'  gt{gi}: best point-box IoU={row.max():.3f} '
                  f'n>0.7={int((row > 0.7).sum())} n>0.5={int((row > 0.5).sum())} '
                  f'near-pt best={row[near].max() if near.any() else -1:.3f} '
                  f'near-pt median={np.median(row[near]) if near.any() else -1:.3f}')


if __name__ == '__main__' and len(sys.argv) > 1 and sys.argv[1] == 'best':
    best_point_boxes()
