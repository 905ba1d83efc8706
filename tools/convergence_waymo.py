"""Waymo-scale accuracy-convergence evidence: overfit CenterPoint (full
Waymo-range config) on synthetic vehicle scenes on the real TPU chip, then
score with the Waymo mAP/mAPH evaluator (glenet_tpu/eval/waymo_eval.py).

Covers the axes the KITTI harness (tools/convergence_ap.py) does not: the
150 m grid with Waymo-sized level budgets, CenterHead gaussian-heatmap
targets + sigmoid-topk decode, and the Waymo matching protocol.

Usage: python tools/convergence_waymo.py [n_steps] [peak_lr] [model_yaml]
Merges an entry into CONVERGENCE_AP.json (key = '<model>_waymo').
"""
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np

from convergence_ap import (car_surface_points, make_batches, merge_entry,
                            run_overfit)

N_SCENES = 16
BATCH = 2
MAX_POINTS = 24000
N_GT = 8


def make_scene(seed):
    """Waymo-frame scene: ground at z~0, vehicles within +-60 m."""
    rng = np.random.RandomState(seed)
    n_veh = rng.randint(3, N_GT)
    gt = np.zeros((N_GT, 8), np.float32)
    gt_mask = np.zeros(N_GT, bool)
    placed = []
    for g in range(n_veh):
        cx, cy = 30.0 + 8.0 * g, 30.0             # fallback row off the ego
        for _ in range(20):
            tx_, ty_ = rng.uniform(-55, 55), rng.uniform(-55, 55)
            if tx_ * tx_ + ty_ * ty_ < 64:        # keep off the ego
                continue
            if all((tx_ - px) ** 2 + (ty_ - py) ** 2 > 49
                   for px, py in placed):
                cx, cy = tx_, ty_
                break
        placed.append((cx, cy))
        dims = [rng.uniform(4.0, 5.2), rng.uniform(1.8, 2.2),
                rng.uniform(1.5, 1.9)]
        gt[g] = [placed[-1][0], placed[-1][1], dims[2] / 2,
                 *dims, rng.uniform(-np.pi, np.pi), 1]
        gt_mask[g] = True

    pts = [car_surface_points(rng, gt[g, :7], n=400) for g in range(n_veh)]
    n_ground = MAX_POINTS - sum(len(p) for p in pts)
    r = np.sqrt(rng.uniform(4, 70 ** 2, n_ground))
    th = rng.uniform(-np.pi, np.pi, n_ground)
    ground = np.stack([r * np.cos(th), r * np.sin(th),
                       rng.normal(0.0, 0.05, n_ground)], 1)
    xyz = np.concatenate(pts + [ground])[:MAX_POINTS]
    # waymo points: x y z intensity elongation
    extra = np.random.RandomState(seed + 1).uniform(0, 1, (len(xyz), 2))
    return np.concatenate([xyz, extra], 1).astype(np.float32), gt, gt_mask


def to_waymo_annos(boxes, scores=None, n_points=None):
    n = len(boxes)
    anno = {'name': np.array(['Vehicle'] * n),
            'boxes_lidar': np.asarray(boxes, np.float64)}
    if scores is not None:
        anno['score'] = np.asarray(scores)
    if n_points is not None:
        anno['num_points_in_gt'] = np.asarray(n_points)
    return anno


def main():
    import jax

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.eval import waymo_eval
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.utils import jax_cache

    jax_cache.enable()

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 700
    peak_lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    model_yaml = (sys.argv[3] if len(sys.argv) > 3
                  else 'configs/waymo_models/centerpoint.yaml')
    cfg = cfg_from_yaml_file(str(ROOT / model_yaml))
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    if 'POST_SCORE_THRESH' in cfg.MODEL.POST_PROCESSING:
        cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    det = build_detector(cfg)

    scenes = [make_scene(s) for s in range(N_SCENES)]
    batches = make_batches(scenes, BATCH, MAX_POINTS, N_GT)

    # per-level active-site telemetry (VERDICT r3 #7): exact spconv
    # dilation rule counts at the Waymo grid, uncapped, vs the level caps
    # actually in force — validates ops/sparse.level_caps scaling at 150 m
    if cfg.MODEL.get('BACKBONE_3D') is not None:
        import jax.numpy as jnp

        from glenet_tpu.ops import sparse as sparse_ops
        from glenet_tpu.ops import voxelize as vox_ops
        caps = sparse_ops.level_caps(det.max_voxels)
        grid = tuple(int(g) for g in det.grid_size)
        grid1 = (grid[0], grid[1], grid[2] + 1)
        counts = [[] for _ in range(4)]
        b0 = batches[0]
        for k in range(b0['points'].shape[0]):
            vox = vox_ops.voxelize(
                b0['points'][k], b0['points_mask'][k],
                voxel_size=tuple(det.voxel_size),
                pc_range=tuple(det.pc_range), grid_size=grid,
                max_voxels=det.max_voxels,
                max_points_per_voxel=det.max_points_per_voxel)
            ny, nx = grid1[1], grid1[0]
            ids = jnp.where(
                vox['voxel_mask'],
                vox['voxel_coords'][:, 0] * (ny * nx)
                + vox['voxel_coords'][:, 1] * nx + vox['voxel_coords'][:, 2],
                nx * ny * grid1[2]).astype(jnp.int32)
            mask = vox['voxel_mask']
            counts[0].append(int(mask.sum()))
            g = grid1
            for lvl in (1, 2, 3):
                pad = (0, 1, 1) if lvl == 3 else 1
                big = 8 * caps[lvl]
                ids, mask = sparse_ops.strided_output_sites(
                    ids, mask, g, 3, 2, pad, big)
                g = sparse_ops.out_grid_size(g, 3, 2, pad)
                counts[lvl].append(int(mask.sum()))
        for lvl in range(4):
            mx = max(counts[lvl])
            flag = ' OVERFLOW' if mx > caps[lvl] else ''
            print(f'level{lvl + 1} active sites max={mx} '
                  f'cap={caps[lvl]}{flag}', flush=True)

    # bn_frozen_tail (argv[4], default 150): after the exact BN stat
    # re-estimation run_overfit performs, fine-tune params with BN frozen
    # to those dataset moments so train and eval normalize identically.
    # Rationale: 16-scene overfit makes train-mode (batch-of-2 moments)
    # and eval-mode (dataset moments) normalize each scene differently,
    # which flips direction-bin argmaxes and tanks APH while IoU-based AP
    # stays high (probe: tools/scripts/mini_kl_heading.py, train-mode
    # dir_acc 1.000 vs eval-mode 0.854 on the same params).
    bn_frozen_tail = int(sys.argv[4]) if len(sys.argv) > 4 else 150
    params, mstate, final_loss, t0 = run_overfit(
        det, batches, n_steps, peak_lr, bn_frozen_tail=bn_frozen_tail)

    predict = jax.jit(lambda v, b: det.predict(v, b))

    def eval_scenes(eval_scenes_list, eval_batches, tag):
        gt_annos, dt_annos = [], []
        for bi, b in enumerate(eval_batches):
            preds = predict({'params': params, **mstate}, b)
            fb = np.asarray(preds['final_boxes'])
            fs = np.asarray(preds['final_scores'])
            fl = np.asarray(preds['final_labels'])
            fv = np.asarray(preds['final_valid'])
            if bi == 0:
                print(f'diag {tag} batch0: kept={fv.sum(1)}, '
                      f'score_max={fs.max(1).round(3)}')
            for k in range(fb.shape[0]):
                scene_idx = bi * BATCH + k
                gt, gm = (eval_scenes_list[scene_idx][1],
                          eval_scenes_list[scene_idx][2])
                keep = fv[k] & (fl[k] == 1)            # Vehicle dts
                gt_annos.append(to_waymo_annos(
                    gt[gm][:, :7], n_points=np.full(gm.sum(), 400)))
                dt_annos.append(to_waymo_annos(fb[k][keep], fs[k][keep]))
        result_str, ret = waymo_eval.waymo_evaluation(
            dt_annos, gt_annos, ['Vehicle'])
        print(result_str)
        return ret

    ret = eval_scenes(scenes, batches, 'train')
    model_key = Path(model_yaml).stem + '_waymo'
    out = {
        'model': f'{model_key} (full Waymo-range config, synthetic overfit)',
        'n_scenes': N_SCENES, 'n_steps': n_steps,
        'final_loss': final_loss,
        'Vehicle_L1_AP': ret.get('OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP'),
        'Vehicle_L1_APH': ret.get('OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH'),
        'Vehicle_L2_AP': ret.get('OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'),
        'wall_clock_s': round(time.time() - t0, 1),
    }

    # held-out generalization (argv[5], default 0): score n_holdout
    # UNSEEN scenes (fresh seeds) with the overfit params — mirrors
    # tools/convergence_ap.py's '<model>_holdout' track on the Waymo
    # protocol (VERDICT r4 item 5: add a Waymo model to the holdout set).
    n_holdout = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    if n_holdout > 0:
        hold_scenes = [make_scene(10_000 + s) for s in range(n_holdout)]
        hold_batches = make_batches(hold_scenes, BATCH, MAX_POINTS, N_GT)
        hret = eval_scenes(hold_scenes, hold_batches, 'holdout')
        out['n_holdout_scenes'] = n_holdout
        out['val_Vehicle_L1_AP'] = hret.get(
            'OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/AP')
        out['val_Vehicle_L1_APH'] = hret.get(
            'OBJECT_TYPE_TYPE_VEHICLE_LEVEL_1/APH')
    merge_entry(model_key, out)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
