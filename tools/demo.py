"""Demo CLI: run a trained detector over a folder of .bin point clouds and
print / dump detections (reference tools/demo.py:23-112 minus the mayavi
visualization — output is a per-frame JSON instead; plug any viewer).
"""
import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--data_path', type=str, required=True,
                        help='folder of KITTI-format .bin files (or one file)')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--output', type=str, default=None,
                        help='write detections as JSON lines here')
    parser.add_argument('--html_dir', type=str, default=None,
                        help='export interactive 3D HTML scenes here')
    parser.add_argument('--ply_dir', type=str, default=None,
                        help='export PLY point clouds + box wireframes here')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from glenet_tpu.config import cfg, cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.train import checkpoint as ckpt_lib
    from glenet_tpu.train import optim as optim_lib
    from glenet_tpu.train import state as state_lib
    from glenet_tpu.utils.common import create_logger

    cfg_from_yaml_file(args.cfg_file, cfg)
    logger = create_logger()
    det = build_detector(cfg)

    data_path = Path(args.data_path)
    files = sorted(glob.glob(str(data_path / f'*{args.ext}'))) \
        if data_path.is_dir() else [str(data_path)]
    assert files, f'no {args.ext} files under {args.data_path}'

    max_pts = int(cfg.DATA_CONFIG.get('MAX_POINTS_PER_SCENE', 65536))

    def load(f):
        pts = np.fromfile(f, dtype=np.float32).reshape(-1, 4)
        n = min(len(pts), max_pts)
        out = np.zeros((1, max_pts, 4), np.float32)
        out[0, :n] = pts[:n]
        mask = np.zeros((1, max_pts), bool)
        mask[0, :n] = True
        return {'points': jnp.asarray(out), 'points_mask': jnp.asarray(mask)}

    batch = load(files[0])
    init_batch = batch | {
        'gt_boxes': jnp.zeros((1, 1, 8)), 'gt_mask': jnp.zeros((1, 1), bool),
        'gt_uncertainty': jnp.ones((1, 1, 7))}
    variables = det.init(jax.random.PRNGKey(0), init_batch)
    if args.ckpt:
        tx, _ = optim_lib.build_optimizer(cfg.OPTIMIZATION, 1)
        ts = state_lib.create_train_state(det, jax.random.PRNGKey(0),
                                          init_batch, tx)
        ck = ckpt_lib.load_checkpoint(args.ckpt)
        ts = ckpt_lib.restore_train_state(ts, ck)
        variables = {'params': ts.params, 'batch_stats': ts.batch_stats}
        logger.info(f'loaded {args.ckpt}')

    predict = jax.jit(lambda v, b: det.predict(v, b))
    sink = open(args.output, 'w') if args.output else None
    for f in files:
        fbatch = load(f)
        preds = jax.device_get(predict(variables, fbatch))
        v = preds['final_valid'][0]
        record = {
            'frame': Path(f).stem,
            'boxes_lidar': preds['final_boxes'][0][v].tolist(),
            'scores': preds['final_scores'][0][v].tolist(),
            'labels': [cfg.CLASS_NAMES[int(l) - 1]
                       for l in preds['final_labels'][0][v]],
        }
        line = json.dumps(record)
        logger.info(f"{record['frame']}: {int(v.sum())} detections")
        if sink:
            print(line, file=sink)
        if args.html_dir or args.ply_dir:
            from visual_utils import scene_vis
            # export exactly what the model saw (capped + padded batch)
            raw = np.asarray(fbatch['points'][0])[
                np.asarray(fbatch['points_mask'][0])]
            boxes = np.asarray(record['boxes_lidar'], np.float32).reshape(-1, 7)
            scores = np.asarray(record['scores'], np.float32)
            labels = preds['final_labels'][0][v]
            if args.html_dir:
                Path(args.html_dir).mkdir(parents=True, exist_ok=True)
                scene_vis.export_scene_html(
                    raw, Path(args.html_dir) / f"{record['frame']}.html",
                    ref_boxes=boxes, ref_scores=scores, ref_labels=labels,
                    class_names=list(cfg.CLASS_NAMES))
            if args.ply_dir:
                Path(args.ply_dir).mkdir(parents=True, exist_ok=True)
                scene_vis.export_ply(
                    raw, Path(args.ply_dir) / f"{record['frame']}.ply",
                    ref_boxes=boxes)
    if sink:
        sink.close()


if __name__ == '__main__':
    main()
