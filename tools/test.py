"""Evaluation CLI — equivalent of reference tools/test.py (:56-200):
single-checkpoint eval or --eval_all watch-loop over a checkpoint directory
(30 s polling with an eval-record file), producing KITTI AP via the
framework evaluator and a result.pkl.
"""
import argparse
import pickle
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from glenet_tpu.utils import jax_cache

jax_cache.enable()


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--ckpt_dir', type=str, default=None)
    parser.add_argument('--eval_all', action='store_true')
    parser.add_argument('--max_waiting_mins', type=int, default=30)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--data_path', type=str, default=None)
    parser.add_argument('--output_dir', type=str, default=None)
    parser.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()
    from glenet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    if args.data_path is not None:
        cfg.DATA_CONFIG.DATA_PATH = args.data_path
    return args, cfg


def eval_one_epoch(cfg, detector, variables, dataset, logger, batch_size=4,
                   result_dir=None):
    """Batched predict -> prediction dicts -> KITTI AP (reference
    eval_utils.eval_one_epoch:22-121), with online recall telemetry
    (detector3d_template.py:303-317)."""
    from glenet_tpu.ops import iou3d as iou3d_ops
    recall_thresh = list(cfg.MODEL.POST_PROCESSING.get(
        'RECALL_THRESH_LIST', [0.3, 0.5, 0.7]))
    recall = {t: 0 for t in recall_thresh}
    total_gt = 0

    from glenet_tpu.parallel import distributed
    rank, world = distributed.get_dist_info()
    n_local = (len(dataset) + world - 1 - rank) // world if world > 1 \
        else len(dataset)

    predict = jax.jit(lambda v, b: detector.predict(v, b))
    det_annos = []
    t0 = time.time()
    n_frames = 0
    for batch in dataset.iter_batches(batch_size, shuffle=False,
                                      drop_last=False,
                                      process_rank=rank,
                                      process_count=world):
        arrays = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        preds = jax.device_get(predict(variables, arrays))
        # wrap-padded tail: only keep real frames
        n_real = min(batch_size, n_local - n_frames)
        annos = dataset.generate_prediction_dicts(batch, preds)
        det_annos.extend(annos[:n_real])

        # recall telemetry vs gt
        for b in range(n_real):
            gm = batch['gt_mask'][b]
            gt = batch['gt_boxes'][b][gm][:, :7]
            if len(gt) == 0:
                continue
            total_gt += len(gt)
            fv = preds['final_valid'][b]
            boxes = preds['final_boxes'][b][fv]
            if len(boxes) == 0:
                continue
            iou = np.asarray(iou3d_ops.boxes_iou3d(
                jnp.asarray(gt, jnp.float32),
                jnp.asarray(boxes, jnp.float32)))
            best = iou.max(axis=1)
            for t in recall_thresh:
                recall[t] += int((best > t).sum())

        n_frames += n_real
        if n_frames >= n_local:
            break
    if total_gt > 0:
        for t in recall_thresh:
            logger.info(f'recall@{t}: {recall[t] / total_gt:.4f} '
                        f'({recall[t]}/{total_gt})')
    sec_per_example = (time.time() - t0) / max(len(dataset), 1)
    logger.info(f'eval: {len(det_annos)} frames, '
                f'{sec_per_example:.4f} s/frame '
                f'({1.0 / max(sec_per_example, 1e-9):.1f} scans/s)')
    if world > 1:
        # multi-host result merge: allgather replaces the reference's
        # pickle-file + barrier merge (common_utils.py:202-223).  Frames
        # were strided (rank r holds r, r+world, ...) — reinterleave back
        # into dataset order.
        parts = distributed.all_gather_objects(det_annos)
        det_annos = [parts[i % world][i // world]
                     for i in range(len(dataset))]
    if result_dir is not None and rank == 0:
        result_dir.mkdir(parents=True, exist_ok=True)
        with open(result_dir / 'result.pkl', 'wb') as f:
            pickle.dump(det_annos, f)
    result_str, ret_dict = dataset.evaluation(det_annos, cfg.CLASS_NAMES)
    logger.info('\n' + result_str)
    if result_dir is not None and rank == 0:
        from glenet_tpu.utils.summary import ScalarWriter
        writer = ScalarWriter(Path(result_dir) / 'tensorboard')
        writer.add_scalars({f'eval/{k}': v for k, v in ret_dict.items()
                            if isinstance(v, (int, float))}, 0)
        writer.add_scalars({f'eval/recall_{t}': recall[t] / max(total_gt, 1)
                            for t in recall_thresh}, 0)
        writer.close()
    return ret_dict


def eval_checkpoint(cfg, detector, train_state, output_dir, logger,
                    batch_size=4):
    from glenet_tpu.datasets import build_dataset
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    variables = {'params': train_state.params,
                 'batch_stats': train_state.batch_stats}
    return eval_one_epoch(cfg, detector, variables, dataset, logger,
                          batch_size=batch_size,
                          result_dir=Path(output_dir) / 'eval')


def main():
    args, cfg = parse_config()
    from glenet_tpu.datasets import build_dataset
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.train import checkpoint as ckpt_lib
    from glenet_tpu.train import optim as optim_lib
    from glenet_tpu.train import state as state_lib
    from glenet_tpu.utils.common import create_logger

    output_dir = Path(args.output_dir or f'output/{cfg.TAG}/{args.extra_tag}')
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = create_logger(output_dir / 'test.log')
    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)

    detector = build_detector(cfg)
    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                            logger=logger)
    tx, _ = optim_lib.build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    example = next(dataset.iter_batches(batch_size, shuffle=False,
                                        drop_last=False))
    example = {k: jnp.asarray(v) for k, v in example.items()
               if isinstance(v, np.ndarray)}
    ts = state_lib.create_train_state(
        detector, jax.random.PRNGKey(0), example, tx)

    def run_one(ckpt_path):
        ck = ckpt_lib.load_checkpoint(ckpt_path)
        state = ckpt_lib.restore_train_state(ts, ck)
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        return eval_one_epoch(
            cfg, detector, variables, dataset, logger, batch_size,
            result_dir=output_dir / 'eval' / f"epoch_{ck['epoch']}")

    if not args.eval_all:
        ckpt = args.ckpt or ckpt_lib.find_latest_checkpoint(
            args.ckpt_dir or output_dir / 'ckpt')
        assert ckpt, 'no checkpoint found'
        run_one(ckpt)
        return

    # watch loop (reference repeat_eval_ckpt :86-132)
    ckpt_dir = Path(args.ckpt_dir or output_dir / 'ckpt')
    record = output_dir / 'eval' / 'eval_list_val.txt'
    record.parent.mkdir(parents=True, exist_ok=True)
    evaluated = set(record.read_text().split()) if record.exists() else set()
    wait_start = time.time()
    while True:
        import glob as globlib
        ckpts = sorted(globlib.glob(str(ckpt_dir / 'checkpoint_epoch_*.msgpack')))
        todo = [c for c in ckpts if c not in evaluated]
        if not todo:
            if time.time() - wait_start > args.max_waiting_mins * 60:
                break
            time.sleep(30)
            continue
        wait_start = time.time()
        for c in todo:
            run_one(c)
            evaluated.add(c)
            with open(record, 'a') as f:
                print(c, file=f)


if __name__ == '__main__':
    main()
