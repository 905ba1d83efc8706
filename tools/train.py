"""Detector training CLI — the equivalent of the reference tools/train.py
(:61-201): config + overrides, dataloader/model/optimizer build, auto-resume
from the newest checkpoint, epoch loop with per-iter telemetry, checkpoint
pruning, then evaluation of the final model.

TPU-native: one jit'd data-parallel train step over a device mesh (DDP/NCCL
replaced by batch sharding + XLA all-reduce, SURVEY.md §2.5).
"""
import argparse
import datetime
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
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--max_ckpt_save_num', type=int, default=30)
    parser.add_argument('--workers', type=int, default=0)
    parser.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                        default=None)
    parser.add_argument('--data_path', type=str, default=None)
    parser.add_argument('--output_dir', type=str, default=None)
    parser.add_argument('--eval_after_train', action='store_true')
    parser.add_argument('--bn_refresh', type=int, default=0,
                        help='re-estimate BN running stats over N batches '
                             'after training (exact SWA update_bn moments; '
                             'recommended for short runs)')
    parser.add_argument('--max_steps_per_epoch', type=int, default=None)
    parser.add_argument('--profile_steps', type=int, default=0,
                        help='capture an xprof trace of N train steps to '
                             '<output_dir>/profile')
    parser.add_argument('--coordinator_address', type=str, default=None,
                        help='multi-host: jax.distributed coordinator '
                             '(host:port); single-host when omitted')
    parser.add_argument('--num_processes', type=int, default=None)
    parser.add_argument('--process_id', type=int, default=None)
    args = parser.parse_args()

    from glenet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    if args.data_path is not None:
        cfg.DATA_CONFIG.DATA_PATH = args.data_path
    return args, cfg


def main():
    args, cfg = parse_config()
    from glenet_tpu.datasets import build_dataset
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.parallel import distributed
    from glenet_tpu.parallel import mesh as mesh_lib
    from glenet_tpu.train import checkpoint as ckpt_lib
    from glenet_tpu.train import optim as optim_lib
    from glenet_tpu.train import state as state_lib
    from glenet_tpu.utils.common import create_logger

    output_dir = Path(args.output_dir or
                      f'output/{cfg.TAG}/{args.extra_tag}')
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    distributed.initialize(args.coordinator_address, args.num_processes,
                           args.process_id)
    rank, world = distributed.get_dist_info()
    logger = create_logger(output_dir / f'train_rank{rank}.log'
                           if world > 1 else output_dir / 'train.log')

    batch_size = args.batch_size or int(cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU)
    num_epochs = args.epochs or int(cfg.OPTIMIZATION.NUM_EPOCHS)

    dataset = build_dataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=True,
                            logger=logger, seed=0)
    # per-host pipeline: this process sees len(dataset)/world samples
    steps_per_epoch = max(len(dataset) // world // batch_size, 1)
    if args.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.max_steps_per_epoch)
    total_steps = steps_per_epoch * num_epochs

    detector = build_detector(cfg)
    tx, lr_sched = optim_lib.build_optimizer(cfg.OPTIMIZATION, total_steps)

    all_devices = jax.devices()
    if world > 1:
        # multi-process: every process's devices must participate; the
        # global batch (world x per-host batch) shards over all of them
        n_dev = len(all_devices)
        assert (batch_size * world) % n_dev == 0, (
            f'global batch {batch_size * world} not divisible by '
            f'{n_dev} devices')
    else:
        # single process: use the largest device count dividing the batch
        n_dev = len(all_devices)
        while batch_size % n_dev != 0:
            n_dev -= 1
    mesh = mesh_lib.make_mesh(all_devices[:n_dev])
    logger.info(f'devices: {n_dev}, batch {batch_size}, '
                f'{steps_per_epoch} steps/epoch, {num_epochs} epochs')

    example = next(dataset.iter_batches(batch_size, seed=0,
                                        process_rank=rank,
                                        process_count=world))
    example = {k: jnp.asarray(v) for k, v in example.items()
               if isinstance(v, np.ndarray)}
    ts = state_lib.create_train_state(
        detector, jax.random.PRNGKey(0), example, tx)
    train_step = mesh_lib.jit_train_step(
        state_lib.make_train_step(detector, tx), mesh)

    start_epoch = 0
    latest = args.ckpt or ckpt_lib.find_latest_checkpoint(ckpt_dir)
    if latest:
        logger.info(f'resuming from {latest}')
        ck = ckpt_lib.load_checkpoint(latest)
        ts = ckpt_lib.restore_train_state(ts, ck)
        start_epoch = ck['epoch'] + 1

    from glenet_tpu.utils.summary import ScalarWriter
    writer = ScalarWriter(output_dir / 'tensorboard', enabled=(rank == 0))
    ts = mesh_lib.put_replicated(ts, mesh)
    it = int(ts.step)
    profiling = False
    for epoch in range(start_epoch, num_epochs):
        t_epoch = time.time()
        for step_i, batch in enumerate(
                dataset.iter_batches(batch_size, seed=epoch,
                                     process_rank=rank,
                                     process_count=world)):
            if step_i >= steps_per_epoch:
                break
            # xprof capture window (skip compile step 0)
            if args.profile_steps and it == 1 and not profiling:
                jax.profiler.start_trace(str(output_dir / 'profile'))
                profiling = True
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray)}
            sharded = mesh_lib.shard_batch(batch, mesh)
            ts, metrics = train_step(ts, sharded)
            it += 1
            if profiling and it > args.profile_steps:
                jax.block_until_ready(metrics['loss'])
                jax.profiler.stop_trace()
                profiling = False
                logger.info(f'xprof trace -> {output_dir}/profile')
            if step_i % 50 == 0:
                logger.info(
                    f'epoch {epoch} it {it} '
                    f'loss {float(metrics["loss"]):.4f} '
                    f'lr {float(lr_sched(it)):.6f} '
                    f'grad {float(metrics["grad_norm"]):.2f}')
                writer.add_scalars(
                    {f'train/{k}': v for k, v in metrics.items()}
                    | {'meta_data/learning_rate': float(lr_sched(it))}, it)
        logger.info(f'epoch {epoch} done in {time.time() - t_epoch:.1f}s')
        if rank != 0:
            continue  # rank 0 owns checkpoints (reference train_utils.py:145)
        ckpt_lib.save_checkpoint(
            ckpt_lib.checkpoint_state(jax.device_get(ts), epoch, it),
            ckpt_dir, epoch, args.max_ckpt_save_num)

    writer.close()
    if args.bn_refresh:
        from glenet_tpu.train.bn_refresh import refresh_detector_stats
        refresh_batches = []
        # every rank iterates the SAME unsharded stream: the refresh is
        # deterministic given identical batches, so all processes end up
        # with identical stats (eval_after_train runs on every rank)
        for batch in dataset.iter_batches(batch_size, seed=num_epochs,
                                          process_rank=0, process_count=1):
            if len(refresh_batches) >= args.bn_refresh:
                break
            refresh_batches.append(
                {k: jnp.asarray(v) for k, v in batch.items()
                 if isinstance(v, np.ndarray)})
        host_ts = jax.device_get(ts)
        variables = refresh_detector_stats(
            detector, {'params': host_ts.params,
                       'batch_stats': host_ts.batch_stats},
            refresh_batches)
        ts = ts.replace(batch_stats=variables['batch_stats'])
        if rank == 0:
            ckpt_lib.save_checkpoint(
                ckpt_lib.checkpoint_state(jax.device_get(ts), num_epochs - 1,
                                          it),
                ckpt_dir, num_epochs - 1, args.max_ckpt_save_num)
        logger.info(f'BN stats refreshed over {len(refresh_batches)} batches')
    if args.eval_after_train:
        from tools.test import eval_checkpoint
        eval_checkpoint(cfg, detector, ts, output_dir, logger,
                        batch_size=batch_size)


if __name__ == '__main__':
    main()
