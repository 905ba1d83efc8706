"""Convert a reference (pcdet/GLENet) torch checkpoint into a glenet_tpu
checkpoint consumable by tools/test.py / tools/train.py --ckpt.

Covers the layout rules the reference applies at load time
(detector3d_template.py:366-395, spconv 1.x/2.x transposition) plus the
torch->flax axis conventions proven in tests/test_weight_converter.py.

Usage:
    python tools/convert_weights.py \
        --cfg_file configs/kitti_models/GLENet_S.yaml \
        --torch_ckpt /path/to/checkpoint_epoch_80.pth \
        --output_dir output/GLENet_S/converted

Writes checkpoint_epoch_<N>.msgpack (our format: params + batch_stats +
fresh opt_state) and prints a conversion report.  Supported families:
PointPillars and SECOND/GLENet-S/GLENet-C-single-stage (MeanVFE +
VoxelBackBone8x); heads with TPU-redesigned parameterizations (the
corner-aggregation roi stack) have no reference counterpart and keep
their initialization.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser()
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--torch_ckpt', type=str, required=True)
    parser.add_argument('--output_dir', type=str, required=True)
    parser.add_argument('--epoch', type=int, default=None,
                        help='epoch tag for the output file '
                             '(default: from the torch checkpoint, else 0)')
    parser.add_argument('--set', dest='set_cfgs', nargs=argparse.REMAINDER,
                        default=None)
    args = parser.parse_args()
    from glenet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def load_torch_state_dict(path):
    """Read a torch .pth; accept the reference checkpoint layout
    ({'model_state': ..., 'epoch': ...}, train_utils.py:160-194) or a bare
    state_dict.  Returns (state_dict-of-numpy, epoch)."""
    import torch
    blob = torch.load(path, map_location='cpu', weights_only=False)
    epoch = None
    if isinstance(blob, dict) and 'model_state' in blob:
        epoch = blob.get('epoch')
        blob = blob['model_state']
    sd = {}
    for k, v in blob.items():
        sd[k] = v.detach().cpu().numpy() if hasattr(v, 'detach') \
            else np.asarray(v)
    return sd, epoch


def dummy_batch(cfg, batch_size=1, n_points=512):
    import jax.numpy as jnp
    n_feat = len(cfg.DATA_CONFIG.POINT_FEATURE_ENCODING.used_feature_list)
    n_cls = len(cfg.CLASS_NAMES)
    return {'points': jnp.zeros((batch_size, n_points, n_feat)),
            'points_mask': jnp.ones((batch_size, n_points), bool),
            'gt_boxes': jnp.zeros((batch_size, 4, 7 + 1)),
            'gt_mask': jnp.zeros((batch_size, 4), bool),
            'gt_uncertainty': jnp.ones((batch_size, 4, 7)),
            'gt_classes': jnp.zeros((batch_size, 4), jnp.int32),
            'n_classes': n_cls}


def main():
    args, cfg = parse_config()
    # conversion is host-side work; never touch the TPU (the axon plugin
    # ignores JAX_PLATFORMS, so force CPU via the config API)
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.train import checkpoint as ckpt_lib
    from glenet_tpu.train import optim as optim_lib
    from glenet_tpu.train import state as state_lib
    from glenet_tpu.utils import weight_converter as wc

    sd, ckpt_epoch = load_torch_state_dict(args.torch_ckpt)
    epoch = args.epoch if args.epoch is not None else (ckpt_epoch or 0)
    print(f'loaded {len(sd)} reference tensors from {args.torch_ckpt}')

    detector = build_detector(cfg)
    batch = dummy_batch(cfg)
    batch.pop('n_classes')
    tx, _ = optim_lib.build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    ts = state_lib.create_train_state(
        detector, jax.random.PRNGKey(0), batch, tx)
    variables = {'params': ts.params, 'batch_stats': ts.batch_stats}

    merged, report = wc.convert_full_model(cfg, sd, variables)
    print('converted subtrees:', ', '.join(report['converted']))
    leftovers = [k for k in report['unconsumed']
                 if not k.endswith(('.anchors', 'global_step'))]
    if leftovers:
        print(f'WARNING: {len(leftovers)} reference tensors had no '
              f'destination (TPU-redesigned or absent modules keep their '
              f'initialization):')
        for k in leftovers[:40]:
            print('  -', k)
        if len(leftovers) > 40:
            print(f'  ... and {len(leftovers) - 40} more')
    else:
        print('all reference tensors consumed')

    # shape-check converted leaves against the initialized tree, then save
    init_flat = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]:
        assert path in init_flat, f'converted leaf not in model: {path}'
        assert np.shape(leaf) == init_flat[path].shape, \
            (path, np.shape(leaf), init_flat[path].shape)

    import jax.numpy as jnp
    ts = ts.replace(params=jax.tree.map(jnp.asarray, merged['params']),
                    batch_stats=jax.tree.map(
                        jnp.asarray, merged.get('batch_stats', {})))
    out = ckpt_lib.save_checkpoint(
        ckpt_lib.checkpoint_state(ts, epoch=epoch, it=0),
        args.output_dir, epoch=epoch)
    print(f'wrote {out}')


if __name__ == '__main__':
    main()
