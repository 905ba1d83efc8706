"""tools/convert_weights.py CLI: reference-format .pth -> our msgpack
checkpoint, restorable through the exact template path tools/test.py uses
(reference checkpoint layout per train_utils.py:160-194)."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.slow


def synth_pointpillar_state_dict(rng):
    sd = {}
    t = torch.from_numpy

    def bn(name, c):
        sd[f'{name}.weight'] = t(rng.rand(c).astype(np.float32) + 0.5)
        sd[f'{name}.bias'] = t((rng.randn(c) * 0.1).astype(np.float32))
        sd[f'{name}.running_mean'] = t(
            (rng.randn(c) * 0.1).astype(np.float32))
        sd[f'{name}.running_var'] = t(rng.rand(c).astype(np.float32) + 0.5)
        sd[f'{name}.num_batches_tracked'] = torch.tensor(100)

    def conv2d(name, o, i, k=3):
        sd[f'{name}.weight'] = t(
            (rng.randn(o, i, k, k) * 0.05).astype(np.float32))

    sd['vfe.pfn_layers.0.linear.weight'] = t(
        (rng.randn(64, 10) * 0.05).astype(np.float32))
    bn('vfe.pfn_layers.0.norm', 64)
    chans = [(64, 64), (64, 128), (128, 256)]
    for b, ((ci, co), n) in enumerate(zip(chans, [3, 5, 5])):
        conv2d(f'backbone_2d.blocks.{b}.1', co, ci)
        bn(f'backbone_2d.blocks.{b}.2', co)
        for j in range(n):
            conv2d(f'backbone_2d.blocks.{b}.{4 + 3 * j}', co, co)
            bn(f'backbone_2d.blocks.{b}.{5 + 3 * j}', co)
    for b, (ci, k) in enumerate([(64, 1), (128, 2), (256, 4)]):
        sd[f'backbone_2d.deblocks.{b}.0.weight'] = t(
            (rng.randn(ci, 128, k, k) * 0.05).astype(np.float32))
        bn(f'backbone_2d.deblocks.{b}.1', 128)
    for name, o in (('conv_cls', 18), ('conv_box', 42),
                    ('conv_dir_cls', 12)):
        sd[f'dense_head.{name}.weight'] = t(
            (rng.randn(o, 384, 1, 1) * 0.05).astype(np.float32))
        sd[f'dense_head.{name}.bias'] = t(
            (rng.randn(o) * 0.1).astype(np.float32))
    return sd


def test_convert_cli_pointpillar(tmp_path, rng):
    sd = synth_pointpillar_state_dict(rng)
    pth = tmp_path / 'ref.pth'
    torch.save({'model_state': sd, 'epoch': 80, 'version': '0.5.2'}, pth)

    r = subprocess.run(
        [sys.executable, 'tools/convert_weights.py',
         '--cfg_file', 'configs/kitti_models/pointpillar.yaml',
         '--torch_ckpt', str(pth), '--output_dir', str(tmp_path / 'out')],
        capture_output=True, text=True, timeout=500, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    assert 'all reference tensors consumed' in r.stdout, r.stdout
    out = tmp_path / 'out' / 'checkpoint_epoch_80.msgpack'
    assert out.exists()

    # restore through the same template path tools/test.py uses
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.train import checkpoint as ckpt_lib
    from glenet_tpu.train import optim as optim_lib
    from glenet_tpu.train import state as state_lib

    cfg = cfg_from_yaml_file(
        str(REPO / 'configs/kitti_models/pointpillar.yaml'))
    det = build_detector(cfg)
    batch = {'points': jnp.zeros((1, 128, 4)),
             'points_mask': jnp.ones((1, 128), bool),
             'gt_boxes': jnp.zeros((1, 4, 8)),
             'gt_mask': jnp.zeros((1, 4), bool)}
    tx, _ = optim_lib.build_optimizer(cfg.OPTIMIZATION, total_steps=1)
    ts = state_lib.create_train_state(det, jax.random.PRNGKey(0), batch, tx)
    ck = ckpt_lib.load_checkpoint(str(out))
    assert ck['epoch'] == 80
    state = ckpt_lib.restore_train_state(ts, ck)
    n_diff = sum(
        int(bool(jnp.abs(a - b).max() > 0)) for a, b in zip(
            jax.tree.leaves(ts.params), jax.tree.leaves(state.params)))
    assert n_diff == len(jax.tree.leaves(ts.params)), n_diff

    # the reference linear weight must land transposed in the PFN Dense
    got = np.asarray(state.params['vfe']['PFNLayer_0']['Dense_0']['kernel'])
    want = sd['vfe.pfn_layers.0.linear.weight'].numpy().T
    np.testing.assert_allclose(got, want)
