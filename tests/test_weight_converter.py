"""Torch->JAX weight converter: output equivalence against the reference's
own torch modules (BaseBEVBackbone, AnchorHeadSingle convs, PillarVFE PFN
layer) loaded on CPU with native deps stubbed, plus spconv layout rules."""
import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glenet_tpu.utils import weight_converter as wc

torch = pytest.importorskip('torch')

from reference_loader import load_reference_utils

REF = '/root/reference'


def load_reference_model_modules():
    """Extend the utils loader with the pure-torch model modules."""
    mods = load_reference_utils()
    if mods is None:
        return None

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # package scaffolding for relative imports
    for pkg, path in [
            ('pcdet.models', f'{REF}/pcdet/models'),
            ('pcdet.models.backbones_2d', f'{REF}/pcdet/models/backbones_2d'),
            ('pcdet.models.backbones_3d', f'{REF}/pcdet/models/backbones_3d'),
            ('pcdet.models.backbones_3d.vfe',
             f'{REF}/pcdet/models/backbones_3d/vfe'),
            ('pcdet.models.dense_heads', f'{REF}/pcdet/models/dense_heads'),
            ('pcdet.models.dense_heads.target_assigner',
             f'{REF}/pcdet/models/dense_heads/target_assigner')]:
        m = types.ModuleType(pkg)
        m.__path__ = [path]
        sys.modules.setdefault(pkg, m)
    # stub the CUDA-backed iou3d utils the target assigners import
    for name in ('pcdet.ops.iou3d_nms', 'pcdet.ops.iou3d_nms.iou3d_nms_utils',
                 'pcdet.ops.iou3d', 'pcdet.ops.iou3d.iou3d_utils'):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules['pcdet.ops.iou3d_nms'].iou3d_nms_utils = \
        sys.modules['pcdet.ops.iou3d_nms.iou3d_nms_utils']

    mods['base_bev_backbone'] = load(
        'pcdet.models.backbones_2d.base_bev_backbone',
        f'{REF}/pcdet/models/backbones_2d/base_bev_backbone.py')
    mods['pillar_vfe'] = load(
        'pcdet.models.backbones_3d.vfe.pillar_vfe',
        f'{REF}/pcdet/models/backbones_3d/vfe/pillar_vfe.py')
    return mods


class EasyDict(dict):
    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return EasyDict(v) if isinstance(v, dict) else v

    def get(self, k, default=None):
        v = super().get(k, default)
        return EasyDict(v) if isinstance(v, dict) else v


@pytest.fixture(scope='module')
def ref():
    mods = load_reference_model_modules()
    if mods is None:
        pytest.skip('reference tree unavailable')
    return mods


def test_bev_backbone_transplant(ref, rng):
    """Reference BaseBEVBackbone weights -> our module: identical outputs."""
    from glenet_tpu.models.bev_backbone import BaseBEVBackbone
    layer_nums, strides = [2, 2], [1, 2]
    filters, up_strides, up_filters = [16, 32], [1, 2], [16, 16]
    cfg = EasyDict({'LAYER_NUMS': layer_nums, 'LAYER_STRIDES': strides,
                    'NUM_FILTERS': filters, 'UPSAMPLE_STRIDES': up_strides,
                    'NUM_UPSAMPLE_FILTERS': up_filters})
    tm = ref['base_bev_backbone'].BaseBEVBackbone(cfg, input_channels=8)
    tm.eval()
    # randomize BN stats so the transplant is non-trivial
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith('running_mean'):
            sd[k] = torch.randn_like(v) * 0.1
        if k.endswith('running_var'):
            sd[k] = torch.rand_like(v) + 0.5
    tm.load_state_dict(sd)

    x = rng.randn(2, 16, 24, 8).astype(np.float32)
    with torch.no_grad():
        want = tm({'spatial_features':
                   torch.from_numpy(x).permute(0, 3, 1, 2)})
        want = want['spatial_features_2d'].permute(0, 2, 3, 1).numpy()

    ours = BaseBEVBackbone(layer_nums=layer_nums, layer_strides=strides,
                           num_filters=filters, upsample_strides=up_strides,
                           num_upsample_filters=up_filters)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    p, s = wc.convert_base_bev_backbone(tm.state_dict(), layer_nums)
    new_vars = {'params': p, 'batch_stats': s}
    # shape check against the initialized tree
    jax.tree.map(lambda a, b: None if a.shape == b.shape else
                 (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
                 variables['params'], jax.tree.map(jnp.asarray, p))
    got = np.asarray(ours.apply(
        jax.tree.map(jnp.asarray, new_vars), jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pfn_layer_transplant(ref, rng):
    """PillarVFE PFNLayer (Linear + BN1d + ReLU + maxpool)."""
    from glenet_tpu.models.vfe import PFNLayer
    tm = ref['pillar_vfe'].PFNLayer(9, 16, use_norm=True, last_layer=True)
    tm.eval()
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith('running_mean'):
            sd[k] = torch.randn_like(v) * 0.1
        if k.endswith('running_var'):
            sd[k] = torch.rand_like(v) + 0.5
    tm.load_state_dict(sd)

    x = rng.randn(50, 20, 9).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()       # (50, 1, 16) maxpooled

    ours = PFNLayer(features=16, use_norm=True, last_layer=True)
    mask = jnp.ones((50, 20), bool)
    p, s = wc.convert_pfn_layer(tm.state_dict())
    got = np.asarray(ours.apply(
        {'params': jax.tree.map(jnp.asarray, p),
         'batch_stats': jax.tree.map(jnp.asarray, s)},
        jnp.asarray(x), mask, train=False))
    np.testing.assert_allclose(got.squeeze(), want.squeeze(),
                               rtol=1e-4, atol=1e-4)


def test_conv_transpose_rule(rng):
    """flax ConvTranspose(kernel=t2f_conv_transpose(w)) == torch
    ConvTranspose2d(w) for the stride==kernel deconvs the BEV backbone
    uses."""
    import flax.linen as nn
    w = rng.randn(6, 4, 2, 2).astype(np.float32)     # torch (I, O, kH, kW)
    x = rng.randn(1, 5, 7, 6).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(6, 4, 2, stride=2, bias=False)
    tconv.weight.data = torch.from_numpy(w)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
            .permute(0, 2, 3, 1).numpy()
    conv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding='SAME',
                            use_bias=False)
    got = np.asarray(conv.apply(
        {'params': {'kernel': jnp.asarray(wc.t2f_conv_transpose(w))}},
        jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spconv_layout_roundtrip(rng):
    """spconv 1.x and 2.x layouts both land in our (K, I, O) row-major
    order with matching tap contents."""
    ci, co = 4, 8
    w1 = rng.randn(3, 3, 3, ci, co).astype(np.float32)       # spconv 1.x
    ours1 = wc.t2f_spconv(w1)
    assert ours1.shape == (27, ci, co)
    np.testing.assert_array_equal(ours1[0], w1[0, 0, 0])
    np.testing.assert_array_equal(ours1[26], w1[2, 2, 2])
    np.testing.assert_array_equal(ours1[9 + 3 + 1], w1[1, 1, 1])

    w2 = np.transpose(w1, (4, 0, 1, 2, 3))                   # spconv 2.x
    ours2 = wc.t2f_spconv(w2)
    np.testing.assert_allclose(ours1, ours2)
