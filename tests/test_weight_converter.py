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


def test_convert_second_family_full_model():
    """Full-model mapping (convert_second_family) lands every converted
    leaf on an existing GLENet-S variables leaf with a matching shape and
    consumes the entire (synthetic, reference-shaped) state_dict.  The
    reference's spconv modules cannot be instantiated here (no spconv
    wheel), so reference-side key names/shapes are transcribed from
    spconv_backbone.py:69-127 in spconv-2.x layout."""
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector

    rng = np.random.RandomState(0)
    sd = {}

    def spc(name, o, i, k=(3, 3, 3)):
        sd[f'{name}.weight'] = rng.randn(o, *k, i).astype(np.float32)

    def bn(name, c):
        sd[f'{name}.weight'] = rng.rand(c).astype(np.float32) + 0.5
        sd[f'{name}.bias'] = rng.randn(c).astype(np.float32)
        sd[f'{name}.running_mean'] = rng.randn(c).astype(np.float32)
        sd[f'{name}.running_var'] = rng.rand(c).astype(np.float32) + 0.5
        sd[f'{name}.num_batches_tracked'] = np.int64(100)

    # backbone_3d (VoxelBackBone8x, in=4)
    spc('backbone_3d.conv_input.0', 16, 4)
    bn('backbone_3d.conv_input.1', 16)
    spc('backbone_3d.conv1.0.0', 16, 16)
    bn('backbone_3d.conv1.0.1', 16)
    for lvl, (ci, co) in {2: (16, 32), 3: (32, 64), 4: (64, 64)}.items():
        spc(f'backbone_3d.conv{lvl}.0.0', co, ci)
        bn(f'backbone_3d.conv{lvl}.0.1', co)
        for blk in (1, 2):
            spc(f'backbone_3d.conv{lvl}.{blk}.0', co, co)
            bn(f'backbone_3d.conv{lvl}.{blk}.1', co)
    spc('backbone_3d.conv_out.0', 128, 64, k=(3, 1, 1))
    bn('backbone_3d.conv_out.1', 128)

    # backbone_2d (BaseBEVBackbone [5, 5], 256 -> 128/256, up 256+256)
    def conv2d(name, o, i, k=3):
        sd[f'{name}.weight'] = rng.randn(o, i, k, k).astype(np.float32)

    chans = [(256, 128), (128, 256)]
    for b, (ci, co) in enumerate(chans):
        conv2d(f'backbone_2d.blocks.{b}.1', co, ci)
        bn(f'backbone_2d.blocks.{b}.2', co)
        for j in range(5):
            conv2d(f'backbone_2d.blocks.{b}.{4 + 3 * j}', co, co)
            bn(f'backbone_2d.blocks.{b}.{5 + 3 * j}', co)
    # deblocks: ConvTranspose2d weight (I, O, kH, kW)
    sd['backbone_2d.deblocks.0.0.weight'] = rng.randn(
        128, 256, 1, 1).astype(np.float32)
    bn('backbone_2d.deblocks.0.1', 256)
    sd['backbone_2d.deblocks.1.0.weight'] = rng.randn(
        256, 256, 2, 2).astype(np.float32)
    bn('backbone_2d.deblocks.1.1', 256)

    # dense head (AnchorHeadKLLabel: cls/box/dir + box_std)
    for name, o in (('conv_cls', 2), ('conv_box', 14),
                    ('conv_dir_cls', 4), ('conv_box_std', 14)):
        sd[f'dense_head.{name}.weight'] = rng.randn(
            o, 512, 1, 1).astype(np.float32)
        sd[f'dense_head.{name}.bias'] = rng.randn(o).astype(np.float32)

    cfg = cfg_from_yaml_file('configs/kitti_models/GLENet_S.yaml')
    det = build_detector(cfg)
    b, n = 1, 128
    batch = {'points': jnp.zeros((b, n, 4)),
             'points_mask': jnp.ones((b, n), bool),
             'gt_boxes': jnp.zeros((b, 4, 8)),
             'gt_mask': jnp.zeros((b, 4), bool),
             'gt_uncertainty': jnp.ones((b, 4, 7))}
    tree = jax.eval_shape(lambda r: det.init(r, batch),
                          jax.random.PRNGKey(0))

    variables = {'params': {}, 'batch_stats': {}}
    merged, report = wc.convert_second_family(cfg, sd, variables)
    assert report['unconsumed'] == [], report['unconsumed']
    assert report['converted'] == ['backbone_3d', 'backbone_2d',
                                   'dense_head']

    def check(conv_tree, shape_tree, path=''):
        n_checked = 0
        for k, v in conv_tree.items():
            assert k in shape_tree, f'{path}{k} not in model tree'
            if isinstance(v, dict):
                n_checked += check(v, shape_tree[k], f'{path}{k}/')
            else:
                assert tuple(np.shape(v)) == tuple(shape_tree[k].shape), \
                    (f'{path}{k}', np.shape(v), shape_tree[k].shape)
                n_checked += 1
        return n_checked

    n_p = check(merged['params'], tree['params'])
    n_s = check(merged['batch_stats'], tree['batch_stats'])
    assert n_p > 80 and n_s > 50, (n_p, n_s)


def _randomize_bn(tm):
    sd = tm.state_dict()
    for k, v in sd.items():
        if k.endswith('running_mean'):
            sd[k] = torch.randn_like(v) * 0.1
        if k.endswith('running_var'):
            sd[k] = torch.rand_like(v) + 0.5
    tm.load_state_dict(sd)
    return tm


def _ssfa_cfg():
    # the reference SSFA stores but never uses these list fields
    return EasyDict({'LAYER_NUMS': [5], 'LAYER_STRIDES': [1],
                     'NUM_FILTERS': [128], 'UPSAMPLE_STRIDES': [1],
                     'NUM_UPSAMPLE_FILTERS': [128]})


def load_ssfa_module():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ref_ssfa', f'{REF}/pcdet/models/backbones_2d/ssfa.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ssfa_transplant(rng):
    """Reference SSFA weights -> our SSFA: identical outputs (validates
    the faithful rewrite incl. the k3s2p1op1 torch-deconv rule and the
    residual deconv fusion)."""
    import jax
    import jax.numpy as jnp

    from glenet_tpu.models.bev_backbone import SSFA
    mod = load_ssfa_module()
    tm = _randomize_bn(mod.SSFA(_ssfa_cfg(), input_channels=32))
    tm.eval()

    x = rng.randn(2, 12, 16, 32).astype(np.float32)
    with torch.no_grad():
        want = tm({'spatial_features':
                   torch.from_numpy(x).permute(0, 3, 1, 2)})
        want = want['spatial_features_2d'].permute(0, 2, 3, 1).numpy()

    from glenet_tpu.utils import weight_converter as wc2
    p, s = wc2.convert_ssfa(tm.state_dict(), prefix='')
    ours = SSFA()
    tree = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    jax.tree.map(lambda a, b: None if a.shape == np.shape(b) else
                 (_ for _ in ()).throw(AssertionError((a.shape,
                                                       np.shape(b)))),
                 tree['params'], p)
    got = np.asarray(ours.apply(
        {'params': jax.tree.map(jnp.asarray, p),
         'batch_stats': jax.tree.map(jnp.asarray, s)},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_separate_head_transplant(ref, rng):
    """Reference CenterHead SeparateHead branch -> our head-branch params
    via convert_center_head key rules: identical outputs."""
    import importlib.util
    import jax
    import jax.numpy as jnp

    spec = importlib.util.spec_from_file_location(
        'pcdet.models.dense_heads.center_head',
        f'{REF}/pcdet/models/dense_heads/center_head.py')
    mod = importlib.util.module_from_spec(spec)
    sys.modules['pcdet.models.dense_heads.center_head'] = mod
    spec.loader.exec_module(mod)

    head_dict = {'hm': {'out_channels': 3, 'num_conv': 2},
                 'center': {'out_channels': 2, 'num_conv': 2},
                 'center_z': {'out_channels': 1, 'num_conv': 2},
                 'dim': {'out_channels': 3, 'num_conv': 2},
                 'rot': {'out_channels': 2, 'num_conv': 2}}
    tm = _randomize_bn(mod.SeparateHead(
        16, EasyDict(head_dict), init_bias=-2.19, use_bias=True))
    tm.eval()

    # positive input: our CenterHead applies ReLU after the (identity)
    # shared conv, the bare reference SeparateHead does not
    x = rng.rand(2, 8, 10, 16).astype(np.float32) + 0.1
    with torch.no_grad():
        want = {k: v.permute(0, 2, 3, 1).numpy() for k, v in
                tm(torch.from_numpy(x).permute(0, 3, 1, 2)).items()}

    # fake a full CenterHead state_dict: identity shared conv + this head
    from glenet_tpu.models.center_head import CenterHead
    from glenet_tpu.utils import weight_converter as wc2
    sd = {}
    eye = np.zeros((16, 16, 3, 3), np.float32)
    eye[np.arange(16), np.arange(16), 1, 1] = 1.0
    sd['dense_head.shared_conv.0.weight'] = eye
    sd['dense_head.shared_conv.0.bias'] = np.zeros(16, np.float32)
    sd['dense_head.shared_conv.1.weight'] = np.ones(16, np.float32)
    sd['dense_head.shared_conv.1.bias'] = np.zeros(16, np.float32)
    sd['dense_head.shared_conv.1.running_mean'] = np.zeros(16, np.float32)
    sd['dense_head.shared_conv.1.running_var'] = \
        np.ones(16, np.float32) - 1e-3 * 0  # BN eps compensated below
    for k, v in tm.state_dict().items():
        sd[f'dense_head.heads_list.0.{k}'] = v.numpy()

    p, s = wc2.convert_center_head(sd)
    ours = CenterHead(num_class=3, shared_ch=16, use_bias_before_norm=True)
    got = ours.apply({'params': jax.tree.map(jnp.asarray, p),
                      'batch_stats': jax.tree.map(jnp.asarray, s)},
                     jnp.asarray(x), train=False)
    # shared conv is identity*BN(eps): outputs match the branch outputs up
    # to the 1e-3 BN-eps scale on the shared features
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), want[k],
                                   rtol=5e-3, atol=5e-3)


def _full_model_shape_check(cfg_path, sd, point_feats=4):
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.utils import weight_converter as wc2

    cfg = cfg_from_yaml_file(cfg_path)
    det = build_detector(cfg)
    b, n = 1, 128
    batch = {'points': jnp.zeros((b, n, point_feats)),
             'points_mask': jnp.ones((b, n), bool),
             'gt_boxes': jnp.zeros((b, 4, 8)),
             'gt_mask': jnp.zeros((b, 4), bool),
             'gt_uncertainty': jnp.ones((b, 4, 7))}
    tree = jax.eval_shape(lambda r: det.init(r, batch),
                          jax.random.PRNGKey(0))
    merged, report = wc2.convert_full_model(
        cfg, sd, {'params': {}, 'batch_stats': {}})

    def check(conv_tree, shape_tree, path=''):
        n_checked = 0
        for k, v in conv_tree.items():
            assert k in shape_tree, f'{path}{k} not in model tree'
            if isinstance(v, dict):
                n_checked += check(v, shape_tree[k], f'{path}{k}/')
            else:
                assert tuple(np.shape(v)) == tuple(shape_tree[k].shape), \
                    (f'{path}{k}', np.shape(v), shape_tree[k].shape)
                n_checked += 1
        return n_checked

    n_p = check(merged['params'], tree['params'])
    n_s = check(merged['batch_stats'], tree['batch_stats'])
    return report, n_p, n_s


def _bn_into(sd, name, c, rng):
    sd[f'{name}.weight'] = rng.rand(c).astype(np.float32) + 0.5
    sd[f'{name}.bias'] = rng.randn(c).astype(np.float32)
    sd[f'{name}.running_mean'] = rng.randn(c).astype(np.float32)
    sd[f'{name}.running_var'] = rng.rand(c).astype(np.float32) + 0.5
    sd[f'{name}.num_batches_tracked'] = np.int64(100)


def test_convert_glenet_c_full_model(rng):
    """GLENet-C (Ciassd backbone + SSFA + AnchorHeadKLLabelIoU): every
    converted leaf matches a model leaf shape; full state_dict consumed."""
    sd = {}

    def spc(name, o, i, k=(3, 3, 3)):
        sd[f'{name}.weight'] = rng.randn(o, *k, i).astype(np.float32)

    spc('backbone_3d.conv_input.0', 16, 4)
    _bn_into(sd, 'backbone_3d.conv_input.1', 16, rng)
    spc('backbone_3d.conv1.0.0', 16, 16)
    _bn_into(sd, 'backbone_3d.conv1.0.1', 16, rng)
    for lvl, (ci, co, n_subm) in {2: (16, 32, 2), 3: (32, 64, 3),
                                  4: (64, 64, 3)}.items():
        spc(f'backbone_3d.conv{lvl}.0.0', co, ci)
        _bn_into(sd, f'backbone_3d.conv{lvl}.0.1', co, rng)
        for blk in range(1, n_subm + 1):
            spc(f'backbone_3d.conv{lvl}.{blk}.0', co, co)
            _bn_into(sd, f'backbone_3d.conv{lvl}.{blk}.1', co, rng)
    spc('backbone_3d.conv_out.0', 64, 64, k=(3, 1, 1))
    _bn_into(sd, 'backbone_3d.conv_out.1', 64, rng)

    # SSFA (input 128 = 64ch x 2 z-slices)
    mod = load_ssfa_module()
    tm = mod.SSFA(_ssfa_cfg(), input_channels=128)
    for k, v in tm.state_dict().items():
        sd[f'backbone_2d.{k}'] = v.numpy()

    for name, o in (('conv_cls', 2), ('conv_box', 14),
                    ('conv_dir_cls', 4), ('conv_box_std', 14),
                    ('conv_iou', 2)):
        sd[f'dense_head.{name}.weight'] = rng.randn(
            o, 128, 1, 1).astype(np.float32)
        sd[f'dense_head.{name}.bias'] = rng.randn(o).astype(np.float32)

    report, n_p, n_s = _full_model_shape_check(
        'configs/kitti_models/GLENet_C.yaml', sd)
    assert report['unconsumed'] == [], report['unconsumed']
    assert report['converted'] == ['backbone_3d', 'backbone_2d',
                                   'dense_head']
    assert n_p > 90 and n_s > 50, (n_p, n_s)


def test_convert_centerpoint_full_model(rng):
    """CenterPoint-Waymo (VoxelResBackBone8x + BaseBEVBackbone +
    CenterHead): shape-correct conversion, full state_dict consumed."""
    sd = {}

    def spc(name, o, i, k=(3, 3, 3)):
        sd[f'{name}.weight'] = rng.randn(o, *k, i).astype(np.float32)

    def basic_block(name, c):
        spc(f'{name}.conv1', c, c)
        _bn_into(sd, f'{name}.bn1', c, rng)
        spc(f'{name}.conv2', c, c)
        _bn_into(sd, f'{name}.bn2', c, rng)

    spc('backbone_3d.conv_input.0', 16, 5)
    _bn_into(sd, 'backbone_3d.conv_input.1', 16, rng)
    basic_block('backbone_3d.conv1.0', 16)
    basic_block('backbone_3d.conv1.1', 16)
    for lvl, (ci, co) in {2: (16, 32), 3: (32, 64), 4: (64, 128)}.items():
        spc(f'backbone_3d.conv{lvl}.0.0', co, ci)
        _bn_into(sd, f'backbone_3d.conv{lvl}.0.1', co, rng)
        basic_block(f'backbone_3d.conv{lvl}.1', co)
        basic_block(f'backbone_3d.conv{lvl}.2', co)
    spc('backbone_3d.conv_out.0', 128, 128, k=(3, 1, 1))
    _bn_into(sd, 'backbone_3d.conv_out.1', 128, rng)

    # BaseBEVBackbone LAYER_NUMS [5,5], in 256, filters [128, 256]
    def conv2d(name, o, i, k=3):
        sd[f'{name}.weight'] = rng.randn(o, i, k, k).astype(np.float32)

    for bidx, (ci, co) in enumerate([(256, 128), (128, 256)]):
        conv2d(f'backbone_2d.blocks.{bidx}.1', co, ci)
        _bn_into(sd, f'backbone_2d.blocks.{bidx}.2', co, rng)
        for j in range(5):
            conv2d(f'backbone_2d.blocks.{bidx}.{4 + 3 * j}', co, co)
            _bn_into(sd, f'backbone_2d.blocks.{bidx}.{5 + 3 * j}', co, rng)
    sd['backbone_2d.deblocks.0.0.weight'] = rng.randn(
        128, 256, 1, 1).astype(np.float32)
    _bn_into(sd, 'backbone_2d.deblocks.0.1', 256, rng)
    sd['backbone_2d.deblocks.1.0.weight'] = rng.randn(
        256, 256, 2, 2).astype(np.float32)
    _bn_into(sd, 'backbone_2d.deblocks.1.1', 256, rng)

    # CenterHead: shared conv + 5 branches (USE_BIAS_BEFORE_NORM True)
    conv2d('dense_head.shared_conv.0', 64, 512)
    sd['dense_head.shared_conv.0.bias'] = rng.randn(64).astype(np.float32)
    _bn_into(sd, 'dense_head.shared_conv.1', 64, rng)
    for name, o in (('hm', 3), ('center', 2), ('center_z', 1),
                    ('dim', 3), ('rot', 2)):
        base = f'dense_head.heads_list.0.{name}'
        conv2d(f'{base}.0.0', 64, 64)
        sd[f'{base}.0.0.bias'] = rng.randn(64).astype(np.float32)
        _bn_into(sd, f'{base}.0.1', 64, rng)
        conv2d(f'{base}.1', o, 64)
        sd[f'{base}.1.bias'] = rng.randn(o).astype(np.float32)

    report, n_p, n_s = _full_model_shape_check(
        'configs/waymo_models/centerpoint.yaml', sd, point_feats=5)
    assert report['unconsumed'] == [], report['unconsumed']
    assert n_p > 100 and n_s > 60, (n_p, n_s)
