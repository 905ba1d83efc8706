"""Full dense-path output equivalence: the reference's own torch
PointPillars pipeline (PillarVFE -> PointPillarScatter -> BaseBEVBackbone
-> AnchorHeadSingle -> decode, pillar_vfe.py / pointpillar_scatter.py /
base_bev_backbone.py / anchor_head_single.py) vs our detector with the
SAME weights transplanted via convert_full_model, on identical voxels.

This closes the gap per-module transplant tests leave open: pillar
feature assembly order, scatter orientation, anchor flattening order, and
the head's channel->anchor reshape convention — the places a converted
real checkpoint would silently decode wrong boxes.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from glenet_tpu.utils import weight_converter as wc

from test_weight_converter import EasyDict, load_reference_model_modules

REF = '/root/reference'

pytestmark = pytest.mark.slow


def load_full_pipeline_modules():
    mods = load_reference_model_modules()
    if mods is None:
        return None

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = 'pcdet.models.backbones_2d.map_to_bev'
    m = types.ModuleType(pkg)
    m.__path__ = [f'{REF}/pcdet/models/backbones_2d/map_to_bev']
    sys.modules.setdefault(pkg, m)
    mods['pointpillar_scatter'] = load(
        f'{pkg}.pointpillar_scatter',
        f'{REF}/pcdet/models/backbones_2d/map_to_bev/pointpillar_scatter.py')
    mods['anchor_head_single'] = load(
        'pcdet.models.dense_heads.anchor_head_single',
        f'{REF}/pcdet/models/dense_heads/anchor_head_single.py')
    return mods


@pytest.fixture(scope='module')
def ref():
    mods = load_full_pipeline_modules()
    if mods is None:
        pytest.skip('reference tree unavailable')
    return mods


def randomize_bn_stats(module, rng):
    sd = module.state_dict()
    for k, v in sd.items():
        if k.endswith('running_mean'):
            sd[k] = torch.from_numpy(
                (rng.randn(*v.shape) * 0.1).astype(np.float32))
        if k.endswith('running_var'):
            sd[k] = torch.from_numpy(
                (rng.rand(*v.shape) + 0.5).astype(np.float32))
    module.load_state_dict(sd)


def test_pointpillar_full_pipeline_equivalence(ref, rng):
    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models import anchor_heads
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.ops import voxelize as vox_ops

    cfg = cfg_from_yaml_file('configs/kitti_models/pointpillar.yaml')
    det = build_detector(cfg)
    pcr = list(det.pc_range)
    grid = np.array(det.grid_size)         # (nx, ny, nz)

    # ---- reference torch pipeline, eval mode, randomized BN stats ----
    vfe_t = ref['pillar_vfe'].PillarVFE(
        model_cfg=EasyDict(dict(cfg.MODEL.VFE)), num_point_features=4,
        voxel_size=list(det.voxel_size), point_cloud_range=pcr)
    scatter_t = ref['pointpillar_scatter'].PointPillarScatter(
        model_cfg=EasyDict(dict(cfg.MODEL.MAP_TO_BEV)), grid_size=grid)
    bev_t = ref['base_bev_backbone'].BaseBEVBackbone(
        EasyDict(dict(cfg.MODEL.BACKBONE_2D)), input_channels=64)
    head_t = ref['anchor_head_single'].AnchorHeadSingle(
        EasyDict(dict(cfg.MODEL.DENSE_HEAD)), input_channels=384,
        num_class=len(cfg.CLASS_NAMES), class_names=list(cfg.CLASS_NAMES),
        grid_size=grid, point_cloud_range=np.asarray(pcr, np.float32),
        predict_boxes_when_training=False)
    for m in (vfe_t, scatter_t, bev_t, head_t):
        m.eval()
        randomize_bn_stats(m, rng)

    # anchor grids must agree exactly (flattening order included)
    ref_anchors = torch.cat(head_t.anchors, dim=-3).reshape(-1, 7).numpy()
    np.testing.assert_allclose(
        np.asarray(det.anchor_set.flat_anchors), ref_anchors,
        rtol=1e-5, atol=1e-4)

    # ---- transplant the torch weights into our model ----
    sd = {}
    for prefix, mod in (('vfe', vfe_t), ('backbone_2d', bev_t),
                        ('dense_head', head_t)):
        for k, v in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v.detach().numpy()

    b, n = 1, 1500
    pts = np.zeros((b, n, 4), np.float32)
    centers = rng.rand(12, 3) * [60, 30, 2] + [5, -15, -1.5]
    idx = rng.randint(0, 12, n)
    pts[0, :, :3] = (centers[idx] + rng.randn(n, 3) * [2, 2, 0.4]).astype(
        np.float32)
    pts[0, :, 3] = rng.rand(n)
    keep = ((pts[0, :, 0] > pcr[0] + 1) & (pts[0, :, 0] < pcr[3] - 1) &
            (pts[0, :, 1] > pcr[1] + 1) & (pts[0, :, 1] < pcr[4] - 1) &
            (pts[0, :, 2] > pcr[2] + 0.1) & (pts[0, :, 2] < pcr[5] - 0.1))
    pts[0, ~keep] = pts[0, keep][0]        # clamp strays onto a valid point

    batch = {'points': jnp.asarray(pts),
             'points_mask': jnp.ones((b, n), bool),
             'gt_boxes': jnp.zeros((b, 4, 8)),
             'gt_mask': jnp.zeros((b, 4), bool)}
    variables = det.init(jax.random.PRNGKey(0), batch)
    merged, report = wc.convert_full_model(cfg, sd, variables)
    assert report['unconsumed'] == [], report['unconsumed']
    merged = jax.tree.map(jnp.asarray, merged)

    # ---- identical voxels for the torch side (ours, valid slots only) ----
    vox = jax.tree.map(np.asarray, vox_ops.voxelize(
        jnp.asarray(pts[0]), jnp.ones((n,), bool),
        voxel_size=tuple(det.voxel_size), pc_range=tuple(pcr),
        grid_size=tuple(int(g) for g in grid),
        max_voxels=det.max_voxels_test,
        max_points_per_voxel=det.max_points_per_voxel))
    valid = vox['voxel_mask']
    coords_zyx = vox['voxel_coords'][valid]
    coords_t = np.concatenate(
        [np.zeros((len(coords_zyx), 1), np.int64), coords_zyx], axis=1)
    bd = {'voxels': torch.from_numpy(vox['voxels'][valid]),
          'voxel_num_points': torch.from_numpy(
              vox['voxel_num_points'][valid]),
          'voxel_coords': torch.from_numpy(coords_t),
          'batch_size': 1}
    with torch.no_grad():
        bd = vfe_t(bd)
        bd = scatter_t(bd)
        bd = bev_t(bd)
        bd = head_t(bd)
    want_cls = bd['batch_cls_preds'].numpy()       # (1, N, 3) raw logits
    want_box = bd['batch_box_preds'].numpy()       # (1, N, 7) decoded

    # ---- ours: same weights, points in, decoded preds out ----
    full_out = det.net_eval.apply(merged, batch['points'],
                                  batch['points_mask'], train=False)
    dec = anchor_heads.decode_predictions(
        full_out['dense_head'],
        jnp.asarray(det.anchor_set.flat_anchors), det.box_coder,
        dir_offset=det.dir_offset, dir_limit_offset=det.dir_limit_offset,
        num_dir_bins=det.num_dir_bins)
    got_cls = np.asarray(dec['batch_cls_preds'])
    got_box = np.asarray(dec['batch_box_preds'])

    assert got_cls.shape == want_cls.shape
    assert got_box.shape == want_box.shape
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(got_box[..., :6], want_box[..., :6],
                               rtol=1e-3, atol=2e-3)
    # direction logits themselves must agree ...
    want_dir = bd['dir_cls_preds'].numpy() if 'dir_cls_preds' in bd else \
        head_t.forward_ret_dict['dir_cls_preds'].numpy()
    want_dir = want_dir.reshape(1, -1, 2)
    got_dir = np.asarray(dec.get('batch_dir_preds', np.zeros(0)))
    if got_dir.size:
        np.testing.assert_allclose(got_dir, want_dir, rtol=1e-3, atol=2e-3)
    # ... and heading modulo 2*pi must agree wherever the dir-bin argmax
    # is not a float32 near-tie (argmax of ~equal logits is unstable)
    margin = np.abs(want_dir[..., 0] - want_dir[..., 1])
    dh = got_box[..., 6] - want_box[..., 6]
    dh = np.abs((dh + np.pi) % (2 * np.pi) - np.pi)
    decided = margin > 5e-3
    assert decided.mean() > 0.8
    assert dh[decided].max() < 2e-3, dh[decided].max()
