"""Sparse-path weight-transplant parity vs a masked-dense torch mirror.

The reference's VoxelBackBone8x runs on spconv (not installable here), but
its submanifold / strided sparse-conv semantics are exactly expressible as
masked dense torch convs on a small grid (reference
pcdet/models/backbones_3d/spconv_backbone.py:69-180):

  - SubMConv3d(k3, p1): a dense conv whose output is masked back to the
    input active set (inactive input features are zero, so the dense conv
    sums exactly the active contributions).
  - SparseConv3d(stride s): a dense strided conv whose output active set
    is the kernel-window dilation of the input active set.
  - BatchNorm1d(eps=1e-3) in eval mode is per-channel affine, hence
    identical applied densely and masked afterwards.

This closes the round-2 gap: the only full-model numeric parity was the
dense PointPillars path; the sparse backbone (the redesigned component)
had never been checked against reference-layout weights.  It also guards
the HeightCompression channel-fold seam: the reference folds z C-outer
(`view(N, C*D, H, W)`, height_compression.py:20-23) while our backbone
folds z-outer, so the converter must permute the first BEV conv's input
channels (weight_converter.height_compression_perm).
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glenet_tpu.utils import weight_converter as wc  # noqa: E402

from test_full_model_parity import (  # noqa: E402
    load_full_pipeline_modules, randomize_bn_stats)
from test_weight_converter import EasyDict  # noqa: E402

pytestmark = pytest.mark.slow

# tiny-but-real geometry: KITTI voxel size, 1/8 of the x/y extent
PCR = [0.0, -3.2, -3.0, 6.4, 3.2, 1.0]
VOXEL = (0.05, 0.05, 0.1)
GRID = (128, 128, 40)            # (nx, ny, nz); sparse z = 41
IN_CH = 4


def make_backbone_sd(rng, channels=(16, 32, 64, 64), out_ch=128,
                     subm_per_block=(2, 2, 2)):
    """Reference-layout VoxelBackBone8x state_dict (spconv 2.x shapes)."""
    sd = {}

    def spc(name, o, i, k=(3, 3, 3)):
        sd[f'{name}.weight'] = (
            rng.randn(o, *k, i) / np.sqrt(27 * i)).astype(np.float32)

    def bn(name, c):
        sd[f'{name}.weight'] = rng.rand(c).astype(np.float32) + 0.5
        sd[f'{name}.bias'] = rng.randn(c).astype(np.float32) * 0.1
        sd[f'{name}.running_mean'] = rng.randn(c).astype(np.float32) * 0.1
        sd[f'{name}.running_var'] = rng.rand(c).astype(np.float32) + 0.5
        sd[f'{name}.num_batches_tracked'] = np.int64(100)

    c1, c2, c3, c4 = channels
    spc('backbone_3d.conv_input.0', c1, IN_CH)
    bn('backbone_3d.conv_input.1', c1)
    spc('backbone_3d.conv1.0.0', c1, c1)
    bn('backbone_3d.conv1.0.1', c1)
    for li, (lvl, ci, co) in enumerate(
            [(2, c1, c2), (3, c2, c3), (4, c3, c4)]):
        spc(f'backbone_3d.conv{lvl}.0.0', co, ci)
        bn(f'backbone_3d.conv{lvl}.0.1', co)
        for blk in range(1, subm_per_block[li] + 1):
            spc(f'backbone_3d.conv{lvl}.{blk}.0', co, co)
            bn(f'backbone_3d.conv{lvl}.{blk}.1', co)
    spc('backbone_3d.conv_out.0', out_ch, c4, k=(3, 1, 1))
    bn('backbone_3d.conv_out.1', out_ch)
    return sd


# ---------------------------------------------------------------------------
# masked-dense torch mirror of the spconv backbone (eval mode)
# ---------------------------------------------------------------------------

def _bn_eval(x, sd, key):
    shape = (1, -1) + (1,) * (x.dim() - 2)
    w = torch.from_numpy(np.asarray(sd[f'{key}.weight'])).view(shape)
    b = torch.from_numpy(np.asarray(sd[f'{key}.bias'])).view(shape)
    m = torch.from_numpy(np.asarray(sd[f'{key}.running_mean'])).view(shape)
    v = torch.from_numpy(np.asarray(sd[f'{key}.running_var'])).view(shape)
    return (x - m) * (v + 1e-3).rsqrt() * w + b


def _spw(sd, key):
    """spconv2 (O, kz, ky, kx, I) -> torch conv3d (O, I, kz, ky, kx)."""
    return torch.from_numpy(
        np.ascontiguousarray(np.transpose(np.asarray(sd[key]),
                                          (0, 4, 1, 2, 3))))


def mirror_backbone(sd, dense_in, mask_in, subm_per_block=(2, 2, 2)):
    """dense_in (1, C, D, H, W) f32, mask_in (1, 1, D, H, W) {0,1} f32.
    Returns (bev (1, C_out*D_out, H/8, W/8) in REFERENCE channel order,
    intermediates dict)."""
    inter = {}

    def subm(x, m, name):
        y = F.conv3d(x, _spw(sd, f'{name}.0.weight'), padding=1)
        return torch.relu(_bn_eval(y, sd, f'{name}.1')) * m

    def strided(x, m, name, stride, pad, ksize=(3, 3, 3)):
        w = _spw(sd, f'{name}.0.weight')
        y = F.conv3d(x, w, stride=stride, padding=pad)
        ones = torch.ones((1, 1) + ksize)
        m2 = (F.conv3d(m, ones, stride=stride, padding=pad) > 0).float()
        return torch.relu(_bn_eval(y, sd, f'{name}.1')) * m2, m2

    x, m = dense_in, mask_in
    x = subm(x, m, 'backbone_3d.conv_input')
    x = subm(x, m, 'backbone_3d.conv1.0')
    inter['x_conv1'] = (x, m)
    for li, lvl in enumerate((2, 3, 4)):
        pad = (0, 1, 1) if lvl == 4 else 1
        x, m = strided(x, m, f'backbone_3d.conv{lvl}.0', 2, pad)
        for blk in range(1, subm_per_block[li] + 1):
            x = subm(x, m, f'backbone_3d.conv{lvl}.{blk}')
        inter[f'x_conv{lvl}'] = (x, m)
    x, m = strided(x, m, 'backbone_3d.conv_out', (2, 1, 1), 0,
                   ksize=(3, 1, 1))
    n, c, d, h, w_ = x.shape
    bev = x.reshape(n, c * d, h, w_)     # reference view: C-outer fold
    return bev, inter


def make_active_voxels(rng, n=80):
    """Random active sites (sorted by linear id) + features, clustered so
    downsampled levels exercise both merged and isolated sites."""
    nx, ny, nz = GRID
    centers = rng.randint([4, 4, 4], [nx - 4, ny - 4, nz - 4], (8, 3))
    pts = np.concatenate([
        c + rng.randint(-3, 4, (n // 8, 3)) for c in centers])
    pts = np.clip(pts, 0, [nx - 1, ny - 1, nz - 1])
    zyx = np.unique(pts[:, ::-1], axis=0)            # (V, 3) sorted z,y,x
    feats = rng.randn(len(zyx), IN_CH).astype(np.float32)
    return zyx.astype(np.int32), feats


@pytest.fixture()
def f32_gathers(monkeypatch):
    """Run the sparse ops + dense backbone levels at full f32 for
    tight-tolerance comparison (production bf16 compute is covered by its
    own tolerance test and the convergence harness)."""
    from glenet_tpu.models import spconv_backbone
    from glenet_tpu.ops import sparse
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)
    monkeypatch.setattr(spconv_backbone, 'DENSE_MXU_DTYPE', None)


def test_backbone_transplant_parity(rng, f32_gathers):
    """Converted reference-layout weights drive our sparse VoxelBackBone8x
    to the mirror's outputs: per-level active-site features and the final
    HeightCompression BEV map (modulo the documented z-fold reorder)."""
    from glenet_tpu.models.spconv_backbone import VoxelBackBone8x

    sd = make_backbone_sd(rng)
    zyx, feats = make_active_voxels(rng)
    v = len(zyx)

    # ---- torch mirror ----
    nx, ny, nz = GRID
    dense = torch.zeros(1, IN_CH, nz + 1, ny, nx)
    mask = torch.zeros(1, 1, nz + 1, ny, nx)
    dense[0, :, zyx[:, 0], zyx[:, 1], zyx[:, 2]] = torch.from_numpy(feats.T)
    mask[0, 0, zyx[:, 0], zyx[:, 1], zyx[:, 2]] = 1.0
    with torch.no_grad():
        bev_ref, inter = mirror_backbone(sd, dense, mask)

    # ---- ours ----
    pad_v = 1024   # level caps scale with this; keep them above the true
                   # dilated active counts so no uniform-drop path triggers
    bb = VoxelBackBone8x(grid_size=GRID, max_voxels=pad_v, site_lists=False)
    f = jnp.zeros((1, pad_v, IN_CH)).at[0, :v].set(feats)
    c = jnp.zeros((1, pad_v, 3), jnp.int32).at[0, :v].set(zyx)
    m = jnp.zeros((1, pad_v), bool).at[0, :v].set(True)
    variables = bb.init(jax.random.PRNGKey(0), f, c, m, train=False)

    def merge(dst, src):
        dst = dict(dst)
        for k, v_ in src.items():
            dst[k] = merge(dst.get(k, {}), v_) if isinstance(v_, dict) else v_
        return dst

    p, s = wc.convert_voxel_backbone_8x(sd)
    variables = {'params': merge(variables['params'], p),
                 'batch_stats': merge(variables.get('batch_stats', {}), s)}
    out = bb.apply(variables, f, c, m, train=False)

    # per-level sparse parity (levels 1-2 run gather-GEMM sparse)
    for lvl in ('x_conv1', 'x_conv2'):
        lv = out['multi_scale'][lvl]
        ours_f = np.asarray(lv['features'][0])
        ids = np.asarray(lv['ids'][0])
        lm = np.asarray(lv['mask'][0])
        gx, gy, gz = lv['grid']
        ref_x, ref_m = inter[lvl]
        ref_x = ref_x[0].numpy()
        zz, yy, xx = (ids[lm] // (gy * gx), (ids[lm] // gx) % gy,
                      ids[lm] % gx)
        # every site we keep must be active in the mirror and match
        assert ref_m[0, 0].numpy()[zz, yy, xx].all(), lvl
        np.testing.assert_allclose(
            ours_f[lm], ref_x[:, zz, yy, xx].T, rtol=2e-4, atol=2e-4,
            err_msg=lvl)
        # and we must keep EVERY mirror-active site (no cap drops here)
        assert lm.sum() == int(ref_m.sum()), lvl

    # dense levels 3-4: compare the full masked tensors
    for lvl in ('x_conv3', 'x_conv4'):
        lv = out['multi_scale'][lvl]
        ours_x = np.transpose(np.asarray(lv['features'][0]), (3, 0, 1, 2))
        ref_x, _ = inter[lvl]
        np.testing.assert_allclose(ours_x, ref_x[0].numpy(),
                                   rtol=2e-4, atol=2e-4, err_msg=lvl)

    # BEV: ours is z-outer, reference C-outer
    bev_ours = np.asarray(out['bev_features'][0])        # (H, W, D*C)
    dxc = bev_ours.shape[-1]
    c_out = 128                                          # conv_out channels
    d_out = dxc // c_out
    j = np.arange(dxc)
    perm = (j % c_out) * d_out + (j // c_out)            # ours j -> ref ch
    ref_hwc = np.transpose(bev_ref[0].numpy(), (1, 2, 0))[:, :, perm]
    np.testing.assert_allclose(bev_ours, ref_hwc, rtol=2e-4, atol=2e-4)


def test_second_full_model_transplant_parity(rng, f32_gathers):
    """Full SECOND chain: reference-layout backbone_3d weights + the
    reference's own torch BaseBEVBackbone/AnchorHeadSingle vs our detector
    with convert_full_model-transplanted weights, identical voxels in,
    decoded pre-NMS boxes out (detector3d_template.py:226-301 upstream)."""
    mods = load_full_pipeline_modules()
    if mods is None:
        pytest.skip('reference tree unavailable')

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models import anchor_heads
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.ops import voxelize as vox_ops

    cfg = cfg_from_yaml_file('configs/kitti_models/second.yaml')
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = list(PCR)
    for p in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if p.NAME == 'transform_points_to_voxels':
            p.MAX_NUMBER_OF_VOXELS = {'train': 256, 'test': 256}
    det = build_detector(cfg)
    grid = np.array(det.grid_size)
    assert tuple(grid) == GRID

    sd = make_backbone_sd(rng)

    bev_t = mods['base_bev_backbone'].BaseBEVBackbone(
        EasyDict(dict(cfg.MODEL.BACKBONE_2D)), input_channels=256)
    head_t = mods['anchor_head_single'].AnchorHeadSingle(
        EasyDict(dict(cfg.MODEL.DENSE_HEAD)), input_channels=512,
        num_class=len(cfg.CLASS_NAMES), class_names=list(cfg.CLASS_NAMES),
        grid_size=grid, point_cloud_range=np.asarray(PCR, np.float32),
        predict_boxes_when_training=False)
    for mod in (bev_t, head_t):
        mod.eval()
        randomize_bn_stats(mod, rng)
    ref_anchors = torch.cat(head_t.anchors, dim=-3).reshape(-1, 7).numpy()
    np.testing.assert_allclose(np.asarray(det.anchor_set.flat_anchors),
                               ref_anchors, rtol=1e-5, atol=1e-4)
    for prefix, mod in (('backbone_2d', bev_t), ('dense_head', head_t)):
        for k, v_ in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v_.detach().numpy()

    # points clustered inside the range
    n = 600
    pts = np.zeros((1, n, 4), np.float32)
    centers = rng.rand(8, 3) * [5.0, 4.8, 2.8] + [0.7, -2.6, -2.8]
    idx = rng.randint(0, 8, n)
    pts[0, :, :3] = (centers[idx] + rng.randn(n, 3) * 0.25).astype(np.float32)
    pts[0, :, :3] = np.clip(pts[0, :, :3],
                            [PCR[0] + .1, PCR[1] + .1, PCR[2] + .1],
                            [PCR[3] - .1, PCR[4] - .1, PCR[5] - .1])
    pts[0, :, 3] = rng.rand(n)

    batch = {'points': jnp.asarray(pts),
             'points_mask': jnp.ones((1, n), bool),
             'gt_boxes': jnp.zeros((1, 4, 8)),
             'gt_mask': jnp.zeros((1, 4), bool)}
    variables = det.init(jax.random.PRNGKey(0), batch)
    merged, report = wc.convert_full_model(cfg, sd, variables)
    merged = jax.tree.map(jnp.asarray, merged)

    # identical voxels -> MeanVFE features for the torch mirror
    vox = jax.tree.map(np.asarray, vox_ops.voxelize(
        jnp.asarray(pts[0]), jnp.ones((n,), bool),
        voxel_size=tuple(det.voxel_size), pc_range=tuple(det.pc_range),
        grid_size=tuple(int(g) for g in grid),
        max_voxels=det.max_voxels_test,
        max_points_per_voxel=det.max_points_per_voxel))
    valid = vox['voxel_mask']
    zyx = vox['voxel_coords'][valid]
    nppv = vox['voxel_num_points'][valid]
    mean_f = (vox['voxels'][valid].sum(1)
              / np.maximum(nppv, 1)[:, None]).astype(np.float32)

    nx, ny, nz = GRID
    dense = torch.zeros(1, IN_CH, nz + 1, ny, nx)
    mask = torch.zeros(1, 1, nz + 1, ny, nx)
    dense[0, :, zyx[:, 0], zyx[:, 1], zyx[:, 2]] = torch.from_numpy(mean_f.T)
    mask[0, 0, zyx[:, 0], zyx[:, 1], zyx[:, 2]] = 1.0
    with torch.no_grad():
        bev_ref, _ = mirror_backbone(sd, dense, mask)
        bd = {'spatial_features': bev_ref, 'batch_size': 1}
        bd = bev_t(bd)
        bd = head_t(bd)
    want_cls = bd['batch_cls_preds'].numpy()
    want_box = bd['batch_box_preds'].numpy()

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
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(got_box[..., :6], want_box[..., :6],
                               rtol=1e-3, atol=2e-3)
    dh = got_box[..., 6] - want_box[..., 6]
    dh = np.abs((dh + np.pi) % (2 * np.pi) - np.pi)
    assert dh.max() < 2e-3, dh.max()
