"""CaDDN camera path: depth binning oracle, trilinear sampler oracle,
frustum->voxel projection geometry, tiny end-to-end train + predict."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models import image_vfe as iv
from glenet_tpu.models.detectors import build_detector


def test_bin_depths_modes():
    d = jnp.asarray([2.0, 10.0, 46.8])
    for mode in ('UD', 'LID', 'SID'):
        idx = np.asarray(iv.bin_depths(d, mode, 2.0, 46.8, 80))
        assert idx[0] == pytest.approx(0.0, abs=1e-4)
        assert 79.0 <= idx[2] <= 80.0
        assert 0 < idx[1] < 80
    # targets: out-of-range -> num_bins
    t = np.asarray(iv.bin_depths(jnp.asarray([1.0, 100.0, 10.0]),
                                 'LID', 2.0, 46.8, 80, target=True))
    assert t[0] == 80 and t[1] == 80 and 0 <= t[2] < 80


def test_trilinear_sample_oracle(rng):
    vol = rng.randn(4, 5, 6, 3).astype(np.float32)
    # exact lattice points return exact values
    coords = np.array([[1, 2, 3], [0, 0, 0], [3, 4, 5]], np.float32)
    got = np.asarray(iv.trilinear_sample(jnp.asarray(vol),
                                         jnp.asarray(coords)))
    for i, (d, v, u) in enumerate(coords.astype(int)):
        np.testing.assert_allclose(got[i], vol[d, v, u], rtol=1e-5)
    # midpoints average neighbors
    got = np.asarray(iv.trilinear_sample(
        jnp.asarray(vol), jnp.asarray([[0.5, 0.0, 0.0]])))
    np.testing.assert_allclose(got[0], 0.5 * (vol[0, 0, 0] + vol[1, 0, 0]),
                               rtol=1e-5)
    # outside -> zero
    got = np.asarray(iv.trilinear_sample(
        jnp.asarray(vol), jnp.asarray([[-2.0, 0.0, 0.0]])))
    np.testing.assert_allclose(got[0], 0.0, atol=1e-6)


def test_trilinear_sample_bf16_gather(rng):
    """The production CaDDN path gathers in bf16 (image_vfe.py ImageVFE
    sample_one); values are upcast to f32 before the weight product, so
    error is bounded by one bf16 rounding of each gathered value."""
    vol = rng.randn(4, 5, 6, 3).astype(np.float32)
    coords = np.stack([rng.uniform(-0.5, 3.5, 64),
                       rng.uniform(-0.5, 4.5, 64),
                       rng.uniform(-0.5, 5.5, 64)], 1).astype(np.float32)
    ref = np.asarray(iv.trilinear_sample(jnp.asarray(vol),
                                         jnp.asarray(coords)))
    got = np.asarray(iv.trilinear_sample(jnp.asarray(vol),
                                         jnp.asarray(coords),
                                         gather_dtype=jnp.bfloat16))
    assert got.dtype == np.float32
    # bf16 has an 8-bit mantissa: per-term relative error <= 2^-8
    np.testing.assert_allclose(got, ref, rtol=0, atol=4e-2)
    # exact lattice points survive bf16 quantization of representable vals
    lat = np.array([[1, 2, 3]], np.float32)
    got_l = np.asarray(iv.trilinear_sample(
        jnp.asarray(vol), jnp.asarray(lat), gather_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got_l[0], vol[1, 2, 3], rtol=1e-2)


def make_caddn_cfg():
    return Cfg({
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': {
            'POINT_CLOUD_RANGE': [2, -8, -3.0, 14.8, 8, 1.0],
            'DATA_PROCESSOR': [
                {'NAME': 'calculate_grid_size',
                 'VOXEL_SIZE': [0.8, 0.8, 0.5]},
            ],
        },
        'MODEL': {
            'NAME': 'CaDDN',
            'VFE': {
                'NAME': 'ImageVFE',
                'FFN': {
                    'NAME': 'DepthFFN',
                    'DDN': {'NAME': 'DDNLite', 'ARGS': {}},
                    'CHANNEL_REDUCE': {'in_channels': 64,
                                       'out_channels': 16,
                                       'kernel_size': 1, 'stride': 1,
                                       'bias': False},
                    'DISCRETIZE': {'mode': 'LID', 'num_bins': 12,
                                   'depth_min': 2.0, 'depth_max': 14.8},
                    'LOSS': {'NAME': 'DDNLoss',
                             'ARGS': {'weight': 3.0, 'alpha': 0.25,
                                      'gamma': 2.0, 'fg_weight': 13,
                                      'bg_weight': 1}},
                },
                'F2V': {'NAME': 'FrustumToVoxel',
                        'SAMPLER': {'mode': 'bilinear',
                                    'padding_mode': 'zeros'}},
            },
            'MAP_TO_BEV': {'NAME': 'Conv2DCollapse', 'NUM_BEV_FEATURES': 16,
                           'ARGS': {'kernel_size': 1, 'stride': 1,
                                    'bias': False}},
            'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                            'LAYER_NUMS': [2], 'LAYER_STRIDES': [2],
                            'NUM_FILTERS': [32],
                            'UPSAMPLE_STRIDES': [1],
                            'NUM_UPSAMPLE_FILTERS': [32]},
            'DENSE_HEAD': {
                'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
                'USE_DIRECTION_CLASSIFIER': True,
                'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0,
                'NUM_DIR_BINS': 2,
                'ANCHOR_GENERATOR_CONFIG': [
                    {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                     'anchor_rotations': [0, 1.57],
                     'anchor_bottom_heights': [-1.78],
                     'align_center': False, 'feature_map_stride': 2,
                     'matched_threshold': 0.6,
                     'unmatched_threshold': 0.45},
                ],
                'TARGET_ASSIGNER_CONFIG': {
                    'NAME': 'AxisAlignedTargetAssigner',
                    'POS_FRACTION': -1.0, 'SAMPLE_SIZE': 512,
                    'NORM_BY_NUM_EXAMPLES': False, 'MATCH_HEIGHT': False,
                    'BOX_CODER': 'ResidualCoder'},
                'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                    'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                    'code_weights': [1.0] * 7}},
            },
            'POST_PROCESSING': {
                'SCORE_THRESH': 0.0,
                'NMS_CONFIG': {'MULTI_CLASSES_NMS': False,
                               'NMS_TYPE': 'nms_gpu', 'NMS_THRESH': 0.01,
                               'NMS_PRE_MAXSIZE': 64,
                               'NMS_POST_MAXSIZE': 16}},
        },
    })


def make_camera_batch(rng, b=2, h=32, w=48):
    # lidar x-forward -> camera z-forward axis swap + simple pinhole
    l2c = np.array([[0., -1., 0., 0.],
                    [0., 0., -1., 0.],
                    [1., 0., 0., 0.],
                    [0., 0., 0., 1.]], np.float32)
    fu = 30.0
    c2i = np.array([[fu, 0., w / 2, 0.],
                    [0., fu, h / 2, 0.],
                    [0., 0., 1., 0.]], np.float32)
    images = rng.rand(b, h, w, 3).astype(np.float32)
    gt = np.zeros((b, 4, 8), np.float32)
    gt_mask = np.zeros((b, 4), bool)
    for k in range(b):
        for g in range(2):
            gt[k, g] = [rng.uniform(5, 12), rng.uniform(-4, 4), -1.0,
                        3.9, 1.6, 1.56, rng.uniform(-0.5, 0.5), 1]
            gt_mask[k, g] = True
    hs, ws = h // 4, w // 4
    depth = rng.uniform(2.0, 14.0, (b, hs, ws)).astype(np.float32)
    boxes2d = np.zeros((b, 4, 4), np.float32)
    boxes2d[:, :2] = [2, 2, 8, 6]
    return {
        'points': jnp.zeros((b, 1, 4), jnp.float32),
        'points_mask': jnp.zeros((b, 1), bool),
        'images': jnp.asarray(images),
        'trans_lidar_to_cam': jnp.asarray(np.tile(l2c, (b, 1, 1))),
        'trans_cam_to_img': jnp.asarray(np.tile(c2i, (b, 1, 1))),
        'image_shape': jnp.asarray(np.tile([h, w], (b, 1))),
        'gt_boxes': jnp.asarray(gt), 'gt_mask': jnp.asarray(gt_mask),
        'gt_uncertainty': jnp.ones((b, 4, 7), jnp.float32),
        'depth_maps': jnp.asarray(depth),
        'gt_boxes2d': jnp.asarray(boxes2d),
        'gt_boxes2d_mask': jnp.asarray(gt_mask),
    }


@pytest.mark.slow
def test_caddn_trains_and_predicts(rng):
    cfg = make_caddn_cfg()
    det = build_detector(cfg)
    batch = make_camera_batch(rng)
    variables = det.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    params = variables['params']
    state = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, key):
        def lf(p):
            return det.loss_fn({'params': p, **state}, batch, rng=key)
        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), new_state, opt_state2,
                loss, metrics, optax.global_norm(grads))

    losses = []
    for i in range(3):
        params, state, opt_state, loss, metrics, gn = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
        assert np.isfinite(float(gn))
    assert np.isfinite(losses).all(), losses
    assert 'loss_depth' in metrics and float(metrics['loss_depth']) > 0

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


def test_caddn_harness_render_geometry():
    """tools/convergence_caddn.py synthetic camera: the z-buffered depth
    map must agree with gt car distances at the projected gt pixels, and
    gt_boxes2d must tightly contain the projected box centers."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / 'tools'))
    import convergence_ap as ca
    import convergence_caddn as cc

    points, gt, gm = ca.make_scene(3)
    gm = gm & (gt[:, 0] < 42.0)
    image, depth_ds, boxes2d = cc.render_scene(points, gt, gm)
    assert image.shape == (cc.H, cc.W, 3)
    assert depth_ds.shape == (cc.H // cc.DS, cc.W // cc.DS)
    # lidar covers the ground plane: a sizeable share of downsampled
    # pixels below the horizon row (CV) see a return (sparse, like real
    # KITTI depth maps — 20k points over a 45-deg FOV)
    below = depth_ds[int(cc.CV / cc.DS) + 2:]
    assert (below > 0).mean() > 0.2

    u, v, d = cc.project(gt[gm][:, :3])
    for i in range(gm.sum()):
        x0, y0, x1, y1 = boxes2d[np.flatnonzero(gm)[i]]
        assert x0 <= u[i] <= x1 and y0 <= v[i] <= y1, (i, boxes2d)
        # depth at the car's pixel ~ the car's camera depth (its surface
        # faces the camera, so the z-buffer is a bit nearer)
        dd = depth_ds[int(v[i] / cc.DS), int(u[i] / cc.DS)]
        if dd > 0:
            assert d[i] - 4.0 < dd < d[i] + 1.0, (dd, d[i])
