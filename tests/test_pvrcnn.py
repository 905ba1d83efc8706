"""PV-RCNN: bilinear BEV interpolation oracle, keypoint seg targets,
VoxelSetAbstraction shapes, tiny end-to-end two-stage train + predict."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models import pfe as pfe_lib
from glenet_tpu.models.detectors import build_detector

from test_second import TINY_SECOND, make_batch


def test_bilinear_interpolate_oracle(rng):
    """Matches scipy map_coordinates with clamp-to-edge at interior points."""
    im = rng.randn(8, 10, 3).astype(np.float32)
    x = rng.uniform(0.5, 8.5, 20).astype(np.float32)
    y = rng.uniform(0.5, 6.5, 20).astype(np.float32)
    got = np.asarray(pfe_lib.bilinear_interpolate(
        jnp.asarray(im), jnp.asarray(x), jnp.asarray(y)))
    # numpy oracle
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    wx, wy = x - x0, y - y0
    want = (im[y0, x0] * ((1 - wx) * (1 - wy))[:, None]
            + im[y0 + 1, x0] * ((1 - wx) * wy)[:, None]
            + im[y0, x0 + 1] * (wx * (1 - wy))[:, None]
            + im[y0 + 1, x0 + 1] * (wx * wy)[:, None])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_keypoint_seg_targets():
    kp = jnp.asarray([[5.0, 0.0, -0.2],     # inside
                      [5.0, 0.85, -0.2],    # enlarged shell -> ignore
                      [12.0, 6.0, -0.2]])   # background
    gt = jnp.asarray([[5.0, 0.0, -0.2, 3.9, 1.6, 1.56, 0.0, 1.0]])
    labels = pfe_lib.assign_keypoint_seg_targets(
        kp, gt, jnp.asarray([True]), extra_width=(0.2, 0.2, 0.2))
    assert np.asarray(labels).tolist() == [1, -1, 0]


def make_pvrcnn_cfg():
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'PVRCNN'
    cfg.MODEL.PFE = Cfg({
        'NAME': 'VoxelSetAbstraction',
        'POINT_SOURCE': 'raw_points', 'NUM_KEYPOINTS': 64,
        'NUM_OUTPUT_FEATURES': 32, 'SAMPLE_METHOD': 'FPS',
        'FEATURES_SOURCE': ['bev', 'x_conv2', 'x_conv3', 'x_conv4',
                            'raw_points'],
        'SA_LAYER': {
            'raw_points': {'MLPS': [[8, 8]], 'POOL_RADIUS': [0.8],
                           'NSAMPLE': [8]},
            'x_conv2': {'DOWNSAMPLE_FACTOR': 2, 'MLPS': [[8, 8]],
                        'POOL_RADIUS': [1.0], 'NSAMPLE': [8]},
            'x_conv3': {'DOWNSAMPLE_FACTOR': 4, 'MLPS': [[8, 8]],
                        'POOL_RADIUS': [2.0], 'NSAMPLE': [8]},
            'x_conv4': {'DOWNSAMPLE_FACTOR': 8, 'MLPS': [[8, 8]],
                        'POOL_RADIUS': [4.0], 'NSAMPLE': [8]},
        },
    })
    cfg.MODEL.POINT_HEAD = Cfg({
        'NAME': 'PointHeadSimple', 'CLS_FC': [16], 'CLASS_AGNOSTIC': True,
        'USE_POINT_FEATURES_BEFORE_FUSION': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0}},
    })
    cfg.MODEL.ROI_HEAD = Cfg({
        'NAME': 'PVRCNNHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'CLS_FC': [32], 'REG_FC': [32],
        'DP_RATIO': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 512,
                      'NMS_POST_MAXSIZE': 64, 'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 256,
                     'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                     'SCORE_THRESH': 0.0}},
        'ROI_GRID_POOL': {'GRID_SIZE': 4, 'MLPS': [[8, 8]],
                          'POOL_RADIUS': [1.0], 'NSAMPLE': [8],
                          'POOL_METHOD': 'max_pool'},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 32,
            'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'roi_iou', 'CLS_FG_THRESH': 0.75,
            'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
            'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    })
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 32
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    return cfg


@pytest.mark.slow
def test_pvrcnn_trains_and_predicts(rng):
    cfg = make_pvrcnn_cfg()
    det = build_detector(cfg)
    batch = make_batch(rng)
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
                loss, metrics)

    losses = []
    for i in range(4):
        params, state, opt_state, loss, metrics = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert 'point_loss_cls' in metrics
    assert 'rcnn_loss_cls' in metrics and 'rcnn_loss_reg' in metrics
    assert float(metrics['point_loss_cls']) > 0

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
