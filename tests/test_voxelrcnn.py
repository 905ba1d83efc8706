"""Two-stage (GLENet-VR style) detector: proposal layer, roi sampling,
corner-aggregation pooling, KL rcnn losses, end-to-end train + predict."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models import roi_heads as roi_lib
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.utils.box_coder import ResidualCoder

from test_second import TINY_SECOND, make_batch

ROI_CFG = Cfg({
    'NAME': 'VoxelRCNNKLLabelIoUHead',
    'CLASS_AGNOSTIC': True,
    'SHARED_FC': [32, 32], 'CLS_FC': [32], 'REG_FC': [32], 'DP_RATIO': 0.3,
    'NMS_CONFIG': {
        'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 512,
                  'NMS_POST_MAXSIZE': 64, 'NMS_THRESH': 0.8},
        'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 256,
                 'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                 'SCORE_THRESH': 0.0},
    },
    'ROI_GRID_POOL': {
        'FEATURES_SOURCE': ['x_conv2', 'x_conv3', 'x_conv4'],
        'PRE_MLP': True, 'GRID_SIZE': 4,
        'POOL_LAYERS': {
            'x_conv2': {'MLPS': [[16, 16]]},
            'x_conv3': {'MLPS': [[16, 16]]},
            'x_conv4': {'MLPS': [[16, 16]]},
        },
    },
    'TARGET_CONFIG': {
        'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 32, 'FG_RATIO': 0.5,
        'SAMPLE_ROI_BY_EACH_CLASS': True, 'CLS_SCORE_TYPE': 'roi_iou',
        'CLS_FG_THRESH': 0.75, 'CLS_BG_THRESH': 0.25,
        'CLS_BG_THRESH_LO': 0.1, 'HARD_BG_RATIO': 0.8,
        'REG_FG_THRESH': 0.55},
    'LOSS_CONFIG': {
        'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
        'CORNER_LOSS_REGULARIZATION': True,
        'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                         'rcnn_corner_weight': 1.0,
                         'code_weights': [1.0] * 7}},
})


def make_vr_cfg():
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'VoxelRCNN'
    cfg.MODEL.ROI_HEAD = copy.deepcopy(ROI_CFG)
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_TYPE = 'new_nms_gpu'
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_PRE_MAXSIZE = 32
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_POST_MAXSIZE = 16
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    return cfg


def test_roi_grid_points_inside_roi():
    rois = jnp.asarray(np.array([[5.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.7]],
                                np.float32))
    pts = np.asarray(roi_lib.roi_grid_points(rois, 4))  # (1, 64, 3)
    assert pts.shape == (1, 64, 3)
    # all grid points inside the (rotated) roi
    from glenet_tpu.utils import box_utils
    inside = box_utils.points_in_boxes_np(pts[0], np.asarray(rois))
    assert inside.all()


def test_canonical_transform_identity():
    """gt == roi -> canonical gt is the origin-centered, 0-heading box."""
    rois = jnp.asarray(np.array([[5.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.7]],
                                np.float32))
    gt = jnp.concatenate([rois, jnp.ones((1, 1))], axis=1)
    ct = np.asarray(roi_lib.canonical_gt_of_rois(rois, gt))
    np.testing.assert_allclose(ct[0, :3], 0, atol=1e-5)
    np.testing.assert_allclose(ct[0, 3:6], [4, 2, 1.5], atol=1e-5)
    np.testing.assert_allclose(ct[0, 6], 0, atol=1e-5)


def test_sample_rois_composition(rng):
    n, m = 64, 4
    rois = np.zeros((n, 7), np.float32)
    rois[:, 0:2] = rng.uniform(-10, 10, (n, 2))
    rois[:, 3:6] = [3.9, 1.6, 1.56]
    gt = np.zeros((m, 8), np.float32)
    gt[:2, :7] = rois[:2, :7] + 0.05  # 2 rois overlap gts
    gt[:2, 3:6] = [3.9, 1.6, 1.56]
    gt[:, 7] = 1
    gt_mask = np.array([True, True, False, False])
    cfg = ROI_CFG.TARGET_CONFIG
    out = roi_lib.sample_rois_single(
        jax.random.PRNGKey(0), jnp.asarray(rois),
        jnp.asarray(np.ones(n, np.float32)),
        jnp.asarray(np.ones(n, np.int32)), jnp.asarray(gt),
        jnp.asarray(gt_mask), jnp.ones((m, 7)) * 0.2, cfg)
    assert out['rois'].shape == (32, 7)
    ious = np.asarray(out['roi_ious'])
    labels = np.asarray(out['rcnn_cls_labels'])
    # the two high-iou rois should be sampled as fg
    assert (ious > 0.55).sum() == 2
    assert (np.asarray(out['reg_valid_mask']) > 0).sum() == 2
    # soft labels within [0, 1]; bg rois get 0
    assert labels.min() >= 0 and labels.max() <= 1
    # fg rois carry gt uncertainty
    unc = np.asarray(out['gt_unc_of_rois'])
    assert np.allclose(unc[ious > 0.55], 0.2)


def test_decode_rcnn_roundtrip(rng):
    """encode(gt in canonical frame) then decode == original gt box."""
    coder = ResidualCoder()
    rois = np.zeros((1, 8, 7), np.float32)
    rois[0, :, 0:2] = rng.uniform(-10, 10, (8, 2))
    rois[0, :, 2] = -1
    rois[0, :, 3:6] = rng.uniform(1.5, 4, (8, 3))
    rois[0, :, 6] = rng.uniform(-np.pi, np.pi, 8)
    gt = rois[0].copy()
    gt[:, 0:3] += rng.uniform(-0.5, 0.5, (8, 3))
    gt[:, 6] += rng.uniform(-0.3, 0.3, 8)

    rois_j = jnp.asarray(rois)
    gt_ct = roi_lib.canonical_gt_of_rois(
        rois_j[0], jnp.concatenate([jnp.asarray(gt), jnp.ones((8, 1))], 1))
    anchors = jnp.asarray(rois[0]).at[:, 0:3].set(0.0).at[:, 6].set(0.0)
    enc = coder.encode(gt_ct, anchors)
    dec = np.asarray(roi_lib.decode_rcnn_boxes(rois_j, enc, coder))[0]
    np.testing.assert_allclose(dec[:, :3], gt[:, :3], atol=1e-4)
    np.testing.assert_allclose(dec[:, 3:6], gt[:, 3:6], rtol=1e-4)
    # heading equal modulo pi (canonical flip)
    dh = np.abs(np.angle(np.exp(1j * 2 * (dec[:, 6] - gt[:, 6])))) / 2
    assert dh.max() < 1e-4


@pytest.mark.slow
def test_voxelrcnn_trains_and_predicts(rng):
    cfg = make_vr_cfg()
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
    assert 'rcnn_loss_cls' in metrics and 'rcnn_loss_reg' in metrics
    assert 'rcnn_loss_reg_square' in metrics  # KL parts present
    assert float(metrics['rcnn_loss_cls']) > 0

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


@pytest.mark.slow
def test_voxelrcnn_with_centerhead_rpn_trains(rng):
    """CenterHead proposals feeding the roi head (reference waymo
    voxel_rcnn_with_centerhead_dyn_voxel.yaml / pv_rcnn_with_centerhead_rpn
    topology) — the non-anchor proposal path."""
    cfg = make_vr_cfg()
    cfg.MODEL.ROI_HEAD.NAME = 'VoxelRCNNHead'
    cfg.MODEL.DENSE_HEAD = Cfg({
        'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
        'CLASS_NAMES_EACH_HEAD': [['Car']],
        'SHARED_CONV_CHANNEL': 16,
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 8, 'NUM_MAX_OBJS': 100,
            'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
        'POST_PROCESSING': {'SCORE_THRESH': 0.0,
                            'MAX_OBJ_PER_SAMPLE': 64},
    })
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_TYPE = 'nms_gpu'
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
    assert 'rcnn_loss_cls' in metrics and 'rcnn_loss_reg' in metrics
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
