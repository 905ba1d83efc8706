"""End-to-end smoke test for the sparse path: tiny SECOND (MeanVFE ->
VoxelBackBone8x -> HeightCompression -> BEV backbone -> head), plain and
GLENet-S (KL-label head + variance-voting NMS)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models.detectors import build_detector

TINY_SECOND = Cfg({
    'CLASS_NAMES': ['Car'],
    'DATA_CONFIG': {
        'POINT_CLOUD_RANGE': [0, -8, -1.2, 16, 8, 1.2],  # 32x32x24
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 0.1],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}},
        ],
    },
    'MODEL': {
        'NAME': 'SECONDNet',
        'VFE': {'NAME': 'MeanVFE'},
        'BACKBONE_3D': {'NAME': 'VoxelBackBone8x'},
        'MAP_TO_BEV': {'NAME': 'HeightCompression', 'NUM_BEV_FEATURES': 256},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [2, 2], 'LAYER_STRIDES': [1, 2],
                        'NUM_FILTERS': [32, 64],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [32, 32]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
                 'align_center': False, 'feature_map_stride': 8,
                 'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
            ],
            'TARGET_ASSIGNER_CONFIG': {
                'NAME': 'AxisAlignedTargetAssigner', 'POS_FRACTION': -1.0,
                'SAMPLE_SIZE': 512, 'NORM_BY_NUM_EXAMPLES': False,
                'MATCH_HEIGHT': False, 'BOX_CODER': 'ResidualCoder'},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'cls_weight': 1.0, 'loc_weight': 2.0, 'dir_weight': 0.2,
                'code_weights': [1.0] * 7}},
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 32,
                           'NMS_POST_MAXSIZE': 16}},
    },
})


def make_batch(rng, batch_size=2, n_points=512):
    pts = np.zeros((batch_size, n_points, 4), np.float32)
    pts[..., 0] = rng.uniform(0, 16, (batch_size, n_points))
    pts[..., 1] = rng.uniform(-8, 8, (batch_size, n_points))
    pts[..., 2] = rng.uniform(-1.1, 1.1, (batch_size, n_points))
    gt = np.zeros((batch_size, 4, 8), np.float32)
    gt_mask = np.zeros((batch_size, 4), bool)
    for b in range(batch_size):
        for g in range(2):
            gt[b, g] = [rng.uniform(3, 13), rng.uniform(-5, 5), -0.2,
                        3.9, 1.6, 1.56, rng.uniform(-0.5, 0.5), 1]
            gt_mask[b, g] = True
    unc = np.where(gt_mask[..., None], rng.uniform(0.05, 0.5, (batch_size, 4, 7)), 0)
    return {
        'points': jnp.asarray(pts),
        'points_mask': jnp.ones((batch_size, n_points), bool),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.asarray(gt_mask),
        'gt_uncertainty': jnp.asarray(unc.astype(np.float32)),
    }


def _train_steps(cfg, batch, n_steps=4):
    det = build_detector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    params = variables['params']
    state = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state):
        def lf(p):
            return det.loss_fn({'params': p, **state}, batch)
        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return (optax.apply_updates(params, updates), new_state, opt_state2,
                loss, metrics)

    losses = []
    for _ in range(n_steps):
        params, state, opt_state, loss, metrics = step(params, state, opt_state)
        losses.append(float(loss))
    return det, {'params': params, **state}, losses, metrics


@pytest.mark.slow
def test_second_trains(rng):
    batch = make_batch(rng)
    det, variables, losses, _ = _train_steps(TINY_SECOND, batch)
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_glenet_s_kl_head_trains_and_predicts(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.DENSE_HEAD.NAME = 'AnchorHeadKLLabel'
    cfg.MODEL.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.NAME = \
        'WeightedAxisAlignedTargetAssigner'
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_TYPE = 'new_nms_gpu'
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.3

    batch = make_batch(rng)
    det, variables, losses, metrics = _train_steps(cfg, batch)
    assert np.isfinite(losses).all(), losses
    assert 'loc_loss_square' in metrics  # KL parts present

    preds = jax.jit(lambda v, b: det.predict(v, b))(variables, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


@pytest.mark.parametrize('head_name', ['AnchorHeadKL', 'AnchorHeadIoU',
                                       'AnchorHeadSessd'])
@pytest.mark.slow
def test_head_variants_train(rng, head_name):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.DENSE_HEAD.NAME = head_name
    batch = make_batch(rng)
    det, variables, losses_seq, _ = _train_steps(cfg, batch, n_steps=3)
    assert np.isfinite(losses_seq).all(), (head_name, losses_seq)


@pytest.mark.slow
def test_glenet_c_ciassd_ssfa_trains(rng):
    """GLENet-C path: VoxelBackBone8xCiassd + SSFA + AnchorHeadKLLabelIoU."""
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.BACKBONE_3D.NAME = 'VoxelBackBone8xCiassd'
    cfg.MODEL.BACKBONE_2D = Cfg({'NAME': 'SSFA'})
    cfg.MODEL.DENSE_HEAD.NAME = 'AnchorHeadKLLabelIoU'
    cfg.MODEL.DENSE_HEAD.PRE_CLS_THRESH = 0.0
    cfg.MODEL.DENSE_HEAD.PRE_IOU_THRESH = 0.0
    cfg.MODEL.DENSE_HEAD.POW = 4
    cfg.MODEL.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.NAME = \
        'WeightedAxisAlignedTargetAssigner'
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_TYPE = 'new_nms_gpu'

    batch = make_batch(rng)
    det, variables, losses_seq, metrics = _train_steps(cfg, batch, n_steps=3)
    assert np.isfinite(losses_seq).all(), losses_seq
    assert 'loss_iou' in metrics

    preds = jax.jit(lambda v, b: det.predict(v, b))(variables, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
