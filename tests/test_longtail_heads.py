"""Long-tail head parity: AnchorHeadKLLabelIoUGuide (variance-guided IoU),
VoxelRCNNKLLabelIoUPleHead (MMoE experts), AnchorHeadMulti (grouped heads),
ATSSTargetAssigner."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models.detectors import build_detector

from test_second import TINY_SECOND, make_batch
from test_voxelrcnn import ROI_CFG


def train_steps(det, batch, n=3):
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
    for i in range(n):
        params, state, opt_state, loss, metrics, gn = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
        assert np.isfinite(float(gn))
    return params, state, losses, metrics


@pytest.mark.slow
def test_guide_head_trains(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.DENSE_HEAD.NAME = 'AnchorHeadKLLabelIoUGuide'
    cfg.MODEL.DENSE_HEAD.PRE_CLS_THRESH = 0.1
    cfg.MODEL.DENSE_HEAD.PRE_IOU_THRESH = 0.1
    cfg.MODEL.DENSE_HEAD.POW = 4
    det = build_detector(cfg)
    batch = make_batch(rng)
    params, state, losses, metrics = train_steps(det, batch)
    # the guide gate convs exist and received gradients
    head = params['dense_head']
    assert 'std_conv1' in head and 'std_conv2' in head
    assert np.isfinite(losses).all()
    assert 'loss_iou' in metrics

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


@pytest.mark.slow
def test_ple_head_trains(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'VoxelRCNN'
    cfg.MODEL.ROI_HEAD = copy.deepcopy(ROI_CFG)
    cfg.MODEL.ROI_HEAD.NAME = 'VoxelRCNNKLLabelIoUPleHead'
    cfg.MODEL.ROI_HEAD.PLE_CHANNELS = 32
    cfg.MODEL.POST_PROCESSING.NMS_CONFIG.NMS_TYPE = 'new_nms_gpu'
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    cfg.MODEL.POST_PROCESSING.POST_SCORE_THRESH = 0.0
    det = build_detector(cfg)
    batch = make_batch(rng)
    params, state, losses, metrics = train_steps(det, batch)
    head = params['roi_head']
    for key in ('init_expert_a_fc', 'init_gate_share', 'last_gate_b',
                'reg_std'):
        assert key in head, sorted(head)
    assert 'rcnn_loss_reg_square' in metrics   # KL parts flow
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


@pytest.mark.slow
def test_anchor_head_multi_trains(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    head = cfg.MODEL.DENSE_HEAD
    head.NAME = 'AnchorHeadMulti'
    head.USE_MULTIHEAD = True
    head.SHARED_CONV_NUM_FILTER = 16
    cfg.CLASS_NAMES = ['Car', 'Pedestrian']
    head.ANCHOR_GENERATOR_CONFIG = [
        {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
         'align_center': False, 'feature_map_stride': 8,
         'matched_threshold': 0.6, 'unmatched_threshold': 0.45},
        {'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
         'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
         'align_center': False, 'feature_map_stride': 8,
         'matched_threshold': 0.5, 'unmatched_threshold': 0.35},
    ]
    head.RPN_HEAD_CFGS = [{'HEAD_CLS_NAME': ['Car']},
                          {'HEAD_CLS_NAME': ['Pedestrian']}]
    det = build_detector(cfg)
    batch = make_batch(rng)
    params, state, losses, metrics = train_steps(det, batch)
    assert 'head0_conv_cls' in params['dense_head']
    assert 'head1_conv_cls' in params['dense_head']
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
    assert set(np.unique(np.asarray(preds['final_labels']))) <= {0, 1, 2}

    # multi-class NMS post-processing (second_multihead.yaml path)
    post = copy.deepcopy(cfg.MODEL.POST_PROCESSING)
    post.NMS_CONFIG.MULTI_CLASSES_NMS = True
    preds_mc = jax.jit(lambda v, b: det.predict(v, b, post_cfg=post))(
        {'params': params, **state}, batch)
    k = int(post.NMS_CONFIG.NMS_POST_MAXSIZE)
    assert preds_mc['final_boxes'].shape == (2, k, 7)
    assert np.isfinite(np.asarray(preds_mc['final_boxes'])).all()
    # merged keeps must be sorted by score descending per sample
    fs = np.asarray(preds_mc['final_scores'])
    assert (np.diff(fs, axis=1) <= 1e-6).all()


def test_atss_semantics():
    """Adaptive threshold: the gt's overlapping close anchors become
    positive; far anchors stay background; force-match guarantees every
    valid gt at least one positive anchor."""
    from glenet_tpu.models import anchors as anchors_lib
    from glenet_tpu.models import target_assigner as ta
    from glenet_tpu.utils.box_coder import ResidualCoder
    aset = anchors_lib.generate_anchors(
        [{'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
          'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.0],
          'align_center': False, 'feature_map_stride': 8,
          'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
        grid_size=(128, 128, 24), point_cloud_range=[0, -8, -1.2, 16, 8, 1.2])
    gt = jnp.asarray([[8.0, 0.0, -0.2, 3.9, 1.6, 1.56, 0.0, 1.0],
                      [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]])
    gt_mask = jnp.asarray([True, False])
    out = ta.atss_assign_targets(
        aset, gt, gt_mask, jnp.ones((2, 7)) * 0.1, ResidualCoder(), topk=9)
    labels = np.asarray(out.box_cls_labels)
    assert (labels > 0).sum() >= 1
    anchors_np = np.asarray(aset.flat_anchors)
    pos_anchors = anchors_np[labels > 0]
    # all positives near the gt center
    assert (np.linalg.norm(pos_anchors[:, :2] - np.array([8.0, 0.0]),
                           axis=1) < 3.0).all()
    # reg targets decode back to the gt for positive anchors
    dec = ResidualCoder().decode(out.box_reg_targets[labels > 0],
                                 jnp.asarray(pos_anchors))
    want = np.broadcast_to(np.asarray(gt[0, :6]),
                           np.asarray(dec)[:, :6].shape)
    np.testing.assert_allclose(np.asarray(dec)[:, :6], want, atol=1e-4)


@pytest.mark.slow
def test_atss_e2e_trains(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.NAME = 'ATSSTargetAssigner'
    cfg.MODEL.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.TOPK = 9
    det = build_detector(cfg)
    batch = make_batch(rng)
    params, state, losses, metrics = train_steps(det, batch)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_second_iou_head_trains(rng):
    """SECONDNetIoU: SECONDHead pools rotated BEV grids, scores roi IoU,
    boxes pass through unrefined."""
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'SECONDNetIoU'
    cfg.MODEL.ROI_HEAD = Cfg({
        'NAME': 'SECONDHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'IOU_FC': [16], 'DP_RATIO': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 512,
                      'NMS_POST_MAXSIZE': 64, 'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 256,
                     'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                     'SCORE_THRESH': 0.0}},
        'ROI_GRID_POOL': {'GRID_SIZE': 4, 'IN_CHANNEL': 64,
                          'DOWNSAMPLE_RATIO': 8},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16,
            'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'roi_iou', 'CLS_FG_THRESH': 0.75,
            'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
            'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'IOU_LOSS': 'BinaryCrossEntropy',
            'LOSS_WEIGHTS': {'rcnn_iou_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    })
    cfg.MODEL.POST_PROCESSING.SCORE_THRESH = 0.0
    det = build_detector(cfg)
    batch = make_batch(rng)
    params, state, losses, metrics = train_steps(det, batch)
    assert np.isfinite(losses).all()
    assert 'rcnn_loss_cls' in metrics
    assert 'rcnn_loss_reg' not in metrics        # IoU-only head

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
