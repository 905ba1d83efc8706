"""Point-based topology (PointRCNN stage 1: PointNet2MSG + PointHeadBox):
target assignment, tiny end-to-end train + predict."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models import point_heads as ph
from glenet_tpu.models.detectors import build_detector
from glenet_tpu.utils.box_coder import PointResidualCoder

from test_second import make_batch

TINY_POINTRCNN = Cfg({
    'CLASS_NAMES': ['Car'],
    'DATA_CONFIG': {
        'POINT_CLOUD_RANGE': [0, -8, -1.2, 16, 8, 1.2],
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 0.1],
             'MAX_POINTS_PER_VOXEL': 5,
             'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}},
        ],
    },
    'MODEL': {
        'NAME': 'PointRCNN',
        'BACKBONE_3D': {
            'NAME': 'PointNet2MSG',
            'SA_CONFIG': {
                'NPOINTS': [128, 32, 16, 8],
                'RADIUS': [[0.5, 1.0]] * 4,
                'NSAMPLE': [[8, 16]] * 4,
                'MLPS': [[[8, 8], [8, 8]], [[8, 16], [8, 16]],
                         [[16, 16], [16, 16]], [[16, 32], [16, 32]]],
            },
            'FP_MLPS': [[16, 16], [16, 16], [32, 32], [32, 32]],
        },
        'POINT_HEAD': {
            'NAME': 'PointHeadBox', 'CLS_FC': [32], 'REG_FC': [32],
            'CLASS_AGNOSTIC': False,
            'TARGET_CONFIG': {
                'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
                'BOX_CODER': 'PointResidualCoder',
                'BOX_CODER_CONFIG': {
                    'use_mean_size': True,
                    'mean_size': [[3.9, 1.6, 1.56]]}},
            'LOSS_CONFIG': {'LOSS_WEIGHTS': {
                'point_cls_weight': 1.0, 'point_box_weight': 1.0}},
        },
        'POST_PROCESSING': {
            'SCORE_THRESH': 0.1,
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.1, 'NMS_PRE_MAXSIZE': 128,
                           'NMS_POST_MAXSIZE': 16}},
    },
})


def test_assign_point_targets(rng):
    coder = PointResidualCoder(use_mean_size=True,
                               mean_size=((3.9, 1.6, 1.56),))
    pts = np.array([[5.0, 0.0, -1.0], [5.0, 0.2, -1.0], [12.0, 6.0, -1.0],
                    [5.0, 0.9, -1.0]], np.float32)
    gt = np.array([[5.0, 0.0, -1.0, 3.9, 1.6, 1.56, 0.0, 1.0]], np.float32)
    cls, tgt, fg = ph.assign_point_targets(
        jnp.asarray(pts), jnp.ones(4, bool), jnp.asarray(gt),
        jnp.asarray([True]), coder)
    cls = np.asarray(cls)
    assert cls[0] == 1 and cls[1] == 1       # inside the box
    assert cls[2] == 0                        # far away -> background
    assert cls[3] == -1                       # in the enlarged shell -> ignore
    assert np.asarray(fg)[:2].all() and not np.asarray(fg)[2:].any()
    # encoded target for a point at the box center: xt = yt = 0
    np.testing.assert_allclose(np.asarray(tgt)[0, :2], 0, atol=1e-5)


def _np_roipoint_pool(points, feats, rois, num_sampled, extra=(0, 0, 0)):
    """Numpy oracle for the reference roipoint_pool3d kernel semantics
    (roipoint_pool3d_kernel.cu:38-164)."""
    from glenet_tpu.utils import box_utils
    r = rois.shape[0]
    out = np.zeros((r, num_sampled, 3 + feats.shape[1]), np.float32)
    empty = np.zeros(r, bool)
    big = rois.copy()
    big[:, 3:6] += np.asarray(extra)
    inbox = box_utils.points_in_boxes_np(points, big)            # (P, R)
    allf = np.concatenate([points, feats], axis=1)
    for j in range(r):
        hits = np.nonzero(inbox[:, j])[0][:num_sampled]
        if len(hits) == 0:
            empty[j] = True
            continue
        idx = [hits[k] if k < len(hits) else hits[k % len(hits)]
               for k in range(num_sampled)]
        out[j] = allf[idx]
    return out, empty


def test_roipoint_pool3d_oracle(rng):
    from glenet_tpu.ops.roipoint_pool import roipoint_pool3d
    p, r, s = 128, 6, 16
    points = np.zeros((p, 3), np.float32)
    points[:, 0] = rng.uniform(0, 16, p)
    points[:, 1] = rng.uniform(-8, 8, p)
    points[:, 2] = rng.uniform(-1, 1, p)
    feats = rng.randn(p, 4).astype(np.float32)
    rois = np.zeros((r, 7), np.float32)
    rois[:, 0] = rng.uniform(2, 14, r)
    rois[:, 1] = rng.uniform(-6, 6, r)
    rois[:, 2] = 0.0
    rois[:, 3:6] = [3.9, 1.6, 1.56]
    rois[:, 6] = rng.uniform(-np.pi, np.pi, r)
    rois[-1, 0:2] = 100.0                       # out of scene -> empty

    got, got_empty = roipoint_pool3d(
        jnp.asarray(points), jnp.asarray(feats), jnp.asarray(rois), s,
        points_mask=jnp.ones(p, bool))
    want, want_empty = _np_roipoint_pool(points, feats, rois, s)
    np.testing.assert_array_equal(np.asarray(got_empty), want_empty)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_canonicalize_pooled():
    """Points pooled at the roi center map to the canonical origin."""
    from glenet_tpu.models.point_rcnn_head import canonicalize_pooled
    rois = jnp.asarray([[5.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.7]])
    pooled = jnp.asarray([[[5.0, 2.0, -1.0, 9.0]]])             # xyz + 1 feat
    out = canonicalize_pooled(pooled, rois, jnp.asarray([False]))
    np.testing.assert_allclose(np.asarray(out)[0, 0, :3], 0, atol=1e-6)
    assert float(out[0, 0, 3]) == 9.0
    out2 = canonicalize_pooled(pooled, rois, jnp.asarray([True]))
    np.testing.assert_allclose(np.asarray(out2), 0)


def make_two_stage_cfg():
    cfg = copy.deepcopy(TINY_POINTRCNN)
    cfg.MODEL.ROI_HEAD = Cfg({
        'NAME': 'PointRCNNHead', 'CLASS_AGNOSTIC': True,
        'ROI_POINT_POOL': {'POOL_EXTRA_WIDTH': [0.0, 0.0, 0.0],
                           'NUM_SAMPLED_POINTS': 32,
                           'DEPTH_NORMALIZER': 70.0},
        'XYZ_UP_LAYER': [16, 16], 'CLS_FC': [16], 'REG_FC': [16],
        'DP_RATIO': 0.0, 'USE_BN': False,
        'SA_CONFIG': {'NPOINTS': [16, -1], 'RADIUS': [0.4, 100],
                      'NSAMPLE': [8, 8], 'MLPS': [[16, 16], [16, 32]]},
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 128,
                      'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 128,
                     'NMS_POST_MAXSIZE': 16, 'NMS_THRESH': 0.85}},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16,
            'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'cls', 'CLS_FG_THRESH': 0.6,
            'CLS_BG_THRESH': 0.45, 'CLS_BG_THRESH_LO': 0.1,
            'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.55},
        'LOSS_CONFIG': {
            'CLS_LOSS': 'BinaryCrossEntropy', 'REG_LOSS': 'smooth-l1',
            'CORNER_LOSS_REGULARIZATION': True,
            'LOSS_WEIGHTS': {'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                             'rcnn_corner_weight': 1.0,
                             'code_weights': [1.0] * 7}},
    })
    return cfg


@pytest.mark.slow
def test_pointrcnn_two_stage_trains_and_predicts(rng):
    cfg = make_two_stage_cfg()
    det = build_detector(cfg)
    batch = make_batch(rng, n_points=256)
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
    assert 'rcnn_loss_corner' in metrics

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


@pytest.mark.slow
def test_pointrcnn_trains_and_predicts(rng):
    det = build_detector(TINY_POINTRCNN)
    batch = make_batch(rng, n_points=256)
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
    for _ in range(4):
        params, state, opt_state, loss, metrics = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
