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
