"""End-to-end smoke tests for the dense (PointPillars-style) detector path:
build from config -> init -> loss + grad step decreases loss -> predict
returns fixed-shape, sane outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models.detectors import build_detector

# tiny PointPillars variant: 16 m x 16 m range, 0.5 m pillars -> 32x32 canvas
TINY_CFG = Cfg({
    'CLASS_NAMES': ['Car'],
    'DATA_CONFIG': {
        'POINT_CLOUD_RANGE': [0, -8, -3, 16, 8, 1],
        'DATA_PROCESSOR': [
            {'NAME': 'transform_points_to_voxels',
             'VOXEL_SIZE': [0.5, 0.5, 4],
             'MAX_POINTS_PER_VOXEL': 8,
             'MAX_NUMBER_OF_VOXELS': {'train': 256, 'test': 256}},
        ],
    },
    'MODEL': {
        'NAME': 'PointPillar',
        'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                'USE_ABSLOTE_XYZ': True, 'USE_NORM': True, 'NUM_FILTERS': [16]},
        'MAP_TO_BEV': {'NAME': 'PointPillarScatter', 'NUM_BEV_FEATURES': 16},
        'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                        'LAYER_NUMS': [1, 1], 'LAYER_STRIDES': [1, 2],
                        'NUM_FILTERS': [16, 32],
                        'UPSAMPLE_STRIDES': [1, 2],
                        'NUM_UPSAMPLE_FILTERS': [16, 16]},
        'DENSE_HEAD': {
            'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
            'USE_DIRECTION_CLASSIFIER': True,
            'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
            'ANCHOR_GENERATOR_CONFIG': [
                {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                 'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
                 'align_center': False, 'feature_map_stride': 1,
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
            'SCORE_THRESH': 0.1, 'OUTPUT_RAW_SCORE': False,
            'NMS_CONFIG': {'MULTI_CLASSES_NMS': False, 'NMS_TYPE': 'nms_gpu',
                           'NMS_THRESH': 0.01, 'NMS_PRE_MAXSIZE': 128,
                           'NMS_POST_MAXSIZE': 32}},
    },
})


def make_batch(rng, batch_size=2, n_points=512, n_gt=4):
    """Synthetic scene: gt boxes with dense point clusters inside."""
    pts = np.zeros((batch_size, n_points, 4), np.float32)
    mask = np.ones((batch_size, n_points), bool)
    gt = np.zeros((batch_size, n_gt, 8), np.float32)
    gt_mask = np.zeros((batch_size, n_gt), bool)
    for b in range(batch_size):
        # background points
        pts[b, :, 0] = rng.uniform(0, 16, n_points)
        pts[b, :, 1] = rng.uniform(-8, 8, n_points)
        pts[b, :, 2] = rng.uniform(-2, 0, n_points)
        for g in range(2):
            cx, cy = rng.uniform(3, 13), rng.uniform(-5, 5)
            gt[b, g] = [cx, cy, -1.0, 3.9, 1.6, 1.56, rng.uniform(-0.3, 0.3), 1]
            gt_mask[b, g] = True
            sl = slice(g * 100, (g + 1) * 100)
            pts[b, sl, 0] = cx + rng.uniform(-1.5, 1.5, 100)
            pts[b, sl, 1] = cy + rng.uniform(-0.7, 0.7, 100)
            pts[b, sl, 2] = -1 + rng.uniform(-0.7, 0.7, 100)
    return {
        'points': jnp.asarray(pts),
        'points_mask': jnp.asarray(mask),
        'gt_boxes': jnp.asarray(gt),
        'gt_mask': jnp.asarray(gt_mask),
        'gt_uncertainty': jnp.ones((batch_size, n_gt, 7), jnp.float32),
    }


@pytest.fixture(scope='module')
def detector_and_params():
    det = build_detector(TINY_CFG)
    batch = make_batch(np.random.RandomState(0))
    variables = det.init(jax.random.PRNGKey(0), batch)
    return det, variables, batch


def test_init_shapes(detector_and_params):
    det, variables, batch = detector_and_params
    assert 'params' in variables and 'batch_stats' in variables
    assert det.anchor_set.flat_anchors.shape == (32 * 32 * 2, 7)


def test_loss_finite_and_decreases(detector_and_params):
    det, variables, batch = detector_and_params
    tx = optax.adam(3e-3)

    params = variables['params']
    state = {k: v for k, v in variables.items() if k != 'params'}
    opt_state = tx.init(params)

    @jax.jit
    def step(params, state, opt_state, batch):
        def lf(p):
            loss, (metrics, new_state) = det.loss_fn(
                {'params': p, **state}, batch)
            return loss, (metrics, new_state)
        (loss, (metrics, new_state)), grads = jax.value_and_grad(
            lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss, metrics

    losses = []
    for _ in range(6):
        params, state, opt_state, loss, metrics = step(
            params, state, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    assert float(metrics['loss_cls']) > 0


def test_predict_shapes_and_validity(detector_and_params):
    det, variables, batch = detector_and_params
    preds = jax.jit(lambda v, b: det.predict(v, b))(variables, batch)
    assert preds['final_boxes'].shape == (2, 32, 7)
    assert preds['final_scores'].shape == (2, 32)
    assert preds['final_labels'].shape == (2, 32)
    v = np.asarray(preds['final_valid'])
    s = np.asarray(preds['final_scores'])
    # invalid slots have zero score; valid slots exceed the score threshold
    assert (s[~v] == 0).all()
    if v.any():
        assert (s[v] > 0.1).all()


def test_target_assignment_marks_gt_anchors(detector_and_params):
    from glenet_tpu.models import target_assigner
    det, variables, batch = detector_and_params
    t = target_assigner.assign_targets(
        det.anchor_set, batch['gt_boxes'][0], batch['gt_mask'][0],
        batch['gt_uncertainty'][0], det.box_coder)
    labels = np.asarray(t.box_cls_labels)
    # every valid gt should force-match at least one anchor
    assert (labels > 0).sum() >= int(batch['gt_mask'][0].sum())
    # background dominates
    assert (labels == 0).sum() > 0.5 * labels.size
    # positives carry the gt uncertainty rows
    unc = np.asarray(t.label_uncertainty)
    assert (unc[labels > 0] == 1.0).all()
    assert (unc[labels == 0] == 0.0).all()
