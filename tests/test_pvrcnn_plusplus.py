"""PV-RCNN++ end-to-end: CenterHead proposals -> SPC keypoint sampling ->
VectorPool VSA -> VectorPool roi grid pooling (reference
pv_rcnn_plusplus.py:9-53, waymo_models/pv_rcnn_plusplus.yaml)."""
import copy

import jax
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models.detectors import build_detector

from test_second import TINY_SECOND, make_batch


def make_pvpp_cfg():
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'PVRCNNPlusPlus'
    cfg.MODEL.DENSE_HEAD = Cfg({
        'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
        'CLASS_NAMES_EACH_HEAD': [['Car']],
        'SHARED_CONV_CHANNEL': 32,
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 8, 'NUM_MAX_OBJS': 100,
            'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
        'POST_PROCESSING': {'SCORE_THRESH': 0.0,
                            'MAX_OBJ_PER_SAMPLE': 64},
    })
    vp_group = {
        'NUM_GROUPS': 2, 'LOCAL_AGGREGATION_TYPE': 'local_interpolation',
        'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 8, 'MSG_POST_MLPS': [16],
        'FILTER_NEIGHBOR_WITH_ROI': True,
        'GROUP_CFG_0': {'NUM_LOCAL_VOXEL': [2, 2, 2],
                        'MAX_NEIGHBOR_DISTANCE': 0.4,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [8, 8]},
        'GROUP_CFG_1': {'NUM_LOCAL_VOXEL': [2, 2, 2],
                        'MAX_NEIGHBOR_DISTANCE': 0.8,
                        'NEIGHBOR_NSAMPLE': -1, 'POST_MLPS': [8, 8]},
    }
    cfg.MODEL.PFE = Cfg({
        'NAME': 'VoxelSetAbstraction',
        'POINT_SOURCE': 'raw_points', 'NUM_KEYPOINTS': 64,
        'NUM_OUTPUT_FEATURES': 32, 'SAMPLE_METHOD': 'SPC',
        'SPC_SAMPLING': {'NUM_SECTORS': 6, 'SAMPLE_RADIUS_WITH_ROI': 1.6},
        'FEATURES_SOURCE': ['bev', 'x_conv3', 'x_conv4', 'raw_points'],
        'SA_LAYER': {
            'raw_points': dict(vp_group, NAME='VectorPoolAggregationModuleMSG',
                               NUM_REDUCED_CHANNELS=1,
                               RADIUS_OF_NEIGHBOR_WITH_ROI=2.4),
            'x_conv3': dict(vp_group, NAME='VectorPoolAggregationModuleMSG',
                            DOWNSAMPLE_FACTOR=4, NUM_REDUCED_CHANNELS=16,
                            RADIUS_OF_NEIGHBOR_WITH_ROI=4.0),
            'x_conv4': dict(vp_group, NAME='VectorPoolAggregationModuleMSG',
                            DOWNSAMPLE_FACTOR=8, NUM_REDUCED_CHANNELS=16,
                            RADIUS_OF_NEIGHBOR_WITH_ROI=6.4),
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
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 64,
                      'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 64,
                     'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                     'SCORE_THRESH': 0.0}},
        'ROI_GRID_POOL': {
            'GRID_SIZE': 3,
            'NAME': 'VectorPoolAggregationModuleMSG',
            'NUM_GROUPS': 2,
            'LOCAL_AGGREGATION_TYPE': 'voxel_random_choice',
            'NUM_REDUCED_CHANNELS': 16,
            'NUM_CHANNELS_OF_LOCAL_AGGREGATION': 8,
            'MSG_POST_MLPS': [16],
            'GROUP_CFG_0': {'NUM_LOCAL_VOXEL': [3, 3, 3],
                            'MAX_NEIGHBOR_DISTANCE': 0.8,
                            'NEIGHBOR_NSAMPLE': 32, 'POST_MLPS': [8, 8]},
            'GROUP_CFG_1': {'NUM_LOCAL_VOXEL': [3, 3, 3],
                            'MAX_NEIGHBOR_DISTANCE': 1.6,
                            'NEIGHBOR_NSAMPLE': 32, 'POST_MLPS': [8, 8]}},
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
def test_pvrcnn_plusplus_trains_and_predicts(rng):
    cfg = make_pvpp_cfg()
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

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


def test_pvpp_full_config_parses():
    from pathlib import Path
    from glenet_tpu.config import cfg_from_yaml_file
    root = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(root / 'configs/waymo_models/pv_rcnn_plusplus.yaml'))
    assert cfg.MODEL.NAME == 'PVRCNNPlusPlus'
    assert cfg.MODEL.PFE.SAMPLE_METHOD == 'SPC'
    assert cfg.MODEL.ROI_HEAD.ROI_GRID_POOL.NAME == \
        'VectorPoolAggregationModuleMSG'
