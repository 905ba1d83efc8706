"""tools/train.py + tools/test.py end-to-end on the synthetic mini-KITTI
fixture with a tiny PointPillars config: train 2 epochs (checkpoints +
resume) then evaluate (KITTI AP runs)."""
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from test_kitti_dataset import DATASET_CFG, make_kitti_tree


def write_tiny_cfg(tmp_path, kitti_root):
    data_cfg = {k: v for k, v in DATASET_CFG.items()}
    data_cfg['DATA_PATH'] = str(kitti_root)
    data_cfg['MAX_POINTS_PER_SCENE'] = 4096
    data_cfg['DATA_PROCESSOR'] = [
        {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [0.4, 0.4, 4],
         'MAX_POINTS_PER_VOXEL': 16,
         'MAX_NUMBER_OF_VOXELS': {'train': 2048, 'test': 2048}},
    ]
    cfg = {
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': data_cfg,
        'MODEL': {
            'NAME': 'PointPillar',
            'VFE': {'NAME': 'PillarVFE', 'WITH_DISTANCE': False,
                    'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                    'NUM_FILTERS': [16]},
            'MAP_TO_BEV': {'NAME': 'PointPillarScatter',
                           'NUM_BEV_FEATURES': 16},
            'BACKBONE_2D': {'NAME': 'BaseBEVBackbone',
                            'LAYER_NUMS': [1, 1], 'LAYER_STRIDES': [1, 2],
                            'NUM_FILTERS': [16, 32],
                            'UPSAMPLE_STRIDES': [1, 2],
                            'NUM_UPSAMPLE_FILTERS': [16, 16]},
            'DENSE_HEAD': {
                'NAME': 'AnchorHeadSingle', 'CLASS_AGNOSTIC': False,
                'USE_DIRECTION_CLASSIFIER': True, 'DIR_OFFSET': 0.78539,
                'DIR_LIMIT_OFFSET': 0.0, 'NUM_DIR_BINS': 2,
                'ANCHOR_GENERATOR_CONFIG': [
                    {'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
                     'anchor_rotations': [0, 1.57],
                     'anchor_bottom_heights': [-1.78],
                     'align_center': False, 'feature_map_stride': 1,
                     'matched_threshold': 0.6, 'unmatched_threshold': 0.45}],
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
                'NMS_CONFIG': {'MULTI_CLASSES_NMS': False,
                               'NMS_TYPE': 'nms_gpu', 'NMS_THRESH': 0.01,
                               'NMS_PRE_MAXSIZE': 1024,
                               'NMS_POST_MAXSIZE': 64}},
        },
        'OPTIMIZATION': {
            'BATCH_SIZE_PER_GPU': 1, 'NUM_EPOCHS': 2,
            'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
            'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
            'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
        },
    }
    # make YAML-serializable (Cfg -> dict)
    import json
    cfg = json.loads(json.dumps(cfg))
    path = tmp_path / 'tiny_pp.yaml'
    path.write_text(yaml.safe_dump(cfg))
    return path


def _run_main(module_main, argv):
    import glenet_tpu.config as config_mod
    from glenet_tpu.config import Cfg
    # reset the global cfg between CLI invocations
    config_mod.cfg.clear()
    config_mod.cfg.update(Cfg({'ROOT_DIR': '.', 'LOCAL_RANK': 0}))
    old = sys.argv
    sys.argv = argv
    try:
        module_main()
    finally:
        sys.argv = old


@pytest.mark.slow
def test_train_and_eval_cli(tmp_path):
    rng = np.random.RandomState(3)
    kitti_root = make_kitti_tree(tmp_path, rng)
    from glenet_tpu.datasets.kitti_dataset import create_kitti_infos
    create_kitti_infos(DATASET_CFG, ['Car'], kitti_root, kitti_root)

    cfg_path = write_tiny_cfg(tmp_path, kitti_root)
    out_dir = tmp_path / 'out'

    from tools.train import main as train_main
    _run_main(train_main, [
        'train.py', '--cfg_file', str(cfg_path),
        '--output_dir', str(out_dir), '--epochs', '2',
        '--max_steps_per_epoch', '3'])
    ckpts = list((out_dir / 'ckpt').glob('checkpoint_epoch_*.msgpack'))
    assert len(ckpts) == 2

    # resume: epoch 2 -> 3 (+ exercise post-train BN re-estimation)
    _run_main(train_main, [
        'train.py', '--cfg_file', str(cfg_path),
        '--output_dir', str(out_dir), '--epochs', '3',
        '--max_steps_per_epoch', '3', '--bn_refresh', '2'])
    ckpts = list((out_dir / 'ckpt').glob('checkpoint_epoch_*.msgpack'))
    assert len(ckpts) == 3

    from tools.test import main as test_main
    _run_main(test_main, [
        'test.py', '--cfg_file', str(cfg_path),
        '--output_dir', str(out_dir), '--batch_size', '1'])
    assert (out_dir / 'eval').exists()
    results = list((out_dir / 'eval').rglob('result.pkl'))
    assert results, 'eval produced no result.pkl'


def write_caddn_cfg(tmp_path, kitti_root):
    """Tiny CaDDN config on the camera-equipped fixture tree."""
    data_cfg = {k: v for k, v in DATASET_CFG.items()}
    data_cfg['DATA_PATH'] = str(kitti_root)
    data_cfg['MAX_POINTS_PER_SCENE'] = 4096
    data_cfg['GET_ITEM_LIST'] = ['images', 'depth_maps', 'calib_matricies',
                                 'gt_boxes2d']
    data_cfg['IMAGE_PAD_TO'] = [96, 312]
    data_cfg['POINT_CLOUD_RANGE'] = [2, -16, -3.0, 45.2, 16, 1.0]
    data_cfg['DATA_PROCESSOR'] = [
        {'NAME': 'calculate_grid_size', 'VOXEL_SIZE': [0.8, 0.8, 0.5]},
        {'NAME': 'downsample_depth_map', 'DOWNSAMPLE_FACTOR': 4},
    ]
    data_cfg['DATA_AUGMENTOR'] = {
        'DISABLE_AUG_LIST': ['placeholder'],
        'AUG_CONFIG_LIST': [
            {'NAME': 'random_image_flip', 'ALONG_AXIS_LIST': ['horizontal']}],
    }
    from test_caddn import make_caddn_cfg
    model = make_caddn_cfg()['MODEL']
    cfg = {
        'CLASS_NAMES': ['Car'],
        'DATA_CONFIG': data_cfg,
        'MODEL': model,
        'OPTIMIZATION': {
            'BATCH_SIZE_PER_GPU': 1, 'NUM_EPOCHS': 1,
            'OPTIMIZER': 'adam_onecycle', 'LR': 0.001, 'WEIGHT_DECAY': 0.01,
            'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
            'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
        },
    }
    import json
    cfg = json.loads(json.dumps(cfg))
    path = tmp_path / 'tiny_caddn.yaml'
    path.write_text(yaml.safe_dump(cfg))
    return path


@pytest.mark.slow
def test_caddn_train_cli_camera_path(tmp_path):
    """tools/train.py drives the camera data path (images/depth/matrices
    through iter_batches -> shard_batch -> CaDDN loss) end-to-end."""
    from PIL import Image

    rng = np.random.RandomState(5)
    kitti_root = make_kitti_tree(tmp_path, rng)
    from glenet_tpu.datasets.kitti_dataset import create_kitti_infos
    create_kitti_infos(DATASET_CFG, ['Car'], kitti_root, kitti_root)
    h, w = 92, 310
    for d in ('image_2', 'depth_2'):
        (kitti_root / 'training' / d).mkdir(exist_ok=True)
    from test_kitti_dataset import N_FRAMES
    for f in range(N_FRAMES):
        fid = f'{f:06d}'
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            kitti_root / 'training/image_2' / f'{fid}.png')
        Image.fromarray((rng.uniform(2, 40, (h, w)) * 256).astype(np.int32),
                        mode='I').save(
            kitti_root / 'training/depth_2' / f'{fid}.png')

    cfg_path = write_caddn_cfg(tmp_path, kitti_root)
    out_dir = tmp_path / 'out_caddn'
    from tools.train import main as train_main
    _run_main(train_main, [
        'train.py', '--cfg_file', str(cfg_path),
        '--output_dir', str(out_dir), '--epochs', '1',
        '--max_steps_per_epoch', '2'])
    ckpts = list((out_dir / 'ckpt').glob('checkpoint_epoch_*.msgpack'))
    assert len(ckpts) == 1
