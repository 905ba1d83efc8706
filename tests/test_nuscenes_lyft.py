"""NuScenes / Lyft / Pandaset adapters on synthetic info pickles:
sweep-merged loading, fixed-shape items, and the NDS / Lyft-mAP /
kitti-format evaluators."""
import pickle

import numpy as np
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.datasets import build_dataset

CLASSES = ['car', 'pedestrian']


def make_nusc_tree(tmp_path, rng, n_frames=4):
    (tmp_path / 'samples').mkdir(exist_ok=True)
    infos = []
    for i in range(n_frames):
        n_pts = 2000
        pts = np.zeros((n_pts, 5), np.float32)
        pts[:, 0] = rng.uniform(-40, 40, n_pts)
        pts[:, 1] = rng.uniform(-40, 40, n_pts)
        pts[:, 2] = rng.uniform(-2, 1, n_pts)
        path = f'samples/frame_{i}.bin'
        pts.tofile(str(tmp_path / path))
        # one sweep referencing the same file with identity transform
        sweep = {'lidar_path': path, 'transform_matrix': np.eye(4),
                 'time_lag': 0.05}
        n_gt = rng.randint(2, 5)
        gt = np.zeros((n_gt, 9), np.float32)
        gt[:, 0] = rng.uniform(-30, 30, n_gt)
        gt[:, 1] = rng.uniform(-30, 30, n_gt)
        gt[:, 3:6] = [4.5, 1.9, 1.6]
        gt[:, 6] = rng.uniform(-np.pi, np.pi, n_gt)
        infos.append({
            'lidar_path': path, 'token': f'tok{i}', 'sweeps': [sweep],
            'gt_boxes': gt,
            'gt_names': np.array(['car'] * (n_gt - 1) + ['pedestrian']),
            'num_lidar_pts': np.full(n_gt, 30),
        })
    with open(tmp_path / 'nuscenes_infos_val.pkl', 'wb') as f:
        pickle.dump(infos, f)
    return infos


def nusc_cfg(path):
    return Cfg({
        'DATASET': 'NuScenesDataset', 'DATA_PATH': str(path),
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'INFO_PATH': {'train': ['nuscenes_infos_val.pkl'],
                      'test': ['nuscenes_infos_val.pkl']},
        'POINT_CLOUD_RANGE': [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0],
        'MAX_SWEEPS': 2, 'MAX_POINTS_PER_SCENE': 8192,
        'MAX_GT_PER_SCENE': 32,
        'POINT_FEATURE_ENCODING': {
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'timestamp']},
        'FILTER_MIN_POINTS_IN_GT': 1,
    })


def test_nuscenes_item_and_sweeps(tmp_path, rng):
    infos = make_nusc_tree(tmp_path, rng)
    ds = build_dataset(nusc_cfg(tmp_path), CLASSES, training=False)
    assert len(ds) == len(infos)
    item = ds[0]
    assert item['points'].shape == (8192, 5)
    assert item['points_mask'].sum() > 2000          # sweep merged in
    assert item['gt_boxes'].shape == (32, 8)
    assert item['gt_mask'].sum() == len(infos[0]['gt_names'])


def test_nuscenes_eval_perfect_and_shifted(tmp_path, rng):
    infos = make_nusc_tree(tmp_path, rng)
    ds = build_dataset(nusc_cfg(tmp_path), CLASSES, training=False)
    dets = [{'name': np.asarray(i['gt_names']),
             'boxes_lidar': np.asarray(i['gt_boxes'])[:, :7],
             'score': np.full(len(i['gt_names']), 0.9)} for i in infos]
    _, ret = ds.evaluation(dets, CLASSES)
    assert ret['mAP'] > 95.0
    assert ret['NDS'] > 95.0
    assert ret['mATE'] < 0.01 and ret['mAOE'] < 0.01

    # 1.5 m center shift: fails the 0.5/1.0 m thresholds, passes 2/4 m
    dets2 = []
    for d in dets:
        b = d['boxes_lidar'].copy()
        b[:, 0] += 1.5
        dets2.append({**d, 'boxes_lidar': b})
    _, ret2 = ds.evaluation(dets2, CLASSES)
    assert ret2['car_AP_0.5'] < 1.0
    assert ret2['car_AP_4.0'] > 95.0
    assert 30.0 < ret2['mAP'] < 70.0
    assert 0.1 < ret2['mATE'] < 2.0


def test_lyft_eval(tmp_path, rng):
    infos = make_nusc_tree(tmp_path, rng)
    cfg = nusc_cfg(tmp_path)
    cfg.DATASET = 'LyftDataset'
    ds = build_dataset(cfg, CLASSES, training=False)
    dets = [{'name': np.asarray(i['gt_names']),
             'boxes_lidar': np.asarray(i['gt_boxes'])[:, :7],
             'score': np.full(len(i['gt_names']), 0.9)} for i in infos]
    _, ret = ds.evaluation(dets, CLASSES)
    assert ret['mAP'] > 95.0
    # slightly perturbed boxes lose the high-IoU thresholds
    dets2 = []
    for d in dets:
        b = d['boxes_lidar'].copy()
        b[:, 3:6] *= 0.85
        dets2.append({**d, 'boxes_lidar': b})
    _, ret2 = ds.evaluation(dets2, CLASSES)
    assert ret2['mAP'] < ret['mAP'] - 5.0


def test_pandaset_adapter(tmp_path, rng):
    infos = make_nusc_tree(tmp_path, rng)
    cfg = nusc_cfg(tmp_path)
    cfg.DATASET = 'PandasetDataset'
    # pandaset points are (N, 4)
    cfg.POINT_FEATURE_ENCODING = {
        'used_feature_list': ['x', 'y', 'z', 'intensity'],
        'src_feature_list': ['x', 'y', 'z', 'intensity']}
    ds = build_dataset(cfg, CLASSES, training=False)
    item = ds[0]
    assert item['points'].shape == (8192, 4)
    dets = [{'name': np.asarray(i['gt_names']),
             'boxes_lidar': np.asarray(i['gt_boxes'])[:, :7],
             'score': np.full(len(i['gt_names']), 0.9)} for i in infos]
    result_str, ret = ds.evaluation(dets, ['car'])
    assert 'Car_3d/moderate_R11' in ret
