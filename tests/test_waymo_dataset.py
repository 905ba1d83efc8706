"""Waymo adapter on a synthetic processed-data tree: info loading with
interval subsampling, fixed-shape items, gt database, kitti-format eval."""
import pickle

import numpy as np
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.datasets.waymo_dataset import WaymoDataset
from glenet_tpu.datasets.waymo_utils import transform_annos_to_kitti_format

CFG = Cfg({
    'DATASET': 'WaymoDataset',
    'DATA_PATH': 'unused',
    'PROCESSED_DATA_TAG': 'waymo_processed_data',
    'POINT_CLOUD_RANGE': [-75.2, -75.2, -2, 75.2, 75.2, 4],
    'DATA_SPLIT': {'train': 'train', 'test': 'val'},
    'SAMPLED_INTERVAL': {'train': 2, 'test': 1},
    'MAX_POINTS_PER_SCENE': 8192,
    'MAX_GT_PER_SCENE': 32,
    'POINT_FEATURE_ENCODING': {
        'encoding_type': 'absolute_coordinates_encoding',
        'used_feature_list': ['x', 'y', 'z', 'intensity', 'elongation'],
        'src_feature_list': ['x', 'y', 'z', 'intensity', 'elongation']},
    'DATA_PROCESSOR': [],
})


def make_waymo_tree(tmp_path, rng, n_seq=2, frames_per_seq=4):
    root = tmp_path / 'waymo'
    (root / 'ImageSets').mkdir(parents=True)
    seq_names = []
    for s in range(n_seq):
        seq = f'segment-{s:05d}'
        seq_names.append(seq + '.tfrecord')
        seq_dir = root / 'waymo_processed_data' / seq
        seq_dir.mkdir(parents=True)
        infos = []
        for f in range(frames_per_seq):
            n = rng.randint(3000, 5000)
            pts = np.zeros((n, 6), np.float32)
            pts[:, 0] = rng.uniform(-70, 70, n)
            pts[:, 1] = rng.uniform(-70, 70, n)
            pts[:, 2] = rng.uniform(-1, 3, n)
            pts[:, 5] = -1  # not in NLZ
            np.save(str(seq_dir / f'{f:04d}.npy'), pts)
            m = 3
            boxes = np.zeros((m, 9), np.float32)
            boxes[:, 0:2] = rng.uniform(-50, 50, (m, 2))
            boxes[:, 2] = 1.0
            boxes[:, 3:6] = [4.7, 2.1, 1.7]
            boxes[:, 6] = rng.uniform(-np.pi, np.pi, m)
            infos.append({
                'frame_id': f'{seq}_{f:03d}',
                'point_cloud': {'lidar_sequence': seq, 'sample_idx': f},
                'annos': {
                    'name': np.array(['Vehicle', 'Pedestrian', 'Vehicle']),
                    'gt_boxes_lidar': boxes,
                    'difficulty': np.zeros(m, np.int32),
                },
            })
        with open(seq_dir / f'{seq}.pkl', 'wb') as fh:
            pickle.dump(infos, fh)
    (root / 'ImageSets/train.txt').write_text('\n'.join(seq_names) + '\n')
    (root / 'ImageSets/val.txt').write_text(seq_names[0] + '\n')
    return root


def test_loading_and_interval(tmp_path, rng):
    root = make_waymo_tree(tmp_path, rng)
    ds = WaymoDataset(CFG, ['Vehicle'], training=True, root_path=root)
    # 2 sequences x 4 frames, interval 2 -> 4
    assert len(ds) == 4
    item = ds[0]
    assert item['points'].shape == (8192, 5)
    assert item['gt_boxes'].shape == (32, 8)
    # only Vehicle kept (class filter)
    n_gt = int(item['gt_mask'].sum())
    assert n_gt == 2
    assert (item['gt_boxes'][:n_gt, 7] == 1).all()


def test_gt_database(tmp_path, rng):
    root = make_waymo_tree(tmp_path, rng)
    ds = WaymoDataset(CFG, ['Vehicle'], training=True, root_path=root)
    db = ds.create_groundtruth_database(used_classes=['Vehicle'])
    assert 'Vehicle' in db and len(db['Vehicle']) == 2 * len(ds.infos)


def test_kitti_format_eval_roundtrip(tmp_path, rng):
    root = make_waymo_tree(tmp_path, rng)
    ds = WaymoDataset(CFG, ['Vehicle'], training=False, root_path=root)
    # perfect predictions
    det_annos = []
    for info in ds.infos:
        boxes = info['annos']['gt_boxes_lidar'][:, :7]
        names = info['annos']['name']
        keep = names == 'Vehicle'
        det_annos.append({
            'name': names[keep],
            'boxes_lidar': boxes[keep],
            'score': np.full(int(keep.sum()), 0.9),
            'frame_id': info['frame_id'],
        })
    result_str, ret = ds.evaluation(det_annos, ['Vehicle'])
    assert ret['OBJECT_TYPE_TYPE_VEHICLE_LEVEL_2/AP'] > 99.0, result_str

    result_str, ret = ds.evaluation(det_annos, ['Vehicle'],
                                    eval_metric='kitti')
    assert 'Car_3d/moderate_R11' in ret
    assert ret['Car_3d/moderate_R11'] > 0, result_str


def test_transform_annos_to_kitti_format():
    anno = {'name': np.array(['Vehicle']),
            'boxes_lidar': np.array([[10.0, 5.0, 1.0, 4.7, 2.1, 1.7, 0.3]]),
            'score': np.array([0.5])}
    out = transform_annos_to_kitti_format(anno, map_name_to_kitti=True)
    assert out['name'][0] == 'Car'
    # camera-frame location: x=-y, y=-z_bottom, z=x
    np.testing.assert_allclose(out['location'][0],
                               [-5.0, -(1.0 - 0.85), 10.0], atol=1e-5)
    assert out['dimensions'].shape == (1, 3)
