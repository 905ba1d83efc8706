"""Raw Waymo extraction plumbing (glenet_tpu/datasets/waymo_raw.py) with a
fake SDK: per-frame assembly, sequence pkl/npy layout, schema validator,
and end-to-end consumption by WaymoDataset.get_lidar.

The TF/SDK seams (_iter_frames, extract_points) are injected; everything
below them is the real production code path."""
import pickle
import types

import numpy as np
import pytest

from glenet_tpu.datasets import waymo_raw


class _Box:
    def __init__(self, cx, cy, cz, l, w, h, heading):
        (self.center_x, self.center_y, self.center_z,
         self.length, self.width, self.height, self.heading) = (
            cx, cy, cz, l, w, h, heading)


class _Label:
    def __init__(self, box, typ, idx, npts):
        self.box = box
        self.type = typ
        self.id = f'obj_{idx}'
        self.detection_difficulty_level = 0
        self.tracking_difficulty_level = 1
        self.num_lidar_points_in_box = npts


def make_fake_frame(seed, n_labels=3):
    rng = np.random.RandomState(seed)
    frame = types.SimpleNamespace()
    frame.context = types.SimpleNamespace(
        name=f'ctx_{seed}',
        camera_calibrations=[types.SimpleNamespace(width=1920, height=1280)
                             for _ in range(5)])
    frame.timestamp_micros = 1700000000000000 + seed
    frame.pose = types.SimpleNamespace(
        transform=np.eye(4, dtype=np.float32).reshape(-1).tolist())
    # label types: 1=Vehicle, 2=Pedestrian, 0=unknown (must be dropped)
    types_cycle = [1, 2, 0, 4]
    frame.laser_labels = [
        _Label(_Box(*rng.uniform(1, 20, 3), *rng.uniform(1, 4, 3),
                    rng.uniform(-np.pi, np.pi)),
               types_cycle[i % 4], i, int(rng.randint(5, 50)))
        for i in range(n_labels)]
    return frame


def fake_extract_points(frame, use_two_returns=True):
    rng = np.random.RandomState(frame.timestamp_micros % 2**31)
    counts = [int(rng.randint(50, 200)) for _ in range(5)]
    pts = np.concatenate(
        [rng.randn(c, 6).astype(np.float32) for c in counts], 0)
    pts[:, 5] = -1.0          # NLZ flag: -1 = outside no-label zone
    return pts, counts


def _extract(tmp_path, n_frames=4, sampled_interval=1):
    frames = [make_fake_frame(s, n_labels=3 + s % 2)
              for s in range(n_frames)]
    return waymo_raw.process_single_sequence(
        tmp_path / 'segment-001.tfrecord', tmp_path / 'processed',
        sampled_interval=sampled_interval,
        frame_iter=iter(frames), point_extractor=fake_extract_points)


def test_sequence_layout_and_validator(tmp_path):
    infos = _extract(tmp_path)
    seq_dir = tmp_path / 'processed' / 'segment-001'
    assert (seq_dir / 'segment-001.pkl').exists()
    assert len(infos) == 4
    got = waymo_raw.validate_sequence_dir(seq_dir)
    assert [i['frame_id'] for i in got] == \
        [f'segment-001_{i:03d}' for i in range(4)]
    # unknown-class labels dropped, annos aligned
    for info in got:
        assert np.all(info['annos']['name'] != 'unknown')
        n = len(info['annos']['name'])
        assert info['annos']['num_points_in_gt'].shape == (n,)


def test_sampled_interval_subsamples(tmp_path):
    infos = _extract(tmp_path, n_frames=6, sampled_interval=2)
    assert [i['point_cloud']['sample_idx'] for i in infos] == [0, 2, 4]
    seq_dir = tmp_path / 'processed' / 'segment-001'
    assert (seq_dir / '0002.npy').exists()
    assert not (seq_dir / '0001.npy').exists()


def test_reextraction_skips(tmp_path):
    first = _extract(tmp_path)
    # second call must load the pkl without touching the (absent) iterator
    again = waymo_raw.process_single_sequence(
        tmp_path / 'segment-001.tfrecord', tmp_path / 'processed',
        frame_iter=None, point_extractor=None)
    assert [i['frame_id'] for i in again] == [i['frame_id'] for i in first]


def test_generate_labels_box_schema():
    frame = make_fake_frame(7, n_labels=8)
    annos = waymo_raw.generate_labels(frame)
    n = len(annos['name'])
    assert n == 6          # 2 of 8 are type 0 = unknown
    np.testing.assert_allclose(
        annos['gt_boxes_lidar'][:, :3], annos['location'])
    np.testing.assert_allclose(
        annos['gt_boxes_lidar'][:, 3:6], annos['dimensions'])
    np.testing.assert_allclose(
        annos['gt_boxes_lidar'][:, 6], annos['heading_angles'])


def test_validator_rejects_bad_points(tmp_path):
    _extract(tmp_path)
    seq_dir = tmp_path / 'processed' / 'segment-001'
    np.save(str(seq_dir / '0001.npy'),
            np.zeros((10, 4), np.float32))          # wrong width
    with pytest.raises(AssertionError, match='x y z i e nlz'):
        waymo_raw.validate_sequence_dir(seq_dir)


def test_waymo_dataset_consumes_extraction(tmp_path):
    """End-to-end: WaymoDataset reads the extracted layout directly."""
    from glenet_tpu.config import Cfg
    from glenet_tpu.datasets.waymo_dataset import WaymoDataset

    _extract(tmp_path)
    root = tmp_path
    (root / 'ImageSets').mkdir(exist_ok=True)
    (root / 'ImageSets' / 'val.txt').write_text('segment-001.tfrecord\n')
    cfg = Cfg({
        'DATA_PATH': str(root),
        'PROCESSED_DATA_TAG': 'processed',
        'DATA_SPLIT': {'train': 'train', 'test': 'val'},
        'POINT_CLOUD_RANGE': [-75.2, -75.2, -2, 75.2, 75.2, 4],
        'MAX_POINTS_PER_SCENE': 2000,
        'MAX_GT_PER_SCENE': 16,
        'SAMPLED_INTERVAL': {'train': 1, 'test': 1},
        'POINT_FEATURE_ENCODING': {
            'used_feature_list': ['x', 'y', 'z', 'intensity', 'elongation'],
            'src_feature_list': ['x', 'y', 'z', 'intensity', 'elongation'],
        },
        'DATA_PROCESSOR': [],
    })
    ds = WaymoDataset(cfg, ['Vehicle', 'Pedestrian', 'Cyclist'],
                      training=False, root_path=str(root))
    assert len(ds) == 4
    item = ds[0]
    assert item['points'].shape[1] == 5      # NLZ column consumed
    assert item['gt_boxes'].shape[1] == 8    # 7 box dims + class id
