"""Full host data pipeline on a synthetic mini-KITTI tree: info generation,
gt-database creation, augmented training items, fixed-shape collation, and
prediction-dict round trip into the evaluator."""
import copy
import pickle

import numpy as np
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.datasets.kitti_dataset import KittiDataset, create_kitti_infos
from glenet_tpu.utils import calibration_kitti

N_FRAMES = 4

CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 0 0 700 180 0 0 0 1 0
P3: 700 0 600 0 0 700 180 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0
"""


def make_kitti_tree(tmp_path, rng):
    root = tmp_path / 'kitti'
    for sub in ('velodyne', 'label_2', 'calib', 'planes'):
        (root / 'training' / sub).mkdir(parents=True)
    (root / 'ImageSets').mkdir()
    calib = calibration_kitti.dummy_calibration()

    train_ids, val_ids = [], []
    for f in range(N_FRAMES):
        fid = f'{f:06d}'
        (train_ids if f < N_FRAMES - 1 else val_ids).append(fid)
        # scene points: ground plane + 2 car clusters
        n = 4000
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = rng.uniform(2, 69, n)
        pts[:, 1] = rng.uniform(-20, 20, n)
        pts[:, 2] = rng.uniform(-1.8, -1.6, n)
        labels = []
        for g in range(2):
            cx = rng.uniform(8, 40)
            cy = rng.uniform(-8, 8)
            heading = rng.uniform(-1.5, 1.5)
            box_lidar = np.array([cx, cy, -1.0, 3.9, 1.6, 1.56, heading])
            sl = slice(g * 300, (g + 1) * 300)
            pts[sl, 0] = cx + rng.uniform(-1.5, 1.5, 300)
            pts[sl, 1] = cy + rng.uniform(-0.7, 0.7, 300)
            pts[sl, 2] = -1.0 + rng.uniform(-0.7, 0.7, 300)
            # camera-frame label
            from glenet_tpu.utils import box_utils
            cam = box_utils.boxes3d_lidar_to_kitti_camera(
                box_lidar[None], calib)[0]
            img_box = box_utils.boxes3d_kitti_camera_to_imageboxes(
                cam[None], calib)[0]
            # ensure a reasonable 2D height so difficulty is valid
            labels.append(
                f"Car 0.0 0 {0.0:.2f} "
                f"{img_box[0]:.2f} {img_box[1]:.2f} {img_box[2]:.2f} {img_box[3]:.2f} "
                f"{cam[4]:.2f} {cam[5]:.2f} {cam[3]:.2f} "
                f"{cam[0]:.2f} {cam[1]:.2f} {cam[2]:.2f} {cam[6]:.2f}")
        pts.astype(np.float32).tofile(str(root / 'training/velodyne' / f'{fid}.bin'))
        (root / 'training/label_2' / f'{fid}.txt').write_text('\n'.join(labels) + '\n')
        (root / 'training/calib' / f'{fid}.txt').write_text(CALIB_TXT)
        (root / 'training/planes' / f'{fid}.txt').write_text(
            '# plane\nWidth 4\nHeight 1\n0 -1 0 1.73\n')
    (root / 'ImageSets/train.txt').write_text('\n'.join(train_ids) + '\n')
    (root / 'ImageSets/val.txt').write_text('\n'.join(val_ids) + '\n')
    return root


DATASET_CFG = Cfg({
    'DATASET': 'KittiDataset',
    'DATA_PATH': 'unused',
    'POINT_CLOUD_RANGE': [0, -40, -3, 70.4, 40, 1],
    'DATA_SPLIT': {'train': 'train', 'test': 'val'},
    'INFO_PATH': {'train': ['kitti_infos_train.pkl'],
                  'test': ['kitti_infos_val.pkl']},
    'FOV_POINTS_ONLY': True,
    'MAX_POINTS_PER_SCENE': 8192,
    'MAX_GT_PER_SCENE': 32,
    'POINT_FEATURE_ENCODING': {
        'encoding_type': 'absolute_coordinates_encoding',
        'used_feature_list': ['x', 'y', 'z', 'intensity'],
        'src_feature_list': ['x', 'y', 'z', 'intensity']},
    'DATA_PROCESSOR': [
        {'NAME': 'mask_points_and_boxes_outside_range',
         'REMOVE_OUTSIDE_BOXES': True},
        {'NAME': 'shuffle_points', 'SHUFFLE_ENABLED': {'train': True,
                                                       'test': False}},
        {'NAME': 'transform_points_to_voxels', 'VOXEL_SIZE': [0.05, 0.05, 0.1],
         'MAX_POINTS_PER_VOXEL': 5,
         'MAX_NUMBER_OF_VOXELS': {'train': 16000, 'test': 16000}},
    ],
    'DATA_AUGMENTOR': {
        'DISABLE_AUG_LIST': ['placeholder'],
        'AUG_CONFIG_LIST': [
            {'NAME': 'gt_sampling', 'USE_ROAD_PLANE': True,
             'DB_INFO_PATH': ['kitti_dbinfos_train.pkl'],
             'PREPARE': {'filter_by_min_points': ['Car:5'],
                         'filter_by_difficulty': [-1]},
             'SAMPLE_GROUPS': ['Car:6'], 'NUM_POINT_FEATURES': 4,
             'DATABASE_WITH_FAKELIDAR': False,
             'REMOVE_EXTRA_WIDTH': [0.0, 0.0, 0.0],
             'LIMIT_WHOLE_SCENE': False},
            {'NAME': 'random_world_flip', 'ALONG_AXIS_LIST': ['x']},
            {'NAME': 'random_world_rotation',
             'WORLD_ROT_ANGLE': [-0.78539816, 0.78539816]},
            {'NAME': 'random_world_scaling',
             'WORLD_SCALE_RANGE': [0.95, 1.05]},
        ],
    },
})


@pytest.fixture(scope='module')
def kitti_root(tmp_path_factory):
    rng = np.random.RandomState(7)
    root = make_kitti_tree(tmp_path_factory.mktemp('kitti_data'), rng)
    create_kitti_infos(DATASET_CFG, ['Car'], root, root)
    return root


def test_infos_created(kitti_root):
    with open(kitti_root / 'kitti_infos_train.pkl', 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == N_FRAMES - 1
    annos = infos[0]['annos']
    assert set(annos) >= {'name', 'bbox', 'dimensions', 'location',
                          'rotation_y', 'gt_boxes_lidar', 'num_points_in_gt',
                          'difficulty', 'index'}
    assert (annos['num_points_in_gt'] > 100).all()
    # lidar boxes roundtrip close to original centers
    assert np.all(np.abs(annos['gt_boxes_lidar'][:, 2] + 1.0) < 0.1)


def test_gt_database_created(kitti_root):
    with open(kitti_root / 'kitti_dbinfos_train.pkl', 'rb') as f:
        db = pickle.load(f)
    assert 'Car' in db and len(db['Car']) == 2 * (N_FRAMES - 1)
    info = db['Car'][0]
    pts = np.fromfile(str(kitti_root / info['path']),
                      np.float32).reshape(-1, 4)
    assert len(pts) == info['num_points_in_gt']
    # crop points are box-centered
    assert np.abs(pts[:, :2]).max() < 3.0


def test_train_item_fixed_shapes(kitti_root):
    ds = KittiDataset(DATASET_CFG, ['Car'], training=True,
                      root_path=kitti_root, seed=0)
    item = ds[0]
    assert item['points'].shape == (8192, 4)
    assert item['gt_boxes'].shape == (32, 8)
    assert item['gt_uncertainty'].shape == (32, 7)
    n_gt = item['gt_mask'].sum()
    assert n_gt >= 2  # originals + gt-sampled
    # sampled objects carry -1 uncertainty placeholders (no CVAE yet)
    assert (item['gt_uncertainty'][item['gt_mask']] == -1).all()
    # class column is 1 (Car)
    assert (item['gt_boxes'][item['gt_mask']][:, 7] == 1).all()
    batch = ds.collate_batch([ds[0], ds[1]])
    assert batch['points'].shape == (2, 8192, 4)


def test_eval_roundtrip_perfect_predictions(kitti_root):
    ds = KittiDataset(DATASET_CFG, ['Car'], training=False,
                      root_path=kitti_root)
    assert len(ds) == 1
    info = ds.kitti_infos[0]
    gt_lidar = info['annos']['gt_boxes_lidar']
    k = 8
    boxes = np.zeros((1, k, 7), np.float32)
    boxes[0, :len(gt_lidar)] = gt_lidar
    valid = np.zeros((1, k), bool)
    valid[0, :len(gt_lidar)] = True
    preds = {
        'final_boxes': boxes,
        'final_scores': np.where(valid, 0.9, 0.0),
        'final_labels': np.where(valid, 1, 0),
        'final_valid': valid,
    }
    batch = ds.collate_batch([ds[0]])
    det_annos = ds.generate_prediction_dicts(batch, preds)
    assert det_annos[0]['name'].tolist() == ['Car', 'Car']
    # camera-frame round trip: location should match the original labels
    np.testing.assert_allclose(det_annos[0]['location'],
                               info['annos']['location'][:2], atol=1e-3)
    result_str, ret = ds.evaluation(det_annos, ['Car'])
    # with 2 gts only, AP can't reach 100 (41-point metric), but recall
    # should be perfect at some threshold -> AP must be > 0
    assert ret['Car_3d/moderate_R11'] > 0, result_str


def test_dataset_registry(kitti_root):
    """build_dataset dispatches on DATA_CONFIG.DATASET (reference
    datasets/__init__.py:47-76)."""
    from glenet_tpu.datasets import build_dataset
    cfg = copy.deepcopy(DATASET_CFG)
    cfg.DATA_PATH = str(kitti_root)
    ds = build_dataset(cfg, ['Car'], training=False)
    assert type(ds).__name__ == 'KittiDataset'
    assert len(ds) > 0
    with pytest.raises(NotImplementedError):
        bad = copy.deepcopy(cfg)
        bad.DATASET = 'NopeDataset'
        build_dataset(bad, ['Car'])


def test_iter_batches_per_host_sharding(kitti_root):
    """Two virtual hosts see disjoint frames; reinterleaving the per-host
    anno lists reconstructs dataset order (the tools/test.py merge)."""
    from glenet_tpu.datasets import build_dataset
    cfg = copy.deepcopy(DATASET_CFG)
    cfg.DATA_PATH = str(kitti_root)
    ds = build_dataset(cfg, ['Car'], training=False)
    world = 2

    def frames_of(rank):
        out = []
        n_local = (len(ds) + world - 1 - rank) // world
        n = 0
        for batch in ds.iter_batches(1, shuffle=False, drop_last=False,
                                     process_rank=rank, process_count=world):
            n_real = min(1, n_local - n)
            out.extend(list(batch['frame_id'][:n_real]))
            n += n_real
            if n >= n_local:
                break
        return out

    parts = [frames_of(0), frames_of(1)]
    assert not (set(parts[0]) & set(parts[1]))
    merged = [parts[i % world][i // world] for i in range(len(ds))]
    all_frames = []
    for batch in ds.iter_batches(1, shuffle=False, drop_last=False):
        all_frames.extend(list(batch['frame_id'][:1]))
        if len(all_frames) >= len(ds):
            break
    assert merged == all_frames[:len(ds)]


def test_sample_points_near_far():
    """Reference data_processor.py:154-184: far (>=40m) points always kept
    when the budget allows; output exactly num_points; oversampling repeats."""
    from glenet_tpu.datasets.processor import sample_points_near_far
    rng = np.random.RandomState(0)
    near = np.concatenate([rng.uniform(1, 30, (100, 3)),
                           np.zeros((100, 1))], 1)
    far = np.concatenate([rng.uniform(50, 70, (20, 3)),
                          np.ones((20, 1))], 1)
    pts = np.concatenate([near, far]).astype(np.float32)
    out = sample_points_near_far(pts, 60, rng)
    assert out.shape == (60, 4)
    assert (out[:, 3] == 1).sum() == 20       # all far points kept
    out2 = sample_points_near_far(pts, 150, rng)
    assert out2.shape == (150, 4)             # oversample with repeats
    assert sample_points_near_far(pts, -1, rng).shape == pts.shape


def test_camera_items_caddn_path(kitti_root):
    """GET_ITEM_LIST camera support (CaDDN): images/depth/calib matrices/
    gt_boxes2d flow through prepare_data filters, static padding, and
    collate (reference kitti_dataset.py __getitem__ camera items)."""
    from PIL import Image

    h, w = 92, 310                        # odd sizes: exercise the pad path
    rng = np.random.RandomState(3)
    for png_dir in ('image_2', 'depth_2'):
        (kitti_root / 'training' / png_dir).mkdir(exist_ok=True)
    for f in range(N_FRAMES):
        fid = f'{f:06d}'
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            kitti_root / 'training/image_2' / f'{fid}.png')
        depth = (rng.uniform(2, 40, (h, w)) * 256).astype(np.uint32)
        Image.fromarray(depth.astype(np.int32), mode='I').save(
            kitti_root / 'training/depth_2' / f'{fid}.png')

    cfg = copy.deepcopy(DATASET_CFG)
    cfg.GET_ITEM_LIST = ['images', 'depth_maps', 'calib_matricies',
                         'gt_boxes2d']
    cfg.IMAGE_PAD_TO = [96, 312]
    cfg.DATA_PROCESSOR.append(
        Cfg({'NAME': 'downsample_depth_map', 'DOWNSAMPLE_FACTOR': 4}))
    cfg.DATA_AUGMENTOR = Cfg({
        'DISABLE_AUG_LIST': ['placeholder'],
        'AUG_CONFIG_LIST': [
            {'NAME': 'random_image_flip', 'ALONG_AXIS_LIST': ['horizontal']},
        ]})
    ds = KittiDataset(cfg, ['Car'], training=True, root_path=kitti_root,
                      seed=0)
    item = ds[0]
    assert item['images'].shape == (96, 312, 3)
    assert item['images'].dtype == np.float32
    assert 0.0 <= item['images'].max() <= 1.0
    assert item['depth_maps'].shape == (24, 78)
    # padded rows diluted; interior block-means stay in metric range
    assert 2.0 <= item['depth_maps'][:22, :76].min() \
        and item['depth_maps'].max() <= 40.1
    assert tuple(item['image_shape']) == (h, w)
    assert item['trans_lidar_to_cam'].shape == (4, 4)
    assert item['trans_cam_to_img'].shape == (3, 4)
    # fg boxes at feature-map (1/4) scale: y coords (horizontal-flip
    # invariant) must equal the raw anno bbox / 4 (the fixture labels
    # project through the full-scale calib, so they can exceed the tiny
    # test image — the scale contract is what matters here)
    b2d = item['gt_boxes2d'][item['gt_boxes2d_mask']]
    assert len(b2d) > 0
    assert (b2d[:, 2] > b2d[:, 0]).all() and (b2d[:, 3] > b2d[:, 1]).all()
    with open(kitti_root / 'kitti_infos_train.pkl', 'rb') as fh:
        raw_bbox = pickle.load(fh)[0]["annos"]["bbox"]
    np.testing.assert_allclose(np.sort(b2d[:, 1]),
                               np.sort(raw_bbox[:, 1] / 4.0), rtol=1e-5)
    np.testing.assert_allclose(np.sort(b2d[:, 3]),
                               np.sort(raw_bbox[:, 3] / 4.0), rtol=1e-5)

    batch = next(ds.iter_batches(batch_size=2, shuffle=False))
    assert batch['images'].shape == (2, 96, 312, 3)
    assert batch['depth_maps'].shape == (2, 24, 78)
    assert batch['gt_boxes2d'].shape[0] == 2
    assert batch['trans_lidar_to_cam'].shape == (2, 4, 4)
