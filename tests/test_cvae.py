"""CVAE subsystem end-to-end: synthetic gt-database -> K-fold train ->
multi-pass prediction -> uncertainty mapping -> info injection."""
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.cvae import dataset as ds_lib
from glenet_tpu.cvae import pipeline
from glenet_tpu.cvae.model import CVAEGenerator, cvae_loss

TINY_CFG = Cfg({
    'CLASS_NAMES': ['Car'],
    'DATA_CONFIG': {
        'DATA_PATH': 'unused',
        'FORCE_RATIO': 0.0, 'FORCE_NUM': 30,
        'ENABLE_FLIP': True,
        'RANDOM_SCALE_RANGE': [0.95, 1.05],
        'ANGLE_ROT_MAX': 0.78539816,
    },
    'OPTIMIZATION': {
        'BATCH_SIZE_PER_GPU': 8, 'NUM_EPOCHS': 2,
        'OPTIMIZER': 'adam_onecycle', 'LR': 0.003, 'WEIGHT_DECAY': 0.01,
        'MOMENTUM': 0.9, 'MOMS': [0.95, 0.85], 'PCT_START': 0.4,
        'DIV_FACTOR': 10, 'GRAD_NORM_CLIP': 10,
    },
    'MODEL': {
        'LATENT_DIM': 4, 'DIR_OFFSET': 0.78539, 'DIR_LIMIT_OFFSET': 0.0,
        'NUM_DIR_BINS': 2,
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'latent_weight': 10, 'loc_weight': 10.0, 'dir_weight': 0.002,
            'code_weights': [1.0] * 7}},
    },
})


def make_db(tmp_path, n_objects=24, seed=0):
    """Synthetic gt database: box-shaped point clusters + infos."""
    rng = np.random.RandomState(seed)
    (tmp_path / 'crops').mkdir(exist_ok=True)
    infos = []
    for i in range(n_objects):
        box = np.array([rng.uniform(5, 50), rng.uniform(-20, 20), -1.0,
                        rng.uniform(3.4, 4.4), rng.uniform(1.4, 1.8),
                        rng.uniform(1.4, 1.7), rng.uniform(-np.pi, np.pi)])
        n_pts = rng.randint(20, 200)
        pts = np.zeros((n_pts, 4), np.float32)
        # crop points are stored relative to the box center
        pts[:, 0] = rng.uniform(-box[3] / 2, box[3] / 2, n_pts)
        pts[:, 1] = rng.uniform(-box[4] / 2, box[4] / 2, n_pts)
        pts[:, 2] = rng.uniform(-box[5] / 2, box[5] / 2, n_pts)
        path = f'crops/obj_{i}.bin'
        pts.tofile(str(tmp_path / path))
        infos.append({
            'path': path, 'image_idx': f'{i // 4:06d}', 'gt_idx': i % 4,
            'box3d_lidar': box, 'num_points_in_gt': n_pts, 'name': 'Car',
        })
    return infos


def test_dataset_normalization(tmp_path, rng):
    infos = make_db(tmp_path)
    cfg = Cfg(dict(TINY_CFG.DATA_CONFIG))
    ds = ds_lib.KittiGtDataset(cfg, training=False, root_path=tmp_path,
                               infos=infos)
    item = ds[0]
    assert item['points'].shape == (512, 4)
    assert item['gt_boxes'].shape == (7,)
    assert item['gt_boxes_input'].shape == (8,)
    # sin/cos consistency
    np.testing.assert_allclose(
        item['gt_boxes_input'][6], np.sin(item['gt_boxes'][6]), atol=1e-5)
    np.testing.assert_allclose(
        item['gt_boxes_input'][7], np.cos(item['gt_boxes'][6]), atol=1e-5)
    # denormalized sizes recover the raw box sizes
    raw = infos[0]['box3d_lidar']
    denorm = ds_lib.denormalize_box(item['gt_boxes'])
    np.testing.assert_allclose(denorm[3:6], raw[3:6], rtol=1e-4)


def test_kfold_split_disjoint(tmp_path):
    infos = make_db(tmp_path)
    cfg = Cfg(dict(TINY_CFG.DATA_CONFIG))
    cfg.FOLD_IDX = 0
    cfg.NUM_FOLDS = 4
    tr = ds_lib.KittiGtDataset(cfg, training=True, root_path=tmp_path, infos=infos)
    va = ds_lib.KittiGtDataset(cfg, training=False, root_path=tmp_path, infos=infos)
    assert len(tr) + len(va) == len(infos)
    tr_keys = {(i['image_idx'], i['gt_idx']) for i in tr.infos}
    va_keys = {(i['image_idx'], i['gt_idx']) for i in va.infos}
    assert not (tr_keys & va_keys)


def test_cvae_loss_and_grad(rng):
    gen = CVAEGenerator(latent_dim=4)
    pts = jnp.asarray(rng.randn(8, 64, 4).astype(np.float32))
    y = jnp.asarray(rng.randn(8, 8).astype(np.float32))
    gt7 = jnp.asarray(rng.randn(8, 7).astype(np.float32) * 0.1)
    variables = gen.init(jax.random.PRNGKey(0), pts, y, jax.random.PRNGKey(1),
                         train=True)

    def loss_fn(p):
        out, _ = gen.apply({'params': p, 'batch_stats': variables['batch_stats']},
                           pts, y, jax.random.PRNGKey(2), train=True,
                           mutable=['batch_stats'])
        lw = TINY_CFG.MODEL.LOSS_CONFIG.LOSS_WEIGHTS
        reg, latent, regular, _ = cvae_loss(out, gt7, p, lw)
        return reg + latent + regular

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(loss))
    gnorm = float(jnp.sqrt(sum((g ** 2).sum() for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.slow
def test_full_pipeline_produces_uncertainty(tmp_path):
    infos = make_db(tmp_path)
    unc_map = pipeline.run_kfold_pipeline(
        TINY_CFG, tmp_path, n_folds=3, n_passes=3, seed=0, num_epochs=1,
        infos=infos, output_dir=tmp_path / 'out')
    # every object got an uncertainty from exactly one (val) fold
    assert len(unc_map) == len(infos)
    for v in unc_map.values():
        assert v.shape == (7,)
        assert (v >= 0).all() and np.isfinite(v).all()
    assert (tmp_path / 'out' / 'un_v4.pkl').exists()

    # injection into infos/dbinfos
    kitti_infos = []
    for i in range(0, len(infos), 4):
        frame = infos[i]['image_idx']
        kitti_infos.append({
            'image': {'image_idx': frame},
            'annos': {'index': np.arange(4),
                      'name': np.array(['Car', 'Car', 'Car', 'Car'])},
        })
    # mark one annotation as a pedestrian -> -1 vector
    kitti_infos[0]['annos']['name'][2] = 'Pedestrian'
    unc_map[f"{kitti_infos[0]['image']['image_idx']}_2"] = None  # unused
    db_infos = {'Car': [dict(i) for i in infos]}
    ki, db = pipeline.change_gt_infos(unc_map, kitti_infos, db_infos)
    assert ki[0]['annos']['uncertainty'].shape == (4, 7)
    assert (ki[0]['annos']['uncertainty'][2] == -1).all()
    assert all('uncertainty' in info for info in db['Car'])


def make_waymo_db(tmp_path, n_objects=20, seed=0):
    """Synthetic Waymo gt database: 5-dim crops + waymo-keyed infos."""
    rng = np.random.RandomState(seed)
    (tmp_path / 'wcrops').mkdir(exist_ok=True)
    infos = []
    for i in range(n_objects):
        box = np.array([rng.uniform(5, 50), rng.uniform(-20, 20), 0.8,
                        rng.uniform(4.2, 5.2), rng.uniform(1.8, 2.3),
                        rng.uniform(1.5, 1.9), rng.uniform(-np.pi, np.pi)])
        n_pts = rng.randint(20, 200)
        pts = np.zeros((n_pts, 5), np.float32)
        pts[:, 0] = rng.uniform(-box[3] / 2, box[3] / 2, n_pts)
        pts[:, 1] = rng.uniform(-box[4] / 2, box[4] / 2, n_pts)
        pts[:, 2] = rng.uniform(-box[5] / 2, box[5] / 2, n_pts)
        path = f'wcrops/obj_{i}.bin'
        pts.tofile(str(tmp_path / path))
        infos.append({
            'path': path, 'sequence_name': f'seq_{i // 4}',
            'sample_idx': i % 4, 'gt_idx': i % 4,
            'box3d_lidar': box, 'num_points_in_gt': n_pts,
            'name': 'Vehicle',
        })
    return infos


def test_waymo_dataset_item(tmp_path, rng):
    infos = make_waymo_db(tmp_path)
    cfg = Cfg({'DATA_PATH': 'unused', 'FORCE_RATIO': 0.0, 'FORCE_NUM': 30,
               'ENABLE_FLIP': True, 'RANDOM_SCALE_RANGE': [0.95, 1.05],
               'ANGLE_ROT_MAX': 0})
    ds = ds_lib.WaymoGtDataset(cfg, training=False, root_path=tmp_path,
                               infos=infos)
    item = ds[0]
    assert item['points'].shape == (512, 5)
    assert item['frame_id'] == 'seq_0#0'
    # azimuth canonicalization keeps the normalized size roundtrip exact
    raw = infos[0]['box3d_lidar']
    denorm = ds_lib.denormalize_box(item['gt_boxes'],
                                    anchor=ds_lib.WAYMO_ANCHOR)
    np.testing.assert_allclose(denorm[3:6], raw[3:6], rtol=1e-5)
    # heading shifted by exactly the canonicalization angle
    azimuth = np.arctan2(raw[0], raw[1])
    new_az = (azimuth + np.pi / 4) % (np.pi / 2) - np.pi / 4
    assert abs(item['gt_boxes'][6] - (raw[6] + (new_az - azimuth))) < 1e-5


@pytest.mark.slow
def test_waymo_kfold_pipeline_and_injection(tmp_path, rng):
    infos = make_waymo_db(tmp_path)
    cfg = Cfg({
        'CLASS_NAMES': ['Vehicle'],
        'DATA_CONFIG': {'DATASET': 'WaymoGtDataset', 'DATA_PATH': 'unused',
                        'FORCE_RATIO': 0.0, 'FORCE_NUM': 30,
                        'ENABLE_FLIP': True,
                        'RANDOM_SCALE_RANGE': [0.95, 1.05],
                        'ANGLE_ROT_MAX': 0},
        'OPTIMIZATION': dict(TINY_CFG.OPTIMIZATION),
        'MODEL': dict(TINY_CFG.MODEL),
    })
    unc = pipeline.run_kfold_pipeline(
        cfg, tmp_path, n_folds=5, n_passes=3, num_epochs=1, infos=infos)
    assert len(unc) == len(infos)
    for v in unc.values():
        assert v.shape == (7,) and (v >= 0).all()

    # injection round trip
    waymo_infos = []
    for i in range(5):
        names = np.array(['Vehicle', 'Pedestrian', 'Vehicle', 'Vehicle'])
        waymo_infos.append({
            'point_cloud': {'lidar_sequence': f'seq_{i}', 'sample_idx': 0},
            'annos': {'name': names},
        })
    # keys must exist for every Vehicle idx referenced
    for info in waymo_infos:
        fid = (info['point_cloud']['lidar_sequence'] + '#'
               + str(info['point_cloud']['sample_idx']))
        for idx, name in enumerate(info['annos']['name']):
            if name == 'Vehicle':
                unc.setdefault(f'{fid}_{idx}', np.full(7, 0.2))
    db = {'Vehicle': [{'sequence_name': 'seq_0', 'sample_idx': 0,
                       'gt_idx': 0}]}
    out_infos, out_db = pipeline.change_gt_infos_waymo(unc, waymo_infos, db)
    a = out_infos[0]['annos']['uncertainty']
    assert a.shape == (4, 7)
    assert (a[1] == -1).all()          # Pedestrian
    assert (a[0] >= 0).all()           # Vehicle
    assert out_db['Vehicle'][0]['uncertainty'].shape == (7,)


def test_cvae_analysis_variance_iou_stats():
    """analysis.py: tight samples -> high IoU + low variance; loose ->
    low IoU + high variance; correlation must come out negative."""
    from glenet_tpu.cvae.analysis import analyze, residual_samples
    rng = np.random.RandomState(0)
    gt_a = np.array([10., 0., -1., 3.9, 1.6, 1.56, 0.3])
    gt_b = np.array([20., 5., -1., 3.9, 1.6, 1.56, -0.5])
    per_pass = []
    for k in range(8):
        pass_d = {}
        pass_d['000_0'] = {'pred_box': gt_a + rng.normal(0, 0.01, 7),
                           'gt_box': gt_a}
        pass_d['000_1'] = {'pred_box': gt_b + rng.normal(0, 0.6, 7),
                           'gt_box': gt_b}
        per_pass.append(pass_d)
    res = residual_samples(per_pass)
    assert res['000_0'].shape == (8, 7)
    # tight object: residuals near zero
    assert np.abs(res['000_0']).max() < 0.05
    rep = analyze(per_pass, point_counts={'000_0': 500, '000_1': 12})
    assert rep['n_objects'] == 2
    assert rep['corr_variance_iou'] < 0      # more variance -> less IoU
    assert np.isfinite(rep['nll'])
    assert 'corr_variance_pointnum' in rep
