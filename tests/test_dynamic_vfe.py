"""Dynamic (scatter) voxelization + VFEs (reference dynamic_mean_vfe.py /
dynamic_pillar_vfe.py, torch_scatter semantics)."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.ops import voxelize as vox_ops

from test_second import TINY_SECOND, make_batch

VS = (0.5, 0.5, 0.1)
PR = (0, -8, -1.2, 16, 8, 1.2)
GRID = vox_ops.compute_grid_size(PR, VS)


def test_voxelize_dynamic_matches_static_coords(rng):
    pts = np.zeros((256, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 16, 256)
    pts[:, 1] = rng.uniform(-8, 8, 256)
    pts[:, 2] = rng.uniform(-1.1, 1.1, 256)
    mask = rng.rand(256) > 0.1
    static = vox_ops.voxelize(jnp.asarray(pts), jnp.asarray(mask),
                              VS, PR, GRID, max_voxels=256,
                              max_points_per_voxel=8)
    dyn = vox_ops.voxelize_dynamic(jnp.asarray(pts), jnp.asarray(mask),
                                   VS, PR, GRID, max_voxels=256)
    np.testing.assert_array_equal(np.asarray(static['voxel_coords']),
                                  np.asarray(dyn['voxel_coords']))
    np.testing.assert_array_equal(np.asarray(static['voxel_mask']),
                                  np.asarray(dyn['voxel_mask']))
    # every valid point maps to the slot holding its voxel coords
    pvi = np.asarray(dyn['point_voxel_idx'])
    coords = np.asarray(dyn['voxel_coords'])
    for i in np.where(mask)[0][:50]:
        c = np.floor((pts[i, :3] - np.asarray(PR[:3])) / np.asarray(VS))
        if (c < 0).any() or (c >= np.asarray(GRID)).any():
            assert pvi[i] == -1
        else:
            assert pvi[i] >= 0
            np.testing.assert_array_equal(coords[pvi[i]], c[::-1])


def test_dynamic_mean_vfe_equals_uncapped_mean(rng):
    """With a generous per-voxel cap the static MeanVFE and the dynamic
    scatter mean must agree exactly."""
    from glenet_tpu.models.vfe import DynamicMeanVFE, MeanVFE
    pts = np.zeros((128, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 16, 128)
    pts[:, 1] = rng.uniform(-8, 8, 128)
    pts[:, 2] = rng.uniform(-1.1, 1.1, 128)
    pts[:, 3] = rng.uniform(0, 1, 128)
    mask = np.ones(128, bool)
    static = vox_ops.voxelize(jnp.asarray(pts), jnp.asarray(mask),
                              VS, PR, GRID, max_voxels=128,
                              max_points_per_voxel=128)
    dyn = vox_ops.voxelize_dynamic(jnp.asarray(pts), jnp.asarray(mask),
                                   VS, PR, GRID, max_voxels=128)
    mv = MeanVFE()
    f_static = mv.apply({}, static['voxels'], static['voxel_num_points'])
    dm = DynamicMeanVFE()
    f_dyn = dm.apply({}, jnp.asarray(pts), dyn['point_voxel_idx'],
                     num_voxels=128)
    vm = np.asarray(static['voxel_mask'])
    np.testing.assert_allclose(np.asarray(f_static)[vm],
                               np.asarray(f_dyn)[vm], rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_dyn_pillar_centerpoint_trains(rng):
    """CenterPoint with DynPillarVFE (centerpoint_dyn_pillar_1x.yaml
    topology) trains and predicts at tiny scale."""
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'CenterPoint'
    cfg.DATA_CONFIG.DATA_PROCESSOR = [Cfg({
        'NAME': 'transform_points_to_voxels_placeholder',
        'VOXEL_SIZE': [0.5, 0.5, 2.4],
        'MAX_NUMBER_OF_VOXELS': {'train': 512, 'test': 512}})]
    cfg.MODEL.VFE = Cfg({'NAME': 'DynPillarVFE', 'WITH_DISTANCE': False,
                         'USE_ABSLOTE_XYZ': True, 'USE_NORM': True,
                         'NUM_FILTERS': [16, 16]})
    cfg.MODEL.BACKBONE_3D = None
    del cfg.MODEL['BACKBONE_3D']
    cfg.MODEL.MAP_TO_BEV = Cfg({'NAME': 'PointPillarScatter',
                                'NUM_BEV_FEATURES': 16})
    cfg.MODEL.DENSE_HEAD = Cfg({
        'NAME': 'CenterHead', 'CLASS_AGNOSTIC': False,
        'CLASS_NAMES_EACH_HEAD': [['Car']],
        'SHARED_CONV_CHANNEL': 16,
        'TARGET_ASSIGNER_CONFIG': {
            'FEATURE_MAP_STRIDE': 1, 'NUM_MAX_OBJS': 100,
            'GAUSSIAN_OVERLAP': 0.1, 'MIN_RADIUS': 2},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'cls_weight': 1.0, 'loc_weight': 2.0,
            'code_weights': [1.0] * 8}},
    })
    cfg.MODEL.POST_PROCESSING.MAX_OBJ_PER_SAMPLE = 64
    from glenet_tpu.models.detectors import build_detector
    det = build_detector(cfg)
    batch = make_batch(rng)
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
                loss)

    losses = []
    for _ in range(5):
        params, state, opt_state, loss = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
