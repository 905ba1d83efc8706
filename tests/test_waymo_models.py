"""End-to-end smoke for the remaining Waymo configs that have no
dedicated family test: SECOND-on-Waymo and PointPillars-1x-on-Waymo
(reference tools/cfgs/waymo_models/{second,pointpillar_1x}.yaml).  The
full yaml drives the real model; only the range/budgets are shrunk so
the grids stay CPU-sized."""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import cfg_from_yaml_file
from glenet_tpu.models.detectors import build_detector

ROOT = Path(__file__).resolve().parent.parent


def tiny_waymo_cfg(yaml_name):
    cfg = cfg_from_yaml_file(str(ROOT / 'configs/waymo_models' / yaml_name))
    cfg.DATA_CONFIG.POINT_CLOUD_RANGE = [-19.2, -19.2, -2.0, 19.2, 19.2, 4.0]
    for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
        if proc.NAME == 'transform_points_to_voxels':
            proc.MAX_NUMBER_OF_VOXELS = {'train': 2000, 'test': 2000}
    nms = cfg.MODEL.POST_PROCESSING.NMS_CONFIG
    nms.NMS_PRE_MAXSIZE = 256
    nms.NMS_POST_MAXSIZE = 64
    return cfg


def make_batch(rng, n_points=4000, n_gt=4):
    pts = np.zeros((1, n_points, 5), np.float32)
    pts[0, :, 0] = rng.uniform(-18, 18, n_points)
    pts[0, :, 1] = rng.uniform(-18, 18, n_points)
    pts[0, :, 2] = rng.normal(0.0, 0.3, n_points)
    pts[0, :, 3] = rng.uniform(0, 1, n_points)
    gt = np.zeros((1, n_gt, 8), np.float32)
    gm = np.zeros((1, n_gt), bool)
    for g in range(2):
        gt[0, g] = [rng.uniform(-10, 10), rng.uniform(-10, 10), 0.8,
                    4.7, 2.1, 1.7, rng.uniform(-1, 1), 1]
        gm[0, g] = True
        # cluster points on the car so the voxel grid sees it
        sl = slice(200 * g, 200 * (g + 1))
        pts[0, sl, 0] = gt[0, g, 0] + rng.uniform(-2, 2, 200)
        pts[0, sl, 1] = gt[0, g, 1] + rng.uniform(-1, 1, 200)
        pts[0, sl, 2] = gt[0, g, 2] + rng.uniform(-0.8, 0.8, 200)
    return {'points': jnp.asarray(pts),
            'points_mask': jnp.ones((1, n_points), bool),
            'gt_boxes': jnp.asarray(gt), 'gt_mask': jnp.asarray(gm),
            'gt_uncertainty': jnp.ones((1, n_gt, 7), jnp.float32)}


@pytest.mark.slow
@pytest.mark.parametrize('yaml_name', ['second.yaml', 'pointpillar_1x.yaml'])
def test_waymo_config_trains_and_predicts(yaml_name, rng):
    cfg = tiny_waymo_cfg(yaml_name)
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
                loss, optax.global_norm(grads))

    losses = []
    for i in range(3):
        params, state, opt_state, loss, gn = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
        assert np.isfinite(float(loss)) and np.isfinite(float(gn))
    assert losses[-1] < losses[0], losses

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
    assert preds['final_boxes'].shape[-1] == 7
