"""CenterPoint head: gaussian targets, focal/reg losses, topk decode, and an
end-to-end tiny train/predict run."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.models import center_head as ch
from glenet_tpu.models.detectors import build_detector

from test_second import TINY_SECOND, make_batch

VS = (0.5, 0.5, 0.1)
PR = (0, -8, -1.2, 16, 8, 1.2)


def test_gaussian_targets_peak_at_center(rng):
    gt = np.zeros((4, 8), np.float32)
    gt[0] = [8.0, 0.0, -0.2, 3.9, 1.6, 1.56, 0.3, 1]
    gt_mask = np.array([True, False, False, False])
    hm, tb, inds, mask = ch.assign_targets_single(
        jnp.asarray(gt), jnp.asarray(gt_mask), 1, (32, 32), 1, VS, PR)
    hm = np.asarray(hm)
    assert hm.shape == (1, 32, 32)
    # peak at the gt cell
    cx = int((8.0 - PR[0]) / VS[0])
    cy = int((0.0 - PR[1]) / VS[1])
    assert hm[0, cy, cx] == hm.max() == pytest.approx(1.0, abs=1e-5)
    assert int(mask[0]) == 1 and int(mask[1]) == 0
    assert int(inds[0]) == cy * 32 + cx
    # target box encodes sub-cell offset, z, log dims, cos/sin
    np.testing.assert_allclose(np.asarray(tb[0, 3:6]),
                               np.log([3.9, 1.6, 1.56]), rtol=1e-5)


def test_focal_loss_decreases_with_better_heatmap():
    gt_hm = np.zeros((1, 1, 16, 16), np.float32)
    gt_hm[0, 0, 8, 8] = 1.0
    bad = jnp.full((1, 1, 16, 16), 0.0)
    good = jnp.where(jnp.asarray(gt_hm) == 1.0, 6.0, -6.0)
    l_bad = float(ch.centernet_focal_loss(bad, jnp.asarray(gt_hm)))
    l_good = float(ch.centernet_focal_loss(good, jnp.asarray(gt_hm)))
    assert l_good < l_bad


def test_decode_recovers_targets(rng):
    """Build maps that encode one box exactly; decode must return it."""
    h = w = 32
    out = {
        'hm': jnp.full((1, h, w, 1), -10.0),
        'center': jnp.zeros((1, h, w, 2)),
        'center_z': jnp.zeros((1, h, w, 1)),
        'dim': jnp.zeros((1, h, w, 3)),
        'rot': jnp.zeros((1, h, w, 2)),
    }
    box = [8.2, 1.3, -0.4, 3.9, 1.6, 1.56, 0.7]
    cx = (box[0] - PR[0]) / VS[0]
    cy = (box[1] - PR[1]) / VS[1]
    ix, iy = int(cx), int(cy)
    out['hm'] = out['hm'].at[0, iy, ix, 0].set(10.0)
    out['center'] = out['center'].at[0, iy, ix].set([cx - ix, cy - iy])
    out['center_z'] = out['center_z'].at[0, iy, ix, 0].set(box[2])
    out['dim'] = out['dim'].at[0, iy, ix].set(np.log(box[3:6]))
    out['rot'] = out['rot'].at[0, iy, ix].set([np.cos(box[6]), np.sin(box[6])])

    boxes, scores, labels = ch.decode_center_boxes(out, 5, VS, PR, 1)
    np.testing.assert_allclose(np.asarray(boxes[0, 0]), box, atol=1e-3)
    assert float(scores[0, 0]) > 0.99
    assert int(labels[0, 0]) == 1


@pytest.mark.slow
def test_centerpoint_trains_and_predicts(rng):
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'CenterPoint'
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
    })
    cfg.MODEL.POST_PROCESSING.MAX_OBJ_PER_SAMPLE = 64

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
                loss, metrics)

    losses = []
    for _ in range(5):
        params, state, opt_state, loss, metrics = step(params, state, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()
