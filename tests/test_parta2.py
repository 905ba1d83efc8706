"""PartA2: inverse sparse conv oracle, roiaware pooling oracle, intra-part
targets, tiny end-to-end train + predict."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glenet_tpu.config import Cfg
from glenet_tpu.ops import sparse
from glenet_tpu.models.detectors import build_detector

from test_second import TINY_SECOND, make_batch


def _rand_sparse(rng, grid, v_cap, n_active):
    nx, ny, nz = grid
    ids = rng.choice(nx * ny * nz, size=n_active, replace=False)
    ids = np.sort(ids)
    out = np.full(v_cap, nx * ny * nz, np.int64)
    out[:n_active] = ids
    mask = out < nx * ny * nz
    return jnp.asarray(out.astype(np.int32)), jnp.asarray(mask)


def test_inverse_conv_oracle(rng, monkeypatch):
    monkeypatch.setattr(sparse, 'GATHER_COMPUTE_DTYPE', None)
    """inverse_gather_table + gather_gemm == dense transposed-conv oracle
    restricted to the fine active set."""
    grid = (8, 8, 6)                       # (nx, ny, nz)
    k, s, p = 3, 2, 1
    fine_ids, fine_mask = _rand_sparse(rng, grid, 64, 40)
    ogrid = sparse.out_grid_size(grid, k, s, p)
    out_ids, out_mask = sparse.strided_output_sites(
        fine_ids, fine_mask, grid, k, s, p, out_cap=64)
    cin, cout = 4, 5
    coarse_feats = jnp.asarray(rng.randn(64, cin).astype(np.float32))
    coarse_feats = jnp.where(out_mask[:, None], coarse_feats, 0.0)
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32))

    table = sparse.inverse_gather_table(
        fine_ids, fine_mask, out_ids, out_mask, grid, k, s, p)
    got = np.asarray(sparse.gather_gemm(coarse_feats, table, w))

    # numpy oracle
    onx, ony, onz = ogrid
    dense_coarse = np.zeros((onz, ony, onx, cin), np.float32)
    oid = np.asarray(out_ids)
    om = np.asarray(out_mask)
    cf = np.asarray(coarse_feats)
    for i in range(64):
        if om[i]:
            z, y, x = (oid[i] // (ony * onx), (oid[i] % (ony * onx)) // onx,
                       oid[i] % onx)
            dense_coarse[z, y, x] = cf[i]
    offs = sparse.kernel_offsets(3)
    fid = np.asarray(fine_ids)
    fm = np.asarray(fine_mask)
    wn = np.asarray(w)
    nx, ny, nz = grid
    want = np.zeros((64, cout), np.float32)
    for i in range(64):
        if not fm[i]:
            continue
        z, y, x = fid[i] // (ny * nx), (fid[i] % (ny * nx)) // nx, fid[i] % nx
        for ki, (dz, dy, dx) in enumerate(offs):
            cz, cy, cx = z + p - dz, y + p - dy, x + p - dx
            if cz % s or cy % s or cx % s:
                continue
            oz, oy, ox = cz // s, cy // s, cx // s
            if not (0 <= oz < onz and 0 <= oy < ony and 0 <= ox < onx):
                continue
            want[i] += dense_coarse[oz, oy, ox] @ wn[ki]
    np.testing.assert_allclose(got[fm], want[fm], rtol=1e-4, atol=1e-4)


def test_roiaware_pool_oracle(rng):
    from glenet_tpu.ops.roiaware_pool import roiaware_pool3d
    from glenet_tpu.utils import common
    p, r, g, c = 200, 3, 4, 5
    pts = np.zeros((p, 3), np.float32)
    pts[:, 0] = rng.uniform(0, 16, p)
    pts[:, 1] = rng.uniform(-8, 8, p)
    pts[:, 2] = rng.uniform(-1, 1, p)
    feats = rng.randn(p, c).astype(np.float32)
    rois = np.zeros((r, 7), np.float32)
    rois[:, 0] = [4.0, 10.0, 100.0]        # last roi out of scene -> empty
    rois[:, 1] = [0.0, -3.0, 0.0]
    rois[:, 3:6] = [4.0, 2.0, 1.6]
    rois[:, 6] = [0.3, -1.1, 0.0]

    for method in ('max', 'avg'):
        got = np.asarray(roiaware_pool3d(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(rois), g,
            method=method, points_mask=jnp.ones(p, bool)))
        want = np.zeros((r, g, g, g, c), np.float32)
        for j in range(r):
            shifted = pts - rois[j, :3]
            ca, sa = np.cos(-rois[j, 6]), np.sin(-rois[j, 6])
            local = shifted.copy()
            local[:, 0] = shifted[:, 0] * ca - shifted[:, 1] * sa
            local[:, 1] = shifted[:, 0] * sa + shifted[:, 1] * ca
            dims = rois[j, 3:6]
            inb = (np.abs(local) < dims / 2 + 1e-5).all(1)
            cells = {}
            for i in np.nonzero(inb)[0]:
                idx = np.clip((local[i] + dims / 2) // (dims / g), 0,
                              g - 1).astype(int)
                cells.setdefault(tuple(idx), []).append(i)
            for (cx, cy, cz), members in cells.items():
                if method == 'max':
                    want[j, cx, cy, cz] = feats[members].max(0)
                else:
                    want[j, cx, cy, cz] = feats[members].mean(0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=method)


def test_assign_part_targets():
    from glenet_tpu.models import point_heads as ph
    pts = jnp.asarray([[5.0, 0.0, -0.2],      # center -> part (0.5,0.5,0.5)
                       [6.9, 0.7, 0.5],       # near +corner -> part -> 1
                       [12.0, 6.0, -0.2]])    # background
    gt = jnp.asarray([[5.0, 0.0, -0.2, 3.9, 1.6, 1.56, 0.0, 1.0]])
    seg, part, fg = ph.assign_part_targets(
        pts, jnp.ones(3, bool), gt, jnp.asarray([True]))
    seg = np.asarray(seg)
    assert seg[0] == 1 and seg[2] == 0
    np.testing.assert_allclose(np.asarray(part)[0], 0.5, atol=1e-5)
    assert (np.asarray(part)[1] > 0.8).all()


def make_parta2_cfg():
    cfg = copy.deepcopy(TINY_SECOND)
    cfg.MODEL.NAME = 'PartA2Net'
    cfg.MODEL.BACKBONE_3D = Cfg({'NAME': 'UNetV2'})
    cfg.MODEL.POINT_HEAD = Cfg({
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [], 'PART_FC': [],
        'CLASS_AGNOSTIC': True,
        'TARGET_CONFIG': {'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2]},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {'point_cls_weight': 1.0,
                                         'point_part_weight': 1.0}},
    })
    cfg.MODEL.ROI_HEAD = Cfg({
        'NAME': 'PartA2FCHead', 'CLASS_AGNOSTIC': True,
        'SHARED_FC': [32, 32], 'CLS_FC': [16], 'REG_FC': [16],
        'DP_RATIO': 0.3, 'SEG_MASK_SCORE_THRESH': 0.3,
        'NMS_CONFIG': {
            'TRAIN': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 512,
                      'NMS_POST_MAXSIZE': 64, 'NMS_THRESH': 0.8},
            'TEST': {'NMS_TYPE': 'nms_gpu', 'NMS_PRE_MAXSIZE': 256,
                     'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.7,
                     'SCORE_THRESH': 0.0}},
        'ROI_AWARE_POOL': {'POOL_SIZE': 4, 'NUM_FEATURES': 32,
                           'MAX_POINTS_PER_VOXEL': 128},
        'TARGET_CONFIG': {
            'BOX_CODER': 'ResidualCoder', 'ROI_PER_IMAGE': 16,
            'FG_RATIO': 0.5, 'SAMPLE_ROI_BY_EACH_CLASS': True,
            'CLS_SCORE_TYPE': 'roi_iou', 'CLS_FG_THRESH': 0.75,
            'CLS_BG_THRESH': 0.25, 'CLS_BG_THRESH_LO': 0.1,
            'HARD_BG_RATIO': 0.8, 'REG_FG_THRESH': 0.65},
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
def test_parta2_trains_and_predicts(rng):
    cfg = make_parta2_cfg()
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
    assert 'point_loss_cls' in metrics and 'point_loss_part' in metrics
    assert 'rcnn_loss_cls' in metrics and 'rcnn_loss_reg' in metrics

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


def make_parta2_free_cfg():
    """PartA2_free.yaml topology at tiny scale: no BEV stages, intra-part
    head with an anchor-free PointResidualCoder box branch, DISABLE_PART
    roiaware refinement."""
    cfg = make_parta2_cfg()
    cfg.MODEL.NAME = 'PointRCNN'
    del cfg.MODEL['DENSE_HEAD']
    del cfg.MODEL['MAP_TO_BEV']
    del cfg.MODEL['BACKBONE_2D']
    cfg.MODEL.BACKBONE_3D.RETURN_ENCODED_TENSOR = False
    cfg.MODEL.POINT_HEAD = Cfg({
        'NAME': 'PointIntraPartOffsetHead', 'CLS_FC': [16], 'PART_FC': [16],
        'REG_FC': [16], 'CLASS_AGNOSTIC': False,
        'TARGET_CONFIG': {
            'GT_EXTRA_WIDTH': [0.2, 0.2, 0.2],
            'BOX_CODER': 'PointResidualCoder',
            'BOX_CODER_CONFIG': {'use_mean_size': True,
                                 'mean_size': [[3.9, 1.6, 1.56]]}},
        'LOSS_CONFIG': {'LOSS_WEIGHTS': {
            'point_cls_weight': 1.0, 'point_box_weight': 1.0,
            'point_part_weight': 1.0, 'code_weights': [1.0] * 8}},
    })
    cfg.MODEL.ROI_HEAD.DISABLE_PART = True
    cfg.MODEL.ROI_HEAD.SEG_MASK_SCORE_THRESH = 0.0
    return cfg


@pytest.mark.slow
def test_parta2_free_trains_and_predicts(rng):
    cfg = make_parta2_free_cfg()
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
    assert 'point_loss_part' in metrics and 'loss_loc' in metrics
    assert 'rcnn_loss_cls' in metrics and 'rcnn_loss_reg' in metrics

    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert preds['final_boxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


def test_parta2_free_full_config_parses():
    from pathlib import Path
    from glenet_tpu.config import cfg_from_yaml_file
    root = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(root / 'configs/kitti_models/PartA2_free.yaml'))
    assert cfg.MODEL.get('DENSE_HEAD') is None
    assert cfg.MODEL.POINT_HEAD.REG_FC == [128, 128]
    assert cfg.MODEL.ROI_HEAD.DISABLE_PART is True
