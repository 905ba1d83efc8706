"""Reference-faithful voxel-query RoI pooling: oracle + conversion
parity.

Oracle 1: voxel_query_select vs a python re-implementation of the
reference kernel loop (voxel_query_gpu.cu:39-89 — scan order, metric
ball, first-nsample, replicate-first padding, empty-ball flag).
Oracle 2: VoxelQueryPool with weights converted from a randomly
initialized torch mirror of NeighborVoxelSAModuleMSG
(voxel_pool_modules.py:8-130) matches its output bit-for-bit-ish in
eval mode — the property that makes reference VoxelRCNN stage-2
checkpoints convert exactly.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn

import jax
import jax.numpy as jnp

from glenet_tpu.models.roi_heads import (ball_taps, voxel_query_select,
                                         VoxelQueryPool)
from glenet_tpu.utils.weight_converter import convert_voxel_query_pool

GRID = (20, 16, 8)           # (nx, ny, nz)
VS = (0.1, 0.1, 0.2)
RADIUS = 0.4
QR = (4, 4, 4)
NSAMPLE = 16


def make_world(seed, v=60, q=30):
    rng = np.random.RandomState(seed)
    nx, ny, nz = GRID
    cells = np.sort(rng.choice(nx * ny * nz, v, replace=False))
    v2p = np.full((nx * ny * nz,), -1, np.int32)
    v2p[cells] = np.arange(v)
    centers = np.stack([(cells % nx + 0.5) * VS[0],
                        (cells // nx % ny + 0.5) * VS[1],
                        (cells // (nx * ny) + 0.5) * VS[2]], 1)
    qxyz = np.stack([rng.uniform(0.02, nx * VS[0] - 0.02, q),
                     rng.uniform(0.02, ny * VS[1] - 0.02, q),
                     rng.uniform(0.02, nz * VS[2] - 0.02, q)],
                    1).astype(np.float32)
    return cells, v2p, centers.astype(np.float32), qxyz


def oracle_voxel_query(qxyz, v2p, centers):
    """Python transliteration of voxel_query_kernel_stack."""
    nx, ny, nz = GRID
    out_idx = np.zeros((len(qxyz), NSAMPLE), np.int64)
    empty = np.zeros(len(qxyz), bool)
    for qi, p in enumerate(qxyz):
        cz = int(np.floor(p[2] / VS[2]))
        cy = int(np.floor(p[1] / VS[1]))
        cx = int(np.floor(p[0] / VS[0]))
        cnt = 0
        for dz in range(-QR[0], QR[0] + 1):
            z = cz + dz
            if z < 0 or z >= nz:
                continue
            for dy in range(-QR[1], QR[1] + 1):
                y = cy + dy
                if y < 0 or y >= ny:
                    continue
                for dx in range(-QR[2], QR[2] + 1):
                    x = cx + dx
                    if x < 0 or x >= nx:
                        continue
                    slot = v2p[z * ny * nx + y * nx + x]
                    if slot < 0:
                        continue
                    d2 = ((centers[slot] - p) ** 2).sum()
                    if d2 > RADIUS * RADIUS:
                        continue
                    if cnt < NSAMPLE:
                        if cnt == 0:
                            out_idx[qi, :] = slot
                        out_idx[qi, cnt] = slot
                        cnt += 1
        if cnt == 0:
            empty[qi] = True
            out_idx[qi, :] = 0
    return out_idx, empty


def test_voxel_query_select_matches_kernel_oracle():
    cells, v2p, centers, qxyz = make_world(0)
    taps = jnp.asarray(ball_taps(QR, RADIUS, VS))
    s16, c16, empty = voxel_query_select(
        jnp.asarray(qxyz), jnp.asarray(v2p), taps, GRID,
        jnp.asarray(VS, jnp.float32), jnp.zeros(3, jnp.float32),
        RADIUS, NSAMPLE)
    ref_idx, ref_empty = oracle_voxel_query(qxyz, v2p, centers)
    np.testing.assert_array_equal(np.asarray(empty), ref_empty)
    np.testing.assert_array_equal(np.asarray(s16), ref_idx)
    # centers of the selected slots
    got_c = np.asarray(c16)[~ref_empty]
    np.testing.assert_allclose(
        got_c, centers[ref_idx[~ref_empty]], atol=1e-5)


class TorchNVSA(tnn.Module):
    """One-scale torch mirror of NeighborVoxelSAModuleMSG (same
    state-dict names: mlps_in.0.{0,1}, mlps_pos.0.{0,1},
    mlps_out.0.{0,1,2})."""

    def __init__(self, cin, mid, out):
        super().__init__()
        self.mlps_in = tnn.ModuleList([tnn.Sequential(
            tnn.Conv1d(cin, mid, 1, bias=False), tnn.BatchNorm1d(mid))])
        self.mlps_pos = tnn.ModuleList([tnn.Sequential(
            tnn.Conv2d(3, mid, 1, bias=False), tnn.BatchNorm2d(mid))])
        self.mlps_out = tnn.ModuleList([tnn.Sequential(
            tnn.Conv1d(mid, out, 1, bias=False), tnn.BatchNorm1d(out),
            tnn.ReLU())])

    def forward(self, features, idx, empty, qxyz, centers):
        """features (V, C); idx (Q, ns); empty (Q,); qxyz (Q, 3)."""
        f = features.permute(1, 0).unsqueeze(0)         # (1, C, V)
        f = self.mlps_in[0](f)
        f = f.permute(0, 2, 1).reshape(-1, f.shape[1])  # (V, mid)
        grouped = f[idx]                                 # (Q, ns, mid)
        grouped[empty] = 0
        gxyz = centers[idx] - qxyz.unsqueeze(1)          # (Q, ns, 3)
        gxyz[empty] = 0
        pos = self.mlps_pos[0](
            gxyz.permute(2, 0, 1).unsqueeze(0))          # (1,C,Q,ns)
        g = torch.relu(grouped.permute(2, 0, 1).unsqueeze(0) + pos)
        pooled = torch.max(g, dim=3).values              # (1, C, Q)
        out = self.mlps_out[0](pooled)
        return out.squeeze(0).permute(1, 0)              # (Q, out)


def test_voxel_query_pool_conversion_parity():
    torch.manual_seed(0)
    cin, mid, outc = 12, 16, 16
    cells, v2p, centers, qxyz = make_world(1)
    v = len(cells)
    rng = np.random.RandomState(2)
    feats = rng.randn(v, cin).astype(np.float32)

    tm = TorchNVSA(cin, mid, outc).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.5)
    sd = {k: v_.numpy() for k, v_ in tm.state_dict().items()}

    idx, empty = oracle_voxel_query(qxyz, v2p, centers)
    with torch.no_grad():
        want = tm(torch.from_numpy(feats), torch.from_numpy(idx),
                  torch.from_numpy(empty), torch.from_numpy(qxyz),
                  torch.from_numpy(centers)).numpy()

    params, stats = convert_voxel_query_pool(sd, prefix='')
    pool = VoxelQueryPool(
        mlp_mid=mid, mlp_out_ch=outc, query_range=QR, radius=RADIUS,
        nsample=NSAMPLE, pool_method='max_pool', grid=GRID, stride=1,
        voxel_size=VS, pc_range=(0, 0, 0, 2, 1.6, 1.6))
    nx, ny, nz = GRID
    ids = np.full((v,), 0, np.int64)
    got = pool.apply(
        {'params': params, 'batch_stats': stats},
        jnp.asarray(feats)[None], jnp.ones((1, v), bool),
        jnp.asarray(v2p)[None], jnp.asarray(qxyz)[None], False)
    np.testing.assert_allclose(np.asarray(got[0]), want, atol=2e-4,
                               rtol=1e-4)


def test_voxelrcnn_voxel_query_mode_trains_and_predicts():
    """End-to-end VoxelRCNN with POOL_MODE=voxel_query: train step +
    predict at toy scale (shares the small config of
    tests/test_voxelrcnn.py)."""
    import optax
    from test_voxelrcnn import make_vr_cfg
    from test_second import make_batch
    from glenet_tpu.models.detectors import build_detector

    cfg = make_vr_cfg()
    pool = cfg.MODEL.ROI_HEAD.ROI_GRID_POOL
    pool.POOL_MODE = 'voxel_query'
    for src in pool.POOL_LAYERS:
        pool.POOL_LAYERS[src].update(
            QUERY_RANGES=[[4, 4, 4]], POOL_RADIUS=[0.8], NSAMPLE=[16],
            POOL_METHOD='max_pool')
    det = build_detector(cfg)
    rng = np.random.RandomState(5)
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
        return (optax.apply_updates(params, updates), new_state,
                opt_state2, loss)

    losses = []
    for i in range(3):
        params, state, opt_state, loss = step(
            params, state, opt_state, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    preds = jax.jit(lambda v, b: det.predict(v, b))(
        {'params': params, **state}, batch)
    assert np.isfinite(np.asarray(preds['final_boxes'])).all()


def test_convert_voxelrcnn_kl_head_structural(rng_seed=3):
    """convert_voxelrcnn_kl_head emits exactly the leaves the vq-mode
    head owns (matching shapes), from a torch state dict shaped like the
    reference VoxelRCNNKLLabelIoUHead."""
    import optax  # noqa: F401
    from test_voxelrcnn import make_vr_cfg
    from test_second import make_batch
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.utils.weight_converter import (
        convert_voxelrcnn_kl_head)

    cfg = make_vr_cfg()
    pool = cfg.MODEL.ROI_HEAD.ROI_GRID_POOL
    pool.POOL_MODE = 'voxel_query'
    for src in pool.POOL_LAYERS:
        pool.POOL_LAYERS[src].update(
            QUERY_RANGES=[[4, 4, 4]], POOL_RADIUS=[0.8], NSAMPLE=[16],
            POOL_METHOD='max_pool')
    det = build_detector(cfg)
    batch = make_batch(np.random.RandomState(rng_seed))
    variables = det.init(jax.random.PRNGKey(0), batch)
    roi_params = variables['params']['roi_head']
    roi_stats = variables['batch_stats']['roi_head']

    # synth a reference-shaped state dict from the flax shapes
    head_cfg = cfg.MODEL.ROI_HEAD
    srcs = list(pool.FEATURES_SOURCE)
    rng = np.random.RandomState(rng_seed)
    sd = {}

    def put_lin(key, o, i, bias):
        sd[f'{key}.weight'] = rng.randn(o, i).astype(np.float32)
        if bias:
            sd[f'{key}.bias'] = rng.randn(o).astype(np.float32)

    def put_bn(key, c):
        sd[f'{key}.weight'] = rng.rand(c).astype(np.float32) + 0.5
        sd[f'{key}.bias'] = rng.randn(c).astype(np.float32)
        sd[f'{key}.running_mean'] = rng.randn(c).astype(np.float32)
        sd[f'{key}.running_var'] = rng.rand(c).astype(np.float32) + 0.5

    for k, src in enumerate(srcs):
        mid, out = pool.POOL_LAYERS[src]['MLPS'][0]
        cin = roi_params[f'pool_{src}']['mlp_in']['kernel'].shape[0]
        base = f'roi_head.roi_grid_pool_layers.{k}'
        sd[f'{base}.mlps_in.0.0.weight'] = rng.randn(
            mid, cin, 1).astype(np.float32)
        put_bn(f'{base}.mlps_in.0.1', mid)
        sd[f'{base}.mlps_pos.0.0.weight'] = rng.randn(
            mid, 3, 1, 1).astype(np.float32)
        put_bn(f'{base}.mlps_pos.0.1', mid)
        sd[f'{base}.mlps_out.0.0.weight'] = rng.randn(
            out, mid, 1).astype(np.float32)
        put_bn(f'{base}.mlps_out.0.1', out)

    pre = roi_params['shared_0']['kernel'].shape[0]
    seqs = [('shared_fc_layer', head_cfg.SHARED_FC, pre),
            ('cls_fc_layers', head_cfg.CLS_FC, head_cfg.SHARED_FC[-1]),
            ('reg_fc_layers', head_cfg.REG_FC, head_cfg.SHARED_FC[-1])]
    for tname, sizes, cin in seqs:
        seq = 0
        for i, s_ in enumerate(sizes):
            put_lin(f'roi_head.{tname}.{seq}', s_, cin, bias=False)
            put_bn(f'roi_head.{tname}.{seq + 1}', s_)
            cin = s_
            seq += 4 if (head_cfg.DP_RATIO > 0
                         and i != len(sizes) - 1) else 3
    put_lin('roi_head.cls_pred_layer', 1, head_cfg.CLS_FC[-1], True)
    put_lin('roi_head.reg_pred_layer', 7, head_cfg.REG_FC[-1], True)
    put_lin('roi_head.reg_std_layer', 7, head_cfg.REG_FC[-1], True)
    put_bn('roi_head.reg_std_bn', 7)
    put_lin('roi_head.reg_std_fc1', 64, 7, True)
    put_bn('roi_head.reg_std_bn1', 64)
    put_lin('roi_head.reg_std_fc2', 1, 64, True)

    p, s = convert_voxelrcnn_kl_head(sd, srcs)

    flat_model_p = jax.tree_util.tree_leaves_with_path(dict(roi_params))
    model_paths = {jax.tree_util.keystr(k): v.shape
                   for k, v in flat_model_p}
    conv_paths = {jax.tree_util.keystr(k): np.asarray(v).shape
                  for k, v in jax.tree_util.tree_leaves_with_path(p)}
    missing = set(model_paths) - set(conv_paths)
    extra = set(conv_paths) - set(model_paths)
    assert not missing, sorted(missing)[:8]
    assert not extra, sorted(extra)[:8]
    for key in model_paths:
        assert model_paths[key] == conv_paths[key], (
            key, model_paths[key], conv_paths[key])
