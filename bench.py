"""Benchmark entry point (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Headline metric: **GLENet-VR** (the flagship two-stage probabilistic
Voxel R-CNN, configs/kitti_models/GLENet_VR.yaml at full KITTI scale)
single-chip end-to-end inference throughput — raw clustered points in,
variance-voting-NMS'd boxes out, everything (voxelization included) inside
one jit program.  Secondary lines (printed to stderr): SECOND and
PointPillars.

Baseline constant: the reference publishes no throughput numbers
(BASELINE.md).  Voxel R-CNN-class detectors run ~25 FPS batch-1 on
A100-class GPUs (Voxel R-CNN paper reports 25 FPS on a 2080 Ti; A100
OpenPCDet runs land 25-40 FPS), so vs_baseline = value / 25.  Scenes are
synthetic but KITTI-like: 32768 points, ground plane + car-sized clusters.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / 'tools'))

import numpy as np

A100_VOXELRCNN_SCANS_PER_SEC = 25.0
BATCH = 2
N_ITER = 20


def bench_predict(cfg_path, batches):
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.utils import jax_cache

    jax_cache.enable()

    cfg = cfg_from_yaml_file(cfg_path)
    det = build_detector(cfg)
    variables = det.init(jax.random.PRNGKey(0), batches[0])
    predict = jax.jit(lambda v, b: det.predict(v, b))
    out = predict(variables, batches[0])
    jax.block_until_ready(out)

    t0 = time.time()
    outs = []
    for b in batches:
        outs.append(predict(variables, b)['final_scores'])
    jax.block_until_ready(outs)
    dt = time.time() - t0
    return len(batches) * BATCH / dt


def _detect_platform(timeout=150):
    """Probe the JAX backend in a subprocess.

    When the TPU tunnel is dead, axon backend init hangs indefinitely
    (it does NOT fall back to CPU), so the probe must be out-of-process
    with a hard timeout.
    """
    import subprocess
    code = ('import jax\n'
            'print("PLATFORM=" + jax.devices()[0].platform)\n')
    try:
        r = subprocess.run([sys.executable, '-c', code],
                           capture_output=True, text=True, timeout=timeout)
        for line in r.stdout.splitlines():
            if line.startswith('PLATFORM='):
                return line.split('=', 1)[1]
    except subprocess.TimeoutExpired:
        pass
    return 'cpu'


def main():
    global N_ITER
    from bench_model import make_batch

    platform = _detect_platform()
    if platform == 'cpu':
        # TPU tunnel down/hung: still honor the one-JSON-line contract,
        # but don't spend an hour on full-scale CPU inference
        N_ITER = 2
        print('[warn] no accelerator reachable; benching on CPU',
              file=sys.stderr)
        import jax
        jax.config.update('jax_platforms', 'cpu')
    else:
        import jax

    rng = np.random.RandomState(0)
    batches = [make_batch(np.random.RandomState(i)) for i in range(N_ITER)]

    root = Path(__file__).resolve().parent
    # the headline (driver contract) runs first so later models can't
    # exhaust device memory before it completes
    sps = bench_predict(str(root / 'configs/kitti_models/GLENet_VR.yaml'),
                        batches)
    print(json.dumps({
        'metric': 'glenet_vr_kitti_e2e_scans_per_sec_1chip',
        'value': round(sps, 2),
        'unit': 'scans/s',
        'vs_baseline': round(sps / A100_VOXELRCNN_SCANS_PER_SEC, 3),
        'platform': platform,
    }))
    sys.stdout.flush()

    # secondary lines to stderr (not part of the driver contract)
    for name, cfgf in [('second', 'configs/kitti_models/second.yaml'),
                       ('pointpillar', 'configs/kitti_models/pointpillar.yaml')]:
        try:
            import jax
            jax.clear_caches()
            sps = bench_predict(str(root / cfgf), batches)
            print(f'[secondary] {name}: {sps:.1f} scans/s', file=sys.stderr)
        except Exception as e:  # secondary lines must not break the contract
            print(f'[secondary] {name} failed: {type(e).__name__}',
                  file=sys.stderr)


if __name__ == '__main__':
    main()
