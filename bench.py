"""Benchmark entry point (driver contract): prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Current flagship benchmark: PointPillars KITTI (full-size config) single-scene
inference throughput on one chip — raw points in, NMS'd boxes out, everything
(voxelization included) inside one jit program.  Baseline constant: the
reference publishes no throughput numbers (BASELINE.md); we use 60 scans/s as
the A100-class PointPillars batch-1 figure (OpenPCDet-era GPUs run 40-60 FPS)
until a measured reference baseline exists.  vs_baseline = value / 60.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

A100_POINTPILLARS_SCANS_PER_SEC = 60.0
MAX_POINTS = 32768
BATCH = 1


def make_scene(rng, n_points=MAX_POINTS):
    """Synthetic KITTI-like scene (points clustered near the ground)."""
    pts = np.zeros((n_points, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 69.12, n_points)
    pts[:, 1] = rng.uniform(-39.68, 39.68, n_points)
    pts[:, 2] = rng.normal(-1.0, 0.5, n_points)
    pts[:, 3] = rng.uniform(0, 1, n_points)
    return pts


def main():
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector

    cfg = cfg_from_yaml_file(
        str(Path(__file__).parent / 'configs/kitti_models/pointpillar.yaml'))
    det = build_detector(cfg)

    rng = np.random.RandomState(0)
    def batch_of(seed):
        r = np.random.RandomState(seed)
        return {
            'points': jnp.asarray(
                np.stack([make_scene(r) for _ in range(BATCH)])),
            'points_mask': jnp.ones((BATCH, MAX_POINTS), bool),
        }

    batch = batch_of(0)
    variables = det.init(jax.random.PRNGKey(0), batch | {
        'gt_boxes': jnp.zeros((BATCH, 1, 8)),
        'gt_mask': jnp.zeros((BATCH, 1), bool),
        'gt_uncertainty': jnp.ones((BATCH, 1, 7)),
    })

    predict = jax.jit(lambda v, b: det.predict(v, b))
    # warmup / compile
    out = predict(variables, batch)
    jax.block_until_ready(out)

    n_iter = 20
    batches = [batch_of(i) for i in range(n_iter)]
    t0 = time.time()
    outs = []
    for b in batches:
        outs.append(predict(variables, b)['final_scores'])
    jax.block_until_ready(outs)
    dt = time.time() - t0
    scans_per_sec = n_iter * BATCH / dt

    print(json.dumps({
        'metric': 'pointpillar_kitti_scans_per_sec_1chip',
        'value': round(scans_per_sec, 2),
        'unit': 'scans/s',
        'vs_baseline': round(scans_per_sec / A100_POINTPILLARS_SCANS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
