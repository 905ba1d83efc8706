"""Measure ACTUAL per-level active-site counts vs the static level caps
on the bench scenes (and optionally the convergence-harness scenes).

The level caps are worst-case dilation multipliers x the voxel BUDGET;
every padded slot turns into real sort/gather/MXU work, so caps sized to
measured occupancy (plus margin) directly cut the sparse path's cost.
Any cap change must be re-validated by the convergence AP harness
(PERF_NOTES level-cap lesson).

Usage: python tools/occupancy_probe.py [n_scenes]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from bench_model import make_batch


def main():
    import jax
    import jax.numpy as jnp

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector
    from glenet_tpu.ops import sparse, voxelize as vox
    from glenet_tpu.utils import jax_cache
    jax_cache.enable()

    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    root = Path(__file__).resolve().parent.parent
    det = build_detector(cfg_from_yaml_file(
        str(root / 'configs/kitti_models/GLENet_VR.yaml')))
    grid = tuple(int(g) for g in det.grid_size)
    budget = det.max_voxels_test
    caps = sparse.level_caps(budget)
    sgrid = (grid[0], grid[1], grid[2] + 1)

    @jax.jit
    def level_counts(pts, mask):
        v = vox.voxelize(pts, mask, voxel_size=tuple(det.voxel_size),
                         pc_range=tuple(det.pc_range), grid_size=grid,
                         max_voxels=budget,
                         max_points_per_voxel=det.max_points_per_voxel)
        ids = jnp.where(
            v['voxel_mask'],
            (v['voxel_coords'][:, 0] * (sgrid[1] * sgrid[0])
             + v['voxel_coords'][:, 1] * sgrid[0]
             + v['voxel_coords'][:, 2]).astype(jnp.int32),
            sgrid[0] * sgrid[1] * sgrid[2])
        counts = [jnp.sum(v['voxel_mask'])]
        g = sgrid
        cur_ids, cur_mask = ids, v['voxel_mask']
        for lvl, (stride_pad, cap) in enumerate(
                [((3, 2, 1), caps[1]), ((3, 2, 1), caps[2]),
                 ((3, 2, (0, 1, 1)), caps[3])]):
            ks, st, pad = stride_pad
            out_ids, out_mask = sparse.strided_output_sites(
                cur_ids, cur_mask, g, ks, st, pad, cap)
            counts.append(jnp.sum(out_mask))
            g = sparse.out_grid_size(g, ks, st, pad)
            cur_ids, cur_mask = out_ids, out_mask
        return jnp.stack(counts)

    rows = []
    for i in range(n_scenes):
        b = make_batch(np.random.RandomState(100 + i))
        for s in range(b['points'].shape[0]):
            rows.append(np.asarray(level_counts(
                b['points'][s], b['points_mask'][s])))
    rows = np.stack(rows)
    print(f'budget={budget} caps={caps}')
    print('level   max_active   mean_active   cap    cap_util   '
          'mult_of_L1max')
    l1max = rows[:, 0].max()
    for lvl in range(4):
        mx, mean = rows[:, lvl].max(), rows[:, lvl].mean()
        cap = caps[lvl]
        print(f'  L{lvl + 1}   {mx:9d}   {mean:11.0f}   {cap:6d}   '
              f'{mx / cap:7.2f}   {mx / l1max:6.2f}')
    # NOTE: caps bind at the BUDGET times multiplier; the safe multiplier
    # is max_active / budget over the scene distribution, plus margin.
    print('suggested multipliers (max/budget * 1.08 margin):',
          [round(float(rows[:, l].max()) / budget * 1.08, 2)
           for l in range(4)])


if __name__ == '__main__':
    main()
