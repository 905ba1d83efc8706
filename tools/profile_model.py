"""Op-level TPU profiling for one model path (train step or predict).

Captures a jax.profiler trace around N steady-state dispatches and prints
the top ops by self time parsed from the xplane proto (via the xprof
converter, which is available in this image).  This is the measurement
step that gates kernel-optimization work (PERF_NOTES.md): optimize what
the trace shows, not what intuition suggests.

Usage:
    python tools/profile_model.py <mode> [model_yaml] [test_voxel_budget]
        mode               train | predict
        model_yaml         default configs/kitti_models/GLENet_VR.yaml
        test_voxel_budget  optional clamp for MAX_NUMBER_OF_VOXELS['test']

Example (the two known perf targets):
    python tools/profile_model.py train configs/kitti_models/GLENet_VR.yaml
    python tools/profile_model.py predict configs/kitti_models/PartA2.yaml 40000
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from bench_model import make_batch  # noqa: E402  (same synthetic scenes)

N_STEPS = 6


def top_ops_from_trace(trace_dir, top_k=25):
    """Parse the newest xplane.pb under trace_dir -> [(self_us, name), ...].

    The xprof converter returns a gviz DataTable JSON string (the 'tqx'
    csv hint is ignored in this build); rows look like
    {"c":[{"v":rank},{"v":"Device"},{"v":"type"},{"v":"op name"},
          {"v":occurrences},{"v":total_us},{"v":avg_us},{"v":self_us},...]}
    and the same op can appear once per plane — dedupe by name.
    """
    import re
    planes = sorted(Path(trace_dir).rglob('*.xplane.pb'),
                    key=lambda p: p.stat().st_mtime)
    if not planes:
        return None
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [str(planes[-1])], 'framework_op_stats', {'tqx': 'out:csv;'})
    if isinstance(data, bytes):
        data = data.decode()
    seen = {}
    for row in re.findall(r'\{"c":\[(.*?)\]\}', str(data), re.S):
        vals = [m[5:-1] for m in re.findall(r'\{"v":[^}]*\}', row)]
        if len(vals) < 8 or vals[1].strip('"') != 'Device':
            continue
        name = vals[3].strip('"')
        try:
            seen.setdefault(name, float(vals[7]))
        except ValueError:
            continue
    ops = sorted(((t, n) for n, t in seen.items()), reverse=True)
    return ops[:top_k] if ops else None


def main():
    import jax
    import optax

    from glenet_tpu.config import cfg_from_yaml_file
    from glenet_tpu.models.detectors import build_detector

    mode = sys.argv[1] if len(sys.argv) > 1 else 'train'
    yaml = (sys.argv[2] if len(sys.argv) > 2
            else 'configs/kitti_models/GLENet_VR.yaml')
    root = Path(__file__).resolve().parent.parent
    cfg = cfg_from_yaml_file(str(root / yaml))
    if len(sys.argv) > 3:
        for proc in cfg.DATA_CONFIG.DATA_PROCESSOR:
            if proc.NAME == 'transform_points_to_voxels':
                mv = proc.MAX_NUMBER_OF_VOXELS
                if isinstance(mv, dict):
                    mv['test'] = int(sys.argv[3])

    det = build_detector(cfg)
    rng = np.random.RandomState(0)
    batch = make_batch(rng)
    variables = det.init(jax.random.PRNGKey(0), batch)

    if mode == 'predict':
        fn = jax.jit(lambda v, b: det.predict(v, b))
        run = lambda i: fn(variables, batch)  # noqa: E731
    else:
        tx = optax.adam(1e-3)
        params = variables['params']
        mstate = {k: v for k, v in variables.items() if k != 'params'}
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, key):
            def lf(p):
                return det.loss_fn({'params': p, **mstate}, batch, rng=key)
            (loss, _), grads = jax.value_and_grad(
                lf, has_aux=True)(params)
            u, o2 = tx.update(grads, opt_state)
            return optax.apply_updates(params, u), o2, loss

        state = {'params': params, 'opt': opt_state}

        def run(i):
            state['params'], state['opt'], loss = train_step(
                state['params'], state['opt'], jax.random.PRNGKey(i))
            return loss

    t0 = time.perf_counter()
    jax.block_until_ready(run(0))
    print(f'compile+run: {time.perf_counter() - t0:.1f}s', flush=True)

    trace_dir = f'/tmp/xprof_{Path(yaml).stem}_{mode}'
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    out = None
    for i in range(1, N_STEPS + 1):
        out = run(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N_STEPS
    jax.profiler.stop_trace()
    print(f'{mode}: {dt * 1e3:.1f} ms/dispatch (overlapped)', flush=True)

    ops = top_ops_from_trace(trace_dir)
    if ops is None:
        print('no xplane found / parse failed; raw trace at', trace_dir)
        return
    total = sum(t for t, _ in ops)
    print(f'\ntop device ops by self time ({N_STEPS} dispatches):')
    for t, name in ops:
        print(f'  {t / N_STEPS / 1e3:8.3f} ms/step  {name[:110]}')
    print(f'  (top-{len(ops)} sum {total / N_STEPS / 1e3:.1f} ms/step)')


if __name__ == '__main__':
    main()
