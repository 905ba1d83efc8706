"""Load the reference's pure-torch utility modules as golden oracles.

The reference lives read-only at /root/reference; its package __init__ pulls
in CUDA extensions, so we fake the package chain and stub the native deps,
loading only the pure-python modules we compare against (box coder, losses,
common geometry).  Used by the golden-parity tests; returns None when the
reference tree is unavailable so the tests skip cleanly elsewhere.
"""
import importlib.util
import sys
import types

REF = '/root/reference'


def _identity_jit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]
    return lambda f: f


def load_reference_utils():
    import os
    if not os.path.isdir(REF):
        return None

    # CPU-only torch: make .cuda() a no-op so reference modules that move
    # constants to the GPU still load/run
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # stub optional native deps
    for missing in ('SharedArray', 'torch_scatter'):
        sys.modules.setdefault(missing, types.ModuleType(missing))
    numba = types.ModuleType('numba')
    numba.jit = _identity_jit
    numba.njit = _identity_jit
    sys.modules.setdefault('numba', numba)

    # fake package chain + stub the CUDA-ext op modules box_utils imports
    pcdet = types.ModuleType('pcdet')
    pcdet.__path__ = [f'{REF}/pcdet']
    sys.modules['pcdet'] = pcdet
    up = types.ModuleType('pcdet.utils')
    up.__path__ = [f'{REF}/pcdet/utils']
    sys.modules['pcdet.utils'] = up
    ops = types.ModuleType('pcdet.ops')
    ops.__path__ = [f'{REF}/pcdet/ops']
    sys.modules['pcdet.ops'] = ops
    rp = types.ModuleType('pcdet.ops.roiaware_pool3d')
    sys.modules['pcdet.ops.roiaware_pool3d'] = rp
    rpu = types.ModuleType('pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils')
    sys.modules['pcdet.ops.roiaware_pool3d.roiaware_pool3d_utils'] = rpu
    rp.roiaware_pool3d_utils = rpu

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mods = {}
    mods['common_utils'] = load('pcdet.utils.common_utils',
                                f'{REF}/pcdet/utils/common_utils.py')
    mods['box_coder_utils'] = load('pcdet.utils.box_coder_utils',
                                   f'{REF}/pcdet/utils/box_coder_utils.py')
    mods['box_utils'] = load('pcdet.utils.box_utils',
                             f'{REF}/pcdet/utils/box_utils.py')
    mods['loss_utils'] = load('pcdet.utils.loss_utils',
                              f'{REF}/pcdet/utils/loss_utils.py')
    return mods
