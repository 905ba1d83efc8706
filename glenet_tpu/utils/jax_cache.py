"""Persistent XLA compilation cache shared by the CLIs, tests, and the
driver entry points.

Compiles of the KITTI-scale train/predict steps take minutes on the
1-core host (CPU backend) and ~0.5-2 min on the TPU; the cache turns
every re-run with unchanged programs into a disk hit.  Safe across
concurrent processes (jax writes entries via atomic renames) and across
backends (backend id is part of the cache key).
"""
from __future__ import annotations

import os

DEFAULT_DIR = '/tmp/glenet_jax_cache'


def enable(path: str = DEFAULT_DIR) -> None:
    """Idempotent; call before the first compilation."""
    import jax
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    # default min_compile_time (1 s) skips trivial programs; keep it
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
