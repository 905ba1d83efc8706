"""Test config: force CPU backend with 8 virtual devices so sharding/mesh
tests run without TPU hardware, and keep everything deterministic.

Note: in this environment the axon TPU plugin ignores JAX_PLATFORMS from the
environment, so we must override via jax.config before any computation.
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')

from glenet_tpu.utils import jax_cache

jax_cache.enable()  # repeated suite runs hit the persistent XLA cache

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(42)
