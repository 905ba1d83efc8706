"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL stack (SURVEY.md §2.5).

Data parallelism: 1-D mesh over all devices, batch sharded on axis 0,
parameters replicated; XLA inserts gradient all-reduces over ICI.  The mesh
is named ('data',) now but model code takes `axis_name` so tensor/pipeline
axes can be added without refactoring.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with leading batch axis onto the mesh."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def jit_train_step(train_step, mesh: Mesh):
    """jit a (state, batch) -> (state, metrics) step with DP shardings."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def jit_eval_step(eval_step, mesh: Mesh):
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(rep, data), out_shardings=data)
