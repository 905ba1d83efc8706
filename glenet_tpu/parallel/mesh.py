"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's DDP/NCCL stack (SURVEY.md §2.5).

Data parallelism: 1-D mesh over all devices, batch sharded on axis 0,
parameters replicated; XLA inserts gradient all-reduces over ICI.

Tensor parallelism: 2-D ('data', 'model') mesh — large kernels are sharded
on their output-channel axis over 'model' (`param_shardings`); XLA's SPMD
partitioner propagates the shardings through the net and inserts the
all-gathers / reduce-scatters.  Pipeline/sequence/expert axes don't map
onto this architecture (a shallow conv-net with no sequential stage
boundary worth a pipeline bubble; the only "experts" are the tiny PLE-head
MMoE MLPs) — the mesh API leaves the axes open regardless.
"""
from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices=None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(devices=None, mp: int = 2) -> Mesh:
    """(data, model) mesh: dp = n_devices // mp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % mp == 0, f'{n} devices not divisible by mp={mp}'
    return Mesh(np.asarray(devices).reshape(n // mp, mp),
                (DATA_AXIS, MODEL_AXIS))


def param_shardings(tree, mesh: Mesh, min_size: int = 1 << 12):
    """Tensor-parallel shardings for a params-like pytree (params, or a
    whole TrainState — adam moments pick up the same rule by shape).

    Kernels with >= min_size elements and a 'model'-divisible last
    (output-channel) axis shard over MODEL_AXIS; everything else (biases,
    BN stats, scalars) replicates.  Output-channel sharding is the natural
    TP cut for conv/dense stacks: each shard computes its channel slice,
    and XLA all-gathers only where a full activation is required.
    """
    mp = mesh.shape[MODEL_AXIS]

    def rule(x):
        shape = getattr(x, 'shape', ())
        size = int(np.prod(shape)) if shape else 1
        if len(shape) >= 2 and size >= min_size and shape[-1] % mp == 0:
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def jit_train_step_2d(train_step, mesh: Mesh, state_shardings):
    """jit a (state, batch) -> (state, metrics) step on a (data, model)
    mesh: batch sharded over 'data', large kernels over 'model'."""
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        train_step,
        in_shardings=(state_shardings, data),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict with leading batch axis onto the mesh.

    Multi-process: each host passes its PER-HOST batch (the leading axis is
    this process's slice); the global batch is assembled across processes
    via make_array_from_process_local_data (global B = world x local B).
    Single-process: plain device_put of the full batch.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as np
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def put_replicated(tree, mesh: Mesh):
    """Replicate a host pytree onto every mesh device.

    Multi-process: every host must hold the same values (true for a train
    state created from the same seed/example, or restored from the same
    checkpoint); the fully-replicated global array is assembled from the
    per-process copies.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        import numpy as np
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.device_put(tree, sharding)


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
