"""Multi-host utilities — TPU-native replacements for the reference's
torch.distributed stack (SURVEY.md §2.5):

  - `initialize()` wraps jax.distributed.initialize (replaces torchrun /
    slurm NCCL bootstrap, common_utils.py:134-177);
  - `get_dist_info()` -> (rank, world_size) from jax.process_index/count;
  - `all_gather_objects` replaces the pickle-file + barrier
    `merge_results_dist` (common_utils.py:202-223) with
    multihost_utils.process_allgather;
  - `barrier()` replaces dist.barrier().
Single-process environments degrade to no-ops.
"""
from __future__ import annotations

import pickle

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op when single-process / already up).

    Must run before anything touches the XLA backend — even
    jax.process_count() initializes it, so the already-up check goes
    through the distributed client state, not a device query."""
    if coordinator_address is None:
        return  # single-host
    from jax._src import distributed as _jax_dist
    if _jax_dist.global_state.client is not None:
        return  # already initialized (e.g. Cloud TPU auto-bootstrap)
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def get_dist_info():
    return jax.process_index(), jax.process_count()


def barrier(name: str = 'barrier'):
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


def all_gather_objects(obj):
    """Gather an arbitrary picklable object from every process.

    Returns a list of length process_count (rank order).  Replaces the
    reference's filesystem merge: objects are pickled to byte arrays,
    padded to the global max length, and allgathered over the ICI/DCN.
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    length = np.array([payload.size], np.int32)
    all_lengths = multihost_utils.process_allgather(length)
    max_len = int(all_lengths.max())
    padded = np.zeros(max_len, np.uint8)
    padded[:payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for i in range(jax.process_count()):
        n = int(all_lengths[i][0]) if all_lengths.ndim > 1 else int(all_lengths[i])
        out.append(pickle.loads(gathered[i][:n].tobytes()))
    return out


def merge_results_dist(part_list, total_size: int):
    """Rank-ordered merge of per-process result lists truncated to
    total_size (semantics of common_utils.merge_results_dist)."""
    gathered = all_gather_objects(part_list)
    merged = []
    for results in zip(*gathered):
        merged.extend(results)
    # interleaved sampler order -> flatten; truncate wrap-padding
    flat = [x for part in gathered for x in part]
    return flat[:total_size] if len(flat) >= total_size else merged[:total_size]
