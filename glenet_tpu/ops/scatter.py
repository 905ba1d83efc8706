"""Segment reductions with static segment counts.

TPU replacement for torch_scatter (used by the reference's dynamic VFEs,
pcdet/models/backbones_3d/vfe/dynamic_pillar_vfe.py:5-9): `jax.ops.segment_*`
with static `num_segments` so XLA compiles a single fused scatter.
Negative segment ids are dropped.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    ids = jnp.where(segment_ids >= 0, segment_ids, num_segments)
    out = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_mean(data, segment_ids, num_segments: int):
    ids = jnp.where(segment_ids >= 0, segment_ids, num_segments)
    total = jax.ops.segment_sum(data, ids, num_segments=num_segments + 1)
    count = jax.ops.segment_sum(jnp.ones_like(ids, data.dtype), ids,
                                num_segments=num_segments + 1)
    return (total / jnp.clip(count[..., None] if data.ndim > 1 else count,
                             1.0, None))[:num_segments]


def segment_max(data, segment_ids, num_segments: int, fill_value=0.0):
    ids = jnp.where(segment_ids >= 0, segment_ids, num_segments)
    out = jax.ops.segment_max(data, ids, num_segments=num_segments + 1)
    # segment_max fills empty segments with -inf; replace for stability
    out = jnp.where(jnp.isfinite(out), out, fill_value)
    return out[:num_segments]
