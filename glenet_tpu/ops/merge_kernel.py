"""Pallas TPU kernel: resolve SORTED queries against a sorted id table.

Replaces the bitonic merged-sort searchsorted (ops/sparse.py
merged_searchsorted_deltas) for the sparse-conv table builds.  Every
query stream in the sparse path is sorted (each tap group's expected ids
are the sorted voxel ids plus a constant shift, or a monotone re-grid of
sorted output ids), so positions can be computed by windowed COUNTING
instead of sorting: ~110 ms/step of bitonic sorts plus ~25 ms of
associative scans and ~17 ms of permutation scatter in the round-5
GLENet-VR predict trace, vs a compare of each 256-query quarter against
its own ~1k-element table window.

v2 design (the round-4 kernel was exact but 3.5x slower than the sort —
its windows were 8192-element-aligned and it ran a predicated per-row
compare over the whole 1024-query block):

  - the table is pre-transformed in XLA to gt = ids * 16 + g1 | g2 << 2
    with g_k = clamp(ids[i+k] - ids[i], 0, 3): the min table value
    at-or-after a query then carries BOTH ids[pos] and the 2-bit
    successor deltas the x-block consumers need, so the kernel keeps
    just TWO accumulators (count + min) — exactness of the clamped-gap
    reconstruction is the same argument as the sort path's packed-gap
    form (values and true deltas saturate together at 3);
  - the table is stored in 8 REPLICAS staggered by 128 elements: any
    128-aligned window start maps to a 1024-aligned offset in one
    replica, so Mosaic's 1024-element 1-D DMA granularity costs at most
    128 elements of slop instead of up to 8192;
  - each grid step owns 1024 queries as an (8, 128) block, processed as
    4 QUARTERS of 256 queries; each quarter streams its own window in
    1024-element chunks (usually exactly one: a quarter's table span ~=
    256 / query-density, and the sparse-path streams are at least as
    dense as their tables).  Window starts / chunk counts come from a
    cheap XLA binary search over quarter-boundary values only.

Contract (drop-in for merged_searchsorted_deltas, packed form):
    pos = left-insertion index of q[b, g, j] into ids[b] (in [0, V]);
    dk  = clamp(ids[b][pos + k] - q, 0, 3)  (3 when pos + k is past the
          table) — exactly what the x-block hit logic consumes.

Requires table values * 16 within int32 (n_cells < 2^27; the KITTI /
Waymo full grids are ~9.4e7) — the kernel-path builders assert it.

Exactness is oracle-tested against merged_searchsorted_deltas
(tests/test_merge_kernel.py), including sentinel-padded tables, empty
active sets, and queries below the table.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_INF = np.int32(2 ** 31 - 1)
_POS_BITS = 20
BQ = 1024         # queries per grid step, as an (8, 128) block
_QTR = BQ // 4    # quarter: 2 sublanes x 128 lanes
_CHUNK = 1024     # table elements per DMA (Mosaic 1-D slice granularity)
_NREP = 8         # stagger replicas (128-element start granularity)

# Tri-state: True / False force; None = auto (kernel on real TPU, sort
# path elsewhere — compiled Pallas doesn't run on the CPU backend and
# interpret mode is too slow for the CPU test suite).  sparse.py
# consults enabled().
#
# Round-5 chip measurement (tools/validate_merge_kernel.py, after the
# chunk-row DMA fix that made Mosaic accept the kernel): EXACT at
# V=140k/VQ=160k but 395 ms vs the sort path's 67 ms — ~140 us/block
# across 2826 grid steps, i.e. per-block overhead (4 serialized
# start/wait DMA fences + scalar window setup per quarter) dominates a
# workload whose total table traffic is ~46 MB.  Kept OFF; the next
# tuning levers are fewer/bigger grid steps (BQ >= 4096) and
# double-buffered window streaming.
ENABLED = False
# Tests on the CPU backend set this so the kernel runs interpreted.
INTERPRET = False

_AUTO_ENABLED = None


def enabled():
    global _AUTO_ENABLED
    if ENABLED is not None:
        return ENABLED
    if _AUTO_ENABLED is None:
        import jax
        _AUTO_ENABLED = jax.default_backend() == 'tpu'
    return _AUTO_ENABLED


def _kernel(off_ref, nst_ref, pos0_ref, flat_hbm, q_ref, out_ref,
            cnt_ref, m_ref, scratch, sem):
    """One grid step: 4 quarters x 256 sorted queries.

    off/nst/pos0: scalar-prefetch (n_quarters,) int32 — absolute
    1024-aligned window offset into the replicated flat table, chunk
    count, and the window start in TABLE-element units.  flat_hbm:
    (B * 8 * L,) int32 gt values (INF padding).  q_ref/out_ref: (8, 128)
    int32; cnt/m: (2, 128) accumulator scratch; scratch: (_CHUNK,)
    window chunk; sem: DMA.
    """
    k = pl.program_id(0)
    for quarter in range(4):                       # static unroll
        qi = k * 4 + quarter
        off = off_ref[qi]              # window start, CHUNK-row units
        n = nst_ref[qi]
        p0 = pos0_ref[qi]
        qv = q_ref[2 * quarter:2 * quarter + 2, :]           # (2, 128)

        cnt_ref[:, :] = jnp.zeros((2, 128), jnp.int32)
        m_ref[:, :] = jnp.full((2, 128), _I32_INF, jnp.int32)

        def body(s, _):
            # Chunk-indexed DMA: the table is (n_chunks, 8, 128), so the
            # sliced dim is an untiled leading dim and each chunk is a
            # native (8, 128) tile (a dynamic 1-D flat offset fails
            # Mosaic's divisible-by-tiling proof; a (N, 1024) row slice
            # fails the sublane-8 alignment check).
            cp = pltpu.make_async_copy(
                flat_hbm.at[off + s], scratch, sem)
            cp.start()
            cp.wait()
            cnt = cnt_ref[:, :]
            m = m_ref[:, :]
            for r in range(8):                       # static sublanes
                t = scratch[r, :].reshape(1, 1, 128)
                ge = t >= qv[:, :, None]             # (2, 128, 128)
                cnt = cnt + jnp.sum(
                    jnp.where(ge, 0, 1), axis=2, dtype=jnp.int32)
                m = jnp.minimum(m, jnp.min(
                    jnp.where(ge, t, _I32_INF), axis=2))
            cnt_ref[:, :] = cnt
            m_ref[:, :] = m
            return 0

        lax.fori_loop(0, n, body, 0)
        m = m_ref[:, :]
        k0 = m >> 4
        qorig = qv >> 4        # q16 multiples of 16 shift back exactly
        pos = p0 + cnt_ref[:, :]
        packed = pos | jnp.clip(k0 - qorig, 0, 3) << _POS_BITS
        packed = packed | jnp.clip(k0 + (m & 3) - qorig, 0, 3) \
            << (_POS_BITS + 2)
        packed = packed | jnp.clip(k0 + ((m >> 2) & 3) - qorig, 0, 3) \
            << (_POS_BITS + 4)
        out_ref[2 * quarter:2 * quarter + 2, :] = packed


@functools.partial(jax.jit, static_argnames=('interpret',))
def resolve_sorted_queries(ids, queries, interpret: bool = False):
    """Positions + successor deltas of sorted queries in sorted tables.

    Args:
        ids: (B, V) int32, each row sorted ascending (sentinel padding at
            the end is fine; it is just a large value).
        queries: (B, G, Vq) int32, each [b, g] row sorted ascending.
            Values must satisfy |value| * 16 < 2^31 (the kernel-path
            builders assert the grid-derived bound).
    Returns:
        (pos, d0, d1, d2): each (B, G, Vq) int32 — pos in [0, V],
        dk = clamp(ids[b, pos + k] - q, 0, 3) with 3 past the table.
    """
    b, v = ids.shape
    _, g, vq = queries.shape
    assert v < (1 << _POS_BITS), v

    # gapped table values: gt = ids * 16 + g1 | g2 << 2
    g1 = jnp.clip(jnp.concatenate(
        [ids[:, 1:], jnp.full((b, 1), _I32_INF, ids.dtype)],
        axis=1) - ids, 0, 3)
    g2 = jnp.clip(jnp.concatenate(
        [ids[:, 2:], jnp.full((b, 2), _I32_INF, ids.dtype)],
        axis=1) - ids, 0, 3)
    gt = ids * 16 + (g1 | g2 << 2)

    # 8 staggered replicas, each L elements (1024-multiple with margin)
    l_rep = (-(-(v + 1) // _CHUNK) + 2) * _CHUNK
    gt_pad = jnp.concatenate(
        [gt, jnp.full((b, l_rep + _NREP * 128 - v), _I32_INF,
                      jnp.int32)], axis=1)
    reps = jnp.stack([gt_pad[:, r * 128:r * 128 + l_rep]
                      for r in range(_NREP)], axis=1)     # (B, 8, L)
    flat = reps.reshape(-1, 8, 128)   # (8,128)-tile chunks: aligned DMA

    # queries -> scaled, padded to BQ blocks
    vq_pad = -(-vq // BQ) * BQ
    q16 = queries * 16
    if vq_pad != vq:
        q16 = jnp.concatenate(
            [q16, jnp.full((b, g, vq_pad - vq), _I32_INF, jnp.int32)],
            axis=-1)
    nb_row = vq_pad // BQ
    n_blocks = b * g * nb_row
    n_quarters = n_blocks * 4

    # quarter-boundary window bounds via per-sample binary search
    qtr = q16.reshape(b, g * nb_row * 4, _QTR)
    ws = jax.vmap(lambda t, s: jnp.searchsorted(
        t, s, side='left', method='scan'))(gt, qtr[:, :, 0])
    we = jax.vmap(lambda t, s: jnp.searchsorted(
        t, s, side='left', method='scan'))(gt, qtr[:, :, -1])
    start128 = (ws // 128) * 128                          # (B, nq_b)
    rep_idx = (start128 // 128) % _NREP
    base = (jnp.arange(b, dtype=jnp.int32) * _NREP * l_rep)[:, None]
    # Element offset is a multiple of _CHUNK by construction (stagger
    # maps any 128-aligned start into one replica's 1024 grid); pass it
    # in CHUNK-row units for the row-indexed DMA.
    off = ((base + rep_idx * l_rep
            + (start128 - rep_idx * 128)) // _CHUNK
           ).astype(jnp.int32).reshape(-1)
    n_steps = jnp.maximum(
        (we + 1 - start128 + _CHUNK - 1) // _CHUNK, 1
    ).astype(jnp.int32).reshape(-1)
    pos0 = start128.astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # flat table
            pl.BlockSpec((8, 128), lambda k, *_: (k, 0)),  # queries
        ],
        out_specs=pl.BlockSpec((8, 128), lambda k, *_: (k, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 128), jnp.int32),              # count
            pltpu.VMEM((2, 128), jnp.int32),              # min
            pltpu.VMEM((8, 128), jnp.int32),              # window chunk
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    packed = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.int32),
        interpret=interpret,
    )(off, n_steps, pos0, flat, q16.reshape(n_blocks * 8, 128))

    packed = packed.reshape(b, g, vq_pad)[:, :, :vq]
    pos = packed & ((1 << _POS_BITS) - 1)
    outs = [pos]
    for d in range(3):
        outs.append((packed >> (_POS_BITS + 2 * d)) & 3)
    return tuple(outs)
