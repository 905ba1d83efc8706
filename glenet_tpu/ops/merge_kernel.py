"""Pallas TPU kernel: resolve SORTED queries against a sorted id table.

Replaces the bitonic merged-sort searchsorted (ops/sparse.py
merged_searchsorted_deltas) for the sparse-conv table builds.  Every
query stream in the sparse path is sorted (each tap group's expected ids
are the sorted voxel ids plus a constant shift, or a monotone re-grid of
sorted output ids), so positions can be computed by MERGING instead of
sorting: the bitonic sort of (table ++ 9V queries) moves ~10V keys
through log^2 stages (~45-55 ms per level-2/3 table build in the
round-4 GLENet-VR predict trace, plus ~17 ms of permutation scatter and
~15 ms of associative-scan passes), while a merge touches each table
element once per group at streaming bandwidth.

Contract (drop-in for merged_searchsorted_deltas, packed form):
    pos = left-insertion index of q[b, g, j] into ids[b] (in [0, V]);
    dk  = clamp(ids[b][pos + k] - q, 0, 3)  (3 when pos + k is past the
          table) — exactly what the x-block hit logic consumes.

Kernel shape: grid over fixed-size blocks of BQ sorted queries.  Block
k's answers depend only on table rows in [pos(first q), pos(last q)+3);
the kernel streams the ALIGNED cover of that window in 1024-element
chunks (Mosaic requires 1024-aligned 1-D slices) via manual HBM->VMEM
DMA, accumulating for each query
    count  += #(chunk elements < q)          -> pos = row_base + count
    min0/1/2 = min over chunk elements >= q of (element, succ1, succ2)
Elements outside the true window need no masking: those below it are
< every in-block query (counted correctly, never >= q), those above are
>= the last query and larger than any true successor (never counted,
never win a min), and the table's INF padding rows behave like "no
successor".  Window row starts come from a cheap XLA binary search over
the (queries / BQ) block-boundary values only, passed via scalar
prefetch.

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
BQ = 512          # queries per grid step
_ROW = 1024       # table elements per DMA row (Mosaic 1-D tiling unit)

# Flip to run every x-block/strided table build through this kernel
# (sparse.py consults it).  Round-4 chip validation: EXACT match at
# V=140k/VQ=160k (tools/validate_merge_kernel.py), but 388.6 ms vs the
# sort path's 111.2 ms — the per-row predicated compare and the 3-D
# (8, BQ/8, _ROW) reductions lower poorly at this tuning, so the bitonic
# sort path stays the default.  Kept (exact + oracle-tested) as the
# starting point for kernel-side tuning: double-buffered DMA, a
# lane-aligned query layout that avoids the 3-D broadcast, and narrower
# accumulators are the known levers.
ENABLED = False
# Tests on the CPU backend set this so the kernel runs interpreted.
INTERPRET = False


def _kernel(wsg_ref, nstep_ref, tbase_ref, ids_hbm, q_ref, out_ref,
            cnt_ref, m0_ref, m1_ref, m2_ref, scratch, sem):
    """One grid step: resolve BQ sorted queries.

    wsg/nstep/tbase: scalar-prefetch (n_blocks,) int32 — window start in
    8-ROW GROUPS (local), number of 8-row group steps, global table row
    base of this block's sample.  ids_hbm: (R_total, _ROW) int32 in HBM.
    q_ref/out_ref: (8, BQ/8) int32 VMEM blocks; cnt/m0/m1/m2: (8, BQ/8)
    accumulator scratch; scratch: (16, _ROW) table window; sem: DMA.

    Per 8-row group the kernel DMAs 16 rows (8 + successor margin) from
    an 8-aligned start (Mosaic requires 8-row-aligned dynamic slices) and
    statically unrolls the 8 rows.  Each row is screened by its scalar
    min/max against the block's query range: rows entirely below add
    _ROW to every count, rows entirely above contribute (cheaply) only
    their first three elements as successor candidates, and only rows
    STRADDLING the range — ~span/_ROW + 2 per block — pay the full
    (8, BQ/8, _ROW) compare.
    """
    k = pl.program_id(0)
    ws_g = wsg_ref[k]
    n_steps = nstep_ref[k]
    tbase = tbase_ref[k]
    q = q_ref[:, :]                                  # (8, BQ/8) sorted
    q_first = q_ref[0, 0]
    q_last = q_ref[8 - 1, BQ // 8 - 1]
    lane = lax.broadcasted_iota(jnp.int32, (1, _ROW), 1)

    cnt_ref[:, :] = jnp.zeros_like(q)
    m0_ref[:, :] = jnp.full_like(q, _I32_INF)
    m1_ref[:, :] = jnp.full_like(q, _I32_INF)
    m2_ref[:, :] = jnp.full_like(q, _I32_INF)

    def group_step(s, _):
        start = pl.multiple_of((tbase + (ws_g + s) * 8), 8)
        cp = pltpu.make_async_copy(
            ids_hbm.at[pl.ds(start, 16), :], scratch, sem)
        cp.start()
        cp.wait()
        for j in range(8):                           # static unroll
            rmin = scratch[j, 0]
            rmax = scratch[j, _ROW - 1]
            nx0 = scratch[j + 1, 0]
            nx1 = scratch[j + 1, 1]
            # unconditional cheap successor candidates: if this row is
            # the first at-or-above a query, that query's successors are
            # the row's first three elements (exact); for any other query
            # these candidates are larger than the true successors and
            # lose the running min
            ge0 = rmin >= q
            m0_ref[:, :] = jnp.minimum(
                m0_ref[:, :], jnp.where(ge0, rmin, _I32_INF))
            m1_ref[:, :] = jnp.minimum(
                m1_ref[:, :], jnp.where(ge0, scratch[j, 1], _I32_INF))
            m2_ref[:, :] = jnp.minimum(
                m2_ref[:, :], jnp.where(ge0, scratch[j, 2], _I32_INF))

            below_all = rmax < q_first
            straddle = jnp.logical_not(below_all) & (rmin <= q_last)

            @pl.when(below_all)
            def _():
                cnt_ref[:, :] = cnt_ref[:, :] + _ROW

            @pl.when(straddle)
            def _():
                t0 = scratch[j:j + 1, :]             # (1, _ROW)
                t1 = jnp.where(lane < _ROW - 1,
                               pltpu.roll(t0, _ROW - 1, 1), nx0)
                t2 = jnp.where(lane < _ROW - 2,
                               pltpu.roll(t0, _ROW - 2, 1),
                               jnp.where(lane == _ROW - 2, nx0, nx1))
                ge = t0[None] >= q[:, :, None]       # (8, BQ/8, _ROW)
                cnt_ref[:, :] = cnt_ref[:, :] + jnp.sum(
                    jnp.where(ge, 0, 1), axis=2, dtype=jnp.int32)
                m0_ref[:, :] = jnp.minimum(m0_ref[:, :], jnp.min(
                    jnp.where(ge, t0[None], _I32_INF), axis=2))
                m1_ref[:, :] = jnp.minimum(m1_ref[:, :], jnp.min(
                    jnp.where(ge, t1[None], _I32_INF), axis=2))
                m2_ref[:, :] = jnp.minimum(m2_ref[:, :], jnp.min(
                    jnp.where(ge, t2[None], _I32_INF), axis=2))
        return 0

    lax.fori_loop(0, n_steps, group_step, 0)
    pos = ws_g * (8 * _ROW) + cnt_ref[:, :]
    packed = pos
    for d, m_ref in enumerate((m0_ref, m1_ref, m2_ref)):
        # pre-clamp before subtracting so INF - negative can't wrap
        delta = jnp.clip(jnp.minimum(m_ref[:, :], q + 4) - q, 0, 3)
        packed = packed | delta << (_POS_BITS + 2 * d)
    out_ref[:, :] = packed


@functools.partial(jax.jit, static_argnames=('interpret',))
def resolve_sorted_queries(ids, queries, interpret: bool = False):
    """Positions + successor deltas of sorted queries in sorted tables.

    Args:
        ids: (B, V) int32, each row sorted ascending (sentinel padding at
            the end is fine; it is just a large value).
        queries: (B, G, Vq) int32, each [b, g] row sorted ascending.
            Any int32 values well clear of +-2^28 work (grid linear ids
            plus tap shifts; negatives from below-grid shifts are fine).
    Returns:
        (pos, d0, d1, d2): each (B, G, Vq) int32 — pos in [0, V],
        dk = clamp(ids[b, pos + k] - q, 0, 3) with 3 past the table.
    """
    b, v = ids.shape
    _, g, vq = queries.shape
    assert v < (1 << _POS_BITS), v
    vq_pad = -(-vq // BQ) * BQ
    nb_row = vq_pad // BQ
    n_blocks = b * g * nb_row

    qp = jnp.concatenate(
        [queries,
         jnp.full((b, g, vq_pad - vq), np.int32(2 ** 28), jnp.int32)],
        axis=-1) if vq_pad != vq else queries

    # per-sample table rows: aligned cover of V plus margin so the last
    # window group's 16-row DMA stays inside this sample's padding
    grp = 8 * _ROW
    rows_v = -(-v // _ROW)
    rows_pad = (-(-rows_v // 8)) * 8 + 24
    ids_rows = jnp.concatenate(
        [ids, jnp.full((b, rows_pad * _ROW - v), _I32_INF, jnp.int32)],
        axis=-1).reshape(b * rows_pad, _ROW)

    # block-boundary positions via a cheap per-sample binary search over
    # n_blocks values only (method='scan': log2(V) rounds of tiny gathers)
    bounds = qp.reshape(b, g * nb_row, BQ)
    ws = jax.vmap(lambda t, s: jnp.searchsorted(
        t, s, side='left', method='scan'))(ids, bounds[:, :, 0])
    we = jax.vmap(lambda t, s: jnp.searchsorted(
        t, s, side='left', method='scan'))(ids, bounds[:, :, -1])
    ws_g = (ws // grp).astype(jnp.int32).reshape(-1)
    n_steps = (
        (we + 3 - (ws // grp) * grp + grp - 1) // grp
    ).astype(jnp.int32).reshape(-1)
    tbase = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32) * rows_pad, g * nb_row)

    # Mosaic block-shape rule: last two dims divisible by (8, 128) or
    # equal to the array dims — lay queries out as (n_blocks * 8, 64) so
    # each grid step owns an (8, 64) block holding its BQ=512 queries
    # row-major
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # ids rows (HBM)
            pl.BlockSpec((8, BQ // 8), lambda k, *_: (k, 0)),  # queries
        ],
        out_specs=pl.BlockSpec((8, BQ // 8), lambda k, *_: (k, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, BQ // 8), jnp.int32),          # count
            pltpu.VMEM((8, BQ // 8), jnp.int32),          # m0
            pltpu.VMEM((8, BQ // 8), jnp.int32),          # m1
            pltpu.VMEM((8, BQ // 8), jnp.int32),          # m2
            pltpu.VMEM((16, _ROW), jnp.int32),            # table window
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    packed = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * 8, BQ // 8), jnp.int32),
        interpret=interpret,
    )(ws_g, n_steps, tbase, ids_rows, qp.reshape(n_blocks * 8, BQ // 8))

    packed = packed.reshape(b, g, vq_pad)[:, :, :vq]
    pos = packed & ((1 << _POS_BITS) - 1)
    outs = [pos]
    for d in range(3):
        outs.append((packed >> (_POS_BITS + 2 * d)) & 3)
    return tuple(outs)
