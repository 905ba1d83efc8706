"""TPU-native sparse 3D convolution primitives.

Replaces spconv (submanifold + strided sparse conv, SURVEY.md §2.4) with a
gather-GEMM-scatter formulation over *static-budget* active-voxel tables:

  - a sparse tensor is (features (V, C), ids (V,) int32, mask (V,)) where
    `ids` are linearized (z, y, x) coordinates, SORTED ascending, with
    invalid slots holding the sentinel `n_cells` (so they sort last);
  - neighbor lookup is a vectorized binary search (jnp.searchsorted) of the
    27 shifted ids — O(K * V * log V) dense work, no hash tables and no
    dense (nz, ny, nx) index grid (which at KITTI stride-1 resolution would
    be 92M cells);
  - the convolution itself is K small GEMMs (gathered neighbors @ W[k]),
    which XLA maps onto the MXU;
  - strided (non-submanifold) conv first enumerates candidate output sites
    (the spconv activation rule: every site reachable from an input site),
    uniquifies them under a static output budget, then gathers inputs.

All functions are per-sample and pure; modules vmap them over the batch.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _as3(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


def kernel_offsets(kernel_size) -> np.ndarray:
    """(K, 3) integer offsets in (z, y, x) order, row-major k index."""
    kz, ky, kx = _as3(kernel_size)
    return np.stack(np.meshgrid(
        np.arange(kz), np.arange(ky), np.arange(kx),
        indexing='ij'), axis=-1).reshape(-1, 3)


def linearize(z, y, x, grid):
    nx, ny, nz = grid
    return z * (ny * nx) + y * nx + x


def delinearize(ids, grid):
    nx, ny, nz = grid
    z = ids // (ny * nx)
    rem = ids % (ny * nx)
    return z, rem // nx, rem % nx


def out_grid_size(grid, kernel_size, stride, padding) -> Tuple[int, int, int]:
    """Output (nx, ny, nz) for a strided sparse conv (conv arithmetic)."""
    kz, ky, kx = _as3(kernel_size)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nx, ny, nz = grid
    ox = (nx + 2 * px - kx) // sx + 1
    oy = (ny + 2 * py - ky) // sy + 1
    oz = (nz + 2 * pz - kz) // sz + 1
    return (ox, oy, oz)


_I32_INF = np.int32(2 ** 31 - 1)


def merged_searchsorted(ids, queries):
    """Insertion positions ('left') of each row of `queries` into sorted
    `ids`, computed with ONE combined sort instead of per-element binary
    search (jnp.searchsorted's while-loop of row gathers runs at HBM
    latency on TPU; a bitonic sort of the concatenated keys is pure
    vector work).

    Each query's position is independent (count of table keys before it in
    the combined order), so query rows need not be sorted.  Table builders
    that also need the table VALUES around the insertion point use
    merged_searchsorted_deltas instead.

    Args:
        ids: (V,) sorted ascending.
        queries: (Q, V) arbitrary.
    Returns:
        (Q, V) int32 positions in [0, V].
    """
    q, nq = queries.shape
    nt = ids.shape[0]
    keys = jnp.concatenate([ids, queries.reshape(-1)])
    # tag: table=1, query=0 -> on equal keys the query sorts first, so the
    # exclusive cumsum of table tags counts ids strictly below ('left')
    tag = jnp.concatenate([jnp.ones(nt, jnp.int32),
                           jnp.zeros(q * nq, jnp.int32)])
    payload = jnp.concatenate([jnp.full((nt,), q * nq, jnp.int32),
                               jnp.arange(q * nq, dtype=jnp.int32)])
    _, st, sp = jax.lax.sort((keys, tag, payload), num_keys=2)
    pos = jnp.cumsum(st) - st
    out = jnp.zeros(q * nq + 1, jnp.int32).at[sp].set(pos.astype(jnp.int32))
    return out[:q * nq].reshape(q, nq)


_POS_BITS = 20          # packed layout: pos | d0 << 20 | d1 << 22 | d2 << 24
_POS_MASK = (1 << _POS_BITS) - 1


_GAP_BITS = 22          # table-row payload: dump_slot | g1<<22 | g2<<24


def merged_searchsorted_deltas(ids, queries, n_deltas: int = 3):
    """merged_searchsorted specialised for the table builders: returns
    (pos, d0[, d1, d2]) with dk = clamp(ids[pos + k] - query, 0, 3) —
    enough to decide membership of query + 0/1/2 without any id gathers.

    Cost structure vs merged_searchsorted(want_vals=3):
      - the table/query tag is folded into the sort key's low bit
        (key * 2 + tag; queries sort before equal table keys), dropping
        one sort operand;
      - successor VALUES are never carried through the sort: the sorted
        key sequence itself holds every table value, so ONE reverse
        associative min-scan of (table_value * 16 + clamped_gaps)
        recovers ids[pos] and — via the 2-bit successor gaps
        g_k = clamp(ids[i+k] - ids[i], 0, 3), packed into the table
        rows' payload high bits before the sort — ids[pos+1] and
        ids[pos+2] as well (clamping is exact for the [0, 3] deltas the
        callers consume: gap > 3 and true delta > 3 both saturate).
        The round-4 form carried 3 successor-value operands and ran 3
        scans; this form sorts (key, payload) only and runs 1 scan;
      - pos and the three 2-bit deltas pack into ONE int32
        (pos | d0<<20 | d1<<22 | d2<<24), so ONE permutation scatter maps
        results back to query order instead of four (~15-18 ms each at
        level-2/3 scale in the round-4 trace).

    Requires len(ids) < 2^20 per-sample table slots (asserted),
    keys * 2 within int32, and (for n_deltas > 1) table values * 16
    within int32 — i.e. n_cells < 2^27 (KITTI/Waymo full grids are
    ~9.3e7 < 1.34e8; the table builders assert it where the grid is
    known).
    """
    q, nq = queries.shape
    nt = ids.shape[0]
    assert nt < (1 << _POS_BITS), nt
    assert q * nq < (1 << _GAP_BITS), (q, nq)
    keys = jnp.concatenate([ids, queries.reshape(-1)])
    key2 = keys * 2 + jnp.concatenate(
        [jnp.ones(nt, jnp.int32), jnp.zeros(q * nq, jnp.int32)])
    if n_deltas > 1:
        # per-table-row successor gaps, clamped to the 2-bit range
        g1 = jnp.clip(jnp.concatenate(
            [ids[1:], jnp.full((1,), _I32_INF, ids.dtype)]) - ids, 0, 3)
        gaps = g1
        if n_deltas > 2:
            g2 = jnp.clip(jnp.concatenate(
                [ids[2:], jnp.full((2,), _I32_INF, ids.dtype)]) - ids,
                0, 3)
            gaps = gaps | g2 << 2
        tbl_payload = jnp.int32(q * nq) | gaps << _GAP_BITS
    else:
        tbl_payload = jnp.full((nt,), q * nq, jnp.int32)
    payload = jnp.concatenate([tbl_payload,
                               jnp.arange(q * nq, dtype=jnp.int32)])
    sk, sp = jax.lax.sort((key2, payload), num_keys=1)
    st = sk & 1                                    # tag: 1 = table row
    pos = (jnp.cumsum(st) - st).astype(jnp.int32)
    skey = sk >> 1                                 # original key
    # one reverse min-scan carries (next table value at-or-after) — for
    # n_deltas > 1 scaled by 16 with that value's successor gaps in the
    # low 4 bits (n_deltas == 1 keeps the old 2x-only headroom)
    if n_deltas > 1:
        sgaps = sp >> _GAP_BITS
        v = jnp.where(st == 1, skey * 16 + sgaps, _I32_INF)
        vmin = jax.lax.associative_scan(jnp.minimum, v, reverse=True)
        k0 = vmin >> 4
    else:
        v = jnp.where(st == 1, skey, _I32_INF)
        vmin = jax.lax.associative_scan(jnp.minimum, v, reverse=True)
        k0 = vmin
    packed = pos | jnp.clip(k0 - skey, 0, 3) << _POS_BITS
    if n_deltas > 1:
        packed = packed | jnp.clip(k0 + (vmin & 3) - skey, 0, 3) \
            << (_POS_BITS + 2)
    if n_deltas > 2:
        packed = packed | jnp.clip(k0 + ((vmin >> 2) & 3) - skey, 0, 3) \
            << (_POS_BITS + 4)
    sp_idx = jnp.where(st == 1, q * nq, sp & ((1 << _GAP_BITS) - 1))
    out = jnp.zeros(q * nq + 1, jnp.int32).at[sp_idx].set(packed)[:q * nq]
    out = out.reshape(q, nq)
    res = [out & _POS_MASK]
    for d in range(n_deltas):
        res.append((out >> (_POS_BITS + 2 * d)) & 3)
    return tuple(res)


def subm_neighbor_table(ids, mask, grid, kernel_size=3):
    """Neighbor slot indices for submanifold conv.

    Args:
        ids: (V,) sorted linear ids (invalid slots == n_cells sentinel).
        mask: (V,) bool validity.
    Returns:
        nbr_idx: (K, V) int32 — slot index of each neighbor, or V (padding
                 row) when absent;
    The center offset contributes the voxel itself.

    Optimization: linear ids are x-minor, so the (dz, dy, +-1) neighbors sit
    immediately adjacent (in sorted order) to the (dz, dy, 0) hit — only the
    kx-center offsets need a binary search; +-x slots derive from pos +- 1.
    For a 3^3 kernel that cuts searchsorted queries from 27 V to 9 V.
    """
    kz, ky, kx = _as3(kernel_size)
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    v = ids.shape[0]
    assert kx == 3 or kx == 1, 'x-kernel sizes 1/3 supported'

    z, y, x = delinearize(jnp.where(mask, ids, 0), grid)
    hz = (kz - 1) // 2
    hy = (ky - 1) // 2
    center_offs = np.stack(np.meshgrid(
        np.arange(kz) - hz, np.arange(ky) - hy, indexing='ij'),
        axis=-1).reshape(-1, 2)                                  # (kz*ky, 2)
    d = jnp.asarray(center_offs, jnp.int32)
    tz = z[None, :] + d[:, 0:1]                                  # (kz*ky, V)
    ty = y[None, :] + d[:, 1:2]
    valid_c = (mask[None, :]
               & (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny))
    tid_c = jnp.where(valid_c, linearize(tz, ty, x[None, :], grid), n_cells)

    pos_c = jnp.clip(merged_searchsorted(ids, tid_c), 0, v - 1)  # (kz*ky, V)
    found_c = valid_c & (ids[pos_c] == tid_c) & (tid_c < n_cells)
    center = jnp.where(found_c, pos_c, v).astype(jnp.int32)

    if kx == 1:
        return center

    # x-1 neighbor: the entry just below the insertion point of tid_c
    pos_m = jnp.clip(pos_c - 1, 0, v - 1)
    tid_m = tid_c - 1
    found_m = valid_c & (x[None, :] - 1 >= 0) & (ids[pos_m] == tid_m) \
        & (tid_c < n_cells)
    minus = jnp.where(found_m, pos_m, v).astype(jnp.int32)

    # x+1 neighbor: the entry just after the found/insertion position.
    # if tid_c itself is present it sits at pos_c, so x+1 is at pos_c + 1;
    # if absent, pos_c already points at the first id > tid_c.
    pos_p = jnp.clip(pos_c + found_c.astype(jnp.int32), 0, v - 1)
    tid_p = tid_c + 1
    found_p = valid_c & (x[None, :] + 1 < nx) & (ids[pos_p] == tid_p) \
        & (tid_c < n_cells)
    plus = jnp.where(found_p, pos_p, v).astype(jnp.int32)

    # interleave to row-major (dz, dy, dx) tap order
    kzy = kz * ky
    out = jnp.stack([minus, center, plus], axis=1)               # (kzy, 3, V)
    return out.reshape(kzy * 3, v)


# Per-layer budget for the gathered (K, V, Cin) transient.  Above it the
# contraction switches to bf16 gathers + K-chunked accumulation (below),
# which is what lets UNet-scale eval budgets (40k voxels -> 120-160k active
# decoder sites) and Waymo-scale caps fit single-chip HBM.  256 MB keeps
# every KITTI-scale TRAIN layer (largest: level-2 subm, 56k x 27 x 32 x 4 B
# = 193 MB) on the measured-fast f32 einsum path.
GATHER_BYTES_BUDGET = 256 * 1024 * 1024

# Compute dtype for the gather + tap-contraction: bf16 halves the bytes of
# the latency-bound row gathers (the dominant sparse-conv cost on TPU) and
# is the MXU's native input dtype; accumulation stays f32 via
# preferred_element_type.  Set to None to force full f32 (used by the
# tight-tolerance oracle tests; production numerics are validated
# separately by the bf16-tolerance test and the convergence harness).
GATHER_COMPUTE_DTYPE: 'jnp.dtype | None' = jnp.bfloat16


def gather_gemm(features, nbr_idx, weights):
    """Sparse conv contraction: sum_k gather(features, nbr_idx[k]) @ W[k].

    One gather (K, V, Cin) + one batched GEMM, contracted over the K taps.
    (A python-unrolled K-loop blew compile time past 15 min; a lax.scan
    serialized 27 small dispatches per layer and ran ~800 ms/step at KITTI
    scale.  The einsum form is a single fused gather + batched matmul that
    XLA maps straight onto the MXU; the (K, V, Cin) transient is ~110 MB at
    V=16k, C=64.)

    Large tables (V * K * Cin beyond GATHER_BYTES_BUDGET) switch to a
    low-memory path: features gathered in bfloat16 (f32 accumulation on the
    MXU) and the K taps consumed in lax.scan chunks sized to the budget.

    Args:
        features: (V, Cin); nbr_idx: (K, V) with V == padding row;
        weights: (K, Cin, Cout).
    Returns: (V, Cout).
    """
    k, v = nbr_idx.shape
    cin = features.shape[-1]
    gdtype = features.dtype
    if GATHER_COMPUTE_DTYPE is not None and features.dtype == jnp.float32:
        gdtype = GATHER_COMPUTE_DTYPE
    if k * v * cin * jnp.dtype(gdtype).itemsize <= GATHER_BYTES_BUDGET:
        padded = jnp.concatenate(
            [features, jnp.zeros((1, cin), features.dtype)],
            axis=0).astype(gdtype)
        gathered = padded[nbr_idx]                               # (K, V, Cin)
        return jnp.einsum('kvc,kco->vo', gathered, weights.astype(gdtype),
                          preferred_element_type=jnp.float32
                          ).astype(features.dtype)
    padded = jnp.concatenate(
        [features, jnp.zeros((1, cin), features.dtype)],
        axis=0).astype(gdtype)
    chunk = max(1, GATHER_BYTES_BUDGET
                // (v * cin * jnp.dtype(gdtype).itemsize))
    n_chunks = -(-k // chunk)
    pad_k = n_chunks * chunk - k
    idx_p = jnp.concatenate(
        [nbr_idx, jnp.full((pad_k, v), v, nbr_idx.dtype)]
    ).reshape(n_chunks, chunk, v)
    w_p = jnp.concatenate(
        [weights, jnp.zeros((pad_k,) + weights.shape[1:], weights.dtype)]
    ).reshape(n_chunks, chunk, cin, weights.shape[-1]).astype(gdtype)

    def body(acc, args):
        idx_c, w_c = args
        g = padded[idx_c]                                    # (chunk, V, Cin)
        return acc + jnp.einsum('kvc,kco->vo', g, w_c,
                                preferred_element_type=jnp.float32), None

    acc = jnp.zeros((v, weights.shape[-1]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (idx_p, w_p))
    return acc.astype(features.dtype)


def _take_rows_merged(ext, q):
    """ext (B, N, C); q (B, ...) int32 row ids in [0, N) -> (B, ..., C).

    ONE flat row gather of the batch-merged operand instead of a vmapped
    per-sample take: measured 2.5x faster at conv3_down scale (26.5 ->
    10.4 ms for 2.88M rows; tools/bench_gather_forms.py).  XLA lowers the
    batched (vmapped) gather onto a slower path than the plain rank-1
    row gather."""
    b, n, c = ext.shape
    off = jnp.arange(b, dtype=q.dtype).reshape(
        (b,) + (1,) * (q.ndim - 1)) * n
    flat = jnp.take(ext.reshape(b * n, c), (q + off).reshape(-1), axis=0,
                    mode='clip')
    return flat.reshape(q.shape + (c,))


def _take_ids_merged(ids_ext, q):
    """ids_ext (B, N) int32; q (B, ...) -> (B, ...): batch-merged flat
    single-lane lookup (measured 1.4x the vmapped form)."""
    b, n = ids_ext.shape
    off = jnp.arange(b, dtype=q.dtype).reshape(
        (b,) + (1,) * (q.ndim - 1)) * n
    return jnp.take(ids_ext.reshape(-1), (q + off).reshape(-1),
                    mode='clip').reshape(q.shape)


def _gather_rows3(ext, q):
    """ext (N, C); q (...,) int32 block starts — returns (..., 3*C) with
    rows ext[q], ext[q+1], ext[q+2] fetched as ONE row gather of a
    pre-merged (N-2, 3C) operand (one random HBM access per 3 rows
    instead of 3).  Two layout traps shape this:

    - the three rows come back MERGED into the minor axis — a (..., 3, C)
      result would tile-pad (3, C) -> (8, 128) (measured 5.3x HBM blowup
      at Waymo scale);
    - the merge happens in the OPERAND (three shifted sequential-slice
      concats, pure bandwidth), NOT via a custom strided `lax.gather`
      with explicit slice_sizes: under vmap the latter materializes its
      batched start-indices as s32[B, Q, 2], whose minor-2 axis tile-pads
      64x (measured 2.40G for 38M of indices — a Waymo-scale OOM all by
      itself).  `jnp.take` row gathers lower cleanly.
    """
    ext3 = jnp.concatenate([ext[:-2], ext[1:-1], ext[2:]], axis=-1)
    return jnp.take(ext3, q, axis=0, mode='clip')


def _xblock_hits(d0, d1, d2, valid_c, xok):
    """Shared tail of the x-block table builders: per-tap hit masks and the
    raw-membership ranks that align gathered block rows to taps.

    d0/d1/d2 are clamp(ids[pos + k] - base, 0, 3) from
    merged_searchsorted_deltas — membership of base + d among the table is
    any delta == d.  (These replaced three (9, V) single-lane id lookups,
    measured ~266 ms/step across levels in the round-4 predict trace.)

    Everything is packed into ONE (9, V) int32 bitmask plane — bit d
    (d = 0..2) is tap d's hit, bits 3/4 are the RAW table membership of
    expected ids base+0 / base+1 (unmasked; they rank gathered block rows
    to taps).  Packing matters twice on TPU: a (9, V, 3) tensor tile-pads
    its minor 3 -> 128 (measured 42.7x HBM blowup, the first Waymo-scale
    OOM), and even leading-axis stacks of (9, V) planes got materialized
    by XLA as an s32[..., 2]-minor jvp residual (64x padding, the second
    OOM).  One plane with V minor has no small axis anywhere.

    Args: d0/d1/d2 (9, V) int32 deltas in [0, 3]; valid_c (9, V) bool;
    xok: 3-tuple of (V,) bool per-tap x-range masks.
    Returns:
        tbl: (9, V) int32 bitmask as above.
    """
    def member(d):
        return (d0 == d) | (d1 == d) | (d2 == d)

    m0 = member(0)
    m1 = member(1)
    m2 = member(2)
    tbl = ((m0 & valid_c & xok[0][None, :]).astype(jnp.int32)
           | (m1 & valid_c & xok[1][None, :]).astype(jnp.int32) << 1
           | (m2 & valid_c & xok[2][None, :]).astype(jnp.int32) << 2
           | m0.astype(jnp.int32) << 3
           | m1.astype(jnp.int32) << 4)
    return tbl


def subm_xblock_table(ids, mask, grid):
    """x-block neighbor table for a 3^3 submanifold conv.

    Linear ids are x-minor, so for each (dz, dy) offset the three x taps hit
    three CONSECUTIVE linear ids; active sites with consecutive ids occupy
    consecutive slots in the sorted table.  One merged-searchsorted of the
    (neighbor id - 1) anchors (9 V queries instead of 27 V) plus one
    3-row block gather per (dz, dy) group replaces 27 per-row lookups.

    Args: ids (V,) sorted linear ids (n_cells sentinel in invalid slots);
          mask (V,) bool.
    Returns (q, tbl) — see _xblock_hits; feed to gather_gemm_xblocks,
    which re-aligns block rows to taps by rank, handling gaps in the
    active set exactly.
    """
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    # int32 headroom: merged_searchsorted_deltas packs table values * 16
    assert 16 * (n_cells + 1) < 2 ** 31, grid
    v = ids.shape[0]
    z, y, x = delinearize(jnp.where(mask, ids, 0), grid)
    d = jnp.asarray(np.stack(np.meshgrid(
        np.arange(3) - 1, np.arange(3) - 1, indexing='ij'),
        axis=-1).reshape(-1, 2), jnp.int32)                       # (9, 2)
    tz = z[None, :] + d[:, 0:1]
    ty = y[None, :] + d[:, 1:2]
    valid_c = (mask[None, :]
               & (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny))   # (9, V)
    tid_c = linearize(tz, ty, x[None, :], grid)                   # center id
    base = jnp.where(valid_c, tid_c - 1, n_cells)
    pos, d0, d1, d2 = merged_searchsorted_deltas(ids, base)
    q = jnp.clip(pos, 0, v - 1)
    xok = (x - 1 >= 0, jnp.ones_like(mask), x + 1 < nx)
    return q, _xblock_hits(d0, d1, d2, valid_c, xok)


def subm_xblock_table_b(ids, mask, grid):
    """Batched subm_xblock_table: ids/mask (B, V) -> q/tbl (B, 9, V).

    When merge_kernel.ENABLED, positions + membership deltas come from
    the Pallas merge-resolve kernel instead of the merged bitonic sort:
    each tap group's expected ids are the sorted table ids plus a
    CONSTANT shift, so the query streams are sorted and a merge touches
    each table row once per group at streaming bandwidth.  The kernel
    path queries the RAW shifted ids (no sentinel substitution at
    invalid taps — substitution would break sortedness); spurious
    membership at out-of-range taps is masked by valid_c exactly as the
    sentinel form masks it, and the rank bits it could perturb are only
    consumed under hit gates that are false there (contraction-level
    equivalence is oracle-tested).
    """
    from . import merge_kernel
    if not merge_kernel.enabled():
        return jax.vmap(lambda i, m: subm_xblock_table(i, m, grid))(
            ids, mask)
    nx, ny, nz = grid
    # the kernel pads query rows with 2^28: every real (raw, shifted)
    # query must sort strictly below the pad value
    assert nx * ny * nz + ny * nx + nx < (1 << 28), grid
    v = ids.shape[1]
    d = jnp.asarray(np.stack(np.meshgrid(
        np.arange(3) - 1, np.arange(3) - 1, indexing='ij'),
        axis=-1).reshape(-1, 2), jnp.int32)                       # (9, 2)
    shifts = d[:, 0] * (ny * nx) + d[:, 1] * nx - 1               # (9,)
    base_raw = ids[:, None, :] + shifts[None, :, None]            # (B,9,V)
    pos, d0, d1, d2 = merge_kernel.resolve_sorted_queries(
        ids, base_raw, interpret=merge_kernel.INTERPRET)
    q = jnp.clip(pos, 0, v - 1)

    z, y, x = delinearize(jnp.where(mask, ids, 0), grid)          # (B, V)
    tz = z[:, None, :] + d[None, :, 0:1]
    ty = y[:, None, :] + d[None, :, 1:2]
    valid_c = (mask[:, None, :]
               & (tz >= 0) & (tz < nz) & (ty >= 0) & (ty < ny))   # (B,9,V)
    xok = (x - 1 >= 0, jnp.ones_like(mask), x + 1 < nx)
    tbl = jax.vmap(_xblock_hits)(d0, d1, d2, valid_c,
                                 jnp.stack(xok, 0).swapaxes(0, 1))
    return q, tbl


def strided_xblock_table_b(in_ids, in_mask, out_ids, out_mask, grid,
                           stride, padding):
    """Batched strided_xblock_table; merge-kernel path as in
    subm_xblock_table_b (the raw query stream
    (oz*s-p+dz)*ny*nx + (oy*s-p+dy)*nx + ox*s-p is monotone in the
    sorted out_ids because each axis map is affine increasing and the
    per-axis ranges cannot carry into the next axis)."""
    from . import merge_kernel
    if not merge_kernel.enabled():
        return jax.vmap(
            lambda i, m, oi, om: strided_xblock_table(
                i, m, oi, om, grid, stride, padding))(
            in_ids, in_mask, out_ids, out_mask)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nx, ny, nz = grid
    # kernel-path pad-value headroom (see subm_xblock_table_b): raw
    # queries reach at most ((onz-1)*sz - pz + 2) * ny*nx + ...
    assert (nz + 4) * ny * nx < (1 << 28), grid
    ogrid = out_grid_size(grid, 3, stride, padding)
    onx, ony, onz = ogrid
    v_in = in_ids.shape[1]

    oz_r = out_ids // (ony * onx)
    rem = out_ids % (ony * onx)
    oy_r, ox_r = rem // onx, rem % onx                            # (B, Vo)
    d = jnp.asarray(np.stack(np.meshgrid(
        np.arange(3), np.arange(3), indexing='ij'),
        axis=-1).reshape(-1, 2), jnp.int32)                       # (9, 2)
    iz_r = oz_r[:, None, :] * sz - pz + d[None, :, 0:1]           # (B,9,Vo)
    iy_r = oy_r[:, None, :] * sy - py + d[None, :, 1:2]
    ix0_r = ox_r * sx - px                                        # (B, Vo)
    base_raw = (iz_r * (ny * nx) + iy_r * nx + ix0_r[:, None, :])
    pos, d0, d1, d2 = merge_kernel.resolve_sorted_queries(
        in_ids, base_raw, interpret=merge_kernel.INTERPRET)
    q = jnp.clip(pos, 0, v_in - 1)

    oz = jnp.where(out_mask, oz_r, 0)
    oy = jnp.where(out_mask, oy_r, 0)
    ox = jnp.where(out_mask, ox_r, 0)
    iz = oz[:, None, :] * sz - pz + d[None, :, 0:1]
    iy = oy[:, None, :] * sy - py + d[None, :, 1:2]
    ix0 = ox * sx - px
    valid_c = (out_mask[:, None, :]
               & (iz >= 0) & (iz < nz) & (iy >= 0) & (iy < ny))
    xok = ((ix0 >= 0) & (ix0 < nx),
           (ix0 + 1 >= 0) & (ix0 + 1 < nx),
           (ix0 + 2 >= 0) & (ix0 + 2 < nx))
    tbl = jax.vmap(_xblock_hits)(d0, d1, d2, valid_c,
                                 jnp.stack(xok, 0).swapaxes(0, 1))
    return q, tbl


def strided_xblock_table(in_ids, in_mask, out_ids, out_mask, grid,
                         stride, padding):
    """x-block gather table for a strided 3^3 sparse conv: for output site o
    and (dz, dy) group, the three x taps read input ids
    base + {0, 1, 2} with base = linearize(oz*s - p + dz, oy*s - p + dy,
    ox*s - p) — consecutive, so the same block-gather trick as
    subm_xblock_table applies.  Returns (q, tbl) — see _xblock_hits;
    feed to gather_gemm_xblocks.
    """
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    # int32 headroom: merged_searchsorted_deltas packs table values * 16
    assert 16 * (n_cells + 1) < 2 ** 31, grid
    ogrid = out_grid_size(grid, 3, stride, padding)
    onx, ony, onz = ogrid
    v_in = in_ids.shape[0]

    oz = out_ids // (ony * onx)
    rem = out_ids % (ony * onx)
    oy, ox = rem // onx, rem % onx
    oz = jnp.where(out_mask, oz, 0)
    oy = jnp.where(out_mask, oy, 0)
    ox = jnp.where(out_mask, ox, 0)
    d = jnp.asarray(np.stack(np.meshgrid(
        np.arange(3), np.arange(3), indexing='ij'),
        axis=-1).reshape(-1, 2), jnp.int32)                       # (9, 2)
    iz = oz[None, :] * sz - pz + d[:, 0:1]
    iy = oy[None, :] * sy - py + d[:, 1:2]
    ix0 = ox * sx - px                                            # (Vout,)
    valid_c = (out_mask[None, :]
               & (iz >= 0) & (iz < nz) & (iy >= 0) & (iy < ny))   # (9, Vout)
    base = jnp.where(valid_c, linearize(iz, iy, ix0[None, :], grid),
                     n_cells)
    pos, d0, d1, d2 = merged_searchsorted_deltas(in_ids, base)
    q = jnp.clip(pos, 0, v_in - 1)
    xok = ((ix0 >= 0) & (ix0 < nx),
           (ix0 + 1 >= 0) & (ix0 + 1 < nx),
           (ix0 + 2 >= 0) & (ix0 + 2 < nx))
    return q, _xblock_hits(d0, d1, d2, valid_c, xok)


def _gather_dtype(features):
    if GATHER_COMPUTE_DTYPE is not None and features.dtype == jnp.float32:
        return GATHER_COMPUTE_DTYPE
    return features.dtype


def _xblock_per_tap(features, q, tbl):
    """The gather half of the x-block contraction: (9, Vo, 3*Cin) per-tap
    operand in the gather compute dtype, zeros at tap misses.

    Rows of a gathered block are aligned to taps by RANK arithmetic: block
    row t holds expected id base+d iff t equals the count of present ids
    among {base, base+1, ..., base+d-1} (the table is sorted unique and q
    is the left insertion point of base), so tap d selects row
    m0+...+m(d-1) via lane-wise selects — no (t, d) selector tensor, no
    (..., 3, C) intermediates (both tile-pad catastrophically; see
    _xblock_hits).
    """
    v, cin = features.shape
    gdtype = _gather_dtype(features)
    ext = jnp.concatenate(
        [features, jnp.zeros((3, cin), features.dtype)]).astype(gdtype)
    blocks = _gather_rows3(ext, q)                        # (9, Vo, 3*Cin)
    b0 = blocks[..., :cin]
    b1 = blocks[..., cin:2 * cin]
    b2 = blocks[..., 2 * cin:]
    hit0 = (tbl & 1) > 0                                  # (9, Vo) bool
    hit1 = (tbl & 2) > 0
    hit2 = (tbl & 4) > 0
    m0 = (tbl & 8) > 0
    n01 = ((tbl >> 3) & 1) + ((tbl >> 4) & 1)
    zero = jnp.zeros((), gdtype)
    pt0 = jnp.where(hit0[..., None], b0, zero)
    pt1 = jnp.where(hit1[..., None],
                    jnp.where(m0[..., None], b1, b0), zero)
    row2 = jnp.where((n01 == 2)[..., None], b2,
                     jnp.where((n01 == 1)[..., None], b1, b0))
    pt2 = jnp.where(hit2[..., None], row2, zero)
    return jnp.concatenate([pt0, pt1, pt2], axis=-1)      # (9, Vo, 3*Cin)


def gather_gemm_xblocks(features, q, tbl, weights):
    """Sparse-conv contraction over an x-block table (subm_xblock_table /
    strided_xblock_table): the row gathers are HBM-latency-bound (~40 ns
    per random row measured, independent of row width), so fetching each
    (dz, dy) group's three x taps as one contiguous 3-row block cuts the
    random-access count 3x.

    Args:
        features: (V, Cin) (invalid slots hold zeros);
        q/tbl: table from subm_xblock_table / strided_xblock_table
            (tbl bits: 0..2 per-tap hits, 3/4 raw membership ranks);
        weights: (27, Cin, Cout) in (dz, dy)-major dx-minor tap order.
    Returns: (Vout, Cout).
    """
    v, cin = features.shape
    g, vo = q.shape
    gdtype = _gather_dtype(features)
    per_tap = _xblock_per_tap(features, q, tbl)           # (9, Vo, 3*Cin)
    w = weights.reshape(g, 3 * cin, -1).astype(gdtype)
    return jnp.einsum('gvk,gko->vo', per_tap, w,
                      preferred_element_type=jnp.float32
                      ).astype(features.dtype)


def flip_tap_weights(weights):
    """Transpose-conv weights for a (K, Cin, Cout) tap-major kernel: tap
    k -> K-1-k (offset negation for the row-major centered tap order) and
    channel axes swapped -> (K, Cout, Cin)."""
    return jnp.flip(weights, axis=0).swapaxes(1, 2)


@jax.custom_vjp
def subm_gather_gemm_xblocks(features, q, tbl, weights):
    """gather_gemm_xblocks for the SUBMANIFOLD case (in/out sites are the
    same table) with a gather-only backward pass.

    Default AD differentiates the forward's row gathers into HBM
    scatter-adds (duplicate-index serialization).  For a submanifold 3^3
    conv the transpose convolution runs over the SAME (q, tbl) table with
    taps flipped (output row o reads input i = o + off_t  <=>  input row i
    reads o = i + off_{flip(t)}; hit masks are symmetric because both sides
    reduce to "both sites active"), so:

        d_features = gather_gemm_xblocks(g, q, tbl, flip_tap_weights(W))
        d_weights  = per_tap(features)^T @ g     (one regather + one GEMM)

    — two gather passes, zero scatters.  Exactness vs default AD is
    oracle-tested (tests/test_sparse.py grad parity).
    """
    return gather_gemm_xblocks(features, q, tbl, weights)


def _subm_ggx_fwd(features, q, tbl, weights):
    return (gather_gemm_xblocks(features, q, tbl, weights),
            (features, q, tbl, weights))


def _subm_ggx_bwd(res, g):
    features, q, tbl, weights = res
    cin = features.shape[-1]
    ngrp = q.shape[0]
    gdtype = _gather_dtype(features)
    df = gather_gemm_xblocks(g.astype(features.dtype), q, tbl,
                             flip_tap_weights(weights))
    per_tap = _xblock_per_tap(features, q, tbl)           # (9, V, 3*Cin)
    dw = jnp.einsum('gvk,vo->gko', per_tap, g.astype(gdtype),
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(ngrp * 3, cin, -1).astype(weights.dtype)
    return df, None, None, dw


subm_gather_gemm_xblocks.defvjp(_subm_ggx_fwd, _subm_ggx_bwd)


# ---------------------------------------------------------------------------
# Batched contractions: same math as the per-sample forms above, but the
# row gathers run as ONE flat take over the batch-merged operand (2.5x
# faster than vmapping the per-sample form; see _take_rows_merged).  Table
# BUILDS stay per-sample (vmapped) — only the gather+GEMM is batched.
# ---------------------------------------------------------------------------

def _xblock_per_tap_b(features, q, tbl):
    """Batched _xblock_per_tap: features (B, V, Cin), q/tbl (B, 9, Vo)
    -> (B, 9, Vo, 3*Cin) in the gather compute dtype."""
    b, v, cin = features.shape
    gdtype = _gather_dtype(features)
    ext = jnp.concatenate(
        [features, jnp.zeros((b, 3, cin), features.dtype)],
        axis=1).astype(gdtype)
    ext3 = jnp.concatenate([ext[:, :-2], ext[:, 1:-1], ext[:, 2:]], axis=-1)
    blocks = _take_rows_merged(ext3, q)                 # (B, 9, Vo, 3*Cin)
    b0 = blocks[..., :cin]
    b1 = blocks[..., cin:2 * cin]
    b2 = blocks[..., 2 * cin:]
    hit0 = (tbl & 1) > 0
    hit1 = (tbl & 2) > 0
    hit2 = (tbl & 4) > 0
    m0 = (tbl & 8) > 0
    n01 = ((tbl >> 3) & 1) + ((tbl >> 4) & 1)
    zero = jnp.zeros((), gdtype)
    pt0 = jnp.where(hit0[..., None], b0, zero)
    pt1 = jnp.where(hit1[..., None],
                    jnp.where(m0[..., None], b1, b0), zero)
    row2 = jnp.where((n01 == 2)[..., None], b2,
                     jnp.where((n01 == 1)[..., None], b1, b0))
    pt2 = jnp.where(hit2[..., None], row2, zero)
    return jnp.concatenate([pt0, pt1, pt2], axis=-1)    # (B, 9, Vo, 3*Cin)


def gather_gemm_xblocks_b(features, q, tbl, weights):
    """Batched gather_gemm_xblocks: features (B, V, Cin), q/tbl (B, 9, Vo),
    weights (27, Cin, Cout) shared across the batch -> (B, Vo, Cout)."""
    cin = features.shape[-1]
    g = q.shape[1]
    gdtype = _gather_dtype(features)
    per_tap = _xblock_per_tap_b(features, q, tbl)
    w = weights.reshape(g, 3 * cin, -1).astype(gdtype)
    return jnp.einsum('bgvk,gko->bvo', per_tap, w,
                      preferred_element_type=jnp.float32
                      ).astype(features.dtype)


@jax.custom_vjp
def subm_gather_gemm_xblocks_b(features, q, tbl, weights):
    """Batched subm_gather_gemm_xblocks: gather-only backward (flipped-tap
    transpose conv over the same table; see subm_gather_gemm_xblocks)."""
    return gather_gemm_xblocks_b(features, q, tbl, weights)


def _subm_ggx_b_fwd(features, q, tbl, weights):
    return (gather_gemm_xblocks_b(features, q, tbl, weights),
            (features, q, tbl, weights))


def _subm_ggx_b_bwd(res, g):
    features, q, tbl, weights = res
    cin = features.shape[-1]
    ngrp = q.shape[1]
    gdtype = _gather_dtype(features)
    df = gather_gemm_xblocks_b(g.astype(features.dtype), q, tbl,
                               flip_tap_weights(weights))
    per_tap = _xblock_per_tap_b(features, q, tbl)       # (B, 9, V, 3*Cin)
    dw = jnp.einsum('bgvk,bvo->gko', per_tap, g.astype(gdtype),
                    preferred_element_type=jnp.float32)
    dw = dw.reshape(ngrp * 3, cin, -1).astype(weights.dtype)
    return df, None, None, dw


subm_gather_gemm_xblocks_b.defvjp(_subm_ggx_b_fwd, _subm_ggx_b_bwd)


def gather_gemm_b(features, nbr_idx, weights):
    """Batched gather_gemm: features (B, V, Cin), nbr_idx (B, K, Vout)
    with V as the padding row (Vout == V for submanifold convs; inverse
    convs gather a coarse table onto a larger fine site set), weights
    (K, Cin, Cout) -> (B, Vout, Cout).  Same budget-gated low-memory
    K-chunking as gather_gemm."""
    b, v, cin = features.shape
    k, vq = nbr_idx.shape[1], nbr_idx.shape[2]
    gdtype = _gather_dtype(features)
    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, cin), features.dtype)],
        axis=1).astype(gdtype)
    if b * k * vq * cin * jnp.dtype(gdtype).itemsize <= GATHER_BYTES_BUDGET:
        gathered = _take_rows_merged(padded, nbr_idx)   # (B, K, Vout, Cin)
        return jnp.einsum('bkvc,kco->bvo', gathered,
                          weights.astype(gdtype),
                          preferred_element_type=jnp.float32
                          ).astype(features.dtype)
    chunk = max(1, GATHER_BYTES_BUDGET
                // (b * vq * cin * jnp.dtype(gdtype).itemsize))
    n_chunks = -(-k // chunk)
    pad_k = n_chunks * chunk - k
    idx_p = jnp.concatenate(
        [nbr_idx, jnp.full((b, pad_k, vq), v, nbr_idx.dtype)], axis=1)
    idx_p = idx_p.reshape(b, n_chunks, chunk, vq).swapaxes(0, 1)
    w_p = jnp.concatenate(
        [weights, jnp.zeros((pad_k,) + weights.shape[1:], weights.dtype)]
    ).reshape(n_chunks, chunk, cin, weights.shape[-1]).astype(gdtype)

    def body(acc, args):
        idx_c, w_c = args                     # (B, chunk, V), (chunk, ...)
        g = _take_rows_merged(padded, idx_c)  # (B, chunk, V, Cin)
        return acc + jnp.einsum('bkvc,kco->bvo', g, w_c,
                                preferred_element_type=jnp.float32), None

    acc = jnp.zeros((b, vq, weights.shape[-1]), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (idx_p, w_p))
    return acc.astype(features.dtype)


def strided_output_sites(ids, mask, grid, kernel_size, stride, padding,
                         out_cap: int):
    """Active output sites of a strided sparse conv.

    spconv rule: output site o is active iff some input site i satisfies
    i = o * s - p + k for a kernel position k (reference
    iou3d-free spconv activation semantics).  Per dimension only
    ceil(k/s) distinct outputs can cover a given input (o = (i+p)//s - d,
    d = 0..ceil(k/s)-1, valid while (i+p) mod s + s*d < k), so a 3^3
    stride-2 conv has at most 2x2x2 = 8 candidates per input — NOT 27.
    One sort of the (ncand * V) candidate list + a first-occurrence mask
    replaces the former jnp.unique + hash-argsort + regather + resort
    pipeline (measured ~120 ms/step at KITTI level-3 scale; this form is
    ~10 ms).

    When actives exceed `out_cap`, sites are dropped by UNIFORM RANK
    DECIMATION in sorted-id order (keep site when floor(rank*cap/n)
    advances) — spatially stratified, unlike lowest-id truncation which
    crops the scene to a low-z slab.

    Returns:
        out_ids: (out_cap,) sorted linear ids on the OUTPUT grid
                 (sentinel n_out_cells in empty slots);
        out_mask: (out_cap,) bool.
    """
    kz, ky, kx = _as3(kernel_size)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    ogrid = out_grid_size(grid, kernel_size, stride, padding)
    onx, ony, onz = ogrid
    n_out_cells = onx * ony * onz

    z, y, x = delinearize(jnp.where(mask, ids, 0), grid)

    def dim_cands(i, p, s, k, on):
        """[(coord, valid)] for the <= ceil(k/s) covering outputs."""
        n = -(-k // s)
        base = (i + p) // s
        rem = (i + p) - base * s
        out = []
        for d in range(n):
            o = base - d
            out.append((o, (rem + s * d < k) & (o >= 0) & (o < on)))
        return out

    zc = dim_cands(z, pz, sz, kz, onz)
    yc = dim_cands(y, py, sy, ky, ony)
    xc = dim_cands(x, px, sx, kx, onx)
    cand = []
    for oz, vz in zc:
        for oy, vy in yc:
            for ox, vx in xc:
                ok = mask & vz & vy & vx
                cand.append(jnp.where(
                    ok, oz * (ony * onx) + oy * onx + ox, n_out_cells))
    srt = jnp.sort(jnp.stack(cand).reshape(-1))              # (ncand * V,)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), srt[1:] != srt[:-1]]) & (srt < n_out_cells)
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_active = jnp.maximum(rank[-1] + 1, 0)
    # f32 is exact for rank < 2^24 and ratio == 1.0 when n <= cap
    ratio = out_cap / jnp.maximum(n_active, out_cap).astype(jnp.float32)
    pos = jnp.floor(rank.astype(jnp.float32) * ratio).astype(jnp.int32)
    pos = jnp.clip(pos, 0, out_cap - 1)
    prev = jnp.floor((rank - 1).astype(jnp.float32) * ratio).astype(jnp.int32)
    keep = first & ((rank == 0) | (pos > prev))
    out_ids = jnp.full((out_cap + 1,), n_out_cells, jnp.int32).at[
        jnp.where(keep, pos, out_cap)].set(
        jnp.where(keep, srt, n_out_cells).astype(jnp.int32),
        mode='drop')[:out_cap]
    out_mask = out_ids < n_out_cells
    return out_ids, out_mask


# Per-level dilation multipliers for level_caps, in units of the voxel
# BUDGET.  A stride-2 sparse conv DILATES the active set; measured with
# tools/occupancy_probe.py on KITTI-scale bench scenes: max actives =
# 3.19x / 3.66x / 1.98x the LEVEL-1 ACTIVE count at levels 2/3/4, and a
# uniform-random cloud (the isolated-voxel worst case) dilates 3.04x at
# level 2.  The defaults cover budget-saturated scenes at those ratios
# plus margin; the prior worst-case (3.5, 4, 3) left the level-4 cap 46%
# empty (pure padding FLOPs).  Any tightening must be paired with an
# accuracy probe (PERF_NOTES level-cap lesson): overflow degrades
# gracefully (uniform rank decimation) but it DOES drop geometry.
LEVEL_CAP_MULTIPLIERS = (1.0, 3.3, 3.8, 2.1)


def level_caps(max_voxels: int):
    """Static active-site budgets for backbone levels 1..4 (strides
    1/2/4/8).  Budgets must cover the stride-2 dilation growth (see
    LEVEL_CAP_MULTIPLIERS) or the level-cap overflow silently drops
    geometry."""
    v = max_voxels
    return tuple(int(m * v) for m in LEVEL_CAP_MULTIPLIERS)


def strided_gather_table(in_ids, in_mask, out_ids, out_mask, grid,
                         kernel_size, stride, padding):
    """For each output site and kernel position, the input slot to gather.

    input coord = out * s - p + k.  Returns (K, Vout) slot indices with
    V_in as the padding row.
    """
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    nx, ny, nz = grid
    n_cells = nx * ny * nz
    # int32 headroom: merged-sort keys are value * 2 + tag
    assert 2 * (n_cells + 1) < 2 ** 31, grid
    ogrid = out_grid_size(grid, kernel_size, stride, padding)
    onx, ony, onz = ogrid
    v_in = in_ids.shape[0]

    oz = out_ids // (ony * onx)
    rem = out_ids % (ony * onx)
    oy, ox = rem // onx, rem % onx
    offs = jnp.asarray(kernel_offsets(kernel_size), jnp.int32)

    iz = oz[None, :] * sz - pz + offs[:, 0:1]
    iy = oy[None, :] * sy - py + offs[:, 1:2]
    ix = ox[None, :] * sx - px + offs[:, 2:3]
    valid = (out_mask[None, :]
             & (iz >= 0) & (iz < nz) & (iy >= 0) & (iy < ny)
             & (ix >= 0) & (ix < nx))
    tid = jnp.where(valid, linearize(iz, iy, ix, grid), n_cells)
    pos, d0 = merged_searchsorted_deltas(in_ids, tid, n_deltas=1)
    found = valid & (d0 == 0) & (tid < n_cells)
    return jnp.where(found, jnp.clip(pos, 0, v_in - 1),
                     v_in).astype(jnp.int32)


def inverse_gather_table(fine_ids, fine_mask, coarse_ids, coarse_mask,
                         fine_grid, kernel_size, stride, padding):
    """Gather table for an INVERSE sparse conv (spconv SparseInverseConv3d
    with indice-key reuse): features live on the coarse grid (the strided
    conv's output), outputs are produced at the fine grid's pre-existing
    active sites (the strided conv's input sites).

    For fine site i and kernel tap k, the contributing coarse site is
    o = (i + p - k) / s where divisible & in range (the transpose of the
    strided-conv relation i = o*s - p + k).

    Returns (K, V_fine) slot indices into the coarse table, with V_coarse
    as the padding row.
    """
    kz, ky, kx = _as3(kernel_size)
    sz, sy, sx = _as3(stride)
    pz, py, px = _as3(padding)
    ogrid = out_grid_size(fine_grid, kernel_size, stride, padding)
    onx, ony, onz = ogrid
    n_out_cells = onx * ony * onz
    # int32 headroom: merged-sort keys are value * 2 + tag
    assert 2 * (n_out_cells + 1) < 2 ** 31, ogrid
    v_coarse = coarse_ids.shape[0]

    z, y, x = delinearize(jnp.where(fine_mask, fine_ids, 0), fine_grid)
    offs = jnp.asarray(kernel_offsets(kernel_size), jnp.int32)

    cz = z[None, :] + pz - offs[:, 0:1]
    cy = y[None, :] + py - offs[:, 1:2]
    cx = x[None, :] + px - offs[:, 2:3]
    divisible = (cz % sz == 0) & (cy % sy == 0) & (cx % sx == 0)
    oz, oy, ox = cz // sz, cy // sy, cx // sx
    valid = (fine_mask[None, :] & divisible
             & (oz >= 0) & (oz < onz) & (oy >= 0) & (oy < ony)
             & (ox >= 0) & (ox < onx))
    tid = jnp.where(valid, oz * (ony * onx) + oy * onx + ox, n_out_cells)
    pos, d0 = merged_searchsorted_deltas(coarse_ids, tid, n_deltas=1)
    # a d0 == 0 match with tid < n_out_cells implies the slot is valid
    # (invalid coarse slots hold the >= n_out_cells sentinel), so no
    # coarse_mask[pos] lookup is needed
    found = valid & (d0 == 0) & (tid < n_out_cells)
    return jnp.where(found, jnp.clip(pos, 0, v_coarse - 1),
                     v_coarse).astype(jnp.int32)


def to_dense(features, ids, mask, grid):
    """(V, C) sparse -> (nz, ny, nx, C) dense."""
    nx, ny, nz = grid
    n_cells = nz * ny * nx
    flat = jnp.where(mask, ids, n_cells)
    dense = jnp.zeros((n_cells, features.shape[-1]), features.dtype)
    dense = dense.at[flat].set(
        jnp.where(mask[:, None], features, 0.0), mode='drop')
    return dense.reshape(nz, ny, nx, features.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def to_dense_expand(features, ids, mask, grid, out_dtype=None):
    """Batched sorted-sparse rows -> dense canvases, WITHOUT a row
    scatter.

    XLA lowers an N-row scatter into a ~165 ns/row serial loop (measured:
    67 ms for 2 x 160k x 64ch rows into level-3 KITTI canvases — the
    single largest op of the round-5 predict trace).  Because `ids` are
    sorted, the dense canvas is just the row table EXPANDED with zero
    rows at the gaps: an occupancy bitmap + exclusive cumsum gives every
    cell its source-row index, and ONE monotone row take materializes the
    canvas (measured 36 ms in bf16, and the occupancy plane — which the
    dense backbone levels need anyway — comes free).

    The custom VJP keeps the backward a GATHER (d_features[i] =
    g[ids[i]]): default AD of the take form would scatter-add 3.1M rows
    (every inactive cell hitting the padding row).

    Args: features (B, V, C); ids (B, V) sorted (n_cells sentinel in
    invalid slots); mask (B, V); grid (nx, ny, nz) static.
    Returns: dense (B, nz, ny, nx, C) in out_dtype (features.dtype if
    None), occ (B, nz, ny, nx) bool.
    """
    return _to_dense_expand_fwd(features, ids, mask, grid, out_dtype)[0]


def _to_dense_expand_fwd(features, ids, mask, grid, out_dtype):
    nx, ny, nz = grid
    n_cells = nz * ny * nx
    b, v, c = features.shape
    dt = out_dtype or features.dtype
    flat = jnp.where(mask, ids, n_cells)
    # rank-1 batch-merged scatter (batched scatters serialize; see
    # PERF_NOTES "Batched / multi-operand scatters serialize")
    midx = (flat + jnp.arange(b, dtype=jnp.int32)[:, None]
            * (n_cells + 1)).reshape(-1)
    occ = jnp.zeros((b * (n_cells + 1),), jnp.int8).at[midx].set(
        1, mode='drop').reshape(b, n_cells + 1)[:, :n_cells]
    csum = jnp.cumsum(occ.astype(jnp.int32), axis=-1)
    g = jnp.where(occ > 0, csum - 1, v)                    # (B, n_cells)
    padded = jnp.concatenate(
        [features, jnp.zeros((b, 1, c), features.dtype)],
        axis=1).astype(dt)
    dense = _take_rows_merged(padded, g).reshape(b, nz, ny, nx, c)
    return (dense, occ.reshape(b, nz, ny, nx) > 0), (ids, mask)


def _to_dense_expand_bwd(grid, out_dtype, res, cts):
    ids, mask = res
    g_dense, _ = cts
    b, nz, ny, nx, c = g_dense.shape
    n_cells = nz * ny * nx
    gd = jnp.concatenate(
        [g_dense.reshape(b, n_cells, c),
         jnp.zeros((b, 1, c), g_dense.dtype)], axis=1)
    flat = jnp.where(mask, ids, n_cells)
    d_feat = _take_rows_merged(gd, flat)
    d_feat = jnp.where(mask[..., None], d_feat, 0.0)
    return d_feat.astype(jnp.float32), None, None


to_dense_expand.defvjp(
    lambda f, i, m, grid, dt: _to_dense_expand_fwd(f, i, m, grid, dt),
    _to_dense_expand_bwd)
