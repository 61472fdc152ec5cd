"""EmbeddingBag: sum-pooled sparse embedding lookup.

The north-star compute kernel (reference: ``train/compute/pt/pytorch_emb.py``
— ``nn.EmbeddingBag(mode="sum")`` / fbgemm, and the ``XlaEmbeddingBag``
gather workaround at pytorch_emb.py:14-34).  Two TPU paths:

- :func:`embedding_bag` — XLA ``take`` + sum over the nnz axis.
- :func:`embedding_bag_pallas` — Pallas kernel: manual double-buffered
  per-row DMA gather (table stays in HBM), the TPU shape of the fbgemm
  batched-embedding kernel.

Measured on TPU v5e (1M×128 f32 table, batch 8192, nnz 32):

===========================  =========  =====================================
path                         GB/s       limiter
===========================  =========  =====================================
XLA take (any table size)      41-45    ~12 ns/row gather-loop issue rate
Pallas DMA gather               ~31     DMA issue rate ≈16 ns/row (scalar core)
hybrid (both concurrently)      ~43     both paths occupy the TensorCore —
                                        no overlap
HBM stream roofline            ~819     n/a for random row gather on v5e
===========================  =========  =====================================

(Steady-state numbers from long measure_chain runs.  Refined in round 2 —
``scripts/dedup_experiment.py``: the rate DOES depend on source size below
~32 MB (4 MB source: 477 M rows/s; 2 MB bf16: 542 M rows/s; ≥32 MB: the
80-95 M rows/s plateau above), and duplicate-heavy index vectors gather
SLOWER (zipf α=1.15: 76-87 M rows/s, all-duplicates: 54 M rows/s, vs
uniform 91 M rows/s) — hot rows serialize rather than hit a cache.  The
SURVEY §7 dedup/sorted-gather/hot-cache reformulations all LOSE to plain
take: every variant still pays the full B·nnz issue count somewhere, plus
pair-sort (737 µs @262k) or bag-scatter (1.5 ms @65k) preprocessing.
Small-source speed is another argument for table-wise sharding: per-chip
shards below ~4 MB gather 5× faster on top of the N× row-count win.)

v5e has no SparseCore, so random single-row (512 B) gathers are issue-bound,
not bandwidth-bound.  The system-level fix — and PARAM's own DLRM design — is
TABLE-wise sharding across chips (``param_tpu.models.dlrm``): each chip looks
up only its own tables for the full batch (per-chip row count B·nnz·T/N →
N× aggregate lookup rate), paying one pooled-embedding all-to-all over ICI.

Ragged bags are handled by padding each bag to a fixed ``nnz`` with an index
pointing at a zero "pad row" appended to the table — no masking in the hot
kernel (see :func:`pad_ragged_indices`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def embedding_bytes(batch: int, nnz: int, dim: int, elem_size: int = 4) -> int:
    """HBM bytes a sum-pooled lookup must move
    (reference BW formula: pytorch_emb.py:180,232)."""
    return batch * nnz * dim * elem_size


def pad_ragged_indices(
    indices: np.ndarray, offsets: np.ndarray, num_rows: int, max_nnz: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Convert (indices, offsets) CSR bags into a dense (batch, max_nnz)
    index matrix whose padding points at row ``num_rows`` (the zero pad row).
    Returns (dense_indices, max_nnz).  Uses the native C++ packer
    (libparamdata pd_pad_ragged) with a vectorized numpy fallback — this is
    the per-batch host prep of the ragged pipeline, the loop the reference
    hands to fbgemm's CSR input path."""
    from param_tpu.utils.native import pad_ragged

    full_offsets = np.append(offsets, len(indices)).astype(np.int64)
    lengths = np.diff(full_offsets)
    batch = len(lengths)
    if max_nnz is None:
        max_nnz = int(lengths.max()) if batch else 0
    out = pad_ragged(np.asarray(indices), full_offsets, max_nnz, num_rows)
    return out, max_nnz


def with_pad_row(table):
    """Append one zero row to serve as the padding target."""
    pad = jnp.zeros((1, table.shape[1]), table.dtype)
    return jnp.concatenate([table, pad], axis=0)


def pad_table_dim(table, multiple: int = 64):
    """Pad the embedding dim up to a lane-friendly multiple.

    Measured on v5e: gathering 56-dim f32 rows runs at 15.6M rows/s vs
    74.8M rows/s at 64-dim — sub-lane row widths cripple XLA's gather.
    Padding dim 56→64 costs 14% memory for a 4.8x lookup speedup; slice
    the output back with ``out[..., :orig_dim]``."""
    d = table.shape[-1]
    rem = (-d) % multiple
    if rem == 0:
        return table
    pad_width = [(0, 0)] * (table.ndim - 1) + [(0, rem)]
    return jnp.pad(table, pad_width)


# Measured scatter behavior on v5e (164k row-updates, 64-dim rows):
#   operand <= 262144 rows (~67 MB): ~100M rows/s, consistently
#   larger operands: ERRATIC — 5M rows/s for most sizes (524288, 800k,
#   983k, 1048576, 2M rows all ~33 ms) but 2.4 ms at exactly 1M rows;
#   the compiler's strategy choice is not monotonic or predictable.
# The erratic path is UPDATE-COUNT dependent: 20480 row-updates into a
# 1Mx64 operand scatter in place at 1.48 ms — faster than chunked-zeros
# delta+add (8.7 ms) and chunked slice/update-slice (9.3 ms), with zero
# extra memory (scripts/scatter_experiment.py).  The sparse-optimizer
# steps in models/dlrm.py therefore scatter in place (K = batch*nnz is
# small); this backward (K = 164k-scale) keeps the chunked-zeros path.
# Sorting, indices_are_sorted, slice/update-slice chunk passes, and
# fusing the update into the scatter were all slower.  The ONE uniformly
# fast formulation for big tables: scatter into FRESH ZEROS per
# <=262144-row chunk (masked updates) and concatenate — each chunk stays
# on the fast path and no table-sized slice/copy is involved.
_FAST_SCATTER_ROWS = 262_144


def _chunked_zero_scatter(shape, dtype, flat_idx, updates):
    """zeros(shape).at[flat_idx].add(updates) via always-fast chunks."""
    E, D = shape
    if E <= _FAST_SCATTER_ROWS:
        return jnp.zeros(shape, dtype).at[flat_idx].add(updates.astype(dtype))
    chunks = []
    for lo in range(0, E, _FAST_SCATTER_ROWS):
        size = min(_FAST_SCATTER_ROWS, E - lo)
        local = flat_idx - lo
        valid = (local >= 0) & (local < size)
        upd = jnp.where(valid[:, None], updates, 0).astype(dtype)
        local = jnp.clip(local, 0, size - 1)
        chunks.append(jnp.zeros((size, D), dtype).at[local].add(upd))
    return jnp.concatenate(chunks)


@jax.custom_vjp
def _embsum(table, dense_indices):
    rows = jnp.take(table, dense_indices, axis=0)  # (B, nnz, D)
    return jnp.sum(rows.astype(jnp.float32), axis=1).astype(table.dtype)


def _embsum_fwd(table, dense_indices):
    # table rides along only to carry its aval (no copy)
    return _embsum(table, dense_indices), (table, dense_indices)


def _embsum_bwd(res, g):
    table, dense_indices = res
    nnz = dense_indices.shape[1]
    flat_idx = dense_indices.reshape(-1)
    flat_g = jnp.repeat(g, nnz, axis=0)
    dtable = _chunked_zero_scatter(table.shape, table.dtype, flat_idx, flat_g)
    return dtable, None


_embsum.defvjp(_embsum_fwd, _embsum_bwd)


@jax.jit
def embedding_bag(table, dense_indices, weights=None):
    """XLA path: gather + sum over the nnz axis.

    ``dense_indices``: (batch, nnz) int32, padded with a valid row id
    (use :func:`with_pad_row` + :func:`pad_ragged_indices` for ragged bags).
    The backward scatter is chunked for big tables (custom_vjp) — see the
    scatter notes above.
    """
    if weights is None:
        return _embsum(table, dense_indices)
    rows = jnp.take(table, dense_indices, axis=0)  # (B, nnz, D)
    rows = rows * weights[..., None]
    return jnp.sum(rows.astype(jnp.float32), axis=1).astype(table.dtype)


# Row-DMA issue loop unroll factor (Mosaic fori_loop only supports full or
# manual unrolling; 8 recovers most of the loop overhead).
_UNROLL = 8


def _emb_gather_kernel(
    idx_hbm_ref,  # HBM: (n_tiles, 1, tile_bags*nnz) int32
    table_ref,  # HBM: (rows, 1, dim) — leading-dim indexing keeps the last
    #             two dims whole, satisfying Mosaic's DMA tiling rules
    o_ref,  # VMEM out block: (tile_bags, dim)
    rows_ref,  # VMEM scratch: (2, tile_bags*nnz, 1, dim)
    idx_ref,  # SMEM scratch: (1, tile_bags*nnz) — current lookahead chunk
    row_sems,  # DMA semaphores (2,): one per row buffer slot
    idx_sem,  # DMA semaphore for the index chunk copy
    *,
    nnz: int,
    tile_bags: int,
):
    """Fetch-ahead row gather: while the VPU sum-pools tile i's rows, the DMA
    engine is already streaming tile i+1's rows HBM→VMEM (one async copy per
    embedding row, double-buffered across grid steps).  Index chunks are
    themselves DMA'd HBM→SMEM (the full index array would blow the 1 MB SMEM
    budget)."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    rpt = tile_bags * nnz

    def idx_dma(tile):
        return pltpu.make_async_copy(idx_hbm_ref.at[tile], idx_ref, idx_sem)

    def issue_rows(slot):
        def body(rr, _):
            for u in range(_UNROLL):
                r = rr * _UNROLL + u
                row = idx_ref[0, r]
                pltpu.make_async_copy(
                    table_ref.at[row], rows_ref.at[slot, r], row_sems.at[slot]
                ).start()
            return 0

        jax.lax.fori_loop(0, rpt // _UNROLL, body, 0)

    @pl.when(i == 0)
    def _():
        idx_dma(0).start()
        idx_dma(0).wait()
        issue_rows(0)

    @pl.when(i + 1 < n_tiles)
    def _():
        idx_dma(i + 1).start()
        idx_dma(i + 1).wait()
        issue_rows((i + 1) % 2)

    slot = i % 2
    # One wait for the whole slot: DMA semaphores count transferred bytes, so
    # a descriptor covering the full slot buffer drains all row copies.
    pltpu.make_async_copy(
        rows_ref.at[slot], rows_ref.at[slot], row_sems.at[slot]
    ).wait()
    rows = rows_ref[slot].reshape(tile_bags, nnz, -1)
    o_ref[:] = jnp.sum(rows.astype(jnp.float32), axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_bags",))
def embedding_bag_pallas(table, dense_indices, tile_bags: int = 128):
    """Pallas sum-pooling lookup: manual double-buffered HBM row-gather.

    The table stays in HBM; each grid step sum-pools ``tile_bags`` bags whose
    ``tile_bags*nnz`` rows were DMA'd during the previous step.  Issue-rate
    bound on v5e (see module docstring) — kept as the kernel-tier reference
    implementation and for fusing custom epilogues.

    Requires ``nnz * tile_bags`` divisible by 8 (after the auto-shrink loop).
    """
    from param_tpu.ops.matmul import _interpret

    batch, nnz = dense_indices.shape
    nrows, dim = table.shape
    while batch % tile_bags:
        tile_bags //= 2
    rpt = tile_bags * nnz
    if rpt % _UNROLL:
        raise ValueError(f"tile_bags*nnz={rpt} must be divisible by {_UNROLL}")
    grid = (batch // tile_bags,)
    idx3 = dense_indices.reshape(batch // tile_bags, 1, rpt)
    table3 = table.reshape(nrows, 1, dim)

    return pl.pallas_call(
        functools.partial(_emb_gather_kernel, nnz=nnz, tile_bags=tile_bags),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile_bags, dim), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rpt, 1, dim), table.dtype),
            pltpu.SMEM((1, rpt), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((batch, dim), table.dtype),
        cost_estimate=pl.CostEstimate(
            flops=batch * nnz * dim,
            bytes_accessed=embedding_bytes(batch, nnz, dim, table.dtype.itemsize),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(idx3, table3)


@jax.jit
def embedding_bag_grad(table, dense_indices, grad_out):
    """Backward of sum-pooled lookup: scatter-add of grad rows
    (dtable[idx] += grad_out[bag]), chunked for big tables."""
    batch, nnz = dense_indices.shape
    flat_idx = dense_indices.reshape(-1)
    flat_grad = jnp.repeat(grad_out, nnz, axis=0)  # (B*nnz, D)
    return _chunked_zero_scatter(table.shape, table.dtype, flat_idx, flat_grad)
