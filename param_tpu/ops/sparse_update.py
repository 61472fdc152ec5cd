"""Pallas in-place sparse row-update kernel: the TPU analogue of fbgemm's
fused table-batched-embedding optimizer kernels (reference: the fbgemm
``exact_row_wise_adagrad`` / ``exact_sgd`` paths the DLRM bench selects via
``--optimizer``, train/comms/pt/dlrm.py).

Why a kernel: XLA has no in-place scatter on a *stacked* (T, E, D) table
buffer — every formulation pays table-sized slice/re-stack copies (measured
37-260 ms for 164k row updates into 8x1Mx64 f32; RESULTS.md "Sparse-row
adagrad").  This kernel holds the flat (R, D) table in HBM, aliases it to
the output, and performs one 256 B DMA read + modify + DMA write per
updated row — touching ONLY the gathered rows, ~16 ns/DMA issue-bound like
:mod:`param_tpu.ops.embedding`'s gather kernel.

Contract (race-freedom): ``idx`` must contain each row id AT MOST ONCE —
duplicates in a batch must be segment-summed first (:func:`dedup_row_updates`
— which adagrad needs anyway: duplicate occurrence grads sum BEFORE
squaring).  Invalid slots carry id >= R with a zero update; their reads are
clamped to row R-1 and their writes are diverted to a scratch "trash"
output, so no table row is ever written twice.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_UNROLL = 8


def adagrad_factor(acc_new, eps: float):
    """The optax ``scale_by_rss`` update factor:
    ``where(acc > 0, rsqrt(acc + eps), 0)`` — eps inside the sqrt plus the
    zero-accumulator gate.  Single source of truth for every sparse/dense
    adagrad site (dlrm steps + the Pallas kernel); plain jnp so it works
    inside kernels."""
    return jnp.where(acc_new > 0, jax.lax.rsqrt(acc_new + eps), 0.0)


def dedup_row_updates(flat_idx, rows_g, drop_marker: int):
    """Collapse duplicate row ids: sort + run detection + segment-sum.

    flat_idx: (N,) int32 row ids; rows_g: (N, D) per-occurrence gradients.
    Returns (rows, totals): rows (N,) unique ids as a prefix with
    ``drop_marker`` filling the empty tail slots, totals (N, D) per-row
    summed gradients (zero in the tail).  Static shapes throughout — no
    ``jnp.unique``."""
    N = flat_idx.shape[0]
    order = jnp.argsort(flat_idx)
    sidx = flat_idx[order]
    sg = rows_g[order]
    start = jnp.concatenate([jnp.ones((1,), bool), sidx[1:] != sidx[:-1]])
    run_id = jnp.cumsum(start) - 1  # (N,) in [0, N)
    totals = jax.ops.segment_sum(sg, run_id, num_segments=N)
    counts = jax.ops.segment_sum(jnp.ones_like(sidx), run_id, num_segments=N)
    run_rows = jax.ops.segment_max(sidx, run_id, num_segments=N)
    rows = jnp.where(counts > 0, run_rows, drop_marker).astype(jnp.int32)
    return rows, totals


def pack_rows_to_lanes(rows, totals, num_rows: int, lane: int = 128):
    """Repack D-wide row updates into ``lane``-wide memref-row updates.

    Mosaic DMA slices must be lane-aligned (last dim a multiple of 128), so
    a (R, D) table with D < 128 is viewed as (R*D/lane, lane) — each memref
    row holds ``pack = lane/D`` adjacent table rows.  This converts the
    sorted unique output of :func:`dedup_row_updates` (rows (N,), totals
    (N, D)) into (packed_rows (N,), packed_totals (N, lane)): each update is
    placed in its slot's lane range and updates sharing a memref row are
    summed (slots are disjoint, so the sum is exact — including for adagrad,
    where squaring is elementwise per lane).  Invalid entries keep the
    drop-marker convention (id >= R*D/lane).  Requires rows sorted unique
    (same-memref-row entries adjacent) and lane % D == 0."""
    N, D = totals.shape
    if D % lane == 0:
        # row width is already lane-aligned (D = 128, 256, ...) — no
        # repacking needed, each table row IS >= one full memref row
        return rows, totals, num_rows
    if lane % D:
        raise ValueError(f"lane {lane} must be a multiple of D {D} "
                         f"(pad the table dim first: ops.pad_table_dim)")
    pack = lane // D
    if pack == 1:
        return rows, totals, num_rows
    if num_rows % pack:
        raise ValueError(f"num_rows {num_rows} must be divisible by the "
                         f"pack factor {pack}")
    packed_R = num_rows // pack
    valid = rows < num_rows
    pid = jnp.where(valid, rows // pack, packed_R)
    slot = jnp.where(valid, rows % pack, 0)
    # place each update into its slot's lane range
    col_slot = jnp.arange(lane, dtype=jnp.int32)[None, :] // D  # (1, lane)
    expanded = jnp.where(
        col_slot == slot[:, None], jnp.tile(totals, (1, pack)), 0
    )
    # merge adjacent entries that share a memref row (<= pack of them)
    combined = expanded
    for k in range(1, pack):
        nxt_pid = jnp.concatenate([pid[k:], jnp.full((k,), packed_R + 1,
                                                     pid.dtype)])
        nxt_exp = jnp.concatenate(
            [expanded[k:], jnp.zeros((k, lane), expanded.dtype)]
        )
        combined = combined + jnp.where(
            (nxt_pid == pid)[:, None], nxt_exp, 0
        )
    start = jnp.concatenate([jnp.ones((1,), bool), pid[1:] != pid[:-1]])
    out_rows = jnp.where(start & valid, pid, packed_R).astype(jnp.int32)
    return out_rows, combined, packed_R


def _update_kernel(
    idx_hbm,  # HBM: (n_chunks, 1, chunk) int32 global row ids (>=R invalid)
    tab_hbm,  # HBM: (R, 1, D) — aliased to tab_out
    upd_ref,  # VMEM block: (chunk, D) per-row deltas / gradients
    acc_hbm,  # HBM: (R, 1, D) — aliased to acc_out (adagrad only; else absent)
    tab_out,
    acc_out,  # (adagrad only)
    trash,  # HBM out: (chunk, 1, D) — write target for invalid slots
    idx_smem,  # SMEM scratch: (2, 1, chunk)
    tab_rows,  # VMEM scratch: (2, chunk, 1, D)
    acc_rows,  # VMEM scratch: (2, chunk, 1, D) (adagrad only; else absent)
    rsem_tab,
    rsem_acc,
    wsem_tab,
    wsem_acc,
    idx_sem,
    *,
    chunk: int,
    num_rows: int,
    lr: float,
    eps: float,
    adagrad: bool,
):
    g = pl.program_id(0)
    n = pl.num_programs(0)
    s = g % 2
    ns = (g + 1) % 2

    def idx_dma(tile, slot):
        return pltpu.make_async_copy(
            idx_hbm.at[tile], idx_smem.at[slot], idx_sem
        )

    def issue_reads(slot):
        def body(rr, _):
            for u in range(_UNROLL):
                r = rr * _UNROLL + u
                row = jnp.minimum(idx_smem[slot, 0, r], num_rows - 1)
                pltpu.make_async_copy(
                    tab_hbm.at[row], tab_rows.at[slot, r], rsem_tab.at[slot]
                ).start()
                if adagrad:
                    pltpu.make_async_copy(
                        acc_hbm.at[row], acc_rows.at[slot, r],
                        rsem_acc.at[slot],
                    ).start()
            return 0

        jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)

    def issue_writes(slot):
        def body(rr, _):
            for u in range(_UNROLL):
                r = rr * _UNROLL + u
                row = idx_smem[slot, 0, r]
                valid = row < num_rows

                @pl.when(valid)
                def _():
                    pltpu.make_async_copy(
                        tab_rows.at[slot, r], tab_out.at[row],
                        wsem_tab.at[slot],
                    ).start()
                    if adagrad:
                        pltpu.make_async_copy(
                            acc_rows.at[slot, r], acc_out.at[row],
                            wsem_acc.at[slot],
                        ).start()

                @pl.when(jnp.logical_not(valid))
                def _():
                    pltpu.make_async_copy(
                        tab_rows.at[slot, r], trash.at[r], wsem_tab.at[slot]
                    ).start()
                    if adagrad:
                        pltpu.make_async_copy(
                            acc_rows.at[slot, r], trash.at[r],
                            wsem_acc.at[slot],
                        ).start()
            return 0

        jax.lax.fori_loop(0, chunk // _UNROLL, body, 0)

    def wait_writes(slot):
        pltpu.make_async_copy(
            tab_rows.at[slot], tab_rows.at[slot], wsem_tab.at[slot]
        ).wait()
        if adagrad:
            pltpu.make_async_copy(
                acc_rows.at[slot], acc_rows.at[slot], wsem_acc.at[slot]
            ).wait()

    @pl.when(g == 0)
    def _():
        idx_dma(0, 0).start()
        idx_dma(0, 0).wait()
        issue_reads(0)

    # fetch-ahead chunk g+1 into the other slot (overlaps this compute);
    # its buffers are free once the writes issued two steps ago drain
    @pl.when(g + 1 < n)
    def _():
        idx_dma(g + 1, ns).start()
        idx_dma(g + 1, ns).wait()

        @pl.when(g >= 1)
        def _():
            wait_writes(ns)

        issue_reads(ns)

    # wait for this chunk's row reads
    pltpu.make_async_copy(
        tab_rows.at[s], tab_rows.at[s], rsem_tab.at[s]
    ).wait()
    if adagrad:
        pltpu.make_async_copy(
            acc_rows.at[s], acc_rows.at[s], rsem_acc.at[s]
        ).wait()

    u = upd_ref[...][:, None, :]  # (chunk, 1, D)
    if adagrad:
        gval = u.astype(jnp.float32)
        a_new = acc_rows[s].astype(jnp.float32) + gval * gval
        # exact optax scale_by_rss form (single source: adagrad_factor)
        step = (-lr) * gval * adagrad_factor(a_new, eps)
        tab_rows[s] = (tab_rows[s].astype(jnp.float32) + step).astype(
            tab_rows.dtype
        )
        acc_rows[s] = a_new.astype(acc_rows.dtype)
    else:
        tab_rows[s] = (
            tab_rows[s].astype(jnp.float32) + u.astype(jnp.float32)
        ).astype(tab_rows.dtype)

    issue_writes(s)

    @pl.when(g == n - 1)
    def _():
        # drain BOTH slots: the prefetch block (which waits wsem[ns]) does
        # not run on the last step, so step n-2's writes are still in flight
        @pl.when(n >= 2)
        def _():
            wait_writes(ns)

        wait_writes(s)


@functools.partial(
    jax.jit, static_argnames=("lr", "eps", "chunk", "_interpret_override")
)
def sparse_row_update(
    tables,
    idx,
    upd,
    acc=None,
    *,
    lr: float = 0.01,
    eps: float = 1e-7,
    chunk: int = 512,
    _interpret_override: Optional[bool] = None,
):
    """In-place sparse row update on a flat (R, D) table.

    - SGD mode (``acc is None``): ``tables[idx] += upd`` (pre-scale upd by
      -lr outside), returns ``tables``.
    - Adagrad mode: ``acc[idx] += upd**2;
      tables[idx] -= lr * upd * where(acc_new > 0, rsqrt(acc_new + eps), 0)``
      (exact optax ``scale_by_rss`` semantics), returns ``(tables, acc)``.

    ``idx`` (N,) int32 must be DUPLICATE-FREE (see
    :func:`dedup_row_updates`); ids >= R are dropped.  Donated inputs are
    updated in place via ``input_output_aliases`` — no table-sized copy.
    """
    from param_tpu.ops.matmul import _interpret

    R, D = tables.shape
    (N,) = idx.shape
    adagrad = acc is not None
    if D % 128:
        raise ValueError(
            f"row width {D} must be a multiple of 128 lanes (Mosaic DMA "
            f"slice alignment) — view the table as (R*D/128, 128) and "
            f"repack the updates with pack_rows_to_lanes"
        )
    pad = (-N) % chunk
    if pad:
        idx = jnp.concatenate([idx, jnp.full((pad,), R, jnp.int32)])
        upd = jnp.concatenate([upd, jnp.zeros((pad, D), upd.dtype)])
        N += pad
    n_chunks = N // chunk
    if chunk % _UNROLL:
        raise ValueError(f"chunk={chunk} must be divisible by {_UNROLL}")

    idx3 = idx.reshape(n_chunks, 1, chunk)
    tab3 = tables.reshape(R, 1, D)
    inputs = [idx3, tab3, upd]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((chunk, D), lambda g: (g, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((R, 1, D), tables.dtype),
        jax.ShapeDtypeStruct((chunk, 1, D), tables.dtype),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    aliases = {1: 0}
    scratch = [
        pltpu.SMEM((2, 1, chunk), jnp.int32),
        pltpu.VMEM((2, chunk, 1, D), tables.dtype),
    ]
    if adagrad:
        inputs.insert(2, acc.reshape(R, 1, D))
        in_specs.insert(2, pl.BlockSpec(memory_space=pl.ANY))
        out_shape.insert(1, jax.ShapeDtypeStruct((R, 1, D), acc.dtype))
        out_specs.insert(1, pl.BlockSpec(memory_space=pl.ANY))
        aliases = {1: 0, 2: 1}
        scratch.append(pltpu.VMEM((2, chunk, 1, D), acc.dtype))
    else:
        scratch.append(None)
    sems = [
        pltpu.SemaphoreType.DMA((2,)),  # rsem_tab
        pltpu.SemaphoreType.DMA((2,)),  # rsem_acc
        pltpu.SemaphoreType.DMA((2,)),  # wsem_tab
        pltpu.SemaphoreType.DMA((2,)),  # wsem_acc
        pltpu.SemaphoreType.DMA,  # idx_sem
    ]

    def kernel(*refs):
        if adagrad:
            (idx_r, tab_r, acc_r, upd_r, tab_o, acc_o, trash_o,
             idx_s, tab_v, acc_v, rt, ra, wt, wa, isem) = refs
        else:
            (idx_r, tab_r, upd_r, tab_o, trash_o,
             idx_s, tab_v, rt, ra, wt, wa, isem) = refs
            acc_r = acc_o = acc_v = None
        _update_kernel(
            idx_r, tab_r, upd_r, acc_r, tab_o, acc_o, trash_o,
            idx_s, tab_v, acc_v, rt, ra, wt, wa, isem,
            chunk=chunk, num_rows=R, lr=lr, eps=eps, adagrad=adagrad,
        )

    interpret = (
        _interpret() if _interpret_override is None else _interpret_override
    )
    per_row = D * tables.dtype.itemsize * (4 if adagrad else 2)
    outs = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases=aliases,
        scratch_shapes=[s for s in scratch if s is not None] + sems,
        cost_estimate=pl.CostEstimate(
            flops=N * D * (6 if adagrad else 1),
            bytes_accessed=N * per_row,
            transcendentals=N * D if adagrad else 0,
        ),
        interpret=interpret,
    )(*inputs)
    if adagrad:
        return outs[0].reshape(R, D), outs[1].reshape(R, D)
    return outs[0].reshape(R, D)
