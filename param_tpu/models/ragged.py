"""Ragged sparse-input redistribution (the DLRM SparseDataDist).

TPU-native counterpart of the reference's two-stage ragged exchange
(``train/comms/pt/dlrm.py:744-855``): an all-to-all of per-bag LENGTHS
followed by an all-to-all(v) of the variable-length INDICES, then per-table
regrouping (``splitPerTable``, dlrm.py:430).

Under XLA's static shapes the *buffers* are worst-case padded, but the
exchange is semantically ragged: each entry's position is computed with
masked prefix-sums so bags of any length ≤ max_nnz route correctly.  Two
wire modes:

- padded ``lax.all_to_all`` (works everywhere, moves padded bytes);
- ``lax.ragged_all_to_all`` (TPU: moves the true ragged byte counts —
  requires an extra (n,n) count all-gather for the output offsets).

All functions run INSIDE ``shard_map`` over axis ``axis``.
Layout convention matches the fixed-nnz model: tables are dest-major
(table t lives on rank t // (T/n)), and the post-exchange batch order is
(source_rank, local_sample).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _exclusive_cumsum(x, axis):
    c = jnp.cumsum(x, axis=axis)
    return c - x


def ragged_sparse_dist(
    lengths, idx_padded, axis: str, *, pad_row: int, wire: str = "padded"
):
    """Redistribute ragged sparse ids: each rank sends every sample's ids
    for table t to t's owner.

    Args (per-rank local values inside shard_map):
      lengths:    (b, T) int32 — valid ids per (sample, table), ≤ max_nnz
      idx_padded: (b, T, K) int32 — ids, positions ≥ length are ignored
      pad_row:    index used to fill invalid slots in the OUTPUT (point it
                  at a zero row, see embedding.with_pad_row)
      wire:       "padded" | "ragged" (ragged_all_to_all; TPU only)

    Returns:
      lengths_t:  (B, T/n) int32 — lengths for MY tables, all samples
      idx_t:      (B, T/n, K) int32 — dense ids for my tables, padded with
                  ``pad_row`` (ready for embedding_bag)
    """
    n = lax.axis_size(axis)
    b, T, K = idx_padded.shape
    Tl = T // n
    cap = b * Tl * K  # worst-case entries per (sender, dest) pair

    # ---- stage 1: lengths all_to_all (COMM 1, "offset exchange") --------
    lengths_t = lax.all_to_all(lengths, axis, split_axis=1, concat_axis=0,
                               tiled=True)  # (B, Tl)

    # ---- sender side: dest-major masked compaction ----------------------
    # reorder (b, T, K) -> (n, b, Tl, K): dest-major, then (sample, local
    # table, slot) — the order the receiver reconstructs in
    idx_d = idx_padded.reshape(b, n, Tl, K).transpose(1, 0, 2, 3)
    len_d = lengths.reshape(b, n, Tl).transpose(1, 0, 2)
    mask_d = (
        jax.lax.broadcasted_iota(jnp.int32, (n, b, Tl, K), 3)
        < len_d[..., None]
    )
    flat_mask = mask_d.reshape(n, -1)
    within = _exclusive_cumsum(flat_mask.astype(jnp.int32), axis=1)
    send_counts = flat_mask.sum(axis=1).astype(jnp.int32)  # (n,)

    if wire == "ragged":
        send_off = _exclusive_cumsum(send_counts, 0)
        pos = send_off[:, None] + within  # global position in send buffer
        flat_pos = jnp.where(flat_mask, pos, n * cap).reshape(-1)
        send_buf = jnp.zeros((n * cap,), idx_padded.dtype).at[flat_pos].set(
            idx_d.reshape(-1), mode="drop"
        )
        # (n, n) count matrix so every sender knows where its chunk lands
        counts_mx = lax.all_gather(send_counts, axis)  # (n, n): [sender, dest]
        me = lax.axis_index(axis)
        output_offsets = _exclusive_cumsum(counts_mx, 0)[me]  # my row
        recv_sizes = counts_mx[:, me]
        recv_buf = jnp.zeros((n * cap,), idx_padded.dtype)
        recv_buf = lax.ragged_all_to_all(
            send_buf, recv_buf,
            input_offsets=send_off.astype(jnp.int32),
            send_sizes=send_counts,
            output_offsets=output_offsets.astype(jnp.int32),
            recv_sizes=recv_sizes.astype(jnp.int32),
            axis_name=axis,
        )
        counts_in = recv_sizes
        recv_off = _exclusive_cumsum(counts_in, 0)
    else:
        # padded wire: per-dest chunk of fixed capacity
        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) * cap
        ).reshape(n, 1) + within
        flat_pos = jnp.where(flat_mask, pos, n * cap).reshape(-1)
        send_buf = jnp.zeros((n * cap,), idx_padded.dtype).at[flat_pos].set(
            idx_d.reshape(-1), mode="drop"
        )
        recv_buf = lax.all_to_all(send_buf, axis, 0, 0, tiled=True)
        # chunk from sender r starts at r*cap
        counts_in = None
        recv_off = jnp.arange(n, dtype=jnp.int32) * cap

    # ---- receiver side: reconstruct dense (B, Tl, K) --------------------
    # entries from sender r are ordered (local sample, local table, slot);
    # their within-chunk positions follow the same masked prefix-sum over
    # lengths_t rows belonging to r
    len_chunks = lengths_t.reshape(n, b, Tl)
    mask_t = (
        jax.lax.broadcasted_iota(jnp.int32, (n, b, Tl, K), 3)
        < len_chunks[..., None]
    )
    within_t = _exclusive_cumsum(
        mask_t.reshape(n, -1).astype(jnp.int32), axis=1
    )
    src_pos = recv_off[:, None] + within_t  # (n, b*Tl*K)
    gathered = jnp.take(recv_buf, src_pos.reshape(-1), axis=0).reshape(
        n, b, Tl, K
    )
    idx_t = jnp.where(mask_t, gathered, pad_row).reshape(n * b, Tl, K)
    return lengths_t, idx_t


def ragged_reference(lengths, idx_padded, n: int, pad_row: int):
    """Pure-numpy oracle for tests: what each rank's (lengths_t, idx_t)
    must be after a correct redistribution.  lengths/idx are GLOBAL
    (B, T[, K]) host arrays; returns per-rank lists."""
    import numpy as np

    B, T, K = idx_padded.shape
    b, Tl = B // n, T // n
    out = []
    for j in range(n):
        lt = lengths[:, j * Tl : (j + 1) * Tl]
        # batch order (source_rank, local_sample) == natural order already
        it = np.full((B, Tl, K), pad_row, dtype=idx_padded.dtype)
        for gi in range(B):
            for tl in range(Tl):
                L = int(lt[gi, tl])
                it[gi, tl, :L] = idx_padded[gi, j * Tl + tl, :L]
        out.append((lt, it))
    return out
