"""Quantized communication: downcast → collective → dequantize.

TPU-native counterpart of the reference's quantized-allreduce path
(``pytorch_dist_backend.py:48-164`` ``_downcast``/``_dequantize`` hooks,
``comms_utils.py:371-443`` ``initQuantCommCtx``/``checkQuantArgs``).

- bitwidth 16: communicate in bfloat16 (reduction arithmetic in bf16, like
  the reference's fp16 allreduce).
- bitwidth 8: int8 with per-chunk max-abs scales.  Reductions can't psum
  int8 (overflow), so :func:`quantized_all_reduce` runs the two-phase
  reduce-scatter + all-gather algorithm with dequant/requant at the
  reduction step — the honest int8 ring-allreduce data volume
  (2(n-1)/n · bytes/4).
- non-reducing collectives (a2a/gather/scatter/broadcast) just cast.

Pure functions over shard_map-visible values so they fuse into the
collective programs; quant/dequant cost is measured separately by the bench
(reference: quant_us/dequant_us in commsQuantCollPerfMetrics).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

SUPPORTED_BITWIDTHS = (32, 16, 8)
# reference restriction: quantization only for these (checkQuantArgs)
QUANTIZABLE = {"all_reduce", "reduce", "all_to_all", "all_to_all_single",
               "all_gather", "reduce_scatter"}


def check_quant_args(collective: str, bitwidth: int) -> None:
    """(reference: checkQuantArgs, comms_utils.py:425-443)"""
    if bitwidth not in SUPPORTED_BITWIDTHS:
        raise ValueError(f"bitwidth must be one of {SUPPORTED_BITWIDTHS}")
    if bitwidth != 32 and collective not in QUANTIZABLE:
        raise ValueError(
            f"quantization unsupported for {collective!r}; "
            f"supported: {sorted(QUANTIZABLE)}"
        )


def quantize(x, bitwidth: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (quantized values, scale).  scale is a scalar (per-tensor).

    Wrapped in ``jax.named_scope("quantize")`` so the ops land in the
    profiler's device trace under an identifiable name — the quant-vs-comm
    device-time split (reference quant_us/dequant_us,
    pytorch_dist_backend.py:108-164) is recovered from the trace by
    ``trace.device_trace.quant_comm_split``."""
    with jax.named_scope("quantize"):
        if bitwidth == 32:
            return x, jnp.float32(1.0)
        if bitwidth == 16:
            return x.astype(jnp.bfloat16), jnp.float32(1.0)
        if bitwidth == 8:
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
            scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
            return q.astype(jnp.int8), scale
    raise ValueError(f"unsupported bitwidth {bitwidth}")


def dequantize(q, scale, dtype=jnp.float32):
    with jax.named_scope("dequantize"):
        return (q.astype(jnp.float32) * scale).astype(dtype)


def quantized_all_reduce(x, axis: str, bitwidth: int):
    """Quantized sum-allreduce inside shard_map.

    bitwidth 16: psum in bf16.
    bitwidth 8: reduce-scatter phase (int8 a2a + dequant-sum) then
    all-gather phase (requantized int8 chunks + f32 scales)."""
    if bitwidth == 32:
        return lax.psum(x, axis)
    if bitwidth == 16:
        return lax.psum(x.astype(jnp.bfloat16), axis).astype(x.dtype)
    n = lax.axis_size(axis)
    # pad so the chunking dim divides the axis size
    orig = x.shape[0]
    rem = (-orig) % n
    if rem:
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad_width)
    # phase 1: exchange quantized chunks (reduce-scatter)
    q, scale = quantize(x, 8)
    mixed = lax.all_to_all(q, axis, 0, 0, tiled=True)  # my chunk from all ranks
    scales = lax.all_gather(scale, axis)  # (n,)
    chunk = x.shape[0] // n
    parts = mixed.reshape(n, chunk, *x.shape[1:]).astype(jnp.float32)
    reduced = jnp.sum(parts * scales.reshape(n, *([1] * x.ndim)), axis=0)
    # phase 2: requantize my reduced chunk, gather all chunks
    q2, scale2 = quantize(reduced, 8)
    gathered = lax.all_gather(q2, axis, tiled=True)
    scales2 = lax.all_gather(scale2, axis)
    out = gathered.reshape(n, chunk, *x.shape[1:]).astype(jnp.float32)
    out = out * scales2.reshape(n, *([1] * x.ndim))
    out = out.reshape(x.shape).astype(x.dtype)
    if rem:
        out = out[:orig]
    return out


def quantized_ring_reduce(x, axis: str, bitwidth: int, root: int, n: int):
    """Quantized rooted sum-reduce: the ring chain of single-edge
    ``ppermute`` hops (backend.reduce's byte-honest formulation) with the
    WIRE payload quantized per hop (reference: the quantize hooks apply to
    reduce as well as all_reduce, pytorch_dist_backend.py:48-164).

    Each hop sends the quantized running partial (+ its f32 scale at
    bitwidth 8); the receiver dequantizes, combines with its local f32
    buffer, and the next hop requantizes.  Bytes on wire:
    (n-1) · size · bitwidth/32 — honest quantized ring-reduce traffic."""
    me = lax.axis_index(axis)
    acc = x.astype(jnp.float32)
    for k in range(1, n):
        src, dst = (root + k) % n, (root + k + 1) % n
        q, scale = quantize(acc, bitwidth)
        recv_q = lax.ppermute(q, axis, perm=[(src, dst)])
        if bitwidth == 8:
            recv_scale = lax.ppermute(scale, axis, perm=[(src, dst)])
            recv = dequantize(recv_q, recv_scale)
        else:
            recv = recv_q.astype(jnp.float32)
        acc = jnp.where(me == dst, recv + x.astype(jnp.float32), acc)
    out = jnp.where(me == root, acc, jnp.zeros_like(acc))
    return out.astype(x.dtype)


def quantized_cast_collective(x, bitwidth: int):
    """Pre-comm cast for non-reducing collectives; returns (payload, scale)."""
    return quantize(x, bitwidth)
