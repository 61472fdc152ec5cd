"""Ring attention: SEQUENCE-parallel flash attention over a mesh axis.

Long-context attention does not fit one chip once S^2 work or the KV
cache outgrows it; the standard TPU answer (Ring Attention; the
scaling-book long-context chapter) shards the SEQUENCE over devices and
rotates KV shards around the ring while each device's Q stays resident:

    step t: every device runs flash attention of its local Q block
            against the KV shard it currently holds, then ppermutes the
            KV shard one hop; partial results merge with the standard
            log-sum-exp combine of (O, lse) pairs.

This composes two things this repo already owns: the Pallas flash
kernel's ``return_lse`` residual (ops/attention.py) and the mesh
collective tier (one ppermute hop per step — the comms pattern the
sweeps measure as pt2pt/ring traffic).  n-1 hops move each KV shard
once: ICI-bandwidth-optimal, compute/comm overlappable by XLA since the
ppermute of step t+1 is independent of step t's flash call.

Causal handling: the diagonal shard (t=0, own KV) runs the causal
kernel; rotated shards run the bidirectional kernel and are MASKED OUT
of the merge (lse -> -inf) when the source shard index exceeds this
device's — tokens may only attend backwards across shards.  The masked
steps still compute (uniform SPMD program, no per-device control flow);
a schedule that skips them is a perf refinement, not a semantics change.

Reference analogue: none — PARAM measures collective patterns; this IS
the long-context pattern, runnable and parity-tested against the
single-device oracle (tests/test_ring_attention.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from param_tpu.ops.attention import _flash_forward


def _merge(o, lse, o_t, lse_t):
    """Log-sum-exp combine of two normalized partial attentions.

    ``lse`` enters in the kernel layout (B*H, S, 128) (value broadcast
    across lanes); weights broadcast back over D."""
    lse_new = jnp.logaddexp(lse, lse_t)
    w_old = jnp.exp(lse - lse_new)[:, :, :1]    # (B*H, S, 1)
    w_new = jnp.exp(lse_t - lse_new)[:, :, :1]
    b, h, s, d = o.shape
    o = (o.reshape(b * h, s, d) * w_old
         + o_t.reshape(b * h, s, d) * w_new).reshape(b, h, s, d)
    return o, lse_new


def ring_attention(q, k, v, axis: str, *, causal: bool = False,
                   scale: float | None = None, block_q: int = 1024,
                   block_k: int = 1024):
    """Flash attention over sequence shards; call inside ``shard_map``
    with q/k/v sharded on dim 2 over ``axis``.

    Local shapes (B, H, S/n, D); returns the local output shard."""
    n = lax.axis_size(axis)
    me = lax.axis_index(axis)
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    perm = [(i, (i + 1) % n) for i in range(n)]

    def partial_att(k_cur, v_cur, diag: bool):
        # pack_heads=False keeps the lse in the per-head (B*H, S, 128)
        # layout the merge arithmetic uses
        return _flash_forward(
            q, k_cur, v_cur, causal=causal and diag, scale=scale,
            block_q=block_q, block_k=block_k, interpret=None,
            return_lse=True, pack_heads=False)

    # t = 0: own shard (the causal diagonal)
    o, lse = partial_att(k, v, diag=True)

    def step(carry, t):
        k_cur, v_cur, o, lse = carry
        # rotate first: at step t this device holds shard (me - t) mod n
        k_cur = lax.ppermute(k_cur, axis, perm)
        v_cur = lax.ppermute(v_cur, axis, perm)
        o_t, lse_t = partial_att(k_cur, v_cur, diag=False)
        if causal:
            src = jnp.mod(me - t, n)
            lse_t = jnp.where(src < me, lse_t,
                              jnp.full_like(lse_t, -jnp.inf))
        o, lse = _merge(o, lse, o_t, lse_t)
        return (k_cur, v_cur, o, lse), None

    if n > 1:
        (_, _, o, lse), _ = lax.scan(
            step, (k, v, o, lse), jnp.arange(1, n))
    return o
