"""Measurement methodology for async-dispatch runtimes.

The reference times eager CUDA ops with host timers + events
(``comms.py:458-521``).  JAX dispatch is asynchronous and (on remote-attached
TPUs) a blocking round trip can cost tens of milliseconds, so one blocking
call per iteration would measure the tunnel, not the collective.  Two modes:

- **dispatch** (default): enqueue ``n_hi`` calls back-to-back and block once,
  then enqueue 1 call and block; per-op time = (t_hi - t_lo)/(n_hi - 1).
  The delta cancels the fixed dispatch/round-trip latency the same way
  nccl-tests' warmup+averaging does, without requiring device-side timers.
- **graph**: run the op inside one compiled ``lax.scan`` chain (the
  reference's CUDA-graph mode, ``run_coll_cuda_graph`` comms.py:375) —
  measures pure device throughput with zero per-iteration dispatch.

Blocking mode (reference ``--z 1``) is still available for semantics parity:
it blocks every iteration and reports what it sees.
"""

from __future__ import annotations

import enum
import time
from typing import Callable

import jax


class TimingMode(str, enum.Enum):
    DISPATCH = "dispatch"
    BLOCKING = "blocking"
    GRAPH = "graph"


def _block(x) -> None:
    jax.block_until_ready(x)


def fetch_scalar(x) -> float:
    """Force + fetch a (replicated) scalar result.

    Multi-process worlds: ``float()`` on an array spanning non-addressable
    devices raises — read this process's addressable shard instead (the
    chain outputs are replicated via psum, so every shard holds the same
    value, and the read still forces local execution)."""
    try:
        return float(x)
    except RuntimeError:
        import numpy as np

        return float(np.asarray(x.addressable_shards[0].data))


def measure_dispatch(fn: Callable[[], object], iters: int, warmup: int = 2) -> float:
    """Average per-op seconds via delta-N async dispatch timing."""
    for _ in range(max(1, warmup)):
        r = fn()
    _block(r)
    t0 = time.perf_counter()
    rs = None
    for _ in range(iters):
        rs = fn()
    _block(rs)
    t_hi = time.perf_counter() - t0
    t0 = time.perf_counter()
    _block(fn())
    t_lo = time.perf_counter() - t0
    if iters <= 1:
        return t_lo
    per = (t_hi - t_lo) / (iters - 1)
    return max(per, 1e-9)


def measure_blocking(fn: Callable[[], object], iters: int, warmup: int = 2) -> list:
    """Reference-style per-iteration blocking latencies (seconds each)."""
    for _ in range(max(1, warmup)):
        _block(fn())
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn())
        lats.append(time.perf_counter() - t0)
    return lats


def measure_graph(
    graph_fn: Callable[[int], object], iters: int, warmup: int = 1
) -> float:
    """Per-op seconds from a device-side chained program.

    ``graph_fn(n)`` must run n chained ops in one dispatch.  Uses two chain
    lengths so the fixed dispatch cost cancels.
    """
    n_lo = max(2, iters // 4)
    n_hi = iters
    for _ in range(max(1, warmup)):
        _block(graph_fn(n_hi))
    t0 = time.perf_counter()
    _block(graph_fn(n_hi))
    t_hi = time.perf_counter() - t0
    _block(graph_fn(n_lo))
    t0 = time.perf_counter()
    _block(graph_fn(n_lo))
    t_lo = time.perf_counter() - t0
    per = (t_hi - t_lo) / (n_hi - n_lo)
    return max(per, 1e-9)


def measure_chain(
    chain_fn: Callable[[int], object],
    n_lo: int = 1,
    n_hi: int = 16,
    reps: int = 1,
    max_n: int = 1024,
    adaptive: bool | None = None,
) -> float:
    """Ground-truth per-op seconds: scalar-fetch delta-N timing with
    adaptive chain growth.

    ``chain_fn(n)`` must run n chained ops in ONE compiled program and return
    a SCALAR (e.g. ``jnp.sum`` of the result).  Timing fetches the scalar
    with ``float(...)`` — the only operation guaranteed to wait for real
    device execution on remote-attached runtimes where
    ``block_until_ready`` returns at enqueue (observed on the axon tunnel;
    see .claude/skills/verify/SKILL.md).  The (n_hi - n_lo) delta cancels
    both the round trip and the fetch.

    The round-trip jitter on a tunneled device can be several ms, so
    ``n_hi`` is doubled (up to ``max_n``) until the measured delta clears
    the observed noise floor — otherwise fast ops would disappear into the
    jitter and the delta could even go negative.

    ``adaptive`` controls that growth.  It MUST be off in multi-process
    worlds when ``chain_fn`` contains collectives: the growth decision is
    data-dependent (local noise floor), so different processes can pick
    different chain lengths and launch MISMATCHED collective programs —
    a silent SPMD deadlock (observed as a >500 s hang / Gloo connection
    reset in the 4-process sweep stage).  Default ``None`` = auto:
    adaptive only when this runtime has a single process.

    This is the analogue of the reference's CUDA-graph timing mode
    (run_coll_cuda_graph, comms.py:375) with nccl-tests-style averaging.
    """
    if adaptive is None:
        adaptive = jax.process_count() == 1

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        fetch_scalar(chain_fn(n))
        return time.perf_counter() - t0

    # warm + noise floor estimate at the short chain
    fetch_scalar(chain_fn(n_lo))
    lo_times = [timed(n_lo) for _ in range(3)]
    t_lo = min(lo_times)
    noise = max(lo_times) - t_lo

    n = max(n_hi, n_lo * 2)
    while True:
        fetch_scalar(chain_fn(n))  # compile outside the timed region
        t_hi = min(timed(n) for _ in range(2))
        delta = t_hi - t_lo
        if not adaptive or delta > max(8 * noise, 0.02) or n >= max_n:
            break
        n *= 4

    # median over reps — min() would bias optimistic under round-trip
    # jitter (a lucky-fast t_hi or unlucky-slow t_lo shrinks the delta)
    pers = [max(delta / (n - n_lo), 1e-9)]
    for _ in range(max(0, reps - 1)):
        t_lo_r = min(timed(n_lo) for _ in range(2))
        t_hi_r = min(timed(n) for _ in range(2))
        per = (t_hi_r - t_lo_r) / (n - n_lo)
        if per > 0:
            pers.append(per)
    pers.sort()
    return pers[len(pers) // 2]
