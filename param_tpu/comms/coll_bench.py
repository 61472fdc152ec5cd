"""Collective sweep benchmark — the nccl-tests-style bench.

TPU-native counterpart of the reference's ``commsCollBench``
(``train/comms/pt/comms.py``): size sweep per collective, warmup + timed
iterations, dcheck validation, pt2pt ping / ping-pong / uni-BW / bi-BW window
tests, multi-group mode, and the fixed-width COMMS-RES report
(comms.py:1057-1186).

Latency distribution: in BLOCKING mode every iteration is timed (reference
behavior); in DISPATCH/GRAPH modes the per-op time comes from delta-N batches
repeated ``reps`` times, and percentiles are over the reps.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import List, Optional

from param_tpu.backend.base import Backend, CommGroup
from param_tpu.comms.harness import CommsBench, CommsParams
from param_tpu.comms.timing import (
    TimingMode,
    measure_blocking,
    measure_chain,
    measure_dispatch,
)
from param_tpu.utils.bw import alg_bw, bus_bw_factor
from param_tpu.utils.logger import (
    CommsCollPerfMetrics,
    CommsPt2PtPerfMetrics,
    emit_metrics,
)
from param_tpu.utils.sizes import format_size, percentile

log = logging.getLogger(__name__)

_HEADER = (
    f"{'COMMS-RES':>12}{'size(B)':>12}{'count':>12}{'p50(us)':>10}"
    f"{'p75(us)':>10}{'p95(us)':>10}{'min(us)':>10}{'max(us)':>10}"
    f"{'algBW(GB/s)':>13}{'busBW(GB/s)':>13}"
)


@dataclass
class CollResult:
    collective: str
    size_bytes: int
    num_elements: int
    lat_us: List[float] = field(default_factory=list)
    alg_bw_gbs: float = 0.0
    bus_bw_gbs: float = 0.0
    dcheck_ok: Optional[bool] = None
    quant_us: Optional[float] = None

    def pct(self, p):
        return percentile(self.lat_us, p)


class CollBench(CommsBench):
    """Runs the sweep (reference: benchTime/benchComm, comms.py:1279-1330)."""

    def __init__(self, backend: Backend, params: CommsParams, reps: int = 3):
        super().__init__(backend, params)
        self.reps = reps
        self.profiler = None  # optional SizeTriggeredProfiler

    def run_one(
        self, collective: str, size_bytes: int, group: CommGroup
    ) -> CollResult:
        p = self.params
        args = self.prep_comm(collective, size_bytes, group)
        fn = self.backend.collective_fn[collective]
        res = CollResult(
            collective=collective,
            size_bytes=size_bytes,
            num_elements=size_bytes // self.elem_size,
        )
        if p.dcheck:
            out = fn(args)
            self.backend.complete_ops()
            res.dcheck_ok = self.dcheck(collective, args, out)

        k = max(1, p.num_coll_per_iter)

        def call():
            # reference posts numCollPerIter collectives per timed iteration
            # (comms.py:493-494); latency is reported per ITERATION
            r = None
            for _ in range(k):
                r = fn(args)
            return r

        from param_tpu.backend.base import OBJECT_COLLECTIVES

        if p.mode == TimingMode.BLOCKING or collective in OBJECT_COLLECTIVES:
            # object collectives pickle on the host every call (reference:
            # dist.all_gather_object semantics) — per-call timing is the
            # honest mode; they cannot ride a compiled scan chain
            lats = measure_blocking(call, p.num_iters, p.num_warmup_iters)
            res.lat_us = [t * 1e6 for t in lats]
        elif p.mode == TimingMode.GRAPH:
            if self.backend.is_recording():
                # the chain program bypasses the (wrapped) dispatch table,
                # so --trace-dump would record nothing in graph mode (code
                # review r2) — post one dispatch iteration per sweep point
                # so the trace carries the sweep's op pattern
                call()
                self.backend.complete_ops()
            # scalar-fetch chain timing: the only mode whose numbers are
            # trustworthy on remote-attached TPUs (see timing.measure_chain)
            # a real sample for the percentiles: at least 10 reps
            # (chain programs are compiled once and re-run, so extra reps
            # cost execution only)
            per = [
                measure_chain(
                    lambda n: self.backend.coll_chain(collective, args, n),
                    n_lo=max(1, p.num_iters // 8),
                    n_hi=p.num_iters,
                )
                for _ in range(max(self.reps, 10))
            ]
            res.lat_us = [t * 1e6 for t in per]
        else:
            # dispatch mode is debug-only on remote-attached TPUs (dispatch
            # can return before execution — CLAUDE.md timing rules); still
            # give its percentiles a real sample size (>=10, like graph mode)
            per = [
                measure_dispatch(call, p.num_iters, p.num_warmup_iters)
                for _ in range(max(self.reps, 10))
            ]
            res.lat_us = [t * 1e6 for t in per]
        self.backend.clear_memory()

        p50 = res.pct(50)
        payload = self.payload_bytes(collective, size_bytes, group)
        res.alg_bw_gbs = alg_bw(payload, p50)
        res.bus_bw_gbs = res.alg_bw_gbs * bus_bw_factor(collective, group.size)
        if p.bitwidth != 32:
            res.bus_bw_gbs *= p.bitwidth / 32.0
            # isolate the quantize+dequantize overhead (reference:
            # quant_us/dequant_us split, pytorch_dist_backend.py:108-164)
            try:
                q_per = measure_dispatch(
                    lambda: self.backend.quant_overhead(args),
                    p.num_iters,
                    p.num_warmup_iters,
                )
                res.quant_us = q_per * 1e6
            except Exception:
                log.exception("quant overhead measurement failed")
        return res

    def bench_collective(self, collective: str, group: CommGroup) -> List[CollResult]:
        results = []
        for size in self.sweep_sizes(collective, group):
            if self.profiler is not None:
                self.profiler.maybe_start(size)
            try:
                results.append(self.run_one(collective, size, group))
            except Exception:
                log.exception("%s @ %d B failed", collective, size)
        return results

    # ---------------------------------------------------------------- pt2pt
    def bench_pt2pt(self, size_bytes: int, group: CommGroup):
        """Ping latency, ping-pong latency, uni-/bi-directional window BW
        (reference: runPt2Pt, comms.py:554-765)."""
        p = self.params
        args = self.prep_comm("pt2pt", size_bytes, group)
        if not args.src_ranks:
            if p.pt2pt == "pairwise":
                half = group.size // 2
                args.src_ranks = list(range(half))
                args.dst_ranks = [r + half for r in range(half)]
            else:  # one2one
                args.src_ranks = [p.src_rank]
                args.dst_ranks = [p.dst_rank or (group.size - 1)]

        ping = measure_dispatch(
            lambda: self.backend.ping(args, pong=False), p.num_iters, p.num_warmup_iters
        )
        pingpong = measure_dispatch(
            lambda: self.backend.ping(args, pong=True), p.num_iters, p.num_warmup_iters
        )
        uni = measure_dispatch(
            lambda: self.backend.window_send(args, p.window, bidirectional=False),
            max(2, p.num_iters // 4),
            1,
        )
        bi = measure_dispatch(
            lambda: self.backend.window_send(args, p.window, bidirectional=True),
            max(2, p.num_iters // 4),
            1,
        )
        self.backend.clear_memory()
        n_pairs = len(args.src_ranks)
        uni_bw = n_pairs * p.window * size_bytes / (uni or 1e-9) / 1e9
        bi_bw = 2 * n_pairs * p.window * size_bytes / (bi or 1e-9) / 1e9
        m = CommsPt2PtPerfMetrics(
            commsOp="pt2pt",
            dtype=p.dtype,
            world_size=group.size,
            input_size_bytes=size_bytes,
            ping_p50_us=ping * 1e6,
            ping_pong_p50_us=pingpong * 1e6,
            uni_bw_gbs=uni_bw,
            bi_bw_gbs=bi_bw,
        )
        emit_metrics(m)
        return m

    # --------------------------------------------------------------- report
    def report(self, collective: str, results: List[CollResult], group: CommGroup):
        """Print the COMMS-RES table (reference: reportBenchTimeColl,
        comms.py:1112-1186) and emit metrics to registered loggers."""
        print(f"\nCOMMS-RES: {collective} dtype={self.params.dtype} "
              f"world={group.size} mode={self.params.mode.value}")
        print(_HEADER)
        for r in results:
            check = "" if r.dcheck_ok is None else ("  OK" if r.dcheck_ok else "  BAD")
            print(
                f"{format_size(r.size_bytes):>12}{r.size_bytes:>12}"
                f"{r.num_elements:>12}{r.pct(50):>10.1f}{r.pct(75):>10.1f}"
                f"{r.pct(95):>10.1f}{r.pct(0):>10.1f}{r.pct(100):>10.1f}"
                f"{r.alg_bw_gbs:>13.2f}{r.bus_bw_gbs:>13.2f}{check}"
            )
            emit_metrics(
                CommsCollPerfMetrics(
                    commsOp=collective,
                    dtype=self.params.dtype,
                    world_size=group.size,
                    input_size_bytes=r.size_bytes,
                    output_size_bytes=r.size_bytes,
                    num_elements=r.num_elements,
                    p50_us=r.pct(50),
                    p75_us=r.pct(75),
                    p95_us=r.pct(95),
                    min_us=r.pct(0),
                    max_us=r.pct(100),
                    alg_bw_gbs=r.alg_bw_gbs,
                    bus_bw_gbs=r.bus_bw_gbs,
                )
            )

    # ------------------------------------------------------------------ run
    def run(self):
        """Full bench (reference: runBench, comms.py:1535-1543)."""
        known = set(self.backend.collective_fn)
        bad = [c for c in self.params.collectives if c not in known and c != "pt2pt"]
        if bad:
            raise ValueError(
                f"unknown collective(s) {bad}; supported: {sorted(known)}"
            )
        groups = self.make_groups()
        all_results = {}
        for collective in self.params.collectives:
            if collective == "pt2pt" or self.params.pt2pt:
                for g in groups:
                    for size in self.sweep_sizes("pt2pt", g):
                        self.bench_pt2pt(size, g)
                continue
            for g in groups:
                results = self.bench_collective(collective, g)
                self.report(collective, results, g)
                all_results[(collective, g.pg_id)] = results
        return all_results
