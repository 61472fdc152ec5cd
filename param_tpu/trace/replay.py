"""Comm-trace replay engine.

TPU-native counterpart of the reference's ``commsTraceReplayBench``
(``train/comms/pt/commsTraceReplay.py``): dry-run statistics, warm-up
replay, blocking / non-blocking timed replay with tensor reuse by op
signature, ``--auto-shrink`` world remapping (prepComms:636-679), all_to_allv
split rebalancing (rebalanceSplit:509), per-PG routing from trace metadata,
per-collective latency statistics and a per-rank JSON details dump
(writeCommDetails:43).
"""

from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from param_tpu.backend.base import Backend, CollectiveArgs, CommGroup
from param_tpu.trace.comms_trace import (
    CommsOp,
    P2P_OPS,
    SKIP_OPS,
    parse_trace,
    read_trace_file,
)
from param_tpu.utils.bw import alg_bw, bus_bw_factor
from param_tpu.utils.dtypes import dtype_from_name, dtype_size
from param_tpu.utils.sizes import percentile

log = logging.getLogger(__name__)


@dataclass
class ReplayParams:
    """(reference: commsTraceReplayBench CLI args,
    commsTraceReplay.py:1411-1480)"""

    trace_path: Optional[str] = None
    trace_type: str = "basic"  # basic | pytorch_et | kineto | et
    target_rank: int = 0  # rank whose stream to take from per-rank traces
    dry_run: bool = False
    num_replays: int = 1
    num_warmup_replays: int = 1
    blocking: bool = False
    auto_shrink: bool = False
    rebalance_policy: Optional[str] = None  # None | "equal"
    do_warmup: bool = True
    output_path: Optional[str] = None
    use_timestamp: bool = False


@dataclass
class OpRecord:
    op_id: int
    comms: str
    size_bytes: int
    lat_us: float
    marker: str = ""


class CommsReplay:
    """(reference: commsTraceReplayBench, commsTraceReplay.py:89-1607)"""

    def __init__(self, backend: Backend, params: ReplayParams):
        self.backend = backend
        self.params = params
        self.ops: List[CommsOp] = []
        self._tensor_cache: Dict = {}
        self._pg_cache: Dict = {}
        self.records: List[OpRecord] = []
        self.total_replay_s: float = 0.0

    # ---------------------------------------------------------------- loading
    def load(self, trace: Optional[List[dict]] = None) -> None:
        """(reference: readTrace, commsTraceReplay.py:1485-1514)"""
        if self.params.trace_type == "et":
            # extract the collective stream from an execution trace
            # (reference: et-format comm parsing, commsTraceParser.py:46-55)
            from param_tpu.trace.comms_trace import comms_from_et
            from param_tpu.trace.execution_trace import ExecutionTrace

            et = (
                ExecutionTrace.load(self.params.trace_path)
                if trace is None
                else ExecutionTrace(trace)
            )
            self.ops = comms_from_et(et, self.backend.get_world_size())
        else:
            if trace is None:
                trace = read_trace_file(self.params.trace_path)
            self.ops = parse_trace(
                trace, self.params.trace_type,
                target_rank=self.params.target_rank,
                total_ranks=self.backend.get_world_size(),
            )
        if self.params.auto_shrink:
            self._shrink_to_world()
        if self.params.rebalance_policy == "equal":
            self._rebalance_splits()
        self._setup_groups()

    def _shrink_to_world(self) -> None:
        """Rescale ops recorded on a larger world onto this one
        (reference: prepComms auto-shrink, commsTraceReplay.py:636-679)."""
        world = self.backend.get_world_size()
        for op in self.ops:
            # recorded world: the split length is authoritative for ragged
            # ops — legacy traces without pg info get world_size defaulted
            # to the LIVE world by the parser, so 8-long splits would sail
            # unshrunk into a 4-rank replay (found by the multi-process
            # production-trace test) and, growing, max() would mask an
            # 8-long split behind a live-world world_size (found by the
            # n=16 dryrun gate)
            split_len = max(len(op.in_split or ()), len(op.out_split or ()))
            old = split_len or op.world_size or world
            if old == world:
                continue
            if op.comms in ("all_to_all", "all_to_all_single", "all_to_allv"):
                per_peer_in = max(1, op.in_msg_size // old)
                per_peer_out = max(1, op.out_msg_size // old)
                op.in_msg_size = per_peer_in * world
                op.out_msg_size = per_peer_out * world
                if op.in_split:
                    # shrink: truncate (keeps raggedness); grow: equal splits
                    # at the original per-peer size
                    op.in_split = (op.in_split[:world] if old > world
                                   else [per_peer_in] * world)
                    op.in_msg_size = sum(op.in_split)
                if op.out_split:
                    op.out_split = (op.out_split[:world] if old > world
                                    else [per_peer_out] * world)
                    op.out_msg_size = sum(op.out_split)
            elif op.comms in ("all_gather", "all_gather_base", "gather",
                              "reduce_scatter", "reduce_scatter_base", "scatter"):
                per_rank = max(1, op.out_msg_size // old)
                op.out_msg_size = per_rank * world
            if op.group_ranks:
                op.group_ranks = [r for r in op.group_ranks if r < world]
            op.world_size = world

    def _rebalance_splits(self) -> None:
        """Equalize ragged a2av splits (reference: rebalanceSplit,
        commsTraceReplay.py:509-545, policy 'equal')."""
        world = self.backend.get_world_size()
        for op in self.ops:
            if op.comms == "all_to_allv" and op.in_split:
                total = sum(op.in_split)
                base, rem = divmod(total, world)
                op.in_split = [base + (1 if i < rem else 0) for i in range(world)]
                op.out_split = list(op.in_split)
                op.in_msg_size = total
                op.out_msg_size = total

    def _setup_groups(self) -> None:
        """Create comm groups recorded in the trace (reference: setBench
        creates PGs from trace init ops, commsTraceReplay.py:1333-1389)."""
        world = self.backend.get_world_size()
        for op in self.ops:
            if op.pg_id is None or op.pg_id in self._pg_cache:
                continue
            ranks = [r for r in (op.group_ranks or range(world)) if r < world]
            if not ranks:
                ranks = list(range(world))
            self._pg_cache[op.pg_id] = self.backend.new_group(ranks, pg_id=op.pg_id)

    def _group_for(self, op: CommsOp) -> CommGroup:
        # under auto-shrink everything routes to the default group — trace
        # PGs were laid out for a different world (reference: prepComms,
        # commsTraceReplay.py:626-633)
        if self.params.auto_shrink:
            return self.backend.get_default_group()
        if op.pg_id is not None and op.pg_id in self._pg_cache:
            return self._pg_cache[op.pg_id]
        return self.backend.get_default_group()

    # ---------------------------------------------------------------- dry run
    def dry_run_stats(self) -> Dict:
        """Per-collective op counts and message-size histogram
        (reference: initTraceStat + dry-run output,
        commsTraceReplay.py:448-506)."""
        stats: Dict[str, Dict] = defaultdict(
            lambda: {"count": 0, "total_bytes": 0, "sizes": []}
        )
        for op in self.ops:
            if op.comms:
                es = dtype_size(dtype_from_name(op.dtype)) if op.comms not in SKIP_OPS else 4
                nbytes = op.in_msg_size * es
                s = stats[op.comms]
                s["count"] += 1
                s["total_bytes"] += nbytes
                s["sizes"].append(nbytes)
            elif op.compute:
                stats[f"compute:{op.compute}"]["count"] += 1
        return dict(stats)

    # ------------------------------------------------------------------ prep
    def prep_op(self, op: CommsOp) -> CollectiveArgs:
        """Allocate (cached) tensors for one trace op
        (reference: prepComms, commsTraceReplay.py:604-696)."""
        key = op.signature()
        if key in self._tensor_cache:
            return self._tensor_cache[key]
        g = self._group_for(op)
        n = g.size
        dtype = dtype_from_name(op.dtype)
        # in_msg_size is the PER-RANK input element count (basic-schema
        # convention; reference prepComms uses it verbatim with
        # size_from_trace, commsTraceReplay.py:684) — alloc_random takes the
        # per-rank local shape.  Splitting collectives need a multiple of n.
        elems = max(1, op.in_msg_size)
        if op.comms in ("all_to_all", "all_to_all_single", "all_to_allv",
                        "reduce_scatter", "reduce_scatter_base", "scatter"):
            # round UP to a multiple of n: rounding down truncated ragged
            # a2av operands whose split sum isn't divisible by n, silently
            # moving fewer bytes than the trace recorded (code review r2)
            elems = max(n, -(-elems // n) * n)
        args = CollectiveArgs(
            group=g,
            in_tensor=self.backend.alloc_random((elems,), dtype, g),
            red_op="sum",
            src_rank=op.root if op.comms in ("broadcast", "scatter", "multicast")
            else op.src_rank,
            dst_rank=op.root if op.comms in ("reduce", "gather", "incast")
            else op.dst_rank,
            in_split=op.in_split,
            out_split=op.out_split,
        )
        if op.comms == "pt2pt" or op.comms in P2P_OPS:
            args.src_ranks = [op.src_rank]
            args.dst_ranks = [op.dst_rank]
        self._tensor_cache[key] = args
        return args

    def run_compute(self, op: CommsOp):
        """Replay an embedded compute op (reference: prepComputeReplay,
        commsTraceReplay.py:853-932)."""
        import jax.numpy as jnp

        if op.compute == "gemm":
            m, k, _, nn = op.mm_dims
            key = ("gemm", tuple(op.mm_dims), op.dtype)
            if key not in self._tensor_cache:
                dtype = dtype_from_name(op.dtype)
                self._tensor_cache[key] = (
                    jnp.ones((m, k), dtype), jnp.ones((k, nn), dtype)
                )
            a, b = self._tensor_cache[key]
            return self.backend.compute_fn["gemm"](a, b)
        if op.compute == "emb_lookup":
            key = ("emb", op.num_embs, op.emb_dim, op.batch_size, op.bag_size)
            if key not in self._tensor_cache:
                import numpy as np

                rng = np.random.default_rng(0)
                table = jnp.asarray(
                    rng.random((max(op.num_embs, 1), max(op.emb_dim, 1)),
                               dtype=np.float32)
                )
                idx = jnp.asarray(
                    rng.integers(0, max(op.num_embs, 1),
                                 size=(max(op.batch_size, 1), max(op.bag_size, 1))
                                 ).astype(np.int32)
                )
                self._tensor_cache[key] = (table, idx)
            table, idx = self._tensor_cache[key]
            return self.backend.emb_lookup(table, idx)
        raise ValueError(f"unsupported compute {op.compute!r}")

    # ---------------------------------------------------------------- replay
    def replay_once(self, record: bool = True) -> float:
        """One pass over the trace (reference: replayTrace,
        commsTraceReplay.py:995-1114).  Returns wall seconds."""
        p = self.params
        backend = self.backend
        t_start = time.perf_counter()
        base_ts = None
        for op in self.ops:
            if op.comms in SKIP_OPS:
                if op.comms == "wait":
                    backend.complete_ops()
                elif op.comms == "barrier":
                    backend.barrier()
                continue
            if p.use_timestamp and op.start_time_ns is not None:
                # timestamp-paced replay (reference: waitForTimestamp,
                # commsTraceReplay.py:835-851)
                if base_ts is None:
                    base_ts = (op.start_time_ns, time.perf_counter())
                else:
                    target = (op.start_time_ns - base_ts[0]) / 1e9
                    while time.perf_counter() - base_ts[1] < target:
                        pass
            t0 = time.perf_counter()
            if op.compute:
                res = self.run_compute(op)
                if p.blocking:
                    import jax

                    jax.block_until_ready(res)
            else:
                name = "pt2pt" if op.comms in P2P_OPS else op.comms
                args = self.prep_op(op)
                fn = backend.collective_fn.get(name)
                if fn is None:
                    log.warning("skipping unsupported collective %s", name)
                    continue
                fn(args)
                if p.blocking:
                    backend.complete_ops()
            lat_us = (time.perf_counter() - t0) * 1e6
            if record:
                es = dtype_size(dtype_from_name(op.dtype))
                self.records.append(
                    OpRecord(
                        op_id=op.id,
                        comms=op.comms or f"compute:{op.compute}",
                        size_bytes=op.in_msg_size * es if op.comms else 0,
                        lat_us=lat_us,
                        marker="/".join(op.markers),
                    )
                )
        backend.complete_ops()
        return time.perf_counter() - t_start

    def run(self, trace: Optional[List[dict]] = None) -> Dict:
        """Full benchmark (reference: runBench + benchTime,
        commsTraceReplay.py:1117-1260)."""
        p = self.params
        if not self.ops:
            self.load(trace)
        if p.dry_run:
            return {"dry_run": self.dry_run_stats()}
        if p.do_warmup:
            for _ in range(p.num_warmup_replays):
                self.replay_once(record=False)
        self.records.clear()
        total = 0.0
        for _ in range(p.num_replays):
            total += self.replay_once(record=True)
        self.total_replay_s = total
        return self.report()

    # ---------------------------------------------------------------- report
    def report(self) -> Dict:
        """(reference: reportBenchTime, commsTraceReplay.py:311-446)"""
        per_coll: Dict[str, List[OpRecord]] = defaultdict(list)
        for r in self.records:
            per_coll[r.comms].append(r)
        world = self.backend.get_world_size()
        out = {
            "total_replay_s": self.total_replay_s,
            "num_replays": self.params.num_replays,
            "num_ops": len(self.ops),
            "collectives": {},
        }
        for name, recs in per_coll.items():
            lats = [r.lat_us for r in recs]
            sizes = [r.size_bytes for r in recs]
            p50 = percentile(lats, 50)
            entry = {
                "count": len(recs),
                "total_bytes": sum(sizes),
                "p50_us": p50,
                "p95_us": percentile(lats, 95),
                "max_us": max(lats),
            }
            if self.params.blocking and sizes and p50:
                entry["alg_bw_gbs"] = alg_bw(int(percentile(sizes, 50)), p50)
                entry["bus_bw_gbs"] = entry["alg_bw_gbs"] * bus_bw_factor(
                    name, world
                )
            out["collectives"][name] = entry
        if self.params.output_path:
            self.write_details(self.params.output_path)
        return out

    def write_details(self, path: str) -> None:
        """Per-op replay dump (reference: writeCommDetails,
        commsTraceReplay.py:43-86)."""
        with open(path, "w") as f:
            json.dump(
                [
                    {
                        "id": r.op_id,
                        "comms": r.comms,
                        "size_bytes": r.size_bytes,
                        "lat_us": r.lat_us,
                        "marker": r.marker,
                    }
                    for r in self.records
                ],
                f,
                indent=2,
            )
