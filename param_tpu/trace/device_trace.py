"""Device-trace (chrome trace) post-analysis.

TPU-native counterpart of the reference's Kineto-trace analysis
(``et_replay/comm/profiler_trace_analysis.py`` reads Kineto JSON;
``tools/nsys_analysis.py`` reads nsys sqlite): ``jax.profiler`` writes a
chrome-trace JSON (``*.trace.json.gz``) alongside the xplane protobuf —
this module parses it into per-op device-time histograms, named-region
(TraceAnnotation) durations, and collective-op timings, from which busBW
can be computed with the shared correction-factor table.

Run:
    python -m param_tpu.cli.comms ... --profile /tmp/prof
    python -m param_tpu.trace.device_trace /tmp/prof --top 20
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

# substrings identifying collective HLO ops in device lanes
COLLECTIVE_MARKERS = (
    "all-reduce", "all-gather", "all-to-all", "reduce-scatter",
    "collective-permute", "ragged-all-to-all",
)


def find_trace_file(path: str) -> str:
    """Accept a profile dir (jax.profiler layout) or a direct trace file."""
    if os.path.isfile(path):
        return path
    cands = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
    )
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return cands[-1]


def load_chrome_trace(path: str) -> Tuple[List[dict], Dict[tuple, str]]:
    """→ (complete events, (pid, tid) → thread name)."""
    f = find_trace_file(path)
    opener = gzip.open if f.endswith(".gz") else open
    with opener(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    threads: Dict[tuple, str] = {}
    procs: Dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                procs[e.get("pid")] = e.get("args", {}).get("name", "")
            elif e.get("name") == "thread_name":
                threads[(e.get("pid"), e.get("tid"))] = e.get("args", {}).get(
                    "name", ""
                )
    # qualify thread names with their process
    qualified = {
        k: f"{procs.get(k[0], '')}/{v}" for k, v in threads.items()
    }
    xs = [e for e in events if e.get("ph") == "X" and "dur" in e]
    return xs, qualified


def op_durations(
    events: List[dict],
    threads: Dict[tuple, str],
    thread_filter: Optional[str] = None,
    include_python: bool = False,
) -> Dict[str, Dict]:
    """Aggregate per-op-name durations.

    ``thread_filter``: substring a thread's qualified name must contain
    (e.g. "TPU" for device lanes, "XLAEigen" for CPU compute threads).
    Python-frame events (names starting with '$') are dropped unless
    ``include_python``."""
    agg: Dict[str, Dict] = defaultdict(lambda: {"count": 0, "total_us": 0.0})
    for e in events:
        name = e.get("name", "")
        if not include_python and name.startswith("$"):
            continue
        tname = threads.get((e.get("pid"), e.get("tid")), "")
        if thread_filter and thread_filter not in tname:
            continue
        a = agg[name]
        a["count"] += 1
        a["total_us"] += float(e["dur"])
    return dict(agg)


def region_durations(events: List[dict], names: List[str]) -> Dict[str, Dict]:
    """Durations of named TraceAnnotation regions
    (the record_function/nvtx range analogue)."""
    out: Dict[str, Dict] = {}
    for name in names:
        durs = [float(e["dur"]) for e in events if e.get("name") == name]
        if durs:
            out[name] = {
                "count": len(durs),
                "total_us": sum(durs),
                "mean_us": sum(durs) / len(durs),
            }
    return out


def collective_durations(
    events: List[dict], threads: Dict[tuple, str]
) -> Dict[str, Dict]:
    """Per-collective device-time aggregation (matched by HLO op name)."""
    agg: Dict[str, Dict] = defaultdict(lambda: {"count": 0, "total_us": 0.0})
    for e in events:
        name = e.get("name", "")
        low = name.lower()
        for marker in COLLECTIVE_MARKERS:
            if marker in low:
                a = agg[marker]
                a["count"] += 1
                a["total_us"] += float(e["dur"])
                break
    return dict(agg)


def collective_bus_bw(
    coll_durs: Dict[str, Dict], size_bytes: int, world: int
) -> Dict[str, float]:
    """busBW per collective given the per-op payload (reference:
    profiler_trace_analysis busBW computation, :228-563)."""
    from param_tpu.utils.bw import alg_bw, bus_bw_factor

    name_map = {
        "all-reduce": "all_reduce", "all-gather": "all_gather",
        "all-to-all": "all_to_all", "reduce-scatter": "reduce_scatter",
        "collective-permute": "pt2pt", "ragged-all-to-all": "all_to_allv",
    }
    out = {}
    for marker, d in coll_durs.items():
        if not d["count"]:
            continue
        per_us = d["total_us"] / d["count"]
        cname = name_map.get(marker, marker)
        out[marker] = alg_bw(size_bytes, per_us) * bus_bw_factor(cname, world)
    return out


def quant_comm_split(
    events: List[dict], threads: Dict[tuple, str],
    thread_filter: Optional[str] = None,
) -> Dict[str, Dict]:
    """Comm-vs-quantization device-time split for quantized collectives
    (reference: quant_us/dequant_us in commsQuantCollPerfMetrics,
    logger_utils.py:40-55 — there measured with dedicated CUDA events;
    here recovered from the profiler trace).

    ``quantization.quantize``/``dequantize`` run under
    ``jax.named_scope`` so their HLO ops carry "quantize"/"dequantize" in
    the op name/scope.  Buckets: comm (collective HLOs), quant, dequant,
    other (everything else on the filtered lanes)."""
    out = {k: {"count": 0, "total_us": 0.0}
           for k in ("comm", "quant", "dequant", "other")}
    for e in events:
        name = e.get("name", "")
        if name.startswith("$"):
            continue
        tname = threads.get((e.get("pid"), e.get("tid")), "")
        if thread_filter and thread_filter not in tname:
            continue
        low = name.lower()
        args = e.get("args", {})
        # TPU traces carry the jax.named_scope path in args.tf_op
        # (e.g. "jit(body)/quantize/convert:"); long_name as fallback
        scope = (str(args.get("tf_op", "")) + str(args.get("long_name", ""))
                 + low).lower()
        if any(m in low for m in COLLECTIVE_MARKERS):
            bucket = "comm"
        elif "dequantize" in scope:
            bucket = "dequant"
        elif "quantize" in scope:
            bucket = "quant"
        else:
            bucket = "other"
        out[bucket]["count"] += 1
        out[bucket]["total_us"] += float(e.get("dur", 0))
    return out


def print_top_ops(agg: Dict[str, Dict], top: int = 20) -> None:
    rows = sorted(agg.items(), key=lambda kv: -kv[1]["total_us"])[:top]
    print(f"{'op':<60}{'count':>8}{'total(us)':>14}{'mean(us)':>12}")
    for name, d in rows:
        mean = d["total_us"] / max(1, d["count"])
        print(f"{name[:58]:<60}{d['count']:>8}{d['total_us']:>14.1f}{mean:>12.1f}")


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(prog="param_tpu.device_trace")
    ap.add_argument("path", help="profile dir or trace.json(.gz)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--thread-filter", default=None,
                    help="only threads whose name contains this (e.g. TPU)")
    ap.add_argument("--python", action="store_true",
                    help="include python-frame events")
    ns = ap.parse_args(argv)
    events, threads = load_chrome_trace(ns.path)
    print(f"{len(events)} events, {len(threads)} threads")
    print_top_ops(
        op_durations(events, threads, ns.thread_filter, ns.python), ns.top
    )
    colls = collective_durations(events, threads)
    if colls:
        print("\ncollectives:")
        for name, d in sorted(colls.items()):
            print(f"  {name}: n={d['count']} total={d['total_us']:.1f}us")
    return 0


if __name__ == "__main__":
    sys.exit(main())
