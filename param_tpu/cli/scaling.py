"""What-if scaling estimator CLI.

Answers "what would this trace's (or collective's) communication cost at
world size N on a TPU slice" with the analytic ICI/DCN model in
``param_tpu.trace.scaling_model`` — the capability the reference delegates
to downstream simulators fed by its Chakra ETs (reference:
``et_replay/comm/`` analysis tooling + the README's simulator hand-off).

Run (trace what-if sweep):
    python -m param_tpu.cli.scaling --trace-path comms.json \
        --generation v5e --worlds 8 64 256

Run (single-collective planner):
    python -m param_tpu.cli.scaling --collective all_reduce --size 64M \
        --generation v5p --worlds 8 64 512 2048
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.scaling",
        description="analytic TPU-slice what-if estimator",
    )
    ap.add_argument("--trace-path", default=None)
    ap.add_argument(
        "--trace-type", default="basic",
        choices=["basic", "pytorch_et", "kineto"],
    )
    ap.add_argument("--target-rank", type=int, default=0)
    ap.add_argument("--collective", default=None,
                    help="single-collective mode (instead of a trace)")
    ap.add_argument("--size", default="64M",
                    help="per-rank payload for --collective mode")
    ap.add_argument("--generation", default="v5e",
                    choices=["v4", "v5e", "v5p", "v6e"])
    ap.add_argument("--worlds", type=int, nargs="+",
                    default=[8, 16, 64, 256])
    ap.add_argument("--bitwidth", type=int, default=32,
                    choices=[32, 16, 8])
    ap.add_argument("--ici-gbs", type=float, default=None,
                    help="override per-link one-direction ICI GB/s")
    ap.add_argument("--dcn-gbs-per-host", type=float, default=None)
    ap.add_argument("--hop-latency-us", type=float, default=None)
    ap.add_argument("--json", action="store_true")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    from param_tpu.trace.scaling_model import (
        format_report,
        predict_collective_us,
        predict_worlds,
        predicted_bus_bw,
        slice_topology,
    )

    topo_kw = dict(
        ici_gbs=ns.ici_gbs,
        dcn_gbs_per_host=ns.dcn_gbs_per_host,
        hop_latency_us=ns.hop_latency_us,
    )

    if ns.collective:
        from param_tpu.utils.sizes import parse_size

        size = parse_size(ns.size)
        rows = []
        for w in ns.worlds:
            topo = slice_topology(ns.generation, w, **topo_kw)
            t = predict_collective_us(ns.collective, size, topo, ns.bitwidth)
            rows.append(
                {
                    "world": w,
                    "torus": "x".join(map(str, topo.torus))
                    + (f"*{topo.n_pods}p" if topo.n_pods > 1 else ""),
                    "time_us": round(t, 2),
                    "bus_bw_gbs": round(
                        predicted_bus_bw(ns.collective, size, topo, ns.bitwidth), 2
                    ),
                }
            )
        if ns.json:
            print(json.dumps(rows, indent=2))
        else:
            print(f"# {ns.collective} size={ns.size} gen={ns.generation} "
                  f"bitwidth={ns.bitwidth}")
            print(f"{'world':>6} {'torus':>14} {'time us':>12} {'busBW GB/s':>12}")
            for r in rows:
                print(f"{r['world']:>6} {r['torus']:>14} "
                      f"{r['time_us']:>12.2f} {r['bus_bw_gbs']:>12.2f}")
        return 0

    if not ns.trace_path:
        print("error: provide --trace-path or --collective", file=sys.stderr)
        return 2

    from param_tpu.trace.comms_trace import parse_trace, read_trace_file

    raw = read_trace_file(ns.trace_path)
    ops = parse_trace(raw, ns.trace_type, target_rank=ns.target_rank)
    preds = predict_worlds(ops, ns.generation, ns.worlds,
                           bitwidth=ns.bitwidth, **topo_kw)
    if ns.json:
        print(json.dumps([p.row() for p in preds], indent=2))
    else:
        print(f"# trace={ns.trace_path} gen={ns.generation} "
              f"bitwidth={ns.bitwidth}")
        print(format_report(preds))
        # per-op breakdown at the first world
        p0 = preds[0]
        print(f"\n# per-op breakdown at world={p0.topo.n_chips}")
        for name, agg in sorted(p0.per_op.items()):
            print(f"  {name:<16} n={agg.count:<5} "
                  f"{agg.size_bytes/1e6:>10.2f} MB {agg.time_us/1e3:>10.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
