"""Post-hoc trace analysis CLI.

Reference: ``et_replay/comm/profiler_trace_analysis.py`` CLI (per-rank
Kineto trace files → cross-rank busBW summary); here the inputs are the
per-rank replay details files written by ``cli.replay --output-path``.

Run:
    python -m param_tpu.cli.analyze details_rank0.json [details_rank1.json ...] \
        --world-size 8
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="param_tpu.analyze")
    ap.add_argument("paths", nargs="+", help="per-rank replay details JSON files")
    ap.add_argument("--world-size", type=int, required=True)
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    ns = ap.parse_args(argv)

    from param_tpu.trace.profiler_analysis import (
        analyze_files,
        analyze_records,
        print_summary,
    )

    if len(ns.paths) == 1:
        with open(ns.paths[0]) as f:
            result = analyze_records(json.load(f), ns.world_size)
        if ns.json:
            print(json.dumps(result, indent=2))
        else:
            print_summary(result)
    else:
        result = analyze_files(ns.paths, ns.world_size)
        print(json.dumps(result["cross_rank"], indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
