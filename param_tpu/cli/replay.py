"""CLI for comm-trace replay.

Reference flag surface: ``commsTraceReplay.py`` main (1411-1480).

Run:
    python -m param_tpu.cli.replay --trace-path comms.json --blocking
    python -m param_tpu.cli.replay --trace-path comms.json --dry-run
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.replay", description="PARAM-TPU comm trace replay"
    )
    ap.add_argument("--trace-path", required=True)
    ap.add_argument(
        "--trace-type", default="basic",
        choices=["basic", "pytorch_et", "kineto", "et"],
        help="basic JSON | PyTorch/Chakra host ET | Kineto unitrace with "
             "comms metadata | param_tpu's own jaxpr ET",
    )
    ap.add_argument("--target-rank", type=int, default=0,
                    help="rank whose comm stream to extract from per-rank "
                         "pytorch_et/kineto traces")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--num-replays", "--r", type=int, default=1)
    ap.add_argument("--num-warmup-replays", type=int, default=1)
    ap.add_argument("--no-warm-up", action="store_true")
    ap.add_argument("--blocking", "--z", action="store_true")
    ap.add_argument("--auto-shrink", action="store_true")
    ap.add_argument("--rebalance-policy", default=None, choices=[None, "equal"])
    ap.add_argument("--use-timestamp", action="store_true")
    ap.add_argument("--output-path", default=None)
    ap.add_argument("--analyze", action="store_true",
                    help="print the post-hoc busBW analysis after replay")
    ap.add_argument("--backend", default="tpu")
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.backend.base import get_backend_cls
    from param_tpu.trace.replay import CommsReplay, ReplayParams

    backend = get_backend_cls(ns.backend)()
    backend.initialize()
    params = ReplayParams(
        trace_path=ns.trace_path,
        trace_type=ns.trace_type,
        target_rank=ns.target_rank,
        dry_run=ns.dry_run,
        num_replays=ns.num_replays,
        num_warmup_replays=ns.num_warmup_replays,
        do_warmup=not ns.no_warm_up,
        blocking=ns.blocking,
        auto_shrink=ns.auto_shrink,
        rebalance_policy=ns.rebalance_policy,
        use_timestamp=ns.use_timestamp,
        output_path=ns.output_path,
    )
    replay = CommsReplay(backend, params)
    result = replay.run()
    print(json.dumps(result, indent=2, default=str))
    if ns.analyze and replay.records:
        from param_tpu.trace.profiler_analysis import analyze_records, print_summary

        print_summary(
            analyze_records(
                [
                    {"comms": r.comms, "size_bytes": r.size_bytes,
                     "lat_us": r.lat_us}
                    for r in replay.records
                ],
                backend.get_world_size(),
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
