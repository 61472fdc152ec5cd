"""CLI for the collective-overlap benchmark.

Reference flag surface: ``commsOverlapBench.py`` (``--collective-pair``,
``--overlap-pair-pgs``).

Run:
    python -m param_tpu.cli.overlap --collective all_reduce \
        --collective-pair all_to_all --b 1M
    python -m param_tpu.cli.overlap --overlap-pair-pgs --collective all_reduce
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.overlap", description="PARAM-TPU overlap benchmark"
    )
    ap.add_argument("--collective", default="all_reduce")
    ap.add_argument("--collective-pair", default=None,
                    help="comma-separated pair collective list run "
                         "concurrently with --collective (defaults to "
                         "--collective; reference comm_fn_pair_list)")
    ap.add_argument("--overlap-pair-pgs", action="store_true",
                    help="run the collective concurrently in two half-world "
                         "process groups instead of pairing two collectives")
    ap.add_argument("--b", default="64K", help="begin size")
    ap.add_argument("--e", default="4M", help="end size")
    ap.add_argument("--f", type=int, default=4, help="size step factor")
    ap.add_argument("--data-type", default="float32")
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.comms.overlap_bench import OverlapBench
    from param_tpu.utils.sizes import parse_size, size_sweep

    bench = OverlapBench(dtype=ns.data_type)
    pair = [
        c.strip()
        for c in (ns.collective_pair or ns.collective).split(",")
        if c.strip()
    ]
    sizes = size_sweep(parse_size(ns.b), parse_size(ns.e), ns.f)
    for size in sizes:
        if ns.overlap_pair_pgs:
            res = bench.run_split_pgs(ns.collective, size, n_hi=ns.chain)
            bench.report(
                [ns.collective, ns.collective], size, res, "split-pgs"
            )
        else:
            res = bench.run_same_group(ns.collective, pair, size, n_hi=ns.chain)
            bench.report([ns.collective] + pair, size, res, "same-group")
    return 0


if __name__ == "__main__":
    sys.exit(main())
