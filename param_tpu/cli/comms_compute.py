"""CLI for the comms+compute overlap benchmark.

Reference flag surface: ``commsComputeBench.py`` (``--kernel``, ``--mm-dim``,
``--num-compute``, embedding kernel dims).

Run:
    python -m param_tpu.cli.comms_compute --collective all_reduce \
        --kernel gemm --mm-dim 1024 --b 1M
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.comms_compute",
        description="PARAM-TPU comms+compute overlap benchmark",
    )
    ap.add_argument("--collective", default="all_reduce")
    ap.add_argument("--kernel", default="gemm", choices=["gemm", "emb_lookup", "d2h", "h2d"])
    ap.add_argument("--mm-dim", type=int, default=1024)
    ap.add_argument("--num-compute", type=int, default=1,
                    help="compute kernels per iteration")
    ap.add_argument("--emb-rows", type=int, default=100_000)
    ap.add_argument("--emb-dim", type=int, default=128)
    ap.add_argument("--emb-batch", type=int, default=2048)
    ap.add_argument("--emb-nnz", type=int, default=30)
    ap.add_argument("--b", default="1M", help="collective message size")
    ap.add_argument("--e", default=None, help="end size (sweep if set)")
    ap.add_argument("--f", type=int, default=4)
    ap.add_argument("--data-type", default="float32")
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.comms.overlap_bench import CommsComputeBench
    from param_tpu.utils.sizes import parse_size, size_sweep

    bench = CommsComputeBench(dtype=ns.data_type)
    begin = parse_size(ns.b)
    sizes = (
        size_sweep(begin, parse_size(ns.e), ns.f) if ns.e else [begin]
    )
    for size in sizes:
        r = bench.run(
            collective=ns.collective,
            size_bytes=size,
            kernel=ns.kernel,
            mm_dim=ns.mm_dim,
            num_compute=ns.num_compute,
            emb_rows=ns.emb_rows,
            emb_dim=ns.emb_dim,
            emb_batch=ns.emb_batch,
            emb_nnz=ns.emb_nnz,
            n_hi=ns.chain,
        )
        bench.report(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
