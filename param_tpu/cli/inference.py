"""Inference benchmark CLI.

Reference: ``inference/compute/pt/pytorch_linear.py`` main (MLP inference
QPS/latency with fp16/int8 paths).

Run:
    python -m param_tpu.cli.inference --shape 18,1024,1024,1024,512 --dtype int8
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.inference", description="PARAM-TPU MLP inference bench"
    )
    ap.add_argument("--dataset", default="A", choices=["A"])
    ap.add_argument("--shape", default=None,
                    help="explicit layers,din,hidden,dout,batch")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "float16", "int8",
                             "int4"])
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.ops import datasets
    from param_tpu.ops.compute_bench import print_results
    from param_tpu.ops.inference import bench_inference

    configs = (
        [tuple(int(x) for x in ns.shape.split(","))]
        if ns.shape
        else datasets.MLP_DATASETS[ns.dataset]
    )
    results = bench_inference(configs, dtype=ns.dtype, n_hi=ns.chain, reps=ns.reps)
    print_results(results, ns.dtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
