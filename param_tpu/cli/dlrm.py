"""CLI for the DLRM communication-pattern benchmark.

Flag surface mirrors the reference's ``dlrm.py`` main (``train/comms/pt/
dlrm.py:1431``): table geometry, MLP dims, batch, and ``--print-comms``.

Run:
    python -m param_tpu.cli.dlrm --num-tables 8 --rows 100000 --batch 2048
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.dlrm", description="PARAM-TPU DLRM comm-pattern benchmark"
    )
    ap.add_argument("--num-tables", type=int, default=8)
    ap.add_argument("--rows", type=int, default=100_000, help="rows per table")
    ap.add_argument("--emb-dim", type=int, default=64)
    ap.add_argument("--nnz", type=int, default=10, help="lookups per sample per table")
    ap.add_argument("--dense-dim", type=int, default=64)
    ap.add_argument("--arch-mlp-bot", default="512-256-64")
    ap.add_argument("--arch-mlp-top", default="512-256-1")
    ap.add_argument("--mini-batch-size", "--batch", type=int, default=2048)
    ap.add_argument("--optimizer", default="adagrad", choices=["sgd", "adagrad"])
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=8, help="ops per timing chain")
    ap.add_argument("--print-comms", default=None, metavar="PATH",
                    help="dump the per-step comm pattern as a basic-schema "
                         "JSON trace to PATH and exit")
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())

    import jax
    import numpy as np
    from jax.sharding import Mesh

    from param_tpu.models.dlrm import DlrmConfig, DlrmModel
    from param_tpu.models.dlrm_bench import DlrmCommBench
    from param_tpu.ops.mlp import make_optimizer

    bot = [int(x) for x in ns.arch_mlp_bot.split("-")]
    top = [int(x) for x in ns.arch_mlp_top.split("-")]
    cfg = DlrmConfig(
        num_tables=ns.num_tables,
        rows_per_table=ns.rows,
        emb_dim=ns.emb_dim,
        nnz=ns.nnz,
        dense_dim=ns.dense_dim,
        bot_mlp=bot,
        top_mlp=top,
        batch=ns.mini_batch_size,
    )
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("x",))
    model = DlrmModel(cfg, mesh)
    bench = DlrmCommBench(model, make_optimizer(ns.optimizer, ns.lr))

    if ns.print_comms:
        bench.dump_comms(ns.print_comms)
        print(f"wrote comm pattern to {ns.print_comms}")
        return 0

    results = bench.run(reps=ns.reps, n_hi=ns.chain)
    bench.report(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
