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
    ap.add_argument("--optimizer", default="adagrad",
                    choices=["sgd", "adagrad", "sparse_sgd", "sparse_adagrad"],
                    help="sparse_* update only the gathered table rows "
                         "(the fbgemm exact-path analogue)")
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--packed-tables", action="store_true",
                    help="store tables lane-packed (E/pack, 128): free flat "
                         "view for the sparse-update kernel, no relayout "
                         "copies (needs 128 %% emb_dim == 0)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--regions", default=None,
                    help="comma-separated subset of timer regions to run "
                         "(default: all)")
    ap.add_argument("--chain", type=int, default=8, help="ops per timing chain")
    ap.add_argument("--max-chain", type=int, default=1024,
                    help="cap on adaptive chain growth (each chain length "
                         "compiles a fresh program)")
    ap.add_argument("--print-comms", default=None, metavar="PATH",
                    help="dump the per-step comm pattern as a basic-schema "
                         "JSON trace to PATH and exit")
    ap.add_argument("--train-batches", type=int, default=0,
                    help="run an end-to-end training loop for N batches on "
                         "synthetic data and report loss curve + held-out "
                         "AUC (the e2e DLRM the reference delegates to "
                         "facebookresearch/dlrm)")
    ap.add_argument("--data", default="synthetic", choices=["synthetic", "random"])
    ap.add_argument("--data-distribution", default="uniform",
                    choices=["uniform", "zipf"])
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a device trace during the bench and print "
                         "the per-op device-time histogram")
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
    model = DlrmModel(cfg, mesh, packed_tables=ns.packed_tables)
    opt = (ns.optimizer if ns.optimizer.startswith("sparse")
           else make_optimizer(ns.optimizer, ns.lr))
    bench = DlrmCommBench(model, opt, lr=ns.lr)

    if ns.print_comms:
        bench.dump_comms(ns.print_comms)
        print(f"wrote comm pattern to {ns.print_comms}")
        return 0

    if ns.train_batches:
        return train_e2e(model, cfg, ns)

    from param_tpu.utils.profiler import profile_to

    regions = ns.regions.split(",") if ns.regions else None
    with profile_to(ns.profile):
        results = bench.run(reps=ns.reps, n_hi=ns.chain, regions=regions,
                            max_n=ns.max_chain)
    bench.report(results)
    if ns.profile:
        from param_tpu.trace.device_trace import (
            load_chrome_trace,
            op_durations,
            print_top_ops,
        )

        events, threads = load_chrome_trace(ns.profile)
        agg = op_durations(events, threads, thread_filter="TPU") or \
            op_durations(events, threads)
        print("\ndevice-op histogram:")
        print_top_ops(agg, top=15)
    return 0


def train_e2e(model, cfg, ns) -> int:
    """End-to-end hybrid-parallel training with loss curve and AUC."""
    import time

    import jax
    import numpy as np

    from param_tpu.models.dlrm_data import data_loader
    from param_tpu.ops.mlp import make_optimizer

    ds = data_loader(
        ns.data,
        batch=cfg.batch, dense_dim=cfg.dense_dim, num_tables=cfg.num_tables,
        nnz=cfg.nnz, num_rows=cfg.rows_per_table,
        num_batches=ns.train_batches + 1, distribution=ns.data_distribution,
    )
    batches = list(ds)
    params = model.init_params(jax.random.PRNGKey(0))
    params, _ = model.place(params, batches[0])
    if ns.optimizer == "sparse_sgd":
        sparse_step = model.make_sparse_sgd_step(ns.lr)
        st = None
    elif ns.optimizer == "sparse_adagrad":
        sparse_step = model.make_sparse_adagrad_step(ns.lr)
        st = model.init_adagrad_state(params)
    else:
        opt = make_optimizer(ns.optimizer, ns.lr)
        step = model.make_train_step(opt)
        st = opt.init(params)
    t0 = time.perf_counter()
    for i, (dense, idx, labels) in enumerate(batches[:-1]):
        # only the batch moves host->device per step — params live on
        # device across the loop (a full-params D2H round trip per batch
        # costs minutes at production table sizes; code review r2)
        b = model.place_batch((dense, idx, labels))
        if ns.optimizer == "sparse_sgd":
            params, loss = sparse_step(params, *b)
        elif ns.optimizer == "sparse_adagrad":
            params, st, loss = sparse_step(params, st, *b)
        else:
            params, st, loss = step(params, st, *b)
        if i % max(1, ns.train_batches // 10) == 0:
            print(f"batch {i:5d}  loss {float(loss):.5f}")
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0
    # held-out AUC
    from param_tpu.models.dlrm import DlrmModel

    dense, idx, labels = batches[-1]
    host_params = jax.tree.map(np.asarray, params)
    logits = np.asarray(
        DlrmModel(cfg, packed_tables=model.packed).forward(
            host_params, np.asarray(dense), np.asarray(idx))
    )
    order = np.argsort(logits)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(len(logits))
    pos = labels > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    auc = (
        (ranks[pos].sum() - n_pos * (n_pos - 1) / 2) / (n_pos * n_neg)
        if n_pos and n_neg else 0.5
    )
    qps = ns.train_batches * cfg.batch / dt
    print(f"DLRM-E2E batches={ns.train_batches} wall={dt:.1f}s "
          f"QPS={qps:.0f} held-out AUC={auc:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
