"""Execution-trace CLI: capture built-in workloads, validate, replay.

Reference surface: ``et_replay/tools/et_replay.py`` main (capture comes from
PyTorch's ExecutionTraceObserver there; here capture traces the jitted
workload directly).

Run:
    python -m param_tpu.cli.et capture --workload dlrm -o dlrm_et.json.gz
    python -m param_tpu.cli.et validate dlrm_et.json.gz
    python -m param_tpu.cli.et replay dlrm_et.json.gz --mode comp --iters 3
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="param_tpu.et",
                                 description="PARAM-TPU execution-trace tool")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("capture", help="capture a built-in workload's ET")
    c.add_argument("--workload", default="dlrm", choices=["dlrm", "mlp", "dlrm_train"])
    c.add_argument("-o", "--output", required=True)
    c.add_argument("--iterations", type=int, default=1)

    v = sub.add_parser("validate", help="validate an ET file")
    v.add_argument("path")

    r = sub.add_parser("replay", help="replay an ET op-by-op")
    r.add_argument("path")
    r.add_argument("--mode", default="full", choices=["full", "comp", "comm"])
    r.add_argument("--alloc", default="pre", choices=["pre", "lazy"])
    r.add_argument("--iters", type=int, default=1)
    r.add_argument("--warmup", type=int, default=1)
    r.add_argument("--config", default=None, help="skip-node replay config JSON")
    r.add_argument("--inputs", default=None,
                   help=".npz with tensor-id -> array input overrides")
    r.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the replay into "
                        "DIR (the reference's kineto-profiled replay, "
                        "et_replay.py:1528-1620)")
    r.add_argument("--per-op", action="store_true",
                   help="record blocking per-op latencies on the last "
                        "iteration")
    r.add_argument("--update-config", default=None,
                   help="write the auto-updated skip config here")

    g = sub.add_parser("codegen", help="generate a standalone replay script "
                                       "(reference -g mode)")
    g.add_argument("path")
    g.add_argument("-o", "--output", required=True)

    ap.add_argument("--log", default="INFO")
    return ap


def _workload(name: str):
    import jax
    import jax.numpy as jnp

    from param_tpu.models.dlrm import DlrmConfig, DlrmModel, init_dlrm_params
    from param_tpu.models.dlrm_data import RandomDataset

    if name in ("dlrm", "dlrm_train"):
        cfg = DlrmConfig(
            num_tables=4, rows_per_table=1000, emb_dim=16, nnz=4,
            dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=64,
        )
        model = DlrmModel(cfg)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=64, dense_dim=16, num_tables=4, nnz=4,
                           num_rows=1000, num_batches=1)
        dense, idx, labels = next(iter(ds))
        if name == "dlrm":
            return (lambda p, d, i: model.forward(p, d, i)), (
                params, jnp.asarray(dense), jnp.asarray(idx)
            )
        import optax

        opt = optax.sgd(0.01)
        st = opt.init(params)

        def train(p, st, d, i, l):
            loss, grads = jax.value_and_grad(model.loss_fn)(p, d, i, l)
            updates, st = opt.update(grads, st, p)
            return optax.apply_updates(p, updates), st, loss

        return train, (params, st, jnp.asarray(dense), jnp.asarray(idx),
                       jnp.asarray(labels))
    if name == "mlp":
        from param_tpu.ops.mlp import init_mlp, mlp_forward

        p = init_mlp(jax.random.PRNGKey(0), [64, 128, 64])
        return mlp_forward, (p, jnp.ones((32, 64)))
    raise ValueError(name)


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.trace.capture import capture_execution_trace
    from param_tpu.trace.et_replay import (
        AllocationMode,
        EtReplayManager,
        ReplayConfig,
        ReplayMode,
    )
    from param_tpu.trace.execution_trace import ExecutionTrace, TraceValidator

    if ns.cmd == "capture":
        fn, args = _workload(ns.workload)
        et = capture_execution_trace(fn, *args, iterations=ns.iterations)
        et.save(ns.output)
        print(f"captured {len(et.get_nodes(clean=True))} ops "
              f"({len(et.tensors)} tensors, {et.iterations()} iterations) "
              f"-> {ns.output}")
        return 0
    if ns.cmd == "codegen":
        from param_tpu.trace.et_replay import generate_code

        et = ExecutionTrace.load(ns.path)
        code = generate_code(et)
        with open(ns.output, "w") as f:
            f.write(code)
        print(f"wrote replay script ({len(code.splitlines())} lines) -> {ns.output}")
        return 0
    if ns.cmd == "validate":
        et = ExecutionTrace.load(ns.path)
        v = TraceValidator(et)
        errors = v.validate()
        print(f"ops={v.num_ops()} comm_ops={v.num_comm_ops()} "
              f"errors={len(errors)}")
        for e in errors[:20]:
            print(" ", e)
        return 1 if errors else 0
    # replay
    et = ExecutionTrace.load(ns.path)
    config = ReplayConfig.load(ns.config) if ns.config else None
    mgr = EtReplayManager(
        et,
        mode=ReplayMode(ns.mode),
        alloc=AllocationMode(ns.alloc),
        config=config,
        inputs_file=ns.inputs,
    )
    from param_tpu.utils.profiler import profile_to

    with profile_to(ns.profile):
        out = mgr.replay(iters=ns.iters, warmup=ns.warmup, per_op=ns.per_op)
    print(json.dumps(out, indent=2))
    if ns.update_config:
        mgr.config.save(ns.update_config)
        print(f"wrote skip config -> {ns.update_config}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
