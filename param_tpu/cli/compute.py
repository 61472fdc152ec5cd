"""Compute benchmark driver CLI — subcommands gemm | emb | linear.

Reference: ``train/compute/pt/driver.py:12-113`` (subcommand CLI over the
gemm/emb/linear benches and their fixed datasets).

Run:
    python -m param_tpu.cli.compute gemm --dataset A --dtype bfloat16
    python -m param_tpu.cli.compute emb --dataset baseline
    python -m param_tpu.cli.compute linear --dataset A --optimizer adagrad
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.compute", description="PARAM-TPU compute benchmarks"
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gemm", help="matmul sweep")
    g.add_argument("--dataset", default="A", choices=["A", "B", "C"])
    g.add_argument("--shape", default=None,
                   help="explicit M,N,K (overrides --dataset)")
    g.add_argument("--dtype", default="float32")
    g.add_argument("--pallas", action="store_true", help="use the Pallas kernel")
    g.add_argument("--weight-resident", type=int, default=0, metavar="S",
                   help="time S GEMMs sharing one VMEM-resident weight and "
                        "report per-GEMM numbers (the reference's warm-L2 "
                        "torch.mm loop contract; see RESULTS.md small-M "
                        "study)")
    g.add_argument("--compare", action="store_true",
                   help="run BOTH the XLA and Pallas GEMM per shape, printed "
                        "side by side (reference: cuBlas-vs-cuTlass table, "
                        "pytorch_cutlass.py:81-101)")
    g.add_argument("--precision", default="default", choices=["default", "highest"],
                   help="'highest' forces true-f32 multiplication passes")
    g.add_argument("--chain", type=int, default=16)
    g.add_argument("--reps", type=int, default=2)

    e = sub.add_parser("emb", help="EmbeddingBag sweep")
    e.add_argument("--dataset", default="baseline", choices=["A", "B", "baseline"])
    e.add_argument("--shape", default=None,
                   help="explicit rows,dim,nnz,batch (overrides --dataset)")
    e.add_argument("--dtype", default="float32")
    e.add_argument("--distribution", default="uniform", choices=["uniform", "zipf"])
    e.add_argument("--max-rows", type=int, default=0,
                   help="clamp table rows (HBM limit)")
    e.add_argument("--chain", type=int, default=8)
    e.add_argument("--reps", type=int, default=2)

    l = sub.add_parser("linear", help="MLP train/inference bench")
    l.add_argument("--dataset", default="A", choices=["A"])
    l.add_argument("--shape", default=None,
                   help="explicit layers,din,hidden,dout,batch")
    l.add_argument("--dtype", default="float32")
    l.add_argument("--optimizer", default="sgd", choices=["sgd", "adagrad"])
    l.add_argument("--fwd-only", action="store_true", help="inference mode")
    l.add_argument("--chain", type=int, default=8)
    l.add_argument("--reps", type=int, default=2)

    a = sub.add_parser("attention", help="fused-attention bench (flash "
                       "kernel vs unfused XLA; beyond-reference tier)")
    a.add_argument("--dataset", default="gpt2", choices=["gpt2", "llama2"])
    a.add_argument("--shape", default=None,
                   help="explicit batch,heads,seq,headdim (overrides "
                        "--dataset)")
    a.add_argument("--dtype", default="bfloat16")
    a.add_argument("--paths", default="xla,flash",
                   help="comma list of xla|flash|jax-flash|dpa")
    a.add_argument("--no-causal", action="store_true",
                   help="bidirectional attention (default causal)")
    a.add_argument("--block-q", type=int, default=1024)
    a.add_argument("--block-k", type=int, default=1024)
    a.add_argument("--grad", action="store_true",
                   help="time forward+backward via jax.grad (flash path "
                        "uses flash_mha: Pallas kernels both directions)")
    a.add_argument("--chain", type=int, default=16)
    a.add_argument("--reps", type=int, default=2)

    dec = sub.add_parser("decode", help="serving decode step: one query "
                         "token vs a (B,H,S,D) KV cache; GB/s of KV "
                         "traffic vs the HBM roofline")
    dec.add_argument("--dataset", default="llama2",
                     choices=["llama2", "gpt2", "llama3-gqa"])
    dec.add_argument("--shape", default=None,
                     help="explicit batch,heads,kvlen,headdim (or "
                          "batch,heads,kvheads,kvlen,headdim for GQA)")
    dec.add_argument("--dtype", default="bfloat16")
    dec.add_argument("--chain", type=int, default=16)
    dec.add_argument("--reps", type=int, default=2)

    srv = sub.add_parser("serve", help="whole-block decode step (cached "
                         "attention + MLP at T=1): serving tokens/s vs "
                         "the weight+KV streaming roofline")
    srv.add_argument("--dataset", default="llama2",
                     choices=["llama2", "gpt2", "llama3-gqa"])
    srv.add_argument("--shape", default=None,
                     help="explicit batch,cachelen,emb,heads,ffn (or "
                          "batch,cachelen,emb,heads,kvheads,ffn for GQA)")
    srv.add_argument("--dtype", default="bfloat16",
                     help="bfloat16/float32, or weight-only quantized "
                          "serving: int8 (per-column scales) / int4 "
                          "(group-128, XLA-native s4 weights)")
    srv.add_argument("--chain", type=int, default=16)
    srv.add_argument("--reps", type=int, default=2)

    t = sub.add_parser("transformer", help="pre-LN transformer-block "
                       "train-step bench (flash_mha vs unfused XLA "
                       "attention; GPT2/llama2 dims)")
    t.add_argument("--dataset", default="all",
                   choices=["gpt2", "gpt2-medium", "llama2", "all"])
    t.add_argument("--shape", default=None,
                   help="explicit batch,seq,emb,heads,ffn (overrides "
                        "--dataset)")
    t.add_argument("--dtype", default="bfloat16")
    t.add_argument("--paths", default="flash,xla",
                   help="comma list of flash|xla attention paths")
    t.add_argument("--no-causal", action="store_true")
    t.add_argument("--fwd-only", action="store_true",
                   help="forward only (no grad/update)")
    t.add_argument("--chain", type=int, default=8)
    t.add_argument("--reps", type=int, default=2)

    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace into DIR")
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(level=ns.log.upper())
    from param_tpu.utils.profiler import profile_to
    from param_tpu.ops import datasets
    from param_tpu.ops.compute_bench import (
        bench_emb,
        bench_gemm,
        bench_mlp,
        print_results,
    )

    prof = profile_to(ns.profile)
    prof.__enter__()
    if ns.cmd == "gemm":
        shapes = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.GEMM_DATASETS[ns.dataset]
        )
        if ns.compare:
            # XLA row then Pallas row per shape — the reference's
            # blas/tlass comparison table (pytorch_cutlass.py:81-101)
            print("-" * 64)
            print(f"{'M':>10} {'N':>10} {'K':>10} {'path':>8} "
                  f"{'Time(us)':>12} {'Rate(TF/s)':>12}")
            print("-" * 64)
            results = []
            for shape in shapes:
                for use_pallas, label in ((False, "xla"), (True, "pallas")):
                    r = bench_gemm([shape], dtype=ns.dtype, n_hi=ns.chain,
                                   reps=ns.reps, use_pallas=use_pallas,
                                   precision=ns.precision)[0]
                    m, n, k = shape
                    print(f"{m:>10} {n:>10} {k:>10} {label:>8} "
                          f"{r.lat_us:>12.1f} {r.tflops:>12.3f}")
                    results.append(r)
            prof.__exit__(None, None, None)
            return 0
        results = bench_gemm(
            shapes, dtype=ns.dtype, n_hi=ns.chain, reps=ns.reps,
            use_pallas=ns.pallas, precision=ns.precision,
            weight_resident=ns.weight_resident,
        )
    elif ns.cmd == "emb":
        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.EMB_DATASETS[ns.dataset]
        )
        results = bench_emb(
            configs, dtype=ns.dtype, n_hi=ns.chain, reps=ns.reps,
            distribution=ns.distribution, max_rows=ns.max_rows or None,
        )
    elif ns.cmd == "decode":
        from param_tpu.ops.compute_bench import bench_decode_attention

        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.DECODE_DATASETS[ns.dataset]
        )
        results = bench_decode_attention(
            configs, dtype=ns.dtype, n_hi=ns.chain, reps=ns.reps,
        )
    elif ns.cmd == "serve":
        from param_tpu.ops.compute_bench import bench_block_decode

        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.SERVE_DATASETS[ns.dataset]
        )
        results = bench_block_decode(
            configs, dtype=ns.dtype, n_hi=ns.chain, reps=ns.reps,
        )
    elif ns.cmd == "transformer":
        from param_tpu.ops.compute_bench import bench_transformer

        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.TRANSFORMER_DATASETS[ns.dataset]
        )
        results = bench_transformer(
            configs, dtype=ns.dtype, causal=not ns.no_causal,
            paths=[p.strip() for p in ns.paths.split(",") if p.strip()],
            n_hi=ns.chain, reps=ns.reps, grad=not ns.fwd_only,
        )
    elif ns.cmd == "attention":
        from param_tpu.ops.compute_bench import bench_attention

        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.ATTN_DATASETS[ns.dataset]
        )
        results = bench_attention(
            configs, dtype=ns.dtype, causal=not ns.no_causal,
            paths=[p.strip() for p in ns.paths.split(",") if p.strip()],
            n_hi=ns.chain, reps=ns.reps,
            block_q=ns.block_q, block_k=ns.block_k, grad=ns.grad,
        )
    else:
        configs = (
            [tuple(int(x) for x in ns.shape.split(","))]
            if ns.shape
            else datasets.MLP_DATASETS[ns.dataset]
        )
        results = bench_mlp(
            configs, dtype=ns.dtype, optimizer=ns.optimizer,
            fwd_only=ns.fwd_only, n_hi=ns.chain, reps=ns.reps,
        )
    prof.__exit__(None, None, None)
    print_results(results, ns.dtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
