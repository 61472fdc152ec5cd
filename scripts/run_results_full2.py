"""Remaining extended sweeps (fixed gemm arg passing)."""
import datetime
import io
import sys
from contextlib import redirect_stdout


def main():
    out_path = "RESULTS_FULL2.md"
    from param_tpu.ops.compute_bench import (
        bench_emb, bench_gemm, bench_mlp, print_results,
    )
    from param_tpu.ops.inference import bench_inference
    from param_tpu.ops import datasets
    from param_tpu.utils.chip import detect_chip

    chip = detect_chip()
    sections = []

    def capture(title, fn):
        print(f"== {title}", flush=True)
        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                fn()
        except Exception as e:  # noqa: BLE001
            buf.write(f"\nFAILED: {str(e)[:300]}\n")
        sections.append((title, buf.getvalue()))
        print(buf.getvalue(), flush=True)
        with open(out_path, "w") as f:
            f.write(f"# Extended measured results (2) — {chip.name}\n")
            f.write(f"Date: {datetime.datetime.now().isoformat(timespec='minutes')}\n\n")
            for t, body in sections:
                f.write(f"## {t}\n\n```\n{body.strip()}\n```\n\n")

    capture("GEMM bf16 gemm_B (40928-dim DLRM shapes)", lambda: print_results(
        bench_gemm(datasets.GEMM_B[:8], dtype="bfloat16", n_hi=16, reps=2),
        "bfloat16"))
    capture("GEMM f32 highest-precision gemm_C", lambda: print_results(
        bench_gemm(datasets.GEMM_C, dtype="float32", n_hi=16, reps=2,
                   precision="highest"), "float32"))
    capture("MLP train bf16 full mlp_A", lambda: print_results(
        bench_mlp(datasets.MLP_A, dtype="bfloat16", n_hi=16, reps=2),
        "bfloat16"))
    capture("MLP inference int8 mlp_A 1024-wide", lambda: print_results(
        bench_inference(datasets.MLP_A[:6], dtype="int8", n_hi=16, reps=2),
        "int8"))
    capture("EmbeddingBag emb_B (56-dim, lane-padded)", lambda: print_results(
        bench_emb(datasets.EMB_B[:3], n_hi=8, reps=2), "float32"))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
