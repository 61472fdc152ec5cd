"""Produce RESULTS.md: measured sweeps on the attached TPU.

Run:  PYTHONPATH=. python scripts/run_results.py [out.md]
Takes ~20-40 min (one compile per shape).
"""

import datetime
import io
import sys
from contextlib import redirect_stdout


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RESULTS.md"
    import jax

    from param_tpu.ops.compute_bench import (
        bench_emb, bench_gemm, bench_mlp, print_results,
    )
    from param_tpu.ops.inference import bench_inference
    from param_tpu.ops import datasets
    from param_tpu.utils.chip import detect_chip

    chip = detect_chip()
    dev = jax.devices()[0]
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

    gemm_shapes = datasets.GEMM_C + datasets.GEMM_A[:4]
    capture("GEMM bf16 (gemm_C + gemm_A head)", lambda: print_results(
        bench_gemm(gemm_shapes, dtype="bfloat16", n_hi=16, reps=2), "bfloat16"))
    capture("GEMM f32 (gemm_C)", lambda: print_results(
        bench_gemm(datasets.GEMM_C, dtype="float32", n_hi=16, reps=2), "float32"))
    emb_shapes = datasets.EMB_BASELINE + [(14_000_000, 128, 30, 8192),
                                          (4_800_000, 56, 34, 8192)]
    capture("EmbeddingBag f32", lambda: print_results(
        bench_emb(emb_shapes, n_hi=8, reps=2), "float32"))
    capture("EmbeddingBag f32 zipf", lambda: print_results(
        bench_emb(datasets.EMB_BASELINE, n_hi=8, reps=2,
                  distribution="zipf"), "float32"))
    mlp_shapes = [datasets.MLP_A[0], datasets.MLP_A[4], datasets.MLP_A[6]]
    capture("MLP train bf16 (mlp_A subset)", lambda: print_results(
        bench_mlp(mlp_shapes, dtype="bfloat16", n_hi=16, reps=2), "bfloat16"))
    capture("MLP inference int8", lambda: print_results(
        bench_inference([datasets.MLP_A[0], datasets.MLP_A[4]], dtype="int8",
                        n_hi=16, reps=2), "int8"))

    with open(out_path, "w") as f:
        f.write("# Measured results\n\n")
        f.write(f"Chip: {dev.device_kind} (spec table: {chip.name}, "
                f"bf16 peak {chip.bf16_tflops} TF/s, HBM {chip.hbm_gbs} GB/s)\n")
        f.write(f"Date: {datetime.datetime.now().isoformat(timespec='minutes')}\n")
        f.write("Methodology: scalar-fetch delta-N chains "
                "(param_tpu.comms.timing.measure_chain), median of reps.\n\n")
        for title, body in sections:
            f.write(f"## {title}\n\n```\n{body.strip()}\n```\n\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
