"""Compute-tier bench runner tests (tiny shapes, CPU)."""

import pytest

from param_tpu.ops import datasets
from param_tpu.ops.compute_bench import bench_emb, bench_gemm, bench_mlp, print_results
from param_tpu.utils.chip import CHIPS, detect_chip, matmul_roofline_tflops


class TestDatasets:
    def test_reference_shapes(self):
        # parity with train/compute/pt/dataset.py
        assert len(datasets.GEMM_A) == 15
        assert len(datasets.GEMM_B) == 20
        assert len(datasets.GEMM_C) == 4
        assert len(datasets.EMB_A) == 16
        assert len(datasets.EMB_B) == 6
        assert len(datasets.MLP_A) == 12
        assert datasets.GEMM_A[0] == (128, 4096, 4096)
        assert datasets.EMB_A[0] == (14_000_000, 128, 30, 512)
        assert datasets.MLP_A[0] == (18, 1024, 1024, 1024, 128)


class TestChip:
    def test_detect_on_cpu(self):
        assert detect_chip().name == "cpu"

    def test_roofline_lookup(self):
        v5e = CHIPS["v5e"]
        assert matmul_roofline_tflops(v5e, "bfloat16") == 197.0
        assert matmul_roofline_tflops(v5e, "float32") == 98.5


class TestGemm:
    def test_small_sweep(self):
        results = bench_gemm([(64, 64, 64), (128, 64, 32)], n_hi=4, reps=1)
        assert len(results) == 2
        for r in results:
            assert r.tflops > 0
            assert r.lat_us > 0

    def test_weight_resident_mode(self):
        # (interpret-mode on CPU) per-GEMM numbers from S steps sharing B
        results = bench_gemm([(8, 128, 128)], n_hi=2, reps=1,
                             weight_resident=4)
        assert len(results) == 1
        assert results[0].tflops > 0

    def test_weight_resident_vmem_guard(self):
        # an A stack that cannot fit VMEM is skipped, not crashed
        results = bench_gemm([(1024, 4096, 40928)], n_hi=2, reps=1,
                             weight_resident=16)
        assert results == []


class TestEmb:
    def test_small(self):
        results = bench_emb([(1000, 16, 4, 32)], n_hi=4, reps=1)
        assert len(results) == 1
        assert results[0].gbs > 0
        assert results[0].qps > 0

    def test_max_rows_clamp(self):
        results = bench_emb([(10_000_000, 16, 4, 32)], n_hi=2, reps=1,
                            max_rows=1000)
        assert results[0].shape[0] == 1000

    def test_zipf(self):
        results = bench_emb([(1000, 16, 4, 32)], n_hi=2, reps=1,
                            distribution="zipf")
        assert results[0].gbs > 0


class TestMlp:
    def test_train(self):
        results = bench_mlp([(2, 32, 32, 32, 16)], n_hi=4, reps=1)
        assert results[0].tflops > 0
        assert results[0].qps > 0

    def test_fwd_only(self):
        results = bench_mlp([(2, 32, 32, 32, 16)], fwd_only=True, n_hi=4, reps=1)
        assert results[0].tflops > 0

    def test_adagrad(self):
        results = bench_mlp([(2, 32, 32, 32, 16)], optimizer="adagrad",
                            n_hi=4, reps=1)
        assert results[0].tflops > 0


class TestReport:
    def test_print(self, capsys):
        results = bench_gemm([(64, 64, 64)], n_hi=2, reps=1)
        print_results(results, "float32")
        out = capsys.readouterr().out
        assert "COMPUTE-RES" in out
        assert "gemm" in out


class TestTransformerBlock:
    def test_flops_model(self):
        from param_tpu.ops.attention import attention_flops
        from param_tpu.ops.compute_bench import transformer_block_flops

        b, s, e, h, ff = 2, 128, 128, 2, 256
        proj = 2 * b * s * (e * 3 * e + e * e + 2 * e * ff)
        att = attention_flops(b, h, s, s, e // h, True)
        assert transformer_block_flops(b, s, e, h, ff, True, False) == \
            proj + att
        assert transformer_block_flops(b, s, e, h, ff, True, True) == \
            3 * proj + att * 7 // 2

    def test_train_step_rows(self):
        from param_tpu.ops.compute_bench import bench_transformer

        rows = bench_transformer([(1, 128, 128, 2, 256)], n_hi=2, reps=1,
                                 paths=["flash", "xla"])
        assert [r.op for r in rows] == ["tf:flash", "tf:xla"]
        assert all(r.lat_us > 0 and r.tflops > 0 for r in rows)

    def test_fwd_only_row(self):
        from param_tpu.ops.compute_bench import bench_transformer

        rows = bench_transformer([(1, 128, 128, 2, 256)], n_hi=2, reps=1,
                                 paths=["flash"], grad=False)
        assert rows[0].op == "tf-fwd:flash"


class TestDecodeAttention:
    def test_rows_and_bytes_model(self):
        from param_tpu.ops.compute_bench import bench_decode_attention

        rows = bench_decode_attention([(2, 4, 512, 64)], n_hi=2, reps=1)
        assert rows[0].op == "decode"
        assert rows[0].gbs > 0 and rows[0].lat_us > 0

    def test_block_serve_row(self):
        from param_tpu.ops.compute_bench import bench_block_decode

        rows = bench_block_decode([(2, 128, 64, 2, 128)], n_hi=2, reps=1)
        assert rows[0].op == "serve" and rows[0].gbs > 0

    def test_block_serve_int8_row(self):
        from param_tpu.ops.compute_bench import bench_block_decode

        rows = bench_block_decode([(2, 128, 64, 2, 128)], dtype="int8",
                                  n_hi=2, reps=1)
        assert rows[0].op == "serve-int8" and rows[0].gbs > 0
