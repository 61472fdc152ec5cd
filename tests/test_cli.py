"""CLI smoke tests: every entry point parses and tiny runs work (CPU mesh)."""

import json
import subprocess
import sys

import pytest

CLIS = [
    "param_tpu.cli.comms",
    "param_tpu.cli.dlrm",
    "param_tpu.cli.compute",
    "param_tpu.cli.inference",
    "param_tpu.cli.overlap",
    "param_tpu.cli.comms_compute",
    "param_tpu.cli.replay",
    "param_tpu.cli.et",
    "param_tpu.cli.analyze",
    "param_tpu.cli.run_benchmark",
]


class TestParsers:
    @pytest.mark.parametrize("mod", CLIS)
    def test_help(self, mod):
        import importlib

        m = importlib.import_module(mod)
        parser = getattr(m, "build_parser", None)
        if parser is not None:
            assert parser().format_help()
        else:  # analyze has a plain main
            assert hasattr(m, "main")


class TestSmallRuns:
    def test_comms_with_output_json(self, tmp_path, backend):
        from param_tpu.cli.comms import main

        out = tmp_path / "metrics.jsonl"
        rc = main([
            "--collective", "all_reduce", "--b", "1K", "--e", "1K",
            "--n", "2", "--w", "1", "--output-json", str(out),
        ])
        assert rc == 0
        lines = [json.loads(l) for l in out.read_text().splitlines()]
        assert lines and lines[0]["commsOp"] == "all_reduce"
        # unregister so later tests don't write here
        from param_tpu.utils.logger import unregister_perf_logger

        unregister_perf_logger("file")

    def test_comms_n_per_iter(self, backend):
        from param_tpu.cli.comms import main

        assert main([
            "--collective", "all_reduce", "--b", "1K", "--e", "1K",
            "--n", "2", "--w", "1", "--n-per-iter", "3",
        ]) == 0

    def test_inference_cpu(self):
        from param_tpu.cli.inference import main

        assert main(["--shape", "2,32,32,32,8", "--chain", "2", "--reps", "1"]) == 0

    def test_compute_gemm(self):
        from param_tpu.cli.compute import main

        assert main(["gemm", "--shape", "64,64,64", "--chain", "2",
                     "--reps", "1"]) == 0

    def test_compute_gemm_compare(self, capsys):
        """XLA-vs-Pallas comparison table (reference blas/tlass table,
        pytorch_cutlass.py:81-101)."""
        from param_tpu.cli.compute import main

        assert main(["gemm", "--shape", "64,64,64", "--compare",
                     "--chain", "2", "--reps", "1"]) == 0
        out = capsys.readouterr().out
        assert "xla" in out and "pallas" in out and "Rate(TF/s)" in out


class TestDlrmE2E:
    def test_train_mode(self, backend, capsys):
        from param_tpu.cli.dlrm import main

        rc = main([
            "--num-tables", "8", "--rows", "500", "--emb-dim", "16",
            "--nnz", "4", "--dense-dim", "16", "--arch-mlp-bot", "32-16",
            "--arch-mlp-top", "32-1", "--batch", "64",
            "--train-batches", "5",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "DLRM-E2E" in out and "AUC" in out

    def test_et_codegen_cli(self, tmp_path):
        from param_tpu.cli.et import main

        et_path = str(tmp_path / "et.json.gz")
        assert main(["capture", "--workload", "mlp", "-o", et_path]) == 0
        gen = str(tmp_path / "gen.py")
        assert main(["codegen", et_path, "-o", gen]) == 0
        assert "REG[" in open(gen).read()
