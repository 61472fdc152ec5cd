"""Profiler integration + post-hoc analysis tests."""

import json
import os

import pytest

from param_tpu.trace.profiler_analysis import (
    analyze_files,
    analyze_records,
    effective_a2a_bytes,
    print_summary,
)
from param_tpu.utils.profiler import SizeTriggeredProfiler, profile_to


RECORDS = [
    {"comms": "all_reduce", "size_bytes": 1024, "lat_us": 100.0},
    {"comms": "all_reduce", "size_bytes": 1024, "lat_us": 120.0},
    {"comms": "all_to_all", "size_bytes": 2048, "lat_us": 200.0},
    {"comms": "compute:gemm", "size_bytes": 0, "lat_us": 50.0},
]


class TestAnalyzeRecords:
    def test_per_collective_rows(self):
        out = analyze_records(RECORDS, world_size=8)
        rows = {r["collective"]: r for r in out["collectives"]}
        assert rows["all_reduce"]["count"] == 2
        assert rows["all_reduce"]["total_bytes"] == 2048
        # busBW factor 2(n-1)/n applied
        assert rows["all_reduce"]["bus_bw_gbs"] == pytest.approx(
            rows["all_reduce"]["alg_bw_gbs"] * 2 * 7 / 8
        )

    def test_compute_excluded(self):
        out = analyze_records(RECORDS, world_size=8)
        names = [r["collective"] for r in out["collectives"]]
        assert "compute:gemm" not in names

    def test_shared_bw(self):
        out = analyze_records(RECORDS, world_size=8)
        # 4096 bytes over 420us
        assert out["shared_bw_gbs"] == pytest.approx(4096 / 1e9 / (420e-6))

    def test_print(self, capsys):
        print_summary(analyze_records(RECORDS, world_size=8))
        assert "all_reduce" in capsys.readouterr().out


class TestUnevenA2a:
    def test_max_excluding_self(self):
        # rank 1 sends [5,0,3], receives [1,0,7] (4-byte elems)
        b = effective_a2a_bytes([5, 0, 3], [1, 0, 7], rank=1, elem=4)
        assert b == max(5 + 3, 1 + 7) * 4


class TestCrossRank:
    def test_analyze_files(self, tmp_path):
        paths = []
        for r in range(2):
            p = tmp_path / f"rank{r}.json"
            p.write_text(json.dumps(RECORDS))
            paths.append(str(p))
        out = analyze_files(paths, world_size=8)
        assert out["num_ranks"] == 2
        assert any(r["collective"] == "all_reduce" for r in out["cross_rank"])


class TestProfiler:
    def test_profile_to_writes_trace(self, tmp_path):
        import jax
        import jax.numpy as jnp

        d = str(tmp_path / "prof")
        with profile_to(d):
            jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
        # a plugins/profile dir with at least one trace file appears
        found = []
        for root, _, files in os.walk(d):
            found.extend(files)
        assert found, "no profiler output written"

    def test_profile_disabled(self):
        with profile_to(None):
            pass  # no-op

    def test_size_triggered(self, tmp_path):
        p = SizeTriggeredProfiler(str(tmp_path / "p2"), trigger_size=1024)
        p.maybe_start(512)
        assert not p._active
        p.maybe_start(2048)
        assert p._active
        p.stop()
        assert not p._active


class TestHloSummary:
    def test_parse_counts(self):
        from param_tpu.trace.hlo_summary import summarize_hlo_text

        hlo = """
HloModule jit_f
ENTRY main {
  %p0 = f32[8,8]{1,0} parameter(0)
  %p1 = f32[8,8]{1,0} parameter(1)
  %dot = f32[8,8]{1,0} dot(%p0, %p1), lhs_contracting_dims={1}
  %ar = f32[8,8]{1,0} all-reduce(%dot), to_apply=%sum
  ROOT %f = f32[8,8]{1,0} fusion(%ar), kind=kLoop
}
"""
        ops = summarize_hlo_text(hlo)
        assert ops["parameter"] == 2
        assert ops["dot"] == 1
        assert ops["all-reduce"] == 1
        assert ops["fusion"] == 1

    def test_dump_dir(self, tmp_path):
        from param_tpu.trace.hlo_summary import summarize_dump_dir

        (tmp_path / "m1.after_optimizations.txt").write_text(
            "%a = f32[2]{0} parameter(0)\n%r = f32[2]{0} all-gather(%a)\n"
        )
        out = summarize_dump_dir(str(tmp_path))
        assert out["num_modules"] == 1
        assert out["total_collectives"] == 1


class TestDeviceTrace:
    @pytest.fixture(scope="class")
    def trace_dir(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp

        d = str(tmp_path_factory.mktemp("prof"))
        jax.profiler.start_trace(d)
        with jax.profiler.TraceAnnotation("bench_region"):
            jax.block_until_ready(
                jnp.ones((256, 256)) @ jnp.ones((256, 256))
            )
        jax.profiler.stop_trace()
        return d

    def test_load_and_aggregate(self, trace_dir):
        from param_tpu.trace.device_trace import (
            load_chrome_trace,
            op_durations,
            region_durations,
        )

        events, threads = load_chrome_trace(trace_dir)
        assert events and threads
        agg = op_durations(events, threads)
        assert agg  # non-python ops present
        regs = region_durations(events, ["bench_region"])
        assert regs["bench_region"]["count"] == 1
        assert regs["bench_region"]["total_us"] > 0

    def test_collective_busbw_math(self):
        from param_tpu.trace.device_trace import collective_bus_bw

        durs = {"all-reduce": {"count": 2, "total_us": 200.0}}
        bw = collective_bus_bw(durs, size_bytes=10**6, world=8)
        # 1MB in 100us = 10 GB/s algBW * 2*7/8
        assert bw["all-reduce"] == pytest.approx(10.0 * 2 * 7 / 8)

    def test_missing_dir(self, tmp_path):
        from param_tpu.trace.device_trace import find_trace_file

        with pytest.raises(FileNotFoundError):
            find_trace_file(str(tmp_path))


class TestAnalyzerMains:
    def test_device_trace_main(self, tmp_path, capsys):
        import gzip
        import json

        from param_tpu.trace.device_trace import main

        d = tmp_path / "plugins" / "profile" / "run1"
        d.mkdir(parents=True)
        trace = {
            "traceEvents": [
                {"ph": "M", "pid": 1, "name": "process_name",
                 "args": {"name": "/device:TPU:0"}},
                {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
                 "args": {"name": "XLA Ops"}},
                {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1",
                 "ts": 0, "dur": 100.0},
                {"ph": "X", "pid": 1, "tid": 2, "name": "all-reduce.3",
                 "ts": 100, "dur": 50.0},
            ]
        }
        with gzip.open(d / "x.trace.json.gz", "wt") as f:
            json.dump(trace, f)
        assert main([str(tmp_path)]) == 0
        out = capsys.readouterr().out
        assert "fusion.1" in out and "all-reduce" in out

    def test_hlo_summary_main(self, tmp_path, capsys):
        from param_tpu.trace.hlo_summary import main

        (tmp_path / "m.after_optimizations.txt").write_text(
            "%a = f32[4]{0} parameter(0)\n%d = f32[4]{0} dot(%a, %a)\n"
        )
        assert main([str(tmp_path)]) == 0
        assert "modules: 1" in capsys.readouterr().out

    def test_analyze_main_multi_rank(self, tmp_path, capsys):
        import json

        from param_tpu.cli.analyze import main

        recs = [{"comms": "all_reduce", "size_bytes": 256, "lat_us": 10.0}]
        paths = []
        for r in range(2):
            p = tmp_path / f"r{r}.json"
            p.write_text(json.dumps(recs))
            paths.append(str(p))
        assert main(paths + ["--world-size", "4"]) == 0
        assert "all_reduce" in capsys.readouterr().out
