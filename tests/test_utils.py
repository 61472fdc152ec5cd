"""Utils-layer tests (reference: comms_utils_tests.py — TestParseSize,
TestGetAlgBW, TestFixBeginSize)."""

import math

import pytest

from param_tpu.utils import (
    alg_bw,
    bus_bw,
    bus_bw_factor,
    dtype_from_name,
    dtype_size,
    fix_begin_size,
    format_size,
    parse_size,
    size_sweep,
)
from param_tpu.utils.sizes import percentile


class TestParseSize:
    def test_plain(self):
        assert parse_size("1024") == 1024
        assert parse_size(512) == 512

    def test_suffixes(self):
        assert parse_size("4K") == 4096
        assert parse_size("2M") == 2 * 1024**2
        assert parse_size("1G") == 1024**3
        assert parse_size("2m") == 2 * 1024**2

    def test_bad(self):
        with pytest.raises(ValueError):
            parse_size("")
        with pytest.raises(ValueError):
            parse_size("12Q")


class TestFormatSize:
    def test_roundtrip(self):
        for s in ("8", "1K", "64M", "1G"):
            assert format_size(parse_size(s)) == s


class TestSizeSweep:
    def test_pow2(self):
        assert size_sweep(8, 64, 2) == [8, 16, 32, 64]

    def test_end_included(self):
        assert size_sweep(8, 96, 2)[-1] == 96

    def test_additive(self):
        assert size_sweep(8, 32, step_bytes=8) == [8, 16, 24, 32]

    def test_elem_align(self):
        # sizes are multiples of elem size
        for s in size_sweep(8, 1024, 2, elem_size=8):
            assert s % 8 == 0

    def test_bad_bounds(self):
        with pytest.raises(ValueError):
            size_sweep(0, 64)
        with pytest.raises(ValueError):
            size_sweep(64, 8)


class TestFixBeginSize:
    def test_all_to_all_needs_world_elems(self):
        assert fix_begin_size("all_to_all", 4, world_size=8, elem_size=4) == 32

    def test_all_reduce_unchanged(self):
        assert fix_begin_size("all_reduce", 4, world_size=8, elem_size=4) == 4

    def test_all_gather(self):
        assert fix_begin_size("all_gather", 8, world_size=16, elem_size=4) == 64


class TestBw:
    def test_alg_bw(self):
        # 1 GB in 1 ms = 1000 GB/s
        assert math.isclose(alg_bw(10**9, 1000.0), 1000.0)

    def test_bus_factors(self):
        assert math.isclose(bus_bw_factor("all_reduce", 8), 2 * 7 / 8)
        assert math.isclose(bus_bw_factor("all_gather", 8), 7 / 8)
        assert math.isclose(bus_bw_factor("all_to_all", 4), 3 / 4)
        assert bus_bw_factor("broadcast", 8) == 1.0
        assert bus_bw_factor("pt2pt", 2) == 1.0

    def test_quant_scaling(self):
        full = bus_bw("all_reduce", 10**6, 100.0, 8, bitwidth=32)
        half = bus_bw("all_reduce", 10**6, 100.0, 8, bitwidth=16)
        assert math.isclose(half, full / 2)


class TestDtypes:
    def test_sizes(self):
        assert dtype_size(dtype_from_name("float32")) == 4
        assert dtype_size(dtype_from_name("bfloat16")) == 2
        assert dtype_size(dtype_from_name("int8")) == 1

    def test_unknown(self):
        with pytest.raises(ValueError):
            dtype_from_name("complex1024")


class TestPercentile:
    def test_median(self):
        assert percentile([1, 2, 3, 4, 5], 50) == 3

    def test_interp(self):
        assert percentile([0, 10], 75) == 7.5

    def test_empty(self):
        assert math.isnan(percentile([], 50))


class TestTimers:
    def test_param_timer_accumulates(self):
        from param_tpu.utils.timer import ParamTimer, param_profile

        t = ParamTimer()
        with param_profile(t, "region"):
            pass
        assert t.elapsed_ns > 0
        assert t.get_us() == t.elapsed_ns / 1e3
        t.reset()
        assert t.elapsed_ns == 0

    def test_region_timers(self):
        from param_tpu.utils.timer import RegionTimers

        r = RegionTimers()
        r.get("fwd").inc_ns(1000)
        r.get("fwd").inc_ns(500)
        r.get("bwd").inc_ns(2000)
        snap = r.snapshot_us()
        assert snap["fwd"] == 1.5
        assert snap["bwd"] == 2.0
        r.reset_all()
        assert r.snapshot_us()["fwd"] == 0.0


class TestRankLogging:
    def test_setup_and_graceful_exit(self):
        from param_tpu.utils.logger import graceful_exit, setup_rank_logging

        setup_rank_logging(rank=3, level="WARNING")
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            graceful_exit("bye", code=2)


class TestSweepEdges:
    def test_begin_equals_end(self):
        assert size_sweep(64, 64) == [64]

    def test_huge_factor(self):
        assert size_sweep(8, 1024, 1000) == [8, 1024]
