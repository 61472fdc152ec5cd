"""Collective sweep bench + harness tests on the 8-device CPU mesh
(reference test model: commsTraceReplay_tests.py / comms_utils_tests.py)."""

import numpy as np
import pytest

from param_tpu.backend.base import CollectiveArgs
from param_tpu.comms.coll_bench import CollBench
from param_tpu.comms.harness import CommsParams
from param_tpu.comms.timing import TimingMode, measure_dispatch
from param_tpu.cli.comms import build_parser


def make_bench(backend, **overrides):
    p = CommsParams(
        begin_size=256,
        end_size=1024,
        num_iters=3,
        num_warmup_iters=1,
        dcheck=True,
        **overrides,
    )
    return CollBench(backend, p, reps=2)


class TestSweepSizes:
    def test_begin_fixed_for_a2a(self, backend):
        b = make_bench(backend)
        g = backend.get_default_group()
        sizes = b.sweep_sizes("all_to_all", g)
        assert sizes[0] >= 8 * 4  # world * elem

    def test_explicit_size_list(self, backend):
        b = make_bench(backend)
        b.params.size_list = [512, 2048]
        assert b.sweep_sizes("all_reduce", backend.get_default_group()) == [512, 2048]


class TestRunOne:
    @pytest.mark.parametrize(
        "coll",
        [
            "all_reduce",
            "all_gather",
            "reduce_scatter",
            "all_to_all",
            "broadcast",
            "reduce",
            "gather",
            "scatter",
            "incast",
            "multicast",
        ],
    )
    def test_collective_sweep_with_dcheck(self, backend, coll):
        b = make_bench(backend)
        g = backend.get_default_group()
        res = b.run_one(coll, 512, g)
        assert res.dcheck_ok, f"dcheck failed for {coll}"
        assert res.pct(50) > 0
        assert res.alg_bw_gbs >= 0

    def test_blocking_mode_has_distribution(self, backend):
        b = make_bench(backend, mode=TimingMode.BLOCKING)
        res = b.run_one("all_reduce", 512, backend.get_default_group())
        assert len(res.lat_us) == b.params.num_iters

    def test_graph_mode(self, backend):
        b = make_bench(backend, mode=TimingMode.GRAPH)
        b.params.dcheck = False
        res = b.run_one("all_reduce", 512, backend.get_default_group())
        assert res.pct(50) > 0

    def test_graph_mode_reps_give_real_sample(self, backend):
        """GRAPH percentiles must come from >=10 samples (VERDICT r1 #5)."""
        b = make_bench(backend, mode=TimingMode.GRAPH)
        b.params.dcheck = False
        res = b.run_one("all_reduce", 512, backend.get_default_group())
        assert len(res.lat_us) >= 10

    def test_graph_chain_covers_every_collective(self, backend):
        """coll_chain (trustworthy GRAPH timing) must support the FULL
        device-collective surface, incl. rooted and ragged ops (VERDICT r1
        #5).  Object collectives are host-side pickle exchanges — they
        cannot ride a device scan and coll_bench routes them to BLOCKING
        timing instead (coll_bench.py run_one)."""
        from param_tpu.backend.base import OBJECT_COLLECTIVES, SUPPORTED_COLLECTIVES

        b = make_bench(backend, mode=TimingMode.GRAPH)
        g = backend.get_default_group()
        for coll in SUPPORTED_COLLECTIVES:
            if coll == "barrier" or coll in OBJECT_COLLECTIVES:
                continue
            args = b.prep_comm(coll, 512, g)
            if coll == "pt2pt":
                args.src_ranks, args.dst_ranks = [0], [7]
            if coll == "all_to_allv":
                args.in_split = [16] * 8  # ragged path, equal splits
            out = backend.coll_chain(coll, args, 2)
            assert np.isfinite(float(out)), coll

    def test_graph_chain_ragged_a2av_uneven(self, backend):
        """Uneven split matrix goes through the ragged chain fold."""
        b = make_bench(backend, mode=TimingMode.GRAPH)
        g = backend.get_default_group()
        args = b.prep_comm("all_to_allv", 1024, g)
        args.in_split = [8, 16, 8, 16, 8, 16, 8, 16]
        out = backend.coll_chain("all_to_allv", args, 2)
        assert np.isfinite(float(out))

    def test_quant_graph_chain_runs_quantized_allreduce(self, backend):
        """GRAPH mode at bitwidth<32 must chain the QUANTIZED collective —
        not time fp32 traffic and scale busBW anyway (code review r2)."""
        b = make_bench(backend, mode=TimingMode.GRAPH)
        g = backend.get_default_group()
        args32 = b.prep_comm("all_reduce", 1024, g)
        v32 = float(backend.coll_chain("all_reduce", args32, 2))
        args8 = b.prep_comm("all_reduce", 1024, g)
        args8.bitwidth = 8
        v8 = float(backend.coll_chain("all_reduce", args8, 2))
        assert np.isfinite(v8)
        # int8 round trip of uniform-ish values: close but not identical
        assert v8 == pytest.approx(v32, rel=0.05)

    def test_quant_graph_chain_runs_quantized_reduce(self, backend):
        b = make_bench(backend, mode=TimingMode.GRAPH)
        g = backend.get_default_group()
        args = b.prep_comm("reduce", 1024, g)
        args.bitwidth = 8
        out = backend.coll_chain("reduce", args, 2)
        assert np.isfinite(float(out))

    def test_graph_mode_trace_dump_records_ops(self, backend):
        """--trace-dump must record the sweep's ops in GRAPH mode too (the
        chain bypasses the wrapped dispatch table; code review r2)."""
        b = make_bench(backend, mode=TimingMode.GRAPH,
                       collectives=["all_reduce"])
        b.params.dcheck = False
        backend.start_trace_recording()
        try:
            b.run()
        finally:
            trace = backend.stop_trace_recording()
        assert len(trace) >= 2  # one per sweep size (256..1024)
        assert all(t["comms"] == "all_reduce" for t in trace)

    def test_quant_bitwidth_scales_busbw(self, backend):
        b = make_bench(backend)
        b.params.dcheck = False
        b.params.bitwidth = 16
        res = b.run_one("all_reduce", 512, backend.get_default_group())
        # busBW = algBW * 2(n-1)/n * 16/32
        assert res.bus_bw_gbs == pytest.approx(
            res.alg_bw_gbs * 2 * 7 / 8 * 0.5, rel=1e-6
        )


class TestPt2Pt:
    def test_one2one(self, backend):
        b = make_bench(backend, pt2pt="one2one")
        m = b.bench_pt2pt(1024, backend.get_default_group())
        assert m.ping_p50_us > 0
        assert m.uni_bw_gbs > 0
        assert m.bi_bw_gbs > 0

    def test_pairwise(self, backend):
        b = make_bench(backend, pt2pt="pairwise")
        b.params.window = 4
        m = b.bench_pt2pt(1024, backend.get_default_group())
        assert m.uni_bw_gbs > 0


class TestMultiGroup:
    def test_round_robin_groups_sweep(self, backend):
        b = make_bench(backend, num_groups=2)
        groups = b.make_groups()
        assert len(groups) == 2
        for g in groups:
            res = b.run_one("all_reduce", 256, g)
            # expected sum over a 4-rank group with rank pattern is 1+2+3+4
            assert res.dcheck_ok


class TestCli:
    def test_parser_defaults(self):
        ns = build_parser().parse_args([])
        p = CommsParams.from_args(ns)
        assert p.collectives == ["all_reduce"]
        assert p.begin_size == 8
        assert p.mode == TimingMode.GRAPH

    def test_parser_z_compat(self):
        ns = build_parser().parse_args(["--z", "1"])
        assert ns.z == 1

    def test_parser_sizes(self):
        ns = build_parser().parse_args(["--b", "1K", "--e", "4M", "--ss", "8,1K"])
        p = CommsParams.from_args(ns)
        assert p.begin_size == 1024
        assert p.end_size == 4 * 1024**2
        assert p.size_list == [8, 1024]


class TestTiming:
    def test_measure_dispatch_positive(self):
        import jax.numpy as jnp
        import jax

        f = jax.jit(lambda x: x * 2)
        x = jnp.ones((128,))
        per = measure_dispatch(lambda: f(x), iters=5)
        assert per > 0


class TestDtypeSweeps:
    @pytest.mark.parametrize("dtype", ["bfloat16", "float16", "int32"])
    def test_non_f32_sweep(self, backend, dtype):
        b = make_bench(backend, dtype=dtype)
        b.params.dcheck = dtype != "int32"  # int tensors still validate sums
        res = b.run_one("all_reduce", 512, backend.get_default_group())
        assert res.pct(50) > 0
        if b.params.dcheck:
            assert res.dcheck_ok


class TestDcheckRagged:
    """dcheck expectations for the _v / ragged collectives (previously a
    silent fall-through returning OK without validating)."""

    def test_all_gather_v(self, backend):
        b = make_bench(backend)
        splits = [1, 2, 3, 4, 1, 2, 3, 4]
        mx = max(splits)
        x = backend.alloc_per_rank(
            lambda r: np.full((mx,), r + 1, dtype=np.float32)
        )
        args = CollectiveArgs(in_tensor=x, in_split=splits)
        out = backend.all_gather_v(args)
        backend.complete_ops()
        assert b.dcheck("all_gather_v", args, out)

    def test_all_gather_v_catches_corruption(self, backend):
        b = make_bench(backend)
        splits = [2] * 8
        x = backend.alloc_per_rank(
            lambda r: np.full((2,), r + 1, dtype=np.float32)
        )
        args = CollectiveArgs(in_tensor=x, in_split=splits)
        bad = np.zeros(sum(splits), dtype=np.float32)
        assert not b.dcheck("all_gather_v", args, bad)

    def test_reduce_scatter_v(self, backend):
        b = make_bench(backend)
        splits = [2, 2, 4, 4, 2, 2, 4, 4]
        total = sum(splits)
        x = backend.alloc_per_rank(
            lambda r: np.full((total,), r + 1, dtype=np.float32)
        )
        args = CollectiveArgs(in_tensor=x, out_split=splits)
        out = backend.reduce_scatter_v(args)
        backend.complete_ops()
        assert b.dcheck("reduce_scatter_v", args, out)

    def test_all_to_allv(self, backend):
        b = make_bench(backend)
        splits = [2] * 8
        x = backend.alloc_per_rank(
            lambda r: np.full((16,), r + 1, dtype=np.float32)
        )
        args = CollectiveArgs(in_tensor=x, in_split=splits)
        out = backend.all_to_allv(args)
        backend.complete_ops()
        assert b.dcheck("all_to_allv", args, out)

    def test_all_to_allv_ragged_matrix(self, backend):
        b = make_bench(backend)
        rng = np.random.default_rng(0)
        S = rng.integers(0, 4, size=(8, 8)).astype(np.int64)
        row_max = int(S.sum(axis=1).max())
        x = backend.alloc_per_rank(
            lambda r: np.full((row_max,), r + 1, dtype=np.float32)
        )
        args = CollectiveArgs(in_tensor=x, in_split=S)
        out = backend.all_to_allv(args)
        backend.complete_ops()
        assert b.dcheck("all_to_allv", args, out)
