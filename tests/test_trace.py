"""Trace parse/replay tests (reference model: commsTraceReplay_tests.py)."""

import json

import numpy as np
import pytest

from param_tpu.trace.comms_trace import (
    CommsOp,
    dump_trace_file,
    parse_trace,
    read_trace_file,
    to_comm_name,
)
from param_tpu.trace.replay import CommsReplay, ReplayParams


BASIC_TRACE = [
    {"comms": "all_reduce", "in_msg_size": 1024, "out_msg_size": 1024,
     "dtype": "float32"},
    {"comms": "alltoall", "in_msg_size": 512, "out_msg_size": 512,
     "dtype": "float32"},
    {"comms": "all_to_allv", "in_msg_size": 16, "out_msg_size": 16,
     "dtype": "float32", "in_split": [2] * 8, "out_split": [2] * 8},
    {"comms": "wait"},
    {"comms": "broadcast", "in_msg_size": 256, "out_msg_size": 256,
     "dtype": "float32", "root": 2},
    {"compute": "gemm", "mm_dim": 64, "dtype": "float32"},
    {"compute": "emb_lookup", "emb_dim": 16, "num_embs": 100,
     "batch_size": 8, "bag_size": 4},
]


class TestNameAliases:
    def test_aliases(self):
        assert to_comm_name("allreduce") == "all_reduce"
        assert to_comm_name("AllToAll") == "all_to_all"
        assert to_comm_name("all_to_all") == "all_to_all"
        assert to_comm_name("reduceScatter") == "reduce_scatter"
        assert to_comm_name("all-gather") == "all_gather"
        assert to_comm_name("sendrecv") == "pt2pt"


class TestParse:
    def test_basic_schema(self):
        ops = parse_trace(BASIC_TRACE)
        assert len(ops) == 7
        assert ops[0].comms == "all_reduce" and ops[0].in_msg_size == 1024
        assert ops[1].comms == "all_to_all"
        assert ops[2].in_split == [2] * 8
        assert ops[3].comms == "wait"
        assert ops[4].root == 2
        assert ops[5].compute == "gemm" and ops[5].mm_dims == [64] * 4
        assert ops[6].compute == "emb_lookup" and ops[6].bag_size == 4

    def test_bad_element(self):
        with pytest.raises(ValueError):
            parse_trace([{"bogus": 1}])

    def test_file_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.json")
        dump_trace_file(BASIC_TRACE, p)
        assert len(read_trace_file(p)) == 7
        pgz = str(tmp_path / "t.json.gz")
        dump_trace_file(BASIC_TRACE, pgz)
        assert len(read_trace_file(pgz)) == 7

    def test_signature_cache_key(self):
        a, b = parse_trace(BASIC_TRACE[:2])
        assert a.signature() != b.signature()
        a2 = parse_trace(BASIC_TRACE[:1])[0]
        assert a.signature() == a2.signature()


class TestReplay:
    def test_dry_run(self, backend):
        r = CommsReplay(backend, ReplayParams(dry_run=True))
        out = r.run(BASIC_TRACE)
        stats = out["dry_run"]
        assert stats["all_reduce"]["count"] == 1
        assert stats["all_reduce"]["total_bytes"] == 4096
        assert stats["compute:gemm"]["count"] == 1

    def test_blocking_replay(self, backend):
        r = CommsReplay(
            backend,
            ReplayParams(blocking=True, num_replays=2, num_warmup_replays=1),
        )
        out = r.run(BASIC_TRACE)
        assert out["collectives"]["all_reduce"]["count"] == 2
        assert out["collectives"]["all_reduce"]["alg_bw_gbs"] > 0
        assert "compute:gemm" in out["collectives"]

    def test_nonblocking_replay(self, backend):
        r = CommsReplay(backend, ReplayParams(num_replays=1, do_warmup=False))
        out = r.run(BASIC_TRACE)
        assert out["total_replay_s"] > 0

    def test_auto_shrink(self, backend):
        trace = [
            {"comms": "all_to_all", "in_msg_size": 16 * 1024,
             "out_msg_size": 16 * 1024, "dtype": "float32", "world_size": 16},
            {"comms": "all_gather", "in_msg_size": 128, "out_msg_size": 16 * 128,
             "dtype": "float32", "world_size": 16},
        ]
        r = CommsReplay(backend, ReplayParams(auto_shrink=True))
        r.load(trace)
        assert r.ops[0].in_msg_size == 8 * 1024  # rescaled 16 -> 8 ranks
        assert r.ops[1].out_msg_size == 8 * 128

    def test_rebalance_equal(self, backend):
        trace = [
            {"comms": "all_to_allv", "in_msg_size": 80, "out_msg_size": 80,
             "dtype": "float32", "in_split": [76, 1, 1, 1, 1, 0, 0, 0],
             "out_split": [76, 1, 1, 1, 1, 0, 0, 0]},
        ]
        r = CommsReplay(backend, ReplayParams(rebalance_policy="equal"))
        r.load(trace)
        assert r.ops[0].in_split == [10] * 8

    def test_pg_routing(self, backend):
        trace = [
            {"comms": "all_reduce", "in_msg_size": 64, "out_msg_size": 64,
             "dtype": "float32", "pg_id": 7, "global_ranks": [0, 1, 2, 3]},
        ]
        r = CommsReplay(backend, ReplayParams(blocking=True, do_warmup=False))
        out = r.run(trace)
        assert 7 in r._pg_cache
        assert r._pg_cache[7].size == 4

    def test_write_details(self, backend, tmp_path):
        path = str(tmp_path / "details.json")
        r = CommsReplay(
            backend,
            ReplayParams(blocking=True, do_warmup=False, output_path=path),
        )
        r.run(BASIC_TRACE)
        details = json.loads(open(path).read())
        assert len(details) >= 5
        assert all("lat_us" in d for d in details)


class TestDlrmDumpReplays:
    def test_end_to_end(self, backend, tmp_path):
        """--print-comms output replays directly (capture→replay loop)."""
        import jax
        import optax
        from jax.sharding import Mesh

        from param_tpu.models.dlrm import DlrmConfig, DlrmModel
        from param_tpu.models.dlrm_bench import DlrmCommBench

        cfg = DlrmConfig(
            num_tables=8, rows_per_table=100, emb_dim=16, nnz=4,
            dense_dim=16, bot_mlp=[16, 16], top_mlp=[16, 1], batch=64,
        )
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
        bench = DlrmCommBench(DlrmModel(cfg, mesh), optax.sgd(0.01))
        path = str(tmp_path / "dlrm.json")
        bench.dump_comms(path)
        r = CommsReplay(
            backend, ReplayParams(trace_path=path, blocking=True, do_warmup=False)
        )
        out = r.run()
        assert out["collectives"]["all_to_all"]["count"] == 3
        assert out["collectives"]["all_reduce"]["count"] == 2


class TestEtCommExtraction:
    def test_sharded_dlrm_butterfly(self, backend):
        """The comm stream extracted from a captured sharded train step
        replays end-to-end (ET -> comms -> replay loop)."""
        import jax
        import numpy as np
        import optax
        from jax.sharding import Mesh

        from param_tpu.models.dlrm import DlrmConfig, DlrmModel, init_dlrm_params
        from param_tpu.models.dlrm_data import RandomDataset
        from param_tpu.trace.capture import capture_execution_trace
        from param_tpu.trace.comms_trace import comms_from_et

        cfg = DlrmConfig(
            num_tables=8, rows_per_table=200, emb_dim=16, nnz=4,
            dense_dim=16, bot_mlp=[16, 16], top_mlp=[16, 1], batch=64,
        )
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
        model = DlrmModel(cfg, mesh)
        params = init_dlrm_params(jax.random.PRNGKey(0), cfg)
        ds = RandomDataset(batch=64, dense_dim=16, num_tables=8, nnz=4,
                           num_rows=200, num_batches=1)
        params_p, batch_p = model.place(params, next(iter(ds)))
        opt = optax.sgd(0.01)
        st = opt.init(params_p)
        step = model.make_train_step(opt)
        et = capture_execution_trace(step, params_p, st, *batch_p)
        comms = comms_from_et(et, world_size=8)
        names = [c.comms for c in comms]
        # the butterfly: idx a2a, fwd a2a, bwd a2a, dense all_reduces
        assert names.count("all_to_all") == 3
        assert names.count("all_reduce") >= 4
        # replays directly
        r = CommsReplay(backend, ReplayParams(trace_type="basic",
                                              blocking=True, do_warmup=False))
        r.ops = comms
        r._setup_groups()
        r.replay_once()
        assert len(r.records) == len(comms)


class TestHierarchicalGroups:
    def test_ici_dcn_split(self, backend):
        ici, dcn = backend.make_hierarchical_groups(hosts=2)
        assert len(ici) == 2 and len(dcn) == 4
        assert [d.id for d in ici[0].devices] == [0, 1, 2, 3]
        assert [d.id for d in dcn[1].devices] == [1, 5]

    def test_bad_hosts(self, backend):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            backend.make_hierarchical_groups(hosts=3)


class TestEdgeCases:
    def test_empty_trace_replay(self, backend):
        r = CommsReplay(backend, ReplayParams(do_warmup=False))
        out = r.run([])
        assert out["num_ops"] == 0

    def test_wait_and_barrier_only(self, backend):
        r = CommsReplay(backend, ReplayParams(do_warmup=False))
        out = r.run([{"comms": "wait"}, {"comms": "barrier"}])
        assert out["num_ops"] == 2
        assert out["collectives"] == {}

    def test_unknown_collective_skipped(self, backend):
        trace = [{"comms": "quantum_teleport", "in_msg_size": 8,
                  "out_msg_size": 8, "dtype": "float32"}]
        r = CommsReplay(backend, ReplayParams(blocking=True, do_warmup=False))
        out = r.run(trace)  # logged + skipped, no crash
        assert out["num_ops"] == 1

    def test_auto_shrink_noop_same_world(self, backend):
        trace = [{"comms": "all_to_all", "in_msg_size": 64, "out_msg_size": 64,
                  "dtype": "float32", "world_size": 8}]
        r = CommsReplay(backend, ReplayParams(auto_shrink=True))
        r.load(trace)
        assert r.ops[0].in_msg_size == 64


class TestRecordingConvention:
    """Trace recording must use PER-RANK element counts (the basic-schema
    convention the replay side assumes) and must unwrap cleanly on stop."""

    def test_per_rank_sizes(self, backend):
        from param_tpu.backend.base import CollectiveArgs

        backend.start_trace_recording()
        x = backend.alloc_per_rank(
            lambda r: np.full((128,), r + 1, dtype=np.float32)
        )
        backend.collective_fn["all_reduce"](CollectiveArgs(in_tensor=x))
        xg = backend.alloc_per_rank(
            lambda r: np.full((16,), r + 1, dtype=np.float32)
        )
        backend.collective_fn["all_gather"](CollectiveArgs(in_tensor=xg))
        xr = backend.alloc_per_rank(
            lambda r: np.full((64,), r + 1, dtype=np.float32)
        )
        backend.collective_fn["reduce_scatter"](CollectiveArgs(in_tensor=xr))
        backend.complete_ops()
        trace = backend.stop_trace_recording()
        ar, ag, rs = trace
        assert ar["in_msg_size"] == 128 and ar["out_msg_size"] == 128
        assert ag["in_msg_size"] == 16 and ag["out_msg_size"] == 16 * 8
        assert rs["in_msg_size"] == 64 and rs["out_msg_size"] == 8

    def test_incast_partial_sources_out_size(self, backend):
        """incast with a source SUBSET records out_msg_size = per * n_src,
        not per * group_size (code review r2: the root receives one buffer
        per actual sender)."""
        from param_tpu.backend.base import CollectiveArgs

        backend.start_trace_recording()
        x = backend.alloc_per_rank(
            lambda r: np.full((32,), r + 1, dtype=np.float32)
        )
        backend.collective_fn["incast"](
            CollectiveArgs(in_tensor=x, dst_rank=0, src_ranks=[1, 2])
        )
        backend.complete_ops()
        trace = backend.stop_trace_recording()
        assert trace[0]["in_msg_size"] == 32
        assert trace[0]["out_msg_size"] == 32 * 2

    def test_record_replay_same_traffic(self, backend):
        """A recorded all_reduce replays with the ORIGINAL per-rank traffic
        (previously world_size× inflated)."""
        from param_tpu.backend.base import CollectiveArgs

        backend.start_trace_recording()
        x = backend.alloc_per_rank(
            lambda r: np.full((128,), r + 1, dtype=np.float32)
        )
        backend.collective_fn["all_reduce"](CollectiveArgs(in_tensor=x))
        backend.complete_ops()
        trace = backend.stop_trace_recording()

        rp = CommsReplay(backend, ReplayParams())
        rp.load(trace)
        args = rp.prep_op(rp.ops[0])
        # global array = per-rank 128 × 8 ranks — matches the original x
        assert args.in_tensor.shape[0] == 128 * 8
        assert args.in_tensor.shape == np.asarray(x).shape

    def test_stop_restores_dispatch_table(self, backend):
        from param_tpu.backend.base import CollectiveArgs

        fn_before = backend.collective_fn["all_reduce"]
        backend.start_trace_recording()
        assert backend.collective_fn["all_reduce"] is not fn_before
        backend.stop_trace_recording()
        assert backend.collective_fn["all_reduce"] is fn_before

    def test_no_double_record_on_second_session(self, backend):
        from param_tpu.backend.base import CollectiveArgs

        x = backend.alloc_per_rank(
            lambda r: np.full((8,), r + 1, dtype=np.float32)
        )
        for _ in range(2):
            backend.start_trace_recording()
            backend.collective_fn["all_reduce"](CollectiveArgs(in_tensor=x))
            backend.complete_ops()
            trace = backend.stop_trace_recording()
            assert len(trace) == 1
