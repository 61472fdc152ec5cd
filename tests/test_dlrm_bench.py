"""DLRM comm-pattern bench tests (CPU mesh)."""

import json

import jax
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from param_tpu.models.dlrm import DlrmConfig, DlrmModel
from param_tpu.models.dlrm_bench import REF_ROWS, REGIONS, DlrmCommBench


@pytest.fixture(scope="module")
def bench():
    cfg = DlrmConfig(
        num_tables=8, rows_per_table=500, emb_dim=16, nnz=4,
        dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=64,
    )
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
    model = DlrmModel(cfg, mesh)
    return DlrmCommBench(model, optax.sgd(0.01))


class TestRegions:
    def test_all_regions_timed(self, bench):
        results = bench.run(reps=1, n_hi=3, max_n=6)
        for r in REGIONS:
            assert r in results, f"missing region {r}"
            assert results[r]["p50_us"] > 0
        assert "bwd_opt(derived)" in results
        assert results["_summary"]["qps"] > 0
        # the reference's cumulative iter_* rows are derived and ordered
        assert results["iter_data_prep"]["p50_us"] > 0
        assert (results["iter_bwd_a2a"]["p50_us"]
                >= results["iter_fwd_a2a"]["p50_us"]
                >= results["iter_data_prep"]["p50_us"])
        # comm regions carry their payload bytes (reference memory column)
        cfg = bench.model.cfg
        assert results["idx_xchg"]["mem_bytes"] == (
            bench.local_batch * cfg.num_tables * cfg.nnz * 4)
        assert results["fwd_a2a"]["mem_bytes"] > 0

    def test_report_prints_21_reference_rows(self, bench, capsys):
        results = bench.run(reps=1, n_hi=2, max_n=4)
        bench.report(results)
        out = capsys.readouterr().out
        assert "DLRM-RES" in out
        assert "memory(B)" in out and "sum(p50)" in out
        # all 21 reference row names present (reportBenchTime all_timers,
        # reference dlrm.py:1015-1036)
        assert len(REF_ROWS) == 21
        for ref_name, _, _ in REF_ROWS:
            assert ref_name in out, ref_name
        assert "QPS" in out


class TestPrintComms:
    def test_trace_schema(self, bench, tmp_path):
        path = tmp_path / "comms.json"
        bench.dump_comms(str(path))
        trace = json.loads(path.read_text())
        # the DLRM butterfly: idx a2a, fwd a2a, top ar, bwd a2a, bot ar
        assert [op["comms"] for op in trace] == [
            "all_to_all", "all_to_all", "all_reduce", "all_to_all", "all_reduce",
        ]
        for op in trace:
            # basic-schema required fields (commsTraceParser._parseBasicTraceComms)
            assert "in_msg_size" in op and "out_msg_size" in op and "dtype" in op
            assert op["in_msg_size"] > 0

    def test_sizes_scale_with_batch(self):
        cfg1 = DlrmConfig(
            num_tables=8, rows_per_table=500, emb_dim=16, nnz=4,
            dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=64,
        )
        cfg2 = DlrmConfig(
            num_tables=8, rows_per_table=500, emb_dim=16, nnz=4,
            dense_dim=16, bot_mlp=[32, 16], top_mlp=[32, 1], batch=128,
        )
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("x",))
        t1 = DlrmCommBench(DlrmModel(cfg1, mesh), optax.sgd(0.01)).comms_trace()
        t2 = DlrmCommBench(DlrmModel(cfg2, mesh), optax.sgd(0.01)).comms_trace()
        assert t2[0]["in_msg_size"] == 2 * t1[0]["in_msg_size"]  # idx a2a
        assert t2[1]["in_msg_size"] == 2 * t1[1]["in_msg_size"]  # fwd a2a
        assert t2[2]["in_msg_size"] == t1[2]["in_msg_size"]  # allreduce: params
