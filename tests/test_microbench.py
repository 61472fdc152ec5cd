"""Operator micro-benchmark framework tests
(reference model: test_generator.py, test_register.py, test_benchmark_load.py)."""

import io
import json

import numpy as np
import pytest

from param_tpu.microbench import (
    DefaultConfigIterator,
    IterableList,
    ListProduct,
    RangeConfigIterator,
    TableProduct,
    full_range,
    get_operator,
    op_map,
    register_operator,
)
from param_tpu.microbench.benchmark import (
    Benchmark,
    BenchmarkConfig,
    OpExecutor,
    RunOptions,
)
from param_tpu.microbench.data import DefaultDataGenerator, materialize_arg
from param_tpu.microbench.operator import CallableOp, JaxPathOp, load_workloads


class TestGenerators:
    def test_full_range_inclusive(self):
        assert list(full_range(1, 5, 2)) == [1, 3, 5]

    def test_list_product(self):
        lp = ListProduct([IterableList([1, 2]), 7, IterableList([8, 9])])
        assert list(lp) == [[1, 7, 8], [1, 7, 9], [2, 7, 8], [2, 7, 9]]

    def test_table_product(self):
        tp = TableProduct({"a": IterableList([1, 2]), "b": 5})
        assert list(tp) == [{"a": 1, "b": 5}, {"a": 2, "b": 5}]

    def test_nested_product(self):
        lp = ListProduct([IterableList([1]), ListProduct([IterableList([2, 3])])])
        assert list(lp) == [[1, [2]], [1, [3]]]


class TestIterators:
    CONFIGS = [
        {
            "input": [
                {
                    "args": [
                        {"type": "tensor", "dtype": "float32",
                         "shape": [512, [512, 514, 1], 30],
                         "__range__": ["shape"]},
                    ]
                }
            ]
        }
    ]

    def test_range_expansion(self):
        out = list(RangeConfigIterator(self.CONFIGS))
        shapes = [c["args"][0]["shape"] for c in out]
        assert shapes == [[512, 512, 30], [512, 513, 30], [512, 514, 30]]

    def test_default_no_expansion(self):
        out = list(DefaultConfigIterator(self.CONFIGS))
        assert len(out) == 1

    def test_scalar_range(self):
        configs = [
            {"input": [{"args": [
                {"type": "bool", "value": [True, False], "__range__": ["value"]}
            ]}]}
        ]
        out = list(RangeConfigIterator(configs))
        assert [c["args"][0]["value"] for c in out] == [True, False]

    def test_copy_macro(self):
        configs = [
            {"input": [{"args": [
                {"type": "tensor", "dtype": "float32", "shape": [-1, 64, 128],
                 "__copy__": [{"shape": [0, [1, 2]]}]},
                {"type": "tensor", "dtype": "float32", "shape": [8, 16, 32]},
            ]}]}
        ]
        out = list(RangeConfigIterator(configs))
        assert out[0]["args"][0]["shape"] == [32, 64, 128]


class TestData:
    def test_tensor(self):
        rng = np.random.default_rng(0)
        t = materialize_arg(
            {"type": "tensor", "dtype": "float32", "shape": [4, 8]}, rng
        )
        assert t.shape == (4, 8)

    def test_int_tensor_bounds(self):
        rng = np.random.default_rng(0)
        t = materialize_arg(
            {"type": "tensor", "dtype": "int32", "shape": [100],
             "low": 5, "high": 10}, rng
        )
        assert int(t.min()) >= 5 and int(t.max()) < 10

    def test_scalars(self):
        rng = np.random.default_rng(0)
        assert materialize_arg({"type": "int", "value": 7}, rng) == 7
        assert materialize_arg({"type": "float", "value": 1.5}, rng) == 1.5
        assert materialize_arg({"type": "bool", "value": True}, rng) is True
        assert materialize_arg({"type": "none"}, rng) is None

    def test_genericlist(self):
        rng = np.random.default_rng(0)
        out = materialize_arg(
            {"type": "genericlist",
             "value": [{"type": "int", "value": 1}, {"type": "int", "value": 2}]},
            rng,
        )
        assert out == [1, 2]

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            materialize_arg({"type": "quantum"}, np.random.default_rng(0))


class TestRegistry:
    def test_register_and_get(self):
        register_operator("test.mult2", CallableOp(lambda x: x * 2))
        assert get_operator("test.mult2") is op_map["test.mult2"]

    def test_jax_path_auto_wrap(self):
        op = get_operator("jax.numpy.tanh")
        import jax.numpy as jnp

        assert float(op.forward(jnp.asarray(0.0))) == 0.0

    def test_unknown(self):
        with pytest.raises(ValueError):
            get_operator("definitely.not.registered")

    def test_workloads_load(self):
        load_workloads()
        for name in ("jnp.add", "jnp.matmul", "nn.Linear", "BatchedEmbedding",
                     "AlexNet"):
            assert name in op_map


class TestBenchmarkRun:
    CONFIG = {
        "jnp.add": {
            "input_data_generator": "DefaultDataGenerator",
            "config": [
                {"input": [{"args": [
                    {"type": "tensor", "dtype": "float32", "shape": [64, 64]},
                    {"type": "tensor", "dtype": "float32", "shape": [64, 64]},
                ]}]}
            ],
        }
    }

    def test_forward_run(self):
        cfg = BenchmarkConfig(self.CONFIG)
        res = Benchmark(cfg, RunOptions(iters=4)).run()
        assert len(res) == 1
        assert res[0]["forward"]["lat_us"] > 0

    def test_backward_run(self):
        cfg = BenchmarkConfig(self.CONFIG)
        res = Benchmark(
            cfg, RunOptions(iters=4, passes="forward,backward")
        ).run()
        assert "backward" in res[0]

    def test_discrete_mode(self):
        cfg = BenchmarkConfig(self.CONFIG)
        res = Benchmark(cfg, RunOptions(iters=4, mode="discrete")).run()
        assert res[0]["forward"]["lat_us_p50"] > 0

    def test_profiler_session_per_op(self, tmp_path):
        """--profile-dir: one jax.profiler session per (op run, pass) with
        per-kernel device times extracted into the record (the reference's
        NCU/NSYS subprocess orchestration analogue,
        build_executor.py:125-151)."""
        import os

        cfg = BenchmarkConfig(self.CONFIG)
        res = Benchmark(
            cfg, RunOptions(iters=2, profile_dir=str(tmp_path),
                            passes="forward,backward")
        ).run()
        for pass_name in ("forward", "backward"):
            prof = res[0][pass_name]["profile"]
            assert os.path.isdir(prof["dir"])
            assert "error" not in prof, prof
            assert prof["device_ops"], prof
            assert all(d["total_us"] > 0 for d in prof["device_ops"])
        # distinct session dirs per pass (the batching boundary)
        assert (res[0]["forward"]["profile"]["dir"]
                != res[0]["backward"]["profile"]["dir"])

    def test_profiler_discrete_mode(self, tmp_path):
        cfg = BenchmarkConfig(self.CONFIG)
        res = Benchmark(
            cfg, RunOptions(iters=2, mode="discrete",
                            profile_dir=str(tmp_path))
        ).run()
        prof = res[0]["forward"]["profile"]
        assert prof["device_ops"], prof

    def test_jsonl_output(self):
        stream = io.StringIO()
        cfg = BenchmarkConfig(self.CONFIG)
        Benchmark(cfg, RunOptions(iters=2, out_stream=stream)).run()
        lines = [json.loads(l) for l in stream.getvalue().splitlines()]
        assert lines[0]["name"] == "jnp.add"

    def test_stop_run_id(self):
        config = {
            "jnp.add": {
                "config": [
                    {"input": [
                        {"args": [
                            {"type": "tensor", "dtype": "float32",
                             "shape": [8, [8, 10, 1], 1], "__range__": ["shape"]},
                            {"type": "tensor", "dtype": "float32", "shape": [8, 8, 1],
                             "__copy__": [{"shape": [1, [0, 1]]}]},
                        ]}
                    ]}
                ]
            }
        }
        cfg = BenchmarkConfig(config)
        res = Benchmark(
            cfg, RunOptions(iters=2, stop_op_run_id="jnp.add:0:1")
        ).run()
        assert len(res) == 2  # stopped after the second run id
