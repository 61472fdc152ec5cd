"""Quantized-comm and inference-tier tests (CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.backend.base import CollectiveArgs
from param_tpu.comms.quantization import (
    check_quant_args,
    dequantize,
    quantize,
    quantized_all_reduce,
)
from param_tpu.ops.inference import (
    bench_inference,
    mlp_forward_int8,
    quantize_weights_int8,
)
from param_tpu.ops.mlp import init_mlp, mlp_forward
import jax


class TestQuantize:
    def test_bitwidth16(self):
        x = jnp.asarray(np.random.rand(64).astype(np.float32))
        q, s = quantize(x, 16)
        assert q.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(dequantize(q, s)), np.asarray(x), rtol=1e-2
        )

    def test_bitwidth8_roundtrip(self):
        x = jnp.asarray((np.random.rand(256) * 10 - 5).astype(np.float32))
        q, s = quantize(x, 8)
        assert q.dtype == jnp.int8
        out = dequantize(q, s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.05)

    def test_zero_tensor(self):
        q, s = quantize(jnp.zeros(16), 8)
        np.testing.assert_allclose(np.asarray(dequantize(q, s)), 0.0)

    def test_check_args(self):
        check_quant_args("all_reduce", 8)
        with pytest.raises(ValueError):
            check_quant_args("all_reduce", 4)
        with pytest.raises(ValueError):
            check_quant_args("broadcast", 8)


class TestQuantizedAllReduce:
    def test_int8_matches_fp32(self, backend):
        x = backend.alloc_per_rank(
            lambda r: np.full((16,), (r + 1) / 8.0, dtype=np.float32)
        )
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, bitwidth=8))
        backend.complete_ops()
        expect = sum((r + 1) / 8.0 for r in range(8))
        np.testing.assert_allclose(np.asarray(out), expect, rtol=0.02)

    def test_bf16_matches_fp32(self, backend):
        x = backend.alloc_per_rank(
            lambda r: np.full((16,), r + 1, dtype=np.float32)
        )
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, bitwidth=16))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 36.0, rtol=1e-2)

    def test_quant_overhead_measurable(self, backend):
        x = backend.alloc_ones((64,), jnp.float32)
        out = backend.quant_overhead(CollectiveArgs(in_tensor=x, bitwidth=8))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=0.02)


class TestQuantizedReduce:
    """Quantized rooted reduce (reference: quantize hooks wrap reduce too,
    pytorch_dist_backend.py:48-164)."""

    @pytest.mark.parametrize("bitwidth", [16, 8])
    def test_matches_fp32_at_root(self, backend, bitwidth):
        x = backend.alloc_per_rank(
            lambda r: np.full((16,), (r + 1) / 8.0, dtype=np.float32)
        )
        out = backend.reduce(
            CollectiveArgs(in_tensor=x, bitwidth=bitwidth, dst_rank=2))
        backend.complete_ops()
        expect = sum((r + 1) / 8.0 for r in range(8))
        per_rank = np.asarray(out).reshape(8, -1)
        np.testing.assert_allclose(per_rank[2], expect, rtol=0.03)
        np.testing.assert_allclose(per_rank[[r for r in range(8) if r != 2]],
                                   0.0, atol=1e-6)

    def test_nonsum_ignores_bitwidth(self, backend):
        """max-reduce at bitwidth 8 must still run the exact rooted max."""
        x = backend.alloc_per_rank(
            lambda r: np.full((8,), float(r + 1), dtype=np.float32)
        )
        out = backend.reduce(
            CollectiveArgs(in_tensor=x, bitwidth=8, red_op="max", dst_rank=0))
        backend.complete_ops()
        np.testing.assert_allclose(np.asarray(out).reshape(8, -1)[0], 8.0)


class TestQuantCommSplit:
    def test_buckets_from_synthetic_trace(self):
        from param_tpu.trace.device_trace import quant_comm_split

        threads = {(1, 1): "/device:TPU:0", (1, 2): "host"}
        events = [
            {"name": "all-reduce.1", "pid": 1, "tid": 1, "ph": "X",
             "dur": 100.0},
            {"name": "fusion.7", "pid": 1, "tid": 1, "ph": "X", "dur": 40.0,
             "args": {"long_name": "jit(f)/quantize/convert"}},
            {"name": "fusion.9", "pid": 1, "tid": 1, "ph": "X", "dur": 25.0,
             "args": {"long_name": "jit(f)/dequantize/multiply"}},
            {"name": "copy.2", "pid": 1, "tid": 1, "ph": "X", "dur": 5.0},
            {"name": "host-thing", "pid": 1, "tid": 2, "ph": "X",
             "dur": 999.0},
        ]
        split = quant_comm_split(events, threads, thread_filter="TPU")
        assert split["comm"]["total_us"] == 100.0
        assert split["quant"]["total_us"] == 40.0
        assert split["dequant"]["total_us"] == 25.0
        assert split["other"]["total_us"] == 5.0


class TestInt8Inference:
    def test_close_to_fp32(self):
        params = init_mlp(jax.random.PRNGKey(0), [32, 64, 8])
        x = jnp.asarray(np.random.rand(4, 32).astype(np.float32))
        ref = np.asarray(mlp_forward(params, x))
        q = quantize_weights_int8(params)
        got = np.asarray(mlp_forward_int8(q, x.astype(jnp.bfloat16)),
                         dtype=np.float32)
        np.testing.assert_allclose(got, ref, atol=0.35, rtol=0.1)

    def test_bench_runs(self):
        res = bench_inference([(2, 32, 32, 32, 16)], dtype="int8",
                              n_hi=4, reps=1)
        assert res[0].qps > 0

    def test_bench_fp32(self):
        res = bench_inference([(2, 32, 32, 32, 16)], dtype="float32",
                              n_hi=4, reps=1)
        assert res[0].tflops > 0


class TestInt4Inference:
    def test_close_to_dequant_oracle(self):
        from param_tpu.ops.inference import (
            cast_int4_mlp, mlp_forward_int4, quantize_weights_int4)

        params = init_mlp(jax.random.PRNGKey(0), [64, 64, 8])
        x = jnp.asarray(np.random.rand(4, 64).astype(np.float32))
        q = quantize_weights_int4(params, group=32)
        # oracle: explicit dequant + the same fp forward
        deq = [(jnp.asarray(np.asarray(qc, np.float32)
                            * np.repeat(np.asarray(s), 32, axis=0)), b)
               for qc, s, b in q]
        ref = np.asarray(mlp_forward(
            jax.tree.map(lambda a: a.astype(jnp.bfloat16), deq),
            x.astype(jnp.bfloat16)), dtype=np.float32)
        for qq in (q, cast_int4_mlp(q)):  # carrier and pre-cast s4
            got = np.asarray(mlp_forward_int4(qq, x.astype(jnp.bfloat16)),
                             dtype=np.float32)
            np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)

    def test_bench_runs(self):
        res = bench_inference([(2, 64, 64, 32, 16)], dtype="int4",
                              n_hi=4, reps=1)
        assert res[0].qps > 0


class TestQuantPadding:
    def test_int8_allreduce_odd_elements(self, backend):
        """Element counts that don't divide the group size must pad/slice."""
        x = backend.alloc_per_rank(
            lambda r: np.full((3,), (r + 1) / 4.0, dtype=np.float32)
        )
        out = backend.all_reduce(CollectiveArgs(in_tensor=x, bitwidth=8))
        backend.complete_ops()
        expect = sum((r + 1) / 4.0 for r in range(8))
        assert np.asarray(out).shape == (24,)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=0.02)
