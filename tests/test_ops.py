"""Compute-tier kernel correctness (GEMM, EmbeddingBag, MLP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.ops.embedding import (
    embedding_bag,
    embedding_bag_grad,
    embedding_bag_pallas,
    embedding_bytes,
    pad_ragged_indices,
    with_pad_row,
)
from param_tpu.ops.matmul import gemm_flops, matmul, matmul_pallas
from param_tpu.ops.mlp import (
    init_mlp,
    infer_step,
    make_optimizer,
    make_train_step,
    mlp_flops,
    mlp_forward,
)


class TestMatmul:
    def test_xla_matches_numpy(self):
        a = np.random.rand(64, 32).astype(np.float32)
        b = np.random.rand(32, 48).astype(np.float32)
        np.testing.assert_allclose(np.asarray(matmul(a, b)), a @ b, rtol=1e-5)

    def test_pallas_matches_xla(self):
        a = np.random.rand(256, 256).astype(np.float32)
        b = np.random.rand(256, 256).astype(np.float32)
        out = matmul_pallas(
            jnp.asarray(a), jnp.asarray(b), block_m=128, block_n=128, block_k=128
        )
        np.testing.assert_allclose(np.asarray(out), a @ b, rtol=1e-4)

    def test_pallas_bf16(self):
        a = jnp.ones((128, 128), jnp.bfloat16)
        b = jnp.ones((128, 128), jnp.bfloat16)
        out = matmul_pallas(a, b, block_m=128, block_n=128, block_k=128)
        np.testing.assert_allclose(np.asarray(out, dtype=np.float32), 128.0)

    def test_pallas_bad_blocks(self):
        a = jnp.ones((100, 100))
        with pytest.raises(ValueError):
            matmul_pallas(a, a, block_m=64, block_n=64, block_k=64)

    def test_flops(self):
        assert gemm_flops(2, 3, 4) == 48

    def test_weight_resident_matches_einsum(self):
        """S small-M GEMMs against one VMEM-resident B (the reference's
        warm-weight torch.mm loop semantics, pytorch_gemm.py:95-137)."""
        from param_tpu.ops.matmul import matmul_weight_resident

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.random((4, 64, 128), dtype=np.float32))
        b = jnp.asarray(rng.random((128, 256), dtype=np.float32))
        got = matmul_weight_resident(a, b, block_n=128)
        want = np.einsum("smk,kn->smn", np.asarray(a), np.asarray(b))
        assert got.shape == (4, 64, 256)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


class TestEmbeddingBag:
    def test_sum_pooling(self):
        table = np.arange(40, dtype=np.float32).reshape(10, 4)
        idx = np.array([[0, 1], [2, 2], [9, 0]], dtype=np.int32)
        out = embedding_bag(jnp.asarray(table), jnp.asarray(idx))
        expect = np.stack(
            [table[0] + table[1], table[2] * 2, table[9] + table[0]]
        )
        np.testing.assert_allclose(np.asarray(out), expect)

    def test_weighted(self):
        table = np.ones((4, 8), dtype=np.float32)
        idx = np.array([[0, 1]], dtype=np.int32)
        w = np.array([[2.0, 3.0]], dtype=np.float32)
        out = embedding_bag(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(out), 5.0)

    def test_pallas_matches_xla(self):
        rng = np.random.default_rng(0)
        table = rng.random((64, 128), dtype=np.float32)
        idx = rng.integers(0, 64, size=(16, 4)).astype(np.int32)
        ref = embedding_bag(jnp.asarray(table), jnp.asarray(idx))
        out = embedding_bag_pallas(jnp.asarray(table), jnp.asarray(idx))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)

    def test_ragged_padding(self):
        indices = np.array([5, 1, 2, 7], dtype=np.int64)
        offsets = np.array([0, 1, 3], dtype=np.int64)  # bags: [5], [1,2], [7]
        dense, mx = pad_ragged_indices(indices, offsets, num_rows=10)
        assert mx == 2
        table = with_pad_row(jnp.asarray(np.random.rand(10, 4).astype(np.float32)))
        out = embedding_bag(table, jnp.asarray(dense))
        np.testing.assert_allclose(
            np.asarray(out)[0], np.asarray(table)[5]
        )  # singleton bag unaffected by pad row
        np.testing.assert_allclose(
            np.asarray(out)[1], np.asarray(table)[1] + np.asarray(table)[2]
        )

    def test_grad_scatter_add(self):
        table = jnp.zeros((6, 4))
        idx = jnp.asarray(np.array([[0, 1], [1, 2]], dtype=np.int32))
        g = jnp.ones((2, 4))
        dtable = embedding_bag_grad(table, idx, g)
        np.testing.assert_allclose(np.asarray(dtable)[1], 2.0)  # row 1 used twice
        np.testing.assert_allclose(np.asarray(dtable)[5], 0.0)

    def test_bytes_formula(self):
        assert embedding_bytes(2048, 30, 128, 4) == 2048 * 30 * 128 * 4



class TestMlp:
    def test_forward_shapes(self):
        params = init_mlp(jax.random.PRNGKey(0), [16, 32, 8])
        x = jnp.ones((4, 16))
        out = mlp_forward(params, x)
        assert out.shape == (4, 8)

    def test_train_step_reduces_loss(self):
        layers = [8, 16, 1]
        params = init_mlp(jax.random.PRNGKey(0), layers)
        opt = make_optimizer("sgd", lr=0.05)
        opt_state = opt.init(params)
        step = make_train_step(opt)
        x = jnp.asarray(np.random.rand(32, 8).astype(np.float32))
        y = jnp.sum(x, axis=1, keepdims=True)
        losses = []
        for _ in range(20):
            params, opt_state, l = step(params, opt_state, x, y)
            losses.append(float(l))
        assert losses[-1] < losses[0]

    def test_adagrad(self):
        params = init_mlp(jax.random.PRNGKey(1), [4, 4])
        opt = make_optimizer("adagrad")
        step = make_train_step(opt)
        s = opt.init(params)
        x = jnp.ones((2, 4))
        y = jnp.zeros((2, 4))
        params2, _, _ = step(params, s, x, y)
        assert not np.allclose(
            np.asarray(params2[0][0]), np.asarray(params[0][0])
        )

    def test_flops(self):
        assert mlp_flops([4, 8, 2], batch=10) == 6 * (32 + 16) * 10
        assert mlp_flops([4, 8], batch=1, fwd_only=True) == 2 * 32

    def test_infer(self):
        params = init_mlp(jax.random.PRNGKey(0), [4, 4])
        assert infer_step(params, jnp.ones((2, 4))).shape == (2, 4)


class TestPadTableDim:
    def test_pads_to_multiple(self):
        from param_tpu.ops.embedding import pad_table_dim

        t = jnp.ones((10, 56))
        p = pad_table_dim(t)
        assert p.shape == (10, 64)
        np.testing.assert_allclose(np.asarray(p)[:, 56:], 0.0)

    def test_noop_when_aligned(self):
        from param_tpu.ops.embedding import pad_table_dim

        t = jnp.ones((10, 128))
        assert pad_table_dim(t) is t
