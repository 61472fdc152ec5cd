"""Pallas ring-collective kernel tests (interpret mode on the CPU mesh —
remote DMA is emulated; on real multi-chip TPU the same kernels drive ICI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from param_tpu.ops.ring_collectives import ring_all_gather, ring_all_reduce


@pytest.fixture(scope="module")
def mesh4():
    return Mesh(np.array(jax.devices()[:4]), ("x",))


class TestRingAllGather:
    def test_matches_lax(self, mesh4):
        def ag(x):
            return ring_all_gather(x, "x").reshape(-1)

        f = jax.jit(jax.shard_map(ag, mesh=mesh4, in_specs=P("x"),
                                  out_specs=P("x"), check_vma=False))
        x = jnp.arange(4 * 8, dtype=jnp.float32)
        got = np.asarray(f(x)).reshape(4, 32)
        for d in range(4):
            np.testing.assert_allclose(got[d], np.arange(32, dtype=np.float32))

    def test_2d_payload(self, mesh4):
        def ag(x):
            return ring_all_gather(x, "x")

        f = jax.jit(jax.shard_map(ag, mesh=mesh4, in_specs=P("x", None),
                                  out_specs=P("x", None, None),
                                  check_vma=False))
        x = jnp.asarray(np.random.default_rng(0).random((8, 16),
                                                        dtype=np.float32))
        out = np.asarray(f(x))  # (4*4, 2, 16) per-device stacked
        got = out.reshape(4, 4, 2, 16)
        expect = np.asarray(x).reshape(4, 2, 16)
        for d in range(4):
            np.testing.assert_allclose(got[d], expect)


class TestRingAllReduce:
    def test_matches_psum(self, mesh4):
        def ar(x):
            return ring_all_reduce(x, "x")

        f = jax.jit(jax.shard_map(ar, mesh=mesh4, in_specs=P("x"),
                                  out_specs=P("x"), check_vma=False))
        x = jnp.asarray(np.random.default_rng(1).random(4 * 16,
                                                        dtype=np.float32))
        got = np.asarray(f(x)).reshape(4, 16)
        expect = np.asarray(x).reshape(4, 16).sum(axis=0)
        for d in range(4):
            np.testing.assert_allclose(got[d], expect, rtol=1e-5)


class TestBidirRingAllGather:
    @pytest.mark.parametrize("n", [4, 8])
    def test_matches_lax(self, n):
        from param_tpu.ops.ring_collectives import ring_all_gather_bidir

        mesh = Mesh(np.array(jax.devices()[:n]), ("x",))

        def ag(x):
            return ring_all_gather_bidir(x, "x").reshape(-1)

        f = jax.jit(jax.shard_map(ag, mesh=mesh, in_specs=P("x"),
                                  out_specs=P("x"), check_vma=False))
        x = jnp.arange(n * 8, dtype=jnp.float32)
        got = np.asarray(f(x)).reshape(n, n * 8)
        for d in range(n):
            np.testing.assert_allclose(got[d], np.arange(n * 8,
                                                         dtype=np.float32))


class TestRingAllReduce8:
    def test_n8_matches_psum(self):
        from param_tpu.ops.ring_collectives import ring_all_reduce

        mesh = Mesh(np.array(jax.devices()[:8]), ("x",))

        def ar(x):
            return ring_all_reduce(x, "x")

        f = jax.jit(jax.shard_map(ar, mesh=mesh, in_specs=P("x"),
                                  out_specs=P("x"), check_vma=False))
        x = jnp.asarray(np.random.default_rng(2).random(8 * 16,
                                                        dtype=np.float32))
        got = np.asarray(f(x)).reshape(8, 16)
        expect = np.asarray(x).reshape(8, 16).sum(axis=0)
        for d in range(8):
            np.testing.assert_allclose(got[d], expect, rtol=1e-5)


class TestLoopbackSlice:
    """Single-chip silicon validation slice (VERDICT r4 next #8): the
    RDMA descriptor/semaphore path as a self-copy.  On the CPU mesh this
    runs in interpret mode; on a real chip the same call validated
    bit-exact on 2026-08-20 (barrier semaphore + DMA start/wait)."""

    def test_loopback_roundtrip(self):
        from param_tpu.ops.ring_collectives import loopback_remote_copy

        mesh = Mesh(np.array(jax.devices()[:1]), ("x",))
        x = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
        f = jax.jit(jax.shard_map(
            lambda x: loopback_remote_copy(x, "x"), mesh=mesh,
            in_specs=(P(),), out_specs=P(), check_vma=False))
        np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(x))
