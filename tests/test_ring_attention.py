"""Ring (sequence-parallel) attention vs the single-device oracle on the
8-device CPU mesh (ops/ring_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from param_tpu.ops.attention import mha_reference
from param_tpu.ops.ring_attention import ring_attention


def _rand(shape, seed):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32) * 0.3


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("n,d", [(8, 64), (4, 128)])
def test_matches_oracle(causal, n, d):
    b, h, s = 1, 2, 1024
    q, k, v = (_rand((b, h, s, d), i) for i in range(3))
    mesh = Mesh(np.array(jax.devices()[:n]), ("sp",))
    fn = jax.jit(jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp", causal=causal),
        mesh=mesh,
        in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None), check_vma=False))
    got = fn(q, k, v)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5)


def test_single_shard_degenerates():
    b, h, s, d = 1, 2, 256, 64
    q, k, v = (_rand((b, h, s, d), i + 10) for i in range(3))
    mesh = Mesh(np.array(jax.devices()[:1]), ("sp",))
    fn = jax.jit(jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp", causal=True),
        mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None), check_vma=False))
    np.testing.assert_allclose(
        np.asarray(fn(q, k, v)),
        np.asarray(mha_reference(q, k, v, causal=True)),
        atol=3e-5, rtol=3e-5)
