"""Flash-attention kernel parity (ops/attention.py).

The Pallas kernel runs in interpret mode on the CPU mesh; the oracle is
the unfused XLA attention, itself pinned against torch sdpa."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from param_tpu.ops.attention import (
    attention_bytes,
    attention_flops,
    flash_attention,
    mha_reference,
)


def _rand(shape, dtype, seed):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, shape, dtype=jnp.float32).astype(dtype)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_matches_reference(causal, dtype):
    b, h, s, d = 2, 3, 256, 128
    q = _rand((b, h, s, d), dtype, 0)
    k = _rand((b, h, s, d), dtype, 1)
    v = _rand((b, h, s, d), dtype, 2)
    ref = mha_reference(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


def test_flash_decode_rectangular():
    """S_q != S_k with causal: the diagonal sits bottom-right (a decode
    step attends to the whole prefix) — torch sdpa semantics."""
    b, h, sq, sk, d = 1, 2, 128, 512, 128
    q = _rand((b, h, sq, d), jnp.float32, 3)
    k = _rand((b, h, sk, d), jnp.float32, 4)
    v = _rand((b, h, sk, d), jnp.float32, 5)
    ref = mha_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_multiblock_q_and_k():
    b, h, s, d = 1, 1, 1024, 128
    q = _rand((b, h, s, d), jnp.float32, 6)
    k = _rand((b, h, s, d), jnp.float32, 7)
    v = _rand((b, h, s, d), jnp.float32, 8)
    ref = mha_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_reference_matches_torch_sdpa():
    torch = pytest.importorskip("torch")
    b, h, s, d = 2, 2, 64, 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, h, s, d), dtype=np.float32)
    k = rng.standard_normal((b, h, s, d), dtype=np.float32)
    v = rng.standard_normal((b, h, s, d), dtype=np.float32)
    for causal in (False, True):
        want = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            is_causal=causal).numpy()
        got = np.asarray(mha_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_flops_bytes_model():
    assert attention_flops(1, 1, 128, 128, 64) == 2 * 2 * 128 * 128 * 64
    assert attention_flops(1, 1, 128, 128, 64, causal=True) == \
        attention_flops(1, 1, 128, 128, 64) // 2
    assert attention_bytes(1, 1, 128, 256, 64, 2) == \
        2 * (2 * 128 * 64 + 2 * 256 * 64)


def test_flash_mha_grads_match_reference():
    """flash_mha under jax.grad == pure-XLA attention grads (custom_vjp
    recompute path)."""
    from param_tpu.ops.attention import flash_mha

    b, h, s, d = 1, 2, 256, 128
    q = _rand((b, h, s, d), jnp.float32, 10)
    k = _rand((b, h, s, d), jnp.float32, 11)
    v = _rand((b, h, s, d), jnp.float32, 12)

    def loss_flash(q, k, v):
        return jnp.sum(flash_mha(q, k, v, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("causal,sq,sk,bq", [
    (True, 256, 256, 128),    # compacted lower-triangle walk
    (False, 256, 256, 128),   # rectangular dq/dkv grids
    (True, 128, 256, 128),    # decode layout (diag bottom-right)
    (True, 256, 256, 256),    # single-tile causal -> rect masked path
])
def test_flash_bwd_kernels_match_vjp(causal, sq, sk, bq):
    """flash_attention_bwd (Pallas dq + dkv kernels, P recomputed from the
    saved lse) == jax.vjp through the XLA oracle."""
    from param_tpu.ops.attention import _flash_forward, flash_attention_bwd

    b, h, d = 1, 2, 128
    q = _rand((b, h, sq, d), jnp.float32, 20)
    k = _rand((b, h, sk, d), jnp.float32, 21)
    v = _rand((b, h, sk, d), jnp.float32, 22)
    g = _rand((b, h, sq, d), jnp.float32, 23)
    o, lse = _flash_forward(q, k, v, causal=causal, scale=None, block_q=bq,
                            block_k=bq, interpret=True, return_lse=True)
    ref_o, vjp = jax.vjp(
        lambda q, k, v: mha_reference(q, k, v, causal=causal), q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref_o),
                               atol=2e-5, rtol=2e-5)
    got = flash_attention_bwd(q, k, v, o, lse, g, causal=causal,
                              block_q=bq, block_k=bq, interpret=True)
    for name, a, b_ in zip(("dq", "dk", "dv"), got, vjp(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=2e-5, err_msg=name)


def test_flash_mha_bwd_uses_kernels():
    """The custom_vjp backward routes through the Pallas kernels (not the
    XLA-recompute fallback) for tileable shapes."""
    from unittest import mock

    from param_tpu.ops import attention as att

    b, h, s, d = 1, 1, 256, 128
    q, k, v = (_rand((b, h, s, d), jnp.float32, i) for i in (30, 31, 32))
    with mock.patch.object(att, "flash_attention_bwd",
                           wraps=att.flash_attention_bwd) as spy:
        jax.grad(lambda q: jnp.sum(att.flash_mha(q, k, v, True)))(q)
        assert spy.called


def test_flash_sharded_over_heads():
    """Head-parallel flash attention under shard_map on the 8-device mesh
    (tensor-parallel attention: B*H is embarrassingly parallel)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    b, h, s, d = 1, 8, 256, 128
    q = _rand((b, h, s, d), jnp.float32, 13)
    k = _rand((b, h, s, d), jnp.float32, 14)
    v = _rand((b, h, s, d), jnp.float32, 15)
    mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))

    def local(q, k, v):
        return flash_attention(q, k, v, causal=True, block_q=128,
                               block_k=128)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "tp"), P(None, "tp"), P(None, "tp")),
        out_specs=P(None, "tp"), check_vma=False))
    out = fn(q, k, v)
    ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 32])
def test_flash_head_packed(causal, d):
    """d < 128 heads pack 128/d per lane block (auto); parity against
    both the oracle and the forced-unpacked kernel."""
    g = 128 // d
    b, h, s = 2, 2 * g, 256
    q = _rand((b, h, s, d), jnp.float32, 20)
    k = _rand((b, h, s, d), jnp.float32, 21)
    v = _rand((b, h, s, d), jnp.float32, 22)
    ref = mha_reference(q, k, v, causal=causal)
    packed = flash_attention(q, k, v, causal=causal, block_q=128,
                             block_k=128)  # pack_heads=None -> auto on
    unpacked = flash_attention(q, k, v, causal=causal, block_q=128,
                               block_k=128, pack_heads=False)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(unpacked), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_head_packed_rectangular_and_odd_h():
    """Decode layout packs too; an unpackable head count (h % g != 0)
    falls back to the unpacked kernel rather than failing."""
    q = _rand((1, 4, 128, 64), jnp.float32, 23)
    k = _rand((1, 4, 256, 64), jnp.float32, 24)
    v = _rand((1, 4, 256, 64), jnp.float32, 25)
    ref = mha_reference(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # h=3 is not divisible by g=2: auto-pack must quietly stay unpacked
    q3 = _rand((1, 3, 128, 64), jnp.float32, 26)
    out3 = flash_attention(q3, q3, q3, causal=False, block_q=128,
                           block_k=128)
    np.testing.assert_allclose(np.asarray(out3),
                               np.asarray(mha_reference(q3, q3, q3)),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal,d", [(False, 64), (True, 64), (True, 32)])
def test_flash_bwd_head_packed(causal, d):
    """Packed forward lse (g*128 segments) drives the packed backward
    kernels; grads match jax.vjp of the oracle."""
    import param_tpu.ops.attention as att

    g = 128 // d
    b, h, s = 1, 2 * g, 256
    q = _rand((b, h, s, d), jnp.float32, 40) * 0.3
    k = _rand((b, h, s, d), jnp.float32, 41) * 0.3
    v = _rand((b, h, s, d), jnp.float32, 42) * 0.3
    go = _rand((b, h, s, d), jnp.float32, 43)
    o, lse = att._flash_forward(q, k, v, causal=causal, scale=None,
                                block_q=128, block_k=128, interpret=True,
                                return_lse=True)
    assert lse.shape == (b * h // g, s, g * 128)
    dq, dk, dv = att.flash_attention_bwd(q, k, v, o, lse, go,
                                         causal=causal, block_q=128,
                                         block_k=128)
    _, vjp = jax.vjp(
        lambda q, k, v: mha_reference(q, k, v, causal=causal), q, k, v)
    for got, want in zip((dq, dk, dv), vjp(go)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=3e-5)


def test_flash_mha_packed_grads():
    """flash_mha end-to-end at d=64 now rides the packed kernels in both
    directions; grad parity vs the oracle."""
    import param_tpu.ops.attention as att

    b, h, s, d = 1, 4, 256, 64
    q = _rand((b, h, s, d), jnp.float32, 50) * 0.3
    k = _rand((b, h, s, d), jnp.float32, 51) * 0.3
    v = _rand((b, h, s, d), jnp.float32, 52) * 0.3

    def loss_flash(q, k, v):
        return jnp.sum(att.flash_mha(q, k, v, True, None) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, causal=True) ** 2)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   atol=3e-5, rtol=3e-5)


@pytest.mark.parametrize("h,h_kv,d,causal", [
    (8, 2, 128, True), (8, 2, 128, False), (4, 1, 128, True),
    (8, 4, 64, True),  # GQA at d<128 must fall back to unpacked cleanly
])
def test_flash_gqa(h, h_kv, d, causal):
    """Grouped-query attention: kv BlockSpec index maps fold each query
    head onto its kv head — K/V are never repeated in memory."""
    b, s = 1, 256
    q = _rand((b, h, s, d), jnp.float32, 60) * 0.3
    k = _rand((b, h_kv, s, d), jnp.float32, 61) * 0.3
    v = _rand((b, h_kv, s, d), jnp.float32, 62) * 0.3
    got = flash_attention(q, k, v, causal=causal, block_q=128,
                          block_k=128)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_gqa_rejects_nondividing_heads():
    q = _rand((1, 6, 128, 128), jnp.float32, 63)
    kv = _rand((1, 4, 128, 128), jnp.float32, 64)
    with pytest.raises(ValueError, match="kv heads"):
        flash_attention(q, kv, kv)


@pytest.mark.parametrize("w,d", [(128, 128), (256, 128), (128, 64)])
def test_flash_sliding_window(w, d):
    """Mistral-style sliding-window attention: band tiles only (the
    compacted walk gains a lower bound and per-row first-tile init)."""
    b, h, s = 1, 2, 512
    q = _rand((b, h, s, d), jnp.float32, 70) * 0.3
    k = _rand((b, h, s, d), jnp.float32, 71) * 0.3
    v = _rand((b, h, s, d), jnp.float32, 72) * 0.3
    got = flash_attention(q, k, v, causal=True, window=w, block_q=128,
                          block_k=128)
    want = mha_reference(q, k, v, causal=True, window=w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_window_requires_causal():
    q = _rand((1, 2, 256, 128), jnp.float32, 73)
    with pytest.raises(NotImplementedError, match="causal"):
        flash_attention(q, q, q, causal=False, window=64)
