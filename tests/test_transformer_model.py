"""Transformer block model family (models/transformer.py) on the
8-device CPU mesh: single-chip parity flash-vs-xla, and the Megatron
dp x tp sharded train step vs the unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from param_tpu.models.transformer import (
    TransformerConfig,
    block_apply,
    init_params,
    make_sharded_train_step,
    make_train_step,
    place,
)


def _cfg(**kw):
    base = dict(batch=4, seq=128, emb=128, heads=2, ffn=256,
                dtype="float32")
    base.update(kw)
    return TransformerConfig(**base)


def _inputs(cfg, seed=0):
    k = jax.random.PRNGKey(seed)
    params = init_params(k, cfg)
    x = (jax.random.normal(jax.random.fold_in(k, 1),
                           (cfg.batch, cfg.seq, cfg.emb), jnp.float32)
         * 0.1).astype(jnp.dtype(cfg.dtype))
    return params, x


def test_flash_matches_xla_block():
    cfg = _cfg(attention="flash")
    params, x = _inputs(cfg)
    out_f = block_apply(params, x, cfg)
    out_x = block_apply(params, x, _cfg(attention="xla"))
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               atol=2e-5, rtol=2e-5)


def test_train_step_reduces_loss():
    cfg = _cfg()
    params, x = _inputs(cfg)
    step = jax.jit(make_train_step(cfg, lr=1e-2))
    losses = []
    for _ in range(4):
        params, loss = step(params, x)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_sharded_step_matches_unsharded(dp, tp):
    cfg = _cfg(attention="xla")
    params, x = _inputs(cfg)
    want_p, want_loss = jax.jit(make_train_step(cfg))(params, x)

    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    p_sh, x_sh = place(params, x, mesh, cfg)
    step = make_sharded_train_step(mesh, cfg)
    got_p, got_loss = step(p_sh, x_sh)
    assert float(got_loss) == pytest.approx(float(want_loss), rel=1e-5)
    for ka in ("wqkv", "wo", "w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(got_p[ka]), np.asarray(want_p[ka]),
            atol=1e-5, rtol=1e-5)


class TestPipelineParallel:
    """GPipe fill/drain over mesh axis 'pp' (models/transformer.py
    make_pipeline_train_step): loss and per-stage SGD updates must match
    the SEQUENTIAL multi-block oracle exactly — forward schedule,
    autodiff'd reverse pipeline, and the psum loss broadcast all checked
    by one number."""

    @pytest.mark.parametrize("n_stages,m", [(4, 4), (8, 2), (4, 8)])
    def test_matches_sequential(self, n_stages, m):
        cfg = _cfg(batch=m * 2, seq=64, emb=64, heads=2, ffn=128,
                   attention="xla")
        from param_tpu.models.transformer import (
            init_stacked_params, make_pipeline_train_step)

        key = jax.random.PRNGKey(7)
        stacked = init_stacked_params(key, cfg, n_stages)
        x = (jax.random.normal(jax.random.fold_in(key, 1),
                               (cfg.batch, cfg.seq, cfg.emb), jnp.float32)
             * 0.1)

        # sequential oracle: blocks applied in stage order, mean-square
        # loss, SGD on every stage's params
        def seq_loss(stacked):
            out = x
            for i in range(n_stages):
                p = jax.tree.map(lambda t: t[i], stacked)
                out = block_apply(p, out, cfg)
            return jnp.mean(jnp.square(out.astype(jnp.float32)))

        want_loss, want_g = jax.value_and_grad(seq_loss)(stacked)
        want_p = jax.tree.map(
            lambda w, gw: w - 1e-4 * gw, stacked, want_g)

        mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pp",))
        step = make_pipeline_train_step(mesh, cfg, n_microbatches=m,
                                        lr=1e-4)
        got_p, got_loss = step(stacked, x)
        assert float(got_loss) == pytest.approx(float(want_loss),
                                                rel=1e-5)
        np.testing.assert_allclose(np.asarray(got_p["wqkv"]),
                                   np.asarray(want_p["wqkv"]),
                                   atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(got_p["w2"]),
                                   np.asarray(want_p["w2"]),
                                   atol=1e-6, rtol=1e-5)


class TestServingCache:
    """KV-cache prefill + decode (models/transformer.py): feeding the
    suffix token-by-token through decode_step must reproduce the full
    causal forward exactly."""

    def test_cached_decode_matches_full_forward(self):
        cfg = _cfg(batch=2, seq=48, emb=64, heads=4, attention="xla")
        from param_tpu.models.transformer import decode_step, prefill

        params, x = _inputs(cfg)
        full = block_apply(params, x, cfg)

        t0 = 32
        cache_len = cfg.seq
        out_pre, cache = prefill(
            params, x[:, :t0],
            _cfg(batch=2, seq=t0, emb=64, heads=4, attention="xla"),
            cache_len)
        np.testing.assert_allclose(np.asarray(out_pre),
                                   np.asarray(full[:, :t0]),
                                   atol=2e-5, rtol=2e-5)
        step = jax.jit(lambda p, c, xt, pos: decode_step(p, c, xt, pos,
                                                         cfg))
        for t in range(t0, cfg.seq):
            out_t, cache = step(params, cache, x[:, t:t + 1],
                                jnp.int32(t))
            np.testing.assert_allclose(np.asarray(out_t),
                                       np.asarray(full[:, t:t + 1]),
                                       atol=3e-5, rtol=3e-5)

    def test_gqa_cached_decode_matches_full_forward(self):
        """GQA geometry (kv_heads < heads, llama-3 style): token-by-token
        cached decode must reproduce the full causal forward, whose
        attention broadcasts each kv head over its query group
        (ops/attention.mha_reference)."""
        from param_tpu.models.transformer import decode_step, prefill

        cfg = _cfg(batch=2, seq=32, emb=128, heads=8, attention="xla",
                   kv_heads=2)
        params, x = _inputs(cfg)
        full = block_apply(params, x, cfg)
        t0 = 24
        _, cache = prefill(
            params, x[:, :t0],
            _cfg(batch=2, seq=t0, emb=128, heads=8, attention="xla",
                 kv_heads=2),
            cfg.seq)
        assert cache["k"].shape == (2, 2, cfg.seq, 16)  # kvh=2 cache
        step = jax.jit(lambda p, c, xt, pos: decode_step(p, c, xt, pos,
                                                         cfg))
        for t in range(t0, cfg.seq):
            out_t, cache = step(params, cache, x[:, t:t + 1],
                                jnp.int32(t))
            np.testing.assert_allclose(np.asarray(out_t),
                                       np.asarray(full[:, t:t + 1]),
                                       atol=3e-5, rtol=3e-5)

    def test_windowed_decode_matches_windowed_oracle(self):
        """decode_step(window=W) must equal the full forward computed
        with sliding-window attention at the same position."""
        from param_tpu.models.transformer import decode_step, prefill
        from param_tpu.ops.attention import mha_reference

        cfg = _cfg(batch=1, seq=32, emb=64, heads=4, attention="xla")
        params, x = _inputs(cfg)
        W = 8
        t0 = 24
        _, cache = prefill(
            params, x[:, :t0],
            _cfg(batch=1, seq=t0, emb=64, heads=4, attention="xla"),
            cfg.seq)
        out_t, _ = decode_step(params, cache, x[:, t0:t0 + 1],
                               jnp.int32(t0), cfg, window=W)
        # oracle: full block forward where attention is windowed
        # (block_apply imports mha_reference at call time, so patching
        # the source module routes it through the windowed variant)
        import param_tpu.models.transformer as tm
        import param_tpu.ops.attention as att
        from unittest import mock

        with mock.patch.object(att, "mha_reference",
                               lambda q, k, v, causal=False, **kw:
                               mha_reference(q, k, v, causal=True,
                                             window=W)):
            full = tm.block_apply(params, x[:, :t0 + 1],
                                  _cfg(batch=1, seq=t0 + 1, emb=64,
                                       heads=4, attention="xla"))
        np.testing.assert_allclose(np.asarray(out_t),
                                   np.asarray(full[:, -1:]),
                                   atol=3e-5, rtol=3e-5)


class TestQuantizedServing:
    """Weight-only int8/int4 serving paths (models/transformer.py):
    the quantized _mm must match a matmul against the explicitly
    dequantized weights exactly (the compute path is the same bf16 MXU
    pass), and the whole quantized decode step must stay within the
    quantization error of the fp step."""

    def test_int4_mm_matches_dequant_oracle(self):
        from param_tpu.models.transformer import (
            _mm, cast_int4_params, quantize_block_weights_int4)

        r = np.random.default_rng(0)
        w = jnp.asarray(r.standard_normal((256, 192),
                                          dtype=np.float32) * 0.05)
        qp = quantize_block_weights_int4(
            {"wqkv": w, "wo": w, "w1": w, "w2": w}, group=64)
        q, scale, g = qp["wqkv"]
        assert q.shape == (256, 192) and q.dtype == jnp.int8
        assert scale.shape == (256 // 64, 192)
        wd = (np.asarray(q, np.float32)
              * np.repeat(np.asarray(scale), 64, axis=0))
        # round-trip quantization error is bounded by half an int4 step
        half_step = np.asarray(scale, np.float32).max() / 2
        assert np.abs(wd - np.asarray(w)).max() <= half_step + 1e-6
        x = jnp.asarray(r.standard_normal((3, 256),
                                          dtype=np.float32) * 0.1)
        want = np.asarray(x @ jnp.asarray(wd))
        got = np.asarray(_mm(x, qp["wqkv"]))          # int8 carrier
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)
        got4 = np.asarray(_mm(x, cast_int4_params(qp)["wqkv"]))  # s4
        np.testing.assert_allclose(got4, want, atol=5e-3, rtol=0)

    def test_int4_pallas_kernel_matches_oracle(self):
        """The nibble-packed Pallas path (ops/matmul.matmul_int4) — kept
        as the in-kernel A/B to the XLA s4 path — must match the
        dequantized-weight oracle bit-for-bit up to bf16 rounding."""
        from param_tpu.ops.matmul import matmul_int4, pack_int4

        r = np.random.default_rng(2)
        k, n, g = 512, 256, 128
        w = jnp.asarray(r.standard_normal((k, n), dtype=np.float32) * 0.05)
        x = jnp.asarray(r.standard_normal((5, k), dtype=np.float32) * 0.1)
        packed, scale = pack_int4(w, g)
        pn = np.asarray(packed, np.int32)
        wd = np.zeros((k, n), np.float32)
        wd[0::2] = (pn & 15) - 8          # +8-biased low nibble
        wd[1::2] = np.right_shift(pn, 4)  # arithmetic-shift high nibble
        wd *= np.repeat(np.asarray(scale), g, axis=0)
        want = np.asarray(x.astype(jnp.bfloat16)).astype(np.float32) @ wd
        for variant in ("tile-scale", "group-dots"):
            got = np.asarray(matmul_int4(x, packed, scale,
                                         out_dtype=jnp.float32,
                                         variant=variant))
            np.testing.assert_allclose(got, want, atol=5e-3, rtol=0)

    @pytest.mark.parametrize("bits", [8, 4])
    def test_quantized_decode_step_close_to_fp(self, bits):
        from param_tpu.models.transformer import (
            decode_step, prefill, quantize_block_weights_int4,
            quantize_block_weights_int8)

        cfg = _cfg(batch=2, seq=32, emb=128, heads=4, attention="xla")
        params, x = _inputs(cfg)
        t0 = 24
        _, cache = prefill(
            params, x[:, :t0],
            _cfg(batch=2, seq=t0, emb=128, heads=4, attention="xla"),
            cfg.seq)
        ref, _ = decode_step(params, cache, x[:, t0:t0 + 1],
                             jnp.int32(t0), cfg)
        qparams = (quantize_block_weights_int8(params) if bits == 8
                   else quantize_block_weights_int4(params, group=64))
        got, _ = decode_step(qparams, cache, x[:, t0:t0 + 1],
                             jnp.int32(t0), cfg)
        rel = (np.abs(np.asarray(got) - np.asarray(ref)).max()
               / np.abs(np.asarray(ref)).max())
        assert rel < (0.05 if bits == 8 else 0.25), rel


def test_et_capture_replay_of_train_step():
    """The jaxpr execution-trace tier (trace/capture.py) composes with
    the transformer family: capture one train step, replay op-by-op,
    outputs must match (the dryrun path-4 contract, on this model)."""
    from param_tpu.trace.capture import capture_execution_trace
    from param_tpu.trace.et_replay import EtReplayManager

    cfg = _cfg(batch=2, seq=64, emb=64, heads=2, ffn=128,
               attention="xla")
    params, x = _inputs(cfg)
    step = make_train_step(cfg, lr=1e-3)
    et = capture_execution_trace(step, params, x)
    flat_in, _ = jax.tree.flatten((params, x))
    mgr = EtReplayManager(
        et, inputs={t: v for t, v in zip(et.in_tensors, flat_in)})
    out = mgr.replay(iters=1)
    assert not out["errors"], out["errors"]
    want = step(params, x)
    flat_want, _ = jax.tree.flatten(want)
    for tid, w in zip(et.out_tensors, flat_want):
        np.testing.assert_allclose(np.asarray(mgr.registry[tid]),
                                   np.asarray(w), rtol=1e-5, atol=1e-5)
