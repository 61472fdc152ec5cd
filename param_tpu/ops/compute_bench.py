"""Compute-tier benchmark runners: GEMM, EmbeddingBag, MLP.

TPU-native counterpart of the reference's standalone compute benches
(``train/compute/pt/pytorch_gemm.py`` / ``pytorch_emb.py`` /
``pytorch_linear.py``) with their metric formulas (TF/s = 2MNK/t;
GB/s = batch*nnz*dim*elem/t; QPS = batch/t, TF/s = flops*batch*(2|6)/t)
plus roofline fractions per chip.

All measurements are scalar-fetch chains (measure_chain) with per-step input
perturbation — the defeat-DCE concern the reference handles at
pytorch_gemm.py:44-50 ("XLA lazy evaluation") taken to its conclusion.
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from param_tpu.comms.timing import measure_chain
from param_tpu.ops.embedding import embedding_bytes
from param_tpu.ops.matmul import gemm_flops, matmul_pallas
from param_tpu.ops.mlp import init_mlp, make_optimizer, mlp_flops
from param_tpu.utils.chip import detect_chip, matmul_roofline_tflops
from param_tpu.utils.dtypes import dtype_from_name, dtype_size
from param_tpu.utils.logger import ComputePerfMetrics, emit_metrics

log = logging.getLogger(__name__)


@dataclass
class ComputeResult:
    op: str
    shape: tuple
    lat_us: float
    tflops: float = 0.0
    gbs: float = 0.0
    qps: float = 0.0
    roofline_frac: float = 0.0


def _report(res: ComputeResult, dtype: str):
    emit_metrics(
        ComputePerfMetrics(
            op=res.op, dtype=dtype, shape=list(res.shape), lat_us=res.lat_us,
            tflops=res.tflops, gbs=res.gbs, roofline_frac=res.roofline_frac,
        )
    )
    return res


# ------------------------------------------------------------------- GEMM
def bench_gemm(
    shapes: List[tuple],
    dtype: str = "float32",
    n_hi: int = 16,
    reps: int = 2,
    use_pallas: bool = False,
    precision: str = "default",
    weight_resident: int = 0,
) -> List[ComputeResult]:
    """(reference: pytorch_gemm.py measure/measure_xla)

    ``precision``: XLA matmul precision.  NOTE: 'default' on TPU computes
    f32 matmuls with bf16 multiplications (f32 accumulation) — the moral
    equivalent of torch's TF32-by-default on GPU, so defaults-vs-defaults
    is the fair reference comparison; pass 'highest' for true f32
    multiplication passes.

    ``weight_resident``: when S > 0, time S GEMMs sharing ONE weight with B
    held in VMEM across the steps (ops.matmul.matmul_weight_resident) and
    report per-GEMM numbers.  This matches the reference's measurement
    contract — its bench loops ``torch.mm`` with the SAME B
    (pytorch_gemm.py:95-137), so on GPU the weight is L2-resident after
    iteration one; cold-B small-M GEMMs on TPU are memory-bound instead
    (see RESULTS.md "Small-M GEMM study": 42% cold vs 79% weight-resident
    at (128,4096,4096) bf16)."""
    from jax import lax as _lax

    dt = dtype_from_name(dtype)
    chip = detect_chip()
    peak = matmul_roofline_tflops(chip, dtype)
    prec = (
        _lax.Precision.HIGHEST if precision == "highest" else _lax.Precision.DEFAULT
    )
    results = []
    for m, n, k in shapes:
        rng = np.random.default_rng(0)
        a = (jnp.asarray(rng.random((m, k), dtype=np.float32)) * 0.01).astype(dt)
        b = (jnp.asarray(rng.random((k, n), dtype=np.float32)) * 0.01).astype(dt)

        if weight_resident:
            from param_tpu.ops.matmul import matmul_weight_resident

            S = weight_resident
            es = dtype_size(dt)
            bn = next((c for c in (512, 256, 128) if n % c == 0), n)
            if (S * m * k + k * bn) * es > 100 * 2**20:
                log.warning("gemm %s: A stack + B tile exceed VMEM for "
                            "weight-resident mode; skipping", (m, n, k))
                continue
            astack = (jnp.asarray(
                rng.random((S, m, k), dtype=np.float32)) * 0.01).astype(dt)

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(astack, b, nn, bn=bn):
                def step(s, i):
                    out = matmul_weight_resident(
                        astack + i.astype(astack.dtype)
                        * jnp.asarray(1e-6, astack.dtype),
                        b, block_n=bn)
                    return s + jnp.sum(out.astype(jnp.float32)), None

                s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
                return s

            try:
                per = measure_chain(
                    lambda nn: chain(astack, b, nn=nn),
                    n_lo=1, n_hi=max(2, n_hi // S), reps=reps) / S
            except Exception:
                log.exception("gemm %s (weight-resident) failed", (m, n, k))
                continue
            tf = gemm_flops(m, n, k) / per / 1e12
            results.append(_report(ComputeResult(
                op="gemm", shape=(m, n, k), lat_us=per * 1e6, tflops=tf,
                roofline_frac=tf / peak if peak else 0.0), dtype))
            continue

        if use_pallas:
            def op(x, w):
                return matmul_pallas(x, w)
        else:
            def op(x, w):
                return jnp.dot(x, w, preferred_element_type=jnp.float32,
                               precision=prec)

        # b must be an ARGUMENT: a closed-over device array becomes an
        # embedded constant in the compiled program (a 670 MB compile
        # payload for gemm_B's 40928-dim shapes)
        @functools.partial(jax.jit, static_argnames="nn")
        def chain(a, b, nn):
            def step(s, i):
                # per-step input perturbation defeats loop hoisting/CSE
                out = op(a + i.astype(a.dtype) * jnp.asarray(1e-6, a.dtype), b)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
            return s

        try:
            per = measure_chain(lambda nn: chain(a, b, nn=nn), n_lo=1,
                                n_hi=n_hi, reps=reps)
        except Exception:
            log.exception("gemm %s failed", (m, n, k))
            continue
        tf = gemm_flops(m, n, k) / per / 1e12
        results.append(
            _report(
                ComputeResult(
                    op="gemm", shape=(m, n, k), lat_us=per * 1e6, tflops=tf,
                    roofline_frac=tf / peak if peak else 0.0,
                ),
                dtype,
            )
        )
    return results


# -------------------------------------------------------------- Embedding
def bench_emb(
    configs: List[tuple],
    dtype: str = "float32",
    n_hi: int = 8,
    reps: int = 2,
    distribution: str = "uniform",
    max_rows: Optional[int] = None,
) -> List[ComputeResult]:
    """(reference: pytorch_emb.py measure/measure_tpu; Zipf index gen
    :138-160).  ``max_rows`` clamps tables that exceed device HBM."""
    from param_tpu.models.dlrm_data import gen_indices

    dt = dtype_from_name(dtype)
    es = dtype_size(dt)
    chip = detect_chip()
    results = []
    rng = np.random.default_rng(0)
    table_cache = {}
    for rows, dim, nnz, batch in configs:
        if max_rows:
            rows = min(rows, max_rows)
        from param_tpu.ops.embedding import pad_table_dim

        tkey = (rows, dim)
        if tkey not in table_cache:
            table_cache.clear()  # one big table at a time
            # lane-align the stored dim (4.8x gather speedup for 56-dim
            # tables, see embedding.pad_table_dim); BW is reported on the
            # USEFUL bytes
            if rows * dim * 4 > 1 << 30:
                # big tables (emb_A: 14M/26M rows = 7-13 GB) are generated
                # ON DEVICE — a host push of that size takes minutes on a
                # remote-attached chip (the reference's measure_tpu has its
                # own big-table workaround, pytorch_emb.py:72-135)
                @jax.jit
                def _dev_table(key):
                    return jax.random.uniform(key, (rows, dim), jnp.float32
                                              ).astype(dt)

                table_cache[tkey] = pad_table_dim(
                    _dev_table(jax.random.PRNGKey(rows % 7919)))
            else:
                table_cache[tkey] = pad_table_dim(
                    jnp.asarray(rng.random((rows, dim), dtype=np.float32)
                                ).astype(dt)
                )
        table = table_cache[tkey]
        idx = jnp.asarray(
            gen_indices(rng, batch, 1, nnz, rows, distribution)[:, 0, :]
        )

        @functools.partial(jax.jit, static_argnames="nn")
        def chain(table, idx, nn):
            def step(s, i):
                shifted = (idx + i) % rows
                rows_v = jnp.take(table, shifted, axis=0)[..., :dim]
                out = jnp.sum(rows_v.astype(jnp.float32), axis=1)
                return s + jnp.sum(out), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
            return s

        try:
            per = measure_chain(
                lambda nn: chain(table, idx, nn=nn), n_lo=1, n_hi=n_hi, reps=reps
            )
        except Exception:
            log.exception("emb %s failed", (rows, dim, nnz, batch))
            continue
        gbs = embedding_bytes(batch, nnz, dim, es) / per / 1e9
        results.append(
            _report(
                ComputeResult(
                    op="emb", shape=(rows, dim, nnz, batch), lat_us=per * 1e6,
                    gbs=gbs, qps=batch / per,
                    roofline_frac=gbs / chip.hbm_gbs,
                ),
                dtype,
            )
        )
    return results


# -------------------------------------------------------------------- MLP
def bench_mlp(
    configs: List[tuple],
    dtype: str = "float32",
    optimizer: str = "sgd",
    fwd_only: bool = False,
    n_hi: int = 8,
    reps: int = 2,
) -> List[ComputeResult]:
    """(reference: pytorch_linear.py train/train_tpu; QPS + TF/s at
    :338-346)"""
    dt = dtype_from_name(dtype)
    chip = detect_chip()
    peak = matmul_roofline_tflops(chip, dtype)
    results = []
    for num_layers, din, hidden, dout, batch in configs:
        dims = [din] + [hidden] * (num_layers - 1) + [dout]
        params = init_mlp(jax.random.PRNGKey(0), dims, dt)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((batch, din), dtype=np.float32)).astype(dt)
        y = jnp.asarray(rng.random((batch, dout), dtype=np.float32))

        if fwd_only:
            from param_tpu.ops.mlp import mlp_forward

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(params, x, nn):
                def step(s, i):
                    out = mlp_forward(
                        params, x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                    )
                    return s + jnp.sum(out.astype(jnp.float32)), None

                s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
                return s

            fn = lambda nn: chain(params, x, nn=nn)  # noqa: E731
        else:
            opt = make_optimizer(optimizer)
            train_step = None  # build inside chain for fusion
            st = opt.init(params)
            import optax

            from param_tpu.ops.mlp import mlp_forward

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(params, st, x, y, nn):
                def loss_fn(p, xx):
                    out = mlp_forward(p, xx).astype(jnp.float32)
                    return jnp.mean((out - y) ** 2)

                def step(carry, i):
                    p, s = carry
                    xx = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                    l, grads = jax.value_and_grad(loss_fn)(p, xx)
                    updates, s = opt.update(grads, s, p)
                    p = optax.apply_updates(p, updates)
                    return (p, s), l

                (_, _), losses = lax.scan(step, (params, st), jnp.arange(nn))
                return losses[-1]

            fn = lambda nn: chain(params, st, x, y, nn=nn)  # noqa: E731

        try:
            per = measure_chain(fn, n_lo=1, n_hi=n_hi, reps=reps)
        except Exception:
            log.exception("mlp %s failed", (num_layers, din, hidden, dout, batch))
            continue
        tf = mlp_flops(dims, batch, fwd_only) / per / 1e12
        results.append(
            _report(
                ComputeResult(
                    op="mlp", shape=(num_layers, din, hidden, dout, batch),
                    lat_us=per * 1e6, tflops=tf, qps=batch / per,
                    roofline_frac=tf / peak if peak else 0.0,
                ),
                dtype,
            )
        )
    return results


def bench_attention(
    shapes: List[tuple],
    dtype: str = "bfloat16",
    causal: bool = True,
    paths: Optional[List[str]] = None,
    n_hi: int = 16,
    reps: int = 2,
    block_q: int = 1024,
    block_k: int = 1024,
    grad: bool = False,
) -> List[ComputeResult]:
    """Fused-attention rows (beyond-reference tier; see ops/attention.py).

    Per shape, measures each requested path — 'xla' (unfused oracle, the
    cost the PyTorch trace's op stream pays), 'flash' (our Pallas online
    -softmax kernel), 'jax-flash' (jax's bundled pallas kernel, A/B
    baseline), 'dpa' (jax.nn.dot_product_attention) — as a scalar-fetch
    chain with per-step Q perturbation.  TF/s uses the causal-aware flop
    count, roofline vs the chip MXU peak.

    With ``grad`` the chain times forward+backward through ``jax.grad``
    ('flash' routes through flash_mha: Pallas kernels both directions);
    flops use the standard 3.5x attention fwd+bwd count (2 fwd + 5 bwd
    matmuls)."""
    from param_tpu.ops.attention import (
        attention_flops, flash_attention, flash_mha, make_attention)

    dt = dtype_from_name(dtype)
    chip = detect_chip()
    peak = matmul_roofline_tflops(chip, dtype)
    paths = paths or ["xla", "flash"]
    results = []
    for b, h, s, d in shapes:
        rng = np.random.default_rng(0)

        def _mk(seed):
            r = np.random.default_rng(seed)
            return (jnp.asarray(
                r.standard_normal((b, h, s, d), dtype=np.float32)) * 0.1
            ).astype(dt)

        q, k, v = _mk(0), _mk(1), _mk(2)
        for path in paths:
            if grad and path == "flash":
                op = functools.partial(flash_mha, causal=causal)
            elif path == "flash":
                op = functools.partial(
                    flash_attention, causal=causal,
                    block_q=block_q, block_k=block_k)
            else:
                op = make_attention(path, causal=causal)

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(q, k, v, nn, op=op):
                def step(st, i):
                    qi = q + i.astype(q.dtype) * jnp.asarray(1e-6, q.dtype)
                    if grad:
                        gq, gk, gv = jax.grad(
                            lambda q, k, v: jnp.sum(
                                op(q, k, v).astype(jnp.float32)),
                            argnums=(0, 1, 2))(qi, k, v)
                        upd = (jnp.sum(gq.astype(jnp.float32)) +
                               jnp.sum(gk.astype(jnp.float32)) +
                               jnp.sum(gv.astype(jnp.float32)))
                    else:
                        upd = jnp.sum(op(qi, k, v).astype(jnp.float32))
                    return st + upd, None

                st, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
                return st

            try:
                per = measure_chain(lambda nn: chain(q, k, v, nn=nn),
                                    n_lo=1, n_hi=n_hi, reps=reps)
            except Exception:
                log.exception("attention %s path=%s failed",
                              (b, h, s, d), path)
                continue
            fl = attention_flops(b, h, s, s, d, causal)
            if grad:
                fl = fl * 7 // 2  # fwd 2 matmuls + bwd 5
            tf = fl / per / 1e12
            results.append(_report(ComputeResult(
                op=f"att{'-grad' if grad else ''}:{path}",
                shape=(b, h, s, d), lat_us=per * 1e6,
                tflops=tf, roofline_frac=tf / peak if peak else 0.0,
            ), dtype))
    return results


# ------------------------------------------------------- decode attention
def bench_decode_attention(
    shapes: List[tuple],
    dtype: str = "bfloat16",
    n_hi: int = 16,
    reps: int = 2,
) -> List[ComputeResult]:
    """Serving-tier decode step: one query token against a (B, H, S, D)
    KV cache — the memory-bound half of inference (the prefill half is
    the flash tier).  The whole op is a KV-cache stream: the metric is
    GB/s of K+V traffic vs the HBM roofline, the same convention as the
    EmbeddingBag rows.  Shapes are (batch, heads, kv_len, head_dim).

    Uses the XLA unfused path — at S_q=1 the 'matmuls' are
    matrix-vector products the MXU can't help with; XLA's fused
    softmax-weighted reduction is the right tool, and measuring it
    calibrates what a Pallas decode kernel would have to beat.

    A 5-tuple shape (batch, heads, kv_heads, kv_len, head_dim) runs GQA
    decode (llama-3 style): a grouped einsum streams each kv head ONCE
    for its whole query group — the KV cache (and the measured traffic)
    shrinks by heads/kv_heads."""
    dt = dtype_from_name(dtype)
    chip = detect_chip()
    hbm = getattr(chip, "hbm_gbs", 0.0) or 0.0
    results = []
    for shape in shapes:
        if len(shape) == 5:
            b, h, h_kv, s, d = shape
        else:
            b, h, s, d = shape
            h_kv = h
        grp = h // h_kv
        r = np.random.default_rng(0)
        q = (jnp.asarray(r.standard_normal((b, h_kv, grp, d),
                                           dtype=np.float32)) * 0.1).astype(dt)
        k = (jnp.asarray(r.standard_normal((b, h_kv, s, d),
                                           dtype=np.float32)) * 0.1).astype(dt)
        v = (jnp.asarray(r.standard_normal((b, h_kv, s, d),
                                           dtype=np.float32)) * 0.1).astype(dt)
        scale = 1.0 / float(np.sqrt(d))

        def decode(q, k, v):
            logits = jnp.einsum("bkgd,bksd->bkgs", q, k,
                                preferred_element_type=jnp.float32) * scale
            p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            return jnp.einsum("bkgs,bksd->bkgd", p, v,
                              preferred_element_type=jnp.float32)

        @functools.partial(jax.jit, static_argnames="nn")
        def chain(q, k, v, nn):
            def step(st, i):
                qi = q + i.astype(q.dtype) * jnp.asarray(1e-6, q.dtype)
                return st + jnp.sum(decode(qi, k, v)), None

            st, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
            return st

        try:
            per = measure_chain(lambda nn: chain(q, k, v, nn=nn),
                                n_lo=1, n_hi=n_hi, reps=reps)
        except Exception:
            log.exception("decode %s failed", shape)
            continue
        kv_bytes = 2 * b * h_kv * s * d * jnp.dtype(dt).itemsize
        gbs = kv_bytes / per / 1e9
        results.append(_report(ComputeResult(
            op="decode" if h == h_kv else "decode-gqa",
            shape=tuple(shape), lat_us=per * 1e6, gbs=gbs,
            qps=b / per,
            roofline_frac=gbs / hbm if hbm else 0.0,
        ), dtype))
    return results


# --------------------------------------------------------- block serving
def bench_block_decode(
    shapes: List[tuple],
    dtype: str = "bfloat16",
    n_hi: int = 16,
    reps: int = 2,
) -> List[ComputeResult]:
    """Whole-BLOCK decode step (models/transformer.py decode_step):
    cached attention + the full MLP/projection stack at T=1 — the
    weight-STREAMING regime that bounds serving tokens/s.  Shapes are
    (batch, cache_len, emb, heads, ffn) or with a kv_heads slot before
    ffn for GQA (llama-3 geometry); the roofline is
    (weight bytes + KV bytes) / HBM BW, the classic per-token serving
    bound (batch amortizes weights, so tokens/s rises with B until the
    KV term dominates).

    dtype 'int8'/'int4' selects WEIGHT-ONLY quantization (activations and
    KV stay bf16; ops/inference.py recipe, int4 = group-128 nibble
    packing): the weight stream drops to 1/2 / 1/4 of bf16, which is
    most of the B=1 bound."""
    from param_tpu.models.transformer import (
        TransformerConfig, cast_int4_params, decode_step, init_params,
        prefill, quantize_block_weights_int4, quantize_block_weights_int8)

    quant = dtype in ("int8", "int4")
    act_dtype = "bfloat16" if quant else dtype
    dt = dtype_from_name(act_dtype)
    chip = detect_chip()
    hbm = getattr(chip, "hbm_gbs", 0.0) or 0.0
    results = []
    for shape in shapes:
        if len(shape) == 6:  # (b, cache, e, heads, kv_heads, ff) — GQA
            b, cache_len, e, h, kvh, ff = shape
        else:
            b, cache_len, e, h, ff = shape
            kvh = h
        cfg = TransformerConfig(batch=b, seq=1, emb=e, heads=h, ffn=ff,
                                attention="xla", dtype=act_dtype,
                                kv_heads=kvh)
        params = init_params(jax.random.PRNGKey(0), cfg)
        r = np.random.default_rng(0)
        prompt = (jnp.asarray(r.standard_normal(
            (b, cache_len // 2, e), dtype=np.float32)) * 0.1).astype(dt)
        pre_cfg = TransformerConfig(batch=b, seq=cache_len // 2, emb=e,
                                    heads=h, ffn=ff, attention="xla",
                                    dtype=act_dtype, kv_heads=kvh)
        _, cache = prefill(params, prompt, pre_cfg, cache_len)
        if quant:
            params = (quantize_block_weights_int8(params) if dtype == "int8"
                      else quantize_block_weights_int4(params))
        x1 = (jnp.asarray(r.standard_normal((b, 1, e),
                                            dtype=np.float32)) * 0.1).astype(dt)
        pos = cache_len - 2  # near-full cache: worst-case KV read

        @functools.partial(jax.jit, static_argnames="nn")
        def chain(params, cache, x, nn):
            if dtype == "int4":
                # int8 carriers → native s4 ONCE, ahead of the decode
                # loop: the per-step weight stream is then 4-bit packed
                params = cast_int4_params(params)

            def step(carry, i):
                cache, acc = carry
                xi = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                out, cache = decode_step(params, cache, xi, pos, cfg)
                return (cache, acc + jnp.sum(out.astype(jnp.float32))), None

            (cache, acc), _ = lax.scan(step, (cache, jnp.float32(0)),
                                       jnp.arange(nn))
            return acc

        try:
            per = measure_chain(
                lambda nn: chain(params, cache, x1, nn=nn),
                n_lo=1, n_hi=n_hi, reps=reps)
        except Exception:
            log.exception("block decode %s failed", shape)
            continue
        esz = jnp.dtype(dt).itemsize
        # Honest stream accounting: walk the (possibly quantized) matmul
        # weights — packed nibbles/int8 bytes plus the actual scale arrays.
        w_bytes = 0
        for k in ("wqkv", "wo", "w1", "w2"):
            w = params[k]
            if isinstance(w, tuple) and len(w) == 3:  # int4: s4-packed
                w_bytes += w[0].size // 2 + w[1].nbytes
            elif isinstance(w, tuple):
                w_bytes += sum(t.nbytes for t in w if hasattr(t, "nbytes"))
            else:
                w_bytes += w.nbytes
        kv_bytes = 2 * b * kvh * cfg.head_dim * cache_len * esz
        gbs = (w_bytes + kv_bytes) / per / 1e9
        results.append(_report(ComputeResult(
            op=f"serve-{dtype}" if quant else "serve",
            shape=shape,
            lat_us=per * 1e6, gbs=gbs, qps=b / per,
            roofline_frac=gbs / hbm if hbm else 0.0,
        ), dtype))
    return results


# ------------------------------------------------------- transformer block
def transformer_block_flops(b: int, s: int, e: int, h: int, ff: int,
                            causal: bool = True, grad: bool = True) -> int:
    """Matmul flops of one pre-LN transformer block step (LN/gelu
    elementwise work excluded, the standard accounting): QKV proj
    (E->3E), attention (attention_flops), output proj (E->E), 2-layer
    FFN (E->ff->E).  Training counts backward as 2x for projections and
    5/2x for attention (flash_mha: 2 fwd + 5 bwd matmuls)."""
    from param_tpu.ops.attention import attention_flops

    proj = 2 * b * s * (e * 3 * e + e * e + 2 * e * ff)
    att = attention_flops(b, h, s, s, e // h, causal)
    if grad:
        return 3 * proj + att * 7 // 2
    return proj + att


def bench_transformer(
    shapes: List[tuple],
    dtype: str = "bfloat16",
    causal: bool = True,
    paths: Optional[List[str]] = None,
    n_hi: int = 8,
    reps: int = 2,
    grad: bool = True,
    lr: float = 1e-4,
) -> List[ComputeResult]:
    """Pre-LN transformer-block TRAIN-STEP rows (VERDICT r4 next #7):
    x + MHA(LN(x)) then x + FFN(LN(x)), loss = mean(out^2), SGD update —
    the whole step (fwd + bwd + update) as ONE jitted program, chained
    with the params as the scan carry so every chain step is a real
    optimization step.  Shapes are (batch, seq, emb, heads, ffn)
    (datasets.TRANSFORMER_DATASETS; llama2/GPT2 dims).

    paths: 'flash' routes attention through flash_mha (Pallas kernels in
    both directions — O(S*D) attention HBM traffic); 'xla' through the
    unfused oracle (what the recorded PyTorch op stream pays).  TF/s from
    transformer_block_flops, roofline vs the chip MXU peak.  Model code:
    models/transformer.py (init_params / block_apply / make_train_step)."""
    from param_tpu.models.transformer import (
        TransformerConfig, block_apply, init_params, make_train_step)

    chip = detect_chip()
    peak = matmul_roofline_tflops(chip, dtype)
    paths = paths or ["flash", "xla"]
    results = []
    for b, s, e, h, ff in shapes:
        rng = np.random.default_rng(0)
        x0 = (jnp.asarray(
            rng.standard_normal((b, s, e), dtype=np.float32)) * 0.1
        ).astype(dtype_from_name(dtype))

        for path in paths:
            cfg = TransformerConfig(batch=b, seq=s, emb=e, heads=h,
                                    ffn=ff, causal=causal,
                                    attention=path, dtype=dtype)
            params = init_params(jax.random.PRNGKey(0), cfg)
            train_step = make_train_step(cfg, lr=lr)

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(p, x, nn, train_step=train_step, cfg=cfg):
                def step(carry, i):
                    p, acc = carry
                    xi = x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)
                    if grad:
                        p, loss = train_step(p, xi)
                    else:
                        loss = jnp.mean(jnp.square(
                            block_apply(p, xi, cfg).astype(jnp.float32)))
                    return (p, acc + loss), None

                (p, acc), _ = lax.scan(step, (p, jnp.float32(0)),
                                       jnp.arange(nn))
                return acc

            try:
                per = measure_chain(lambda nn: chain(params, x0, nn=nn),
                                    n_lo=1, n_hi=n_hi, reps=reps)
            except Exception:
                log.exception("transformer %s path=%s failed",
                              (b, s, e, h, ff), path)
                continue
            fl = transformer_block_flops(b, s, e, h, ff, causal, grad)
            tf = fl / per / 1e12
            results.append(_report(ComputeResult(
                op=f"tf{'' if grad else '-fwd'}:{path}",
                shape=(b, s, e, h, ff), lat_us=per * 1e6,
                tflops=tf, roofline_frac=tf / peak if peak else 0.0,
            ), dtype))
    return results


def print_results(results: List[ComputeResult], dtype: str) -> None:
    chip = detect_chip()
    print(f"\nCOMPUTE-RES chip={chip.name} dtype={dtype}")
    print(f"{'op':>6}{'shape':>30}{'lat(us)':>14}{'TF/s':>12}{'GB/s':>10}"
          f"{'QPS':>14}{'roofline':>10}")
    for r in results:
        print(
            f"{r.op:>6}{str(r.shape):>30}{r.lat_us:>14.1f}{r.tflops:>12.2f}"
            f"{r.gbs:>10.1f}{r.qps:>14.0f}{r.roofline_frac:>9.1%}"
        )
