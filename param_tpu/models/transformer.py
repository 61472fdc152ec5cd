"""Pre-LN transformer block as a first-class model family.

The reference's transformer coverage is shape-level only — the
``llama2.json`` GEMM configs under ``train/compute/python`` and the
hf_GPT2 ET fixture its replayer ingests.  This module gives the TPU
build a real runnable counterpart: a pre-LN block (QKV projection, MHA,
output projection, gelu FFN) with

- single-chip train/forward paths whose attention routes through
  :func:`param_tpu.ops.attention.flash_mha` (Pallas kernels in both
  directions; 'xla' = the unfused oracle as the A/B),
- Megatron-style multi-chip sharding over a ``(dp, tp)`` mesh expressed
  as ``NamedSharding`` annotations: QKV and FFN-in column-sharded over
  tp (heads split across chips — attention is embarrassingly parallel
  in H), output/FFN-out row-sharded, batch sharded over dp.  XLA
  inserts the tp all-reduces and the dp gradient psum from the
  shardings — the compiler-inserted style complementing the explicit
  shard_map programs of the DLRM model (models/dlrm.py).

Used by ``cli.compute transformer`` (ops/compute_bench.bench_transformer)
and by dryrun path 9 (__graft_entry__), which jits one sharded train
step on an n-device mesh.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class TransformerConfig:
    batch: int
    seq: int
    emb: int
    heads: int
    ffn: int
    causal: bool = True
    attention: str = "flash"  # flash | xla
    dtype: str = "bfloat16"
    kv_heads: Optional[int] = None  # < heads = GQA (llama-3 style)

    @property
    def head_dim(self) -> int:
        assert self.emb % self.heads == 0, (self.emb, self.heads)
        return self.emb // self.heads

    @property
    def kvh(self) -> int:
        k = self.kv_heads or self.heads
        assert self.heads % k == 0, (self.heads, k)
        return k


def init_params(key, cfg: TransformerConfig) -> Dict:
    dt = jnp.dtype(cfg.dtype)
    e, ff = cfg.emb, cfg.ffn
    ks = jax.random.split(key, 4)

    def w(k, din, dout):
        return (jax.random.normal(k, (din, dout), jnp.float32)
                / math.sqrt(din)).astype(dt)

    return {
        "ln1": (jnp.ones((e,), dt), jnp.zeros((e,), dt)),
        # GQA (kvh < heads): the kv projections are kvh*d wide
        "wqkv": w(ks[0], e, e + 2 * cfg.kvh * cfg.head_dim),
        "wo": w(ks[1], e, e),
        "ln2": (jnp.ones((e,), dt), jnp.zeros((e,), dt)),
        "w1": w(ks[2], e, ff),
        "w2": w(ks[3], ff, e),
    }


def _split_heads(y, cfg: TransformerConfig, b: int, s: int):
    """(b, s, e + 2*kvh*d) qkv projection → q (b, h, s, d),
    k/v (b, kvh, s, d)."""
    e, d, kvh = cfg.emb, cfg.head_dim, cfg.kvh
    q, k, v = jnp.split(y, [e, e + kvh * d], axis=-1)

    def heads(t, n):
        return t.reshape(b, s, n, d).transpose(0, 2, 1, 3)

    return heads(q, cfg.heads), heads(k, kvh), heads(v, kvh)


def _ln(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) \
        * gamma + beta


def block_apply(params: Dict, x, cfg: TransformerConfig):
    """One pre-LN block: x + MHA(LN(x)), then x + FFN(LN(x))."""
    from param_tpu.ops.attention import flash_mha, mha_reference

    b, s, e = x.shape
    hx = _ln(x, *params["ln1"])
    qh, kh, vh = _split_heads(hx @ params["wqkv"], cfg, b, s)
    if cfg.attention == "flash":
        a = flash_mha(qh, kh, vh, cfg.causal, None)
    else:
        a = mha_reference(qh, kh, vh, causal=cfg.causal)
    x = x + a.transpose(0, 2, 1, 3).reshape(b, s, e) @ params["wo"]
    h2 = _ln(x, *params["ln2"])
    return x + jax.nn.gelu(h2 @ params["w1"]) @ params["w2"]


def make_train_step(cfg: TransformerConfig, lr: float = 1e-4):
    """(params, x) -> (params', loss): fwd + bwd + SGD as one jittable fn
    (loss = mean(out^2) — the bench objective; swap per workload)."""

    def step(params, x):
        def loss_fn(p):
            return jnp.mean(jnp.square(
                block_apply(p, x, cfg).astype(jnp.float32)))

        loss, g = jax.value_and_grad(loss_fn)(params)
        params = jax.tree.map(
            lambda w, gw: (w.astype(jnp.float32)
                           - lr * gw.astype(jnp.float32)).astype(w.dtype),
            params, g)
        return params, loss

    return step


# --------------------------------------------------------------- sharding

def param_specs(cfg: TransformerConfig) -> Dict:
    """Megatron tensor-parallel PartitionSpecs over mesh axes
    ('dp', 'tp'): QKV / FFN-in column-sharded (the tp axis splits heads
    and ffn lanes), output / FFN-out row-sharded, LN replicated."""
    del cfg
    return {
        "ln1": (P(), P()),
        "wqkv": P(None, "tp"),
        "wo": P("tp", None),
        "ln2": (P(), P()),
        "w1": P(None, "tp"),
        "w2": P("tp", None),
    }


def place(params: Dict, x, mesh: Mesh, cfg: TransformerConfig):
    """Shard params per :func:`param_specs` and the batch over dp."""
    specs = param_specs(cfg)
    params = jax.tree.map(
        lambda t, s: jax.device_put(t, NamedSharding(mesh, s)),
        params, specs,
        is_leaf=lambda t: isinstance(t, (jnp.ndarray, np.ndarray)))
    x = jax.device_put(x, NamedSharding(mesh, P("dp", None, None)))
    return params, x


def make_sharded_train_step(mesh: Mesh, cfg: TransformerConfig,
                            lr: float = 1e-4):
    """jit(step) with sharding constraints: XLA inserts the tp
    collectives (all-reduce after wo / w2 row-sharded matmuls) and the
    dp gradient reduction from the NamedSharding annotations.

    NOTE: under compiler-inserted sharding the attention path is the
    XLA oracle — the tp axis splits H, which XLA handles natively; the
    shard_map + flash-kernel composition is dryrun path 8 /
    tests/test_attention.py::test_flash_sharded_over_heads."""
    cfg_x = TransformerConfig(**{**cfg.__dict__, "attention": "xla"})
    step = make_train_step(cfg_x, lr=lr)
    specs = param_specs(cfg)
    out_shardings = (
        jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                     is_leaf=lambda t: isinstance(t, P)),
        NamedSharding(mesh, P()),
    )
    return jax.jit(
        step,
        in_shardings=(
            jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                         is_leaf=lambda t: isinstance(t, P)),
            NamedSharding(mesh, P("dp", None, None)),
        ),
        out_shardings=out_shardings,
    )


# ------------------------------------------------------ pipeline parallel

def init_stacked_params(key, cfg: TransformerConfig, n_stages: int) -> Dict:
    """Per-stage block params stacked on a leading stage axis (the leaf
    layout ``shard_map`` slices over the 'pp' mesh axis)."""
    ks = jax.random.split(key, n_stages)
    per = [init_params(k, cfg) for k in ks]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def make_pipeline_train_step(mesh: Mesh, cfg: TransformerConfig,
                             n_microbatches: int, lr: float = 1e-4,
                             axis: str = "pp"):
    """GPipe-style pipeline-parallel train step over mesh axis ``axis``.

    Each device owns ONE transformer block (a pipeline stage).  The
    forward runs the classic fill/drain schedule as a ``lax.scan`` over
    ``M + S - 1`` ticks: every tick each stage applies its block to the
    activation it holds, then the activations rotate one stage forward
    with ``lax.ppermute``; stage 0 injects a fresh microbatch while
    filling, the last stage accumulates the loss while draining
    (the scaling-book collective-pipeline recipe — compute at every
    tick, one hop of ICI traffic per tick).  ``jax.grad`` through the
    scan+ppermute yields the reverse pipeline automatically (ppermute
    transposes to the inverse rotation), so the backward drains in the
    opposite direction with the same wire pattern — no hand-written
    schedule.

    Input x: (M * mb, S_seq, E) replicated; returns (stacked_params',
    mean loss).  Microbatch slicing is static (M = n_microbatches).
    Reference analogue: none — PARAM measures comm patterns; this IS the
    pp pattern, runnable and differentiable."""
    from jax import lax

    n_stages = mesh.shape[axis]
    M = n_microbatches

    def stage_step(params_slab, x):
        # params_slab leaves: (1, ...) — this stage's block params
        params = jax.tree.map(lambda t: t[0], params_slab)
        stage = lax.axis_index(axis)
        mb = x.shape[0] // M
        xm = x.reshape(M, mb, *x.shape[1:])

        def loss_fn(params):
            def tick(carry, t):
                state, loss = carry
                fresh = lax.dynamic_index_in_dim(
                    xm, jnp.clip(t, 0, M - 1), axis=0, keepdims=False)
                state = jnp.where(
                    jnp.logical_and(stage == 0, t < M), fresh, state)
                state = block_apply(params, state, cfg)
                out_valid = jnp.logical_and(stage == n_stages - 1,
                                            t >= n_stages - 1)
                loss = loss + jnp.where(
                    out_valid,
                    jnp.mean(jnp.square(state.astype(jnp.float32))), 0.0)
                state = lax.ppermute(
                    state, axis,
                    perm=[(i, (i + 1) % n_stages)
                          for i in range(n_stages)])
                return (state, loss), None

            state0 = jnp.zeros((mb, *x.shape[1:]), x.dtype)
            (_, loss), _ = lax.scan(
                tick, (state0, jnp.float32(0)),
                jnp.arange(M + n_stages - 1))
            # differentiate the LOCAL loss (nonzero on the last stage
            # only) — earlier stages receive their cotangents through
            # the ppermute transposes.  A psum here would scale every
            # grad by n_stages: under check_vma=False the transpose of
            # psum inserts another psum instead of the identity.
            return loss / M

        loss, g = jax.value_and_grad(loss_fn)(params)
        loss = lax.psum(loss, axis)  # replicate the value for reporting
        params = jax.tree.map(
            lambda w, gw: (w.astype(jnp.float32)
                           - lr * gw.astype(jnp.float32)).astype(w.dtype),
            params, g)
        return jax.tree.map(lambda t: t[None], params), loss

    pspec = jax.tree.map(lambda _: P(axis), param_specs(cfg),
                         is_leaf=lambda t: isinstance(t, P))
    return jax.jit(jax.shard_map(
        stage_step, mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=(pspec, P()),
        check_vma=False))


# --------------------------------------------------------- serving / cache

def prefill(params: Dict, x, cfg: TransformerConfig, cache_len: int):
    """Run the block over the prompt and return (out, cache): K/V heads
    written into a static (B, H, cache_len, d) buffer (serving contract:
    static shapes, one compile per cache geometry)."""
    from param_tpu.ops.attention import flash_mha, mha_reference

    b, s, e = x.shape
    d, kvh = cfg.head_dim, cfg.kvh
    hx = _ln(x, *params["ln1"])
    qh, kh, vh = _split_heads(hx @ params["wqkv"], cfg, b, s)
    if cfg.attention == "flash":
        a = flash_mha(qh, kh, vh, cfg.causal, None)
    else:
        a = mha_reference(qh, kh, vh, causal=cfg.causal)
    out = x + a.transpose(0, 2, 1, 3).reshape(b, s, e) @ params["wo"]
    h2 = _ln(out, *params["ln2"])
    out = out + jax.nn.gelu(h2 @ params["w1"]) @ params["w2"]

    cache = {
        "k": jnp.zeros((b, kvh, cache_len, d), x.dtype).at[:, :, :s].set(kh),
        "v": jnp.zeros((b, kvh, cache_len, d), x.dtype).at[:, :, :s].set(vh),
    }
    return out, cache


def decode_step(params: Dict, cache: Dict, x, pos, cfg: TransformerConfig,
                window: Optional[int] = None):
    """One cached decode step: x is (B, 1, E), ``pos`` the write position
    (= tokens already in the cache).  Attends the query token against
    cache[0..pos] with a static-shape position mask — the memory-bound
    softmax-weighted KV reduction the decode bench measures.  ``window``
    restricts attention to the last W cache entries (mistral-style
    sliding window; pairs with flash_attention(window=W) at prefill).
    Returns (out, cache')."""
    b, _, e = x.shape
    h, d, kvh = cfg.heads, cfg.head_dim, cfg.kvh
    grp = h // kvh
    hx = _ln(x, *params["ln1"])
    q, k, v = jnp.split(_mm(hx, params["wqkv"]), [e, e + kvh * d], axis=-1)
    qh = q.reshape(b, kvh, grp, 1, d)  # grouped query heads per kv head
    kh = k.reshape(b, 1, kvh, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, 1, kvh, d).transpose(0, 2, 1, 3)
    cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], kh.astype(cache["k"].dtype), (0, 0, pos, 0)),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], vh.astype(cache["v"].dtype), (0, 0, pos, 0)),
    }
    scale = 1.0 / math.sqrt(d)
    # GQA: each kv head streams ONCE, shared by its grp query heads
    logits = jnp.einsum("bkgqd,bksd->bkgqs", qh, cache["k"],
                        preferred_element_type=jnp.float32) * scale
    slen = cache["k"].shape[2]
    posn = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, slen), 4)
    valid = posn <= pos
    if window is not None:
        valid = jnp.logical_and(valid, posn > pos - window)
    logits = jnp.where(valid, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    a = jnp.einsum("bkgqs,bksd->bkgqd", p, cache["v"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    a = a.reshape(b, h, 1, d)
    out = x + _mm(a.transpose(0, 2, 1, 3).reshape(b, 1, e), params["wo"])
    h2 = _ln(out, *params["ln2"])
    out = out + _mm(jax.nn.gelu(_mm(h2, params["w1"])), params["w2"])
    return out, cache


# ------------------------------------------------- int8 weight-only serving

def quantize_block_weights_int8(params: Dict) -> Dict:
    """Per-output-column max-abs int8 quantization of the block's matmul
    weights (the ops/inference.py recipe applied to the serving path);
    LN params stay float.  Halves the per-token weight STREAM — the
    quantity that bounds B=1 decode."""
    def q(w):
        absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        qw = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                      -127, 127).astype(jnp.int8)
        return (qw, scale.astype(jnp.float32))

    return {**params, **{k: q(params[k])
                         for k in ("wqkv", "wo", "w1", "w2")}}


def quantize_block_weights_int4(params: Dict, group: int = 128) -> Dict:
    """Group-wise (AWQ-style, ``group`` input rows share a scale) int4
    weight-only quantization, so the weight STREAM is a quarter of bf16 —
    the next rung below int8 on the B=1 decode bound.  Per-column scales
    alone are too coarse at 4 bits; group-wise keeps the round-trip error
    ~1e-2.  LN params stay float.  Reference recipe lineage: infer_gpu:89's
    weight-only quantization ladder (fp16 → int8), extended one step.

    Values are stored in an int8 CARRIER (one nibble value in [-7, 7] per
    byte); :func:`cast_int4_params` converts carriers to XLA's native
    ``int4`` dtype (2/byte in HBM) — call it INSIDE the serving program,
    before the decode loop, so the per-step weight stream is s4-packed.
    (On-chip sweep, scripts/int4_experiment.py: XLA's s4 dot streams at
    865 GB/s with fused group scales — 2.9x the best in-kernel Pallas
    nibble unpack, which is VPU-bound at ~300 GB/s on v5e.)"""
    def q(w):
        din, dout = w.shape
        g = min(group, din)
        assert din % g == 0, (din, g)
        wf = w.astype(jnp.float32).reshape(din // g, g, dout)
        absmax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
        qv = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
        return (qv.astype(jnp.int8).reshape(din, dout),
                scale.astype(jnp.float32), g)

    return {**params, **{k: q(params[k])
                         for k in ("wqkv", "wo", "w1", "w2")}}


def cast_int4_params(params: Dict) -> Dict:
    """int8 carriers → jnp.int4 (s4, 2 values/byte in HBM), PRE-SHAPED to
    the (groups, group, dout) layout the serving einsum consumes.  Jit-
    safe; run inside the serving program ahead of the decode loop — both
    the convert and the 3D reshape must happen OUTSIDE the per-token loop
    (reshaping a packed s4 array re-tiles it physically; done per step it
    costs more than the matmul).  (Kept out of quantize_block_weights_int4
    because the axon remote plugin cannot device_put s4 arrays across the
    jit boundary — standard TPU installs can pass pre-cast s4 params
    directly.)"""
    def cast(v):
        q, scale, g = v
        din, dout = q.shape
        return (q.reshape(scale.shape[0], din // scale.shape[0],
                          dout).astype(jnp.int4), scale, g)

    return {k: (cast(v) if isinstance(v, tuple) and len(v) == 3 else v)
            for k, v in params.items()}


def _unpack_int4(packed, scale, g=None):
    """(din//2, dout) packed nibbles + (din//g, dout) scales →
    bf16 (low, high) halves (even/odd input rows), scales folded in.
    The group size is derived from the scale array's STATIC shape (the
    ``g`` slot of the weight tuple becomes a tracer under jit).  Low
    nibble is stored +8-biased (ops/matmul.pack_int4 encoding)."""
    dhalf, dout = packed.shape
    low = (jnp.bitwise_and(packed.astype(jnp.int32), 15) - 8).astype(
        jnp.int8)
    high = jnp.right_shift(packed, 4)                        # arithmetic
    gh = dhalf // scale.shape[0]                             # = g // 2
    s = scale.astype(jnp.bfloat16)[:, None, :]               # (din//g,1,dout)

    def deq(nib):
        return (nib.astype(jnp.bfloat16).reshape(dhalf // gh, gh, dout)
                * s).reshape(dhalf, dout)

    return deq(low), deq(high)


def _mm(x, w):
    """Matmul accepting plain weights, (int8, per-col scale) pairs, or
    (packed int4, group scales, group) triples — quantized weights stream
    from HBM at half/quarter width and dequantize on the way into the MXU
    (the matmul pass runs bf16 either way).  The int4 path contracts the
    even/odd input rows against the two nibble planes separately so each
    MXU operand is a pure elementwise chain from the packed buffer — no
    interleave op between the HBM read and the dot."""
    if isinstance(w, tuple) and len(w) == 3:
        q, scale, g = w
        dout = q.shape[-1]
        lead = x.shape[:-1]
        if q.ndim == 3 or q.shape[0] == x.shape[-1]:
            # s4 (or int8-carrier) layout: batched group einsum.  XLA
            # fuses the s4→bf16 convert into the dot operand and the
            # group-scale reduction into the epilogue — measured 865 GB/s
            # on the packed stream (vs ~300 GB/s for the best Pallas
            # in-register nibble unpack; scripts/int4_experiment.py).
            # cast_int4_params pre-shapes s4 weights to (a, gg, dout);
            # int8 carriers (CPU test path) reshape here.
            a = scale.shape[0]
            kdim = x.shape[-1]
            gg = kdim // a
            if q.ndim == 2:
                q = q.reshape(a, gg, dout)
            xb = x.reshape(-1, kdim).astype(jnp.bfloat16)
            m = xb.shape[0]
            # pad the GEMV to a full bf16 sublane tile: the M=1 decode
            # dot runs at 395 GB/s, M=16 at 862 (on-chip sweep)
            mp = max(m, 16)
            if mp != m:
                xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
            xg = xb.reshape(mp, a, gg).transpose(1, 0, 2)
            part = jnp.einsum("amg,agn->amn", xg, q.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            y = jnp.einsum("amn,an->mn", part, scale)[:m]
            return y.reshape(*lead, dout).astype(x.dtype)
        # nibble-packed (K//2, N) layout: Pallas in-register unpack
        from param_tpu.ops.matmul import matmul_int4

        y = matmul_int4(x.reshape(-1, x.shape[-1]), packed=q, scale=scale,
                        out_dtype=x.dtype)
        return y.reshape(*lead, dout)
    if isinstance(w, tuple):
        qw, scale = w
        y = jnp.einsum("...i,ij->...j", x.astype(jnp.bfloat16),
                       qw.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return (y * scale).astype(x.dtype)
    return x @ w
