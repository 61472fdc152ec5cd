"""MLP inference benchmark with quantized paths.

TPU-native counterpart of the reference's inference tier
(``inference/compute/pt/pytorch_linear.py``: MLP inference latency/QPS with
fp16 / int8 quantization — ``infer_gpu:89``, ``infer_nnpi:35``).  Paths:

- fp32 / bf16: straight cast inference.
- int8: weight-only quantization — per-output-channel max-abs int8 weights
  with f32 scales, dequantized inside the matmul epilogue (the standard
  TPU-friendly weight-quant scheme; activations stay bf16 on the MXU).
- int4: group-wise weight-only quantization via XLA's native s4 dtype
  (the serving tier's recipe, models/transformer.py `_mm`) — extends the
  reference's fp16→int8 ladder one rung.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from param_tpu.ops.mlp import init_mlp, mlp_flops


def quantize_weights_int8(params):
    """[(W, b)] → [(W_int8, scales, b)] with per-column scales."""
    out = []
    for w, b in params:
        absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
        out.append((q.astype(jnp.int8), scale, b))
    return out


def mlp_forward_int8(qparams, x):
    """Weight-only int8 inference: int8 weights dequantized in-epilogue."""
    h = x
    for i, (qw, scale, b) in enumerate(qparams):
        y = jnp.dot(
            h.astype(jnp.bfloat16),
            qw.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        h = (y * scale + b.astype(jnp.float32)).astype(jnp.bfloat16)
        if i < len(qparams) - 1:
            h = jax.nn.relu(h)
    return h


def quantize_weights_int4(params, group: int = 128):
    """[(W, b)] → [(W_int8_carrier, group scales, b)]; carriers cast to
    native s4 inside the jitted program (mlp_forward_int4)."""
    out = []
    for w, b in params:
        din, dout = w.shape
        g = min(group, din)
        wf = w.astype(jnp.float32).reshape(din // g, g, dout)
        absmax = jnp.max(jnp.abs(wf), axis=1)
        scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
        q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
        out.append((q.astype(jnp.int8).reshape(din, dout),
                    scale.astype(jnp.float32), b))
    return out


def cast_int4_mlp(qparams):
    """int8 carriers → pre-shaped (groups, group, dout) native s4.  Call
    INSIDE the jitted program, ahead of the inference loop (the cast and
    3D reshape must not repeat per step — models/transformer.py
    cast_int4_params notes)."""
    return [(q.reshape(s.shape[0], q.shape[0] // s.shape[0],
                       q.shape[1]).astype(jnp.int4), s, b)
            for q, s, b in qparams]


def mlp_forward_int4(qparams, x):
    """Weight-only int4 inference: batched group einsum over native-s4
    weights (convert fused into the dot; see models/transformer._mm for
    the measured mechanics).  Accepts pre-cast 3D s4 tuples
    (:func:`cast_int4_mlp`) or raw int8 carriers."""
    # XLA:CPU's scan dot thunk has no bf16 x bf16 = f32 path; f32 there
    cd = (jnp.bfloat16 if jax.devices()[0].platform == "tpu"
          else jnp.float32)
    h = x
    for i, (q, scale, b) in enumerate(qparams):
        a = scale.shape[0]
        dout = q.shape[-1]
        if q.ndim == 2:
            q = q.reshape(a, q.shape[0] // a, dout).astype(jnp.int4)
        gg = q.shape[1]
        m = h.shape[0]
        hb = h.astype(cd)
        if m >= 64:
            # compute-bound regime: ONE full-K dot over the dequantized
            # weight (convert+scale fuse into the operand; the batched
            # group einsum would shatter the GEMM into a=K/g tiny-K dots
            # and materialize (a, M, N) partials — measured 9 TF/s vs
            # int8's 142 at B=512)
            wd = (q.astype(cd) * scale[:, None, :].astype(cd)).reshape(
                a * gg, dout)
            y = jnp.dot(hb, wd, preferred_element_type=jnp.float32)
        else:
            # weight-stream-bound regime (serving GEMV): batched group
            # einsum, s4 convert fused into the dot operand
            mp = max(m, 16)
            if mp != m:
                hb = jnp.pad(hb, ((0, mp - m), (0, 0)))
            xg = hb.reshape(mp, a, gg).transpose(1, 0, 2)
            part = jnp.einsum("amg,agn->amn", xg, q.astype(cd),
                              preferred_element_type=jnp.float32)
            y = jnp.einsum("amn,an->mn", part, scale)[:m]
        h = (y + b.astype(jnp.float32)).astype(jnp.bfloat16)
        if i < len(qparams) - 1:
            h = jax.nn.relu(h)
    return h


def bench_inference(
    configs: Sequence[tuple],
    dtype: str = "float32",
    n_hi: int = 8,
    reps: int = 2,
):
    """Inference sweep over (layers, din, hidden, dout, batch) tuples.
    Returns ComputeResult list; dtype 'int8' selects weight-only quant."""
    from jax import lax

    from param_tpu.comms.timing import measure_chain
    from param_tpu.ops.compute_bench import ComputeResult, _report
    from param_tpu.ops.mlp import mlp_forward
    from param_tpu.utils.chip import detect_chip, matmul_roofline_tflops

    chip = detect_chip()
    results = []
    for num_layers, din, hidden, dout, batch in configs:
        dims = [din] + [hidden] * (num_layers - 1) + [dout]
        fp_params = init_mlp(jax.random.PRNGKey(0), dims, jnp.float32)
        rng = np.random.default_rng(0)
        x32 = jnp.asarray(rng.random((batch, din), dtype=np.float32))
        prepare = lambda p: p  # noqa: E731 — hoisted once, ahead of scan
        if dtype == "int8":
            qparams = quantize_weights_int8(fp_params)
            fwd = lambda p, v: mlp_forward_int8(p, v)  # noqa: E731
            params = qparams
            x = x32.astype(jnp.bfloat16)
            peak = chip.bf16_tflops  # int8 weights ride the bf16 MXU path
        elif dtype == "int4":
            params = quantize_weights_int4(fp_params)
            prepare = cast_int4_mlp  # s4 cast once, outside the loop
            fwd = lambda p, v: mlp_forward_int4(p, v)  # noqa: E731
            x = x32.astype(jnp.bfloat16)
            peak = chip.bf16_tflops
        else:
            from param_tpu.utils.dtypes import dtype_from_name

            dt = dtype_from_name(dtype)
            params = jax.tree.map(lambda a: a.astype(dt), fp_params)
            x = x32.astype(dt)
            fwd = mlp_forward
            peak = matmul_roofline_tflops(chip, dtype)

        @functools.partial(jax.jit, static_argnames="nn")
        def chain(params, x, nn):
            params = prepare(params)

            def step(s, i):
                out = fwd(params, x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
            return s

        per = measure_chain(
            lambda nn: chain(params, x, nn=nn), n_lo=1, n_hi=n_hi, reps=reps
        )
        tf = mlp_flops(dims, batch, fwd_only=True) / per / 1e12
        results.append(
            _report(
                ComputeResult(
                    op="mlp_infer",
                    shape=(num_layers, din, hidden, dout, batch),
                    lat_us=per * 1e6,
                    tflops=tf,
                    qps=batch / per,
                    roofline_frac=tf / peak if peak else 0.0,
                ),
                dtype,
            )
        )
    return results
