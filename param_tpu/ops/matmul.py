"""GEMM: XLA dot and a Pallas MXU-tiled kernel.

The compute-tier replacement for the reference's GEMM benches
(``train/compute/pt/pytorch_gemm.py`` — torch.mm/cuBLAS — and the Triton
kernel ``train/comms/pt/triton_matmul.py``).  On TPU the production path is
``jnp.dot`` (XLA emits optimal MXU code for a lone matmul); the Pallas kernel
exists to (a) prove kernel-level parity with the reference's Triton tier and
(b) serve as the fusion anchor for custom epilogues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gemm_flops(m: int, n: int, k: int) -> int:
    """2*M*N*K (reference: pytorch_gemm.py:130)."""
    return 2 * m * n * k


def _interpret() -> bool:
    """Pallas kernels only compile on TPU; CPU tests run interpreted."""
    return jax.devices()[0].platform != "tpu"


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul(a, b, out_dtype=None):
    """XLA matmul with fp32 MXU accumulation."""
    out_dtype = out_dtype or a.dtype
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(out_dtype)


def _mm_wres_kernel(a_ref, b_ref, o_ref, *, block_m: int):
    """One (block_m, K) x (K, bn) dot per grid step; B revolves in VMEM."""
    s = pl.program_id(1)
    o_ref[:] = jnp.dot(
        a_ref[pl.ds(s * block_m, block_m)], b_ref[:],
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype"))
def matmul_weight_resident(a_stack, b, *, block_n: int = 512, out_dtype=None):
    """S small-M GEMMs against ONE shared weight matrix, B staying resident
    in VMEM across the steps.

    The reference's GEMM bench loops ``torch.mm`` with the same B, so on an
    A100 the 33.5 MB bf16 (4096,4096) weight sits in the 40 MB L2 after the
    first iteration — its published small-M numbers are warm-weight numbers
    (``train/compute/pt/pytorch_gemm.py:95-137``).  A cold-HBM small-M GEMM
    on v5e is memory-bound (B streams at 819 GB/s: 41 us floor vs 21.8 us
    of MXU time for (128,4096,4096) bf16), so the honest TPU counterpart of
    the reference's measurement holds B in VMEM the same way the GPU holds
    it in L2: grid (N/bn, S) with the B tile's index map constant in S, so
    Mosaic's revolving-buffer pipeline fetches each B tile ONCE, and the A
    stack (S*M rows) loads once up front.

    a_stack: (S, M, K); returns (S, M, N).
    """
    s_steps, m, k = a_stack.shape
    k2, n = b.shape
    assert k == k2, f"inner dims mismatch: {a_stack.shape} @ {b.shape}"
    out_dtype = out_dtype or a_stack.dtype
    block_n = min(block_n, n)
    assert n % block_n == 0
    a2 = a_stack.reshape(s_steps * m, k)
    grid = (n // block_n, s_steps)  # j outer, s inner: B_j fetched once
    out = pl.pallas_call(
        functools.partial(_mm_wres_kernel, block_m=m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s_steps * m, k), lambda j, s: (0, 0)),
            pl.BlockSpec((k, block_n), lambda j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda j, s: (s, j)),
        out_shape=jax.ShapeDtypeStruct((s_steps * m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=s_steps * gemm_flops(m, n, k),
            bytes_accessed=(s_steps * m * k + k * n + s_steps * m * n)
            * a_stack.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a2, b)
    return out.reshape(s_steps, m, n)


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        a_ref[:], b_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype")
)
def matmul_pallas(
    a,
    b,
    *,
    block_m: int = 2048,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
):
    """Tiled Pallas matmul: grid (M/bm, N/bn, K/bk), fp32 VMEM accumulator,
    output written on the last K step.

    Default blocks from a v5e sweep (4096^3 bf16): 2048x512x512 reaches
    161 TF/s (~90%% of XLA's 180 for the same shape); wider N or deeper K
    blocks blow the 16 MB VMEM budget."""
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"inner dims mismatch: {a.shape} @ {b.shape}"
    out_dtype = out_dtype or a.dtype
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    if m % block_m or n % block_n or k % block_k:
        raise ValueError(
            f"shapes ({m},{n},{k}) must divide blocks ({block_m},{block_n},{block_k})"
        )
    n_k = k // block_k
    grid = (m // block_m, n // block_n, n_k)
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # v5e exposes 128 MB of VMEM; the default scoped limit is 16 MB
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=gemm_flops(m, n, k),
            bytes_accessed=(m * k + k * n + m * n) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(a, b)


# ------------------------------------------------ int4 weight-only GEMV/GEMM
def pack_int4(w, group: int = 128):
    """Quantize (K, N) float weights to group-wise int4: two nibbles per
    int8 byte along K (even K-rows in the low nibble, odd in the high),
    per-(group, output-column) max-abs scales.

    Returns (packed (K//2, N) int8, scale (K//group, N) f32).  The low
    nibble is stored BIASED by +8 (low_s + 8 in [1, 15]) so decoders can
    extract it without a sign-extension: low_s = (byte & 15) - 8, and the
    float-arithmetic unpack (the fast VPU path — see _mm_int4_kernel
    'float-unpack') needs no select.  The serving recipe one rung below
    ops/inference.py's int8 (reference ladder: infer_gpu:89 fp16 ->
    int8)."""
    k, n = w.shape
    g = min(group, k)
    assert k % g == 0 and g % 2 == 0, (k, g)
    wf = w.astype(jnp.float32).reshape(k // g, g, n)
    absmax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    q = q.astype(jnp.int8).reshape(k, n)
    return (
        jnp.bitwise_or(q[0::2] + jnp.int8(8),
                       jnp.left_shift(q[1::2], 4)).astype(jnp.int8),
        scale.astype(jnp.float32),
    )


def _mm_int4_kernel(xl_ref, xh_ref, p_ref, s_ref, o_ref, acc_ref,
                    *, n_k: int, gh: int, n_g: int, variant: str,
                    mxu_dtype=jnp.bfloat16):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if variant == "group-dots":
        # One dot pair per scale group: dequant hoists into the (M, bn)
        # epilogue, raw nibbles ride the MXU.  LOSES on v5e — n_g tiny
        # dots per block are MXU-issue-latency bound (sweep in
        # scripts/int4_experiment.py) — kept as the A/B.
        p = p_ref[:].astype(jnp.int32)
        lowb = (jnp.bitwise_and(p, 15) - 8).astype(mxu_dtype)
        highb = jax.lax.shift_right_arithmetic(p, 4).astype(mxu_dtype)
        for t in range(n_g):
            lo, hi = t * gh, (t + 1) * gh
            part = jnp.dot(xl_ref[:, lo:hi], lowb[lo:hi],
                           preferred_element_type=jnp.float32)
            part += jnp.dot(xh_ref[:, lo:hi], highb[lo:hi],
                            preferred_element_type=jnp.float32)
            # s_ref carries ALL scale rows for this N tile (a (K//g, bn)
            # block would break the 8-sublane tiling rule when n_g < 8)
            acc_ref[:] += part * s_ref[pl.ds(kk * n_g + t, 1)].astype(
                jnp.float32)
    else:
        bn = s_ref.shape[-1]
        s_t = s_ref[pl.ds(kk * n_g, n_g)].astype(mxu_dtype)
        sb = jnp.broadcast_to(s_t[:, None, :], (n_g, gh, bn)).reshape(
            n_g * gh, bn)
        if variant == "float-unpack":
            # Decode in FLOAT arithmetic — no int32 lane widening: the
            # byte value b = (low_s + 8) + 16*high_s is an exact small
            # integer in bf16, so high_s = floor(b/16) (exact: +8-biased
            # low keeps the fraction in (0,1)) and
            # low_s = b - 16*high_s - 8.
            pb = p_ref[:].astype(mxu_dtype)
            high = jnp.floor(pb * mxu_dtype(1 / 16))
            low = pb - high * mxu_dtype(16) - mxu_dtype(8)
        else:
            # "tile-scale": i32-widened bitwise decode (int8-wide shifts
            # fail to legalize in Mosaic: arith.shli on i8 vectors)
            p = p_ref[:].astype(jnp.int32)
            low = (jnp.bitwise_and(p, 15) - 8).astype(mxu_dtype)
            high = jax.lax.shift_right_arithmetic(p, 4).astype(mxu_dtype)
        # one fat dot per nibble plane, dequantized tile in-register
        acc_ref[:] += jnp.dot(xl_ref[:].astype(mxu_dtype), low * sb,
                              preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.dot(xh_ref[:].astype(mxu_dtype), high * sb,
                              preferred_element_type=jnp.float32)

    @pl.when(kk == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "block_k", "out_dtype", "variant"))
def matmul_int4(x, packed, scale, *, block_n: int = 0, block_k: int = 1024,
                out_dtype=None, variant: str = "tile-scale"):
    """x (M, K) @ int4-packed weights ((K//2, N) int8 + (K//g, N) scales,
    :func:`pack_int4` layout) -> (M, N).

    The XLA formulation of this product reads the packed buffer once per
    nibble plane and materializes dequantized bf16 planes (measured 638 us
    for the llama2 B=1 block-decode vs int8's 286 us); this kernel unpacks
    in-register so the weight stream is genuinely K*N/2 bytes.  M is padded
    to the bf16 sublane tile (16); for serving M is 1-32, so the dot is a
    skinny MXU pass and the bench is HBM-bound on the packed stream.  K is
    padded up to a block_k multiple with zero weight rows (llama's 11008
    has no large power-of-two factor).  Variants: scripts/int4_experiment.py
    sweep — 'tile-scale' (default) dequantizes each weight tile in-register
    and issues one fat dot per nibble plane; 'group-dots' hoists the scale
    into the epilogue at the cost of n_g tiny dots per block."""
    m, k = x.shape
    kh, n = packed.shape
    assert k == 2 * kh, (x.shape, packed.shape)
    assert kh % scale.shape[0] == 0
    gh = kh // scale.shape[0]  # half-group: packed rows per scale row
    out_dtype = out_dtype or x.dtype
    if not block_n:
        block_n = next(bn for bn in (512, 256, 128) if n % bn == 0)
    block_k = max(gh, min(block_k, kh + (-kh) % gh) // gh * gh)
    khp = kh + (-kh) % block_k
    if n % block_n:
        raise ValueError((n, block_n))
    mp = max(16, m + (-m) % 16)
    xb = x.astype(jnp.bfloat16)
    if mp != m:
        xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
    xl, xh = xb[:, 0::2], xb[:, 1::2]  # (mp, kh) each
    if khp != kh:
        xl = jnp.pad(xl, ((0, 0), (0, khp - kh)))
        xh = jnp.pad(xh, ((0, 0), (0, khp - kh)))
        packed = jnp.pad(packed, ((0, khp - kh), (0, 0)))
        scale = jnp.pad(scale, ((0, (khp - kh) // gh), (0, 0)),
                        constant_values=1.0)
    n_k = khp // block_k
    out = pl.pallas_call(
        functools.partial(_mm_int4_kernel, n_k=n_k, gh=gh,
                          n_g=block_k // gh, variant=variant,
                          # CPU interpret mode: the XLA:CPU dot thunk has
                          # no bf16 x bf16 = f32 path
                          mxu_dtype=jnp.float32 if _interpret()
                          else jnp.bfloat16),
        grid=(n // block_n, n_k),
        in_specs=[
            pl.BlockSpec((mp, block_k), lambda j, kk: (0, kk)),
            pl.BlockSpec((mp, block_k), lambda j, kk: (0, kk)),
            pl.BlockSpec((block_k, block_n), lambda j, kk: (kk, j)),
            pl.BlockSpec((khp // gh, block_n), lambda j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((mp, block_n), lambda j, kk: (0, j)),
        out_shape=jax.ShapeDtypeStruct((mp, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((mp, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * gemm_flops(m, n, kh),
            bytes_accessed=kh * n + scale.size * 4 + 2 * mp * kh * 2
            + mp * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xl, xh, packed, scale)
    return out[:m]
