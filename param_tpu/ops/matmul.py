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
