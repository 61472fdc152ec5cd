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
