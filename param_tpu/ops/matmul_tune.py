"""Analytic matmul time model + block autotuner for the Pallas GEMM.

The TPU analogue of the reference's Triton autotune pipeline
(``train/comms/pt/triton_matmul.py`` autotune configs +
``matmul_perf_model.py::estimate_matmul_time`` pruning): candidate block
shapes are enumerated from the chip's VMEM budget, ranked by an analytic
``max(compute, load) + store`` time model, and only the top few are
actually measured on hardware.

Model (per grid): the Mosaic pipeline streams A tiles (each loaded
``N/bn`` times), B tiles (each loaded ``M/bm`` times), and writes C once;
compute is ``2·M·N·K`` at the dtype's MXU peak derated for narrow tiles
(sub-512 blocks under-fill the 8×128×128 systolic passes).  Double
buffering means time ≈ max(compute, HBM traffic) + C store.

Measured context (RESULTS.md): on the SHARED v5e chip, single-window
measurements carry ±15% tenant noise — ``tune_matmul`` therefore measures
all finalists interleaved, several repetitions each, and ranks medians.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

from param_tpu.utils.chip import ChipSpec, detect_chip, matmul_roofline_tflops

# MXU-friendly block extents (multiples of the 128-lane register tiling)
_EXTENTS = (128, 256, 512, 1024, 2048, 4096)


@dataclass(frozen=True)
class BlockCandidate:
    bm: int
    bn: int
    bk: int
    est_us: float  # analytic estimate

    def astuple(self) -> Tuple[int, int, int]:
        return self.bm, self.bn, self.bk


def vmem_bytes(bm: int, bn: int, bk: int, dtsize: int) -> int:
    """Double-buffered A/B tiles + the fp32 accumulator + C tile."""
    return 2 * (bm * bk + bk * bn) * dtsize + bm * bn * 4 + bm * bn * dtsize


def estimate_matmul_time_us(
    m: int, n: int, k: int,
    bm: int, bn: int, bk: int,
    dtsize: int = 2,
    chip: Optional[ChipSpec] = None,
) -> float:
    """Analytic per-op microseconds: max(compute, HBM load) + C store
    (reference model shape: matmul_perf_model.py:71-171)."""
    chip = chip or detect_chip()
    peak_tfs = chip.bf16_tflops if dtsize == 2 else chip.fp32_tflops
    # derate narrow tiles: the MXU pipeline under-fills below 512-wide
    # operands (measured: 512-class blocks reach ~80% of the 2048-class)
    fill = min(1.0, bm / 512) * min(1.0, bn / 512)
    eff_tfs = peak_tfs * (0.7 + 0.3 * fill)
    compute_us = 2.0 * m * n * k / (eff_tfs * 1e12) * 1e6

    # HBM traffic: A streamed ceil(n/bn) times, B ceil(m/bm) times, C once
    loads = (m * k) * -(-n // bn) + (k * n) * -(-m // bm)
    load_us = loads * dtsize / (chip.hbm_gbs * 1e9) * 1e6
    store_us = m * n * dtsize / (chip.hbm_gbs * 1e9) * 1e6
    return max(compute_us, load_us) + store_us


def candidate_blocks(
    m: int, n: int, k: int,
    dtsize: int = 2,
    chip: Optional[ChipSpec] = None,
    vmem_limit_mb: float = 100.0,
    top: int = 5,
) -> List[BlockCandidate]:
    """Enumerate VMEM-feasible block shapes, ranked by the analytic model
    (the autotune-pruning role of the reference's perf model: only ``top``
    finalists get measured)."""
    chip = chip or detect_chip()
    budget = int(min(vmem_limit_mb, chip.vmem_mb) * 2**20)

    def extents(dim):
        # feasible per-axis blocks: standard extents clipped to the dim,
        # plus the dim itself when it's lane-friendly (covers shapes
        # smaller than 128 or indivisible by the standard extents)
        es = [e for e in _EXTENTS if e <= dim and dim % e == 0]
        if not es:
            es = [dim]
        return es

    def build(min_grid_steps):
        out = []
        for bm in extents(m):
            for bn in extents(n):
                for bk in extents(k):
                    if vmem_bytes(bm, bn, bk, dtsize) > budget:
                        continue
                    # the Mosaic pipeline needs grid steps to overlap DMA
                    # with compute — giant blocks can't double-buffer
                    steps = (m // bm) * (n // bn) * (k // bk)
                    if steps < min_grid_steps:
                        continue
                    out.append(
                        BlockCandidate(
                            bm, bn, bk,
                            estimate_matmul_time_us(m, n, k, bm, bn, bk,
                                                    dtsize, chip),
                        )
                    )
        return out

    cands = build(8)
    if not cands:  # small shapes: any feasible grid beats none
        cands = build(1)

    def reloads(c):
        return (m * k) * -(-n // c.bn) + (k * n) * -(-m // c.bm)

    # compute-bound candidates tie on est_us — break ties by HBM reload
    # traffic (less re-streaming = more schedule slack), then square-ish
    # blocks (measured best on v5e: 1024³ beats 2048x1024-class)
    cands.sort(key=lambda c: (round(c.est_us, 1), reloads(c),
                              abs(c.bm - c.bn), -c.bk))
    return cands[:top]


def tune_matmul(
    a, b,
    candidates: Optional[Sequence[Tuple[int, int, int]]] = None,
    reps: int = 3,
    n_hi: int = 8,
    max_n: int = 16,
) -> Tuple[Tuple[int, int, int], dict]:
    """Measure the analytic finalists INTERLEAVED (shared-chip noise is
    ±15% across windows — see RESULTS.md matmul A/B methodology) and return
    (best (bm, bn, bk), {blocks: median_us})."""
    import statistics

    import jax
    import jax.numpy as jnp
    from jax import lax

    from param_tpu.comms.timing import measure_chain
    from param_tpu.ops.matmul import matmul_pallas

    m, k = a.shape
    _, n = b.shape
    if candidates is None:
        candidates = [
            c.astuple()
            for c in candidate_blocks(m, n, k, a.dtype.itemsize)
        ]
    if not candidates:
        raise ValueError(f"no feasible blocks for {(m, n, k)}")

    def chain(bm, bn, bk):
        def f(nn):
            def step(s, i):
                aa = a + i.astype(a.dtype)
                out = matmul_pallas(aa, b, block_m=bm, block_n=bn, block_k=bk)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(nn))
            return s

        return jax.jit(f, static_argnums=0)

    chains = {c: chain(*c) for c in candidates}
    samples = {c: [] for c in candidates}
    for _ in range(reps):
        for c, fn in chains.items():  # interleaved across candidates
            samples[c].append(
                measure_chain(fn, n_lo=1, n_hi=n_hi, max_n=max_n))
    medians = {c: statistics.median(v) * 1e6 for c, v in samples.items()}
    best = min(medians, key=medians.get)
    return best, medians
