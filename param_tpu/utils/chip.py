"""Per-chip peak specs for roofline reporting.

Public figures (approximate where unpublished); fp32 matmul peak on TPUs is
estimated at half the bf16 figure (MXU passes).  Used to report
``roofline_frac`` alongside absolute numbers (BASELINE.md targets are
expressed as fractions of roofline).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ChipSpec:
    name: str
    bf16_tflops: float
    fp32_tflops: float
    hbm_gbs: float
    hbm_gb: float
    ici_gbs: float  # per-link bidirectional
    vmem_mb: float = 128.0  # total VMEM (v5e measured: 128 MB; the
    #                         per-kernel scoped default is 16 MB)


CHIPS = {
    "v4": ChipSpec("v4", 275.0, 137.0, 1228.0, 32.0, 100.0, 128.0),
    "v5e": ChipSpec("v5e", 197.0, 98.5, 819.0, 16.0, 100.0, 128.0),
    "v5p": ChipSpec("v5p", 459.0, 229.0, 2765.0, 95.0, 200.0, 128.0),
    "v6e": ChipSpec("v6e", 918.0, 459.0, 1640.0, 32.0, 200.0, 128.0),
    "cpu": ChipSpec("cpu", 1.0, 0.5, 50.0, 64.0, 10.0, 0.0),
}


def detect_chip() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return CHIPS["v5e"]
    if "v5p" in kind or "v5" in kind:
        return CHIPS["v5p"]
    if "v6" in kind or "trillium" in kind:
        return CHIPS["v6e"]
    if "v4" in kind:
        return CHIPS["v4"]
    return CHIPS["cpu"]


def matmul_roofline_tflops(spec: ChipSpec, dtype_name: str) -> float:
    if "bfloat16" in dtype_name or "float16" in dtype_name:
        return spec.bf16_tflops
    return spec.fp32_tflops
