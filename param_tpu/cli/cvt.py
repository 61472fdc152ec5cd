"""CvT convolution-layer benchmark CLI.

Reference main: ``train/compute/pt/pytorch_cvt_convs.py:217-410``
(``--warmups``, ``--steps``, ``--device``, ``--forward_only`` over the 11
CvT-paper layer configs).  Timing here is chain-based (measure_chain), so
--steps maps to the chain length rather than an eager loop.

    python -m param_tpu.cli.cvt --forward-only --dtype bf16
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="param_tpu.cvt")
    ap.add_argument("--steps", type=int, default=8,
                    help="ops per timing chain (reference --steps)")
    ap.add_argument("--max-chain", type=int, default=64,
                    help="cap on adaptive chain growth")
    ap.add_argument("--forward-only", action="store_true")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "bf16"])
    ap.add_argument("--layer", default=None,
                    help="substring filter over layer names "
                         "(e.g. stage0, patch_embed)")
    ap.add_argument("--log", default="INFO")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    import logging

    logging.basicConfig(level=ns.log.upper())
    import jax.numpy as jnp

    from param_tpu.ops.cvt_convs import CVT_CONFIGS, bench_cvt, report

    configs = CVT_CONFIGS
    if ns.layer:
        configs = [c for c in configs if ns.layer in c.name]
        if not configs:
            print(f"no layer matches {ns.layer!r}", file=sys.stderr)
            return 1
    dtype = jnp.bfloat16 if ns.dtype in ("bf16", "bfloat16") else jnp.float32
    # one config at a time so results stream as they're measured (TPU
    # compiles are slow; a run cut short still reports what it finished)
    results = []
    for cfg in configs:
        r = bench_cvt([cfg], forward_only=ns.forward_only, dtype=dtype,
                      n_hi=ns.steps, max_n=ns.max_chain)
        report(r)
        results.extend(r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
