"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: EmbeddingBag lookup bandwidth on the BASELINE config
(1 table, 1M rows x 128-dim, batch 8192, nnz 30, sum pooling, f32, single
chip).  ``vs_baseline`` compares against the best published reference number
(27.65 GB/s, CPU EmbeddingBag at batch 16k — train/compute/pt/README.md:78).

Timing: scalar-fetch delta-N chains (param_tpu.comms.timing.measure_chain) —
the only methodology whose numbers are trustworthy on remote-attached TPUs,
where ``block_until_ready`` can return before execution.  Each chain step
shifts the index matrix so no gather can be CSE'd away.
"""

import functools
import json
import sys


def _tpu_relay_reachable() -> bool:
    """Fast-fail probe: when the chip is attached through the axon relay,
    a dead relay makes ``jax.devices()`` hang FOREVER (observed; see
    CLAUDE.md).  Probe the relay ports with a short timeout first so the
    driver gets an honest error line instead of a hung process."""
    import os
    import socket

    env = os.environ.get("JAX_PLATFORMS", "")
    axon = "axon" in env or (
        not env and ".axon_site" in os.environ.get("PYTHONPATH", "")
    )
    if not axon:
        return True
    for port in (8103, 8102, 8107):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=3):
                return True
        except OSError:
            continue
    return False


def main() -> int:
    if not _tpu_relay_reachable():
        print(json.dumps({
            "metric": "emb_lookup_bw_1Mx128_b8192_nnz30", "value": 0.0,
            "unit": "GB/s", "vs_baseline": 0.0,
            "error": "axon relay unreachable (jax.devices() would hang); "
                     "last on-chip validation: 40.84 GB/s / 1.477x "
                     "(RESULTS.md, 2026-08-17)",
        }))
        return 1
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from param_tpu.comms.timing import measure_chain
    from param_tpu.ops.embedding import embedding_bytes

    E, D, B, NNZ = 1_000_000, 128, 8192, 30
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((E, D), dtype=np.float32))
    base_idx = jnp.asarray(rng.integers(0, E, size=(B, NNZ)).astype(np.int32))
    nbytes = embedding_bytes(B, NNZ, D, 4)
    platform = jax.devices()[0].platform

    @functools.partial(jax.jit, static_argnames="n")
    def xla_chain(table, base, n):
        def step(s, i):
            idx = (base + i) % E
            out = jnp.sum(jnp.take(table, idx, axis=0), axis=1)
            return s + jnp.sum(out), None

        s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
        return s

    # NOTE: the Pallas DMA-gather kernel is slower than the XLA gather for
    # this config (issue-rate bound, see param_tpu/ops/embedding.py) and a
    # scan-of-pallas chain compiles very slowly, so the headline uses the
    # XLA path only.
    candidates = {"xla": lambda n: xla_chain(table, base_idx, n)}

    n_hi = 9 if platform == "tpu" else 3
    best = None
    for name, chain in candidates.items():
        try:
            per = measure_chain(chain, n_lo=1, n_hi=n_hi, reps=3)
        except Exception as e:  # noqa: BLE001
            print(f"# {name} path failed: {str(e)[:200]}", file=sys.stderr)
            continue
        gbs = nbytes / per / 1e9
        print(f"# {name}: {per*1e6:.0f} us/step, {gbs:.1f} GB/s", file=sys.stderr)
        if best is None or gbs > best[1]:
            best = (name, gbs, per)

    if best is None:
        print(json.dumps({"metric": "emb_lookup_bw", "value": 0.0, "unit": "GB/s",
                          "vs_baseline": 0.0, "error": "all paths failed"}))
        return 1

    name, gbs, per = best
    reference_best = 27.65  # GB/s, reference CPU EmbeddingBag (README.md:78)
    print(
        json.dumps(
            {
                "metric": "emb_lookup_bw_1Mx128_b8192_nnz30",
                "value": round(gbs, 2),
                "unit": "GB/s",
                "vs_baseline": round(gbs / reference_best, 3),
                "detail": {
                    "path": name,
                    "us_per_step": round(per * 1e6, 1),
                    "lookups_per_s": round(B * NNZ / per),
                    "platform": platform,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
