"""Zipf dedup embedding experiment (SURVEY §7 "sorted-gather + segment-sum").

Question: under the Zipf(α=1.15) index skew the DLRM bench generates, does
unique-ifying the B·nnz indices, gathering each unique row ONCE, and
re-expanding (second gather from the small unique-row array, or hot-row
one-hot matmul on the MXU) beat the plain ``jnp.take``?

ANSWER (measured on v5e, see RESULTS.md "Zipf dedup study"): NO — plain
take wins under both distributions.  Two load-bearing facts discovered:

1. Gather rate DOES depend on source size (contradicting the round-1
   "table size does not move the rate" note, which only probed ≥51 MB
   sources): 2-4 MB sources gather at 370-540 M rows/s vs ~80-95 M rows/s
   for ≥32 MB sources.  But every dedup/cache formulation still pays the
   full B·nnz issue count somewhere PLUS preprocessing (pair-sort 737 µs,
   bag-scatter 1.5 ms), so none wins.
2. Duplicate-heavy index vectors gather SLOWER, not faster (zipf 76 M
   rows/s vs uniform 91 M rows/s on the same table) — hot rows serialize
   in the gather path rather than hitting a cache.

NOTE (axon): pass big tables as jit ARGUMENTS, not closures — a closed-over
512 MB table is baked into the program as a constant and the remote-compile
HTTP upload rejects it (HTTP 413).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dedup_experiment.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from param_tpu.comms.timing import measure_chain
from param_tpu.models.dlrm_data import gen_indices

B, NNZ, E, D = 8192, 32, 1_048_576, 128
K = B * NNZ  # 262144 drawn rows


def uniform_idx(rng):
    return rng.integers(0, E, size=(B, NNZ)).astype(np.int32)


def zipf_idx(rng):
    return gen_indices(rng, B, 1, NNZ, E, "zipf")[:, 0, :]


def chain_gather(table, idx, n):
    """n chained (B,nnz,D)-gather + pool steps, index-shifted per step."""
    def step(s, i):
        rows = jnp.take(table, (idx + i) % table.shape[0], axis=0)
        pooled = jnp.sum(rows.astype(jnp.float32), axis=1)
        return s + jnp.sum(pooled), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def rate(per_s, rows):
    return rows / per_s / 1e6  # M rows/s


_j_gather = jax.jit(chain_gather, static_argnums=2)


def stage_a():
    """Gather rate vs SOURCE size — is a small-source gather faster?  YES."""
    print("== A: gather rate vs source size (262144 row fetches, 128-dim f32)")
    rng = np.random.default_rng(0)
    for rows in (4096, 8192, 16384, 32768, 65536, 262144):
        table = jnp.asarray(rng.random((rows, D), dtype=np.float32))
        idx = jnp.asarray(rng.integers(0, rows, size=(B, NNZ)).astype(np.int32))
        per = measure_chain(lambda n: _j_gather(table, idx, n),
                            n_lo=2, n_hi=16, max_n=16)
        mb = rows * D * 4 / 2**20
        print(f"  src {rows:>8} rows ({mb:7.1f} MB): {per*1e6:9.1f} us "
              f"= {rate(per, K):7.1f} M rows/s")


def stage_b():
    """Preprocessing price: pair-sort (value, slot) and bag scatter-add."""
    print("== B: preprocessing cost at K=262144")
    flat = jnp.asarray(zipf_idx(np.random.default_rng(1)).reshape(-1))
    # NB: single-output jnp.sort(...)[0] chains get optimized to reduce-min
    # by XLA — only the pair sort (payload carried) measures the real sort.

    def chain_pairsort(n):
        slots = jnp.arange(K, dtype=jnp.int32)

        def step(s, i):
            k, v = lax.sort(((flat + i) % E, slots), num_keys=1)
            return s + k[0].astype(jnp.float32) + v[0].astype(jnp.float32), None

        s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
        return s

    def chain_scatter_bags(n):
        rows_ = jnp.asarray(
            np.random.default_rng(2).random((65536, D), dtype=np.float32))
        bags = jnp.asarray(
            np.random.default_rng(3).integers(0, B, 65536).astype(np.int32))

        def step(s, i):
            out = jnp.zeros((B, D), jnp.float32).at[(bags + i) % B].add(rows_)
            return s + out[0, 0], None

        s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
        return s

    for name, fn in (("pair-sort 262k", chain_pairsort),
                     ("scatter 65k->bags", chain_scatter_bags)):
        jfn = jax.jit(fn, static_argnums=0)
        per = measure_chain(jfn, n_lo=2, n_hi=16, max_n=16)
        print(f"  {name:>18}: {per*1e6:9.1f} us")


def dedup_chain(table, idx, n, cap):
    """sort → unique-compact to CAP slots → gather CAP rows from HBM →
    re-expand via gather from the (cap, D) unique-row array."""
    def step(s, i):
        f = ((idx.reshape(-1) + i) % E)
        srt, order = lax.sort((f, jnp.arange(K, dtype=jnp.int32)), num_keys=1)
        first = jnp.concatenate([jnp.ones((1,), bool), srt[1:] != srt[:-1]])
        upos = jnp.minimum(jnp.cumsum(first) - 1, cap - 1)  # overflow clamps
        uniq = jnp.zeros((cap,), jnp.int32).at[upos].set(srt)
        urows = jnp.take(table, uniq, axis=0)
        inv = jnp.zeros((K,), jnp.int32).at[order].set(upos)
        rows = jnp.take(urows, inv.reshape(B, NNZ), axis=0)
        return s + jnp.sum(jnp.sum(rows.astype(jnp.float32), axis=1)), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def hot_matmul_chain(table, padded, idx, n, hot):
    """hot/cold split: top-``hot`` rows resolved as a one-hot count matmul
    on the MXU; cold rows via the plain gather (pad row for hot slots)."""
    def step(s, i):
        f = (idx + i) % E
        is_hot = f < hot
        cold_rows = jnp.take(padded, jnp.where(is_hot, E, f), axis=0)
        pooled_cold = jnp.sum(cold_rows.astype(jnp.float32), axis=1)
        onehot = jax.nn.one_hot(
            jnp.where(is_hot, f, hot), hot + 1, dtype=jnp.bfloat16)
        counts = jnp.sum(onehot, axis=1)[:, :hot]
        pooled_hot = counts @ table[:hot].astype(jnp.bfloat16)
        return s + jnp.sum(pooled_cold + pooled_hot.astype(jnp.float32)), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def hot_cache_chain(cache, padded, idx, n, hot):
    """hot rows gathered from a small bf16 VMEM-scale cache, cold rows via
    pad-row gather from the full table."""
    def step(s, i):
        f = (idx + i) % E
        is_hot = f < hot
        cold_rows = jnp.take(padded, jnp.where(is_hot, E, f), axis=0)
        hot_rows = jnp.take(cache, jnp.where(is_hot, f, hot), axis=0)
        pooled = (jnp.sum(cold_rows.astype(jnp.float32), axis=1)
                  + jnp.sum(hot_rows.astype(jnp.float32), axis=1))
        return s + jnp.sum(pooled), None

    s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
    return s


def stage_c():
    """End-to-end candidates under zipf and uniform."""
    print("== C: end-to-end candidates (B=8192 nnz=32, 1Mx128 f32 table)")
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.random((E, D), dtype=np.float32))
    padded = jnp.concatenate([table, jnp.zeros((1, D), table.dtype)])
    hot = 8192
    cache = jnp.concatenate(
        [table[:hot], jnp.zeros((1, D), table.dtype)]).astype(jnp.bfloat16)
    j_dedup = jax.jit(dedup_chain, static_argnums=(2, 3))
    j_hotmm = jax.jit(hot_matmul_chain, static_argnums=(3, 4))
    j_hotc = jax.jit(hot_cache_chain, static_argnums=(3, 4))
    for dist, mk in (("zipf1.15", zipf_idx), ("uniform", uniform_idx)):
        np_idx = np.asarray(mk(rng))
        uniq = len(np.unique(np_idx))
        print(f"  [{dist}] unique {uniq}/{K} ({uniq/K:.1%}), "
              f"top-{hot}-row hit {float(np.mean(np_idx < hot)):.1%}")
        idx = jnp.asarray(np_idx)
        cands = {
            "plain take": lambda n: _j_gather(table, idx, n),
            "dedup cap=64k": lambda n: j_dedup(table, idx, n, 65536),
            "hot4096 matmul": lambda n: j_hotmm(table, padded, idx, n, 4096),
            "hot8k bf16 cache": lambda n: j_hotc(cache, padded, idx, n, hot),
        }
        for name, fn in cands.items():
            t0 = time.time()
            per = measure_chain(fn, n_lo=2, n_hi=16, max_n=16)
            gbs = K * D * 4 / per / 1e9
            print(f"    {name:>16}: {per*1e6:9.1f} us  "
                  f"{rate(per, K):7.1f} M rows/s  {gbs:6.1f} GB/s  "
                  f"[wall {time.time()-t0:.0f}s]")


def stage_d():
    """Index-order effects: sorted and duplicate-heavy index vectors."""
    print("== D: index-order effects on the plain gather")
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.random((E, D), dtype=np.float32))
    zi = np.asarray(zipf_idx(rng))
    variants = {
        "zipf unsorted": zi,
        "zipf bag-sorted": np.sort(zi, axis=1),
        "zipf global-sorted": np.sort(zi.reshape(-1)).reshape(B, NNZ),
        "all-same row": np.zeros((B, NNZ), np.int32),
        "uniform sorted": np.sort(
            rng.integers(0, E, (B, NNZ)).astype(np.int32), axis=None
        ).reshape(B, NNZ),
    }
    for name, np_idx in variants.items():
        idx = jnp.asarray(np_idx)
        per = measure_chain(lambda n: _j_gather(table, idx, n),
                            n_lo=2, n_hi=16, max_n=16)
        print(f"  {name:>18}: {per*1e6:9.1f} us  {rate(per, K):7.1f} M rows/s")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    stage_a()
    stage_b()
    stage_c()
    stage_d()
