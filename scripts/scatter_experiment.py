"""One-off: compare sparse row-update formulations on a big (1M, 64) table.

Candidates for the sparse-optimizer table update (K=20480 row updates into a
256 MB f32 operand, the 8x1M DLRM shard shape):

  A  in-place ``tab.at[idx].add(u)``       — zero extra memory, erratic path
  B  chunked-zeros delta + dense add      — fast scatter, +1 table of temps
  C  chunked dynamic-slice/update-slice   — fast scatter per chunk, in-place

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/scatter_experiment.py
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax import lax

E, D, K = 1_000_000, 64, 20_480
CHUNK = 250_000


def upd_a(tab, idx, u):
    return tab.at[idx].add(u)


def upd_b(tab, idx, u):
    from param_tpu.ops.embedding import _chunked_zero_scatter

    return tab + _chunked_zero_scatter(tab.shape, tab.dtype, idx, u)


def upd_c(tab, idx, u):
    for lo in range(0, E, CHUNK):
        local = idx - lo
        valid = (local >= 0) & (local < CHUNK)
        uu = jnp.where(valid[:, None], u, 0)
        local = jnp.clip(local, 0, CHUNK - 1)
        chunk = lax.dynamic_slice(tab, (lo, 0), (CHUNK, D))
        chunk = chunk.at[local].add(uu)
        tab = lax.dynamic_update_slice(tab, chunk, (lo, 0))
    return tab


T = 8


def upd_d(tabs, idx, u):
    """Current dlrm formulation: slice each table, scatter, re-stack."""
    outs = []
    for t in range(T):
        outs.append(tabs[t].at[(idx + t * 31) % E].add(u))
    return jnp.stack(outs)


def upd_e(tabs, idx, u):
    """Reshape to (T*E, D), ONE global scatter of T*K updates."""
    flat = tabs.reshape(T * E, -1)
    gidx = jnp.concatenate([(idx + t * 31) % E + t * E for t in range(T)])
    gu = jnp.tile(u, (T, 1))
    return flat.at[gidx].add(gu).reshape(T, E, -1)


def upd_f(tabs, idx, u):
    """Reshape to (T*E, D), T sequential per-table scatters (small K each)."""
    flat = tabs.reshape(T * E, -1)
    for t in range(T):
        flat = flat.at[(idx + t * 31) % E + t * E].add(u)
    return flat.reshape(T, E, -1)


def upd_g(tabs, idx, u):
    """dynamic_slice + scatter + dynamic_update_slice per table."""
    for t in range(T):
        chunk = lax.dynamic_slice(tabs, (t, 0, 0), (1, E, tabs.shape[2]))[0]
        chunk = chunk.at[(idx + t * 31) % E].add(u)
        tabs = lax.dynamic_update_slice(tabs, chunk[None], (t, 0, 0))
    return tabs


def upd_h(tabs, idx, u):
    """vmap'd (batched) scatter over the table axis."""
    all_idx = jnp.stack([(idx + t * 31) % E for t in range(T)])
    all_u = jnp.broadcast_to(u, (T,) + u.shape)
    return jax.vmap(lambda tab, i, uu: tab.at[i].add(uu))(tabs, all_idx, all_u)


def upd_j(tabs, idx, u):
    """Per-table in-place scatter on the STACKED operand: at[t, idx]."""
    for t in range(T):
        tabs = tabs.at[t, (idx + t * 31) % E].add(u)
    return tabs


def chain(update, n):
    @functools.partial(jax.jit, static_argnames="n", donate_argnums=(0,))
    def run(tab, idx, u, n):
        def step(tab, i):
            tab = update(tab, (idx + i) % E, u)
            return tab, jnp.float32(0)

        tab, _ = lax.scan(step, tab, jnp.arange(n))
        return jnp.sum(tab[0])

    return run


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (K,), 0, E, jnp.int32)
    u = jax.random.normal(jax.random.fold_in(key, 2), (K, D), jnp.float32)
    import sys

    single = [("A in-place", upd_a, (E, D)), ("B delta+add", upd_b, (E, D)),
              ("C chunk-dus", upd_c, (E, D))]
    stacked = [("D slice-stack", upd_d, (T, E, D)),
               ("E global-1scatter", upd_e, (T, E, D)),
               ("F global-Tscatter", upd_f, (T, E, D)),
               ("G dus", upd_g, (T, E, D)),
               ("H vmap-scatter", upd_h, (T, E, D)),
               ("J stacked-inplace", upd_j, (T, E, D))]
    if "--stacked2" in sys.argv:
        stacked = stacked[3:]
    cases = stacked if "--stacked" in sys.argv else single + stacked
    for name, update, shape in cases:
        run = chain(update, 0)
        times = {}
        for n in (2, 8):
            tab = jnp.zeros(shape, jnp.float32)
            s = run(tab, idx, u, n=n)
            float(s)  # warm compile + run
            tab = jnp.zeros(shape, jnp.float32)
            t0 = time.perf_counter()
            float(run(tab, idx, u, n=n))
            times[n] = time.perf_counter() - t0
        per = (times[8] - times[2]) / 6
        print(f"{name}: {per*1e3:8.2f} ms/update")


if __name__ == "__main__":
    main()
