"""Coalesced-DMA gather experiment (VERDICT r2 #8).

The headline embedding metric is pinned at ~80-95 M rows/s by the per-row
issue cost of random single-row gathers (ops/embedding.py:12-35): every
512 B row costs one gather-loop iteration (XLA take, ~12 ns) or one DMA
descriptor (Pallas, ~16 ns).  The dedup study killed the *row-count*
reformulations; this probes the untried *descriptor-count* lever: fetch K
consecutive table rows with ONE DMA descriptor, so the per-descriptor issue
cost amortizes K ways while total bytes stay the same.

Stage A — mechanism microbench: same total rows fetched, descriptor length
K in {1,2,4,8,16,32}.  If time ≈ n_desc·t_issue + bytes/BW with flat
t_issue, the lever is real and the curve yields t_issue and the effective
streaming bandwidth; if t_issue grows with K, the lever is dead.

Stage B — end-to-end embedding bag: per-TILE index sorting (bag structure
restored inside VMEM, so no global unsort/segment-sum — the cost that sank
the dedup variants), aligned R-row block fetch with per-tile block dedup,
and an in-kernel VMEM re-gather (vector loads, no DMA descriptors).
Compared against plain ``jnp.take`` under uniform AND zipf indices.

NOTE (axon): pass big tables as jit ARGUMENTS, not closures (HTTP 413).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/coalesce_experiment.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from param_tpu.comms.timing import measure_chain
from param_tpu.models.dlrm_data import gen_indices
from param_tpu.ops.matmul import _interpret

B, NNZ, E, D = 8192, 32, 1_048_576, 128
K_ROWS = B * NNZ  # 262144 fetched rows


# ===================================================================
# Stage A: descriptor-length cost curve
# ===================================================================

_UNROLL = 8


def _desc_kernel(starts_hbm, table_ref, o_ref, rows_ref, st_ref, row_sems,
                 st_sem, *, k: int, n_desc: int):
    """Fetch n_desc descriptors of k consecutive rows each (double-buffered
    fetch-ahead like ops/embedding._emb_gather_kernel), then sum-pool."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    def st_dma(tile):
        return pltpu.make_async_copy(starts_hbm.at[tile], st_ref, st_sem)

    def issue(slot):
        def body(dd, _):
            for u in range(_UNROLL):
                d = dd * _UNROLL + u
                s = st_ref[0, d]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(s, k)],
                    rows_ref.at[slot, pl.ds(d * k, k)],
                    row_sems.at[slot],
                ).start()
            return 0

        lax.fori_loop(0, n_desc // _UNROLL, body, 0)

    @pl.when(i == 0)
    def _():
        st_dma(0).start()
        st_dma(0).wait()
        issue(0)

    @pl.when(i + 1 < n_tiles)
    def _():
        st_dma(i + 1).start()
        st_dma(i + 1).wait()
        issue((i + 1) % 2)

    slot = i % 2
    pltpu.make_async_copy(
        rows_ref.at[slot], rows_ref.at[slot], row_sems.at[slot]
    ).wait()
    o_ref[:] = jnp.sum(
        rows_ref[slot].astype(jnp.float32), axis=(0, 1))[None, None]


@functools.partial(jax.jit, static_argnames=("k", "rows_per_tile"))
def desc_fetch(table, starts, k: int, rows_per_tile: int = 4096):
    """starts: (n_total_desc,) int32 row starts; fetches k rows per start."""
    n_desc = rows_per_tile // k
    n_tiles = starts.shape[0] // n_desc
    table3 = table.reshape(table.shape[0], 1, D)
    st3 = starts.reshape(n_tiles, 1, n_desc)
    return pl.pallas_call(
        functools.partial(_desc_kernel, k=k, n_desc=n_desc),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        # 3D out with block dims == array dims in the last two axes: a
        # (1, D) 2D block violates the TPU (8,128)-divisibility rule
        out_specs=pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows_per_tile, 1, D), table.dtype),
            pltpu.SMEM((1, n_desc), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, D), jnp.float32),
        interpret=_interpret(),
    )(st3, table3)[:, 0]


def stage_a():
    print("=== stage A: per-descriptor cost vs descriptor length K ===")
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((E, D), dtype=np.float32))
    results = {}
    for k in (1, 2, 4, 8, 16, 32):
        n_desc_total = K_ROWS // k
        starts = jnp.asarray(
            rng.integers(0, E - k, size=(n_desc_total,)).astype(np.int32))

        # table/starts must be jit ARGUMENTS (closure constants embed in
        # the HLO upload -> HTTP 413 on axon; see module docstring)
        def chain(table, starts, n, k=k):
            def step(s, i):
                out = desc_fetch(table, (starts + i) % (E - k), k)
                return s + jnp.sum(out), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return s

        jchain = jax.jit(chain, static_argnums=2)
        per = measure_chain(lambda n: jchain(table, starts, n),
                            n_lo=1, n_hi=8, max_n=32)
        gbs = K_ROWS * D * 4 / per / 1e9
        ns_per_desc = per / n_desc_total * 1e9
        results[k] = (per, gbs, ns_per_desc)
        print(f"  K={k:3d}: {per*1e3:8.3f} ms  {gbs:7.1f} GB/s  "
              f"{ns_per_desc:7.1f} ns/desc  "
              f"({K_ROWS/per/1e6:6.1f} M rows/s)")
    return results


# ===================================================================
# Stage B: end-to-end bag lookup with per-tile sort + block arena
# ===================================================================


def _arena_kernel(blocks_hbm, offs_hbm, table_ref, o_ref, arena_ref,
                  rows2_ref, blk_ref, off_ref, row_sems, meta_sem, *,
                  r_blk: int, n_blocks: int, tile_bags: int, nnz: int):
    """Per tile: DMA n_blocks aligned r_blk-row blocks into the VMEM arena,
    then re-gather the tile's rows from VMEM by precomputed flat offsets
    (vector loads — no DMA descriptors) and sum-pool per bag."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    rpt = tile_bags * nnz

    def meta_dma(tile, sl):
        return (
            pltpu.make_async_copy(blocks_hbm.at[tile], blk_ref.at[sl],
                                  meta_sem),
            pltpu.make_async_copy(offs_hbm.at[tile], off_ref.at[sl],
                                  meta_sem),
        )

    def issue(sl):
        def body(dd, _):
            for u in range(_UNROLL):
                d = dd * _UNROLL + u
                s = blk_ref[sl, 0, d]
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(s, r_blk)],
                    arena_ref.at[sl, pl.ds(d * r_blk, r_blk)],
                    row_sems.at[sl],
                ).start()
            return 0

        lax.fori_loop(0, n_blocks // _UNROLL, body, 0)

    @pl.when(i == 0)
    def _():
        for c in meta_dma(0, 0):
            c.start()
        for c in meta_dma(0, 0):
            c.wait()
        issue(0)

    @pl.when(i + 1 < n_tiles)
    def _():
        sl = (i + 1) % 2
        for c in meta_dma(i + 1, sl):
            c.start()
        for c in meta_dma(i + 1, sl):
            c.wait()
        issue(sl)

    sl = i % 2
    pltpu.make_async_copy(
        arena_ref.at[sl], arena_ref.at[sl], row_sems.at[sl]
    ).wait()

    # VMEM re-gather in ORIGINAL bag order (off encodes sort + arena slot):
    # plain vector load/store per row — no DMA descriptors on this path
    def gbody(rr, _):
        for u in range(_UNROLL):
            r = rr * _UNROLL + u
            rows2_ref[r] = arena_ref[sl, off_ref[sl, 0, r]]
        return 0

    lax.fori_loop(0, rpt // _UNROLL, gbody, 0)
    rows = rows2_ref[...].reshape(tile_bags, nnz, D)
    o_ref[:] = jnp.sum(rows.astype(jnp.float32), axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("r_blk", "tile_bags"))
def coalesced_bag(table, idx, r_blk: int = 8, tile_bags: int = 16):
    """Sum-pooled embedding bag via per-tile sorted block-coalesced DMA."""
    batch, nnz = idx.shape
    rpt = tile_bags * nnz
    n_tiles = batch // tile_bags
    tiles = idx.reshape(n_tiles, rpt)

    # --- XLA pre-pass: per-tile sort, block dedup, arena offsets
    order = jnp.argsort(tiles, axis=1)
    sorted_idx = jnp.take_along_axis(tiles, order, axis=1)
    blk = sorted_idx // r_blk
    newblk = jnp.concatenate(
        [jnp.ones((n_tiles, 1), bool), blk[:, 1:] != blk[:, :-1]], axis=1)
    slot = jnp.cumsum(newblk, axis=1) - 1  # arena block slot per sorted row
    # block start rows, scattered into the (padded) per-tile block list
    blocks = jnp.zeros((n_tiles, rpt), jnp.int32)
    blocks = jax.vmap(
        lambda b, s, v: b.at[s].set(v.astype(jnp.int32))
    )(blocks, slot, blk * r_blk)
    # flat arena offset of each sorted row, then un-sorted to bag order
    arena_off = slot * r_blk + (sorted_idx - blk * r_blk)
    inv = jnp.argsort(order, axis=1)
    offs = jnp.take_along_axis(arena_off, inv, axis=1).astype(jnp.int32)

    table3 = table.reshape(table.shape[0], 1, D)
    return pl.pallas_call(
        functools.partial(_arena_kernel, r_blk=r_blk, n_blocks=rpt,
                          tile_bags=tile_bags, nnz=nnz),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((tile_bags, D), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rpt * r_blk, 1, D), table.dtype),
            pltpu.VMEM((rpt, 1, D), table.dtype),
            pltpu.SMEM((2, 1, rpt), jnp.int32),
            pltpu.SMEM((2, 1, rpt), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((batch, D), table.dtype),
        interpret=_interpret(),
    )(blocks.reshape(n_tiles, 1, rpt), offs.reshape(n_tiles, 1, rpt),
      table3)


def stage_b():
    print("=== stage B: end-to-end bag lookup, coalesced vs plain take ===")
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((E, D), dtype=np.float32))

    def plain_chain(table, idx, n):
        def step(s, i):
            rows = jnp.take(table, (idx + i) % E, axis=0)
            return s + jnp.sum(jnp.sum(rows.astype(jnp.float32), axis=1)), None

        s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
        return s

    def coal_chain(table, idx, n, r_blk):
        def step(s, i):
            out = coalesced_bag(table, (idx + i) % E, r_blk=r_blk)
            return s + jnp.sum(out.astype(jnp.float32)), None

        s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
        return s

    jplain = jax.jit(plain_chain, static_argnums=2)
    jcoal = jax.jit(coal_chain, static_argnums=(2, 3))
    for dist in ("uniform", "zipf"):
        if dist == "uniform":
            idx = rng.integers(0, E, size=(B, NNZ)).astype(np.int32)
        else:
            idx = gen_indices(rng, B, 1, NNZ, E, "zipf")[:, 0, :]
        idx = jnp.asarray(idx)
        # distinct blocks per 512-row tile (the coalescing factor)
        t = np.asarray(idx).reshape(-1, 16 * NNZ)
        for r_blk in (8,):
            bl = np.sort(t, axis=1) // r_blk
            distinct = (np.diff(bl, axis=1) != 0).sum(axis=1).mean() + 1
            print(f"  [{dist}] distinct {r_blk}-row blocks per 512-row tile: "
                  f"{distinct:.0f} (coalesce factor {512/distinct:.2f}x, "
                  f"bytes amplification {distinct*r_blk/512:.2f}x)")
        # interleaved A/B medians (RESULTS.md matmul A/B methodology)
        pp, cc = [], []
        for rep in range(3):
            pp.append(measure_chain(lambda n: jplain(table, idx, n),
                                    n_lo=1, n_hi=8, max_n=32))
            cc.append(measure_chain(lambda n: jcoal(table, idx, n, 8),
                                    n_lo=1, n_hi=8, max_n=32))
        p, c = np.median(pp), np.median(cc)
        print(f"  [{dist}] plain take: {p*1e3:8.3f} ms "
              f"({K_ROWS/p/1e6:6.1f} M rows/s)   "
              f"coalesced R=8: {c*1e3:8.3f} ms ({K_ROWS/c/1e6:6.1f} M rows/s)"
              f"   -> {'WIN' if c < p else 'LOSS'} {p/c:.2f}x")


def verify():
    """Correctness of both kernels (interpret mode on CPU)."""
    rng = np.random.default_rng(1)
    e, d = 4096, D
    table = jnp.asarray(rng.random((e, d), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, e, size=(64, 8)).astype(np.int32))
    want = jnp.sum(jnp.take(table, idx, axis=0), axis=1)
    got = coalesced_bag(table, idx, r_blk=8, tile_bags=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
    starts = jnp.asarray(rng.integers(0, e - 8, size=(512,)).astype(np.int32))
    out = desc_fetch(table, starts, k=8, rows_per_tile=1024)
    want_a = jnp.stack([
        jnp.sum(jnp.concatenate(
            [table[s:s + 8] for s in np.asarray(starts[j*128:(j+1)*128])]),
            axis=0)
        for j in range(4)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_a), rtol=1e-4)
    print("verify: both kernels match reference outputs OK")


if __name__ == "__main__":
    if "--verify" in sys.argv:
        verify()
        sys.exit(0)
    t0 = time.time()
    a = stage_a()
    stage_b()
    print(f"total {time.time()-t0:.0f}s")
