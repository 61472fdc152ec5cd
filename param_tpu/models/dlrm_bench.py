"""DLRM communication-pattern benchmark with per-region timing.

TPU-native counterpart of the reference's ``commsDLRMBench``
(``train/comms/pt/dlrm.py``): times each region of the DLRM step —
sparse index exchange, embedding lookup, pooled-embedding all-to-all, dense
forward, and the fused forward/backward/optimizer step — and reports
p50/p75/p95 per region plus memory, QPS, and the ``--print-comms`` JSON
trace dump (basic schema, replayable by the trace replayer).

The reference times 21 eager regions with CUDA events (initTimers,
dlrm.py:961-1009).  Under XLA each region here is its own scalar-output
chained program timed with measure_chain; ``bwd_opt`` is derived as
step_total - fwd_total (XLA fuses the backward — there is no honest way to
split it further without profiler traces).
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from param_tpu.comms.timing import measure_chain
from param_tpu.models.dlrm import DlrmModel, _forward_local
from param_tpu.models.dlrm_data import RandomDataset
from param_tpu.utils.dtypes import dtype_size
from param_tpu.utils.sizes import percentile

# Region set mapped onto the reference's 21 named timer regions
# (initTimers, dlrm.py:961-1009).  Regions marked (iso) are isolated-op
# chain measurements of the op a fused backward would contain — XLA fuses
# the real backward, so the true in-context time is only bounded by these.
REGIONS = [
    "offset_xchg",  # lengths all-to-all (ragged pipeline stage 1)
    "idx_a2a",      # index redistribution (≈ idx_xchg)
    "emb_lookup",   # apply_emb
    "fwd_a2a",      # pooled-embedding forward all-to-all
    "bot_mlp_fwd",  # bottom MLP forward
    "interaction",  # dot-feature interaction
    "top_mlp_fwd",  # top MLP forward
    "dense_fwd",    # bot MLP + interaction + top MLP combined
    "fwd_total",    # full forward (loss)
    "bwd_a2a(iso)",     # transposed pooled a2a (comm 5)
    "bwd_top_ar(iso)",  # top-MLP grad all-reduce (comm 4)
    "bwd_bot_ar(iso)",  # bot-MLP grad all-reduce (comm 6)
    "step_total",   # forward + backward + optimizer
]


class DlrmCommBench:
    def __init__(self, model: DlrmModel, optimizer, lr: float = 0.01):
        """``optimizer`` is an optax optimizer for the dense fused step, or
        the string ``"sparse_sgd"`` / ``"sparse_adagrad"`` to time the
        sparse-row table-update step (the reference's fbgemm exact path)."""
        self.model = model
        self.optimizer = optimizer
        self.lr = lr
        cfg = model.cfg
        self.n = model.mesh.devices.size if model.mesh else 1
        self.local_batch = cfg.batch // self.n
        self.local_tables = cfg.num_tables // self.n

    # ----------------------------------------------------------- chain progs
    def make_chains(self, params, batch) -> Dict[str, Callable[[int], object]]:
        """Per-region scalar-output chain programs.  Each step perturbs its
        input with the loop counter so XLA cannot hoist work out of the
        scan."""
        model, cfg = self.model, self.model.cfg
        mesh = model.mesh
        AXIS = model.axis
        dense, idx, labels = batch
        param_spec = model._param_spec()

        import functools

        def smap(body, in_specs, out_specs=P()):
            # n (chain length) must be static: build one program per n,
            # cached — shard_map takes no static kwargs, so bind n first
            @functools.lru_cache(maxsize=None)
            def make(n):
                return jax.jit(
                    jax.shard_map(
                        functools.partial(body, n=n),
                        mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                        check_vma=False,
                    )
                )

            return make

        E = cfg.rows_per_table

        def idx_a2a_body(idx, n):
            def step(s, i):
                shifted = (idx + i) % E
                out = lax.all_to_all(shifted, AXIS, 1, 0, tiled=True)
                return s + jnp.sum(out[0].astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def emb_body(tables, idx, n):
            idx_local = lax.all_to_all(idx, AXIS, 1, 0, tiled=True)

            def step(s, i):
                shifted = (idx_local + i) % E
                pooled = model.lookup_local(tables, shifted)
                return s + jnp.sum(pooled.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def fwd_a2a_body(tables, idx, n):
            idx_local = lax.all_to_all(idx, AXIS, 1, 0, tiled=True)
            pooled = model.lookup_local(tables, idx_local)

            def step(s, i):
                p = pooled + i.astype(pooled.dtype) * 1e-6
                out = lax.all_to_all(p, AXIS, 0, 1, tiled=True)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def dense_body(params, dense, n):
            b = dense.shape[0]
            pooled = jnp.zeros((b, cfg.num_tables, cfg.emb_dim), cfg.dtype)

            def step(s, i):
                d = dense + i.astype(dense.dtype) * 1e-6
                logits = _forward_local(params, cfg, d, pooled)
                return s + jnp.sum(logits.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def fwd_body(params, dense, idx, labels, n):
            def step(s, i):
                shifted = (idx + i) % E
                loss = model._sharded_loss(params, dense, shifted, labels)
                return s + loss, None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return s

        def lengths_a2a_body(lengths, n):
            def step(s, i):
                shifted = lengths + (i % 2).astype(lengths.dtype)
                out = lax.all_to_all(shifted, AXIS, 1, 0, tiled=True)
                return s + jnp.sum(out[0].astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def bot_mlp_body(params, dense, n):
            from param_tpu.ops.mlp import mlp_forward

            def step(s, i):
                d = dense + i.astype(dense.dtype) * 1e-6
                out = mlp_forward(params["bot"], d)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def top_mlp_body(params, dense, n):
            from param_tpu.ops.mlp import mlp_forward

            b = dense.shape[0]
            feat = jnp.zeros((b, cfg.interaction_dim), cfg.dtype)

            def step(s, i):
                f = feat + i.astype(feat.dtype) * 1e-6
                out = mlp_forward(params["top"], f)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def interaction_body(params, dense, n):
            from param_tpu.models.dlrm import dot_interaction
            from param_tpu.ops.mlp import mlp_forward

            b = dense.shape[0]
            pooled = jnp.ones((b, cfg.num_tables, cfg.emb_dim), cfg.dtype)
            bot_out = mlp_forward(params["bot"], dense)

            def step(s, i):
                p = pooled + i.astype(pooled.dtype) * 1e-6
                feat = dot_interaction(bot_out, p)
                return s + jnp.sum(feat.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def bwd_a2a_body(tables, idx, n):
            # isolated transposed pooled a2a: same payload as comm 5
            b = idx.shape[0]
            g = jnp.ones((b, cfg.num_tables, cfg.emb_dim), cfg.dtype)

            def step(s, i):
                gg = g + i.astype(g.dtype) * 1e-6
                out = lax.all_to_all(gg, AXIS, 1, 0, tiled=True)
                return s + jnp.sum(out.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def make_ar_body(which):
            def ar_body(params, dense, n):
                leaves = jax.tree.leaves(params[which])

                def step(s, i):
                    tot = jnp.float32(0)
                    for l in leaves:
                        g = l + i.astype(l.dtype) * 1e-6
                        tot = tot + jnp.sum(lax.pmean(g, AXIS).astype(jnp.float32))
                    return s + tot, None

                s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
                return lax.psum(s, AXIS)

            return ar_body

        chains = {
            # lengths-shaped payload: one int32 per (sample, table)
            "offset_xchg": (
                smap(lengths_a2a_body, (P(AXIS, None),)),
                (idx[:, :, 0].astype(jnp.int32),),
            ),
            "bot_mlp_fwd": (
                smap(bot_mlp_body, (param_spec, P(AXIS, None))), (params, dense),
            ),
            "top_mlp_fwd": (
                smap(top_mlp_body, (param_spec, P(AXIS, None))), (params, dense),
            ),
            "interaction": (
                smap(interaction_body, (param_spec, P(AXIS, None))),
                (params, dense),
            ),
            "bwd_a2a(iso)": (
                smap(bwd_a2a_body, (param_spec["tables"], P(AXIS, None, None))),
                (params["tables"], idx),
            ),
            "bwd_top_ar(iso)": (
                smap(make_ar_body("top"), (param_spec, P(AXIS, None))),
                (params, dense),
            ),
            "bwd_bot_ar(iso)": (
                smap(make_ar_body("bot"), (param_spec, P(AXIS, None))),
                (params, dense),
            ),
            "idx_a2a": (smap(idx_a2a_body, (P(AXIS, None, None),)), (idx,)),
            "emb_lookup": (
                smap(emb_body, (param_spec["tables"], P(AXIS, None, None))),
                (params["tables"], idx),
            ),
            "fwd_a2a": (
                smap(fwd_a2a_body, (param_spec["tables"], P(AXIS, None, None))),
                (params["tables"], idx),
            ),
            "dense_fwd": (
                smap(dense_body, (param_spec, P(AXIS, None))),
                (params, dense),
            ),
            "fwd_total": (
                smap(
                    fwd_body,
                    (param_spec, P(AXIS, None), P(AXIS, None, None), P(AXIS)),
                ),
                (params, dense, idx, labels),
            ),
        }
        out = {
            name: (lambda make=make, args=args: lambda n: make(n)(*args))()
            for name, (make, args) in chains.items()
        }
        out["step_total"] = self._step_chain(params, batch)
        return out

    def _step_chain(self, params, batch):
        if isinstance(self.optimizer, str):
            return self._sparse_step_chain(params, batch)
        return self._dense_step_chain(params, batch)

    def _sparse_step_chain(self, params, batch):
        """Chain of sparse-row-update train steps (make_sparse_{sgd,adagrad}
        _step): only gathered rows are touched, no dense table grad."""
        import functools

        model = self.model
        dense, idx, labels = batch
        E = model.cfg.rows_per_table
        if self.optimizer == "sparse_sgd":
            raw = model.make_sparse_sgd_step(self.lr, jit=False)

            @functools.partial(jax.jit, static_argnames="n")
            def run(params, dense, idx, labels, n):
                def step(p, i):
                    shifted = (idx + i) % E
                    p, loss = raw(p, dense, shifted, labels)
                    return p, loss

                _, losses = jax.lax.scan(step, params, jnp.arange(n))
                return losses[-1]

            return lambda n: run(params, dense, idx, labels, n=n)

        raw = model.make_sparse_adagrad_step(self.lr, jit=False)
        acc = model.init_adagrad_state(params)

        @functools.partial(jax.jit, static_argnames="n")
        def run(params, acc, dense, idx, labels, n):
            def step(carry, i):
                p, a = carry
                shifted = (idx + i) % E
                p, a, loss = raw(p, a, dense, shifted, labels)
                return (p, a), loss

            _, losses = jax.lax.scan(step, (params, acc), jnp.arange(n))
            return losses[-1]

        return lambda n: run(params, acc, dense, idx, labels, n=n)

    def _dense_step_chain(self, params, batch):
        """Chain of REAL train steps (params/opt state carried through the
        scan) returning the final loss scalar."""
        model, opt = self.model, self.optimizer
        dense, idx, labels = batch
        vg = model.make_value_and_grad()
        import optax

        import functools

        @functools.partial(jax.jit, static_argnames="n")
        def run(params, opt_state, dense, idx, labels, n):
            def step(carry, i):
                p, st = carry
                shifted = (idx + i) % self.model.cfg.rows_per_table
                loss, grads = vg(p, dense, shifted, labels)
                updates, st = opt.update(grads, st, p)
                p = optax.apply_updates(p, updates)
                return (p, st), loss

            (_, _), losses = jax.lax.scan(step, (params, opt_state), jnp.arange(n))
            return losses[-1]

        opt_state = opt.init(params)
        return lambda n: run(params, opt_state, dense, idx, labels, n=n)

    # ------------------------------------------------------------------- run
    def run(self, reps: int = 3, n_lo: int = 1, n_hi: int = 8,
            regions: List[str] | None = None) -> Dict[str, Dict]:
        """``regions``: optional subset of region names to time (each region
        is its own compiled chain program; skipping regions skips their
        compiles — matters for big-table configs on real hardware)."""
        cfg = self.model.cfg
        ds = RandomDataset(
            batch=cfg.batch, dense_dim=cfg.dense_dim, num_tables=cfg.num_tables,
            nnz=cfg.nnz, num_rows=cfg.rows_per_table, num_batches=1,
        )
        params = self.model.init_params(jax.random.PRNGKey(0))
        params, batch = self.model.place(params, next(iter(ds)))
        chains = self.make_chains(params, batch)
        if regions is not None:
            unknown = set(regions) - set(chains)
            if unknown:
                raise ValueError(f"unknown regions {sorted(unknown)}; "
                                 f"known: {sorted(chains)}")
            chains = {k: v for k, v in chains.items() if k in regions}
        results: Dict[str, Dict] = {}
        for name, chain in chains.items():
            per = [measure_chain(chain, n_lo=n_lo, n_hi=n_hi) for _ in range(reps)]
            us = [t * 1e6 for t in per]
            results[name] = {
                "p50_us": percentile(us, 50),
                "p75_us": percentile(us, 75),
                "p95_us": percentile(us, 95),
            }
        if "step_total" in results and "fwd_total" in results:
            results["bwd_opt(derived)"] = {
                k: max(0.0, results["step_total"][k] - results["fwd_total"][k])
                for k in results["step_total"]
            }
        if "step_total" in results:
            step_us = results["step_total"]["p50_us"]
            results["_summary"] = {
                "qps": cfg.batch / (step_us / 1e6) if step_us else 0.0,
                "batch": cfg.batch,
                "world": self.n,
            }
        return results

    def report(self, results: Dict[str, Dict]) -> None:
        print(f"\nDLRM-RES world={self.n} batch={self.model.cfg.batch} "
              f"tables={self.model.cfg.num_tables}x{self.model.cfg.rows_per_table}"
              f"x{self.model.cfg.emb_dim} nnz={self.model.cfg.nnz}")
        print(f"{'region':>18}{'p50(us)':>12}{'p75(us)':>12}{'p95(us)':>12}")
        for name, r in results.items():
            if name.startswith("_"):
                continue
            print(f"{name:>18}{r['p50_us']:>12.1f}{r['p75_us']:>12.1f}"
                  f"{r['p95_us']:>12.1f}")
        s = results.get("_summary")
        if s:
            print(f"QPS: {s['qps']:.1f}")

    # ----------------------------------------------------------- print-comms
    def comms_trace(self) -> List[dict]:
        """The step's communication pattern as a basic-schema JSON trace
        (reference: --print-comms, dlrm.py:1393-1402; schema:
        commsTraceParser._parseBasicTrace).  Replayable by
        param_tpu.trace.replay."""
        cfg = self.model.cfg
        n = self.n
        es = dtype_size(cfg.dtype)
        idx_bytes = self.local_batch * cfg.num_tables * cfg.nnz * 4
        pooled_bytes = cfg.batch * self.local_tables * cfg.emb_dim * es
        bot_params = sum(
            a * b + b for a, b in zip(cfg.bot_mlp_dims()[:-1], cfg.bot_mlp_dims()[1:])
        )
        top_params = sum(
            a * b + b for a, b in zip(cfg.top_mlp_dims()[:-1], cfg.top_mlp_dims()[1:])
        )

        def comm(name, in_bytes, out_bytes, dtype="float32", markers=None):
            return {
                "comms": name,
                "in_msg_size": in_bytes // es,
                "out_msg_size": out_bytes // es,
                "dtype": dtype,
                "world_size": n,
                "markers": markers or [name],
            }

        return [
            comm("all_to_all", idx_bytes, idx_bytes, "int32", ["idx_xchg"]),
            comm("all_to_all", pooled_bytes, pooled_bytes, "float32", ["fwd_a2a"]),
            comm("all_reduce", top_params * es, top_params * es, "float32",
                 ["bwd_top_ar"]),
            comm("all_to_all", pooled_bytes, pooled_bytes, "float32", ["bwd_a2a"]),
            comm("all_reduce", bot_params * es, bot_params * es, "float32",
                 ["bwd_bot_ar"]),
        ]

    def dump_comms(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.comms_trace(), f, indent=2)
