"""DLRM communication-pattern benchmark with per-region timing.

TPU-native counterpart of the reference's ``commsDLRMBench``
(``train/comms/pt/dlrm.py``): times each region of the DLRM step —
sparse index exchange, embedding lookup, pooled-embedding all-to-all, dense
forward, and the fused forward/backward/optimizer step — and reports
p50/p75/p95 per region plus memory, QPS, and the ``--print-comms`` JSON
trace dump (basic schema, replayable by the trace replayer).

The reference times 21 eager regions with CUDA events (initTimers,
dlrm.py:961-1009) and reports per-region payload memory plus cross-rank
percentiles (reportBenchTime, dlrm.py:1011-1198).  Under XLA each region
here is its own scalar-output chained program timed with measure_chain;
``bwd_opt`` is derived as step_total - fwd_total (XLA fuses the backward —
the per-phase backward rows below are isolated-op ``(iso)`` chains of the
op each eager region would contain).  ``report()`` prints the full
21-row reference table (memory(B), min/p50/p75/p95, running sum(p50))
with our region keys mapped onto the reference's row names (REF_ROWS),
gathering samples across processes first when run multi-host.

Region mapping notes (eager region -> TPU-native measurement):
- mem_push_idx / mem_push_gradients: H2D ``device_put`` of the batch's
  index / label arrays (distinct host buffers each call so nothing is
  cached), forced by a scalar fetch.  On a remote-attached chip this
  includes the tunnel — exactly what the host would pay here.
- intermed_post_idx_xchg_sparse_dist (splitPerTable, dlrm.py:430): the
  (B, T_local) -> (T_local, B) regroup behind ``lax.optimization_barrier``
  so XLA emits the real relayout copy instead of folding it into the
  consuming gather (which is what happens — for free — in the fused
  train step).
- intermed_top_ar_end_to_bwd_a2a_start / intermed_bwd_a2a_bot_ar: grad
  chains of the top / bottom MLP (fwd+bwd — XLA cannot run a backward
  without its forward in one program; the fwd-only rows let the reader
  subtract).
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
    "calc_length",      # offsets -> per-table lengths (data prep)
    "mem_push_idx",     # H2D push of the index batch
    "send_splits",      # per-destination send counts from lengths
    "offset_xchg",      # lengths all-to-all (ragged pipeline stage 1)
    "recv_splits",      # recv offsets (cumsum of exchanged lengths)
    "idx_xchg",         # index redistribution all-to-all
    "split_per_table",  # regroup received idx per local table
    "emb_lookup",       # apply_emb
    "fwd_a2a",          # pooled-embedding forward all-to-all
    "post_a2a_fwd",     # interaction + top MLP + loss after the a2a
    "mem_push_gradients",  # H2D push of the label batch
    "bot_mlp_fwd",      # bottom MLP forward
    "interaction",      # dot-feature interaction
    "top_mlp_fwd",      # top MLP forward
    "dense_fwd",        # bot MLP + interaction + top MLP combined
    "fwd_total",        # full forward (loss)
    "bwd_a2a(iso)",     # transposed pooled a2a (comm 5)
    "bwd_top_ar(iso)",  # top-MLP grad all-reduce (comm 4)
    "bwd_bot_ar(iso)",  # bot-MLP grad all-reduce (comm 6)
    "top_mlp_bwd(iso)",  # top-MLP fwd+grad chain
    "bot_mlp_bwd(iso)",  # bottom-MLP fwd+grad chain
    "step_total",       # forward + backward + optimizer
]

# The reference's 21 report rows (reportBenchTime all_timers,
# dlrm.py:1015-1036) -> (our region key, derived) in reference order.
# derived=None rows are measured; a tuple lists the measured regions the
# cumulative row sums (the reference times iter_start..<marker> spans).
REF_ROWS = [
    ("intermed_calc_length", "calc_length", None),
    ("mem_push_idx", "mem_push_idx", None),
    ("intermed_bef_offset_xchg", "send_splits", None),
    ("offset_xchg", "offset_xchg", None),
    ("intermed_btw_offset_idx_xchg", "recv_splits", None),
    ("idx_xchg", "idx_xchg", None),
    ("intermed_post_idx_xchg_sparse_dist", "split_per_table", None),
    ("intermed_emb_lookup_to_a2a_start", "emb_lookup", None),
    ("fwd_a2a", "fwd_a2a", None),
    ("intermed_fwd_a2a_grad_push", "post_a2a_fwd", None),
    ("mem_push_gradients", "mem_push_gradients", None),
    ("bwd_top_ar", "bwd_top_ar(iso)", None),
    ("intermed_top_ar_end_to_bwd_a2a_start", "top_mlp_bwd(iso)", None),
    ("bwd_a2a", "bwd_a2a(iso)", None),
    ("intermed_bwd_a2a_bot_ar", "bot_mlp_bwd(iso)", None),
    ("bwd_bot_ar", "bwd_bot_ar(iso)", None),
    ("iter_time", "step_total", None),
    ("iter_data_prep", None,
     ("calc_length", "mem_push_idx", "send_splits", "offset_xchg",
      "recv_splits", "idx_xchg", "split_per_table")),
    ("iter_fwd_a2a", None,
     ("calc_length", "mem_push_idx", "send_splits", "offset_xchg",
      "recv_splits", "idx_xchg", "split_per_table", "emb_lookup",
      "fwd_a2a")),
    ("iter_bwd_top_ar", None,
     ("calc_length", "mem_push_idx", "send_splits", "offset_xchg",
      "recv_splits", "idx_xchg", "split_per_table", "emb_lookup",
      "fwd_a2a", "post_a2a_fwd", "mem_push_gradients", "bwd_top_ar(iso)")),
    ("iter_bwd_a2a", None,
     ("calc_length", "mem_push_idx", "send_splits", "offset_xchg",
      "recv_splits", "idx_xchg", "split_per_table", "emb_lookup",
      "fwd_a2a", "post_a2a_fwd", "mem_push_gradients", "bwd_top_ar(iso)",
      "top_mlp_bwd(iso)", "bwd_a2a(iso)")),
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

        def calc_length_body(offsets, n):
            # offsets -> per-(sample, table) lengths: the data-prep diff
            # (reference SparseFeatures, dlrm.py:254-282)
            def step(s, i):
                o = offsets + i
                lengths = o[:, 1:] - o[:, :-1]
                return s + jnp.sum(lengths.astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def send_splits_body(lengths, n):
            # per-destination-rank send counts for the index a2a
            world = mesh.devices.size

            def step(s, i):
                l2 = lengths + (i % 2).astype(lengths.dtype)
                counts = l2.reshape(
                    l2.shape[0], world, -1
                ).sum(axis=(0, 2))
                return s + jnp.sum(counts.astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def recv_splits_body(lengths, n):
            # recv offsets = exclusive cumsum of the exchanged lengths
            def step(s, i):
                l2 = lengths + (i % 2).astype(lengths.dtype)
                off = jnp.cumsum(l2.reshape(-1))
                return s + off[-1].astype(jnp.float32), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def split_per_table_body(idx, n):
            # splitPerTable regroup (reference dlrm.py:430-457): received
            # (B, T_local, nnz) -> per-table-contiguous (T_local, B, nnz).
            # optimization_barrier forces the relayout copy XLA would
            # otherwise fold into the consuming gather.
            idx_local = lax.all_to_all(idx, AXIS, 1, 0, tiled=True)

            def step(s, i):
                shifted = (idx_local + i) % E
                regrouped = lax.optimization_barrier(
                    jnp.swapaxes(shifted, 0, 1)
                )
                return s + jnp.sum(regrouped[0].astype(jnp.float32)), None

            s, _ = lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.psum(s, AXIS)

        def post_a2a_fwd_body(params, dense, labels, n):
            # everything between the fwd a2a and the grad push:
            # interaction + top MLP + loss (reference dlrm.py:1255-1263)
            from param_tpu.models.dlrm import dot_interaction
            from param_tpu.ops.mlp import mlp_forward

            b = dense.shape[0]
            pooled = jnp.ones((b, cfg.num_tables, cfg.emb_dim), cfg.dtype)
            bot_out = mlp_forward(params["bot"], dense)

            def step(s, i):
                p = pooled + i.astype(pooled.dtype) * 1e-6
                feat = dot_interaction(bot_out, p)
                logits = mlp_forward(params["top"], feat)[:, 0]
                loss = jnp.mean(
                    jnp.maximum(logits, 0) - logits * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(logits)))
                )
                return s + loss, None

            s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
            return lax.pmean(s, AXIS)

        def make_mlp_bwd_body(which):
            # fwd+grad of one MLP: the compute an eager backward region
            # (top: intermed_top_ar_end_to_bwd_a2a_start, bot:
            # intermed_bwd_a2a_bot_ar) would run
            from param_tpu.ops.mlp import mlp_forward

            def body(params, dense, n):
                b = dense.shape[0]
                if which == "top":
                    x0 = jnp.ones((b, cfg.interaction_dim), cfg.dtype)
                else:
                    x0 = dense

                def f(p, x):
                    return jnp.sum(mlp_forward(p, x).astype(jnp.float32))

                def step(s, i):
                    x = x0 + i.astype(x0.dtype) * 1e-6
                    gp, gx = jax.grad(f, argnums=(0, 1))(params[which], x)
                    tot = jnp.sum(gx.astype(jnp.float32))
                    for leaf in jax.tree.leaves(gp):
                        tot = tot + jnp.sum(leaf.astype(jnp.float32))
                    return s + tot, None

                s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(n))
                return lax.psum(s, AXIS)

            return body

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

        # lengths / offsets payloads for the data-prep regions (fixed-nnz
        # model: every bag has nnz entries; built eagerly so they inherit
        # the batch sharding)
        lengths_arr = (idx[:, :, 0] * 0 + cfg.nnz).astype(jnp.int32)
        offsets_arr = jnp.concatenate(
            [jnp.zeros_like(lengths_arr[:, :1]),
             jnp.cumsum(lengths_arr, axis=1)], axis=1
        )

        chains = {
            "calc_length": (
                smap(calc_length_body, (P(AXIS, None),)), (offsets_arr,),
            ),
            "send_splits": (
                smap(send_splits_body, (P(AXIS, None),)), (lengths_arr,),
            ),
            "recv_splits": (
                smap(recv_splits_body, (P(AXIS, None),)), (lengths_arr,),
            ),
            "split_per_table": (
                smap(split_per_table_body, (P(AXIS, None, None),)), (idx,),
            ),
            "post_a2a_fwd": (
                smap(post_a2a_fwd_body, (param_spec, P(AXIS, None), P(AXIS))),
                (params, dense, labels),
            ),
            "top_mlp_bwd(iso)": (
                smap(make_mlp_bwd_body("top"), (param_spec, P(AXIS, None))),
                (params, dense),
            ),
            "bot_mlp_bwd(iso)": (
                smap(make_mlp_bwd_body("bot"), (param_spec, P(AXIS, None))),
                (params, dense),
            ),
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
            "idx_xchg": (smap(idx_a2a_body, (P(AXIS, None, None),)), (idx,)),
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
        data_sh = model.shardings()[1]
        out["mem_push_idx"] = self._host_push_chain(idx, data_sh[1])
        out["mem_push_gradients"] = self._host_push_chain(labels, data_sh[2])
        return out

    @staticmethod
    def _host_push_chain(arr, sharding):
        """H2D push region (reference mem_push_idx / mem_push_gradients,
        dlrm.py:1214-1222): device_put n DISTINCT host buffers (so no
        transfer can be elided) and force completion with one scalar
        fetch.  measure_chain's delta-N cancels the fetch round trip; the
        per-op time is one host->device transfer + a trivial reduce.

        Multi-process: the global batch can't be fetched to one host —
        each process pushes its LOCAL shard to its own devices (the honest
        multi-host semantics: every host pays its own H2D push)."""
        import jax as _jax

        if _jax.process_count() > 1:
            shard = arr.addressable_shards[0]
            host_buf = np.asarray(shard.data)
            target = shard.device
        else:
            host_buf = np.asarray(arr)
            target = sharding
        variants = [host_buf + np.asarray(i, dtype=host_buf.dtype)
                    for i in range(4)]

        def chain(n: int):
            total = jnp.float32(0)
            for i in range(n):
                buf = jax.device_put(variants[i % len(variants)], target)
                total = total + jnp.sum(buf).astype(jnp.float32)
            return total

        return chain

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
            regions: List[str] | None = None,
            max_n: int = 1024) -> Dict[str, Dict]:
        """``regions``: optional subset of region names to time (each region
        is its own compiled chain program; skipping regions skips their
        compiles — matters for big-table configs on real hardware).
        ``max_n`` caps measure_chain's adaptive chain growth (each length
        is a fresh compile; lower it when op time, not noise, dominates)."""
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
        mem = self.region_memory_bytes()
        results: Dict[str, Dict] = {}
        for name, chain in chains.items():
            per = [measure_chain(chain, n_lo=n_lo, n_hi=n_hi, max_n=max_n)
                   for _ in range(reps)]
            us = [t * 1e6 for t in per]
            us = self._gather_cross_rank(us)
            results[name] = {
                "min_us": min(us),
                "p50_us": percentile(us, 50),
                "p75_us": percentile(us, 75),
                "p95_us": percentile(us, 95),
                "mem_bytes": mem.get(name, 0),
            }
        # the reference's cumulative iter_* rows (sum of the constituent
        # measured regions; iter_time is the REAL fused step, reported
        # separately as step_total)
        for ref_name, key, parts in REF_ROWS:
            if parts is None or not all(p in results for p in parts):
                continue
            results[ref_name] = {
                k: sum(results[p][k] for p in parts)
                for k in ("min_us", "p50_us", "p75_us", "p95_us")
            }
            results[ref_name]["mem_bytes"] = 0
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

    @staticmethod
    def _gather_cross_rank(us: List[float]) -> List[float]:
        """Pool per-rep samples across processes (reference: all_gather of
        the per-rank latency tensor, dlrm.py:1044-1063) — percentiles are
        then over ranks x reps.  Single-process: identity."""
        import jax

        if jax.process_count() <= 1:
            return us
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            np.asarray(us, dtype=np.float64)
        )
        return [float(x) for x in np.asarray(gathered).reshape(-1)]

    def region_memory_bytes(self) -> Dict[str, int]:
        """Per-region payload bytes (reference memory column semantics:
        comm regions record their transfer size, mem_push regions the
        pushed bytes, intermed regions 0 — dlrm.py:788,834,1292,1318 and
        intermed_region_memory :912-934)."""
        cfg = self.model.cfg
        es = dtype_size(cfg.dtype)
        idx_bytes = self.local_batch * cfg.num_tables * cfg.nnz * 4
        pooled_bytes = cfg.batch * self.local_tables * cfg.emb_dim * es
        dims_b = cfg.bot_mlp_dims()
        dims_t = cfg.top_mlp_dims()
        bot_bytes = sum(a * b + b for a, b in zip(dims_b[:-1], dims_b[1:])) * es
        top_bytes = sum(a * b + b for a, b in zip(dims_t[:-1], dims_t[1:])) * es
        return {
            "offset_xchg": self.local_batch * cfg.num_tables * 4,
            "idx_xchg": idx_bytes,
            "mem_push_idx": idx_bytes,
            "mem_push_gradients": self.local_batch * es,
            "fwd_a2a": pooled_bytes,
            "bwd_a2a(iso)": pooled_bytes,
            "bwd_top_ar(iso)": top_bytes,
            "bwd_bot_ar(iso)": bot_bytes,
        }

    def report(self, results: Dict[str, Dict]) -> None:
        """Reference-format report: the 21 named rows in reference order
        (memory(B), min/p50/p75/p95, running sum of p50 over the 16
        sequential rows — reportBenchTime, dlrm.py:1084-1135), then the
        TPU-native extra rows."""
        print(f"\nDLRM-RES world={self.n} batch={self.model.cfg.batch} "
              f"tables={self.model.cfg.num_tables}x{self.model.cfg.rows_per_table}"
              f"x{self.model.cfg.emb_dim} nnz={self.model.cfg.nnz}")
        hdr = (f"{'region':>38}{'memory(B)':>12}{'min(us)':>12}{'p50':>12}"
               f"{'p75':>12}{'p95':>12}{'sum(p50)':>12}")
        print(hdr)
        shown = set()
        sum_p50 = 0.0
        for ref_name, key, parts in REF_ROWS:
            r = results.get(ref_name if parts else key)
            if r is None:
                continue
            shown.add(ref_name if parts else key)
            if parts is None and ref_name != "iter_time":
                sum_p50 += r["p50_us"]
            print(f"{ref_name:>38}{r.get('mem_bytes', 0):>12}"
                  f"{r['min_us']:>12.1f}{r['p50_us']:>12.1f}"
                  f"{r['p75_us']:>12.1f}{r['p95_us']:>12.1f}"
                  f"{sum_p50:>12.1f}")
        extras = [k for k in results
                  if not k.startswith("_") and k not in shown]
        if extras:
            print(f"{'--- tpu-native rows ---':>38}")
            for name in extras:
                r = results[name]
                print(f"{name:>38}{r.get('mem_bytes', 0):>12}"
                      f"{r.get('min_us', r['p50_us']):>12.1f}"
                      f"{r['p50_us']:>12.1f}{r['p75_us']:>12.1f}"
                      f"{r['p95_us']:>12.1f}{'':>12}")
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
