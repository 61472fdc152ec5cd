"""Benchmark config model, executors and driver.

Counterparts of the reference's ``lib/config.py`` (BenchmarkConfig /
OperatorConfig), ``lib/pytorch/op_executor.py`` (OpExecutor: warmup +
measure, fwd/bwd passes), ``lib/pytorch/build_executor.py`` (materialize
build+input configs, run-id resume/stop, JSON-lines output) and
``lib/pytorch/benchmark.py`` (Benchmark.run).

Execution passes (reference ``ExecutionPass``): ``forward`` and ``backward``
(backward = jax.grad of sum(outputs) w.r.t. float tensor args — the
create_grad/backward analogue).  Timing uses the scalar-fetch chain
methodology; ``discrete`` mode (per-call sync, reference op_executor
``_benchmark_loop_discrete``) is also available for latency distributions.
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from param_tpu.comms.timing import measure_chain
from param_tpu.microbench.data import get_data_generator
from param_tpu.microbench.iterator import get_config_iterator
from param_tpu.microbench.operator import get_operator

log = logging.getLogger(__name__)


@dataclass
class OperatorConfig:
    """(reference: lib/config.py OperatorConfig / make_op_config:14-145)"""

    name: str
    build_iterator: str = "DefaultConfigIterator"
    input_iterator: str = "RangeConfigIterator"
    data_generator: str = "DefaultDataGenerator"
    configs: List[Dict[str, Any]] = field(default_factory=list)


class BenchmarkConfig:
    """(reference: lib/config.py BenchmarkConfig.load_json_file:127)"""

    def __init__(self, raw: Dict[str, Any]):
        self.ops: List[OperatorConfig] = []
        for name, spec in raw.items():
            if name.startswith("_"):  # comment/metadata keys
                continue
            self.ops.append(
                OperatorConfig(
                    name=name,
                    build_iterator=spec.get(
                        "build_iterator", "DefaultConfigIterator"
                    ),
                    input_iterator=spec.get(
                        "input_iterator", "RangeConfigIterator"
                    ),
                    data_generator=spec.get(
                        "input_data_generator", "DefaultDataGenerator"
                    ),
                    configs=spec.get("config", []),
                )
            )

    @classmethod
    def load_json_file(cls, path: str) -> "BenchmarkConfig":
        with open(path) as f:
            return cls(json.load(f))

    @classmethod
    def loads(cls, text: str) -> "BenchmarkConfig":
        return cls(json.loads(text))


@dataclass
class RunOptions:
    """(reference: lib/config_util.py run options:16-148)"""

    warmup: int = 1
    iters: int = 10
    passes: str = "forward"  # forward | forward,backward
    mode: str = "chain"  # chain | discrete
    device: str = "auto"
    resume_op_run_id: Optional[str] = None
    stop_op_run_id: Optional[str] = None
    out_stream: Any = None
    # per-op profiler orchestration (the reference's NCU/NSYS subprocess
    # batching, build_executor.py:125-151,247+): one jax.profiler session
    # per (op run, pass), per-kernel device times extracted into the record
    profile_dir: Optional[str] = None


class OpExecutor:
    """Runs one materialized op config (reference: op_executor.py:31-515)."""

    def __init__(self, name: str, op, options: RunOptions):
        self.name = name
        self.op = op
        self.options = options

    def _fwd_fn(self, args, kwargs):
        op = self.op

        def f(*a):
            return op.forward(*a, **kwargs)

        return f

    def _float_tensor_idx(self, args):
        return [
            i
            for i, a in enumerate(args)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        ]

    def run(self, args: list, kwargs: dict,
            run_id: Optional[str] = None) -> Dict[str, Any]:
        self._run_id = run_id or self.name
        results = {}
        fwd = self._fwd_fn(args, kwargs)
        results["forward"] = self._measure(fwd, args, pass_name="forward")
        if "backward" in self.options.passes:
            ft = self._float_tensor_idx(args)
            if ft:

                def bwd(*a):
                    def loss(*inner):
                        full = list(a)
                        for idx, v in zip(ft, inner):
                            full[idx] = v
                        out = fwd(*full)
                        leaves = jax.tree.leaves(out)
                        return sum(
                            jnp.sum(l.astype(jnp.float32))
                            for l in leaves
                            if hasattr(l, "dtype")
                        )

                    return jax.grad(loss, argnums=tuple(range(len(ft))))(
                        *[a[i] for i in ft]
                    )

                results["backward"] = self._measure(bwd, args,
                                                    pass_name="backward")
            else:
                results["backward"] = {"error": "no differentiable tensor args"}
        return results

    def _profile(self, run_call, pass_name: str) -> Dict[str, Any]:
        """One dedicated jax.profiler session for this (op run, pass) and
        per-kernel device-time extraction — run SEPARATELY from the timed
        iterations so profiling overhead never pollutes the latencies
        (the reference splits NCU passes from timing passes the same way,
        build_executor.py:125-151)."""
        import os

        d = os.path.join(self.options.profile_dir,
                         self._run_id.replace(":", "_"), pass_name)
        os.makedirs(d, exist_ok=True)
        try:
            with jax.profiler.trace(d):
                jax.block_until_ready(run_call())
            from param_tpu.trace.device_trace import (
                load_chrome_trace,
                op_durations,
            )

            events, threads = load_chrome_trace(d)
            flt = "TPU" if jax.devices()[0].platform == "tpu" else None
            agg = op_durations(events, threads, thread_filter=flt)
            top = sorted(agg.items(), key=lambda kv: -kv[1]["total_us"])[:10]
            return {"dir": d,
                    "device_ops": [{"name": k, **v} for k, v in top]}
        except Exception as e:  # noqa: BLE001
            log.exception("profiler session for %s failed", self._run_id)
            return {"dir": d, "error": str(e)[:200]}

    def _measure(self, fn, args, pass_name: str = "forward") -> Dict[str, Any]:
        opts = self.options
        jit_fn = jax.jit(fn)
        try:
            # one eager call first: lazily-built module params (BuildableOp)
            # must materialize OUTSIDE any trace or they leak tracers
            fn(*args)
            if opts.mode == "discrete":
                out = jit_fn(*args)
                jax.block_until_ready(out)
                lats = []
                for _ in range(opts.iters):
                    t0 = time.perf_counter()
                    jax.block_until_ready(jit_fn(*args))
                    lats.append((time.perf_counter() - t0) * 1e6)
                lats.sort()
                rec = {
                    "lat_us_p50": lats[len(lats) // 2],
                    "lat_us_min": lats[0],
                    "lat_us_max": lats[-1],
                    "iters": opts.iters,
                }
                if opts.profile_dir:
                    rec["profile"] = self._profile(
                        lambda: jit_fn(*args), pass_name)
                return rec
            # chain mode: per-step perturbation of the first tensor arg so
            # XLA cannot hoist the op out of the scan (float: tiny additive
            # noise; int: parity flip — jnp.take clips, so index args stay
            # safe)
            tensor_idx = [
                i for i, a in enumerate(args) if hasattr(a, "dtype")
            ]

            import functools

            @functools.partial(jax.jit, static_argnames="nn")
            def chain(nn, *a):
                def step(s, i):
                    aa = list(a)
                    if tensor_idx:
                        k = tensor_idx[0]
                        if jnp.issubdtype(aa[k].dtype, jnp.floating):
                            aa[k] = aa[k] + i.astype(aa[k].dtype) * jnp.asarray(
                                1e-6, aa[k].dtype
                            )
                        else:
                            aa[k] = aa[k] + (i % 2).astype(aa[k].dtype)
                    out = fn(*aa)
                    leaves = [
                        l for l in jax.tree.leaves(out) if hasattr(l, "dtype")
                    ]
                    tot = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
                    return s + tot, None

                s, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(nn))
                return s

            per = measure_chain(
                lambda nn: chain(nn, *args), n_lo=1, n_hi=max(4, opts.iters)
            )
            rec = {"lat_us": per * 1e6, "iters": opts.iters}
            if opts.profile_dir:
                rec["profile"] = self._profile(
                    lambda: chain(max(4, opts.iters), *args), pass_name)
            return rec
        except Exception as e:  # noqa: BLE001
            log.exception("op %s failed", self.name)
            return {"error": str(e)[:300]}


class BuildExecutor:
    """Materializes build/input configs and emits JSON-lines results
    (reference: build_executor.py; resume/stop state machine :72-102,
    output_stats :508)."""

    def __init__(self, options: RunOptions):
        self.options = options
        self._started = options.resume_op_run_id is None
        self._stopped = False

    def run_op_config(self, op_cfg) -> List[Dict[str, Any]]:
        results = []
        op = get_operator(op_cfg.name)
        gen = get_data_generator(op_cfg.data_generator)()
        build_iter_cls = get_config_iterator(op_cfg.build_iterator)
        input_iter_cls = get_config_iterator(op_cfg.input_iterator)
        # build configs (may be absent → single no-op build)
        build_cfgs = list(build_iter_cls(op_cfg.configs, key="build")) or [
            {"args": [], "kwargs": {}}
        ]
        for b_id, build_cfg in enumerate(build_cfgs):
            b_args, b_kwargs = gen.get_data(build_cfg)
            op.build(*b_args, **b_kwargs)
            for i_id, input_cfg in enumerate(
                input_iter_cls(op_cfg.configs, key="input")
            ):
                run_id = f"{op_cfg.name}:{b_id}:{i_id}"
                if not self._started:
                    if run_id == self.options.resume_op_run_id:
                        self._started = True
                    else:
                        continue
                if self._stopped:
                    return results
                args, kwargs = gen.get_data(input_cfg)
                ex = OpExecutor(op_cfg.name, op, self.options)
                measured = ex.run(args, kwargs, run_id=run_id)
                record = {
                    "name": op_cfg.name,
                    "run_id": run_id,
                    "config": {
                        "build": build_cfg,
                        "input": _spec_summary(input_cfg),
                    },
                    **measured,
                }
                results.append(record)
                if self.options.out_stream is not None:
                    self.options.out_stream.write(json.dumps(record) + "\n")
                    self.options.out_stream.flush()
                if run_id == self.options.stop_op_run_id:
                    self._stopped = True
                    return results
            op.cleanup()
        return results


def _spec_summary(cfg: Dict[str, Any]) -> Dict[str, Any]:
    def brief(a):
        if isinstance(a, dict) and a.get("type") == "tensor":
            return {"type": "tensor", "dtype": a.get("dtype"),
                    "shape": a.get("shape")}
        return a

    return {"args": [brief(a) for a in cfg.get("args", [])]}


class Benchmark:
    """(reference: lib/pytorch/benchmark.py Benchmark.run:58)"""

    def __init__(self, config: BenchmarkConfig, options: RunOptions):
        self.config = config
        self.options = options

    def run(self) -> List[Dict[str, Any]]:
        from param_tpu.microbench.operator import load_workloads

        load_workloads()
        executor = BuildExecutor(self.options)
        all_results = []
        for op_cfg in self.config.ops:
            try:
                all_results.extend(executor.run_op_config(op_cfg))
            except Exception:  # noqa: BLE001
                log.exception("op config %s failed", op_cfg.name)
        return all_results
