"""Execution-trace capture: jaxpr → ET JSON.

The capture side of the et_replay analogue (the reference relies on
PyTorch's ``ExecutionTraceObserver``; in JAX the op-level program IS the
jaxpr, so capture = tracing the jitted function once and flattening its
jaxpr into the ET node/tensor graph).

Inlineable call primitives (pjit / closed_call / custom_jvp / custom_vjp /
remat) are flattened into their parents; control-flow and SPMD scopes
(scan / while / cond / shard_map) become *opaque scope nodes* whose inner
ops are recorded as label children (visible to analysis, excluded from
op-by-op replay — the replayer skips opaque scopes via the same skip-node
machinery the reference uses for unsupported ops).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from param_tpu.trace.execution_trace import SCHEMA, ExecutionTrace

log = logging.getLogger(__name__)

# call-like primitives flattened into the parent scope
_INLINE = {"pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
           "custom_vjp_call_jaxpr", "remat", "checkpoint", "core_call",
           "custom_jvp_call_jaxpr"}
# primitives kept as opaque scope nodes
_OPAQUE = {"scan", "while", "cond", "shard_map", "pmap", "xla_pmap"}


def encode_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """JSON-encode eqn params with enough fidelity to rebuild them."""

    def enc(v):
        import enum

        from jax.sharding import Mesh, PartitionSpec

        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, Mesh):
            # enough to rebuild an equivalent mesh over live devices
            return {"__mesh__": {"axis_names": list(v.axis_names),
                                 "axis_sizes": [int(s) for s in
                                                v.devices.shape]}}
        if isinstance(v, PartitionSpec):
            return {"__pspec__": [
                list(e) if isinstance(e, (tuple, list)) else e for e in v
            ]}
        if isinstance(v, frozenset):
            return {"__frozenset__": sorted(enc(x) for x in v)}
        if isinstance(v, enum.Enum):
            return {"__enum__": type(v).__name__, "value": v.name}
        if isinstance(v, np.dtype):
            return {"__dtype__": v.name}
        if isinstance(v, type) and issubclass(v, np.generic):
            return {"__dtype__": np.dtype(v).name}
        if hasattr(v, "dtype") and hasattr(v, "shape") and not v.shape:
            return enc(v.item())
        if isinstance(v, tuple) and hasattr(v, "_fields"):  # NamedTuple
            return {
                "__namedtuple__": type(v).__name__,
                "fields": {f: enc(getattr(v, f)) for f in v._fields},
            }
        if isinstance(v, tuple):
            return {"__tuple__": [enc(x) for x in v]}
        if isinstance(v, list):
            return [enc(x) for x in v]
        if isinstance(v, dict):
            return {str(k): enc(x) for k, x in v.items()}
        # jaxprs, functions, abstract values: opaque
        return {"__opaque__": type(v).__name__}

    return {k: enc(v) for k, v in params.items()}


def decode_params(params: Dict[str, Any]) -> Dict[str, Any]:
    def dec(v):
        if isinstance(v, dict):
            if "__dtype__" in v:
                return np.dtype(v["__dtype__"])
            if "__tuple__" in v:
                return tuple(dec(x) for x in v["__tuple__"])
            if "__pspec__" in v:
                from jax.sharding import PartitionSpec

                return PartitionSpec(*[
                    tuple(e) if isinstance(e, list) else e
                    for e in v["__pspec__"]
                ])
            if "__frozenset__" in v:
                return frozenset(dec(x) for x in v["__frozenset__"])
            if "__mesh__" in v:
                return dict(v)  # descriptor; replay rebuilds a live Mesh
            if "__enum__" in v:
                return _decode_enum(v["__enum__"], v["value"])
            if "__namedtuple__" in v:
                return _decode_namedtuple(
                    v["__namedtuple__"], {k: dec(x) for k, x in v["fields"].items()}
                )
            if "__opaque__" in v:
                return None
            return {k: dec(x) for k, x in v.items()}
        if isinstance(v, list):
            return [dec(x) for x in v]
        return v

    return {k: dec(v) for k, v in params.items()}


def _decode_namedtuple(name: str, fields: Dict[str, Any]):
    from jax import lax

    for cls_name in (name,):
        cls = getattr(lax, cls_name, None)
        if cls is not None:
            try:
                return cls(**fields)
            except TypeError:
                pass
    # unknown namedtuple: return plain tuple of field values
    return tuple(fields.values())


def _decode_enum(name: str, value: str):
    from jax import lax

    cls = getattr(lax, name, None)
    if cls is not None:
        try:
            return cls[value]
        except KeyError:
            pass
    return value


class _Capture:
    def __init__(self):
        self.nodes: List[dict] = []
        self.tensors: Dict[int, dict] = {}
        self.const_vals: Dict[int, dict] = {}  # tid → {"v", "dtype"}
        self._var_ids: Dict[Any, int] = {}
        self._next_tensor = 0
        self._next_node = 1  # 0 reserved for root

    def record_const(self, tid: Optional[int], val) -> None:
        """Embed a closed-over constant's concrete value so replay is exact
        (large consts are left to random init, with a warning)."""
        if tid is None or tid in self.const_vals:
            return
        arr = np.asarray(val)
        if arr.size <= 65536:
            self.const_vals[tid] = {"v": arr.tolist(), "dtype": str(arr.dtype)}
        else:
            log.warning(
                "const tensor %d (%s, %d elems) too large to embed; "
                "replay will randomize it", tid, arr.dtype, arr.size,
            )

    def tensor_id(self, var, env: Optional[Dict[int, int]] = None) -> Optional[int]:
        """Tensor id of ``var`` within one jaxpr *instantiation* frame.

        ``env`` maps id(var) → tid for the current frame.  jax CACHES traced
        sub-jaxprs, so the same jaxpr object (and its Var objects) can be
        instantiated at several call sites — a global var→tid map would
        conflate the instances (their invar remaps clobber each other and
        internal tids collide).  Per-frame envs give every instantiation
        fresh tids."""
        from jax._src.core import Literal

        if isinstance(var, Literal):
            return None
        if env is None:
            env = self._var_ids
        key = id(var)
        if key not in env:
            tid = self._next_tensor
            self._next_tensor += 1
            env[key] = tid
            aval = var.aval
            self.tensors[tid] = {
                "shape": list(getattr(aval, "shape", ())),
                "dtype": str(getattr(aval, "dtype", "float32")),
            }
        return env[key]

    def literal_tid(self, val) -> int:
        """Fresh tid for a literal value flowing out of a call boundary."""
        tid = self._next_tensor
        self._next_tensor += 1
        arr = np.asarray(val)
        self.tensors[tid] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        self.record_const(tid, val)
        return tid

    def add_node(self, name, parent, inputs, outputs, params, op=True, it=0):
        nid = self._next_node
        self._next_node += 1
        self.nodes.append(
            {
                "id": nid,
                "name": name,
                "parent": parent,
                "op": op,
                "inputs": inputs,
                "outputs": outputs,
                "params": params,
                "iter": it,
            }
        )
        return nid

    def walk(
        self,
        jaxpr,
        parent: int,
        iteration: int,
        as_labels: bool = False,
        env: Optional[Dict[int, int]] = None,
    ):
        from jax._src.core import Literal as _CallLit

        if env is None:
            env = self._var_ids
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            if prim in _INLINE:
                inner = None
                for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                    if key in eqn.params:
                        inner = eqn.params[key]
                        break
                if inner is not None:
                    closed = getattr(inner, "jaxpr", inner)
                    # fresh frame per instantiation (jax caches sub-jaxprs,
                    # so the same Var objects recur at several call sites);
                    # map inner invars to outer argument tids so ids flow
                    # through the call boundary, Literals become consts
                    child_env: Dict[int, int] = {}
                    for iv, ov in zip(closed.invars, eqn.invars):
                        if isinstance(ov, _CallLit):
                            self.record_const(
                                self.tensor_id(iv, child_env), ov.val
                            )
                            continue
                        tid = self.tensor_id(ov, env)
                        if tid is not None:
                            child_env[id(iv)] = tid
                    # closed-over consts of the inlined jaxpr have concrete
                    # values at trace time — embed them (they'd otherwise be
                    # producerless tids that replay randomizes)
                    for cv, cval in zip(
                        closed.constvars, getattr(inner, "consts", []) or []
                    ):
                        self.record_const(self.tensor_id(cv, child_env), cval)
                    self.walk(closed, parent, iteration, as_labels, child_env)
                    for inner_ov, outer_ov in zip(closed.outvars, eqn.outvars):
                        if isinstance(inner_ov, _CallLit):
                            env[id(outer_ov)] = self.literal_tid(inner_ov.val)
                            continue
                        env[id(outer_ov)] = self.tensor_id(inner_ov, child_env)
                    continue
            inputs = [self.tensor_id(v, env) for v in eqn.invars]
            outputs = [self.tensor_id(v, env) for v in eqn.outvars]
            # record literal (inlined constant) argument values so replay
            # can rebuild them with the right dtype
            literals = {}
            from jax._src.core import Literal as _Lit

            for pos, v in enumerate(eqn.invars):
                if isinstance(v, _Lit):
                    val = np.asarray(v.val)
                    literals[str(pos)] = {
                        "v": val.item() if val.ndim == 0 else val.tolist(),
                        "dtype": str(val.dtype),
                    }
            opaque = prim in _OPAQUE or any(
                hasattr(v, "jaxpr") or type(v).__name__ in ("Jaxpr", "ClosedJaxpr")
                for v in eqn.params.values()
            )
            extra = {}
            if opaque:
                extra["opaque"] = True
            if literals:
                extra["__literals__"] = literals
            node_id = self.add_node(
                prim,
                parent,
                inputs,
                outputs,
                {**encode_params(eqn.params), **extra},
                op=not as_labels,
                it=iteration,
            )
            if opaque:
                node_dict = self.nodes[-1]
                scopes = []
                scope_consts = {}
                for key in ("jaxpr", "call_jaxpr", "cond_jaxpr", "body_jaxpr"):
                    inner = eqn.params.get(key)
                    if inner is None:
                        continue
                    closed = inner if hasattr(inner, "jaxpr") else None
                    core = closed.jaxpr if closed is not None else inner
                    # body descriptor: the tensor ids of the body's
                    # consts/invars/outvars, so the replayer can rebuild the
                    # scope as a callable and re-wrap it (shard_map/scan);
                    # fresh frame — scope bodies are cached jaxprs too
                    scope_env: Dict[int, int] = {}
                    const_ids = [
                        self.tensor_id(v, scope_env) for v in core.constvars
                    ]
                    in_ids = [self.tensor_id(v, scope_env) for v in core.invars]
                    self.walk(core, node_id, iteration, as_labels=True,
                              env=scope_env)
                    out_ids = [
                        self.literal_tid(v.val) if isinstance(v, _CallLit)
                        else self.tensor_id(v, scope_env)
                        for v in core.outvars
                    ]
                    scopes.append(
                        {"key": key, "const": const_ids, "in": in_ids,
                         "out": out_ids}
                    )
                    # closed-over constants have concrete values at trace
                    # time — embed small ones so scope replay is exact
                    if closed is not None:
                        for tid, cval in zip(const_ids, closed.consts):
                            self.record_const(tid, cval)
                            if tid in self.const_vals:
                                scope_consts[str(tid)] = self.const_vals[tid]
                if scopes:
                    node_dict["params"]["__scopes__"] = scopes
                if scope_consts:
                    node_dict["params"]["__scope_consts__"] = scope_consts


def capture_execution_trace(fn, *args, iterations: int = 1, **kwargs) -> ExecutionTrace:
    """Trace ``fn(*args)`` and return its ET.

    ``iterations`` > 1 replicates the op stream with iteration tags (the
    ``ProfilerStep#`` segmentation analogue, reference set_iterations:602) —
    each iteration has identical structure under jit, so capture once and
    stamp."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    cap = _Capture()
    jaxpr = closed.jaxpr
    in_ids = [cap.tensor_id(v) for v in jaxpr.invars]
    # top-level closed-over consts: embed the concrete values
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        cap.record_const(cap.tensor_id(cv), cval)
    cap.walk(jaxpr, parent=0, iteration=0)
    out_ids = [cap.tensor_id(v) for v in jaxpr.outvars if cap.tensor_id(v) is not None]
    # tensors read but never produced and without an embedded const value
    # (oversized consts, broadcasted captures) are replay inputs
    produced = {t for n in cap.nodes for t in n["outputs"] if t is not None}
    read = {t for n in cap.nodes for t in n["inputs"] if t is not None}
    in_ids = [i for i in in_ids if i is not None]
    for t in sorted(read - produced):
        if t not in in_ids and t not in cap.const_vals:
            in_ids.append(t)
    data = {
        "schema": SCHEMA,
        "nodes": cap.nodes,
        "tensors": cap.tensors,
        "const_tensors": {str(t): c for t, c in cap.const_vals.items()},
        "in_tensors": in_ids,
        "out_tensors": out_ids,
    }
    if iterations > 1:
        base_nodes = list(data["nodes"])
        next_id = max(n["id"] for n in base_nodes) + 1 if base_nodes else 1
        for it in range(1, iterations):
            for n in base_nodes:
                clone = dict(n)
                clone["id"] = next_id
                clone["iter"] = it
                next_id += 1
                data["nodes"].append(clone)
    return ExecutionTrace(data)
