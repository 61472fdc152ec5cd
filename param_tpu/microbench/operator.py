"""Operator registry and interface.

Counterpart of the reference's ``lib/operator.py:8-68``
(``OperatorInterface``, global ``op_map``, ``register_operator(s)``) plus
auto-wrapping of dotted jax paths (the analogue of the reference
auto-wrapping unknown ``aten::*`` ops as TorchScriptOp,
``lib/pytorch/benchmark.py:58-73``).
"""

from __future__ import annotations

import importlib
import logging
from abc import ABC, abstractmethod
from typing import Any, Callable, Dict, Optional

log = logging.getLogger(__name__)


class OperatorInterface(ABC):
    """build → forward (→ grad via jax AD) → cleanup."""

    def build(self, *args, **kwargs) -> None:  # noqa: B027
        pass

    @abstractmethod
    def forward(self, *args, **kwargs): ...

    def cleanup(self) -> None:  # noqa: B027
        pass


class CallableOp(OperatorInterface):
    """Wraps a plain function (reference: operator_impl.CallableOp:63)."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def forward(self, *args, **kwargs):
        return self.fn(*args, **kwargs)


class UnaryOp(CallableOp):
    """In-place torch ops have no JAX analogue; functional call stands in
    (reference: operator_impl.UnaryOp:15)."""


class BuildableOp(OperatorInterface):
    """Constructor + call — e.g. a flax Module built from build args
    (reference: operator_impl.BuildableOp:116)."""

    def __init__(self, ctor: Callable):
        self.ctor = ctor
        self.obj: Optional[Any] = None
        self._params = None

    def build(self, *args, **kwargs):
        self.obj = self.ctor(*args, **kwargs)

    def forward(self, *args, **kwargs):
        import jax

        assert self.obj is not None, "build() must run before forward()"
        if hasattr(self.obj, "init") and hasattr(self.obj, "apply"):
            # flax-style module: init params lazily on first input
            if self._params is None:
                self._params = self.obj.init(jax.random.PRNGKey(0), *args)
            return self.obj.apply(self._params, *args)
        return self.obj(*args, **kwargs)

    def cleanup(self):
        self._params = None


class JaxPathOp(CallableOp):
    """Resolve a dotted path like ``jax.numpy.add`` / ``jax.nn.relu`` /
    ``jax.lax.conv`` at build time — the TorchScriptOp analogue: any public
    jax function benchmarks without a bespoke registration."""

    def __init__(self, path: str):
        parts = path.split(".")
        for split in range(len(parts) - 1, 0, -1):
            try:
                mod = importlib.import_module(".".join(parts[:split]))
            except ImportError:
                continue
            obj = mod
            try:
                for attr in parts[split:]:
                    obj = getattr(obj, attr)
            except AttributeError:
                continue
            super().__init__(obj)
            return
        raise ValueError(f"cannot resolve operator path {path!r}")


op_map: Dict[str, OperatorInterface] = {}


def register_operator(name: str, op: OperatorInterface) -> None:
    """(reference: lib/operator.py register_operator)"""
    if name in op_map:
        log.warning("operator %s already registered; overwriting", name)
    op_map[name] = op


def register_operators(ops: Dict[str, OperatorInterface]) -> None:
    for name, op in ops.items():
        register_operator(name, op)


def get_operator(name: str) -> OperatorInterface:
    """Registered op, or auto-wrapped dotted jax path."""
    if name in op_map:
        return op_map[name]
    if name.startswith(("jax.", "jnp.")):
        path = name.replace("jnp.", "jax.numpy.", 1)
        op = JaxPathOp(path)
        op_map[name] = op
        return op
    raise ValueError(f"unknown operator {name!r} (and not a jax.* path)")


def load_workloads() -> None:
    """Auto-discover bundled workload modules
    (reference: init_helper.load_modules:42)."""
    import importlib
    import pkgutil

    import param_tpu.microbench.workloads as pkg

    for info in pkgutil.iter_modules(pkg.__path__):
        importlib.import_module(f"{pkg.__name__}.{info.name}")
