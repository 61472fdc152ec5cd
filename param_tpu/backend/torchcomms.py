"""torchcomms-style communicator API over the mesh backend.

The reference grew a third comm backend speaking the ``torchcomms``
vendor API — a communicator OBJECT whose methods take tensors and return
async work handles (``train/comms/pt/pytorch_torchcomms_backend.py:14-100``:
``new_comm``, ``comm.all_reduce(tensor, op, async_op=True)`` → ``work``,
``comm split`` sub-communicators, ``objcol`` object collectives,
``ReduceOp`` enums).  This module is the TPU-native equivalent of that API
*surface*: the same communicator-object ergonomics for users migrating
torchcomms call sites, routed to the cached ``jit(shard_map)`` collective
programs of :class:`~param_tpu.backend.tpu_backend.TpuBackend`.

Semantics mapping:

- ``async_op=True``  → JAX dispatch is already asynchronous; the returned
  :class:`Work` wraps the not-yet-materialized result array and ``wait()``
  blocks on it.
- in-place tensor mutation (torch) → functional results (JAX):
  ``work.result()`` / the sync return value hold the output array; the
  input is never mutated.  This is the one deliberate API divergence —
  immutable arrays are the platform contract.
- ``comm.split(ranks)`` → sub-mesh process group (``Backend.new_group``).

``register_backend("torchcomms", TorchcommsBackend)`` also exposes the
facade to every harness CLI: ``--backend torchcomms`` runs the standard
sweeps with the core collectives routed through the communicator API
end-to-end (dispatch parity with the plain ``tpu`` backend is pinned in
tests/test_torchcomms.py).
"""

from __future__ import annotations

import enum
from typing import Any, List, Optional, Sequence

from param_tpu.backend.base import (
    Backend,
    CollectiveArgs,
    CommGroup,
    register_backend,
)
from param_tpu.backend.tpu_backend import TpuBackend


class ReduceOp(enum.Enum):
    """Reduction enums (reference reduce_op_map,
    pytorch_torchcomms_backend.py:34-40)."""

    SUM = "sum"
    MAX = "max"
    MIN = "min"
    PRODUCT = "prod"
    AVG = "avg"


def _red(op) -> str:
    if isinstance(op, ReduceOp):
        return op.value
    if isinstance(op, str) and op.lower() in ReduceOp.__members__:
        return ReduceOp[op.upper()].value
    if isinstance(op, str):
        return op
    raise ValueError(f"unknown reduce op {op!r}")


class Work:
    """Async work handle: JAX dispatch already returned, ``wait()`` blocks
    until the result array is materialized (the torchcomms ``work`` the
    reference appends to ``collectiveArgs.waitObj``)."""

    def __init__(self, result: Any):
        self._result = result

    def wait(self, timeout=None) -> bool:  # noqa: ARG002 - API parity
        import jax

        jax.block_until_ready(self._result)
        return True

    def result(self) -> Any:
        return self._result


class TorchComm:
    """Communicator object over one process group.

    Methods mirror the torchcomms call surface the reference backend
    drives (all_reduce/reduce/all_gather/all_to_all/broadcast/
    reduce_scatter/barrier + object collectives); every call returns a
    :class:`Work` whose ``result()`` is the output array."""

    def __init__(self, backend: Optional[Backend] = None,
                 group: Optional[CommGroup] = None):
        if backend is None:
            backend = TpuBackend()
            backend.initialize()
        self._b = backend
        self._g = group or backend.get_default_group()

    # -- introspection ---------------------------------------------------
    @property
    def group(self) -> CommGroup:
        return self._g

    def size(self) -> int:
        return self._g.size

    def rank(self) -> int:
        return self._b.get_global_rank()

    def split(self, ranks: Sequence[int], pg_id: int = 1) -> "TorchComm":
        """Sub-communicator over ``ranks`` (torchcomms split / reference
        groupRanks bookkeeping, pytorch_torchcomms_backend.py:29-31)."""
        return TorchComm(self._b, self._b.new_group(ranks, pg_id=pg_id))

    # -- collectives ------------------------------------------------------
    def _run(self, name: str, **kw) -> Work:
        args = CollectiveArgs(group=self._g, **kw)
        # class-bound call, NOT the dispatch table: the harness adapter
        # below rewires the table through this facade, so going through
        # the table here would recurse
        fn = getattr(type(self._b), name)
        return Work(fn(self._b, args))

    def all_reduce(self, tensor, op=ReduceOp.SUM, async_op: bool = False):
        w = self._run("all_reduce", in_tensor=tensor, red_op=_red(op))
        return w if async_op else (w.wait() and w)

    def reduce(self, tensor, root: int = 0, op=ReduceOp.SUM,
               async_op: bool = False):
        w = self._run("reduce", in_tensor=tensor, red_op=_red(op),
                      dst_rank=root)
        return w if async_op else (w.wait() and w)

    def all_gather(self, tensor, async_op: bool = False):
        w = self._run("all_gather", in_tensor=tensor)
        return w if async_op else (w.wait() and w)

    def all_to_all(self, tensor, async_op: bool = False):
        w = self._run("all_to_all", in_tensor=tensor)
        return w if async_op else (w.wait() and w)

    def all_to_all_v(self, tensor, in_split: Sequence[int],
                     out_split: Optional[Sequence[int]] = None,
                     async_op: bool = False):
        w = self._run("all_to_allv", in_tensor=tensor, in_split=in_split,
                      out_split=out_split)
        return w if async_op else (w.wait() and w)

    def broadcast(self, tensor, root: int = 0, async_op: bool = False):
        w = self._run("broadcast", in_tensor=tensor, src_rank=root)
        return w if async_op else (w.wait() and w)

    def reduce_scatter(self, tensor, op=ReduceOp.SUM,
                       async_op: bool = False):
        w = self._run("reduce_scatter", in_tensor=tensor, red_op=_red(op))
        return w if async_op else (w.wait() and w)

    def barrier(self) -> None:
        self._b.barrier(self._g)

    # -- object collectives (torchcomms objcol) ---------------------------
    def all_gather_object(self, obj: Any) -> List[Any]:
        args = CollectiveArgs(group=self._g, misc={"object": obj})
        return type(self._b).all_gather_object(self._b, args)

    def broadcast_object_list(self, objs: List[Any], root: int = 0):
        args = CollectiveArgs(group=self._g, src_rank=root,
                              misc={"objects": objs})
        return type(self._b).broadcast_object_list(self._b, args)


def new_comm(backend: str = "tpu", group: Optional[CommGroup] = None,
             **backend_kw) -> TorchComm:
    """Factory (torchcomms.new_comm; reference import site
    pytorch_torchcomms_backend.py:16).  ``backend`` names a registered
    harness backend class."""
    from param_tpu.backend.base import get_backend_cls

    b = get_backend_cls(backend)(**backend_kw)
    b.initialize()
    return TorchComm(b, group)


class TorchcommsBackend(TpuBackend):
    """Harness backend whose CORE collectives route through the
    :class:`TorchComm` facade — ``--backend torchcomms`` on any CLI proves
    the communicator API end-to-end under the standard sweeps."""

    _FACADE_OPS = ("all_reduce", "reduce", "all_gather", "all_to_all",
                   "broadcast", "reduce_scatter")

    def initialize(self) -> None:
        super().initialize()
        self.comm = TorchComm(self, self.get_default_group())
        for name in self._FACADE_OPS:
            self.collective_fn[name] = self._via_facade(name)

    def _via_facade(self, name: str):
        def run(args: CollectiveArgs):
            comm = (self.comm if args.group in (None, self.comm.group)
                    else TorchComm(self, args.group))
            if name == "all_reduce" and args.bitwidth != 32:
                # quantized path has no torchcomms surface; defer
                return TpuBackend.all_reduce(self, args)
            kw = {}
            if name in ("all_reduce", "reduce", "reduce_scatter"):
                kw["op"] = _red(args.red_op)
            if name == "reduce":
                kw["root"] = args.dst_rank
            if name == "broadcast":
                kw["root"] = args.src_rank
            w = getattr(comm, name)(args.in_tensor, async_op=True, **kw)
            return self.track(w.result())
        return run


register_backend("torchcomms", TorchcommsBackend)
