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
    if isinstance(op, str) and op.upper() in ReduceOp.__members__:
        # name-style strings ("SUM", "Product") -> backend op tokens
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

    def all_gather_v(self, tensor, in_split: Sequence[int],
                     async_op: bool = False):
        """Ragged all_gather (reference all_gather_v surface,
        pytorch_dist_backend.py:436-474)."""
        w = self._run("all_gather_v", in_tensor=tensor, in_split=in_split)
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

    def reduce_scatter_v(self, tensor, op=ReduceOp.SUM,
                         out_split: Optional[Sequence[int]] = None,
                         async_op: bool = False):
        """Ragged reduce_scatter: rank r receives ``out_split[r]`` reduced
        elements (reference reduce_scatter_v)."""
        w = self._run("reduce_scatter_v", in_tensor=tensor, red_op=_red(op),
                      out_split=out_split)
        return w if async_op else (w.wait() and w)

    def gather(self, tensor, root: int = 0, async_op: bool = False):
        """Rooted gather (reference torchcomms gather,
        pytorch_torchcomms_backend.py gather surface)."""
        w = self._run("gather", in_tensor=tensor, dst_rank=root)
        return w if async_op else (w.wait() and w)

    def scatter(self, tensor, root: int = 0, async_op: bool = False):
        """Rooted scatter (reference torchcomms scatter surface)."""
        w = self._run("scatter", in_tensor=tensor, src_rank=root)
        return w if async_op else (w.wait() and w)

    def send_recv(self, tensor, src_ranks: Sequence[int],
                  dst_ranks: Sequence[int], async_op: bool = False):
        """Paired point-to-point transfers: one ppermute edge per
        (src, dst) pair.  The SPMD-mesh equivalent of the reference's
        batched isend/irecv pairs (pytorch_dist_backend.py:626-701) —
        on a mesh every rank runs the same program, so send and recv are
        the SAME collective with the rank's role decided by the edge
        list."""
        w = self._run("send_recv", in_tensor=tensor,
                      src_ranks=list(src_ranks), dst_ranks=list(dst_ranks))
        return w if async_op else (w.wait() and w)

    def incast(self, tensor, root: int = 0,
               src_ranks: Optional[Sequence[int]] = None,
               async_op: bool = False):
        """Many-to-one pattern (reference composes batched isend/irecv,
        comms.py:809-860)."""
        w = self._run("incast", in_tensor=tensor, dst_rank=root,
                      src_ranks=list(src_ranks or []))
        return w if async_op else (w.wait() and w)

    def multicast(self, tensor, root: int = 0,
                  dst_ranks: Optional[Sequence[int]] = None,
                  async_op: bool = False):
        """One-to-many pattern (reference: comms.py:809-860)."""
        w = self._run("multicast", in_tensor=tensor, src_rank=root,
                      dst_ranks=list(dst_ranks or []))
        return w if async_op else (w.wait() and w)

    def barrier(self) -> None:
        self._b.barrier(self._g)

    # -- object collectives (torchcomms objcol) ---------------------------
    def all_gather_object(self, obj: Any) -> List[Any]:
        """Each rank contributes ``obj``; returns the n-object list.
        Single-controller: this process's object stands for every
        addressable rank (backend key: ``misc["objects"]``, indexable by
        rank)."""
        args = CollectiveArgs(
            group=self._g, misc={"objects": [obj] * self._g.size})
        return type(self._b).all_gather_object(self._b, args)

    def broadcast_object_list(self, objs: List[Any], root: int = 0):
        args = CollectiveArgs(group=self._g, src_rank=root,
                              misc={"object_list": list(objs)})
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
    """Harness backend whose collectives route through the
    :class:`TorchComm` facade — ``--backend torchcomms`` on any CLI proves
    the communicator API end-to-end under the standard sweeps.

    Covers the FULL tensor-collective surface of the plain backend
    (the reference's torchcomms backend likewise spans every collective +
    p2p, pytorch_torchcomms_backend.py:23-859): dense, ragged (*_v),
    rooted, incast/multicast, pt2pt, and object collectives.

    One documented divergence: quantized all_reduce/reduce
    (``--bitwidth`` 8/16) defers to the plain backend — the torchcomms
    call surface carries no bitwidth parameter, so there is nothing to
    route (the CLI ``--backend`` help notes this)."""

    # dispatch-table name -> facade call (comm, args) -> Work
    _FACADE_OPS = {
        "all_reduce": lambda c, a: c.all_reduce(
            a.in_tensor, op=_red(a.red_op), async_op=True),
        "reduce": lambda c, a: c.reduce(
            a.in_tensor, root=a.dst_rank, op=_red(a.red_op), async_op=True),
        "all_gather": lambda c, a: c.all_gather(a.in_tensor, async_op=True),
        "all_gather_base": lambda c, a: c.all_gather(
            a.in_tensor, async_op=True),
        "all_gather_v": lambda c, a: c.all_gather_v(
            a.in_tensor, a.in_split, async_op=True),
        "reduce_scatter": lambda c, a: c.reduce_scatter(
            a.in_tensor, op=_red(a.red_op), async_op=True),
        "reduce_scatter_base": lambda c, a: c.reduce_scatter(
            a.in_tensor, op=_red(a.red_op), async_op=True),
        "reduce_scatter_v": lambda c, a: c.reduce_scatter_v(
            a.in_tensor, op=_red(a.red_op),
            out_split=a.out_split or a.in_split, async_op=True),
        "all_to_all": lambda c, a: c.all_to_all(a.in_tensor, async_op=True),
        "all_to_all_single": lambda c, a: c.all_to_all(
            a.in_tensor, async_op=True),
        "all_to_allv": lambda c, a: c.all_to_all_v(
            a.in_tensor, a.in_split, a.out_split, async_op=True),
        "broadcast": lambda c, a: c.broadcast(
            a.in_tensor, root=a.src_rank, async_op=True),
        "gather": lambda c, a: c.gather(
            a.in_tensor, root=a.dst_rank, async_op=True),
        "scatter": lambda c, a: c.scatter(
            a.in_tensor, root=a.src_rank, async_op=True),
        "incast": lambda c, a: c.incast(
            a.in_tensor, root=a.dst_rank, src_ranks=a.src_ranks,
            async_op=True),
        "multicast": lambda c, a: c.multicast(
            a.in_tensor, root=a.src_rank, dst_ranks=a.dst_ranks,
            async_op=True),
        "pt2pt": lambda c, a: c.send_recv(
            a.in_tensor, a.src_ranks, a.dst_ranks, async_op=True),
    }

    def initialize(self) -> None:
        super().initialize()
        self.comm = TorchComm(self, self.get_default_group())
        for name in self._FACADE_OPS:
            self.collective_fn[name] = self._via_facade(name)
        self.collective_fn["all_gather_object"] = self._object_via_facade(
            "all_gather_object")
        self.collective_fn["broadcast_object_list"] = self._object_via_facade(
            "broadcast_object_list")

    def _comm_for(self, args: CollectiveArgs) -> TorchComm:
        return (self.comm if args.group in (None, self.comm.group)
                else TorchComm(self, args.group))

    def _via_facade(self, name: str):
        call = self._FACADE_OPS[name]

        def run(args: CollectiveArgs):
            if (name in ("all_reduce", "reduce") and args.bitwidth != 32
                    and args.red_op == "sum"):
                # quantized path has no torchcomms surface; defer (see
                # class docstring)
                return getattr(TpuBackend, name)(self, args)
            if name == "all_to_allv" and args.in_split is None:
                return self.track(
                    self._comm_for(args).all_to_all(
                        args.in_tensor, async_op=True).result())
            w = call(self._comm_for(args), args)
            return self.track(w.result())
        return run

    def _object_via_facade(self, name: str):
        def run(args: CollectiveArgs):
            comm = self._comm_for(args)
            if name == "all_gather_object":
                objs = args.misc.get("objects")
                if objs is not None:
                    # harness prep supplies DISTINCT per-rank objects (the
                    # rank pattern); the torchcomms call surface takes one
                    # object per rank, which a single-controller facade
                    # can't express — pass the per-rank list through to
                    # the backend unchanged so dcheck stays meaningful
                    a = CollectiveArgs(group=comm.group,
                                       misc={"objects": list(objs)})
                    return TpuBackend.all_gather_object(self, a)
                return comm.all_gather_object(args.in_tensor)
            lst = args.misc.get("object_list")
            return comm.broadcast_object_list(
                list(lst) if lst is not None else [args.in_tensor],
                root=args.src_rank)
        return run


register_backend("torchcomms", TorchcommsBackend)
