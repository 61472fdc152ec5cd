"""Backend abstraction: the distributed-communication layer.

TPU-native counterpart of the reference's ``backendFunctions`` ABC +
``collectiveArgsHolder`` (``train/comms/pt/pytorch_backend_utils.py:32-427``).
The harness never calls ``jax.lax`` collectives directly; every collective
goes through ``backend.collective_fn[name]`` exactly as the reference routes
everything through ``backendFuncs.collectiveFunc[name]``.

Key architectural difference from the reference (by design, see SURVEY.md §7):
a *process group* is a :class:`CommGroup` — its own ``jax.sharding.Mesh`` over
a subset of devices — and each collective entry is a cached
``jit(shard_map(...))`` program over that mesh, not an eager call into a
communication library.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence, Type

import numpy as np

log = logging.getLogger(__name__)

# Collectives every backend must provide — same surface as the reference's
# ``supportedCollectives`` (pytorch_backend_utils.py:35-63).
SUPPORTED_COLLECTIVES = [
    "reduce",
    "all_reduce",
    "all_to_all",
    "all_to_allv",
    "all_to_all_single",
    "all_gather",
    "all_gather_v",
    "all_gather_base",
    "broadcast",
    "reduce_scatter",
    "reduce_scatter_v",
    "reduce_scatter_base",
    "gather",
    "scatter",
    "incast",
    "multicast",
    "all_gather_object",
    "broadcast_object_list",
    "barrier",
    "pt2pt",
]

# host-mediated collectives: every call pickles Python objects on the host
# before the device exchange, so they cannot ride a compiled scan chain and
# are timed per-call (reference: dist.all_gather_object /
# dist.broadcast_object_list, pytorch_dist_backend.py:396-425,593-608)
OBJECT_COLLECTIVES = {"all_gather_object", "broadcast_object_list"}

SUPPORTED_P2P_OPS = ["send", "recv", "isend", "irecv"]
PT2PT_PATTERNS = ["one2one", "pairwise"]

REDUCE_OPS = ["sum", "max", "min", "prod", "avg"]


@dataclass
class CommGroup:
    """A communicator: an ordered set of devices with its own mesh.

    The analogue of a ``ProcessGroup`` (reference creates them with
    ``dist.new_group``, pytorch_dist_backend.py:1202-1251).  ``mesh`` has one
    axis named ``axis`` spanning exactly the member devices, so a
    ``shard_map`` collective over ``axis`` is a collective over this group.
    """

    devices: List[Any]
    mesh: Any  # jax.sharding.Mesh
    axis: str = "rank"
    pg_id: int = 0
    name: str = ""

    @property
    def size(self) -> int:
        return len(self.devices)

    def rank_of(self, device) -> int:
        return self.devices.index(device)


@dataclass
class CollectiveArgs:
    """Per-op argument holder passed to every collective function.

    The analogue of the reference's ``collectiveArgsHolder``
    (pytorch_backend_utils.py:66-149).  Tensors are global jax Arrays sharded
    over ``group.mesh``.
    """

    group: Optional[CommGroup] = None
    in_tensor: Any = None
    out_tensor: Any = None
    # reduction op for reduce-style collectives
    red_op: str = "sum"
    # root rank for rooted collectives (reduce/broadcast/gather/scatter)
    src_rank: int = 0
    dst_rank: int = 0
    # ragged splits for *_v collectives: per-rank element counts
    in_split: Optional[Sequence[int]] = None
    out_split: Optional[Sequence[int]] = None
    # pt2pt
    src_ranks: List[int] = field(default_factory=list)
    dst_ranks: List[int] = field(default_factory=list)
    window: int = 100
    # execution knobs
    async_op: bool = True
    num_coll_per_iter: int = 1
    # quantized-communication bitwidth (32 = off)
    bitwidth: int = 32
    quant_threshold: int = 0
    # opaque slot benchmarks use to stash per-op state
    misc: Dict[str, Any] = field(default_factory=dict)


class Backend:
    """Abstract backend (reference: ``backendFunctions``,
    pytorch_backend_utils.py:156-411).

    Subclasses populate ``self.collective_fn`` with entries for every name in
    ``SUPPORTED_COLLECTIVES``; each entry takes a :class:`CollectiveArgs` and
    returns the result tensor (possibly not yet materialized — completion is
    ``complete_ops``).
    """

    def __init__(self):
        self.collective_fn: Dict[str, Callable[[CollectiveArgs], Any]] = {}
        self.compute_fn: Dict[str, Callable[..., Any]] = {}
        self._pending: List[Any] = []
        self._pending_by_id: Dict[Any, Any] = {}
        self._trace_recorder: Optional[List[dict]] = None
        self._unwrapped_collective_fn: Optional[Dict[str, Callable]] = None

    # -- comm trace recording ---------------------------------------------
    @staticmethod
    def _per_rank_msg_sizes(name: str, total_elems: int, n: int, args) -> tuple:
        """(in_msg_size, out_msg_size) in PER-RANK element counts — the
        basic-schema convention (reference commsTraceParser uses the sizes
        verbatim at replay: inMsgSize elements per rank in, outMsgSize out;
        commsTraceReplay.py:684 ``size_from_trace``).  ``total_elems`` is the
        global sharded-array element count, so per-rank input is total/n."""
        per = total_elems // max(n, 1)
        if name == "incast":
            # the root receives one buffer per actual SOURCE (which may be
            # a subset of the group), not per group member
            n_src = len(args.src_ranks) if args.src_ranks else n - 1
            out = per * n_src
        elif name in ("all_gather", "all_gather_base", "gather"):
            out = per * n
        elif name == "all_gather_v":
            out = int(np.sum(args.in_split)) if args.in_split is not None else per * n
        elif name in ("reduce_scatter", "reduce_scatter_base", "scatter"):
            out = max(1, per // n)
        elif name == "reduce_scatter_v":
            splits = args.out_split if args.out_split is not None else args.in_split
            out = int(np.max(splits)) if splits is not None else max(1, per // n)
        else:
            # all_reduce, reduce, broadcast, multicast, all_to_all(v), pt2pt
            out = per
        return per, out

    def is_recording(self) -> bool:
        """True while start_trace_recording is active (public accessor —
        bench code keys on this, not the private recorder field)."""
        return self._trace_recorder is not None

    def start_trace_recording(self) -> None:
        """Record every collective call as a basic-schema trace element
        (the capture side of the comms-trace loop; the reference records
        these via its profiler/--print-comms paths).  Wraps the dispatch
        table once — only calls routed through ``collective_fn`` (as the
        harness does) are recorded, not direct method calls.
        ``stop_trace_recording`` restores the unwrapped table."""
        if self._trace_recorder is not None:
            self._trace_recorder = []
            return
        self._trace_recorder = []
        self._unwrapped_collective_fn = dict(self.collective_fn)
        import time as _time

        for name, fn in list(self.collective_fn.items()):

            def wrapped(args: CollectiveArgs, _fn=fn, _name=name):
                if self._trace_recorder is not None and _name not in (
                    "barrier", "noop"
                ):
                    total = (
                        int(np.prod(args.in_tensor.shape))
                        if args.in_tensor is not None
                        else 0
                    )
                    n = (args.group or self.get_default_group()).size
                    in_elems, out_elems = self._per_rank_msg_sizes(
                        _name, total, n, args
                    )
                    rec = {
                        "comms": _name,
                        "in_msg_size": in_elems,
                        "out_msg_size": out_elems,
                        "dtype": str(getattr(args.in_tensor, "dtype", "float32")),
                        "world_size": n,
                        "startTime_ns": _time.monotonic_ns(),
                    }
                    if args.group is not None and args.group.pg_id:
                        rec["pg_id"] = args.group.pg_id
                        rec["global_ranks"] = [
                            d.id if hasattr(d, "id") else d
                            for d in args.group.devices
                        ]
                    if args.in_split is not None:
                        split = np.asarray(args.in_split)
                        rec["in_split"] = (
                            split.tolist() if split.ndim == 1 else split[0].tolist()
                        )
                        rec["out_split"] = rec["in_split"]
                    if _name == "pt2pt":
                        rec["src_rank"] = args.src_ranks[0] if args.src_ranks else 0
                        rec["dst_rank"] = args.dst_ranks[0] if args.dst_ranks else 0
                        rec["use_batch"] = False
                    self._trace_recorder.append(rec)
                return _fn(args)

            self.collective_fn[name] = wrapped

    def stop_trace_recording(self) -> List[dict]:
        trace = self._trace_recorder or []
        self._trace_recorder = None
        # restore the unwrapped dispatch table (in place — callers may hold a
        # reference to the dict) so repeated start/stop cycles never stack
        # wrappers or double-record
        orig = getattr(self, "_unwrapped_collective_fn", None)
        if orig is not None:
            self.collective_fn.clear()
            self.collective_fn.update(orig)
            self._unwrapped_collective_fn = None
        return trace

    # -- init / topology ---------------------------------------------------
    def initialize(self) -> None:
        raise NotImplementedError

    def get_local_rank(self) -> int:
        raise NotImplementedError

    def get_global_rank(self) -> int:
        raise NotImplementedError

    def get_world_size(self) -> int:
        raise NotImplementedError

    def get_device(self):
        raise NotImplementedError

    def get_default_group(self) -> CommGroup:
        raise NotImplementedError

    def get_groups(self) -> List[CommGroup]:
        raise NotImplementedError

    def new_group(self, ranks: Sequence[int], pg_id: int = 0) -> CommGroup:
        raise NotImplementedError

    # -- memory ------------------------------------------------------------
    def alloc_random(self, shape, dtype, group: Optional[CommGroup] = None, seed=0):
        raise NotImplementedError

    def alloc_ones(self, shape, dtype, group: Optional[CommGroup] = None, scale=1.0):
        raise NotImplementedError

    def alloc_empty(self, shape, dtype, group: Optional[CommGroup] = None):
        raise NotImplementedError

    def clear_memory(self) -> None:
        self._pending.clear()
        self._pending_by_id.clear()

    # -- completion --------------------------------------------------------
    def track(self, result, req_id=None):
        """Record an in-flight (asynchronously dispatched) result."""
        self._pending.append(result)
        if req_id is not None:
            self._pending_by_id[req_id] = result
        return result

    def complete_ops(self) -> None:
        """Drain all in-flight ops — the analogue of the reference's
        ``complete_accel_ops`` (wait + cuda.synchronize,
        pytorch_dist_backend.py:712-721; ``xm.mark_step`` on TPU,
        pytorch_tpu_backend.py:65-66).  In JAX: block until every dispatched
        array is ready."""
        import jax

        if self._pending:
            jax.block_until_ready(self._pending)
            self._pending.clear()
        self._pending_by_id.clear()

    def wait(self, req_id) -> None:
        """Wait for one tracked op by request id
        (reference: pytorch_dist_backend.py:734-744)."""
        import jax

        res = self._pending_by_id.pop(req_id, None)
        if res is not None:
            jax.block_until_ready(res)

    def barrier(self, group: Optional[CommGroup] = None) -> None:
        raise NotImplementedError

    def sync_barrier(self, group: Optional[CommGroup] = None) -> None:
        """complete_ops + barrier (reference: pytorch_dist_backend.py:746-756)."""
        self.complete_ops()
        self.barrier(group)

    # -- reporting ---------------------------------------------------------
    def get_bus_bw(self, collective: str, alg_bw_gbs: float, group=None) -> float:
        from param_tpu.utils.bw import bus_bw_factor

        n = (group or self.get_default_group()).size
        return alg_bw_gbs * bus_bw_factor(collective, n)

    def benchmark_comms(self, bench_time_fn, *args):
        """Run the benchmark body under this backend
        (reference: pytorch_dist_backend.py:1253-1267)."""
        return bench_time_fn(*args)


# -- registry ---------------------------------------------------------------
_BACKENDS: Dict[str, Type[Backend]] = {}


def register_backend(name: str, cls: Type[Backend]) -> None:
    """(reference: register_customized_backend,
    pytorch_backend_utils.py:414-427)"""
    _BACKENDS[name] = cls


def get_backend_cls(name: str) -> Type[Backend]:
    try:
        return _BACKENDS[name]
    except KeyError:
        raise ValueError(f"unknown backend {name!r}; known: {sorted(_BACKENDS)}") from None


def list_backends() -> List[str]:
    return sorted(_BACKENDS)
