"""Analytic ICI/DCN scaling model — predict collective and trace times at
world sizes this environment cannot run.

PARAM traces exist to answer platform questions: *what would this
workload's communication pattern cost at scale?*  The reference answers by
running on real clusters or handing traces to downstream simulators (the
Chakra ecosystem its ET schema feeds).  This module gives the TPU build a
first-order closed-form answer directly: a latency-bandwidth model of XLA
collectives on TPU torus meshes — the "How to Scale Your Model" recipe —
applied per-op to a parsed comm trace, across a sweep of world sizes.

Reference analogues: the analytic matmul time model used for autotune
pruning (``train/comms/pt/matmul_perf_model.py:71`` — same
max/sum(latency, bandwidth) style, per-topology instead of per-kernel) and
the busBW correction tables (``pytorch_backend_utils.py:200-247``), whose
(n-1)/n geometry this model reproduces exactly: in the large-message limit
the predicted busBW of every ring collective equals the per-chip ICI wire
rate ``W`` — the property nccl-tests defines busBW to have.

Model.  ``B`` is the per-rank message payload in bytes — the same figure
the sweep calls ``size`` and feeds to algBW (harness.payload_bytes).
``W`` = per-chip usable ICI bandwidth = sum over torus axes of the axis
ring bandwidth (both link directions on a wrapped axis; an open/mesh axis
halves it — no wraparound shortcut).

====================  ==================================================
collective            time (bandwidth term)
====================  ==================================================
all_gather            B.(n-1)/n / W            (bidirectional ring)
reduce_scatter        B.(n-1)/n / W
all_reduce            2.B.(n-1)/n / W          (reduce_scatter + all_gather)
broadcast / reduce    B.(n-1)/n / W            (pipelined ring)
gather / scatter      B.(n-1) / W_root         (root ingress/egress bound)
all_to_all            sum_axes B.a_i/4 / W_i   (hierarchical per-axis ring;
                                                a_i/2 on an open axis)
pt2pt                 B / w_link + hops.lat
====================  ==================================================

The all_to_all row is the book's "all-to-all is ~4x cheaper than
all-gather on a wrapped ring" result: each chip ships B bytes a mean
shortest-path distance of a/4 hops, so the per-axis wire time is
B.(a/4)/W_axis (a/2 unwrapped).  Unlike the switch-fabric (n-1)/n busBW
convention, this grows with the axis length — the honest torus-bisection
cost.

Each collective adds a latency term ``steps x hop_latency`` (ring
algorithms take a_i - 1 steps per axis).  Worlds larger than one pod
compose hierarchically over DCN: the in-pod phase at ICI rate plus a
cross-pod phase at the per-host NIC rate shared by the host's chips
(reduce-style ops move the pod-reduced shard; gather-style ops move every
remote pod's contribution once into each pod).

Numbers are first-order estimates for ranking and capacity planning, not
benchmarks; every hardware constant is overridable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence

from param_tpu.utils.dtypes import dtype_from_name, dtype_size

# ----------------------------------------------------------------- hardware

# Per-generation interconnect description.  ici_gbs is the ONE-DIRECTION
# bandwidth of a single ICI link in GB/s.  pod_shape is the maximum torus;
# smaller slices factorize into sub-tori.  DCN defaults assume a
# 200 Gbps-class NIC per host, shared by the host's chips.
#
# Constant provenance (tests/test_scaling_model.py pins these anchors):
# - v5e: Google Cloud TPU v5e public spec sheet — 197 bf16 TF/s, 819 GB/s
#   HBM, 1600 Gbps aggregate ICI per chip over 4 links (2D torus) =
#   400 Gbps = 50 GB/s one-way per link; 256-chip 16x16 pod, 8 chips/host.
# - v4: public spec — 275 bf16 TF/s, 1228 GB/s HBM, 4096-chip 16^3 torus
#   (6 links/chip at ~50 GB/s one-way).
# - v5p: public spec — 459 bf16 TF/s, 2765 GB/s HBM, 4800 Gbps ICI per
#   chip over 6 links = 100 GB/s one-way; 8960-chip 16x20x28 pod.
# - v6e (Trillium): public launch figures — ~4.7x v5e peak (918 bf16
#   TF/s), 2x v5e HBM BW (1640 GB/s), v5e-style 2D 16x16 pod.
# - hop_latency_us ~1 us: the public "How to Scale Your Model" book's
#   per-hop ICI latency figure (jax-ml.github.io/scaling-book).
# - gather_rows_per_s: measured on THIS repo's v5e chip (RESULTS.md
#   gather studies, ~80-95 M rows/s DMA-issue ceiling), HBM-ratio scaled
#   to other generations.
# The compute roofline is additionally anchored to on-chip MEASUREMENTS
# (RESULTS.md GEMM tables) by tests — predictions must land within 25%
# of the measured 49.4 us (1024,4096,1024) and 52.5 us (128,4096,4096)
# bf16 GEMMs, the reference matmul_perf_model.py:71 spirit.


@dataclass(frozen=True)
class GenSpec:
    name: str
    ici_gbs: float  # per-link, one direction
    pod_shape: tuple  # maximum torus
    chips_per_host: int
    dcn_gbs_per_host: float = 25.0  # one direction
    hop_latency_us: float = 1.0
    # per-chip compute roofline (public spec-sheet figures)
    mxu_tflops_bf16: float = 197.0
    hbm_gbs: float = 819.0
    # sparse-gather DMA issue rate: rows/s ceiling measured on this repo's
    # v5e (RESULTS.md gather studies: ~80-95 M rows/s, issue-bound);
    # scaled by HBM ratio for other generations
    gather_rows_per_s: float = 80e6


GENERATIONS: Dict[str, GenSpec] = {
    "v4": GenSpec("v4", 50.0, (16, 16, 16), 4,
                  mxu_tflops_bf16=275.0, hbm_gbs=1228.0,
                  gather_rows_per_s=80e6 * 1228 / 819),
    "v5e": GenSpec("v5e", 50.0, (16, 16), 8,
                   mxu_tflops_bf16=197.0, hbm_gbs=819.0),
    "v5p": GenSpec("v5p", 100.0, (16, 20, 28), 4,
                   mxu_tflops_bf16=459.0, hbm_gbs=2765.0,
                   gather_rows_per_s=80e6 * 2765 / 819),
    "v6e": GenSpec("v6e", 100.0, (16, 16), 8,
                   mxu_tflops_bf16=918.0, hbm_gbs=1640.0,
                   gather_rows_per_s=80e6 * 1640 / 819),
}


@dataclass(frozen=True)
class Topology:
    """A concrete slice: a (sub-)torus of one generation, possibly
    replicated over ``n_pods`` pods joined by DCN."""

    gen: GenSpec
    torus: tuple  # per-axis chip counts within one pod slice
    wrap: tuple  # per-axis bool: wraparound links present
    n_pods: int = 1

    @property
    def chips_per_pod(self) -> int:
        return int(math.prod(self.torus))

    @property
    def n_chips(self) -> int:
        return self.chips_per_pod * self.n_pods

    def axis_bw(self, i: int) -> float:
        """Usable per-chip ring bandwidth on axis i (GB/s): both link
        directions on a wrapped axis; an open (mesh) axis halves it."""
        full = 2.0 * self.gen.ici_gbs
        return full if self.wrap[i] else full / 2.0

    @property
    def total_bw(self) -> float:
        """Per-chip ICI bandwidth usable by a full-slice ring collective
        (axes combine — the book's multi-axis all-gather rule).  Axes of
        extent 1 contribute nothing (their links don't exist)."""
        return sum(
            self.axis_bw(i) for i, a in enumerate(self.torus) if a > 1
        ) or 1e-9

    @property
    def root_bw(self) -> float:
        """One chip's aggregate one-way ICI ingress (= egress) bandwidth:
        2 links per torus axis of extent > 1 (interior-chip figure)."""
        return sum(
            2.0 * self.gen.ici_gbs for a in self.torus if a > 1
        ) or 1e-9

    @property
    def dcn_bw_per_chip(self) -> float:
        return self.gen.dcn_gbs_per_host / self.gen.chips_per_host


def slice_topology(
    generation: str,
    n_chips: int,
    hop_latency_us: Optional[float] = None,
    dcn_gbs_per_host: Optional[float] = None,
    ici_gbs: Optional[float] = None,
) -> Topology:
    """Factorize ``n_chips`` into the most-square sub-torus the generation
    supports; chips beyond one pod become DCN-joined pods.  An axis keeps
    wraparound links only at full pod extent (smaller slices are meshes —
    the boundary links don't loop back)."""
    gen = GENERATIONS[generation]
    if hop_latency_us is not None or dcn_gbs_per_host is not None or ici_gbs is not None:
        gen = replace(
            gen,
            hop_latency_us=hop_latency_us if hop_latency_us is not None else gen.hop_latency_us,
            dcn_gbs_per_host=dcn_gbs_per_host if dcn_gbs_per_host is not None else gen.dcn_gbs_per_host,
            ici_gbs=ici_gbs if ici_gbs is not None else gen.ici_gbs,
        )
    pod = int(math.prod(gen.pod_shape))
    n_pods = max(1, -(-n_chips // pod))
    per_pod = n_chips if n_pods == 1 else pod
    if n_pods > 1 and n_chips != n_pods * pod:
        raise ValueError(
            f"{n_chips} chips is not a whole number of {pod}-chip pods"
        )
    dims = len(gen.pod_shape)
    torus = _factorize(per_pod, dims, gen.pod_shape)
    wrap = tuple(t == s and t > 1 for t, s in zip(torus, gen.pod_shape))
    return Topology(gen=gen, torus=torus, wrap=wrap, n_pods=n_pods)


def _factorize(n: int, dims: int, caps: tuple) -> tuple:
    """Most-square factorization of n into ``dims`` factors, each <= cap.
    Prefers balanced axes (maximizes usable ring bandwidth per axis)."""
    best = None

    def rec(rem, i, acc):
        nonlocal best
        if i == dims - 1:
            if rem <= caps[i]:
                cand = tuple(sorted(acc + [rem], reverse=True))
                score = (max(cand) / max(1, min(c for c in cand if c > 0)), cand)
                if best is None or score < best[0]:
                    best = (score, cand)
            return
        f = 1
        while f <= min(rem, caps[i]):
            if rem % f == 0:
                rec(rem // f, i + 1, acc + [f])
            f += 1

    rec(n, 0, [])
    if best is None:
        raise ValueError(f"cannot factorize {n} chips into a {caps} torus")
    return best[1]


# ------------------------------------------------------------------- model

# collective name aliases -> canonical model entry
_CANON = {
    "all_gather_base": "all_gather",
    "all_gather_v": "all_gather",
    "all_gather_object": "all_gather",
    "reduce_scatter_base": "reduce_scatter",
    "reduce_scatter_v": "reduce_scatter",
    "all_to_allv": "all_to_all",
    "all_to_all_single": "all_to_all",
    "broadcast_object_list": "broadcast",
    "multicast": "scatter",
    "incast": "gather",
    "send": "pt2pt",
    "recv": "pt2pt",
    "isend": "pt2pt",
    "irecv": "pt2pt",
}

_MODELED = frozenset(
    [
        "all_reduce",
        "all_gather",
        "reduce_scatter",
        "all_to_all",
        "broadcast",
        "reduce",
        "gather",
        "scatter",
        "pt2pt",
        "barrier",
    ]
)


def _us(bytes_: float, gbs: float) -> float:
    """bytes at GB/s -> microseconds (1 GB/s == 1 byte/ns)."""
    return bytes_ / max(gbs, 1e-9) / 1e3


def _lat_steps(topo: Topology) -> float:
    """Ring-algorithm step count: (a_i - 1) per axis."""
    return float(sum(a - 1 for a in topo.torus))


def _ici_time_us(name: str, B: float, topo: Topology) -> float:
    """One-pod wire + latency time (us) for per-rank payload B bytes."""
    n = topo.chips_per_pod
    if n <= 1:
        return 0.0
    W = topo.total_bw
    lat = _lat_steps(topo) * topo.gen.hop_latency_us
    frac = (n - 1) / n
    if name == "all_reduce":
        return _us(2.0 * B * frac, W) + 2.0 * lat
    if name in ("all_gather", "reduce_scatter", "broadcast", "reduce"):
        return _us(B * frac, W) + lat
    if name == "all_to_all":
        # hierarchical per-axis exchange: axis i ships the full B bytes a
        # mean shortest-path distance of a_i/4 hops (a_i/2 open) over that
        # axis's ring bandwidth
        t = 0.0
        for i, a in enumerate(topo.torus):
            if a <= 1:
                continue
            mean_hops = a / 4.0 if topo.wrap[i] else a / 2.0
            t += _us(B * mean_hops, topo.axis_bw(i))
        return t + lat
    if name in ("gather", "scatter"):
        # incast/outcast bound: every other rank's full B-byte payload
        # funnels through the root's links (sweep convention: per-rank
        # input B, root holds n.B)
        return _us(B * (n - 1), topo.root_bw) + lat
    if name == "pt2pt":
        # worst-case Manhattan route at single-link rate
        hops = sum(
            (a // 2 if w else a - 1)
            for a, w in zip(topo.torus, topo.wrap)
            if a > 1
        )
        return _us(B, topo.gen.ici_gbs) + hops * topo.gen.hop_latency_us
    if name == "barrier":
        return lat
    raise ValueError(f"no model for collective {name!r}")


def _dcn_time_us(name: str, B: float, topo: Topology) -> float:
    """Cross-pod phase (us) when n_pods > 1, at the per-chip DCN share."""
    P = topo.n_pods
    if P <= 1:
        return 0.0
    w = topo.dcn_bw_per_chip
    if name == "all_reduce":
        # in-pod reduce_scatter leaves each chip a B/chips_per_pod shard;
        # shards all_reduce across pods, then in-pod all_gather
        b_shard = B / topo.chips_per_pod
        return _us(2.0 * b_shard * (P - 1) / P, w)
    if name in ("all_gather", "all_to_all"):
        # every pod must ingest each remote pod's per-chip contribution;
        # per chip that is B bytes from each of P-1 pods (the in-pod ICI
        # redistribution is already counted in the pod phase)
        return _us(B * (P - 1), w)
    if name in ("reduce_scatter", "gather", "scatter", "broadcast", "reduce"):
        # one full payload crosses DCN per remote pod, pipelined: the
        # per-chip share is B.(P-1)/P
        return _us(B * (P - 1) / P, w)
    if name == "pt2pt":
        return _us(B, w)
    if name == "barrier":
        return float(P - 1) * topo.gen.hop_latency_us * 10.0
    raise ValueError(f"no model for collective {name!r}")


def predict_collective_us(
    collective: str,
    size_bytes: int,
    topo: Topology,
    bitwidth: int = 32,
) -> float:
    """Predicted wall time (us) of one collective with per-rank payload
    ``size_bytes`` on ``topo``.  ``bitwidth`` models quantized transport
    (wire bytes scale by bitwidth/32, reference comms.py:1149)."""
    name = _CANON.get(collective, collective)
    if name not in _MODELED:
        raise ValueError(f"no model for collective {collective!r}")
    B = float(size_bytes) * (bitwidth / 32.0)
    return _ici_time_us(name, B, topo) + _dcn_time_us(name, B, topo)


def predict_compute_us(op, gen: GenSpec, bitwidth: int = 32) -> Optional[float]:
    """Roofline estimate (us) for an embedded compute element of a comm
    trace (``compute:gemm`` / ``compute:emb_lookup``, the replayer's
    run_compute surface — reference prepComputeReplay,
    commsTraceReplay.py:853-932).  max(MXU time, HBM time); embedding
    lookups additionally respect the measured sparse-gather DMA issue
    ceiling (RESULTS.md gather studies).  Returns None for unknown kinds."""
    kind = getattr(op, "compute", None)
    esize = dtype_size(dtype_from_name(getattr(op, "dtype", "float32") or "float32"))
    reps = max(1, int(getattr(op, "count", 1) or 1))
    if kind == "gemm" and getattr(op, "mm_dims", None):
        m, k, _, n = (list(op.mm_dims) + [1, 1, 1, 1])[:4]
        flops = 2.0 * m * k * n
        bytes_ = (m * k + k * n + m * n) * esize
        t_mxu = flops / (gen.mxu_tflops_bf16 * 1e12) * 1e6  # us
        # fp32 inputs still run MXU bf16 passes under XLA default precision
        t_hbm = _us(bytes_, gen.hbm_gbs)
        return reps * max(t_mxu, t_hbm)
    if kind == "emb_lookup":
        rows = max(1, op.batch_size) * max(1, op.bag_size)
        bytes_ = rows * max(1, op.emb_dim) * esize
        t_hbm = _us(bytes_, gen.hbm_gbs)
        t_issue = rows / gen.gather_rows_per_s * 1e6
        return reps * max(t_hbm, t_issue)
    return None


def predicted_bus_bw(
    collective: str, size_bytes: int, topo: Topology, bitwidth: int = 32
) -> float:
    """busBW (GB/s) implied by the model — comparable to the sweep's
    COMMS-RES busBW column and to ``utils.bw.bus_bw``."""
    from param_tpu.utils.bw import bus_bw

    t = predict_collective_us(collective, size_bytes, topo, bitwidth)
    return bus_bw(collective, size_bytes, t, topo.n_chips, bitwidth)


# ------------------------------------------------------------- trace level


@dataclass
class OpPrediction:
    name: str
    size_bytes: int
    time_us: float
    count: int = 1


@dataclass
class TracePrediction:
    topo: Topology
    per_op: Dict[str, OpPrediction] = field(default_factory=dict)
    total_us: float = 0.0
    total_bytes: int = 0
    n_ops: int = 0
    skipped: int = 0
    compute_us: float = 0.0
    n_compute: int = 0

    @property
    def serial_us(self) -> float:
        """Iteration bound with zero comm/compute overlap."""
        return self.total_us + self.compute_us

    @property
    def overlap_us(self) -> float:
        """Iteration bound with perfect comm/compute overlap."""
        return max(self.total_us, self.compute_us)

    def row(self) -> dict:
        return {
            "world": self.topo.n_chips,
            "torus": "x".join(map(str, self.topo.torus))
            + (f" *{self.topo.n_pods} pods" if self.topo.n_pods > 1 else ""),
            "ops": self.n_ops,
            "bytes": self.total_bytes,
            "comm_us": round(self.total_us, 1),
            "compute_us": round(self.compute_us, 1),
            "serial_us": round(self.serial_us, 1),
            "overlap_us": round(self.overlap_us, 1),
        }


def predict_trace(
    ops: Sequence,
    topo: Topology,
    bitwidth: int = 32,
) -> TracePrediction:
    """Predict the serialized comm time of a parsed op stream
    (:class:`param_tpu.trace.comms_trace.CommsOp`) on ``topo``.

    Message sizes are taken from the trace as-is: in/out_msg_size are
    per-rank element counts (the replayer's convention, reference
    commsTraceReplay.py:636-679), so the recorded per-rank payload is the
    model's B at ANY world size — the what-if question is "this rank's
    recorded traffic pattern, re-run on a w-chip slice".  Compute elements
    and unmodeled ops are counted in ``skipped``."""
    pred = TracePrediction(topo=topo)
    for op in ops:
        name = getattr(op, "comms", None)
        if not name:
            tc = predict_compute_us(op, topo.gen, bitwidth)
            if tc is not None:
                pred.compute_us += tc
                pred.n_compute += 1
            elif getattr(op, "compute", None):
                pred.skipped += 1  # unknown compute kind
            continue
        if name in ("wait", "init"):
            continue
        canon = _CANON.get(name, name)
        if canon not in _MODELED:
            pred.skipped += 1
            continue
        elems = max(
            int(getattr(op, "in_msg_size", 0) or 0),
            int(getattr(op, "out_msg_size", 0) or 0),
        )
        esize = dtype_size(dtype_from_name(getattr(op, "dtype", "float32") or "float32"))
        B = elems * esize
        t = predict_collective_us(name, B, topo, bitwidth=bitwidth)
        pred.total_us += t
        pred.total_bytes += B
        pred.n_ops += 1
        agg = pred.per_op.get(canon)
        if agg is None:
            pred.per_op[canon] = OpPrediction(canon, B, t)
        else:
            agg.count += 1
            agg.size_bytes += B
            agg.time_us += t
    return pred


def predict_worlds(
    ops: Sequence,
    generation: str,
    worlds: Sequence[int],
    bitwidth: int = 32,
    **topo_kw,
) -> List[TracePrediction]:
    """What-if sweep: the trace's comm cost on each world size."""
    return [
        predict_trace(ops, slice_topology(generation, w, **topo_kw), bitwidth)
        for w in worlds
    ]


def format_report(preds: Sequence[TracePrediction]) -> str:
    """COMMS-RES-style table of the what-if sweep.  ``serial``/``overlap``
    bracket the iteration time (zero vs perfect comm/compute overlap)."""
    lines = [
        f"{'world':>6} {'torus':>16} {'ops':>6} {'skip':>5} "
        f"{'GB moved':>10} {'comm ms':>10} {'compute ms':>11} "
        f"{'serial ms':>10} {'overlap ms':>11}"
    ]
    for p in preds:
        gb = p.total_bytes / 1e9
        torus = "x".join(map(str, p.topo.torus)) + (
            f"*{p.topo.n_pods}p" if p.topo.n_pods > 1 else ""
        )
        lines.append(
            f"{p.topo.n_chips:>6} {torus:>16} {p.n_ops:>6} {p.skipped:>5} "
            f"{gb:>10.3f} {p.total_us/1e3:>10.3f} {p.compute_us/1e3:>11.3f} "
            f"{p.serial_us/1e3:>10.3f} {p.overlap_us/1e3:>11.3f}"
        )
    return "\n".join(lines)
