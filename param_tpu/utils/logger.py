"""Performance-metric dataclasses and a pluggable logger registry.

TPU-native counterpart of the reference's ``logger_utils.py:16-129``.
Benchmarks construct metric records and hand them to every registered
``PerfLogger``; the default sink is stdout via the benchmark's own table
printer, and users register custom sinks (JSON-lines, scuba-like, …) with
``register_perf_logger``.
"""

from __future__ import annotations

import json
import logging
from abc import ABC, abstractmethod
from dataclasses import asdict, dataclass, field
from typing import Dict, List, Optional

log = logging.getLogger(__name__)


@dataclass
class CommsPerfMetrics:
    """Base record for a communication benchmark result
    (reference: logger_utils.py:16-39)."""

    commsOp: str
    dtype: str
    backend: str = "tpu"
    world_size: int = 1
    tag: str = ""


@dataclass
class CommsQuantCollPerfMetrics(CommsPerfMetrics):
    """Quantized-collective extras (reference: logger_utils.py:40-55)."""

    bitwidth: int = 32
    quant_us: float = 0.0
    dequant_us: float = 0.0


@dataclass
class CommsCollPerfMetrics(CommsPerfMetrics):
    """One row of a collective sweep (reference: logger_utils.py:56-74)."""

    input_size_bytes: int = 0
    output_size_bytes: int = 0
    num_elements: int = 0
    p50_us: float = 0.0
    p75_us: float = 0.0
    p95_us: float = 0.0
    min_us: float = 0.0
    max_us: float = 0.0
    alg_bw_gbs: float = 0.0
    bus_bw_gbs: float = 0.0
    quant: Optional[CommsQuantCollPerfMetrics] = None


@dataclass
class CommsPt2PtPerfMetrics(CommsPerfMetrics):
    """pt2pt result record (reference: logger_utils.py:75-91)."""

    input_size_bytes: int = 0
    ping_p50_us: float = 0.0
    ping_pong_p50_us: float = 0.0
    uni_bw_gbs: float = 0.0
    bi_bw_gbs: float = 0.0


@dataclass
class ComputePerfMetrics:
    """Compute-tier result record (GEMM / embedding / MLP)."""

    op: str
    dtype: str
    shape: List[int] = field(default_factory=list)
    lat_us: float = 0.0
    tflops: float = 0.0
    gbs: float = 0.0
    roofline_frac: float = 0.0


class PerfLogger(ABC):
    """Sink interface (reference: logger_utils.py:92-110)."""

    @abstractmethod
    def log_metrics(self, metrics) -> None: ...


class StdoutJsonLogger(PerfLogger):
    def log_metrics(self, metrics) -> None:
        print(json.dumps({"type": type(metrics).__name__, **asdict(metrics)}))


class FileJsonLogger(PerfLogger):
    def __init__(self, path: str):
        self.path = path

    def log_metrics(self, metrics) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps({"type": type(metrics).__name__, **asdict(metrics)}) + "\n")


_PERF_LOGGERS: Dict[str, PerfLogger] = {}


def register_perf_logger(name: str, logger: PerfLogger) -> None:
    """(reference: logger_utils.py:123-129)"""
    if name in _PERF_LOGGERS:
        log.warning("perf logger %s already registered; overwriting", name)
    _PERF_LOGGERS[name] = logger


def unregister_perf_logger(name: str) -> None:
    _PERF_LOGGERS.pop(name, None)


def get_perf_loggers() -> List[PerfLogger]:
    return list(_PERF_LOGGERS.values())


def emit_metrics(metrics) -> None:
    for lg in _PERF_LOGGERS.values():
        try:
            lg.log_metrics(metrics)
        except Exception:  # noqa: BLE001 — a bad sink must not kill the bench
            log.exception("perf logger failed")


def setup_rank_logging(rank: int = 0, level: str = "INFO") -> None:
    """Rank-tagged log format (reference: comms_utils.py:1899-1906)."""
    logging.basicConfig(
        level=level.upper(),
        format=f"[%(asctime)s][rank {rank}][%(levelname)s] "
               "%(name)s: %(message)s",
        force=True,
    )


def graceful_exit(msg: str = "", code: int = 1):
    """(reference: gracefulExit, comms_utils.py:83-96)"""
    if msg:
        log.error(msg)
    raise SystemExit(code)
