"""CLI for the collective sweep benchmark.

Flag surface mirrors the reference's ``comms.py`` main + ``readArgs``
(``train/comms/pt/comms_utils.py:1713-1879``): ``--b/--e/--f/--i/--n/--w``
nccl-tests sizing, ``--collective`` (comma list), ``--z`` blocking mode,
``--c`` data check, ``--pt2pt`` patterns, ``--multi-comms``, ``--bitwidth``.

Run:
    python -m param_tpu.cli.comms --collective all_reduce --b 8 --e 64M
"""

from __future__ import annotations

import argparse
import logging
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="param_tpu.comms", description="PARAM-TPU collective benchmark"
    )
    ap.add_argument("--collective", "--coll", default="all_reduce",
                    help="comma-separated collectives (see --list)")
    ap.add_argument("--b", default="8", help="begin size (nccl-tests style)")
    ap.add_argument("--e", default="64M", help="end size")
    ap.add_argument("--f", type=int, default=2, help="multiplicative step factor")
    ap.add_argument("--i", default=None, help="additive step bytes (overrides --f)")
    ap.add_argument("--ss", default=None, help="explicit comma list of sizes")
    ap.add_argument("--n", type=int, default=20, help="timed iterations")
    ap.add_argument("--w", type=int, default=2, help="warmup iterations")
    ap.add_argument("--data-type", default="float32")
    ap.add_argument("--mode", default="graph",
                    choices=["dispatch", "blocking", "graph"],
                    help="timing mode (blocking == reference --z 1); "
                         "graph (chain) is the only mode trustworthy on "
                         "remote-attached TPUs — dispatch is DEBUG-ONLY")
    ap.add_argument("--z", type=int, default=None,
                    help="reference compat: 1 -> blocking mode")
    ap.add_argument("--c", type=int, default=0, help="data validation (dcheck)")
    ap.add_argument("--reduce-op", default="sum",
                    choices=["sum", "max", "min", "avg", "prod"])
    ap.add_argument("--src-rank", "--root", type=int, default=0)
    ap.add_argument("--dst-rank", type=int, default=0)
    ap.add_argument("--src-ranks", default="", help="comma ranks for incast/pt2pt")
    ap.add_argument("--dst-ranks", default="", help="comma ranks for multicast/pt2pt")
    ap.add_argument("--pt2pt", default=None, choices=[None, "one2one", "pairwise"])
    ap.add_argument("--window", type=int, default=100, help="pt2pt BW window size")
    ap.add_argument("--bitwidth", type=int, default=32,
                    help="quantized comm bitwidth (16/8)")
    ap.add_argument("--multi-comms", type=int, default=1,
                    help="round-robin ranks into N groups")
    ap.add_argument("--in-split", default=None,
                    help="comma per-rank element counts for all_to_allv")
    ap.add_argument("--out-split", default=None,
                    help="comma per-rank element counts for all_to_allv")
    ap.add_argument("--tag", default="", help="tag attached to metric records")
    ap.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host: jax.distributed coordinator address "
                         "(reference --master-ip/--master-port)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument(
        "--backend", default="tpu",
        help="registered backend name (tpu | torchcomms | mock; "
             "torchcomms routes every collective through the communicator "
             "facade — except quantized --bitwidth all_reduce/reduce, "
             "which defer to the plain backend since the torchcomms "
             "surface has no bitwidth parameter)")
    ap.add_argument("--num-devices", type=int, default=0,
                    help="limit device count (0 = all)")
    ap.add_argument("--reps", type=int, default=3,
                    help="measurement repetitions for percentiles")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace into DIR")
    ap.add_argument("--size-start-profiler", default=None, metavar="SIZE",
                    help="start the profiler only once the sweep reaches "
                         "this message size (reference comms.py:1335-1349)")
    ap.add_argument("--trace-dump", default=None, metavar="PATH",
                    help="record every collective as a basic-schema comm "
                         "trace (replayable with cli.replay)")
    ap.add_argument("--trace-dump-et", default=None, metavar="PATH",
                    help="additionally export the recorded trace in the "
                         "PyTorch-ET (Chakra host ET) schema so PyTorch-"
                         "world trace tooling can consume it "
                         "(trace/export_pytorch_et.py)")
    ap.add_argument("--output-json", default=None, metavar="PATH",
                    help="append metric records as JSON lines (perf-logger "
                         "sink; reference register_perf_logger)")
    ap.add_argument("--n-per-iter", type=int, default=1,
                    help="collective posts per timed iteration "
                         "(reference --n-per-iter / numCollPerIter)")
    ap.add_argument("--log", default="INFO")
    ap.add_argument("--list", action="store_true", help="list collectives and exit")
    return ap


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    logging.basicConfig(
        level=ns.log.upper(),
        format="[%(asctime)s %(levelname)s] %(name)s: %(message)s",
    )
    from param_tpu.backend.base import SUPPORTED_COLLECTIVES, get_backend_cls
    from param_tpu.comms.coll_bench import CollBench
    from param_tpu.comms.harness import CommsParams

    if ns.list:
        print("\n".join(SUPPORTED_COLLECTIVES))
        return 0
    if ns.z is not None and ns.z == 1:
        ns.mode = "blocking"

    backend = get_backend_cls(ns.backend)(
        coordinator_address=ns.coordinator,
        num_processes=ns.num_processes,
        process_id=ns.process_id,
    ) if ns.backend in ("tpu", "xla") else get_backend_cls(ns.backend)()
    backend.initialize()
    if ns.num_devices:
        import jax

        devs = jax.devices()[: ns.num_devices]
        backend = get_backend_cls(ns.backend)(devices=devs)
        backend.initialize()

    params = CommsParams.from_args(ns)
    params.num_coll_per_iter = ns.n_per_iter
    bench = CollBench(backend, params, reps=ns.reps)
    from param_tpu.utils.profiler import profile_to

    if ns.output_json:
        from param_tpu.utils.logger import FileJsonLogger, register_perf_logger

        register_perf_logger("file", FileJsonLogger(ns.output_json))

    if ns.trace_dump or ns.trace_dump_et:
        backend.start_trace_recording()
    if ns.size_start_profiler and ns.profile:
        from param_tpu.utils.profiler import SizeTriggeredProfiler
        from param_tpu.utils.sizes import parse_size

        bench.profiler = SizeTriggeredProfiler(
            ns.profile, parse_size(ns.size_start_profiler)
        )
        try:
            bench.run()
        finally:
            bench.profiler.stop()
    else:
        with profile_to(ns.profile):
            bench.run()
    if ns.trace_dump or ns.trace_dump_et:
        trace = backend.stop_trace_recording()
        if ns.trace_dump:
            from param_tpu.trace.comms_trace import dump_trace_file

            dump_trace_file(trace, ns.trace_dump)
            print(f"recorded {len(trace)} comm ops -> {ns.trace_dump}")
        if ns.trace_dump_et:
            from param_tpu.trace.export_pytorch_et import dump_pytorch_et_file

            dump_pytorch_et_file(trace, backend.get_world_size(),
                                 ns.trace_dump_et)
            print(f"exported {len(trace)} comm ops as PyTorch-ET -> "
                  f"{ns.trace_dump_et}")
    if ns.profile and ns.bitwidth != 32:
        # comm-vs-quant device-time split from the captured profile
        # (reference: quant_us/dequant_us, commsQuantCollPerfMetrics)
        from param_tpu.trace.device_trace import (
            find_trace_file, load_chrome_trace, quant_comm_split)

        events, threads = load_chrome_trace(find_trace_file(ns.profile))
        split = quant_comm_split(events, threads, thread_filter="XLA Ops")
        total = sum(d["total_us"] for d in split.values()) or 1.0
        print("quantized device-time split (from profile):")
        for k in ("comm", "quant", "dequant", "other"):
            d = split[k]
            print(f"  {k:>8}: {d['total_us']:>10.1f} us "
                  f"({100 * d['total_us'] / total:5.1f}%)  n={d['count']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
