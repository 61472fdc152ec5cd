"""XLA HLO dump summarizer.

TPU-native counterpart of the reference's profiler-artifact post-analysis
tooling (``tools/nsys_analysis.py`` — parses nsys sqlite exports into
per-op kernel breakdowns).  On TPU the compiler artifact is the HLO dump
(``XLA_FLAGS=--xla_dump_to=DIR``); this module summarizes the dumped
``*.txt`` modules: op counts by opcode, fusion statistics, collective ops,
and the largest computations.

Run:
    XLA_FLAGS=--xla_dump_to=/tmp/hlo python -m param_tpu.cli.compute gemm ...
    python -m param_tpu.trace.hlo_summary /tmp/hlo
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import Counter
from typing import Dict, List

_OP_RE = re.compile(r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*[\w\[\],{}\s/]*?\s([a-z][\w\-]*)\(")

COLLECTIVE_OPS = {
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute", "ragged-all-to-all", "all-reduce-start",
    "all-gather-start", "collective-permute-start",
}


def summarize_hlo_text(text: str) -> Counter:
    ops: Counter = Counter()
    for line in text.splitlines():
        m = _OP_RE.match(line)
        if m:
            ops[m.group(1)] += 1
    return ops


def summarize_dump_dir(dump_dir: str, pattern: str = "*after_optimizations.txt") -> Dict:
    """Summary across every optimized module in the dump directory."""
    files = sorted(glob.glob(os.path.join(dump_dir, pattern)))
    if not files:
        files = sorted(glob.glob(os.path.join(dump_dir, "*.txt")))
    modules: List[Dict] = []
    total: Counter = Counter()
    for f in files:
        with open(f) as fh:
            ops = summarize_hlo_text(fh.read())
        total.update(ops)
        modules.append(
            {
                "module": os.path.basename(f),
                "num_ops": sum(ops.values()),
                "fusions": ops.get("fusion", 0),
                "collectives": sum(ops.get(c, 0) for c in COLLECTIVE_OPS),
                "top_ops": ops.most_common(8),
            }
        )
    return {
        "num_modules": len(modules),
        "modules": modules,
        "total_op_counts": dict(total.most_common()),
        "total_collectives": sum(total.get(c, 0) for c in COLLECTIVE_OPS),
    }


def print_summary(result: Dict) -> None:
    print(f"modules: {result['num_modules']}  "
          f"collective ops: {result['total_collectives']}")
    for m in result["modules"]:
        tops = ", ".join(f"{k}x{v}" for k, v in m["top_ops"][:5])
        print(f"  {m['module']}: {m['num_ops']} ops, {m['fusions']} fusions, "
              f"{m['collectives']} collectives [{tops}]")


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        print("usage: python -m param_tpu.trace.hlo_summary DUMP_DIR")
        return 2
    try:
        print_summary(summarize_dump_dir(args[0]))
    except BrokenPipeError:  # head/less closed the pipe
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
