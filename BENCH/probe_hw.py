"""Hardware-ceiling probes backing the scaling-protocol choice (see
BASELINE.md). Three microbenchmarks, each run pinned at two process
counts, NO Spark involved:

- ``alu``: pure-Python integer loop (no memory traffic) — isolates CPU
  frequency / SMT effects.
- ``mem``: streaming int64 sums over per-process 64 MB arrays — measures
  the box's aggregate memory bandwidth at each parallelism level.
- ``extract``: the engine's actual HTML→fields extraction kernel
  (ethos_spark.extraction.content) over synthetic articles — the
  dominant cost of a crawl round, bare-metal.

Usage:
    taskset -c 0-7  python BENCH/probe_hw.py alu 4
    taskset -c 0-31 python BENCH/probe_hw.py extract 16
(one taskset CPU pair per process, mirroring bench_scaling.py's pinning)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def alu(n: int) -> int:
    x = 1
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return x


def mem(n: int) -> int:
    import numpy as np

    a = np.arange(64 * 1024 * 1024 // 8, dtype=np.int64)  # real pages
    s = 0
    for _ in range(n):
        s += int(a.sum())
    return s


def extract(args: tuple[int, int]) -> int:
    lo, hi = args
    os.environ.setdefault("ETHOS_SYNTH_PARA_BOOST", "8")
    from ethos_spark.extraction.content import extract_content_fields
    from ethos_spark.sources.config import SYNTH_SOURCE
    from ethos_spark.synth import article_html

    for i in range(lo, hi):
        try:
            extract_content_fields(
                article_html(i % 40, i % 97), SYNTH_SOURCE.content, f"https://x/{i}"
            )
        except Exception:
            pass
    return hi - lo


def main() -> None:
    kind, procs = sys.argv[1], int(sys.argv[2])
    t0 = time.monotonic()
    if kind == "alu":
        work = 30_000_000
        with mp.Pool(procs) as p:
            p.map(alu, [work] * procs)
        dt = time.monotonic() - t0
        print(f"alu procs={procs} {procs * work / dt / 1e6:.1f} Mops/s total")
    elif kind == "mem":
        work = 60
        with mp.Pool(procs) as p:
            p.map(mem, [work] * procs)
        dt = time.monotonic() - t0
        print(f"mem procs={procs} {procs * work * 64 / 1024 / dt:.1f} GB/s total")
    elif kind == "extract":
        total = procs * 2000
        chunks = [
            (i * total // procs, (i + 1) * total // procs) for i in range(procs)
        ]
        with mp.Pool(procs) as p:
            n = sum(p.map(extract, chunks))
        dt = time.monotonic() - t0
        print(f"extract procs={procs} {n / dt:.1f} docs/s total")
    else:
        raise SystemExit("kind must be alu|mem|extract")


if __name__ == "__main__":
    main()
