"""Auxiliary benchmarks for the optimization rounds (bench.py is FROZEN
for measurement — this file adds subset timing and noop-sink isolation per
guide §1.4 without touching the driver contract).

Usage:
  python bench_extra.py q1_pricing_summary top_k_per_key   # subset, bench-style
  ETHOS_BENCH_NOOP=1 python bench_extra.py <names>         # noop sink instead of count
  ETHOS_BENCH_REPEAT=3 python bench_extra.py <names>       # repeat each query
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    use_noop = os.environ.get("ETHOS_BENCH_NOOP") == "1"
    repeat = int(os.environ.get("ETHOS_BENCH_REPEAT", "1"))

    from ethos_spark.session import get_spark

    import bench
    import __spark_entry__ as E

    if not names:
        names = bench.BENCH_PICKS
    spark = get_spark("ethos-bench-extra", master=f"local[{cpus}]")
    try:
        bench.warm_session(spark, sf_dir, picks=names)
        qs = E.queries()
        out = {}
        for name in names:
            samples = []
            for _ in range(repeat):
                spark.sparkContext.setJobDescription(f"bench:{name}")
                t0 = time.monotonic()
                df = qs[name](spark, sf_dir)
                if use_noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                samples.append(round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            out[name] = samples if repeat > 1 else samples[0]
        print(json.dumps({"queries": out, "sf_dir": sf_dir, "noop": use_noop}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
