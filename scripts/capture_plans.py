"""Capture .explain("formatted") for declared queries into plans/r06/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default: the
bench picks). Uses sf0.1 so plans are the bench shapes without sf1.0 cost.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ethos_spark.session import get_spark
    import __spark_entry__ as E

    if not names:
        import bench
        names = bench.BENCH_PICKS
    spark = get_spark("plan-capture")
    qs = E.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", len(plan), "chars")
    spark.stop()

if __name__ == "__main__":
    main()
