"""Round-14 optimization measurement harness.

Runs a subset (or all) of __spark_entry__.queries() in a FRESH session,
each repeated N times against the noop sink (guide §1.4), and prints
min/median per query — min filters this box's multi-second writeback
stalls (measured: same query 0.7s..8s across identically-configured
runs). Optionally dumps .explain("formatted") to plans/r15/.

Usage:
  python scripts/measure_r15.py [--repeat N] [--plans SUFFIX] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    repeat = 3
    plans_suffix = None
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("anser-spark-measure")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def _noop(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(256, numPartitions=64).repartition(64).mapInPandas(
        _noop, "id long"
    ).write.format("noop").mode("overwrite").save()

    all_q = ent.queries()
    names = args or list(all_q)
    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    if plans_suffix:
        os.makedirs(plan_dir, exist_ok=True)
    results = {}
    for name in names:
        fn = all_q[name]
        ts = []
        for attempt in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [{attempt}]")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
            if plans_suffix and attempt == 0:
                with open(
                    os.path.join(plan_dir, f"{name}_{plans_suffix}.txt"), "w"
                ) as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
        spark.sparkContext.setJobDescription(None)
        spark.sparkContext._jvm.System.gc()
        results[name] = ts
        print(
            f"{name:28s} min={min(ts):7.3f} med={statistics.median(ts):7.3f}"
            f" all={[round(t, 2) for t in ts]}",
            flush=True,
        )
    total_min = sum(min(t) for t in results.values())
    print(f"TOTAL(min) {total_min:.3f}s over {len(results)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
