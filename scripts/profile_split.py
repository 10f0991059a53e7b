"""Split-profile declared queries: construction (driver, incl. any eager
jobs) vs execution (noop sink), plus Spark job counts for each phase.
Usage: python scripts/profile_split.py [--repeat N] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    repeat = 2
    if "--repeat" in args:
        i = args.index("--repeat")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("anser-spark-profile")
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
    for name in args:
        fn = all_q[name]
        for attempt in range(repeat):
            spark.sparkContext.setJobDescription(f"{name} [{attempt}]")
            n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            n2 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
            print(
                f"{name:26s} [{attempt}] construct={t1-t0:7.3f}s"
                f" ({n1-n0:3d} jobs)  exec={t2-t1:7.3f}s ({n2-n1:3d} jobs)"
                f"  total={t2-t0:7.3f}s",
                flush=True,
            )
        spark.sparkContext.setJobDescription(None)
        spark.sparkContext._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
