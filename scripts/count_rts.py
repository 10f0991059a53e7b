"""Deterministic construction-cost metrics per declared query: py4j
round trips (send_command calls) and Spark jobs during queries()[name]
construction, plus jobs during one noop execution. Wall-clock on this
box swings 3..50s on identical runs (hypervisor stalls), so round-trip
and job counts are the stable optimization currency (guide §1).

Usage: python scripts/count_rts.py [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import py4j.clientserver as cs

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    counter = {"n": 0}
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **kw):
        counter["n"] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counted

    spark = get_spark("anser-spark-rts")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    def _noop(it):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        yield from it

    spark.range(256, numPartitions=64).repartition(64).mapInPandas(
        _noop, "id long"
    ).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext

    def job_id():
        return sc._jsc.sc().dagScheduler().nextJobId()

    all_q = ent.queries()
    rows = []
    for name in names or list(all_q):
        fn = all_q[name]
        fn(spark, sf_dir)  # warm (fixture caches, parse caches)
        r0, j0 = counter["n"], job_id()
        df = fn(spark, sf_dir)
        r1, j1 = counter["n"], job_id()
        df.write.format("noop").mode("overwrite").save()
        r2, j2 = counter["n"], job_id()
        rows.append((name, r1 - r0, j1 - j0, r2 - r1, j2 - j1))
        print(
            f"{name:28s} construct: {r1-r0:5d} RTs {j1-j0:3d} jobs"
            f"   exec: {r2-r1:5d} RTs {j2-j1:3d} jobs",
            flush=True,
        )
    total_rts = sum(r[1] + r[3] for r in rows)
    total_jobs = sum(r[2] + r[4] for r in rows)
    print(f"TOTAL {total_rts} RTs, {total_jobs} jobs over {len(rows)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
