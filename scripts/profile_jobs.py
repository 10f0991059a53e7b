"""Per-job attribution for a declared query: runs the query (construct +
noop exec) in a fresh session, then lists every Spark job it launched
with duration, stage/task counts and description from the UI REST API.
Usage: python scripts/profile_jobs.py [--warm N] query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    warm = 1
    if "--warm" in args:
        i = args.index("--warm")
        warm = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ["SPARK_GRAFT_UI"] = "1"  # need the REST API for job attribution

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("anser-spark-profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
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
        for _ in range(warm):
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        n0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        spark.sparkContext.setJobDescription(f"PROFILE {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        n1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        ) as r:
            jobs = json.load(r)
        mine = sorted(
            (j for j in jobs if n0 <= j["jobId"] < n1),
            key=lambda j: j["jobId"],
        )
        print(f"\n=== {name}: construct={t1-t0:.3f}s exec={t2-t1:.3f}s "
              f"total={t2-t0:.3f}s, {len(mine)} jobs ===")
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

        prev_end = None
        for j in mine:
            st, en = ts(j["submissionTime"]), ts(j["completionTime"])
            dur = (en - st).total_seconds()
            gap = (st - prev_end).total_seconds() if prev_end else 0.0
            prev_end = max(prev_end, en) if prev_end else en
            desc = (j.get("description") or j["name"])[:90]
            print(f"  job {j['jobId']:4d} {dur:7.3f}s gap={gap:6.3f}s "
                  f"tasks={j['numTasks']:4d} {desc}")
    spark.stop()


if __name__ == "__main__":
    main()
