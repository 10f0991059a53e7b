"""Stage-level attribution for a declared query: runs construct + noop
exec warm, then prints every stage with duration, task count, max/median
task time, shuffle bytes, spill.
Usage: python scripts/profile_stages.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("anser-spark-profile-stages")
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

    def fetch(path):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/{path}") as r:
            return json.load(r)

    all_q = ent.queries()
    for name in args_queries:
        fn = all_q[name]
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        stages_before = {s["stageId"] for s in fetch("stages")}
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        stages = [
            s for s in fetch("stages?status=complete")
            if s["stageId"] not in stages_before
        ]
        stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(f"\n=== {name}: construct={t1-t0:.3f}s exec={t2-t1:.3f}s ===")
        for s in stages[:18]:
            rt = (s.get("executorRunTime") or 0) / 1000
            cpu = (s.get("executorCpuTime") or 0) / 1e9
            sr = (s.get("shuffleReadBytes") or 0) / 1e6
            sw = (s.get("shuffleWriteBytes") or 0) / 1e6
            print(
                f"  stage {s['stageId']:4d} runTime={rt:8.2f}s cpu={cpu:7.2f}s"
                f" tasks={s['numCompleteTasks']:4d} shufR={sr:7.1f}MB"
                f" shufW={sw:7.1f}MB  {(s.get('description') or s['name'])[:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    args_queries = sys.argv[1:]
    main()
