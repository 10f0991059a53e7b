"""Attribute py4j round trips to repo call sites during construction of
given queries: counts send_command invocations keyed by the innermost
anser_spark/ or __spark_entry__ stack frame.

Usage: python scripts/rt_attrib.py query [query ...]
"""

from __future__ import annotations

import collections
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import py4j.clientserver as cs

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    counts: collections.Counter = collections.Counter()
    active = {"on": False}
    orig = cs.ClientServerConnection.send_command

    def counted(self, *a, **kw):
        if active["on"]:
            site = "?"
            for fr in reversed(traceback.extract_stack()):
                fn = fr.filename
                if "/anser_spark/" in fn or fn.endswith("__spark_entry__.py"):
                    site = f"{fn.rsplit('/', 1)[-1]}:{fr.lineno}"
                    break
            counts[site] += 1
        return orig(self, *a, **kw)

    cs.ClientServerConnection.send_command = counted

    spark = get_spark("anser-spark-rta")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    all_q = ent.queries()
    for name in names:
        fn = all_q[name]
        fn(spark, sf_dir)  # warm fixtures
        counts.clear()
        active["on"] = True
        fn(spark, sf_dir)
        active["on"] = False
        total = sum(counts.values())
        print(f"== {name}: {total} RTs ==")
        for site, n in counts.most_common(25):
            print(f"  {n:6d}  {site}")
    spark.stop()


if __name__ == "__main__":
    main()
