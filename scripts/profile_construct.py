"""cProfile the CONSTRUCTION of a declared query (driver-side plan
building, fixture loads, any eager jobs) — the round-14 profiles show
construction dominates text_find/ann_top_k, so attribute it precisely.
Usage: python scripts/profile_construct.py [--warm N] [--top N] query
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    warm = 1
    top = 40
    if "--warm" in args:
        i = args.index("--warm")
        warm = int(args[i + 1])
        del args[i : i + 2]
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("anser-spark-profile-construct")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    all_q = ent.queries()
    for name in args:
        fn = all_q[name]
        for _ in range(warm):
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        prof = cProfile.Profile()
        prof.enable()
        fn(spark, sf_dir)
        prof.disable()
        st = pstats.Stats(prof)
        print(f"=== {name}: construction profile (warm={warm}) ===")
        st.sort_stats("cumulative").print_stats(top)


if __name__ == "__main__":
    main()
