"""Round-7 skew rehearsal probe: time the hot-key-sensitive paths on
the uniform sf1 fixture vs the 30%-hot-key sf1skew variant
(scripts/gen_skew.py) and report whether AQE's skew-join handling
kicked in.  Receipts land in SCALE.md.

Paths probed:
  join    — $lookup orders⋈lineitem + $unwind (sort-merge join whose
            build key is 30% one value on the skew fixture)
  groupby — $group by l_suppkey with $sum/$avg (hash agg; hot key =
            one gigantic partial)
  topn    — keyed $topN by l_returnflag + global (_id: None) $topN
            (the salted two-phase window path, round-7 fix)
  window  — $setWindowFields rank over user_id (30% of events in ONE
            window partition on the skew fixture)

Usage: python scripts/skew_probe.py [sf1_dir] [skew_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
SKEW = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1skew"


def pipelines():
    join = [
        {"$lookup": {"from": "orders", "localField": "l_orderkey",
                     "foreignField": "o_orderkey", "as": "o"}},
        {"$unwind": "$o"},
        {"$group": {"_id": "$o.o_orderpriority",
                    "rev": {"$sum": "$l_extendedprice"},
                    "n": {"$sum": 1}}},
    ]
    groupby = [
        {"$group": {"_id": "$l_suppkey",
                    "qty": {"$sum": "$l_quantity"},
                    "avg_price": {"$avg": "$l_extendedprice"},
                    "n": {"$sum": 1}}},
        {"$sort": {"n": -1}},
        {"$limit": 5},
    ]
    topn = [
        {"$group": {"_id": "$l_returnflag",
                    "top5": {"$topN": {"n": 5,
                                       "sortBy": {"l_extendedprice": -1},
                                       "output": "$l_orderkey"}}}},
    ]
    topn_global = [
        {"$group": {"_id": None,
                    "top5": {"$topN": {"n": 5,
                                       "sortBy": {"l_extendedprice": -1},
                                       "output": "$l_orderkey"}},
                    "min3": {"$minN": {"input": "$l_extendedprice",
                                       "n": 3}}}},
    ]
    window = [
        {"$setWindowFields": {
            "partitionBy": "$user_id",
            "sortBy": {"ts": 1, "event_id": 1},
            "output": {"rn": {"$documentNumber": {}}}}},
        {"$match": {"rn": {"$lte": 2}}},
        {"$group": {"_id": None, "n": {"$sum": 1}}},
    ]
    return {
        "join": ("lineitem", join),
        "groupby": ("lineitem", groupby),
        "topn_keyed": ("lineitem", topn),
        "topn_global": ("lineitem", topn_global),
        "window": ("events", window),
    }


def main() -> None:
    from anser_spark.engine import Engine
    from anser_spark.session import get_spark

    spark = get_spark("skew-probe", cpus="16")
    eng = Engine(spark, workdir=tempfile.mkdtemp(), sources={
        "sf1": SF1, "skew": SKEW,
    })
    results = {}
    # interleave fixtures and take best-of-2 so JVM/codegen warm-up
    # doesn't systematically favor whichever fixture runs second
    for name, (table, stages) in pipelines().items():
        for db_name in ("sf1", "skew", "sf1", "skew"):
            db = eng.database(db_name)
            df = db.collection(table).pipe(stages).to_df()
            t0 = time.monotonic()
            df.collect()
            dt = time.monotonic() - t0
            key = (db_name, name)
            results[key] = min(results.get(key, dt), dt)
        plan = (
            eng.database("skew").collection(table).pipe(stages).to_df()
            ._jdf.queryExecution().executedPlan().toString()
        )
        skewed = "isSkew=true" in plan or "skew=true" in plan
        print(
            f"{name:12s} sf1 {results[('sf1', name)]:6.2f}s   "
            f"skew {results[('skew', name)]:6.2f}s   "
            f"aqe-skew-marker={skewed}",
            flush=True,
        )
    print("\nratios (skew / uniform):")
    for name in pipelines():
        r = results[("skew", name)] / results[("sf1", name)]
        print(f"  {name:12s} {r:5.2f}x")


if __name__ == "__main__":
    main()
