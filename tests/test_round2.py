"""Round-2 behaviors: $lookup+$unwind fusion, $setWindowFields default
frame + range windows, $bucket no-default error, $not on missing fields,
Query.one() immutability, classic-$lookup null-key semantics."""

import pytest
from pyspark.sql import functions as F

from anser_spark.plans.pipeline import PipelineCompileError


def run(coll, pipeline):
    return coll.pipe(pipeline).all()


# --- $lookup + $unwind fusion -----------------------------------------

LOOKUP_UNWIND = [
    {"$match": {"o_orderkey": {"$lte": 50}}},
    {"$lookup": {
        "from": "customer",
        "localField": "o_custkey",
        "foreignField": "c_custkey",
        "as": "cust",
    }},
    {"$unwind": "$cust"},
]


def test_lookup_unwind_fused_plan_has_no_collect_list(engine):
    orders = engine.db("tpch").collection("orders")
    df = orders.pipe(LOOKUP_UNWIND).to_df()
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    assert "Generate" not in plan  # no explode either — it's a plain join


def test_lookup_unwind_fused_matches_unfused(engine):
    orders = engine.db("tpch").collection("orders")
    fused = orders.pipe(LOOKUP_UNWIND).all()
    # force the unfused path by separating with a no-op $addFields
    unfused = orders.pipe(
        LOOKUP_UNWIND[:2]
        + [{"$addFields": {"__sep": 1}}, {"$unwind": "$cust"}, {"$unset": "__sep"}]
    ).all()
    keyf = lambda r: (r["o_orderkey"], r["cust"]["c_custkey"])
    assert sorted(keyf(r) for r in fused) == sorted(keyf(r) for r in unfused)
    assert len(fused) > 0
    for row in fused:
        assert row["cust"]["c_custkey"] == row["o_custkey"]


def test_lookup_unwind_preserve_fuses_to_left_join(engine, spark):
    eng = engine
    db = eng.db("appdb")
    left = db.collection("l")
    left._rewrite(spark.createDataFrame([(1, 10), (2, 99)], "k int, fk int"))
    right = db.collection("r")
    right._rewrite(spark.createDataFrame([(10, "x")], "rk int, v string"))
    out = left.pipe([
        {"$lookup": {"from": "r", "localField": "fk", "foreignField": "rk", "as": "m"}},
        {"$unwind": {"path": "$m", "preserveNullAndEmptyArrays": True}},
    ]).all()
    by_k = {r["k"]: r["m"] for r in out}
    assert by_k[1] == {"rk": 10, "v": "x"}
    assert by_k[2] is None  # no match kept, field null (not struct of nulls)
    # without preserve the unmatched row drops (inner join)
    out2 = left.pipe([
        {"$lookup": {"from": "r", "localField": "fk", "foreignField": "rk", "as": "m"}},
        {"$unwind": "$m"},
    ]).all()
    assert [r["k"] for r in out2] == [1]


def test_unwind_with_index_not_fused(engine, spark):
    db = engine.db("appdb")
    left = db.collection("l2")
    left._rewrite(spark.createDataFrame([(1, 10)], "k int, fk int"))
    right = db.collection("r2")
    right._rewrite(spark.createDataFrame([(10, "x"), (10, "y")], "rk int, v string"))
    out = left.pipe([
        {"$lookup": {"from": "r2", "localField": "fk", "foreignField": "rk", "as": "m"}},
        {"$unwind": {"path": "$m", "includeArrayIndex": "i"}},
    ]).all()
    assert sorted(r["i"] for r in out) == [0, 1]


def test_lookup_pipeline_form_fused(engine):
    orders = engine.db("tpch").collection("orders")
    out = orders.pipe([
        {"$match": {"o_orderkey": {"$lte": 20}}},
        {"$lookup": {
            "from": "customer",
            "let": {"ck": "$o_custkey"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$$ck", "$c_custkey"]}}},
                {"$project": {"c_name": 1, "c_custkey": 1}},
            ],
            "as": "cust",
        }},
        {"$unwind": "$cust"},
    ])
    plan = out.to_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    rows = out.all()
    assert len(rows) > 0
    for r in rows:
        assert r["cust"]["c_custkey"] == r["o_custkey"]


def test_classic_lookup_null_key_matches_null_foreign(engine, spark):
    db = engine.db("appdb")
    left = db.collection("ln")
    left._rewrite(spark.createDataFrame([(1, None), (2, 5)], "k int, fk int"))
    right = db.collection("rn")
    right._rewrite(spark.createDataFrame([(None, "nullrow"), (5, "five")], "rk int, v string"))
    out = left.pipe([
        {"$lookup": {"from": "rn", "localField": "fk", "foreignField": "rk", "as": "m"}},
    ]).all()
    by_k = {r["k"]: r["m"] for r in out}
    # Mongo: local null matches foreign docs whose key is null
    assert [m["v"] for m in by_k[1]] == ["nullrow"]
    assert [m["v"] for m in by_k[2]] == ["five"]


# --- $setWindowFields --------------------------------------------------

def test_window_agg_default_frame_is_whole_partition(doc_collection):
    # Mongo: sortBy present but no window ⇒ aggregate over the WHOLE
    # partition, not a running aggregate
    out = run(doc_collection, [
        {"$match": {"priority": {"$ne": None}}},
        {"$setWindowFields": {
            "sortBy": {"priority": 1},
            "output": {"total": {"$sum": "$priority"}},
        }},
    ])
    totals = {r["total"] for r in out}
    assert totals == {10 + 5 + 99 - 1 + 42}


def test_window_range_frame(doc_collection):
    # value-based window: sum of priorities within [-10, 0] of each row
    out = run(doc_collection, [
        {"$match": {"priority": {"$ne": None}}},
        {"$setWindowFields": {
            "sortBy": {"priority": 1},
            "output": {"near": {"$sum": "$priority",
                                "window": {"range": [-10, 0]}}},
        }},
    ])
    by_p = {r["priority"]: r["near"] for r in out}
    assert by_p[-1] == -1
    assert by_p[5] == 4        # -1 + 5
    assert by_p[10] == 15      # 5 + 10
    assert by_p[42] == 42
    assert by_p[99] == 99


def test_window_range_time_unit(doc_collection):
    # 2-day trailing count over the `time` column
    out = run(doc_collection, [
        {"$setWindowFields": {
            "sortBy": {"time": 1},
            "output": {"n2d": {"$count": {},
                               "window": {"range": [-1, 0], "unit": "day"}}},
        }},
    ])
    by_id = {r["_id"]: r["n2d"] for r in out}
    assert by_id["a1"] == 1
    assert by_id["a2"] == 2  # a1 is exactly 1 day earlier — inclusive
    assert by_id["a6"] == 2


def test_window_range_requires_single_asc_sort(doc_collection):
    with pytest.raises(PipelineCompileError):
        run(doc_collection, [
            {"$setWindowFields": {
                "sortBy": {"priority": -1},
                "output": {"x": {"$sum": 1, "window": {"range": [-1, 0]}}},
            }},
        ])


# --- $bucket without default ------------------------------------------

def test_bucket_no_default_raises_on_out_of_bounds(engine):
    orders = engine.db("tpch").collection("orders")
    with pytest.raises(Exception) as exc:
        orders.pipe([
            {"$bucket": {
                "groupBy": "$o_totalprice",
                "boundaries": [0, 1000],  # most orders exceed 1000
            }},
        ]).all()
    assert "outside boundaries" in str(exc.value)


def test_bucket_no_default_ok_when_all_fit(engine):
    orders = engine.db("tpch").collection("orders")
    out = orders.pipe([
        {"$bucket": {
            "groupBy": "$o_totalprice",
            "boundaries": [0, 10_000_000],
        }},
    ]).all()
    assert out[0]["count"] == 1500


# --- $not on a missing field ------------------------------------------

def test_not_on_missing_field_matches_all(doc_collection):
    out = doc_collection.find({"nofield": {"$not": {"$gt": 5}}}).all()
    assert len(out) == 6
    out = doc_collection.find({"nofield": {"$not": {"$eq": None}}}).all()
    assert len(out) == 0  # missing field equals null in Mongo


# --- Query.one() must not mutate the builder --------------------------

def test_query_one_does_not_mutate(doc_collection):
    q = doc_collection.find({"activated": True}).sort("priority")
    first = q.one()
    assert first["_id"]
    assert len(q.all()) == 4
    assert q.count() == 4


# --- $densify / $fill --------------------------------------------------

def test_densify_full_bounds(engine, spark):
    db = engine.db("appdb")
    c = db.collection("ts1")
    c._rewrite(spark.createDataFrame(
        [(0, 1.0), (3, 4.0), (5, 9.0)], "t int, v double"))
    out = c.pipe([
        {"$densify": {"field": "t", "range": {"step": 1, "bounds": "full"}}},
        {"$sort": {"t": 1}},
    ]).all()
    assert [r["t"] for r in out] == [0, 1, 2, 3, 4, 5]
    assert [r["v"] for r in out] == [1.0, None, None, 4.0, None, 9.0]


def test_densify_partition_bounds(engine, spark):
    db = engine.db("appdb")
    c = db.collection("ts2")
    c._rewrite(spark.createDataFrame(
        [("a", 1), ("a", 4), ("b", 10), ("b", 12)], "g string, t int"))
    out = c.pipe([
        {"$densify": {"field": "t", "partitionByFields": ["g"],
                      "range": {"step": 1, "bounds": "partition"}}},
        {"$sort": {"g": 1, "t": 1}},
    ]).all()
    assert [(r["g"], r["t"]) for r in out] == [
        ("a", 1), ("a", 2), ("a", 3), ("a", 4),
        ("b", 10), ("b", 11), ("b", 12)]


def test_densify_explicit_bounds_half_open(engine, spark):
    db = engine.db("appdb")
    c = db.collection("ts3")
    c._rewrite(spark.createDataFrame([(2,)], "t int"))
    out = c.pipe([
        {"$densify": {"field": "t", "range": {"step": 2, "bounds": [0, 6]}}},
        {"$sort": {"t": 1}},
    ]).all()
    assert [r["t"] for r in out] == [0, 2, 4]  # 6 excluded, 2 not duplicated


def test_densify_time_unit(engine, spark):
    import datetime
    db = engine.db("appdb")
    c = db.collection("ts4")
    d = datetime.datetime
    c._rewrite(spark.createDataFrame(
        [(d(2026, 1, 1),), (d(2026, 1, 4),)], "ts timestamp"))
    out = c.pipe([
        {"$densify": {"field": "ts", "range": {"step": 1, "bounds": "full", "unit": "day"}}},
        {"$sort": {"ts": 1}},
    ]).all()
    assert [r["ts"].day for r in out] == [1, 2, 3, 4]


def test_densify_week_and_quarter_units(engine, spark):
    # regression: 'interval {step} 7 day' is a ParseException — the
    # multiplier must fold into the step (week→7 day, quarter→3 month)
    import datetime
    d = datetime.datetime
    db = engine.db("appdb")
    c = db.collection("ts5")
    c._rewrite(spark.createDataFrame(
        [(d(2026, 1, 5),), (d(2026, 1, 26),)], "ts timestamp"))
    out = c.pipe([
        {"$densify": {"field": "ts", "range": {"step": 1, "bounds": "full", "unit": "week"}}},
        {"$sort": {"ts": 1}},
    ]).all()
    assert [r["ts"].day for r in out] == [5, 12, 19, 26]

    c2 = db.collection("ts6")
    c2._rewrite(spark.createDataFrame(
        [(d(2026, 1, 1),), (d(2026, 7, 1),)], "ts timestamp"))
    out = c2.pipe([
        {"$densify": {"field": "ts", "range": {"step": 1, "bounds": "full", "unit": "quarter"}}},
        {"$sort": {"ts": 1}},
    ]).all()
    assert [(r["ts"].month) for r in out] == [1, 4, 7]

    c3 = db.collection("ts7")
    c3._rewrite(spark.createDataFrame(
        [(d(2026, 1, 5),), (d(2026, 2, 2),)], "ts timestamp"))
    out = c3.pipe([
        {"$densify": {"field": "ts", "range": {"step": 2, "bounds": "full", "unit": "week"}}},
        {"$sort": {"ts": 1}},
    ]).all()
    assert [(r["ts"].month, r["ts"].day) for r in out] == [(1, 5), (1, 19), (2, 2)]


def test_fill_value_and_locf(engine, spark):
    db = engine.db("appdb")
    c = db.collection("f1")
    c._rewrite(spark.createDataFrame(
        [(1, None, None), (2, 5.0, "x"), (3, None, None), (4, 7.0, "y")],
        "t int, v double, s string"))
    out = c.pipe([
        {"$fill": {"sortBy": {"t": 1},
                   "output": {"v": {"method": "locf"}, "s": {"value": "?"}}}},
        {"$sort": {"t": 1}},
    ]).all()
    assert [r["v"] for r in out] == [None, 5.0, 5.0, 7.0]  # leading null stays
    assert [r["s"] for r in out] == ["?", "x", "?", "y"]


def test_fill_linear(engine, spark):
    db = engine.db("appdb")
    c = db.collection("f2")
    c._rewrite(spark.createDataFrame(
        [(0, 0.0), (1, None), (2, None), (3, 9.0), (4, None)],
        "t int, v double"))
    out = c.pipe([
        {"$fill": {"sortBy": {"t": 1}, "output": {"v": {"method": "linear"}}}},
        {"$sort": {"t": 1}},
    ]).all()
    assert [r["v"] for r in out] == [0.0, 3.0, 6.0, 9.0, None]  # trailing stays


def test_fill_partitioned_locf(engine, spark):
    db = engine.db("appdb")
    c = db.collection("f3")
    c._rewrite(spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("b", 1, None), ("b", 2, 2.0)],
        "g string, t int, v double"))
    out = c.pipe([
        {"$fill": {"partitionBy": "$g", "sortBy": {"t": 1},
                   "output": {"v": {"method": "locf"}}}},
        {"$sort": {"g": 1, "t": 1}},
    ]).all()
    assert [r["v"] for r in out] == [1.0, 1.0, None, 2.0]


# --- partition-level copy-on-write ------------------------------------

def _inode_map(coll):
    import os
    path = coll.current_path()
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                p = os.path.join(root, f)
                rel = os.path.relpath(p, path)
                out[rel] = os.stat(p).st_ino
    return out


def test_cow_update_rewrites_only_matching_partition(engine, spark):
    coll = engine.db("appdb").collection("parted")
    coll.set_partitioning("part")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "_id int, part int, v string"
    )
    coll._rewrite(df)
    before = _inode_map(coll)
    assert len({k.split("/")[0] for k in before}) == 3  # three hive dirs
    coll.update_all({"part": 1}, {"$set": {"v": "updated"}})
    after = _inode_map(coll)
    # files of part=0 and part=2 are hard links to the SAME inodes
    for rel, ino in before.items():
        if rel.startswith(("part=0", "part=2")):
            assert after[rel] == ino, f"{rel} was rewritten"
    # part=1 files are new
    assert all(
        after[rel] != ino for rel, ino in before.items() if rel.startswith("part=1")
        if rel in after
    ) or not any(rel in after for rel in before if rel.startswith("part=1"))
    # content correct
    rows = coll.find({}).all()
    assert sorted(r["v"] for r in rows if r["part"] == 1) == ["updated"] * 10
    assert sorted(r["_id"] for r in rows) == list(range(30))


def test_cow_remove_and_noop(engine, spark):
    coll = engine.db("appdb").collection("parted2")
    coll.set_partitioning("part")
    coll._rewrite(spark.createDataFrame(
        [(i, i % 2, i * 1.0) for i in range(20)], "_id int, part int, x double"))
    before = _inode_map(coll)
    # remove_all with zero matches: version must not even change
    path_before = coll.current_path()
    info = coll.remove_all({"_id": {"$gt": 1000}})
    assert info.removed == 0 and coll.current_path() == path_before
    info = coll.remove_all({"_id": {"$lt": 4}, "part": 0})
    assert info.removed == 2
    after = _inode_map(coll)
    for rel, ino in before.items():
        if rel.startswith("part=1"):
            assert after[rel] == ino
    assert coll.count() == 18


def test_cow_partial_rewrite_on_unmanaged_hive_layout(engine, spark):
    # hive-partitioned dataset created OUTSIDE the engine (no
    # set_partitioning metadata): partition keys must be reconstructed
    # from key=value path segments so a one-partition update rewrites
    # one partition instead of falling back to a full rewrite
    import os
    coll = engine.db("appdb").collection("exthive")
    store = coll._store_dir
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "_id int, part int, v string")
    df.write.partitionBy("part").parquet(os.path.join(store, "v1"))
    with open(os.path.join(store, "_CURRENT"), "w") as fh:
        fh.write("v1")
    before = _inode_map(coll)
    assert len({k.split("/")[0] for k in before}) == 3  # three hive dirs
    coll.update_all({"part": 1}, {"$set": {"v": "updated"}})
    after = _inode_map(coll)
    for rel, ino in before.items():
        if rel.startswith(("part=0", "part=2")):
            assert after[rel] == ino, f"{rel} was rewritten"
    assert any(rel.startswith("part=1") for rel in after)
    rows = {r["_id"]: (r["part"], r["v"]) for r in coll.find().all()}
    assert rows[1] == (1, "updated") and rows[4] == (1, "updated")
    assert rows[0] == (0, "v0") and rows[2] == (2, "v2")
    assert coll.count() == 30
    # appends keep the hive layout partial too: every existing file
    # survives as a hard link
    before2 = _inode_map(coll)
    coll.insert({"_id": 100, "part": 1, "v": "new"})
    after2 = _inode_map(coll)
    for rel, ino in before2.items():
        assert after2.get(rel) == ino, f"existing file {rel} was rewritten on insert"
    assert coll.count() == 31
    assert coll.find_id(100).one()["part"] == 1


def test_cow_append_links_all_existing(engine, spark):
    coll = engine.db("appdb").collection("appendy")
    coll._rewrite(spark.createDataFrame([(1, "a"), (2, "b")], "_id int, v string"))
    before = _inode_map(coll)
    coll.insert({"_id": 3, "v": "c"})
    after = _inode_map(coll)
    for rel, ino in before.items():
        assert after.get(rel) == ino, f"existing file {rel} was rewritten on insert"
    assert len(after) > len(before)
    assert sorted(r["_id"] for r in coll.find({}).all()) == [1, 2, 3]


def test_cow_update_one_survives_version_chain(engine, spark):
    coll = engine.db("appdb").collection("chain")
    coll._rewrite(spark.createDataFrame([(i, 0) for i in range(5)], "_id int, n int"))
    for k in range(3):
        coll.update_all({}, {"$inc": {"n": 1}})
    assert [r["n"] for r in coll.find({}).all()] == [3] * 5


# --- $lookup pipeline-form generalizations ----------------------------

def test_lookup_pipeline_nonleading_expr(engine):
    # uncorrelated prefix $match runs on the foreign side first; the
    # $expr $match in second position still provides the join keys
    out = engine.db("tpch").collection("orders").pipe([
        {"$match": {"o_orderkey": {"$lte": 100}}},
        {"$lookup": {
            "from": "lineitem",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"l_quantity": {"$gte": 30.0}}},
                {"$match": {"$expr": {"$eq": ["$$ok", "$l_orderkey"]}}},
                {"$project": {"l_linenumber": 1, "l_quantity": 1, "l_orderkey": 1}},
            ],
            "as": "items",
        }},
        {"$unwind": "$items"},
    ]).all()
    assert len(out) > 0
    for r in out:
        assert r["items"]["l_orderkey"] == r["o_orderkey"]
        assert r["items"]["l_quantity"] >= 30.0


def test_lookup_pipeline_uncorrelated(engine):
    # no $expr / no let: sub-pipeline result attached to every row
    out = engine.db("tpch").collection("nation").pipe([
        {"$match": {"n_nationkey": {"$lt": 3}}},
        {"$lookup": {
            "from": "region",
            "pipeline": [{"$match": {"r_regionkey": {"$lt": 2}}},
                         {"$project": {"r_regionkey": 1}}],
            "as": "regions",
        }},
    ]).all()
    assert len(out) == 3
    for r in out:
        assert sorted(x["r_regionkey"] for x in r["regions"]) == [0, 1]


def test_lookup_pipeline_uncorrelated_unwind_fused(engine):
    out = engine.db("tpch").collection("nation").pipe([
        {"$match": {"n_nationkey": {"$lt": 2}}},
        {"$lookup": {
            "from": "region",
            "pipeline": [{"$match": {"r_regionkey": {"$lt": 2}}},
                         {"$project": {"r_regionkey": 1}}],
            "as": "reg",
        }},
        {"$unwind": "$reg"},
    ]).all()
    assert len(out) == 4  # 2 nations x 2 regions


def test_graphlookup_restrict_search(engine, spark):
    db = engine.db("appdb")
    edges = db.collection("edges")
    edges._rewrite(spark.createDataFrame(
        [(1, 2, "ok"), (2, 3, "ok"), (3, 4, "blocked")],
        "src int, dst int, status string"))
    start = db.collection("start")
    start._rewrite(spark.createDataFrame([(1,)], "node int"))
    out = start.pipe([
        {"$graphLookup": {
            "from": "edges",
            "startWith": "$node",
            "connectFromField": "dst",
            "connectToField": "src",
            "as": "reach",
            "restrictSearchWithMatch": {"status": "ok"},
        }},
    ]).all()
    assert sorted(e["dst"] for e in out[0]["reach"]) == [2, 3]  # blocked edge pruned


# --- additional $setWindowFields operators ----------------------------

def test_window_locf_linearfill(engine, spark):
    db = engine.db("appdb")
    c = db.collection("wfill")
    c._rewrite(spark.createDataFrame(
        [(0, 0.0), (1, None), (2, None), (3, 9.0), (4, None)],
        "t int, v double"))
    out = c.pipe([
        {"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {
                "v_locf": {"$locf": "$v"},
                "v_lin": {"$linearFill": "$v"},
            },
        }},
        {"$sort": {"t": 1}},
    ]).all()
    assert [r["v_locf"] for r in out] == [0.0, 0.0, 0.0, 9.0, 9.0]
    assert [r["v_lin"] for r in out] == [0.0, 3.0, 6.0, 9.0, None]


def test_window_push_stddev(doc_collection):
    out = doc_collection.pipe([
        {"$match": {"priority": {"$ne": None}}},
        {"$setWindowFields": {
            "sortBy": {"priority": 1},
            "output": {
                "all_ids": {"$push": "$_id"},
                "sd": {"$stdDevPop": "$priority"},
            },
        }},
    ]).all()
    assert all(len(r["all_ids"]) == 5 for r in out)  # whole-partition default
    assert all(abs(r["sd"] - out[0]["sd"]) < 1e-9 for r in out)


def test_window_derivative_integral(engine, spark):
    db = engine.db("appdb")
    c = db.collection("wphys")
    # position = t^2 → derivative over trailing pairs; integral of v=2t
    c._rewrite(spark.createDataFrame(
        [(float(t), float(t * t)) for t in range(5)], "t double, x double"))
    out = c.pipe([
        {"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {
                "vel": {"$derivative": {"input": "$x"},
                        "window": {"documents": [-1, 0]}},
                "area": {"$integral": {"input": "$x"}},
            },
        }},
        {"$sort": {"t": 1}},
    ]).all()
    # derivative between consecutive points of x=t^2 is 2t-1
    assert [r["vel"] for r in out] == [None, 1.0, 3.0, 5.0, 7.0]
    # whole-partition trapezoid integral of t^2 on [0,4] ≈ 22 (exact: 21.33)
    assert all(abs(r["area"] - 22.0) < 1e-9 for r in out)


def test_window_integral_time_unit(engine, spark):
    import datetime
    db = engine.db("appdb")
    c = db.collection("wtime")
    d = datetime.datetime
    # 60 units sustained for 1 hour = 60 unit-hours
    c._rewrite(spark.createDataFrame(
        [(d(2026, 1, 1, 0), 60.0), (d(2026, 1, 1, 1), 60.0)], "ts timestamp, v double"))
    out = c.pipe([
        {"$setWindowFields": {
            "sortBy": {"ts": 1},
            "output": {"total": {"$integral": {"input": "$v", "unit": "hour"}}},
        }},
    ]).all()
    assert all(r["total"] == 60.0 for r in out)


def test_exp_moving_avg(engine, spark):
    db = engine.db("appdb")
    c = db.collection("wema")
    c._rewrite(spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
         ("b", 1, 100.0), ("b", 2, 0.0)],
        "g string, t int, v double"))
    out = c.pipe([
        {"$setWindowFields": {
            "partitionBy": "$g",
            "sortBy": {"t": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$v", "alpha": 0.5}}},
        }},
        {"$sort": {"g": 1, "t": 1}},
    ]).all()
    got = [(r["g"], r["t"], r["ema"]) for r in out]
    # E_t = 0.5 x_t + 0.5 E_{t-1}: a → 10, 15, 22.5; b → 100, 50
    assert got == [("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 22.5),
                   ("b", 1, 100.0), ("b", 2, 50.0)]


def test_exp_moving_avg_n_form(doc_collection):
    out = doc_collection.pipe([
        {"$match": {"priority": {"$ne": None}}},
        {"$setWindowFields": {
            "sortBy": {"priority": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$priority", "N": 3}}},
        }},
        {"$sort": {"priority": 1}},
    ]).all()
    # alpha = 2/(3+1) = 0.5 over priorities -1, 5, 10, 42, 99
    vals = [r["ema"] for r in out]
    assert vals[0] == -1.0
    assert vals[1] == 2.0      # 0.5*5 + 0.5*(-1)
    assert abs(vals[2] - 6.0) < 1e-9


def test_exp_moving_avg_unpartitioned_chunked(engine, spark):
    # without partitionBy the chunk-carry formulation runs (round 5 —
    # the r4 one-sequential-task warning shape is gone); values must
    # equal the plain sequential recurrence
    db = engine.db("appdb")
    c = db.collection("wema2")
    c._rewrite(spark.createDataFrame(
        [(i, float(i % 7)) for i in range(1, 101)], "t int, v double"))
    out = c.pipe([
        {"$setWindowFields": {
            "sortBy": {"t": 1},
            "output": {"ema": {"$expMovingAvg": {"input": "$v", "alpha": 0.5}}},
        }},
        {"$sort": {"t": 1}},
    ]).all()
    e = None
    for r in out:
        x = float(r["t"] % 7)  # v of row t is t % 7
        e = x if e is None else 0.5 * x + 0.5 * e
        assert r["ema"] == pytest.approx(e, rel=1e-12)


def test_distinct_df_distributed(doc_collection):
    # DataFrame-returning variant: lazy, no driver materialization;
    # list form delegates to it (bounded-cardinality documented)
    ddf = doc_collection.distinct_df("status")
    assert set(ddf.columns) == {"v"}
    got = sorted(r["v"] for r in ddf.collect())
    assert got == doc_collection.distinct("status")
    plan = ddf._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan  # distinct compiles to hash agg, not collect


def test_backup_progress_logging(engine, spark, tmp_path, caplog):
    import logging

    from anser_spark.sources.backup import BackupOptions, backup_collection

    db = engine.db("appdb")
    c = db.collection("bigback")
    c._rewrite(spark.range(0, 2500).selectExpr("id as _id", "id * 2 as v").coalesce(1))
    with caplog.at_level(logging.INFO, logger="anser_spark.backup"):
        backup_collection(c, BackupOptions(target_dir=str(tmp_path / "bk"), enable_logging=True))
    msgs = [r.getMessage() for r in caplog.records]
    assert any("backup started" in m and "count=2500" in m for m in msgs)
    assert any("backup progress" in m for m in msgs)
    assert any("backup finished" in m and "dur_secs=" in m for m in msgs)
    # without the flag: silent (backup.go grip.InfoWhen parity)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="anser_spark.backup"):
        backup_collection(c, BackupOptions(target_dir=str(tmp_path / "bk2")))
    assert not caplog.records


# --- multimodal plumbing ----------------------------------------------

def test_chunk_audio_grid(engine, spark):
    from anser_spark.operators.multimodal import chunk_audio
    df = spark.createDataFrame([("a", 70_000), ("b", 10_000)], "media_id string, duration_ms long")
    out = chunk_audio(df, chunk_ms=30_000, overlap_ms=5_000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append((r["chunk_idx"], r["chunk_start_ms"], r["chunk_end_ms"]))
    # stride 25s over 70s: starts 0, 25k, 50k; ends capped at duration
    assert sorted(by_id["a"]) == [(0, 0, 30_000), (1, 25_000, 55_000), (2, 50_000, 70_000)]
    assert sorted(by_id["b"]) == [(0, 0, 10_000)]


def test_resize_images_stub_deterministic(engine, spark):
    from anser_spark.operators.multimodal import resize_images
    import pytest as _pytest
    df = spark.createDataFrame([("x", b"imagebytes")], "media_id string, payload binary")
    a = resize_images(df, 64, 64).collect()[0]
    b = resize_images(df, 64, 64).collect()[0]
    assert a["payload"] == b["payload"] and len(a["payload"]) == 32
    assert (a["width"], a["height"]) == (64, 64)
    c = resize_images(df, 32, 32).collect()[0]
    assert c["payload"] != a["payload"]  # target size feeds the fake digest
    with _pytest.raises(NotImplementedError):
        resize_images(df, 64, 64, strict=True)


# --- $redact ----------------------------------------------------------

def _redact_coll(engine, spark):
    c = engine.db("appdb").collection("redact_docs")
    c._rewrite(spark.createDataFrame(
        [
            (1, "public", 10.0,
             ("public", 1.0, [("public", "s1"), ("secret", "s2")]),
             [("public", "n1"), ("secret", "n2")]),
            (2, "secret", 20.0,
             ("public", 2.0, [("public", "s3")]),
             [("public", "n3")]),
            (3, "public", 30.0,
             ("secret", 3.0, [("public", "s4")]),
             []),
        ],
        "doc_id int, level string, score double, "
        "sub struct<level:string, val:double, "
        "items:array<struct<level:string, name:string>>>, "
        "notes array<struct<level:string, name:string>>"))
    return c


def test_redact_prune_descend(engine, spark):
    c = _redact_coll(engine, spark)
    out = {r["doc_id"]: r for r in c.pipe([
        {"$redact": {"$cond": [{"$eq": ["$level", "secret"]},
                               "$$PRUNE", "$$DESCEND"]}},
    ]).all()}
    # root: doc 2 pruned entirely
    assert sorted(out) == [1, 3]
    # doc 1: sub kept (public) but sub.items loses the secret element;
    # notes loses its secret element
    assert out[1]["sub"]["val"] == 1.0
    assert [i["name"] for i in out[1]["sub"]["items"]] == ["s1"]
    assert [n["name"] for n in out[1]["notes"]] == ["n1"]
    # doc 3: secret sub pruned to null, empty notes stay empty
    assert out[3]["sub"] is None
    assert out[3]["notes"] == []


def test_redact_keep_stops_descent(engine, spark):
    c = _redact_coll(engine, spark)
    out = {r["doc_id"]: r for r in c.pipe([
        {"$redact": {"$cond": [{"$eq": ["$level", "public"]},
                               "$$KEEP", "$$PRUNE"]}},
    ]).all()}
    # KEEP at root stops evaluation: doc 1 keeps its secret descendants
    assert sorted(out) == [1, 3]
    assert [i["name"] for i in out[1]["sub"]["items"]] == ["s1", "s2"]
    assert [n["name"] for n in out[1]["notes"]] == ["n1", "n2"]
    assert out[3]["sub"]["val"] == 3.0  # untouched under KEEP


def test_redact_invalid_return_errors(engine, spark):
    from py4j.protocol import Py4JJavaError
    import pytest as _pytest
    c = _redact_coll(engine, spark)
    with _pytest.raises(Exception) as ei:
        c.pipe([{"$redact": "$level"}]).all()
    assert "DESCEND" in str(ei.value)


# --- bulk copy-on-write + schema-change guard -------------------------

def test_bulk_cow_rewrites_only_hit_partitions(engine, spark):
    coll = engine.db("appdb").collection("bulk_parted")
    coll.set_partitioning("part")
    coll._rewrite(spark.createDataFrame(
        [(i, i % 4, i * 1.0) for i in range(40)], "_id int, part int, x double"))
    before = _inode_map(coll)
    res = (coll.bulk()
           .update_all({"part": 1}, {"$inc": {"x": 100.0}})
           .remove_all({"part": 2, "_id": {"$lt": 10}})
           .run())
    assert res.matched == 10 + 2  # 10 rows in part=1; part=2 & _id<10 → ids 2, 6
    after = _inode_map(coll)
    for rel, ino in before.items():
        if rel.startswith(("part=0", "part=3")):
            assert after[rel] == ino, f"{rel} rewritten by bulk"
    rows = {r["_id"]: r for r in coll.find({}).all()}
    assert rows[1]["x"] == 101.0 and rows[5]["x"] == 105.0
    assert 2 not in rows and 6 not in rows and 10 in rows


def test_bulk_cow_upsert_no_match_appends(engine, spark):
    coll = engine.db("appdb").collection("bulk_nomatch")
    coll._rewrite(spark.createDataFrame([(1, "a")], "_id int, v string"))
    before = _inode_map(coll)
    res = (coll.bulk()
           .upsert({"_id": 99}, {"$set": {"v": "new"}})
           .update({"_id": -5}, {"$set": {"v": "never"}})
           .run())
    assert res.matched == 0 and res.modified == 0
    after = _inode_map(coll)
    for rel, ino in before.items():
        assert after.get(rel) == ino, "no-match bulk rewrote existing files"
    rows = {r["_id"]: r["v"] for r in coll.find({}).all()}
    assert rows == {1: "a", 99: "new"}


def test_bulk_insert_only_appends(engine, spark):
    coll = engine.db("appdb").collection("bulk_insonly")
    coll._rewrite(spark.createDataFrame([(1, "a")], "_id int, v string"))
    before = _inode_map(coll)
    coll.bulk().insert({"_id": 2, "v": "b"}, {"_id": 3, "v": "c"}).run()
    after = _inode_map(coll)
    for rel, ino in before.items():
        assert after.get(rel) == ino
    assert coll.count() == 3


def test_cow_schema_adding_update_falls_back_to_full_rewrite(engine, spark):
    # regression: a one-victim update ADDING a column used to rewrite
    # only the victim's file — the plain reader then silently dropped
    # the new column (mixed-schema dataset)
    coll = engine.db("appdb").collection("schema_add")
    coll._rewrite(spark.range(0, 100).selectExpr("id as _id", "id % 10 as grp").repartition(4))
    assert len(_inode_map(coll)) > 1
    coll.update({"_id": 7}, {"$set": {"newfield": "hello"}})
    rows = {r["_id"]: r for r in coll.find({}).all()}
    assert rows[7]["newfield"] == "hello"
    assert rows[8]["newfield"] is None
    assert len(rows) == 100


def test_bulk_sequential_visibility_across_cow(engine, spark):
    # op 2 matches rows op 1 modified — the chain must see them even
    # though file detection used pre-bulk state
    coll = engine.db("appdb").collection("bulk_seq")
    coll._rewrite(spark.createDataFrame(
        [(i, "init") for i in range(6)], "_id int, v string"))
    res = (coll.bulk()
           .update_all({"_id": {"$lt": 3}}, {"$set": {"v": "stage1"}})
           .update_all({"v": "stage1"}, {"$set": {"v": "stage2"}})
           .run())
    assert res.matched == 6  # 3 + 3
    rows = {r["_id"]: r["v"] for r in coll.find({}).all()}
    assert rows == {0: "stage2", 1: "stage2", 2: "stage2", 3: "init", 4: "init", 5: "init"}


# --- $merge whenMatched pipeline, concise $lookup, $documents ---------

def test_merge_when_matched_pipeline(engine, spark):
    db = engine.db("appdb")
    tgt = db.collection("merge_tgt")
    tgt._rewrite(spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1)], "_id int, total double, n int"))
    src = db.collection("merge_src")
    src._rewrite(spark.createDataFrame(
        [(1, 5.0), (3, 7.0)], "_id int, total double"))
    src.pipe([
        {"$merge": {
            "into": "merge_tgt",
            "on": "_id",
            "whenMatched": [
                {"$set": {
                    "total": {"$add": ["$total", "$$new.total"]},
                    "n": {"$add": ["$n", 1]},
                }},
            ],
            "whenNotMatched": "insert",
        }},
    ]).all()
    rows = {r["_id"]: r for r in tgt.find({}).all()}
    assert rows[1]["total"] == 15.0 and rows[1]["n"] == 2  # merged
    assert rows[2]["total"] == 20.0 and rows[2]["n"] == 1  # untouched
    assert rows[3]["total"] == 7.0                          # inserted


def test_merge_let_variables(engine, spark):
    # $merge let: variables over the INCOMING doc, usable as $$var in
    # the whenMatched pipeline (default let = {new: $$ROOT})
    db = engine.db("appdb")
    tgt = db.collection("merge_let_tgt")
    tgt._rewrite(spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "_id int, total double"))
    src = db.collection("merge_let_src")
    src._rewrite(spark.createDataFrame(
        [(1, 5.0, 2.0), (3, 7.0, 1.0)], "_id int, total double, weight double"))
    src.pipe([
        {"$merge": {
            "into": "merge_let_tgt",
            "on": "_id",
            "let": {"inc": {"$multiply": ["$total", "$weight"]},
                    "w": "$weight"},
            "whenMatched": [
                {"$set": {"total": {"$add": ["$total", "$$inc"]},
                          "last_w": "$$w"}},
            ],
            "whenNotMatched": "insert",
        }},
    ]).all()
    rows = {r["_id"]: r for r in tgt.find({}).all()}
    assert rows[1]["total"] == 20.0       # 10 + 5*2 — let exprs see the incoming doc
    assert rows[1]["last_w"] == 2.0
    assert rows[2]["total"] == 20.0 and rows[2]["last_w"] is None
    assert rows[3]["total"] == 7.0        # inserted unchanged
    # explicit let replaces the default: $$new must no longer resolve
    import pytest as _pytest
    with _pytest.raises(Exception):
        src.pipe([
            {"$merge": {
                "into": "merge_let_tgt", "on": "_id",
                "let": {"w": "$weight"},
                "whenMatched": [{"$set": {"total": "$$new.total"}}],
            }},
        ]).all()


def test_lookup_concise_with_pipeline(engine):
    orders = engine.db("tpch").collection("orders")
    out = orders.pipe([
        {"$match": {"o_orderkey": {"$lte": 20}}},
        {"$lookup": {
            "from": "customer",
            "localField": "o_custkey",
            "foreignField": "c_custkey",
            "pipeline": [{"$project": {"c_name": 1, "c_custkey": 1}}],
            "as": "cust",
        }},
        {"$unwind": "$cust"},
    ]).all()
    assert len(out) > 0
    for r in out:
        assert r["cust"]["c_custkey"] == r["o_custkey"]
        assert r["cust"]["c_name"].startswith("Customer")


def test_documents_stage(engine):
    c = engine.db("tpch").collection("orders")
    out = c.pipe([
        {"$documents": [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]},
        {"$match": {"x": {"$gte": 2}}},
    ]).all()
    assert out == [{"x": 2, "y": "b"}]


# --- $geoNear / $geoWithin --------------------------------------------

def _geo_coll(engine, spark):
    c = engine.db("appdb").collection("places")
    c._rewrite(spark.createDataFrame(
        [("origin", [0.0, 0.0], "a"),
         ("one_deg_east", [1.0, 0.0], "a"),
         ("one_deg_north", [0.0, 1.0], "b"),
         ("far", [90.0, 45.0], "a")],
        "name string, location array<double>, tag string"))
    return c


def test_geo_near_sorted_distances(engine, spark):
    c = _geo_coll(engine, spark)
    out = c.pipe([
        {"$geoNear": {
            "near": {"type": "Point", "coordinates": [0.0, 0.0]},
            "distanceField": "dist",
            "key": "location",
        }},
    ]).all()
    names = [r["name"] for r in out]
    assert names[0] == "origin" and names[-1] == "far"
    assert out[0]["dist"] == 0.0
    # 1 degree of arc ≈ 111.19 km on the 6371 km sphere
    assert abs(out[1]["dist"] - 111_195) < 200
    assert abs(out[2]["dist"] - 111_195) < 200


def test_geo_near_query_max_distance_multiplier(engine, spark):
    c = _geo_coll(engine, spark)
    out = c.pipe([
        {"$geoNear": {
            "near": [0.0, 0.0],
            "distanceField": "dist_km",
            "distanceMultiplier": 0.001,
            "maxDistance": 200_000,
            "query": {"tag": "a"},
        }},
    ]).all()
    # far (tag a) filtered by distance; one_deg_north filtered by query
    assert [r["name"] for r in out] == ["origin", "one_deg_east"]
    assert abs(out[1]["dist_km"] - 111.195) < 0.2


def test_geo_within_center_sphere(engine, spark):
    import math
    c = _geo_coll(engine, spark)
    # radius 2 degrees in radians around the origin
    r = math.radians(2.0)
    out = c.find({"location": {"$geoWithin": {"$centerSphere": [[0.0, 0.0], r]}}}).all()
    assert sorted(x["name"] for x in out) == ["one_deg_east", "one_deg_north", "origin"]


def test_geo_within_box_and_polygon(engine, spark):
    c = _geo_coll(engine, spark)
    # $box: flat rectangle, corners in any order, boundary inclusive
    out = c.find({"location": {"$geoWithin": {"$box": [[1.5, 1.5], [-0.5, -0.5]]}}}).all()
    assert sorted(x["name"] for x in out) == ["one_deg_east", "one_deg_north", "origin"]
    out = c.find({"location": {"$geoWithin": {"$box": [[0.5, -0.5], [1.5, 0.5]]}}}).all()
    assert [x["name"] for x in out] == ["one_deg_east"]
    # $polygon: triangle covering the origin and (1, 0) but not (0, 1)
    tri = [[-1.0, -1.0], [3.0, -1.0], [1.0, 2.0]]
    out = c.find({"location": {"$geoWithin": {"$polygon": tri}}}).all()
    assert sorted(x["name"] for x in out) == ["one_deg_east", "origin"]
    # concave polygon (arrow shape): the notch excludes the origin
    arrow = [[-2.0, -1.0], [2.0, -1.0], [2.0, 1.0], [0.0, -0.5], [-2.0, 1.0]]
    out = c.find({"location": {"$geoWithin": {"$polygon": arrow}}}).all()
    names = {x["name"] for x in out}
    assert "origin" not in names
    import pytest as _pytest
    from anser_spark.functions.filters import FilterCompileError
    with _pytest.raises(FilterCompileError):
        c.find({"location": {"$geoWithin": {"$nope": 1}}}).all()
    with _pytest.raises(FilterCompileError):
        c.find({"location": {"$geoWithin": {"$polygon": [[0, 0], [1, 1]]}}}).all()


# --- json/csv sources, dotted $unset, compound $merge on --------------

def test_json_and_csv_sources(engine, spark, tmp_path):
    import json as _json
    srcdir = tmp_path / "srcs"
    srcdir.mkdir()
    with open(srcdir / "people.jsonl", "w") as fh:
        for d in [{"_id": 1, "name": "ann", "age": 31},
                  {"_id": 2, "name": "bob", "age": 25}]:
            fh.write(_json.dumps(d) + "\n")
    with open(srcdir / "pets.csv", "w") as fh:
        fh.write("pet_id,kind\n1,cat\n2,dog\n")
    db = engine.mount("filedb", str(srcdir)) if hasattr(engine, "mount") else None
    db = engine.db("filedb")
    engine.sources["filedb"] = str(srcdir)
    assert sorted(db.collection_names()) == ["people", "pets"]
    rows = db.collection("people").find({"age": {"$gt": 30}}).all()
    assert [r["name"] for r in rows] == ["ann"]
    assert db.collection("pets").count() == 2
    # first mutation materializes a parquet version; source untouched
    db.collection("people").update_all({}, {"$inc": {"age": 1}})
    assert {r["age"] for r in db.collection("people").find({}).all()} == {32, 26}
    assert (srcdir / "people.jsonl").exists()


def test_unset_dotted_path(doc_collection):
    out = {r["_id"]: r for r in doc_collection.pipe([
        {"$unset": ["meta.attempt", "version"]},
    ]).all()}
    assert "attempt" not in out["a1"]["meta"]
    assert out["a1"]["meta"]["owner"] == "alice"
    assert "version" not in out["a1"]


def test_merge_compound_on(engine, spark):
    db = engine.db("appdb")
    tgt = db.collection("cmp_tgt")
    tgt._rewrite(spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0)], "g string, k int, v double"))
    src = db.collection("cmp_src")
    src._rewrite(spark.createDataFrame(
        [("a", 1, 99.0), ("b", 1, 7.0)], "g string, k int, v double"))
    src.pipe([
        {"$merge": {"into": "cmp_tgt", "on": ["g", "k"],
                    "whenMatched": "replace", "whenNotMatched": "insert"}},
    ]).all()
    rows = {(r["g"], r["k"]): r["v"] for r in tgt.find({}).all()}
    assert rows == {("a", 1): 99.0, ("a", 2): 20.0, ("b", 1): 7.0}
