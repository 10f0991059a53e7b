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
