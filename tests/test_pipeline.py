"""Aggregation pipeline compiler (SURVEY.md §2.5): stage folds + the
expression language, golden-checked on fixtures and testdata."""

import pytest

from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline


def run(coll, pipeline):
    return coll.pipe(pipeline).all()


def test_match_group_sum(doc_collection):
    # the production-observed corpus shape: [{$match},{$group:{_id,n:{$sum:1}}}]
    # (reference apm/otel_monitor_test.go:140-174)
    out = run(
        doc_collection,
        [
            {"$match": {"activated": True}},
            {"$group": {"_id": "$status", "n": {"$sum": 1}}},
            {"$sort": {"_id": 1}},
        ],
    )
    assert out == [
        {"_id": "failed", "n": 1},
        {"_id": "started", "n": 1},
        {"_id": "success", "n": 1},
        {"_id": "undispatched", "n": 1},
    ]


def test_group_accumulators(doc_collection):
    out = run(
        doc_collection,
        [
            {"$group": {
                "_id": None,
                "total": {"$sum": "$priority"},
                "avg": {"$avg": "$priority"},
                "lo": {"$min": "$priority"},
                "hi": {"$max": "$priority"},
                "n": {"$count": {}},
            }},
        ],
    )
    assert len(out) == 1
    row = out[0]
    assert row["total"] == 155 and row["lo"] == -1 and row["hi"] == 99 and row["n"] == 6
    assert abs(row["avg"] - 155 / 5) < 1e-9  # null priority excluded from avg


def test_group_compound_id(doc_collection):
    out = run(
        doc_collection,
        [
            {"$group": {"_id": {"act": "$activated", "st": "$status"}, "n": {"$sum": 1}}},
            {"$sort": {"n": -1}},
            {"$limit": 1},
        ],
    )
    assert out[0]["n"] == 1  # all groups singletons
    assert set(out[0]["_id"]) == {"act", "st"}


def test_group_push_addtoset(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"status": "failed"}},
            {"$group": {"_id": None, "ids": {"$push": "$_id"}, "acts": {"$addToSet": "$activated"}}},
        ],
    )
    assert sorted(out[0]["ids"]) == ["a2", "a6"]
    assert sorted(out[0]["acts"]) == [False, True]


def test_project_computed(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": "a1"}},
            {"$project": {"status": 1, "boosted": {"$add": ["$priority", 100]}}},
        ],
    )
    assert out == [{"_id": "a1", "status": "success", "boosted": 110}]


def test_addfields_cond_ifnull(doc_collection):
    out = run(
        doc_collection,
        [
            {"$addFields": {
                "pri": {"$ifNull": ["$priority", 0]},
                "flag": {"$cond": {"if": {"$gte": [{"$ifNull": ["$priority", 0]}, 10]}, "then": "hot", "else": "cold"}},
            }},
            {"$match": {"flag": "hot"}},
            {"$project": {"_id": 1}},
            {"$sort": {"_id": 1}},
        ],
    )
    assert [r["_id"] for r in out] == ["a1", "a4", "a6"]


def test_unwind(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": "a1"}},
            {"$unwind": "$tags"},
            {"$project": {"tags": 1, "_id": 0}},
        ],
    )
    assert sorted(r["tags"] for r in out) == ["blue", "red"]


def test_unwind_preserve_and_index(doc_collection):
    out = run(
        doc_collection,
        [
            {"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True, "includeArrayIndex": "i"}},
            {"$group": {"_id": None, "n": {"$sum": 1}}},
        ],
    )
    # 6 docs: a1:2 a2:1 a3:0(→1 null row) a4:2 a5:3 a6:1 = 10 rows
    assert out[0]["n"] == 10


def test_sort_skip_limit(doc_collection):
    out = run(
        doc_collection,
        [{"$sort": {"priority": -1}}, {"$skip": 1}, {"$limit": 2}, {"$project": {"_id": 1, "priority": 1}}],
    )
    assert [r["priority"] for r in out] == [42, 10]


def test_count_stage(doc_collection):
    out = run(doc_collection, [{"$match": {"activated": True}}, {"$count": "n"}])
    assert out == [{"n": 4}]


def test_sort_by_count(doc_collection):
    out = run(doc_collection, [{"$sortByCount": "$status"}])
    assert out[0]["count"] == 2  # success and failed both have 2; ties broken by _id
    assert out[0]["_id"] in ("failed", "success")


def test_replace_root(doc_collection):
    out = run(
        doc_collection,
        [{"$match": {"_id": "a1"}}, {"$replaceRoot": {"newRoot": "$meta"}}],
    )
    assert out == [{"owner": "alice", "repo": "repo1", "attempt": 1}]


def test_lookup(engine):
    orders = engine.db("tpch").collection("orders")
    out = (
        orders.pipe(
            [
                {"$match": {"o_orderkey": {"$lte": 8}}},
                {"$lookup": {
                    "from": "customer",
                    "localField": "o_custkey",
                    "foreignField": "c_custkey",
                    "as": "cust",
                }},
            ]
        ).all()
    )
    assert len(out) > 0
    for row in out:
        assert len(row["cust"]) == 1
        assert row["cust"][0]["c_custkey"] == row["o_custkey"]


def test_out_and_merge(doc_collection):
    doc_collection.pipe(
        [{"$match": {"activated": True}}, {"$project": {"_id": 1, "status": 1}}, {"$out": "active_docs"}]
    ).all()
    target = doc_collection.engine.db("appdb").collection("active_docs")
    assert target.count() == 4
    # $merge upserts by _id
    doc_collection.pipe(
        [{"$match": {"activated": False}}, {"$project": {"_id": 1, "status": 1}}, {"$merge": {"into": "active_docs"}}]
    ).all()
    assert target.count() == 6


def test_expression_ops(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": "a1"}},
            {"$project": {
                "_id": 0,
                "up": {"$toUpper": "$status"},
                "yr": {"$year": "$time"},
                "nscores": {"$size": "$scores"},
                "s2": {"$multiply": [{"$arrayElemAt": ["$scores", 0]}, 2]},
                "cat": {"$concat": ["$status", "-", "$meta.repo"]},
                "big": {"$filter": {"input": "$scores", "as": "s", "cond": {"$gt": ["$$s", 0.6]}}},
                "sumsc": {"$sum": "$scores"},
            }},
        ],
    )
    row = out[0]
    assert row["up"] == "SUCCESS"
    assert row["yr"] == 2026
    assert row["nscores"] == 2
    assert abs(row["s2"] - 1.0) < 1e-9
    assert row["cat"] == "success-repo1"
    assert row["big"] == [0.9]
    assert abs(row["sumsc"] - 1.4) < 1e-9


def test_switch_and_strings(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": {"$in": ["a1", "a3"]}}},
            {"$project": {
                "_id": 1,
                "bucket": {"$switch": {
                    "branches": [
                        {"case": {"$gte": ["$priority", 50]}, "then": "high"},
                        {"case": {"$gte": ["$priority", 0]}, "then": "mid"},
                    ],
                    "default": "none",
                }},
                "sub": {"$substrCP": ["$status", 0, 3]},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    assert out[0] == {"_id": "a1", "bucket": "mid", "sub": "suc"}
    assert out[1] == {"_id": "a3", "bucket": "none", "sub": "sta"}


def test_expr_in_match(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"$expr": {"$gt": [{"$size": "$tags"}, 2]}}},
            {"$project": {"_id": 1}},
        ],
    )
    assert [r["_id"] for r in out] == ["a5"]


def test_bad_stage_raises(docs_df):
    with pytest.raises(PipelineCompileError):
        compile_pipeline(docs_df, [{"$facetx": {}}])
    with pytest.raises(PipelineCompileError):
        compile_pipeline(docs_df, [{"$match": {}, "$sort": {}}])
