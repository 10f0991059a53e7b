"""Extended pipeline stages: $setWindowFields, $bucket, $bucketAuto,
$facet, distinct, run_command, new expression operators."""

import datetime

import pytest

from anser_spark.plans.pipeline import PipelineCompileError


def run(coll, pipeline):
    return coll.pipe(pipeline).all()


def test_set_window_fields_rank(doc_collection):
    out = run(
        doc_collection,
        [
            {"$setWindowFields": {
                "partitionBy": "$activated",
                "sortBy": {"priority": -1},
                "output": {"rnk": {"$rank": {}}, "rn": {"$documentNumber": {}}},
            }},
            {"$match": {"rn": 1}},
            {"$project": {"_id": 1, "activated": 1, "priority": 1}},
            {"$sort": {"_id": 1}},
        ],
    )
    # top-priority doc per activation group: a4 (99, False), a6 (42, True)
    assert [(r["_id"], r["activated"]) for r in out] == [("a4", False), ("a6", True)]


def test_set_window_fields_running_sum(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"priority": {"$exists": True}}},
            {"$setWindowFields": {
                "sortBy": {"priority": 1},
                "output": {"running": {"$sum": "$priority", "window": {"documents": ["unbounded", "current"]}}},
            }},
            {"$sort": {"priority": 1}},
            {"$project": {"_id": 0, "priority": 1, "running": 1}},
        ],
    )
    assert [r["running"] for r in out] == [-1, 4, 14, 56, 155]


def test_set_window_fields_shift(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"priority": {"$exists": True}}},
            {"$setWindowFields": {
                "sortBy": {"priority": 1},
                "output": {"prev": {"$shift": {"output": "$priority", "by": -1}}},
            }},
            {"$sort": {"priority": 1}},
            {"$project": {"_id": 0, "priority": 1, "prev": 1}},
        ],
    )
    assert [r["prev"] for r in out] == [None, -1, 5, 10, 42]


def test_bucket(engine):
    out = (
        engine.db("tpch")
        .collection("orders")
        .pipe(
            [
                {"$bucket": {
                    "groupBy": "$o_totalprice",
                    "boundaries": [0, 100000, 200000, 300000],
                    "default": -1,
                    "output": {"n": {"$sum": 1}},
                }},
            ]
        )
        .all()
    )
    assert [r["_id"] for r in out] == [-1, 0, 100000, 200000]
    assert sum(r["n"] for r in out) == 1500


def test_bucket_auto(engine):
    out = (
        engine.db("tpch")
        .collection("customer")
        .pipe([{"$bucketAuto": {"groupBy": "$c_acctbal", "buckets": 4}}])
        .all()
    )
    assert len(out) == 4
    assert sum(r["count"] for r in out) == 150
    mins = [r["_id"]["min"] for r in out]
    assert mins == sorted(mins)


def test_facet(doc_collection):
    out = run(
        doc_collection,
        [
            {"$facet": {
                "by_status": [{"$sortByCount": "$status"}],
                "top": [{"$sort": {"priority": -1}}, {"$limit": 2}, {"$project": {"_id": 1}}],
            }},
        ],
    )
    assert len(out) == 1
    row = out[0]
    assert sum(b["count"] for b in row["by_status"]) == 6
    assert [d["_id"] for d in row["top"]] == ["a4", "a6"]


def test_distinct(doc_collection):
    assert doc_collection.distinct("status") == [
        "failed", "started", "success", "undispatched",
    ]
    assert doc_collection.distinct("status", {"activated": True}) == [
        "failed", "started", "success", "undispatched",
    ]
    # array field → distinct over elements
    assert doc_collection.distinct("tags") == ["blue", "green", "red", "yellow"]
    # dotted path
    assert doc_collection.distinct("meta.repo") == ["repo1", "repo2", "repo3"]


def test_run_command(engine):
    df = engine.run_command("SELECT count(*) AS n FROM lineitem WHERE l_quantity > 45.0")
    assert df.collect()[0]["n"] > 0


def test_date_expressions(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": {"$in": ["a1", "a3"]}}},
            {"$project": {
                "_id": 1,
                "d": {"$dateDiff": {"startDate": {"$literal": datetime.datetime(2026, 1, 1)},
                                     "endDate": "$time", "unit": "day"}},
                "plus2d": {"$dateAdd": {"startDate": "$time", "amount": 2, "unit": "day"}},
                "trunc": {"$dateTrunc": {"date": "$time", "unit": "day"}},
            }},
            {"$sort": {"_id": 1}},
        ],
    )
    assert out[0]["d"] == 0 and out[1]["d"] == 2
    assert out[0]["plus2d"] == datetime.datetime(2026, 1, 3, 12, 0)
    assert out[0]["trunc"] == datetime.datetime(2026, 1, 1, 0, 0)


def test_array_object_expressions(doc_collection):
    out = run(
        doc_collection,
        [
            {"$match": {"_id": "a1"}},
            {"$project": {
                "_id": 0,
                "idx": {"$indexOfArray": ["$tags", "blue"]},
                "missing": {"$indexOfArray": ["$tags", "nope"]},
                "zipped": {"$zip": {"inputs": ["$tags", "$scores"]}},
                "entries": {"$objectToArray": "$meta"},
            }},
        ],
    )
    row = out[0]
    assert row["idx"] == 1 and row["missing"] == -1
    assert len(row["zipped"]) == 2
    keys = {e["k"] for e in row["entries"]}
    assert keys == {"owner", "repo", "attempt"}


def test_merge_objects(spark):
    from anser_spark.functions.expressions import compile_expr

    df = spark.createDataFrame([(1,)], ["x"])
    merged = df.select(
        compile_expr(
            {"$mergeObjects": [{"a": "1", "b": "2"}, {"b": "3", "c": "4"}]}, df.schema
        ).alias("m")
    ).collect()[0]["m"]
    assert merged == {"a": "1", "b": "3", "c": "4"}  # later wins


def test_union_with(doc_collection, engine):
    other = engine.db("appdb").collection("more_docs")
    other._rewrite(doc_collection.find({"_id": {"$in": ["a1", "a2"]}}).to_df())
    out = run(
        doc_collection,
        [
            {"$unionWith": {"coll": "more_docs"}},
            {"$group": {"_id": None, "n": {"$sum": 1}}},
        ],
    )
    assert out[0]["n"] == 8  # 6 + 2
    # pipeline form filters the unioned side
    out = run(
        doc_collection,
        [
            {"$unionWith": {"coll": "more_docs", "pipeline": [{"$match": {"_id": "a1"}}]}},
            {"$count": "n"},
        ],
    )
    assert out[0]["n"] == 7


def test_merge_modes(doc_collection, engine):
    target = engine.db("appdb").collection("merge_target")
    doc_collection.pipe(
        [{"$match": {"activated": True}}, {"$project": {"_id": 1, "status": 1}}, {"$out": "merge_target"}]
    ).all()
    assert target.count() == 4
    # keepExisting: matched rows unchanged, new rows inserted
    doc_collection.pipe(
        [
            {"$project": {"_id": 1, "status": 1}},
            {"$addFields": {"status": "overwritten"}},
            {"$merge": {"into": "merge_target", "whenMatched": "keepExisting"}},
        ]
    ).all()
    assert target.count() == 6
    assert target.find({"status": "overwritten"}).count() == 2  # only the 2 new
    # replace: all rows overwritten
    doc_collection.pipe(
        [
            {"$project": {"_id": 1, "status": 1}},
            {"$addFields": {"status": "v2"}},
            {"$merge": {"into": "merge_target", "whenMatched": "replace"}},
        ]
    ).all()
    assert target.find({"status": "v2"}).count() == 6
    # merge mode: null incoming fields keep existing values
    doc_collection.pipe(
        [
            {"$match": {"_id": "a1"}},
            {"$project": {"_id": 1}},
            {"$addFields": {"extra": "added", "status": {"$literal": None}}},
            {"$merge": {"into": "merge_target", "whenMatched": "merge"}},
        ]
    ).all()
    row = target.find_id("a1").one()
    assert row["status"] == "v2" and row["extra"] == "added"
    # fail mode raises on match
    import pytest as _pytest

    with _pytest.raises(ValueError, match="whenMatched=fail"):
        doc_collection.pipe(
            [{"$project": {"_id": 1}}, {"$merge": {"into": "merge_target", "whenMatched": "fail"}}]
        ).all()


def test_redact_root_prune(docs_df):
    # $redact is implemented (test_round2.py covers nested levels);
    # root-level decisions behave like a filter
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(
        docs_df,
        [{"$redact": {"$cond": [
            {"$eq": ["$status", "failed"]}, "$$PRUNE", "$$KEEP"]}}],
    ).collect()
    assert sorted(r["_id"] for r in out) == ["a1", "a3", "a4", "a5"]


def test_aggregate_options_let_and_friends(engine):
    nation = engine.db("tpch").collection("nation")
    # let variables substitute as constants anywhere in the pipeline
    rows = nation.pipe(
        [
            {"$match": {"$expr": {"$lt": ["$n_regionkey", "$$maxr"]}}},
            {"$project": {"n_nationkey": 1,
                          "tag": {"$concat": ["$$prefix", "$n_name"]}}},
            {"$sort": {"n_nationkey": 1}},
            {"$limit": 3},
        ],
        let={"maxr": 2, "prefix": "N:"},
        allow_disk_use=True,
        comment="audit",
        collation={"locale": "simple"},
    ).all()
    assert len(rows) == 3
    assert all(r["tag"].startswith("N:") for r in rows)
    import pytest as _pytest

    # round 7: real locales work (ICU); inexpressible options raise
    got = nation.pipe(
        [{"$match": {"n_name": "nation_3"}}, {"$project": {"n_name": 1}}],
        collation={"locale": "en", "strength": 2},
    ).all()
    assert [r["n_name"] for r in got] == ["NATION_3"]
    with _pytest.raises(ValueError, match="unsupported collation"):
        nation.pipe([{"$limit": 1}], collation={"locale": "en", "backwards": True})
    with _pytest.raises(ValueError, match="dotted access"):
        nation.pipe(
            [{"$match": {"$expr": {"$eq": ["$n_name", "$$doc.name"]}}}],
            let={"doc": {"name": "x"}},
        ).all()
    # $literal strings containing $$ stay literal
    out = nation.pipe(
        [{"$project": {"s": {"$literal": "$$maxr"}}}, {"$limit": 1}],
        let={"maxr": 9},
    ).all()
    assert out[0]["s"] == "$$maxr"


def test_out_and_merge_cross_db(engine):
    nation = engine.db("tpch").collection("nation")
    nation.pipe([
        {"$match": {"n_regionkey": 1}},
        {"$project": {"n_nationkey": 1, "n_name": 1}},
        {"$out": {"db": "otherdb", "coll": "n1"}},
    ]).all()
    out = engine.db("otherdb").collection("n1")
    assert out.exists() and out.find({}).count() > 0
    assert not engine.db("tpch").collection("n1").exists()
    nation.pipe([
        {"$group": {"_id": "$n_regionkey", "n": {"$sum": 1}}},
        {"$merge": {"into": {"db": "otherdb", "coll": "sums"}}},
    ]).all()
    assert engine.db("otherdb").collection("sums").find({}).count() == 5


def test_bucket_auto_granularity(engine, spark):
    rows = [{"_id": i, "v": float(v)} for i, v in enumerate(
        [0.7, 1.1, 2.9, 3.4, 7.2, 12.0, 18.0, 31.0, 64.0, 99.0])]
    df = spark.createDataFrame(rows)
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(df, [
        {"$bucketAuto": {"groupBy": "$v", "buckets": 3,
                         "granularity": "R5"}},
    ], None, None).collect()
    # series edges only (R5 members x 10^k), buckets cover all docs
    r5 = {1.0, 1.6, 2.5, 4.0, 6.3}
    import math
    for r in out:
        for edge in (r["_id"]["min"], r["_id"]["max"]):
            mant = edge / (10 ** math.floor(math.log10(edge)))
            assert any(abs(mant - m) < 1e-9 for m in r5), edge
    assert sum(r["count"] for r in out) == 10
    # edges are increasing and the max value falls inside the last bucket
    edges = [(r["_id"]["min"], r["_id"]["max"]) for r in out]
    assert all(lo < hi for lo, hi in edges)
    assert edges == sorted(edges)
    assert edges[-1][1] > 99.0
    # POWERSOF2
    out2 = compile_pipeline(df, [
        {"$bucketAuto": {"groupBy": "$v", "buckets": 4,
                         "granularity": "POWERSOF2"}},
    ], None, None).collect()
    for r in out2:
        for edge in (r["_id"]["min"], r["_id"]["max"]):
            assert 2 ** round(math.log2(edge)) == edge, edge
    assert sum(r["count"] for r in out2) == 10
    import pytest as _pytest
    from anser_spark.plans.pipeline import PipelineCompileError

    with _pytest.raises(PipelineCompileError, match="granularity"):
        compile_pipeline(df, [
            {"$bucketAuto": {"groupBy": "$v", "buckets": 2,
                             "granularity": "E96"}},
        ], None, None).collect()


def test_collation_group_lookup_distinct(spark, tmp_path):
    # round 7: collation reaches $group keys, classic $lookup equality,
    # and the distinct command — Mongo collates all three
    from anser_spark.engine import Engine
    from anser_spark.functions.collation import use_collation
    from anser_spark.plans.pipeline import Aggregation, compile_pipeline

    df = spark.createDataFrame(
        [(1, "Apple", "X"), (2, "aPPLE", "x"), (3, "Banana", "y"), (4, "APPLE", "Y")],
        "_id long, name string, tag string",
    )
    agg = Aggregation(df, [{"$group": {"_id": "$name", "n": {"$sum": 1}}}], "en_CI")
    got = {r["_id"].lower(): r["n"] for r in agg.all()}
    assert got == {"apple": 3, "banana": 1}
    # compound key document collates each string sub-key
    agg2 = Aggregation(
        df,
        [{"$group": {"_id": {"a": "$name", "b": "$tag"}, "n": {"$sum": 1}}}],
        "en_CI",
    )
    got2 = sorted((r["_id"]["a"].lower(), r["_id"]["b"].lower(), r["n"]) for r in agg2.all())
    assert got2 == [("apple", "x", 2), ("apple", "y", 1), ("banana", "y", 1)]
    # binary default still splits case variants
    assert len(Aggregation(df, [{"$group": {"_id": "$name", "n": {"$sum": 1}}}], None).all()) == 4

    ldf = spark.createDataFrame([(1, "Apple"), (2, "pear")], "_id long, k string")
    fdf = spark.createDataFrame(
        [(10, "APPLE"), (11, "aPpLe"), (12, "Pear")], "fid long, fk string"
    )
    with use_collation("en_CI"):
        out = compile_pipeline(
            ldf,
            [{"$lookup": {"from": "f", "localField": "k", "foreignField": "fk", "as": "m"}}],
            lambda n: fdf, None,
        )
    assert {r["_id"]: sorted(m["fid"] for m in r["m"]) for r in out.collect()} == {
        1: [10, 11], 2: [12],
    }
    with use_collation("en_CI"):
        out2 = compile_pipeline(
            ldf,
            [
                {"$lookup": {"from": "f", "localField": "k", "foreignField": "fk", "as": "m"}},
                {"$unwind": "$m"},
            ],
            lambda n: fdf, None,
        )
    assert sorted((r["_id"], r["m"]["fid"]) for r in out2.collect()) == [
        (1, 10), (1, 11), (2, 12),
    ]

    eng = Engine(spark, workdir=str(tmp_path / "cw"))
    c = eng.db("d").collection("t")
    c.insert_many(
        [{"_id": i, "v": v} for i, v in enumerate(["Foo", "foo", "BAR", "bar", "baz"])]
    )
    ci = {"locale": "en", "strength": 2}
    assert sorted(x.lower() for x in c.distinct("v", collation=ci)) == ["bar", "baz", "foo"]
    assert len(c.distinct("v")) == 5
