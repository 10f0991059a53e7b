"""Fluent read path: find/select/sort/limit/skip/count/one/iter
(reference db/wrapper.go:373-520 semantics)."""

import pytest

from anser_spark.engine import NotFoundError


def test_find_sort_limit(engine):
    coll = engine.db("tpch").collection("lineitem")
    rows = (
        coll.find({"l_quantity": {"$gt": 45.0}})
        .sort("-l_extendedprice")
        .limit(10)
        .all()
    )
    assert len(rows) == 10
    prices = [r["l_extendedprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert all(r["l_quantity"] > 45.0 for r in rows)


def test_sort_multi_key(doc_collection):
    rows = doc_collection.find().sort("status", "-priority").all()
    statuses = [r["status"] for r in rows]
    assert statuses == sorted(statuses)
    failed = [r["priority"] for r in rows if r["status"] == "failed"]
    assert failed == [42, 5]


def test_skip_offset(doc_collection):
    rows = doc_collection.find().sort("_id").skip(2).limit(2).all()
    assert [r["_id"] for r in rows] == ["a3", "a4"]


def test_projection_inclusion(doc_collection):
    rows = doc_collection.find({"_id": "a1"}).select({"status": 1, "priority": 1}).all()
    assert rows == [{"_id": "a1", "status": "success", "priority": 10}]


def test_projection_exclusion(doc_collection):
    row = doc_collection.find({"_id": "a1"}).select({"meta": 0, "tags": 0, "scores": 0, "time": 0}).one()
    assert set(row) == {"_id", "status", "activated", "priority", "version"}


def test_projection_id_only(doc_collection):
    # generators project to _id only (reference generator_simple.go:76)
    rows = doc_collection.find({"activated": True}).select({"_id": 1}).all()
    assert sorted(r["_id"] for r in rows) == ["a1", "a3", "a5", "a6"]
    assert all(set(r) == {"_id"} for r in rows)


def test_one_not_found(doc_collection):
    with pytest.raises(NotFoundError):
        doc_collection.find({"status": "nope"}).one()


def test_find_id_and_one(doc_collection):
    row = doc_collection.find_id("a4").one()
    assert row["priority"] == 99


def test_count(doc_collection):
    assert doc_collection.count() == 6
    assert doc_collection.find({"activated": True}).count() == 4
    assert doc_collection.find({"activated": True}).limit(2).count() == 2


def test_iter(doc_collection):
    seen = sorted(r["_id"] for r in doc_collection.find({"status": "failed"}).iter())
    assert seen == ["a2", "a6"]


def test_estimated_document_count(engine):
    coll = engine.db("tpch").collection("lineitem")
    assert coll.estimated_document_count() == 6000


def test_namespace_and_dbs(engine):
    from anser_spark.engine import Namespace

    ns = Namespace("tpch", "lineitem")
    assert str(ns) == "tpch.lineitem"
    assert ns.is_valid()
    assert not Namespace("", "x").is_valid()
    assert "lineitem" in engine.db("tpch").collection_names()


def test_natural_sort_and_comment_accepted(doc_collection):
    # $natural sort = storage order (no sort key, documented); $comment
    # is a profiler annotation with no match effect
    rows = doc_collection.find(
        {"status": "failed", "$comment": "audit trail"}
    ).sort("$natural").all()
    assert sorted(r["_id"] for r in rows) == ["a2", "a6"]
    rows2 = doc_collection.find({}).sort({"$natural": -1}).limit(2).all()
    assert len(rows2) == 2


def test_collation_simple_ok_others_raise(doc_collection):
    import pytest as _pytest

    q = doc_collection.find({}).collation({"locale": "simple"})
    assert q.count() == 6
    # round 7: real locales map to Spark ICU collations instead of
    # raising; inexpressible options still raise
    with _pytest.raises(ValueError, match="unsupported collation"):
        doc_collection.find({}).collation(
            {"locale": "en", "numericOrdering": True}
        )


def test_collation_real_locales(spark):
    from anser_spark.plans.query import Query

    df = spark.createDataFrame(
        [(1, "Apple"), (2, "aPPLE"), (3, "Banana"), (4, "café"), (5, "cafe")],
        "_id long, name string",
    )
    # strength 2 = case-insensitive: filter, $in, sort
    ci = {"locale": "en", "strength": 2}
    got = Query(df, {"name": "apple"}).collation(ci).all()
    assert sorted(r["_id"] for r in got) == [1, 2]
    got = Query(df, {"name": {"$in": ["APPLE", "CAFE"]}}).collation(ci).all()
    assert sorted(r["_id"] for r in got) == [1, 2, 5]  # café ≠ CAFE at s2
    order = [r["name"] for r in Query(df, {}).sort(["name", "_id"]).collation(ci).all()]
    assert order == ["Apple", "aPPLE", "Banana", "cafe", "café"]
    # strength 1 adds accent-insensitivity
    got = Query(df, {"name": "cafe"}).collation(
        {"locale": "en", "strength": 1}
    ).all()
    assert sorted(r["_id"] for r in got) == [4, 5]
    # binary (no collation): none of the above match
    assert Query(df, {"name": "apple"}).all() == []
    # range comparison under collation (binary would keep 'aPPLE'/'Apple'
    # below 'b'... actually above: 'A'<'a' in binary; under en_CI 'apple'<'b')
    got = Query(df, {"name": {"$gte": "b"}}).collation(ci).all()
    assert sorted(r["_id"] for r in got) == [3, 4, 5]


def test_projection_slice_and_elem_match(doc_collection):
    # $slice first-n / last-n / [skip, limit]; Mongo quirk: $slice alone
    # keeps every other field
    row = doc_collection.find({"_id": "a5"}).select({"tags": {"$slice": 2}}).one()
    assert row["tags"] == ["blue", "green"]
    assert "status" in row  # slice-only keeps other fields
    row = doc_collection.find({"_id": "a5"}).select({"tags": {"$slice": -1}}).one()
    assert row["tags"] == ["red"]
    row = doc_collection.find({"_id": "a5"}).select(
        {"tags": {"$slice": [1, 1]}, "_id": 1}
    ).one()
    assert row["tags"] == ["green"]
    row = doc_collection.find({"_id": "a5"}).select(
        {"tags": {"$slice": [-2, 1]}}
    ).one()
    assert row["tags"] == ["green"]
    # $elemMatch: first matching element only, inclusion semantics
    row = doc_collection.find({"_id": "a6"}).select(
        {"scores": {"$elemMatch": {"$lt": 0.5}}}
    ).one()
    assert row["scores"] == [0.01]
    assert "status" not in row  # elemMatch is inclusion-style
    row = doc_collection.find({"_id": "a1"}).select(
        {"scores": {"$elemMatch": {"$gt": 5.0}}}
    ).one()
    assert row["scores"] is None  # no match -> null (Mongo omits)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positional"):
        doc_collection.find({}).select({"tags.$": 1}).all()
    with _pytest.raises(ValueError, match="unsupported projection"):
        doc_collection.find({}).select({"tags": {"$nope": 1}}).all()


def test_seek_keyset_pagination_matches_skip(engine):
    # page through customer by (-c_acctbal, c_custkey): seek(last_doc)
    # must produce exactly the rows skip-based paging produces
    coll = engine.db("tpch").collection("customer")
    q = lambda: coll.find({}).sort(["-c_acctbal", "c_custkey"])  # noqa: E731
    page1 = q().limit(10).all()
    page2_skip = q().skip(10).limit(10).all()
    page2_seek = q().seek(page1[-1]).limit(10).all()
    key = lambda r: (r["c_acctbal"], r["c_custkey"])  # noqa: E731
    assert [key(r) for r in page2_seek] == [key(r) for r in page2_skip]
    # third page too (seek from the seek-produced page)
    page3_skip = q().skip(20).limit(10).all()
    page3_seek = q().seek(page2_seek[-1]).limit(10).all()
    assert [key(r) for r in page3_seek] == [key(r) for r in page3_skip]


def test_seek_predicate_pushes_down(engine, spark):
    # single ascending unique key: the strictly-after predicate must
    # reach the parquet scan (PushedFilters), the whole point of seek
    coll = engine.db("tpch").collection("customer")
    df = coll.find({}).sort(["c_custkey"]).seek({"c_custkey": 50}).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(c_custkey,50" in plan, (
        plan[:1500]
    )
    got = [r["c_custkey"] for r in df.limit(5).collect()]
    assert got == [51, 52, 53, 54, 55]


def test_seek_null_keys_and_errors(spark):
    from anser_spark.plans.query import Query

    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, None), (4, 2)], "_id long, v long"
    )
    # asc: nulls first — seeking from a null-v doc returns non-null v
    # rows plus later null rows (tiebreak _id)
    q = Query(df, {}).sort(["v", "_id"]).seek({"v": None, "_id": 1})
    assert [(r["_id"], r["v"]) for r in q.all()] == [
        (3, None), (4, 2), (2, 5)]
    # desc: nulls last — after v=2 come the nulls
    q2 = Query(df, {}).sort(["-v", "_id"]).seek({"v": 2, "_id": 4})
    assert [(r["_id"], r["v"]) for r in q2.all()] == [(1, None), (3, None)]
    # errors: no sort, missing key
    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires a sort"):
        Query(df, {}).seek({"v": 1}).to_df()
    with _pytest.raises(ValueError, match="missing sort-key"):
        Query(df, {}).sort(["v", "_id"]).seek({"v": 1}).to_df()


def test_seek_with_collation_paginates(spark):
    # round 8: seek() under a non-simple collation compiles a COLLATED
    # strictly-after predicate (was correct-by-rejection in r7) — pages
    # must equal the skip-based pages under the same collated sort,
    # including collation-equal ties ('Ann'/'ann') split across pages
    import random as _random

    from anser_spark.plans.query import Query

    rng = _random.Random(8)
    words = ["ann", "Ann", "ANN", "bob", "Bob", "cat", "àn", "An"]
    rows = [(i, rng.choice(words)) for i in range(60)]
    df = spark.createDataFrame(rows, "_id long, v string")
    spec = {"locale": "en", "strength": 2}
    q = lambda: Query(df, {}).sort(["v", "_id"]).collation(spec)  # noqa: E731
    pages_seek, pages_skip, last = [], [], None
    for p in range(0, 60, 7):
        pages_skip.append(q().skip(p).limit(7).all())
        pages_seek.append(
            (q().seek(last) if last is not None else q()).limit(7).all()
        )
        if pages_seek[-1]:
            last = pages_seek[-1][-1]
    key = lambda r: (r["_id"], r["v"])  # noqa: E731
    for i, (a, b) in enumerate(zip(pages_seek, pages_skip)):
        assert [key(r) for r in a] == [key(r) for r in b], i


def test_seek_fuzz_matches_skip(spark):
    """Seeded fuzzer for the keyset predicate: random frames with
    duplicate key values and nulls, random 1-3-key mixed-direction
    sorts (always _id-tiebroken so the order is total), random page
    sizes — every page produced by seek(last_doc) must equal the
    skip-based page, all the way to the end of the result."""
    import os as _os
    import random as _random

    from anser_spark.plans.query import Query

    rng = _random.Random(int(_os.environ.get("SPARK_GRAFT_FUZZ_SEED", "5")))
    for trial in range(6):
        n = rng.randint(15, 40)
        rows = [
            (
                i,
                rng.choice([None, 1, 2, 3]),
                rng.choice([None, "a", "b", "c"]),
                round(rng.choice([0.5, 1.5, 2.5]), 1),
            )
            for i in range(n)
        ]
        df = spark.createDataFrame(rows, "_id long, k long, s string, f double")
        nkeys = rng.randint(0, 2)
        sort_keys = rng.sample(["k", "s", "f"], nkeys)
        sort = [
            ("-" if rng.random() < 0.5 else "") + k for k in sort_keys
        ] + [("-" if rng.random() < 0.5 else "") + "_id"]
        page = rng.randint(3, 7)
        base = lambda: Query(df, {}).sort(sort)  # noqa: E731
        skip_rows = base().all()
        # walk pages by seek, compare against slices of the full sort
        got, last = [], None
        while True:
            q = base().limit(page)
            if last is not None:
                q = q.seek(last)
            chunk = q.all()
            if not chunk:
                break
            got.extend(chunk)
            last = chunk[-1]
            if len(chunk) < page:
                break
        assert [r["_id"] for r in got] == [r["_id"] for r in skip_rows], (
            trial, sort, page,
        )


def test_collation_regional_locales(spark):
    # BCP-47 regional locales: supported tailorings map to Spark's
    # alpha-3 names (en_US → en_USA), untailored regions and script
    # subtags fall back to the base language
    from anser_spark.functions.collation import spark_collation_name
    from anser_spark.plans.query import Query

    df = spark.createDataFrame([(1, "Apple"), (2, "aPPLE")], "_id long, name string")
    for loc in ("en_US", "en-US", "pt_BR", "zh_Hans", "fr_CA"):
        got = Query(df, {"name": "apple"}).collation(
            {"locale": loc, "strength": 2}
        ).all()
        assert sorted(r["_id"] for r in got) == [1, 2], loc
    assert spark_collation_name({"locale": "en_US", "strength": 2}) == "en_USA_CI"
    assert spark_collation_name({"locale": "zh_Hans"}) == "zh"


def test_seek_meta_sort_raises(spark):
    from anser_spark.plans.query import Query

    df = spark.createDataFrame([(1, "a")], "_id long, v string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="meta"):
        (Query(df, {}).sort([{"score": {"$meta": "textScore"}}, {"_id": 1}])
         .seek({"_id": 1}).to_df())
