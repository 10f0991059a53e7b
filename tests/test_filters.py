"""Filter compiler goldens: Mongo query document → expected matching _ids.

Mirrors the reference's mock-based unit-test style (SURVEY.md §5) but
runs on the real engine (Spark local mode IS the engine).
"""

import pytest

from anser_spark.functions.filters import FilterCompileError, compile_filter


def ids(docs_df, flt):
    pred = compile_filter(flt, docs_df.schema)
    return sorted(r["_id"] for r in docs_df.where(pred).select("_id").collect())


def test_match_all(docs_df):
    assert ids(docs_df, None) == ["a1", "a2", "a3", "a4", "a5", "a6"]
    assert ids(docs_df, {}) == ["a1", "a2", "a3", "a4", "a5", "a6"]


def test_implicit_eq(docs_df):
    assert ids(docs_df, {"status": "success"}) == ["a1", "a4"]


def test_implicit_eq_null_matches_null(docs_df):
    assert ids(docs_df, {"priority": None}) == ["a3"]


def test_comparisons(docs_df):
    assert ids(docs_df, {"priority": {"$gt": 10}}) == ["a4", "a6"]
    assert ids(docs_df, {"priority": {"$gte": 10}}) == ["a1", "a4", "a6"]
    assert ids(docs_df, {"priority": {"$lt": 0}}) == ["a5"]
    assert ids(docs_df, {"priority": {"$lte": 5}}) == ["a2", "a5"]
    assert ids(docs_df, {"status": {"$eq": "failed"}}) == ["a2", "a6"]


def test_ne_includes_nulls(docs_df):
    # Mongo: $ne matches docs where the field is null/missing
    assert ids(docs_df, {"priority": {"$ne": 10}}) == ["a2", "a3", "a4", "a5", "a6"]


def test_in_nin(docs_df):
    assert ids(docs_df, {"status": {"$in": ["failed", "started"]}}) == ["a2", "a3", "a6"]
    assert ids(docs_df, {"version": {"$nin": [0, 1, 2, 3]}}) == ["a5", "a6"]
    # $in with null matches null fields
    assert ids(docs_df, {"priority": {"$in": [10, None]}}) == ["a1", "a3"]
    # $nin keeps null rows unless null is in the list
    assert ids(docs_df, {"priority": {"$nin": [10]}}) == ["a2", "a3", "a4", "a5", "a6"]
    assert ids(docs_df, {"priority": {"$nin": [10, None]}}) == ["a2", "a4", "a5", "a6"]


def test_logical(docs_df):
    assert ids(docs_df, {"$and": [{"activated": True}, {"status": "success"}]}) == ["a1"]
    assert ids(docs_df, {"$or": [{"status": "started"}, {"priority": 99}]}) == ["a3", "a4"]
    assert ids(docs_df, {"$nor": [{"activated": True}, {"status": "success"}]}) == ["a2"]
    # implicit top-level AND
    assert ids(docs_df, {"activated": True, "status": "failed"}) == ["a6"]


def test_exists(docs_df):
    assert ids(docs_df, {"priority": {"$exists": False}}) == ["a3"]
    assert ids(docs_df, {"meta.owner": {"$exists": False}}) == ["a3"]
    assert ids(docs_df, {"nope": {"$exists": False}}) == ["a1", "a2", "a3", "a4", "a5", "a6"]
    assert ids(docs_df, {"nope": {"$exists": True}}) == []


def test_missing_field_semantics(docs_df):
    assert ids(docs_df, {"nope": "x"}) == []
    assert ids(docs_df, {"nope": None}) == ["a1", "a2", "a3", "a4", "a5", "a6"]
    assert ids(docs_df, {"nope": {"$ne": "x"}}) == ["a1", "a2", "a3", "a4", "a5", "a6"]


def test_dotted_paths(docs_df):
    assert ids(docs_df, {"meta.repo": "repo2"}) == ["a3", "a4"]
    assert ids(docs_df, {"meta.attempt": {"$gte": 2}}) == ["a2", "a4", "a6"]


def test_regex(docs_df):
    assert ids(docs_df, {"status": {"$regex": "^s"}}) == ["a1", "a3", "a4"]
    assert ids(docs_df, {"status": {"$regex": "^S", "$options": "i"}}) == ["a1", "a3", "a4"]


def test_mod(docs_df):
    assert ids(docs_df, {"version": {"$mod": [2, 0]}}) == ["a1", "a3", "a5"]


def test_array_contains_implicit(docs_df):
    assert ids(docs_df, {"tags": "red"}) == ["a1", "a4", "a5"]


def test_array_size_all(docs_df):
    assert ids(docs_df, {"tags": {"$size": 2}}) == ["a1", "a4"]
    assert ids(docs_df, {"tags": {"$all": ["red", "blue"]}}) == ["a1", "a5"]


def test_elem_match(docs_df):
    assert ids(docs_df, {"scores": {"$elemMatch": {"$gt": 0.85, "$lt": 0.95}}}) == ["a1"]
    assert ids(docs_df, {"scores": {"$gt": 0.9}}) == ["a6"]  # implicit any-element


def test_not(docs_df):
    assert ids(docs_df, {"priority": {"$not": {"$gt": 10}}}) == ["a1", "a2", "a3", "a5"]


def test_type(docs_df):
    assert ids(docs_df, {"priority": {"$type": "long"}}) == ["a1", "a2", "a4", "a5", "a6"]
    assert ids(docs_df, {"priority": {"$type": "string"}}) == []
    assert ids(docs_df, {"priority": {"$type": "null"}}) == ["a3"]


def test_unsupported_raises():
    with pytest.raises(FilterCompileError):
        compile_filter({"f": {"$near": [1, 2]}})


def test_filter_pushdown_reaches_scan(engine):
    """Scale check: a compiled filter must appear as a PushedFilter on the
    Parquet scan (predicate pushdown, SURVEY.md §4)."""
    coll = engine.db("tpch").collection("lineitem")
    df = coll.find({"l_quantity": {"$gt": 45.0}}).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan
