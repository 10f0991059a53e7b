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
    with _pytest.raises(ValueError, match="unsupported collation"):
        doc_collection.find({}).collation({"locale": "en", "strength": 2})


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
