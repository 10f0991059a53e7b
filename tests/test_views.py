"""Mongo views: read-only collections defined as aggregation pipelines
(db.createView / create_collection viewOn form) — always-fresh reads
over the source's current version, mutation rejection, composition,
and cycle rejection at create time."""

import pytest

from anser_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    e = Engine(spark, workdir=str(tmp_path / "w"))
    c = e.db("appdb").collection("orders")
    c._rewrite(spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)],
        "_id long, cust string, amount long"))
    return e


def test_view_reads_and_composes(eng):
    db = eng.db("appdb")
    db.create_view("big_orders", "orders",
                   [{"$match": {"amount": {"$gte": 20}}}])
    v = db.collection("big_orders")
    assert v.exists() and v.is_view()
    assert v.find({}).count() == 3
    # find() filters and pipe() stages compose over the view
    assert v.find({"cust": "b"}).count() == 2
    out = v.pipe([{"$group": {"_id": "$cust", "t": {"$sum": "$amount"}}},
                  {"$sort": {"_id": 1}}]).all()
    assert [(r["_id"], r["t"]) for r in out] == [("a", 20), ("b", 70)]


def test_view_is_always_fresh(eng):
    db = eng.db("appdb")
    db.create_view("big_orders", "orders",
                   [{"$match": {"amount": {"$gte": 20}}}])
    v = db.collection("big_orders")
    assert v.find({}).count() == 3
    db.collection("orders").insert({"_id": 5, "cust": "c", "amount": 50})
    assert v.find({}).count() == 4  # no refresh step — reads recompile


def test_view_rejects_mutations(eng):
    db = eng.db("appdb")
    db.create_view("v1", "orders", [])
    v = db.collection("v1")
    with pytest.raises(TypeError, match="read-only"):
        v.insert({"_id": 99})
    with pytest.raises(TypeError, match="read-only"):
        v.update_all({}, {"$set": {"x": 1}})
    with pytest.raises(TypeError, match="read-only"):
        v.remove_all({})


def test_view_on_view_and_cycle_rejection(eng):
    db = eng.db("appdb")
    db.create_view("v1", "orders", [{"$match": {"amount": {"$gte": 20}}}])
    db.create_view("v2", "v1", [{"$match": {"cust": "b"}}])
    assert db.collection("v2").find({}).count() == 2
    with pytest.raises(ValueError, match="already exists"):
        db.create_view("v1", "orders", [])
    # a would-be cycle: v3 -> v3 is self-referential
    with pytest.raises(ValueError, match="cycle"):
        db.create_view("v3", "v3", [])


def test_view_with_lookup_resolves_same_db(eng, spark):
    db = eng.db("appdb")
    db.collection("custs")._rewrite(spark.createDataFrame(
        [("a", "Alice"), ("b", "Bob")], "cust string, name string"))
    db.create_view("named_orders", "orders", [
        {"$lookup": {"from": "custs", "localField": "cust",
                     "foreignField": "cust", "as": "c"}},
        {"$unwind": "$c"},
        {"$project": {"_id": 1, "name": "$c.name"}},
    ])
    out = db.collection("named_orders").find({}).sort("_id").all()
    assert [r["name"] for r in out] == ["Alice", "Alice", "Bob", "Bob"]


def test_drop_view_leaves_source(eng):
    db = eng.db("appdb")
    db.create_view("v1", "orders", [])
    db.collection("v1").drop()
    assert not db.collection("v1").exists()
    assert db.collection("orders").find({}).count() == 4


def test_create_collection_view_on_form(eng):
    db = eng.db("appdb")
    v = db.create_collection("cheap", view_on="orders",
                             pipeline=[{"$match": {"amount": {"$lt": 25}}}])
    assert v.is_view() and v.find({}).count() == 2
