"""PyMongo-style aliases on Collection (insert_one/update_many/...)
with PyMongo's no-match semantics (matched 0 is a result, not an
error) — thin wrappers over the mgo-style core methods."""

import pytest

from anser_spark.engine import Engine


@pytest.fixture()
def coll(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("appdb").collection("things")
    c.insert_one({"_id": 1, "v": 10, "tag": "a"})
    c.insert_many([{"_id": 2, "v": 20, "tag": "a"},
                   {"_id": 3, "v": 30, "tag": "b"}])
    return c


def test_find_one_and_count(coll):
    assert coll.count_documents({}) == 3
    assert coll.count_documents({"tag": "a"}) == 2
    assert coll.find_one({"_id": 2})["v"] == 20
    assert coll.find_one({"_id": 99}) is None


def test_update_one_semantics(coll):
    ci = coll.update_one({"tag": "a"}, {"$inc": {"v": 1}})
    assert ci.updated == 1
    # no match is a zero-result, not an error
    ci = coll.update_one({"tag": "zz"}, {"$set": {"v": 0}})
    assert ci.updated == 0 and ci.upserted_id is None
    # upsert inserts on no match
    ci = coll.update_one({"_id": 9, "tag": "c"}, {"$set": {"v": 90}},
                         upsert=True)
    assert ci.upserted_id is not None or coll.count_documents({"_id": 9}) == 1


def test_update_many_and_upsert(coll):
    ci = coll.update_many({"tag": "a"}, {"$inc": {"v": 5}})
    assert ci.updated == 2
    # upsert on no match (filter carries the typed _id — the engine
    # cannot synthesize one for a long-_id schema)
    coll.update_many({"_id": 7, "tag": "none"}, {"$set": {"v": 1}},
                     upsert=True)
    assert coll.count_documents({"tag": "none"}) == 1


def test_replace_one(coll):
    coll.replace_one({"_id": 3}, {"_id": 3, "v": 333, "tag": "b"})
    assert coll.find_one({"_id": 3})["v"] == 333
    with pytest.raises(ValueError, match="operators"):
        coll.replace_one({"_id": 3}, {"$set": {"v": 1}})


def test_delete_semantics(coll):
    assert coll.delete_one({"tag": "a"}).removed == 1
    assert coll.delete_one({"tag": "zz"}).removed == 0
    assert coll.delete_many({}).removed == 2
    assert coll.count_documents({}) == 0


def test_find_one_and_family(doc_collection):
    # findOneAndUpdate: pre-image default, post-image on request,
    # None on no match; findOneAndDelete returns the removed doc
    pre = doc_collection.find_one_and_update(
        {"status": "failed"}, {"$inc": {"version": 1}}, sort=["-priority"]
    )
    assert pre["_id"] == "a6" and pre["version"] == 5
    post = doc_collection.find_one_and_update(
        {"_id": "a6"}, {"$inc": {"version": 1}}, return_document="after"
    )
    assert post["version"] == 7
    assert doc_collection.find_one_and_update({"status": "nope"}, {"$set": {"v": 1}}) is None
    gone = doc_collection.find_one_and_delete({"_id": "a3"})
    assert gone["_id"] == "a3"
    assert doc_collection.find_one({"_id": "a3"}) is None
    assert doc_collection.find_one_and_delete({"_id": "zz"}) is None
    rep = doc_collection.find_one_and_replace(
        {"_id": "a2"}, {"status": "swapped"}, return_document="after"
    )
    assert rep["status"] == "swapped" and rep["_id"] == "a2"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="replacement"):
        doc_collection.find_one_and_replace({"_id": "a1"}, {"$set": {"x": 1}})
