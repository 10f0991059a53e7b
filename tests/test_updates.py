"""Update compiler + mutation write path (SURVEY.md §2.4): update
operators, replacement, upsert, remove, findAndModify, bulk — golden
before/after checks on the document fixture."""

import pytest

from anser_spark.engine import NotFoundError


def get(coll, _id):
    return coll.find_id(_id).one()


def test_update_all_set(doc_collection):
    info = doc_collection.update_all({"status": "failed"}, {"$set": {"priority": -1, "activated": False}})
    assert info.updated == 2
    for _id in ("a2", "a6"):
        row = get(doc_collection, _id)
        assert row["priority"] == -1 and row["activated"] is False
    assert get(doc_collection, "a1")["priority"] == 10  # untouched


def test_update_one_only_first_match(doc_collection):
    info = doc_collection.update({"status": "failed"}, {"$set": {"version": 9}})
    assert info.updated == 1
    assert get(doc_collection, "a2")["version"] == 9  # first by _id order
    assert get(doc_collection, "a6")["version"] == 5


def test_update_not_found_raises(doc_collection):
    with pytest.raises(NotFoundError):
        doc_collection.update({"status": "nope"}, {"$set": {"version": 1}})


def test_update_id(doc_collection):
    doc_collection.update_id("a3", {"$set": {"status": "success"}})
    assert get(doc_collection, "a3")["status"] == "success"


def test_set_new_column(doc_collection):
    doc_collection.update_all({"activated": True}, {"$set": {"checked": True}})
    assert get(doc_collection, "a1")["checked"] is True
    assert get(doc_collection, "a2")["checked"] is None


def test_set_nested(doc_collection):
    doc_collection.update_all({"_id": "a1"}, {"$set": {"meta.owner": "zed"}})
    row = get(doc_collection, "a1")
    assert row["meta"]["owner"] == "zed"
    assert row["meta"]["repo"] == "repo1"  # sibling preserved


def test_unset(doc_collection):
    doc_collection.update_all({"_id": "a1"}, {"$unset": {"priority": ""}})
    assert get(doc_collection, "a1")["priority"] is None
    assert get(doc_collection, "a4")["priority"] == 99


def test_unset_nested(doc_collection):
    # fixed-schema semantics: nested unset nulls the field (schema keeps it)
    doc_collection.update_all({"_id": "a1"}, {"$unset": {"meta.owner": ""}})
    row = get(doc_collection, "a1")
    assert row["meta"]["owner"] is None
    assert row["meta"]["repo"] == "repo1"
    assert get(doc_collection, "a4")["meta"]["owner"] == "carol"


def test_rename(doc_collection):
    # the reference example migration is a $rename (example_test.go:56)
    doc_collection.update_all({}, {"$rename": {"time": "timeSince"}})
    row = get(doc_collection, "a1")
    assert row["timeSince"] is not None
    # every row matched ⇒ the source column is dropped (BSON semantics)
    assert "time" not in doc_collection.df().columns


def test_unset_full_match_drops_column(doc_collection):
    # all-match $unset removes the column; partial-match keeps it nulled
    doc_collection.update_all({"_id": "a1"}, {"$unset": {"priority": ""}})
    assert "priority" in doc_collection.df().columns
    doc_collection.update_all({}, {"$unset": {"priority": ""}})
    assert "priority" not in doc_collection.df().columns


def test_inc_mul(doc_collection):
    doc_collection.update_all({"_id": "a1"}, {"$inc": {"priority": 5}})
    assert get(doc_collection, "a1")["priority"] == 15
    doc_collection.update_all({"_id": "a1"}, {"$mul": {"priority": 2}})
    assert get(doc_collection, "a1")["priority"] == 30
    # $inc on null field treats it as 0
    doc_collection.update_all({"_id": "a3"}, {"$inc": {"priority": 7}})
    assert get(doc_collection, "a3")["priority"] == 7


def test_min_max(doc_collection):
    doc_collection.update_all({"_id": "a1"}, {"$min": {"priority": 3}})
    assert get(doc_collection, "a1")["priority"] == 3
    doc_collection.update_all({"_id": "a1"}, {"$min": {"priority": 100}})
    assert get(doc_collection, "a1")["priority"] == 3
    doc_collection.update_all({"_id": "a1"}, {"$max": {"priority": 50}})
    assert get(doc_collection, "a1")["priority"] == 50


def test_push_addtoset_pull(doc_collection):
    doc_collection.update_all({"_id": "a2"}, {"$push": {"tags": "pink"}})
    assert get(doc_collection, "a2")["tags"] == ["blue", "pink"]
    doc_collection.update_all({"_id": "a2"}, {"$addToSet": {"tags": "blue"}})
    assert get(doc_collection, "a2")["tags"] == ["blue", "pink"]
    doc_collection.update_all({"_id": "a2"}, {"$pull": {"tags": "blue"}})
    assert get(doc_collection, "a2")["tags"] == ["pink"]


def test_push_each_and_pop(doc_collection):
    doc_collection.update_all({"_id": "a2"}, {"$push": {"scores": {"$each": [0.3, 0.4]}}})
    assert get(doc_collection, "a2")["scores"] == [0.1, 0.3, 0.4]
    doc_collection.update_all({"_id": "a2"}, {"$pop": {"scores": 1}})
    assert get(doc_collection, "a2")["scores"] == [0.1, 0.3]
    doc_collection.update_all({"_id": "a2"}, {"$pop": {"scores": -1}})
    assert get(doc_collection, "a2")["scores"] == [0.3]


def test_pull_with_condition(doc_collection):
    doc_collection.update_all({"_id": "a5"}, {"$pull": {"scores": {"$lt": 0.5}}})
    assert get(doc_collection, "a5")["scores"] == [0.8]


def test_replacement_doc(doc_collection):
    # non-$ update ⇒ whole-document replace, _id preserved (hasDollarKey
    # dispatch, reference db/wrapper.go:612-618)
    doc_collection.update({"_id": "a1"}, {"status": "replaced", "priority": 1})
    row = get(doc_collection, "a1")
    assert row["_id"] == "a1"
    assert row["status"] == "replaced"
    assert row["priority"] == 1
    assert row["meta"] is None  # fields absent from replacement are cleared


def test_upsert_existing(doc_collection):
    info = doc_collection.upsert({"_id": "a1"}, {"$set": {"status": "upserted"}})
    assert info.updated == 1 and info.upserted_id is None
    assert get(doc_collection, "a1")["status"] == "upserted"


def test_upsert_insert(doc_collection):
    info = doc_collection.upsert({"_id": "zz", "status": "new"}, {"$set": {"priority": 77}})
    assert info.upserted_id == "zz"
    row = get(doc_collection, "zz")
    assert row["status"] == "new" and row["priority"] == 77
    assert doc_collection.count() == 7


def test_remove_one_and_all(doc_collection):
    info = doc_collection.remove({"status": "failed"})
    assert info.removed == 1
    assert doc_collection.count() == 5
    info = doc_collection.remove_all({"activated": True})
    assert info.removed == 4
    assert doc_collection.count() == 1


def test_find_and_modify_update(doc_collection):
    # victim = highest priority via sort; returns pre-image by default
    old = doc_collection.find_and_modify(
        query={"status": "success"}, sort=["-priority"], update={"$set": {"status": "done"}}
    )
    assert old["_id"] == "a4" and old["status"] == "success"
    assert get(doc_collection, "a4")["status"] == "done"


def test_find_and_modify_return_new(doc_collection):
    new = doc_collection.find_and_modify(
        query={"_id": "a1"}, update={"$inc": {"priority": 1}}, return_new=True
    )
    assert new["priority"] == 11


def test_find_and_modify_remove(doc_collection):
    gone = doc_collection.find_and_modify(query={"_id": "a2"}, remove=True)
    assert gone["_id"] == "a2"
    assert doc_collection.count() == 5
    with pytest.raises(ValueError):
        doc_collection.find_and_modify(query={}, remove=True, update={"$set": {"x": 1}})
    with pytest.raises(ValueError):
        doc_collection.find_and_modify(query={}, remove=True, return_new=True)


def test_insert_and_insert_df(doc_collection):
    doc_collection.insert({"_id": "b1", "status": "new"})
    assert doc_collection.count() == 7
    row = get(doc_collection, "b1")
    assert row["status"] == "new" and row["priority"] is None


def test_bulk(doc_collection):
    res = (
        doc_collection.bulk()
        .insert({"_id": "c1", "status": "bulk"})
        .update({"_id": "a1"}, {"$set": {"version": 42}})
        .update_all({"status": "failed"}, {"$set": {"activated": False}})
        .remove({"_id": "a3"})
        .run()
    )
    assert res.matched == 4  # 1 update + 2 update_all + 1 remove
    assert doc_collection.count() == 6  # 6 - 1 removed + 1 inserted
    assert get(doc_collection, "a1")["version"] == 42
    assert get(doc_collection, "c1")["status"] == "bulk"


def test_bulk_odd_arity_raises(doc_collection):
    with pytest.raises(ValueError):
        doc_collection.bulk().update({"_id": "a1"})


def test_bulk_empty_raises(doc_collection):
    with pytest.raises(ValueError):
        doc_collection.bulk().run()


def test_bulk_upsert_miss_inserts(doc_collection):
    res = doc_collection.bulk().upsert({"_id": "u1"}, {"$set": {"status": "up"}}).run()
    assert res.matched == 0
    assert get(doc_collection, "u1")["status"] == "up"


def test_nondeterministic_predicate_counts_consistent(engine, spark):
    # $sampleRate draws fresh randomness per evaluation; the write path
    # must materialize ONE draw so the reported count equals the rows
    # actually mutated/removed (ADVICE r2: engine.py _cow_rewrite).
    db = engine.db("appdb")
    c = db.collection("nd_sample")
    c._rewrite(spark.range(0, 400).selectExpr("id as _id", "0 as flag"))
    info = c.update_all({"$sampleRate": 0.5}, {"$set": {"flag": 1}})
    flagged = c.find({"flag": 1}).count()
    assert flagged == info.updated
    assert 50 < flagged < 350  # it really sampled

    before = c.count()
    info = c.remove_all({"$sampleRate": 0.4})
    assert c.count() == before - info.removed
    assert 0 < info.removed < before
