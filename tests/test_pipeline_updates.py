"""Mongo 4.2 aggregation-pipeline update form (SURVEY.md §2.4; the
reference's ``Update(q, u interface{})`` db/wrapper.go:188-244 forwards
any update shape, including stage lists).  Covers update / update_all /
upsert / find_and_modify / bulk dispatch, the allowed-stage validation,
and the fixed-schema union caveats."""

import pytest

from anser_spark.functions.updates import (
    UpdateCompileError,
    apply_pipeline_update,
    has_dollar_key,
    is_pipeline_update,
)


def get(coll, _id):
    return coll.find_id(_id).one()


def test_is_pipeline_update_shapes():
    assert is_pipeline_update([{"$set": {"a": 1}}])
    assert is_pipeline_update(({"$set": {"a": 1}},))
    assert not is_pipeline_update({"$set": {"a": 1}})
    assert not is_pipeline_update("nope")


def test_has_dollar_key_rejects_pipeline_form():
    with pytest.raises(UpdateCompileError, match="pipeline"):
        has_dollar_key([{"$set": {"a": 1}}])
    with pytest.raises(UpdateCompileError, match="document or a pipeline"):
        has_dollar_key(42)


def test_update_all_pipeline_set_expression(doc_collection):
    # $set with an aggregation EXPRESSION over the doc's own fields —
    # the capability the operator form cannot express
    info = doc_collection.update_all(
        {"status": "failed"},
        [{"$set": {"version": {"$add": ["$version", 100]},
                   "flagged": {"$gt": ["$priority", 10]}}}],
    )
    assert info.updated == 2
    assert get(doc_collection, "a2")["version"] == 101
    assert get(doc_collection, "a2")["flagged"] is False
    assert get(doc_collection, "a6")["version"] == 105
    assert get(doc_collection, "a6")["flagged"] is True
    # unmatched rows untouched; new column null there
    assert get(doc_collection, "a1")["version"] == 0
    assert get(doc_collection, "a1")["flagged"] is None


def test_update_all_pipeline_multi_stage(doc_collection):
    doc_collection.update_all(
        {"_id": "a1"},
        [
            {"$set": {"bumped": {"$multiply": ["$priority", 2]}}},
            {"$unset": "status"},
        ],
    )
    row = get(doc_collection, "a1")
    assert row["bumped"] == 20
    assert row["status"] is None  # fixed-schema: nulled on partial match
    assert get(doc_collection, "a4")["status"] == "success"


def test_update_one_pipeline_first_match_only(doc_collection):
    info = doc_collection.update(
        {"status": "failed"}, [{"$set": {"version": {"$add": ["$version", 1]}}}]
    )
    assert info.updated == 1
    assert get(doc_collection, "a2")["version"] == 2
    assert get(doc_collection, "a6")["version"] == 5  # untouched


def test_update_pipeline_replace_with(doc_collection):
    doc_collection.update_all(
        {"_id": "a3"},
        [{"$replaceWith": {"_id": "$_id", "status": {"$literal": "reset"},
                           "version": {"$literal": 0}}}],
    )
    row = get(doc_collection, "a3")
    assert row["status"] == "reset" and row["version"] == 0
    assert row["priority"] is None  # columns absent from the new doc


def test_upsert_pipeline_unmatched_synthesizes_through_stages(doc_collection):
    info = doc_collection.upsert(
        {"_id": "zz", "priority": 7},
        [{"$set": {"status": {"$literal": "fresh"},
                   "version": {"$add": ["$priority", 1]}}}],
    )
    assert info.updated == 1
    row = get(doc_collection, "zz")
    assert row["priority"] == 7  # from the filter's equality fields
    assert row["status"] == "fresh"
    assert row["version"] == 8  # pipeline ran over the synthesized doc


def test_upsert_pipeline_unmatched_references_missing_field(doc_collection):
    # the stage references a field NOT among the filter's equality
    # fields — Mongo evaluates it as missing→null; the synthesized
    # one-row frame is null-seeded for referenced fields (round 7)
    info = doc_collection.upsert(
        {"_id": "zm"},
        [{"$set": {"version": {"$ifNull": ["$version", 42]},
                   "note": {"$ifNull": ["$status", "none"]}}}],
    )
    assert info.updated == 1
    row = get(doc_collection, "zm")
    assert row["version"] == 42
    assert row["note"] == "none"


def test_upsert_pipeline_matched_updates(doc_collection):
    doc_collection.upsert(
        {"_id": "a5"}, [{"$set": {"version": {"$add": ["$version", 10]}}}]
    )
    assert get(doc_collection, "a5")["version"] == 14


def test_find_and_modify_pipeline(doc_collection):
    out = doc_collection.find_and_modify(
        query={"status": "failed"},
        sort=["-priority"],
        update=[{"$set": {"version": {"$add": ["$version", 50]}}}],
        return_new=True,
    )
    assert out["_id"] == "a6" and out["version"] == 55


def test_bulk_pipeline_update_and_upsert(doc_collection):
    bulk = doc_collection.bulk()
    bulk.update_all({"activated": True}, [{"$set": {"checked": {"$literal": True}}}])
    bulk.upsert({"_id": "new1"}, [{"$set": {"status": {"$literal": "made"}}}])
    res = bulk.run()
    assert res.matched >= 4
    assert get(doc_collection, "a1")["checked"] is True
    assert get(doc_collection, "new1")["status"] == "made"


def test_pipeline_update_rejects_disallowed_stage(doc_collection):
    with pytest.raises(UpdateCompileError, match=r"\$group is not allowed"):
        doc_collection.update_all({}, [{"$group": {"_id": None}}])
    with pytest.raises(UpdateCompileError, match="single-key"):
        doc_collection.update_all({}, [{"$set": {"a": 1}, "$unset": "b"}])
    with pytest.raises(UpdateCompileError, match="must not be empty"):
        doc_collection.update_all({}, [])


def test_pipeline_update_must_keep_id(doc_collection, spark):
    df = doc_collection.df()
    from pyspark.sql import functions as F

    with pytest.raises(UpdateCompileError, match="_id"):
        apply_pipeline_update(
            df, F.lit(True), [{"$project": {"_id": 0, "status": 1}}]
        ).collect()


def test_pipeline_update_all_rows_matched(doc_collection):
    info = doc_collection.update_all(
        {}, [{"$set": {"version": {"$add": ["$version", 1]}}}]
    )
    assert info.updated == 6
    assert sorted(
        r["version"] for r in doc_collection.find({}).all()
    ) == [1, 2, 3, 4, 5, 6]


def test_pymongo_aliases_accept_pipeline_updates(doc_collection):
    # update_one/update_many route through update/update_all → pipeline
    # form works through the PyMongo-style aliases too
    doc_collection.update_one(
        {"_id": "a1"}, [{"$set": {"version": {"$add": ["$version", 5]}}}]
    )
    assert get(doc_collection, "a1")["version"] == 5
    ci = doc_collection.update_many(
        {"status": "failed"}, [{"$set": {"version": {"$literal": 77}}}]
    )
    assert ci.updated == 2
    assert get(doc_collection, "a2")["version"] == 77
    ci2 = doc_collection.update_many(
        {"status": "ghost"},
        [{"$set": {"status": {"$literal": "made"}}}],
        upsert=True,
    )
    assert ci2.updated == 1
    made = doc_collection.find({"status": "made"}).all()
    assert len(made) == 1


def test_pipeline_update_rejects_array_filters(doc_collection):
    with pytest.raises(UpdateCompileError, match="arrayFilters"):
        doc_collection.update_all(
            {}, [{"$set": {"v": 1}}],
            array_filters=[{"e": {"$lt": 0.5}}],
        )
