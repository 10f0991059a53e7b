"""Round 11: the pipeline $match:{$text} postings-delta embed fix
(ADVICE high), the folded-terms cost-gate fix (ADVICE low), Atlas
string-facet null semantics, and — below — tombstone-based
update/remove-aware incremental index refresh."""

import pytest

from pyspark.sql import functions as F

from anser_spark.engine import Engine


def _mk(spark, tmp_path, tag):
    eng = Engine(spark, workdir=str(tmp_path / tag))
    return eng.db("t").collection("docs")


# ---------------------------------------------------------------------------
# ADVICE high: $match $text must read staged postings deltas
# ---------------------------------------------------------------------------


def test_match_text_sees_refresh_deltas(spark, tmp_path):
    # the exact ADVICE repro: after an incremental refresh stages a
    # postings delta, find() saw [10, 11] but pipe $match $text saw []
    # because the $_index embed omitted postings_deltas
    c = _mk(spark, tmp_path, "mdelta")
    c.insert_many([{"_id": i, "text": f"spark doc {i}"} for i in range(4)])
    c.create_search_index("ix", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    c.insert_many([{"_id": 10, "text": "fresh spark running"}])
    c.insert_many([{"_id": 11, "text": "another running doc"}])
    assert c.refresh_search_index("ix")["mode"] == "incremental"
    find_ids = sorted(
        r["_id"] for r in c.find({"$text": {"$search": "running"}}).all()
    )
    assert find_ids == [10, 11]
    pipe_ids = sorted(r["_id"] for r in c.pipe([
        {"$match": {"$text": {"$search": "running"}}},
        {"$project": {"_id": 1}},
    ]).all())
    assert pipe_ids == find_ids
    # scores agree with the scan path too (same idf, same delta rows)
    with_postings = sorted(
        (r["_id"], round(r["s"], 12))
        for r in c.pipe([
            {"$match": {"$text": {"$search": "spark running"}}},
            {"$project": {"_id": 1, "s": {"$meta": "textScore"}}},
        ]).all()
    )
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        scan = sorted(
            (r["_id"], round(r["s"], 12))
            for r in c.pipe([
                {"$match": {"$text": {"$search": "spark running"}}},
                {"$project": {"_id": 1, "s": {"$meta": "textScore"}}},
            ]).all()
        )
    finally:
        spark.conf.unset("spark.anser.text.usePostings")
    assert with_postings == scan


# ---------------------------------------------------------------------------
# ADVICE low: the cost gate must see real dfs under diacritic folding
# ---------------------------------------------------------------------------


def test_cost_gate_fires_for_folded_hot_terms(spark, tmp_path):
    from anser_spark.operators.ranking import text_match_postings

    c = _mk(spark, tmp_path, "fold")
    # 'none' analyzer keeps the accented token verbatim: "café" lands in
    # every doc, so its postings are the whole corpus.  The legacy $text
    # default is diacritic-INSENSITIVE → the query folds to "cafe",
    # which the raw term table does NOT carry — the old gate summed 0
    # and never declined.
    c.insert_many([
        {"_id": i, "text": ("café needle" if i == 0 else "café common")}
        for i in range(40)
    ])
    c.create_search_index("fx", {"kind": "bm25", "path": "text"})
    d = c._fresh_bm25_index(c.df())
    assert d is not None and d.get("postings_dir")
    spark.conf.set("spark.anser.text.postingsMaxDfFrac", "0.5")
    try:
        # hot folded term: the gate must now decline the postings path
        assert text_match_postings(c.df(), {"$search": "café"}, d) is None
        # rare term: postings path stays
        assert text_match_postings(c.df(), {"$search": "needle"}, d) is not None
        # and results are right either way
        hot = sorted(
            r["_id"] for r in c.find({"$text": {"$search": "café"}}).all())
        assert hot == list(range(40))
    finally:
        spark.conf.unset("spark.anser.text.postingsMaxDfFrac")


# ---------------------------------------------------------------------------
# Atlas parity: string facets bucket no null/missing keys
# ---------------------------------------------------------------------------


def test_string_facet_drops_missing_field(spark, tmp_path):
    c = _mk(spark, tmp_path, "facet")
    c.insert_many([
        {"_id": 0, "text": "spark running", "lang": "en"},
        {"_id": 1, "text": "spark sprinting", "lang": "en"},
        {"_id": 2, "text": "spark jogging", "lang": "de"},
        {"_id": 3, "text": "spark walking"},  # no lang → in NO bucket
    ])
    c.create_search_index("sx", {"kind": "bm25", "path": "text"})
    out = c.pipe([{"$searchMeta": {"facet": {
        "operator": {"text": {"query": "spark", "path": "text"}},
        "facets": {"by_lang": {"type": "string", "path": "lang"}},
    }, "index": "sx"}}]).all()[0]
    # count still includes the matched-but-unfaceted document
    assert out["count"]["total"] == 4
    buckets = sorted((r["_id"], r["count"]) for r in out["facet_by_lang"])
    assert buckets == [("de", 1), ("en", 2)]
