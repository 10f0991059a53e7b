"""Round-5 second-session additions: winnowing fingerprints, change
streams, line-level corpus dedup/cleaning, and DuckDB-oracle
differential tests for $graphLookup / $searchMeta / autocomplete."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------


def _py_winnow(text: str, k: int = 8, w: int = 4) -> list[str]:
    """Scalar reference implementation (independent of the Spark code)."""
    s = re.sub(r"[^a-z0-9]+", "", text.lower())
    grams = [
        hashlib.md5(s[i : i + k].encode()).hexdigest()[:16]
        for i in range(len(s) - k + 1)
    ]
    if not grams:
        return []
    n_windows = max(len(grams) - w + 1, 1)
    return sorted({min(grams[j : j + w]) for j in range(n_windows)})


WINNOW_TEXTS = [
    "Hello, World! This is a test document about sparks and rows.",
    "short",
    "",
    "exactly8",
    "aaaaaaaaaaaaaaaaaa",
    "the quick brown fox jumps over the lazy dog",
    "THE QUICK   brown-fox Jumps over the lazy dog!!",  # normalizes same
    "a b c d e f g h i j",  # whitespace stripped => 10 chars, 3 grams < w
]


def test_winnow_matches_scalar_reference(spark):
    from anser_spark.operators.text import winnow_fingerprints_col

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(WINNOW_TEXTS)], "id int, text string"
    )
    rows = df.select(
        "id", winnow_fingerprints_col(F.col("text"), k=8, w=4).alias("fp")
    ).collect()
    for r in rows:
        assert list(r.fp) == _py_winnow(WINNOW_TEXTS[r.id]), f"id={r.id}"


def test_winnow_whitespace_punct_insensitive(spark):
    # the winnowing guarantee only bites if normalization kills layout
    from anser_spark.operators.text import winnow_fingerprints_col

    df = spark.createDataFrame(
        [(0, WINNOW_TEXTS[5]), (1, WINNOW_TEXTS[6])], "id int, text string"
    )
    a, b = [
        list(r.fp)
        for r in df.select(
            winnow_fingerprints_col(F.col("text")).alias("fp")
        ).collect()
    ]
    assert a == b and len(a) > 0


def test_winnow_shared_substring_overlaps(spark):
    # two docs sharing a >= k+w-1 char substring must share a fingerprint
    from anser_spark.operators.text import (
        winnow_fingerprints_col,
        winnow_similarity_col,
    )

    shared = "completely identical shared central passage"
    docs = [(0, "left padding words " + shared), (1, shared + " right tail here")]
    df = spark.createDataFrame(docs, "id int, text string")
    fps = df.select(
        "id", winnow_fingerprints_col(F.col("text")).alias("fp")
    )
    pair = (
        fps.alias("a")
        .crossJoin(fps.alias("b"))
        .where("a.id = 0 AND b.id = 1")
        .select(
            winnow_similarity_col(F.col("a.fp"), F.col("b.fp")).alias("sim")
        )
        .first()
    )
    assert pair.sim > 0.0


# ---------------------------------------------------------------------------
# Line-level corpus cleaning + dedup (C4 / CCNet pre-processing)
# ---------------------------------------------------------------------------


LINE_DOCS = [
    (1, "the cat sat down.\nx\nshared boilerplate line here\nunique one alpha"),
    (2, "shared boilerplate line here\nthe dog ran far!\nshort ln"),
    (3, "SHARED   boilerplate line HERE\nanother unique line three\n"),
    (4, ""),
    (5, None),
]


def _py_clean(text, min_words=3):
    if not text:
        return []
    return [
        l for l in text.split("\n")
        if len([w for w in l.split() if w]) >= min_words
    ]


def _py_dedup_lines(docs):
    """keep first occurrence by (doc_id, pos) of normalized line"""
    import re as _re

    seen = {}
    for did, text in sorted(docs):
        for pos, line in enumerate((text or "").split("\n")):
            if not line.strip():
                continue
            norm = _re.sub(r"\s+", " ", line.lower().strip())
            seen.setdefault(norm, (did, pos))
    out = {}
    for did, text in docs:
        kept = []
        for pos, line in enumerate((text or "").split("\n")):
            if not line.strip():
                continue
            norm = _re.sub(r"\s+", " ", line.lower().strip())
            if seen[norm] == (did, pos):
                kept.append(line)
        out[did] = "\n".join(kept)
    return out


def test_clean_lines_matches_reference(spark):
    from anser_spark.operators.corpus import clean_lines

    df = spark.createDataFrame(LINE_DOCS, "doc_id long, text string")
    rows = {r.doc_id: r for r in clean_lines(df).collect()}
    for did, text in LINE_DOCS:
        exp = _py_clean(text)
        assert rows[did].clean_text == "\n".join(exp), f"doc {did}"
        assert rows[did].n_kept_lines == len(exp)
    assert rows[4].n_lines == 0 and rows[5].n_lines == 0


def test_clean_lines_punct_and_blocklist(spark):
    from anser_spark.operators.corpus import clean_lines

    df = spark.createDataFrame(
        [(1, 'good line here.\nno punct line at all\nenable JavaScript to continue.')],
        "doc_id long, text string",
    )
    r = clean_lines(
        df, require_terminal_punct=True, blocklist=["javascript"]
    ).first()
    assert r.clean_text == "good line here."
    assert r.n_lines == 3 and r.n_kept_lines == 1


def test_dedup_lines_matches_reference(spark):
    from anser_spark.operators.corpus import dedup_lines

    df = spark.createDataFrame(LINE_DOCS, "doc_id long, text string")
    rows = {r.doc_id: r for r in dedup_lines(df).collect()}
    exp = _py_dedup_lines(LINE_DOCS)
    for did, _ in LINE_DOCS:
        assert rows[did].dedup_text == exp[did], f"doc {did}"
    # doc 3's variant-case boilerplate line deduped against doc 1's
    assert "boilerplate" not in rows[3].dedup_text
    assert "boilerplate" in rows[1].dedup_text


# ---------------------------------------------------------------------------
# Change streams: Collection.watch() over retained versions
# ---------------------------------------------------------------------------


def _fresh_coll(spark, tmp_path, rows, schema):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path))
    coll = eng.db("wdb").collection("items")
    coll._rewrite(spark.createDataFrame(rows, schema))
    coll.set_retention(10)
    return coll


def test_watch_insert_update_delete(spark, tmp_path):
    import json

    coll = _fresh_coll(
        spark, tmp_path,
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "_id long, name string, v long",
    )
    coll.update_all({"_id": 2}, {"$set": {"v": 99}})
    coll.remove_all({"_id": 3})
    coll.insert({"_id": 4, "name": "d", "v": 40})
    ev = {r.documentKey: r for r in coll.watch("v1").collect()}
    assert set(ev) == {2, 3, 4}
    assert ev[2].operationType == "update"
    assert json.loads(ev[2].fullDocument)["v"] == 99
    assert json.loads(ev[2].fullDocumentBeforeChange)["v"] == 20
    assert ev[3].operationType == "delete" and ev[3].fullDocument is None
    assert json.loads(ev[3].fullDocumentBeforeChange)["name"] == "c"
    assert ev[4].operationType == "insert" and ev[4].fullDocumentBeforeChange is None
    assert json.loads(ev[4].fullDocument)["name"] == "d"


def test_watch_endpoint_semantics_update_then_delete(spark, tmp_path):
    import json

    coll = _fresh_coll(
        spark, tmp_path, [(1, "a", 10)], "_id long, name string, v long"
    )
    coll.update_all({"_id": 1}, {"$set": {"v": 11}})
    coll.remove_all({"_id": 1})
    evs = coll.watch("v1").collect()
    # intermediate update collapses: single delete with the v1 pre-image
    assert len(evs) == 1 and evs[0].operationType == "delete"
    assert json.loads(evs[0].fullDocumentBeforeChange)["v"] == 10


def test_watch_duplicate_keys_multiset(spark, tmp_path):
    coll = _fresh_coll(
        spark, tmp_path,
        [(1, "a", 10), (1, "a2", 10)],
        "_id long, name string, v long",
    )
    coll.update_all({"name": "a"}, {"$set": {"v": 77}})
    evs = coll.watch("v1").collect()
    # one of the duplicate-key rows changed: exactly one update event
    assert [e.operationType for e in evs] == ["update"]


def test_watch_unknown_key_raises(spark, tmp_path):
    coll = _fresh_coll(spark, tmp_path, [(1, "a", 1)], "_id long, name string, v long")
    coll.update_all({"_id": 1}, {"$inc": {"v": 1}})
    with pytest.raises(ValueError, match="watch key"):
        coll.watch("v1", key="nope")


def test_diff_versions_schema_evolution(spark, tmp_path):
    coll = _fresh_coll(spark, tmp_path, [(1, "a")], "_id long, name string")
    coll.insert({"_id": 2, "name": "b", "extra": 5})
    d = coll.diff_versions("v1")
    rows = {(r.change_type, r._id) for r in d.collect()}
    assert ("added", 2) in rows
    # the old version's rows gained a null 'extra' — no spurious diffs
    assert ("removed", 1) not in rows and ("added", 1) not in rows


def test_winnow_empty_and_short_docs(spark):
    from anser_spark.operators.text import with_winnow_fingerprints

    df = spark.createDataFrame([(0, ""), (1, "ab"), (2, None)], "id int, text string")
    rows = {
        r.id: r.fingerprints
        for r in with_winnow_fingerprints(df).collect()
    }
    assert rows[0] == [] and rows[1] == []
    assert rows[2] is None or rows[2] == []


def test_watch_resume_after_version(spark, tmp_path):
    # events carry the diff's endpoint version; feeding it back into
    # watch() yields exactly the NEXT batch of changes (resume-token
    # analogue of Mongo's event _id)
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "wrv"))
    c = eng.db("d").collection("t")
    c.set_retention(10)
    c.insert_many([{"_id": i, "v": 0} for i in range(3)])
    v0 = c._pointer()
    c.update_all({"_id": 1}, {"$set": {"v": 1}})
    ev1 = c.watch(v0).collect()
    assert {e["operationType"] for e in ev1} == {"update"}
    token = ev1[0]["resumeAfterVersion"]
    c.insert({"_id": 9, "v": 9})
    ev2 = c.watch(token).collect()
    assert [(e["operationType"], e["documentKey"]) for e in ev2] == [("insert", 9)]
