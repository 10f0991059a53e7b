"""Legacy ``{$text: {$search: ...}}`` find/$match operator (the find
surface the reference accepts verbatim, db/interface.go:26), mapped
onto the BM25/$search machinery.  Goldens compare against the $search
stage's scoring on the same corpus."""

import pytest

from anser_spark.engine import Engine
from anser_spark.functions.filters import FilterCompileError


DOCS = [
    {"_id": "d1", "text": "spark rules the cluster", "lang": "en"},
    {"_id": "d2", "text": "mongo queries documents", "lang": "en"},
    {"_id": "d3", "text": "spark and mongo together", "lang": "en"},
    {"_id": "d4", "text": "Spark Capital letters", "lang": "en"},
    {"_id": "d5", "text": "nothing relevant here", "lang": "de"},
    {"_id": "d6", "text": None, "lang": "de"},
]


@pytest.fixture()
def coll(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "textw"))
    c = eng.db("t").collection("docs")
    c.insert_many(DOCS)
    return c


def ids(rows):
    return sorted(r["_id"] for r in rows)


def test_text_terms_are_ored(coll):
    rows = coll.find({"$text": {"$search": "spark mongo"}}).all()
    assert ids(rows) == ["d1", "d2", "d3", "d4"]


def test_text_negation(coll):
    rows = coll.find({"$text": {"$search": "spark -mongo"}}).all()
    assert ids(rows) == ["d1", "d4"]


def test_text_phrase_must_appear(coll):
    rows = coll.find({"$text": {"$search": '"spark and mongo"'}}).all()
    assert ids(rows) == ["d3"]


def test_text_case_sensitive(coll):
    rows = coll.find(
        {"$text": {"$search": "Spark", "$caseSensitive": True}}
    ).all()
    assert ids(rows) == ["d4"]


def test_text_residual_filter_combines(coll):
    rows = coll.find({"$text": {"$search": "spark"}, "lang": "en"}).all()
    assert ids(rows) == ["d1", "d3", "d4"]


def test_text_count(coll):
    assert coll.find({"$text": {"$search": "spark mongo"}}).count() == 4


def test_text_meta_projection_and_sort(coll):
    rows = (
        coll.find({"$text": {"$search": "spark"}})
        .select({"_id": 1, "score": {"$meta": "textScore"}})
        .sort({"score": {"$meta": "textScore"}})
        .all()
    )
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # hidden column never leaks without a meta projection
    plain = coll.find({"$text": {"$search": "spark"}}).all()
    assert all("__textScore" not in r for r in plain)


def test_text_matches_search_stage_scores(coll):
    # the $search text stage scores with the same BM25 — the $text
    # find must agree on both membership and relative order
    via_search = coll.pipe([
        {"$search": {"text": {"query": "spark", "path": "text"}}},
        {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}},
    ]).all()
    via_text = (
        coll.find({"$text": {"$search": "spark"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .sort({"s": {"$meta": "textScore"}})
        .all()
    )
    assert [r["_id"] for r in via_search] == [r["_id"] for r in via_text]
    for a, b in zip(via_search, via_text):
        assert a["s"] == pytest.approx(b["s"])


def test_text_in_pipeline_match(coll):
    rows = coll.pipe([
        {"$match": {"$text": {"$search": "spark -mongo"}}},
        {"$project": {"_id": 1, "sc": {"$meta": "textScore"}}},
        {"$sort": {"sc": {"$meta": "textScore"}}},
    ]).all()
    assert [r["_id"] for r in rows][0] in ("d1", "d4")
    assert ids(rows) == ["d1", "d4"]
    assert all(r["sc"] > 0 for r in rows)
    # no hidden column when not projected
    bare = coll.pipe([{"$match": {"$text": {"$search": "spark"}}}]).all()
    assert all("__textScore" not in r for r in bare)


def test_text_uses_bm25_index_stats(coll):
    base = (
        coll.find({"$text": {"$search": "spark mongo"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .all()
    )
    coll.create_search_index("ti", {"kind": "bm25", "path": "text"})
    indexed = (
        coll.find({"$text": {"$search": "spark mongo"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .all()
    )
    a = {r["_id"]: r["s"] for r in base}
    b = {r["_id"]: r["s"] for r in indexed}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k])


def test_text_nested_raises(coll):
    with pytest.raises(FilterCompileError, match="top level"):
        coll.find({"$or": [{"$text": {"$search": "spark"}}]}).all()


def test_text_bad_spec_raises(coll):
    with pytest.raises(ValueError, match="non-empty"):
        coll.find({"$text": {"$search": ""}}).all()
    with pytest.raises(ValueError, match="unsupported \\$text options"):
        coll.find({"$text": {"$search": "x", "$bogus": 1}}).all()


def test_text_negation_only_matches_nothing(coll):
    assert coll.find({"$text": {"$search": "-spark"}}).count() == 0


def test_text_pipeline_uses_index_stats(coll):
    base = coll.pipe([
        {"$match": {"$text": {"$search": "spark mongo"}}},
        {"$project": {"_id": 1, "s": {"$meta": "textScore"}}},
    ]).all()
    coll.create_search_index("tpi", {"kind": "bm25", "path": "text"})
    indexed = coll.pipe([
        {"$match": {"$text": {"$search": "spark mongo"}}},
        {"$project": {"_id": 1, "s": {"$meta": "textScore"}}},
    ]).all()
    a = {r["_id"]: r["s"] for r in base}
    b = {r["_id"]: r["s"] for r in indexed}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k])


def test_text_residual_filter_pushes_down(spark, tmp_path):
    # the residual equality combines with $text AFTER the score column,
    # but Catalyst must still push it to the parquet scan
    eng = Engine(spark, workdir=str(tmp_path / "tp"))
    c = eng.db("t").collection("docs2")
    c.insert_many(DOCS)
    df = c.find({"$text": {"$search": "spark"}, "lang": "en"}).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]


def test_named_index_resolves_in_union_with_subpipeline(spark, tmp_path):
    # $search {index: "<name>"} inside a $unionWith sub-pipeline must
    # resolve against the UNION'd collection's indexes
    eng = Engine(spark, workdir=str(tmp_path / "uw"))
    a = eng.db("t").collection("a")
    a.insert_many([{"_id": "a1", "text": "alpha words here maybe"}])
    b = eng.db("t").collection("b")
    b.insert_many(
        [{"_id": f"b{i}", "text": t} for i, t in enumerate(
            ["spark is here", "nothing else", "spark again today ok"])]
    )
    b.create_search_index("bidx", {"kind": "bm25", "path": "text"})
    rows = a.pipe([
        {"$unionWith": {"coll": "b", "pipeline": [
            {"$search": {"index": "bidx",
                         "text": {"query": "spark", "path": "text"}}},
            {"$project": {"_id": 1, "text": 1}},
        ]}},
    ]).all()
    got = sorted(r["_id"] for r in rows)
    assert got == ["a1", "b0", "b2"]


def test_text_in_mutation_filters(coll):
    # Mongo accepts $text in update/delete targeting too
    info = coll.update_all(
        {"$text": {"$search": "spark -mongo"}}, {"$set": {"lang": "hit"}}
    )
    assert info.updated == 2
    assert sorted(
        r["_id"] for r in coll.find({"lang": "hit"}).all()
    ) == ["d1", "d4"]
    info = coll.remove_all({"$text": {"$search": "mongo"}})
    assert info.removed == 2
    assert coll.find({}).count() == 4


def test_text_in_bulk_selectors(coll):
    res = (
        coll.bulk()
        .update_all({"$text": {"$search": "spark"}}, {"$set": {"lang": "s"}})
        .remove_all({"$text": {"$search": "relevant"}})
        .run()
    )
    assert res.matched == 4  # 3 spark docs updated + 1 removed
    assert coll.find({"lang": "s"}).count() == 3
    assert coll.find({"_id": "d5"}).count() == 0


def test_text_english_language_analysis(spark, tmp_path):
    # round 7: $language 'english' = Snowball stopword removal +
    # s-stemming on documents AND query terms
    eng = Engine(spark, workdir=str(tmp_path / "texte"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "p1", "text": "The ponies are running in the fields."},
        {"_id": "p2", "text": "A single pony grazes!"},
        {"_id": "p3", "text": "Cats and dogs."},
        {"_id": "p4", "text": "the and of"},
    ])
    # plural/singular conflation, both directions; punctuation stripped
    assert ids(c.find({"$text": {"$search": "pony", "$language": "english"}}).all()) == ["p1", "p2"]
    assert ids(c.find({"$text": {"$search": "ponies", "$language": "en"}}).all()) == ["p1", "p2"]
    assert ids(c.find({"$text": {"$search": "dogs", "$language": "english"}}).all()) == ["p3"]
    # stopword-only query matches nothing (Mongo behavior)
    assert c.find({"$text": {"$search": "the and", "$language": "english"}}).all() == []
    # default 'none' language: exact tokens — 'pony' only hits p2 (and
    # 'grazes!' keeps its punctuation so 'grazes' misses)
    assert ids(c.find({"$text": {"$search": "pony"}}).all()) == ["p2"]
    assert c.find({"$text": {"$search": "grazes"}}).all() == []
    # unsupported language raises
    with pytest.raises(ValueError, match="language"):
        c.find({"$text": {"$search": "x", "$language": "klingon"}}).all()


def test_text_english_index_default_language(spark, tmp_path):
    # a bm25 index built with default_language='english' stems its term
    # table and the query path picks the language up from the index
    eng = Engine(spark, workdir=str(tmp_path / "texti"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "p1", "text": "The ponies are running in the fields."},
        {"_id": "p2", "text": "A single pony grazes!"},
        {"_id": "p3", "text": "Cats and dogs."},
    ])
    c.create_search_index("txt", {"kind": "bm25", "default_language": "english"})
    # no $language in the query: the index's default applies
    assert ids(c.find({"$text": {"$search": "pony"}}).all()) == ["p1", "p2"]
    # pipeline $match path embeds the index language too
    rows = c.pipe([
        {"$match": {"$text": {"$search": "cats"}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert ids(rows) == ["p3"]
    # index stats really are stemmed: the term table has the Snowball
    # stem 'poni' (round 8: Porter2, not the old s-stemmer's 'pony')
    import os, json
    d = c._load_search_index("txt", warn_stale=False)
    terms = {r["term"] for r in spark.read.parquet(d["terms_dir"]).collect()}
    assert "poni" in terms and "ponies" not in terms and "the" not in terms
    assert "run" in terms  # 'running' conflates — the r7 recall gap


def test_text_english_stem_collides_with_stopword(spark, tmp_path):
    # 'owns' stems to 'own', which IS a Snowball stopword — the stem
    # must still score/match (analysis runs exactly once; a second pass
    # would silently drop it and match nothing)
    eng = Engine(spark, workdir=str(tmp_path / "texts"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "s1", "text": "She owns three boats."},
        {"_id": "s2", "text": "Nothing here."},
    ])
    rows = c.find({"$text": {"$search": "owns", "$language": "english"}}).all()
    assert ids(rows) == ["s1"]
    # and the relevance score is positive, not zeroed
    scored = c.find(
        {"$text": {"$search": "owns", "$language": "english"}}
    ).select({"_id": 1, "sc": {"$meta": "textScore"}}).all()
    assert scored and scored[0]["sc"] > 0
    # $search path with the english analyzer, same collision
    from anser_spark.plans.pipeline import compile_pipeline
    df = c.df()
    out = compile_pipeline(df, [
        {"$search": {"text": {"query": "owns", "path": "text",
                              "analyzer": "lucene.english"}}},
    ])
    assert [r["_id"] for r in out.select("_id").collect()] == ["s1"]


def test_text_english_phrase_only_stopwords(spark, tmp_path):
    # a phrase of pure stopwords still matches by raw substring — the
    # all-stopword guard must not clobber the phrase predicate
    eng = Engine(spark, workdir=str(tmp_path / "textp"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "h1", "text": "to be or not to be, that is the question"},
        {"_id": "h2", "text": "entirely unrelated words"},
    ])
    rows = c.find({"$text": {"$search": '"to be or not to be"',
                             "$language": "english"}}).all()
    assert ids(rows) == ["h1"]


def test_text_english_punctuated_query_terms(spark, tmp_path):
    # query terms re-tokenize on the document charset: 'big-data'
    # matches a doc containing 'big data' under the english analyzer
    eng = Engine(spark, workdir=str(tmp_path / "textq"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "b1", "text": "big data pipelines at scale"},
        {"_id": "b2", "text": "small things"},
    ])
    rows = c.find({"$text": {"$search": "big-data", "$language": "english"}}).all()
    assert ids(rows) == ["b1"]


def test_text_diacritic_insensitive_default(spark, tmp_path):
    # Mongo text-index v3+ default: diacritic-INSENSITIVE — 'cafe'
    # matches 'café' (and vice versa); $diacriticSensitive: True
    # restores exact matching
    eng = Engine(spark, workdir=str(tmp_path / "textd"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "f1", "text": "un café crème"},
        {"_id": "f2", "text": "plain cafe here"},
        {"_id": "f3", "text": "unrelated"},
    ])
    assert ids(c.find({"$text": {"$search": "cafe"}}).all()) == ["f1", "f2"]
    assert ids(c.find({"$text": {"$search": "café"}}).all()) == ["f1", "f2"]
    strict = c.find(
        {"$text": {"$search": "cafe", "$diacriticSensitive": True}}
    ).all()
    assert ids(strict) == ["f2"]
    # phrases fold too
    assert ids(c.find({"$text": {"$search": '"cafe creme"'}}).all()) == ["f1"]
    # combined with the english analyzer (stem + fold)
    rows = c.find({"$text": {"$search": "cafés", "$language": "english"}}).all()
    assert ids(rows) == ["f1", "f2"]


def test_text_folding_independent_of_case_and_scored(spark, tmp_path):
    # diacritic folding and case sensitivity are independent options
    # (as in Mongo), and a fold-only match carries a REAL BM25 score —
    # not 0 — so $meta relevance sorts rank it properly
    eng = Engine(spark, workdir=str(tmp_path / "textf"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "f1", "text": "un café crème"},
        {"_id": "f2", "text": "plain cafe here"},
        {"_id": "f3", "text": "Cafe Capitalized"},
    ])
    # caseSensitive still folds: f3 excluded by CASE only
    got = c.find({"$text": {"$search": "cafe", "$caseSensitive": True}}).all()
    assert ids(got) == ["f1", "f2"]
    # fold-matched docs all score > 0
    scored = {
        r["_id"]: r["sc"]
        for r in c.find({"$text": {"$search": "café"}})
        .select({"_id": 1, "sc": {"$meta": "textScore"}}).all()
    }
    assert set(scored) == {"f1", "f2", "f3"}
    assert all(v > 0 for v in scored.values()), scored
    # both sensitivities together = exact match only
    got = c.find({"$text": {"$search": "cafe", "$caseSensitive": True,
                            "$diacriticSensitive": True}}).all()
    assert ids(got) == ["f2"]


def test_text_case_sensitive_capitals_not_stem_folded(spark, tmp_path):
    # review round 8: the case-preserving analyzer must not let the
    # stemmer's internal lowercase machinery corrupt capitals —
    # 'Yellow' and 'yellow' are DIFFERENT terms under $caseSensitive
    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([
        {"_id": "cap", "text": "Yellow fields"},
        {"_id": "low", "text": "yellow fields"},
    ])
    spec = {"$search": "yellow", "$caseSensitive": True,
            "$language": "english"}
    assert ids(c.find({"$text": spec}).all()) == ["low"]
    spec["$search"] = "Yellow"
    assert ids(c.find({"$text": spec}).all()) == ["cap"]


def test_text_case_sensitive_scores_nonzero(spark, tmp_path):
    # review round 8: case-sensitive english queries must score the
    # case-folded stream with case-insensitively analyzed terms —
    # 'RUNNING' matches docs containing 'RUNNING' and their textScore
    # is the real BM25 of stem 'run', not 0
    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([
        {"_id": "a", "text": "RUNNING fast RUNNING far"},
        {"_id": "b", "text": "running slow"},
        {"_id": "c", "text": "walking"},
    ])
    rows = c.find(
        {"$text": {"$search": "RUNNING", "$caseSensitive": True,
                   "$language": "english"}}
    ).select({"_id": 1, "s": {"$meta": "textScore"}}).all()
    assert ids(rows) == ["a"]
    assert rows[0]["s"] > 0.0


def test_bm25_index_analyzer_version_staleness(spark, tmp_path):
    # review round 8: a stemmer upgrade invalidates persisted english
    # term tables — the stamp surfaces it as stale + a warning
    import json
    import os
    import warnings

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([{"_id": "a", "text": "ponies running"}])
    c.create_search_index("txt", {"kind": "bm25", "path": "text",
                                  "default_language": "english"})
    assert c.search_index_status("txt")["stale"] is False
    # simulate an index built by the previous analyzer generation
    p = os.path.join(c._search_index_dir(), "txt.json")
    with open(p) as fh:
        d = json.load(fh)
    d["analyzer_version"] = "s-stem-v0"
    with open(p, "w") as fh:
        json.dump(d, fh)
    assert c.search_index_status("txt")["stale"] is True
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        c._load_search_index("txt")
    assert any("older text analyzer" in str(w.message) for w in caught)
