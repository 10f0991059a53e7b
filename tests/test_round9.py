"""Round 9: $facet byte cap + configurable row backstop, and the
inverted-postings $text index query path."""

import pytest

from pyspark.sql import functions as F

from anser_spark.plans.pipeline import compile_pipeline


# ---------------------------------------------------------------------------
# $facet: 16 MB byte cap (Mongo analogue) + configurable row backstop
# ---------------------------------------------------------------------------


def test_facet_byte_cap_raises(spark, monkeypatch):
    import anser_spark.plans.pipeline as P

    # a handful of large documents: under any row cap, over the bytes
    monkeypatch.setattr(P, "_FACET_MAX_BYTES_PER_LEG", 10_000)
    df = spark.range(5).selectExpr(
        "id as _id", "repeat('x', 10000) as blob"
    )
    bad = compile_pipeline(df, [{"$facet": {
        "raw": [{"$project": {"_id": 1, "blob": 1}}],
    }}], None, None)
    with pytest.raises(Exception, match="exceeds 16 MB"):
        bad.collect()
    # an aggregating leg over the same input stays fine
    ok = compile_pipeline(df, [{"$facet": {
        "n": [{"$count": "n"}],
    }}], None, None).collect()
    assert ok[0]["n"][0]["n"] == 5


def test_facet_row_cap_is_session_configurable(spark, monkeypatch):
    import anser_spark.plans.pipeline as P

    monkeypatch.setattr(P, "_FACET_MAX_ROWS_PER_LEG", 10)
    df = spark.range(50).selectExpr("id as _id")
    stages = [{"$facet": {"raw": [{"$project": {"_id": 1}}]}}]
    with pytest.raises(Exception, match="more than 10 documents"):
        compile_pipeline(df, stages, None, None).collect()
    # raising the session conf admits the same leg (sums far under 16MB)
    spark.conf.set("spark.anser.facet.maxRowsPerLeg", "1000")
    try:
        out = compile_pipeline(df, stages, None, None).collect()
        assert len(out[0]["raw"]) == 50
    finally:
        spark.conf.unset("spark.anser.facet.maxRowsPerLeg")


# ---------------------------------------------------------------------------
# inverted-postings $text index (round 9)
# ---------------------------------------------------------------------------

from anser_spark.engine import Engine

TEXT_DOCS = [
    {"_id": "d1", "text": "Spark runs the running clusters quickly", "lang": "en"},
    {"_id": "d2", "text": "mongo queries many documents", "lang": "en"},
    {"_id": "d3", "text": "spark and mongo run together", "lang": "en"},
    {"_id": "d4", "text": "Crème brûlée résumé data", "lang": "fr"},
    {"_id": "d5", "text": "creme brulee resume data data", "lang": "fr"},
    {"_id": "d6", "text": None, "lang": "de"},
    {"_id": "d7", "text": "unrelated content entirely", "lang": "en"},
]


@pytest.fixture()
def tcoll(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9text"))
    c = eng.db("t").collection("docs")
    c.insert_many(TEXT_DOCS)
    return c


def _scores(coll, spec):
    rows = (
        coll.find({"$text": spec})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .all()
    )
    return {r["_id"]: r["s"] for r in rows}


@pytest.mark.parametrize("language", ["none", "english"])
@pytest.mark.parametrize("spec", [
    {"$search": "spark mongo"},
    {"$search": "running quickly"},            # stemming (english)
    {"$search": "spark -mongo"},               # negation
    {"$search": '"and mongo" spark'},          # phrase + term
    {"$search": "résumé data"},                # diacritic folding both ways
    {"$search": "resume data", "$diacriticSensitive": True},
])
def test_postings_path_matches_scan_path(tcoll, spec, language):
    # the scan path (no index) and the postings path (fresh index) must
    # agree on the matched rows, and — whenever every query stem exists
    # unfolded in the corpus — on scores too.  Accent-bridging queries
    # hit the DOCUMENTED indexed-stats divergence (a folded term absent
    # from the raw term table reads df=0), which predates this round
    # and applies to scan-with-index identically; exact indexed-vs-
    # postings parity is asserted in the function-level test below.
    accent_bridging = "résumé" in spec["$search"]
    base = _scores(tcoll, dict(spec, **{"$language": language}))
    tcoll.create_search_index(
        "t9", {"kind": "bm25", "path": "text", "default_language": language}
    )
    d = tcoll._fresh_bm25_index(tcoll.df().limit(1))
    assert d is not None and d.get("postings_dir"), "postings must build"
    indexed = _scores(tcoll, dict(spec, **{"$language": language}))
    tcoll.drop_search_index("t9")
    assert base.keys() == indexed.keys()
    if not accent_bridging:
        for k, v in base.items():
            assert indexed[k] == pytest.approx(v, rel=1e-9), (k, spec)


def test_postings_function_is_exact_vs_indexed_scan(tcoll):
    # bit-exact parity of the two INDEX-BACKED paths, accents included:
    # same stats source, same term order, same float association
    from anser_spark.operators.ranking import (
        text_match_frame,
        text_match_postings,
        _TOKS_FOLD,
        _TOKS_RAW,
    )
    from pyspark.sql import functions as FF

    tcoll.create_search_index(
        "t9x", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    df = tcoll.df()
    d = tcoll._fresh_bm25_index(df)
    assert d and d.get("postings_dir")
    text_col, stats_loader, language = tcoll._text_index_info(df)
    for search in ["brûlée data", "running -mongo", "data resume",
                   '"data" creme']:
        spec = {"$search": search}
        pred, score, prep = text_match_frame(
            df, spec, text_col, stats_loader, default_language=language
        )
        scan = {
            r["_id"]: r["s"]
            for r in prep.withColumn("s", score.cast("double"))
            .where(FF.coalesce(pred, FF.lit(False)))
            .drop(_TOKS_RAW, _TOKS_FOLD)
            .select("_id", "s")
            .collect()
        }
        post_df = text_match_postings(df, spec, d, score_col="s")
        assert post_df is not None, search
        post = {r["_id"]: r["s"] for r in post_df.select("_id", "s").collect()}
        assert scan == post, (search, scan, post)  # EXACT equality


def test_postings_ineligible_shapes_fall_back(tcoll):
    from anser_spark.operators.ranking import text_match_postings

    tcoll.create_search_index(
        "t9f", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    df = tcoll.df()
    d = tcoll._fresh_bm25_index(df)
    assert d and d.get("postings_dir")
    # case-sensitive: postings store the case-folded analysis
    assert text_match_postings(
        df, {"$search": "Spark", "$caseSensitive": True}, d) is None
    # query language differs from the index analyzer
    assert text_match_postings(
        df, {"$search": "spark", "$language": "none"}, d) is None
    # nothing positive after analysis (stopword-only phrase)
    assert text_match_postings(df, {"$search": '"the and"'}, d) is None
    # ...but the e2e path still answers all of these via the scan path
    rows = tcoll.find(
        {"$text": {"$search": "Spark", "$caseSensitive": True}}
    ).all()
    assert sorted(r["_id"] for r in rows) == ["d1"]


def test_postings_skipped_for_duplicate_ids(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9dup"))
    c = eng.db("t").collection("dups")
    c.insert_many([
        {"_id": "same", "text": "spark one"},
        {"_id": "same", "text": "spark two"},
        {"_id": "other", "text": "mongo three"},
    ])
    c.create_search_index("di", {"kind": "bm25", "path": "text"})
    d = c._fresh_bm25_index(c.df())
    assert d is not None and not d.get("postings_dir")
    # queries still work through the stats-only scan path
    assert c.find({"$text": {"$search": "spark"}}).count() == 2


def test_postings_plan_has_no_python_and_pushes_terms(tcoll):
    # the 100 TB receipts: term lookup pushed to the postings parquet
    # scan, and NO Python kernel anywhere in the query plan
    tcoll.create_search_index(
        "t9p", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    df = (
        tcoll.find({"$text": {"$search": "running data"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .to_df()
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "PushedFilters" in plan
    pushed = [seg[:300] for seg in plan.split("PushedFilters")[1:]]
    assert any("term_fold" in seg for seg in pushed), pushed


def test_postings_index_survives_language_none(tcoll):
    # 'none' analyzer postings: whitespace+lower tokens, same parity
    base = _scores(tcoll, {"$search": "spark mongo"})
    tcoll.create_search_index("t9n", {"kind": "bm25", "path": "text"})
    indexed = _scores(tcoll, {"$search": "spark mongo"})
    assert base.keys() == indexed.keys()
    for k, v in base.items():
        assert indexed[k] == pytest.approx(v, rel=1e-9)


import os as _os

@pytest.mark.parametrize(
    "seed", sorted({0, 42, 777, int(_os.environ.get("SPARK_GRAFT_FUZZ_SEED", "0"))})
)
def test_postings_differential_fuzz(spark, tmp_path, seed):
    # randomized corpus (accents, case, morphology) × random query
    # shapes (phrases, negation, diacritic flag): the postings path
    # must EXACTLY reproduce the indexed scan path — same matched ids,
    # same float scores
    import random

    from pyspark.sql import functions as FF

    from anser_spark.operators.ranking import (
        text_match_frame,
        text_match_postings,
        _TOKS_FOLD,
        _TOKS_RAW,
    )

    rng = random.Random(seed)
    vocab = [
        "spark", "mongo", "data", "dáta", "query", "queries", "running",
        "run", "runs", "cluster", "clusters", "résumé", "resume", "brûlée",
        "the", "and", "of", "quickly", "owns", "documents", "pipeline",
    ]
    docs = []
    for i in range(60):
        n = rng.randint(0, 12)
        docs.append({
            "_id": f"x{i}",
            "text": " ".join(rng.choice(vocab) for _ in range(n)) if n else None,
        })
    eng = Engine(spark, workdir=str(tmp_path / f"fz{seed}"))
    c = eng.db("t").collection("fuzz")
    c.insert_many(docs)
    language = rng.choice(["none", "english"])
    c.create_search_index(
        "fzi", {"kind": "bm25", "path": "text", "default_language": language}
    )
    df = c.df()
    d = c._fresh_bm25_index(df)
    assert d and d.get("postings_dir")
    text_col, stats_loader, _lang = c._text_index_info(df)

    checked = 0
    for _trial in range(12):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 4))]
        parts = list(words)
        if rng.random() < 0.4:
            parts.append('"%s"' % " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 2))))
        if rng.random() < 0.4:
            parts.append("-" + rng.choice(vocab))
        spec = {"$search": " ".join(parts)}
        if rng.random() < 0.3:
            spec["$diacriticSensitive"] = True
        post_df = text_match_postings(df, spec, d, score_col="s")
        if post_df is None:
            continue  # ineligible shape — scan path covers it
        pred, score, prep = text_match_frame(
            df, spec, text_col, stats_loader, default_language=language
        )
        scan = {
            r["_id"]: r["s"]
            for r in prep.withColumn("s", score.cast("double"))
            .where(FF.coalesce(pred, FF.lit(False)))
            .drop(_TOKS_RAW, _TOKS_FOLD)
            .select("_id", "s")
            .collect()
        }
        post = {r["_id"]: r["s"] for r in post_df.select("_id", "s").collect()}
        assert scan == post, (spec, language, seed)
        checked += 1
    assert checked >= 6  # the fuzz must actually exercise the path


def test_stale_index_keeps_analyzer_language(spark, tmp_path):
    # round 9: a mutation makes the index's STATS stale, but the text
    # column + analyzer language are standing user intent (Mongo's
    # $text always analyzes with the text index's language) — english
    # stemming must not silently revert to exact-token matching
    eng = Engine(spark, workdir=str(tmp_path / "r9stale"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": 0, "text": "the running cluster"},
        {"_id": 1, "text": "run it again"},
        {"_id": 2, "text": "nothing here"},
    ])
    c.create_search_index(
        "ix", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "runs"}}).all()
    ) == [0, 1]
    # mutate → stale stats; language must survive on BOTH query paths
    c.insert_many([{"_id": 9, "text": "running shoes"}])
    assert c.search_index_status("ix")["stale"] is True
    got = sorted(r["_id"] for r in c.find({"$text": {"$search": "runs"}}).all())
    assert got == [0, 1, 9], got
    got = sorted(r["_id"] for r in c.pipe([
        {"$match": {"$text": {"$search": "runs -shoes"}}},
        {"$project": {"_id": 1}},
    ]).all())
    assert got == [0, 1], got


def test_search_text_postings_parity_and_options(spark, tmp_path):
    # $search text via a named postings index == the same stage with no
    # index (inline stats over the unchanged corpus are identical), and
    # boost/constant score options apply on top of the postings BM25
    eng = Engine(spark, workdir=str(tmp_path / "r9s"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": i, "text": t} for i, t in enumerate([
            "the running cluster runs", "run it again", "nothing here",
            "spark running fast", None,
        ])
    ])
    stage = {"text": {"query": "Running runs", "path": "text",
                      "analyzer": "lucene.english"}}
    base = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage)},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert base and all(v > 0 for v in base.values())
    c.create_search_index("sx", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    indexed = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage, index="sx")},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert base == indexed  # EXACT: same stats, same float association
    # boost multiplies, constant replaces
    boosted = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": {"index": "sx", "text": {
            **stage["text"], "score": {"boost": {"value": 3.0}}}}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert boosted == {k: pytest.approx(3 * v) for k, v in base.items()}
    const = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": {"index": "sx", "text": {
            **stage["text"], "score": {"constant": {"value": 7.0}}}}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert const == {k: 7.0 for k in base}
    # analyzer mismatch with the index language falls back to the scan
    # path and still answers (standard analyzer: exact tokens)
    std = c.pipe([
        {"$search": {"index": "sx", "text": {"query": "runs",
                                             "path": "text"}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in std) == [0]


def test_search_meta_count_from_postings(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9sm"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": i, "text": t} for i, t in enumerate([
            "the running cluster", "run it again", "nothing here", None,
        ])
    ])
    meta = {"text": {"query": "runs", "path": "text",
                     "analyzer": "lucene.english"}}
    base = c.pipe([{"$searchMeta": dict(meta)}]).all()
    assert base[0]["count"]["total"] == 2
    c.create_search_index("smx", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    via_index = c.pipe([{"$searchMeta": dict(meta, index="smx")}]).all()
    assert via_index[0]["count"]["total"] == 2
    # stopword-only query counts zero on both paths
    stop = {"text": {"query": "the and", "path": "text",
                     "analyzer": "lucene.english"}}
    assert c.pipe([{"$searchMeta": dict(stop)}]).all()[0]["count"]["total"] == 0
    assert c.pipe([
        {"$searchMeta": dict(stop, index="smx")}
    ]).all()[0]["count"]["total"] == 0


def test_search_text_postings_plan_no_python(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9sp"))
    c = eng.db("t").collection("docs")
    c.insert_many([{"_id": i, "text": f"running word{i}"} for i in range(8)])
    c.create_search_index("px", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    df = c.pipe([
        {"$search": {"index": "px", "text": {
            "query": "runs", "path": "text", "analyzer": "lucene.english"}}},
    ]).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# incremental index maintenance (refresh_search_index)
# ---------------------------------------------------------------------------


def _index_state(c, spark, name):
    d = dict(c._load_search_index(name, warn_stale=False))
    terms = {
        (r["term"], r["df"])
        for r in spark.read.parquet(d["terms_dir"]).collect()
    }
    pdirs = [d["postings_dir"], *(d.get("postings_deltas") or [])]
    postings = {
        (r["id"], r["term"], r["tf"], r["n_tokens"])
        for r in spark.read.parquet(*pdirs).collect()
    }
    stats = {k: d[k] for k in ("n_docs", "avgdl", "sum_tokens", "n_text_docs")}
    return terms, postings, stats


def test_refresh_incremental_equals_rebuild(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9ri"))
    c = eng.db("t").collection("docs")
    c.set_retention(4)  # incremental refresh diffs against built_at
    c.insert_many([
        {"_id": 0, "text": "the running cluster"},
        {"_id": 1, "text": "run it again"},
        {"_id": 2, "text": None},
    ])
    spec = {"kind": "bm25", "path": "text", "default_language": "english"}
    c.create_search_index("rx", dict(spec))
    assert c.refresh_search_index("rx") == {"mode": "noop", "inserted": 0}
    # insert-only delta → incremental, and the result is EXACTLY a
    # fresh build: same term table, same postings, same stats
    c.insert_many([
        {"_id": 3, "text": "clusters running éverywhere"},
        {"_id": 4, "text": None},
    ])
    out = c.refresh_search_index("rx")
    assert out == {"mode": "incremental", "inserted": 2}
    assert c.search_index_status("rx")["stale"] is False
    inc = _index_state(c, spark, "rx")
    c.create_search_index("rx2", dict(spec))
    full = _index_state(c, spark, "rx2")
    assert inc[0] == full[0]   # term table
    assert inc[1] == full[1]   # postings
    assert inc[2] == full[2]   # n_docs / avgdl / token totals
    # and queries take the postings path with correct scores
    got = {
        r["_id"]: r["s"]
        for r in c.find({"$text": {"$search": "runs"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}}).all()
    }
    assert sorted(got) == [0, 1, 3]


def test_refresh_falls_back_on_update_and_dup_ids(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9rf"))
    c = eng.db("t").collection("docs")
    c.set_retention(4)
    c.insert_many([{"_id": i, "text": f"spark doc {i}"} for i in range(4)])
    c.create_search_index("fx", {"kind": "bm25", "path": "text"})
    # round 11: an update no longer forces a rebuild — the mutation
    # manifest nets it into one tombstone + one re-insert
    c.update_all({"_id": 1}, {"$set": {"text": "mongo doc 1"}})
    out = c.refresh_search_index("fx")
    assert out["mode"] == "incremental" and out.get("tombstoned") == 1
    assert c.search_index_status("fx")["stale"] is False
    assert c.find({"$text": {"$search": "mongo"}}).count() == 1
    assert c.find({"$text": {"$search": "spark"}}).count() == 3
    # duplicate ids arriving → rebuild, postings dropped, scan path
    c.insert_many([{"_id": 1, "text": "spark dup"}])
    assert c.refresh_search_index("fx")["mode"] == "rebuild"
    d = c._load_search_index("fx", warn_stale=False)
    assert not d.get("postings_dir")
    assert c.find({"$text": {"$search": "dup"}}).count() == 1


def test_refresh_ivf(spark, tmp_path):
    # round 12: an in-distribution append refreshes INCREMENTALLY
    # (fixed centroids, staged cells delta) instead of retraining
    import numpy as np

    eng = Engine(spark, workdir=str(tmp_path / "r9rv"))
    c = eng.db("t").collection("vecs")
    rng = np.random.default_rng(3)
    c.insert_many([
        {"_id": i, "embedding": [float(x) for x in rng.normal(size=4)]}
        for i in range(50)
    ])
    c.create_search_index("vx", {"kind": "ivf", "path": "embedding", "nlist": 4})
    c.insert_many([{"_id": 99, "embedding": [0.0, 0.0, 0.0, 1.0]}])
    assert c.refresh_search_index("vx")["mode"] == "incremental"
    assert c.search_index_status("vx")["stale"] is False


def test_postings_escape_hatch_conf(tcoll, spark):
    from anser_spark.operators.ranking import text_match_postings

    tcoll.create_search_index(
        "eh", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    df = tcoll.df()
    d = tcoll._fresh_bm25_index(df)
    assert text_match_postings(df, {"$search": "running"}, d) is not None
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        # forced back to the scan path — results still correct
        assert text_match_postings(df, {"$search": "running"}, d) is None
        got = sorted(
            r["_id"] for r in tcoll.find({"$text": {"$search": "running"}}).all()
        )
        assert got == ["d1", "d3"]
    finally:
        spark.conf.unset("spark.anser.text.usePostings")


@pytest.mark.parametrize("seed", [7, 1234])
def test_refresh_metamorphic_fuzz(spark, tmp_path, seed):
    # interleave random insert batches with refreshes: after every
    # refresh the index must be indistinguishable from a fresh build
    # (same stats, same query answers through the postings path)
    import random

    rng = random.Random(seed)
    vocab = ["spark", "running", "run", "data", "dáta", "query",
             "queries", "the", "and", "cluster", "résumé"]
    eng = Engine(spark, workdir=str(tmp_path / f"rmf{seed}"))
    c = eng.db("t").collection("docs")
    c.set_retention(6)
    next_id = 0

    def batch(k):
        nonlocal next_id
        docs = []
        for _ in range(k):
            n = rng.randint(0, 8)
            docs.append({
                "_id": next_id,
                "text": " ".join(rng.choice(vocab) for _ in range(n)) if n else None,
            })
            next_id += 1
        c.insert_many(docs)

    batch(10)
    language = rng.choice(["none", "english"])
    c.create_search_index("mf", {
        "kind": "bm25", "path": "text", "default_language": language,
    })
    for round_i in range(3):
        batch(rng.randint(1, 6))
        out = c.refresh_search_index("mf")
        assert out["mode"] == "incremental", (round_i, out)
        d_inc = dict(c._load_search_index("mf", warn_stale=False))
        c.create_search_index("mf_ref", {
            "kind": "bm25", "path": "text", "default_language": language,
        })
        d_ref = dict(c._load_search_index("mf_ref", warn_stale=False))
        for key in ("n_docs", "avgdl", "sum_tokens", "n_text_docs"):
            assert d_inc[key] == d_ref[key], (round_i, key)
        q = {"$search": " ".join(rng.choice(vocab) for _ in range(2))}
        from anser_spark.operators.ranking import text_match_postings
        a = text_match_postings(c.df(), dict(q), d_inc, score_col="s")
        b = text_match_postings(c.df(), dict(q), d_ref, score_col="s")
        if a is None or b is None:
            assert a is None and b is None
            continue
        got_a = {(r["_id"], r["s"]) for r in a.select("_id", "s").collect()}
        got_b = {(r["_id"], r["s"]) for r in b.select("_id", "s").collect()}
        assert got_a == got_b, (round_i, q)


# ---------------------------------------------------------------------------
# AIFF / AU audio decode (round 9: the remaining stdlib-expressible audio)
# ---------------------------------------------------------------------------


def _f80(x):
    # encode a positive int as 80-bit IEEE extended (sign/15-exp/64-mant)
    import struct

    assert x > 0
    e = x.bit_length() - 1
    mant = x << (63 - e)
    return struct.pack(">HQ", e + 16383, mant)


def _make_aiff(samples, sr, ch=1, bits=16, form=b"AIFF", ctype=None):
    import struct

    width = bits // 8
    if ctype == b"sowt":
        data = b"".join(int(s).to_bytes(width, "little", signed=True)
                        for s in samples)
    else:
        data = b"".join(int(s).to_bytes(width, "big", signed=True)
                        for s in samples)
    nframes = len(samples) // ch
    comm = struct.pack(">HIH", ch, nframes, bits) + _f80(sr)
    if form == b"AIFC":
        comm += (ctype or b"NONE") + b"\x00\x00"
    ssnd = struct.pack(">II", 0, 0) + data
    body = form
    for cid, c in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(c)) + c
        if len(c) & 1:
            body += b"\x00"
    return b"FORM" + struct.pack(">I", len(body)) + body


def _make_au(data, enc, sr, ch=1):
    import struct

    return (b".snd" + struct.pack(">IIIII", 24, len(data), enc, sr, ch)
            + data)


def test_decode_aiff_golden():
    import numpy as np

    from anser_spark.operators.multimodal import decode_aiff, decode_audio

    # full-scale square wave: rms == peak == 1.0 exactly
    samples = [32768 // 2, -32768 // 2] * 50  # half scale
    got = decode_aiff(_make_aiff(samples, 8000))
    assert got is not None
    assert got["sample_rate"] == 8000 and got["n_channels"] == 1
    assert got["n_frames"] == 100 and got["duration_ms"] == 12
    assert got["peak"] == pytest.approx(0.5) and got["rms"] == pytest.approx(0.5)
    # dispatch routes FORM magic
    assert decode_audio(_make_aiff(samples, 8000)) == got
    # 8-bit, 24-bit, 32-bit widths
    for bits, scale in ((8, 1 << 7), (24, 1 << 23), (32, 1 << 31)):
        s = [scale // 4, -scale // 4] * 8
        got = decode_aiff(_make_aiff(s, 44100, bits=bits))
        assert got is not None and got["peak"] == pytest.approx(0.25), bits
    # AIFC NONE (big-endian) and sowt (little-endian) agree
    a = decode_aiff(_make_aiff(samples, 8000, form=b"AIFC", ctype=b"NONE"))
    b = decode_aiff(_make_aiff(samples, 8000, form=b"AIFC", ctype=b"sowt"))
    assert a == b == decode_aiff(_make_aiff(samples, 8000))
    # stereo frame accounting
    got = decode_aiff(_make_aiff(samples, 8000, ch=2))
    assert got["n_frames"] == 50 and got["n_channels"] == 2
    # corrupt / unsupported → None, never raise
    assert decode_aiff(b"FORM\x00\x00\x00\x04AIFF") is None
    assert decode_aiff(_make_aiff(samples, 8000)[:-30][:40]) is None
    assert decode_aiff(
        _make_aiff(samples, 8000, form=b"AIFC", ctype=b"ima4")) is None


def test_decode_au_golden():
    import struct

    import numpy as np

    from anser_spark.operators.multimodal import decode_au, decode_audio

    # 16-bit linear PCM big-endian
    pcm = b"".join(struct.pack(">h", v) for v in [16384, -16384] * 20)
    got = decode_au(_make_au(pcm, 3, 16000))
    assert got is not None and got["sample_rate"] == 16000
    assert got["n_frames"] == 40
    assert got["peak"] == pytest.approx(0.5) and got["rms"] == pytest.approx(0.5)
    assert decode_audio(_make_au(pcm, 3, 16000)) == got
    # float32 passthrough
    f32 = b"".join(struct.pack(">f", v) for v in [0.25, -0.25] * 10)
    got = decode_au(_make_au(f32, 6, 8000))
    assert got["peak"] == pytest.approx(0.25)
    # µ-law: byte 0x80 is +max (u=0x7F → exp 7, mant 15 → 32124),
    # byte 0xFF is zero
    got = decode_au(_make_au(b"\x80\xff\xff\xff", 1, 8000))
    assert got["peak"] == pytest.approx(1.0)
    assert got["rms"] == pytest.approx(0.5)
    # 0x00 is -max (sign bit set after complement)
    got = decode_au(_make_au(b"\x00", 1, 8000))
    assert got["peak"] == pytest.approx(1.0)
    # unsupported encoding (ADPCM=23), bad magic, truncated → None
    assert decode_au(_make_au(pcm, 23, 8000)) is None
    assert decode_au(b"NOPE" + bytes(30)) is None
    assert decode_au(b".snd" + bytes(4)) is None


def test_extract_audio_features_dispatch(spark):
    import struct

    from anser_spark.operators.multimodal import extract_audio_features

    pcm = b"".join(struct.pack(">h", v) for v in [8192, -8192] * 10)
    rows = [
        ("aiff", bytearray(_make_aiff([8192, -8192] * 10, 22050))),
        ("au", bytearray(_make_au(pcm, 3, 22050))),
        ("junk", bytearray(b"not audio at all")),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert got["aiff"]["sample_rate"] == 22050
    assert got["au"]["sample_rate"] == 22050
    assert got["aiff"]["rms"] == pytest.approx(got["au"]["rms"])
    assert got["junk"]["sample_rate"] is None
    assert got["none"]["sample_rate"] is None


def test_refresh_minhash_incremental_appends(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9mh"))
    c = eng.db("t").collection("docs")
    c.set_retention(4)
    texts = [
        "the quick brown fox jumps over the lazy dog today",
        "a completely different document about sparks and data",
        "the quick brown fox jumps over the lazy dog tonight",
    ]
    c.insert_many([{"_id": i, "text": t} for i, t in enumerate(texts)])
    c.create_search_index("mh", {
        "kind": "minhash", "id_col": "_id", "numHashes": 32,
        "bands": 16, "k": 3,
    })
    assert c.refresh_search_index("mh") == {"mode": "noop", "inserted": 0}
    # insert a near-duplicate of doc 0 → incremental append
    c.insert_many([{
        "_id": 9,
        "text": "the quick brown fox jumps over the lazy dog today!",
    }])
    out = c.refresh_search_index("mh")
    assert out == {"mode": "incremental", "inserted": 1}
    assert c.search_index_status("mh")["stale"] is False
    d = dict(c._load_search_index("mh", warn_stale=False))
    # the appended tables equal a fresh rebuild (signatures are
    # per-document deterministic under the same seed)
    c.create_search_index("mh2", {
        "kind": "minhash", "id_col": "_id", "numHashes": 32,
        "bands": 16, "k": 3,
    })
    d2 = dict(c._load_search_index("mh2", warn_stale=False))
    sig_a = {
        (r["_id"], tuple(r["__minhash"]), tuple(sorted(r["__shash"])))
        for r in spark.read.parquet(
            d["sig_dir"], *(d.get("sig_deltas") or [])
        ).collect()
    }
    sig_b = {
        (r["_id"], tuple(r["__minhash"]), tuple(sorted(r["__shash"])))
        for r in spark.read.parquet(d2["sig_dir"]).collect()
    }
    assert sig_a == sig_b and len(sig_a) == 4
    bands_a = {
        tuple(r) for r in spark.read.parquet(
            d["bands_dir"], *(d.get("bands_deltas") or [])
        ).collect()
    }
    bands_b = {
        tuple(r) for r in spark.read.parquet(d2["bands_dir"]).collect()
    }
    assert bands_a == bands_b
    # round 11: an update refreshes incrementally (tombstone + re-sign)
    c.update_all({"_id": 1}, {"$set": {"text": "rewritten entirely"}})
    out = c.refresh_search_index("mh")
    assert out["mode"] == "incremental" and out.get("tombstoned") == 1
    from anser_spark.engine import _read_index_table
    d3 = dict(c._load_search_index("mh", warn_stale=False))
    live = _read_index_table(spark, d3, "sig_dir", "sig_deltas")
    assert live.count() == 4  # old signature dead, new one live


def test_audio_decode_header_edge_cases():
    import struct

    from anser_spark.operators.multimodal import decode_aiff, decode_au

    # AU size field 0 means ZERO data bytes, not "unknown"
    pcm = b"".join(struct.pack(">h", v) for v in [100, -100] * 4)
    got = decode_au(b".snd" + struct.pack(">IIIII", 24, 0, 3, 8000, 1) + pcm)
    assert got is not None and got["n_frames"] == 0 and got["rms"] == 0.0
    # 0xFFFFFFFF means unknown → use all payload bytes
    got = decode_au(
        b".snd" + struct.pack(">IIIII", 24, 0xFFFFFFFF, 3, 8000, 1) + pcm)
    assert got["n_frames"] == 8
    # AIFF with an infinity/NaN 80-bit sample rate → None, never raise
    comm = struct.pack(">HIH", 1, 4, 16) + struct.pack(">HQ", 0x7FFF, 1 << 63)
    ssnd = struct.pack(">II", 0, 0) + b"\x00" * 8
    body = b"AIFF"
    for cid, c in ((b"COMM", comm), (b"SSND", ssnd)):
        body += cid + struct.pack(">I", len(c)) + c
    bad = b"FORM" + struct.pack(">I", len(body)) + body
    assert decode_aiff(bad) is None


def test_search_compound_text_postings_parity(spark, tmp_path):
    # compound {must: [text, range], filter: [exists], mustNot:
    # [equals], should: [in]} — the common Atlas shape: with a fresh
    # index the text leg answers from postings and everything else
    # applies over the bounded candidates, scoring EXACTLY as the
    # scan compile
    eng = Engine(spark, workdir=str(tmp_path / "r9cp"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": i, "text": t, "views": i * 10,
         "cat": "a" if i % 2 else "b"}
        for i, t in enumerate([
            "the running cluster runs fast", "run it again later",
            "nothing here", "spark running quickly", "running on empty",
            None,
        ])
    ])
    stage = {"compound": {
        "must": [
            {"text": {"query": "running runs", "path": "text",
                      "analyzer": "lucene.english",
                      "score": {"boost": {"value": 2.0}}}},
            {"range": {"path": "views", "gte": 10}},
        ],
        "filter": [{"exists": {"path": "cat"}}],
        "mustNot": [{"equals": {"path": "cat", "value": "b"}}],
        "should": [{"in": {"path": "views", "value": [30, 40]}}],
    }}
    base = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage)},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert base  # the shape matches something
    c.create_search_index("cpx", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    indexed = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage, index="cpx")},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert base == indexed  # EXACT parity
    # plan: no Python kernel through the postings compound
    df = c.pipe([{"$search": dict(stage, index="cpx")}]).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # minimumShouldMatch pins the should clause on both paths
    stage2 = {"compound": {
        "must": [{"text": {"query": "running", "path": "text",
                           "analyzer": "lucene.english"}}],
        "should": [{"in": {"path": "views", "value": [30, 40]}}],
        "minimumShouldMatch": 1,
    }}
    a = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage2)},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    b = {r["_id"]: r["score"] for r in c.pipe([
        {"$search": dict(stage2, index="cpx")},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert a == b and set(a) == {3, 4}
    # ineligible shapes (two text clauses / phrase clause) fall back
    # and still answer
    tricky = {"compound": {"must": [
        {"text": {"query": "running", "path": "text",
                  "analyzer": "lucene.english"}},
        {"phrase": {"query": "on empty", "path": "text"}},
    ]}}
    a = sorted(r["_id"] for r in c.pipe([
        {"$search": dict(tricky, index="cpx")},
        {"$project": {"_id": 1}},
    ]).all())
    assert a == [4]


def test_streaming_ingest_then_incremental_index_refresh(spark, tmp_path):
    # the steady-state loop end to end: micro-batches stream into a
    # collection (exactly-once foreachBatch), then ONE
    # refresh_search_index call brings the postings index up to date
    # incrementally, and $text immediately answers from postings with
    # the new documents included
    import pandas as pd

    from anser_spark.streaming.ingest import stream_into_collection

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    eng = Engine(spark, workdir=str(tmp_path / "r9si"))
    c = eng.db("t").collection("docs")
    c.set_retention(6)

    def drop(name, rows):
        pd.DataFrame(rows).to_parquet(src / name)

    drop("b0.parquet", [
        {"_id": 0, "text": "the running cluster"},
        {"_id": 1, "text": "nothing to see"},
    ])
    schema = "_id bigint, text string"
    q = stream_into_collection(
        spark.readStream.schema(schema).parquet(str(src)),
        c, ckpt, available_now=True,
    )
    q.awaitTermination(120)
    c.create_search_index("six", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    assert sorted(
        r["_id"] for r in c.find({"$text": {"$search": "runs"}}).all()
    ) == [0]
    # second micro-batch arrives
    drop("b1.parquet", [
        {"_id": 2, "text": "it keeps running and running"},
        {"_id": 3, "text": "unrelated"},
    ])
    q = stream_into_collection(
        spark.readStream.schema(schema).parquet(str(src)),
        c, ckpt, available_now=True,
    )
    q.awaitTermination(120)
    out = c.refresh_search_index("six")
    assert out == {"mode": "incremental", "inserted": 2}
    assert c.search_index_status("six")["stale"] is False
    d = c._fresh_bm25_index(c.df())
    assert d and d.get("postings_dir")
    got = {
        r["_id"]: r["s"]
        for r in c.find({"$text": {"$search": "runs"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}}).all()
    }
    assert sorted(got) == [0, 2]
    # tf=2 for doc 2 ("running" twice) must outscore doc 0 at equal
    # idf — the refreshed postings carry real term frequencies
    assert got[2] > got[0]


def test_multifield_text_index_weights_now_build(spark, tmp_path):
    # round 11: multi-field weighted text indexes are IMPLEMENTED (the
    # round-9 correct-by-rejection contract is retired); bad specs
    # still raise loudly
    eng = Engine(spark, workdir=str(tmp_path / "r9wt"))
    c = eng.db("t").collection("docs")
    c.insert_many([{"_id": 0, "text": "spark", "title": "intro"}])
    c.create_search_index("w", {
        "kind": "bm25", "path": "text",
        "weights": {"title": 10, "text": 1},
    })
    d = c._load_search_index("w", warn_stale=False)
    assert d.get("weights") == {"title": 10.0, "text": 1.0}
    assert c.find({"$text": {"$search": "intro"}}).count() == 1
    with pytest.raises(ValueError, match="not on the collection"):
        c.create_search_index("w2", {
            "kind": "bm25", "weights": {"nope": 1},
        })


def test_search_meta_facets_via_postings(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r9smf"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": i, "text": t, "lang": l, "views": i * 10}
        for i, (t, l) in enumerate([
            ("the running cluster", "en"), ("run it", "en"),
            ("nothing", "de"), ("keeps running fast", "fr"), (None, "de"),
        ])
    ])
    meta = {"facet": {
        "operator": {"text": {"query": "runs", "path": "text",
                              "analyzer": "lucene.english"}},
        "facets": {
            "by_lang": {"type": "string", "path": "lang"},
            "by_views": {"type": "number", "path": "views",
                         "boundaries": [0, 15, 100]},
        },
    }}
    base = c.pipe([{"$searchMeta": dict(meta)}]).all()[0]
    c.create_search_index("smf", {
        "kind": "bm25", "path": "text", "default_language": "english",
    })
    via = c.pipe([{"$searchMeta": dict(meta, index="smf")}]).all()[0]
    assert base["count"]["total"] == via["count"]["total"] == 3
    for k in ("facet_by_lang", "facet_by_views"):
        assert sorted(map(tuple, base[k])) == sorted(map(tuple, via[k])), k
