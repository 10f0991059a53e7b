"""Round 10: the $searchMeta escape-hatch zero-count fix (round-9
VERDICT bug #1) plus hatch-on/off differentials over EVERY
postings-answering surface, O(delta) index refresh via insert
manifests, crash-safe staged refresh publishes, postings compaction,
single-job $searchMeta, date facets, and the cost-based
postings-vs-scan choice."""

import contextlib

import pytest

from anser_spark.engine import Engine

DOCS = [
    {"_id": i, "text": t, "lang": l, "views": i * 10}
    for i, (t, l) in enumerate([
        ("the running cluster", "en"),
        ("run it again", "en"),
        ("nothing here", "de"),
        ("keeps running fast", "fr"),
        (None, "de"),
        ("spark running quickly", "en"),
    ])
]


@pytest.fixture()
def icoll(spark, tmp_path):
    eng = Engine(spark, workdir=str(tmp_path / "r10"))
    c = eng.db("t").collection("docs")
    c.insert_many(DOCS)
    c.create_search_index(
        "ix", {"kind": "bm25", "path": "text", "default_language": "english"}
    )
    return c


@contextlib.contextmanager
def _hatch_off(spark):
    spark.conf.set("spark.anser.text.usePostings", "false")
    try:
        yield
    finally:
        spark.conf.unset("spark.anser.text.usePostings")


_TEXT = {"query": "runs", "path": "text", "analyzer": "lucene.english"}


def _find_text(c):
    rows = (
        c.find({"$text": {"$search": "runs"}})
        .select({"_id": 1, "s": {"$meta": "textScore"}})
        .all()
    )
    return sorted((r["_id"], round(r["s"], 12)) for r in rows)


def _match_text(c):
    rows = c.pipe([
        {"$match": {"$text": {"$search": "running quickly"}}},
        {"$project": {"_id": 1}},
    ]).all()
    return sorted(r["_id"] for r in rows)


def _search_text(c):
    rows = c.pipe([
        {"$search": {"index": "ix", "text": dict(_TEXT)}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()
    return sorted((r["_id"], round(r["score"], 12)) for r in rows)


def _search_compound(c):
    rows = c.pipe([
        {"$search": {"index": "ix", "compound": {
            "must": [
                {"text": dict(_TEXT)},
                {"range": {"path": "views", "gte": 10}},
            ],
            "mustNot": [{"equals": {"path": "lang", "value": "de"}}],
        }}},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()
    return sorted((r["_id"], round(r["score"], 12)) for r in rows)


def _search_meta_count(c):
    out = c.pipe([
        {"$searchMeta": {"text": dict(_TEXT), "index": "ix"}}
    ]).all()
    return out[0]["count"]["total"]


def _search_meta_facets(c):
    out = c.pipe([{"$searchMeta": {"facet": {
        "operator": {"text": dict(_TEXT)},
        "facets": {
            "by_lang": {"type": "string", "path": "lang"},
            "by_views": {"type": "number", "path": "views",
                         "boundaries": [0, 15, 100]},
        },
    }, "index": "ix"}}]).all()[0]
    return (
        out["count"]["total"],
        sorted(map(tuple, out["facet_by_lang"])),
        sorted(map(tuple, out["facet_by_views"])),
    )


_SURFACES = [
    ("find_text", _find_text),
    ("match_text", _match_text),
    ("search_text", _search_text),
    ("search_compound", _search_compound),
    ("search_meta_count", _search_meta_count),
    ("search_meta_facets", _search_meta_facets),
]


@pytest.mark.parametrize("name,run", _SURFACES, ids=[n for n, _ in _SURFACES])
def test_postings_hatch_differential(icoll, spark, name, run):
    # spark.anser.text.usePostings=false exists to rule the postings
    # table OUT while debugging — every postings-answering surface must
    # return the identical result through the scan path (round-9
    # VERDICT: the $searchMeta count path returned 0 instead)
    with_postings = run(icoll)
    with _hatch_off(spark):
        without = run(icoll)
    assert with_postings == without, name


def test_search_meta_count_hatch_regression(icoll, spark):
    # the exact round-9 repro: count-only $searchMeta under the hatch
    # must fall back to the scan, not report 0
    assert _search_meta_count(icoll) == 4
    with _hatch_off(spark):
        assert _search_meta_count(icoll) == 4
    # and the stopword-only short-circuit still answers 0 on BOTH paths
    stop = [{"$searchMeta": {
        "text": {"query": "the and", "path": "text",
                 "analyzer": "lucene.english"},
        "index": "ix",
    }}]
    assert icoll.pipe(stop).all()[0]["count"]["total"] == 0
    with _hatch_off(spark):
        assert icoll.pipe(stop).all()[0]["count"]["total"] == 0


# ---------------------------------------------------------------------------
# insert manifests → O(delta) refresh (round 10)
# ---------------------------------------------------------------------------

import os

from pyspark.sql import functions as F


def _mk(spark, tmp_path, tag, retention=1):
    eng = Engine(spark, workdir=str(tmp_path / tag))
    c = eng.db("t").collection("docs")
    if retention != 1:
        c.set_retention(retention)
    return c


def test_insert_manifest_chain(spark, tmp_path):
    c = _mk(spark, tmp_path, "mf")
    c.insert_many([{"_id": 1, "text": "a"}, {"_id": 2, "text": "b"}])
    v1 = c._pointer()
    c.insert_many([{"_id": 3, "text": "c"}])
    c.insert_many([{"_id": 4, "text": "d"}, {"_id": 5, "text": "e"}])
    # the chain reads exactly the appended rows — no diff, no retention
    delta = c._manifest_delta(v1)
    assert delta is not None
    assert sorted(r["_id"] for r in delta.collect()) == [3, 4, 5]
    # and it reads ONLY the appended files, all inside the CURRENT
    # version dir (appended files keep their paths through later
    # appends via the hard-link COW)
    cur_dir = os.path.join(c._store_dir, str(c._pointer()))
    dfiles = delta.inputFiles()
    assert dfiles and all(cur_dir in f for f in dfiles)
    assert len(dfiles) < len(c.df().inputFiles())
    # an update breaks the chain (that version has no manifest)
    c.update_all({"_id": 3}, {"$set": {"text": "C"}})
    assert c._manifest_delta(v1) is None
    # a rewrite clears manifests entirely — a later append restarts
    v_after = c._pointer()
    c.insert_many([{"_id": 6, "text": "f"}])
    d2 = c._manifest_delta(v_after)
    assert d2 is not None
    assert [r["_id"] for r in d2.collect()] == [6]


def test_manifest_delta_hive_partitions(spark, tmp_path):
    c = _mk(spark, tmp_path, "mfp")
    c.set_partitioning("lang")
    c.insert_many([{"_id": 1, "lang": "en", "v": 1},
                   {"_id": 2, "lang": "de", "v": 2}])
    v1 = c._pointer()
    c.insert_many([{"_id": 3, "lang": "en", "v": 3}])
    delta = c._manifest_delta(v1)
    assert delta is not None
    rows = delta.collect()
    assert len(rows) == 1 and rows[0]["lang"] == "en" and rows[0]["_id"] == 3


def test_refresh_is_o_delta_no_diff_no_retention(spark, tmp_path, monkeypatch):
    # retention stays at the DEFAULT 1: the manifest chain spans reaped
    # versions (appended files keep their paths in the current dir), so
    # incremental refresh no longer needs set_retention >= 2 at all —
    # and diff_versions (two corpus exceptAll shuffles) must not run
    c = _mk(spark, tmp_path, "od")
    c.insert_many([{"_id": i, "text": f"spark doc {i}"} for i in range(4)])
    c.create_search_index("ox", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    c.insert_many([{"_id": 10, "text": "fresh spark running"}])
    c.insert_many([{"_id": 11, "text": "another running doc"}])

    def _no_diff(*a, **k):
        raise AssertionError("diff_versions must not run on the manifest path")

    monkeypatch.setattr(type(c), "diff_versions", _no_diff)
    out = c.refresh_search_index("ox")
    assert out == {"mode": "incremental", "inserted": 2}
    got = sorted(r["_id"] for r in c.find({"$text": {"$search": "running"}}).all())
    assert got == [10, 11]
    # and the refreshed index equals a fresh rebuild bit-for-bit
    monkeypatch.undo()
    from tests.test_round9 import _index_state
    inc = _index_state(c, spark, "ox")
    c.create_search_index("ox2", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    full = _index_state(c, spark, "ox2")
    assert inc == full


def test_refresh_crash_retry_is_idempotent(spark, tmp_path, monkeypatch):
    # die AFTER the staged delta writes but BEFORE the definition swap:
    # the retry must not double the postings (the round-9 in-place
    # append doubled tf and silently inflated BM25 scores)
    from anser_spark.engine import Collection

    c = _mk(spark, tmp_path, "cr")
    c.insert_many([{"_id": i, "text": f"spark doc {i}"} for i in range(4)])
    c.create_search_index("cx", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    c.insert_many([{"_id": 9, "text": "spark spark running"}])

    real = Collection._write_search_index
    calls = {"n": 0}

    def _boom(self, name, definition):
        calls["n"] += 1
        raise RuntimeError("simulated crash before the definition swap")

    monkeypatch.setattr(Collection, "_write_search_index", _boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated crash"):
        c.refresh_search_index("cx")
    assert calls["n"] == 1
    monkeypatch.setattr(Collection, "_write_search_index", real)
    out = c.refresh_search_index("cx")
    assert out == {"mode": "incremental", "inserted": 1}
    from tests.test_round9 import _index_state
    inc = _index_state(c, spark, "cx")
    c.create_search_index("cx2", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    full = _index_state(c, spark, "cx2")
    assert inc == full  # no duplicated (id, term) rows, exact stats


def test_postings_compaction_bounds_dirs(spark, tmp_path):
    c = _mk(spark, tmp_path, "cp")
    c.insert_many([{"_id": 0, "text": "spark base"}])
    c.create_search_index("kx", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    spark.conf.set("spark.anser.index.compactThreshold", "3")
    try:
        for i in range(1, 8):
            c.insert_many([{"_id": i, "text": f"spark running doc{i}"}])
            assert c.refresh_search_index("kx")["mode"] == "incremental"
        d = c._load_search_index("kx", warn_stale=False)
        # delta-dir count stays under the threshold
        assert len(d.get("postings_deltas") or []) < 3
        # on-disk table dirs for this index stay bounded (no leaks):
        # round 11 adds the id sidecar and, for english, the raw-token
        # postings/terms sidecar — 5 base tables + versioned
        # terms/rawterms + under-threshold deltas
        idx = c._search_index_dir()
        mine = [e for e in os.listdir(idx) if e.startswith("kx_")]
        assert len(mine) <= 12, mine
        # queries still bit-exact vs a fresh rebuild
        from tests.test_round9 import _index_state
        inc = _index_state(c, spark, "kx")
        c.create_search_index("kx2", {
            "kind": "bm25", "path": "text", "default_language": "english"})
        assert inc == _index_state(c, spark, "kx2")
        # footer pruning still holds: the compacted table is range-laid
        rows = c.find({"$text": {"$search": "doc3"}}).all()
        assert [r["_id"] for r in rows] == [3]
    finally:
        spark.conf.unset("spark.anser.index.compactThreshold")


def test_rebuild_sweeps_versioned_dirs(spark, tmp_path):
    # ADVICE r9: refresh -> rebuild cycles leaked one versioned terms
    # dir per cycle; the post-publish sweep removes everything the new
    # definition no longer references
    c = _mk(spark, tmp_path, "sw")
    c.insert_many([{"_id": 0, "text": "spark base"}])
    c.create_search_index("sx", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    for i in range(1, 4):
        c.insert_many([{"_id": i, "text": f"spark doc{i}"}])
        assert c.refresh_search_index("sx")["mode"] == "incremental"
        c.create_search_index("sx", {
            "kind": "bm25", "path": "text", "default_language": "english"})
    idx = c._search_index_dir()
    mine = sorted(e for e in os.listdir(idx) if e.startswith("sx_"))
    # round 11 adds the id sidecar and (english) raw-token sidecar to
    # a fresh build's footprint
    assert mine == ["sx_ids", "sx_postings", "sx_rawpostings",
                    "sx_rawterms", "sx_terms"], mine


def test_minhash_refresh_crash_retry(spark, tmp_path, monkeypatch):
    from anser_spark.engine import Collection

    c = _mk(spark, tmp_path, "mh")
    c.insert_many([
        {"_id": i, "text": f"the quick brown fox jumps over dog {i}"}
        for i in range(6)
    ])
    c.create_search_index("nx", {
        "kind": "minhash", "path": "text", "numHashes": 16, "bands": 8})
    c.insert_many([
        {"_id": 100, "text": "the quick brown fox jumps over dog 0"}])
    real = Collection._write_search_index

    def _boom(self, name, definition):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(Collection, "_write_search_index", _boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        c.refresh_search_index("nx")
    monkeypatch.setattr(Collection, "_write_search_index", real)
    assert c.refresh_search_index("nx")["mode"] == "incremental"
    d = c._load_search_index("nx", warn_stale=False)
    from anser_spark.engine import _read_index_table
    sigs = _read_index_table(spark, d, "sig_dir", "sig_deltas")
    # one signature row per document, no duplicates from the retry
    assert sigs.count() == 7
    assert sigs.select("_id").distinct().count() == 7
    pairs = c.near_dups_against_index(
        c.df().where(F.col("_id") == 100), "nx", threshold=0.8)
    assert {(r["new_id"], r["old_id"]) for r in pairs.collect()} >= {(100, 0)}


# ---------------------------------------------------------------------------
# $searchMeta: date facets + single-job stage (round 10)
# ---------------------------------------------------------------------------

import datetime as dt

from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline


def test_search_meta_date_facets(spark):
    rows = [
        (1, "data platform", dt.datetime(2020, 3, 1)),
        (2, "data model", dt.datetime(2021, 6, 15)),
        (3, "data training", dt.datetime(2022, 1, 1)),
        (4, "data again", dt.datetime(2023, 7, 4)),
        (5, "unrelated", dt.datetime(2021, 1, 1)),
        (6, "data nulldate", None),
    ]
    df = spark.createDataFrame(rows, ["_id", "text", "created"])
    out = compile_pipeline(df, [{"$searchMeta": {"facet": {
        "operator": {"text": {"query": "data", "path": "text"}},
        "facets": {"by_date": {
            "type": "date", "path": "created",
            # Atlas JSON form: ISO strings (Z suffix included)
            "boundaries": ["2020-01-01", "2022-01-01", "2024-01-01"],
        }},
    }}}], None, None).collect()
    assert len(out) == 1
    r = out[0]
    assert r["count"]["total"] == 5
    got = [(b["_id"], b["count"]) for b in r["facet_by_date"]]
    # manual bucketing: docs 1,2 in [2020,2022); docs 3,4 in [2022,2024);
    # doc 6 has a null date (no bucket); doc 5 matches no term
    assert got == [
        (dt.datetime(2020, 1, 1), 2),
        (dt.datetime(2022, 1, 1), 2),
    ]
    # descending boundaries reject loudly
    with pytest.raises(PipelineCompileError, match="ascending"):
        compile_pipeline(df, [{"$searchMeta": {"facet": {
            "operator": {"text": {"query": "data", "path": "text"}},
            "facets": {"bad": {"type": "date", "path": "created",
                               "boundaries": ["2024-01-01", "2020-01-01"]}},
        }}}], None, None)
    # non-ISO boundary rejects loudly
    with pytest.raises(PipelineCompileError, match="ISO-8601"):
        compile_pipeline(df, [{"$searchMeta": {"facet": {
            "operator": {"text": {"query": "data", "path": "text"}},
            "facets": {"bad": {"type": "date", "path": "created",
                               "boundaries": ["not-a-date", "2020-01-01"]}},
        }}}], None, None)


def test_search_meta_job_count_constant_in_facets(spark):
    # the stage materializes the candidate frame ONCE and folds all
    # facets into one aggregation job — job count must not scale with
    # the facet count (round-9 VERDICT efficiency finding #2)
    rows = [(i, f"data doc {i}", f"t{i % 3}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, ["_id", "text", "tag", "score"])

    def run(n_facets, group):
        facets = {}
        for j in range(n_facets):
            if j % 2 == 0:
                facets[f"s{j}"] = {"type": "string", "path": "tag"}
            else:
                facets[f"n{j}"] = {"type": "number", "path": "score",
                                   "boundaries": [0, 10, 100]}
        sc = spark.sparkContext
        sc.setJobGroup(group, "searchMeta job-count probe")
        try:
            out = compile_pipeline(df, [{"$searchMeta": {"facet": {
                "operator": {"text": {"query": "data", "path": "text"}},
                "facets": facets,
            }}}], None, None).collect()
        finally:
            sc.setJobGroup(None, None)
        assert out[0]["count"]["total"] == 50
        return len(sc.statusTracker().getJobIdsForGroup(group))

    one = run(1, "sm_jobs_1")
    four = run(4, "sm_jobs_4")
    assert four == one, (one, four)


# ---------------------------------------------------------------------------
# cost-based postings-vs-scan choice (round 10)
# ---------------------------------------------------------------------------


def test_postings_cost_gate_hot_terms(spark, tmp_path):
    from anser_spark.operators.ranking import text_match_postings

    c = _mk(spark, tmp_path, "cost")
    # 'none' analyzer: stopwords survive — "the" lands in EVERY doc, so
    # its postings are the whole corpus and the join-back stops being
    # bounded; "needle" is rare
    c.insert_many([
        {"_id": i, "text": ("the needle doc" if i == 0 else "the common doc")}
        for i in range(40)
    ])
    c.create_search_index("hx", {"kind": "bm25", "path": "text"})
    d = c._fresh_bm25_index(c.df())
    assert d is not None and d.get("postings_dir")
    # under the small-corpus floor both queries take the postings path
    assert text_match_postings(c.df(), {"$search": "the"}, d) is not None
    # force the cost model on via the conf override: the hot term
    # (df = corpus) drops to the scan, the rare term keeps the postings
    spark.conf.set("spark.anser.text.postingsMaxDfFrac", "0.5")
    try:
        assert text_match_postings(c.df(), {"$search": "the"}, d) is None
        assert text_match_postings(c.df(), {"$search": "needle"}, d) is not None
        # and the full query surface still answers correctly either way
        hot = sorted(
            r["_id"] for r in c.find({"$text": {"$search": "the"}}).all()
        )
        assert hot == list(range(40))
        rare = [r["_id"] for r in c.find({"$text": {"$search": "needle"}}).all()]
        assert rare == [0]
    finally:
        spark.conf.unset("spark.anser.text.postingsMaxDfFrac")


# ---------------------------------------------------------------------------
# phrase from postings positions (round 10)
# ---------------------------------------------------------------------------

PHRASE_DOCS = [
    {"_id": 0, "text": "the quick brown fox jumps"},
    {"_id": 1, "text": "the quick red brown fox"},       # slop-1 for "quick brown"
    {"_id": 2, "text": "quick and very brown fox"},      # slop-2
    {"_id": 3, "text": "brown quick fox"},               # transposed (slop-2 under Lucene semantics)
    {"_id": 4, "text": "the quick brown, fox"},          # punctuation glues token
    {"_id": 5, "text": "xquick brown fox"},              # mid-token prefix
    {"_id": 6, "text": "THE QUICK  BROWN fox"},          # case + double space
    {"_id": 7, "text": None},
    {"_id": 8, "text": "quick quick brown"},             # repeated term
]


@pytest.mark.parametrize("slop", [0, 1, 2])
def test_search_phrase_postings_parity(spark, tmp_path, slop):
    from anser_spark.operators.ranking import search_phrase_postings

    c = _mk(spark, tmp_path, f"ph{slop}")
    c.insert_many(PHRASE_DOCS)
    spec = {"query": "quick brown", "path": "text"}
    if slop:
        spec["slop"] = slop
    stage = [{"$search": {"phrase": dict(spec)}},
             {"$project": {"_id": 1, "score": 1}}]
    base = {(r["_id"], round(r["score"], 12)) for r in c.pipe(stage).all()}
    c.create_search_index("px", {"kind": "bm25", "path": "text"})
    d = c._fresh_bm25_index(c.df())
    assert d and d.get("postings_positions") is True
    # the postings plan IS chosen for a fresh 'none' index
    assert search_phrase_postings(
        c.df(), ["quick", "brown"], slop, "text", d) is not None
    via = {(r["_id"], round(r["score"], 12)) for r in c.pipe(
        [{"$search": {"phrase": dict(spec), "index": "px"}},
         {"$project": {"_id": 1, "score": 1}}]).all()}
    assert base == via
    ids = {i for i, _s in base}
    if slop == 0:
        assert ids == {0, 6, 8}
    elif slop == 1:
        assert ids == {0, 1, 6, 8}
    else:
        # round 11: Lucene move-distance slop admits the transposed
        # doc 3 ("brown quick") at slop 2 (transposition cost 2)
        assert ids == {0, 1, 2, 3, 6, 8}


def test_search_phrase_postings_ineligible_paths(spark, tmp_path):
    from anser_spark.operators.ranking import search_phrase_postings

    c = _mk(spark, tmp_path, "phx")
    c.insert_many(PHRASE_DOCS)
    # an english index stems/stops — phrase terms are raw tokens; a
    # SIDECAR-LESS build (round-11 opt-out) can't serve them and the
    # scan path answers; the default build serves them from the
    # raw-token sidecar
    c.create_search_index("pe", {
        "kind": "bm25", "path": "text", "default_language": "english",
        "raw_sidecar": False})
    d = c._fresh_bm25_index(c.df())
    assert search_phrase_postings(
        c.df(), ["quick", "brown"], 0, "text", d) is None
    out = c.pipe([
        {"$search": {"phrase": {"query": "quick brown", "path": "text"},
                     "index": "pe"}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in out) == [0, 6, 8]
    # positions can be declined at build time: the index stays usable
    # for term queries, phrase falls back to the scan
    c.create_search_index("pn", {
        "kind": "bm25", "path": "text", "positions": False})
    d2 = c._load_search_index("pn", warn_stale=False)
    assert d2.get("postings_positions") is False
    assert search_phrase_postings(
        c.df(), ["quick", "brown"], 0, "text", d2) is None


def test_phrase_positions_refresh_roundtrip(spark, tmp_path):
    # incremental refresh writes positions too — phrase answers from
    # the union of base + delta postings
    c = _mk(spark, tmp_path, "phr")
    c.insert_many(PHRASE_DOCS)
    c.create_search_index("pr", {"kind": "bm25", "path": "text"})
    c.insert_many([{"_id": 100, "text": "another quick brown thing"}])
    assert c.refresh_search_index("pr")["mode"] == "incremental"
    out = c.pipe([
        {"$search": {"phrase": {"query": "quick brown", "path": "text"},
                     "index": "pr"}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in out) == [0, 6, 8, 100]


# ---------------------------------------------------------------------------
# fuzz: hatch toggling × refresh interleaving over the full text surface
# (round 10 — the round-9 bug class was a CONFIG dimension no fuzzer
# flipped; this one flips it every round, between incremental refreshes)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [11, 2026, 31337])
def test_postings_surface_fuzz_hatch_and_refresh(spark, tmp_path, seed):
    import random

    rng = random.Random(seed)
    vocab = ["spark", "mongo", "data", "dáta", "running", "run", "the",
             "and", "cluster", "résumé", "quick", "brown", "fox"]
    eng = Engine(spark, workdir=str(tmp_path / f"sf{seed}"))
    c = eng.db("t").collection("docs")
    language = rng.choice(["none", "english"])
    next_id = 0

    def batch(k):
        nonlocal next_id
        docs = []
        for _ in range(k):
            n = rng.randint(0, 9)
            docs.append({
                "_id": next_id,
                "text": " ".join(
                    rng.choice(vocab) for _ in range(n)) if n else None,
            })
            next_id += 1
        c.insert_many(docs)

    batch(15)
    c.create_search_index("fx", {
        "kind": "bm25", "path": "text", "default_language": language})

    def surfaces():
        words = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        phrase = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 2)))
        analyzer = (
            "lucene.english" if language == "english" else "lucene.standard"
        )
        find_rows = sorted(
            (r["_id"], round(r["s"], 12))
            for r in c.find({"$text": {"$search": words}})
            .select({"_id": 1, "s": {"$meta": "textScore"}}).all()
        )
        meta = c.pipe([{"$searchMeta": {
            "text": {"query": words, "path": "text", "analyzer": analyzer},
            "index": "fx"}}]).all()[0]["count"]["total"]
        ph = sorted(
            (r["_id"], round(r["score"], 12))
            for r in c.pipe([
                {"$search": {"phrase": {"query": phrase, "path": "text",
                                        "slop": rng.choice([0, 0, 1])},
                             "index": "fx"}},
                {"$project": {"_id": 1, "score": 1}},
            ]).all()
        )
        # round-10 additions: autocomplete (prefixes of real vocab),
        # moreLikeThis, and a phrase-anchored compound
        prefixes = [w[:rng.randint(1, max(1, len(w)))] for w in
                    (rng.choice(vocab), rng.choice(vocab))]
        ac = sorted(r["_id"] for r in c.pipe([
            {"$search": {"autocomplete": {
                "query": " ".join(prefixes), "path": "text",
                "tokenOrder": rng.choice(["any", "sequential"])},
                "index": "fx"}},
            {"$project": {"_id": 1}},
        ]).all())
        mlt = sorted(
            (r["_id"], round(r["score"], 12))
            for r in c.pipe([
                {"$search": {"moreLikeThis": {
                    "like": [{"text": " ".join(
                        rng.choice(vocab) for _ in range(6))}],
                    "path": "text"}, "index": "fx"}},
                {"$project": {"_id": 1, "score": 1}},
            ]).all()
        )
        comp = sorted(
            (r["_id"], round(r["score"], 12))
            for r in c.pipe([
                {"$search": {"compound": {
                    "must": [{"phrase": {"query": phrase, "path": "text"}}],
                    "mustNot": [{"equals": {"path": "_id",
                                            "value": rng.randint(0, 40)}}],
                }, "index": "fx"}},
                {"$project": {"_id": 1, "score": 1}},
            ]).all()
        )
        return find_rows, meta, ph, ac, mlt, comp

    for round_i in range(4):
        batch(rng.randint(1, 5))
        # round 11: interleave UPDATE/REMOVE batches — the tombstone
        # refresh path's bug class (stale postings resurrection, stat
        # drift, raw-sidecar desync) is exactly what the hatch
        # differential below would expose
        for _ in range(rng.randint(0, 2)):
            vic = rng.randrange(next_id)
            c.update_all({"_id": vic}, {"$set": {"text": " ".join(
                rng.choice(vocab)
                for _ in range(rng.randint(0, 6))) or None}})
        if rng.random() < 0.5 and next_id > 2:
            c.remove_all({"_id": rng.randrange(next_id)})
        out = c.refresh_search_index("fx")
        assert out["mode"] == "incremental", (round_i, out)
        state = rng.getstate()
        with_postings = surfaces()
        rng.setstate(state)  # same random queries on both sides
        with _hatch_off(spark):
            without = surfaces()
        assert with_postings == without, (seed, round_i, language)


# ---------------------------------------------------------------------------
# diff_versions / watch() manifest fast path (round 10)
# ---------------------------------------------------------------------------


def test_diff_versions_manifest_fast_path(spark, tmp_path):
    c = _mk(spark, tmp_path, "dv", retention=8)
    c.insert_many([{"_id": 1, "v": "a"}, {"_id": 2, "v": "b"}])
    v1 = c._pointer()
    c.insert_many([{"_id": 3, "v": "c"}])
    c.insert_many([{"_id": 3, "v": "c"}])  # exact duplicate row appended
    # manifest path and exceptAll path agree (multiset: the duplicate
    # append shows once per appended copy)
    fast = c.diff_versions(v1)
    assert fast.where(F.col("change_type") == "removed").count() == 0
    added = sorted(
        (r["_id"], r["v"]) for r in
        fast.where(F.col("change_type") == "added").collect()
    )
    assert added == [(3, "c"), (3, "c")]
    # force the exceptAll path by breaking the chain reference: diff
    # against a RETAINED version via a fresh collection state after an
    # update (no manifest for that version)
    c.update_all({"_id": 1}, {"$set": {"v": "A"}})
    v_upd = c._pointer()
    c.insert_many([{"_id": 9, "v": "z"}])
    # chain from v1 crosses the update → falls back to exceptAll
    full = c.diff_versions(v1)
    kinds = {r["change_type"] for r in full.collect()}
    assert kinds == {"added", "removed"}
    # chain from the update's version is append-only → manifest path,
    # equal to the exceptAll answer computed against the retained dir
    fast2 = {(r["_id"], r["v"], r["change_type"])
             for r in c.diff_versions(v_upd).collect()}
    assert fast2 == {(9, "z", "added")}


def test_diff_versions_works_at_retention_one(spark, tmp_path):
    # pre-round-10: retention 1 reaped the old version dir and every
    # diff raised NotFoundError; the manifest chain answers without it
    c = _mk(spark, tmp_path, "dv1")
    c.insert_many([{"_id": 1}])
    v1 = c._pointer()
    c.insert_many([{"_id": 2}])
    c.insert_many([{"_id": 3}])
    got = sorted(r["_id"] for r in c.diff_versions(v1).collect())
    assert got == [2, 3]


def test_watch_manifest_fast_path_events(spark, tmp_path):
    c = _mk(spark, tmp_path, "wfp", retention=4)
    c.insert_many([{"_id": 1, "v": "a"}])
    v1 = c._pointer()
    c.insert_many([{"_id": 2, "v": "b"}, {"_id": 3, "v": "c"}])
    events = c.watch(v1).collect()
    assert sorted(
        (r["operationType"], r["documentKey"]) for r in events
    ) == [("insert", 2), ("insert", 3)]
    assert all(r["fullDocumentBeforeChange"] is None for r in events)


def test_drop_search_index_reclaims_dirs(spark, tmp_path):
    c = _mk(spark, tmp_path, "drp")
    c.insert_many([{"_id": 0, "text": "spark doc"}])
    c.create_search_index("dx", {"kind": "bm25", "path": "text"})
    c.create_search_index("dx2", {"kind": "bm25", "path": "text"})
    idx = c._search_index_dir()
    assert any(e.startswith("dx_") for e in os.listdir(idx))
    c.drop_search_index("dx")
    left = [e for e in os.listdir(idx) if e.startswith("dx_")]
    assert left == [], left
    # the sibling index's tables survive and still answer
    assert [e for e in os.listdir(idx) if e.startswith("dx2_")]
    assert c.find({"$text": {"$search": "spark"}}).count() == 1


# ---------------------------------------------------------------------------
# autocomplete from postings (round 10)
# ---------------------------------------------------------------------------

AUTO_DOCS = [
    {"_id": 0, "text": "sparkling sparse data"},
    {"_id": 1, "text": "spark data pipeline"},
    {"_id": 2, "text": "spa treatment"},
    {"_id": 3, "text": "data sparkler"},          # order matters for sequential
    {"_id": 4, "text": "nothing relevant"},
    {"_id": 5, "text": None},
    {"_id": 6, "text": "SPARKY Dataset"},          # case folds
]


@pytest.mark.parametrize("order", ["any", "sequential"])
def test_search_autocomplete_postings_parity(spark, tmp_path, order):
    from anser_spark.operators.ranking import search_autocomplete_postings

    c = _mk(spark, tmp_path, f"ac{order}")
    c.insert_many(AUTO_DOCS)
    spec = {"query": "spark dat", "path": "text", "tokenOrder": order}
    stage = [{"$search": {"autocomplete": dict(spec)}},
             {"$project": {"_id": 1, "score": 1}}]
    base = sorted((r["_id"], r["score"]) for r in c.pipe(stage).all())
    c.create_search_index("ax", {"kind": "bm25", "path": "text"})
    d = c._fresh_bm25_index(c.df())
    assert search_autocomplete_postings(
        c.df(), ["spark", "dat"], order, "text", d) is not None
    via = sorted((r["_id"], r["score"]) for r in c.pipe(
        [{"$search": {"autocomplete": dict(spec), "index": "ax"}},
         {"$project": {"_id": 1, "score": 1}}]).all())
    assert base == via
    ids = [i for i, _s in base]
    if order == "any":
        # every doc containing a 'spark'-prefixed AND a 'dat'-prefixed
        # token, any order
        assert ids == [0, 1, 3, 6]
    else:
        # 'dat'-prefixed token must immediately follow a
        # 'spark'-prefixed one ("sparkling sparse data" does NOT
        # qualify: 'sparse' breaks the adjacency)
        assert ids == [1, 6]
    # plan: no Python through the postings autocomplete
    pdf = c.pipe([
        {"$search": {"autocomplete": dict(spec), "index": "ax"}}]).to_df()
    plan = pdf._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_search_autocomplete_postings_ineligible(spark, tmp_path):
    from anser_spark.operators.ranking import search_autocomplete_postings

    c = _mk(spark, tmp_path, "aci")
    c.insert_many(AUTO_DOCS)
    # english analyzer WITHOUT the round-11 raw sidecar: raw prefixes
    # don't align with stemmed terms — the route must decline
    c.create_search_index("ae", {
        "kind": "bm25", "path": "text", "default_language": "english",
        "raw_sidecar": False})
    d = c._load_search_index("ae", warn_stale=False)
    assert search_autocomplete_postings(
        c.df(), ["spark"], "any", "text", d) is None
    # WITH the sidecar (round-11 default) the same query is served
    c.create_search_index("ae2", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    d_raw = c._load_search_index("ae2", warn_stale=False)
    assert search_autocomplete_postings(
        c.df(), ["spark"], "any", "text", d_raw) is not None
    # sequential needs positions
    c.create_search_index("an", {
        "kind": "bm25", "path": "text", "positions": False})
    d2 = c._load_search_index("an", warn_stale=False)
    assert search_autocomplete_postings(
        c.df(), ["spark"], "sequential", "text", d2) is None
    assert search_autocomplete_postings(
        c.df(), ["spark"], "any", "text", d2) is not None
    # and the full surface still answers under the hatch
    spec = {"query": "spark dat", "path": "text"}
    with_idx = sorted(r["_id"] for r in c.pipe(
        [{"$search": {"autocomplete": dict(spec), "index": "an"}},
         {"$project": {"_id": 1}}]).all())
    with _hatch_off(spark):
        without = sorted(r["_id"] for r in c.pipe(
            [{"$search": {"autocomplete": dict(spec), "index": "an"}},
             {"$project": {"_id": 1}}]).all())
    assert with_idx == without == [0, 1, 3, 6]


def test_more_like_this_postings_parity(spark, tmp_path):
    c = _mk(spark, tmp_path, "mlt")
    c.insert_many([
        {"_id": 0, "text": "spark cluster tuning guide"},
        {"_id": 1, "text": "tuning the spark cluster for scale"},
        {"_id": 2, "text": "gardening tips for spring"},
        {"_id": 3, "text": "cluster management and tuning"},
        {"_id": 4, "text": None},
    ])
    stage = {"moreLikeThis": {
        "like": [{"text": "spark cluster tuning"}], "path": "text"}}
    base = sorted((r["_id"], round(r["score"], 12)) for r in c.pipe(
        [{"$search": dict(stage)}, {"$project": {"_id": 1, "score": 1}}]
    ).all())
    c.create_search_index("mx", {"kind": "bm25", "path": "text"})
    via = sorted((r["_id"], round(r["score"], 12)) for r in c.pipe(
        [{"$search": dict(stage, index="mx")},
         {"$project": {"_id": 1, "score": 1}}]).all())
    assert base == via and [i for i, _ in base] == [0, 1, 3]
    # plan: no Python through the postings mlt
    pdf = c.pipe([{"$search": dict(stage, index="mx")}]).to_df()
    plan = pdf._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_search_meta_phrase_and_autocomplete_operators(spark, tmp_path):
    c = _mk(spark, tmp_path, "smp")
    c.insert_many(PHRASE_DOCS)
    c.create_search_index("sx", {"kind": "bm25", "path": "text"})
    for op_spec in (
        {"phrase": {"query": "quick brown", "path": "text"}},
        {"autocomplete": {"query": "qui bro", "path": "text",
                          "tokenOrder": "sequential"}},
    ):
        base = c.pipe([{"$searchMeta": dict(op_spec)}]).all()[0]
        via = c.pipe([
            {"$searchMeta": dict(op_spec, index="sx")}]).all()[0]
        assert base["count"]["total"] == via["count"]["total"], op_spec
        with _hatch_off(spark):
            off = c.pipe([
                {"$searchMeta": dict(op_spec, index="sx")}]).all()[0]
        assert off["count"]["total"] == via["count"]["total"], op_spec
    # facets over a phrase operator group over the postings candidates
    meta = {"facet": {
        "operator": {"phrase": {"query": "quick brown", "path": "text"}},
        "facets": {"ids": {"type": "number", "path": "_id",
                           "boundaries": [0, 5, 10]}},
    }}
    base = c.pipe([{"$searchMeta": dict(meta)}]).all()[0]
    via = c.pipe([{"$searchMeta": dict(meta, index="sx")}]).all()[0]
    assert base["count"]["total"] == via["count"]["total"] == 3
    assert sorted(map(tuple, base["facet_ids"])) == \
        sorted(map(tuple, via["facet_ids"]))


def test_search_meta_count_only_phrase_uses_postings(spark, tmp_path, monkeypatch):
    # the count-only form routes phrase/autocomplete through the
    # bounded postings candidates — the scan compiler must not run
    import anser_spark.plans.pipeline as P

    c = _mk(spark, tmp_path, "smc")
    c.insert_many(PHRASE_DOCS)
    c.create_search_index("cx", {"kind": "bm25", "path": "text"})

    def _no_scan(*a, **k):
        raise AssertionError("scan compile must not run on the postings path")

    monkeypatch.setattr(P, "_one_search_op", _no_scan)
    out = c.pipe([{"$searchMeta": {
        "phrase": {"query": "quick brown", "path": "text"}, "index": "cx"}}
    ]).all()
    assert out[0]["count"]["total"] == 3
    out = c.pipe([{"$searchMeta": {
        "autocomplete": {"query": "qui bro", "path": "text",
                         "tokenOrder": "sequential"}, "index": "cx"}}
    ]).all()
    # one more than the exact phrase: the 'bro' PREFIX also matches the
    # punctuation-glued token "brown," in doc 4
    assert out[0]["count"]["total"] == 4


def test_manifest_chain_through_transactions(spark, tmp_path):
    # txn-staged appends commit under v{n}.txn.{hex} names — the chain
    # must walk through them; an ABORTED txn's orphan manifest must
    # never be reachable from a committed pointer
    c = _mk(spark, tmp_path, "txm")
    c.insert_many([{"_id": 0, "text": "spark base"}])
    c.create_search_index("tx", {
        "kind": "bm25", "path": "text", "default_language": "english"})
    with c.engine.transaction():
        c.insert_many([{"_id": 1, "text": "spark in txn"}])
        c.insert_many([{"_id": 2, "text": "more spark in txn"}])
    out = c.refresh_search_index("tx")
    assert out == {"mode": "incremental", "inserted": 2}
    # aborted txn: staged version + manifest orphaned, chain unaffected
    try:
        with c.engine.transaction():
            c.insert_many([{"_id": 99, "text": "never lands"}])
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    c.insert_many([{"_id": 3, "text": "spark after abort"}])
    out = c.refresh_search_index("tx")
    assert out == {"mode": "incremental", "inserted": 1}
    got = sorted(r["_id"] for r in c.find({"$text": {"$search": "spark"}}).all())
    assert got == [0, 1, 2, 3]


def test_search_compound_phrase_anchor_postings_parity(spark, tmp_path):
    # compound {must: [phrase, range], mustNot: [...]} — the phrase
    # clause anchors the postings candidates (round 10); exact parity
    # with the scan compile incl. boost + structured scoring
    c = _mk(spark, tmp_path, "cpp")
    c.insert_many([dict(d, views=i * 10) for i, d in enumerate(PHRASE_DOCS)])
    stage = {"compound": {
        "must": [
            {"phrase": {"query": "quick brown", "path": "text",
                        "score": {"boost": {"value": 3.0}}}},
            {"range": {"path": "views", "gte": 10}},
        ],
        "mustNot": [{"equals": {"path": "_id", "value": 8}}],
    }}
    base = {(r["_id"], round(r["score"], 12)) for r in c.pipe([
        {"$search": dict(stage)}, {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    c.create_search_index("cpx", {"kind": "bm25", "path": "text"})
    via = {(r["_id"], round(r["score"], 12)) for r in c.pipe([
        {"$search": dict(stage, index="cpx")},
        {"$project": {"_id": 1, "score": 1}},
    ]).all()}
    assert base == via and {i for i, _ in base} == {6}
    # plan: no Python through the phrase-anchored compound
    pdf = c.pipe([{"$search": dict(stage, index="cpx")}]).to_df()
    plan = pdf._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_insert_batch_with_all_null_field(spark, tmp_path):
    # a batch whose field is null in EVERY doc is a normal Mongo insert
    # — the collection schema types the known field; an all-null field
    # the collection has never seen stores as "missing" (identical
    # document under the columnar null-fill contract)
    c = _mk(spark, tmp_path, "nul")
    c.insert_many([{"_id": 0, "text": "real", "n": 1}])
    c.insert_many([{"_id": 1, "text": None}, {"_id": 2, "text": None}])
    rows = {r["_id"]: r["text"] for r in c.find().all()}
    assert rows == {0: "real", 1: None, 2: None}
    # unknown all-null field drops to missing — the schema is unchanged
    c.insert_many([{"_id": 3, "text": "x", "ghost": None}])
    assert "ghost" not in c.df().columns
    assert c.find_id(3).one()["text"] == "x"
    # refresh still works over a null-text delta
    c.create_search_index("nx", {"kind": "bm25", "path": "text"})
    c.insert_many([{"_id": 4, "text": None}])
    assert c.refresh_search_index("nx")["mode"] == "incremental"
