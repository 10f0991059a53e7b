"""Round-5 hardening: the five r4 ADVICE items ($search matching-only
results + bounded fusion legs, $meta scoreField threading, victim-file
COW under duplicate keys, $scoreFusion empty-leg guard, $vectorSearch
zero-norm / unresolved-index guards)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark engines process data at scale"),
        (2, "the model trains on data data data"),
        (3, "training data for the model"),
        (4, "nothing relevant here at all"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], "odd" if i % 2 else "even")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "parity"])


def test_search_returns_only_matching_docs(corpus):
    # Atlas $search returns matching documents only: docs 4 (no query
    # term) and 5 (empty) must NOT appear with score 0
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(
        corpus, [{"$search": {"text": {"query": "data model", "path": "text"}}}]
    ).collect()
    ids = [r["doc_id"] for r in out]
    assert set(ids) == {1, 2, 3}
    assert all(r["score"] > 0 for r in out)
    # no term matches anywhere → empty result, not a zero-scored corpus
    none = compile_pipeline(
        corpus, [{"$search": {"text": {"query": "zzzqqq", "path": "text"}}}]
    ).collect()
    assert none == []


def test_rank_fusion_search_leg_requires_limit(corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    with pytest.raises(PipelineCompileError, match="top-k bounded"):
        compile_pipeline(
            corpus,
            [{"$rankFusion": {"input": {"pipelines": {
                "rel": [{"$search": {"text": {"query": "data", "path": "text"}}}],
            }}, "key": "doc_id"}}],
        )
    # with a $limit the leg compiles and fuses
    out = compile_pipeline(
        corpus,
        [{"$rankFusion": {"input": {"pipelines": {
            "rel": [{"$search": {"text": {"query": "data", "path": "text"}}},
                    {"$limit": 2}],
        }}, "key": "doc_id"}}],
    ).collect()
    assert len(out) == 2


def test_meta_resolves_custom_score_field(corpus):
    from anser_spark.plans.pipeline import compile_pipeline

    # scoreField="relevance" + a decoy user column literally named
    # "score": $meta must read the search score, not the decoy
    decoy = corpus.withColumn("score", F.lit(-99.0))
    out = compile_pipeline(
        decoy,
        [{"$search": {"text": {"query": "data", "path": "text"},
                      "scoreField": "relevance"}},
         {"$project": {"doc_id": 1, "rel": {"$meta": "searchScore"}}},
         {"$limit": 1}],
    ).collect()
    assert out[0]["rel"] > 0  # not the -99 decoy

    # nested leg scoreFields don't leak: after the fusion stage, $meta
    # reads the fused "score"
    fused = compile_pipeline(
        corpus,
        [{"$rankFusion": {"input": {"pipelines": {
            "rel": [{"$search": {"text": {"query": "data", "path": "text"},
                                 "scoreField": "leg_rel"}}, {"$limit": 3}],
        }}, "key": "doc_id"}},
         {"$project": {"doc_id": 1, "fused": {"$meta": "searchScore"}}}],
    ).collect()
    assert all(r["fused"] > 0 for r in fused)


def test_score_fusion_empty_leg_min_max(vec_df):
    # a leg yielding zero rows used to crash minMaxScaler with
    # float(None); it must contribute nothing instead
    from anser_spark.plans.pipeline import compile_pipeline

    qv = [r for r in vec_df.where("vec_id = 0").first()["embedding"]]
    out = compile_pipeline(
        vec_df,
        [{"$scoreFusion": {
            "input": {"pipelines": {
                "vec": [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                           "limit": 5, "exact": True}}],
                "empty": [{"$match": {"vec_id": -1}},
                          {"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                             "limit": 5, "exact": True}}],
            }, "normalization": "minMaxScaler"},
            "key": "vec_id",
        }}],
    ).collect()
    assert len(out) == 5
    assert all(r["empty_score"] is None for r in out)


def test_vector_search_guards(vec_df):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    # all-zero queryVector: epsilon clamp → finite scores, no NaN
    out = compile_pipeline(
        vec_df,
        [{"$vectorSearch": {"path": "embedding", "queryVector": [0.0] * 8,
                            "limit": 3, "exact": True}}],
    ).collect()
    assert len(out) == 3
    assert all(r["score"] == r["score"] for r in out)  # not NaN
    # a string index reaching the compiler unresolved must raise, not
    # silently fall back to the exact scan
    with pytest.raises(PipelineCompileError, match="unresolved"):
        compile_pipeline(
            vec_df,
            [{"$vectorSearch": {"path": "embedding", "queryVector": [1.0] * 8,
                                "limit": 3, "index": "my_ivf"}}],
        )


def test_update_one_duplicate_key_across_files(spark, tmp_path):
    # duplicate _id living in a DIFFERENT parquet file than the victim:
    # the single-file shortcut must not leave it behind (r4 ADVICE)
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    coll = eng.db("dup").collection("docs")
    # two single-file COW appends → the duplicate key spans two files
    coll.insert_df(spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], ["_id", "tag", "n"]).repartition(1))
    coll.insert_df(spark.createDataFrame(
        [(1, "c", 0), (3, "d", 0)], ["_id", "tag", "n"]).repartition(1))
    assert coll.count() == 4
    coll.update({"_id": 1}, {"$inc": {"n": 5}})
    rows = {(r["_id"], r["tag"]): r["n"] for r in coll.find({}).all()}
    # both _id=1 rows mutated (pre-victim-capture semantics: the
    # mutation applies to the victim's key, wherever it lives)
    assert rows[(1, "a")] == 5 and rows[(1, "c")] == 5
    assert rows[(2, "b")] == 0 and rows[(3, "d")] == 0

    # assume_unique_ids=True keeps the single-file fast path
    eng2 = Engine(spark, workdir=str(tmp_path / "wd2"), assume_unique_ids=True)
    c2 = eng2.db("dup").collection("docs")
    c2.insert_df(spark.createDataFrame([(1, 0)], ["_id", "n"]).repartition(1))
    c2.insert_df(spark.createDataFrame([(2, 0)], ["_id", "n"]).repartition(1))
    c2.update({"_id": 2}, {"$inc": {"n": 7}})
    assert {r["_id"]: r["n"] for r in c2.find({}).all()} == {1: 0, 2: 7}


def test_stream_ingest_exactly_once_replay(spark, tmp_path):
    # Replay scenario: the sink's append COMMITTED but the stream
    # checkpoint didn't advance (crash in between). On restart the same
    # batch is re-delivered — the batch marker in the version pointer
    # must detect it and skip, leaving no duplicate rows.
    import shutil as _shutil

    from anser_spark.engine import Engine
    from anser_spark.streaming.ingest import stream_into_collection

    srcdir = tmp_path / "src"
    srcdir.mkdir()
    (srcdir / "a.jsonl").write_text('{"event_id": 1}\n{"event_id": 2}\n')
    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    coll = eng.db("ing").collection("evts")
    stream = spark.readStream.schema("event_id long").json(str(srcdir))
    ckpt = str(tmp_path / "ckpt")

    q = stream_into_collection(stream, coll, checkpoint_dir=ckpt, available_now=True)
    q.awaitTermination(120)
    assert coll.count() == 2
    meta = coll.pointer_meta()
    assert any(k.startswith("ingest_") and v == "0" for k, v in meta.items())

    # wipe the checkpoint: Spark re-delivers the same files as batch 0
    _shutil.rmtree(ckpt)
    q2 = stream_into_collection(stream, coll, checkpoint_dir=ckpt, available_now=True)
    q2.awaitTermination(120)
    assert coll.count() == 2  # replayed batch skipped — no duplicates

    # the marker survives unrelated mutations (pointer meta is carried
    # through every version swap), so replay detection keeps working
    coll.update_all({}, {"$set": {"seen": True}})
    assert any(k.startswith("ingest_") for k in coll.pointer_meta())
    _shutil.rmtree(ckpt)
    q3 = stream_into_collection(stream, coll, checkpoint_dir=ckpt, available_now=True)
    q3.awaitTermination(120)
    assert coll.count() == 2

    # a genuinely NEW batch (same checkpoint lineage) still appends
    (srcdir / "b.jsonl").write_text('{"event_id": 3}\n')
    q4 = stream_into_collection(stream, coll, checkpoint_dir=ckpt, available_now=True)
    q4.awaitTermination(120)
    assert coll.count() == 3


def test_text_profile_single_scan(spark, corpus):
    # fused stats+quality projection: identical values to the join of
    # text_stats and quality_metrics, but the plan has exactly ONE scan
    # and no join
    from anser_spark.operators.text import quality_metrics, text_profile, text_stats

    prof = text_profile(corpus)
    joined = (
        text_stats(corpus)
        .select("doc_id", "n_tokens", "n_chars_calc", "lang_id", "quality")
        .join(
            quality_metrics(corpus).select(
                "doc_id", "punct_ratio", "mean_word_len", "length_score",
                "en_stop_hits",
            ),
            "doc_id",
        )
    )
    cols = joined.columns
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted((r.asDict() for r in prof.select(cols).collect()), key=key) == \
        sorted((r.asDict() for r in joined.collect()), key=key)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_ema_chunked_differential(spark):
    # chunk-carry EMA vs the plain sequential recurrence: random series
    # with nulls, descending sort, and a null-prefix — bitwise-close
    import random

    import pandas as pd

    from anser_spark.plans.pipeline import compile_pipeline

    rng = random.Random(7)
    rows = []
    for i in range(500):
        v = None if rng.random() < 0.2 else round(rng.uniform(-50, 50), 3)
        rows.append((i, v))
    # null prefix: rows before any value must stay null
    rows[0] = (0, None)
    rows[1] = (1, None)
    df = spark.createDataFrame(rows, "t int, v double")
    for direction in (1, -1):
        out = compile_pipeline(df, [
            {"$setWindowFields": {
                "sortBy": {"t": direction},
                "output": {"ema": {"$expMovingAvg": {"input": "$v", "alpha": 0.3}}},
            }},
        ]).orderBy("t").collect()
        ordered = sorted(rows, key=lambda r: r[0], reverse=direction == -1)
        ref = pd.Series([v for _t, v in ordered], dtype="float64").ewm(
            alpha=0.3, adjust=False, ignore_na=True
        ).mean()
        ref_by_t = {t: ref.iloc[i] for i, (t, _v) in enumerate(ordered)}
        for r in out:
            expect = ref_by_t[r["t"]]
            if expect != expect:  # NaN → null row before any value
                assert r["ema"] is None or r["ema"] != r["ema"]
            else:
                assert r["ema"] == pytest.approx(expect, rel=1e-9, abs=1e-12)


@pytest.fixture(scope="module")
def search_corpus(spark):
    rows = [
        (1, "spark engines process data at scale", "eng", 2020),
        (2, "the model trains on data data data", "ml", 2021),
        (3, "training data for the model", "ml", 2022),
        (4, "nothing relevant here at all", "misc", 2023),
        (5, "big data model training at scale", "ml", 2024),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "tag", "year"])


def test_search_single_scan_plan(search_corpus):
    # the whole $search stage (text operator) must be one scan: stats
    # fold in as literals, scoring is inline — no join, no exchange
    # besides the final order
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(
        search_corpus,
        [{"$search": {"text": {"query": "data model", "path": "text"}}}],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_search_phrase(search_corpus):
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(
        search_corpus,
        [{"$search": {"phrase": {"query": "training data", "path": "text"}}}],
    ).collect()
    assert [r["doc_id"] for r in out] == [3]  # only the adjacent phrase
    assert out[0]["score"] > 0
    # 'data ... training' non-adjacent (doc 5 has 'model training') no match
    out2 = compile_pipeline(
        search_corpus,
        [{"$search": {"phrase": {"query": "model training", "path": "text"}}}],
    ).collect()
    assert [r["doc_id"] for r in out2] == [5]


def test_search_structured_operators(search_corpus):
    from anser_spark.plans.pipeline import compile_pipeline

    eq = compile_pipeline(
        search_corpus, [{"$search": {"equals": {"path": "tag", "value": "ml"}}}]
    ).collect()
    assert {r["doc_id"] for r in eq} == {2, 3, 5}
    assert all(r["score"] == 1.0 for r in eq)

    rng = compile_pipeline(
        search_corpus,
        [{"$search": {"range": {"path": "year", "gte": 2021, "lt": 2023}}}],
    ).collect()
    assert {r["doc_id"] for r in rng} == {2, 3}

    isin = compile_pipeline(
        search_corpus, [{"$search": {"in": {"path": "year", "value": [2020, 2024]}}}]
    ).collect()
    assert {r["doc_id"] for r in isin} == {1, 5}

    wc = compile_pipeline(
        search_corpus, [{"$search": {"wildcard": {"path": "text", "query": "*trains*"}}}]
    ).collect()
    assert {r["doc_id"] for r in wc} == {2}

    ex = compile_pipeline(
        search_corpus, [{"$search": {"exists": {"path": "tag"}}}]
    ).collect()
    assert len(ex) == 5


def test_search_compound(search_corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    # must (text) + filter (equals) + mustNot (range): ml docs about
    # data, excluding year >= 2024
    out = compile_pipeline(
        search_corpus,
        [{"$search": {"compound": {
            "must": [{"text": {"query": "data", "path": "text"}}],
            "filter": [{"equals": {"path": "tag", "value": "ml"}}],
            "mustNot": [{"range": {"path": "year", "gte": 2024}}],
        }}}],
    ).collect()
    assert {r["doc_id"] for r in out} == {2, 3}
    # doc 2 (tf=3 'data') outranks doc 3 (tf=1)
    assert out[0]["doc_id"] == 2 and out[0]["score"] > out[1]["score"]

    # pure-should compound = OR; minimumShouldMatch=2 = AND-ish
    should_or = compile_pipeline(
        search_corpus,
        [{"$search": {"compound": {"should": [
            {"equals": {"path": "tag", "value": "eng"}},
            {"equals": {"path": "year", "value": 2024}},
        ]}}}],
    ).collect()
    assert {r["doc_id"] for r in should_or} == {1, 5}
    msm = compile_pipeline(
        search_corpus,
        [{"$search": {"compound": {
            "should": [
                {"equals": {"path": "tag", "value": "ml"}},
                {"range": {"path": "year", "gte": 2024}},
            ],
            "minimumShouldMatch": 2,
        }}}],
    ).collect()
    assert {r["doc_id"] for r in msm} == {5}
    # should scores add: doc 5 matched both → score 2
    assert msm[0]["score"] == 2.0

    # boost/constant score options
    boosted = compile_pipeline(
        search_corpus,
        [{"$search": {"equals": {"path": "tag", "value": "ml",
                                 "score": {"boost": {"value": 3.0}}}}}],
    ).collect()
    assert all(r["score"] == 3.0 for r in boosted)
    const = compile_pipeline(
        search_corpus,
        [{"$search": {"text": {"query": "data", "path": "text",
                               "score": {"constant": {"value": 7.5}}}}}],
    ).collect()
    assert all(r["score"] == 7.5 for r in const)

    with pytest.raises(PipelineCompileError, match="exactly one operator"):
        compile_pipeline(
            search_corpus,
            [{"$search": {"text": {"query": "a", "path": "text"},
                          "phrase": {"query": "b", "path": "text"}}}],
        )
    # geoShape became a real operator in round 8 — an incomplete spec
    # raises a clear compile error, and deprecated Atlas ops still
    # raise "unsupported"
    with pytest.raises(PipelineCompileError, match="geoShape requires"):
        compile_pipeline(
            search_corpus, [{"$search": {"geoShape": {"relation": "within"}}}]
        )
    with pytest.raises(PipelineCompileError, match="unsupported"):
        compile_pipeline(
            search_corpus, [{"$search": {"knnBeta": {"path": "v"}}}]
        )


def test_search_autocomplete(search_corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    # prefix match: "train" prefixes 'trains'/'training'
    out = compile_pipeline(
        search_corpus,
        [{"$search": {"autocomplete": {"query": "train", "path": "text"}}}],
    ).collect()
    assert {r["doc_id"] for r in out} == {2, 3, 5}
    # any-order multi-term: each term prefixes SOME token
    out2 = compile_pipeline(
        search_corpus,
        [{"$search": {"autocomplete": {"query": "scale dat", "path": "text"}}}],
    ).collect()
    assert {r["doc_id"] for r in out2} == {1, 5}
    # sequential: prefixes must hit consecutive tokens in order
    seq = compile_pipeline(
        search_corpus,
        [{"$search": {"autocomplete": {"query": "model train", "path": "text",
                                       "tokenOrder": "sequential"}}}],
    ).collect()
    # docs 2 ('model trains') and 5 ('model training') have adjacent
    # prefix hits; doc 3 has 'model' last — nothing follows to prefix
    assert {r["doc_id"] for r in seq} == {2, 5}
    with pytest.raises(PipelineCompileError, match="tokenOrder"):
        compile_pipeline(
            search_corpus,
            [{"$search": {"autocomplete": {"query": "x", "path": "text",
                                           "tokenOrder": "zigzag"}}}],
        )


def test_search_meta(search_corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    # count form
    out = compile_pipeline(
        search_corpus,
        [{"$searchMeta": {"text": {"query": "data", "path": "text"}}}],
    ).collect()
    assert len(out) == 1 and out[0]["count"]["total"] == 4

    # facet form: string facet (top values) + number facet (boundaries)
    fac = compile_pipeline(
        search_corpus,
        [{"$searchMeta": {"facet": {
            "operator": {"text": {"query": "data model training", "path": "text"}},
            "facets": {
                "tags": {"type": "string", "path": "tag", "numBuckets": 2},
                "years": {"type": "number", "path": "year",
                          "boundaries": [2020, 2022, 2025]},
            },
        }}}],
    ).collect()
    assert len(fac) == 1
    r = fac[0]
    assert r["count"]["total"] == 4  # doc 4 matches no term
    tags = [(b["_id"], b["count"]) for b in r["facet_tags"]]
    assert tags[0] == ("ml", 3)
    years = {b["_id"]: b["count"] for b in r["facet_years"]}
    assert years[2020.0] + years[2022.0] == sum(years.values())
    with pytest.raises(PipelineCompileError, match="facet type"):
        compile_pipeline(
            search_corpus,
            [{"$searchMeta": {"facet": {
                "operator": {"exists": {"path": "tag"}},
                "facets": {"bad": {"type": "boolean", "path": "year"}},
            }}}],
        )


def test_weighted_sample(spark):
    # deterministic weighted Bernoulli: p = min(1, rate·w); monotone in
    # both rate and weight; weight 0 never sampled, w ≥ 1/rate always
    from anser_spark.operators.corpus import weighted_sample

    rows = [(i, 0.0 if i % 10 == 0 else (i % 100) / 50.0) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    kept = weighted_sample(df, "w", rate=0.5)
    ids = {r["doc_id"] for r in kept.collect()}
    assert all(i % 10 != 0 for i in ids)  # zero weight never kept
    # w >= 2 → p = 1 → always kept
    certain = {i for i, w in rows if 0.5 * w >= 1.0}
    assert certain <= ids
    # determinism
    assert ids == {r["doc_id"] for r in weighted_sample(df, "w", rate=0.5).collect()}
    # monotone: higher rate only adds documents
    more = {r["doc_id"] for r in weighted_sample(df, "w", rate=0.9).collect()}
    assert ids <= more
    # rough calibration: overall kept fraction ≈ mean(min(1, 0.5w))
    import statistics
    expect = statistics.mean(min(1.0, 0.5 * w) for _i, w in rows)
    assert abs(len(ids) / len(rows) - expect) < 0.05
    with pytest.raises(ValueError):
        weighted_sample(df, "w", rate=-1)


def test_coll_stats_stage(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("statsdb").collection("t")
    c.insert_df(spark.createDataFrame([(i, i * 2) for i in range(10)], ["_id", "v"]))
    out = c.pipe([{"$collStats": {"count": {}, "storageStats": {}}}]).all()
    assert len(out) == 1
    r = out[0]
    assert r["ns"] == "statsdb.t" and r["count"] == 10
    assert r["storage_size_bytes"] > 0 and r["file_count"] >= 1
    assert r["version"] == "v1"
    # composes with downstream stages
    n = c.pipe([{"$collStats": {"count": {}}},
                {"$project": {"count": 1}}]).all()
    assert n[0]["count"] == 10
    # non-leading $collStats is an error, as in Mongo
    with pytest.raises(ValueError, match="first"):
        c.pipe([{"$match": {}}, {"$collStats": {"count": {}}}])


def test_clustered_writes_prune_key_probes(spark, tmp_path):
    # set_clustering → files cover non-overlapping key ranges → parquet
    # footer min/max makes key probes touch ONE file
    import pyarrow.parquet as pq

    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("cl").collection("t")
    c.set_clustering("_id", n_files=4)
    # write ids in scrambled order across 8 partitions
    ids = [(i * 37) % 1000 for i in range(1000)]
    c.insert_df(
        spark.createDataFrame([(i, f"v{i}") for i in ids], ["_id", "v"]).repartition(8)
    )
    files = c._data_files(c.current_path())
    assert len(files) > 1
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # _id is the sort key
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping clustered files: {ranges}"

    # a key-equality probe resolves to exactly one file
    from pyspark.sql import functions as F

    probe = (
        c.df().where(F.col("_id") == 777)
        .select(F.col("_metadata.file_path").alias("f")).distinct().collect()
    )
    assert len(probe) == 1

    # appends overlap (documented) — optimize() restores the layout
    c.insert_df(spark.createDataFrame([(5, "new"), (995, "new")], ["_id", "v"]))
    c.optimize()
    files2 = c._data_files(c.current_path())
    r2 = []
    for f in files2:
        md = pq.read_metadata(f)
        s = [md.row_group(g).column(0).statistics for g in range(md.num_row_groups)]
        r2.append((min(x.min for x in s), max(x.max for x in s)))
    r2.sort()
    for (lo1, hi1), (lo2, hi2) in zip(r2, r2[1:]):
        assert hi1 <= lo2
    assert c.count() == 1002


def test_version_retention_time_travel(spark, tmp_path):
    from anser_spark.engine import Engine, NotFoundError

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("tt").collection("t")
    c.set_retention(3)
    c.insert_df(spark.createDataFrame([(1, "a")], ["_id", "v"]))   # v1
    c.update_all({}, {"$set": {"v": "b"}})                          # v2
    c.insert_df(spark.createDataFrame([(2, "c")], ["_id", "v"]))   # v3
    c.update_all({"_id": 2}, {"$set": {"v": "d"}})                  # v4
    assert c.versions() == ["v2", "v3", "v4"]  # v1 reaped (keep 3)
    # time-travel reads see the historical states
    assert [r["v"] for r in c.df_at("v2").collect()] == ["b"]
    assert {r["v"] for r in c.df_at("v3").collect()} == {"b", "c"}
    assert {r["v"] for r in c.df().collect()} == {"b", "d"}
    with pytest.raises(NotFoundError, match="v1"):
        c.df_at("v1")

    # default retention (1): old version reaped on swap, as before
    c2 = eng.db("tt").collection("u")
    c2.insert_df(spark.createDataFrame([(1,)], ["_id"]))
    c2.update_all({}, {"$set": {"x": 1}})
    assert c2.versions() == ["v2"]
    with pytest.raises(ValueError):
        c2.set_retention(0)


def test_diff_versions(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("cdc").collection("t")
    c.set_retention(5)
    c.insert_df(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["_id", "v"]))          # v1
    c.update_all({"_id": 2}, {"$set": {"v": "B"}})               # v2
    c.remove_id(3)                                               # v3
    c.insert_df(spark.createDataFrame([(4, "d")], ["_id", "v"]))  # v4
    d = {(r["_id"], r["change_type"]): r["v"]
         for r in c.diff_versions("v1").collect()}
    assert d == {
        (2, "removed"): "b", (2, "added"): "B",   # update = remove+add
        (3, "removed"): "c",
        (4, "added"): "d",
    }
    # bounded diff between two historical versions
    d2 = {(r["_id"], r["change_type"]) for r in c.diff_versions("v2", "v3").collect()}
    assert d2 == {(3, "removed")}
    # identical versions diff empty
    assert c.diff_versions("v4").count() == 0


def test_search_more_like_this(search_corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    out = compile_pipeline(
        search_corpus,
        [{"$search": {"moreLikeThis": {
            "like": {"text": "data model training pipelines"}}}}],
    ).collect()
    ids = [r["doc_id"] for r in out]
    # docs sharing the example's terms, most-similar first; doc 4
    # (no overlap) excluded
    assert set(ids) == {1, 2, 3, 5} and 4 not in ids
    assert out[0]["doc_id"] in (3, 5)  # highest term overlap
    # multiple like docs merge their term pools
    multi = compile_pipeline(
        search_corpus,
        [{"$search": {"moreLikeThis": {"like": [
            {"text": "spark engines"}, {"text": "nothing relevant"}]}}}],
    ).collect()
    assert {r["doc_id"] for r in multi} == {1, 4}
    with pytest.raises(PipelineCompileError, match="like"):
        compile_pipeline(search_corpus, [{"$search": {"moreLikeThis": {}}}])
    with pytest.raises(PipelineCompileError, match="usable terms"):
        compile_pipeline(
            search_corpus,
            [{"$search": {"moreLikeThis": {"like": {"text": "a of to"}}}}],
        )


def test_write_conflict_detection(spark, tmp_path):
    # optimistic concurrency: a mutation whose read snapshot went stale
    # (another writer committed meanwhile) must raise, not last-wins
    import os

    from anser_spark.engine import Engine, WriteConflictError

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("occ").collection("t")
    c.insert_df(spark.createDataFrame([(1, "a")], ["_id", "v"]))      # v1
    # loser takes its snapshot at v1...
    version, stale_ptr = c._next_version()
    assert (version, stale_ptr) == ("v2", "v1")
    # ...winner commits v2 first
    c.update_all({}, {"$set": {"v": "winner"}})
    assert c._pointer() == "v2"
    # loser finishes its write and tries to swap with the stale snapshot
    c._write_version(spark.createDataFrame([(1, "loser")], ["_id", "v"]), "v3")
    with pytest.raises(WriteConflictError, match="another writer"):
        c._swap_pointer("v3", stale_ptr)
    # winner's data stands; loser's version dir was cleaned up
    assert [r["v"] for r in c.find({}).all()] == ["winner"]
    assert not os.path.isdir(os.path.join(c._store_dir, "v3"))
    # retry against the fresh snapshot succeeds
    c.update_all({}, {"$set": {"v": "retry"}})
    assert [r["v"] for r in c.find({}).all()] == ["retry"]


def test_vector_search_similarity_functions(spark, vec_df):
    import math

    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    row0 = vec_df.where("vec_id = 0").first()
    qv = list(row0["embedding"])

    def run(sim):
        return compile_pipeline(
            vec_df,
            [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                "limit": 4, "exact": True, "similarity": sim}}],
        ).collect()

    cos = run("cosine")
    assert cos[0]["vec_id"] == 0 and cos[0]["score"] == pytest.approx(1.0)
    euc = run("euclidean")
    # self-distance 0 → score exactly 1; everything else strictly lower
    assert euc[0]["vec_id"] == 0 and euc[0]["score"] == pytest.approx(1.0)
    assert all(r["score"] < 1.0 for r in euc[1:])
    # euclidean score matches the definition for a checked row
    other = euc[1]
    ov = list(vec_df.where(F.col("vec_id") == other["vec_id"]).first()["embedding"])
    d = math.sqrt(sum((a - b) ** 2 for a, b in zip(ov, qv)))
    assert other["score"] == pytest.approx(1.0 / (1.0 + d), rel=1e-9)
    dot = run("dotProduct")
    exp = (1.0 + sum(a * a for a in qv)) / 2.0
    assert dot[0]["vec_id"] == 0 or dot[0]["score"] >= exp - 1e-9  # self high
    with pytest.raises(PipelineCompileError, match="similarity"):
        run("manhattan")


def test_bm25_search_index(spark, tmp_path):
    # persistent bm25 index: $search {index: name} resolves idf from the
    # stored term table — scores identical to the index-free aggregate
    from anser_spark.engine import Engine, NotFoundError

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    c = eng.db("idx").collection("docs")
    c.insert_df(spark.createDataFrame(
        [(1, "spark engines process data at scale"),
         (2, "the model trains on data data data"),
         (3, "training data for the model"),
         (4, "nothing relevant here at all")], ["doc_id", "text"]))
    c.create_search_index("txt", {"kind": "bm25", "path": "text"})
    assert "txt" in c.list_search_indexes()

    q = {"text": {"query": "data model", "path": "text"}}
    with_idx = c.pipe([{"$search": {"index": "txt", **q}}]).all()
    without = c.pipe([{"$search": q}]).all()
    assert [(r["doc_id"], r["score"]) for r in with_idx] == \
        [(r["doc_id"], r["score"]) for r in without]
    assert {r["doc_id"] for r in with_idx} == {1, 2, 3}

    # unseen term: df=0 idf — same as the aggregate's answer
    q2 = {"text": {"query": "data zzznever", "path": "text"}}
    a = [(r["doc_id"], r["score"]) for r in c.pipe([{"$search": {"index": "txt", **q2}}]).all()]
    b = [(r["doc_id"], r["score"]) for r in c.pipe([{"$search": q2}]).all()]
    assert a == b

    # unknown index name raises through pipe
    with pytest.raises(NotFoundError):
        c.pipe([{"$search": {"index": "nope", **q}}]).all()
    # unresolved string index (bypassing pipe) raises at compile
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    with pytest.raises(PipelineCompileError, match="unresolved"):
        compile_pipeline(c.df(), [{"$search": {"index": "txt", **q}}])


def test_search_text_analyzer_english(search_corpus):
    # round 7: $search text with analyzer 'lucene.english' — stopwords
    # drop, s-stemming conflates plurals on both sides
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    out = compile_pipeline(
        search_corpus,
        [{"$search": {"text": {"query": "engine", "path": "text",
                               "analyzer": "lucene.english"}}}],
    )
    # 'engines' in doc 1 stems to 'engine'
    assert [r["doc_id"] for r in out.select("doc_id").collect()] == [1]
    # standard analyzer: no stemming → no match
    out2 = compile_pipeline(
        search_corpus,
        [{"$search": {"text": {"query": "engine", "path": "text"}}}],
    )
    assert out2.count() == 0
    # stopword-only query under english matches nothing
    out3 = compile_pipeline(
        search_corpus,
        [{"$search": {"text": {"query": "the at", "path": "text",
                               "analyzer": "lucene.english"}}}],
    )
    assert out3.count() == 0
    import pytest as _pytest
    with _pytest.raises(PipelineCompileError, match="analyzer"):
        compile_pipeline(
            search_corpus,
            [{"$search": {"text": {"query": "x", "path": "text",
                                   "analyzer": "lucene.klingon"}}}],
        )
