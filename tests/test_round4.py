"""Round-4 additions: BM25 ranking, embedding quantization, ORC
source/sink, backup export formats."""

import math
import os

import pytest
from pyspark.sql import functions as F

from anser_spark.operators import (
    bm25_score,
    bm25_top_k,
    quantization_report,
    quantize_embeddings,
)


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


def test_bm25_matches_reference_math(corpus):
    out = {r["doc_id"]: r for r in bm25_score(corpus, ["data", "model"]).collect()}
    # pure-Python reference on the same 5-doc corpus
    docs = {
        1: "spark engines process data at scale",
        2: "the model trains on data data data",
        3: "training data for the model",
        4: "nothing relevant here at all",
        5: "",
    }
    toks = {i: [w for w in t.lower().split() if w] for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75
    for term in ["data", "model"]:
        df_t = sum(1 for v in toks.values() if term in v)
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            expected = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            # scores are additive per term; accumulate for comparison below
            docs.setdefault("_exp", {}).setdefault(i, 0.0)  # type: ignore[arg-type]
            docs["_exp"][i] += expected  # type: ignore[index]
    for i, exp in docs["_exp"].items():  # type: ignore[union-attr]
        assert out[i]["score"] == pytest.approx(exp, rel=1e-12)
    # ranking: doc 2 (tf=3 of 'data' + 'model') must beat doc 4 (zero)
    top = bm25_top_k(corpus, ["data", "model"], k=2).collect()
    assert top[0]["doc_id"] == 2
    assert all(r["score"] > 0 for r in top)


def test_bm25_validation_and_plan(corpus):
    with pytest.raises(ValueError):
        bm25_score(corpus, [])
    plan = bm25_top_k(corpus, ["data"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts


def test_quantize_roundtrip(spark):
    rows = [
        (0, [1.0, -2.0, 0.5, 127.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),  # zero vector: guard, codes all 0
        (2, [-0.001, 0.001, 0.0005, -0.00025]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    # max-abs symmetric: the largest-magnitude element maps to ±127
    assert q[0]["qvec"][3] == 127
    assert q[0]["scale"] == pytest.approx(1.0)
    assert q[0]["qvec"] == [1, -2, 1, 127]  # 0.5/1.0 rounds HALF_UP to 1
    assert q[1]["qvec"] == [0, 0, 0, 0]
    assert max(abs(c) for c in q[2]["qvec"]) == 127
    # dequantized error bounded by scale/2 per element
    for r in q.values():
        for code, x in zip(r["qvec"], r["embedding"]):
            assert abs(code * r["scale"] - x) <= r["scale"] / 2 + 1e-12
    rep = {r["vec_id"]: r for r in quantization_report(df).collect()}
    assert rep[1]["q_l1"] == 0 and rep[1]["mse_e9"] == 0
    assert rep[0]["n_dims"] == 4
    assert rep[0]["q_l1"] == 1 + 2 + 1 + 127


def test_orc_source_and_backup_formats(spark, tmp_path):
    from anser_spark.engine import Engine
    from anser_spark.sources.backup import BackupOptions, backup_collection
    from anser_spark.sources.readers import read_table

    src = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "val"]
    )
    orc_path = str(tmp_path / "table.orc")
    src.write.orc(orc_path)
    back = read_table(spark, orc_path)
    assert sorted(r["k"] for r in back.collect()) == [1, 2, 3]
    assert dict(back.dtypes)["val"] == "double"

    # engine reads an ORC source as a collection; first mutation
    # converts it to a parquet version
    srcdir = tmp_path / "srcs"
    srcdir.mkdir()
    src.write.orc(str(srcdir / "orc_coll.orc"))
    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    eng.mount("db1", str(srcdir))
    coll = eng.db("db1").collection("orc_coll")
    assert coll.count() == 3
    coll.update_all({"k": {"$gte": 2}}, {"$inc": {"val": 1.0}})
    vals = {r["k"]: r["val"] for r in coll.df().collect()}
    assert vals == {1: 10.0, 2: 21.0, 3: 31.0}

    # backup export formats round-trip
    for fmt, reader in [
        ("orc", lambda p: spark.read.orc(p)),
        ("json", lambda p: spark.read.json(p)),
        ("csv", lambda p: spark.read.csv(p, header=True, inferSchema=True)),
    ]:
        report = backup_collection(
            coll, BackupOptions(target_dir=str(tmp_path / f"bk_{fmt}"), format=fmt)
        )
        assert report["data_path"].endswith("." + fmt)
        got = reader(report["data_path"])
        assert got.count() == 3
    with pytest.raises(ValueError):
        backup_collection(
            coll, BackupOptions(target_dir=str(tmp_path / "bk_bad"), format="avro")
        )


def test_shuffle_key_and_shards(spark):
    import hashlib

    from anser_spark.operators.corpus import shuffle_shards, with_shuffle_key

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r["shuffle_key"] for r in with_shuffle_key(df).collect()}
    # exact md5 parity with the pure-Python reference
    for i in (0, 1, 500, 999):
        assert out[i] == hashlib.md5(str(i).encode()).hexdigest()
    # a salt is an independent permutation
    salted = {r["doc_id"]: r["shuffle_key"] for r in with_shuffle_key(df, salt="s").collect()}
    order_a = sorted(out, key=out.get)
    order_b = sorted(salted, key=salted.get)
    assert order_a != order_b
    # shards: contiguous key ranges, locally sorted, union = corpus
    sharded = shuffle_shards(df, num_shards=8)
    parts = sharded.rdd.glom().collect()
    non_empty = [p for p in parts if p]
    assert len(non_empty) >= 2
    bounds = []
    seen = set()
    for p in non_empty:
        keys = [r["shuffle_key"] for r in p]
        assert keys == sorted(keys)  # locally sorted
        bounds.append((keys[0], keys[-1]))
        seen.update(r["doc_id"] for r in p)
    assert seen == set(range(1000))
    # range partitioning: shard key ranges do not interleave
    bounds.sort()
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 <= lo2


def test_simhash_arrow_golden_and_properties(spark):
    import numpy as np
    import pandas as pd
    import re as _re

    from anser_spark.operators.dedup import simhash_hamming, with_simhash_arrow

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The  Quick Brown Fox jumps over the lazy dog"),  # normalizes to 1
        (3, "the quick brown fox leaps over the lazy dog"),   # near dup
        (4, "completely unrelated text about database engines"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["simhash"] for r in with_simhash_arrow(df).collect()}

    # independent per-doc reference: same hash family, scalar vote loop
    def ref(text):
        words = _re.sub(r"\s+", " ", text.strip().lower(), flags=_re.ASCII).split(" ")
        hashes = pd.util.hash_array(np.array(words, dtype=object))
        votes = [0] * 64
        for h in hashes:
            for k in range(64):
                votes[k] += 1 if (int(h) >> k) & 1 else -1
        packed = 0
        for k in range(64):
            if votes[k] > 0:
                packed |= 1 << k
        return packed - (1 << 64) if packed >= (1 << 63) else packed

    for i, text in rows:
        assert got[i] == ref(text), f"doc {i}"
    assert got[1] == got[2]  # normalization folds case/whitespace

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(got[1], got[3]) < hamming(got[1], got[4])
    # Column-side hamming agrees with python popcount
    pairs = spark.createDataFrame([(got[1], got[3])], ["a", "b"])
    from pyspark.sql import functions as F

    spark_h = pairs.select(simhash_hamming(F.col("a"), F.col("b")).alias("h")).first()["h"]
    assert spark_h == hamming(got[1], got[3])


@pytest.fixture(scope="module")
def vec_df(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(50):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)], "even" if i % 2 == 0 else "odd"))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "parity"])


def test_vector_search_stage_exact(vec_df):
    from anser_spark.plans.pipeline import compile_pipeline

    qv = [r for r in vec_df.where("vec_id = 0").first()["embedding"]]
    out = compile_pipeline(
        vec_df,
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "exact": True}}],
    ).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0  # self-match first
    assert out[0]["score"] == pytest.approx(1.0)  # (1+cos)/2 at cos=1
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0.0 <= s <= 1.0 for s in scores)

    # pure-python cross-check of the full ranking
    import math

    rows = {r["vec_id"]: r["embedding"] for r in vec_df.collect()}
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    expect = sorted(rows, key=lambda i: (-cos(rows[i], qv), i))[:5]
    assert [r["vec_id"] for r in out] == expect


def test_vector_search_stage_filter_and_ivf(vec_df):
    from anser_spark.plans.pipeline import compile_pipeline

    qv = [r for r in vec_df.where("vec_id = 0").first()["embedding"]]
    flt = compile_pipeline(
        vec_df,
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "filter": {"parity": "odd"}}}],
    ).collect()
    assert all(r["vec_id"] % 2 == 1 for r in flt)
    # ivf at full probe == exact top-k (probe covers every list)
    exact = compile_pipeline(
        vec_df,
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "exact": True}}],
    ).collect()
    ivf = compile_pipeline(
        vec_df,
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv, "limit": 5,
                            "index": {"kind": "ivf", "nlist": 4, "nprobe": 4}}}],
    ).collect()
    assert [r["vec_id"] for r in ivf] == [r["vec_id"] for r in exact]


def test_rank_fusion_stage(spark, vec_df):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    qv = [r for r in vec_df.where("vec_id = 0").first()["embedding"]]
    out = compile_pipeline(
        vec_df,
        [{"$rankFusion": {
            "input": {"pipelines": {
                "vector": [{"$vectorSearch": {"path": "embedding",
                                              "queryVector": qv, "limit": 5,
                                              "exact": True}}],
                "small_ids": [{"$sort": {"vec_id": 1}}, {"$limit": 5}],
            }},
            "combination": {"weights": {"vector": 2.0, "small_ids": 1.0}},
            "key": "vec_id",
        }}],
    ).collect()
    got = {r["vec_id"]: r for r in out}
    # vec 0 is rank 1 in both legs: fused = 2/61 + 1/61
    assert got[0]["score"] == pytest.approx(2.0 / 61 + 1.0 / 61)
    assert got[0]["vector_rank"] == 1 and got[0]["small_ids_rank"] == 1
    # fused ordering is descending
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # docs only in one leg carry a NULL rank for the other
    one_leg = [r for r in out if r["vector_rank"] is None or r["small_ids_rank"] is None]
    assert one_leg, "expected docs ranked by only one pipeline"
    with pytest.raises(PipelineCompileError):
        compile_pipeline(
            vec_df,
            [{"$rankFusion": {"input": {"pipelines": {
                "bad": [{"$match": {"parity": "odd"}}]}}, "key": "vec_id"}}],
        )


def test_search_stage_bm25(corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    out = compile_pipeline(
        corpus,
        [{"$search": {"text": {"query": "data model", "path": "text"}}},
         {"$limit": 3}],
    ).collect()
    # relevance order: doc 2 (data x3 + model) first; scores positive
    assert out[0]["doc_id"] == 2
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0
    # original columns survive
    assert "text" in out[0].asDict()
    with pytest.raises(PipelineCompileError):
        compile_pipeline(corpus, [{"$search": {"text": {"query": "  ", "path": "text"}}}])
    # $search ranks a $rankFusion input
    fused = compile_pipeline(
        corpus,
        [{"$rankFusion": {
            "input": {"pipelines": {
                "rel": [{"$search": {"text": {"query": "data", "path": "text"}}},
                        {"$limit": 3}],
                "ids": [{"$sort": {"doc_id": 1}}, {"$limit": 3}],
            }},
            "key": "doc_id",
        }}],
    ).collect()
    assert {r["doc_id"] for r in fused} >= {1, 2, 3}


def test_stream_into_collection(spark, tmp_path):
    import time as _time

    from anser_spark.engine import Engine
    from anser_spark.streaming.ingest import stream_into_collection

    # file stream source: two batches of JSON lines
    srcdir = tmp_path / "stream_src"
    srcdir.mkdir()
    schema = "event_id long, kind string"
    with open(srcdir / "a.jsonl", "w") as fh:
        fh.write('{"event_id": 1, "kind": "x"}\n{"event_id": 2, "kind": "y"}\n')
    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    coll = eng.db("ing").collection("events_in")
    stream = spark.readStream.schema(schema).json(str(srcdir))
    q = stream_into_collection(
        stream, coll, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)
    assert coll.count() == 2
    # second run picks up only NEW files (checkpointed offsets)
    with open(srcdir / "b.jsonl", "w") as fh:
        fh.write('{"event_id": 3, "kind": "z"}\n')
    q2 = stream_into_collection(
        stream, coll, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    q2.awaitTermination(120)
    assert coll.count() == 3
    # ingested collection is a first-class queryable collection
    assert coll.find({"kind": "z"}).all()[0]["event_id"] == 3


def test_score_fusion_stage(vec_df, corpus):
    from anser_spark.plans.pipeline import PipelineCompileError, compile_pipeline

    qv = [r for r in vec_df.where("vec_id = 0").first()["embedding"]]
    vs = {"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "exact": True}}
    out = compile_pipeline(
        vec_df,
        [{"$scoreFusion": {
            "input": {"pipelines": {"a": [vs], "b": [vs]},
                      "normalization": "none"},
            "combination": {"weights": {"a": 1.0, "b": 3.0}},
            "key": "vec_id",
        }}],
    ).collect()
    got = {r["vec_id"]: r for r in out}
    # identical legs: fused(sum) = 4 * leg score; self-match = 4.0
    assert got[0]["score"] == pytest.approx(4.0)
    for r in out:
        assert r["score"] == pytest.approx(r["a_score"] + 3.0 * r["b_score"])
    # avg with minMaxScaler: scores land in [0, 1]
    avg = compile_pipeline(
        vec_df,
        [{"$scoreFusion": {
            "input": {"pipelines": {"a": [vs]}, "normalization": "minMaxScaler"},
            "combination": {"method": "avg"},
            "key": "vec_id",
        }}],
    ).collect()
    scores = [r["score"] for r in avg]
    assert max(scores) == pytest.approx(1.0) and min(scores) == pytest.approx(0.0)
    # sigmoid bounds
    sig = compile_pipeline(
        vec_df,
        [{"$scoreFusion": {
            "input": {"pipelines": {"a": [vs]}, "normalization": "sigmoid"},
            "key": "vec_id",
        }}],
    ).collect()
    assert all(0.5 < r["score"] < 1.0 for r in sig)  # raw scores in (0,1]
    with pytest.raises(PipelineCompileError):
        compile_pipeline(
            corpus,
            [{"$scoreFusion": {"input": {"pipelines": {
                "bad": [{"$match": {"doc_id": 1}}]}}, "key": "doc_id"}}],
        )


def test_meta_search_score_projection(corpus):
    from anser_spark.plans.pipeline import compile_pipeline

    out = compile_pipeline(
        corpus,
        [{"$search": {"text": {"query": "data", "path": "text"}}},
         {"$project": {"doc_id": 1, "relevance": {"$meta": "searchScore"}}},
         {"$limit": 2}],
    ).collect()
    assert out[0]["relevance"] > 0
    assert list(out[0].asDict()) == ["doc_id", "relevance"]


def test_persistent_vector_search_index(spark, tmp_path):
    import random

    from anser_spark.engine import Engine, NotFoundError

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    coll = eng.db("vs").collection("vecs")
    coll._rewrite(spark.createDataFrame(rows, ["vec_id", "embedding"]))

    coll.create_search_index("emb_ivf", {"kind": "ivf", "path": "embedding",
                                         "nlist": 4, "nprobe": 4})
    assert coll.list_search_indexes() == ["emb_ivf"]

    qv = rows[0][1]
    by_name = coll.pipe(
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "index": "emb_ivf"}}]
    ).to_df().collect()
    exact = coll.pipe(
        [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                            "limit": 5, "exact": True}}]
    ).to_df().collect()
    # full probe == exact ranking, served from the PREBUILT index
    assert [r["vec_id"] for r in by_name] == [r["vec_id"] for r in exact]

    # named index resolves inside $rankFusion sub-pipelines too
    fused = coll.pipe(
        [{"$rankFusion": {"input": {"pipelines": {
            "v": [{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                     "limit": 5, "index": "emb_ivf"}}]}},
          "key": "vec_id"}}]
    ).to_df().collect()
    assert fused[0]["vec_id"] == 0

    coll.drop_search_index("emb_ivf")
    assert coll.list_search_indexes() == []
    with pytest.raises(NotFoundError):
        coll.pipe([{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                      "limit": 5, "index": "emb_ivf"}}])


def test_quantized_cosine_top_k(spark):
    import math
    import random

    from anser_spark.operators import quantize_embeddings, quantized_cosine_top_k

    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = rows[0][1]
    coded = quantize_embeddings(df)
    got = quantized_cosine_top_k(coded, q, k=10)
    out = got.collect()
    assert out[0]["vec_id"] == 0 and out[0]["qcosine"] > 0.999
    # plan: TakeOrdered, no shuffle
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    # int8 rounding keeps ranking close to exact: top-10 recall >= 8/10
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))
    exact = set(sorted(range(200), key=lambda i: (-cos(rows[i][1], q), i))[:10])
    approx = {r["vec_id"] for r in out}
    assert len(exact & approx) >= 8
    # per-pair cosine error is small (scale cancels; only rounding noise)
    exact_cos = {i: cos(rows[i][1], q) for i in approx}
    for r in out:
        assert abs(r["qcosine"] - exact_cos[r["vec_id"]]) < 0.01
