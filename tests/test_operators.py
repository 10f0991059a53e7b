"""Beyond-reference pipeline operators (SURVEY.md §7 M7): dedup,
similarity, text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from anser_spark.operators import (
    cosine_top_k,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    text_stats,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_simhash,
    with_token_count,
)
from anser_spark.operators.dedup import simhash_hamming


@pytest.fixture(scope="module")
def dup_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The  Quick Brown Fox jumps over the lazy dog"),  # case/space dup of 1
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup of 1
        (5, "completely different content about spark engines"),
        (6, "der schnelle braune fuchs springt über den faulen hund und der hund schläft"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(dup_df):
    out = exact_dedup(dup_df)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 4, 5, 6]  # 2 and 3 fold into 1 (normalized)
    strict = exact_dedup(dup_df, normalize=False)
    assert sorted(r["doc_id"] for r in strict.collect()) == [1, 3, 4, 5, 6]


def test_minhash_pairs_and_dedup(dup_df):
    pairs = minhash_near_dup_pairs(dup_df, k=2, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got and (1, 3) in got  # exact dups always pair
    assert (1, 4) in got or (2, 4) in got or (3, 4) in got  # near dup found
    assert all(5 not in p and 6 not in p for p in got)
    deduped = minhash_dedup(dup_df, k=2, threshold=0.5)
    ids = sorted(r["doc_id"] for r in deduped.collect())
    assert ids == [1, 5, 6]


def test_ngram_jaccard(dup_df):
    pairs = ngram_jaccard_pairs(dup_df, k=2, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 4) in got and 0.5 <= got[(1, 4)] < 1.0


def test_simhash(dup_df):
    out = with_simhash(dup_df).collect()
    sims = {r["doc_id"]: r["simhash"] for r in out}
    assert sims[1] == sims[2]  # identical text → identical simhash
    df = dup_df.sparkSession.createDataFrame(
        [(a, b) for a in sims for b in sims if a < b], ["a", "b"]
    )
    # hamming distance between near-dups (1,4) far below unrelated (1,5)
    ham = with_simhash(dup_df).select("doc_id", "simhash")
    a = ham.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sa"))
    b = ham.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sb"))
    d = (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .withColumn("ham", simhash_hamming(F.col("sa"), F.col("sb")))
        .collect()
    )
    dist = {(r["a"], r["b"]): r["ham"] for r in d}
    assert dist[(1, 4)] < dist[(1, 5)]


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, ""), (3, "!!! ??? ..."), (4, "  spaced   out  ")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_tokens"] for r in with_token_count(df).collect()}
    assert out == {1: 6, 2: 0, 3: 3, 4: 2}
    q = {r["doc_id"]: r["quality"] for r in with_quality_score(df).collect()}
    assert q[1] > q[3]  # prose beats punctuation soup
    assert all(0.0 <= v <= 1.0 for v in q.values())


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is happy"),
            (2, "der hund ist nicht mit der katze auf dem dach"),
            (3, "le chat est dans la maison et les chiens"),
            (4, "el perro es un animal que vive con las personas"),
            (5, "xyzzy plugh qwerty"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_id"] for r in with_language_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "es"
    assert out[5] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "goodbye world")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in with_fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_text_stats_combined(engine):
    docs = engine.db("tpch").collection("documents").df().limit(50)
    out = text_stats(docs)
    rows = out.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert r["n_chars_calc"] == r["n_chars"]  # matches driver-provided count
        assert r["n_tokens"] > 0 and 0 <= r["quality"] <= 1


def test_cosine_top_k(engine):
    emb = engine.db("tpch").collection("embeddings").df()
    first = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    out = cosine_top_k(emb, list(first), k=5).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0 and abs(out[0]["cosine"] - 1.0) < 1e-6
    cosines = [r["cosine"] for r in out]
    assert cosines == sorted(cosines, reverse=True)


def test_embedding_near_dup(spark):
    base = [1.0, 0.0, 0.5, 0.2]
    rows = [
        (1, base),
        (2, [x * 2 for x in base]),        # same direction → cosine 1
        (3, [x + 0.01 for x in base]),     # near dup
        (4, [-1.0, 5.0, -0.5, 0.1]),       # unrelated
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(df, dim=4, threshold=0.99, bits=8, bands=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert all(4 not in p for p in got)


def test_multimodal_stub_pipeline(spark):
    from anser_spark.operators.multimodal import (
        attach_media_metadata,
        extract_image_features,
        sample_video_frames,
    )

    rows = [("m1", b"fakejpegbytes", "image/jpeg", 5000), ("m2", b"otherbytes", "image/png", 2500)]
    df = spark.createDataFrame(rows, ["media_id", "payload", "mime", "duration_ms"])
    meta = attach_media_metadata(df)
    got = {r["media_id"]: r["n_bytes"] for r in meta.collect()}
    assert got == {"m1": 13, "m2": 10}
    feats = extract_image_features(df).collect()
    by_id = {r["media_id"]: r["features"] for r in feats}
    assert len(by_id["m1"]) == 8 and by_id["m1"] != by_id["m2"]
    # determinism
    feats2 = extract_image_features(df).collect()
    assert {r["media_id"]: r["features"] for r in feats2} == by_id
    with pytest.raises(NotImplementedError):
        extract_image_features(df, strict=True)
    frames = sample_video_frames(df, every_ms=1000).collect()
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(per["m1"]) == [0, 1000, 2000, 3000, 4000]
    assert sorted(per["m2"]) == [0, 1000, 2000]


def test_multimodal_pluggable_decode_golden(spark):
    # The decode= hook is the contract point where a real codec plugs
    # in: a custom callable must receive the raw payload bytes and its
    # return become the features column, Arrow-batched, byte-exact.
    import hashlib

    from anser_spark.operators.multimodal import decode_image_stub, extract_image_features

    rows = [("m1", b"fakejpegbytes"), ("m2", b"otherbytes"), ("m3", None)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])

    def my_decode(payload):
        if payload is None:
            return [-1.0]
        return [float(len(payload)), float(payload[0])]

    got = {r["media_id"]: list(r["features"])
           for r in extract_image_features(df, decode=my_decode).collect()}
    assert got == {"m1": [13.0, ord("f")], "m2": [10.0, ord("o")], "m3": [-1.0]}

    # golden for the default stub: sha256(payload)[:8]/255 as float32
    import numpy as np

    stub = {r["media_id"]: list(r["features"])
            for r in extract_image_features(df).collect()}
    for mid, payload in rows:
        exp = [0.0] * 8 if payload is None else [
            b / 255.0 for b in hashlib.sha256(payload).digest()[:8]]
        assert stub[mid] == [float(np.float32(v)) for v in exp]
    assert decode_image_stub(b"fakejpegbytes") == [
        b / 255.0 for b in hashlib.sha256(b"fakejpegbytes").digest()[:8]]


# --- SimHash pure-Python reference golden ------------------------------
# Independent reimplementation of XXH64 (public algorithm, seed 42 like
# Spark's xxhash64) + the SimHash bit-vote, cross-checking the Column
# formulation in operators.dedup.with_simhash on a fixed corpus.

_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                           0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                           0x27D4EB2F165667C5)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def _xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed & _M, (seed - _P1) & _M]
        while i + 32 <= n:
            for j in range(4):
                k = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v[j] = (_rotl((v[j] + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & _M
        for j in range(4):
            h = ((h ^ ((_rotl((v[j] * _P2) & _M, 31) * _P1) & _M)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = int.from_bytes(data[i:i + 8], "little")
        h = (_rotl(h ^ ((_rotl((k * _P2) & _M, 31) * _P1) & _M), 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _simhash_py(text: str, bits: int = 64) -> int:
    import re as _re
    tokens = _re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    votes = [0] * bits
    for t in tokens:
        h = _xxh64(t.encode("utf-8"))
        for i in range(bits):
            votes[i] += 1 if (h >> i) & 1 else -1
    packed = sum((1 << i) for i in range(bits) if votes[i] > 0)
    return packed - (1 << 64) if packed >= (1 << 63) else packed


def test_xxh64_reference_matches_spark(spark):
    from pyspark.sql import functions as F
    toks = ["hello", "a", "", "的 是 了", "the quick brown fox jumps over the lazy dog!"]
    got = spark.createDataFrame([(t,) for t in toks], "t string").select(
        "t", F.xxhash64("t").alias("h")).collect()
    for r in got:
        u = _xxh64(r["t"].encode("utf-8"))
        assert r["h"] == (u - (1 << 64) if u >= (1 << 63) else u), r["t"]


def test_simhash_pure_python_golden(spark):
    from anser_spark.operators.dedup import with_simhash

    corpus = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumped over the lazy dog",
        "Completely different content about spark engines",
        "singletoken",
        "  spaced    out   Words  ",
        "unicode 的 tokens mixed in 的 text",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "i int, text string")
    got = {r["i"]: r["simhash"] for r in with_simhash(df).collect()}
    exp = {i: _simhash_py(t) for i, t in enumerate(corpus)}
    assert got == exp
    # near-dup texts land close in hamming space, unrelated ones far
    d01 = bin((exp[0] & _M) ^ (exp[1] & _M)).count("1")
    d02 = bin((exp[0] & _M) ^ (exp[2] & _M)).count("1")
    assert d01 < d02


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id labels
    return {x: find(x) for x in range(n_nodes)}


def test_connected_components_vs_union_find(spark):
    # randomized graphs cross-checked against a pure-Python union-find
    import random

    from anser_spark.operators.dedup import connected_components

    rng = random.Random(7)
    for trial in range(4):
        n = rng.choice([12, 40, 80])
        m = rng.randint(n // 3, n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        exp_all = _union_find_components(n, edges)
        in_graph = {a for e in edges for a in e}
        # normalize union-find roots to the true min id of each component
        comp_min = {}
        for x in in_graph:
            comp_min.setdefault(exp_all[x], min(
                y for y in in_graph if exp_all[y] == exp_all[x]))
        exp = {x: comp_min[exp_all[x]] for x in in_graph}
        assert got == exp, f"trial {trial}"


def test_connected_components_path_chain(spark):
    # a long path graph is the worst case for naive propagation — the
    # star algorithm collapses it in O(log^2 n) rounds
    from anser_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(0, 63)] + [(100, 101), (200, 200)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert all(got[i] == 0 for i in range(64))
    assert got[100] == 100 and got[101] == 100
    assert 200 not in got  # self-loop dropped


def test_dedup_clusters_transitive_chain(spark):
    from anser_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    # chain 0-1-2 (0,2 NOT a direct pair) + pair 4-5; 3 is a singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    out = {r["doc_id"]: r["component"]
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}
    survivors = sorted(k for k, v in out.items() if k == v)
    assert survivors == [0, 3, 4]


def test_connected_components_string_ids(spark):
    from anser_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    got = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_pack_sequences_layout(spark):
    from pyspark.sql import functions as F

    from anser_spark.operators.packing import pack_sequences

    rows = [(0, 300), (8, 300), (16, 100), (1, 600), (9, 10), (17, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(
        df, capacity=512, num_shards=8).collect()}
    # shard 0: docs 0,8,16 at offsets 0,300,600
    assert (out[0]["shard"], out[0]["pack_offset"]) == (0, 0)
    assert out[8]["pack_offset"] == 300
    assert out[16]["pack_offset"] == 600
    # doc 8 straddles the 512 boundary: blocks 0..1
    assert (out[8]["block_start"], out[8]["block_end"]) == (0, 1)
    assert (out[16]["block_start"], out[16]["block_end"]) == (1, 1)
    # shard 1: doc 1 spans blocks 0..1; doc 9 follows at 600
    assert (out[1]["block_start"], out[1]["block_end"]) == (0, 1)
    assert out[9]["pack_offset"] == 600
    # empty doc occupies its starting block only
    assert out[17]["block_start"] == out[17]["block_end"]
    # custom shard column
    out2 = pack_sequences(
        df, capacity=512, shard_col=F.lit(0)).orderBy("doc_id").collect()
    offsets = [r["pack_offset"] for r in out2]
    assert offsets == [0, 300, 900, 1200, 1210, 1310]


def test_pack_sequences_determinism_and_validation(spark):
    import pytest as _pytest

    from anser_spark.operators.packing import pack_sequences

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tokens"))
    a = sorted(map(tuple, pack_sequences(df, capacity=64).collect()))
    b = sorted(map(tuple, pack_sequences(df, capacity=64).collect()))
    assert a == b
    with _pytest.raises(ValueError):
        pack_sequences(df, capacity=0)


def test_hash_split_ratios_and_determinism(spark):
    import hashlib

    from anser_spark.operators.corpus import hash_split

    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    out = hash_split(df).collect()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert abs(counts["train"] / 4000 - 0.9) < 0.03
    assert abs(counts.get("val", 0) / 4000 - 0.05) < 0.02
    assert abs(counts.get("test", 0) / 4000 - 0.05) < 0.02
    # exact agreement with a pure-Python recomputation
    for r in out[:200]:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        exp = "train" if b < int(0.9 * 65536) else (
            "val" if b < int(0.95 * 65536) else "test")
        assert (r["__bucket"], r["split"]) == (b, exp)
    # salt derives an independent assignment; determinism holds per salt
    salted = {r["doc_id"]: r["split"] for r in hash_split(df, salt="v2").collect()}
    plain = {r["doc_id"]: r["split"] for r in out}
    assert salted != plain
    again = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert again == plain
    # custom ordered weights + validation
    two = hash_split(df, weights={"a": 1, "b": 1}).collect()
    ca = sum(1 for r in two if r["split"] == "a")
    assert abs(ca / 4000 - 0.5) < 0.03
    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_split(df, weights={})
    with _pytest.raises(ValueError):
        hash_split(df, weights={"a": -1, "b": 2})


def test_contamination_pairs_and_decontaminate(spark):
    from anser_spark.operators.corpus import contaminated_pairs, decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text about spark dataframes"),
            (3, "the quick brown fox naps all day long"),
        ],
        "doc_id long, text string",
    )
    test_set = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        "doc_id long, text string",
    )
    pairs = {
        (r["train_id"], r["test_id"]): r["n_shared"]
        for r in contaminated_pairs(train, test_set, k=3, min_shared=2).collect()
    }
    # doc 1 shares 'the quick brown','quick brown fox','brown fox
    # jumps','fox jumps over'
    assert pairs[(1, 100)] == 4
    # doc 3 shares 2 trigrams, doc 2 none
    assert pairs.get((3, 100)) == 2
    assert not any(t == 2 for t, _ in pairs)
    clean = decontaminate(train, test_set, k=3, min_shared=2)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2]
    # higher threshold keeps doc 3
    clean2 = decontaminate(train, test_set, k=3, min_shared=3)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [2, 3]


def test_stratified_sample(spark):
    import hashlib

    from anser_spark.operators.corpus import stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
        .otherwise("fr").alias("lang"),
    )
    rates = {"en": 0.5, "de": 0.1}
    out = stratified_sample(df, rates, default_rate=0.9).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["lang"], set()).add(r["doc_id"])
    assert abs(len(kept["en"]) / 1000 - 0.5) < 0.06
    assert abs(len(kept["de"]) / 1000 - 0.1) < 0.05
    assert abs(len(kept["fr"]) / 1000 - 0.9) < 0.05
    # exact membership agrees with pure-Python md5 math
    for r in out[:100]:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:4], 16)
        rate = rates.get(r["lang"], 0.9)
        assert b < int(rate * 65536)
    # nested: raising a rate strictly grows the sample
    bigger = stratified_sample(df, {"en": 0.8, "de": 0.1}, default_rate=0.9).collect()
    kept_big = {r["doc_id"] for r in bigger if r["lang"] == "en"}
    assert kept["en"] <= kept_big
    import pytest as _pytest
    with _pytest.raises(ValueError):
        stratified_sample(df, {"en": 1.5})


def test_pii_scrub_and_metrics(spark):
    from anser_spark.operators.text import pii_metrics, scrub_pii

    rows = [
        (1, "mail me at a.b+c@example.org or call 555-123-4567"),
        (2, "server at 10.0.0.1 and 192.168.255.254 are up"),
        (3, "invalid ip 999.999.999.999 stays; 256.1.2.3 stays"),
        (4, "version 1.2.3.4.5 loses its valid prefix"),  # documented limitation
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in scrub_pii(pii_metrics(df), out="scrubbed").collect()}
    assert out[1]["scrubbed"] == "mail me at <EMAIL> or call <PHONE>"
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1 and out[1]["n_ipv4"] == 0
    assert out[2]["scrubbed"] == "server at <IP> and <IP> are up"
    assert out[2]["n_ipv4"] == 2
    # tightened octets: invalid addresses are left alone
    assert out[3]["scrubbed"] == rows[2][1]
    assert out[3]["n_ipv4"] == 0
    # RE2-parity limitation (no lookarounds): dotted version strings
    # lose a valid-IP-shaped prefix
    assert out[4]["scrubbed"] == "version <IP>.5 loses its valid prefix"
    assert out[5]["scrubbed"] == rows[4][1]


def test_repetition_metrics_null_and_values(spark):
    from anser_spark.operators.text import repetition_metrics

    rows = [
        (1, "a a a a"),                      # one distinct word, one bigram
        (2, "the cat sat on the mat"),       # no repeated bigram
        (3, ""),                             # empty
        (4, None),                           # NULL degrades like empty
        (5, "x"),                            # single token, no bigrams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct_tokens"] == 1
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["top_gram_count"] == 3 and out[1]["n_grams"] == 3
    assert out[1]["top_gram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == pytest.approx(round(1 - 5 / 6, 4))
    assert out[2]["top_gram_count"] == 1 and out[2]["n_grams"] == 5
    # NULL text == empty text == all zeros (no mixed NULL/0 rows)
    for doc in (3, 4):
        r = out[doc]
        assert (r["n_tokens"], r["n_distinct_tokens"], r["dup_word_frac"],
                r["top_gram_count"], r["n_grams"], r["top_gram_frac"]) == (0, 0, 0.0, 0, 0, 0.0)
    assert out[5]["n_tokens"] == 1 and out[5]["n_grams"] == 0


def _wav_bytes(freq=440.0, sr=8000, ms=250, channels=1, width=2):
    import io
    import math
    import struct
    import wave

    n = sr * ms // 1000
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(sr)
        amp = 2 ** (8 * width - 1) - 1
        frames = b"".join(
            struct.pack("<h", int(amp * 0.5 * math.sin(2 * math.pi * freq * i / sr)))
            * channels
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_real_codec(spark):
    # the REAL audio decode path (stdlib wave): container metadata and
    # signal features computed from actual PCM bytes, malformed bytes
    # degrade to an all-null feature row
    import math

    from anser_spark.operators.multimodal import decode_wav, extract_audio_features

    wav = _wav_bytes()
    d = decode_wav(wav)
    assert d["sample_rate"] == 8000 and d["n_channels"] == 1
    assert d["duration_ms"] == 250 and d["n_frames"] == 2000
    # 0.5-amplitude sine: rms = 0.5/sqrt(2), peak ~= 0.5
    assert abs(d["rms"] - 0.5 / math.sqrt(2)) < 0.01
    assert abs(d["peak"] - 0.5) < 0.01
    assert decode_wav(b"not a wav file") is None

    df = spark.createDataFrame(
        [("m1", wav), ("m2", b"garbage"), ("m3", None)],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    assert rows["m1"]["sample_rate"] == 8000
    assert abs(rows["m1"]["peak"] - 0.5) < 0.01
    assert rows["m2"]["sample_rate"] is None
    assert rows["m3"]["rms"] is None


def test_gopher_rules(spark):
    from anser_spark.operators.text import gopher_rules

    docs = [
        ("g1", "the quick brown fox jumps over the lazy dog and runs home"),
        ("g2", "aa bb cc"),  # too short, no alpha problem but <5 words
        ("g3", "# # # # # the of and to in a is it for on"),  # symbol-heavy
        ("g4", "- one\n- two\n- three\n- four"),  # all bullet lines
        ("g5", "the of and...\nto in a...\nis it for...\nhmm..."),  # ellipses
        ("g6", "1 2 3 4 5 6 7 8 9 10 the of"),  # mostly non-alpha words
        ("g7", None),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    rows = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    assert rows["g1"]["gopher_keep"] is True
    assert rows["g2"]["rule_word_count"] is False
    assert rows["g3"]["rule_symbol_ratio"] is False
    assert rows["g4"]["rule_bullets"] is False and rows["g4"]["gopher_keep"] is False
    assert rows["g5"]["rule_ellipsis"] is False
    assert rows["g6"]["rule_alpha_words"] is False
    assert rows["g7"]["gopher_keep"] is False
    # single scan, zero exchanges
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_mix(spark):
    from anser_spark.operators.corpus import temperature_mix

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # T=1: natural proportions — everything kept (rate_i = 1)
    nat = temperature_mix(df, temperature=1.0)
    assert nat.count() == 1000
    # T→large: shares → uniform (500/500 target): big downsampled to
    # ~500, small (target 500 > 100 rows) fully kept — no upsampling
    mix = temperature_mix(df, temperature=100.0)
    by = {r["source"]: r["n"] for r in
          mix.groupBy("source").agg(__import__("pyspark.sql.functions",
          fromlist=["count"]).count("*").alias("n")).collect()}
    assert by["small"] == 100
    assert 400 < by["big"] < 600
    # deterministic: same inputs → same selection
    a = sorted(r["doc_id"] for r in mix.collect())
    b = sorted(r["doc_id"] for r in temperature_mix(df, temperature=100.0).collect())
    assert a == b
    # T<1 sharpens toward the big stratum
    sharp = temperature_mix(df, temperature=0.5, total_rows=500)
    bys = {r["source"]: r["n"] for r in
           sharp.groupBy("source").agg(__import__("pyspark.sql.functions",
           fromlist=["count"]).count("*").alias("n")).collect()}
    assert bys.get("big", 0) > 8 * bys.get("small", 1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="temperature"):
        temperature_mix(df, temperature=0.0)


def _make_bmp(pixels):
    """Hand-build an uncompressed 24-bit BMP (bottom-up) from an
    HxWx3 RGB uint8 array — the golden-input generator for decode_bmp."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = ((24 * w + 31) // 32) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            r, g, b = px[y, x]
            line += bytes([b, g, r])  # BGR
        line += b"\0" * (row - len(line))
        body += line
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return bytes(header + info + body)


def _make_ppm(pixels):
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    return b"P6\n# golden\n%d %d\n255\n" % (w, h) + px.tobytes()


def test_decode_bmp_ppm_golden():
    import numpy as np

    from anser_spark.operators.multimodal import (
        decode_bmp, decode_image, decode_ppm,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(_make_bmp(img)), img)
    assert np.array_equal(decode_ppm(_make_ppm(img)), img)
    # dispatcher picks the right parser by magic bytes
    assert np.array_equal(decode_image(_make_bmp(img)), img)
    assert np.array_equal(decode_image(_make_ppm(img)), img)
    # PGM (grayscale) replicates to 3 channels
    gray = rng.integers(0, 256, size=(4, 2), dtype=np.uint8)
    pgm = b"P5\n2 4\n255\n" + gray.tobytes()
    out = decode_ppm(pgm)
    assert out.shape == (4, 2, 3) and np.array_equal(out[:, :, 0], gray)
    # non-images and truncated payloads → None, never an exception
    assert decode_image(b"") is None
    assert decode_image(b"\x89PNG\r\n\x1a\n") is None
    assert decode_bmp(_make_bmp(img)[:30]) is None
    assert decode_ppm(b"P6\n3 5\n255\n" + b"\x00" * 10) is None


def test_extract_image_stats_real_decode(spark):
    import numpy as np

    from anser_spark.operators.multimodal import extract_image_stats

    solid = np.full((4, 4, 3), [200, 100, 50], dtype=np.uint8)
    rows = [
        ("bmp1", _make_bmp(solid)),
        ("ppm1", _make_ppm(solid)),
        ("bad1", b"not an image"),
        ("null1", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    got = {r["media_id"]: r.asDict() for r in extract_image_stats(df).collect()}
    for mid in ("bmp1", "ppm1"):
        r = got[mid]
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 3)
        assert r["mean_r"] == 200.0 and r["mean_g"] == 100.0 and r["mean_b"] == 50.0
        assert abs(r["mean_lum"] - (0.2126 * 200 + 0.7152 * 100 + 0.0722 * 50)) < 1e-9
        assert r["std_lum"] == 0.0
    assert got["bad1"]["width"] is None and got["null1"]["width"] is None


def _make_png(img, filters=None, ctype=2, palette=None):
    """Minimal PNG encoder for golden tests: 8-bit depth, one IDAT,
    per-row filter bytes as requested (default all-0).  ``img`` is
    HxWxC uint8 (C per color type: 1 gray/palette-index, 2 gray+alpha,
    3 RGB, 4 RGBA)."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * c).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y, f in zip(range(h), filters):
        cur = flat[y]
        if f == 0:
            line = cur
        elif f == 1:
            line = cur.copy()
            line[c:] = (cur[c:] - cur[:-c]) & 0xFF
        elif f == 2:
            line = (cur - prev) & 0xFF
        elif f == 3:
            line = cur.copy()
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0
                line[i] = (cur[i] - ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:
            line = cur.copy()
            for i in range(w * c):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[i] = (cur[i] - pr) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_decode_png_golden_all_filters():
    import numpy as np

    from anser_spark.operators.multimodal import decode_image, decode_png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    # every filter type, mixed per row — decode must invert exactly
    png = _make_png(img, filters=[0, 1, 2, 3, 4], ctype=2)
    assert np.array_equal(decode_png(png), img)
    assert np.array_equal(decode_image(png), img)  # dispatch hits PNG
    # grayscale (ctype 0) replicates to RGB
    g = rng.randint(0, 256, size=(4, 3, 1), dtype=np.uint8)
    got = decode_png(_make_png(g, filters=[4, 3, 2, 1], ctype=0))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    # RGBA (ctype 6) drops alpha
    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    got = decode_png(_make_png(rgba, filters=[1, 2, 4], ctype=6))
    assert np.array_equal(got, rgba[:, :, :3])
    # palette (ctype 3) resolves PLTE
    pal = bytes(range(48))  # 16 RGB entries
    idx = rng.randint(0, 16, size=(4, 4, 1), dtype=np.uint8)
    got = decode_png(_make_png(idx, filters=[0, 1, 2, 4], ctype=3, palette=pal))
    exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx[:, :, 0]]
    assert np.array_equal(got, exp)
    # gray+alpha (ctype 4)
    ga = rng.randint(0, 256, size=(3, 5, 2), dtype=np.uint8)
    got = decode_png(_make_png(ga, filters=[2, 3, 4], ctype=4))
    assert np.array_equal(got, np.repeat(ga[:, :, :1], 3, axis=2))


def test_decode_png_rejects_bad_inputs():
    import numpy as np

    from anser_spark.operators.multimodal import decode_png

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png = _make_png(img)
    assert decode_png(png[:20]) is None           # truncated
    assert decode_png(b"\x89PNG\r\n\x1a\n") is None  # no chunks
    assert decode_png(b"nope") is None
    # interlaced flag → out of coverage, clean None
    import struct
    bad = bytearray(png)
    # IHDR data starts at offset 16; interlace byte is its 13th byte
    bad[16 + 12] = 1
    assert decode_png(bytes(bad)) is None


def test_image_stats_over_png(spark):
    import numpy as np

    from anser_spark.operators.multimodal import extract_image_stats

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [("p", bytearray(_make_png(img, filters=[4, 3, 2, 1])))],
        "media_id string, payload binary")
    got = extract_image_stats(df).collect()[0]
    assert got["width"] == 4 and got["height"] == 4
    assert abs(got["mean_lum"] - 200.0) < 1e-6


def _gif_pack_uncompressed(indexes, min_code_size):
    """Minimal valid GIF LZW stream: a CLEAR before every pixel keeps
    the code table empty so each pixel is a raw code at a fixed width —
    the classic 'uncompressed GIF' encoder trick."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for px in indexes:
        emit(px)
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _make_gif(img, palette, interlace=False, left=0, top=0,
              screen=None, local_palette=False, version=b"9a"):
    """Hand-built single-frame GIF for golden tests. ``img`` is HxW
    palette indexes; ``palette`` a list of (r, g, b)."""
    import struct

    h, w = len(img), len(img[0])
    sw, sh = screen or (left + w, top + h)
    pal_bits = max(1, (max(len(palette) - 1, 1)).bit_length())
    pal_n = 1 << pal_bits
    pal_bytes = b"".join(bytes(c) for c in palette)
    pal_bytes += b"\x00" * (3 * pal_n - len(pal_bytes))

    out = bytearray(b"GIF8" + version)
    gflags = (0x80 | (pal_bits - 1)) if not local_palette else 0
    out += struct.pack("<HHBBB", sw, sh, gflags, 0, 0)
    if not local_palette:
        out += pal_bytes
    # a graphic-control extension (skipped by the decoder)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflags = (0x40 if interlace else 0) | ((0x80 | (pal_bits - 1)) if local_palette else 0)
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, iflags)
    if local_palette:
        out += pal_bytes
    rows = list(img)
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        rows = [img[y] for y in order]
    flat = [px for row in rows for px in row]
    min_code = max(2, pal_bits)
    out += bytes([min_code])
    stream = _gif_pack_uncompressed(flat, min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_decode_gif_golden():
    import numpy as np

    from anser_spark.operators.multimodal import decode_gif, decode_image

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    img = [[0, 1, 2], [3, 2, 1], [1, 1, 0], [2, 3, 3]]
    got = decode_gif(_make_gif(img, pal))
    assert got is not None and got.shape == (4, 3, 3)
    exp = np.array([[pal[i] for i in row] for row in img], np.uint8)
    assert (got == exp).all()
    # dispatch routes GIF magic
    assert (decode_image(_make_gif(img, pal)) == exp).all()
    # GIF87a + local color table
    got = decode_gif(_make_gif(img, pal, local_palette=True, version=b"7a"))
    assert (got == exp).all()


def test_decode_gif_interlace_and_compose():
    import numpy as np

    from anser_spark.operators.multimodal import decode_gif

    pal = [(i, 2 * i, 3 * i) for i in range(16)]
    rng = __import__("random").Random(7)
    img = [[rng.randrange(16) for _ in range(5)] for _ in range(11)]
    exp = np.array([[pal[i] for i in row] for row in img], np.uint8)
    got = decode_gif(_make_gif(img, pal, interlace=True))
    assert got is not None and (got == exp).all()
    # frame offset within a larger logical screen: background fill
    got = decode_gif(_make_gif(img, pal, left=2, top=1, screen=(9, 14)))
    assert got.shape == (14, 9, 3)
    assert (got[1:12, 2:7] == exp).all()
    assert (got[0] == np.array(pal[0], np.uint8)).all()  # bg row


def test_decode_gif_real_lzw_and_corrupt():
    import numpy as np

    from anser_spark.operators.multimodal import decode_gif

    # a REAL compressed stream (repeating pixels exercise table growth
    # + the code==next_code self-reference case): encode with a genuine
    # LZW encoder inline
    pal = [(0, 0, 0), (255, 255, 255)]
    img = [[0, 0, 0, 0, 1, 1, 1, 1]] * 8
    flat = [p for row in img for p in row]
    min_code = 2
    clear, end = 4, 5
    table = {(i,): i for i in range(4)}
    codes, cur, next_code, width = [clear], (), 6, 3
    widths = []
    for px in flat:
        if cur + (px,) in table:
            cur = cur + (px,)
            continue
        codes.append(table[cur])
        widths.append(width)
        table[cur + (px,)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width):
            width += 1
        cur = (px,)
    codes.append(table[cur])
    widths.append(width)
    codes.append(end)
    widths.append(width)
    widths = [3] + widths  # the leading CLEAR
    acc = nbits = 0
    stream = bytearray()
    for code, wdt in zip(codes, widths):
        acc |= code << nbits
        nbits += wdt
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)

    import struct
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 8, 8, 0x81, 0, 0)  # 4-entry palette
    gif += bytes((0, 0, 0, 255, 255, 255)) + b"\x00" * 6
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0)
    gif += bytes([min_code, len(stream)]) + bytes(stream) + b"\x00\x3b"
    got = decode_gif(bytes(gif))
    exp = np.array([[pal[i] for i in row] for row in img], np.uint8)
    assert got is not None and (got == exp).all()

    # corrupt / out-of-coverage payloads → None, never raise
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(bytes(gif)[:40]) is None
    assert decode_gif(b"NOTGIF" + bytes(20)) is None
    bad = bytearray(gif)
    bad[13 + 12 + 10 + 2] ^= 0xFF  # flip a byte inside the LZW stream
    decode_gif(bytes(bad))  # any result is fine as long as no raise


def _make_jpeg(rgb=None, gray=None, subsample=False, restart=0):
    """Hand-built baseline JPEG for golden tests: identity quant
    tables and a trivial canonical Huffman table (all 256 symbols at 9
    bits — legal per the canonical construction, so symbol s encodes as
    the 9-bit code s).  4:4:4 by default; ``subsample=True`` emits
    4:2:0 with box-averaged chroma; ``gray`` emits one component."""
    import struct

    import numpy as np

    def pad8(p):
        h, w = p.shape
        return np.pad(p, ((0, -h % 8), (0, -w % 8)), mode="edge")

    def fdct_blocks(plane):
        k8 = np.arange(8)
        basis = np.cos((2 * k8[:, None] + 1) * k8[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(0.25))
        alpha[0] = np.sqrt(0.125)
        A = basis * alpha[None, :]
        p = pad8(plane.astype(np.float64) - 128.0)
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        return np.round(np.einsum("ki,nkl,lj->nij", A, blocks, A)
                        ).astype(np.int64), bh, bw

    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    bitbuf = []

    def put(code, nbits):
        for i in range(nbits - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def put_sym(s):
        # trivial canonical table (see DHT below): symbols 0..254 are
        # 9-bit codes equal to their value; symbol 255 is 10-bit 510
        if s == 255:
            put(510, 10)
        else:
            put(s, 9)

    def mag(v):
        if v == 0:
            return 0, 0
        a = abs(v)
        n = a.bit_length()
        return n, (v if v > 0 else v + (1 << n) - 1)

    def encode_block(blk, pred):
        d = int(blk[0, 0]) - pred
        n, bits = mag(d)
        put_sym(n)
        put(bits, n)
        flat = blk.reshape(64)[zz]
        run = 0
        last = max((i for i in range(1, 64) if flat[i]), default=0)
        for k in range(1, last + 1):
            v = int(flat[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                put_sym(0xF0)
                run -= 16
            n, bits = mag(v)
            put_sym((run << 4) | n)
            put(bits, n)
            run = 0
        if last < 63:
            put_sym(0x00)
        return int(blk[0, 0])

    if gray is not None:
        planes = [np.asarray(gray)]
        h, w = planes[0].shape
        samp = [(1, 1)]
    else:
        rgb = np.asarray(rgb, np.float64)
        h, w = rgb.shape[:2]
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2] + 128
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2] + 128
        if subsample:
            def box(p):
                p = pad8(p)  # even dims
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3

    coef = []
    for p in planes:
        blocks, bh, bw = fdct_blocks(p)
        coef.append({"blocks": blocks.reshape(-1, 8, 8), "bh": bh, "bw": bw})

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    preds = [0] * len(planes)
    out_mcus = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            c = coef[ci]
            for by in range(sv):
                for bx in range(sh):
                    row = min(my * sv + by, c["bh"] - 1)
                    col = min(mx * sh + bx, c["bw"] - 1)
                    blk = c["blocks"][row * c["bw"] + col]
                    preds[ci] = encode_block(blk, preds[ci])
        if restart and (m + 1) % restart == 0 and m + 1 < mcux * mcuy:
            out_mcus.append((list(bitbuf), m))
            bitbuf.clear()
            preds = [0] * len(planes)
    out_mcus.append((list(bitbuf), None))

    def pack(bits):
        while len(bits) % 8:
            bits.append(1)  # 1-padding per spec
        raw = bytearray()
        for i in range(0, len(bits), 8):
            raw.append(int("".join(map(str, bits[i:i + 8])), 2))
        return bytes(raw).replace(b"\xff", b"\xff\x00")

    jp = bytearray(b"\xff\xd8")
    jp += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    nc = len(planes)
    jp += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        jp += bytes([i + 1, (sh << 4) | sv, 0])
    # the trivial table: a count byte caps at 255, so declare 255
    # symbols at length 9 and 1 at length 10 — canonical assignment
    # still gives symbol s (0..254) the 9-bit code s, and symbol 255
    # the 10-bit code 510; put_sym above must match
    counts = [0] * 16
    counts[8] = 255
    counts[9] = 1
    for tc_th in (0x00, 0x10):
        jp += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 256, tc_th)
        jp += bytes(counts) + bytes(range(256))
    if restart:
        jp += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    jp += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for i in range(nc):
        jp += bytes([i + 1, 0x00])
    jp += bytes([0, 63, 0])
    for i, (bits, m) in enumerate(out_mcus):
        jp += pack(bits)
        if m is not None:
            jp += bytes([0xFF, 0xD0 + (i % 8)])
    jp += b"\xff\xd9"
    return bytes(jp)


def test_decode_jpeg_golden_gray_and_rgb():
    import numpy as np

    from anser_spark.operators.multimodal import decode_image, decode_jpeg

    rng = np.random.default_rng(11)
    # smooth grayscale (identity quant => error is DCT rounding only)
    x = np.arange(24)[None, :] + np.arange(16)[:, None] * 3.0
    gray = np.clip(60 + 4 * np.sin(x / 5.0) * 10 + x, 0, 255).astype(np.uint8)
    got = decode_jpeg(_make_jpeg(gray=gray))
    assert got is not None and got.shape == (16, 24, 3)
    assert (got[:, :, 0] == got[:, :, 1]).all()
    assert np.abs(got[:, :, 0].astype(int) - gray.astype(int)).max() <= 3

    # RGB 4:4:4, non-multiple-of-8 dims: color transform adds rounding
    rgb = rng.integers(0, 256, (13, 21, 3)).astype(np.uint8)
    rgb = (rgb // 4 * 4)  # soften extremes
    got = decode_jpeg(_make_jpeg(rgb=rgb))
    assert got is not None and got.shape == (13, 21, 3)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 12
    # dispatch routes JPEG magic
    assert (decode_image(_make_jpeg(rgb=rgb)) == got).all()


def test_decode_jpeg_subsampled_and_restart():
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    # 4:2:0 on a flat color: box-filter subsampling is exact there
    rgb = np.tile(np.array([200, 64, 120], np.uint8), (20, 18, 1))
    got = decode_jpeg(_make_jpeg(rgb=rgb, subsample=True))
    assert got is not None and got.shape == (20, 18, 3)
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 6

    # smooth gradient survives 4:2:0 within chroma-averaging error
    grad = np.zeros((16, 32, 3), np.uint8)
    grad[:, :, 0] = np.linspace(40, 200, 32, dtype=np.uint8)[None, :]
    grad[:, :, 1] = 90
    grad[:, :, 2] = np.linspace(180, 60, 16, dtype=np.uint8)[:, None]
    got = decode_jpeg(_make_jpeg(rgb=grad, subsample=True))
    assert np.abs(got.astype(int) - grad.astype(int)).max() <= 16

    # restart interval: RST markers every 2 MCUs, DC predictors reset
    rng = np.random.default_rng(5)
    rgb = (rng.integers(0, 64, (24, 40, 3)) * 4).astype(np.uint8)
    got = decode_jpeg(_make_jpeg(rgb=rgb, restart=2))
    assert got is not None
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 12


def test_decode_jpeg_out_of_coverage_is_none():
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    rgb = np.zeros((8, 8, 3), np.uint8)
    good = _make_jpeg(rgb=rgb)
    assert decode_jpeg(good) is not None
    # truncation, bad magic, progressive marker → None, never raise
    assert decode_jpeg(good[:30]) is None
    assert decode_jpeg(b"\x00" + good) is None
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2  # claim progressive
    assert decode_jpeg(bytes(prog)) is None
    trunc = bytearray(good)
    assert decode_jpeg(bytes(trunc[:-20])) is None


def _make_avi_mjpeg(jpegs):
    """Minimal RIFF/AVI wrapping JPEG frames as 00dc chunks."""
    import struct

    body = bytearray(b"movi")
    for j in jpegs:
        body += b"00dc" + struct.pack("<I", len(j)) + j
        if len(j) & 1:
            body += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(body)) + bytes(body)
    riff_body = b"AVI " + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_decode_video_frame_mjpeg_avi():
    import numpy as np

    from anser_spark.operators.multimodal import decode_video_frame

    f0 = np.tile(np.array([200, 64, 120], np.uint8), (16, 16, 1))
    f1 = np.tile(np.array([20, 180, 40], np.uint8), (16, 16, 1))
    avi = _make_avi_mjpeg([_make_jpeg(rgb=f0), _make_jpeg(rgb=f1)])
    g0 = decode_video_frame(avi, 0)
    g1 = decode_video_frame(avi, 1)
    assert g0 is not None and g1 is not None
    assert np.abs(g0.astype(int) - f0.astype(int)).max() <= 6
    assert np.abs(g1.astype(int) - f1.astype(int)).max() <= 6
    # out-of-range index, corrupt container, wrong magic → None
    assert decode_video_frame(avi, 2) is None
    assert decode_video_frame(avi[:20], 0) is None
    assert decode_video_frame(b"RIFFxxxxWAVE", 0) is None
    assert decode_video_frame(None, 0) is None


def test_decode_gif_background_uses_global_palette():
    import numpy as np

    from anser_spark.operators.multimodal import decode_gif

    # global palette has red at bg_idx 0; the frame carries a LOCAL
    # palette where index 0 is green — uncovered screen must be RED
    # (review round 8: bg index is defined against the GLOBAL table)
    import struct

    gpal = [(255, 0, 0), (9, 9, 9)]
    lpal = [(0, 255, 0), (0, 0, 255)]
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)  # 2-entry global
    gif += b"".join(bytes(c) for c in gpal)
    # 2x2 frame at (0,0) with local palette, all pixels index 1 (blue)
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80)
    gif += b"".join(bytes(c) for c in lpal)
    stream = _gif_pack_uncompressed([1, 1, 1, 1], 2)
    gif += bytes([2, len(stream)]) + stream + b"\x00\x3b"
    got = decode_gif(bytes(gif))
    assert got is not None and got.shape == (4, 4, 3)
    assert (got[0, 0] == np.array([0, 0, 255], np.uint8)).all()  # frame
    assert (got[3, 3] == np.array([255, 0, 0], np.uint8)).all()  # bg=global red


def test_decode_jpeg_tolerates_fill_bytes():
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    rgb = np.tile(np.array([100, 150, 200], np.uint8), (8, 8, 1))
    good = _make_jpeg(rgb=rgb)
    # inject legal 0xFF fill bytes before the DQT marker (B.1.1.2)
    i = good.find(b"\xff\xdb")
    padded = good[:i] + b"\xff\xff\xff" + good[i:]
    got = decode_jpeg(padded)
    assert got is not None
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 6


def test_decode_jpeg_fill_bytes_in_entropy_tail():
    # round 9 ADVICE: 0xFF fill bytes are legal before ANY marker
    # (B.1.1.2), including RST and EOI *after* the entropy-coded data —
    # the end-of-scan search must skip them, not truncate the slice
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    x = np.arange(24)[None, :] + np.arange(16)[:, None] * 3.0
    gray = np.clip(60 + x, 0, 255).astype(np.uint8)
    good = _make_jpeg(gray=gray)
    base = decode_jpeg(good)
    assert base is not None

    # fills before EOI
    assert good.endswith(b"\xff\xd9")
    padded = good[:-2] + b"\xff\xff" + good[-2:]
    got = decode_jpeg(padded)
    assert got is not None and (got == base).all()

    # fills before a restart marker
    rng = np.random.default_rng(5)
    rgb = (rng.integers(0, 64, (24, 40, 3)) * 4).astype(np.uint8)
    good = _make_jpeg(rgb=rgb, restart=2)
    base = decode_jpeg(good)
    assert base is not None
    i = good.find(b"\xff\xd0")
    assert i > 0
    padded = good[:i] + b"\xff" + good[i:]
    got = decode_jpeg(padded)
    assert got is not None and (got == base).all()


def test_decode_gif_no_global_table_background_is_black():
    # round 9 ADVICE: the background color index is defined ONLY
    # against the global color table; a GCT-less file must compose on
    # black, not index the frame-local palette with bg_idx
    import struct

    import numpy as np

    from anser_spark.operators.multimodal import decode_gif

    lpal = [(250, 10, 10), (0, 0, 255)]  # local idx 0 is a loud red
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HHBBB", 4, 4, 0, 0, 0)  # NO global table
    gif += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80)
    gif += b"".join(bytes(c) for c in lpal)
    stream = _gif_pack_uncompressed([1, 1, 1, 1], 2)
    gif += bytes([2, len(stream)]) + stream + b"\x00\x3b"
    got = decode_gif(bytes(gif))
    assert got is not None and got.shape == (4, 4, 3)
    assert (got[0, 0] == np.array([0, 0, 255], np.uint8)).all()  # frame
    assert (got[3, 3] == np.array([0, 0, 0], np.uint8)).all()  # bg=black


def test_text_find_oracle_literals_match_engine_analysis():
    # tripwire for the hard-coded text_find oracle stems (round 9
    # ADVICE): if the engine's analyzer changes, this fails loudly so
    # the gate literals get reviewed instead of silently drifting
    from anser_spark.operators.ranking import _fold_py, analyze_terms

    derived = sorted(
        {_fold_py(t.lower()) for t in analyze_terms(["queries", "dáta"], "english")}
    )
    assert derived == ["data", "queri"]


def _make_progressive_jpeg(rgb=None, gray=None, subsample=False,
                           restart=0, ac_al=1):
    """Hand-built PROGRESSIVE (SOF2) JPEG for golden tests (round 9):
    identity quant, the same trivial 9-bit canonical Huffman table as
    ``_make_jpeg``, and a typical scan script — interleaved DC first
    (Al=1) + DC refine, then per-component AC first scans over two
    spectral bands at ``ac_al`` with successive-approximation refine
    passes down to Al=0.  The entropy layer is lossless, so the decoded
    pixels must equal the BASELINE encoding of the same coefficients
    bit-for-bit."""
    import struct

    import numpy as np

    def pad8(p):
        h, w = p.shape
        return np.pad(p, ((0, -h % 8), (0, -w % 8)), mode="edge")

    def fdct_blocks(plane):
        k8 = np.arange(8)
        basis = np.cos((2 * k8[:, None] + 1) * k8[None, :] * np.pi / 16)
        alpha = np.full(8, np.sqrt(0.25))
        alpha[0] = np.sqrt(0.125)
        A = basis * alpha[None, :]
        p = pad8(plane.astype(np.float64) - 128.0)
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        blocks = (p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8))
        return np.round(np.einsum("ki,nkl,lj->nij", A, blocks, A)
                        ).astype(np.int64), bh, bw

    zz = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
          12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
          35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
          58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

    if gray is not None:
        planes = [np.asarray(gray)]
        h, w = planes[0].shape
        samp = [(1, 1)]
    else:
        rgb = np.asarray(rgb, np.float64)
        h, w = rgb.shape[:2]
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] \
            + 0.5 * rgb[:, :, 2] + 128
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] \
            - 0.081312 * rgb[:, :, 2] + 128
        if subsample:
            def box(p):
                p = pad8(p)
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * len(planes)

    coef = []
    for p in planes:
        blocks, bh, bw = fdct_blocks(p)
        coef.append({"blocks": blocks.reshape(-1, 64), "bh": bh, "bw": bw})

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # ---- per-scan bit emitter (trivial 9/10-bit canonical table) ----
    class Emit:
        def __init__(self):
            self.bits = []

        def put(self, code, nbits):
            for i in range(nbits - 1, -1, -1):
                self.bits.append((code >> i) & 1)

        def sym(self, s):
            if s == 255:
                self.put(510, 10)
            else:
                self.put(s, 9)

        def pack(self):
            bits = list(self.bits)
            while len(bits) % 8:
                bits.append(1)
            raw = bytearray()
            for i in range(0, len(bits), 8):
                raw.append(int("".join(map(str, bits[i:i + 8])), 2))
            return bytes(raw).replace(b"\xff", b"\xff\x00")

    def mag(v):
        if v == 0:
            return 0, 0
        a = abs(v)
        nb = a.bit_length()
        return nb, (v if v > 0 else v + (1 << nb) - 1)

    jp = bytearray(b"\xff\xd8")
    jp += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    nc = len(planes)
    jp += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for i, (sh, sv) in enumerate(samp):
        jp += bytes([i + 1, (sh << 4) | sv, 0])
    counts = [0] * 16
    counts[8] = 255
    counts[9] = 1
    for tc_th in (0x00, 0x10):
        jp += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 256, tc_th)
        jp += bytes(counts) + bytes(range(256))

    def sos_header(comp_ids, tables, ss, se, ah, al):
        out = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                        len(comp_ids))
        for cid, tt in zip(comp_ids, tables):
            out += bytes([cid, tt])
        return out + bytes([ss, se, (ah << 4) | al])

    def clamp_block(ci, row, col):
        c = coef[ci]
        return c["blocks"][min(row, c["bh"] - 1) * c["bw"]
                           + min(col, c["bw"] - 1)]

    # ---- scan 1: DC first, interleaved, Al=1 (optional restarts) ----
    if restart:
        jp += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    jp += sos_header([i + 1 for i in range(nc)], [0x00] * nc, 0, 0, 0, 1)
    em = Emit()
    preds = [0] * nc
    rst = 0
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    v = int(clamp_block(ci, my * sv + by, mx * sh + bx)[0]) >> 1
                    nb, bits = mag(v - preds[ci])
                    preds[ci] = v
                    em.sym(nb)
                    em.put(bits, nb)
        if restart and (m + 1) % restart == 0 and m + 1 < mcux * mcuy:
            jp += em.pack() + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            em = Emit()
            preds = [0] * nc
    jp += em.pack()
    if restart:  # disable restarts for the remaining scans
        jp += b"\xff\xdd" + struct.pack(">HH", 4, 0)

    # ---- scan 2: DC refine (Ah=1, Al=0), interleaved, raw bits ----
    jp += sos_header([i + 1 for i in range(nc)], [0x00] * nc, 0, 0, 1, 0)
    em = Emit()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    em.put(int(clamp_block(ci, my * sv + by,
                                           mx * sh + bx)[0]) & 1, 1)
    jp += em.pack()

    # ---- per-component AC scans over two bands ----
    bands = [(1, 5), (6, 63)]

    def comp_grid(ci):
        sh, sv = samp[ci]
        comp_w = -(-w * sh // hmax)
        comp_h = -(-h * sv // vmax)
        return -(-comp_w // 8), -(-comp_h // 8)

    def ac_first(ci, ss, se, al):
        nonlocal jp
        jp += sos_header([ci + 1], [0x00], ss, se, 0, al)
        em = Emit()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                em.sym(nb << 4)
                em.put(eobrun - (1 << nb), nb)
                eobrun = 0

        nbw, nbh = comp_grid(ci)
        for bi in range(nbw * nbh):
            blk = clamp_block(ci, bi // nbw, bi % nbw)
            r = 0
            any_nz = False
            for k in range(ss, se + 1):
                cv = int(blk[zz[k]])
                v = (abs(cv) >> al) * (1 if cv >= 0 else -1)
                if v == 0:
                    r += 1
                    continue
                any_nz = True
                flush_eob()
                while r > 15:
                    em.sym(0xF0)
                    r -= 16
                nb, bits = mag(v)
                em.sym((r << 4) | nb)
                em.put(bits, nb)
                r = 0
            if r > 0 or not any_nz:
                eobrun += 1
        flush_eob()
        jp += em.pack()

    def ac_refine(ci, ss, se, al):
        nonlocal jp
        jp += sos_header([ci + 1], [0x00], ss, se, al + 1, al)
        em = Emit()
        eobrun = 0
        be = []  # correction bits deferred to the next EOB flush

        def flush_eob():
            nonlocal eobrun, be
            if eobrun:
                nb = eobrun.bit_length() - 1
                em.sym(nb << 4)
                em.put(eobrun - (1 << nb), nb)
                eobrun = 0
            for b in be:
                em.put(b, 1)
            be = []

        nbw, nbh = comp_grid(ci)
        for bi in range(nbw * nbh):
            blk = clamp_block(ci, bi // nbw, bi % nbw)
            absv = [abs(int(blk[zz[k]])) >> al for k in range(ss, se + 1)]
            eobpos = ss - 1
            for j, t in enumerate(absv):
                if t == 1:
                    eobpos = ss + j
            r = 0
            br = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    flush_eob()
                    em.sym(0xF0)
                    r -= 16
                    for b in br:
                        em.put(b, 1)
                    br = []
                if t > 1:  # already nonzero: one correction bit
                    br.append(t & 1)
                    continue
                flush_eob()
                em.sym((r << 4) | 1)
                em.put(1 if int(blk[zz[k]]) >= 0 else 0, 1)
                for b in br:
                    em.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                be.extend(br)
        flush_eob()
        jp += em.pack()

    for ci in range(nc):
        for ss, se in bands:
            ac_first(ci, ss, se, ac_al)
    for al in range(ac_al - 1, -1, -1):
        for ci in range(nc):
            for ss, se in bands:
                ac_refine(ci, ss, se, al)

    jp += b"\xff\xd9"
    return bytes(jp)


def test_decode_jpeg_progressive_equals_baseline():
    # the entropy layers (sequential vs progressive) are LOSSLESS over
    # the same quantized coefficients — decoded pixels must be
    # bit-identical between the two encodings
    import numpy as np

    from anser_spark.operators.multimodal import decode_image, decode_jpeg

    x = np.arange(24)[None, :] + np.arange(16)[:, None] * 3.0
    gray = np.clip(60 + 4 * np.sin(x / 5.0) * 10 + x, 0, 255).astype(np.uint8)
    base = decode_jpeg(_make_jpeg(gray=gray))
    prog = decode_jpeg(_make_progressive_jpeg(gray=gray))
    assert base is not None and prog is not None
    assert (prog == base).all()
    # dispatch routes progressive JPEG magic too
    assert (decode_image(_make_progressive_jpeg(gray=gray)) == base).all()

    # RGB 4:4:4, odd dims, deeper successive approximation (Al=2 → two
    # refine passes per band)
    rng = np.random.default_rng(11)
    rgb = (rng.integers(0, 256, (13, 21, 3)) // 4 * 4).astype(np.uint8)
    base = decode_jpeg(_make_jpeg(rgb=rgb))
    prog = decode_jpeg(_make_progressive_jpeg(rgb=rgb, ac_al=2))
    assert prog is not None and (prog == base).all()


def test_decode_jpeg_progressive_subsampled_and_restart():
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    # 4:2:0: interleaved DC scans over 2x2 Y MCUs + per-component AC
    # scans on each component's own block grid
    rng = np.random.default_rng(5)
    rgb = (rng.integers(0, 64, (20, 18, 3)) * 4).astype(np.uint8)
    base = decode_jpeg(_make_jpeg(rgb=rgb, subsample=True))
    prog = decode_jpeg(_make_progressive_jpeg(rgb=rgb, subsample=True))
    assert prog is not None and (prog == base).all()

    # restart markers inside the DC scan (DRI then disabled)
    rgb = (rng.integers(0, 64, (24, 40, 3)) * 4).astype(np.uint8)
    base = decode_jpeg(_make_jpeg(rgb=rgb))
    prog = decode_jpeg(_make_progressive_jpeg(rgb=rgb, restart=2))
    assert prog is not None and (prog == base).all()


def test_decode_jpeg_progressive_out_of_coverage():
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    gray = np.full((16, 16), 120, np.uint8)
    good = _make_progressive_jpeg(gray=gray)
    assert decode_jpeg(good) is not None
    # truncation mid-scan and no-scan files → None, never raise
    assert decode_jpeg(good[:80]) is None
    assert decode_jpeg(good[: good.find(b"\xff\xda")] + b"\xff\xd9") is None


def _make_png_adam7(img, ctype=2, pass_filter=(0, 1, 2, 0, 1, 2, 0)):
    """Adam7-interlaced PNG encoder for golden tests (round 9): each
    pass is an independently-filtered sub-image; filter state (prev
    row) resets per pass."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    full = img.reshape(h, w, c)
    raw = bytearray()
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    for (x0, y0, xs, ys), f in zip(passes, pass_filter):
        sub = full[y0::ys, x0::xs]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * c).astype(np.int32)
        prev = np.zeros(pw * c, dtype=np.int32)
        for y in range(ph):
            cur = flat[y]
            if f == 0:
                line = cur
            elif f == 1:
                line = cur.copy()
                line[c:] = (cur[c:] - cur[:-c]) & 0xFF
            else:  # f == 2
                line = (cur - prev) & 0xFF
            raw.append(f)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_decode_png_adam7_interlaced():
    import numpy as np

    from anser_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(9)
    # odd dims exercise empty/partial passes
    img = rng.integers(0, 256, (13, 11, 3)).astype(np.uint8)
    got = decode_png(_make_png_adam7(img))
    assert got is not None and (got == img).all()
    # tiny images where several passes are empty
    for dims in ((1, 1, 3), (2, 3, 3), (5, 4, 3), (8, 8, 3)):
        img = rng.integers(0, 256, dims).astype(np.uint8)
        got = decode_png(_make_png_adam7(img))
        assert got is not None and (got == img).all(), dims
    # grayscale interlaced
    gray = rng.integers(0, 256, (9, 7)).astype(np.uint8)
    got = decode_png(_make_png_adam7(gray, ctype=0))
    assert (got[:, :, 0] == gray).all() and (got[:, :, 1] == gray).all()
    # truncated interlaced stream → None
    full = _make_png_adam7(rng.integers(0, 256, (16, 16, 3)).astype(np.uint8))
    assert decode_png(full[:60]) is None


def test_decode_png_16bit_depth():
    import struct
    import zlib

    import numpy as np

    from anser_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(4)
    img16 = rng.integers(0, 65536, (6, 5, 3)).astype(np.uint16)
    h, w = img16.shape[:2]
    flat = img16.reshape(h, -1)
    raw = bytearray()
    prev = np.zeros(w * 6, np.int32)
    for y in range(h):
        be = flat[y].astype(">u2").tobytes()
        cur = np.frombuffer(be, np.uint8).astype(np.int32)
        f = 2 if y % 2 else 0  # mix None and Up filters (byte-wise)
        line = (cur - prev) & 0xFF if f == 2 else cur
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    got = decode_png(png)
    assert got is not None
    assert (got == (img16 >> 8).astype(np.uint8)).all()
    # 16-bit palette type is illegal per spec → None
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert decode_png(bad) is None


def _make_animated_gif(frames, palette, screen, gces=None):
    """Multi-frame GIF for golden tests: ``frames`` is a list of
    (img_rows, left, top); ``gces`` optional per-frame
    (disposal, transparent_index_or_None)."""
    import struct

    sw, sh = screen
    pal_bits = max(1, (max(len(palette) - 1, 1)).bit_length())
    pal_n = 1 << pal_bits
    pal_bytes = b"".join(bytes(c) for c in palette)
    pal_bytes += b"\x00" * (3 * pal_n - len(pal_bytes))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_bytes
    for i, (img, left, top) in enumerate(frames):
        disposal, tindex = (gces or [(0, None)] * len(frames))[i]
        gflags = (disposal << 2) | (1 if tindex is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags, 0, 0,
                      tindex if tindex is not None else 0, 0])
        h, w = len(img), len(img[0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        min_code = max(2, pal_bits)
        out += bytes([min_code])
        stream = _gif_pack_uncompressed(
            [px for row in img for px in row], min_code)
        for j in range(0, len(stream), 255):
            chunk = stream[j:j + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_decode_gif_animation_frames():
    import numpy as np

    from anser_spark.operators.multimodal import (
        decode_gif,
        decode_video_frame,
    )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    # frame 0: full-screen red/green checker; frame 1: 1x1 blue patch
    # at (1,1) with disposal keep; frame 2: green patch at (0,0) with
    # transparency showing frame 1's state underneath
    f0 = [[0, 1], [1, 0]]
    f1 = [[2]]
    f2 = [[3, 1]]  # index 3 transparent in this frame
    gif = _make_animated_gif(
        [(f0, 0, 0), (f1, 1, 1), (f2, 0, 0)], pal, (2, 2),
        gces=[(1, None), (1, None), (1, 3)],
    )
    g0 = decode_video_frame(gif, 0)
    g1 = decode_video_frame(gif, 1)
    g2 = decode_video_frame(gif, 2)
    assert (g0 == np.array([[pal[0], pal[1]], [pal[1], pal[0]]],
                           np.uint8)).all()
    # frame 1 composes onto frame 0 (disposal keep)
    exp1 = np.array([[pal[0], pal[1]], [pal[1], pal[2]]], np.uint8)
    assert (g1 == exp1).all()
    # frame 2: transparent at (0,0) keeps red; (0,1) painted green
    exp2 = exp1.copy()
    exp2[0, 1] = pal[1]
    assert (g2 == exp2).all()
    # first frame via decode_gif matches frame 0; out-of-range → None
    assert (decode_gif(gif) == g0).all()
    assert decode_video_frame(gif, 3) is None


def test_decode_gif_disposal_background_and_previous():
    import numpy as np

    from anser_spark.operators.multimodal import decode_video_frame

    pal = [(200, 0, 0), (0, 200, 0), (0, 0, 200)]
    full = [[1, 1], [1, 1]]
    patch = [[2]]
    # frame 0 paints green, disposal=2 (restore bg = pal[0] red);
    # frame 1 then paints a blue 1x1 at (0,0) over a red canvas
    gif = _make_animated_gif(
        [(full, 0, 0), (patch, 0, 0)], pal, (2, 2),
        gces=[(2, None), (0, None)],
    )
    g1 = decode_video_frame(gif, 1)
    exp = np.broadcast_to(np.array(pal[0], np.uint8), (2, 2, 3)).copy()
    exp[0, 0] = pal[2]
    assert (g1 == exp).all()

    # disposal=3 (restore previous): frame 1's patch vanishes in
    # frame 2's base
    gif = _make_animated_gif(
        [(full, 0, 0), (patch, 0, 0), ([[0]], 1, 1)], pal, (2, 2),
        gces=[(1, None), (3, None), (0, None)],
    )
    g2 = decode_video_frame(gif, 2)
    exp = np.broadcast_to(np.array(pal[1], np.uint8), (2, 2, 3)).copy()
    exp[1, 1] = pal[0]
    assert (g2 == exp).all()


def test_decode_jpeg_progressive_fuzz_configs():
    # randomized sweep over image shapes × scan scripts: progressive
    # must always decode bit-identical to the baseline encoding of the
    # same coefficients (the entropy layers are lossless)
    import numpy as np

    from anser_spark.operators.multimodal import decode_jpeg

    rng = np.random.default_rng(31337)
    for trial in range(6):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        subsample = bool(rng.integers(0, 2))
        ac_al = int(rng.integers(1, 4))
        restart = int(rng.choice([0, 0, 2, 3]))
        if rng.random() < 0.3:
            gray = rng.integers(0, 256, (h, w)).astype(np.uint8)
            base = decode_jpeg(_make_jpeg(gray=gray))
            prog = decode_jpeg(_make_progressive_jpeg(
                gray=gray, ac_al=ac_al, restart=restart))
        else:
            rgb = (rng.integers(0, 64, (h, w, 3)) * 4).astype(np.uint8)
            base = decode_jpeg(_make_jpeg(rgb=rgb, subsample=subsample))
            prog = decode_jpeg(_make_progressive_jpeg(
                rgb=rgb, subsample=subsample, ac_al=ac_al,
                restart=restart))
        assert base is not None and prog is not None, trial
        assert (prog == base).all(), (
            trial, h, w, subsample, ac_al, restart)
