"""Round-5 continuation: $lookup semi/anti-join fusion.

The Mongo idiom for EXISTS / NOT EXISTS subqueries is
$lookup → $match on (non-)emptiness of the `as` array → drop the array
(TPC-H q4/q21/q22 shapes).  The compiler fuses the triple into ONE
left_semi/left_anti join — no collect_list array build, no regroup
shuffle.  These tests prove the fusion fires (plan-level), matches the
unfused semantics exactly (value-level, incl. null keys and every
recognized $match idiom), and does NOT fire when the array is still
needed.
"""

import pytest
from pyspark.sql import types as T

from anser_spark.plans.pipeline import compile_pipeline


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


SEMI_MATCHES = [
    {"exists": {"$ne": []}},
    {"exists.0": {"$exists": True}},
    {"$expr": {"$gt": [{"$size": "$exists"}, 0]}},
    {"$expr": {"$ne": [{"$size": "$exists"}, 0]}},
]
ANTI_MATCHES = [
    {"exists": {"$eq": []}},
    {"exists": []},
    {"exists": {"$size": 0}},
    {"exists.0": {"$exists": False}},
    {"$expr": {"$eq": [{"$size": "$exists"}, 0]}},
]


def _unfused(coll, match, drop):
    # an interleaved no-op $addFields breaks the 3-stage peephole, so
    # this runs the collect_list path — the semantics reference.
    # orders→customer on o_orderkey=c_custkey splits non-trivially both
    # ways (150 semi / 1350 anti at sf0.001).
    return sorted(
        r["o_orderkey"]
        for r in coll.pipe(
            [
                {"$lookup": {"from": "customer", "localField": "o_orderkey",
                             "foreignField": "c_custkey", "as": "exists"}},
                {"$match": match},
                {"$addFields": {"__noop": {"$literal": 1}}},
                drop,
                {"$unset": "__noop"},
                {"$project": {"o_orderkey": 1}},
            ]
        ).all()
    )


def _fused(coll, match, drop):
    return sorted(
        r["o_orderkey"]
        for r in coll.pipe(
            [
                {"$lookup": {"from": "customer", "localField": "o_orderkey",
                             "foreignField": "c_custkey", "as": "exists"}},
                {"$match": match},
                drop,
                {"$project": {"o_orderkey": 1}},
            ]
        ).all()
    )


@pytest.mark.parametrize("match", SEMI_MATCHES)
def test_semi_fusion_matches_unfused(engine, match):
    cust = engine.db("tpch").collection("orders")
    got = _fused(cust, match, {"$unset": "exists"})
    ref = _unfused(
        cust, {"$expr": {"$gt": [{"$size": "$exists"}, 0]}}, {"$unset": "exists"}
    )
    assert got == ref
    assert len(got) > 0


@pytest.mark.parametrize("match", ANTI_MATCHES)
def test_anti_fusion_matches_unfused(engine, match):
    cust = engine.db("tpch").collection("orders")
    got = _fused(cust, match, {"$unset": "exists"})
    ref = _unfused(
        cust, {"$expr": {"$eq": [{"$size": "$exists"}, 0]}}, {"$unset": "exists"}
    )
    assert got == ref
    assert len(got) > 0


def test_fusion_plan_is_semi_join_without_array_build(engine):
    cust = engine.db("tpch").collection("customer")
    df = cust.pipe(
        [
            {"$lookup": {"from": "orders", "localField": "c_custkey",
                         "foreignField": "o_custkey", "as": "exists"}},
            {"$match": {"exists": {"$ne": []}}},
            {"$unset": "exists"},
        ]
    ).to_df()
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "collect_list" not in plan
    anti = cust.pipe(
        [
            {"$lookup": {"from": "orders", "localField": "c_custkey",
                         "foreignField": "o_custkey", "as": "exists"}},
            {"$match": {"exists": {"$size": 0}}},
            {"$project": {"exists": 0}},
        ]
    ).to_df()
    plan = _plan(anti)
    assert "LeftAnti" in plan
    assert "collect_list" not in plan


def test_no_fusion_when_array_still_used(engine):
    # the drop is NOT adjacent — the array is consumed by $project first,
    # so the peephole must not fire and `n` must be the true match count
    cust = engine.db("tpch").collection("customer")
    out = cust.pipe(
        [
            {"$match": {"c_custkey": {"$lte": 20}}},
            {"$lookup": {"from": "orders", "localField": "c_custkey",
                         "foreignField": "o_custkey", "as": "exists"}},
            {"$match": {"$expr": {"$gt": [{"$size": "$exists"}, 0]}}},
            {"$project": {"c_custkey": 1, "n": {"$size": "$exists"}}},
        ]
    ).all()
    assert len(out) > 0
    assert all(r["n"] >= 1 for r in out)


def test_fusion_null_key_semantics(spark):
    # Mongo $lookup matches null local keys to null foreign keys;
    # the fused semi/anti joins must keep that via eqNullSafe
    schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("k", T.StringType()),
    ])
    local = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "zz")], schema
    )
    foreign = spark.createDataFrame(
        [(10, "a"), (11, None)], schema
    )
    resolve = {"f": foreign}.get

    semi = compile_pipeline(
        local,
        [
            {"$lookup": {"from": "f", "localField": "k",
                         "foreignField": "k", "as": "m"}},
            {"$match": {"m": {"$ne": []}}},
            {"$unset": "m"},
        ],
        resolve,
    )
    assert sorted(r["_id"] for r in semi.collect()) == [1, 2]

    anti = compile_pipeline(
        local,
        [
            {"$lookup": {"from": "f", "localField": "k",
                         "foreignField": "k", "as": "m"}},
            {"$match": {"m": {"$eq": []}}},
            {"$unset": "m"},
        ],
        resolve,
    )
    assert [r["_id"] for r in anti.collect()] == [3]


def test_fusion_residual_exclusions_and_overwrite(spark):
    schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("k", T.StringType()),
        T.StructField("m", T.StringType()),   # collides with `as`
        T.StructField("junk", T.StringType()),
    ])
    local = spark.createDataFrame([(1, "a", "keepme?", "x")], schema)
    foreign = spark.createDataFrame(
        [(10, "a")],
        T.StructType([T.StructField("fid", T.LongType()),
                      T.StructField("k", T.StringType())]),
    )
    out = compile_pipeline(
        local,
        [
            {"$lookup": {"from": "f", "localField": "k",
                         "foreignField": "k", "as": "m"}},
            # residual exclusion of `junk` must still apply post-fusion
            {"$match": {"m": {"$ne": []}}},
            {"$project": {"m": 0, "junk": 0}},
        ],
        {"f": foreign}.get,
    )
    rows = out.collect()
    # `m` was overwritten by the $lookup then dropped — original column gone
    assert out.columns == ["_id", "k"]
    assert rows[0]["_id"] == 1


def test_tpch_q4_shape_semi_join(engine):
    """TPC-H q4 in Mongo idiom: orders in a date window having at least
    one lineitem — EXISTS via $lookup+$match+$unset, counted per
    o_orderpriority.  Cross-checked against DuckDB on the same parquet."""
    duckdb = pytest.importorskip("duckdb")
    import datetime
    import os

    td = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    lo = datetime.datetime(1996, 7, 1)
    hi = datetime.datetime(1996, 10, 1)
    orders = engine.db("tpch").collection("orders")
    got = orders.pipe(
        [
            {"$match": {"o_orderdate": {"$gte": lo, "$lt": hi}}},
            {"$lookup": {"from": "lineitem", "localField": "o_orderkey",
                         "foreignField": "l_orderkey", "as": "items"}},
            {"$match": {"items": {"$ne": []}}},
            {"$unset": "items"},
            {"$group": {"_id": "$o_orderpriority", "order_count": {"$sum": 1}}},
            {"$sort": {"_id": 1}},
        ]
    ).all()
    con = duckdb.connect()
    exp = con.execute(
        f"""
        SELECT o_orderpriority AS _id, count(*) AS order_count
        FROM '{td}/orders.parquet' o
        WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
          AND EXISTS (SELECT 1 FROM '{td}/lineitem.parquet' l
                      WHERE l.l_orderkey = o.o_orderkey)
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(r["_id"], r["order_count"]) for r in got] == exp


def _pl_lookup(match_stage):
    # correlated pipeline form with a foreign-side predicate (q21 shape)
    return {
        "$lookup": {
            "from": "customer",
            "let": {"ok": "$o_orderkey"},
            "pipeline": [
                {"$match": {"$expr": {"$and": [
                    {"$eq": ["$$ok", "$c_custkey"]},
                    {"$gt": ["$c_acctbal", 0]},
                ]}}},
            ],
            "as": "exists",
        }
    }


def test_pipeline_form_semi_fusion(engine):
    orders = engine.db("tpch").collection("orders")
    fused = orders.pipe([
        _pl_lookup(None),
        {"$match": {"exists": {"$ne": []}}},
        {"$unset": "exists"},
        {"$project": {"o_orderkey": 1}},
    ])
    plan = _plan(fused.to_df())
    assert "LeftSemi" in plan and "collect_list" not in plan
    got = sorted(r["o_orderkey"] for r in fused.all())
    ref = sorted(
        r["o_orderkey"]
        for r in orders.pipe([
            _pl_lookup(None),
            {"$match": {"$expr": {"$gt": [{"$size": "$exists"}, 0]}}},
            {"$addFields": {"__noop": {"$literal": 1}}},
            {"$unset": "exists"},
            {"$unset": "__noop"},
            {"$project": {"o_orderkey": 1}},
        ]).all()
    )
    assert got == ref and len(got) > 0


def test_pipeline_form_anti_fusion(engine):
    orders = engine.db("tpch").collection("orders")
    fused = orders.pipe([
        _pl_lookup(None),
        {"$match": {"exists": {"$size": 0}}},
        {"$unset": "exists"},
        {"$project": {"o_orderkey": 1}},
    ])
    plan = _plan(fused.to_df())
    assert "LeftAnti" in plan and "collect_list" not in plan
    got = sorted(r["o_orderkey"] for r in fused.all())
    ref = sorted(
        r["o_orderkey"]
        for r in orders.pipe([
            _pl_lookup(None),
            {"$match": {"$expr": {"$eq": [{"$size": "$exists"}, 0]}}},
            {"$addFields": {"__noop": {"$literal": 1}}},
            {"$unset": "exists"},
            {"$unset": "__noop"},
            {"$project": {"o_orderkey": 1}},
        ]).all()
    )
    assert got == ref and len(got) > 0


def test_uncorrelated_pipeline_declines_fusion(engine):
    # no $expr match in the sub-pipeline ⇒ decline (global emptiness);
    # the unfused path must still produce the right answer
    orders = engine.db("tpch").collection("orders")
    out = orders.pipe([
        {"$match": {"o_orderkey": {"$lte": 8}}},
        {"$lookup": {"from": "customer",
                     "pipeline": [{"$match": {"c_acctbal": {"$gt": 0.0}}},
                                  {"$limit": 2}],
                     "as": "exists"}},
        {"$match": {"$expr": {"$gt": [{"$size": "$exists"}, 0]}}},
        {"$unset": "exists"},
    ]).all()
    # every order carries the same (uncorrelated) 2-element array
    n = orders.find({"o_orderkey": {"$lte": 8}}).count()
    assert len(out) == n and n > 0


# ---------------------------------------------------------------------------
# $changeStream leading pipeline stage (Mongo parity glue over watch())
# ---------------------------------------------------------------------------


def _cs_coll(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path))
    coll = eng.db("wdb").collection("items")
    coll._rewrite(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "_id long, name string, v long",
    ))
    coll.set_retention(10)
    return coll


def test_change_stream_stage_composes(spark, tmp_path):
    import json

    coll = _cs_coll(spark, tmp_path)
    coll.update_all({"_id": 2}, {"$set": {"v": 99}})
    coll.remove_all({"_id": 3})
    coll.insert({"_id": 4, "name": "d", "v": 40})
    out = coll.pipe([
        {"$changeStream": {"startAtVersion": "v1"}},
        {"$match": {"operationType": {"$ne": "delete"}}},
        {"$sort": {"documentKey": 1}},
        {"$project": {"documentKey": 1, "operationType": 1, "fullDocument": 1}},
    ]).all()
    assert [(r["documentKey"], r["operationType"]) for r in out] == [
        (2, "update"), (4, "insert")
    ]
    assert json.loads(out[0]["fullDocument"])["v"] == 99


def test_change_stream_stage_errors(spark, tmp_path):
    import pytest as _pytest

    coll = _cs_coll(spark, tmp_path)
    with _pytest.raises(ValueError, match="startAtVersion"):
        coll.pipe([{"$changeStream": {}}])
    with _pytest.raises(ValueError, match="first pipeline stage"):
        coll.pipe([{"$match": {}}, {"$changeStream": {"startAtVersion": "v1"}}])


# ---------------------------------------------------------------------------
# restore_collection — the mongorestore analogue for the backup sink
# ---------------------------------------------------------------------------


def test_backup_restore_roundtrip_parquet(doc_collection, tmp_path):
    from anser_spark.sources.backup import (
        BackupOptions, backup_collection, restore_collection,
    )

    bdir = str(tmp_path / "bk")
    backup_collection(doc_collection, BackupOptions(target_dir=bdir))
    rep = restore_collection(
        doc_collection.engine, bdir, collection="docs_restored"
    )
    assert rep["count"] == 6 and rep["format"] == "parquet"
    restored = doc_collection.engine.db("appdb").collection("docs_restored")
    a = [r.asDict(recursive=True) for r in doc_collection.df().collect()]
    b = [r.asDict(recursive=True) for r in restored.df().collect()]
    a.sort(key=lambda d: d["_id"]); b.sort(key=lambda d: d["_id"])
    assert a == b


def test_backup_restore_json_schema_roundtrip(doc_collection, tmp_path):
    # json export stringifies timestamps/structs; restore must re-apply
    # the manifest schema, not re-infer
    from anser_spark.sources.backup import (
        BackupOptions, backup_collection, restore_collection,
    )

    bdir = str(tmp_path / "bkj")
    backup_collection(
        doc_collection, BackupOptions(target_dir=bdir, format="json")
    )
    restore_collection(doc_collection.engine, bdir, collection="docs_j")
    restored = doc_collection.engine.db("appdb").collection("docs_j")
    assert restored.df().schema == doc_collection.df().schema
    row = restored.find_id("a1").one()
    assert row["meta"]["owner"] == "alice"
    assert row["time"].year == 2026


def test_restore_errors(doc_collection, tmp_path):
    import pytest as _pytest

    from anser_spark.sources.backup import (
        BackupOptions, backup_collection, restore_collection,
    )

    with _pytest.raises(FileNotFoundError, match="no backup metadata"):
        restore_collection(doc_collection.engine, str(tmp_path))
    bdir = str(tmp_path / "bkio")
    backup_collection(
        doc_collection, BackupOptions(target_dir=bdir, indexes_only=True)
    )
    with _pytest.raises(FileNotFoundError, match="no data export"):
        restore_collection(doc_collection.engine, bdir)


# ---------------------------------------------------------------------------
# Persistent MinHash index: incremental dedup of new batches vs the corpus
# ---------------------------------------------------------------------------


def test_minhash_index_incremental_dedup(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path))
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text").limit(60)
    coll = eng.db("corp").collection("docs")
    coll._rewrite(corpus)
    coll.create_search_index("mh", {"kind": "minhash", "id_col": "doc_id",
                                    "path": "text"})
    assert "mh" in coll.list_search_indexes()

    # new batch: 3 exact copies of stored docs (shifted ids) + 3 fresh
    # docs made of vocabulary that shares no 3-gram with the corpus
    stored = corpus.limit(3).collect()
    from pyspark.sql import Row
    fresh = [
        Row(doc_id=9000 + i, text=f"zz{i}a zz{i}b zz{i}c zz{i}d zz{i}e")
        for i in range(3)
    ]
    copies = [Row(doc_id=8000 + i, text=r.text) for i, r in enumerate(stored)]
    batch = spark.createDataFrame(copies + fresh, corpus.schema)

    pairs = coll.near_dups_against_index(batch, "mh", threshold=1.0).collect()
    got = {(r.new_id, r.old_id) for r in pairs}
    want = {(8000 + i, r.doc_id) for i, r in enumerate(stored)}
    # exact copies must match their stored original (jaccard 1.0 pairs
    # collide in every band — recall 1 at threshold 1.0)
    assert want <= got
    assert all(r.jaccard == 1.0 for r in pairs)
    assert not any(r.new_id >= 9000 for r in pairs)

    kept = coll.dedup_batch_against_index(batch, "mh", threshold=1.0)
    assert sorted(r.doc_id for r in kept.collect()) == [9000, 9001, 9002]


def test_minhash_index_kind_mismatch(spark, tmp_path):
    import pytest as _pytest

    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path))
    coll = eng.db("corp").collection("docs")
    coll._rewrite(spark.createDataFrame(
        [(1, "a b c d e")], "doc_id long, text string"))
    coll.create_search_index("notmh", {"kind": "bm25", "path": "text"})
    with _pytest.raises(ValueError, match="expected minhash"):
        coll.near_dups_against_index(coll.df(), "notmh")


# ---------------------------------------------------------------------------
# IVF KNN join: batch of query vectors → top-k corpus neighbors each
# ---------------------------------------------------------------------------


def test_ivf_knn_join_exact_at_full_probe(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from anser_spark.operators.ivf import ivf_assign, ivf_knn_join, ivf_train_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding").limit(200).cache()
    index = ivf_train_sample(emb, k=8, vec_col="embedding", id_col="vec_id")
    assigned = ivf_assign(emb, index).cache()

    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    out = ivf_knn_join(queries, assigned, index, k=4, nprobe=8,
                       query_id_col="query_id").collect()

    corpus = {r.vec_id: np.array(r.embedding, dtype=np.float64)
              for r in emb.collect()}
    qrows = {r.query_id: np.array(r.embedding, dtype=np.float64)
             for r in queries.collect()}
    got = {}
    for r in out:
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cosine))
    assert set(got) == set(qrows)
    for qid, q in qrows.items():
        qn = np.linalg.norm(q) or 1e-30
        sims = sorted(
            ((float(np.dot(q, v) / (max(np.linalg.norm(v), 1e-30) * qn)), -vid)
             for vid, v in corpus.items()),
            reverse=True,
        )[:4]
        want = [(-nid, round(s, 4)) for s, nid in sims]
        rows = sorted(got[qid])
        assert [(vid, cos) for _rk, vid, cos in rows] == want, qid
        # full probe: self is the top neighbor with cosine 1.0
        assert rows[0][1] == qid and rows[0][2] == 1.0


def test_ivf_knn_join_shape_at_low_probe(spark):
    from pyspark.sql import functions as F

    from anser_spark.operators.ivf import ivf_assign, ivf_knn_join, ivf_train_sample

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding").limit(200)
    index = ivf_train_sample(emb, k=8, vec_col="embedding", id_col="vec_id")
    assigned = ivf_assign(emb, index)
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding"))
    out = ivf_knn_join(queries, assigned, index, k=3, nprobe=1,
                       query_id_col="query_id").collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    # every query got ≤k ranked results, ranks contiguous from 1
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # a query's own cell is always probed (its nearest centroid), so
    # self-match keeps every query represented
    assert set(per_q) == {r.query_id for r in queries.collect()}


# ---------------------------------------------------------------------------
# Z-order clustering: multi-column file pruning
# ---------------------------------------------------------------------------


def _file_ranges(coll, col_idx):
    import pyarrow.parquet as pq

    ranges = []
    for f in coll._data_files(coll.current_path()):
        md = pq.read_metadata(f)
        s = [md.row_group(g).column(col_idx).statistics
             for g in range(md.num_row_groups)]
        ranges.append((min(x.min for x in s), max(x.max for x in s)))
    return ranges


def _files_hit(ranges, v):
    return sum(1 for lo, hi in ranges if lo <= v <= hi)


def test_zorder_prunes_both_columns(spark, tmp_path):
    import random

    from anser_spark.engine import Engine

    random.seed(3)
    rows = [(random.randrange(1000), random.randrange(1000), i)
            for i in range(20000)]

    def build(layout, sub):
        eng = Engine(spark, workdir=str(tmp_path / sub))
        c = eng.db("z").collection("t")
        c.set_clustering("a", "b", n_files=16, layout=layout)
        c.insert_df(spark.createDataFrame(rows, "a long, b long, pay long")
                    .repartition(8))
        return c

    zc = build("zorder", "wz")
    lc = build("linear", "wl")
    n_files = len(zc._data_files(zc.current_path()))
    assert n_files > 4

    probes = [111, 555, 912]
    # column a: both layouts prune well
    za = sum(_files_hit(_file_ranges(zc, 0), v) for v in probes) / len(probes)
    # column b: linear sort can't prune (every file spans all of b);
    # z-order must skip most files
    zb = sum(_files_hit(_file_ranges(zc, 1), v) for v in probes) / len(probes)
    lb = sum(_files_hit(_file_ranges(lc, 1), v) for v in probes) / len(probes)
    assert za <= n_files / 2, (za, n_files)
    assert zb <= n_files / 2, (zb, n_files)
    assert lb > n_files * 0.9, (lb, n_files)  # the layout z-order beats

    # correctness unaffected by the layout
    assert zc.count() == lc.count() == 20000
    got = sorted(r["pay"] for r in zc.find({"a": rows[7][0], "b": rows[7][1]}).all())
    want = sorted(p for a, b, p in rows if (a, b) == (rows[7][0], rows[7][1]))
    assert got == want


def test_zorder_single_column_degrades_to_linear(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "w1"))
    c = eng.db("z").collection("t")
    c.set_clustering("a", n_files=4, layout="zorder")
    c.insert_df(spark.createDataFrame(
        [((i * 37) % 500, i) for i in range(2000)], "a long, pay long"))
    ranges = sorted(_file_ranges(c, 0))
    for (l1, h1), (l2, h2) in zip(ranges, ranges[1:]):
        assert h1 <= l2  # non-overlapping = linear layout

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown clustering layout"):
        c.set_clustering("a", layout="hilbert")


def test_case_conversion_composes_on_unicode(spark):
    # Catalyst's SimplifyCaseConversionExpressions rewrites
    # lower(upper(x)) -> lower(x), which is unsound for one-way case
    # mappings (upper('ß')='SS'). The session excludes the rule; the
    # composed Mongo expressions must follow real casing.
    from anser_spark.functions.expressions import compile_expr

    df = spark.createDataFrame([("ß", "STRASSE")], "t string, u string")
    row = df.select(
        compile_expr({"$toLower": {"$toUpper": "$t"}}, df.schema).alias("lu"),
        compile_expr({"$toUpper": {"$toLower": "$u"}}, df.schema).alias("ul"),
    ).collect()[0]
    assert row.lu == "ss"
    assert row.ul == "STRASSE"


def test_stream_ingest_with_incremental_dedup(spark, tmp_path):
    # the full incremental loop: corpus indexed once; batch 1 dedups
    # against the corpus AND extends the index; batch 2 dedups against
    # both the corpus and batch 1 — no rebuild anywhere
    import json

    from anser_spark.engine import Engine
    from anser_spark.streaming.ingest import stream_into_collection

    eng = Engine(spark, workdir=str(tmp_path / "wd"))
    coll = eng.db("ing").collection("docs")
    base = "quick brown fox jumps over the lazy dog again and again"
    coll.insert({"doc_id": 1, "text": base})
    coll.insert({"doc_id": 2, "text": "completely different words entirely here"})
    coll.create_search_index("mh", {"kind": "minhash", "id_col": "doc_id",
                                    "path": "text"})

    srcdir = tmp_path / "src"
    srcdir.mkdir()
    schema = "doc_id long, text string"

    def put(name, rows):
        with open(srcdir / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    def run():
        stream = spark.readStream.schema(schema).json(str(srcdir))
        q = stream_into_collection(
            stream, coll, checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True, dedup_index="mh", dedup_threshold=1.0,
        )
        q.awaitTermination(180)

    # batch 1: one dup of corpus doc 1, one fresh doc
    put("b1.jsonl", [{"doc_id": 10, "text": base},
                     {"doc_id": 11, "text": "fresh batch one content words here"}])
    run()
    assert sorted(r["doc_id"] for r in coll.find({}).all()) == [1, 2, 11]

    # batch 2: dup of corpus, dup of BATCH-1 survivor (caught only via
    # the incremental index append), and a fresh doc
    put("b2.jsonl", [
        {"doc_id": 20, "text": base},
        {"doc_id": 21, "text": "fresh batch one content words here"},
        {"doc_id": 22, "text": "totally new batch two material words"},
    ])
    run()
    assert sorted(r["doc_id"] for r in coll.find({}).all()) == [1, 2, 11, 22]


# ---------------------------------------------------------------------------
# $jsonSchema query operator + collection validators
# ---------------------------------------------------------------------------


def test_json_schema_query_operator(doc_collection):
    # find conforming docs: status string, priority ≥ 0 when present,
    # tags at most 2 items
    out = doc_collection.find({"$jsonSchema": {
        "bsonType": "object",
        "required": ["_id", "status"],
        "properties": {
            "status": {"bsonType": "string",
                       "enum": ["success", "failed", "started",
                                "undispatched"]},
            "priority": {"bsonType": ["int", "long"], "minimum": 0},
            "tags": {"bsonType": "array", "maxItems": 2,
                     "items": {"bsonType": "string", "minLength": 3}},
        },
    }}).all()
    ids = sorted(r["_id"] for r in out)
    # a3: priority null (passes — absent), tags [] ok
    # a4: priority 99, tags 2 ok; a5: 3 tags -> fails; a6: ok
    # a1: ok; a2: ok; a5 fails (-1 priority AND 3 tags)
    assert ids == ["a1", "a2", "a3", "a4", "a6"]


def test_json_schema_nested_and_combinators(doc_collection):
    out = doc_collection.find({"$jsonSchema": {
        "properties": {
            "meta": {"bsonType": "object",
                     "required": ["owner"],
                     "properties": {"attempt": {"minimum": 2}}},
        },
    }}).all()
    # meta.owner null on a3 (required fails); attempt must be ≥2 → a2,a4,a6
    assert sorted(r["_id"] for r in out) == ["a2", "a4", "a6"]

    out = doc_collection.find({"$jsonSchema": {
        "properties": {
            "status": {"anyOf": [{"pattern": "^succ"}, {"enum": ["failed"]}]},
        },
    }}).all()
    assert sorted(r["_id"] for r in out) == ["a1", "a2", "a4", "a6"]


def test_json_schema_unknown_keyword_raises(doc_collection):
    import pytest as _pytest

    from anser_spark.functions.filters import FilterCompileError

    with _pytest.raises(FilterCompileError, match="jsonSchema keyword"):
        doc_collection.find({"$jsonSchema": {
            "properties": {"status": {"uniqueItems": True}}}}).all()


def test_collection_validator_blocks_bad_inserts(spark, tmp_path):
    import pytest as _pytest

    from anser_spark.engine import DocumentValidationError, Engine

    eng = Engine(spark, workdir=str(tmp_path))
    coll = eng.db("v").collection("t")
    coll.set_validator({
        "required": ["_id"],
        "properties": {"score": {"minimum": 0, "maximum": 100}},
    })
    coll.insert({"_id": 1, "score": 50})
    with _pytest.raises(DocumentValidationError, match="validation"):
        coll.insert({"_id": 2, "score": 150})
    assert coll.count() == 1  # failed insert committed nothing
    with _pytest.raises(DocumentValidationError):
        coll.insert_df(spark.createDataFrame([(None, 10)], "_id long, score long"))
    coll.set_validator(None)
    coll.insert({"_id": 2, "score": 150})
    assert coll.count() == 2


def test_new_expression_ops(doc_collection):
    import math

    out = doc_collection.pipe([
        {"$match": {"_id": "a1"}},
        {"$project": {
            "_id": 0,
            "cmp0": {"$strcasecmp": ["SUCCESS", "$status"]},
            "cmpn": {"$strcasecmp": ["abc", "abd"]},
            "idx": {"$indexOfBytes": ["$status", "cc"]},
            "sdp": {"$stdDevPop": [[2, 4, 4, 4, 5, 5, 7, 9]]},
            "sds": {"$stdDevSamp": [[1.0, 2.0, 3.0, 4.0]]},
            "sds1": {"$stdDevSamp": [[1.0]]},
            "bs": {"$bsonSize": "$meta"},
        }},
    ]).all()[0]
    assert out["cmp0"] == 0 and out["cmpn"] == -1
    assert out["idx"] == 2
    assert abs(out["sdp"] - 2.0) < 1e-12
    assert abs(out["sds"] - math.sqrt(5.0 / 3.0)) < 1e-12
    assert out["sds1"] is None  # samp needs n>=2, as Mongo
    assert out["bs"] > 10  # json rendering of the meta struct


def test_search_regex_and_near(spark, tmp_path):
    import datetime

    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "srn"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "a", "text": "alpha-42", "n": 10.0,
         "ts": datetime.datetime(2026, 1, 1), "loc": [0.0, 0.0]},
        {"_id": "b", "text": "beta-7", "n": 13.0,
         "ts": datetime.datetime(2026, 1, 2), "loc": [1.0, 0.0]},
        {"_id": "c", "text": "gamma", "n": None,
         "ts": datetime.datetime(2026, 1, 9), "loc": [10.0, 10.0]},
    ])
    rows = c.pipe([
        {"$search": {"regex": {"path": "text", "query": r"[a-z]+-\d+"}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in rows) == ["a", "b"]
    # numeric near: score = pivot/(pivot+|n-origin|), nearest first
    rows = c.pipe([
        {"$search": {"near": {"path": "n", "origin": 12, "pivot": 2}}},
        {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}},
    ]).all()
    assert [r["_id"] for r in rows] == ["b", "a"]
    assert rows[0]["s"] == pytest.approx(2 / 3)
    assert rows[1]["s"] == pytest.approx(0.5)
    # date near: millisecond distance
    rows = c.pipe([
        {"$search": {"near": {
            "path": "ts", "origin": datetime.datetime(2026, 1, 2),
            "pivot": 86_400_000}}},
        {"$project": {"_id": 1}},
        {"$limit": 1},
    ]).all()
    assert rows[0]["_id"] == "b"
    # geo near: [lon, lat] haversine meters
    rows = c.pipe([
        {"$search": {"near": {
            "path": "loc", "origin": [0.5, 0.0], "pivot": 100_000}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert [r["_id"] for r in rows][:2] == ["a", "b"] or \
           [r["_id"] for r in rows][:2] == ["b", "a"]
    assert [r["_id"] for r in rows][2] == "c"


def test_search_embedded_document(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "sed"))
    c = eng.db("t").collection("orders")
    c.insert_many([
        {"_id": "o1", "items": [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 9}]},
        {"_id": "o2", "items": [{"sku": "c", "qty": 1}]},
        {"_id": "o3", "items": []},
    ])
    rows = c.pipe([
        {"$search": {"embeddedDocument": {
            "path": "items",
            "operator": {"range": {"path": "items.qty", "gte": 2}},
        }}},
        {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}},
    ]).all()
    got = {r["_id"]: r["s"] for r in rows}
    assert got == {"o1": 2.0}
    rows = c.pipe([
        {"$search": {"embeddedDocument": {
            "path": "items",
            "operator": {"in": {"path": "items.sku", "value": ["b", "c"]}},
        }}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in rows) == ["o1", "o2"]


def test_search_query_string(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "sqs"))
    c = eng.db("t").collection("docs")
    c.insert_many([
        {"_id": "a", "text": "spark cluster engine", "lang": "en"},
        {"_id": "b", "text": "mongo documents", "lang": "en"},
        {"_id": "c", "text": "spark and mongo", "lang": "de"},
        {"_id": "d", "text": None, "lang": "en"},
    ])

    def ids(query):
        rows = c.pipe([
            {"$search": {"queryString": {"defaultPath": "text", "query": query}}},
            {"$project": {"_id": 1}},
        ]).all()
        return sorted(r["_id"] for r in rows)

    assert ids("spark") == ["a", "c"]
    assert ids("spark AND mongo") == ["c"]
    assert ids("spark OR documents") == ["a", "b", "c"]
    assert ids("spark NOT mongo") == ["a"]
    assert ids("lang:de") == ["c"]
    assert ids("(spark OR mongo) AND lang:en") == ["a", "b"]
    assert ids('"spark cluster"') == ["a"]
    assert ids("spar*") == ["a", "c"]
    assert ids("-mongo spark") == ["a"]  # -term = global must_not


def test_search_geo_within_and_sort_option(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "sgw"))
    c = eng.db("t").collection("places")
    c.insert_many([
        {"_id": "p1", "loc": [0.0, 0.0], "pop": 10},
        {"_id": "p2", "loc": [0.5, 0.5], "pop": 30},
        {"_id": "p3", "loc": [50.0, 50.0], "pop": 20},
    ])
    rows = c.pipe([
        {"$search": {"geoWithin": {
            "path": "loc",
            "circle": {"center": [0.0, 0.0], "radius": 100_000},
        }}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in rows) == ["p1", "p2"]
    rows = c.pipe([
        {"$search": {"geoWithin": {
            "path": "loc",
            "box": {"bottomLeft": [-1, -1], "topRight": [1, 1]},
        }}},
        {"$project": {"_id": 1}},
    ]).all()
    assert sorted(r["_id"] for r in rows) == ["p1", "p2"]
    # Atlas stage-level sort replaces relevance order
    rows = c.pipe([
        {"$search": {
            "geoWithin": {"path": "loc",
                          "box": {"bottomLeft": [-90, -90], "topRight": [90, 90]}},
            "sort": {"pop": -1},
        }},
        {"$project": {"_id": 1}},
    ]).all()
    assert [r["_id"] for r in rows] == ["p2", "p3", "p1"]
