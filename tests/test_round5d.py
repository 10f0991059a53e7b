"""Round-5 continuation #2: approximate $percentile/$median (Mongo 7.0's
default t-digest method mapped to Spark's mergeable percentile_approx
sketch), plus coverage added alongside later features in this session.
"""

import os

import pytest


def test_percentile_approximate_method(engine):
    # method: "approximate" = Spark's percentile_approx sketch; values
    # must land within a tight band of the exact answer (accuracy
    # parameter 10k on 6k rows ⇒ near-exact)
    rows = engine.db("tpch").collection("lineitem").pipe([
        {"$group": {
            "_id": "$l_returnflag",
            "p_exact": {"$percentile": {"input": "$l_quantity",
                                        "p": [0.5, 0.9], "method": "exact"}},
            "p_approx": {"$percentile": {"input": "$l_quantity",
                                         "p": [0.5, 0.9],
                                         "method": "approximate"}},
            "m_exact": {"$median": {"input": "$l_quantity",
                                    "method": "exact"}},
            "m_approx": {"$median": {"input": "$l_quantity",
                                     "method": "approximate"}},
        }},
        {"$sort": {"_id": 1}},
    ]).all()
    assert len(rows) == 3
    for r in rows:
        for e, a in zip(r["p_exact"], r["p_approx"]):
            assert abs(e - a) <= max(1.0, 0.02 * abs(e))
        assert abs(r["m_exact"] - r["m_approx"]) <= max(1.0, 0.02 * abs(r["m_exact"]))


def test_percentile_default_stays_exact(engine):
    # no method field ⇒ exact (pre-7.0 behavior preserved)
    rows = engine.db("tpch").collection("lineitem").pipe([
        {"$group": {
            "_id": None,
            "p_def": {"$percentile": {"input": "$l_quantity", "p": [0.25]}},
            "p_exact": {"$percentile": {"input": "$l_quantity",
                                        "p": [0.25], "method": "exact"}},
        }},
    ]).all()
    assert rows[0]["p_def"] == rows[0]["p_exact"]


def test_window_percentile_approximate(engine):
    rows = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_orderkey": {"$lt": 100}}},
        {"$setWindowFields": {
            "partitionBy": "$l_returnflag",
            "output": {
                "med_a": {"$median": {"input": "$l_quantity",
                                      "method": "approximate"}},
                "med_e": {"$median": {"input": "$l_quantity",
                                      "method": "exact"}},
            },
        }},
        {"$project": {"_id": 0, "med_a": 1, "med_e": 1}},
        {"$limit": 50},
    ]).all()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["med_a"] - r["med_e"]) <= max(1.0, 0.05 * abs(r["med_e"]))


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup-style: cluster + intra-cluster cosine pruning)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_df(spark):
    import os
    td = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    return spark.read.parquet(os.path.join(td, "embeddings.parquet"))


def test_semantic_dedup_drops_planted_near_dups(spark, emb_df):
    from pyspark.sql import functions as F
    from anser_spark.operators.semdedup import semantic_dedup

    base = emb_df.limit(100)
    # plant exact copies (cosine 1.0 >= any eps) with shifted ids
    copies = base.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    both = base.unionByName(copies)
    kept = semantic_dedup(both, eps=0.99, k=4, seed=7)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    # exactly one survivor per planted pair: 100 kept of 200, and never
    # both members of a pair
    assert len(ids) == 100
    originals = {i for i in ids if i < 1_000_000}
    dups = {i - 1_000_000 for i in ids if i >= 1_000_000}
    assert originals.isdisjoint(dups) and len(originals) + len(dups) == 100


def test_semantic_dedup_keep_flag_and_determinism(spark, emb_df):
    from anser_spark.operators.semdedup import semantic_dedup

    flagged1 = semantic_dedup(emb_df, eps=0.95, k=4, seed=7, keep_flag=True)
    flagged2 = semantic_dedup(emb_df, eps=0.95, k=4, seed=7, keep_flag=True)
    rows1 = sorted((r["vec_id"], r["semdedup_keep"]) for r in flagged1.collect())
    rows2 = sorted((r["vec_id"], r["semdedup_keep"]) for r in flagged2.collect())
    assert rows1 == rows2                      # deterministic keep rule
    assert len(rows1) == emb_df.count()        # audit form keeps all rows
    assert {r[1] for r in rows1} <= {True, False}


def test_semantic_dedup_eps_monotone(spark, emb_df):
    from anser_spark.operators.semdedup import semantic_dedup

    loose = semantic_dedup(emb_df, eps=0.8, k=4, seed=7).count()
    tight = semantic_dedup(emb_df, eps=0.999, k=4, seed=7).count()
    # a higher threshold prunes fewer rows
    assert tight >= loose


def test_semantic_dedup_sub_sharding_bounds_clusters(spark, emb_df):
    from anser_spark.operators.semdedup import semantic_dedup

    # force sub-sharding (clusters of ~125 > max 40); the pipeline must
    # still run and keep at least one row per cluster
    kept = semantic_dedup(emb_df, eps=0.99, k=4, seed=7, max_cluster_size=40)
    assert 0 < kept.count() <= emb_df.count()


# ---------------------------------------------------------------------------
# n-variant window operators + $percentile expression form
# ---------------------------------------------------------------------------


def test_window_n_variants(engine):
    rows = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_orderkey": {"$lt": 40}}},
        {"$setWindowFields": {
            "partitionBy": "$l_returnflag",
            "sortBy": {"l_orderkey": 1, "l_linenumber": 1},
            "output": {
                "min3": {"$minN": {"input": "$l_quantity", "n": 3}},
                "max2": {"$maxN": {"input": "$l_quantity", "n": 2}},
                "first2": {"$firstN": {"input": "$l_quantity", "n": 2}},
                "last2": {"$lastN": {"input": "$l_quantity", "n": 2}},
                "topq": {"$top": {"sortBy": {"l_quantity": 1},
                                  "output": "$l_quantity"}},
                "bot2": {"$bottomN": {"sortBy": {"l_quantity": 1},
                                      "output": "$l_quantity", "n": 2}},
            },
        }},
        {"$project": {"_id": 0, "l_returnflag": 1, "l_quantity": 1,
                      "min3": 1, "max2": 1, "first2": 1, "last2": 1,
                      "topq": 1, "bot2": 1}},
    ]).all()
    assert rows
    # recompute per partition from the raw rows themselves
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], []).append(r["l_quantity"])
    for r in rows:
        qs = sorted(by_flag[r["l_returnflag"]])
        assert r["min3"] == qs[:3]
        assert r["max2"] == sorted(qs, reverse=True)[:2]
        assert r["topq"] == qs[0]
        assert r["bot2"] == qs[-2:]
        assert len(r["first2"]) == min(2, len(qs))
        assert len(r["last2"]) == min(2, len(qs))
        # first/last follow the window sortBy (orderkey,linenumber) —
        # every member must come from the partition's value multiset
        assert all(v in qs for v in r["first2"] + r["last2"])


def test_window_firstn_order(engine):
    rows = engine.db("tpch").collection("orders").pipe([
        {"$match": {"o_custkey": {"$lt": 6}}},
        {"$setWindowFields": {
            "partitionBy": "$o_custkey",
            "sortBy": {"o_orderdate": 1, "o_orderkey": 1},
            "output": {"f1": {"$firstN": {"input": "$o_orderkey", "n": 1}},
                       "l1": {"$lastN": {"input": "$o_orderkey", "n": 1}}}}},
        {"$sort": {"o_custkey": 1, "o_orderdate": 1, "o_orderkey": 1}},
        {"$project": {"_id": 0, "o_custkey": 1, "o_orderkey": 1,
                      "o_orderdate": 1, "f1": 1, "l1": 1}},
    ]).all()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for ck, rs in by_cust.items():
        ordered = sorted(rs, key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        for r in rs:
            assert r["f1"] == [ordered[0]["o_orderkey"]]
            assert r["l1"] == [ordered[-1]["o_orderkey"]]


def test_percentile_expression_form(doc_collection):
    out = doc_collection.pipe([
        {"$match": {"_id": "a1"}},
        {"$project": {"p": {"$percentile": {
            "input": {"$literal": [1.0, 2.0, 3.0, 4.0]},
            "p": [0.5, 1.0], "method": "exact"}}}},
    ]).all()
    assert out[0]["p"] == [2.5, 4.0]
    out = doc_collection.pipe([
        {"$match": {"_id": "a1"}},
        {"$project": {"p": {"$percentile": {
            "input": {"$literal": []}, "p": [0.5], "method": "exact"}}}},
    ]).all()
    assert out[0]["p"] == [None]


def test_theta_lookup_plans_hash_join_not_nlj(engine):
    """The correlated-theta path must keep the equalities as hash-join
    keys with the theta part as a join-condition filter — at scale a
    BroadcastNestedLoopJoin/CartesianProduct over the foreign table
    would be the difference between one shuffle and O(n·m)."""
    df = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_returnflag": "R"}},
        {"$lookup": {"from": "lineitem",
                     "let": {"ok": "$l_orderkey", "sk": "$l_suppkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ok", "$l_orderkey"]},
                             {"$ne": ["$$sk", "$l_suppkey"]},
                         ]}}},
                     ],
                     "as": "others"}},
        {"$match": {"others": {"$ne": []}}},
        {"$unset": "others"},
    ]).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# Mongo-shaped explain()
# ---------------------------------------------------------------------------


def test_explain_find_shows_pushdown_and_topk(engine):
    q = (engine.db("tpch").collection("orders")
         .find({"o_totalprice": {"$gt": 100000.0}})
         .sort("-o_totalprice").limit(5))
    doc = q.explain()
    planner = doc["queryPlanner"]
    assert planner["namespace"] == "tpch.orders"
    # top-k compiles to TakeOrdered; the filter reached the parquet scan
    assert planner["winningPlan"]["stage"] == "SORT_LIMIT"
    assert any("o_totalprice" in f for s in planner["scans"]
               for f in s.get("pushedFilters", []))
    assert planner["shuffles"] == 0
    stats = q.explain("executionStats")["executionStats"]
    assert stats["nReturned"] == 5


def test_explain_pipeline_shows_join_and_group(engine):
    doc = engine.db("tpch").collection("orders").pipe([
        {"$lookup": {"from": "customer", "localField": "o_custkey",
                     "foreignField": "c_custkey", "as": "c"}},
        {"$unwind": "$c"},
        {"$group": {"_id": "$c.c_mktsegment", "n": {"$sum": 1}}},
    ]).explain()
    planner = doc["queryPlanner"]
    assert any(j.startswith("JOIN_") for j in planner["joins"])
    chain = []
    node = planner["winningPlan"]
    while node:
        chain.append(node["stage"])
        node = node.get("inputStage")
    assert "GROUP" in chain
    # under AQE the pre-execution plan may not yet carry codegen stage
    # markers — the field is informational, just typed
    assert isinstance(planner["wholeStageCodegen"], bool)
    assert "Scan parquet" in doc["sparkPlan"] or "FileScan" in doc["sparkPlan"]


# ---------------------------------------------------------------------------
# chunk_documents (token-window splitting with overlap)
# ---------------------------------------------------------------------------


def test_chunk_documents_reconstruction(spark):
    from anser_spark.operators.text import chunk_documents

    docs = [(i, " ".join(f"t{i}_{j}" for j in range(n)))
            for i, n in enumerate([0, 1, 5, 16, 17, 47, 100])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 0 not in by_doc  # empty doc → no chunks
    for i, n in enumerate([0, 1, 5, 16, 17, 47, 100]):
        if n == 0:
            continue
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        # every token position covered exactly once after dropping the
        # 4-token overlap prefix of every chunk but the first
        rebuilt = chunks[0]["chunk_text"].split()
        for c in chunks[1:]:
            rebuilt += c["chunk_text"].split()[4:]
        assert rebuilt == [f"t{i}_{j}" for j in range(n)]
        assert all(c["chunk_n_tokens"] <= 16 for c in chunks)
        assert all(c["chunk_n_tokens"] == len(c["chunk_text"].split())
                   for c in chunks)


def test_chunk_documents_vs_duckdb(spark):
    import duckdb
    from anser_spark.operators.text import chunk_documents

    td = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(td, "documents.parquet"))
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(docs.select("doc_id", "text"),
                                 chunk_tokens=32, overlap=0).collect()
    )
    con = duckdb.connect()
    exp = sorted(con.execute(f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\\s+'),
                             t -> t <> '') AS ts
          FROM '{td}/documents.parquet'
        ), idx AS (
          SELECT doc_id, ts, unnest(range(0, cast(ceil(len(ts)/32.0) AS INT))) AS c
          FROM toks WHERE len(ts) > 0
        )
        SELECT doc_id, c,
               array_to_string(ts[c*32+1 : c*32+32], ' ')
        FROM idx
    """).fetchall())
    assert got == exp and len(got) > 0


def test_chunk_documents_no_shuffle(spark):
    from anser_spark.operators.text import chunk_documents

    td = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(td, "documents.parquet"))
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: one scan, zero shuffles


# ---------------------------------------------------------------------------
# $lookup with array-valued localField / foreignField (any-element match)
# ---------------------------------------------------------------------------


def _tagdim(spark):
    return spark.createDataFrame(
        [("red", 1), ("blue", 2), ("green", 3), ("yellow", 4)],
        "tag string, weight long")


def test_lookup_array_local_field(spark, doc_collection):
    dim = _tagdim(spark)
    doc_collection.engine.db("appdb").collection("tagdim")._rewrite(dim)
    out = doc_collection.pipe([
        {"$lookup": {"from": "tagdim", "localField": "tags",
                     "foreignField": "tag", "as": "tw"}},
        {"$project": {"_id": 1, "n": {"$size": "$tw"},
                      "total": {"$sum": {"$map": {"input": "$tw",
                                                  "in": "$$this.weight"}}}}},
        {"$sort": {"_id": 1}},
    ]).all()
    by_id = {r["_id"]: r for r in out}
    # a1 tags [red, blue] → weights 1+2; a3 tags [] → empty array
    assert by_id["a1"]["n"] == 2 and by_id["a1"]["total"] == 3
    assert by_id["a3"]["n"] == 0 and by_id["a3"]["total"] == 0
    assert by_id["a5"]["n"] == 3 and by_id["a5"]["total"] == 6


def test_lookup_array_local_fused_unwind(spark, doc_collection):
    dim = _tagdim(spark)
    doc_collection.engine.db("appdb").collection("tagdim")._rewrite(dim)
    out = doc_collection.pipe([
        {"$match": {"_id": "a4"}},
        {"$lookup": {"from": "tagdim", "localField": "tags",
                     "foreignField": "tag", "as": "tw"}},
        {"$unwind": "$tw"},
        {"$project": {"_id": 1, "t": "$tw.tag", "w": "$tw.weight"}},
        {"$sort": {"w": 1}},
    ]).all()
    # a4 tags [green, red] → two rows
    assert [(r["t"], r["w"]) for r in out] == [("red", 1), ("green", 3)]


def test_lookup_array_foreign_field(spark, doc_collection):
    # foreign side carries the array: groups list their member tags
    groups = spark.createDataFrame(
        [("warm", ["red", "yellow"]), ("cool", ["blue", "green"]),
         ("all", ["red", "blue", "green", "yellow"])],
        "gname string, members array<string>")
    doc_collection.engine.db("appdb").collection("taggroups")._rewrite(groups)
    out = doc_collection.pipe([
        {"$match": {"_id": "a2"}},      # tags [blue]
        {"$unwind": "$tags"},
        {"$lookup": {"from": "taggroups", "localField": "tags",
                     "foreignField": "members", "as": "g"}},
        {"$project": {"_id": 1, "names": {"$map": {"input": "$g",
                                                   "in": "$$this.gname"}}}},
    ]).all()
    assert sorted(out[0]["names"]) == ["all", "cool"]


def test_lookup_both_arrays_dedup(spark, doc_collection):
    groups = spark.createDataFrame(
        [("multi", ["red", "blue", "green"])],
        "gname string, members array<string>")
    doc_collection.engine.db("appdb").collection("taggroups")._rewrite(groups)
    out = doc_collection.pipe([
        {"$match": {"_id": "a5"}},      # tags [blue, green, red]
        {"$lookup": {"from": "taggroups", "localField": "tags",
                     "foreignField": "members", "as": "g"}},
        {"$project": {"_id": 1, "n": {"$size": "$g"}}},
    ]).all()
    # three shared elements, ONE matching group doc — appears once
    assert out[0]["n"] == 1


def test_lookup_array_plans_hash_join(spark, doc_collection):
    dim = _tagdim(spark)
    doc_collection.engine.db("appdb").collection("tagdim")._rewrite(dim)
    df = doc_collection.pipe([
        {"$lookup": {"from": "tagdim", "localField": "tags",
                     "foreignField": "tag", "as": "tw"}},
    ]).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_sort_array_document_sortby(spark, engine):
    df = spark.createDataFrame(
        [(1, [("b", 2), ("a", 9), ("c", 1)])],
        "id long, items array<struct<n:string,v:long>>")
    coll = engine.db("appdb").collection("sortarr")
    coll._rewrite(df)
    out = coll.pipe([
        {"$project": {"s": {"$sortArray": {"input": "$items",
                                           "sortBy": {"v": 1}}}}},
    ]).all()
    assert [e["n"] for e in out[0]["s"]] == ["c", "b", "a"]
    out = coll.pipe([
        {"$project": {"s": {"$sortArray": {"input": "$items",
                                           "sortBy": {"v": -1}}}}},
    ]).all()
    assert [e["n"] for e in out[0]["s"]] == ["a", "b", "c"]
    out = coll.pipe([
        {"$project": {"s": {"$sortArray": {"input": "$items",
                                           "sortBy": {"n": 1, "v": 1}}}}},
    ]).all()
    assert [e["n"] for e in out[0]["s"]] == ["a", "b", "c"]
    from anser_spark import ExprCompileError
    with pytest.raises(ExprCompileError):
        coll.pipe([
            {"$project": {"s": {"$sortArray": {
                "input": "$items", "sortBy": {"n": 1, "v": -1}}}}},
        ]).to_df()


def test_literal_document_and_array_of_documents(doc_collection):
    out = doc_collection.pipe([
        {"$match": {"_id": "a1"}},
        {"$project": {
            "d": {"$literal": {"x": 1, "y": "s"}},
            "arr": {"$literal": [{"n": "b", "v": 2}, {"n": "a", "v": 9}]},
            "sorted": {"$sortArray": {
                "input": {"$literal": [{"n": "b", "v": 2}, {"n": "a", "v": 9},
                                       {"n": "c", "v": 1}]},
                "sortBy": {"v": 1}}},
        }},
    ]).all()
    r = out[0]
    assert r["d"]["x"] == 1 and r["d"]["y"] == "s"
    assert [e["n"] for e in r["arr"]] == ["b", "a"]
    assert [e["n"] for e in r["sorted"]] == ["c", "b", "a"]


def test_list_search_indexes_stage(spark, tmp_path):
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "lsi"))
    coll = eng.db("appdb").collection("docs")
    coll._rewrite(spark.createDataFrame(
        [(i, f"alpha beta {i}") for i in range(20)], "_id long, text string"))
    # empty listing composes (typed empty frame)
    assert coll.pipe([{"$listSearchIndexes": {}}]).all() == []
    coll.create_search_index("tix", {"kind": "bm25", "path": "text"})
    out = coll.pipe([{"$listSearchIndexes": {}}]).all()
    assert len(out) == 1 and out[0]["name"] == "tix"
    assert out[0]["kind"] == "bm25" and out[0]["stale"] is False
    coll.update_all({}, {"$set": {"text": "mutated"}})
    out = coll.pipe([
        {"$listSearchIndexes": {"name": "tix"}},
        {"$project": {"name": 1, "stale": 1}},
    ]).all()
    assert out[0]["stale"] is True
    # name filter misses → empty
    assert coll.pipe([{"$listSearchIndexes": {"name": "nope"}}]).all() == []
    # non-leading placement is an error, as Mongo
    import pytest as _pytest
    with _pytest.raises(ValueError, match="first"):
        coll.pipe([{"$match": {}}, {"$listSearchIndexes": {}}]).all()
