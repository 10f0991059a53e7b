"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every query below goes through the anser_spark engine (Mongo-dialect
filter / update / pipeline compilers → DataFrame plans) — these are the
operator-coverage receipts for SURVEY.md §2.
"""

from __future__ import annotations

import datetime
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _db(spark: SparkSession, sf_dir: str):
    from anser_spark.engine import Engine

    return Engine(spark).mount("tpch", sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7 M2 slice):
    fluent find → sort → limit compiled to one Catalyst plan."""
    db = _db(spark, "/root/testdata/sf0.001")
    return (
        db.collection("lineitem")
        .find({"l_quantity": {"$gt": 45.0}})
        .sort("-l_extendedprice", "l_orderkey", "l_linenumber")
        .limit(10)
        .to_df()
    )


# ---------------------------------------------------------------------------
# queries: name → (spark, sf_dir) → DataFrame
# ---------------------------------------------------------------------------


def _q_find_sort_limit(spark, sf_dir):
    # §2.1/2.3: find + getSort-style keys + limit (db/wrapper.go:452-481)
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .find({"l_quantity": {"$gt": 45.0}})
        .sort("-l_extendedprice", "l_orderkey", "l_linenumber")
        .limit(10)
        .to_df()
    )


def _q_filter_in_projection(spark, sf_dir):
    # §2.2 $in + §2.3 inclusion projection (column pruning)
    return (
        _db(spark, sf_dir)
        .collection("customer")
        .find({"c_mktsegment": {"$in": ["BUILDING", "AUTOMOBILE"]}})
        .select({"c_custkey": 1, "c_name": 1, "c_acctbal": 1})
        .to_df()
    )


def _q_filter_and_or(spark, sf_dir):
    # §2.2 logical operators over comparisons
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .find(
            {
                "$or": [
                    {"o_orderstatus": "F"},
                    {"o_totalprice": {"$gt": 200000.0}},
                ],
                "o_orderdate": {"$lt": datetime.datetime(1996, 1, 1)},
            }
        )
        .select({"o_orderkey": 1, "o_orderstatus": 1, "o_totalprice": 1})
        .to_df()
    )


def _q_filter_regex(spark, sf_dir):
    # composite (50-gate cap): §2.2 $regex → rlike, plus the round-7
    # ICU collation surface ({'locale':'en','strength':2} equality and
    # $in against the all-caps c_mktsegment — binary matches nothing,
    # so the legs discriminate; oracle twin lower()-normalizes)
    from pyspark.sql import functions as F

    regex = (
        _db(spark, sf_dir)
        .collection("part")
        .find({"p_name": {"$regex": "blue"}, "p_size": {"$gte": 10}})
        .select({"p_partkey": 1, "p_name": 1, "p_size": 1})
        .to_df()
    )
    cust = _db(spark, sf_dir).collection("customer")
    ci = {"locale": "en", "strength": 2}
    # three single-row count legs as ONE union+pivot frame (round 14,
    # guide §2.6): their stages run inside a single broadcast-build job
    # where the chained crossJoins paid one per leg — identical
    # columns, types, and values
    leg_list = [
        ("ci_eq", cust.find({"c_mktsegment": "building"}).collation(ci)
         .to_df().agg(F.count("*").alias("ci_eq"))),
        ("ci_in", cust.find({"c_mktsegment": {"$in": ["machinery",
                                                      "Household"]}})
         .collation(ci).to_df().agg(F.count("*").alias("ci_in"))),
        ("bin_eq", cust.find({"c_mktsegment": "building"}).to_df()
         .agg(F.count("*").alias("bin_eq"))),
    ]
    from functools import reduce

    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [
            leg.select(F.lit(n).alias("__leg"), F.col(n).alias("__v"))
            for n, leg in leg_list
        ],
    )
    legs = (
        tagged.groupBy()
        .pivot("__leg", [n for n, _ in leg_list])
        .agg(F.first("__v"))
        .select(*[n for n, _ in leg_list])
    )
    return regex.crossJoin(F.broadcast(legs))


def _q_filter_nin_mod(spark, sf_dir):
    # §2.2 $nin + $mod
    return (
        _db(spark, sf_dir)
        .collection("nation")
        .find({"n_regionkey": {"$nin": [0, 4]}, "n_nationkey": {"$mod": [2, 1]}})
        .to_df()
    )


def _q_skip_limit_page(spark, sf_dir):
    # §2.3 skip/limit paging over a deterministic sort
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .find(None)
        .sort("l_orderkey", "l_linenumber")
        .skip(100)
        .limit(50)
        .select({"l_orderkey": 1, "l_linenumber": 1, "l_quantity": 1})
        .to_df()
    )


def _q_count_matching(spark, sf_dir):
    # §2.3 Count() via the $count stage
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe([{"$match": {"l_returnflag": "R"}}, {"$count": "n"}])
        .to_df()
    )


def _q_group_q1(spark, sf_dir):
    # §2.5 $match + $group with multiple accumulators (TPC-H Q1 shape),
    # compound _id flattened for the oracle
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$match": {"l_shipdate": {"$lte": datetime.datetime(1998, 9, 2)}}},
                {
                    "$group": {
                        "_id": {"rf": "$l_returnflag", "ls": "$l_linestatus"},
                        "sum_qty": {"$sum": "$l_quantity"},
                        "sum_base_price": {"$sum": "$l_extendedprice"},
                        "sum_disc_price": {
                            "$sum": {
                                "$multiply": [
                                    "$l_extendedprice",
                                    {"$subtract": [1, "$l_discount"]},
                                ]
                            }
                        },
                        "avg_qty": {"$avg": "$l_quantity"},
                        "count_order": {"$sum": 1},
                    }
                },
                {
                    "$project": {
                        "_id": 0,
                        "l_returnflag": "$_id.rf",
                        "l_linestatus": "$_id.ls",
                        "sum_qty": {"$round": ["$sum_qty", 2]},
                        "sum_base_price": {"$round": ["$sum_base_price", 2]},
                        "sum_disc_price": {"$round": ["$sum_disc_price", 2]},
                        "avg_qty": {"$round": ["$avg_qty", 4]},
                        "count_order": 1,
                    }
                },
            ]
        )
        .to_df()
    )


def _q_group_global(spark, sf_dir):
    # §2.5 $group _id:None + expression language ($multiply/$subtract)
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$match": {"l_discount": {"$gte": 0.05, "$lte": 0.07}, "l_quantity": {"$lt": 24.0}}},
                {
                    "$group": {
                        "_id": None,
                        "revenue": {"$sum": {"$multiply": ["$l_extendedprice", "$l_discount"]}},
                        "n": {"$sum": 1},
                    }
                },
                {"$project": {"_id": 0, "revenue": {"$round": ["$revenue", 2]}, "n": 1}},
            ]
        )
        .to_df()
    )


def _q_lookup_unwind(spark, sf_dir):
    # §2.5/2.6 $lookup (left join + re-nest) then $unwind (explode)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$match": {"o_totalprice": {"$gt": 250000.0}}},
                {
                    "$lookup": {
                        "from": "customer",
                        "localField": "o_custkey",
                        "foreignField": "c_custkey",
                        "as": "cust",
                    }
                },
                {"$unwind": "$cust"},
                {
                    "$project": {
                        "o_orderkey": 1,
                        "o_totalprice": 1,
                        "c_name": "$cust.c_name",
                        "c_mktsegment": "$cust.c_mktsegment",
                    }
                },
            ]
        )
        .to_df()
    )


def _q_sort_by_count(spark, sf_dir):
    # §2.5 $sortByCount on the documents table
    return (
        _db(spark, sf_dir)
        .collection("documents")
        .pipe([{"$sortByCount": "$lang"}])
        .to_df()
    )


def _q_project_expressions(spark, sf_dir):
    # §2.5 expression language: $year, $toUpper, $cond, $concat
    return (
        _db(spark, sf_dir)
        .collection("events")
        .pipe(
            [
                {"$match": {"event_type": {"$ne": "view"}}},
                {
                    "$project": {
                        "event_id": 1,
                        "yr": {"$year": "$ts"},
                        "etype": {"$toUpper": "$event_type"},
                        "bucket": {
                            "$cond": {
                                "if": {"$gte": ["$value", 50.0]},
                                "then": "high",
                                "else": "low",
                            }
                        },
                        "val2": {"$round": [{"$multiply": ["$value", 2.0]}, 4]},
                    }
                },
            ]
        )
        .to_df()
    )


def _q_group_by_user(spark, sf_dir):
    # §2.8 APM-analogue shape: keyed windowless aggregation over events
    return (
        _db(spark, sf_dir)
        .collection("events")
        .pipe(
            [
                {
                    "$group": {
                        "_id": "$event_type",
                        "n": {"$sum": 1},
                        "total_value": {"$sum": "$value"},
                        "max_value": {"$max": "$value"},
                        "users": {"$addToSet": "$user_id"},
                    }
                },
                {
                    "$project": {
                        "event_type": "$_id",
                        "_id": 0,
                        "n": 1,
                        "total_value": {"$round": ["$total_value", 2]},
                        "max_value": 1,
                        "n_users": {"$size": "$users"},
                    }
                },
            ]
        )
        .to_df()
    )


def _q_text_token_count(spark, sf_dir):
    # M7 text analysis: whitespace token counting at scan speed
    from anser_spark.operators.text import token_count_col
    from pyspark.sql import functions as F

    docs = _db(spark, sf_dir).collection("documents").df()
    return docs.select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens"), "n_chars"
    )


def _q_sequence_packing(spark, sf_dir):
    # M7 sequence packing (concat-then-chunk, the LLM-pretraining
    # layout): whitespace token counts → sharded deterministic packing
    # into 512-token blocks; window cumsum only, no sequential state.
    # Composite since round-5 continuation: the per-doc chunk count from
    # chunk_documents (64-token windows, 16 overlap) rides along, putting
    # the chunking operator's window arithmetic under the same value-hash
    # oracle (ceil((n-16)/48), floored at 1, 0 for empty docs).
    from pyspark.sql import functions as F

    from anser_spark.operators.packing import pack_sequences
    from anser_spark.operators.text import chunk_documents, token_count_col

    docs = _db(spark, sf_dir).collection("documents").df()
    # both legs tokenize the corpus (JVM regexp splits) over the
    # bench's one-file scan = one task each; fan out by cores/4 (A/B
    # min-of-4: 1-way 1.08s, 8-way 0.68s, 32-way 0.78s — moderate
    # fan-out amortizes per-task overhead best). Values unchanged: the
    # window re-partitions by shard and the chunk count re-groups by
    # doc_id either way. At 100 TB the file count disperses naturally.
    fan = max(1, spark.sparkContext.defaultParallelism // 4)
    if fan > 1:
        docs = docs.repartition(fan, "doc_id")
    toks = docs.select("doc_id", token_count_col(F.col("text")).alias("n_tokens"))
    nch = (
        chunk_documents(docs.select("doc_id", "text"),
                        chunk_tokens=64, overlap=16)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"))
    )
    packed = pack_sequences(toks, capacity=512, num_shards=8).select(
        "doc_id", "shard", "pack_offset", "block_start", "block_end"
    )
    return (
        packed.join(nch, "doc_id", "left")
        .withColumn("n_chunks", F.coalesce(F.col("n_chunks"), F.lit(0).cast("long")))
    )


def _q_hash_split(spark, sf_dir):
    # M7 corpus management: deterministic md5-bucket train/val/test
    # split — no RNG state, stable under append-only corpus growth;
    # DuckDB reproduces md5 exactly, bucket math in integer hex
    from pyspark.sql import functions as F

    from anser_spark.operators.corpus import hash_split

    docs = _db(spark, sf_dir).collection("documents").df()
    return hash_split(docs).select(
        "doc_id", F.col("__bucket").alias("bucket"), "split"
    )


def _q_decontamination(spark, sf_dir):
    # M7 eval decontamination: word-trigram overlap between a held-out
    # eval slice (doc_id % 25 == 0) and the training remainder —
    # exploded shingle postings, broadcast eval side, never all-pairs
    from pyspark.sql import functions as F

    from anser_spark.operators.corpus import contaminated_pairs

    docs = _db(spark, sf_dir).collection("documents").df()
    test = docs.where(F.col("doc_id") % 25 == 0)
    train = docs.where(F.col("doc_id") % 25 != 0)
    # the train-side shingle pass is CPU-bound Python while Spark sizes
    # partitions by BYTES — the bench's one-file layout runs it as ONE
    # task. Fan out by cores/4, not cores: Arrow batches must stay big
    # enough to amortize per-task Python round-trips (A/B min-of-4:
    # 1-way 1.11s, 8-way 0.80s, 32-way 1.05s — full-core spread loses).
    # At 100 TB the file count provides dispersal naturally.
    fan = max(1, spark.sparkContext.defaultParallelism // 4)
    if fan > 1:
        train = train.repartition(fan, "doc_id")
    return contaminated_pairs(train, test, k=3, min_shared=2)


def _q_stratified_sample(spark, sf_dir):
    # M7 corpus rebalancing: deterministic per-language sampling (md5
    # bucket under the stratum rate) — pure filter projection, nested
    # samples under rate growth
    from anser_spark.operators.corpus import stratified_sample

    docs = _db(spark, sf_dir).collection("documents").df()
    return stratified_sample(
        docs, {"en": 0.5, "de": 0.25, "zh": 1.0}, default_rate=0.1
    ).select("doc_id", "lang")


def _q_exact_dedup(spark, sf_dir):
    # M7 exact dedup: hash-groupBy on normalized fingerprint, min-id winner
    from anser_spark.operators.dedup import exact_dedup

    docs = _db(spark, sf_dir).collection("documents").df()
    return exact_dedup(docs).select("doc_id")


def _q_cosine_top_k(spark, sf_dir, query_vec=None):
    # M7 similarity: brute-force cosine top-k (TakeOrdered plan).
    # ``query_vec`` lets the composite ANN gate share ONE point-lookup
    # job across its legs (round 14: three first() jobs → one).
    from anser_spark.operators.similarity import cosine_top_k

    emb = _db(spark, sf_dir).collection("embeddings").df()
    if query_vec is None:
        query_vec = [
            float(x)
            for x in emb.where("vec_id = 0").select("embedding").first()[0]
        ]
    return cosine_top_k(emb, query_vec, k=10, round_to=4)


def _q_minhash_near_dups(spark, sf_dir):
    # M7 MinHash+LSH near-dup pairs — full value-hash oracle via the
    # planted-duplicate construction (the embedding_near_dups pattern):
    # 20 exact-text copies are planted (ids offset by 1e6) and the
    # verification threshold is 1.0. Identical texts have identical
    # shingle sets, hence identical MinHash signatures, hence collide in
    # EVERY LSH band — candidate recall on jaccard=1.0 pairs is exactly
    # 1, not probabilistic. Verification (exact Jaccard over hashed
    # shingle sets) then keeps precisely the identical-set pairs, so the
    # end-to-end LSH output is provably {pairs with identical shingle
    # sets}, which DuckDB reproduces with an exact O(n²) set-equality
    # join (gate scale only). Sub-1.0 thresholds keep their documented
    # probabilistic-recall contract, covered by pytest with controlled
    # noise (tests/test_dedup.py).
    from pyspark.sql import functions as F

    from anser_spark.operators.dedup import minhash_near_dup_pairs

    docs = _db(spark, sf_dir).collection("documents").df().select("doc_id", "text")
    planted = docs.where(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    aug = docs.unionByName(planted)
    return minhash_near_dup_pairs(aug, k=3, threshold=1.0)


def _q_embedding_near_dups(spark, sf_dir):
    # M7 embedding-cosine near-dups via hyperplane LSH. 64-bit
    # signatures / 4 bands: candidate volume stays ~1e-5 of all pairs,
    # the config that scales. The synthetic corpus has no organic pair
    # above 0.52 cosine, so 20 exact duplicates are planted (ids
    # offset by 1e6): identical vectors share every band hash, so LSH
    # recall on them is exactly 1 and verification prunes everything
    # else — the end-to-end output is provably the planted pair set,
    # which an exact O(n²) DuckDB join reproduces → full value-hash
    # oracle for the LSH plumbing. (Recall on sub-identical organic
    # pairs remains probabilistic by design — the documented LSH
    # contract, covered by pytest with controlled noise.)
    from pyspark.sql import functions as F

    from anser_spark.operators.similarity import embedding_near_dup_pairs

    emb = _db(spark, sf_dir).collection("embeddings").df().select("vec_id", "embedding")
    planted = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    aug = emb.unionByName(planted)
    return embedding_near_dup_pairs(aug, dim=64, threshold=0.95, bits=64, bands=4)


def _q_embedding_sim_join(spark, sf_dir):
    # M7 exact cosine similarity join on a bounded subset (the oracle
    # path for the LSH variant)
    from pyspark.sql import functions as F
    from anser_spark.operators.similarity import cosine_similarity_join

    emb = _db(spark, sf_dir).collection("embeddings").df()
    return cosine_similarity_join(emb.where(F.col("vec_id") < 300), threshold=0.3)


def _q_text_stats(spark, sf_dir):
    # M7 language-ID + quality heuristics + the component metric columns
    # in one gate (composite, see the 50-gate cap note) — every emitted
    # column is plain SQL (stopword-vote argmax, punct/length/word-len
    # banding), so the whole heuristic is a full value-hash oracle. The
    # xxhash64 fingerprint column is excluded here (no xxhash64 in
    # DuckDB) and stays covered by pytest goldens + the exact_dedup gate.
    # text_profile fuses stats + components into ONE projection — the
    # plan is a single FileScan of documents, no doc_id self-join
    # (plan-asserted in tests/test_round5.py). The winnowing fingerprint
    # leg (MOSS rolling-hash document fingerprinting, SIGMOD 2003) rides
    # the same scan: md5 k-gram hashes make the ENTIRE selected-hash set
    # oracle-able — fp_digest pins the exact set, not just its size.
    from pyspark.sql import functions as F

    from anser_spark.operators.text import text_profile, with_winnow_fingerprints

    docs = _db(spark, sf_dir).collection("documents").df()
    # fingerprinting is CPU-bound per row while Spark sizes partitions
    # by BYTES — a byte-small single-file table would run one task, so
    # re-split by rows to use every core (at 100 TB the file count
    # provides this parallelism naturally; the tiny shuffle is the
    # price of the bench's one-file layout)
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    # DataFrame form: norm/grams materialize once per row (the
    # one-Column form re-evaluates them per lambda element — O(len²));
    # `__fp` is then referenced 4× below, which also keeps IT pinned
    prof = with_winnow_fingerprints(text_profile(docs), "text", out="__fp", k=8, w=4)
    fp = F.col("__fp")
    return prof.select(
        "doc_id", "n_tokens", "n_chars_calc", "lang_id", "quality",
        "punct_ratio", "mean_word_len", "length_score", "en_stop_hits",
        F.size(fp).cast("long").alias("n_fingerprints"),
        F.md5(F.concat_ws(",", fp)).alias("fp_digest"),
        F.try_element_at(fp, F.lit(1)).alias("min_fp"),
        F.try_element_at(fp, F.lit(-1)).alias("max_fp"),
    )


def _q_window_rank(spark, sf_dir):
    # $setWindowFields → native Spark window functions (shuffle on the
    # partition key only)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {
                    "$setWindowFields": {
                        "partitionBy": "$o_orderpriority",
                        "sortBy": {"o_totalprice": -1, "o_orderkey": 1},
                        "output": {"rn": {"$documentNumber": {}}},
                    }
                },
                {"$match": {"rn": {"$lte": 3}}},
                {"$project": {"o_orderpriority": 1, "o_orderkey": 1, "o_totalprice": 1, "rn": 1}},
            ]
        )
        .to_df()
    )


def _q_bucket_orders(spark, sf_dir):
    # $bucket: explicit-boundary histogram
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {
                    "$bucket": {
                        "groupBy": "$o_totalprice",
                        "boundaries": [0, 100000, 200000, 300000, 400000, 700000],
                        "output": {
                            "n": {"$sum": 1},
                            "avg_price": {"$avg": "$o_totalprice"},
                        },
                    }
                },
                {
                    "$project": {
                        "_id": 1,
                        "n": 1,
                        "avg_price": {"$round": ["$avg_price", 2]},
                    }
                },
            ]
        )
        .to_df()
    )


def _q_json_extract(spark, sf_dir):
    # dynamic-schema tail: JSON string column field extraction
    from pyspark.sql import functions as F

    events = _db(spark, sf_dir).collection("events").df()
    return events.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_value")
    ).where(F.col("k_value").isNotNull())


def _q_tpch_q3_shape(spark, sf_dir):
    # TPC-H Q3 shape through the pipeline compiler: two chained
    # $lookup/$unwind joins + filtered group + top-k. Catalyst sees one
    # plan: both joins broadcast-able, group partial-aggregated.
    cutoff = datetime.datetime(1995, 3, 15)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$match": {"o_orderdate": {"$lt": cutoff}}},
                {"$lookup": {"from": "customer", "localField": "o_custkey",
                             "foreignField": "c_custkey", "as": "c"}},
                {"$unwind": "$c"},
                {"$match": {"c.c_mktsegment": "BUILDING"}},
                {"$lookup": {"from": "lineitem", "localField": "o_orderkey",
                             "foreignField": "l_orderkey", "as": "l"}},
                {"$unwind": "$l"},
                {"$match": {"l.l_shipdate": {"$gt": cutoff}}},
                {"$group": {
                    "_id": {"ok": "$o_orderkey", "od": "$o_orderdate", "op": "$o_orderpriority"},
                    "revenue": {"$sum": {"$multiply": ["$l.l_extendedprice",
                                                        {"$subtract": [1, "$l.l_discount"]}]}},
                }},
                {"$project": {"_id": 0, "o_orderkey": "$_id.ok", "o_orderdate": "$_id.od",
                              "o_orderpriority": "$_id.op",
                              "revenue": {"$round": ["$revenue", 2]}}},
                {"$sort": {"revenue": -1, "o_orderkey": 1}},
                {"$limit": 10},
            ]
        )
        .to_df()
    )


def _q_tpch_q5_shape(spark, sf_dir):
    # TPC-H Q5 shape: five chained lookups + $expr cross-field predicate
    # (customer nation == supplier nation) + regional filter + group
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$match": {"o_orderdate": {"$gte": lo, "$lt": hi}}},
                {"$lookup": {"from": "customer", "localField": "o_custkey",
                             "foreignField": "c_custkey", "as": "c"}},
                {"$unwind": "$c"},
                {"$lookup": {"from": "lineitem", "localField": "o_orderkey",
                             "foreignField": "l_orderkey", "as": "l"}},
                {"$unwind": "$l"},
                {"$lookup": {"from": "supplier", "localField": "l.l_suppkey",
                             "foreignField": "s_suppkey", "as": "s"}},
                {"$unwind": "$s"},
                {"$match": {"$expr": {"$eq": ["$c.c_nationkey", "$s.s_nationkey"]}}},
                {"$lookup": {"from": "nation", "localField": "s.s_nationkey",
                             "foreignField": "n_nationkey", "as": "n"}},
                {"$unwind": "$n"},
                {"$lookup": {"from": "region", "localField": "n.n_regionkey",
                             "foreignField": "r_regionkey", "as": "r"}},
                {"$unwind": "$r"},
                {"$match": {"r.r_name": "ASIA"}},
                {"$group": {
                    "_id": "$n.n_name",
                    "revenue": {"$sum": {"$multiply": ["$l.l_extendedprice",
                                                        {"$subtract": [1, "$l.l_discount"]}]}},
                }},
                {"$project": {"_id": 0, "n_name": "$_id",
                              "revenue": {"$round": ["$revenue", 2]}}},
            ]
        )
        .to_df()
    )


def _q_union_with(spark, sf_dir):
    # $unionWith with a filtered sub-pipeline (UNION ALL semantics)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$match": {"o_orderdate": {"$lt": datetime.datetime(1996, 1, 1)}}},
                {"$project": {"o_orderkey": 1, "o_totalprice": 1}},
                {
                    "$unionWith": {
                        "coll": "orders",
                        "pipeline": [
                            {"$match": {"o_orderdate": {"$gte": datetime.datetime(2001, 1, 1)}}},
                            {"$project": {"o_orderkey": 1, "o_totalprice": 1}},
                        ],
                    }
                },
            ]
        )
        .to_df()
    )


def _q_window_shift(spark, sf_dir):
    # $setWindowFields $shift → lead() per partition
    return (
        _db(spark, sf_dir)
        .collection("events")
        .pipe(
            [
                {"$match": {"user_id": {"$lt": 10}}},
                {
                    "$setWindowFields": {
                        "partitionBy": "$user_id",
                        "sortBy": {"ts": 1, "event_id": 1},
                        "output": {"next_event": {"$shift": {"output": "$event_type", "by": 1}}},
                    }
                },
                {"$project": {"event_id": 1, "user_id": 1, "next_event": 1}},
            ]
        )
        .to_df()
    )


def _q_simhash(spark, sf_dir):
    # M7 SimHash — planted-duplicate oracle: every document is planted
    # once more (id offset by 1e6), fingerprints are computed over the
    # augmented corpus (copies land in different Arrow batches /
    # partitions than their originals), and the gate emits the Hamming
    # distance between each original and its copy. SimHash of identical
    # text is identical by construction (fixed siphash key, deterministic
    # vote matrix), so the provable output is hamming=0 for all 500 docs
    # — DuckDB twins it with literal zeros. This hash-verifies the full
    # pipeline (tokenize → siphash → bit votes → packing → XOR popcount
    # hamming) end-to-end and cross-partition; the fingerprint VALUES
    # stay covered by the independent scalar-loop golden in
    # tests/test_round4.py (no siphash in the oracle engine). Arrow
    # numpy variant (round-4 bake-off winner); Column formulation stays
    # as with_simhash.
    from pyspark.sql import functions as F

    from anser_spark.operators.dedup import simhash_hamming, with_simhash_arrow

    docs = _db(spark, sf_dir).collection("documents").df().select("doc_id", "text")
    # cap planted copies at 500 docs: at sf0.01 — the scale the driver
    # verifies — that is EVERY document (full per-doc coverage); at
    # bench scales it bounds the gate's extra fingerprint work
    planted = docs.where(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    # persist: the fingerprint frame feeds BOTH sides of the
    # original-vs-copy join — without it the whole Arrow siphash/vote
    # lineage recomputes twice (measured ~2× the gate's wall clock)
    from pyspark.storagelevel import StorageLevel

    fp = (
        with_simhash_arrow(docs.unionByName(planted))
        .select("doc_id", "simhash")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    orig = fp.where(F.col("doc_id") < 1_000_000).select(
        "doc_id", F.col("simhash").alias("__fa")
    )
    copy = fp.where(F.col("doc_id") >= 1_000_000).select(
        (F.col("doc_id") - 1_000_000).alias("doc_id"),
        F.col("simhash").alias("__fb"),
    )
    return orig.join(copy, "doc_id").select(
        "doc_id",
        simhash_hamming(F.col("__fa"), F.col("__fb")).cast("long").alias("hamming"),
    )


def _q_ngram_jaccard(spark, sf_dir):
    # M7 n-gram Jaccard via the explicit-block exact path ((lang,
    # source) blocks — bounded per-block by contract), which DuckDB can
    # reproduce exactly: same shingling, same set-Jaccard → full
    # value-hash oracle. The UNBOUNDED scale path (MinHash-LSH
    # band-bucketing candidates) is the same machinery exercised by the
    # minhash_near_dups gate.
    from pyspark.sql import functions as F

    from anser_spark.operators.dedup import ngram_jaccard_pairs

    docs = _db(spark, sf_dir).collection("documents").df()
    return ngram_jaccard_pairs(docs, k=3, threshold=0.4, block_col=F.col("lang"))


def _q_dedup_clusters(spark, sf_dir):
    # M7 duplicate-cluster labeling: connected components (alternating
    # large-star/small-star) over the exact ngram-Jaccard pair graph,
    # every doc labeled with its component's min doc_id (own id if it
    # has no near-dup). Oracle: DuckDB WITH RECURSIVE min-label walk
    # over the identical SQL pair set.
    from pyspark.sql import functions as F

    from anser_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs

    docs = _db(spark, sf_dir).collection("documents").df()
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.4, block_col=F.col("lang"))
    return dedup_clusters(docs, pairs).select("doc_id", "component")


def _q_ivf_top_k(spark, sf_dir, query_vec=None):
    # M7 IVF ANN at full probe (nprobe=k) — provably identical to brute
    # force, so it shares the exact cosine_top_k oracle
    from anser_spark.operators.ivf import ivf_assign, ivf_top_k, ivf_train_sample

    emb = _db(spark, sf_dir).collection("embeddings").df()
    # sample-bounded numpy training (centroid quality only needs a
    # sample; full-probe results are exact regardless of centroid
    # placement — see ivf_train_sample docstring for the bake-off)
    index = ivf_train_sample(emb, k=8, max_iter=5, max_sample=20_000)
    assigned = ivf_assign(emb, index)
    if query_vec is None:
        query_vec = [
            float(x)
            for x in emb.where("vec_id = 0").select("embedding").first()[0]
        ]
    return ivf_top_k(assigned, index, query_vec, k=10, nprobe=8)


def _q_ann_top_k(spark, sf_dir):
    # Composite ANN gate (frees a slot under the 50-gate cap): the
    # brute-force cosine top-k baseline, the IVF full-probe path
    # (provably identical to brute force at nprobe=k), and since the
    # round-5 continuation an IVF-PQ leg union'd with a kind tag.
    # The PQ leg runs the full train→encode→ADC→rerank pipeline with
    # rerank ≥ corpus, which is PROVABLY the exact L2 top-k (the exact
    # re-score covers every candidate regardless of codebook content) —
    # DuckDB reproduces the ids with list_distance and the gate emits
    # their exact cosines, so all three legs stay fully value-hashed.
    # ADC-quality (bounded-rerank) behavior is pytest-covered with
    # recall bounds (tests/test_pq.py).
    from pyspark.sql import functions as F

    from anser_spark.operators.pq import pq_encode, pq_top_k, pq_train_sample
    from anser_spark.operators.similarity import (
        dot_col,
        float_array_lit,
        float_array_sql,
        norm_col,
    )

    emb = _db(spark, sf_dir).collection("embeddings").df()
    # ONE query-vector point lookup shared by every leg (round 14:
    # previously brute/ivf/pq each ran their own first() job)
    query = [float(x) for x in emb.where("vec_id = 0").select("embedding").first()[0]]
    brute = _q_cosine_top_k(spark, sf_dir, query_vec=query).select(
        F.lit("brute").alias("kind"), "vec_id", "cosine"
    )
    ivf = _q_ivf_top_k(spark, sf_dir, query_vec=query).select(
        F.lit("ivf").alias("kind"), "vec_id", "cosine"
    )
    # small training sample: codebook quality is irrelevant to the
    # rerank-exact contract, and a 5k sample keeps the driver-side
    # k-means (the leg's dominant cost at sf0.1) in the ~100ms range
    cb = pq_train_sample(emb, m=8, nbits=6, seed=7, max_sample=5_000)
    enc = pq_encode(emb, cb)
    ids = pq_top_k(enc, cb, query, k=10, rerank=1 << 30).select("vec_id")
    import math as _math

    qn = _math.sqrt(sum(v * v for v in query)) or 1.0
    qcol = float_array_sql(query) or float_array_lit(query)
    vec = "embedding"
    pq = emb.join(F.broadcast(ids), "vec_id").select(
        F.lit("pq").alias("kind"),
        "vec_id",
        F.round(dot_col(vec, qcol) / (norm_col(vec) * F.lit(qn)), 4).alias("cosine"),
    )
    # round 12: the ENGINE's named ivf index with the materialized
    # CELL-ASSIGNMENT table — $vectorSearch candidates come from the
    # probed cells of the layered index table (pushed-down `__cell IN`
    # filter over a cell-range-sorted layout; scores on the STORED
    # vectors), full probe ⇒ provably identical to brute force. The
    # over-fetch + rounded reorder matches the oracle's rounded
    # tie-break exactly (ties at the rank-10 boundary resolve by
    # vec_id on the ROUNDED cosine, as the exact CTE does).
    vcoll = _cached_index_coll(spark, sf_dir, "vix", "vx", {
        "kind": "ivf", "path": "embedding", "nlist": 8, "nprobe": 8,
        "id_col": "vec_id",
    }, table="embeddings")
    cells = (
        vcoll.pipe([{"$vectorSearch": {
            "path": "embedding", "queryVector": query,
            "limit": 60, "index": "vx"}}])
        .to_df()
        .select(
            F.lit("cells").alias("kind"),
            "vec_id",
            F.round(
                dot_col(vec, qcol) / (norm_col(vec) * F.lit(qn)), 4
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )
    # round 13: the ENGINE's named ivfpq index — PQ codes + stored
    # norms ride the cells table, so the candidate pass reads codes
    # only (ADC shortlist) and the exact rerank reads stored vectors
    # for the bounded shortlist. Full probe + numCandidates ≥ corpus ⇒
    # the rerank scores every candidate exactly ⇒ provably identical
    # to brute force, same rounded tie-break as the cells leg.
    pqcoll = _cached_index_coll(spark, sf_dir, "vpx", "pqx", {
        "kind": "ivfpq", "path": "embedding", "nlist": 8, "nprobe": 8,
        "m": 8, "nbits": 6, "id_col": "vec_id",
    }, table="embeddings")
    ivfpq = (
        pqcoll.pipe([{"$vectorSearch": {
            "path": "embedding", "queryVector": query,
            "limit": 60, "numCandidates": 1 << 30, "index": "pqx"}}])
        .to_df()
        .select(
            F.lit("ivfpq").alias("kind"),
            "vec_id",
            F.round(
                dot_col(vec, qcol) / (norm_col(vec) * F.lit(qn)), 4
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )
    return (
        brute.unionByName(ivf).unionByName(pq).unionByName(cells)
        .unionByName(ivfpq)
    )


def _mut_db(spark, sf_dir, tag):
    """A writable engine with the sf_dir mounted read-only: mutation
    gates copy a source table into the engine workdir, mutate it through
    the write path (partition-level copy-on-write), and return the
    post-state for the oracle to reproduce with SELECT transforms."""
    import tempfile

    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=tempfile.mkdtemp(prefix=f"gate_{tag}_"))
    eng.sources["tpch"] = sf_dir
    return eng


def _q_update_all_inc_set(spark, sf_dir):
    # §2.4 UpdateMany through the update-operator compiler ($inc + $set)
    # and the file-level copy-on-write path (db/wrapper.go:237-244)
    from pyspark.sql import functions as F

    eng = _mut_db(spark, sf_dir, "upd")
    coll = eng.db("mut").collection("customer")
    coll._rewrite(eng.db("tpch").collection("customer").df())
    coll.update_all(
        {"c_mktsegment": "BUILDING"},
        {"$inc": {"c_acctbal": 100.0}, "$set": {"c_mktsegment": "BUMPED"}},
    )
    return coll.df().select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
    )


def _q_pipeline_update(spark, sf_dir):
    # §2.4 Mongo 4.2 aggregation-pipeline update form (update is a
    # LIST of stages; db/wrapper.go:188-244 forwards any update shape):
    # $set with expressions over the doc's own fields, then $unset —
    # compiled through the ordinary pipeline compiler over the matched
    # rows and unioned back in the same COW rewrite
    from pyspark.sql import functions as F

    eng = _mut_db(spark, sf_dir, "pup")
    coll = eng.db("mut").collection("customer")
    coll._rewrite(eng.db("tpch").collection("customer").df())
    coll.update_all(
        {"c_mktsegment": "BUILDING"},
        [
            {"$set": {
                "c_acctbal": {"$add": [
                    "$c_acctbal", {"$multiply": ["$c_nationkey", 10]}
                ]},
                "seg_flag": {"$cond": [
                    {"$gte": ["$c_acctbal", 0]}, "pos", "neg"
                ]},
            }},
            {"$unset": "c_comment"},
        ],
    )
    return coll.df().select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        "c_mktsegment",
        "seg_flag",
    )


def _gopher_filter_oracle() -> str:
    from anser_spark.operators.text import LANG_STOPWORDS

    stops = "|".join(w for ws in LANG_STOPWORDS.values() for w in ws)
    return f"""
        WITH base AS (
          SELECT doc_id, text,
            list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x <> '') AS words,
            list_filter(string_split(text, chr(10)),
                        l -> trim(l) <> '') AS lines
          FROM documents
        ), m AS (
          SELECT doc_id,
            len(words) AS n_words,
            CASE WHEN len(words) > 0 THEN
              list_sum(list_transform(words, w -> len(w)))::DOUBLE / len(words)
            ELSE 0.0 END AS mean_wl,
            (len(text) - len(replace(text, '#', '')))
              + (len(string_split(text, '...')) - 1)
              + (len(string_split(text, chr(8230))) - 1) AS n_symbols,
            len(lines) AS n_lines,
            CASE WHEN len(lines) > 0 THEN
              len(list_filter(lines, l -> regexp_matches(trim(l), '^[\u2022\-\*]')))::DOUBLE / len(lines)
            ELSE 0.0 END AS bullet_frac,
            CASE WHEN len(lines) > 0 THEN
              len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|\u2026)$')))::DOUBLE / len(lines)
            ELSE 0.0 END AS ellipsis_frac,
            CASE WHEN len(words) > 0 THEN
              len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE / len(words)
            ELSE 0.0 END AS alpha_frac,
            len(regexp_extract_all(lower(text), '(?i)\\b({stops})\\b', 1)) AS stop_hits
          FROM base
        )
        SELECT doc_id,
          COALESCE(n_words >= 5 AND n_words <= 100000, FALSE) AS rule_word_count,
          COALESCE(mean_wl >= 3.0 AND mean_wl <= 10.0, FALSE) AS rule_mean_word_len,
          COALESCE(CASE WHEN n_words > 0
                        THEN n_symbols::DOUBLE / n_words <= 0.1 END, FALSE) AS rule_symbol_ratio,
          COALESCE(bullet_frac <= 0.9, FALSE) AS rule_bullets,
          COALESCE(ellipsis_frac <= 0.3, FALSE) AS rule_ellipsis,
          COALESCE(alpha_frac >= 0.8, FALSE) AS rule_alpha_words,
          COALESCE(stop_hits >= 2, FALSE) AS rule_stopwords,
          COALESCE(n_words >= 5 AND n_words <= 100000, FALSE)
            AND COALESCE(mean_wl >= 3.0 AND mean_wl <= 10.0, FALSE)
            AND COALESCE(CASE WHEN n_words > 0
                              THEN n_symbols::DOUBLE / n_words <= 0.1 END, FALSE)
            AND COALESCE(bullet_frac <= 0.9, FALSE)
            AND COALESCE(ellipsis_frac <= 0.3, FALSE)
            AND COALESCE(alpha_frac >= 0.8, FALSE)
            AND COALESCE(stop_hits >= 2, FALSE) AS gopher_keep
        FROM m
    """


def _q_temperature_mix(spark, sf_dir):
    # M8 temperature-weighted corpus mixing (share ∝ n^(1/T), T=2) over
    # the deterministic md5-bucket filter — one bounded count aggregate
    # + one filter scan, SQL-twin reproducible
    from anser_spark.operators.corpus import temperature_mix

    docs = _db(spark, sf_dir).collection("documents").df()
    return temperature_mix(
        docs, strata_col="lang", id_col="doc_id", temperature=2.0
    ).select("doc_id", "lang")


def _q_gopher_filter(spark, sf_dir):
    # M8 Gopher/MassiveText quality rules (Rae et al. 2021 A1.1) as
    # boolean flags + conjunctive keep — pure Column, ONE scan, zero
    # exchanges (plan-asserted in pytest)
    from anser_spark.operators.text import gopher_rules

    docs = _db(spark, sf_dir).collection("documents").df()
    return gopher_rules(docs).select(
        "doc_id", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_bullets", "rule_ellipsis",
        "rule_alpha_words", "rule_stopwords", "gopher_keep",
    )


def _cached_index_coll(
    spark, sf_dir, tag, index_name, definition, table="documents"
):
    """A mounted source collection (``table``) with a search index that
    PERSISTS across gate runs under ``.scratch/gate_idx``, keyed by
    (tag, scale factor, corpus fingerprint). The mounted corpus is
    immutable, so a fingerprint-matched index is byte-identical to a fresh build —
    steady-state bench then measures QUERY cost, not repeated index
    builds (round 11; text_find spent ~7s/leg rebuilding fixtures).
    One cold-build leg remains in the gate (the weighted index) so
    build coverage never goes stale. A flock serializes concurrent
    builders (bench + oracle checker may run side by side); corpus
    regeneration changes the fingerprint and sweeps the stale entry."""
    import contextlib

    from anser_spark.engine import Engine

    src = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(src)
    # fingerprint = dir size + ns-resolution mtime + a hash of the
    # parquet file listing (names + sizes): second-granularity mtime
    # alone let a same-second regeneration with an identical directory
    # size reuse a stale index (round 12, ADVICE)
    listing = ""
    if os.path.isdir(src):
        parts = []
        for root, _dirs, files in os.walk(src):
            for f in sorted(files):
                if f.startswith((".", "_")):
                    continue
                p = os.path.join(root, f)
                fst = os.stat(p)
                # per-file mtime_ns (round 13, ADVICE): names+sizes
                # alone let a regenerated corpus with identical file
                # names and byte sizes reuse a stale cached index
                parts.append(
                    f"{os.path.relpath(p, src)}:{fst.st_size}:{fst.st_mtime_ns}"
                )
        import hashlib

        listing = "_" + hashlib.md5("|".join(parts).encode()).hexdigest()[:10]
    fp = f"{st.st_size}_{st.st_mtime_ns}{listing}"
    sf_tag = f"{tag}_{os.path.basename(os.path.normpath(sf_dir))}"
    base = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".scratch", "gate_idx"
    )
    os.makedirs(base, exist_ok=True)
    for e in os.listdir(base):
        if e.startswith(f"{sf_tag}_") and e != f"{sf_tag}_{fp}":
            shutil.rmtree(os.path.join(base, e), ignore_errors=True)
    wd = os.path.join(base, f"{sf_tag}_{fp}")
    os.makedirs(wd, exist_ok=True)
    eng = Engine(spark, workdir=wd)
    eng.sources["tpch"] = sf_dir
    c = eng.db("tpch").collection(table)

    @contextlib.contextmanager
    def _build_lock():
        lf = open(os.path.join(wd, ".build_lock"), "a+")  # noqa: SIM115
        try:
            try:
                import fcntl

                fcntl.flock(lf, fcntl.LOCK_EX)
            except (ImportError, OSError):
                pass
            yield
        finally:
            lf.close()

    with _build_lock():
        try:
            d = c._load_search_index(index_name, warn_stale=False)
            # an analyzer upgrade (round 13: porter2 v1→v2) must sweep
            # cached text fixtures, or the gate silently measures the
            # scan fallback instead of the postings path
            fresh = all(
                d.get(k) == v for k, v in definition.items()
            ) and not c._analyzer_stale(d) and all(
                # a cached index whose materialized tables vanished
                # (scratch partially swept, or built under a mount
                # path that no longer exists) must rebuild, not crash
                os.path.isdir(v)
                for k, v in d.items()
                if k.endswith("_dir") and isinstance(v, str)
            ) and all(
                # list-valued layered dirs too (round 14, r13 ADVICE):
                # a partially swept scratch with a missing delta/tomb
                # dir must rebuild, not fail at read time
                os.path.isdir(e)
                for k, v in d.items()
                if k.endswith(("_deltas", "_tombs", "tombs"))
                and isinstance(v, (list, tuple))
                for e in v
                if isinstance(e, str)
            )
        except Exception:
            fresh = False
        if not fresh:
            c.create_search_index(index_name, dict(definition))
    return c


def _q_text_find(spark, sf_dir):
    # composite (50-gate cap): §2.2 legacy {$text: {$search: ...}} find
    # operator (accepted verbatim by the reference find surface,
    # db/interface.go:26) — OR'd terms + negation + residual equality —
    # plus the round-7 language-analysis legs: 'english' s-stems query
    # terms ('queries tables' matches docs containing query/table) and
    # the Mongo-default diacritic folding ('dáta' matches 'data').
    # Oracle twins state the analyzed form explicitly.
    from pyspark.sql import functions as F

    coll = _db(spark, sf_dir).collection("documents")
    base = (
        coll.find({
            "$text": {"$search": "spark -merge"},
            "lang": "en",
        })
        .select({"_id": 0, "doc_id": 1, "lang": 1})
        .to_df()
    )
    # one combined leg: 'queries' s-stems to 'query', 'dáta' folds to
    # 'data' (diacritic-insensitive default) — OR'd per $text semantics
    en = (
        coll.find({"$text": {"$search": "queries dáta",
                             "$language": "english"}})
        .to_df().agg(F.count("*").alias("en_n"))
    )
    # round 9 leg: the SAME english query answered from the INVERTED
    # POSTINGS index (pushed-down term point lookup + one bounded join
    # back — no corpus scan, no Python stemmer kernel at query time;
    # operators.ranking.text_match_postings).  The oracle computes the
    # identical count, so a postings/scan divergence hash-mismatches.
    # Round 11: the fixture index is CACHED under .scratch keyed by the
    # corpus fingerprint — steady bench measures query cost, not the
    # same Porter2 build over and over (the weighted leg below stays a
    # cold build for build-path coverage).
    c2 = _cached_index_coll(spark, sf_dir, "tix", "tix", {
        "kind": "bm25", "path": "text",
        "default_language": "english", "id_col": "doc_id",
        # this leg verifies the TERM postings path; the phrase legs
        # below build their own positions-bearing index — skipping
        # positions here keeps the in-gate english build lean
        "positions": False,
    })
    d = c2._fresh_bm25_index(c2.df())
    assert d is not None and d.get("postings_dir"), "postings must build"
    en_idx = (
        c2.find({"$text": {"$search": "queries dáta"}})
        .to_df().agg(F.count("*").alias("en_idx"))
    )
    # round 10 legs: $search phrase answered from the postings POSITION
    # arrays — exact adjacency plus an ordered slop=1 — on a separate
    # 'none'-language index (phrase terms are raw whitespace tokens;
    # the english index above can't serve them). The oracle recomputes
    # both counts with the regex twin of the position predicate, so a
    # positions/regex divergence hash-mismatches.
    c3 = _cached_index_coll(spark, sf_dir, "pix", "pix", {
        "kind": "bm25", "path": "text", "id_col": "doc_id",
    })
    d3 = c3._load_search_index("pix", warn_stale=False)
    assert d3.get("postings_positions"), "positions must build"
    ph = (
        c3.pipe([
            {"$search": {"phrase": {"query": "data column", "path": "text"},
                         "index": "pix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("phrase_n"))
    )
    ph_slop = (
        c3.pipe([
            {"$search": {"phrase": {"query": "data column", "path": "text",
                                    "slop": 1},
                         "index": "pix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("phrase_slop_n"))
    )
    # round 11 leg: multi-field WEIGHTED text index ({text: 2,
    # source: 1}) — the Mongo text-index shape previously rejected.
    # Match = any weighted field carries a query token; this leg runs
    # through the field-tagged postings (fresh index, cached like the
    # others). The oracle recomputes the per-field token-match union.
    c4 = _cached_index_coll(spark, sf_dir, "wix", "wix", {
        "kind": "bm25", "weights": {"text": 2, "source": 1},
        "id_col": "doc_id", "positions": True,
    })
    w_n = (
        c4.find({"$text": {"$search": "spark src7"}})
        .to_df().agg(F.count("*").alias("w_n"))
    )
    # round 12 legs: the SAME weighted index serves SINGLE-path $search
    # operators through its field-filtered view (WHERE field = 'text'
    # over the field-tagged postings/positions) — text count + exact
    # phrase count; the oracle recomputes both over the one field.
    w1_n = (
        c4.pipe([
            {"$search": {"text": {"query": "spark", "path": "text"},
                         "index": "wix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("w1_n"))
    )
    wp_n = (
        c4.pipe([
            {"$search": {"phrase": {"query": "data column", "path": "text"},
                         "index": "wix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("wp_n"))
    )
    # round 13 legs: MULTI-path phrase (path: [text, source]) served
    # from the same weighted index's field-tagged positions — per-field
    # adjacency predicate, cross-field OR; wms_n's single-term phrase
    # only the second field can satisfy, so a broken field union
    # hash-mismatches. Oracle twins recompute the regex OR per field.
    wmp_n = (
        c4.pipe([
            {"$search": {"phrase": {"query": "data column",
                                    "path": ["text", "source"]},
                         "index": "wix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("wmp_n"))
    )
    wms_n = (
        c4.pipe([
            {"$search": {"phrase": {"query": "src7",
                                    "path": ["text", "source"]},
                         "index": "wix"}},
            {"$project": {"doc_id": 1}},
        ]).to_df().agg(F.count("*").alias("wms_n"))
    )
    # the gate's one COLD index build (build-path coverage never goes
    # stale while the fixtures above stay cached): a 200-doc build
    # driving create_search_index end-to-end every run — stats, term
    # table, postings, id sidecar. Deliberately minimal ('none'
    # analyzer, no positions): tiny builds are JOB-COUNT bound, and
    # the heavier english/raw/weighted builds ARE driver-gated cold
    # whenever the corpus fingerprint rolls (each driver round
    # regenerates testdata, emptying the cache).
    eng5 = _mut_db(spark, sf_dir, "coldix")
    c5 = eng5.db("mut").collection("docs")
    c5._rewrite(eng5.db("tpch").collection("documents").df().limit(200))
    c5.create_search_index("coldix", {
        "kind": "bm25", "path": "text", "id_col": "doc_id",
        "positions": False,
    })
    d5 = c5._load_search_index("coldix", warn_stale=False)
    assert d5.get("postings_dir") and d5.get("ids_dir")
    # one broadcast instead of nine (round 14, guide §2.4/§2.6): the
    # nine single-row count legs union into ONE frame (their stages run
    # concurrently inside a single broadcast-build job where the chained
    # crossJoins paid nine sequential broadcast jobs) and pivot back to
    # the same one-row (en_n..wms_n) schema — identical columns, types,
    # and values, one Exchange for all legs
    from functools import reduce

    legs = [
        ("en_n", en), ("en_idx", en_idx), ("phrase_n", ph),
        ("phrase_slop_n", ph_slop), ("w_n", w_n), ("w1_n", w1_n),
        ("wp_n", wp_n), ("wmp_n", wmp_n), ("wms_n", wms_n),
    ]
    tagged = reduce(
        lambda a, b: a.unionByName(b),
        [
            leg.select(
                F.lit(name).alias("__leg"), F.col(name).alias("__v")
            )
            for name, leg in legs
        ],
    )
    wide = (
        tagged.groupBy()
        .pivot("__leg", [name for name, _ in legs])
        .agg(F.first("__v"))
        .select(*[name for name, _ in legs])
    )
    return base.crossJoin(F.broadcast(wide))


def _q_upsert_paths(spark, sf_dir):
    # §2.4 upsert: matched ⇒ update, unmatched ⇒ synthesized insert
    # (hasDollarKey dispatch, db/wrapper.go:146-165)
    eng = _mut_db(spark, sf_dir, "ups")
    coll = eng.db("mut").collection("nation")
    coll._rewrite(eng.db("tpch").collection("nation").df())
    coll.upsert({"n_nationkey": 0}, {"$set": {"n_name": "NATION_ZERO"}})
    coll.upsert({"n_nationkey": 99}, {"$set": {"n_name": "NATION_NEW", "n_regionkey": 9}})
    return coll.df().select("n_nationkey", "n_name", "n_regionkey")


def _q_bulk_mixed(spark, sf_dir):
    # §2.4 Bulk: heterogeneous batch (update_all + remove_all + insert)
    # applied in queue order as ONE rewrite (db/wrapper.go:246-344)
    eng = _mut_db(spark, sf_dir, "blk")
    coll = eng.db("mut").collection("nation")
    coll._rewrite(eng.db("tpch").collection("nation").df())
    (
        coll.bulk()
        .update_all({"n_regionkey": 1}, {"$inc": {"n_regionkey": 10}})
        .remove_all({"n_nationkey": {"$gte": 20}})
        .insert({"n_nationkey": 50, "n_name": "NATION_X", "n_regionkey": 5})
        .run()
    )
    return coll.df().select("n_nationkey", "n_name", "n_regionkey")


def _q_merge_into_summary(spark, sf_dir):
    # §2.5/2.6 $merge: group → MERGE into a pre-seeded target
    # (whenMatched=replace keeps unmatched base rows, inserts new keys)
    from pyspark.sql import functions as F

    eng = _mut_db(spark, sf_dir, "mrg")
    mut = eng.db("mut")
    orders = mut.collection("orders")
    orders._rewrite(eng.db("tpch").collection("orders").df())
    import pandas as pd

    # Arrow-local seed: the list form parallelizes one row across
    # defaultParallelism pickled slices (32 near-empty files per
    # version; a coalesce over those slices serializes 32 Python-runner
    # round-trips — measured seconds), while the pandas form ships as
    # Arrow batches in as many slices as rows
    seed = spark.createDataFrame(
        pd.DataFrame([{"_id": "ZZ", "n": -1, "total": 0.0}]),
        "_id string, n long, total double",
    )
    mut.collection("prio_summary")._rewrite(seed)
    orders.pipe(
        [
            {"$group": {"_id": "$o_orderpriority", "n": {"$sum": 1},
                        "total": {"$sum": "$o_totalprice"}}},
            {"$merge": {"into": "prio_summary"}},
        ]
    ).all()
    out = mut.collection("prio_summary").df()
    return out.select("_id", "n", F.round("total", 2).alias("total"))


def _q_line_dedup_clean(spark, sf_dir):
    # C4-style line cleaning + CCNet corpus-wide line dedup, end to end:
    # lines are constructed deterministically from the word-soup corpus
    # (replace ' table ' with newline — mirrored verbatim in the
    # oracle), cleaned (≥3-word lines), then every normalized line is
    # kept only at its first (doc_id, position) occurrence across the
    # corpus and documents are reassembled. dedup_digest pins the exact
    # reassembled text per document.
    from pyspark.sql import functions as F

    from anser_spark.operators.corpus import clean_lines, dedup_lines

    docs = _db(spark, sf_dir).collection("documents").df()
    lined = docs.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" table "), F.lit("\n")).alias("text"),
    )
    cleaned = clean_lines(lined, min_words=3)
    dd = dedup_lines(
        cleaned.select(
            "doc_id",
            F.col("n_lines").alias("n_input_lines"),
            F.col("n_kept_lines").alias("n_quality_lines"),
            F.col("clean_text").alias("text"),
        )
    )
    return dd.select(
        "doc_id",
        F.col("n_input_lines").cast("long").alias("n_lines"),
        F.col("n_quality_lines").cast("long").alias("n_kept_quality"),
        F.col("n_kept_lines").cast("long").alias("n_kept_dedup"),
        F.md5(F.col("dedup_text")).alias("dedup_digest"),
    )


def _q_change_stream_cdc(spark, sf_dir):
    # Change streams (Mongo watch()/$changeStream, batch form): version
    # retention + row-level diff → insert/update/delete events with
    # pre+post images. Endpoint semantics: a row updated then deleted
    # emits ONE delete whose pre-image is the watch-start state
    # (intermediate versions collapse — documented in watch()).
    from pyspark.sql import functions as F

    eng = _mut_db(spark, sf_dir, "cdc")
    coll = eng.db("mut").collection("nation")
    coll._rewrite(eng.db("tpch").collection("nation").df())
    coll.set_retention(10)
    coll.update_all({"n_regionkey": 1}, {"$inc": {"n_regionkey": 10}})
    coll.remove_all({"n_nationkey": {"$gte": 20}})
    coll.insert({"n_nationkey": 50, "n_name": "NATION_X", "n_regionkey": 5})
    ev = coll.watch("v1", key="n_nationkey")
    jget = F.get_json_object
    return ev.select(
        F.col("operationType").alias("op"),
        F.col("documentKey").cast("long").alias("n_nationkey"),
        jget("fullDocumentBeforeChange", "$.n_name").alias("pre_name"),
        jget("fullDocumentBeforeChange", "$.n_regionkey").cast("long").alias("pre_regionkey"),
        jget("fullDocument", "$.n_name").alias("post_name"),
        jget("fullDocument", "$.n_regionkey").cast("long").alias("post_regionkey"),
    )


def _q_densify_fill(spark, sf_dir):
    # $densify (sequence+explode scaffold, anti-join) + $fill locf
    # (window last ignorenulls) — gap-filling over a keyed series
    return (
        _db(spark, sf_dir)
        .collection("nation")
        .pipe(
            [
                {"$match": {"n_nationkey": {"$not": {"$mod": [3, 0]}}}},
                {"$project": {"n_nationkey": 1, "n_name": 1}},
                {"$densify": {"field": "n_nationkey",
                              "range": {"step": 1, "bounds": "full"}}},
                {"$fill": {"sortBy": {"n_nationkey": 1},
                           "output": {"n_name": {"method": "locf"}}}},
            ]
        )
        .to_df()
    )


def _q_window_range_30d(spark, sf_dir):
    # $setWindowFields value-based (range) window: 30-day trailing
    # revenue per priority — native rangeBetween on epoch-millis
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {
                    "$setWindowFields": {
                        "partitionBy": "$o_orderpriority",
                        "sortBy": {"o_orderdate": 1},
                        "output": {"rev30": {"$sum": "$o_totalprice",
                                             "window": {"range": [-30, 0], "unit": "day"}}},
                    }
                },
                {"$project": {"o_orderkey": 1, "o_orderpriority": 1,
                              "rev30": {"$round": ["$rev30", 2]}}},
            ]
        )
        .to_df()
    )


def _q_text_quality_metrics(spark, sf_dir):
    # M7 text quality: the SQL-expressible component columns get a full
    # value-hash oracle (the composite heuristic stays rows-only)
    from anser_spark.operators.text import quality_metrics

    docs = _db(spark, sf_dir).collection("documents").df()
    # n_chars rides along so this gate also covers the plain
    # token/char-count surface (absorbed text_token_count gate)
    return quality_metrics(docs).select(
        "doc_id", "n_chars", "n_tokens", "punct_ratio", "mean_word_len",
        "length_score", "en_stop_hits",
    )


def _q_tpch_q7_shape(spark, sf_dir):
    # TPC-H Q7 shape: 5 fused lookup+unwind joins incl. nation twice
    # (alias-free via struct columns), $or pair filter, year extraction
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 12, 31)
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$match": {"l_shipdate": {"$gte": lo, "$lte": hi}}},
                {"$lookup": {"from": "supplier", "localField": "l_suppkey",
                             "foreignField": "s_suppkey", "as": "s"}},
                {"$unwind": "$s"},
                {"$lookup": {"from": "orders", "localField": "l_orderkey",
                             "foreignField": "o_orderkey", "as": "o"}},
                {"$unwind": "$o"},
                {"$lookup": {"from": "customer", "localField": "o.o_custkey",
                             "foreignField": "c_custkey", "as": "c"}},
                {"$unwind": "$c"},
                {"$lookup": {"from": "nation", "localField": "s.s_nationkey",
                             "foreignField": "n_nationkey", "as": "n1"}},
                {"$unwind": "$n1"},
                {"$lookup": {"from": "nation", "localField": "c.c_nationkey",
                             "foreignField": "n_nationkey", "as": "n2"}},
                {"$unwind": "$n2"},
                {"$match": {"$or": [
                    {"n1.n_name": "NATION_1", "n2.n_name": "NATION_2"},
                    {"n1.n_name": "NATION_2", "n2.n_name": "NATION_1"},
                ]}},
                {"$group": {
                    "_id": {"sn": "$n1.n_name", "cn": "$n2.n_name",
                            "yr": {"$year": "$l_shipdate"}},
                    "revenue": {"$sum": {"$multiply": ["$l_extendedprice",
                                                        {"$subtract": [1, "$l_discount"]}]}},
                }},
                {"$project": {"_id": 0, "supp_nation": "$_id.sn",
                              "cust_nation": "$_id.cn", "l_year": "$_id.yr",
                              "revenue": {"$round": ["$revenue", 4]}}},
            ]
        )
        .to_df()
    )


def _q_tpch_q10_shape(spark, sf_dir):
    # TPC-H Q10 shape: returned-item revenue per customer, top 20
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$match": {"o_orderdate": {"$gte": lo, "$lt": hi}}},
                {"$lookup": {"from": "lineitem", "localField": "o_orderkey",
                             "foreignField": "l_orderkey", "as": "l"}},
                {"$unwind": "$l"},
                {"$match": {"l.l_returnflag": "R"}},
                {"$lookup": {"from": "customer", "localField": "o_custkey",
                             "foreignField": "c_custkey", "as": "c"}},
                {"$unwind": "$c"},
                {"$lookup": {"from": "nation", "localField": "c.c_nationkey",
                             "foreignField": "n_nationkey", "as": "n"}},
                {"$unwind": "$n"},
                {"$group": {
                    "_id": {"ck": "$c.c_custkey", "cn": "$c.c_name",
                            "ab": "$c.c_acctbal", "nn": "$n.n_name"},
                    "revenue": {"$sum": {"$multiply": ["$l.l_extendedprice",
                                                        {"$subtract": [1, "$l.l_discount"]}]}},
                }},
                {"$project": {"_id": 0, "c_custkey": "$_id.ck", "c_name": "$_id.cn",
                              "c_acctbal": "$_id.ab", "n_name": "$_id.nn",
                              # terms have exactly 4 decimal digits (2-dec
                              # price × 2-dec discount): round-4 is exact,
                              # round-2 can sit ON a half-cent and tip
                              # either way per float summation order
                              "revenue": {"$round": ["$revenue", 4]}}},
                {"$sort": {"revenue": -1, "c_custkey": 1}},
                {"$limit": 20},
            ]
        )
        .to_df()
    )


def _q_session_windows(spark, sf_dir):
    # §2.8 sessionization: F.session_window batch path (identical code
    # runs over readStream with a watermark — the streaming twin is
    # pytest-covered; this gate hash-checks the session assignment,
    # bounds, and per-session aggregates against lag-based SQL)
    from anser_spark.streaming.apm import session_stats

    events = _db(spark, sf_dir).collection("events").df()
    return session_stats(events, gap="4 hours")


def _q_media_plumbing(spark, sf_dir):
    # M7 multimodal: opaque binary payloads (utf-8 document bytes stand
    # in for media — codecs aren't in this environment) through the
    # JVM-side plumbing: metadata attach (n_bytes, sha) + frame-sampling
    # grid. Everything here is exactly SQL-expressible → full oracle.
    from pyspark.sql import functions as F

    from anser_spark.operators.multimodal import attach_media_metadata, sample_video_frames

    docs = _db(spark, sf_dir).collection("documents").df()
    # hashing + frame explode over the bench's one-file scan = 1 task;
    # moderate fan-out (cores/4 — same A/B rationale as the
    # decontamination/sequence_packing gates) spreads it without
    # starving the Arrow batches. No-op on values (re-grouped by id).
    fan = max(1, spark.sparkContext.defaultParallelism // 4)
    if fan > 1:
        docs = docs.repartition(fan, "doc_id")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") * F.lit(50)).cast("long").alias("duration_ms"),
    )
    meta = attach_media_metadata(media)
    frames = sample_video_frames(meta, every_ms=2000)
    per = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return meta.select("media_id", "n_bytes", "payload_sha").join(per, "media_id")


def _q_media_features(spark, sf_dir):
    # M7 multimodal feature extraction: Arrow-batched mapInPandas with a
    # deterministic stub decode (sha256(payload) bytes / 255 as float32).
    # The features unpack to scalar doubles so the DuckDB oracle can
    # reproduce them exactly: float32 rounding happens on BOTH sides
    # (Arrow array<float> here, CAST(.. AS FLOAT) there) before the
    # exact widening to double — bit-identical values.
    from pyspark.sql import functions as F

    from anser_spark.operators.multimodal import extract_image_features

    docs = _db(spark, sf_dir).collection("documents").df()
    # same moderate fan-out as the plumbing leg: the Arrow feature
    # stage runs one task on the one-file scan otherwise
    fan = max(1, spark.sparkContext.defaultParallelism // 4)
    if fan > 1:
        docs = docs.repartition(fan, "doc_id")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    feats = extract_image_features(media)
    return feats.select(
        "media_id",
        *[F.col("features")[i].cast("double").alias(f"f{i}") for i in range(8)],
    )


def _q_geo_near(spark, sf_dir):
    # $geoNear over synthesized [lon, lat] points: haversine as pure
    # Column trig (mean-radius sphere shared with the DuckDB oracle),
    # maxDistance filter + distanceMultiplier, nearest-first sort
    return (
        _db(spark, sf_dir)
        .collection("customer")
        .pipe(
            [
                {"$project": {
                    "c_custkey": 1,
                    "location": [
                        {"$subtract": [
                            {"$mod": [{"$multiply": ["$c_custkey", 7]}, 360]},
                            180]},
                        {"$subtract": [
                            {"$mod": [{"$multiply": ["$c_custkey", 13]}, 170]},
                            85]},
                    ],
                }},
                {"$geoNear": {
                    "near": [10.0, 20.0],
                    "distanceField": "dist_km",
                    "distanceMultiplier": 0.001,
                    "maxDistance": 3_000_000,
                }},
                {"$project": {"c_custkey": 1,
                              "dist_km": {"$round": ["$dist_km", 3]}}},
            ]
        )
        .to_df()
    )


def _q_heavy_hitters(spark, sf_dir):
    # exact top-k frequent values (two-level agg; only (value,count)
    # pairs shuffle) — the verification path for frequency sketches
    from pyspark.sql import functions as F

    from anser_spark.operators.sketches import heavy_hitters

    events = _db(spark, sf_dir).collection("events").df()
    keyed = events.select(F.get_json_object("props", "$.k").alias("kv"))
    return heavy_hitters(keyed, "kv", k=10)


def _q_sketches(spark, sf_dir):
    # Composite sketch gate (frees a slot under the 50-gate cap):
    # heavy hitters + HLL error-bound legs union'd with a kind tag.
    # Schema: (kind, key, n, ok) — heavy rows carry exact top-k counts
    # (ok literal true); hll rows carry exact distincts + the ≤5%
    # sketch-error contract (see _q_hll_distinct's determinism note).
    from pyspark.sql import functions as F

    heavy = _q_heavy_hitters(spark, sf_dir).select(
        F.lit("heavy").alias("kind"),
        F.col("value").alias("key"),
        F.col("freq").cast("long").alias("n"),
        F.lit(True).alias("ok"),
    )
    hll = _q_hll_distinct(spark, sf_dir).select(
        F.lit("hll").alias("kind"),
        F.col("event_type").alias("key"),
        F.col("n_exact").alias("n"),
        F.col("within_5pct").alias("ok"),
    )
    return heavy.unionByName(hll)


def _q_hll_distinct(spark, sf_dir):
    # mergeable HLL sketches per event type + lossless union, verified
    # as an ERROR-BOUND gate: the DataSketches estimate itself has no
    # DuckDB twin (different sketch internals), but |est - exact| ≤
    # 5%·exact is a checkable contract — at lgConfigK=12 the sketch's
    # rsd is ~1.6%, and the sketch is DETERMINISTIC for fixed input
    # (keyed hash, no RNG), so a bound that holds once holds every run.
    # Emits (event_type, n_exact, within_5pct): DuckDB twins n_exact
    # with exact count(DISTINCT) and within_5pct with literal true —
    # a full value-hash oracle over every emitted column. merge == direct
    # stays asserted in tests/test_sketches.py.
    from pyspark.sql import functions as F

    from anser_spark.operators.sketches import hll_distinct, hll_merge_estimate

    events = _db(spark, sf_dir).collection("events").df()
    per_type = hll_distinct(events, "user_id", by="event_type")
    merged = hll_merge_estimate(per_type).selectExpr(
        "'__all__' AS event_type", "distinct_est"
    )
    est = per_type.select("event_type", "distinct_est").unionByName(merged)
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    ).unionByName(
        events.agg(F.count_distinct("user_id").alias("n_exact")).select(
            F.lit("__all__").alias("event_type"), "n_exact"
        )
    )
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.abs(F.col("distinct_est") - F.col("n_exact"))
            <= F.lit(0.05) * F.col("n_exact")
        ).alias("within_5pct"),
    )


def _q_asof_join_events(spark, sf_dir):
    # as-of join (union-and-carry: ONE shuffle + ordered window, no
    # nested-loop) — each click gets the most recent error's value for
    # the same user; oracle is DuckDB's native ASOF LEFT JOIN
    from pyspark.sql import functions as F

    from anser_spark.operators.temporal import asof_join

    events = _db(spark, sf_dir).collection("events").df()
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    errors = events.where(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join(clicks, errors, on="ts", by="user_id")
    return out.select(
        "event_id", "user_id", F.col("value").alias("last_err_value")
    )


def _q_interval_join_events(spark, sf_dir):
    # range/interval join via time-bucket equi-join (hash-joinable; no
    # BroadcastNestedLoopJoin) — clicks landing inside 2-hour windows
    # opened by each error of the same user
    from pyspark.sql import functions as F

    from anser_spark.operators.temporal import interval_join

    events = _db(spark, sf_dir).collection("events").df()
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    windows = events.where(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("t0"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("t1"),
    )
    out = interval_join(clicks, windows, "ts", "t0", "t1",
                        by="user_id", bucket="1 hour")
    return out.select("event_id", "user_id", "win_id")


def _q_group_top_bottom(spark, sf_dir):
    # $top/$bottom/$topN accumulators (Mongo 5.2) — sorted-struct
    # collect + slice, distributed partial aggregation
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$group": {
                    "_id": "$o_orderpriority",
                    "top_price": {"$top": {
                        "output": "$o_totalprice", "sortBy": {"o_orderkey": 1}}},
                    "bot_price": {"$bottom": {
                        "output": "$o_totalprice", "sortBy": {"o_orderkey": 1}}},
                    "top3": {"$topN": {
                        "output": "$o_totalprice", "sortBy": {"o_orderkey": 1},
                        "n": 3}},
                }},
                {"$project": {
                    "_id": 0,
                    "prio": "$_id",
                    "top_price": 1,
                    "bot_price": 1,
                    "t1": {"$arrayElemAt": ["$top3", 0]},
                    "t2": {"$arrayElemAt": ["$top3", 1]},
                    "t3": {"$arrayElemAt": ["$top3", 2]},
                }},
            ]
        )
        .to_df()
    )


def _q_group_median_pct(spark, sf_dir):
    # $median/$percentile accumulators — Spark exact percentile (linear
    # interpolation, same as DuckDB quantile_cont; Mongo's own are
    # t-digest approximations, documented divergence)
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$group": {
                    "_id": "$l_returnflag",
                    "med": {"$median": {
                        "input": "$l_quantity", "method": "approximate"}},
                    "pct": {"$percentile": {
                        "input": "$l_quantity", "p": [0.25, 0.75],
                        "method": "approximate"}},
                }},
                {"$project": {
                    "_id": 0,
                    "flag": "$_id",
                    "med": 1,
                    "p25": {"$arrayElemAt": ["$pct", 0]},
                    "p75": {"$arrayElemAt": ["$pct", 1]},
                }},
            ]
        )
        .to_df()
    )


def _q_redact_levels(spark, sf_dir):
    # $redact over a two-level document built by $project: root-level
    # $$PRUNE drops rows, nested $$PRUNE nulls the embedded doc — all
    # pure Column expressions (where + struct rebuild), no UDFs
    return (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe(
            [
                {"$project": {
                    "o_orderkey": 1,
                    "level": {"$cond": [
                        {"$eq": ["$o_orderstatus", "F"]}, "secret", "public"]},
                    "sub": {
                        "level": {"$cond": [
                            {"$gt": ["$o_totalprice", 150000]}, "secret", "public"]},
                        "price": "$o_totalprice",
                    },
                }},
                {"$redact": {"$cond": [
                    {"$eq": ["$level", "secret"]}, "$$PRUNE", "$$DESCEND"]}},
                {"$project": {
                    "o_orderkey": 1,
                    "sub_price": {"$ifNull": ["$sub.price", -1.0]},
                }},
            ]
        )
        .to_df()
    )


def _q_bucket_auto(spark, sf_dir):
    # $bucketAuto exact path (ntile over a unique key → deterministic
    # boundaries both engines agree on); the >2M-row input path switches
    # to approx-quantile boundaries (no SQL oracle there by design)
    return (
        _db(spark, sf_dir)
        .collection("customer")
        .pipe(
            [
                {"$bucketAuto": {
                    "groupBy": "$c_custkey",
                    "buckets": 7,
                    "output": {"n": {"$sum": 1}, "sum_bal": {"$sum": "$c_acctbal"}},
                }},
                {"$project": {"_id": 0, "lo": "$_id.min", "hi": "$_id.max",
                              "n": 1, "sum_bal": {"$round": ["$sum_bal", 2]}}},
            ]
        )
        .to_df()
    )


def _q_repetition_metrics(spark, sf_dir):
    # Gopher-style repetition filters: unigram dup fraction is pure
    # Column HOFs; top-bigram frequency is explode + two-level groupBy
    # (one wide shuffle with map-side partial agg) — never O(len^2) per
    # document, so long documents are safe at scale
    from anser_spark.operators.text import repetition_metrics

    docs = _db(spark, sf_dir).collection("documents").df()
    return repetition_metrics(docs)


def _q_pii_scrub(spark, sf_dir):
    # PII redaction + audit counts over text seeded with deterministic
    # synthetic PII (the raw corpus has none) — chained regexp_replace,
    # patterns restricted to Java-regex/RE2-identical syntax so the
    # DuckDB twin is exact
    from pyspark.sql import functions as F

    from anser_spark.operators.text import pii_metrics, scrub_pii

    docs = _db(spark, sf_dir).collection("documents").df()
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 10.0."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".25 tel 555-867-5309"),
        ).alias("text"),
    )
    return scrub_pii(pii_metrics(seeded), out="scrubbed").select(
        "doc_id", "scrubbed", "n_email", "n_ipv4", "n_phone"
    )


# ---------------------------------------------------------------------------
# Composite gates. The external driver verifies at most 50 queries per
# round (CORRECTNESS_r02/r03 both truncate at exactly 50 in dict order),
# so related operators share one gate: each composite below joins or
# unions the outputs of the underlying single-operator queries, keeping
# every column oracle-verified while staying under the cap.
# ---------------------------------------------------------------------------


def _q_find_sort_skip_limit(spark, sf_dir):
    # §2.1/2.3 in one find-path gate: filter + getSort keys + skip +
    # limit + projection (db/wrapper.go:452-481)
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .find({"l_quantity": {"$gt": 45.0}})
        .sort("-l_extendedprice", "l_orderkey", "l_linenumber")
        .skip(20)
        .limit(50)
        .select({"l_orderkey": 1, "l_linenumber": 1, "l_quantity": 1,
                 "l_extendedprice": 1})
        .to_df()
    )


def _q_project_json_expressions(spark, sf_dir):
    # §2.5 expression language + dynamic-schema JSON tail in one gate:
    # the $project pipeline carries props through, then get_json_object
    # extracts the dynamic field — ONE scan, no self-join
    from pyspark.sql import functions as F

    base = (
        _db(spark, sf_dir)
        .collection("events")
        .pipe(
            [
                {"$match": {"event_type": {"$ne": "view"}}},
                {
                    "$project": {
                        "event_id": 1,
                        "yr": {"$year": "$ts"},
                        "etype": {"$toUpper": "$event_type"},
                        "bucket": {
                            "$cond": {
                                "if": {"$gte": ["$value", 50.0]},
                                "then": "high",
                                "else": "low",
                            }
                        },
                        "val2": {"$round": [{"$multiply": ["$value", 2.0]}, 4]},
                        "props": 1,
                    }
                },
            ]
        )
        .to_df()
    )
    return (
        base.withColumn("k_value", F.get_json_object("props", "$.k"))
        .where(F.col("k_value").isNotNull())
        .drop("props")
    )


def _q_window_rank_shift(spark, sf_dir):
    # $setWindowFields with BOTH $documentNumber and $shift in one
    # output spec — rank and lead share a single window sort
    return (
        _db(spark, sf_dir)
        .collection("events")
        .pipe(
            [
                {"$match": {"user_id": {"$lt": 10}}},
                {
                    "$setWindowFields": {
                        "partitionBy": "$user_id",
                        "sortBy": {"ts": 1, "event_id": 1},
                        "output": {
                            "rn": {"$documentNumber": {}},
                            "next_event": {"$shift": {"output": "$event_type", "by": 1}},
                        },
                    }
                },
                {"$project": {"event_id": 1, "user_id": 1, "rn": 1, "next_event": 1}},
            ]
        )
        .to_df()
    )


def _q_group_rank_stats_per_flag(spark, sf_dir):
    # $top/$bottom/$topN + $median/$percentile accumulators (Mongo 5.2/
    # 7.0) in ONE $group — sorted-struct slice and exact interpolated
    # percentiles share the per-flag partial aggregation
    return (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$group": {
                    "_id": "$l_returnflag",
                    "top_price": {"$top": {
                        "output": "$l_extendedprice",
                        "sortBy": {"l_orderkey": 1, "l_linenumber": 1, "l_extendedprice": 1}}},
                    "bot_price": {"$bottom": {
                        "output": "$l_extendedprice",
                        "sortBy": {"l_orderkey": 1, "l_linenumber": 1, "l_extendedprice": 1}}},
                    "top3": {"$topN": {
                        "output": "$l_extendedprice",
                        "sortBy": {"l_orderkey": 1, "l_linenumber": 1, "l_extendedprice": 1},
                        "n": 3}},
                    "med": {"$median": {
                        "input": "$l_quantity", "method": "approximate"}},
                    "pct": {"$percentile": {
                        "input": "$l_quantity", "p": [0.25, 0.75],
                        "method": "approximate"}},
                }},
                {"$project": {
                    "_id": 0,
                    "flag": "$_id",
                    "top_price": 1,
                    "bot_price": 1,
                    "t1": {"$arrayElemAt": ["$top3", 0]},
                    "t2": {"$arrayElemAt": ["$top3", 1]},
                    "t3": {"$arrayElemAt": ["$top3", 2]},
                    "med": 1,
                    "p25": {"$arrayElemAt": ["$pct", 0]},
                    "p75": {"$arrayElemAt": ["$pct", 1]},
                }},
            ]
        )
        .to_df()
    )


def _q_group_rank_stats(spark, sf_dir):
    # per-flag N-accumulator stats (above) CROSS-JOINed with a GLOBAL
    # (_id: None) $topN/$minN/$maxN group — the round-7 bounded-state
    # path: salt-only window prefilter, never a whole-dataset
    # collect_list buffer. The global row is a 1-row broadcast.
    from pyspark.sql import functions as F

    per_flag = _q_group_rank_stats_per_flag(spark, sf_dir)
    glob = (
        _db(spark, sf_dir)
        .collection("lineitem")
        .pipe(
            [
                {"$group": {
                    "_id": None,
                    "gtop3": {"$topN": {
                        "output": "$l_extendedprice",
                        "sortBy": {"l_orderkey": 1, "l_linenumber": 1,
                                   "l_extendedprice": 1},
                        "n": 3}},
                    "gmin2": {"$minN": {"input": "$l_extendedprice", "n": 2}},
                    "gmax1": {"$maxN": {"input": "$l_extendedprice", "n": 1}},
                }},
                {"$project": {
                    "_id": 0,
                    "g1": {"$arrayElemAt": ["$gtop3", 0]},
                    "g2": {"$arrayElemAt": ["$gtop3", 1]},
                    "g3": {"$arrayElemAt": ["$gtop3", 2]},
                    "gm1": {"$arrayElemAt": ["$gmin2", 0]},
                    "gm2": {"$arrayElemAt": ["$gmin2", 1]},
                    "gx1": {"$arrayElemAt": ["$gmax1", 0]},
                }},
            ]
        )
        .to_df()
    )
    return per_flag.crossJoin(F.broadcast(glob))


def _q_temporal_joins(spark, sf_dir):
    # as-of join + interval join in one gate: every click carries the
    # most recent error's value (as-of) AND the ids of the 2-hour error
    # windows containing it (interval; NULL when none)
    asof = _q_asof_join_events(spark, sf_dir)
    intervals = _q_interval_join_events(spark, sf_dir).select("event_id", "win_id")
    return asof.join(intervals, "event_id", "left")


def _q_corpus_splits(spark, sf_dir):
    # corpus management in one gate: every document's deterministic
    # md5-bucket train/val/test assignment, its per-language
    # stratified-sample membership (NULL lang = dropped by the
    # sampler), its global-shuffle key (reproducible training-order
    # permutation — sorting by it IS the shuffle), and its
    # quality-weighted Bernoulli-sample membership (round 5:
    # weighted_sample with weight = min(1, len(text)/2000), rate 0.8 —
    # inclusion probability min(1, rate·w) on an independent md5 coin,
    # exactly integer-reproducible in SQL)
    from pyspark.sql import functions as F

    from anser_spark.operators.corpus import weighted_sample, with_shuffle_key

    strat = _q_stratified_sample(spark, sf_dir).withColumnRenamed("lang", "strat_lang")
    split = _q_hash_split(spark, sf_dir).join(strat, "doc_id", "left")
    docs = _db(spark, sf_dir).collection("documents").df().select("doc_id", "text")
    w = F.least(F.lit(1.0), F.length("text") / F.lit(2000.0))
    kept = weighted_sample(
        docs.withColumn("__w", w), "__w", rate=0.8, salt="ws"
    ).select("doc_id", F.lit(True).alias("ws_kept"))
    return (
        with_shuffle_key(split, salt="epoch0")
        .join(kept, "doc_id", "left")
        .withColumn("ws_kept", F.coalesce(F.col("ws_kept"), F.lit(False)))
    )


def _q_bucket_stages(spark, sf_dir):
    # $bucket (explicit boundaries) + $bucketAuto (even-split ntile) +
    # (round 8) a $bucket-with-$topN-output leg — the bounded
    # N-accumulator path through $bucket, where buckets are few and
    # huge by construction — in one gate, aligned on
    # (kind, lo, hi, n, metric)
    from pyspark.sql import functions as F

    explicit_hi = {0: 100000, 100000: 200000, 200000: 300000,
                   300000: 400000, 400000: 700000}
    hi_map = F.create_map(*[F.lit(x) for kv in explicit_hi.items() for x in kv])
    explicit = _q_bucket_orders(spark, sf_dir).select(
        F.lit("explicit").alias("kind"),
        F.col("_id").cast("double").alias("lo"),
        F.element_at(hi_map, F.col("_id").cast("int")).cast("double").alias("hi"),
        F.col("n").cast("long").alias("n"),
        F.col("avg_price").cast("double").alias("metric"),
    )
    auto = _q_bucket_auto(spark, sf_dir).select(
        F.lit("auto").alias("kind"),
        F.col("lo").cast("double").alias("lo"),
        F.col("hi").cast("double").alias("hi"),
        F.col("n").cast("long").alias("n"),
        F.col("sum_bal").cast("double").alias("metric"),
    )
    # metric = sum of the top-2 prices per bucket: deterministic under
    # ties (the top-2 VALUE multiset is unique even when row choice
    # isn't), so the hash gate stays stable
    topn = (
        _db(spark, sf_dir)
        .collection("orders")
        .pipe([
            {"$bucket": {
                "groupBy": "$o_totalprice",
                "boundaries": [0, 100000, 200000, 300000, 400000, 700000],
                "output": {
                    "n": {"$sum": 1},
                    "top2": {"$topN": {
                        "n": 2,
                        "sortBy": {"o_totalprice": -1},
                        "output": "$o_totalprice",
                    }},
                },
            }},
        ])
        .to_df()
        .select(
            F.lit("topn").alias("kind"),
            F.col("_id").cast("double").alias("lo"),
            F.element_at(hi_map, F.col("_id").cast("int")).cast("double").alias("hi"),
            F.col("n").cast("long").alias("n"),
            F.round(
                F.aggregate("top2", F.lit(0.0), lambda a, x: a + x), 2
            ).alias("metric"),
        )
    )
    return explicit.unionByName(auto).unionByName(topn)


def _q_hybrid_search(spark, sf_dir):
    # M7 hybrid retrieval in one gate: BM25 text leg (constant-width
    # stats aggregate → pure-Column scoring scan → TakeOrdered) + a
    # $vectorSearch pipeline-stage vector leg (Atlas cosine
    # normalization (1+cos)/2, TakeOrdered) fused by weighted
    # reciprocal-rank (the $rankFusion combiner). Every rank and the
    # RRF sum are exactly SQL-reproducible; the fused score is
    # integer-scaled (decimal rounding of doubles differs between
    # engines at the last digit; round-to-integer agrees).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from anser_spark.operators.ranking import rank_fusion

    db = _db(spark, sf_dir)
    # text leg runs through the $search PIPELINE STAGE (round 5: the
    # full operator compiler — matching-docs-only, inline
    # bm25_score_expr, single scan), not the bm25_top_k helper: the
    # stage's BM25 math is expression-identical, so this puts the
    # $search surface itself under the driver's value-hash gate.
    text = (
        db.collection("documents")
        .pipe([
            {"$search": {"text": {"query": "data model training", "path": "text"}}},
            {"$limit": 20},
        ])
        .to_df()
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.col("doc_id")))
        )
    )
    qv = [
        float(x)
        for x in db.collection("embeddings").df().where("vec_id = 0").first()["embedding"]
    ]
    vec = (
        db.collection("embeddings")
        .pipe([{"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                  "limit": 20, "exact": True}}])
        .to_df()
        .withColumnRenamed("vec_id", "doc_id")
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("score"), F.col("doc_id")))
        )
    )
    fused = rank_fusion(
        {"text": text, "vector": vec},
        key="doc_id",
        weights={"text": 1.0, "vector": 1.0},
    )
    return fused.select(
        "doc_id",
        "text_rank",
        "vector_rank",
        F.round(F.col("fused_score") * F.lit(1e9)).cast("long").alias("rrf_e9"),
    )


def _q_embedding_quantize(spark, sf_dir):
    # M7 embedding compression: per-vector symmetric int8 max-abs
    # quantization, audited as exact scalars (scale, code sums,
    # reconstruction MSE) — array HOFs at scan speed, no shuffle
    from anser_spark.operators.quantize import quantization_report

    emb = _db(spark, sf_dir).collection("embeddings").df()
    return quantization_report(emb)


def _q_media_pipeline(spark, sf_dir):
    # multimodal plumbing + Arrow-batched feature extraction in one
    # gate: metadata attach + frame-sample counts joined with the stub
    # decode's float32 feature columns
    plumbing = _q_media_plumbing(spark, sf_dir)
    features = _q_media_features(spark, sf_dir)
    return plumbing.join(features, "media_id")


def _q_rank_sketch_stats(spark, sf_dir):
    # composite (50-gate cap): the per-flag + global N-accumulator
    # stats (3 rows) CROSS-JOINed with the sketch gate (16 rows) —
    # both tiny result sets, 48 rows total, every underlying query
    # body keeps a full value-hash row every round
    from pyspark.sql import functions as F

    return _q_group_rank_stats(spark, sf_dir).crossJoin(
        F.broadcast(_q_sketches(spark, sf_dir))
    )


def _q_image_stats_real(spark, sf_dir):
    # REAL image decode under the driver hash gate (round 8): build a
    # solid-color 2x2 24-bit BMP per document JVM-side (fixed header
    # literal + unhex'd color bytes derived from doc_id), decode it
    # with the real struct+numpy decoder in extract_image_stats, and
    # emit stats the oracle reproduces as pure doc_id arithmetic —
    # mean_lum is bit-identical double math on both sides (same uint8
    # inputs, same constants, same left-to-right op order)
    import struct

    from pyspark.sql import functions as F

    from anser_spark.operators.multimodal import extract_image_stats

    hdr = (
        b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    )

    def byte(c):
        return F.unhex(F.lpad(F.hex(c), 2, "0"))

    docs = _db(spark, sf_dir).collection("documents").df()
    r = F.pmod(F.col("doc_id"), F.lit(251))
    g = F.pmod(F.col("doc_id") * 7, F.lit(251))
    b = F.pmod(F.col("doc_id") * 13, F.lit(251))
    color = F.concat(byte(b), byte(g), byte(r))  # BMP stores BGR
    row = F.concat(color, color, F.lit(b"\x00\x00"))  # 2px + pad to 8
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit(hdr), row, row).alias("payload"),
    )
    stats = extract_image_stats(media)
    return stats.select(
        "media_id",
        F.col("width").alias("img_w"),
        F.col("height").alias("img_h"),
        F.col("channels").alias("img_c"),
        F.col("mean_r").alias("img_mean_r"),
        F.col("mean_g").alias("img_mean_g"),
        F.col("mean_b").alias("img_mean_b"),
        F.col("mean_lum").alias("img_mean_lum"),
        F.col("std_lum").alias("img_std_lum"),
    )


def _q_media_text_stats(spark, sf_dir):
    # composite (50-gate cap): multimodal plumbing+features joined with
    # the text-stats profile on the shared document key, plus (round 8)
    # the REAL-decode image-stats leg — one row per document carrying
    # all three gates' columns
    media = _q_media_pipeline(spark, sf_dir)
    text = _q_text_stats(spark, sf_dir)
    joined = media.join(text, media["media_id"] == text["doc_id"])
    return joined.join(_q_image_stats_real(spark, sf_dir), "media_id")


def _q_gopher_repetition(spark, sf_dir):
    # composite (50-gate cap): Gopher rule flags + repetition metrics,
    # joined on doc_id (no column collisions between the two).
    # Both legs are CPU-bound JVM scans (regexp tokenize / HOFs) over
    # the bench's one-file layout = 1 task each; build them from ONE
    # cores/4-fanned frame (A/B min-of-5: 1.18s → 0.38s; same moderate
    # fan-out rationale as the decontamination gate). Values unchanged —
    # both legs are per-row projections plus keyed re-aggregations.
    from anser_spark.operators.text import gopher_rules, repetition_metrics

    docs = _db(spark, sf_dir).collection("documents").df()
    fan = max(1, spark.sparkContext.defaultParallelism // 4)
    if fan > 1:
        docs = docs.repartition(fan, "doc_id")
    flags = gopher_rules(docs).select(
        "doc_id", "rule_word_count", "rule_mean_word_len",
        "rule_symbol_ratio", "rule_bullets", "rule_ellipsis",
        "rule_alpha_words", "rule_stopwords", "gopher_keep",
    )
    return flags.join(repetition_metrics(docs), "doc_id")


def _q_densify_geo(spark, sf_dir):
    # composite (50-gate cap): $densify/$fill series (23 rows) CROSS-
    # JOINed with $geoNear (61 rows) — 1403 rows, both bodies hashed
    from pyspark.sql import functions as F

    return _q_densify_fill(spark, sf_dir).crossJoin(
        F.broadcast(_q_geo_near(spark, sf_dir))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ≤50 entries by contract: the driver verifies at most 50 queries
    # per round, so related operators share composite gates (see the
    # _q_* composites above). Every entry here gets a correctness row.
    return {
        "find_sort_skip_limit": _q_find_sort_skip_limit,
        "filter_in_projection": _q_filter_in_projection,
        "filter_and_or": _q_filter_and_or,
        "filter_regex": _q_filter_regex,
        "filter_nin_mod": _q_filter_nin_mod,
        "count_matching": _q_count_matching,
        "group_q1": _q_group_q1,
        "group_global": _q_group_global,
        "lookup_unwind": _q_lookup_unwind,
        "sort_by_count": _q_sort_by_count,
        "project_json_expressions": _q_project_json_expressions,
        "group_by_user": _q_group_by_user,
        "sequence_packing": _q_sequence_packing,
        "corpus_splits": _q_corpus_splits,
        "decontamination": _q_decontamination,
        "exact_dedup_docs": _q_exact_dedup,
        "ann_top_k": _q_ann_top_k,
        "minhash_near_dups": _q_minhash_near_dups,
        "embedding_near_dups": _q_embedding_near_dups,
        "embedding_sim_join": _q_embedding_sim_join,
        "pii_scrub": _q_pii_scrub,
        "window_rank_shift": _q_window_rank_shift,
        "bucket_stages": _q_bucket_stages,
        "tpch_q3_shape": _q_tpch_q3_shape,
        "tpch_q5_shape": _q_tpch_q5_shape,
        "union_with": _q_union_with,
        "simhash_fingerprints": _q_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "update_all_inc_set": _q_update_all_inc_set,
        "pipeline_update": _q_pipeline_update,
        "text_find": _q_text_find,
        "gopher_repetition": _q_gopher_repetition,
        "media_text_stats": _q_media_text_stats,
        "temperature_mix": _q_temperature_mix,
        "upsert_paths": _q_upsert_paths,
        "bulk_mixed": _q_bulk_mixed,
        "merge_into_summary": _q_merge_into_summary,
        "change_stream_cdc": _q_change_stream_cdc,
        "line_dedup_clean": _q_line_dedup_clean,
        "densify_geo": _q_densify_geo,
        "window_range_30d": _q_window_range_30d,
        "hybrid_search": _q_hybrid_search,
        "embedding_quantize": _q_embedding_quantize,
        "tpch_q7_shape": _q_tpch_q7_shape,
        "tpch_q10_shape": _q_tpch_q10_shape,
        "session_windows": _q_session_windows,
        "redact_levels": _q_redact_levels,
        "rank_sketch_stats": _q_rank_sketch_stats,
        "temporal_joins": _q_temporal_joins,
    }


def _text_stats_oracle() -> str:
    """DuckDB twin of operators.text.text_stats: identical stopword-vote
    argmax, punct/length/word-len banding, and composite weighting —
    same regexes (RE2's [[:punct:]] == Java's \\p{Punct} ASCII class;
    \\b is ASCII-word-boundary in both engines), same double-division
    order, so values hash-match exactly."""
    from anser_spark.operators.text import LANG_STOPWORDS

    def hits(words: list[str]) -> str:
        pat = "(?i)\\b(" + "|".join(words) + ")\\b"
        return f"len(regexp_extract_all(lower(text), '{pat}', 1))"

    langs = list(LANG_STOPWORDS)
    hit_cols = ", ".join(f"{hits(LANG_STOPWORDS[l])} AS h_{l}" for l in langs)
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    lang_case = " ".join(
        f"WHEN best > 0 AND h_{l} = best THEN '{l}'" for l in langs
    )
    return f"""
        WITH c AS (
          SELECT doc_id,
            CASE WHEN len(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
            length(text) AS n_chars,
            length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
            {hit_cols},
            {hits(all_stop)} AS h_all
          FROM documents
        ), d AS (
          SELECT *, {best} AS best,
            CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
            CASE WHEN n_tokens > 0 THEN n_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mwl,
            CASE WHEN n_tokens > 0 THEN h_all / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stop_ratio,
            least(n_chars / 500.0, 1.0) AS length_score
          FROM c
        ), wnorm AS (
          -- winnowing twin (k=8, w=4): same normalization, identical
          -- md5 digests, window-min over k-gram hash sequence
          SELECT doc_id,
                 regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS s
          FROM documents
        ), widx AS (
          SELECT doc_id, s,
                 unnest(range(1, greatest(length(s) - 8 + 1, 0) + 1)) AS i
          FROM wnorm
        ), wgrams AS (
          SELECT doc_id, i,
                 substr(md5(substr(s, CAST(i AS INT), 8)), 1, 16) AS h
          FROM widx
        ), wmin AS (
          SELECT doc_id, i,
                 min(h) OVER (PARTITION BY doc_id ORDER BY i
                              ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                 count(*) OVER (PARTITION BY doc_id) AS m
          FROM wgrams
        ), wsets AS (
          SELECT doc_id, list_sort(list_distinct(list(fp))) AS fps
          FROM wmin WHERE i <= greatest(m - 4 + 1, 1) GROUP BY doc_id
        )
        SELECT d.doc_id, n_tokens, n_chars AS n_chars_calc,
          CASE {lang_case} ELSE 'und' END AS lang_id,
          round(length_score * 0.3
                + (1.0 - least(punct_ratio * 4, 1.0)) * 0.2
                + (CASE WHEN mwl >= 3 AND mwl <= 12 THEN 1.0 ELSE 0.3 END) * 0.3
                + least(stop_ratio * 3, 1.0) * 0.2, 6) AS quality,
          round(punct_ratio, 4) AS punct_ratio,
          round(mwl, 4) AS mean_word_len,
          round(length_score, 4) AS length_score,
          CAST(h_en AS INTEGER) AS en_stop_hits,
          CAST(coalesce(len(w.fps), 0) AS BIGINT) AS n_fingerprints,
          md5(coalesce(array_to_string(w.fps, ','), '')) AS fp_digest,
          w.fps[1] AS min_fp,
          w.fps[-1] AS max_fp
        FROM d LEFT JOIN wsets w ON d.doc_id = w.doc_id
    """


_NGRAM_JACCARD_ORACLE = r"""
    WITH s AS (
      SELECT doc_id, lang AS blk,
        CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
             ELSE list_distinct(list_transform(
                    generate_series(1, len(w) - 2),
                    i -> array_to_string(w[i:i+2], ' ')))
        END AS sh
      FROM (SELECT doc_id, lang,
                   regexp_split_to_array(
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
            FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      round(len(list_intersect(a.sh, b.sh))
            / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
    FROM s a JOIN s b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= 0.4
"""


def _text_find_oracle() -> str:
    """en_n's oracle mirrors the engine's english analyzer EXACTLY
    (round 8, ADVICE): the same charset split (keeps apostrophes and
    unicode letters/digits), the same stopword list filtered BEFORE
    stemming, the SAME Snowball stemmer — ``porter2_sql`` is the
    DuckDB-SQL twin of the engine's ``porter2_stem``, generated from
    the same suffix tables and differential-tested over random + corpus
    vocabulary in pytest — and the engine's one-to-one diacritic fold
    table applied AFTER stemming (translate).  The query-side stems are
    HARD-CODED literals (round 9 ADVICE): the engine analyzes
    ['queries', 'dáta'] → stem → fold → ['data', 'queri'], and baking
    the expected output in (instead of calling ``analyze_terms`` at
    oracle-build time) means a bug that hits query-term and document
    analysis identically can no longer cancel out of this gate; a
    pytest tripwire asserts the literals still match the engine
    derivation, so a deliberate analyzer change surfaces as a test
    failure instead of a silent gate drift."""
    from anser_spark.functions.stemmer import porter2_sql
    from anser_spark.operators.ranking import (
        _FOLD_DST,
        _FOLD_SRC,
        ENGLISH_STOPWORDS,
    )

    stop = ", ".join(
        "'" + w.replace("'", "''") + "'" for w in sorted(ENGLISH_STOPWORDS)
    )
    # expected analysis of the gate's query ['queries', 'dáta'] —
    # NOT derived from the engine at oracle-build time (see docstring)
    qterms = ["data", "queri"]
    qlist = ", ".join("'" + t + "'" for t in qterms)
    toks = (
        "list_transform("
        "list_filter("
        "regexp_split_to_array(lower(trim(text)), '[^\\p{L}\\p{N}'']+'), "
        f"tk -> tk <> '' AND tk NOT IN ({stop})), "
        f"tk -> translate({porter2_sql('tk')}, '{_FOLD_SRC}', '{_FOLD_DST}'))"
    )
    # round-10 phrase legs: the regex twin of the position predicate —
    # word-boundary-anchored adjacency on whitespace-normalized text;
    # the slop=1 twin allows exactly one interleaved token (for a
    # 2-term phrase, per-gap allowance equals the span budget)
    norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    normsrc = "regexp_replace(lower(trim(source)), '\\s+', ' ', 'g')"
    # round-11 weighted leg's twin: 'none'-analyzer tokens (whitespace
    # split, lower, diacritic fold) on EACH weighted field; match = any
    # query token in any field (Mongo multi-field $text semantics)
    wtoks = (
        lambda col: "list_transform("
        f"regexp_split_to_array(lower(trim({col})), '\\s+'), "
        f"tk -> translate(tk, '{_FOLD_SRC}', '{_FOLD_DST}'))"
    )
    return f"""
        SELECT doc_id, lang,
               (SELECT count(*) FROM documents
                WHERE list_has_any({toks}, [{qlist}])) AS en_n,
               (SELECT count(*) FROM documents
                WHERE list_has_any({toks}, [{qlist}])) AS en_idx,
               (SELECT count(*) FROM documents
                WHERE regexp_matches({norm},
                      '(^|\\s)data column(\\s|$)')) AS phrase_n,
               (SELECT count(*) FROM documents
                WHERE regexp_matches({norm},
                      '(^|\\s)data( [^ ]+)? column(\\s|$)')) AS phrase_slop_n,
               (SELECT count(*) FROM documents
                WHERE list_has_any({wtoks('text')}, ['spark', 'src7'])
                   OR list_has_any({wtoks('source')}, ['spark', 'src7'])
               ) AS w_n,
               (SELECT count(*) FROM documents
                WHERE list_contains(
                    regexp_split_to_array(lower(trim(text)), '\\s+'),
                    'spark')) AS w1_n,
               (SELECT count(*) FROM documents
                WHERE regexp_matches({norm},
                      '(^|\\s)data column(\\s|$)')) AS wp_n,
               (SELECT count(*) FROM documents
                WHERE regexp_matches({norm},
                      '(^|\\s)data column(\\s|$)')
                   OR regexp_matches({normsrc},
                      '(^|\\s)data column(\\s|$)')) AS wmp_n,
               (SELECT count(*) FROM documents
                WHERE regexp_matches({norm},
                      '(^|\\s)src7(\\s|$)')
                   OR regexp_matches({normsrc},
                      '(^|\\s)src7(\\s|$)')) AS wms_n
        FROM documents
        WHERE lang = 'en'
          AND list_contains(regexp_split_to_array(lower(trim(text)), '\\s+'), 'spark')
          AND NOT list_contains(regexp_split_to_array(lower(trim(text)), '\\s+'), 'merge')
    """


def _oracle_sql_bodies() -> dict[str, str]:
    from anser_spark.operators.text import PII_PATTERNS

    # single source of truth: the exact regexes the Spark operator runs
    # (restricted to the Java-regex/RE2 common subset, so they are
    # byte-identical predicates in DuckDB)
    _PII_RE = [pattern for _, pattern, _ in PII_PATTERNS]
    return {
        "find_sort_skip_limit": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem
            WHERE l_quantity > 45.0
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 50 OFFSET 20
        """,
        "filter_in_projection": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        """,
        "filter_and_or": """
            SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
              AND o_orderdate < TIMESTAMP '1996-01-01'
        """,
        "filter_regex": """
            SELECT p_partkey, p_name, p_size,
                   (SELECT count(*) FROM customer
                    WHERE lower(c_mktsegment) = lower('building')) AS ci_eq,
                   (SELECT count(*) FROM customer
                    WHERE lower(c_mktsegment) IN
                          (lower('machinery'), lower('Household'))) AS ci_in,
                   (SELECT count(*) FROM customer
                    WHERE c_mktsegment = 'building') AS bin_eq
            FROM part
            WHERE regexp_matches(p_name, 'blue') AND p_size >= 10
        """,
        "filter_nin_mod": """
            SELECT * FROM nation
            WHERE n_regionkey NOT IN (0, 4) AND n_nationkey % 2 = 1
        """,
        "count_matching": """
            SELECT count(*) AS n FROM lineitem WHERE l_returnflag = 'R'
        """,
        "group_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "group_global": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                   count(*) AS n
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0
        """,
        "lookup_unwind": """
            SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 250000.0
        """,
        "sort_by_count": """
            SELECT lang AS _id, count(*) AS count
            FROM documents GROUP BY lang
        """,
        "project_json_expressions": """
            SELECT event_id,
                   CAST(EXTRACT(year FROM ts) AS INTEGER) AS yr,
                   upper(event_type) AS etype,
                   CASE WHEN value >= 50.0 THEN 'high' ELSE 'low' END AS bucket,
                   round(value * 2.0, 4) AS val2,
                   json_extract_string(props, '$.k') AS k_value
            FROM events
            WHERE event_type IS DISTINCT FROM 'view'
              AND json_extract_string(props, '$.k') IS NOT NULL
        """,
        "group_by_user": """
            SELECT event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS total_value,
                   max(value) AS max_value,
                   CAST(count(DISTINCT user_id) AS INTEGER) AS n_users
            FROM events
            GROUP BY event_type
        """,
        "sequence_packing": """
            WITH toks AS (
              SELECT doc_id,
                     CAST(CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                     END AS BIGINT) AS n_tokens,
                     doc_id % 8 AS shard
              FROM documents
            ),
            packed AS (
              SELECT doc_id, shard, n_tokens,
                     coalesce(sum(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS pack_offset
              FROM toks
            )
            SELECT doc_id, CAST(shard AS BIGINT) AS shard,
                   CAST(pack_offset AS BIGINT) AS pack_offset,
                   CAST(floor(pack_offset / 512) AS BIGINT) AS block_start,
                   CAST(floor((pack_offset + greatest(n_tokens, 1) - 1) / 512)
                        AS BIGINT) AS block_end,
                   CAST(CASE WHEN n_tokens = 0 THEN 0
                        ELSE greatest(CAST(ceil((n_tokens - 16) / 48.0) AS BIGINT), 1)
                   END AS BIGINT) AS n_chunks
            FROM packed
        """,
        # bucket = int of the first 4 md5 hex digits, summed per-char
        # via strpos('0123456789abcdef', c) - 1 (the same trick as the
        # media_features oracle); split edges floor(cum_weight * 65536)
        # one md5-bucket CTE feeds BOTH halves of the composite gate:
        # the train/val/test edges (floor(cum_weight * 65536)) and the
        # per-language stratified-sample thresholds (floor(rate * 65536))
        "corpus_splits": """
            WITH b AS (
              SELECT doc_id, lang, text,
                (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
                AS bucket,
                (strpos('0123456789abcdef', substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
              + (strpos('0123456789abcdef', substr(md5('ws' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
              + (strpos('0123456789abcdef', substr(md5('ws' || CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(md5('ws' || CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
                AS ws_bucket
              FROM documents
            )
            SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                   CASE WHEN bucket < 58982 THEN 'train'
                        WHEN bucket < 62259 THEN 'val'
                        ELSE 'test' END AS split,
                   CASE WHEN bucket < CASE lang WHEN 'en' THEN 32768
                                                WHEN 'de' THEN 16384
                                                WHEN 'zh' THEN 65536
                                                ELSE 6553 END
                        THEN lang END AS strat_lang,
                   md5('epoch0' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
                   coalesce(ws_bucket < floor(
                       least(1.0, 0.8 * least(1.0, len(text) / 2000.0)) * 65536.0),
                     false) AS ws_kept
            FROM b
        """,
        "decontamination": """
            WITH s AS (
              SELECT doc_id,
                CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                     ELSE list_distinct(list_transform(
                            generate_series(1, len(w) - 2),
                            i -> array_to_string(w[i:i+2], ' ')))
                END AS sh
              FROM (SELECT doc_id,
                           regexp_split_to_array(
                             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
                    FROM documents)
            ),
            tr AS (SELECT doc_id AS train_id, unnest(sh) AS tok FROM s
                   WHERE doc_id % 25 <> 0),
            te AS (SELECT doc_id AS test_id, unnest(sh) AS tok FROM s
                   WHERE doc_id % 25 = 0)
            SELECT train_id, test_id, count(*) AS n_shared
            FROM tr JOIN te ON tr.tok = te.tok
            GROUP BY train_id, test_id
            HAVING count(*) >= 2
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id
            FROM documents
            GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
        """,
        # both legs (brute force and IVF full-probe) provably return the
        # exact top-k, so the composite oracle is the same SELECT twice
        "ann_top_k": """
            WITH exact AS (
                SELECT vec_id,
                       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cosine
                FROM embeddings
                ORDER BY cosine DESC, vec_id
                LIMIT 10
            )
            SELECT 'brute' AS kind, vec_id, cosine FROM exact
            UNION ALL
            SELECT 'ivf', vec_id, cosine FROM exact
            UNION ALL
            SELECT 'cells', vec_id, cosine FROM exact
            UNION ALL
            SELECT 'ivfpq', vec_id, cosine FROM exact
            UNION ALL
            SELECT 'pq', e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4)
            FROM embeddings e
            JOIN (
                SELECT vec_id FROM embeddings
                ORDER BY list_distance(CAST(embedding AS DOUBLE[]),
                    (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)),
                    vec_id
                LIMIT 10
            ) t USING (vec_id)
        """,
        "embedding_sim_join": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a JOIN embeddings b
              ON a.vec_id < b.vec_id
            WHERE a.vec_id < 300 AND b.vec_id < 300
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
        """,
        "window_rank_shift": """
            SELECT event_id, user_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS INTEGER) AS rn,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_event
            FROM events
            WHERE user_id < 10
        """,
        "bucket_stages": """
            SELECT 'explicit' AS kind, CAST(_id AS DOUBLE) AS lo,
                   CAST(_id + width AS DOUBLE) AS hi,
                   n, avg_price AS metric
            FROM (
                SELECT _id, CASE _id WHEN 400000 THEN 300000 ELSE 100000 END AS width,
                       count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
                FROM (
                    SELECT CASE
                        WHEN o_totalprice >= 0      AND o_totalprice < 100000 THEN 0
                        WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000
                        WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 200000
                        WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 300000
                        WHEN o_totalprice >= 400000 AND o_totalprice < 700000 THEN 400000
                    END AS _id, o_totalprice
                    FROM orders
                ) WHERE _id IS NOT NULL
                GROUP BY _id
            )
            UNION ALL
            SELECT 'auto' AS kind, CAST(lo AS DOUBLE) AS lo,
                   CAST(hi AS DOUBLE) AS hi, n, sum_bal AS metric
            FROM (
                SELECT __tile,
                       min(c_custkey) AS lo, max(c_custkey) AS hi,
                       count(*) AS n, round(sum(c_acctbal), 2) AS sum_bal
                FROM (
                    SELECT c_custkey, c_acctbal,
                           NTILE(7) OVER (ORDER BY c_custkey) AS __tile
                    FROM customer
                )
                GROUP BY __tile
            )
            UNION ALL
            SELECT 'topn' AS kind, CAST(_id AS DOUBLE) AS lo,
                   CAST(_id + width AS DOUBLE) AS hi,
                   count(*) AS n,
                   round(sum(CASE WHEN rk <= 2 THEN o_totalprice ELSE 0 END), 2)
                       AS metric
            FROM (
                SELECT _id, CASE _id WHEN 400000 THEN 300000 ELSE 100000 END AS width,
                       o_totalprice,
                       row_number() OVER (PARTITION BY _id ORDER BY o_totalprice DESC) AS rk
                FROM (
                    SELECT CASE
                        WHEN o_totalprice >= 0      AND o_totalprice < 100000 THEN 0
                        WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000
                        WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 200000
                        WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 300000
                        WHEN o_totalprice >= 400000 AND o_totalprice < 700000 THEN 400000
                    END AS _id, o_totalprice
                    FROM orders
                ) WHERE _id IS NOT NULL
            )
            GROUP BY _id, width
        """,
        "tpch_q3_shape": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderdate < TIMESTAMP '1995-03-15'
              AND c_mktsegment = 'BUILDING'
              AND l_shipdate > TIMESTAMP '1995-03-15'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "tpch_q5_shape": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
              AND c_nationkey = s_nationkey
              AND r_name = 'ASIA'
            GROUP BY n_name
        """,
        "union_with": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderdate < TIMESTAMP '1996-01-01'
            UNION ALL
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        """,
        "update_all_inc_set": """
            SELECT c_custkey, c_name, c_nationkey,
                   round(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN c_acctbal + 100.0 ELSE c_acctbal END, 2) AS acctbal,
                   CASE WHEN c_mktsegment = 'BUILDING'
                        THEN 'BUMPED' ELSE c_mktsegment END AS c_mktsegment
            FROM customer
        """,
        "gopher_filter": _gopher_filter_oracle(),
        "temperature_mix": """
            WITH c AS (
              SELECT lang, count(*)::DOUBLE AS n FROM documents
              WHERE lang IS NOT NULL GROUP BY 1
            ), tot AS (
              SELECT sum(n) AS nt,
                     (SELECT sum(p) FROM (SELECT pow(n, 0.5) AS p FROM c ORDER BY lang)) AS z
              FROM c
            ), e AS (
              SELECT lang,
                CAST(floor(round(LEAST(1.0, (pow(n, 0.5) / z) * nt / n), 6) * 65536) AS BIGINT) AS edge
              FROM c, tot
            )
            SELECT d.doc_id, d.lang
            FROM documents d JOIN e USING (lang)
            WHERE (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
                + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1) * 256
                + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 3, 1)) - 1) * 16
                + (strpos('0123456789abcdef', substr(md5(CAST(d.doc_id AS VARCHAR)), 4, 1)) - 1)
                  < e.edge
        """,
        "text_find": _text_find_oracle(),
        "pipeline_update": """
            SELECT c_custkey,
                   round(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN c_acctbal + c_nationkey * 10
                              ELSE c_acctbal END, 2) AS acctbal,
                   c_mktsegment,
                   CASE WHEN c_mktsegment = 'BUILDING'
                        THEN (CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END)
                        ELSE NULL END AS seg_flag
            FROM customer
        """,
        "upsert_paths": """
            SELECT n_nationkey,
                   CASE WHEN n_nationkey = 0 THEN 'NATION_ZERO' ELSE n_name END AS n_name,
                   n_regionkey
            FROM nation
            UNION ALL
            SELECT 99, 'NATION_NEW', 9
        """,
        "bulk_mixed": """
            SELECT n_nationkey, n_name,
                   CASE WHEN n_regionkey = 1 THEN n_regionkey + 10
                        ELSE n_regionkey END AS n_regionkey
            FROM nation
            WHERE n_nationkey < 20
            UNION ALL
            SELECT 50, 'NATION_X', 5
        """,
        "merge_into_summary": """
            SELECT o_orderpriority AS _id, count(*) AS n,
                   round(sum(o_totalprice), 2) AS total
            FROM orders GROUP BY o_orderpriority
            UNION ALL
            SELECT 'ZZ', -1, 0.0
        """,
        # line cleaning + corpus-wide first-occurrence line dedup twin:
        # same line construction (plain replace), same ≥3-word rule,
        # same (doc_id, position) winner, same newline reassembly
        "line_dedup_clean": """
            WITH lined AS (
              SELECT doc_id, replace(text, ' table ', chr(10)) AS text
              FROM documents
            ), raw AS (
              SELECT doc_id,
                     unnest(string_split(text, chr(10))) AS line,
                     unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos0
              FROM lined
            ), nonblank AS (
              SELECT * FROM raw WHERE trim(line) <> ''
            ), counts AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
              FROM nonblank GROUP BY doc_id
            ), quality AS (
              SELECT doc_id, pos0, line,
                     row_number() OVER (PARTITION BY doc_id ORDER BY pos0) AS rn
              FROM nonblank
              WHERE len(list_filter(regexp_split_to_array(trim(line), '\\s+'),
                                    w -> w <> '')) >= 3
            ), qcounts AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_quality
              FROM quality GROUP BY doc_id
            ), normed AS (
              SELECT doc_id, rn, line,
                     regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS norm
              FROM quality
            ), winners AS (
              SELECT norm, min(struct_pack(d := doc_id, p := rn)) AS w
              FROM normed GROUP BY norm
            ), kept AS (
              SELECT n.doc_id, n.rn, n.line
              FROM normed n JOIN winners win ON n.norm = win.norm
              WHERE n.doc_id = win.w.d AND n.rn = win.w.p
            ), rebuilt AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_dedup,
                     string_agg(line, chr(10) ORDER BY rn) AS dedup_text
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(c.n_lines, 0) AS n_lines,
                   coalesce(q.n_kept_quality, 0) AS n_kept_quality,
                   coalesce(r.n_kept_dedup, 0) AS n_kept_dedup,
                   md5(coalesce(r.dedup_text, '')) AS dedup_digest
            FROM documents d
            LEFT JOIN counts c USING (doc_id)
            LEFT JOIN qcounts q USING (doc_id)
            LEFT JOIN rebuilt r USING (doc_id)
        """,
        # expected change-stream events from the known mutation script:
        # updates for surviving $inc victims, deletes with v1 pre-images
        # (update-then-delete collapses to delete-of-original — endpoint
        # diff semantics), one insert
        "change_stream_cdc": """
            SELECT 'update' AS op, CAST(n_nationkey AS BIGINT) AS n_nationkey,
                   n_name AS pre_name, CAST(n_regionkey AS BIGINT) AS pre_regionkey,
                   n_name AS post_name, CAST(n_regionkey + 10 AS BIGINT) AS post_regionkey
            FROM nation WHERE n_regionkey = 1 AND n_nationkey < 20
            UNION ALL
            SELECT 'delete', CAST(n_nationkey AS BIGINT), n_name,
                   CAST(n_regionkey AS BIGINT),
                   CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
            FROM nation WHERE n_nationkey >= 20
            UNION ALL
            SELECT 'insert', CAST(50 AS BIGINT), CAST(NULL AS VARCHAR),
                   CAST(NULL AS BIGINT), 'NATION_X', CAST(5 AS BIGINT)
        """,
        "densify_fill": """
            WITH filt AS (
                SELECT n_nationkey, n_name FROM nation WHERE n_nationkey % 3 <> 0
            ),
            pts AS (
                SELECT unnest(generate_series(
                    (SELECT min(n_nationkey) FROM filt),
                    (SELECT max(n_nationkey) FROM filt))) AS n_nationkey
            ),
            dense AS (
                SELECT p.n_nationkey, f.n_name
                FROM pts p LEFT JOIN filt f USING (n_nationkey)
            )
            SELECT n_nationkey,
                   last_value(n_name IGNORE NULLS) OVER (
                       ORDER BY n_nationkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS n_name
            FROM dense
        """,
        "window_range_30d": """
            SELECT o_orderkey, o_orderpriority,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_orderpriority ORDER BY o_orderdate
                       RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
                   ), 2) AS rev30
            FROM orders
        """,
        # BM25 leg: same tokenization as the Spark operator; the
        # constants are spelled as the same arithmetic ((1.2+1.0),
        # 1-0.75) so both engines evaluate identical double literals,
        # and ln() runs on exact integer-derived inputs — same libm on
        # this host. Vector leg: Atlas cosine normalization (1+cos)/2.
        # RRF: same leg order, same 1.0/(60+rank) terms.
        "hybrid_search": """
            WITH t AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                            x -> x <> '') AS w
              FROM documents
            ), s AS (
              SELECT doc_id, CAST(len(w) AS INTEGER) AS n_tokens,
                CAST(len(list_filter(w, x -> x = 'data')) AS DOUBLE) AS tf0,
                CAST(len(list_filter(w, x -> x = 'model')) AS DOUBLE) AS tf1,
                CAST(len(list_filter(w, x -> x = 'training')) AS DOUBLE) AS tf2
              FROM t
            ), g AS (
              SELECT count(*) AS n, avg(n_tokens) AS avgdl,
                sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
              FROM s
            ), scored AS (
              SELECT doc_id,
                ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0 * (1.2 + 1.0)
                  / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * n_tokens / avgdl))
                + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1 * (1.2 + 1.0)
                  / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * n_tokens / avgdl))
                + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2 * (1.2 + 1.0)
                  / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * n_tokens / avgdl))
                AS score
              FROM s, g
            ), trank AS (
              SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                                  AS BIGINT) AS text_rank
              -- score > 0: $search returns MATCHING documents only
              FROM (SELECT * FROM scored WHERE score > 0
                    ORDER BY score DESC, doc_id LIMIT 20)
            ), vscored AS (
              SELECT vec_id AS doc_id,
                (1.0 + list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
                    WHERE vec_id = 0))) / 2.0 AS score
              FROM embeddings
            ), vrank AS (
              SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                                  AS BIGINT) AS vector_rank
              FROM (SELECT * FROM vscored ORDER BY score DESC, doc_id LIMIT 20)
            )
            SELECT coalesce(trank.doc_id, vrank.doc_id) AS doc_id,
                   text_rank, vector_rank,
                   CAST(round((CASE WHEN text_rank IS NOT NULL
                                    THEN 1.0 / (60.0 + text_rank) ELSE 0.0 END
                             + CASE WHEN vector_rank IS NOT NULL
                                    THEN 1.0 / (60.0 + vector_rank) ELSE 0.0 END)
                              * 1e9) AS BIGINT) AS rrf_e9
            FROM trank FULL OUTER JOIN vrank ON trank.doc_id = vrank.doc_id
        """,
        # int8 max-abs quantization audit: identical fold order (left
        # reduce over the vector), identical zero-vector guard, float32
        # widened to double on both sides before any arithmetic
        "embedding_quantize": """
            WITH q AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                greatest(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                 x -> abs(x))) / 127.0,
                         1e-30) AS scale
              FROM embeddings
            ), c AS (
              SELECT vec_id, e, scale,
                list_transform(e, x -> CAST(round(x / scale) AS BIGINT)) AS codes
              FROM q
            )
            SELECT vec_id,
              CAST(len(e) AS INTEGER) AS n_dims,
              CAST(round(scale * 1e8) AS BIGINT) AS scale_e8,
              list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
                          (a, b) -> a + b) AS q_sum,
              list_reduce(list_prepend(CAST(0 AS BIGINT),
                                       list_transform(codes, x -> abs(x))),
                          (a, b) -> a + b) AS q_l1,
              CAST(round(list_reduce(
                      list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(generate_series(1, len(e)),
                          i -> (codes[i] * scale - e[i]) * (codes[i] * scale - e[i]))),
                      (a, b) -> a + b) / len(e) * 1e9) AS BIGINT) AS mse_e9
            FROM c
        """,
        "tpch_q7_shape": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
            GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
        """,
        "tpch_q10_shape": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1996-04-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        "session_windows": """
            WITH marked AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
                            THEN 1 ELSE 0 END AS new_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            sess AS (
                SELECT *, sum(new_s) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                ) AS sid
                FROM marked
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 4 HOUR AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM sess GROUP BY user_id, sid
        """,
        "geo_near": """
            WITH pts AS (
                SELECT c_custkey,
                       CAST((c_custkey * 7) % 360 - 180 AS DOUBLE) AS lon,
                       CAST((c_custkey * 13) % 170 - 85 AS DOUBLE) AS lat
                FROM customer
            ), d AS (
                SELECT c_custkey,
                       2 * 6371000.0 * asin(sqrt(
                           pow(sin(radians(lat - 20.0) / 2), 2)
                           + cos(radians(20.0)) * cos(radians(lat))
                             * pow(sin(radians(lon - 10.0) / 2), 2))) AS m
                FROM pts
            )
            SELECT c_custkey, round(m / 1000.0, 3) AS dist_km
            FROM d WHERE m <= 3000000
        """,
        # composite sketch oracle: exact top-k counts (heavy leg) +
        # exact distincts with the ±5% sketch-error contract (hll leg —
        # the estimate has no SQL twin, sketch internals differ, but
        # the bound does; the sketch is deterministic so a bound that
        # holds, holds every run)
        "sketches": """
            (
              SELECT 'heavy' AS kind, value AS key,
                     CAST(freq AS BIGINT) AS n, true AS ok
              FROM (
                  SELECT json_extract_string(props, '$.k') AS value,
                         count(*) AS freq
                  FROM events GROUP BY 1
              ) ORDER BY freq DESC, value ASC LIMIT 10
            ) UNION ALL (
              SELECT 'hll', event_type,
                     CAST(count(DISTINCT user_id) AS BIGINT), true
              FROM events GROUP BY event_type
            ) UNION ALL (
              SELECT 'hll', '__all__',
                     CAST(count(DISTINCT user_id) AS BIGINT), true FROM events
            )
        """,
        # ASOF LEFT JOIN half + interval-containment half, joined on the
        # click id — DuckDB's native ASOF is the ground truth for the
        # union-and-carry Spark formulation
        "temporal_joins": """
            WITH ao AS (
                SELECT l.event_id, l.user_id, r.value AS last_err_value
                FROM (SELECT event_id, ts, user_id FROM events
                      WHERE event_type = 'click') l
                ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                                WHERE event_type = 'error') r
                  ON l.user_id = r.user_id AND l.ts >= r.ts
            ),
            iv AS (
                SELECT l.event_id, r.event_id AS win_id
                FROM (SELECT event_id, ts, user_id FROM events
                      WHERE event_type = 'click') l
                JOIN (SELECT event_id, ts, user_id FROM events
                      WHERE event_type = 'error') r
                  ON l.user_id = r.user_id
                 AND l.ts >= r.ts
                 AND l.ts < r.ts + INTERVAL 2 HOUR
            )
            SELECT ao.event_id, ao.user_id, ao.last_err_value, iv.win_id
            FROM ao LEFT JOIN iv ON ao.event_id = iv.event_id
        """,
        "group_rank_stats": """
            WITH ranked AS (
                SELECT l_returnflag, l_extendedprice, l_quantity,
                       row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_orderkey, l_linenumber,
                                                   l_extendedprice) AS rn,
                       count(*) OVER (PARTITION BY l_returnflag) AS cnt
                FROM lineitem
            ), gl AS (
                SELECT l_extendedprice,
                       row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                          l_extendedprice) AS grn,
                       row_number() OVER (ORDER BY l_extendedprice) AS vrn,
                       row_number() OVER (ORDER BY l_extendedprice DESC) AS drn
                FROM lineitem
            ), g AS (
                SELECT max(CASE WHEN grn = 1 THEN l_extendedprice END) AS g1,
                       max(CASE WHEN grn = 2 THEN l_extendedprice END) AS g2,
                       max(CASE WHEN grn = 3 THEN l_extendedprice END) AS g3,
                       max(CASE WHEN vrn = 1 THEN l_extendedprice END) AS gm1,
                       max(CASE WHEN vrn = 2 THEN l_extendedprice END) AS gm2,
                       max(CASE WHEN drn = 1 THEN l_extendedprice END) AS gx1
                FROM gl
            ), per_flag AS (
                SELECT l_returnflag AS flag,
                       max(CASE WHEN rn = 1 THEN l_extendedprice END) AS top_price,
                       max(CASE WHEN rn = cnt THEN l_extendedprice END) AS bot_price,
                       max(CASE WHEN rn = 1 THEN l_extendedprice END) AS t1,
                       max(CASE WHEN rn = 2 THEN l_extendedprice END) AS t2,
                       max(CASE WHEN rn = 3 THEN l_extendedprice END) AS t3,
                       median(l_quantity) AS med,
                       quantile_cont(l_quantity, 0.25) AS p25,
                       quantile_cont(l_quantity, 0.75) AS p75
                FROM ranked GROUP BY l_returnflag
            )
            SELECT per_flag.*, g.* FROM per_flag CROSS JOIN g
        """,
        "redact_levels": """
            SELECT o_orderkey,
                   CASE WHEN o_totalprice > 150000 THEN -1.0
                        ELSE o_totalprice END AS sub_price
            FROM orders
            WHERE o_orderstatus <> 'F'
        """,
        # plumbing (metadata attach + frame-sample counts) and the stub
        # decode's features in one row per media item. The stub decode
        # is sha256(payload) bytes / 255 stored as float32 — reproduced
        # digit-by-digit from DuckDB's hex sha256 string, with
        # CAST(.. AS FLOAT) matching Arrow's float32 rounding before
        # the exact double widening.
        "media_pipeline": """
            SELECT doc_id AS media_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS payload_sha,
                   CAST(len(generate_series(0,
                        greatest(n_chars * 50 - 1, 0), 2000)) AS BIGINT) AS n_frames,
        """ + ", ".join(
            "CAST(CAST((16*(strpos('0123456789abcdef', substr(sha256(text), "
            f"{2 * i + 1}, 1))-1) + (strpos('0123456789abcdef', substr(sha256(text), "
            f"{2 * i + 2}, 1))-1)) / 255.0 AS FLOAT) AS DOUBLE) AS f{i}"
            for i in range(8)
        ) + " FROM documents",
        "text_stats": _text_stats_oracle(),
        # Gopher repetition filters: same tokenization (lower, trim,
        # \s+ split, empties dropped), same bigram windows (DuckDB's
        # inclusive w[i:i+1] slice == Spark's slice(w, i, 2)), same
        # round-at-4 and left-join-coalesce structure.
        "repetition_metrics": r"""
            WITH t AS (
              SELECT doc_id,
                list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\s+'),
                            x -> x <> '') AS w
              FROM documents
            ), uni AS (
              SELECT doc_id, len(w) AS n_tokens,
                     len(list_distinct(w)) AS n_distinct_tokens
              FROM t
            ), g AS (
              SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
              FROM t, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
              WHERE len(w) >= 2
            ), gs AS (
              -- CAST: DuckDB sum(BIGINT) widens to HUGEINT, which pandas
              -- reads back as float64 — the values match Spark's int64
              -- exactly, but the driver's value hash is dtype-sensitive
              SELECT doc_id, max(c) AS top_gram_count,
                     CAST(sum(c) AS BIGINT) AS n_grams
              FROM (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
              GROUP BY doc_id
            )
            SELECT uni.doc_id,
              CAST(n_tokens AS BIGINT) AS n_tokens,
              CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
              CASE WHEN n_tokens > 0
                   THEN round(1.0 - n_distinct_tokens / CAST(n_tokens AS DOUBLE), 4)
                   ELSE 0.0 END AS dup_word_frac,
              CAST(coalesce(top_gram_count, 0) AS BIGINT) AS top_gram_count,
              CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
              CASE WHEN coalesce(n_grams, 0) > 0
                   THEN round(top_gram_count / CAST(n_grams AS DOUBLE), 4)
                   ELSE 0.0 END AS top_gram_frac
            FROM uni LEFT JOIN gs ON uni.doc_id = gs.doc_id
        """,
        # Same PII patterns verbatim (syntax restricted to the
        # Java-regex/RE2 common subset: \b is an ASCII word boundary in
        # both, no lookarounds), same replace order (email first), and
        # DuckDB needs the explicit 'g' flag Spark applies implicitly.
        "pii_scrub": f"""
            WITH s AS (
              SELECT doc_id,
                text || ' reach user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com or 10.0.'
                     || CAST(doc_id % 200 AS VARCHAR)
                     || '.25 tel 555-867-5309' AS t
              FROM documents
            )
            SELECT doc_id,
              regexp_replace(regexp_replace(regexp_replace(t,
                '{_PII_RE[0]}', '<EMAIL>', 'g'),
                '{_PII_RE[1]}', '<IP>', 'g'),
                '{_PII_RE[2]}', '<PHONE>', 'g') AS scrubbed,
              len(regexp_extract_all(t, '{_PII_RE[0]}')) AS n_email,
              len(regexp_extract_all(t, '{_PII_RE[1]}')) AS n_ipv4,
              len(regexp_extract_all(t, '{_PII_RE[2]}')) AS n_phone
            FROM s
        """,
        "ngram_jaccard": _NGRAM_JACCARD_ORACLE,
        # connected components == transitive closure with min-id labels:
        # the recursive walk enumerates every (node, reachable-node)
        # pair over the symmetric ngram pair graph (small: components
        # are near-dup clusters), then min() collapses to the label
        "dedup_clusters": f"""
            WITH RECURSIVE pairs AS ({_NGRAM_JACCARD_ORACLE}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION
              SELECT id_b, id_a FROM pairs
            ),
            walk(id, label) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.id
            ),
            comp AS (SELECT id, min(label) AS component FROM walk GROUP BY id)
            SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        """,
        # the LSH output over the planted-duplicate augmentation is
        # provably the exact pair set (see _q_embedding_near_dups), so
        # an exact O(n²) join IS its ground truth at gate scale
        "embedding_near_dups": """
            WITH aug AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000, embedding FROM embeddings
              WHERE vec_id < 20
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.95
        """,
        # minhash LSH over the planted-duplicate augmentation at
        # threshold 1.0: identical shingle sets ⇒ identical signatures ⇒
        # collide in every band ⇒ candidate recall exactly 1; exact
        # verification then keeps precisely the identical-set pairs —
        # which this O(n²) set-equality join enumerates (same shingle
        # normalization as _NGRAM_JACCARD_ORACLE, k=3)
        "minhash_near_dups": r"""
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20
            ), s AS (
              SELECT doc_id,
                CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                     ELSE list_distinct(list_transform(
                            generate_series(1, len(w) - 2),
                            i -> array_to_string(w[i:i+2], ' ')))
                END AS sh
              FROM (SELECT doc_id,
                           regexp_split_to_array(
                             regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS w
                    FROM aug)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              round(len(list_intersect(a.sh, b.sh))
                    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE),
                    6) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))
                  = len(list_distinct(list_concat(a.sh, b.sh)))
        """,
        # simhash(identical text) is identical (deterministic keyed
        # hash), so original-vs-planted-copy hamming is provably 0 for
        # every document; the fingerprint VALUES are covered by the
        # scalar-loop golden in tests/test_round4.py (no siphash in
        # DuckDB)
        "simhash_fingerprints": """
            SELECT doc_id, CAST(0 AS BIGINT) AS hamming FROM documents
        """,
    }


def oracle_sql() -> dict[str, str]:
    # composite gates (50-slot driver cap): each composite's oracle is
    # the CROSS JOIN / key-join of its components' oracles — the same
    # composition the Spark queries perform, so the value hash still
    # pins every underlying query body each round.
    o = _oracle_sql_bodies()
    o["rank_sketch_stats"] = (
        f"SELECT * FROM ({o.pop('group_rank_stats')}) r "
        f"CROSS JOIN ({o.pop('sketches')}) s"
    )
    o["image_stats_real"] = """
        SELECT doc_id AS media_id,
               CAST(2 AS INT) AS img_w, CAST(2 AS INT) AS img_h,
               CAST(3 AS INT) AS img_c,
               CAST(doc_id % 251 AS DOUBLE) AS img_mean_r,
               CAST((doc_id * 7) % 251 AS DOUBLE) AS img_mean_g,
               CAST((doc_id * 13) % 251 AS DOUBLE) AS img_mean_b,
               0.2126 * CAST(doc_id % 251 AS DOUBLE)
                 + 0.7152 * CAST((doc_id * 7) % 251 AS DOUBLE)
                 + 0.0722 * CAST((doc_id * 13) % 251 AS DOUBLE)
                   AS img_mean_lum,
               CAST(0 AS DOUBLE) AS img_std_lum
        FROM documents
    """
    o["media_text_stats"] = (
        f"SELECT * FROM ({o.pop('media_pipeline')}) m "
        f"JOIN ({o.pop('text_stats')}) t ON m.media_id = t.doc_id "
        f"JOIN ({o.pop('image_stats_real')}) i USING (media_id)"
    )
    o["gopher_repetition"] = (
        f"SELECT * FROM ({o.pop('gopher_filter')}) g "
        f"JOIN ({o.pop('repetition_metrics')}) r USING (doc_id)"
    )
    o["densify_geo"] = (
        f"SELECT * FROM ({o.pop('densify_fill')}) d "
        f"CROSS JOIN ({o.pop('geo_near')}) g"
    )
    return o
