"""Round-14 optimization invariants: mirrored rank accumulators share
one window sort, and n=1 $minN/$maxN compile to plain min/max with no
window at all — with value parity against independently computed
expectations (the seeded group fuzzer provides the broad differential;
these tests pin the PLAN shape so the optimization can't silently
regress)."""

from __future__ import annotations

import re

import pytest

from anser_spark.plans.pipeline import compile_pipeline


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _rows(rng_vals):
    return [
        {"_id": i, "g": ["x", "y"][i % 2], "v": v}
        for i, v in enumerate(rng_vals)
    ]


@pytest.fixture(scope="module")
def df(spark):
    # v includes nulls and duplicated values; _id is a unique tie-break
    vals = [5, None, 3, 8, 3, None, 12, 1, 8, 0, 7, None, 2, 9, 4, 6]
    return spark.createDataFrame(_rows(vals), "`_id` long, g string, v long")


def test_minn_maxn_same_input_share_one_sort(df):
    out = compile_pipeline(df, [{"$group": {
        "_id": "$g",
        "lo": {"$minN": {"input": "$v", "n": 2}},
        "hi": {"$maxN": {"input": "$v", "n": 2}},
    }}], None, None)
    plan = _plan(out)
    assert len(re.findall(r"\+- Sort|^Sort", plan, re.M)) == 1, plan
    got = {r["_id"]: (r["lo"], r["hi"]) for r in out.collect()}
    # x rows: v in [5,3,12,8,7,2,4] ; y rows: [None,8,None,1,0,None,9,6]
    assert got["x"] == ([2, 3], [12, 8])
    assert got["y"] == ([0, 1], [9, 8])


def test_topn_bottomn_same_sortby_share_one_sort(df):
    out = compile_pipeline(df, [{"$group": {
        "_id": None,
        "top": {"$topN": {"sortBy": {"v": 1, "_id": 1},
                          "output": "$_id", "n": 3}},
        "bot": {"$bottomN": {"sortBy": {"v": 1, "_id": 1},
                             "output": "$_id", "n": 2}},
    }}], None, None)
    plan = _plan(out)
    assert len(re.findall(r"\+- Sort|^Sort", plan, re.M)) == 1, plan
    row = out.collect()[0]
    # ascending by (v, _id) with nulls first: nulls (_id 1,5,11), then 0,1,2...
    assert row["top"] == [1, 5, 11]
    assert row["bot"] == [13, 6]  # last two in sortBy order: v=9, v=12


def test_minn_maxn_n1_no_window(df):
    out = compile_pipeline(df, [{"$group": {
        "_id": "$g",
        "lo1": {"$minN": {"input": "$v", "n": 1}},
        "hi1": {"$maxN": {"input": "$v", "n": 1}},
    }}], None, None)
    plan = _plan(out)
    assert "Window" not in plan, plan
    got = {r["_id"]: (r["lo1"], r["hi1"]) for r in out.collect()}
    assert got["x"] == ([2], [12])
    assert got["y"] == ([0], [9])


def test_minn_n1_all_null_group_is_empty_array(spark):
    d = spark.createDataFrame(
        [{"_id": 1, "g": "n", "v": None}, {"_id": 2, "g": "n", "v": None},
         {"_id": 3, "g": "m", "v": 4}],
        "`_id` long, g string, v long",
    )
    out = compile_pipeline(d, [{"$group": {
        "_id": "$g",
        "lo1": {"$minN": {"input": "$v", "n": 1}},
        "hi1": {"$maxN": {"input": "$v", "n": 1}},
    }}], None, None)
    got = {r["_id"]: (r["lo1"], r["hi1"]) for r in out.collect()}
    assert got["n"] == ([], [])
    assert got["m"] == ([4], [4])


def test_firstn_lastn_share_one_sort(spark):
    d = spark.createDataFrame(
        [{"_id": i, "v": i * 10} for i in range(8)], "`_id` long, v long"
    ).coalesce(1)
    out = compile_pipeline(d, [
        {"$sort": {"_id": 1}},
        {"$group": {
            "_id": None,
            "head": {"$firstN": {"input": "$v", "n": 2}},
            "tail": {"$lastN": {"input": "$v", "n": 2}},
        }},
    ], None, None)
    plan = _plan(out)
    # one sort for the $sort stage itself + one shared rank sort
    assert len(re.findall(r"\+- Sort|^Sort", plan, re.M)) <= 2, plan
    row = out.collect()[0]
    assert row["head"] == [0, 10]
    assert row["tail"] == [60, 70]


def test_scalar_docs_fast_path_matches_slow_inference(engine, spark):
    # the Arrow fast path in _docs_to_df must reproduce the slow
    # createDataFrame(list-of-dicts) inference exactly: names, types,
    # field order, null handling
    db = engine.database("tpch")
    coll = db.collection("fastdocs_tmp")
    docs = [
        {"_id": 1, "a": None, "b": 2.5, "s": "x", "t": True},
        {"_id": 2, "a": 7, "b": None, "s": None, "t": None},
        {"_id": 3, "a": 0, "b": float("inf"), "s": "", "t": False},
    ]
    fast = coll._scalar_docs_df([dict(d) for d in docs])
    assert fast is not None
    slow = spark.createDataFrame([dict(d) for d in docs])
    assert fast.schema == slow.schema
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )
    # non-scalar values must decline (nested docs take the slow path)
    assert coll._scalar_docs_df([{"_id": 1, "d": {"x": 1}}]) is None
    assert coll._scalar_docs_df([{"_id": 1, "d": [1, 2]}]) is None
    # all-null columns decline to the slow path's dedicated handling
    assert coll._scalar_docs_df([{"_id": 1, "z": None}]) is None
    # end-to-end: insert through the fast path round-trips
    coll.insert({"_id": 10, "v": 1}, {"_id": 11, "v": None})
    got = {r["_id"]: r["v"] for r in coll.find({}).all()}
    assert got == {10: 1, 11: None}


def test_kmeans_argsort_grouping_bit_identical():
    # the argsort-gather Lloyd update (round 14) must reproduce the
    # per-cluster boolean-mask form EXACTLY: stable sort keeps index
    # order within each cluster, so every mean reduces the same rows
    # in the same order — including the empty-cluster farthest-point
    # re-seed, which is constant within one iteration
    import numpy as np

    from anser_spark.operators.pq import _kmeans

    def reference(x, k, rng, max_iter=12):
        centers = [x[rng.randint(len(x))]]
        d2 = ((x - centers[0]) ** 2).sum(axis=1)
        for _ in range(k - 1):
            probs = d2 / d2.sum() if d2.sum() > 0 else None
            nxt = x[rng.choice(len(x), p=probs)]
            centers.append(nxt)
            d2 = np.minimum(d2, ((x - nxt) ** 2).sum(axis=1))
        c = np.array(centers)
        xn = (x * x).sum(axis=1)
        for _ in range(max_iter):
            d = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            assign = d.argmin(axis=1)
            new_c = c.copy()
            for j in range(k):
                members = x[assign == j]
                if len(members):
                    new_c[j] = members.mean(axis=0)
                else:
                    new_c[j] = x[(d.min(axis=1) + xn).argmax()]
            if np.allclose(new_c, c):
                return new_c
            c = new_c
        return c

    for shape, k, seed in [
        ((600, 8), 64, 7),
        ((600, 1), 64, 1),
        ((90, 2), 64, 5),  # duplicates force empty clusters
    ]:
        x = np.random.RandomState(seed).randn(*shape)
        x[::3] = x[0]
        a = reference(x, k, np.random.RandomState(seed))
        b = _kmeans(x, k, np.random.RandomState(seed))
        assert np.array_equal(a, b), (shape, k)


def test_dedup_dispersal_spreads_narrow_input(spark):
    # round 14: the checkpointed postings/signature tables repartition
    # across the join keys when the upstream scan is narrower than the
    # cluster — the candidate joins must not serialize on 1-3 tasks.
    # The shuffle happens BEFORE the eager checkpoint, so it is not a
    # node in the final plan; what this pins is result equality between
    # a 1-partition input (dispersal fires) and a pre-split input
    # (dispersal is a no-op) for both operators.
    from pyspark.sql import functions as F

    from anser_spark.operators.dedup import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    rows = [
        {"doc_id": i, "text": f"alpha beta gamma delta {i % 7} {i % 3}",
         "lang": "en" if i % 2 else "de"}
        for i in range(60)
    ] + [{"doc_id": 1000 + i,
          "text": f"alpha beta gamma delta {i % 7} {i % 3}",
          "lang": "en" if i % 2 else "de"} for i in range(10)]
    narrow = spark.createDataFrame(rows).coalesce(1)
    wide = spark.createDataFrame(rows).repartition(8, "doc_id")

    for fn in (
        lambda d: ngram_jaccard_pairs(d, k=3, threshold=0.4,
                                      block_col=F.col("lang")),
        lambda d: minhash_near_dup_pairs(d, k=3, threshold=1.0),
    ):
        a = sorted(map(tuple, fn(narrow).collect()))
        b = sorted(map(tuple, fn(wide).collect()))
        assert a == b and a, "dispersal must not change pair values"
