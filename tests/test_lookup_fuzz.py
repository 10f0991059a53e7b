"""Seeded differential fuzzer for classic $lookup (scalar and ARRAY
local/foreign fields, optional fused $unwind with/without
preserveNullAndEmptyArrays) vs a pure-Python nested-loop evaluator of
Mongo's documented semantics: array fields match on ANY element,
null/missing match null foreign values, unmatched docs keep [] (or are
dropped / null-filled by the $unwind variant)."""

import os
import random

from pyspark.sql import types as T

L_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("k", T.LongType()),
        T.StructField("ks", T.ArrayType(T.LongType())),
    ]
)
F_SCHEMA = T.StructType(
    [
        T.StructField("fid", T.LongType()),
        T.StructField("fk", T.LongType()),
        T.StructField("fks", T.ArrayType(T.LongType())),
    ]
)


def make_data(rng):
    local = [
        {
            "_id": i,
            "k": rng.choice([None, 1, 2, 3, 4]),
            "ks": rng.choice([None, [], [1], [2, 3], [1, 1, 4], [None, 2]]),
        }
        for i in range(12)
    ]
    foreign = [
        {
            "fid": j,
            "fk": rng.choice([None, 1, 2, 3, 5]),
            "fks": rng.choice([None, [], [1, 2], [3], [4, 5], [None]]),
        }
        for j in range(8)
    ]
    return local, foreign


def ref_matches(lv, fv, l_arr, f_arr):
    """Mongo classic-$lookup equality (the generated
    {foreignField: {$in: localElements}} query): array sides match on
    ANY element; a NULL/missing array is the null value (pairs with
    null); an EMPTY array has no elements and matches nothing."""
    if l_arr:
        if lv is None:
            lvals = [None]
        elif lv == []:
            return False
        else:
            lvals = list(lv)
    else:
        lvals = [lv]
    if f_arr:
        if fv is None:
            fvals = [None]
        elif fv == []:
            return False
        else:
            fvals = list(fv)
    else:
        fvals = [fv]
    return any(a == b for a in lvals for b in fvals)


def test_lookup_pipeline_fuzz(spark):
    """Pipeline/let-form $lookup differential fuzzer (round 7): random
    correlated sub-pipelines over equality + theta ($gte/$lt) $expr
    conditions, with and without a decorrelated $group (keyed and
    global _id: None) — vs a pure-Python evaluator of Mongo's
    documented semantics ($eq null==null true; empty-input $group
    emits nothing → empty array). Theta operands are kept non-null on
    the REFERENCE side: Mongo's BSON order ranks null below numbers
    while Spark's null comparison is three-valued (both drop the row
    here, so the outcomes agree; null vs null / value vs null theta is
    a documented divergence, not fuzzed)."""
    from anser_spark.plans.pipeline import compile_pipeline

    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "29")))
    shapes = ["eq", "eq_theta", "theta", "eq_group", "group_global",
              "eq_project"]
    for trial in range(12):
        shape = shapes[trial % len(shapes)]
        local = [
            {"_id": i, "k": rng.choice([None, 1, 2, 3]),
             "v": rng.randint(0, 9)}
            for i in range(10)
        ]
        foreign = [
            {"fid": j, "fk": rng.choice([None, 1, 2, 4]),
             "fv": rng.randint(0, 9)}
            for j in range(9)
        ]
        ldf = spark.createDataFrame(
            local, "_id long, k long, v long")
        fdf = spark.createDataFrame(
            foreign, "fid long, fk long, fv long")

        theta_op = rng.choice(["$gte", "$lt"])
        conds, let = [], {}
        if shape != "theta":
            let["lk"] = "$k"
            conds.append({"$eq": ["$$lk", "$fk"]})
        if "theta" in shape:
            let["lv"] = "$v"
            conds.append({theta_op: ["$fv", "$$lv"]})
        expr = conds[0] if len(conds) == 1 else {"$and": conds}
        sub = [{"$match": {"$expr": expr}}]
        grouped = shape in ("eq_group", "group_global")
        if grouped:
            gid = None if shape == "group_global" else "$fk"
            sub.append({"$group": {"_id": gid, "n": {"$sum": 1},
                                   "s": {"$sum": "$fv"}}})
        if shape == "eq_project":
            sub.append({"$project": {"fid": 1, "fv": 1}})
        stages = [{"$lookup": {"from": "f", "let": let,
                               "pipeline": sub, "as": "m"}}]
        out = compile_pipeline(ldf, stages, lambda name: fdf, None)
        rows = out.collect()

        def pred(d, f):
            ok = True
            for c in conds:
                (op, (a, b)), = c.items() if len(c) == 1 else (("$and", (None, None)),)
                if op == "$and":
                    continue
                av = d["k"] if a == "$$lk" else d["v"] if a == "$$lv" else f[a[1:]]
                bv = d["k"] if b == "$$lk" else d["v"] if b == "$$lv" else f[b[1:]]
                if op == "$eq":
                    ok = ok and av == bv
                elif op == "$gte":
                    ok = ok and av is not None and bv is not None and av >= bv
                else:
                    ok = ok and av is not None and bv is not None and av < bv
            return ok

        mism = []
        got = {r["_id"]: r["m"] for r in rows}
        for d in local:
            ms = [f for f in foreign if pred(d, f)]
            if shape == "eq_project":
                e = sorted((f["fid"], f["fv"]) for f in ms)
                g = sorted(
                    (m["fid"], m["fv"]) for m in (got[d["_id"]] or [])
                )
            elif not grouped:
                e = sorted(f["fid"] for f in ms)
                g = sorted(m["fid"] for m in (got[d["_id"]] or []))
            else:
                groups = {}
                for f in ms:
                    key = None if shape == "group_global" else f["fk"]
                    groups.setdefault(key, []).append(f)
                e = sorted(
                    (k, len(v), sum(f["fv"] for f in v))
                    for k, v in groups.items()
                )
                g = sorted(
                    (m["_id"], m["n"], m["s"]) for m in (got[d["_id"]] or [])
                )
            if e != g:
                mism.append((trial, shape, d["_id"], e, g))
        assert not mism, mism[:4]


def test_lookup_fuzz(spark):
    from anser_spark.plans.pipeline import compile_pipeline

    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "23")))
    for trial in range(16):
        local, foreign = make_data(rng)
        ldf = spark.createDataFrame(local, L_SCHEMA)
        fdf = spark.createDataFrame(foreign, F_SCHEMA)
        l_arr = rng.random() < 0.5
        f_arr = rng.random() < 0.5
        local_f = "ks" if l_arr else "k"
        foreign_f = "fks" if f_arr else "fk"
        unwind = rng.choice([None, False, True])  # None = plain lookup

        stages = [
            {"$lookup": {
                "from": "f", "localField": local_f,
                "foreignField": foreign_f, "as": "m",
            }}
        ]
        if unwind is not None:
            spec = {"path": "$m"}
            if unwind:
                spec["preserveNullAndEmptyArrays"] = True
            stages.append({"$unwind": spec})

        out = compile_pipeline(ldf, stages, lambda name: fdf, None)
        rows = out.collect()

        # pure-Python reference
        expect = {}
        for d in local:
            ms = sorted(
                f["fid"] for f in foreign
                if ref_matches(d[local_f], f[foreign_f], l_arr, f_arr)
            )
            expect[d["_id"]] = ms

        if unwind is None:
            got = {
                r["_id"]: sorted(m["fid"] for m in (r["m"] or []))
                for r in rows
            }
            assert got == expect, f"trial {trial} {local_f}->{foreign_f}"
        else:
            got_pairs = sorted(
                (r["_id"], r["m"]["fid"] if r["m"] is not None else None)
                for r in rows
            )
            want_pairs = []
            for _id, ms in expect.items():
                if ms:
                    want_pairs.extend((_id, fid) for fid in ms)
                elif unwind:  # preserve: one row, null m
                    want_pairs.append((_id, None))
            assert got_pairs == sorted(want_pairs), (
                f"trial {trial} {local_f}->{foreign_f} unwind={unwind}: "
                f"{got_pairs} vs {sorted(want_pairs)}"
            )


def test_lookup_theta_only_and_uncorrelated_expr(spark):
    """Round-7: pipeline-form $lookup with NO let-variable equality —
    theta-only correlation (non-equi join) and a fully uncorrelated
    $expr (broadcast-pack path) both compile instead of raising."""
    from anser_spark.plans.pipeline import compile_pipeline

    ldf = spark.createDataFrame(
        [(1, 5), (2, 8), (3, 0)], "_id long, v long")
    fdf = spark.createDataFrame(
        [(10, 4), (11, 7), (12, 9)], "fid long, fv long")

    # theta-only: all foreign rows with fv >= the outer row's v
    out = compile_pipeline(ldf, [
        {"$lookup": {"from": "f", "let": {"lv": "$v"},
                     "pipeline": [{"$match": {"$expr": {"$gte": ["$fv", "$$lv"]}}}],
                     "as": "m"}},
    ], lambda name: fdf, None)
    got = {r["_id"]: sorted(m["fid"] for m in r["m"]) for r in out.collect()}
    assert got == {1: [11, 12], 2: [12], 3: [10, 11, 12]}

    # theta-only + fused $unwind (inner)
    out2 = compile_pipeline(ldf, [
        {"$lookup": {"from": "f", "let": {"lv": "$v"},
                     "pipeline": [{"$match": {"$expr": {"$lt": ["$fv", "$$lv"]}}}],
                     "as": "m"}},
        {"$unwind": "$m"},
    ], lambda name: fdf, None)
    pairs = sorted((r["_id"], r["m"]["fid"]) for r in out2.collect())
    assert pairs == [(1, 10), (2, 10), (2, 11)]

    # fully uncorrelated $expr: same filtered array for every outer row
    out3 = compile_pipeline(ldf, [
        {"$lookup": {"from": "f",
                     "pipeline": [{"$match": {"$expr": {"$gt": ["$fv", 5]}}}],
                     "as": "m"}},
    ], lambda name: fdf, None)
    got3 = {r["_id"]: sorted(m["fid"] for m in r["m"]) for r in out3.collect()}
    assert got3 == {1: [11, 12], 2: [11, 12], 3: [11, 12]}
