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
