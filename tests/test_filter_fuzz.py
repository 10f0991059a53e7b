"""Randomized filter-compiler consistency check: N seeded random Mongo
query documents evaluated two ways — compiled to Columns (one Spark
pass, all filters as boolean projections) vs a pure-Python reference
evaluator implementing Mongo's documented semantics. Catches operator
edge cases the hand-written goldens miss."""

import datetime
import os
import random
import re

from pyspark.sql import functions as F

from anser_spark.functions.filters import compile_filter

FIELDS = {
    "status": ["success", "failed", "started", None],
    "priority": [None, -5, 0, 3, 10, 99],
    "score": [None, 0.1, 0.5, 0.99],
    "version": [0, 1, 2, 3, 4, 5],
    "tags": [[], ["red"], ["red", "blue"], ["green", "blue", "red"], ["yellow"]],
}


def make_rows(rng, n=40):
    rows = []
    for i in range(n):
        rows.append(
            {
                "_id": f"r{i:03d}",
                "status": rng.choice(FIELDS["status"]),
                "priority": rng.choice(FIELDS["priority"]),
                "score": rng.choice(FIELDS["score"]),
                "version": rng.choice(FIELDS["version"]),
                "tags": rng.choice(FIELDS["tags"]),
            }
        )
    return rows


def rand_predicate(rng):
    field = rng.choice(["status", "priority", "score", "version", "tags"])
    if field == "tags":
        op = rng.choice(["eq_scalar", "$size", "$all", "$in", "$elemMatch"])
        if op == "eq_scalar":
            return {"tags": rng.choice(["red", "blue", "nope"])}
        if op == "$size":
            return {"tags": {"$size": rng.randint(0, 3)}}
        if op == "$all":
            return {"tags": {"$all": rng.sample(["red", "blue", "green"], rng.randint(1, 2))}}
        if op == "$elemMatch":
            inner = rng.choice([
                {"$eq": rng.choice(["red", "blue", "nope"])},
                {"$in": rng.sample(["red", "blue", "yellow"], 2)},
                {"$ne": rng.choice(["red", "yellow"])},
            ])
            return {"tags": {"$elemMatch": inner}}
        return {"tags": {"$in": rng.sample(["red", "blue", "yellow", "nope"], 2)}}
    if field == "status":
        op = rng.choice(["eq", "$ne", "$in", "$nin", "$regex", "$exists"])
        v = rng.choice(["success", "failed", "zzz", None])
        if op == "eq":
            return {"status": v}
        if op == "$regex":
            return {"status": {"$regex": rng.choice(["^s", "ed$", "a"])}}
        if op == "$exists":
            return {"status": {"$exists": rng.choice([True, False])}}
        if op in ("$in", "$nin"):
            return {"status": {op: rng.sample(["success", "failed", "zzz"], 2)}}
        if rng.random() < 0.25:
            # $not negates the whole inner condition; null/missing MATCH
            return {"status": {"$not": {op if op != "eq" else "$eq": v}}}
        return {"status": {op: v}}
    # numeric fields
    op = rng.choice(["$gt", "$gte", "$lt", "$lte", "$eq", "$ne", "$mod", "$in"])
    if field == "score":
        v = rng.choice([0.1, 0.5, 0.9])
    else:
        v = rng.choice([-5, 0, 3, 10, 99])
    if op == "$mod":
        return {field: {"$mod": [rng.choice([2, 3]), rng.randint(0, 2)]}}
    if op == "$in":
        return {field: {"$in": [v, v + 1 if isinstance(v, int) else 0.5]}}
    if rng.random() < 0.25:
        return {field: {"$not": {op: v}}}
    return {field: {op: v}}


def rand_filter(rng, depth=0):
    kind = rng.random()
    if depth < 2 and kind < 0.25:
        n = rng.randint(2, 3)
        return {rng.choice(["$and", "$or", "$nor"]): [rand_filter(rng, depth + 1) for _ in range(n)]}
    out = {}
    for _ in range(rng.randint(1, 2)):
        out.update(rand_predicate(rng))
    return out


# ---------------------------------------------------------------------------
# reference evaluator (Mongo semantics, pure Python)
# ---------------------------------------------------------------------------


def _cmp_match(value, op, arg):
    is_arr = isinstance(value, list)
    if op == "$eq":
        if arg is None:
            return value is None
        if is_arr:
            return arg in value or value == arg
        return value == arg
    if op == "$ne":
        return not _cmp_match(value, "$eq", arg)
    if op in ("$gt", "$gte", "$lt", "$lte"):
        import operator

        fn = {"$gt": operator.gt, "$gte": operator.ge, "$lt": operator.lt, "$lte": operator.le}[op]
        if is_arr:
            return any(v is not None and fn(v, arg) for v in value)
        return value is not None and fn(value, arg)
    if op == "$in":
        if is_arr:
            return any(v in arg for v in value)
        return value in arg if value is not None else None in arg
    if op == "$nin":
        return not _cmp_match(value, "$in", arg)
    if op == "$exists":
        return (value is not None) == bool(arg)
    if op == "$regex":
        return value is not None and re.search(arg, value) is not None
    if op == "$mod":
        # Mongo/Spark use truncated (C-style) modulo; Python's % is floored
        if value is None:
            return False
        import math

        return math.fmod(value, arg[0]) == arg[1]
    if op == "$size":
        return is_arr and len(value) == arg
    if op == "$all":
        return is_arr and all(v in value for v in arg)
    if op == "$not":
        # negates the whole inner operator document; docs whose field is
        # null/missing therefore MATCH (they fail the inner predicate)
        return not all(_cmp_match(value, o, a) for o, a in arg.items())
    if op == "$elemMatch":
        if not is_arr:
            return False
        return any(
            all(_cmp_match(elem, o, a) for o, a in arg.items()) for elem in value
        )
    raise AssertionError(op)


def ref_match(doc, flt):
    for key, cond in flt.items():
        if key == "$and":
            if not all(ref_match(doc, f) for f in cond):
                return False
        elif key == "$or":
            if not any(ref_match(doc, f) for f in cond):
                return False
        elif key == "$nor":
            if any(ref_match(doc, f) for f in cond):
                return False
        else:
            value = doc.get(key)
            if isinstance(cond, dict) and all(str(k).startswith("$") for k in cond):
                for op, arg in cond.items():
                    if not _cmp_match(value, op, arg):
                        return False
            else:
                if not _cmp_match(value, "$eq", cond):
                    return False
    return True


def test_filter_fuzz(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "42")))
    rows = make_rows(rng)
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("_id", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("priority", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("version", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    filters = [rand_filter(rng) for _ in range(150)]
    # one Spark job: every filter compiled as a boolean projection
    cols = [
        F.coalesce(compile_filter(flt, schema), F.lit(False)).alias(f"f{i}")
        for i, flt in enumerate(filters)
    ]
    result = df.select(F.col("_id"), *cols).collect()
    spark_matches = {
        i: {r["_id"] for r in result if r[f"f{i}"]} for i in range(len(filters))
    }
    for i, flt in enumerate(filters):
        expected = {d["_id"] for d in rows if ref_match(d, flt)}
        assert spark_matches[i] == expected, (
            f"filter #{i} {flt!r}: spark={sorted(spark_matches[i])} "
            f"expected={sorted(expected)}"
        )
