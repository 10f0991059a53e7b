"""Randomized $group-accumulator consistency check (the aggregation
sibling of test_expr_fuzz / test_filter_fuzz / test_update_fuzz): N
seeded random $group stages run through the pipeline compiler vs a
pure-Python reference implementing Mongo's documented accumulator
semantics — null handling ($sum → 0 on nothing-to-sum, $avg/$min/$max
ignore nulls, $push/$addToSet KEEP nulls), n-variants, and sortBy-based
$topN/$bottomN ordering (unique tie-break key so order is total).

Order-dependent accumulators without their own sortBy ($first/$last/
$firstN/$lastN) are excluded: Mongo leaves their order undefined
without a preceding $sort, and Spark's aggregation order is likewise
nondeterministic — there is no stable oracle.

This fuzzer drove the $sum-null and $push/$addToSet null-drop fixes.
"""

import math
import os
import random

import pytest

from anser_spark.plans.pipeline import compile_pipeline


def make_rows(rng, n=80):
    rows = []
    for i in range(n):
        rows.append({
            "_id": i,
            "g": rng.choice(["x", "y", "z", None]),
            "h": rng.choice([0, 1, 2]),
            "a": rng.choice([None, rng.randint(-50, 50)]),
            "b": rng.choice([None, rng.randint(0, 9)]),
        })
    return rows


ACCS = ["$sum", "$sum1", "$avg", "$min", "$max", "$count", "$push",
        "$addToSet", "$stdDevPop", "$stdDevSamp", "$minN", "$maxN",
        "$topN", "$bottomN", "$top", "$bottom", "$median", "$percentile"]


def rand_acc(rng):
    op = rng.choice(ACCS)
    field = rng.choice(["$a", "$b"])
    if op == "$sum1":
        return {"$sum": rng.choice([1, 2])}
    if op in ("$sum", "$avg", "$min", "$max", "$push", "$addToSet",
              "$stdDevPop", "$stdDevSamp"):
        return {op: field}
    if op == "$count":
        return {"$count": {}}
    if op in ("$minN", "$maxN"):
        return {op: {"input": field, "n": rng.randint(1, 4)}}
    if op in ("$topN", "$bottomN"):
        # _id in sortBy makes the order total ⇒ deterministic output
        return {op: {"sortBy": {"a": 1, "_id": 1}, "output": field,
                     "n": rng.randint(1, 4)}}
    if op in ("$top", "$bottom"):
        return {op: {"sortBy": {"a": 1, "_id": 1}, "output": field}}
    if op == "$median":
        return {"$median": {"input": field, "method": "exact"}}
    return {"$percentile": {"input": field,
                            "p": [rng.choice([0.25, 0.5, 0.9])],
                            "method": "exact"}}


# ---- pure-Python reference (Mongo accumulator semantics) ----


def _bson_key(doc, field):
    v = doc.get(field)
    return ((0,) if v is None else (1, v))


def ref_group(docs, id_field, accs):
    groups = {}
    for d in docs:
        groups.setdefault(d.get(id_field), []).append(d)
    out = []
    for key, members in groups.items():
        row = {"_id": key}
        for name, spec in accs.items():
            (op, arg), = spec.items()
            row[name] = ref_acc(op, arg, members)
        out.append(row)
    return out


def _percentile_linear(vals, p):
    """numpy-style linear interpolation (Spark's exact percentile)."""
    vals = sorted(vals)
    if not vals:
        return None
    k = (len(vals) - 1) * p
    lo = math.floor(k)
    hi = math.ceil(k)
    if lo == hi:
        return float(vals[lo])
    return vals[lo] + (vals[hi] - vals[lo]) * (k - lo)


def ref_acc(op, arg, members):
    if op == "$sum" and isinstance(arg, int):
        return len(members) * arg
    if op == "$count":
        return len(members)
    field = arg["input"][1:] if isinstance(arg, dict) and "input" in arg else (
        arg[1:] if isinstance(arg, str) else None)
    vals = [m.get(field) for m in members] if field else []
    nums = [v for v in vals if v is not None]
    if op == "$sum":
        return sum(nums)  # empty → 0, Mongo's rule
    if op == "$avg":
        return sum(nums) / len(nums) if nums else None
    if op == "$min":
        return min(nums) if nums else None
    if op == "$max":
        return max(nums) if nums else None
    if op == "$push":
        return vals  # keeps nulls
    if op == "$addToSet":
        seen = []
        for v in vals:
            if v not in seen:
                seen.append(v)
        return seen
    if op == "$stdDevPop":
        if not nums:
            return None
        mu = sum(nums) / len(nums)
        return math.sqrt(sum((x - mu) ** 2 for x in nums) / len(nums))
    if op == "$stdDevSamp":
        if len(nums) < 2:
            return None
        mu = sum(nums) / len(nums)
        return math.sqrt(sum((x - mu) ** 2 for x in nums) / (len(nums) - 1))
    if op == "$minN":
        return sorted(nums)[: arg["n"]]
    if op == "$maxN":
        return sorted(nums, reverse=True)[: arg["n"]]
    if op in ("$top", "$bottom"):
        ordered = sorted(members, key=lambda m: (_bson_key(m, "a"),
                                                 _bson_key(m, "_id")))
        pick = ordered[0] if op == "$top" else ordered[-1]
        return pick.get(arg["output"][1:])
    if op in ("$topN", "$bottomN"):
        ordered = sorted(members, key=lambda m: (_bson_key(m, "a"),
                                                 _bson_key(m, "_id")))
        if op == "$bottomN":
            ordered = ordered[-arg["n"]:]
        else:
            ordered = ordered[: arg["n"]]
        out_field = arg["output"][1:]
        return [m.get(out_field) for m in ordered]
    if op == "$median":
        return _percentile_linear(nums, 0.5)
    if op == "$percentile":
        # Mongo: no numeric values ⇒ null (not an array of nulls) —
        # Spark's F.percentile agrees; caught by the seed-777 shake
        if not nums:
            return None
        return [_percentile_linear(nums, p) for p in arg["p"]]
    raise AssertionError(op)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def test_group_accumulator_fuzz(spark):
    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813"))
    rng = random.Random(seed)
    rows = make_rows(rng)
    df = spark.createDataFrame(
        [(r["_id"], r["g"], r["h"], r["a"], r["b"]) for r in rows],
        "_id long, g string, h long, a long, b long",
    )
    mism = []
    for trial in range(12):
        accs = {f"o{i}": rand_acc(rng) for i in range(6)}
        stage = {"$group": {"_id": "$g", **accs}}
        got = {r["_id"]: r.asDict() for r in
               compile_pipeline(df, [stage], None, None).collect()}
        exp = {r["_id"]: r for r in ref_group(rows, "g", accs)}
        assert set(got) == set(exp), (trial, set(got) ^ set(exp))
        for key, erow in exp.items():
            grow = got[key]
            for name, spec in accs.items():
                e, g = erow[name], grow[name]
                (op, _), = spec.items()
                if op in ("$push", "$addToSet", "$minN", "$maxN"):
                    # cross-partition order is nondeterministic for the
                    # collectors → compare as multisets; n-variants are
                    # order-defined but ties between equal values aren't
                    ok = sorted(map(str, map(_norm, e or []))) == \
                        sorted(map(str, map(_norm, g or [])))
                elif isinstance(e, float) and g is not None:
                    ok = abs(e - g) < 1e-6
                elif isinstance(e, list):
                    ok = g is not None and len(e) == len(g) and all(
                        (a is None and b is None)
                        or (a is not None and b is not None
                            and abs(float(a) - float(b)) < 1e-6)
                        for a, b in zip(e, g))
                else:
                    ok = _norm(e) == _norm(g)
                if not ok:
                    mism.append((trial, key, name, spec, e, g))
    assert not mism, mism[:5]


def test_group_sum_empty_is_zero(spark):
    # the specific Mongo rule the fuzzer is built around: nothing to
    # sum ⇒ 0, never null
    df = spark.createDataFrame([("x", None), ("x", None)], "g string, a long")
    out = compile_pipeline(df, [{"$group": {"_id": "$g", "t": {"$sum": "$a"}}}],
                           None, None).collect()
    assert out[0]["t"] == 0


def test_group_push_keeps_nulls(spark):
    df = spark.createDataFrame([("x", 1), ("x", None), ("x", 3)],
                               "g string, a long")
    out = compile_pipeline(df, [{"$group": {"_id": "$g",
                                            "arr": {"$push": "$a"},
                                            "st": {"$addToSet": "$a"}}}],
                           None, None).collect()
    assert sorted(out[0]["arr"], key=lambda v: (v is None, v)) == [1, 3, None]
    assert None in out[0]["st"] and {1, 3} <= {v for v in out[0]["st"] if v}


def test_group_global_topn_fuzz(spark):
    # _id: None with the $topN family — the round-7 bounded-state path
    # (salt-only window prefilter instead of collecting the whole
    # dataset into one agg buffer). 6 seeded trials × 4 N-accumulators.
    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813"))
    rng = random.Random(seed + 11)
    rows = make_rows(rng, n=120)
    df = spark.createDataFrame(
        [(r["_id"], r["g"], r["h"], r["a"], r["b"]) for r in rows],
        "_id long, g string, h long, a long, b long",
    )
    mism = []
    for trial in range(6):
        accs = {f"o{i}": rand_acc(rng) for i in range(4)}
        # force at least one N-accumulator into every trial
        accs["oN"] = rng.choice([
            {"$topN": {"sortBy": {"a": 1, "_id": 1}, "output": "$b", "n": 3}},
            {"$bottomN": {"sortBy": {"a": 1, "_id": 1}, "output": "$b", "n": 2}},
            {"$minN": {"input": "$a", "n": 3}},
            {"$maxN": {"input": "$b", "n": 4}},
        ])
        stage = {"$group": {"_id": None, **accs}}
        got_rows = compile_pipeline(df, [stage], None, None).collect()
        assert len(got_rows) == 1 and got_rows[0]["_id"] is None
        got = got_rows[0].asDict()
        exp = {name: ref_acc(*next(iter(spec.items())), rows)
               for name, spec in accs.items()}
        for name, spec in accs.items():
            e, g = exp[name], got[name]
            (op, _), = spec.items()
            if op in ("$push", "$addToSet", "$minN", "$maxN"):
                ok = sorted(map(str, map(_norm, e or []))) == \
                    sorted(map(str, map(_norm, g or [])))
            elif isinstance(e, float) and g is not None:
                ok = abs(e - g) < 1e-6
            elif isinstance(e, list):
                ok = g is not None and len(e) == len(g) and all(
                    (x is None and y is None)
                    or (x is not None and y is not None
                        and abs(float(x) - float(y)) < 1e-6)
                    for x, y in zip(e, g))
            else:
                ok = _norm(e) == _norm(g)
            if not ok:
                mism.append((trial, name, spec, e, g))
    assert not mism, mism[:5]


def test_group_global_topn_plan_is_bounded(spark):
    # the executed plan must show the salted window prefilter (a Window
    # node), not a bare whole-dataset collect_list aggregate
    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "id int, v double")
    out = compile_pipeline(df, [{"$group": {
        "_id": None,
        "t": {"$topN": {"sortBy": {"v": 1}, "output": "$id", "n": 5}}}}],
        None, None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan, plan[:2000]
    # empty input still emits zero rows (Mongo's $group rule)
    empty = compile_pipeline(df.where("id < 0"), [{"$group": {
        "_id": None,
        "t": {"$topN": {"sortBy": {"v": 1}, "output": "$id", "n": 5}}}}],
        None, None)
    assert empty.count() == 0


def test_group_compound_and_expr_id_fuzz(spark):
    # compound-document and expression _id forms over the same random
    # accumulators (the flat-key grouping + struct re-nest path)
    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813"))
    rng = random.Random(seed + 7)
    rows = make_rows(rng)
    df = spark.createDataFrame(
        [(r["_id"], r["g"], r["h"], r["a"], r["b"]) for r in rows],
        "_id long, g string, h long, a long, b long",
    )
    mism = []
    for trial in range(8):
        accs = {f"o{i}": rand_acc(rng) for i in range(4)}
        compound = trial % 2 == 0
        if compound:
            stage = {"$group": {"_id": {"g": "$g", "h": "$h"}, **accs}}
        else:
            stage = {"$group": {"_id": {"$mod": ["$h", 2]}, **accs}}
        got_rows = compile_pipeline(df, [stage], None, None).collect()
        if compound:
            got = {(r["_id"]["g"], r["_id"]["h"]): r.asDict() for r in got_rows}
            keyf = lambda d: (d["g"], d["h"])  # noqa: E731
        else:
            got = {r["_id"]: r.asDict() for r in got_rows}
            keyf = lambda d: (d["h"] % 2) if d["h"] is not None else None  # noqa: E731
        groups = {}
        for d in rows:
            groups.setdefault(keyf(d), []).append(d)
        exp = {}
        for key, members in groups.items():
            exp[key] = {name: ref_acc(*next(iter(spec.items())), members)
                        for name, spec in accs.items()}
        assert set(got) == set(exp)
        for key, erow in exp.items():
            for name, spec in accs.items():
                e, g = erow[name], got[key][name]
                (op, _), = spec.items()
                if op in ("$push", "$addToSet", "$minN", "$maxN"):
                    ok = sorted(map(str, map(_norm, e or []))) == \
                        sorted(map(str, map(_norm, g or [])))
                elif isinstance(e, float) and g is not None:
                    ok = abs(e - g) < 1e-6
                elif isinstance(e, list):
                    ok = g is not None and len(e) == len(g) and all(
                        (x is None and y is None)
                        or (x is not None and y is not None
                            and abs(float(x) - float(y)) < 1e-6)
                        for x, y in zip(e, g))
                else:
                    ok = _norm(e) == _norm(g)
                if not ok:
                    mism.append((trial, key, name, spec, e, g))
    assert not mism, mism[:5]


def test_bucket_output_accumulator_fuzz(spark):
    # $bucket `output` accumulators route through the SAME compiler as
    # $group (round 8: including the bounded N-accumulator prefilter —
    # buckets are few and huge by construction, the exact shape the
    # whole-bucket collect form OOMs on). Seeded random boundaries over
    # a nullable field (nulls + out-of-range → numeric default bucket)
    # x random accumulators, vs the Python reference.
    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813"))
    rng = random.Random(seed + 13)
    rows = make_rows(rng, n=100)
    df = spark.createDataFrame(
        [(r["_id"], r["g"], r["h"], r["a"], r["b"]) for r in rows],
        "_id long, g string, h long, a long, b long",
    )
    mism = []
    for trial in range(6):
        cuts = sorted(rng.sample(range(-50, 51), rng.randint(2, 5)))
        accs = {f"o{i}": rand_acc(rng) for i in range(3)}
        # force an N-accumulator into every trial — the path under test
        accs["oN"] = rng.choice([
            {"$topN": {"sortBy": {"a": 1, "_id": 1}, "output": "$b", "n": 3}},
            {"$bottomN": {"sortBy": {"a": 1, "_id": 1}, "output": "$b", "n": 2}},
            {"$minN": {"input": "$b", "n": 3}},
            {"$maxN": {"input": "$a", "n": 4}},
            {"$firstN": {"input": "$b", "n": 3}},
        ])
        stage = {"$bucket": {"groupBy": "$a", "boundaries": cuts,
                             "default": -999, "output": accs}}
        got = {r["_id"]: r.asDict() for r in
               compile_pipeline(df, [stage], None, None).collect()}

        def bkt(v):
            if v is None or v < cuts[0] or v >= cuts[-1]:
                return -999
            for lo, hi in zip(cuts, cuts[1:]):
                if lo <= v < hi:
                    return lo

        buckets = {}
        for r in rows:
            buckets.setdefault(bkt(r.get("a")), []).append(r)
        assert set(got) == set(buckets), (trial, cuts,
                                          set(got) ^ set(buckets))
        for key, members in buckets.items():
            grow = got[key]
            for name, spec in accs.items():
                (op, arg), = spec.items()
                if op == "$firstN":
                    # document-order-dependent: only the contract Mongo
                    # gives without $sort — right length, values drawn
                    # from the bucket
                    g = grow[name]
                    pool = [m.get("b") for m in members]
                    ok = (g is not None
                          and len(g) == min(arg["n"], len(members))
                          and all(v in pool for v in g))
                    if not ok:
                        mism.append((trial, key, name, spec, pool, g))
                    continue
                e, g = ref_acc(op, arg, members), grow[name]
                if op in ("$push", "$addToSet", "$minN", "$maxN"):
                    ok = sorted(map(str, map(_norm, e or []))) == \
                        sorted(map(str, map(_norm, g or [])))
                elif isinstance(e, float) and g is not None:
                    ok = abs(e - g) < 1e-6
                elif isinstance(e, list):
                    ok = g is not None and len(e) == len(g) and all(
                        (x is None and y is None)
                        or (x is not None and y is not None
                            and abs(float(x) - float(y)) < 1e-6)
                        for x, y in zip(e, g))
                else:
                    ok = _norm(e) == _norm(g)
                if not ok:
                    mism.append((trial, key, name, spec, e, g))
    assert not mism, mism[:5]
