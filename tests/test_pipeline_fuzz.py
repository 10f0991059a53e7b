"""Randomized PIPELINE COMPOSITION check — the integration sibling of
the per-domain fuzzers (filter / expression / update / group): N seeded
random multi-stage pipelines ($match → $unwind → $addFields → $group |
$project → $sort/$skip/$limit) compiled by plans/pipeline.py vs a
pure-Python reference engine applying Mongo's documented stage
semantics over the same 40 docs.  The per-stage fuzzers prove each
compiler in isolation; this one hunts the bugs BETWEEN stages — schema
threading, null propagation across stage boundaries, $unwind's
empty-array drop feeding $group, group-key null conflation, skip/limit
after a total-order sort.

Drove the empty-input $group fix (Mongo emits nothing; Spark's global
aggregate emits one row).
"""

import os
import random

import pytest

from anser_spark.plans.pipeline import compile_pipeline

from test_filter_fuzz import make_rows, rand_filter, ref_match


# ---- tiny expression generator/evaluator (numeric, Mongo null rules) ----


def rand_num_expr(rng, num_fields, depth=0):
    if depth >= 2 or rng.random() < 0.4:
        return rng.choice([f"${f}" for f in num_fields] + [rng.randint(-5, 9)])
    op = rng.choice(["$add", "$multiply", "$subtract", "$ifNull", "$cond", "$abs"])
    if op in ("$add", "$multiply"):
        return {op: [rand_num_expr(rng, num_fields, depth + 1) for _ in range(2)]}
    if op == "$subtract":
        return {op: [rand_num_expr(rng, num_fields, depth + 1),
                     rand_num_expr(rng, num_fields, depth + 1)]}
    if op == "$ifNull":
        return {op: [rand_num_expr(rng, num_fields, depth + 1),
                     rng.randint(-5, 9)]}
    if op == "$abs":
        return {op: rand_num_expr(rng, num_fields, depth + 1)}
    return {"$cond": [
        {"$gt": [rand_num_expr(rng, num_fields, depth + 1), rng.randint(-3, 5)]},
        rand_num_expr(rng, num_fields, depth + 1),
        rand_num_expr(rng, num_fields, depth + 1),
    ]}


def ev_num(expr, doc):
    if isinstance(expr, str) and expr.startswith("$"):
        return doc.get(expr[1:])
    if isinstance(expr, (int, float)):
        return expr
    (op, arg), = expr.items()
    if op == "$ifNull":
        v = ev_num(arg[0], doc)
        return ev_num(arg[1], doc) if v is None else v
    if op == "$cond":
        return ev_num(arg[1], doc) if ev_bool(arg[0], doc) else ev_num(arg[2], doc)
    vals = [ev_num(a, doc) for a in (arg if isinstance(arg, list) else [arg])]
    if any(v is None for v in vals):
        return None
    if op == "$add":
        return vals[0] + vals[1]
    if op == "$multiply":
        return vals[0] * vals[1]
    if op == "$subtract":
        return vals[0] - vals[1]
    if op == "$abs":
        return abs(vals[0])
    raise AssertionError(op)


def ev_bool(expr, doc):
    (op, arg), = expr.items()
    a, b = ev_num(arg[0], doc), ev_num(arg[1], doc)
    ka = (0,) if a is None else (1, a)
    kb = (0,) if b is None else (1, b)
    return ka > kb  # $gt under BSON ordering (null below numbers)


# ---- reference stage applications ----


def ref_unwind(docs, field):
    out = []
    for d in docs:
        arr = d.get(field)
        if not arr:
            continue  # Mongo default: null/missing/empty drop the doc
        for el in arr:
            nd = dict(d)
            nd[field] = el
            out.append(nd)
    return out


def ref_group(docs, id_expr, accs):
    groups: dict = {}
    order = []
    for d in docs:
        key = None if id_expr is None else d.get(id_expr[1:])
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(d)
    out = []
    for key in order:
        members = groups[key]
        row = {"_id": key}
        for name, spec in accs.items():
            (op, arg), = spec.items()
            if op == "$count":
                row[name] = len(members)
                continue
            if op == "$sum" and isinstance(arg, int):
                row[name] = len(members) * arg
                continue
            vals = [m.get(arg[1:]) for m in members]
            nums = [v for v in vals if v is not None]
            if op == "$sum":
                row[name] = sum(nums)
            elif op == "$avg":
                row[name] = sum(nums) / len(nums) if nums else None
            elif op == "$min":
                row[name] = min(nums) if nums else None
            elif op == "$max":
                row[name] = max(nums) if nums else None
            elif op == "$push":
                row[name] = vals
            else:
                raise AssertionError(op)
        out.append(row)
    return out


def _bson_key(v):
    return (0,) if v is None else (1, v)


# ---- pipeline generator ----


def gen_pipeline(rng):
    """Returns (stages, plan) where plan is the matching list of
    reference-side callables' specs."""
    stages = []
    num_fields = ["priority", "score", "version"]
    str_fields = ["status"]
    grouped = False
    unwound = False

    if rng.random() < 0.8:
        stages.append({"$match": rand_filter(rng)})
    if rng.random() < 0.35:
        stages.append({"$unwind": "$tags"})
        unwound = True
    if rng.random() < 0.5:
        expr = rand_num_expr(rng, num_fields)
        stages.append({"$addFields": {"x1": expr}})
        num_fields = num_fields + ["x1"]
    if rng.random() < 0.6:
        grouped = True
        id_choice = rng.choice(
            [None, "$status", "$version"] + (["$tags"] if unwound else []))
        accs = {}
        for i in range(rng.randint(1, 3)):
            op = rng.choice(["$sum", "$avg", "$min", "$max", "$count",
                             "$sum1", "$push"])
            f = f"${rng.choice(num_fields)}"
            if op == "$count":
                accs[f"a{i}"] = {"$count": {}}
            elif op == "$sum1":
                accs[f"a{i}"] = {"$sum": rng.choice([1, 3])}
            else:
                accs[f"a{i}"] = {op: f}
        stages.append({"$group": {"_id": id_choice, **accs}})
    elif rng.random() < 0.5:
        keep = rng.sample(num_fields + str_fields, rng.randint(1, 2))
        stages.append({"$project": {f: 1 for f in keep}})
    if rng.random() < 0.5:
        stages.append({"$sort": {"_id": 1}})
        if rng.random() < 0.5:
            stages.append({"$skip": rng.randint(0, 3)})
        stages.append({"$limit": rng.randint(1, 25)})
    return stages


def ref_pipeline(docs, stages):
    cur = [dict(d) for d in docs]
    for stage in stages:
        (op, arg), = stage.items()
        if op == "$match":
            cur = [d for d in cur if ref_match(d, arg)]
        elif op == "$unwind":
            cur = ref_unwind(cur, arg[1:])
        elif op == "$addFields":
            for name, expr in arg.items():
                for d in cur:
                    d[name] = ev_num(expr, d)
        elif op == "$group":
            g = dict(arg)
            cur = ref_group(cur, g.pop("_id"), g)
        elif op == "$project":
            cur = [{"_id": d["_id"], **{f: d.get(f) for f in arg}} for d in cur]
        elif op == "$sort":
            cur = sorted(cur, key=lambda d: _bson_key(d.get("_id")))
        elif op == "$skip":
            cur = cur[arg:]
        elif op == "$limit":
            cur = cur[:arg]
        else:
            raise AssertionError(op)
    return cur


def _cv(x):
    # numerics compare as doubles: Spark unifies branch/accumulator
    # types column-wide (one type per column), BSON keeps per-value
    # types — a documented engine-level divergence, not a value bug
    if isinstance(x, bool) or x is None:
        return str(x)
    if isinstance(x, (int, float)):
        return repr(round(float(x), 6))
    return str(x)


def canon(rows, multiset_cols):
    out = []
    for r in rows:
        items = []
        for k in sorted(r):
            v = r[k]
            if isinstance(v, (list, tuple)):
                vals = [_cv(x) for x in v]
                if k in multiset_cols:
                    vals = sorted(vals)
                items.append((k, tuple(vals)))
            else:
                items.append((k, _cv(v)))
        out.append(tuple(items))
    return sorted(out)


def test_pipeline_composition_fuzz(spark):
    from pyspark.sql import types as T

    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260814"))
    rng = random.Random(seed)
    rows = make_rows(rng)
    schema = T.StructType([
        T.StructField("_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("version", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(rows, schema)
    failures = []
    for trial in range(40):
        stages = gen_pipeline(rng)
        multiset_cols = {
            name
            for s in stages if "$group" in s
            for name, spec in s["$group"].items()
            if isinstance(spec, dict) and "$push" in spec
        }
        # a $limit/$skip without a preceding total-order $sort would be
        # nondeterministic — the generator always pairs them
        try:
            got = [r.asDict() for r in
                   compile_pipeline(df, stages, None, None).collect()]
        except Exception as exc:  # pragma: no cover - debugging aid
            failures.append((trial, stages, "COMPILE/RUN", repr(exc)))
            continue
        exp = ref_pipeline(rows, stages)
        if canon(got, multiset_cols) != canon(exp, multiset_cols):
            failures.append((trial, stages,
                             canon(exp, multiset_cols)[:4],
                             canon(got, multiset_cols)[:4]))
    assert not failures, failures[:2]


def test_group_empty_input_emits_nothing(spark):
    # the specific rule this fuzzer drove: $group over zero docs
    # produces zero groups, even with _id: None
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    out = compile_pipeline(
        df,
        [{"$match": {"a": {"$gt": 100}}},
         {"$group": {"_id": None, "n": {"$sum": 1}, "t": {"$sum": "$b"}}}],
        None, None,
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# Wider composition: $lookup / $unwind-preserve / $sortByCount mixed in
# ---------------------------------------------------------------------------

DIM_ROWS = [
    {"status": "success", "weight": 3},
    {"status": "failed", "weight": 7},
    {"status": "started", "weight": 1},
    {"status": "success", "weight": 5},
]


def ref_lookup(docs, dim, local, foreign, out):
    res = []
    for d in docs:
        lv = d.get(local)
        matches = [dict(m) for m in dim if m.get(foreign) == lv
                   or (m.get(foreign) is None and lv is None)]
        nd = dict(d)
        nd[out] = matches
        res.append(nd)
    return res


def ref_unwind_preserve(docs, field):
    res = []
    for d in docs:
        arr = d.get(field)
        if not arr:
            nd = dict(d)
            nd[field] = None
            res.append(nd)
            continue
        for el in arr:
            nd = dict(d)
            nd[field] = el
            res.append(nd)
    return res


def gen_pipeline2(rng):
    stages = []
    if rng.random() < 0.7:
        stages.append({"$match": rand_filter(rng)})
    kind = rng.random()
    if kind < 0.45:
        # classic lookup into the dim table (+ optional fused unwind)
        stages.append({"$lookup": {"from": "dim", "localField": "status",
                                   "foreignField": "status", "as": "w"}})
        if rng.random() < 0.6:
            stages.append({"$unwind": "$w"})
            stages.append({"$addFields": {"wv": "$w.weight"}})
            stages.append({"$unset": "w"})
        else:
            stages.append({"$addFields": {"wn": {"$size": "$w"}}})
            stages.append({"$unset": "w"})
    elif kind < 0.7:
        stages.append({"$unwind": {"path": "$tags",
                                   "preserveNullAndEmptyArrays": True}})
    else:
        stages.append({"$sortByCount": "$status"})
    return stages


def ref_pipeline2(docs, dim, stages):
    cur = [dict(d) for d in docs]
    for stage in stages:
        (op, arg), = stage.items()
        if op == "$match":
            cur = [d for d in cur if ref_match(d, arg)]
        elif op == "$lookup":
            cur = ref_lookup(cur, dim, arg["localField"],
                             arg["foreignField"], arg["as"])
        elif op == "$unwind" and isinstance(arg, str):
            out = []
            for d in cur:
                arr = d.get(arg[1:])
                if not arr:
                    continue
                for el in arr:
                    nd = dict(d)
                    nd[arg[1:]] = el
                    out.append(nd)
            cur = out
        elif op == "$unwind":
            cur = ref_unwind_preserve(cur, arg["path"][1:])
        elif op == "$addFields":
            for name, expr in arg.items():
                if isinstance(expr, str) and "." in expr:
                    base, sub = expr[1:].split(".", 1)
                    for d in cur:
                        v = d.get(base)
                        d[name] = None if v is None else v.get(sub)
                elif isinstance(expr, dict) and "$size" in expr:
                    f = expr["$size"][1:]
                    for d in cur:
                        d[name] = len(d.get(f) or [])
                else:
                    for d in cur:
                        d[name] = ev_num(expr, d)
        elif op == "$unset":
            for d in cur:
                d.pop(arg, None)
        elif op == "$sortByCount":
            counts = {}
            for d in cur:
                counts[d.get(arg[1:])] = counts.get(d.get(arg[1:]), 0) + 1
            cur = [{"_id": k, "count": v} for k, v in
                   sorted(counts.items(),
                          key=lambda kv: (-kv[1], str(kv[0])))]
        else:
            raise AssertionError(op)
    return cur


def test_pipeline_composition_fuzz_lookup(spark):
    from pyspark.sql import types as T

    seed = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260814"))
    rng = random.Random(seed + 1)
    rows = make_rows(rng)
    schema = T.StructType([
        T.StructField("_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("priority", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("version", T.LongType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ])
    df = spark.createDataFrame(rows, schema)
    dim_df = spark.createDataFrame(
        [(d["status"], d["weight"]) for d in DIM_ROWS],
        "status string, weight long")
    resolve = lambda name: dim_df  # noqa: E731
    failures = []
    for trial in range(30):
        stages = gen_pipeline2(rng)
        try:
            raw = compile_pipeline(df, stages, resolve, None).collect()
            got = [r.asDict(recursive=True) for r in raw]
        except Exception as exc:
            failures.append((trial, stages, "COMPILE/RUN", repr(exc)))
            continue
        exp = ref_pipeline2(rows, DIM_ROWS, stages)
        # lookup arrays (if kept) compare as multisets of structs
        for row in got + exp:
            if isinstance(row.get("w"), list):
                row["w"] = sorted(str(sorted(m.items())) for m in row["w"])
        # $sortByCount output order: count desc is deterministic only up
        # to ties — canonize as multiset (row identity still checked)
        if canon(got, set()) != canon(exp, set()):
            failures.append((trial, stages, canon(exp, set())[:3],
                             canon(got, set())[:3]))
    assert not failures, failures[:2]
