"""Randomized expression-compiler consistency check (the expression-
language sibling of test_filter_fuzz): N seeded random aggregation
expression trees evaluated two ways — compiled to Columns (ONE Spark
pass, every tree as a projected column) vs a pure-Python reference
evaluator implementing Mongo's documented semantics for the covered
op set. Restricted to operators with exact cross-engine semantics
(integer/decimal-free arithmetic, comparisons, $cond/$ifNull, string
ops) so equality is bitwise, not approximate."""

import os
import random

from pyspark.sql import functions as F

from anser_spark.functions.expressions import compile_expr

ROWS = [
    {"_id": i, "a": a, "b": b, "s": s, "t": t}
    for i, (a, b, s, t) in enumerate(
        [
            (3, 7, "alpha", "x"),
            (0, -4, "Beta", "yz"),
            (-12, 5, "", "Q"),
            (100, 100, "gamma ray", ""),
            (None, 2, None, "mm"),
            (8, None, "delta", None),
            (None, None, None, None),
            (55, 1, "Ωmega", "ß"),
        ]
    )
]

MAX_DEPTH = 4


def rand_num_expr(rng, depth=0):
    if depth >= MAX_DEPTH or rng.random() < 0.3:
        return rng.choice(["$a", "$b", rng.randint(-20, 20)])
    op = rng.choice(["$add", "$subtract", "$multiply", "$abs", "$cond",
                     "$ifNull", "$max", "$min", "$switch", "$strLenCP",
                     "$cmp", "$indexOfCP", "$size", "$indexOfArray",
                     "$arrayElemAt"])
    if op == "$cmp":
        return {"$cmp": [rand_num_expr(rng, depth + 1), rand_num_expr(rng, depth + 1)]}
    if op == "$indexOfCP":
        return {"$indexOfCP": [rand_str_expr(rng, depth + 1), rng.choice(["a", "e", "m", "z"])]}
    if op == "$size":
        return {"$size": rand_arr_expr(rng, depth + 1)}
    if op == "$indexOfArray":
        return {"$indexOfArray": [rand_arr_expr(rng, depth + 1),
                                  rng.choice(["alpha", "beta", "x", "mm"])]}
    if op == "$arrayElemAt":
        # numeric consumer via $strLenCP of the element (null-guarded);
        # index range includes out-of-bounds (Mongo: missing → null)
        return {"$strLenCP": {"$ifNull": [
            {"$arrayElemAt": [rand_arr_expr(rng, depth + 1), rng.randint(-4, 4)]},
            "",
        ]}}
    if op == "$switch":
        return {
            "$switch": {
                "branches": [
                    {"case": rand_bool_expr(rng, depth + 1),
                     "then": rand_num_expr(rng, depth + 1)}
                    for _ in range(rng.randint(1, 2))
                ],
                "default": rand_num_expr(rng, depth + 1),
            }
        }
    if op == "$strLenCP":
        return {"$strLenCP": {"$ifNull": [rand_str_expr(rng, depth + 1), ""]}}
    if op in ("$add", "$multiply"):
        return {op: [rand_num_expr(rng, depth + 1) for _ in range(rng.randint(2, 3))]}
    if op == "$subtract":
        return {op: [rand_num_expr(rng, depth + 1), rand_num_expr(rng, depth + 1)]}
    if op == "$abs":
        return {op: rand_num_expr(rng, depth + 1)}
    if op == "$cond":
        return {
            "$cond": [
                rand_bool_expr(rng, depth + 1),
                rand_num_expr(rng, depth + 1),
                rand_num_expr(rng, depth + 1),
            ]
        }
    if op == "$ifNull":
        return {op: [rand_num_expr(rng, depth + 1), rand_num_expr(rng, depth + 1)]}
    return {op: [rand_num_expr(rng, depth + 1) for _ in range(2)]}


def rand_bool_expr(rng, depth=0):
    op = rng.choice(["$gt", "$gte", "$lt", "$lte", "$eq", "$ne", "$in",
                     "$and", "$or", "$not"])
    if op == "$in":
        return {"$in": [rand_num_expr(rng, depth + 1),
                        [rng.randint(-20, 20) for _ in range(rng.randint(1, 4))]]}
    if op in ("$and", "$or"):
        # mixed bool/numeric operands: Mongo coerces by truthiness
        # (null/0/false falsy) and NEVER returns null — the SQL
        # three-valued & / | would
        mk = lambda: (rand_bool_expr(rng, depth + 1) if rng.random() < 0.6  # noqa: E731
                      else rand_num_expr(rng, depth + 1))
        return {op: [mk() for _ in range(rng.randint(2, 3))]}
    if op == "$not":
        return {"$not": [rand_bool_expr(rng, depth + 1) if rng.random() < 0.6
                         else rand_num_expr(rng, depth + 1)]}
    return {op: [rand_num_expr(rng, depth + 1), rand_num_expr(rng, depth + 1)]}


def rand_arr_expr(rng, depth=0):
    # arrays come from $split of a null-guarded string on a space
    return {"$split": [{"$ifNull": [rand_str_expr(rng, depth + 1), "x y"]}, " "]}


def rand_str_expr(rng, depth=0):
    if depth >= MAX_DEPTH or rng.random() < 0.35:
        return rng.choice(["$s", "$t", "lit"])
    op = rng.choice(["$concat", "$toUpper", "$toLower", "$cond", "$substrCP",
                     "$trim"])
    if op == "$trim":
        return {"$trim": {"input": {"$concat": [
            " ", {"$ifNull": [rand_str_expr(rng, depth + 1), "pad"]}, "  "]}}}
    if op == "$substrCP":
        return {"$substrCP": [{"$ifNull": [rand_str_expr(rng, depth + 1), "pad"]},
                              rng.randint(0, 2), rng.randint(1, 4)]}
    if op == "$concat":
        return {op: [rand_str_expr(rng, depth + 1) for _ in range(rng.randint(2, 3))]}
    if op == "$cond":
        return {
            "$cond": [
                rand_bool_expr(rng, depth + 1),
                rand_str_expr(rng, depth + 1),
                rand_str_expr(rng, depth + 1),
            ]
        }
    return {op: rand_str_expr(rng, depth + 1)}


# ---- pure-Python reference (Mongo semantics for the covered subset) ----


def _truthy(v):
    """Mongo boolean coercion: null/0/false falsy, else truthy."""
    return not (v is None or v is False or v == 0)


def ev(expr, doc):
    if isinstance(expr, str):
        if expr.startswith("$"):
            return doc.get(expr[1:])
        return expr
    if isinstance(expr, (int, float)) or expr is None:
        return expr
    assert isinstance(expr, dict) and len(expr) == 1
    op, arg = next(iter(expr.items()))
    if op == "$ifNull":
        v = ev(arg[0], doc)
        return ev(arg[1], doc) if v is None else v
    if op == "$cond":
        return ev(arg[1], doc) if ev(arg[0], doc) else ev(arg[2], doc)
    if op == "$switch":
        for br in arg["branches"]:
            if ev(br["case"], doc):
                return ev(br["then"], doc)
        return ev(arg["default"], doc)
    if op == "$in":
        return ev(arg[0], doc) in arg[1]
    if op == "$strLenCP":
        return len(ev(arg, doc))
    if op == "$substrCP":
        s = ev(arg[0], doc)
        start, n = arg[1], arg[2]
        return s[start:start + n]
    if op in ("$and", "$or"):
        vals = [_truthy(ev(a, doc)) for a in arg]
        return all(vals) if op == "$and" else any(vals)
    if op == "$not":
        return not _truthy(ev(arg[0], doc))
    if op == "$cmp":
        a, b = ev(arg[0], doc), ev(arg[1], doc)
        ka = (0,) if a is None else (1, a)
        kb = (0,) if b is None else (1, b)
        return (ka > kb) - (ka < kb)
    if op == "$indexOfCP":
        s = ev(arg[0], doc)
        return None if s is None else s.find(arg[1])
    if op == "$trim":
        s = ev(arg["input"], doc)
        return None if s is None else s.strip(" ")
    if op == "$split":
        s = ev(arg[0], doc)
        return None if s is None else s.split(arg[1])
    if op == "$size":
        return len(ev(arg, doc))
    if op == "$indexOfArray":
        a = ev(arg[0], doc)
        if a is None:
            return None
        return a.index(arg[1]) if arg[1] in a else -1
    if op == "$arrayElemAt":
        a, idx = ev(arg[0], doc), arg[1]
        if a is None:
            return None
        return a[idx] if -len(a) <= idx < len(a) else None
    args = [ev(a, doc) for a in (arg if isinstance(arg, list) else [arg])]
    # Mongo arithmetic: any null operand → null
    if op in ("$add", "$subtract", "$multiply", "$abs", "$max", "$min",
              "$gt", "$gte", "$lt", "$lte", "$eq", "$ne", "$concat",
              "$toUpper", "$toLower"):
        if op in ("$max", "$min"):
            vals = [a for a in args if a is not None]
            if not vals:
                return None
            return max(vals) if op == "$max" else min(vals)
        if op == "$concat":
            if any(a is None for a in args):
                return None
            return "".join(args)
        if any(a is None for a in args):
            if op == "$eq":
                return args[0] is None and args[1] is None
            if op == "$ne":
                return not (args[0] is None and args[1] is None)
            if op in ("$gt", "$gte", "$lt", "$lte"):
                # Mongo BSON order: null sorts below numbers
                a, b = args
                ka = (0,) if a is None else (1, a)
                kb = (0,) if b is None else (1, b)
                return {"$gt": ka > kb, "$gte": ka >= kb,
                        "$lt": ka < kb, "$lte": ka <= kb}[op]
            return None
        if op == "$add":
            return sum(args)
        if op == "$subtract":
            return args[0] - args[1]
        if op == "$multiply":
            out = 1
            for a in args:
                out *= a
            return out
        if op == "$abs":
            return abs(args[0])
        if op == "$gt":
            return args[0] > args[1]
        if op == "$gte":
            return args[0] >= args[1]
        if op == "$lt":
            return args[0] < args[1]
        if op == "$lte":
            return args[0] <= args[1]
        if op == "$eq":
            return args[0] == args[1]
        if op == "$ne":
            return args[0] != args[1]
        if op == "$toUpper":
            return args[0].upper()
        if op == "$toLower":
            return args[0].lower()
    raise AssertionError(op)


def test_expression_fuzz(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260813")))
    df = spark.createDataFrame(ROWS)
    exprs = []
    for i in range(80):
        kind = rng.random()
        if kind < 0.5:
            exprs.append((f"e{i}", rand_num_expr(rng)))
        elif kind < 0.75:
            exprs.append((f"e{i}", rand_bool_expr(rng)))
        else:
            exprs.append((f"e{i}", rand_str_expr(rng)))
    cols = [compile_expr(e, df.schema).alias(name) for name, e in exprs]
    out = {r["_id"]: r for r in df.select("_id", *cols).collect()}
    mism = []
    for doc in ROWS:
        row = out[doc["_id"]]
        for name, e in exprs:
            expected = ev(e, doc)
            got = row[name]
            if isinstance(expected, bool):
                ok = bool(got) == expected if got is not None else False
            elif expected is None:
                ok = got is None
            elif isinstance(expected, (int, float)):
                ok = got is not None and abs(float(got) - float(expected)) < 1e-9
            else:
                ok = got == expected
            if not ok:
                mism.append((doc["_id"], name, e, expected, got))
    assert not mism, mism[:5]
