"""Mongo aggregation *expression language* → pyspark.sql.Column compiler.

Covers the expression operators accepted inside ``$project``,
``$addFields``, ``$group`` ``_id``, ``$match``'s ``$expr``, etc.
The reference forwards pipelines verbatim (``Pipe(interface{})``,
reference db/interface.go:25, db/wrapper.go:88-94); SURVEY.md §2.5 maps
the language 1:1 onto ``pyspark.sql.functions`` — everything stays
JVM-side / codegen-able, no Python UDFs.

Forms:
    "$field"          field path reference (dotted ok)
    "$$var"           bound variable (inside $filter/$map/$reduce lambdas)
    {"$op": args}     operator application
    {"k": expr, ...}  document literal → struct
    scalar            literal
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anser_spark.functions.filters import resolve_field

__all__ = ["compile_expr", "ExprCompileError"]


class ExprCompileError(ValueError):
    pass


# The column name {"$meta": "searchScore"/"vectorSearchScore"} resolves
# to. compile_pipeline maintains it while folding stages (set on every
# $search/$vectorSearch/fusion stage, saved/restored around nested
# sub-pipeline compiles, reset to "score" at each top-level pipeline),
# so it always names the score column of the most recent search stage
# in the pipeline being compiled. Driver-side, single-threaded compile
# state — never consulted by executors.
_ACTIVE_SCORE_FIELD = "score"


def active_score_field() -> str:
    return _ACTIVE_SCORE_FIELD


def set_active_score_field(name: str) -> str:
    """Set the $meta score column; returns the previous value so
    callers can restore it (sub-pipeline compiles must not leak)."""
    global _ACTIVE_SCORE_FIELD
    prev = _ACTIVE_SCORE_FIELD
    _ACTIVE_SCORE_FIELD = name
    return prev


def _truthy(col: Column) -> Column:
    """Mongo boolean coercion: null, 0, and false are falsy; everything
    else is truthy, and the result is a non-null boolean. (Edge left as
    documented divergence: Mongo treats non-empty STRINGS as truthy;
    a string cast to boolean here yields null → false. Conditions on
    raw strings don't survive schema typing anyway.)"""
    return F.coalesce(col.cast("boolean"), F.lit(False))


def _literal_col(value: Any) -> Column:
    """$literal for arbitrary JSON shapes: documents become struct
    literals, arrays of documents become array<struct> — F.lit alone
    rejects dict/list-of-dict values."""
    if isinstance(value, Mapping):
        if not value:
            raise ExprCompileError("$literal of an empty document is unsupported")
        return F.struct(
            *[_literal_col(v).alias(str(k)) for k, v in value.items()]
        )
    if isinstance(value, (list, tuple)):
        return F.array(*[_literal_col(v) for v in value])
    return F.lit(value)


def _walk_static(dt: T.DataType, parts: list[str]) -> str:
    """Classify a dotted path against a static type: ``"miss"`` when it
    can NEVER resolve (struct without the field, dotted tail through a
    scalar or void), ``"dynamic"`` when a map or array level defers
    resolution to runtime, ``"hit"`` otherwise.  Struct lookup falls
    back to case-insensitive matching — Spark's default column
    resolution (spark.sql.caseSensitive=false) resolves ``$name``
    against a ``Name`` column, so the static walk must agree or a
    previously-resolving reference silently turns null.  ONE walker for
    both compile_expr branches (the CURRENT/$redact fold and the
    frame-schema fold) so their semantics can't drift."""
    for part in parts:
        if isinstance(dt, T.StructType):
            names = dt.fieldNames()
            if part in names:
                dt = dt[part].dataType
                continue
            ci = [n for n in names if n.lower() == part.lower()]
            if not ci:
                return "miss"
            dt = dt[ci[0]].dataType
        elif isinstance(dt, T.MapType):
            dt = dt.valueType
        elif isinstance(dt, T.ArrayType):
            return "dynamic"
        else:
            return "miss"  # dotted tail through a scalar or void
    return "hit"


def compile_expr(
    expr: Any,
    schema: T.StructType | None = None,
    env: Mapping[str, Column] | None = None,
) -> Column:
    """Compile one aggregation expression to a Column."""
    if isinstance(expr, str):
        if expr.startswith("$$"):
            name = expr[2:].split(".", 1)
            if env is None or name[0] not in env:
                raise ExprCompileError(f"unbound variable {expr!r}")
            col = env[name[0]]
            if len(name) == 2:
                for part in name[1].split("."):
                    col = col.getItem(part)
            return col
        if expr.startswith("$"):
            # Inside a level-rebinding scope ($redact), `$field` is
            # shorthand for `$$CURRENT.field` (Mongo's CURRENT rebinds
            # per document level); elsewhere CURRENT is unbound and the
            # path resolves against the DataFrame's own columns. A path
            # the static type can NEVER resolve constant-folds to null
            # (Mongo's missing-field semantics; blind getItem would be
            # an AnalysisException on a fixed schema).
            parts = expr[1:].split(".")
            if env is not None and "CURRENT" in env:
                col = env["CURRENT"]
                dt = env.get("CURRENT_TYPE")
                if dt is not None and _walk_static(dt, parts) == "miss":
                    return F.lit(None)
                for part in parts:
                    col = col.getItem(part)
                return col
            # The same fold against the frame's own schema (round 8;
            # seed-2468 update fuzzer): a stage that references a field
            # a previous stage $unset — or a dotted tail through a
            # scalar/void — must see missing→null, not an
            # AnalysisException.
            if schema is not None and _walk_static(schema, parts) == "miss":
                return F.lit(None)
            return resolve_field(expr[1:])
        return F.lit(expr)
    if isinstance(expr, Mapping):
        op_keys = [k for k in expr if isinstance(k, str) and k.startswith("$")]
        if op_keys:
            if len(expr) != 1:
                raise ExprCompileError(f"operator expression must have one key: {expr}")
            op = op_keys[0]
            return _compile_op(op, expr[op], schema, env)
        # document literal → struct
        return F.struct(
            *[compile_expr(v, schema, env).alias(k) for k, v in expr.items()]
        )
    if isinstance(expr, (list, tuple)):
        return F.array(*[compile_expr(v, schema, env) for v in expr])
    return F.lit(expr)


def _args(arg: Any, schema, env) -> list[Column]:
    if isinstance(arg, (list, tuple)):
        return [compile_expr(a, schema, env) for a in arg]
    return [compile_expr(arg, schema, env)]


def _fold(cols: Sequence[Column], fn) -> Column:
    return functools.reduce(fn, cols)


def _mongo_date_format(fmt: str) -> str:
    """Mongo %-token date format → Spark/Java pattern."""
    return (
        fmt.replace("%Y", "yyyy")
        .replace("%m", "MM")
        .replace("%d", "dd")
        .replace("%H", "HH")
        .replace("%M", "mm")
        .replace("%S", "ss")
        .replace("%L", "SSS")
        .replace("%j", "DDD")
    )


def _regex_pattern(arg: Mapping[str, Any]) -> str:
    """$regexFind/$regexFindAll/$regexMatch pattern with inline options."""
    pattern = arg["regex"]
    opts = arg.get("options", "")
    if "i" in opts:
        pattern = f"(?i){pattern}"
    if "s" in opts:
        pattern = f"(?s){pattern}"
    if "m" in opts:
        pattern = f"(?m){pattern}"
    return pattern


def _regex_group_count(pattern: str) -> int:
    """Number of capture groups, counted driver-side (for the
    ``captures`` array in $regexFind/$regexFindAll)."""
    import re as _re

    try:
        return _re.compile(pattern).groups
    except _re.error:
        return 0  # Java-only syntax: the JVM side validates at runtime


def _compile_op(op: str, arg: Any, schema, env) -> Column:  # noqa: C901
    c = lambda a: compile_expr(a, schema, env)  # noqa: E731

    # ---- literals / variables
    if op == "$literal":
        return _literal_col(arg)
    if op == "$meta":
        # search relevance metadata: $search/$vectorSearch on this
        # fixed-schema engine materialize the score as an ordinary
        # column (the stage's scoreField, default "score"), so
        # {"$meta": "searchScore"/"vectorSearchScore"} resolves to the
        # column the most recent search stage in the SAME pipeline
        # produced — compile_pipeline threads the name through
        # set_active_score_field, so a custom scoreField no longer
        # breaks $meta (or silently reads an unrelated "score" column).
        # textScore reads the hidden column a legacy $text $match
        # materializes (the $match sets the active field to it).
        if arg in ("searchScore", "vectorSearchScore", "textScore"):
            return F.col(active_score_field())
        raise ExprCompileError(f"unsupported $meta kind: {arg!r}")
    if op == "$let":
        inner = dict(env or {})
        for vname, vexpr in arg.get("vars", {}).items():
            inner[vname] = compile_expr(vexpr, schema, inner)
        return compile_expr(arg["in"], schema, inner)

    # ---- static type introspection (fixed schema ⇒ constant per path;
    # supported for "$path" args, where the answer is knowable)
    if op in ("$type", "$isNumber", "$isArray"):
        from anser_spark.functions.filters import field_type

        if not (isinstance(arg, str) and arg.startswith("$")):
            raise ExprCompileError(f"{op} supports field-path arguments only")
        dt = field_type(schema, arg[1:]) if schema is not None else None
        val = c(arg)
        if dt is None:
            missing = {"$type": "missing", "$isNumber": False, "$isArray": False}
            return F.lit(missing[op])
        if op == "$isNumber":
            return F.when(val.isNull(), F.lit(False)).otherwise(
                F.lit(isinstance(dt, T.NumericType))
            )
        if op == "$isArray":
            return F.when(val.isNull(), F.lit(False)).otherwise(
                F.lit(isinstance(dt, T.ArrayType))
            )
        names = {
            T.StringType: "string", T.BooleanType: "bool",
            T.IntegerType: "int", T.LongType: "long",
            T.DoubleType: "double", T.FloatType: "double",
            T.TimestampType: "date", T.DateType: "date",
            T.BinaryType: "binData",
        }
        if isinstance(dt, T.ArrayType):
            tname = "array"
        elif isinstance(dt, (T.StructType, T.MapType)):
            tname = "object"
        elif isinstance(dt, T.DecimalType):
            tname = "decimal"
        else:
            tname = names.get(type(dt), dt.simpleString())
        return F.when(val.isNull(), F.lit("null")).otherwise(F.lit(tname))

    # ---- arithmetic
    if op == "$add":
        return _fold(_args(arg, schema, env), lambda a, b: a + b)
    if op == "$subtract":
        a, b = _args(arg, schema, env)
        return a - b
    if op == "$multiply":
        return _fold(_args(arg, schema, env), lambda a, b: a * b)
    if op == "$divide":
        a, b = _args(arg, schema, env)
        return a / b
    if op == "$mod":
        a, b = _args(arg, schema, env)
        return a % b
    if op == "$abs":
        return F.abs(c(arg))
    if op == "$ceil":
        return F.ceil(c(arg))
    if op == "$floor":
        return F.floor(c(arg))
    if op == "$round":
        cols = _args(arg, schema, env)
        return F.round(cols[0], 0 if len(cols) == 1 else arg[1])
    if op == "$trunc":
        if isinstance(arg, (list, tuple)) and len(arg) > 1:
            base = c(arg[0])
            scale = int(arg[1])
            factor = F.lit(float(10**scale))
            return (
                F.when(base >= 0, F.floor(base * factor))
                .otherwise(F.ceil(base * factor))
                .cast("double")
                / factor
            )
        base = c(arg[0] if isinstance(arg, (list, tuple)) else arg)
        return F.when(base >= 0, F.floor(base)).otherwise(F.ceil(base))
    if op == "$sqrt":
        return F.sqrt(c(arg))
    if op == "$pow":
        a, b = _args(arg, schema, env)
        return F.pow(a, b)
    if op == "$exp":
        return F.exp(c(arg))
    if op == "$ln":
        return F.log(c(arg))
    if op == "$log10":
        return F.log10(c(arg))
    if op == "$log":
        a, b = _args(arg, schema, env)
        return F.log(a) / F.log(b)

    # ---- comparison
    if op == "$eq":
        a, b = _args(arg, schema, env)
        return a.eqNullSafe(b)
    if op == "$ne":
        a, b = _args(arg, schema, env)
        return ~a.eqNullSafe(b)
    # Mongo aggregation comparisons NEVER return null: they rank by
    # BSON total order, where null/missing sorts below every value.
    # SQL's null-propagating <,> diverge exactly when an operand is
    # null (caught by the seeded expression fuzz) — the null branches
    # below restore BSON semantics; same-typed non-null operands fall
    # through to the native comparison.
    if op == "$gt":
        a, b = _args(arg, schema, env)
        return (
            F.when(a.isNull(), F.lit(False))
            .when(b.isNull(), F.lit(True))
            .otherwise(a > b)
        )
    if op == "$gte":
        a, b = _args(arg, schema, env)
        return (
            F.when(a.isNull(), b.isNull())
            .when(b.isNull(), F.lit(True))
            .otherwise(a >= b)
        )
    if op == "$lt":
        a, b = _args(arg, schema, env)
        return (
            F.when(b.isNull(), F.lit(False))
            .when(a.isNull(), F.lit(True))
            .otherwise(a < b)
        )
    if op == "$lte":
        a, b = _args(arg, schema, env)
        return (
            F.when(b.isNull(), a.isNull())
            .when(a.isNull(), F.lit(True))
            .otherwise(a <= b)
        )
    if op == "$cmp":
        a, b = _args(arg, schema, env)
        return (
            F.when(a.isNull() & b.isNull(), 0)
            .when(a.isNull(), -1)
            .when(b.isNull(), 1)
            .when(a > b, 1)
            .when(a < b, -1)
            .otherwise(0)
        )

    # ---- boolean
    if op == "$and":
        # Mongo boolean coercion, not SQL three-valued logic: null/0/
        # false are falsy and the result is ALWAYS true/false (SQL's
        # null AND true = null would leak nulls — caught by the round-5
        # expression fuzz, same class as the r4 $gt/$in fixes)
        return _fold([_truthy(a) for a in _args(arg, schema, env)], lambda a, b: a & b)
    if op == "$or":
        return _fold([_truthy(a) for a in _args(arg, schema, env)], lambda a, b: a | b)
    if op == "$not":
        cols = _args(arg, schema, env)
        return ~_truthy(cols[0])

    # ---- conditional
    if op == "$cond":
        if isinstance(arg, Mapping):
            pred, then, els = arg["if"], arg["then"], arg["else"]
        else:
            pred, then, els = arg
        return F.when(c(pred).cast("boolean"), c(then)).otherwise(c(els))
    if op == "$ifNull":
        return F.coalesce(*_args(arg, schema, env))
    if op == "$switch":
        branches = arg.get("branches", [])
        out = None
        for br in branches:
            cond = c(br["case"]).cast("boolean")
            then = c(br["then"])
            out = F.when(cond, then) if out is None else out.when(cond, then)
        default = c(arg["default"]) if "default" in arg else F.lit(None)
        return default if out is None else out.otherwise(default)

    # ---- strings
    if op == "$concat":
        return F.concat(*_args(arg, schema, env))
    if op == "$toLower":
        return F.lower(c(arg))
    if op == "$toUpper":
        return F.upper(c(arg))
    if op in ("$strLenCP", "$strLenBytes"):
        return F.length(c(arg))
    if op in ("$substrCP", "$substr", "$substrBytes"):
        s, start, length = _args(arg, schema, env)
        # Mongo is 0-indexed; Spark substr is 1-indexed
        return s.substr(start + F.lit(1), length)
    if op == "$split":
        s, delim = arg
        # Mongo splits on a literal delimiter; Spark's split takes a regex
        import re

        return F.split(c(s), re.escape(delim) if isinstance(delim, str) else delim)
    if op == "$trim":
        return F.trim(c(arg["input"] if isinstance(arg, Mapping) else arg))
    if op == "$ltrim":
        return F.ltrim(c(arg["input"] if isinstance(arg, Mapping) else arg))
    if op == "$rtrim":
        return F.rtrim(c(arg["input"] if isinstance(arg, Mapping) else arg))
    if op == "$replaceAll":
        import re

        return F.regexp_replace(
            c(arg["input"]), re.escape(arg["find"]), arg["replacement"]
        )
    if op == "$regexMatch":
        inp = c(arg["input"])
        pattern = arg["regex"]
        if "i" in arg.get("options", ""):
            pattern = f"(?i){pattern}"
        return inp.rlike(pattern)
    if op in ("$indexOfCP", "$indexOfBytes"):
        # Mongo returns 0-based index, -1 when absent; F.instr is 1-based,
        # 0 when absent. $indexOfBytes coincides with $indexOfCP for
        # single-byte encodings (documented divergence on multi-byte).
        s = c(arg[0])
        if not isinstance(arg[1], str):
            raise ExprCompileError(f"{op} requires a literal substring")
        return F.instr(s, arg[1]) - F.lit(1)
    if op == "$strcasecmp":
        a, b = _args(arg, schema, env)
        la, lb = F.lower(a), F.lower(b)
        return (
            F.when(la < lb, F.lit(-1)).when(la > lb, F.lit(1)).otherwise(F.lit(0))
        )

    # ---- dates
    if op == "$year":
        return F.year(c(arg))
    if op == "$month":
        return F.month(c(arg))
    if op == "$dayOfMonth":
        return F.dayofmonth(c(arg))
    if op == "$hour":
        return F.hour(c(arg))
    if op == "$minute":
        return F.minute(c(arg))
    if op == "$second":
        return F.second(c(arg))
    if op == "$dayOfWeek":
        return F.dayofweek(c(arg))
    if op == "$dayOfYear":
        return F.dayofyear(c(arg))
    if op == "$week":
        return F.weekofyear(c(arg))
    if op == "$dateDiff":
        start, end = c(arg["startDate"]), c(arg["endDate"])
        unit = arg.get("unit", "day")
        if unit == "day":
            return F.datediff(end, start).cast("long")
        if unit == "hour":
            return ((end.cast("long") - start.cast("long")) / 3600).cast("long")
        if unit == "minute":
            return ((end.cast("long") - start.cast("long")) / 60).cast("long")
        if unit == "second":
            return (end.cast("long") - start.cast("long")).cast("long")
        if unit == "month":
            return F.months_between(end, start).cast("long")
        if unit == "year":
            return (F.months_between(end, start) / 12).cast("long")
        raise ExprCompileError(f"unsupported $dateDiff unit: {unit}")
    if op in ("$dateAdd", "$dateSubtract"):
        start = c(arg["startDate"])
        amount = int(arg["amount"]) * (1 if op == "$dateAdd" else -1)
        unit = arg.get("unit", "day")
        seconds = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
        if unit in seconds:
            return F.timestamp_seconds(start.cast("long") + amount * seconds[unit])
        if unit == "month":
            return F.add_months(start, amount).cast("timestamp")
        if unit == "year":
            return F.add_months(start, amount * 12).cast("timestamp")
        raise ExprCompileError(f"unsupported {op} unit: {unit}")
    if op == "$dateTrunc":
        unit = arg.get("unit", "day")
        return F.date_trunc(unit, c(arg["date"]))
    if op == "$dateToString":
        fmt = arg.get("format", "%Y-%m-%dT%H:%M:%S")
        return F.date_format(c(arg["date"]), _mongo_date_format(fmt))

    # ---- arrays
    if op == "$size":
        return F.size(c(arg))
    if op == "$arrayElemAt":
        a, idx = arg
        # try_element_at: Mongo returns missing (null here) for an
        # out-of-range index; plain element_at throws under ANSI mode
        return F.try_element_at(
            c(a), F.lit(idx + 1 if isinstance(idx, int) and idx >= 0 else idx)
        )
    if op == "$concatArrays":
        return F.concat(*_args(arg, schema, env))
    if op == "$slice":
        if len(arg) == 2:
            a, n = arg
            return F.slice(c(a), 1, n)
        a, start, n = arg
        return F.slice(c(a), start + 1 if start >= 0 else start, n)
    if op == "$in":
        # Mongo $in never returns null: a null needle matches only an
        # explicit null element (SQL's array_contains yields null there
        # — caught by the seeded expression fuzz). exists() compares
        # null-safely per element.
        needle, hay = arg
        nc = c(needle)
        return F.exists(c(hay), lambda e: e.eqNullSafe(nc))
    if op == "$filter":
        inp = c(arg["input"])
        var = arg.get("as", "this")
        cond = arg["cond"]
        return F.filter(
            inp,
            lambda x: compile_expr(cond, schema, {**(env or {}), var: x, "this": x}).cast(
                "boolean"
            ),
        )
    if op == "$map":
        inp = c(arg["input"])
        var = arg.get("as", "this")
        body = arg["in"]
        return F.transform(
            inp, lambda x: compile_expr(body, schema, {**(env or {}), var: x, "this": x})
        )
    if op == "$reduce":
        inp = c(arg["input"])
        init = c(arg["initialValue"])
        body = arg["in"]
        return F.aggregate(
            inp,
            init,
            lambda acc, x: compile_expr(
                body, schema, {**(env or {}), "value": acc, "this": x}
            ),
        )
    if op == "$range":
        cols = _args(arg, schema, env)
        step = cols[2] if len(cols) > 2 else F.lit(1)
        return F.sequence(cols[0], cols[1] - F.lit(1), step)
    if op == "$reverseArray":
        return F.reverse(c(arg))
    if op == "$indexOfArray":
        arr, needle = c(arg[0]), c(arg[1])
        # Mongo: 0-based, -1 when absent; array_position is 1-based, 0 absent
        return (F.array_position(arr, needle) - 1).cast("int")
    if op == "$zip":
        # array-of-structs zip (Mongo returns array-of-arrays; struct
        # fields are positional — documented divergence for mixed types)
        inputs = [c(a) for a in arg["inputs"]]
        return F.arrays_zip(*inputs)
    if op == "$mergeObjects":
        # generic document merge, later wins: JSON→map round trip with
        # LAST_WIN dedup (map values become strings — documented; typed
        # struct merges should use $addFields instead)
        cols = _args(arg, schema, env)
        maps = [F.from_json(F.to_json(col), "map<string,string>") for col in cols]
        return F.map_concat(*maps)
    if op == "$objectToArray":
        # struct/map → array<struct<key,value>> via generic JSON round trip
        entries = F.map_entries(F.from_json(F.to_json(c(arg)), "map<string,string>"))
        return F.transform(
            entries,
            lambda e: F.struct(e.getField("key").alias("k"), e.getField("value").alias("v")),
        )
    if op == "$arrayToObject":
        return F.map_from_entries(c(arg))
    if op == "$setUnion":
        return F.array_distinct(F.concat(*_args(arg, schema, env)))
    if op == "$setIntersection":
        return _fold(_args(arg, schema, env), F.array_intersect)
    if op == "$setDifference":
        a, b = _args(arg, schema, env)
        return F.array_except(a, b)
    if op == "$setIsSubset":
        a, b = _args(arg, schema, env)
        return F.size(F.array_except(a, b)) == 0
    if op == "$setEquals":
        cols = _args(arg, schema, env)
        out = F.lit(True)
        for x, y in zip(cols, cols[1:]):
            out = out & (F.size(F.array_except(x, y)) == 0) & (F.size(F.array_except(y, x)) == 0)
        return out
    if op == "$anyElementTrue":
        [a] = _args(arg, schema, env)
        return F.exists(a, lambda x: F.coalesce(x.cast("boolean"), F.lit(False)))
    if op == "$allElementsTrue":
        [a] = _args(arg, schema, env)
        return F.forall(a, lambda x: F.coalesce(x.cast("boolean"), F.lit(False)))
    if op == "$sortArray":
        sort_by = arg.get("sortBy", 1)
        if sort_by in (1, -1):
            return F.sort_array(c(arg["input"]), asc=sort_by == 1)
        if isinstance(sort_by, Mapping) and sort_by:
            # document sortBy: sort an array of documents by fields —
            # rebuild each element as (key fields…, element), let
            # sort_array order by the struct prefix, then unwrap.
            # Mixed directions would need a custom comparator; reject.
            dirs = list(sort_by.values())
            if any(d not in (1, -1) for d in dirs) or not all(
                d == dirs[0] for d in dirs
            ):
                raise ExprCompileError(
                    "$sortArray document sortBy supports uniform 1/-1 "
                    "directions only"
                )
            fields = list(sort_by)
            keyed = F.transform(
                c(arg["input"]),
                lambda x: F.struct(
                    *[x.getField(f).alias(f"__k{i}") for i, f in enumerate(fields)],
                    x.alias("__v"),
                ),
            )
            return F.transform(
                F.sort_array(keyed, asc=dirs[0] == 1), lambda s: s["__v"]
            )
        raise ExprCompileError(
            "$sortArray sortBy must be 1/-1 or a field-direction document"
        )
    if op == "$firstN":
        return F.slice(c(arg["input"]), 1, int(arg["n"]))
    if op == "$lastN":
        inp, n = c(arg["input"]), int(arg["n"])
        return F.when(F.size(inp) <= n, inp).otherwise(
            F.slice(inp, F.size(inp) - F.lit(n - 1), F.lit(n))
        )
    if op == "$maxN":
        return F.slice(
            F.sort_array(F.filter(c(arg["input"]), lambda x: x.isNotNull()), asc=False),
            1, int(arg["n"]),
        )
    if op == "$minN":
        return F.slice(
            F.sort_array(F.filter(c(arg["input"]), lambda x: x.isNotNull())),
            1, int(arg["n"]),
        )

    if op == "$first":
        return F.try_element_at(c(arg), F.lit(1))
    if op == "$last":
        return F.try_element_at(c(arg), F.lit(-1))
    if op == "$median":
        # Mongo computes an approximate median; over an ARRAY expression
        # we give the exact lower-interpolated one (array_sort + middle)
        spec = arg if isinstance(arg, Mapping) else {"input": arg}
        a = F.filter(c(spec["input"]), lambda x: x.isNotNull())
        srt = F.sort_array(a)
        n = F.size(srt)
        return F.try_element_at(srt, ((n + 1) / 2).cast("int"))
    if op == "$percentile":
        # Mongo 7.0 array-expression form; exact with linear
        # interpolation (matches our $group accumulator's exact method;
        # Mongo's approximate t-digest values are engine-specific)
        a = F.filter(c(arg["input"]), lambda x: x.isNotNull())
        srt = F.sort_array(a).cast("array<double>")
        m = F.size(srt)
        outs = []
        for p in arg["p"]:
            k = (m - 1).cast("double") * F.lit(float(p))
            lo = F.floor(k).cast("int")
            frac = k - lo.cast("double")
            v_lo = F.try_element_at(srt, lo + 1)
            v_hi = F.try_element_at(srt, lo + 2)
            outs.append(
                F.when(m == 0, F.lit(None).cast("double")).otherwise(
                    v_lo + F.coalesce(v_hi - v_lo, F.lit(0.0)) * frac
                )
            )
        return F.array(*outs)
    if op == "$getField":
        if isinstance(arg, str):
            return resolve_field(arg) if env is None or "CURRENT" not in env else c(f"${arg}")
        inp = c(arg.get("input", "$$CURRENT" if env and "CURRENT" in env else None)) \
            if arg.get("input") is not None else None
        if inp is None:
            raise ExprCompileError("$getField needs input outside $redact scopes")
        return inp.getItem(arg["field"])
    if op == "$setField":
        inp = c(arg["input"])
        val = c(arg["value"])
        return inp.withField(arg["field"], val)
    if op == "$unsetField":
        return c(arg["input"]).dropFields(arg["field"])

    # ---- n-ary min/max/sum/avg over expression args (non-accumulator form)
    if op == "$min":
        cols = _args(arg, schema, env)
        return F.least(*cols) if len(cols) > 1 else F.array_min(cols[0])
    if op == "$max":
        cols = _args(arg, schema, env)
        return F.greatest(*cols) if len(cols) > 1 else F.array_max(cols[0])
    if op == "$sum":
        cols = _args(arg, schema, env)
        if len(cols) == 1 and not isinstance(arg, (int, float)):
            return F.aggregate(cols[0], F.lit(0.0), lambda a, x: a + x.cast("double"))
        return _fold(cols, lambda a, b: a + b)
    if op == "$avg":
        cols = _args(arg, schema, env)
        if len(cols) == 1:
            arr = cols[0]
            return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast("double")) / F.size(arr)
        return _fold(cols, lambda a, b: a + b) / F.lit(len(cols))
    if op in ("$stdDevPop", "$stdDevSamp"):
        # expression form (the $group/window forms live in their
        # stages): sqrt(E[x²] − E[x]²), n−1 denominator for samp. One
        # array arg = over its elements; several args = over the args.
        cols = _args(arg, schema, env)
        arr = cols[0] if len(cols) == 1 else F.array(*cols)
        n = F.size(arr).cast("double")
        s1 = F.aggregate(arr, F.lit(0.0), lambda a, x: a + x.cast("double"))
        s2 = F.aggregate(
            arr, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )
        if op == "$stdDevPop":
            return F.when(n >= 1, F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))))
        return F.when(
            n >= 2,
            F.sqrt(
                F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0))
            ),
        )

    # ---- trig / extended math
    _TRIG = {
        "$sin": F.sin, "$cos": F.cos, "$tan": F.tan,
        "$asin": F.asin, "$acos": F.acos, "$atan": F.atan,
        "$sinh": F.sinh, "$cosh": F.cosh, "$tanh": F.tanh,
        "$asinh": F.asinh, "$acosh": F.acosh, "$atanh": F.atanh,
        "$log10": F.log10,
        "$degreesToRadians": F.radians, "$radiansToDegrees": F.degrees,
    }
    if op in _TRIG:
        return _TRIG[op](c(arg))
    if op == "$atan2":
        a, b = _args(arg, schema, env)
        return F.atan2(a, b)
    if op == "$rand":
        return F.rand()
    if op == "$bitAnd":
        return _fold(_args(arg, schema, env), lambda a, b: a.bitwiseAND(b))
    if op == "$bitOr":
        return _fold(_args(arg, schema, env), lambda a, b: a.bitwiseOR(b))
    if op == "$bitXor":
        return _fold(_args(arg, schema, env), lambda a, b: a.bitwiseXOR(b))
    if op == "$bitNot":
        return F.bitwise_not(c(arg))
    if op == "$binarySize":
        return F.octet_length(c(arg))
    if op == "$bsonSize":
        # no BSON here — the stable size analogue is the document's JSON
        # rendering in bytes (documented divergence: JSON, not BSON,
        # framing overhead)
        return F.octet_length(F.to_json(c(arg)))

    # ---- regex find (beyond $regexMatch)
    # Both return Mongo's document shape {match, idx, captures}.
    # Divergence (documented): unmatched optional capture groups yield
    # "" where Mongo yields null (Spark's regexp_extract semantics).
    if op == "$regexFind":
        inp, pat = c(arg["input"]), _regex_pattern(arg)
        rx = F.lit(pat)
        ng = _regex_group_count(pat)
        pos = F.regexp_instr(inp, rx)
        caps = F.array(*[F.regexp_extract(inp, pat, g) for g in range(1, ng + 1)])
        return F.when(
            pos > 0,
            F.struct(
                F.regexp_substr(inp, rx).alias("match"),
                (pos - 1).cast("int").alias("idx"),
                caps.cast("array<string>").alias("captures"),
            ),
        )
    if op == "$regexFindAll":
        inp, pat = c(arg["input"]), _regex_pattern(arg)
        rx = F.lit(pat)
        ng = _regex_group_count(pat)
        matches = F.regexp_extract_all(inp, rx, F.lit(0))
        # Exact per-match indices, fully JVM-side: insert a sentinel
        # before every match (regexp_replace "$0"), split on it, and
        # prefix-sum the segment lengths — segment i ends exactly where
        # match i+1 starts in the ORIGINAL string (sentinels are
        # removed by the split, so their width never enters the math).
        sent = "\x00\x1f\x00"
        segs = F.split(F.regexp_replace(inp, pat, sent + "$0"), sent)
        idxs = F.aggregate(
            F.slice(segs, 1, F.size(matches)),
            F.struct(
                F.lit(0).alias("p"),
                F.array().cast("array<int>").alias("a"),
            ),
            lambda acc, s: F.struct(
                (acc["p"] + F.length(s)).cast("int").alias("p"),
                F.concat(
                    acc["a"], F.array((acc["p"] + F.length(s)).cast("int"))
                ).alias("a"),
            ),
            lambda acc: acc["a"],
        )
        return F.zip_with(
            matches,
            idxs,
            lambda m, p: F.struct(
                m.alias("match"),
                p.alias("idx"),
                F.array(*[F.regexp_extract(m, pat, g) for g in range(1, ng + 1)])
                .cast("array<string>")
                .alias("captures"),
            ),
        )
    if op == "$replaceOne":
        inp, find, repl = c(arg["input"]), c(arg["find"]), c(arg["replacement"])
        pos = F.instr(inp, find)
        return F.when(pos == 0, inp).otherwise(
            F.concat(
                F.substring(inp, F.lit(1), pos - 1),
                repl,
                F.substring(inp, pos + F.length(find), F.length(inp)),
            )
        )

    # ---- extended dates
    if op == "$millisecond":
        ts = c(arg["date"]) if isinstance(arg, Mapping) else c(arg)
        return F.date_format(ts, "SSS").cast("int")
    if op == "$isoWeek":
        ts = c(arg["date"]) if isinstance(arg, Mapping) else c(arg)
        return F.weekofyear(ts)
    if op == "$isoWeekYear":
        ts = c(arg["date"]) if isinstance(arg, Mapping) else c(arg)
        return F.date_part(F.lit("YEAROFWEEK"), ts)
    if op == "$isoDayOfWeek":
        ts = c(arg["date"]) if isinstance(arg, Mapping) else c(arg)
        # Spark dayofweek: 1=Sunday; ISO: 1=Monday
        return ((F.dayofweek(ts) + F.lit(5)) % 7) + 1
    if op == "$dateFromString":
        ds = c(arg["dateString"])
        fmt = arg.get("format")
        out = F.to_timestamp(ds, _mongo_date_format(fmt)) if fmt else F.to_timestamp(ds)
        if "onNull" in arg:
            out = F.when(ds.isNull(), c(arg["onNull"])).otherwise(out)
        return out
    if op == "$dateFromParts":
        return F.make_timestamp(
            c(arg["year"]).cast("int"),
            c(arg.get("month", 1)).cast("int"),
            c(arg.get("day", 1)).cast("int"),
            c(arg.get("hour", 0)).cast("int"),
            c(arg.get("minute", 0)).cast("int"),
            c(arg.get("second", 0)).cast("int")
            + c(arg.get("millisecond", 0)).cast("double") / 1000.0,
        )
    if op == "$dateToParts":
        ts = c(arg["date"])
        return F.struct(
            F.year(ts).alias("year"),
            F.month(ts).alias("month"),
            F.dayofmonth(ts).alias("day"),
            F.hour(ts).alias("hour"),
            F.minute(ts).alias("minute"),
            F.second(ts).alias("second"),
            F.date_format(ts, "SSS").cast("int").alias("millisecond"),
        )

    # ---- type conversion
    if op == "$toString":
        return c(arg).cast("string")
    if op == "$toObjectId":
        # ObjectIds are 24-hex strings in this engine (new_object_id):
        # normalize case; a malformed non-null input errors like Mongo
        s = c(arg).cast("string")
        valid = s.rlike("^[0-9a-fA-F]{24}$")
        return (
            F.when(s.isNull(), F.lit(None).cast("string"))
            .when(valid, F.lower(s))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("$toObjectId: invalid ObjectId string: "), s
                    )
                ).cast("string")
            )
        )
    if op == "$toInt":
        return c(arg).cast("int")
    if op == "$toLong":
        return c(arg).cast("long")
    if op == "$toDouble":
        return c(arg).cast("double")
    if op == "$toBool":
        return c(arg).cast("boolean")
    if op == "$toDate":
        return c(arg).cast("timestamp")
    if op == "$toDecimal":
        return c(arg).cast("decimal(38,10)")
    if op == "$convert":
        to = arg["to"]
        mapping = {
            "int": "int",
            "long": "long",
            "double": "double",
            "string": "string",
            "bool": "boolean",
            "date": "timestamp",
            "decimal": "decimal(38,10)",
        }
        return c(arg["input"]).cast(mapping[to])

    raise ExprCompileError(f"unsupported expression operator: {op}")
