"""Mongo query-document → pyspark.sql.Column compiler.

The single most load-bearing component (SURVEY.md §2.2): the reference
forwards query documents verbatim to the MongoDB server
(``Find(interface{})``, reference db/interface.go:26); with no server,
operator evaluation happens here, as Catalyst-optimizable Column
expressions. Everything routes through this compiler: find, update/delete
targeting, generators, backup filters, and the ``$match`` pipeline stage.

Supported (reference citations in SURVEY.md §2.2):
    implicit equality ``{f: v}``, ``$eq $ne $gt $gte $lt $lte``,
    ``$in $nin``, ``$and $or $not $nor``, ``$exists``, ``$regex``
    (+``$options``), ``$mod``, ``$size``, ``$all``, ``$elemMatch``,
    ``$type``, dotted paths into nested structs/maps, implicit
    array-contains when a scalar predicate hits an array field.

Null/missing semantics follow MongoDB where Spark can express them:
    - ``{f: None}`` matches null *or missing* → ``isNull``.
    - ``$ne v`` matches docs whose field is missing/null → ``!= v OR isNull``.
    - ``$nin`` likewise includes null/missing.
    - ``$exists`` maps to schema presence; for fields present in the
      schema it degrades to ``isNotNull`` (Spark cannot distinguish
      "present with value null" from "absent" inside a fixed schema).
    - Comparisons (``$gt`` etc.) use SQL three-valued logic, which drops
      nulls — same observable behavior as Mongo's type-bracketed
      comparisons for non-null values.

Design note (scale): the compiler emits pure Column expressions — no
Python UDFs — so every filter participates in predicate pushdown to the
Parquet scan and whole-stage codegen.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["compile_filter", "extract_text_spec", "FilterCompileError"]


class FilterCompileError(ValueError):
    """Raised for malformed or unsupported query documents."""


_LOGICAL = {"$and", "$or", "$nor"}

_COMPARISONS = {
    "$eq",
    "$ne",
    "$gt",
    "$gte",
    "$lt",
    "$lte",
    "$in",
    "$nin",
    "$exists",
    "$regex",
    "$options",
    "$mod",
    "$size",
    "$all",
    "$elemMatch",
    "$type",
    "$not",
    "$geoWithin",
}

# Mongo $type aliases → predicate on the *static* Spark type of the field.
# In a fixed-schema engine the type of a present field is known at compile
# time, so $type folds to a constant (null-ness aside).
_TYPE_CHECKS = {
    "double": lambda dt: isinstance(dt, (T.DoubleType, T.FloatType)),
    "string": lambda dt: isinstance(dt, T.StringType),
    "object": lambda dt: isinstance(dt, T.StructType),
    "array": lambda dt: isinstance(dt, T.ArrayType),
    "binData": lambda dt: isinstance(dt, T.BinaryType),
    "bool": lambda dt: isinstance(dt, T.BooleanType),
    "date": lambda dt: isinstance(dt, (T.TimestampType, T.DateType)),
    "int": lambda dt: isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)),
    "long": lambda dt: isinstance(dt, T.LongType),
    "decimal": lambda dt: isinstance(dt, T.DecimalType),
    "number": lambda dt: isinstance(dt, T.NumericType),
    "null": None,  # special-cased: isNull
}


def _is_operator_doc(value: Any) -> bool:
    """True if ``value`` is a {"$op": ...} document (all keys $-prefixed)."""
    return (
        isinstance(value, Mapping)
        and len(value) > 0
        and all(isinstance(k, str) and k.startswith("$") for k in value)
    )


def _split_path(path: str) -> list[str]:
    return path.split(".")


#: path → unresolved Column. An unresolved attribute/extract-value is a
#: pure expression object — session-independent, immutable — so the
#: memo is safe to share across queries and sessions within a process.
#: Every F.col is a py4j round trip; filter/expression compilers call
#: resolve_field hundreds of times per query (round 14, guide §1.2).
_COL_CACHE: dict[str, Column] = {}


def resolve_field(path: str) -> Column:
    """Dotted path → Column reference into nested structs/maps.

    Built with getItem steps so ``a.b.c`` traverses StructType fields and
    MapType keys alike (bsonutil GetDottedKeyName analogue, reference
    bsonutil/helpers.go:7-9).
    """
    col = _COL_CACHE.get(path)
    if col is not None:
        return col
    parts = _split_path(path)
    if len(parts) == 1:
        col = F.col(parts[0])
    else:
        # one py4j round trip for the whole chain: `a`['b']['c'] parses
        # to the IDENTICAL UnresolvedExtractValue tree as chained
        # .getItem() (string subscripts traverse StructType fields and
        # MapType keys alike), where per-segment getItem paid a round
        # trip each (guide §1.2 — dotted paths are compiled constantly)
        col = F.expr(field_path_sql(path))
    if len(_COL_CACHE) > 8192:
        _COL_CACHE.clear()
    _COL_CACHE[path] = col
    return col


def field_path_sql(path: str) -> str:
    """SQL snippet for a dotted path — ``\\`a\\`['b']['c']`` — with the
    same struct/map traversal semantics as chained ``.getItem()``."""
    parts = _split_path(path)
    root = "`" + parts[0].replace("`", "``") + "`"
    return root + "".join(
        "['" + p.replace("\\", "\\\\").replace("'", "\\'") + "']"
        for p in parts[1:]
    )


def field_type(schema: T.DataType | None, path: str) -> T.DataType | None:
    """Static type of a dotted path, or None if absent/unknown."""
    if schema is None:
        return None
    dt: T.DataType = schema
    for part in _split_path(path):
        if isinstance(dt, T.StructType):
            try:
                dt = dt[part].dataType
            except KeyError:
                return None
        elif isinstance(dt, T.MapType):
            dt = dt.valueType
        else:
            return None
    return dt


def _lit(value: Any) -> Column:
    if isinstance(value, Mapping):
        # nested-document literal equality: compare as struct
        return F.struct(*[_lit(v).alias(k) for k, v in value.items()])
    if isinstance(value, (list, tuple)):
        return F.array(*[_lit(v) for v in value])
    return F.lit(value)


def _all_of(cols: list[Column]) -> Column:
    return functools.reduce(lambda a, b: a & b, cols) if cols else F.lit(True)


def _any_of(cols: list[Column]) -> Column:
    return functools.reduce(lambda a, b: a | b, cols) if cols else F.lit(False)


def extract_text_spec(
    flt: Mapping[str, Any] | None,
) -> tuple[Mapping[str, Any] | None, Mapping[str, Any] | None]:
    """Pull a top-level legacy ``{$text: {...}}`` clause out of a find
    filter / $match document (Mongo restricts $text to the top level).
    Returns ``(spec, residual_filter)``; ``spec`` is None when absent.
    The caller scores/filters with :func:`anser_spark.operators.
    ranking.text_match` and compiles the residual normally."""
    if not isinstance(flt, Mapping) or "$text" not in flt:
        return None, flt
    spec = flt["$text"]
    if not isinstance(spec, Mapping):
        raise FilterCompileError("$text expects a document")
    residual = {k: v for k, v in flt.items() if k != "$text"}
    return spec, (residual or None)


def compile_filter(flt: Mapping[str, Any] | None, schema: T.StructType | None = None) -> Column:
    """Compile a Mongo query document to a boolean Column.

    ``None`` / ``{}`` ⇒ match-all (reference treats nil filter as
    ``struct{}{}``, db/wrapper.go:457-459).
    """
    if not flt:
        return F.lit(True)
    if not isinstance(flt, Mapping):
        raise FilterCompileError(f"filter must be a mapping, got {type(flt).__name__}")

    clauses: list[Column] = []
    for key, value in flt.items():
        if key == "$comment":
            continue  # Mongo: query annotation for the profiler — no match effect
        if key == "$text":
            raise FilterCompileError(
                "$text is only valid at the top level of a find() filter "
                "or a $match stage (extract_text_spec handles it there); "
                "it cannot appear under $or/$nor/$elemMatch"
            )
        if key in _LOGICAL:
            if not isinstance(value, Sequence) or isinstance(value, (str, bytes)):
                raise FilterCompileError(f"{key} expects a list of filter documents")
            sub = [compile_filter(v, schema) for v in value]
            if key == "$and":
                clauses.append(_all_of(sub))
            elif key == "$or":
                clauses.append(_any_of(sub))
            else:  # $nor — Mongo negation treats unknown (null) as false,
                # so coalesce before negating or three-valued logic drops
                # null-field docs Mongo would match
                clauses.append(~F.coalesce(_any_of(sub), F.lit(False)))
        elif key == "$not":
            clauses.append(~F.coalesce(compile_filter(value, schema), F.lit(False)))
        elif key == "$expr":
            from anser_spark.functions.expressions import compile_expr

            clauses.append(compile_expr(value, schema).cast("boolean"))
        elif key == "$jsonSchema":
            clauses.append(_json_schema_pred(value, schema))
        elif key == "$sampleRate":
            # Bernoulli sample of matching docs (Mongo 4.4.2+); executor-
            # local rand, no shuffle — same contract as Mongo's
            # non-deterministic sampling
            rate = float(value)
            if not 0.0 <= rate <= 1.0:
                raise FilterCompileError("$sampleRate must be in [0, 1]")
            clauses.append(F.rand() < F.lit(rate))
        elif key.startswith("$"):
            raise FilterCompileError(f"unsupported top-level operator: {key}")
        else:
            clauses.append(_compile_field(key, value, schema))
    return _all_of(clauses)


def _type_bracket_compatible(dt: T.DataType | None, value: Any) -> bool:
    """Mongo type bracketing on a FIXED schema: values of different BSON
    type families never equal or order-compare, so a literal whose type
    can never match the column constant-folds instead of compiling to a
    Spark comparison (which would raise a cast/AnalysisException under
    ANSI where Mongo just matches nothing). None and unknown types stay
    compatible (runtime decides)."""
    import datetime as _dt

    if value is None or dt is None:
        return True
    if isinstance(dt, T.ArrayType):
        # array column: equality matches the whole array OR any element
        return isinstance(value, (list, tuple)) or _type_bracket_compatible(
            dt.elementType, value
        )
    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType,
    )
    if isinstance(value, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(value, (int, float)):
        return isinstance(dt, numeric)
    if isinstance(value, str):
        return isinstance(dt, T.StringType)
    if isinstance(value, _dt.datetime):
        return isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType))
    if isinstance(value, _dt.date):
        return isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType))
    if isinstance(value, (list, tuple)):
        return isinstance(dt, T.ArrayType)
    if isinstance(value, Mapping):
        return isinstance(dt, (T.StructType, T.MapType))
    return True


def _compile_field(path: str, value: Any, schema: T.StructType | None) -> Column:
    col = resolve_field(path)
    dt = field_type(schema, path)
    is_array = isinstance(dt, T.ArrayType)
    missing = schema is not None and dt is None

    if _is_operator_doc(value):
        return _all_of(
            [
                _compile_op(path, col, dt, op, arg, value, missing)
                for op, arg in value.items()
                if op != "$options"  # consumed alongside $regex
            ]
        )

    # implicit equality
    if missing:
        # equality-with-null matches missing fields; anything else can't match
        return F.lit(value is None)
    if value is None:
        return col.isNull()
    if not _type_bracket_compatible(dt, value):
        return F.lit(False)
    if is_array and not isinstance(value, (list, tuple)):
        # Mongo: scalar equality against an array field means "contains"
        return _array_eq_any(col, dt.elementType, value)
    from anser_spark.functions.collation import collate_if_string

    return collate_if_string(col, dt) == _lit(value)


def _compile_op(
    path: str,
    col: Column,
    dt: T.DataType | None,
    op: str,
    arg: Any,
    whole: Mapping[str, Any],
    missing: bool,
) -> Column:
    is_array = isinstance(dt, T.ArrayType)

    if missing:
        # Field absent from the schema entirely: constant-fold per Mongo
        # missing-field semantics — but never swallow an unknown operator.
        if op not in _COMPARISONS:
            raise FilterCompileError(f"unsupported operator: {op}")
        if op == "$exists":
            return F.lit(not bool(arg))
        if op in ("$ne", "$nin"):
            return F.lit(True)
        if op == "$eq":
            return F.lit(arg is None)
        if op == "$type":
            return F.lit(False)
        if op == "$not":
            # keep missing=True so the inner op constant-folds instead of
            # referencing the absent column (AnalysisException); e.g.
            # {nofield: {$not: {$gt: 5}}} matches all docs in Mongo
            if isinstance(arg, Mapping):
                inner = _compile_op(path, col, dt, *_single_op(arg), arg, True)
            else:
                inner = F.lit(False)  # $not: /regex/ on a missing field
            return ~F.coalesce(inner, F.lit(False))
        return F.lit(False)

    if op in ("$eq", "$gt", "$gte", "$lt", "$lte") and not _type_bracket_compatible(dt, arg):
        return F.lit(False)  # type bracketing: can never match
    if op == "$ne" and not _type_bracket_compatible(dt, arg):
        return F.lit(True)  # ...so $ne matches every document
    # active collation (find collation()/aggregate option) applies to
    # string comparisons — scalar fields AND (round 8) string array
    # elements, as in Mongo
    from anser_spark.functions.collation import collate_if_string

    ccol = collate_if_string(col, dt)
    elem_dt = dt.elementType if is_array else dt
    cc = lambda c: collate_if_string(c, elem_dt)  # noqa: E731
    if op == "$eq":
        if arg is None:
            return col.isNull()
        if is_array and not isinstance(arg, (list, tuple)):
            return _array_eq_any(col, elem_dt, arg)
        return ccol == _lit(arg)
    if op == "$ne":
        if arg is None:
            return col.isNotNull()
        if is_array and not isinstance(arg, (list, tuple)):
            return ~F.coalesce(_array_eq_any(col, elem_dt, arg), F.lit(False))
        return (ccol != _lit(arg)) | col.isNull()
    if op == "$gt":
        return _cmp(col, is_array, lambda c: cc(c) > _lit(arg))
    if op == "$gte":
        return _cmp(col, is_array, lambda c: cc(c) >= _lit(arg))
    if op == "$lt":
        return _cmp(col, is_array, lambda c: cc(c) < _lit(arg))
    if op == "$lte":
        return _cmp(col, is_array, lambda c: cc(c) <= _lit(arg))
    if op == "$in":
        if not isinstance(arg, (list, tuple)):
            raise FilterCompileError("$in expects a list")
        # type bracketing: drop list values that can never match
        arg = [v for v in arg if _type_bracket_compatible(dt, v)]
        if is_array:
            # matches if any element of the field array is in arg
            return _any_of(
                [
                    _array_eq_any(col, elem_dt, v) if v is not None
                    else F.exists(col, lambda e: e.isNull())
                    for v in arg
                ]
            )
        base = []
        non_null = [v for v in arg if v is not None]
        if non_null:
            base.append(ccol.isin(*non_null))
        if any(v is None for v in arg):
            base.append(col.isNull())
        return _any_of(base)
    if op == "$nin":
        # Mongo $nin also matches docs whose field is null/missing (unless
        # the list itself names null, in which case nulls are excluded).
        in_col = _compile_op(path, col, dt, "$in", arg, whole, missing)
        return ~F.coalesce(in_col, F.lit(False))
    if op == "$exists":
        return col.isNotNull() if arg else col.isNull()
    if op == "$regex":
        if dt is not None and not isinstance(
            dt, (T.StringType, T.ArrayType)
        ):
            return F.lit(False)  # Mongo: $regex matches strings only
        pattern = arg
        opts = whole.get("$options", "")
        if "i" in opts:
            pattern = f"(?i){pattern}"
        if "s" in opts:
            pattern = f"(?s){pattern}"
        if "m" in opts:
            pattern = f"(?m){pattern}"
        return col.rlike(pattern)
    if op == "$mod":
        if not isinstance(arg, (list, tuple)) or len(arg) != 2:
            raise FilterCompileError("$mod expects [divisor, remainder]")
        if dt is not None and not _type_bracket_compatible(dt, 0):
            return F.lit(False)  # $mod only matches numeric values
        return col % _lit(arg[0]) == _lit(arg[1])
    if op == "$size":
        if dt is not None and not is_array:
            return F.lit(False)  # Mongo: $size on a non-array matches nothing
        return F.size(col) == _lit(int(arg))
    if op == "$all":
        if not isinstance(arg, (list, tuple)):
            raise FilterCompileError("$all expects a list")
        if dt is not None and not is_array:
            # Mongo: $all against a scalar field = every value equals it
            return _all_of(
                [
                    (cc(col) == _lit(v)) if _type_bracket_compatible(dt, v)
                    else F.lit(False)
                    for v in arg
                ]
            )
        return _all_of([_array_eq_any(col, elem_dt, v) for v in arg])
    if op == "$elemMatch":
        if not isinstance(arg, Mapping):
            raise FilterCompileError("$elemMatch expects a document")
        if dt is not None and not is_array:
            return F.lit(False)  # Mongo: $elemMatch needs an array
        elem_dt = dt.elementType if is_array else None
        return F.exists(col, lambda e: _element_predicate(e, arg, elem_dt))
    if op == "$geoWithin":
        # Over a [lon, lat] array field; all pure Column expressions:
        # - $centerSphere [[lon, lat], radius_radians]: haversine trig
        #   (shared constant with $geoNear; mean-radius sphere)
        # - $box [[x1, y1], [x2, y2]]: flat-geometry rectangle (legacy
        #   coordinates, corners normalized), boundary inclusive
        # - $polygon [[x, y], ...]: flat-geometry ray casting — the
        #   edge terms are a driver-side constant list XOR-folded, so
        #   the expression grows linearly in vertex count (boundary
        #   points follow ray-casting convention)
        if not isinstance(arg, Mapping):
            raise FilterCompileError("$geoWithin expects a geometry document")
        if "$centerSphere" in arg:
            (lon0, lat0), radius_rad = arg["$centerSphere"]
            from anser_spark.plans.pipeline import _EARTH_RADIUS_M, _haversine_m

            return _haversine_m(col, float(lon0), float(lat0)) <= F.lit(
                float(radius_rad) * _EARTH_RADIUS_M
            )
        x = col.getItem(0).cast("double")
        y = col.getItem(1).cast("double")
        if "$box" in arg:
            (x1, y1), (x2, y2) = arg["$box"]
            return (
                (x >= F.lit(min(float(x1), float(x2))))
                & (x <= F.lit(max(float(x1), float(x2))))
                & (y >= F.lit(min(float(y1), float(y2))))
                & (y <= F.lit(max(float(y1), float(y2))))
            )
        if "$polygon" in arg:
            pts = [(float(px), float(py)) for px, py in arg["$polygon"]]
            if len(pts) < 3:
                raise FilterCompileError("$polygon needs at least 3 vertices")
            inside = F.lit(False)
            for i in range(len(pts)):
                xi, yi = pts[i]
                xj, yj = pts[i - 1]
                if yj == yi:
                    continue  # horizontal edge never crosses the test ray
                crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
                    x < (y - F.lit(yi)) * F.lit((xj - xi) / (yj - yi)) + F.lit(xi)
                )
                inside = inside != crosses  # boolean XOR fold
            return inside
        raise FilterCompileError(
            "$geoWithin supports $centerSphere, $box, and $polygon"
        )
    if op == "$type":
        names = arg if isinstance(arg, (list, tuple)) else [arg]
        checks: list[Column] = []
        for name in names:
            if name == "null":
                checks.append(col.isNull())
                continue
            check = _TYPE_CHECKS.get(name)
            if check is None:
                raise FilterCompileError(f"unsupported $type alias: {name!r}")
            checks.append(F.lit(bool(dt is not None and check(dt))) & col.isNotNull())
        return _any_of(checks)
    if op == "$not":
        # field-level $not: negates an operator doc or regex
        if isinstance(arg, Mapping):
            inner = _all_of(
                [
                    _compile_op(path, col, dt, o, a, arg, missing)
                    for o, a in arg.items()
                    if o != "$options"
                ]
            )
        else:
            inner = col.rlike(arg)
        return ~F.coalesce(inner, F.lit(False))
    raise FilterCompileError(f"unsupported operator: {op}")


_JS_META_KEYWORDS = ("title", "description", "exclusiveMinimum", "exclusiveMaximum")


def _json_schema_pred(spec: Mapping[str, Any], schema: T.StructType | None) -> Column:
    """``$jsonSchema`` (Mongo's draft-4 subset) over the document root.

    Fixed-schema semantics: a field's TYPE is static, so ``bsonType``/
    ``type`` checks fold to literals; a bsonType mismatch means the
    field can only pass by being absent (null). ``required`` means
    present (isNotNull — the engine's documented $exists analogue);
    ``properties`` constrain only when the field is present, as in
    JSON Schema. Supported keywords: bsonType/type, required,
    properties (nested objects recurse), enum, minimum/maximum
    (+exclusiveMinimum/Maximum), minLength/maxLength, pattern,
    minItems/maxItems, items (object form), allOf/anyOf/oneOf/not.
    Unknown keywords raise (silently ignoring a constraint would
    validate documents Mongo rejects)."""
    if not isinstance(spec, Mapping):
        raise FilterCompileError("$jsonSchema expects a document")

    def field_info(name: str) -> tuple[Column | None, T.DataType | None]:
        dt = field_type(schema, name)
        if schema is not None and dt is None:
            return None, None  # statically missing column
        return resolve_field(name), dt

    return _js_object_keywords(spec, field_info)


def _js_object_keywords(spec, field_info) -> Column:
    preds: list[Column] = []
    for kw, val in spec.items():
        if kw in _JS_META_KEYWORDS:
            continue
        if kw in ("bsonType", "type"):
            wanted = [val] if isinstance(val, str) else list(val)
            preds.append(F.lit("object" in wanted))
        elif kw == "required":
            for name in val:
                col, dt = field_info(name)
                preds.append(F.lit(False) if col is None else col.isNotNull())
        elif kw == "properties":
            for name, sub in val.items():
                col, dt = field_info(name)
                if col is None:
                    continue  # absent field always satisfies its schema
                preds.append(col.isNull() | _js_value_pred(sub, col, dt))
        elif kw == "allOf":
            preds.extend(_js_object_keywords(s, field_info) for s in val)
        elif kw == "anyOf":
            preds.append(_any_of([_js_object_keywords(s, field_info) for s in val]))
        elif kw == "oneOf":
            hits = [
                F.coalesce(_js_object_keywords(s, field_info), F.lit(False)).cast("int")
                for s in val
            ]
            total = hits[0]
            for h in hits[1:]:
                total = total + h
            preds.append(total == 1)
        elif kw == "not":
            preds.append(
                ~F.coalesce(_js_object_keywords(val, field_info), F.lit(False))
            )
        else:
            raise FilterCompileError(f"unsupported $jsonSchema keyword: {kw!r}")
    return _all_of(preds)


def _js_value_pred(spec: Mapping[str, Any], col: Column, dt: T.DataType | None) -> Column:
    if not isinstance(spec, Mapping):
        raise FilterCompileError("$jsonSchema subschema must be a document")
    preds: list[Column] = []
    for kw, val in spec.items():
        if kw in _JS_META_KEYWORDS:
            continue
        if kw in ("bsonType", "type"):
            wanted = [val] if isinstance(val, str) else list(val)
            ok = False
            for name in wanted:
                if name == "null":
                    continue  # handled by the presence-OR wrapper
                check = _TYPE_CHECKS.get(name)
                if check is None:
                    raise FilterCompileError(
                        f"unsupported $jsonSchema bsonType: {name!r}"
                    )
                ok = ok or bool(dt is not None and check(dt))
            preds.append(F.lit(ok))
        elif kw == "enum":
            with_null = [v for v in val if v is not None]
            p = col.isin([_lit(v) for v in with_null]) if with_null else F.lit(False)
            if None in val:
                p = p | col.isNull()
            preds.append(p)
        elif kw == "minimum":
            p = col > F.lit(val) if spec.get("exclusiveMinimum") else col >= F.lit(val)
            preds.append(p)
        elif kw == "maximum":
            p = col < F.lit(val) if spec.get("exclusiveMaximum") else col <= F.lit(val)
            preds.append(p)
        elif kw == "minLength":
            preds.append(F.length(col) >= int(val))
        elif kw == "maxLength":
            preds.append(F.length(col) <= int(val))
        elif kw == "pattern":
            preds.append(col.rlike(val))
        elif kw == "minItems":
            preds.append(F.size(col) >= int(val))
        elif kw == "maxItems":
            preds.append(F.size(col) <= int(val))
        elif kw == "items":
            if not isinstance(val, Mapping):
                raise FilterCompileError(
                    "$jsonSchema items supports the single-schema form"
                )
            elem_dt = dt.elementType if isinstance(dt, T.ArrayType) else None
            preds.append(F.forall(col, lambda e: _js_value_pred(val, e, elem_dt)))
        elif kw in ("required", "properties"):
            # object keywords against a struct-typed value
            struct = dt if isinstance(dt, T.StructType) else None

            def sub_info(name, _s=struct, _c=col):
                if _s is None or name not in _s.fieldNames():
                    return None, None
                return _c.getField(name), _s[name].dataType

            preds.append(_js_object_keywords({kw: val}, sub_info))
        elif kw == "allOf":
            preds.extend(_js_value_pred(s, col, dt) for s in val)
        elif kw == "anyOf":
            preds.append(_any_of([_js_value_pred(s, col, dt) for s in val]))
        elif kw == "oneOf":
            hits = [
                F.coalesce(_js_value_pred(s, col, dt), F.lit(False)).cast("int")
                for s in val
            ]
            total = hits[0]
            for h in hits[1:]:
                total = total + h
            preds.append(total == 1)
        elif kw == "not":
            preds.append(~F.coalesce(_js_value_pred(val, col, dt), F.lit(False)))
        else:
            raise FilterCompileError(f"unsupported $jsonSchema keyword: {kw!r}")
    return _all_of(preds)


def _single_op(arg: Any) -> tuple[str, Any]:
    if isinstance(arg, Mapping) and len(arg) == 1:
        return next(iter(arg.items()))
    raise FilterCompileError("$not expects a single-operator document")


def _cmp(col: Column, is_array: bool, pred) -> Column:
    """Comparison; against array fields Mongo matches if ANY element matches."""
    if is_array:
        return F.exists(col, pred)
    return pred(col)


def _array_eq_any(col: Column, elem_dt: T.DataType | None, value: Any) -> Column:
    """Scalar equality against an array field ("contains"), honoring the
    active collation for string elements (round 8 — Mongo applies
    collation to string comparisons inside arrays too)."""
    from anser_spark.functions.collation import active_collation, collate_if_string

    if active_collation() is not None and isinstance(elem_dt, T.StringType):
        return F.exists(col, lambda e: collate_if_string(e, elem_dt) == _lit(value))
    return F.array_contains(col, _lit(value))


def _element_predicate(elem: Column, doc: Mapping[str, Any], elem_dt: T.DataType | None) -> Column:
    """$elemMatch inner predicate over one array element.

    Two forms: {"$gt": 5, "$lt": 9} (operators on the element itself) or
    {"field": cond, ...} (conditions on subdocument fields).
    """
    if _is_operator_doc(doc):
        clauses = []
        for op, arg in doc.items():
            if op == "$options":
                continue
            clauses.append(_compile_op("<elem>", elem, elem_dt, op, arg, doc, False))
        return _all_of(clauses)
    clauses = []
    for key, value in doc.items():
        sub = elem
        for p in _split_path(key):
            sub = sub.getItem(p)
        sub_dt = field_type(elem_dt, key) if isinstance(elem_dt, T.StructType) else None
        if _is_operator_doc(value):
            clauses.append(
                _all_of(
                    [
                        _compile_op(key, sub, sub_dt, op, arg, value, False)
                        for op, arg in value.items()
                        if op != "$options"
                    ]
                )
            )
        elif value is None:
            clauses.append(sub.isNull())
        else:
            # direct equality collates like every other string compare
            # (review round 8: the operator-form comparisons above
            # already did via _compile_op)
            from anser_spark.functions.collation import collate_if_string

            clauses.append(collate_if_string(sub, sub_dt) == _lit(value))
    return _all_of(clauses)
