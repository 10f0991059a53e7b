"""Mongo update-document → DataFrame-transform compiler (SURVEY.md §2.4).

The reference dispatches on whether the update doc's first key starts
with ``$`` (``hasDollarKey``, reference db/wrapper.go:612-618):
dollar-keyed ⇒ update operators applied to matched docs; otherwise ⇒
whole-document replacement. Simple migrations carry exactly such an
update doc (reference migration.go:16-21, README.rst:34-38).

Everything compiles to ``when(pred, new).otherwise(old)`` Column
expressions over the full dataset — a single distributed copy-on-write
rewrite, never per-row point updates. That is the idiomatic (and at
100 TB the only viable) Spark shape for "UpdateMany".

Operator support:
    $set $unset $rename $inc $mul $min $max $push $addToSet $pull
    $pullAll $pop $currentDate $setOnInsert
Nested dotted paths are handled with Column.withField / dropFields
(struct rebuild without Python).

Fixed-schema caveats (documented divergences from BSON's schemaless
model): ``$unset`` nulls the field for matched rows (drops the column
only when every row matched); ``$rename`` materializes both columns when
only a subset matched (source nulled, target filled).
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anser_spark.functions.filters import _lit, field_type, _element_predicate

__all__ = [
    "has_dollar_key",
    "is_pipeline_update",
    "compile_update",
    "apply_update",
    "apply_pipeline_update",
    "UpdateCompileError",
]


class UpdateCompileError(ValueError):
    pass


_UPDATE_OPS = {
    "$set",
    "$unset",
    "$rename",
    "$inc",
    "$mul",
    "$min",
    "$max",
    "$push",
    "$addToSet",
    "$pull",
    "$pullAll",
    "$pop",
    "$currentDate",
    "$setOnInsert",
}


def has_dollar_key(update: Mapping[str, Any]) -> bool:
    """Port of the reference's hasDollarKey (db/wrapper.go:612-618).

    Callers must route the Mongo 4.2 aggregation-pipeline update form
    (a LIST of stage docs) through ``is_pipeline_update`` FIRST — a
    non-Mapping here raises rather than silently reading as a
    whole-document replacement."""
    if is_pipeline_update(update):
        raise UpdateCompileError(
            "aggregation-pipeline update (a list of stages) must be "
            "dispatched via is_pipeline_update/apply_pipeline_update, "
            "not has_dollar_key"
        )
    if not isinstance(update, Mapping):
        raise UpdateCompileError(
            f"update must be a document or a pipeline (list of stages), "
            f"got {type(update).__name__}"
        )
    for key in update:
        return isinstance(key, str) and key.startswith("$")
    return False


def is_pipeline_update(update: Any) -> bool:
    """True for the Mongo 4.2 aggregation-pipeline update form:
    ``update(q, [{"$set": ...}, {"$unset": ...}])`` (the reference's
    ``Update(q, u interface{})``, db/wrapper.go:188-210, forwards any
    update shape to the server)."""
    return isinstance(update, Sequence) and not isinstance(
        update, (str, bytes, Mapping)
    )


# Mongo restricts update pipelines to exactly these stages
_PIPELINE_UPDATE_STAGES = {
    "$set",
    "$addFields",
    "$unset",
    "$project",
    "$replaceRoot",
    "$replaceWith",
}


def validate_pipeline_update(
    stages: Sequence[Mapping[str, Any]],
) -> list[Mapping[str, Any]]:
    """Check an update pipeline's stage names against Mongo's allowed
    set; returns the stage list. Raises UpdateCompileError otherwise."""
    out: list[Mapping[str, Any]] = []
    for s in stages:
        if not isinstance(s, Mapping) or len(s) != 1:
            raise UpdateCompileError(
                f"each update-pipeline stage must be a single-key "
                f"document, got: {s!r}"
            )
        name = next(iter(s))
        if name not in _PIPELINE_UPDATE_STAGES:
            raise UpdateCompileError(
                f"{name} is not allowed in an update pipeline (Mongo "
                "permits $set/$addFields/$unset/$project/$replaceRoot/"
                "$replaceWith)"
            )
        out.append(s)
    if not out:
        raise UpdateCompileError("update pipeline must not be empty")
    return out


def apply_pipeline_update(
    df: DataFrame,
    pred: Column,
    stages: Sequence[Mapping[str, Any]],
    id_field: str = "_id",
) -> DataFrame:
    """Aggregation-pipeline update: run the stage list over the MATCHED
    rows through the ordinary pipeline compiler and union the result
    back with the untouched rows — one distributed pass, same COW shape
    as operator updates.

    Fixed-schema caveats (same family as $unset/$rename above): a
    column the pipeline removes survives as NULL for matched rows when
    any row was left unmatched; a column the pipeline adds appears as
    NULL on unmatched rows. Changing a column's TYPE for a subset of
    rows is unrepresentable and raises from the union."""
    from anser_spark.plans.pipeline import compile_pipeline

    stages = validate_pipeline_update(stages)
    marker = "__pu_m"
    base = df.withColumn(marker, F.coalesce(pred, F.lit(False)))
    matched = base.where(F.col(marker)).drop(marker)
    unmatched = base.where(~F.col(marker)).drop(marker)
    transformed = compile_pipeline(matched, [dict(s) for s in stages], None, None)
    if id_field in df.columns and id_field not in transformed.columns:
        raise UpdateCompileError(
            f"an update pipeline must not remove the {id_field} field"
        )
    return transformed.unionByName(unmatched, allowMissingColumns=True)


def _split(path: str) -> tuple[str, str | None]:
    """Split dotted path into (top-level column, nested remainder)."""
    if "." in path:
        top, rest = path.split(".", 1)
        return top, rest
    return path, None


def _with_nested(base: Column, rest: str, value: Column) -> Column:
    return base.withField(rest, value)


def _drop_nested(base: Column, rest: str) -> Column:
    return base.dropFields(rest)


class UpdatePlan:
    """Per-top-level-column new-value expressions + columns to drop.

    ``exprs[col]`` is the value a *matched* row gets; unmatched rows keep
    the original. ``set_on_insert`` applies only on the upsert-insert path.
    """

    def __init__(self) -> None:
        self.exprs: dict[str, Column] = {}
        self.drop_if_all_matched: set[str] = set()
        self.new_columns: set[str] = set()
        self.set_on_insert: dict[str, Any] = {}

    def apply(self, df: DataFrame, pred: Column) -> DataFrame:
        cols = []
        names = set(df.columns)
        for name in df.columns:
            if name in self.exprs:
                cols.append(F.when(pred, self.exprs[name]).otherwise(F.col(name)).alias(name))
            else:
                cols.append(F.col(name))
        for name, expr in self.exprs.items():
            if name not in names:
                cols.append(F.when(pred, expr).alias(name))
        return df.select(*cols)


_ARRAY_ELEM = re.compile(r"^(?P<col>[^$]+)\.\$\[(?P<ident>[^\]]*)\]$")


def _array_elem_update(
    plan: "UpdatePlan",
    op: str,
    path: str,
    value: Any,
    array_filters: Mapping[str, Mapping[str, Any]],
    schema: T.StructType | None,
) -> bool:
    """Positional array-element updates: ``f.$[]`` (every element) and
    ``f.$[ident]`` (elements matching the arrayFilters entry for ident).
    Compiles to F.transform — per-element conditional rewrite, no explode,
    no shuffle. Returns True when the path was positional."""
    m = _ARRAY_ELEM.match(path)
    if not m:
        return False
    col_name, ident = m.group("col"), m.group("ident")
    if "." in col_name:
        raise UpdateCompileError(f"nested positional path not supported: {path}")
    dt = field_type(schema, col_name)
    if dt is not None and not isinstance(dt, T.ArrayType):
        raise UpdateCompileError(
            f"positional path {path!r} requires an array field, "
            f"but {col_name!r} is {dt.simpleString()}"
        )
    elem_dt = dt.elementType if isinstance(dt, T.ArrayType) else None
    if ident:
        if ident not in array_filters:
            raise UpdateCompileError(f"no arrayFilters entry for identifier {ident!r}")
        flt = array_filters[ident]

        def elem_pred(e):
            return F.coalesce(_element_predicate(e, flt, elem_dt), F.lit(False))

    else:

        def elem_pred(e):
            return F.lit(True)

    base = plan.exprs.get(col_name, F.col(col_name))
    if op == "$set":

        def new_elem(e):
            return F.when(elem_pred(e), _lit(value)).otherwise(e)

    elif op == "$inc":

        def new_elem(e):
            return F.when(elem_pred(e), F.coalesce(e, F.lit(0)) + _lit(value)).otherwise(e)

    elif op == "$mul":

        def new_elem(e):
            return F.when(elem_pred(e), F.coalesce(e, F.lit(0)) * _lit(value)).otherwise(e)

    elif op == "$min":

        def new_elem(e):
            return F.when(elem_pred(e), F.least(e, _lit(value))).otherwise(e)

    elif op == "$max":

        def new_elem(e):
            return F.when(elem_pred(e), F.greatest(e, _lit(value))).otherwise(e)

    else:
        raise UpdateCompileError(f"{op} does not support positional array paths")
    plan.exprs[col_name] = F.transform(base, new_elem)
    return True


def compile_update(
    update: Mapping[str, Any],
    schema: T.StructType | None = None,
    array_filters: Sequence[Mapping[str, Any]] | None = None,
) -> UpdatePlan:
    """Compile a dollar-keyed update document into an UpdatePlan.

    ``array_filters`` mirrors Mongo's arrayFilters option: a list of
    single-identifier documents like ``[{"e": {"$lt": 0.5}}]`` consumed
    by ``$[e]`` positional paths."""
    if not has_dollar_key(update):
        raise UpdateCompileError("compile_update expects a $-operator document")
    filters_by_ident: dict[str, Mapping[str, Any]] = {}
    for doc in array_filters or []:
        for key, cond in doc.items():
            ident = key.split(".", 1)[0]
            filters_by_ident[ident] = (
                cond if isinstance(cond, Mapping) else {"$eq": cond}
            )
    plan = UpdatePlan()

    def base(top: str) -> Column:
        # chained ops on the same column compose ($inc then $min, etc.)
        return plan.exprs.get(top, F.col(top))

    for op, doc in update.items():
        if op not in _UPDATE_OPS:
            raise UpdateCompileError(f"unsupported update operator: {op}")
        if op == "$setOnInsert":
            plan.set_on_insert.update(doc)
            continue
        if not isinstance(doc, Mapping):
            raise UpdateCompileError(f"{op} expects a document")
        for path, value in doc.items():
            if _array_elem_update(plan, op, path, value, filters_by_ident, schema):
                continue
            top, rest = _split(path)
            if op == "$set":
                if rest is None:
                    plan.exprs[top] = _lit(value)
                else:
                    plan.exprs[top] = _with_nested(base(top), rest, _lit(value))
            elif op == "$unset":
                # Fixed-schema divergence from BSON: the field is nulled,
                # not removed — a conditional dropFields would give the
                # matched/unmatched branches different struct types.
                if rest is None:
                    plan.exprs[top] = F.lit(None).cast(
                        field_type(schema, top) or T.StringType()
                    )
                    plan.drop_if_all_matched.add(top)
                else:
                    plan.exprs[top] = _with_nested(
                        base(top),
                        rest,
                        F.lit(None).cast(field_type(schema, path) or T.StringType()),
                    )
            elif op == "$rename":
                new_top, new_rest = _split(str(value))
                src = _resolve(base(top), rest)
                if new_rest is None:
                    plan.exprs[new_top] = src
                else:
                    plan.exprs[new_top] = _with_nested(
                        plan.exprs.get(new_top, F.col(new_top)), new_rest, src
                    )
                # null out the source (see $unset note on fixed schemas)
                if rest is None:
                    plan.exprs[top] = F.lit(None).cast(
                        field_type(schema, top) or T.StringType()
                    )
                    plan.drop_if_all_matched.add(top)
                else:
                    plan.exprs[top] = _with_nested(
                        base(top),
                        rest,
                        F.lit(None).cast(field_type(schema, path) or T.StringType()),
                    )
            elif op in ("$inc", "$mul"):
                zero = F.lit(0) if op == "$inc" else F.lit(0)
                cur = F.coalesce(_resolve(base(top), rest), zero)
                new = cur + _lit(value) if op == "$inc" else cur * _lit(value)
                plan.exprs[top] = new if rest is None else _with_nested(base(top), rest, new)
            elif op == "$min":
                cur = _resolve(base(top), rest)
                new = F.least(cur, _lit(value))
                plan.exprs[top] = new if rest is None else _with_nested(base(top), rest, new)
            elif op == "$max":
                cur = _resolve(base(top), rest)
                new = F.greatest(cur, _lit(value))
                plan.exprs[top] = new if rest is None else _with_nested(base(top), rest, new)
            elif op in ("$push", "$addToSet"):
                each = (
                    value["$each"]
                    if isinstance(value, Mapping) and "$each" in value
                    else [value]
                )
                cur = _resolve(base(top), rest)
                if op == "$addToSet":
                    # Mongo only skips appending existing values — it does
                    # NOT dedupe elements already in the array
                    appended = F.coalesce(cur, F.array())
                    for v in each:
                        appended = F.when(
                            F.array_contains(appended, _lit(v)), appended
                        ).otherwise(F.concat(appended, F.array(_lit(v))))
                else:
                    appended = F.concat(
                        F.coalesce(cur, F.array()), F.array(*[_lit(v) for v in each])
                    )
                if isinstance(value, Mapping) and "$slice" in value:
                    n = int(value["$slice"])
                    appended = (
                        F.slice(appended, 1, n)
                        if n >= 0
                        else F.slice(appended, F.greatest(F.size(appended) + n + 1, F.lit(1)), -n)
                    )
                plan.exprs[top] = (
                    appended if rest is None else _with_nested(base(top), rest, appended)
                )
            elif op == "$pull":
                cur = _resolve(base(top), rest)
                elem_dt = None
                dt = field_type(schema, path)
                if isinstance(dt, T.ArrayType):
                    elem_dt = dt.elementType
                if isinstance(value, Mapping):
                    pulled = F.filter(
                        cur,
                        lambda e: ~F.coalesce(
                            _element_predicate(e, value, elem_dt), F.lit(False)
                        ),
                    )
                else:
                    pulled = F.filter(cur, lambda e: ~e.eqNullSafe(_lit(value)))
                plan.exprs[top] = (
                    pulled if rest is None else _with_nested(base(top), rest, pulled)
                )
            elif op == "$pullAll":
                cur = _resolve(base(top), rest)
                vals = F.array(*[_lit(v) for v in value])
                pulled = F.filter(cur, lambda e: ~F.array_contains(vals, e))
                plan.exprs[top] = (
                    pulled if rest is None else _with_nested(base(top), rest, pulled)
                )
            elif op == "$pop":
                cur = _resolve(base(top), rest)
                popped = (
                    F.slice(cur, 1, F.greatest(F.size(cur) - 1, F.lit(0)))
                    if value == 1
                    else F.slice(cur, 2, F.greatest(F.size(cur) - 1, F.lit(0)))
                )
                plan.exprs[top] = (
                    popped if rest is None else _with_nested(base(top), rest, popped)
                )
            elif op == "$currentDate":
                new = F.current_timestamp()
                if isinstance(value, Mapping) and value.get("$type") == "date":
                    new = F.current_timestamp()
                plan.exprs[top] = new if rest is None else _with_nested(base(top), rest, new)
    return plan


def _resolve(base: Column, rest: str | None) -> Column:
    if rest is None:
        return base
    col = base
    for part in rest.split("."):
        col = col.getItem(part)
    return col


def compile_replacement(
    doc: Mapping[str, Any], columns: list[str], id_field: str = "_id"
) -> UpdatePlan:
    """Whole-document replacement (non-$ update): matched rows are replaced
    by the literal document; the primary key is preserved (Mongo keeps
    ``_id`` on replace). Columns absent from the doc are nulled."""
    plan = UpdatePlan()
    for name in columns:
        if name == id_field:
            continue
        if name in doc:
            plan.exprs[name] = _lit(doc[name])
        else:
            plan.exprs[name] = F.lit(None)
    for name, value in doc.items():
        if name not in columns and name != id_field:
            plan.exprs[name] = _lit(value)
    return plan


def apply_update(
    df: DataFrame,
    pred: Column,
    update: Mapping[str, Any],
    schema: T.StructType | None = None,
    id_field: str = "_id",
    array_filters: Sequence[Mapping[str, Any]] | None = None,
) -> DataFrame:
    """Apply an update document, update pipeline, or replacement
    document to rows matching ``pred``."""
    if is_pipeline_update(update):
        if array_filters:
            raise UpdateCompileError(
                "arrayFilters cannot be used with an aggregation-pipeline "
                "update (Mongo restriction)"
            )
        return apply_pipeline_update(df, pred, update, id_field)
    if has_dollar_key(update):
        plan = compile_update(update, schema or df.schema, array_filters)
    else:
        plan = compile_replacement(update, df.columns, id_field)
    return plan.apply(df, pred)
