"""Mongo aggregation pipeline → DataFrame-fold compiler (SURVEY.md §2.5).

The reference forwards pipelines to the server verbatim
(`Pipe(interface{})`, reference db/interface.go:25, exec at
db/wrapper.go:532-545 with AllowDiskUse(true) — Spark spills natively,
so that option is free). Here each stage folds into the DataFrame plan
and Catalyst sees the WHOLE pipeline at once — $match after $project
still pushes to the scan, partial aggregation is automatic, $lookup
becomes a (broadcast-able) join.

Stage support:
    $match $project $addFields $set $unset $group $sort $limit $skip
    $unwind $lookup $count $replaceRoot $replaceWith $sortByCount
    $sample $out $merge $setWindowFields $densify $fill $bucket
    $bucketAuto $facet $unionWith $graphLookup $redact $geoNear
    $documents $search $vectorSearch $rankFusion $scoreFusion
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping, Sequence
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anser_spark.functions.expressions import compile_expr
from anser_spark.functions.filters import compile_filter, extract_text_spec
from anser_spark.functions.sort import parse_sort_keys
from anser_spark.plans.query import _DEEP_SKIP_WARN

__all__ = ["Aggregation", "compile_pipeline", "PipelineCompileError"]


class PipelineCompileError(ValueError):
    pass


_ACCUMULATORS = {
    "$sum",
    "$avg",
    "$min",
    "$max",
    "$first",
    "$last",
    "$push",
    "$addToSet",
    "$count",
    "$stdDevPop",
    "$stdDevSamp",
    "$median",
    "$percentile",
    "$maxN",
    "$minN",
    "$firstN",
    "$lastN",
    "$top",
    "$bottom",
    "$topN",
    "$bottomN",
}


_PIPE_DEPTH = 0  # compile_pipeline nesting depth (driver-side state)


def _bq1(name: str) -> str:
    """Backtick-quote ONE literal column name (no dot-path splitting)
    for SQL snippets — used to batch per-column projections into a
    single parsed expression (one py4j round trip) instead of 2+ round
    trips per column via ``F.col(c).alias(...)`` (guide §1.2: a wide
    fused $lookup paid ~440 round trips ≈ 0.2s of pure driver time)."""
    return "`" + str(name).replace("`", "``") + "`"


def _sqs(name: str) -> str:
    """Single-quote a string literal for SQL snippets."""
    return "'" + str(name).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _named_struct_sql(pairs) -> str:
    """``named_struct('out1', `src1`, ...)`` SQL for (out_name, src_col)
    pairs — one round trip for an arbitrarily wide struct."""
    args = ", ".join(f"{_sqs(o)}, {_bq1(s)}" for o, s in pairs)
    return f"named_struct({args})"


def compile_pipeline(
    df: DataFrame,
    stages: Sequence[Mapping[str, Any]],
    resolve_collection: Callable[[str], DataFrame] | None = None,
    sink: Callable[[str, DataFrame, Mapping[str, Any] | None], None] | None = None,
) -> DataFrame:
    """Fold pipeline stages over ``df``.

    ``resolve_collection`` maps a collection name → DataFrame ($lookup);
    ``sink(name, df, options)`` handles $out/$merge writes.

    Peephole: ``$lookup`` immediately followed by ``$unwind`` on its
    ``as`` column compiles to ONE direct join (inner, or left when
    ``preserveNullAndEmptyArrays``) — no collect_list regroup of the
    foreign table. At scale that regroup is an extra shuffle plus an
    array-of-all-matches per key (OOM/straggler risk on skewed keys);
    the fused plan is a plain join AQE can broadcast or skew-split.
    """
    global _PIPE_DEPTH
    from anser_spark.functions import expressions as _exprs

    # $meta score threading: a fresh top-level pipeline starts from the
    # default "score"; nested compiles ($rankFusion/$scoreFusion/$facet
    # legs) inherit the current value and restore it on exit, so a
    # leg's custom scoreField can't leak to siblings or the parent.
    prev_score = _exprs.set_active_score_field(
        "score" if _PIPE_DEPTH == 0 else _exprs.active_score_field()
    )
    _PIPE_DEPTH += 1
    try:
        stages = list(stages)
        i = 0
        while i < len(stages):
            stage = stages[i]
            if not isinstance(stage, Mapping) or len(stage) != 1:
                raise PipelineCompileError(
                    f"stage {i} must have exactly one key: {stage!r}"
                )
            op, arg = next(iter(stage.items()))
            if op == "$lookup" and i + 1 < len(stages):
                as_name = arg.get("as") if isinstance(arg, Mapping) else None
                if i + 2 < len(stages) and isinstance(arg, Mapping):
                    non_empty = _emptiness_match(stages[i + 1], as_name)
                    if non_empty is not None:
                        dropped, residual = _drop_residual(stages[i + 2], as_name)
                        if dropped:
                            fused = _lookup_semi(
                                df, arg, resolve_collection, non_empty
                            )
                            if fused is not None:
                                df = fused
                                stages[i + 2 : i + 3] = (
                                    [residual] if residual else []
                                )
                                i += 2
                                continue
                preserve = _fusible_unwind(stages[i + 1], as_name)
                if preserve is not None:
                    df = _lookup(df, arg, resolve_collection, unwind_preserve=preserve)
                    i += 2
                    continue
            df = _compile_stage(df, op, arg, resolve_collection, sink)
            if (
                op == "$match"
                and isinstance(arg, Mapping)
                and extract_text_spec(arg)[0] is not None
            ):
                # legacy $text ran inside THIS $match: later
                # {"$meta": "textScore"} reads its hidden score column.
                # Gated on the stage actually containing $text — a
                # text-less $match must not re-point the score field
                # and clobber an intervening $search scoreField.
                _exprs.set_active_score_field(_TEXT_SCORE_COL)
            if op in ("$search", "$vectorSearch", "$scoreFusion"):
                _exprs.set_active_score_field(
                    arg.get("scoreField", "score") if isinstance(arg, Mapping) else "score"
                )
            elif op == "$rankFusion":
                _exprs.set_active_score_field("score")
            i += 1
        if _PIPE_DEPTH == 1 and _TEXT_SCORE_COL in df.columns:
            df = df.drop(_TEXT_SCORE_COL)
        return df
    finally:
        _PIPE_DEPTH -= 1
        _exprs.set_active_score_field(prev_score)


def _fusible_unwind(stage: Any, as_name: str | None) -> bool | None:
    """If ``stage`` is a $unwind of exactly ``$<as_name>`` with no
    includeArrayIndex, return its preserveNullAndEmptyArrays flag
    (→ fusible as left vs inner join); else None (not fusible)."""
    if as_name is None or not isinstance(stage, Mapping) or len(stage) != 1:
        return None
    if "$unwind" not in stage:
        return None
    uarg = stage["$unwind"]
    if isinstance(uarg, str):
        path, preserve, idx = uarg, False, None
    elif isinstance(uarg, Mapping):
        path = uarg.get("path")
        preserve = bool(uarg.get("preserveNullAndEmptyArrays", False))
        idx = uarg.get("includeArrayIndex")
    else:
        return None
    if idx or path != f"${as_name}":
        return None
    return preserve


def _emptiness_match(stage: Any, as_name: str | None) -> bool | None:
    """If ``stage`` is a $match whose ONLY condition tests whether the
    $lookup's ``as`` array is empty, return True for a non-empty test
    (→ left_semi join) or False for an empty test (→ left_anti); else
    None.  Recognized idioms (the Mongo spellings of EXISTS / NOT
    EXISTS subqueries — TPC-H q4/q21/q22 shapes):

      {as: {$ne: []}}            {as: {$eq: []}} / {as: []}
      {as: {$size: 0}}
      {"as.0": {$exists: true|false}}
      {$expr: {$gt: [{$size: "$as"}, 0]}} / {$expr: {$eq|$ne: [{$size: "$as"}, 0]}}

    Elements of a $lookup result are documents, never [], so Mongo's
    element-wise $eq/$ne array semantics collapse to whole-value
    (non-)emptiness here — the rewrite is exact."""
    if as_name is None or not isinstance(stage, Mapping) or len(stage) != 1:
        return None
    arg = stage.get("$match")
    if not isinstance(arg, Mapping) or len(arg) != 1:
        return None
    key, val = next(iter(arg.items()))
    if key == as_name:
        if isinstance(val, list) and val == []:
            return False
        if isinstance(val, Mapping) and len(val) == 1:
            op, rhs = next(iter(val.items()))
            if op == "$ne" and rhs == []:
                return True
            if op == "$eq" and rhs == []:
                return False
            if op == "$size" and rhs == 0:
                return False
        return None
    if key == f"{as_name}.0":
        if isinstance(val, Mapping) and len(val) == 1 and "$exists" in val:
            return bool(val["$exists"])
        return None
    if key == "$expr" and isinstance(val, Mapping) and len(val) == 1:
        op, operands = next(iter(val.items()))
        if (
            op in ("$gt", "$eq", "$ne")
            and isinstance(operands, list)
            and len(operands) == 2
            and operands[0] == {"$size": f"${as_name}"}
            and operands[1] == 0
        ):
            return op in ("$gt", "$ne")
    return None


def _drop_residual(
    stage: Any, as_name: str
) -> tuple[bool, Mapping[str, Any] | None]:
    """Does ``stage`` drop the ``as`` column?  Returns (dropped,
    residual-stage) where the residual carries the stage's OTHER
    exclusions (or None if ``as`` was all it did)."""
    if not isinstance(stage, Mapping) or len(stage) != 1:
        return False, None
    op, arg = next(iter(stage.items()))
    if op == "$unset":
        names = [arg] if isinstance(arg, str) else list(arg)
        if as_name in names:
            rest = [n for n in names if n != as_name]
            return True, ({"$unset": rest} if rest else None)
        return False, None
    if op == "$project" and isinstance(arg, Mapping):
        # exclusion-only projection (all values falsy) that drops `as`
        if as_name in arg and all(not v for v in arg.values()):
            rest = {k: v for k, v in arg.items() if k != as_name}
            return True, ({"$project": rest} if rest else None)
    return False, None


def _lookup_semi(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame] | None,
    non_empty: bool,
) -> DataFrame | None:
    """$lookup + $match-(non)empty + drop-`as` fused into ONE
    left_semi/left_anti join.  The unfused plan builds a collect_list
    array per key (an extra shuffle plus a per-key array that is pure
    OOM/straggler risk on skewed keys) only for the $match to test
    emptiness and the next stage to throw it away; the fused plan
    never materializes matches at all and Catalyst/AQE can broadcast
    the foreign key column.  eqNullSafe keeps Mongo's null-matches-null
    $lookup semantics identical to the unfused path.

    Handles the classic form and the correlated pipeline form (the
    sub-pipeline's filters apply to the foreign side before the semi
    join — TPC-H q21's EXISTS-with-predicate shape).  Returns None to
    decline (uncorrelated pipeline form: emptiness is a global, not
    per-row, property there — the collect_list path is already one
    aggregation + broadcast)."""
    if resolve is None:
        raise PipelineCompileError("$lookup requires a collection resolver")
    if "pipeline" in arg:
        if "localField" in arg and "foreignField" in arg:
            # Mongo 8 concise syntax — same normalization as _lookup
            arg = dict(arg)
            lf, ff = arg.pop("localField"), arg.pop("foreignField")
            arg["let"] = {**arg.get("let", {}), "__lf": f"${lf}"}
            arg["pipeline"] = [
                {"$match": {"$expr": {"$eq": ["$$__lf", f"${ff}"]}}}
            ] + list(arg["pipeline"])
        return _lookup_pipeline(df, arg, resolve, semi=non_empty)
    for field in ("from", "localField", "foreignField", "as"):
        if field not in arg:
            raise PipelineCompileError(f"$lookup missing {field!r}")
    foreign = resolve(arg["from"])
    local_f, foreign_f, out = arg["localField"], arg["foreignField"], arg["as"]
    keys = foreign.select(F.col(foreign_f).alias("__lk"))
    how = "left_semi" if non_empty else "left_anti"
    joined = df.join(keys, on=df[local_f].eqNullSafe(keys["__lk"]), how=how)
    if out in df.columns:
        # Mongo overwrote the column with the match array, then dropped it
        joined = joined.drop(out)
    return joined


def _compile_stage(  # noqa: C901
    df: DataFrame,
    op: str,
    arg: Any,
    resolve: Callable[[str], DataFrame] | None,
    sink: Callable[[str, DataFrame, Mapping[str, Any] | None], None] | None,
) -> DataFrame:
    schema = df.schema

    if op == "$match":
        text_spec, residual = extract_text_spec(arg)
        if text_spec is not None:
            return _text_match_stage(df, text_spec, residual)
        return df.where(compile_filter(arg, schema))

    if op == "$project":
        return _project(df, arg)

    if op in ("$addFields", "$set"):
        # Mongo evaluates every expression in ONE stage against the
        # stage's INPUT document — a field set here must not be visible
        # to its siblings (use separate stages for dependencies).
        # withColumns (one select) gives exactly that; sequential
        # withColumn would leak earlier siblings' new values.
        return df.withColumns(
            {name: compile_expr(expr, schema) for name, expr in arg.items()}
        )

    if op == "$unset":
        names = [arg] if isinstance(arg, str) else list(arg)
        for n in names:
            if "." in n:
                root, rest = n.split(".", 1)
                if root in df.columns and isinstance(
                    df.schema[root].dataType, T.StructType
                ):
                    df = df.withColumn(root, F.col(root).dropFields(rest))
            elif n in df.columns:
                df = df.drop(n)
        return df

    if op == "$group":
        return _group(df, arg)

    if op == "$sort":
        # schema makes string keys honor the active collation (round 7)
        return df.orderBy(*parse_sort_keys(arg, df.schema))

    if op == "$limit":
        return df.limit(int(arg))

    if op == "$skip":
        # same deep-paging warning find().skip() got in round 7: every
        # skipped row is still produced and discarded (true in Mongo
        # too) — past the threshold point at keyset pagination
        n_skip = int(arg)
        if n_skip > _DEEP_SKIP_WARN:
            import logging

            logging.getLogger(__name__).warning(
                "$skip: %d is deep paging: every skipped row is still "
                "produced and discarded. Prefer a strictly-after $match "
                "predicate on the sort keys (keyset pagination) — it "
                "pushes down to the scan.", n_skip,
            )
        return df.offset(n_skip)

    if op == "$unwind":
        return _unwind(df, arg)

    if op == "$lookup":
        return _lookup(df, arg, resolve)

    if op == "$count":
        return df.agg(F.count(F.lit(1)).alias(str(arg)))

    if op in ("$replaceRoot", "$replaceWith"):
        new_root = arg["newRoot"] if op == "$replaceRoot" else arg
        col = compile_expr(new_root, schema)
        return df.select(col.alias("__root")).select("__root.*")

    if op == "$sortByCount":
        key = compile_expr(arg, schema)
        return (
            df.groupBy(key.alias("_id"))
            .agg(F.count(F.lit(1)).alias("count"))
            .orderBy(F.col("count").desc(), F.col("_id").asc_nulls_first())
        )

    if op == "$sample":
        n = int(arg["size"])
        return df.orderBy(F.rand()).limit(n)

    if op == "$setWindowFields":
        return _set_window_fields(df, arg)

    if op == "$densify":
        return _densify(df, arg)

    if op == "$fill":
        return _fill(df, arg)

    if op == "$bucket":
        return _bucket(df, arg)

    if op == "$bucketAuto":
        return _bucket_auto(df, arg)

    if op == "$facet":
        return _facet(df, arg, resolve, sink)

    if op == "$unionWith":
        if resolve is None:
            raise PipelineCompileError("$unionWith requires a collection resolver")
        spec = {"coll": arg} if isinstance(arg, str) else dict(arg)
        other = resolve(spec["coll"])
        if spec.get("pipeline"):
            other = compile_pipeline(other, spec["pipeline"], resolve, sink)
        return df.unionByName(other, allowMissingColumns=True)

    if op == "$graphLookup":
        if resolve is None:
            raise PipelineCompileError("$graphLookup requires a collection resolver")
        return _graph_lookup(df, arg, resolve)

    if op == "$redact":
        return _redact(df, arg)

    if op == "$geoNear":
        return _geo_near(df, arg)

    if op == "$search":
        return _search_stage(df, arg)

    if op == "$searchMeta":
        return _search_meta_stage(df, arg)

    if op == "$vectorSearch":
        return _vector_search(df, arg)

    if op == "$rankFusion":
        return _rank_fusion_stage(df, arg, resolve, sink)

    if op == "$scoreFusion":
        return _score_fusion_stage(df, arg, resolve, sink)

    if op == "$documents":
        # inline literal source (Mongo 5.1; db.aggregate-level stage).
        # Mongo requires it first in a db-level pipeline; here it simply
        # replaces the current frame with the literal documents.
        if not isinstance(arg, (list, tuple)) or not arg:
            raise PipelineCompileError("$documents requires a non-empty list")
        return df.sparkSession.createDataFrame(list(arg))

    if op == "$out":
        if sink is None:
            raise PipelineCompileError("$out requires a sink")
        name = arg if isinstance(arg, str) else arg["coll"]
        opts = {"mode": "out"}
        if isinstance(arg, Mapping) and arg.get("db"):
            opts["db"] = str(arg["db"])  # cross-db target (Mongo 4.4)
        sink(name, df, opts)
        return df

    if op == "$merge":
        if sink is None:
            raise PipelineCompileError("$merge requires a sink")
        spec = {"into": arg} if isinstance(arg, str) else dict(arg)
        into = spec["into"]
        name = into if isinstance(into, str) else into["coll"]
        opts = {
            "mode": "merge",
            "on": spec.get("on", "_id"),
            "let": spec.get("let"),
            "whenMatched": spec.get("whenMatched", "replace"),
            "whenNotMatched": spec.get("whenNotMatched", "insert"),
        }
        if isinstance(into, Mapping) and into.get("db"):
            opts["db"] = str(into["db"])  # cross-db target
        sink(name, df, opts)
        return df

    raise PipelineCompileError(f"unsupported pipeline stage: {op}")


def _project(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    incl_keys = [k for k, v in arg.items() if v in (1, True)]
    excl_keys = [k for k, v in arg.items() if v in (0, False)]
    computed = {k: v for k, v in arg.items() if v not in (0, 1, True, False)}
    if excl_keys and (incl_keys or computed) and set(excl_keys) != {"_id"}:
        raise PipelineCompileError("cannot mix inclusion and exclusion in $project")
    if incl_keys or computed:
        cols: list[Column] = []
        if "_id" in df.columns and "_id" not in excl_keys and "_id" not in arg:
            cols.append(F.col("_id"))
        for k, v in arg.items():
            if v in (0, False):
                continue
            if v in (1, True):
                cols.append(compile_expr(f"${k}", df.schema).alias(k.replace(".", "_")))
            else:
                cols.append(compile_expr(v, df.schema).alias(k))
        return df.select(*cols)
    return df.drop(*[k for k in excl_keys if k in df.columns])


def _acc_column(spec: Mapping[str, Any], schema) -> Column:
    if not isinstance(spec, Mapping) or len(spec) != 1:
        raise PipelineCompileError(f"accumulator must have one operator: {spec!r}")
    op, arg = next(iter(spec.items()))
    if op not in _ACCUMULATORS:
        raise PipelineCompileError(f"unsupported accumulator: {op}")
    if op == "$count":
        return F.count(F.lit(1))
    ext = _acc_column_extended(op, arg, schema)
    if ext is not None:
        return ext
    if op == "$sum":
        if isinstance(arg, (int, float)) and not isinstance(arg, bool):
            if arg == 1:
                return F.count(F.lit(1))
            return F.count(F.lit(1)) * F.lit(arg)
        # Mongo $sum ignores non-numeric values and returns 0 — never
        # null — when a group has nothing to sum (Spark's sum is null)
        summed = F.sum(compile_expr(arg, schema))
        return F.coalesce(summed, F.lit(0).cast("long"))
    expr = compile_expr(arg, schema)
    if op == "$avg":
        return F.avg(expr)
    if op == "$min":
        return F.min(expr)
    if op == "$max":
        return F.max(expr)
    if op == "$first":
        return F.first(expr, ignorenulls=False)
    if op == "$last":
        return F.last(expr, ignorenulls=False)
    if op == "$push":
        # struct-wrap: collect_list drops bare nulls, Mongo $push keeps
        # them (same treatment as $firstN/$lastN below)
        return F.transform(
            F.collect_list(F.struct(expr.alias("__v"))), lambda s: s["__v"]
        )
    if op == "$addToSet":
        return F.transform(
            F.collect_set(F.struct(expr.alias("__v"))), lambda s: s["__v"]
        )
    if op == "$stdDevPop":
        return F.stddev_pop(expr)
    if op == "$stdDevSamp":
        return F.stddev_samp(expr)
    raise PipelineCompileError(f"unsupported accumulator: {op}")


def _sortby_ascs(sort_by: Mapping[str, Any]) -> list[bool]:
    return [d in (1, True) for d in sort_by.values()]


def _sortby_comparator(ascs: list[bool]):
    """Two-arg ``array_sort`` comparator over ``__k0..__k{n-1}`` struct
    fields: mixed-direction lexicographic sortBy with Mongo's null
    placement (nulls first on ascending keys, last on descending — the
    same order ``sort_array`` gives uniform-direction specs).  Ties on
    all keys keep arbitrary order, as in Mongo."""

    def cmp(left, right):
        expr = F.lit(0)
        for i in reversed(range(len(ascs))):
            lk, rk = left[f"__k{i}"], right[f"__k{i}"]
            lt, gt = (F.lit(-1), F.lit(1)) if ascs[i] else (F.lit(1), F.lit(-1))
            expr = (
                F.when(lk.isNull() & rk.isNull(), expr)
                .when(lk.isNull(), lt)
                .when(rk.isNull(), gt)
                .when(lk < rk, lt)
                .when(lk > rk, gt)
                .otherwise(expr)
            )
        return expr

    return cmp


def _sorted_struct_agg(arg: Mapping[str, Any], schema) -> Column:
    """collect_list(struct(sortKeys…, output)) sorted by the sortBy spec
    — the shared scaffold of the collect-form $top/$bottom/$topN/$bottomN
    fallback. Distributed: partial collect per partition, one merge;
    per-group arrays only (bounded by group size, same contract as
    Mongo's 100MB group limit).  Uniform directions use ``sort_array``
    (bit-compatible with the historical plans); mixed directions
    (round 8) an ``array_sort`` comparator with per-key direction."""
    sort_by = arg["sortBy"]
    ascs = _sortby_ascs(sort_by)
    keys = [
        compile_expr(f"${f}", schema).alias(f"__k{i}")
        for i, f in enumerate(sort_by)
    ]
    out = compile_expr(arg["output"], schema).alias("__o")
    coll = F.collect_list(F.struct(*keys, out))
    if all(a == ascs[0] for a in ascs):
        return F.sort_array(coll, asc=ascs[0])
    return F.array_sort(coll, _sortby_comparator(ascs))


def _acc_column_extended(op: str, arg: Any, schema) -> Column | None:
    """Mongo 5.2+/7.0 accumulators. $median/$percentile honor Mongo's
    ``method`` field: "approximate" (Mongo's default, t-digest) maps to
    Spark's mergeable ``percentile_approx`` sketch — the 100 TB path, a
    fixed-size state per group instead of a per-group sort.  "exact"
    maps to Spark's exact percentile (our pre-7.0 behavior; sketch
    internals differ from Mongo's t-digest either way, so approximate
    VALUES are engine-specific — documented divergence)."""
    if op == "$median":
        if isinstance(arg, Mapping) and arg.get("method") == "approximate":
            return F.percentile_approx(
                compile_expr(arg["input"], schema).cast("double"),
                F.lit(0.5), F.lit(10_000),
            )
        return F.median(compile_expr(arg["input"], schema))
    if op == "$percentile":
        ps = arg["p"]
        expr = compile_expr(arg["input"], schema)
        if arg.get("method") == "approximate":
            return F.percentile_approx(
                expr.cast("double"),
                F.array(*[F.lit(float(p)) for p in ps]), F.lit(10_000),
            )
        return F.percentile(expr, F.array(*[F.lit(float(p)) for p in ps]))
    if op in ("$maxN", "$minN"):
        expr = compile_expr(arg["input"], schema)
        n = int(arg["n"])
        return F.slice(
            F.sort_array(F.collect_list(expr), asc=op == "$minN"), 1, n
        )
    if op in ("$firstN", "$lastN"):
        # struct-wrap to keep nulls (collect_list drops bare nulls;
        # Mongo $firstN/$lastN keep them)
        expr = compile_expr(arg["input"], schema)
        n = int(arg["n"])
        wrapped = F.collect_list(F.struct(expr.alias("__v")))
        if op == "$firstN":
            sliced = F.slice(wrapped, 1, n)
        else:
            sliced = F.when(F.size(wrapped) <= n, wrapped).otherwise(
                F.slice(wrapped, F.size(wrapped) - F.lit(n - 1), F.lit(n))
            )
        return F.transform(sliced, lambda s: s.getField("__v"))
    if op in ("$top", "$bottom"):
        # bounded state: min_by/max_by keep ONE candidate per group
        # (struct ordering = the lexicographic sortBy; null fields sort
        # first, matching sort_array). The round-6 sf1 rehearsal showed
        # the sorted-array form collecting whole groups — 2M-element
        # agg buffers at 6M rows; an OOM at 100 TB.
        sort_by = arg["sortBy"]
        ascs = _sortby_ascs(sort_by)
        if all(a == ascs[0] for a in ascs):
            asc = ascs[0]
            ks = F.struct(*[compile_expr(f"${f}", schema) for f in sort_by])
            out = compile_expr(arg["output"], schema)
            want_min = asc if op == "$top" else not asc
            return F.min_by(out, ks) if want_min else F.max_by(out, ks)
        # mixed directions (round 8): no single struct ordering fits
        # min_by/max_by — sortBy-ordered collect + head/tail pick.  This
        # collect-form fallback is only reached OUTSIDE grouped
        # aggregation (the $group/$bucket/decorrelated-$lookup paths
        # route mixed $top/$bottom through the bounded salted prefilter)
        srt = _sorted_struct_agg(arg, schema)
        picked = F.element_at(srt, 1) if op == "$top" else F.element_at(srt, -1)
        return picked.getField("__o")
    if op in ("$topN", "$bottomN"):
        srt = _sorted_struct_agg(arg, schema)
        n = int(arg["n"])
        if op == "$topN":
            sliced = F.slice(srt, 1, n)
        else:
            sliced = F.when(F.size(srt) <= n, srt).otherwise(
                F.slice(srt, F.size(srt) - F.lit(n - 1), F.lit(n))
            )
        return F.transform(sliced, lambda s: s.getField("__o"))
    return None


_TOPN_OPS = ("$topN", "$bottomN", "$minN", "$maxN")


_TOPN_SALT_BUCKETS = 64


def _tail_slice(arr: Column, n: int) -> Column:
    return F.when(F.size(arr) <= n, arr).otherwise(
        F.slice(arr, F.size(arr) - F.lit(n - 1), F.lit(n))
    )


def _spec_sig(spec: Any) -> tuple:
    """Hashable canonical signature of a raw accumulator-arg spec —
    used to detect provably-identical input expressions so mirrored
    rank accumulators can share one window sort."""
    if isinstance(spec, Mapping):
        return ("m",) + tuple(
            (str(k), _spec_sig(v)) for k, v in spec.items()
        )
    if isinstance(spec, (list, tuple)):
        return ("l",) + tuple(_spec_sig(v) for v in spec)
    return (type(spec).__name__, spec)


def _topn_prefilter(
    df: DataFrame, heavy: Mapping[str, Mapping[str, Any]], part: list[Column]
) -> tuple[DataFrame, dict[str, Column]]:
    """Bounded-state N-accumulators ($topN/$bottomN/$minN/$maxN, plus —
    round 8 — $firstN/$lastN and mixed-direction $top/$bottom) via a
    SALTED two-phase window: phase 1 ranks within (group, salt) — salt
    = per-partition row index mod 64, so parallelism is 64x the group
    cardinality and no task ever sorts a whole group (the round-6 sf3
    rehearsal showed the unsalted per-group window going super-linear
    on 3-value group keys: three single-task sorts of 6M rows each) —
    and the aggregate collects only each bucket's local top-n (≤ 64·n
    candidates per group, a superset of the global top-n), then an
    in-array sort + slice picks the exact answer. State stays O(64·n),
    never O(group): the same OOM-proofing as the unsalted form, plus
    scale-out on low-cardinality/skewed group keys.  ``part`` is the
    already-compiled group-key columns ([] for a global ``_id: None``
    group: rank within salt buckets alone — 64 parallel bounded sorts
    instead of one whole-dataset collect_list buffer).

    Round 14 (guide §2.4 — remove passes): two accumulators whose
    orderings are exact mirrors (a $topN and a $bottomN with the same
    sortBy, a $minN and a $maxN on the same input, $firstN + $lastN)
    share ONE window sort — the mirrored accumulator's rank from its
    end is ``cnt - rn + 1`` via a count over the same (group, salt)
    bucket (same partition+order spec, unbounded frame, so Spark folds
    it into the SAME Window exec: no second Sort pass). And $minN/$maxN
    with n == 1 are plain null-ignoring min/max — no window at all."""
    from pyspark.sql import Window

    schema = df.schema
    # materialize the salt ONCE as a column shared by every heavy
    # accumulator's window (round 14): inlining the expression gave
    # each window its OWN salt — evaluated after the previous window's
    # shuffle, hence a DIFFERENT partitioning — so N accumulators paid
    # N full Exchanges. One shared salt column means one Exchange
    # feeding N Sorts (plan: 3 Exchange → 1 on the global
    # $topN/$minN/$maxN group); any salt assignment yields a superset
    # of the per-bucket top-n, so results are unchanged.
    #
    # The salt is the per-partition ROW INDEX mod B (the partition term
    # of monotonically_increasing_id is pid·2^33, divisible by B), not
    # pmod(spark_partition_id, B): partition-id salting caps the number
    # of distinct salts at the upstream partition COUNT, and a compact
    # scan (one parquet file ⇒ 1-3 splits) serialized the whole
    # sort+window+aggregate onto 1-3 tasks while the rest of the
    # cluster idled (guide §2.5 synthetic-key dispersal; measured: the
    # global-topN stage ran 1 task / 2.7 s CPU-bound at sf0.1).
    # Row-index salting round-robins every partition across all B
    # buckets — even dispersal at ANY upstream partition count, ties
    # included — and is deterministic under task retry given the same
    # partition layout and row order, exactly the guarantee
    # spark_partition_id offered.
    df = df.withColumn(
        "__tn_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(_TOPN_SALT_BUCKETS)),
    )
    salt = F.col("__tn_salt")
    # order-signature registry for mirror sharing: signature → (rank
    # column name, primary's "head" direction, bucket-count column name
    # or None). A later accumulator with the same signature and the
    # SAME direction reuses the rank column outright; the OPPOSITE
    # direction derives its rank from the count. _sig_dir_key builds a
    # canonical signature from the RAW spec so only provably-identical
    # orderings pair up.
    shared: dict[tuple, tuple[str, bool, str | None]] = {}

    def _bucket_count(order, count_expr: Column, j: int) -> tuple[str, Column]:
        cn = f"__tncnt_{j}"
        w = (
            Window.partitionBy(*part, salt)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        return cn, F.count(count_expr).over(w)

    def _rank_for(df, sig, j, head, order, count_expr):
        """Rank column (and its candidate predicate builder) for an
        accumulator ordered toward ``head``'s end of ``order`` (the
        signature's canonical primary direction is whichever came
        first). Returns (df, pred_fn) with pred_fn(n) = 'this row is
        within the first n from this accumulator's end'. ``count_expr``
        counts the rows that participate in the ranking (F.lit(1) for
        all rows; the input column itself for the null-ignoring
        $minN/$maxN, where F.count skips nulls)."""
        if sig in shared:
            rn, p_head, cnt, p_order = shared[sig]
            if head == p_head:
                return df, lambda n: F.col(rn) <= n
            if cnt is None:
                # count over the PRIMARY's (partition, order) spec with
                # an unbounded frame: same spec ⇒ same Window exec ⇒ no
                # second Sort; unbounded frame ⇒ the bucket total
                cnt, cc = _bucket_count(p_order, count_expr, j)
                df = df.withColumn(cnt, cc)
                shared[sig] = (rn, p_head, cnt, p_order)
            return df, lambda n, c=cnt: F.col(rn) > F.col(c) - n
        rn = f"__tnrn_{j}"
        df = df.withColumn(
            rn,
            F.row_number().over(Window.partitionBy(*part, salt).orderBy(*order)),
        )
        shared[sig] = (rn, head, None, order)
        return df, lambda n: F.col(rn) <= n
    if any(next(iter(s)) in ("$firstN", "$lastN") for s in heavy.values()):
        # scan-order id, captured BEFORE the window shuffle.  After an
        # explicit $sort the range partitioning makes it the sorted
        # order (partition index occupies the high bits), so
        # $sort + $firstN keeps its documented determinism; without a
        # $sort the order is engine-arbitrary, exactly as in Mongo.
        df = df.withColumn("__tn_ord", F.monotonically_increasing_id())
    overrides: dict[str, Column] = {}
    for j, (name, spec) in enumerate(heavy.items()):
        op, arg = next(iter(spec.items()))
        if op in ("$topN", "$bottomN", "$top", "$bottom"):
            n = 1 if op in ("$top", "$bottom") else int(arg["n"])
            head = op in ("$topN", "$top")
            sort_by = arg["sortBy"]
            ascs = _sortby_ascs(sort_by)
            keys = [compile_expr(f"${f}", schema) for f in sort_by]
            # rank each salt bucket toward the answer end of the sortBy
            # order: as-given for $top(N), per-key inverted for
            # $bottom(N) — so the rank predicate keeps a superset of
            # the answer. asc_nulls_first ↔ desc_nulls_last are exact
            # mirror total orders, so a $topN/$bottomN pair on the same
            # sortBy shares one sort (see _rank_for).
            dirs = ascs if head else [not a for a in ascs]
            order = [
                k.asc_nulls_first() if a else k.desc_nulls_last()
                for k, a in zip(keys, dirs)
            ]
            sig = ("sortby", tuple((str(f), bool(a)) for f, a in
                                   zip(sort_by, ascs)))
            df, pred = _rank_for(df, sig, j, head, order, F.lit(1))
            out_expr = compile_expr(arg["output"], schema)
            kept = F.when(
                pred(n),
                F.struct(
                    *[
                        compile_expr(f"${f}", schema).alias(f"__k{i}")
                        for i, f in enumerate(sort_by)
                    ],
                    out_expr.alias("__o"),
                ),
            )
            coll = F.collect_list(kept)
            # order the ≤64·n candidates in full sortBy order: the
            # FIRST n are $top(N)'s answer and the LAST n $bottom(N)'s
            if all(a == ascs[0] for a in ascs):
                arr = F.sort_array(coll, asc=ascs[0])
            else:
                arr = F.array_sort(coll, _sortby_comparator(ascs))
            sliced = F.slice(arr, 1, n) if head else _tail_slice(arr, n)
            vals = F.transform(sliced, lambda s: s.getField("__o"))
            if op in ("$top", "$bottom"):
                # scalar form: the slice holds exactly the one answer
                overrides[name] = F.element_at(vals, 1)
            else:
                overrides[name] = vals
        elif op in ("$firstN", "$lastN"):
            # document-order N: each salt bucket contributes its n
            # smallest (firstN) / largest (lastN) scan-order ids — the
            # global first/last n by scan id are each their bucket's
            # first/last n, so the ≤64·n candidates are a superset.
            # struct-wrap keeps nulls (Mongo keeps them).
            n = int(arg["n"])
            expr = compile_expr(arg["input"], schema)
            ordc = F.col("__tn_ord")
            df, pred = _rank_for(
                df, ("ord",), j, op == "$firstN",
                [ordc.asc() if op == "$firstN" else ordc.desc()], F.lit(1),
            )
            kept = F.when(
                pred(n),
                F.struct(ordc.alias("__ord"), expr.alias("__v")),
            )
            arr = F.sort_array(F.collect_list(kept), asc=True)
            sliced = F.slice(arr, 1, n) if op == "$firstN" else _tail_slice(arr, n)
            overrides[name] = F.transform(sliced, lambda s: s.getField("__v"))
        else:  # $minN / $maxN — Mongo ignores nulls
            n = int(arg["n"])
            inp = compile_expr(arg["input"], schema)
            asc = op == "$minN"
            if n == 1:
                # n=1 is a plain null-ignoring extremum: no window, no
                # sort — an all-null/empty group compacts to [] exactly
                # as the collect path did (round 14, guide §2.4)
                ext = F.min(inp) if asc else F.max(inp)
                overrides[name] = F.array_compact(F.array(ext))
                continue
            order = inp.asc_nulls_last() if asc else inp.desc_nulls_last()
            # both directions put nulls LAST, so the non-null rows of a
            # bucket occupy ranks 1..count(inp) under either order —
            # counting inp (nulls skipped) makes the mirrored rank
            # exact, and ties are value-identical so the kept SET is
            # order-independent
            sig = ("input", _spec_sig(arg["input"]))
            df, pred = _rank_for(df, sig, j, asc, [order], inp)
            kept = F.when(pred(n) & inp.isNotNull(), inp)
            overrides[name] = F.slice(
                F.sort_array(F.collect_list(kept), asc=asc), 1, n
            )
    return df, overrides


def _heavy_accs(accs: Mapping[str, Any]) -> dict[str, Mapping[str, Any]]:
    """Accumulators whose naive compile keeps O(group) state — routed
    through the salted window prefilter wherever they appear in a
    grouped aggregate ($group, $bucket, $bucketAuto, decorrelated
    $lookup $group).  Uniform-direction $top/$bottom stay on
    min_by/max_by (1-element state, no window needed)."""
    heavy: dict[str, Mapping[str, Any]] = {}
    for name, spec in accs.items():
        if not (isinstance(spec, Mapping) and len(spec) == 1):
            continue
        op, arg = next(iter(spec.items()))
        if op in _TOPN_OPS or op in ("$firstN", "$lastN"):
            heavy[name] = spec
        elif op in ("$top", "$bottom") and isinstance(arg, Mapping):
            ascs = _sortby_ascs(arg.get("sortBy") or {})
            if ascs and not all(a == ascs[0] for a in ascs):
                heavy[name] = spec
    return heavy


def _compile_group_aggs(
    df: DataFrame, accs: Mapping[str, Any], part: list[Column]
) -> tuple[DataFrame, list[Column]]:
    """Shared accumulator compiler for every grouped-aggregate call
    site: splits out the O(group)-state accumulators (see
    :func:`_heavy_accs`) into the bounded salted prefilter and compiles
    the rest directly.  $bucket/$bucketAuto groups are few-and-huge by
    construction, so an unbounded N-accumulator there is the same
    100 TB OOM class the r6/r7 $group fixes covered — every call site
    must go through here, not `_acc_column` directly."""
    heavy = _heavy_accs(accs)
    overrides: dict[str, Column] = {}
    if heavy:
        df, overrides = _topn_prefilter(df, heavy, part)
    agg_cols = [
        (
            overrides[name]
            if name in overrides
            else _acc_column(spec, df.schema)
        ).alias(name)
        for name, spec in accs.items()
    ]
    return df, agg_cols


def _group_part_cols(id_spec: Any, schema) -> list[Column]:
    """The prefilter's window-partition columns for a $group _id spec —
    [] for the global (_id: None) form (rank within salt alone)."""
    if id_spec is None:
        return []
    if isinstance(id_spec, Mapping) and not any(
        str(k).startswith("$") for k in id_spec
    ):
        return [compile_expr(v, schema) for v in id_spec.values()]
    return [compile_expr(id_spec, schema)]


def _group(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    if "_id" not in arg:
        raise PipelineCompileError("$group requires _id")
    id_spec = arg["_id"]
    accs = {k: v for k, v in arg.items() if k != "_id"}
    # keyed AND global (_id: None) groups take the bounded salted
    # window-prefilter path for N-accumulators; the global form
    # partitions by salt alone, so no task ever sorts more than one
    # salt bucket and the final agg buffer holds ≤ 64·n candidates
    df, agg_cols = _compile_group_aggs(
        df, accs, _group_part_cols(id_spec, df.schema)
    )
    if not agg_cols:
        # {"$group": {"_id": ...}} with no accumulators — Mongo's
        # dedupe idiom; Spark's agg() requires >=1 expr, so count and
        # drop (round-8 collation fuzzer found the bare-_id crash)
        drop_n = True
        agg_cols = [F.count(F.lit(1)).alias("__gn")]
    else:
        drop_n = False

    if id_spec is None:
        # Spark's global aggregate emits one row even over empty input;
        # Mongo's $group emits NOTHING when there are no input docs —
        # count alongside and drop the empty-input row
        out = df.agg(*agg_cols, F.count(F.lit(1)).alias("__n"))
        out = out.where(F.col("__n") > 0).drop("__n")
        return out.select(F.lit(None).alias("_id"), *[F.col(n) for n in accs])

    # active collation (aggregate option, round 7): string group keys
    # collate like Mongo's — 'Apple'/'aPPLE' merge under strength 2.
    # The representative _id is an arbitrary member of the equivalence
    # class (as in Mongo); the output column is de-collated so the
    # collation never leaks into downstream schemas.
    from anser_spark.functions.collation import collate_expr_if_string, decollate

    if isinstance(id_spec, Mapping) and not any(
        str(k).startswith("$") for k in id_spec
    ):
        # compound key document → group by each sub-expression, then
        # re-nest as a struct _id (Catalyst groups on flat keys — cheaper
        # than grouping on a struct and identical semantics)
        key_cols: dict[str, Column] = {}
        collated_keys: set[str] = set()
        for k, v in id_spec.items():
            expr, wrapped = collate_expr_if_string(df, compile_expr(v, df.schema))
            key_cols[k] = expr.alias(f"__id_{k}")
            if wrapped:
                collated_keys.add(k)
        grouped = df.groupBy(*key_cols.values()).agg(*agg_cols)
        id_struct = F.struct(
            *[
                (
                    decollate(F.col(f"__id_{k}"))
                    if k in collated_keys
                    else F.col(f"__id_{k}")
                ).alias(k)
                for k in id_spec
            ]
        ).alias("_id")
        return grouped.select(id_struct, *[F.col(n) for n in accs])

    key_expr, wrapped = collate_expr_if_string(
        df, compile_expr(id_spec, df.schema)
    )
    grouped = df.groupBy(key_expr.alias("_id")).agg(*agg_cols)
    if wrapped:
        grouped = grouped.withColumn("_id", decollate(F.col("_id")))
    return grouped.drop("__gn") if drop_n else grouped


_EARTH_RADIUS_M = 6_371_000.0  # mean Earth radius; shared with filters.$centerSphere


def _haversine_m(loc: Column, lon0: float, lat0: float) -> Column:
    """Great-circle distance in meters from [lon, lat] array column to a
    fixed point — pure Column trig, codegen'd, no UDF."""
    import math as _math

    lam = F.radians(loc.getItem(0).cast("double"))
    phi = F.radians(loc.getItem(1).cast("double"))
    lam0, phi0 = _math.radians(lon0), _math.radians(lat0)
    a = (
        F.pow(F.sin((phi - F.lit(phi0)) / 2), 2)
        + F.lit(_math.cos(phi0)) * F.cos(phi) * F.pow(F.sin((lam - F.lit(lam0)) / 2), 2)
    )
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def _point_in_geojson(field: Column, geometry: Mapping[str, Any]) -> Column:
    """Even-odd point-in-polygon over a GeoJSON Polygon or MultiPolygon
    for a [lon, lat] array column — the same driver-side-constant
    ray-casting XOR fold as the legacy ``$geoWithin: {$polygon: ...}}``
    (flat geometry), extended to holes and multiple polygons: the
    even-odd rule is ONE XOR fold over every ring's edges (a point
    inside a hole crosses the hole ring's edges an odd number of times
    and flips back out).  Expression size is linear in total vertex
    count; everything stays in whole-stage codegen."""
    gtype = geometry.get("type")
    if gtype == "Polygon":
        polys = [geometry["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = list(geometry["coordinates"])
    else:
        raise PipelineCompileError(
            f"unsupported GeoJSON geometry {gtype!r} for a point field: "
            "Polygon and MultiPolygon are implemented (a point never "
            "meaningfully intersects a LineString)"
        )
    x = field.getItem(0).cast("double")
    y = field.getItem(1).cast("double")
    inside = F.lit(False)
    for rings in polys:
        for ring in rings:
            # RFC 7946 allows a third (altitude) element per position —
            # take lon/lat and ignore the rest
            if any(len(pt) < 2 for pt in ring):
                raise PipelineCompileError(
                    "GeoJSON position needs [lon, lat]"
                )
            pts = [(float(pt[0]), float(pt[1])) for pt in ring]
            if len(pts) < 3:
                raise PipelineCompileError(
                    "GeoJSON ring needs at least 3 vertices"
                )
            for i in range(len(pts)):
                xi, yi = pts[i]
                xj, yj = pts[i - 1]
                if yj == yi:
                    continue  # horizontal/zero-length edges never cross
                crosses = ((F.lit(yi) > y) != (F.lit(yj) > y)) & (
                    x < (y - F.lit(yi)) * F.lit((xj - xi) / (yj - yi))
                    + F.lit(xi)
                )
                inside = inside != crosses  # boolean XOR fold
    return inside


def _geo_near(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """``$geoNear``: distance (spherical haversine, meters — mean Earth
    radius 6 371 000 m, documented divergence from Mongo's ellipsoidal
    constants) to ``near``, filtered by min/maxDistance and ``query``,
    sorted nearest-first. Everything is Column math: one scan + one
    TakeOrdered-able sort; nothing collects.

    ``near`` is a GeoJSON Point or legacy [lon, lat]; ``key`` names an
    array<numeric> [lon, lat] column (default "location").
    """
    from anser_spark.functions.filters import resolve_field

    near = arg["near"]
    coords = near["coordinates"] if isinstance(near, Mapping) else near
    lon0, lat0 = float(coords[0]), float(coords[1])
    key = arg.get("key", "location")
    dist_field = arg.get("distanceField", "distance")
    mult = float(arg.get("distanceMultiplier", 1.0))

    if arg.get("query"):
        df = df.where(compile_filter(arg["query"], df.schema))
    meters = _haversine_m(resolve_field(key), lon0, lat0)
    df = df.withColumn("__geo_m", meters)
    if "maxDistance" in arg:
        df = df.where(F.col("__geo_m") <= float(arg["maxDistance"]))
    if "minDistance" in arg:
        df = df.where(F.col("__geo_m") >= float(arg["minDistance"]))
    return (
        df.withColumn(dist_field, F.col("__geo_m") * F.lit(mult))
        .drop("__geo_m")
        .orderBy(F.col(dist_field).asc())
    )


_SEARCH_OPERATORS = (
    "text", "phrase", "compound", "equals", "range", "exists", "in",
    "wildcard", "autocomplete", "moreLikeThis", "regex", "near",
    "embeddedDocument", "queryString", "geoWithin", "geoShape",
)


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


def _search_analyzer(spec: Mapping[str, Any]) -> str:
    # Atlas analyzer names → this engine's analyzers (round 7):
    # lucene.standard/keyword = exact lowercased tokens,
    # lucene.english = Snowball stopwords + Porter2 stemming (the same
    # pipeline the legacy $text 'english' language uses)
    name = str(spec.get("analyzer", "lucene.standard"))
    mapping = {
        "lucene.standard": "none",
        "lucene.keyword": "none",
        "lucene.english": "english",
    }
    if name not in mapping:
        raise PipelineCompileError(
            f"unsupported $search analyzer {name!r}: "
            f"{sorted(mapping)} are implemented"
        )
    return mapping[name]


def _search_text_terms(spec: Mapping[str, Any]) -> list[str]:
    """The ``$search`` ``text`` operator's analyzed query terms
    (shared by the scan compile, the postings path, and $searchMeta —
    duplicates preserved, see bm25_score_expr)."""
    from anser_spark.operators.ranking import analyze_terms

    words = [w for w in str(spec["query"]).lower().split() if w]
    if not words:
        raise PipelineCompileError(
            "$search text.query must contain at least one term"
        )
    return analyze_terms(words, _search_analyzer(spec))


# structured (non-relevance) $search operators: predicate + constant
# score — safe to evaluate as pure Columns over a postings-joined frame
_SEARCH_STRUCTURED_OPS = {"equals", "range", "exists", "in", "wildcard"}


def _search_compound_postings(
    df: DataFrame,
    spec: Mapping[str, Any],
    index: Mapping[str, Any],
    score_field: str,
) -> DataFrame | None:
    """The common Atlas compound shape — ONE ``text`` clause in
    ``must`` anchoring relevance, everything else structured
    (equals/range/exists/in/wildcard) — answered from the postings
    index (round 9): candidates come from the text clause's postings
    lookup (no corpus scan, no Python), and the structured clauses
    apply as pure Columns over that bounded frame with exactly the
    scan path's scoring (must/should constant scores sum onto the
    BM25; per-clause and compound-level score options respected).
    Returns None when the shape doesn't fit — the scan compile handles
    it unchanged."""
    from anser_spark.operators.ranking import search_text_postings

    must = list(spec.get("must", []))
    filt = list(spec.get("filter", []))
    must_not = list(spec.get("mustNot", []))
    should = list(spec.get("should", []))
    if not (must or filt or must_not or should):
        return None  # scan path raises the proper error

    def _op_of(clause):
        if not isinstance(clause, Mapping) or len(clause) != 1:
            return None
        return next(iter(clause))

    anchor_pos = [
        i for i, c in enumerate(must) if _op_of(c) in ("text", "phrase")
    ]
    if len(anchor_pos) != 1:
        return None
    a_op = _op_of(must[anchor_pos[0]])
    rest_must = [c for i, c in enumerate(must) if i != anchor_pos[0]]
    for clause in rest_must + filt + must_not + should:
        if _op_of(clause) not in _SEARCH_STRUCTURED_OPS:
            return None
    tclause = must[anchor_pos[0]][a_op]
    if not (isinstance(tclause, Mapping)
            and "query" in tclause and "path" in tclause):
        return None
    anchor_field = None
    if index.get("weights"):
        # round 12: a weighted index anchors the compound through its
        # single-field view (field-filtered postings) — the structured
        # rest compiles as Columns on the bounded frame either way
        view = _weighted_field_view(index, str(tclause["path"]))
        if view is None:
            return None
        index = view
        anchor_field = str(tclause["path"])
    if a_op == "phrase":
        # round 10: a PHRASE must-clause anchors the candidates via the
        # positions predicate — same bounded shape as the text anchor
        from anser_spark.operators.ranking import search_phrase_postings

        pterms = [w for w in str(tclause["query"]).lower().split() if w]
        if not pterms:
            return None
        out = search_phrase_postings(
            df, pterms, int(tclause.get("slop", 0) or 0),
            str(tclause["path"]), index, "__compoundText",
            ordered=bool(tclause.get("ordered")),
            field=anchor_field,
        )
        if out is None:
            return None
    else:
        if _search_analyzer(tclause) != (
            index.get("default_language", "none") or "none"
        ):
            return None
        terms = _search_text_terms(tclause)
        if not terms:
            return None
        out = search_text_postings(
            df, terms, str(tclause["path"]), index, "__compoundText",
            field=anchor_field,
        )
        if out is None:
            return None
    text_score = _search_score_option(tclause, F.col("__compoundText"))

    compiled_must = [_one_search_op(df, c) for c in rest_must]
    compiled_filt = [_one_search_op(df, c) for c in filt]
    compiled_not = [_one_search_op(df, c) for c in must_not]
    compiled_should = [_one_search_op(df, c) for c in should]
    min_should = int(spec.get("minimumShouldMatch", 0))
    # the text clause in must anchors the match, so Lucene's
    # should-is-optional rule applies unless minimumShouldMatch is set
    pred = None
    for p, _s in compiled_must + compiled_filt:
        pred = p if pred is None else pred & p
    for p, _s in compiled_not:
        np_ = ~F.coalesce(p, F.lit(False))
        pred = np_ if pred is None else pred & np_
    if compiled_should and min_should > 0:
        n_matched = None
        for p, _s in compiled_should:
            one = F.coalesce(p, F.lit(False)).cast("int")
            n_matched = one if n_matched is None else n_matched + one
        sp = n_matched >= F.lit(min_should)
        pred = sp if pred is None else pred & sp
    score = text_score
    for p, s in compiled_must:
        score = score + F.when(p, s).otherwise(F.lit(0.0))
    for p, s in compiled_should:
        score = score + F.when(
            F.coalesce(p, F.lit(False)), s
        ).otherwise(F.lit(0.0))
    if pred is not None:
        out = out.where(F.coalesce(pred, F.lit(False)))
    return out.withColumn(
        score_field, _search_score_option(spec, score).cast("double")
    ).drop("__compoundText")


def _search_score_option(spec: Mapping[str, Any], score: Column) -> Column:
    """Atlas per-operator ``score`` option: ``{"boost": {"value": w}}``
    multiplies, ``{"constant": {"value": c}}`` replaces."""
    opt = spec.get("score")
    if not isinstance(opt, Mapping):
        return score
    if "boost" in opt:
        return score * F.lit(float(opt["boost"]["value"]))
    if "constant" in opt:
        return F.lit(float(opt["constant"]["value"]))
    raise PipelineCompileError(f"unsupported $search score option: {opt!r}")


def _parse_query_string(q: str) -> Any:
    """Tokenize + parse the Lucene query-string subset:
    ``field:value``, bare terms (default field), quoted phrases,
    AND / OR / NOT (and ``-`` prefix), parentheses, ``*``/``?``
    wildcards in values. Returns an AST of
    ('or', [...]) / ('and', [...]) / ('not', node) /
    ('term', field|None, value, is_phrase)."""
    import re as _re

    # the quoted-phrase alternative accepts an optional field prefix
    # (``title:"big data"``) — without it the token split at whitespace
    # inside the quotes and silently matched the literal '"big'
    toks = _re.findall(
        r'\(|\)|[^\s()]*"[^"]*"|[^\s()]+',
        q,
    )
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def parse_or():
        nonlocal pos
        parts = [parse_and()]
        while peek() == "OR":
            pos += 1
            parts.append(parse_and())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def parse_and():
        nonlocal pos
        parts = [parse_not()]
        while True:
            t = peek()
            if t == "AND":
                pos += 1
                parts.append(parse_not())
            elif t == "NOT":
                # Lucene: "x NOT y" = x AND NOT y (prohibited clause)
                pos += 1
                parts.append(("not", parse_not()))
            else:
                break
        return parts[0] if len(parts) == 1 else ("and", parts)

    def parse_not():
        nonlocal pos
        t = peek()
        if t == "NOT":
            pos += 1
            return ("not", parse_not())
        return parse_atom()

    def parse_atom():
        nonlocal pos
        t = peek()
        if t is None:
            raise PipelineCompileError(f"queryString: unexpected end in {q!r}")
        if t == "(":
            pos += 1
            node = parse_juxt()
            if peek() != ")":
                raise PipelineCompileError(f"queryString: missing ')' in {q!r}")
            pos += 1
            return node
        pos += 1
        if t.startswith("-") and len(t) > 1:
            toks.insert(pos, t[1:])
            return ("not", parse_atom())
        field = None
        val = t
        if ":" in t and not t.startswith('"'):
            field, val = t.split(":", 1)
        is_phrase = (
            len(val) >= 2 and val.startswith('"') and val.endswith('"')
        )
        if is_phrase:
            val = val[1:-1]
        elif '"' in val:
            # unpaired/embedded quote — refuse rather than match the
            # literal '"foo' token against the index
            raise PipelineCompileError(
                f"queryString: unpaired quote in {q!r}"
            )
        return ("term", field, val, is_phrase)

    def parse_juxt():
        # bare juxtaposition = OR (Lucene's default operator), except
        # prohibited clauses ("-term" / leading NOT) which are global
        # must-nots over the juxtaposed group
        nonlocal pos
        parts = [parse_or()]
        while peek() is not None and peek() != ")":
            parts.append(parse_or())
        pos_parts = [p for p in parts if not (isinstance(p, tuple) and p[0] == "not")]
        neg_parts = [p for p in parts if isinstance(p, tuple) and p[0] == "not"]
        if not neg_parts:
            return parts[0] if len(parts) == 1 else ("or", parts)
        out = None
        if pos_parts:
            out = pos_parts[0] if len(pos_parts) == 1 else ("or", pos_parts)
        for n in neg_parts:
            out = n if out is None else ("and", [out, n])
        return out

    node = parse_juxt()
    if peek() is not None:
        raise PipelineCompileError(f"queryString: trailing tokens in {q!r}")
    return node


def _compile_search_op(  # noqa: C901
    df: DataFrame,
    op: str,
    spec: Mapping[str, Any],
    stats_loader=None,
    need_score: bool = True,
    field_stats_loader=None,
) -> tuple[Column, Column]:
    """One Atlas search operator → (match predicate, score Column).

    Every operator is pure Column math over the current frame — no
    joins, no shuffles; the whole $search stage stays one scan.
    Relevance operators (text/phrase/moreLikeThis) score BM25 (stats
    folded in as literals via bm25_score_expr); structured operators
    (equals/range/exists/in/wildcard) score the Atlas constant 1.
    ``compound`` composes clauses with Lucene semantics.

    ``stats_loader(terms) -> (n_docs, avgdl, {term: df})`` is supplied
    when a persistent bm25 index backs the stage: relevance clauses
    then resolve their idf values from the index's term table (a
    pushed-down point lookup) instead of aggregating the corpus.

    ``need_score=False`` (the $searchMeta path) skips BM25 entirely —
    the match predicate of a relevance clause only needs "contains ≥1
    query term", so a count/facet query never pays the corpus-stats
    aggregate its unused scores would have cost.

    ``field_stats_loader(field, terms) -> (n_docs, avgdl, {term: df})``
    (round 13) supplies PER-FIELD stats for multi-path relevance
    scoring when a weighted multi-field index backs the stage — a
    multi-path ``phrase``'s per-field BM25 then resolves idf from the
    index's field-tagged term table exactly as the postings plan does
    (under a stemmed index the raw phrase tokens read df≈0 from the
    analyzed table on BOTH plans, keeping the differential bit-exact).
    """
    from anser_spark.functions.filters import resolve_field
    from anser_spark.operators.ranking import bm25_score_expr

    def _bm25(
        terms: list[str], path: str, language: str = "none",
        with_pred: bool = False,
    ) -> Column:
        # terms are ALREADY analyzed by the calling operator — never
        # re-analyze (stemming is not idempotent against the stopword
        # list: 'owns'→'own' would vanish on a second pass)
        stats = stats_loader(terms) if stats_loader is not None else None
        return bm25_score_expr(
            df, terms, text_col=path, stats=stats,
            language=language, analyzed=True, with_pred=with_pred,
        )

    _analyzer = _search_analyzer

    def _any_term_pred(terms: list[str], path: str, language: str = "none") -> Column:
        from anser_spark.operators.ranking import _tokens

        # ONE exists over the shared stream (≡ OR of per-term equality):
        # the pushed-down filter then tokenizes once per row instead of
        # once per term (round 14)
        toks = _tokens(path, language)
        vals = list(dict.fromkeys(terms))
        return F.exists(toks, lambda w: w.isin(vals))

    if op in ("text", "phrase") and not (
        isinstance(spec, Mapping) and "query" in spec and "path" in spec
    ):
        raise PipelineCompileError(
            f"$search {op} requires {{'query': …, 'path': …}}"
        )
    if op == "text":
        language = _analyzer(spec)
        terms = _search_text_terms(spec)
        raw_path = spec["path"]
        if not terms:
            # every query term was a stopword under this analyzer —
            # nothing can match (Lucene drops them the same way)
            return F.lit(False), F.lit(0.0)
        if isinstance(raw_path, (list, tuple)):
            # round 11: Atlas multi-path text — match any field, score
            # = Σ per-field BM25 with each field's own inline stats
            # (an attached single-field index's term table describes
            # one field, so multi-path scoring stays index-less; one
            # constant-width aggregate per field at compile time)
            fields = [str(p) for p in raw_path]
            if not fields:
                raise PipelineCompileError(
                    "$search text.path list must name at least one field"
                )
            pred = None
            for fname in fields:
                p2 = _any_term_pred(terms, fname, language)
                pred = p2 if pred is None else (pred | p2)
            if not need_score:
                return pred, F.lit(1.0)
            score = None
            mpred = None
            for fname in fields:
                # a NULL field contributes 0, not NULL — one missing
                # value must not null out the whole multi-path score
                fscore, fpred = bm25_score_expr(
                    df, terms, text_col=fname,
                    language=language, analyzed=True, with_pred=True,
                )
                part = F.coalesce(fscore, F.lit(0.0))
                score = part if score is None else score + part
                # Σ coalesce(score_f, 0) > 0 ⟺ some field's score > 0 ⟺
                # OR of the per-field cheap predicates (each lit(False)
                # exactly when its score collapsed to lit(0.0)) — the
                # pushed filter tokenizes each field once, not per term
                # and not through the full score arithmetic (round 14)
                mpred = fpred if mpred is None else (mpred | fpred)
            # the original `score > 0` was never NULL (per-part
            # coalesce), so the replacement must not be either —
            # compound mustNot negates this predicate
            return (
                F.coalesce(mpred, F.lit(False)),
                _search_score_option(spec, score),
            )
        path = str(raw_path)
        if not need_score:
            return _any_term_pred(terms, path, language), F.lit(1.0)
        score, pred = _bm25(terms, path, language, with_pred=True)
        return pred, _search_score_option(spec, score)
    if op == "phrase":
        terms = [w for w in str(spec["query"]).lower().split() if w]
        if not terms:
            raise PipelineCompileError("$search phrase.query must contain at least one term")
        # exact adjacent-terms match on normalized text (lower,
        # whitespace-collapsed, word-boundary anchored); scored BM25
        # over the phrase's terms (documented divergence: Atlas scores
        # positionally, this engine scores the constituent terms).
        # slop > 0 (round 10): ordered sloppy match via token-position
        # arrays — the SAME predicate the postings path evaluates over
        # its stored positions, so the two plans stay bit-exact.
        import re as _re

        slop = int(spec.get("slop", 0) or 0)

        def _phrase_pred(ppath: str) -> Column:
            if slop:
                from anser_spark.operators.ranking import (
                    _tokens,
                    phrase_positions_pred,
                    phrase_positions_pred_unordered,
                    term_positions,
                )

                toks = _tokens(ppath, "none")
                if spec.get("ordered"):
                    # engine extension: the pre-round-11 in-order sloppy
                    # semantics, kept behind an explicit option
                    pred_raw = phrase_positions_pred(
                        [term_positions(toks, t) for t in terms], slop
                    )
                else:
                    # round 11 default: Lucene move-distance slop —
                    # admits out-of-order terms once slop covers the
                    # transposition cost ("data spark" matches query
                    # "spark data" at slop 2), matching Atlas
                    pred_raw = phrase_positions_pred_unordered(
                        terms,
                        {
                            t: term_positions(toks, t)
                            for t in dict.fromkeys(terms)
                        },
                        slop,
                    )
                return F.coalesce(pred_raw, F.lit(False))
            normalized = F.regexp_replace(
                F.lower(F.trim(resolve_field(ppath).cast("string"))),
                r"\s+", " ",
            )
            phrase = " ".join(terms)
            return normalized.rlike(
                r"(^|\s)" + _re.escape(phrase) + r"(\s|$)"
            )

        raw_path = spec["path"]
        if isinstance(raw_path, (list, tuple)):
            # round 13: Atlas multi-path phrase — the phrase must hold
            # WITHIN one field (per-field predicate, ORed), score =
            # Σ over matched fields of that field's constituent-term
            # BM25 in request order (each field's own stats; a weighted
            # index supplies them field-tagged via field_stats_loader)
            fields = [str(p) for p in raw_path]
            if not fields:
                raise PipelineCompileError(
                    "$search phrase.path list must name at least one field"
                )
            preds = [
                F.coalesce(_phrase_pred(fname), F.lit(False))
                for fname in fields
            ]
            pred = preds[0]
            for p in preds[1:]:
                pred = pred | p
            if not need_score:
                return pred, F.lit(1.0)
            from anser_spark.operators.ranking import bm25_score_expr

            score = None
            for fname, pred_f in zip(fields, preds):
                stats = (
                    field_stats_loader(fname, terms)
                    if field_stats_loader is not None
                    else None
                )
                part = F.coalesce(
                    F.when(
                        pred_f,
                        bm25_score_expr(
                            df, terms, text_col=fname, stats=stats,
                            analyzed=True,
                        ),
                    ).otherwise(F.lit(0.0)),
                    F.lit(0.0),
                )
                score = part if score is None else score + part
            return pred, _search_score_option(spec, score)
        path = str(raw_path)
        pred = _phrase_pred(path)
        if not need_score:
            return pred, F.lit(1.0)
        score = _bm25(terms, path)
        return pred, _search_score_option(spec, F.when(pred, score).otherwise(F.lit(0.0)))
    if op == "equals":
        pred = resolve_field(str(spec["path"])) == F.lit(spec["value"])
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "range":
        field = resolve_field(str(spec["path"]))
        parts = []
        for bound, cmp in (("gt", field.__gt__), ("gte", field.__ge__),
                           ("lt", field.__lt__), ("lte", field.__le__)):
            if bound in spec:
                parts.append(cmp(F.lit(spec[bound])))
        if not parts:
            raise PipelineCompileError("$search range needs gt/gte/lt/lte")
        pred = parts[0]
        for p in parts[1:]:
            pred = pred & p
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "exists":
        return resolve_field(str(spec["path"])).isNotNull(), _search_score_option(
            spec, F.lit(1.0)
        )
    if op == "in":
        vals = list(spec["value"])
        return resolve_field(str(spec["path"])).isin(vals), _search_score_option(
            spec, F.lit(1.0)
        )
    if op == "wildcard":
        import re as _re

        pat = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in str(spec["query"])
        )
        pred = resolve_field(str(spec["path"])).cast("string").rlike(f"^{pat}$")
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "geoWithin":
        # Atlas geoWithin over a [lon, lat] point path: circle
        # (center + radius meters, haversine), box (bottomLeft /
        # topRight rectangle in degrees), or (round 8) GeoJSON
        # Polygon/MultiPolygon geometry via the even-odd ray-cast fold
        # (flat geometry, like the legacy $polygon — documented).
        field = resolve_field(str(spec["path"]))
        if "circle" in spec:
            c0 = spec["circle"]["center"]
            coords = c0["coordinates"] if isinstance(c0, Mapping) else c0
            dist = _haversine_m(field, float(coords[0]), float(coords[1]))
            pred = dist <= F.lit(float(spec["circle"]["radius"]))
        elif "box" in spec:
            bl = spec["box"]["bottomLeft"]
            tr = spec["box"]["topRight"]
            bl = bl["coordinates"] if isinstance(bl, Mapping) else bl
            tr = tr["coordinates"] if isinstance(tr, Mapping) else tr
            lon = field.getItem(0).cast("double")
            lat = field.getItem(1).cast("double")
            pred = (
                (lon >= F.lit(float(bl[0]))) & (lon <= F.lit(float(tr[0])))
                & (lat >= F.lit(float(bl[1]))) & (lat <= F.lit(float(tr[1])))
            )
        elif "geometry" in spec:
            pred = _point_in_geojson(field, spec["geometry"])
        else:
            raise PipelineCompileError(
                "$search geoWithin supports circle, box, and GeoJSON "
                "Polygon/MultiPolygon geometry"
            )
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "geoShape":
        # Atlas geoShape over a [lon, lat] POINT path (this engine's
        # geo data model): 'within' and 'intersects' are both
        # point-in-shape for points; 'disjoint' is its negation
        # (null-safe: a null point is neither within nor disjoint —
        # matching Atlas, which skips documents missing the path).
        if "path" not in spec or "geometry" not in spec:
            raise PipelineCompileError(
                "$search geoShape requires path, relation, and geometry"
            )
        field = resolve_field(str(spec["path"]))
        relation = spec.get("relation")
        inside = _point_in_geojson(field, spec["geometry"])
        if relation in ("within", "intersects"):
            pred = inside
        elif relation == "disjoint":
            pred = field.isNotNull() & ~inside
        else:
            raise PipelineCompileError(
                f"unsupported $search geoShape relation {relation!r}: "
                "within/intersects/disjoint over point fields"
            )
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "queryString":
        # Lucene query-string subset compiled to one boolean Column:
        # field:value terms tokenize-match (wildcards via */?), quoted
        # phrases substring-match, AND/OR/NOT/parens compose;
        # defaultPath fields bare terms. Constant score 1 (Atlas scores
        # per-clause; documented divergence).
        import re as _re3

        default_path = str(spec["defaultPath"])
        ast = _parse_query_string(str(spec["query"]))

        def term_pred(field, val, is_phrase):
            col = resolve_field(field or default_path).cast("string")
            if is_phrase:
                return F.lower(col).contains(F.lit(val.lower()))
            if "*" in val or "?" in val:
                pat = "".join(
                    ".*" if ch == "*" else "." if ch == "?" else _re3.escape(ch)
                    for ch in val.lower()
                )
                toks = F.filter(
                    F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
                )
                return F.exists(toks, lambda w: w.rlike(f"^{pat}$"))
            toks = F.filter(
                F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
            )
            return F.exists(toks, lambda w: w == F.lit(val.lower()))

        def compile_node(node) -> Column:
            kind = node[0]
            if kind == "term":
                return F.coalesce(
                    term_pred(node[1], node[2], node[3]), F.lit(False)
                )
            if kind == "not":
                return ~compile_node(node[1])
            parts = [compile_node(n) for n in node[1]]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if kind == "and" else (out | p)
            return out

        pred = compile_node(ast)
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "embeddedDocument":
        # Atlas embeddedDocument: the sub-operator applies PER ELEMENT
        # of an array<struct> path; a document matches when any element
        # matches. Sub-operator paths are prefixed with the embedded
        # path ("items.qty" inside path "items"). Supported element
        # operators: equals, range, exists, in, wildcard, regex, text
        # (any-term containment). Score = number of matching elements
        # (Atlas sums per-element scores; structured clauses score 1
        # each — documented divergence for BM25-scored text clauses).
        import re as _re2

        epath = str(spec["path"])
        (sub_op, sub_spec), = spec["operator"].items()

        def _field_of(e: Column) -> Column:
            sp = str(sub_spec["path"])
            if sp == epath:
                return e
            if not sp.startswith(epath + "."):
                raise PipelineCompileError(
                    f"embeddedDocument sub-operator path {sp!r} must be "
                    f"prefixed with the embedded path {epath!r}"
                )
            col = e
            for part in sp[len(epath) + 1 :].split("."):
                col = col.getItem(part)
            return col

        def elem_pred(e: Column) -> Column:
            if sub_op == "equals":
                return _field_of(e) == F.lit(sub_spec["value"])
            if sub_op == "range":
                fld = _field_of(e)
                parts = []
                for bound, cmp in (
                    ("gt", fld.__gt__), ("gte", fld.__ge__),
                    ("lt", fld.__lt__), ("lte", fld.__le__),
                ):
                    if bound in sub_spec:
                        parts.append(cmp(F.lit(sub_spec[bound])))
                if not parts:
                    raise PipelineCompileError(
                        "embeddedDocument range needs gt/gte/lt/lte"
                    )
                pred = parts[0]
                for p in parts[1:]:
                    pred = pred & p
                return pred
            if sub_op == "exists":
                return _field_of(e).isNotNull()
            if sub_op == "in":
                return _field_of(e).isin(list(sub_spec["value"]))
            if sub_op == "wildcard":
                pat = "".join(
                    ".*" if ch == "*" else "." if ch == "?" else _re2.escape(ch)
                    for ch in str(sub_spec["query"])
                )
                return _field_of(e).cast("string").rlike(f"^{pat}$")
            if sub_op == "regex":
                return (
                    _field_of(e)
                    .cast("string")
                    .rlike(f"^(?:{sub_spec['query']})$")
                )
            if sub_op == "text":
                terms = [
                    w for w in str(sub_spec["query"]).lower().split() if w
                ]
                toks = F.filter(
                    F.split(F.lower(F.trim(_field_of(e).cast("string"))), r"\s+"),
                    lambda t: t != "",
                )
                pred = None
                for t in terms:
                    h = F.exists(toks, lambda w: w == F.lit(t))
                    pred = h if pred is None else pred | h
                if pred is None:
                    raise PipelineCompileError(
                        "embeddedDocument text.query must contain a term"
                    )
                return pred
            raise PipelineCompileError(
                f"unsupported embeddedDocument sub-operator: {sub_op!r}"
            )

        arr = resolve_field(epath)
        n_match = F.size(
            F.filter(arr, lambda e: F.coalesce(elem_pred(e), F.lit(False)))
        )
        pred = F.coalesce(n_match > 0, F.lit(False))
        return pred, _search_score_option(spec, n_match.cast("double"))
    if op == "regex":
        # Atlas regex operator: full-string match (Lucene anchors the
        # pattern); Java regex syntax here — a documented divergence
        # from Lucene's (no \d classes in Lucene, etc.)
        pred = (
            resolve_field(str(spec["path"]))
            .cast("string")
            .rlike(f"^(?:{spec['query']})$")
        )
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "near":
        # Atlas near: proximity scoring around origin with pivot —
        # score = pivot / (pivot + |value - origin|) ∈ (0, 1], matching
        # every doc with a non-null path. origin may be numeric, a
        # date (ISO string or datetime → millisecond distance), or a
        # GeoJSON point / [lon, lat] (meter distance via haversine).
        import datetime as _dt

        origin = spec["origin"]
        pivot = float(spec["pivot"])
        field = resolve_field(str(spec["path"]))
        if isinstance(origin, Mapping) and "coordinates" in origin:
            origin = origin["coordinates"]
        if isinstance(origin, (list, tuple)):
            lon0, lat0 = float(origin[0]), float(origin[1])
            dist = _haversine_m(field, lon0, lat0)
        elif isinstance(origin, _dt.datetime) or (
            isinstance(origin, str) and not _is_number(origin)
        ):
            origin_ts = F.lit(origin).cast("timestamp")
            dist = F.abs(
                F.unix_millis(field.cast("timestamp"))
                - F.unix_millis(origin_ts)
            ).cast("double")
        else:
            dist = F.abs(field.cast("double") - F.lit(float(origin)))
        score = F.lit(pivot) / (F.lit(pivot) + dist)
        return field.isNotNull(), _search_score_option(spec, score)
    if op == "autocomplete":
        # Atlas autocomplete = edge-gram prefix matching: every query
        # term must be a PREFIX of some token in the path;
        # tokenOrder "sequential" additionally requires the prefixes to
        # hit consecutive tokens in query order. Compiled to one rlike
        # over normalized text — no edge-gram index materialization
        # needed (the scan-side equivalent; documented divergence:
        # Atlas's index also powers fuzzy, which is not supported here).
        # Constant score 1 (Atlas's edge-gram scores are index-internal).
        import re as _re

        terms = [w for w in str(spec["query"]).lower().split() if w]
        if not terms:
            raise PipelineCompileError(
                "$search autocomplete.query must contain at least one term"
            )
        order = spec.get("tokenOrder", "any")
        if order not in ("sequential", "any"):
            raise PipelineCompileError(
                f"unsupported autocomplete tokenOrder: {order!r}"
            )

        def _ac_pred(apath: str) -> Column:
            normalized = F.regexp_replace(
                F.lower(F.trim(resolve_field(apath).cast("string"))),
                r"\s+", " ",
            )
            if order == "sequential":
                pat = r"(^|\s)" + r"\S*\s".join(
                    _re.escape(t) for t in terms
                )
                return normalized.rlike(pat)
            pred = None
            for t in terms:
                one = normalized.rlike(r"(^|\s)" + _re.escape(t))
                pred = one if pred is None else pred & one
            return pred

        raw_path = spec["path"]
        if isinstance(raw_path, (list, tuple)):
            # round 13: multi-path autocomplete — every prefix must hit
            # within the SAME field (per-field AND), any field may
            # satisfy it (cross-field OR); constant score 1 as always
            fields = [str(p) for p in raw_path]
            if not fields:
                raise PipelineCompileError(
                    "$search autocomplete.path list must name at "
                    "least one field"
                )
            pred = None
            for fname in fields:
                one = F.coalesce(_ac_pred(fname), F.lit(False))
                pred = one if pred is None else pred | one
            return pred, _search_score_option(spec, F.lit(1.0))
        pred = _ac_pred(str(raw_path))
        return pred, _search_score_option(spec, F.lit(1.0))
    if op == "moreLikeThis":
        # Atlas moreLikeThis: find documents resembling the given
        # example document(s). Scan-side formulation: extract the
        # examples' representative terms (_mlt_terms — shared with the
        # round-10 postings plug so the two paths can't drift) and
        # score them like a text query.
        # Fixed-schema divergence: Atlas infers fields from the search
        # index; here ``path`` names the text column (default "text"),
        # and the example documents themselves are not excluded from
        # the result (Atlas also returns them when they match).
        terms = _mlt_terms(spec)
        path = str(spec.get("path", "text"))
        if not need_score:
            return _any_term_pred(terms, path), F.lit(1.0)
        score = _bm25(terms, path)
        return score > 0, _search_score_option(spec, score)
    if op == "compound":
        must = [_one_search_op(df, c, stats_loader, need_score) for c in spec.get("must", [])]
        filt = [_one_search_op(df, c, stats_loader, need_score) for c in spec.get("filter", [])]
        must_not = [_one_search_op(df, c, stats_loader, need_score) for c in spec.get("mustNot", [])]
        should = [_one_search_op(df, c, stats_loader, need_score) for c in spec.get("should", [])]
        if not (must or filt or must_not or should):
            raise PipelineCompileError("$search compound needs at least one clause")
        min_should = int(spec.get("minimumShouldMatch", 0))
        # Lucene semantics: should is optional when must/filter anchor
        # the match (unless minimumShouldMatch), required-as-OR otherwise
        if not (must or filt) and should and min_should == 0:
            min_should = 1
        pred = None
        for p, _s in must + filt:
            pred = p if pred is None else pred & p
        for p, _s in must_not:
            np_ = ~F.coalesce(p, F.lit(False))
            pred = np_ if pred is None else pred & np_
        if should and min_should > 0:
            n_matched = None
            for p, _s in should:
                one = F.coalesce(p, F.lit(False)).cast("int")
                n_matched = one if n_matched is None else n_matched + one
            sp = n_matched >= F.lit(min_should)
            pred = sp if pred is None else pred & sp
        score = F.lit(0.0)
        for p, s in must:
            score = score + F.when(p, s).otherwise(F.lit(0.0))
        for p, s in should:
            score = score + F.when(F.coalesce(p, F.lit(False)), s).otherwise(F.lit(0.0))
        if not (must or should):
            score = F.lit(1.0)  # pure filter/mustNot compound: constant
        return pred, _search_score_option(spec, score)
    raise PipelineCompileError(f"unsupported $search operator: {op!r}")


def _one_search_op(
    df: DataFrame,
    clause: Mapping[str, Any],
    stats_loader=None,
    need_score: bool = True,
) -> tuple[Column, Column]:
    if not isinstance(clause, Mapping) or len(clause) != 1:
        raise PipelineCompileError(
            f"$search compound clause must have exactly one operator: {clause!r}"
        )
    (op, spec), = clause.items()
    if op not in _SEARCH_OPERATORS:
        raise PipelineCompileError(f"unsupported $search operator: {op!r}")
    return _compile_search_op(df, op, spec, stats_loader, need_score)


_TEXT_SCORE_COL = "__textScore"


def _text_match_stage(
    df: DataFrame,
    spec: Mapping[str, Any],
    residual: Mapping[str, Any] | None,
) -> DataFrame:
    """Legacy ``{$text: ...}`` inside a ``$match`` stage: score with
    BM25 (operators.ranking.text_match) into the hidden
    ``__textScore`` column, keep matching rows, then apply the
    residual filter. compile_pipeline notices the hidden column and
    points the active $meta score field at it; the column is dropped
    at the end of the top-level pipeline unless a projection exposed
    it."""
    spec = dict(spec)
    index = spec.pop("$_index", None)
    stats_loader = None
    if isinstance(index, Mapping) and index.get("weights"):
        # round 11: weighted multi-field index — field-tagged postings
        # when fresh, weighted scan otherwise (same plan shapes as the
        # find() path)
        from anser_spark.operators.ranking import (
            text_match_weighted_frame,
            text_match_weighted_postings,
            weighted_stats_loader,
        )

        out = None
        if "n_docs" in index:
            out = text_match_weighted_postings(
                df, spec, index, score_col=_TEXT_SCORE_COL
            )
        if out is None:
            pred, score = text_match_weighted_frame(
                df, spec, index["weights"],
                str(index.get("default_language", "none")),
                stats_loader=(
                    weighted_stats_loader(df.sparkSession, index)
                    if "n_docs" in index else None
                ),
            )
            out = df.withColumn(
                _TEXT_SCORE_COL, score.cast("double")
            ).where(pred)
        if residual:
            out = out.where(compile_filter(residual, out.schema))
        return out
    if isinstance(index, Mapping):
        # round 9: with a fresh postings-bearing index, answer from the
        # INVERTED INDEX — a pushed-down point lookup on the postings
        # table + one bounded join back, no corpus scan and no Python
        # stemmer kernel (operators.ranking.text_match_postings; falls
        # through to the scan path when the query shape is ineligible)
        from anser_spark.operators.ranking import text_match_postings

        out = text_match_postings(df, spec, index, score_col=_TEXT_SCORE_COL)
        if out is not None:
            if residual:
                out = out.where(compile_filter(residual, out.schema))
            return out
        # fresh bm25 index resolved by Collection.pipe: idf stats come
        # from a pushed-down point lookup on the persisted term table.
        # A STALE index embed (round 9) carries only path + language —
        # the analyzer intent survives mutations; stats stay inline.
        text_col = str(index["path"])
        language = str(index.get("default_language", "none"))
        if "n_docs" in index:
            n_docs = int(index["n_docs"])
            avgdl = float(index["avgdl"])
            terms_dir = str(index["terms_dir"])
            spark = df.sparkSession

            def stats_loader(terms):  # noqa: F811
                from anser_spark.operators.ranking import terms_lookup_rows

                rows = terms_lookup_rows(
                    spark, terms_dir, [t.lower() for t in terms]
                )
                return n_docs, avgdl, {r["term"]: r["df"] for r in rows}
    else:
        text_col = _default_text_col(df)
        language = "none"
    from anser_spark.operators.ranking import _TOKS_FOLD, _TOKS_RAW, text_match_frame

    pred, score, df = text_match_frame(
        df, spec, text_col, stats_loader, default_language=language
    )
    out = (
        df.withColumn(_TEXT_SCORE_COL, score.cast("double"))
        .where(F.coalesce(pred, F.lit(False)))
        .drop(_TOKS_RAW, _TOKS_FOLD)
    )
    if residual:
        out = out.where(compile_filter(residual, out.schema))
    return out


def _default_text_col(df: DataFrame) -> str:
    """The column a legacy $text targets when no index names one: a
    string column called ``text`` (the documents-table convention)."""
    for f in df.schema.fields:
        if f.name == "text" and isinstance(f.dataType, T.StringType):
            return "text"
    raise PipelineCompileError(
        "$text needs a string column named 'text' (or run find() on a "
        "collection with a bm25 search index naming the indexed field)"
    )


def _weighted_field_view(index: Any, path: Any) -> Mapping[str, Any] | None:
    """A WEIGHTED multi-field bm25 index adapted to serve a SINGLE-path
    ``$search`` operator on ``path`` (round 12): the view carries the
    field's own avgdl and callers read every field-tagged table through
    a ``WHERE field = path`` filter (the ``field=`` option of the
    postings operators), so lookups behave exactly like a single-field
    index for that field instead of collapsing fields — previously
    these operators fell back to a full corpus scan. None when the
    index isn't weighted, lacks stats, or doesn't index ``path``."""
    if not (
        isinstance(index, Mapping)
        and index.get("kind") == "bm25"
        and index.get("weights")
        and "n_docs" in index
        and isinstance(path, str)
        and path in (index.get("weights") or {})
    ):
        return None
    fstat = (index.get("fields") or {}).get(path) or {}
    if "avgdl" not in fstat:
        return None
    view = dict(index)
    view.pop("weights", None)
    view["path"] = path
    view["avgdl"] = float(fstat["avgdl"])
    return view


def _search_stage(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """``$search`` (Atlas operator subset): text, phrase, compound
    (must/mustNot/should/filter + minimumShouldMatch), equals, range,
    exists, in, wildcard — with per-operator ``score`` boost/constant
    options. Documents come back relevance-ordered, MATCHING documents
    only (Atlas semantics; for relevance operators that also bounds the
    result to the term postings).

    Fixed-schema divergence from Atlas: the relevance lands in an
    ordinary column named by ``scoreField`` (default "score") instead
    of ``{"$meta": "searchScore"}`` metadata ($meta still resolves to
    it — the compiler threads the name). Physical shape: per relevance
    operator ONE constant-width corpus-stats aggregate at compile time
    (folded in as literals), then the whole stage is a single scoring
    scan — no joins, no shuffles (plan-asserted in tests)."""
    known_opts = {
        "scoreField", "index", "count", "highlight",
        "returnStoredSource", "sort",
    }
    ops = [(k, v) for k, v in arg.items() if k not in known_opts]
    if len(ops) != 1:
        raise PipelineCompileError(
            f"$search requires exactly one operator, got {[k for k, _v in ops]!r} "
            f"(supported: {', '.join(_SEARCH_OPERATORS)})"
        )
    op, spec = ops[0]
    if op not in _SEARCH_OPERATORS:
        raise PipelineCompileError(f"unsupported $search operator: {op!r}")
    if not isinstance(spec, Mapping):
        raise PipelineCompileError(f"$search {op} spec must be a document")
    score_field = arg.get("scoreField", "score")
    key = "_id" if "_id" in df.columns else df.columns[0]
    index = arg.get("index")
    if isinstance(index, str):
        raise PipelineCompileError(
            f"$search index {index!r} is unresolved: named indexes "
            "require the pipeline to run through Collection.pipe"
        )
    stats_loader = None
    field_stats_loader = None
    out = None
    # a WEIGHTED multi-field index can't serve single-path $search
    # operators: its term table is field-tagged (a term-keyed lookup
    # would collapse fields) and its postings would sum tf across
    # fields — compile index-less instead (inline stats, still exact)
    if (
        isinstance(index, Mapping)
        and index.get("kind") == "bm25"
        and not index.get("weights")
    ):
        if op == "text" and index.get("postings_dir") and (
            "query" in spec and "path" in spec
        ):
            # round 9: a postings-bearing index answers the text
            # operator with a pushed-down term lookup + bounded join —
            # no corpus scan (operators.ranking.search_text_postings);
            # analyzer must match the index's, and the Atlas
            # boost/constant score option applies on top of the raw
            # BM25 the postings produce
            from anser_spark.operators.ranking import search_text_postings

            if _search_analyzer(spec) == (
                index.get("default_language", "none") or "none"
            ):
                terms = _search_text_terms(spec)
                if terms:
                    out = search_text_postings(
                        df, terms, str(spec["path"]), index, score_field
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
        elif op == "phrase" and index.get("postings_positions") and (
            isinstance(spec, Mapping) and "query" in spec
            and isinstance(spec.get("path"), str)
        ):
            # round 10: positions-bearing postings answer phrase
            # (incl. slop) over the bounded candidate set — previously
            # every phrase query was an O(corpus) scan
            from anser_spark.operators.ranking import search_phrase_postings

            terms = [w for w in str(spec["query"]).lower().split() if w]
            if terms:
                out = search_phrase_postings(
                    df, terms, int(spec.get("slop", 0) or 0),
                    str(spec["path"]), index, score_field,
                    ordered=bool(spec.get("ordered")),
                )
                if out is not None:
                    out = out.withColumn(
                        score_field,
                        _search_score_option(
                            spec, F.col(score_field)
                        ).cast("double"),
                    )
        elif op == "autocomplete" and index.get("postings_dir") and (
            isinstance(spec, Mapping) and "query" in spec
            and isinstance(spec.get("path"), str)
        ):
            # round 10: prefix StartsWith filters push to the postings
            # scan; sequential order = adjacency over the union of each
            # prefix's matched-token positions
            from anser_spark.operators.ranking import (
                search_autocomplete_postings,
            )

            terms = [w for w in str(spec["query"]).lower().split() if w]
            order = spec.get("tokenOrder", "any")
            if terms and order in ("any", "sequential"):
                out = search_autocomplete_postings(
                    df, terms, order, str(spec["path"]), index, score_field
                )
                if out is not None:
                    out = out.withColumn(
                        score_field,
                        _search_score_option(
                            spec, F.col(score_field)
                        ).cast("double"),
                    )
        elif op == "moreLikeThis" and index.get("postings_dir"):
            # round 10: the extracted terms are raw lowered tokens —
            # a 'none' index serves them exactly like a text query
            # (same idf lookups, same tf source, same score sum).
            # Round 11: a stemmed index serves them through its
            # raw-token sidecar (tf/candidates from raw postings, idf
            # from the analyzed term table — the scan path's stats).
            from anser_spark.operators.ranking import search_text_postings

            out = search_text_postings(
                df, _mlt_terms(spec), str(spec.get("path", "text")),
                index, score_field,
                raw=(
                    (index.get("default_language", "none") or "none")
                    != "none"
                ),
            )
            if out is not None:
                out = out.withColumn(
                    score_field,
                    _search_score_option(
                        spec, F.col(score_field)
                    ).cast("double"),
                )
        elif op == "compound" and index.get("postings_dir") and isinstance(
            spec, Mapping
        ):
            # round 9: one text clause in must + structured rest —
            # candidates from postings, rest as Columns on the
            # bounded frame (see _search_compound_postings)
            out = _search_compound_postings(df, spec, index, score_field)
        n_docs = int(index["n_docs"])
        avgdl = float(index["avgdl"])
        terms_dir = str(index["terms_dir"])

        def stats_loader(terms: list[str]):  # noqa: F811
            # point lookup on the persisted term table: driver-local
            # pyarrow read with row-group pruning (Spark-read fallback
            # inside) — O(query terms) rows back, no per-lookup job
            from anser_spark.operators.ranking import terms_lookup_rows

            rows = terms_lookup_rows(
                df.sparkSession, terms_dir, [t.lower() for t in terms]
            )
            return n_docs, avgdl, {r["term"]: r["df"] for r in rows}

    elif (
        isinstance(index, Mapping)
        and index.get("kind") == "bm25"
        and index.get("weights")
    ):
        # round 12: a WEIGHTED index serves SINGLE-path operators via
        # field-filtered lookups (WHERE field = path) — the field view
        # behaves exactly like a single-field index for that field:
        # text from the field-filtered postings, phrase from the
        # stored positions (stemmed indexes through the field-tagged
        # raw-token sidecar), autocomplete from prefix pushdown, and
        # the scan fallbacks score from the field-filtered stats.
        spath = spec.get("path") if isinstance(spec, Mapping) else None
        view = _weighted_field_view(index, spath)
        if op == "compound" and index.get("postings_dir") and isinstance(
            spec, Mapping
        ):
            # the anchor clause's own path resolves its field view
            # inside _search_compound_postings (round 12)
            out = _search_compound_postings(df, spec, index, score_field)
        elif (
            op == "text"
            and isinstance(spec, Mapping)
            and "query" in spec
            and isinstance(spec.get("path"), (list, tuple))
            and index.get("postings_dir")
            and _search_analyzer(spec) == (
                index.get("default_language", "none") or "none"
            )
        ):
            # round 12: MULTI-path text over a weighted index — every
            # requested field must be indexed; score = unweighted Σ of
            # per-field BM25 from the field-tagged postings
            fields_req = [str(p) for p in spec["path"]]
            if fields_req and all(
                f in (index.get("weights") or {}) for f in fields_req
            ):
                from anser_spark.operators.ranking import (
                    search_text_postings_multi,
                )

                terms = _search_text_terms(spec)
                if terms:
                    out = search_text_postings_multi(
                        df, terms, fields_req, index, score_field
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
        elif (
            op == "phrase"
            and isinstance(spec, Mapping)
            and "query" in spec
            and isinstance(spec.get("path"), (list, tuple))
            and index.get("postings_positions")
        ):
            # round 13: MULTI-path phrase over a weighted index — the
            # per-field position predicate runs over the field-tagged
            # postings, score = Σ per-field constituent-term BM25 over
            # matched fields (see search_phrase_postings_multi)
            fields_req = [str(p) for p in spec["path"]]
            if fields_req and all(
                f in (index.get("weights") or {}) for f in fields_req
            ):
                from anser_spark.operators.ranking import (
                    search_phrase_postings_multi,
                )

                terms = [
                    w for w in str(spec["query"]).lower().split() if w
                ]
                if terms:
                    out = search_phrase_postings_multi(
                        df, terms, int(spec.get("slop", 0) or 0),
                        fields_req, index, score_field,
                        ordered=bool(spec.get("ordered")),
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
        elif (
            op == "autocomplete"
            and isinstance(spec, Mapping)
            and "query" in spec
            and isinstance(spec.get("path"), (list, tuple))
            and index.get("postings_dir")
        ):
            # round 13: MULTI-path autocomplete — per-field prefix AND,
            # cross-field OR, served from the field-tagged postings
            fields_req = [str(p) for p in spec["path"]]
            if fields_req and all(
                f in (index.get("weights") or {}) for f in fields_req
            ):
                from anser_spark.operators.ranking import (
                    search_autocomplete_postings_multi,
                )

                terms = [
                    w for w in str(spec["query"]).lower().split() if w
                ]
                order = spec.get("tokenOrder", "any")
                if terms and order in ("any", "sequential"):
                    out = search_autocomplete_postings_multi(
                        df, terms, order, fields_req, index, score_field
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
        elif view is not None:
            if op == "text" and index.get("postings_dir") and (
                "query" in spec
            ) and _search_analyzer(spec) == (
                index.get("default_language", "none") or "none"
            ):
                from anser_spark.operators.ranking import (
                    search_text_postings,
                )

                terms = _search_text_terms(spec)
                if terms:
                    out = search_text_postings(
                        df, terms, str(spath), view, score_field,
                        field=str(spath),
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
            elif op == "phrase" and view.get("postings_positions") and (
                "query" in spec
            ):
                from anser_spark.operators.ranking import (
                    search_phrase_postings,
                )

                terms = [
                    w for w in str(spec["query"]).lower().split() if w
                ]
                if terms:
                    out = search_phrase_postings(
                        df, terms, int(spec.get("slop", 0) or 0),
                        str(spath), view, score_field,
                        ordered=bool(spec.get("ordered")),
                        field=str(spath),
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
            elif op == "autocomplete" and index.get("postings_dir") and (
                "query" in spec
            ):
                from anser_spark.operators.ranking import (
                    search_autocomplete_postings,
                )

                terms = [
                    w for w in str(spec["query"]).lower().split() if w
                ]
                order = spec.get("tokenOrder", "any")
                if terms and order in ("any", "sequential"):
                    out = search_autocomplete_postings(
                        df, terms, order, str(spath), view, score_field,
                        field=str(spath),
                    )
                    if out is not None:
                        out = out.withColumn(
                            score_field,
                            _search_score_option(
                                spec, F.col(score_field)
                            ).cast("double"),
                        )
            w_n_docs = int(view["n_docs"])
            w_avgdl = float(view["avgdl"])
            w_terms_dir = str(view["terms_dir"])
            w_field = str(spath)

            def stats_loader(terms: list[str]):  # noqa: F811
                from anser_spark.operators.ranking import terms_lookup_rows

                rows = terms_lookup_rows(
                    df.sparkSession, w_terms_dir,
                    [t.lower() for t in terms], field=w_field,
                )
                return w_n_docs, w_avgdl, {r["term"]: r["df"] for r in rows}

    if (
        out is None
        and isinstance(index, Mapping)
        and index.get("kind") == "bm25"
        and index.get("weights")
        and "n_docs" in index
        and isinstance(spec, Mapping)
        and isinstance(spec.get("path"), (list, tuple))
    ):
        # round 13: the multi-path SCAN fallback under a weighted index
        # scores each field with the index's field-tagged stats — the
        # same idf/avgdl numbers the postings plan reads, keeping the
        # two plans bit-exact (under a stemmed index a raw phrase token
        # reads its df from the ANALYZED table on both plans)
        fmeta_all = index.get("fields") or {}
        flds = [str(p) for p in spec["path"]]
        if flds and all(
            "avgdl" in (fmeta_all.get(f) or {}) for f in flds
        ):
            fsl_terms_dir = str(index["terms_dir"])
            fsl_n = int(index["n_docs"])
            fsl_avg = {f: float(fmeta_all[f]["avgdl"]) for f in flds}

            def field_stats_loader(  # noqa: F811
                fname: str, terms: list[str],
                _td=fsl_terms_dir, _n=fsl_n, _avg=fsl_avg,
            ):
                from anser_spark.operators.ranking import terms_lookup_rows

                rows = terms_lookup_rows(
                    df.sparkSession, _td,
                    [t.lower() for t in terms], field=fname,
                )
                return _n, _avg[fname], {r["term"]: r["df"] for r in rows}

    if (
        out is None
        and op == "text"
        and isinstance(spec, Mapping)
        and isinstance(spec.get("path"), str)
        and "query" in spec
        and _search_text_terms(spec)
    ):
        # round 14: single-path text SCAN fallback materializes the
        # analyzed token stream ONCE per row — the score projection
        # references the array column (CollapseProject keeps a
        # non-cheap multi-referenced alias in its own projection)
        # instead of re-tokenizing per term, and the pushed-down match
        # filter is the cheap one-tokenize exists pred. Measured on the
        # hybrid gate's 3-term leg: 13 → 2 tokenizations per row.
        from anser_spark.operators.ranking import _tokens, bm25_score_expr

        language = _search_analyzer(spec)
        terms = _search_text_terms(spec)
        stats = stats_loader(terms) if stats_loader is not None else None
        tcol = "__searchToks"
        prepared = df.withColumn(
            tcol, _tokens(str(spec["path"]), language)
        )
        score, pred = bm25_score_expr(
            prepared, terms, text_col=str(spec["path"]), stats=stats,
            language=language, analyzed=True, toks_col=tcol,
            with_pred=True,
        )
        out = (
            prepared.where(F.coalesce(pred, F.lit(False)))
            .withColumn(
                score_field,
                _search_score_option(spec, score).cast("double"),
            )
            .drop(tcol)
        )
    if out is None:
        pred, score = _compile_search_op(
            df, op, spec, stats_loader,
            field_stats_loader=field_stats_loader,
        )
        out = df.where(F.coalesce(pred, F.lit(False))).withColumn(
            score_field, score.cast("double")
        )
    sort_opt = arg.get("sort")
    if sort_opt:
        # Atlas stage-level sort: field order replaces relevance order
        # ({"$meta": "searchScore"} values still sort by the score).
        # The active $meta score field is set to THIS stage's
        # scoreField while parsing — compile_pipeline only registers it
        # after the stage returns, so without this a custom scoreField
        # would leave the sort reading the stale default "score".
        from anser_spark.functions import expressions as _exprs

        prev = _exprs.set_active_score_field(score_field)
        try:
            sort_keys = parse_sort_keys(sort_opt)
        finally:
            _exprs.set_active_score_field(prev)
        return out.orderBy(*sort_keys, F.col(key))
    return out.orderBy(F.desc(score_field), F.col(key))


def _mlt_terms(spec: Mapping[str, Any]) -> list[str]:
    """``moreLikeThis`` representative-term extraction: the example
    documents' top-12 terms by frequency (length ≥ 3, English stopwords
    dropped, deterministic tie-break by term). Shared by the scan
    compile and the postings plug — one extraction, two plans."""
    from collections import Counter

    from anser_spark.operators.text import LANG_STOPWORDS

    like = spec.get("like")
    if like is None:
        raise PipelineCompileError("$search moreLikeThis requires 'like'")
    docs = like if isinstance(like, (list, tuple)) else [like]
    words: list[str] = []
    for d in docs:
        if not isinstance(d, Mapping):
            raise PipelineCompileError(
                "moreLikeThis 'like' entries must be documents"
            )
        for v in d.values():
            if isinstance(v, str):
                words.extend(v.lower().split())
    stop = set(LANG_STOPWORDS["en"])
    counts = Counter(w for w in words if len(w) >= 3 and w not in stop)
    terms = [
        t for t, _n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    ]
    if not terms:
        raise PipelineCompileError(
            "moreLikeThis 'like' documents contain no usable terms"
        )
    return terms


def _facet_date(b: Any):
    """A ``$searchMeta`` date-facet boundary as a ``datetime`` —
    accepts datetime/date objects and ISO-8601 strings (the Atlas JSON
    form, ``Z`` suffix included)."""
    import datetime as _dt

    if isinstance(b, _dt.datetime):
        return b
    if isinstance(b, _dt.date):
        return _dt.datetime(b.year, b.month, b.day)
    s = str(b)
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError as exc:
        raise PipelineCompileError(
            f"$searchMeta date facet boundary {b!r} is not ISO-8601"
        ) from exc


def _search_meta_stage(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """``$searchMeta`` (Atlas): metadata about a search — the match
    count, or facet buckets — WITHOUT returning the documents.

    Forms:
      - ``{"<operator>": {...}}`` → one row ``{count: {total: n}}``
      - ``{"facet": {"operator": {...}, "facets": {name: spec, ...}}}``
        where spec is ``{"type": "string", "path": p, "numBuckets": k}``
        (top-k values by frequency), ``{"type": "number", "path": p,
        "boundaries": [b0, b1, ...]}`` ($bucket-style half-open ranges),
        or ``{"type": "date", ...}`` with ISO-8601/datetime boundaries
        (round 10 — Atlas date facets)
        → one row ``{count: {total}, facet_<name>: [{_id, count}, ...]}``.

    Fixed-schema divergences (documented): the exact ``total`` is
    reported (Atlas may return a lowerBound), and facet buckets land in
    ``facet_<name>`` array columns instead of nested metadata.

    Physical shape (round 10): the candidate frame materializes ONCE —
    persisted for the stage; the count() fills the cache — and all k
    facets compile into a single melted (facet, bucket-key) union
    aggregated + windowed-top-k'd in ONE job, so the job count is
    constant in the facet count. Every collect is BOUNDED (numBuckets /
    len(boundaries) rows per facet) — the same constant-size-collect
    reasoning as the BM25 stats aggregate.
    """
    from pyspark.sql import types as _T

    def _text_postings_matched(mop, mspec):
        # round 9: with a fresh postings index, a text operator's
        # matched set comes from the bounded postings join — no corpus
        # scan, no analyzer kernel (facet groupBys then run over the
        # candidates only); round 10 extends the same route to phrase
        # and autocomplete operators (positions / prefix pushdown).
        # None → caller uses the scan predicate
        index = arg.get("index")
        w_field = None
        if (
            mop in ("text", "phrase", "autocomplete")
            and isinstance(mspec, Mapping)
            and "query" in mspec and "path" in mspec
            and isinstance(index, Mapping)
            and index.get("weights")
            and index.get("postings_dir")
        ):
            # round 12: a weighted index's field view serves single-path
            # operators (field-filtered postings; _weighted_field_view)
            view = _weighted_field_view(index, str(mspec["path"]))
            if view is not None:
                index = view
                w_field = str(mspec["path"])
        if not (
            mop in ("text", "phrase", "autocomplete")
            and isinstance(mspec, Mapping)
            and "query" in mspec and "path" in mspec
            and isinstance(index, Mapping)
            and index.get("kind") == "bm25"
            and not index.get("weights")  # field-tagged postings differ
            and index.get("postings_dir")
            and str(index.get("path", "text")) == str(mspec["path"])
        ):
            return None
        path = str(mspec["path"])
        if mop == "phrase":
            from anser_spark.operators.ranking import search_phrase_postings

            terms = [w for w in str(mspec["query"]).lower().split() if w]
            out = search_phrase_postings(
                df, terms, int(mspec.get("slop", 0) or 0), path, index,
                "__smScore", ordered=bool(mspec.get("ordered")),
                field=w_field,
            )
            return out.drop("__smScore") if out is not None else None
        if mop == "autocomplete":
            from anser_spark.operators.ranking import (
                search_autocomplete_postings,
            )

            terms = [w for w in str(mspec["query"]).lower().split() if w]
            order = mspec.get("tokenOrder", "any")
            if not terms or order not in ("any", "sequential"):
                return None
            out = search_autocomplete_postings(
                df, terms, order, path, index, "__smScore", field=w_field
            )
            return out.drop("__smScore") if out is not None else None
        if _search_analyzer(mspec) != (
            index.get("default_language", "none") or "none"
        ):
            return None
        from anser_spark.operators.ranking import search_text_postings

        terms = _search_text_terms(mspec)
        if not terms:
            return df.where(F.lit(False))  # all stopwords: no match
        out = search_text_postings(
            df, terms, path, index, "__smScore", field=w_field
        )
        return out.drop("__smScore") if out is not None else None

    facets: Mapping[str, Any] = {}
    matched = None
    if "facet" in arg:
        fspec = arg["facet"]
        if "operator" not in fspec or "facets" not in fspec:
            raise PipelineCompileError(
                "$searchMeta facet needs {'operator': …, 'facets': …}"
            )
        (fop, fsp), = fspec["operator"].items() if len(fspec["operator"]) == 1 else (
            (None, None),
        )
        if fop is None:
            raise PipelineCompileError(
                "$searchMeta facet.operator must have exactly one operator"
            )
        matched = _text_postings_matched(fop, fsp)
        if matched is None:
            pred, _score = _one_search_op(df, {fop: fsp}, need_score=False)
        facets = fspec["facets"]
    else:
        ops = [(k, v) for k, v in arg.items() if k not in ("count", "scoreField", "index")]
        if len(ops) != 1:
            raise PipelineCompileError(
                "$searchMeta requires exactly one operator (or facet)"
            )
        mop, mspec = ops[0]
        index = arg.get("index")
        w_count_field = None
        if (
            mop == "text"
            and isinstance(mspec, Mapping)
            and "query" in mspec and "path" in mspec
            and isinstance(index, Mapping)
            and index.get("weights")
            and index.get("postings_dir")
        ):
            # round 12: a weighted index's field view counts the text
            # operator from its field-filtered postings
            view = _weighted_field_view(index, str(mspec["path"]))
            if view is not None:
                index = view
                w_count_field = str(mspec["path"])
        if (
            mop == "text"
            and isinstance(mspec, Mapping)
            and "query" in mspec and "path" in mspec
            and isinstance(index, Mapping)
            and index.get("kind") == "bm25"
            and not index.get("weights")  # field-tagged postings differ
            and index.get("postings_dir")
            and str(index.get("path", "text")) == str(mspec["path"])
            and _search_analyzer(mspec)
            == (index.get("default_language", "none") or "none")
        ):
            # round 9: a count-only text $searchMeta never touches the
            # corpus — distinct ids among the query terms' postings.
            # Round 10: "no analyzed terms" (all stopwords → 0 matches)
            # and "count_text_postings returned None" are DIFFERENT
            # facts — the latter also happens when the
            # spark.anser.text.usePostings escape hatch disables the
            # postings table, and the hatch exists precisely to rule
            # the index OUT; trusting it for a 0 here was a confirmed
            # wrong answer (round-9 VERDICT). Only the stopword case
            # short-circuits; a None falls through to the scan path.
            from anser_spark.operators.ranking import count_text_postings

            terms = _search_text_terms(mspec)
            total = 0 if not terms else count_text_postings(
                df.sparkSession, terms, index, field=w_count_field
            )
            if total is not None:
                return df.sparkSession.createDataFrame(
                    [{"count": {"total": int(total)}}],
                    _T.StructType([
                        _T.StructField(
                            "count",
                            _T.StructType(
                                [_T.StructField("total", _T.LongType())]
                            ),
                        )
                    ]),
                )
        # round 10: phrase/autocomplete count-only forms take the same
        # bounded postings-candidate route the facet branch uses
        matched = _text_postings_matched(mop, mspec)
        if matched is None:
            pred, _score = _one_search_op(
                df, dict([ops[0]]), need_score=False
            )
    if matched is None:
        matched = df.where(F.coalesce(pred, F.lit(False)))

    from pyspark.storagelevel import StorageLevel

    from anser_spark.functions.filters import resolve_field

    # Round 10: ONE candidate materialization and ONE facet job,
    # regardless of facet count. The count() materializes the persisted
    # candidate frame, then every facet compiles into a single melted
    # (facet, bucket-key) union aggregated and top-k'd in one job —
    # previously the count plus EACH facet re-executed the candidate
    # plan (the postings join, or the corpus scan predicate) from
    # scratch: k+1 executions for k facets.
    matched = matched.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        total = matched.count()
        row: dict[str, Any] = {"count": {"total": total}}
        fields: list[_T.StructField] = [
            _T.StructField(
                "count",
                _T.StructType([_T.StructField("total", _T.LongType())]),
            )
        ]
        pairs: list[Any] = []
        metas: list[tuple[str, str, int, list | None, _T.DataType]] = []
        for name, spec in facets.items():
            ftype = spec.get("type")
            path = str(spec["path"])
            col = resolve_field(path)
            if ftype == "string":
                k = int(spec.get("numBuckets", 10))
                key = col.cast("string")
                pairs.append(F.struct(
                    F.lit(name).alias("__facet"),
                    key.alias("__key"),
                    # round 11 (Atlas parity): a document missing the
                    # facet field is in NO bucket — Atlas string facets
                    # don't emit a null bucket (matches the number/date
                    # branches' out-of-range behavior)
                    key.isNull().alias("__drop"),
                ))
                metas.append((name, "string", k, None, _T.StringType()))
            elif ftype in ("number", "date"):
                # both bucket by ascending half-open boundaries; the
                # melted key is the BUCKET INDEX (exact round-trip —
                # float/timestamp labels re-attach driver-side)
                if ftype == "number":
                    bounds: list[Any] = [float(b) for b in spec["boundaries"]]
                    v = col.cast("double")
                    idt: _T.DataType = _T.DoubleType()
                else:
                    bounds = [_facet_date(b) for b in spec["boundaries"]]
                    v = col.cast("timestamp")
                    idt = _T.TimestampType()
                try:
                    ascending = sorted(bounds) == bounds
                except TypeError as exc:  # naive/aware datetimes mixed
                    raise PipelineCompileError(
                        f"$searchMeta {ftype} facet boundaries are not "
                        "mutually comparable (mixed naive/aware datetimes?)"
                    ) from exc
                if not ascending or len(bounds) < 2:
                    raise PipelineCompileError(
                        f"$searchMeta {ftype} facet boundaries must be "
                        "ascending, ≥2"
                    )
                expr = None
                for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
                    cond = (v >= F.lit(lo)) & (v < F.lit(hi))
                    expr = (
                        F.when(cond, F.lit(i)) if expr is None
                        else expr.when(cond, F.lit(i))
                    )
                key = expr.cast("string")
                pairs.append(F.struct(
                    F.lit(name).alias("__facet"),
                    key.alias("__key"),
                    key.isNull().alias("__drop"),  # out-of-range: no bucket
                ))
                metas.append((name, ftype, len(bounds), bounds, idt))
            else:
                raise PipelineCompileError(
                    f"unsupported $searchMeta facet type: {ftype!r} "
                    "(string/number/date)"
                )
        by_facet: dict[str, list] = {}
        if pairs:
            from pyspark.sql.window import Window

            # one pass over the cached candidates: every row emits its
            # (facet, bucket-key) pairs via a single explode — the plan
            # (and job count) is independent of the facet count
            melted = (
                matched.select(F.explode(F.array(*pairs)).alias("__p"))
                .where(~F.col("__p.__drop"))
                .select(F.col("__p.__facet").alias("__facet"),
                        F.col("__p.__key").alias("__key"))
            )
            kmap = None
            for nm, _ft, k, _b, _t in metas:
                kmap = (
                    F.when(F.col("__facet") == nm, F.lit(k)) if kmap is None
                    else kmap.when(F.col("__facet") == nm, F.lit(k))
                )
            w = Window.partitionBy("__facet").orderBy(
                F.desc("count"), F.asc("__key")
            )
            per = (
                melted.groupBy("__facet", "__key")
                .agg(F.count(F.lit(1)).alias("count"))
                .withColumn("__rank", F.row_number().over(w))
                .where(F.col("__rank") <= kmap)
                .collect()
            )
            for r in per:
                by_facet.setdefault(r["__facet"], []).append(r)
        for nm, ft, _k, bounds, idt in metas:
            got = sorted(by_facet.get(nm, []), key=lambda r: r["__rank"])
            if ft == "string":
                row[f"facet_{nm}"] = [
                    {"_id": r["__key"], "count": r["count"]} for r in got
                ]
            else:
                counts = {int(r["__key"]): r["count"] for r in got}
                row[f"facet_{nm}"] = [
                    {"_id": bounds[i], "count": counts.get(i, 0)}
                    for i in range(len(bounds) - 1)
                ]
            fields.append(
                _T.StructField(
                    f"facet_{nm}",
                    _T.ArrayType(
                        _T.StructType(
                            [
                                _T.StructField("_id", idt),
                                _T.StructField("count", _T.LongType()),
                            ]
                        )
                    ),
                )
            )
        return df.sparkSession.createDataFrame([row], _T.StructType(fields))
    finally:
        matched.unpersist()


def _vector_search(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """``$vectorSearch`` (Atlas 7.0 surface) over an embedding column.

    Spec: ``path`` (array<numeric> column, dotted paths resolve into
    structs), ``queryVector``, ``limit``, optional ``filter`` (query
    document, applied as a pre-filter — pushed to the scan),
    ``numCandidates`` (ANN beam), ``exact`` (ENN), and — fixed-schema
    divergence from Mongo's ``{"$meta": "vectorSearchScore"}`` — the
    similarity lands in an ordinary column named by ``scoreField``
    (default "score"). ``similarity`` selects the Atlas similarity
    function with its documented score normalization:
    "cosine" (default) → (1 + cos)/2 ∈ [0, 1];
    "euclidean" → 1/(1 + L2 distance) ∈ (0, 1];
    "dotProduct" → (1 + a·q)/2 (callers normalize vectors, per Atlas).

    Physical strategy: score is a pure-Column dot/norm over the vector
    column; ``exact`` (or no index option) compiles to
    TakeOrderedAndProject — one scan, no shuffle. ``index: {"kind":
    "ivf", "nlist": …, "nprobe": …}`` (a top-level ``nprobe`` in the
    spec overrides the index default per query) routes through the IVF operators
    (sample-trained centroids, probe-pruned candidate lists) — at
    scale the index is trained once and amortized; here it trains
    inline, documented as the gate-scale form.
    """
    from anser_spark.functions.filters import resolve_field
    from anser_spark.operators.similarity import dot_col, norm_col

    path = arg["path"]
    qv = [float(x) for x in arg["queryVector"]]
    limit = int(arg["limit"])
    score_field = arg.get("scoreField", "score")
    if arg.get("filter"):
        df = df.where(compile_filter(arg["filter"], df.schema))
    similarity = arg.get("similarity", "cosine")
    if similarity not in ("cosine", "euclidean", "dotProduct"):
        raise PipelineCompileError(
            f"unsupported $vectorSearch similarity: {similarity!r}"
        )
    # epsilon clamp: an all-zero queryVector would otherwise divide by 0
    # and score every row NaN (same guard as quantized_cosine_top_k)
    qnorm = max(float(sum(x * x for x in qv) ** 0.5), 1e-30)
    from anser_spark.operators.similarity import (
        float_array_lit,
        float_array_sql,
        sql_ident,
    )

    # one-round-trip literal + SQL-snippet operands: constructing the
    # lambda-form dot/norm per leg cost ~40ms each in py4j round trips
    # (round 14, guide §1); a str vec operand keeps the whole score
    # expression a single F.expr with an identical tree
    qsql = float_array_sql(qv)
    qcol = F.expr(qsql) if qsql is not None else float_array_lit(qv)

    def _score_col(vec: Column | str) -> Column:
        if isinstance(vec, str) and qsql is None:
            vec = F.expr(vec)
        dot = dot_col(vec, qsql if isinstance(vec, str) else qcol)
        nrm = lambda: norm_col(vec)  # noqa: E731
        if similarity == "cosine":
            cos = dot / (nrm() * F.lit(qnorm))
            return (F.lit(1.0) + cos) / F.lit(2.0)
        if similarity == "dotProduct":
            return (F.lit(1.0) + dot) / F.lit(2.0)
        # euclidean: ‖a−q‖² = ‖a‖² − 2a·q + ‖q‖², clamped ≥ 0 against
        # float cancellation before the sqrt
        d2 = F.greatest(
            nrm() * nrm() - F.lit(2.0) * dot + F.lit(qnorm * qnorm),
            F.lit(0.0),
        )
        return F.lit(1.0) / (F.lit(1.0) + F.sqrt(d2))

    vec = sql_ident(path) if path in df.columns else resolve_field(path)
    index = arg.get("index")
    if isinstance(index, str):
        # named indexes resolve to centroid mappings in Collection.pipe
        # (which knows the collection's stored search indexes); a string
        # surviving to this point means the pipeline was compiled
        # without that context — failing loudly beats silently running
        # the exact scan the index was meant to avoid
        raise PipelineCompileError(
            f"$vectorSearch index {index!r} is unresolved: named indexes "
            "require the pipeline to run through Collection.pipe"
        )
    # Atlas ENN: ``exact: true`` searches exactly even when an index is
    # named — the probe pruning below is the ANN path only (round 12)
    if (
        isinstance(index, Mapping)
        and index.get("kind") in ("ivf", "ivfpq")
        and not arg.get("exact")
    ):
        if "." in path:
            raise PipelineCompileError(
                "$vectorSearch index over a dotted path is not supported"
            )
        from anser_spark.operators.ivf import IVFIndex, ivf_assign, ivf_train_sample

        nlist = int(index.get("nlist", 16))
        # per-query recall knob (round 13, FAISS-style): a query may
        # widen/narrow the probe without touching the stored index —
        # ``{"$vectorSearch": {..., "nprobe": 32}}``
        nprobe = int(arg.get(
            "nprobe", index.get("nprobe", max(1, nlist // 4))
        ))
        if index.get("centroids"):
            # prebuilt index (Collection.create_search_index): no
            # training on the query path — the Atlas model
            ivf = IVFIndex(
                centroids=[list(map(float, c)) for c in index["centroids"]],
                vec_col=path,
                id_col=df.columns[0],
            )
        else:
            # inline train (gate-scale form; amortized in a deployment)
            ivf = ivf_train_sample(df, k=nlist, vec_col=path)
        import numpy as np

        c = np.array(ivf.centroids)
        q = np.array(qv)
        if similarity == "euclidean":
            # probe the nearest centroids by the query's metric
            order = np.argsort(np.linalg.norm(c - q, axis=1))
        else:
            sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-30)
            order = np.argsort(-sims)
        probe = [int(i) for i in order[:nprobe]]
        use_cells = (
            str(
                df.sparkSession.conf.get("spark.anser.vector.useCells", "true")
            ).lower() != "false"
        )
        if index.get("cells_dir") and use_cells and not index.get("__stale"):
            # prebuilt CELL-ASSIGNMENT table (round 12): candidates come
            # from the probed cells of the layered index table — a
            # pushed-down ``__cell IN (...)`` over a cell-range-sorted
            # parquet layout reads O(nprobe/nlist) of the index, no
            # corpus-wide nearest-centroid evaluation per query. Scores
            # compute on the STORED vectors (bit-identical corpus
            # values), then the bounded candidate set joins back to the
            # (pre-filtered) frame by id for the full documents — rows
            # deleted since the snapshot fall out of the inner join, and
            # the filter applies to final rows exactly as the inline
            # path's filter-then-assign does. Freshness contract
            # (round 13, ADVICE): a snapshot behind the collection
            # pointer (``__stale`` stamped at resolve time) skips this
            # path entirely — candidates then assign inline over the
            # LIVE corpus with the stored centroids, so un-refreshed
            # mutations stay visible between refreshes at inline cost.
            from anser_spark.operators.ranking import read_layered_table

            idc = str(index.get("id_col", "_id"))
            dirs = [str(index["cells_dir"])] + [
                str(p) for p in index.get("cells_deltas") or []
            ]
            cells = read_layered_table(
                df.sparkSession, dirs, list(index.get("tombs") or []), "id"
            )
            probed = cells.where(F.col("__cell").isin(probe))
            use_pq = (
                str(
                    df.sparkSession.conf.get(
                        "spark.anser.vector.usePQ", "true"
                    )
                ).lower() != "false"
            )
            if (
                index.get("kind") == "ivfpq"
                and index.get("codebooks")
                and use_pq
            ):
                # kind="ivfpq" (round 13): the candidate pass reads
                # ONLY (id, __codes[, __norm]) from the probed cells —
                # ADC in the query's similarity space shortlists
                # ``numCandidates`` ids (default 10× limit), then the
                # exact rerank reads the stored __vec for just that
                # bounded shortlist (broadcast semi-join back into the
                # probed cells). At 768-dim the codes pass moves
                # ~10-30× fewer bytes than scoring vectors directly;
                # the rerank preserves the exactness contract — with
                # full probe and numCandidates ≥ candidate count the
                # result is provably the exact top-k (the rerank scores
                # every candidate on its true vector). Hatch:
                # spark.anser.vector.usePQ=false serves the same index
                # like a plain ivf cells table (differential twin).
                # Like Atlas, a selective ``filter`` composes with a
                # BOUNDED beam lossily: the ADC shortlist draws from
                # the unfiltered candidates, so filtered-out docs can
                # consume beam slots (Atlas docs give the same advice:
                # raise numCandidates under selective filters). Full
                # beam — or usePQ=false — restores filter-exactness.
                from anser_spark.operators.pq import pq_adc_scores

                # Atlas requires limit ≤ numCandidates; clamp rather
                # than silently returning fewer than limit rows
                ncand = max(
                    int(arg.get("numCandidates", max(limit * 10, 100))),
                    limit,
                )
                # FULL-BEAM fallthrough (round 14, r13 ADVICE): when
                # numCandidates covers every row the index can hold
                # (n_vectors is an upper bound maintained by build and
                # refresh), the ADC shortlist would be the whole
                # candidate set — the ADC pass, its top-ncand sort and
                # the shortlist join are provably identity, so skip
                # straight to the exact rerank over the probed cells.
                n_vec_bound = int(index.get("n_vectors") or 0)
                if not (n_vec_bound and ncand >= n_vec_bound):
                    shortlist = (
                        pq_adc_scores(
                            probed,
                            index["codebooks"],
                            qv,
                            similarity=similarity,
                            id_col="id",
                            codes_col="__codes",
                            norm_col="__norm",
                        )
                        .orderBy(F.desc("__adc"), F.col("id"))
                        .limit(ncand)
                        .select("id")
                    )
                    # an explicit broadcast of a user-sized shortlist is
                    # only safe while it stays driver-friendly; above
                    # the cap let the planner pick the join (AQE sees
                    # the real size) instead of forcing an unbounded
                    # driver build (r13 ADVICE; Atlas caps at 10k)
                    try:
                        bcast_max = int(df.sparkSession.conf.get(
                            "spark.anser.vector.adcBroadcastMax",
                            "4000000",
                        ))
                    except Exception:
                        bcast_max = 4_000_000
                    if ncand <= bcast_max:
                        shortlist = F.broadcast(shortlist)
                    probed = probed.join(shortlist, "id")
            cand = (
                probed
                .select(
                    F.col("id").alias("__cand_id"),
                    _score_col("__vec").alias(score_field),
                )
            )
            order_key = df.columns[0]
            out = df.join(
                cand, df[idc] == cand["__cand_id"], "inner"
            ).drop("__cand_id")
            return out.orderBy(
                F.desc(score_field), F.col(order_key)
            ).limit(limit)
        assigned = ivf_assign(df, ivf, out="__ivf_list")
        df = assigned.where(F.col("__ivf_list").isin(probe)).drop("__ivf_list")
        vec = sql_ident(path) if path in df.columns else resolve_field(path)
    out = df.withColumn(score_field, _score_col(vec))
    order_key = df.columns[0]
    return out.orderBy(F.desc(score_field), F.col(order_key)).limit(limit)


def _rank_fusion_stage(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame] | None,
    sink: Callable[[str, DataFrame, Mapping[str, Any] | None], None] | None,
) -> DataFrame:
    """``$rankFusion`` (Mongo 8.1): run named sub-pipelines over the
    current frame, rank each result, fuse by weighted reciprocal-rank
    (1/(60 + rank)), return docs ordered by the fused score.

    Each input pipeline must be RANKED — its ordering is reconstructed
    from the last order-defining stage ($sort keys, or $vectorSearch's
    score field descending); $limit/$skip/$match after it are fine,
    stages that drop the ordering columns are not. Ranks are assigned
    with a row_number over that ordering: a single-partition window,
    which is exactly right because ranked inputs are top-k-bounded by
    construction (Mongo likewise requires $vectorSearch.limit /
    $sort+$limit shapes here).

    Output schema (fixed-schema divergence from Mongo's scoreDetails
    metadata): the identity column, one ``<name>_rank`` per pipeline,
    and ``score`` = the fused RRF value.
    """
    from pyspark.sql import Window

    from anser_spark.operators.ranking import rank_fusion

    pipelines = arg["input"]["pipelines"]
    if not pipelines:
        raise PipelineCompileError("$rankFusion requires at least one input pipeline")
    weights = (arg.get("combination") or {}).get("weights") or {}
    key = arg.get("key") or ("_id" if "_id" in df.columns else df.columns[0])
    ranked: dict[str, DataFrame] = {}
    for name, stages in pipelines.items():
        sub = compile_pipeline(df, stages, resolve, sink)
        order = None
        order_op = None
        for stage in reversed(list(stages)):
            op, sarg = next(iter(stage.items()))
            if op == "$sort":
                order = parse_sort_keys(sarg)
                order_op = op
                break
            if op in ("$vectorSearch", "$search"):
                sf = sarg.get("scoreField", "score") if isinstance(sarg, Mapping) else "score"
                order = [F.desc(sf), F.col(key).asc()]
                order_op = op
                break
            if op in ("$limit", "$skip", "$match", "$project", "$addFields", "$set"):
                continue
            break
        if order is None:
            raise PipelineCompileError(
                f"$rankFusion input {name!r} is not ranked: it needs a "
                "$sort or $vectorSearch stage"
            )
        # $vectorSearch carries a mandatory limit; a $search-ranked leg
        # is only bounded by its term postings, and the rank assignment
        # below is a single-partition row_number — require an explicit
        # top-k bound so a fusion leg can never window the whole corpus
        if order_op == "$search" and not any(
            isinstance(s, Mapping) and "$limit" in s for s in stages
        ):
            raise PipelineCompileError(
                f"$rankFusion input {name!r} is ranked by $search but has "
                "no $limit: ranked fusion inputs must be top-k bounded"
            )
        ranked[name] = sub.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        )
    fused = rank_fusion(ranked, key=key, weights=weights, out="score")
    return fused.orderBy(F.desc("score"), F.col(key))


def _score_fusion_stage(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame] | None,
    sink: Callable[[str, DataFrame, Mapping[str, Any] | None], None] | None,
) -> DataFrame:
    """``$scoreFusion`` (Mongo 8.2): fuse named SCORED sub-pipelines by
    a weighted combination of their (optionally normalized) scores —
    the score-aware sibling of ``$rankFusion``.

    Each input pipeline must leave a score column (the ``scoreField``
    of $search/$vectorSearch, default "score"). ``input.normalization``:
    ``none``, ``sigmoid`` (1/(1+e^-s)), or ``minMaxScaler`` (per-leg
    min-max to [0,1] — one constant-size aggregate per bounded leg).
    ``combination.weights`` as in $rankFusion; ``combination.method``:
    ``sum`` (default) or ``avg`` (weighted mean over the legs that
    scored the doc). Output: identity, ``<name>_score`` (normalized)
    per leg, fused ``score``, ordered by fused score."""
    pipelines = arg["input"]["pipelines"]
    if not pipelines:
        raise PipelineCompileError("$scoreFusion requires at least one input pipeline")
    normalization = arg["input"].get("normalization", "none")
    if normalization not in ("none", "sigmoid", "minMaxScaler"):
        raise PipelineCompileError(
            f"unsupported $scoreFusion normalization: {normalization!r}"
        )
    comb = arg.get("combination") or {}
    weights = comb.get("weights") or {}
    method = comb.get("method", "sum")
    if method not in ("sum", "avg"):
        raise PipelineCompileError(f"unsupported $scoreFusion method: {method!r}")
    key = arg.get("key") or ("_id" if "_id" in df.columns else df.columns[0])
    score_field = arg.get("scoreField", "score")

    fused: DataFrame | None = None
    for name, stages in pipelines.items():
        sub = compile_pipeline(df, stages, resolve, sink)
        if score_field not in sub.columns:
            raise PipelineCompileError(
                f"$scoreFusion input {name!r} does not produce a "
                f"{score_field!r} column ($search/$vectorSearch do)"
            )
        s = F.col(score_field).cast("double")
        if normalization == "sigmoid":
            s = F.lit(1.0) / (F.lit(1.0) + F.exp(-s))
        elif normalization == "minMaxScaler":
            # legs are top-k bounded, so this is a constant-size agg
            row = sub.agg(
                F.min(score_field).alias("lo"), F.max(score_field).alias("hi")
            ).collect()[0]
            if row["lo"] is None:
                # empty leg: no rows to normalize — any affine map is
                # vacuous, but float(None) would crash the compile
                lo, span = 0.0, 1.0
            else:
                lo, hi = float(row["lo"]), float(row["hi"])
                span = (hi - lo) or 1.0
            s = (s - F.lit(lo)) / F.lit(span)
        leg = sub.select(F.col(key), s.alias(f"{name}_score"))
        fused = leg if fused is None else fused.join(leg, on=key, how="full_outer")
    total = None
    present_w = None
    for name in pipelines:
        w = float(weights.get(name, 1.0))
        col = F.col(f"{name}_score")
        part = F.when(col.isNotNull(), F.lit(w) * col).otherwise(F.lit(0.0))
        wpart = F.when(col.isNotNull(), F.lit(w)).otherwise(F.lit(0.0))
        total = part if total is None else total + part
        present_w = wpart if present_w is None else present_w + wpart
    score = total if method == "sum" else total / F.greatest(present_w, F.lit(1e-300))
    return fused.withColumn(score_field, score).orderBy(
        F.desc(score_field), F.col(key)
    )


def _redact(df: DataFrame, expr: Any) -> DataFrame:
    """``$redact``: evaluate ``expr`` at every document level; the result
    must be ``$$PRUNE`` (drop this level), ``$$KEEP`` (keep subtree
    as-is, stop evaluating), or ``$$DESCEND`` (keep this level's scalar
    fields, re-evaluate inside each embedded document / array element).

    Spark-first formulation: one pass of pure Column expressions — a
    ``where`` at the root plus a recursive struct rebuild (``F.filter``
    / ``F.transform`` for arrays) guided by the *static* schema, so the
    whole stage stays in codegen; no UDFs, no extra jobs.

    Fixed-schema divergences (consistent with the engine's documented
    contract): a pruned embedded document becomes NULL rather than a
    missing field, and the expression may only reference fields that
    exist at every level it's evaluated against (Mongo would treat a
    missing field as null; here it's a compile error).
    """
    root = F.struct(*[F.col(c) for c in df.columns])

    def decision(cur: Column, level_type: T.StructType) -> Column:
        env = {
            "CURRENT": cur,
            "CURRENT_TYPE": level_type,
            "ROOT": root,
            "DESCEND": F.lit("D"),
            "PRUNE": F.lit("P"),
            "KEEP": F.lit("K"),
        }
        d = compile_expr(expr, df.schema, env)
        return F.when(d.isin("D", "P", "K"), d).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("$redact expression must return $$DESCEND, $$PRUNE or $$KEEP, got: "),
                    F.coalesce(d.cast("string"), F.lit("null")),
                )
            )
        )

    def has_documents(dt: T.DataType) -> bool:
        if isinstance(dt, T.StructType):
            return True
        if isinstance(dt, T.ArrayType):
            return has_documents(dt.elementType)
        return False

    def redact_value(col: Column, dt: T.DataType) -> Column:
        if isinstance(dt, T.StructType):
            return redact_struct(col, dt)
        # ArrayType whose (possibly nested) element holds documents;
        # non-document levels aren't themselves evaluated, as in Mongo
        elem = dt.elementType
        if isinstance(elem, T.StructType):
            kept = F.filter(col, lambda x: x.isNull() | (decision(x, elem) != F.lit("P")))
            return F.transform(kept, lambda x: redact_struct(x, elem))
        return F.transform(col, lambda x: redact_value(x, elem))

    def redact_struct(s: Column, st: T.StructType) -> Column:
        rebuilt = F.struct(
            *[
                (redact_value(s.getItem(f.name), f.dataType)
                 if has_documents(f.dataType)
                 else s.getItem(f.name)).alias(f.name)
                for f in st.fields
            ]
        )
        d = decision(s, st)
        return (
            F.when(s.isNull(), F.lit(None).cast(st))
            .when(d == "P", F.lit(None).cast(st))
            .when(d == "K", s)
            .otherwise(rebuilt)
        )

    out = df.where(decision(root, df.schema) != F.lit("P"))
    keep_root = decision(root, df.schema) == F.lit("K")
    cols = []
    for f in out.schema.fields:
        if has_documents(f.dataType):
            sub = redact_value(F.col(f.name), f.dataType)
            cols.append(F.when(keep_root, F.col(f.name)).otherwise(sub).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return out.select(*cols)


def _unwind(df: DataFrame, arg: Any) -> DataFrame:
    if isinstance(arg, str):
        path, preserve, idx = arg, False, None
    else:
        path = arg["path"]
        preserve = bool(arg.get("preserveNullAndEmptyArrays", False))
        idx = arg.get("includeArrayIndex")
    if not path.startswith("$"):
        raise PipelineCompileError("$unwind path must start with $")
    name = path[1:]
    if "." in name:
        raise PipelineCompileError("$unwind on nested paths not yet supported")
    others = [c for c in df.columns if c != name]
    if idx:
        gen = F.posexplode_outer(F.col(name)) if preserve else F.posexplode(F.col(name))
        return df.select(*others, gen.alias(idx, name))
    gen = F.explode_outer(F.col(name)) if preserve else F.explode(F.col(name))
    return df.select(*others, gen.alias(name))


def _lookup(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame] | None,
    unwind_preserve: bool | None = None,
) -> DataFrame:
    """$lookup = left outer join + re-nest matches as an array-of-structs
    column. The join is a plain equi-join so Catalyst picks broadcast vs
    shuffle (AQE re-plans at runtime); the collect_list regroup happens
    on the foreign side BEFORE the join, so the join is 1:1 and never
    explodes rows. Null join keys use eqNullSafe: Mongo matches foreign
    docs whose foreignField is null when the local field is null/missing.

    ``unwind_preserve`` is set by the $lookup+$unwind fusion peephole:
    instead of collect_list→join→explode, compile ONE direct join
    (inner, or left when preserveNullAndEmptyArrays) and pack the
    foreign row as a struct in the ``as`` column — no regroup shuffle,
    no per-key array materialization.

    Pipeline form (``let`` + ``pipeline``) is supported for the common
    correlated-equality case: the sub-pipeline runs on the foreign
    collection and ``$expr`` equality conditions referencing a single
    let-variable compile to the join key. Non-equality correlated
    sub-pipelines are rejected (they would be cross joins)."""
    if resolve is None:
        raise PipelineCompileError("$lookup requires a collection resolver")
    if "pipeline" in arg:
        if "localField" in arg and "foreignField" in arg:
            # Mongo 8 concise syntax: localField/foreignField alongside a
            # pipeline = an implicit $expr equality prepended to it
            arg = dict(arg)
            lf, ff = arg.pop("localField"), arg.pop("foreignField")
            arg["let"] = {**arg.get("let", {}), "__lf": f"${lf}"}
            arg["pipeline"] = [
                {"$match": {"$expr": {"$eq": ["$$__lf", f"${ff}"]}}}
            ] + list(arg["pipeline"])
        return _lookup_pipeline(df, arg, resolve, unwind_preserve)
    for field in ("from", "localField", "foreignField", "as"):
        if field not in arg:
            raise PipelineCompileError(f"$lookup missing {field!r}")
    foreign = resolve(arg["from"])
    local_f, foreign_f, out = arg["localField"], arg["foreignField"], arg["as"]
    if out in df.columns:
        df = df.drop(out)  # Mongo overwrites an existing field of that name

    local_is_arr = _is_array_field(df.schema, local_f)
    foreign_is_arr = _is_array_field(foreign.schema, foreign_f)
    if local_is_arr or foreign_is_arr:
        # Mongo array-field join semantics: an array localField matches
        # foreign docs whose key equals ANY element (and vice versa)
        return _lookup_array_field(
            df, foreign, local_f, foreign_f, out,
            local_is_arr, foreign_is_arr, unwind_preserve,
        )

    # active collation (round 7): Mongo collates $lookup equality, so
    # string join keys compare under the aggregate's collation (the
    # foreign-side regroup key too — case-variant foreign keys merge
    # into one match array).  Non-string keys are untouched.
    from anser_spark.functions.collation import active_collation, collate_if_string
    from anser_spark.functions.filters import field_type as _ftype

    def _ckey(col, schema, name):
        return (
            collate_if_string(col, _ftype(schema, name))
            if active_collation()
            else col
        )

    if unwind_preserve is not None:
        # fused $lookup+$unwind → direct join, struct-typed `as` column.
        # Per-column projections ride as ONE parsed SQL snippet each
        # (selectExpr / named_struct): `F.col(c).alias(...)` costs 2+
        # py4j round trips per foreign column, ~440 round trips ≈ 0.2s
        # of driver time per wide fused lookup (guide §1.2).
        fr = foreign.selectExpr(
            "true AS `__f_matched`",
            *[f"{_bq1(c)} AS {_bq1('__f_' + c)}" for c in foreign.columns],
        )
        how = "left" if unwind_preserve else "inner"
        joined = df.join(
            fr,
            on=_ckey(df[local_f], df.schema, local_f).eqNullSafe(
                _ckey(fr[f"__f_{foreign_f}"], foreign.schema, foreign_f)
            ),
            how=how,
        )
        packed = F.expr(
            _named_struct_sql((c, "__f_" + c) for c in foreign.columns)
        )
        if unwind_preserve:
            # no match ⇒ field absent in Mongo ⇒ null struct, not struct of nulls
            packed = F.when(F.col("__f_matched"), packed)
        if any(c == "__f_matched" or c.startswith("__f_") for c in df.columns):
            # name collision with the prefixed foreign side: fall back
            # to side-qualified column objects
            return joined.select(*[df[c] for c in df.columns], packed.alias(out))
        return joined.select(*df.columns, packed.alias(out))

    grouped = foreign.groupBy(
        _ckey(F.col(foreign_f), foreign.schema, foreign_f).alias("__lk")
    ).agg(
        F.collect_list(
            F.expr(_named_struct_sql((c, c) for c in foreign.columns))
        ).alias(out)
    )
    joined = df.join(
        grouped,
        on=_ckey(df[local_f], df.schema, local_f).eqNullSafe(grouped["__lk"]),
        how="left",
    ).drop("__lk")
    elem_type = grouped.schema[out].dataType
    # Mongo: no matches ⇒ empty array, not null
    return joined.withColumn(
        out, F.coalesce(F.col(out), F.array().cast(elem_type))
    )


def _is_array_field(schema, name: str) -> bool:
    from pyspark.sql import types as T

    cur = schema
    for part in str(name).split("."):
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return isinstance(cur, T.ArrayType)


def _lookup_array_field(
    df: DataFrame,
    foreign: DataFrame,
    local_f: str,
    foreign_f: str,
    out: str,
    local_is_arr: bool,
    foreign_is_arr: bool,
    unwind_preserve: bool | None,
) -> DataFrame:
    """Classic $lookup where localField and/or foreignField is an
    ARRAY: Mongo matches on ANY element. Compiled as explode →
    EQUI-join → regroup on a row id — always a hash join, never the
    array_contains theta condition (which would plan a nested loop).
    When both sides are arrays, a foreign doc matching via several
    shared elements still appears once (dedup on the id pair).
    Documented divergence: whole-array equality (local [1,2] matching a
    foreign ARRAY value [1,2]) is not matched — element semantics only.

    The id-bearing frames are eagerly localCheckpoint-ed: the row ids
    come from monotonically_increasing_id and the frame appears on both
    sides of the regroup self-join, so its partitions must be computed
    exactly once — a task retry re-deriving fresh ids would corrupt the
    join.  localCheckpoint (not persist) truncates the lineage so a
    retry rereads the stored partitions, and its storage is reclaimed
    by the ContextCleaner once the result frame is unreferenced — no
    session-lifetime cache pin."""
    luid, fuid = "__al_luid", "__al_fuid"
    df2 = df.withColumn(luid, F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    fr2 = foreign.withColumn(fuid, F.monotonically_increasing_id())
    if local_is_arr and foreign_is_arr:
        # fuid feeds the (luid, fuid) dedup — must be retry-stable too
        fr2 = fr2.localCheckpoint(eager=True)
    def _elems(col: Column) -> Column:
        # Mongo semantics via the generated {$in: elements} query: a
        # NULL/missing array is the null VALUE (one null element, so it
        # pairs with null counterparts); an EMPTY array has no elements
        # and matches nothing (explode of [] emits no rows)
        return F.explode(
            F.when(col.isNull(), F.array(F.lit(None))).otherwise(
                F.array_distinct(col)
            )
        )

    if local_is_arr:
        lk = df2.select(luid, _elems(F.col(local_f)).alias("__lv"))
    else:
        lk = df2.select(luid, F.col(local_f).alias("__lv"))
    # per-column rename batched as ONE selectExpr round trip (guide §1.2)
    frename = [f"{_bq1(c)} AS {_bq1('__f_' + c)}" for c in foreign.columns]
    if foreign_is_arr:
        fr2 = fr2.withColumn("__fv", _elems(F.col(foreign_f)))
        fk = fr2.selectExpr(_bq1(fuid), "`__fv`", *frename)
    else:
        from anser_spark.functions.filters import field_path_sql

        fk = fr2.selectExpr(
            _bq1(fuid), f"{field_path_sql(foreign_f)} AS `__fv`", *frename
        )
    matched = lk.join(fk, on=lk["__lv"].eqNullSafe(fk["__fv"]), how="inner")
    if local_is_arr and foreign_is_arr:
        matched = matched.dropDuplicates([luid, fuid])
    data_cols = [f"__f_{c}" for c in foreign.columns]

    if unwind_preserve is not None:
        # fused $unwind: one row per (doc, matched foreign doc)
        packed = F.expr(
            _named_struct_sql((c, "__f_" + c) for c in foreign.columns)
        )
        m = matched.select(luid, packed.alias("__pk"), F.lit(True).alias("__hit"))
        how = "left" if unwind_preserve else "inner"
        joined = df2.join(m, on=luid, how=how)
        res = joined.select(
            *[df2[c] for c in df.columns],
            (F.when(F.col("__hit"), F.col("__pk")) if unwind_preserve
             else F.col("__pk")).alias(out),
        )
        return res

    grouped = matched.groupBy(luid).agg(
        F.collect_list(
            F.expr(
                _named_struct_sql((c[len("__f_"):], c) for c in data_cols)
            )
        ).alias(out)
    )
    joined = df2.join(grouped, on=luid, how="left").drop(luid)
    elem_type = grouped.schema[out].dataType
    return joined.withColumn(out, F.coalesce(F.col(out), F.array().cast(elem_type)))


def _expr_has_var(node: Any) -> bool:
    """True iff an aggregation-EXPRESSION tree contains a genuine
    ``$$var`` path reference.  Strings under ``$literal`` never count —
    unlike the old ``'$$' in repr(...)`` substring check, a literal
    string that merely CONTAINS ``$$`` (``{"$literal": "$$ price"}``)
    is not a correlation."""
    if isinstance(node, str):
        return node.startswith("$$")
    if isinstance(node, Mapping):
        if len(node) == 1 and "$literal" in node:
            return False
        return any(_expr_has_var(v) for v in node.values())
    if isinstance(node, (list, tuple)):
        return any(_expr_has_var(v) for v in node)
    return False


def _query_has_var(node: Any) -> bool:
    """True iff a QUERY-context filter document references a ``$$var``.
    In query context every scalar value is a literal (``{"f": "$$x"}``
    matches the text ``$$x``); only subtrees under ``$expr`` switch to
    expression context where ``$$``-prefixed strings are variables."""
    if isinstance(node, Mapping):
        for k, v in node.items():
            if k == "$expr":
                if _expr_has_var(v):
                    return True
            elif _query_has_var(v):
                return True
        return False
    if isinstance(node, (list, tuple)):
        return any(_query_has_var(v) for v in node)
    return False


def _stage_has_var_ref(stage: Any) -> bool:
    """True iff a pipeline stage references a ``$$var``: $match args
    walk in query context, every other stage arg in expression
    context."""
    if not isinstance(stage, Mapping):
        return False
    for name, arg in stage.items():
        if name == "$match":
            if _query_has_var(arg):
                return True
        elif _expr_has_var(arg):
            return True
    return False


def _pack_uncorrelated_lookup(
    df: DataFrame,
    sub: DataFrame,
    out_col: str,
    unwind_preserve: bool | None,
) -> DataFrame:
    """Uncorrelated pipeline-form $lookup: the sub-result is the SAME
    array for every outer row — compute it once, pack it into a 1-row
    aggregate, broadcast cross join (never a per-row re-run), and apply
    the fused $unwind when present."""
    if out_col in df.columns:
        df = df.drop(out_col)
    packed = sub.agg(
        F.collect_list(
            F.expr(_named_struct_sql((c, c) for c in sub.columns))
        ).alias(out_col)
    )
    joined = df.crossJoin(F.broadcast(packed))
    if unwind_preserve is not None:
        exploded = (
            F.explode_outer(F.col(out_col))
            if unwind_preserve
            else F.explode(F.col(out_col))
        )
        return joined.select(
            *[c for c in joined.columns if c != out_col],
            exploded.alias(out_col),
        )
    return joined


def _lookup_pipeline(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame],
    unwind_preserve: bool | None = None,
    semi: bool | None = None,
) -> DataFrame | None:
    """$lookup pipeline form.

    The correlated case keys on the FIRST ``{$match: {$expr: ...}}``
    stage whose let-variable conditions are equalities — they become the
    join keys; every other condition stays a foreign-side filter.
    Stages BEFORE that $match must be uncorrelated (no ``$$var``
    references) and run on the foreign collection first; stages after it
    run before grouping (they must not project away the join fields).

    A pipeline with NO ``$expr`` $match and no ``$$var`` references is
    an *uncorrelated* lookup: the sub-pipeline result is identical for
    every input row, so it compiles to one aggregation + a broadcast
    cross join of the packed array."""
    foreign = resolve(arg["from"])
    let = dict(arg.get("let", {}))
    out = arg["as"]
    stages = list(arg["pipeline"])

    def _is_expr_match(stage: Any) -> bool:
        return (
            isinstance(stage, Mapping)
            and "$match" in stage
            and isinstance(stage["$match"], Mapping)
            and "$expr" in stage["$match"]
        )

    key_idx = next((i for i, s in enumerate(stages) if _is_expr_match(s)), None)

    if key_idx is None and semi is not None:
        return None  # uncorrelated — decline semi/anti fusion

    if key_idx is None:
        if any(_stage_has_var_ref(s) for s in stages):
            raise PipelineCompileError(
                "$lookup pipeline form with let-variable references needs a "
                "{$match: {$expr: ...}} stage to carry the join keys"
            )
        # uncorrelated: same array for every row → compute once, one
        # aggregation, broadcast cross join (never a per-row re-run)
        sub = compile_pipeline(foreign, stages, None, None)
        return _pack_uncorrelated_lookup(df, sub, out, unwind_preserve)

    prefix = stages[:key_idx]
    for s in prefix:
        if _stage_has_var_ref(s):
            raise PipelineCompileError(
                "$lookup sub-pipeline stages before the $expr $match must be "
                "uncorrelated (no $$variable references)"
            )
    if prefix:
        foreign = compile_pipeline(foreign, prefix, None, None)
    match_arg = stages[key_idx]["$match"]
    stages = stages[key_idx:]
    expr = match_arg.get("$expr")

    conds = expr["$and"] if isinstance(expr, Mapping) and "$and" in expr else [expr]
    join_pairs: list[tuple[Column, Any]] = []  # (local expr, foreign field expr str)
    residual: list[Any] = []

    def is_var(x: Any) -> bool:
        return isinstance(x, str) and x.startswith("$$")

    for cond in conds:
        if isinstance(cond, Mapping) and len(cond) == 1 and "$eq" in cond:
            a, b = cond["$eq"]
            if is_var(a) and isinstance(b, str) and b.startswith("$"):
                var, ffield = a[2:], b
            elif is_var(b) and isinstance(a, str) and a.startswith("$"):
                var, ffield = b[2:], a
            else:
                residual.append(cond)
                continue
            if var not in let:
                raise PipelineCompileError(f"unbound let variable $${var}")
            join_pairs.append((compile_expr(let[var], df.schema), ffield))
            continue
        residual.append(cond)
    if not join_pairs:
        # No let-variable equality. Two legitimate Mongo shapes land
        # here (round 7; previously rejected):
        #  - theta-only correlation ($gte/$lt/$ne between $$var and a
        #    foreign field): a non-equi join — Spark plans a broadcast
        #    nested-loop; inherently O(n·m) worst case, exactly what
        #    the query asks for (document the cost, don't forbid it)
        #  - a fully uncorrelated $expr (no $$vars anywhere): just a
        #    foreign-side filter → the compute-once broadcast-pack path
        theta_corr = [c for c in residual if _expr_has_var(c)]
        plain = [c for c in residual if not _expr_has_var(c)]
        filtered = foreign
        non_expr = {k: v for k, v in match_arg.items() if k != "$expr"}
        if non_expr:
            filtered = filtered.where(compile_filter(non_expr, filtered.schema))
        for cond in plain:
            filtered = filtered.where(
                compile_expr(cond, filtered.schema).cast("boolean")
            )
        if theta_corr:
            if len(stages) > 1:
                raise PipelineCompileError(
                    "$lookup sub-pipeline stages after a correlated "
                    "non-equality $match are not supported (the filter "
                    "depends on the outer row, so the tail cannot be "
                    "decorrelated)"
                )
            return _lookup_correlated_theta(
                df, filtered, let, [], theta_corr, arg["as"],
                unwind_preserve, semi,
            )
        if semi is not None:
            return None  # uncorrelated — decline semi/anti fusion
        sub = compile_pipeline(filtered, stages[1:], None, None)
        return _pack_uncorrelated_lookup(df, sub, arg["as"], unwind_preserve)

    filtered = foreign
    non_expr = {k: v for k, v in match_arg.items() if k != "$expr"}
    if non_expr:
        filtered = filtered.where(compile_filter(non_expr, filtered.schema))
    # residual conditions that reference let variables compare the OUTER
    # row against the foreign row — they cannot be applied foreign-side
    # and become part of the join condition instead (TPC-H q21's
    # `l2.l_suppkey <> l1.l_suppkey` shape)
    residual_corr = [c for c in residual if _expr_has_var(c)]
    residual = [c for c in residual if not _expr_has_var(c)]
    for cond in residual:
        filtered = filtered.where(compile_expr(cond, filtered.schema).cast("boolean"))
    if residual_corr:
        if len(stages) > 1:
            raise PipelineCompileError(
                "$lookup sub-pipeline stages after a correlated non-equality "
                "$match are not supported (the filter depends on the outer "
                "row, so the tail cannot be decorrelated)"
            )
        return _lookup_correlated_theta(
            df, filtered, let, join_pairs, residual_corr, arg["as"],
            unwind_preserve, semi,
        )
    key_cols = [
        compile_expr(ffield, filtered.schema).alias(f"__lk{i}")
        for i, (_loc, ffield) in enumerate(join_pairs)
    ]
    filtered = filtered.select(*key_cols, *[F.col(c) for c in filtered.columns])
    # join keys must survive the user's sub-pipeline: silently extend
    # inclusion-projections to keep the internal __lk columns
    lk_names = [f"__lk{i}" for i in range(len(join_pairs))]
    sub = filtered
    for stage in stages[1:]:
        if "$project" in stage:
            proj = dict(stage["$project"])
            if any(v not in (0, False) for v in proj.values()):
                for name in lk_names:
                    proj.setdefault(name, 1)
            sub = compile_pipeline(sub, [{"$project": proj}], None, None)
        elif "$group" in stage:
            # correlated aggregate subquery (TPC-H q2/q17 shape): Mongo
            # runs the $group per outer row over its matching foreign
            # docs; decorrelated, that is ONE aggregate grouped by
            # (join keys + user _id) followed by the equi-join — the
            # classic aggregate-then-join rewrite, never a per-row re-run
            if _expr_has_var(stage["$group"]):
                raise PipelineCompileError(
                    "$group inside a $lookup sub-pipeline must not "
                    "reference let variables"
                )
            sub = _decorrelated_group(sub, stage["$group"], lk_names)
        else:
            sub = compile_pipeline(sub, [stage], None, None)
    for name in lk_names:
        if name not in sub.columns:
            raise PipelineCompileError(
                "$lookup sub-pipeline must not remove the join fields "
                "(e.g. via $replaceRoot)"
            )
    data_cols = [c for c in sub.columns if not c.startswith("__lk")]
    out_col = arg["as"]
    if out_col in df.columns:
        df = df.drop(out_col)

    if semi is not None:
        # fused $lookup(pipeline)+$match-(non)empty+drop → semi/anti join
        keys = sub.select(*[F.col(f"__lk{i}") for i in range(len(join_pairs))])
        on = [
            local.eqNullSafe(keys[f"__lk{i}"])
            for i, (local, _f) in enumerate(join_pairs)
        ]
        how = "left_semi" if semi else "left_anti"
        return df.join(keys, on=functools_reduce_and(on), how=how)

    if unwind_preserve is not None:
        # fused $lookup(pipeline)+$unwind → direct join on the let-keys.
        # Per-column projections batched into single SQL snippets — one
        # py4j round trip instead of 2+ per column (guide §1.2).
        fr = sub.selectExpr(
            "true AS `__f_matched`",
            *[_bq1(f"__lk{i}") for i in range(len(join_pairs))],
            *[f"{_bq1(c)} AS {_bq1('__f_' + c)}" for c in data_cols],
        )
        on = [
            local.eqNullSafe(fr[f"__lk{i}"]) for i, (local, _f) in enumerate(join_pairs)
        ]
        how = "left" if unwind_preserve else "inner"
        joined = df.join(fr, on=functools_reduce_and(on), how=how)
        packed = (
            F.expr(_named_struct_sql((c, "__f_" + c) for c in data_cols))
            if data_cols
            else F.struct(*[F.col(f"__f_{c}").alias(c) for c in data_cols])
        )
        if unwind_preserve:
            packed = F.when(F.col("__f_matched"), packed)
        if any(
            c == "__f_matched" or c.startswith("__f_") or c.startswith("__lk")
            for c in df.columns
        ):
            return joined.select(*[df[c] for c in df.columns], packed.alias(out))
        return joined.select(*df.columns, packed.alias(out))

    grouped = sub.groupBy(*[F.col(f"__lk{i}") for i in range(len(join_pairs))]).agg(
        F.collect_list(
            F.expr(_named_struct_sql((c, c) for c in data_cols))
            if data_cols
            else F.struct(*[F.col(c) for c in data_cols])
        ).alias(out)
    )
    on = [
        local.eqNullSafe(grouped[f"__lk{i}"]) for i, (local, _f) in enumerate(join_pairs)
    ]
    joined = df.join(grouped, on=functools_reduce_and(on), how="left").drop(
        *[f"__lk{i}" for i in range(len(join_pairs))]
    )
    elem_type = grouped.schema[out].dataType
    return joined.withColumn(out, F.coalesce(F.col(out), F.array().cast(elem_type)))


def functools_reduce_and(conds: list[Column]) -> Column:
    import functools

    return functools.reduce(lambda a, b: a & b, conds)


def _decorrelated_group(
    sub: DataFrame, g: Mapping[str, Any], lk_names: list[str]
) -> DataFrame:
    """One $group stage inside a correlated $lookup sub-pipeline,
    decorrelated: group by (join keys + user _id) so a single shuffled
    aggregate serves every outer row.  An outer row with no matching
    foreign docs gets no group — Mongo's empty-input $group likewise
    emits nothing, so the lookup array is empty on both engines."""
    if "_id" not in g:
        raise PipelineCompileError("$group requires _id")
    uid = g["_id"]
    accs = {k: v for k, v in g.items() if k != "_id"}
    # the REAL group key is (join keys + user _id) — an N-accumulator
    # here gets the same bounded prefilter as a top-level $group, keyed
    # on the full compound (a hot join key would otherwise collect
    # whole match-groups into one agg buffer)
    part = [F.col(n) for n in lk_names] + _group_part_cols(uid, sub.schema)
    sub, agg_cols = _compile_group_aggs(sub, accs, part)
    if not agg_cols:
        agg_cols = [F.count(F.lit(1)).alias("__n")]
        drop_n = True
    else:
        drop_n = False
    keys = [F.col(n) for n in lk_names]
    if uid is None:
        grouped = sub.groupBy(*keys).agg(*agg_cols)
        out = grouped.select(
            *lk_names, F.lit(None).cast("string").alias("_id"),
            *[F.col(n) for n in accs],
        )
    elif isinstance(uid, Mapping) and not any(str(k).startswith("$") for k in uid):
        id_cols = [
            compile_expr(v, sub.schema).alias(f"__id_{k}") for k, v in uid.items()
        ]
        grouped = sub.groupBy(*keys, *id_cols).agg(*agg_cols)
        id_struct = F.struct(*[F.col(f"__id_{k}").alias(k) for k in uid]).alias("_id")
        out = grouped.select(*lk_names, id_struct, *[F.col(n) for n in accs])
    else:
        grouped = sub.groupBy(
            *keys, compile_expr(uid, sub.schema).alias("_id")
        ).agg(*agg_cols)
        out = grouped.select(*lk_names, "_id", *[F.col(n) for n in accs])
    return out.drop("__n") if drop_n else out


def _lookup_correlated_theta(
    df: DataFrame,
    filtered: DataFrame,
    let: Mapping[str, Any],
    join_pairs: list[tuple[Column, Any]],
    residual_corr: list[Any],
    out: str,
    unwind_preserve: bool | None,
    semi: bool | None,
) -> DataFrame:
    """Correlated $lookup whose $expr $match carries non-equality
    conditions on let variables (q21's EXISTS-with-<> shape).  The
    equalities stay the shuffle keys; the theta conditions join on
    renamed columns (`__ov_<var>` outer, `__f_<field>` foreign) so a
    self-join on the same collection never hits ambiguous lineage.
    Spark still plans a hash join on the equi-keys with the theta part
    as a post-join filter — one shuffle, no cartesian."""
    from pyspark.sql import types as T

    used_vars: set[str] = set()

    def _rw(node: Any) -> Any:
        if isinstance(node, str):
            if node.startswith("$$"):
                head, dot, tail = node[2:].partition(".")
                if head not in let:
                    raise PipelineCompileError(
                        f"unbound let variable $${head} (system variables are "
                        "not supported in correlated theta conditions)"
                    )
                used_vars.add(head)
                return f"$__ov_{head}" + (dot + tail if dot else "")
            if node.startswith("$"):
                return "$__f_" + node[1:]
            return node
        if isinstance(node, Mapping):
            if "$literal" in node:
                return node
            return {k: _rw(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [_rw(v) for v in node]
        return node

    rewritten = [_rw(c) for c in residual_corr]

    if out in df.columns:
        df = df.drop(out)
    orig_cols = list(df.columns)
    df2 = df
    for var in sorted(used_vars):
        df2 = df2.withColumn(f"__ov_{var}", compile_expr(let[var], df.schema))

    data_cols = list(filtered.columns)
    fr = filtered.select(
        F.lit(True).alias("__f_matched"),
        *[
            compile_expr(ffield, filtered.schema).alias(f"__lk{i}")
            for i, (_loc, ffield) in enumerate(join_pairs)
        ],
        *[F.col(c).alias(f"__f_{c}") for c in data_cols],
    )

    combined = T.StructType(list(df2.schema.fields) + list(fr.schema.fields))
    on_conds = [
        local.eqNullSafe(fr[f"__lk{i}"]) for i, (local, _f) in enumerate(join_pairs)
    ] + [compile_expr(c, combined).cast("boolean") for c in rewritten]
    on = functools_reduce_and(on_conds)

    if semi is not None:
        how = "left_semi" if semi else "left_anti"
        return df2.join(fr, on=on, how=how).select(*orig_cols)

    packed = F.struct(*[F.col(f"__f_{c}").alias(c) for c in data_cols])
    if unwind_preserve is not None:
        how = "left" if unwind_preserve else "inner"
        joined = df2.join(fr, on=on, how=how)
        if unwind_preserve:
            packed = F.when(F.col("__f_matched"), packed)
        return joined.select(*[df2[c] for c in orig_cols], packed.alias(out))

    # plain array form: per-outer-row arrays differ even for equal join
    # keys (the theta part sees the whole row), so regroup on a unique
    # row id after the join — the same shuffle Mongo's semantics force
    uid = "__row_uid"
    df2 = df2.withColumn(uid, F.monotonically_increasing_id())
    joined = df2.join(fr, on=on, how="left")
    arr = F.collect_list(F.when(F.col("__f_matched"), packed)).alias(out)
    agg = joined.groupBy(uid).agg(
        *[F.first(F.col(c), ignorenulls=False).alias(c) for c in orig_cols], arr
    )
    return agg.select(*orig_cols, out)


def _graph_lookup(
    df: DataFrame, arg: Mapping[str, Any], resolve: Callable[[str], DataFrame]
) -> DataFrame:
    """$graphLookup: bounded-depth BFS as iterative equi-joins (one Spark
    join per level, frontier deduped; default maxDepth 10 — Mongo's
    unbounded recursion needs an explicit bound in a batch engine).
    depthField and restrictSearchWithMatch supported (the restriction
    filters traversed docs at every step, pushed to the foreign scan
    once).

    Iteration state is eager-localCheckpoint-ed, not persisted: source
    row ids (monotonically_increasing_id) and each BFS level are
    computed exactly once, lineage is truncated (no recompute blow-up
    across levels), and the ContextCleaner reclaims the blocks when the
    result frame is released — the session-lifetime persist pin the
    advisor flagged on the array-field lookup applied here too."""
    foreign = resolve(arg["from"])
    restrict = arg.get("restrictSearchWithMatch")
    if restrict:
        foreign = foreign.where(compile_filter(restrict, foreign.schema))
    connect_from = arg["connectFromField"]
    connect_to = arg["connectToField"]
    out = arg["as"]
    depth_field = arg.get("depthField")
    max_depth = int(arg.get("maxDepth", 10))

    src = df.withColumn("__rid", F.monotonically_increasing_id()).localCheckpoint(
        eager=True  # pins the ids; see docstring
    )
    frontier = src.select(
        "__rid", compile_expr(arg["startWith"], src.schema).alias("__val")
    )
    if isinstance(frontier.schema["__val"].dataType, T.ArrayType):
        frontier = frontier.select("__rid", F.explode("__val").alias("__val"))
    fcols = [F.col(c) for c in foreign.columns]
    acc = None
    seen_key = F.sha2(F.to_json(F.struct(*fcols)), 256)
    # active collation (round 8): the traversal equality collates both
    # sides when string-typed, as Mongo's aggregate collation does; the
    # cycle guard stays binary (document identity, not string equality)
    from anser_spark.functions.collation import collate_if_string

    to_dt = (
        foreign.schema[connect_to].dataType
        if connect_to in foreign.columns else None
    )

    def _eq(fr):
        lhs, rhs = fr["__val"], foreign[connect_to]
        if isinstance(to_dt, T.StringType) and isinstance(
            fr.schema["__val"].dataType, T.StringType
        ):
            return collate_if_string(lhs, to_dt).eqNullSafe(
                collate_if_string(rhs, to_dt)
            )
        return lhs.eqNullSafe(rhs)

    for depth in range(max_depth + 1):
        hits = (
            frontier.join(foreign, _eq(frontier))
            .select("__rid", F.lit(depth).alias("__depth"), *fcols)
            .withColumn("__key", seen_key)
        )
        if acc is not None:
            # drop nodes already reached for this source row (cycle guard)
            hits = hits.join(
                acc.select(F.col("__rid").alias("__arid"), F.col("__key").alias("__akey")),
                on=[hits["__rid"] == F.col("__arid"), hits["__key"] == F.col("__akey")],
                how="left_anti",
            )
        hits = hits.localCheckpoint(eager=True)  # level stored once
        if hits.isEmpty():
            break
        # acc is a union of checkpointed levels: cheap lineage, no
        # re-persist per level, nothing pinned past the result's life
        acc = hits if acc is None else acc.unionByName(hits)
        if isinstance(hits.schema[connect_from].dataType, T.ArrayType):
            next_vals = hits.select("__rid", F.explode(connect_from).alias("__val"))
        else:
            next_vals = hits.select("__rid", F.col(connect_from).alias("__val"))
        frontier = next_vals.distinct()
    if acc is None:
        return src.withColumn(out, F.array()).drop("__rid")
    struct_cols = [F.col(c) for c in foreign.columns]
    if depth_field:
        struct_cols = struct_cols + [F.col("__depth").alias(depth_field)]
    grouped = acc.groupBy("__rid").agg(
        F.collect_list(F.struct(*struct_cols)).alias(out)
    )
    elem_type = grouped.schema[out].dataType
    joined = src.join(grouped, "__rid", "left").drop("__rid")
    return joined.withColumn(out, F.coalesce(F.col(out), F.array().cast(elem_type)))


def _set_window_fields(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """$setWindowFields → Spark window functions (native, shuffle-on-
    partitionBy only). Supported window operators: $rank, $denseRank,
    $documentNumber, $shift, $sum/$avg/$min/$max/$count/$first/$last/
    $push/$addToSet/$stdDevPop/$stdDevSamp/$covariancePop/$covarianceSamp/
    $minN/$maxN/$firstN/$lastN/$top/$bottom/$topN/$bottomN
    (with optional `window.documents` row frame or `window.range` value
    frame, incl. time `unit`), $locf, $linearFill, $derivative,
    $integral (trapezoidal; lower frame bound must be unbounded),
    $expMovingAvg (the one operator on the UDF path: a sequential
    recurrence with no stable closed form over Spark windows runs as
    Arrow-batched applyInPandas per partition key — pandas
    ewm(adjust=False) IS Mongo's recurrence).

    Mongo's default window for aggregate operators is the WHOLE
    partition even when sortBy is present — Spark's default with an
    ORDER BY is unboundedPreceding..currentRow (a running aggregate),
    so an explicit unbounded..unbounded frame is set when no `window`
    is given."""
    from pyspark.sql import Window

    _AGG_OPS = {"$sum", "$avg", "$min", "$max", "$count", "$first", "$last",
                "$push", "$addToSet", "$stdDevPop", "$stdDevSamp",
                "$covariancePop", "$covarianceSamp", "$median", "$percentile",
                "$minN", "$maxN", "$firstN", "$lastN",
                "$top", "$bottom", "$topN", "$bottomN"}
    # fixed-width units only; month/quarter/year are calendar-irregular
    _UNIT_MS = {
        "millisecond": 1,
        "second": 1_000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
        "week": 604_800_000,
    }

    partition = arg.get("partitionBy")
    sort_spec = arg.get("sortBy", {})
    part_cols = [compile_expr(partition, df.schema)] if partition is not None else []
    # active collation (round 8): string partition keys group by ICU
    # equivalence class and string sortBy keys order collated, as in
    # Mongo; window outputs never emit the key, so nothing leaks
    from anser_spark.functions.collation import collate_expr_if_string

    part_cols = [collate_expr_if_string(df, c)[0] for c in part_cols]
    w = Window.partitionBy(*part_cols)
    order_cols = parse_sort_keys(sort_spec, df.schema) if sort_spec else []
    if order_cols:
        w = w.orderBy(*order_cols)

    def _bound(v: Any, unbounded: int, scale: float | None) -> int:
        if v == "unbounded":
            return unbounded
        if v == "current":
            return Window.currentRow
        if not isinstance(v, (int, float)) or isinstance(v, bool):
            raise PipelineCompileError(f"invalid window bound: {v!r}")
        return int(v * scale) if scale else int(v)

    for name, spec in arg.get("output", {}).items():
        spec = dict(spec)
        frame = spec.pop("window", None)
        if len(spec) != 1:
            raise PipelineCompileError(f"window output {name!r} must have one operator")
        op, oparg = next(iter(spec.items()))
        wf = w
        lo_unbounded = frame is None  # whole-partition default
        if frame and "documents" in frame:
            lo = _bound(frame["documents"][0], Window.unboundedPreceding, None)
            hi = _bound(frame["documents"][1], Window.unboundedFollowing, None)
            lo_unbounded = lo == Window.unboundedPreceding
            wf = w.rowsBetween(lo, hi)
        elif frame and "range" in frame:
            # value-based frame → Spark rangeBetween (native; time units
            # handled by ordering on epoch-millis so bounds are numeric)
            if not isinstance(sort_spec, Mapping) or len(sort_spec) != 1:
                raise PipelineCompileError(
                    "window.range requires sortBy on exactly one field"
                )
            (sfield, sdir), = sort_spec.items()
            if sdir not in (1, True):
                raise PipelineCompileError("window.range requires ascending sortBy")
            unit = frame.get("unit")
            order_expr = compile_expr(f"${sfield}", df.schema)
            scale = None
            if unit is not None:
                if unit not in _UNIT_MS:
                    raise PipelineCompileError(
                        f"unsupported range unit {unit!r} (calendar units are irregular)"
                    )
                scale = _UNIT_MS[unit]
                order_expr = F.unix_millis(order_expr.cast("timestamp"))
            lo = _bound(frame["range"][0], Window.unboundedPreceding, scale)
            hi = _bound(frame["range"][1], Window.unboundedFollowing, scale)
            lo_unbounded = lo == Window.unboundedPreceding
            wf = Window.partitionBy(*part_cols).orderBy(order_expr).rangeBetween(lo, hi)
        elif op in _AGG_OPS and order_cols:
            # Mongo default: whole-partition window even under sortBy
            # (without sortBy, Spark's default frame already is); guard on
            # order_cols because rowsBetween requires an ORDER BY
            wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        if op == "$rank":
            col = F.rank().over(w)
        elif op == "$denseRank":
            col = F.dense_rank().over(w)
        elif op == "$documentNumber":
            col = F.row_number().over(w)
        elif op == "$shift":
            expr = compile_expr(oparg["output"], df.schema)
            by = int(oparg.get("by", 1))
            default = oparg.get("default")
            col = (
                F.lag(expr, -by, default).over(w)
                if by < 0
                else F.lead(expr, by, default).over(w)
            )
        elif op == "$sum":
            # Mongo windowed $sum is 0 — not null — over an empty or
            # all-null window (same rule as the $group accumulator)
            col = F.coalesce(
                F.sum(compile_expr(oparg, df.schema)).over(wf),
                F.lit(0).cast("long"),
            )
        elif op == "$avg":
            col = F.avg(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$min":
            col = F.min(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$max":
            col = F.max(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$count":
            col = F.count(F.lit(1)).over(wf)
        elif op == "$first":
            col = F.first(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$last":
            col = F.last(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$push":
            col = F.collect_list(compile_expr(oparg, df.schema)).over(wf)
        elif op == "$addToSet":
            col = F.collect_set(compile_expr(oparg, df.schema)).over(wf)
        elif op in ("$stdDevPop", "$stdDevSamp"):
            fn = F.stddev_pop if op == "$stdDevPop" else F.stddev_samp
            col = fn(compile_expr(oparg, df.schema)).over(wf)
        elif op in ("$median", "$percentile"):
            # Spark forbids ORDER BY / frames on window median/percentile
            # — whole-partition only (which IS Mongo's default window)
            if frame is not None:
                raise PipelineCompileError(
                    f"{op} supports only the whole-partition default window"
                )
            wp = Window.partitionBy(*part_cols) if part_cols else Window.partitionBy()
            inp = compile_expr(oparg["input"], df.schema)
            approx = oparg.get("method") == "approximate"
            if op == "$median":
                col = (
                    F.percentile_approx(inp.cast("double"), F.lit(0.5), F.lit(10_000))
                    if approx else F.median(inp)
                ).over(wp)
            else:
                parr = F.array(*[F.lit(float(p)) for p in oparg["p"]])
                col = (
                    F.percentile_approx(inp.cast("double"), parr, F.lit(10_000))
                    if approx else F.percentile(inp, parr)
                ).over(wp)
        elif op in ("$covariancePop", "$covarianceSamp"):
            a, b = oparg
            fn = F.covar_pop if op == "$covariancePop" else F.covar_samp
            col = fn(
                compile_expr(a, df.schema).cast("double"),
                compile_expr(b, df.schema).cast("double"),
            ).over(wf)
        elif op == "$locf":
            # last-observation-carried-forward: leading nulls stay null
            if not order_cols:
                raise PipelineCompileError("$locf requires sortBy")
            back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            col = F.last(compile_expr(oparg, df.schema), ignorenulls=True).over(back)
        elif op == "$linearFill":
            s, _unit = _numeric_sort_expr(sort_spec, None, df)
            inp = compile_expr(oparg, df.schema)
            back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            known_s = F.when(inp.isNotNull(), s)
            prev_v = F.last(inp, ignorenulls=True).over(back).cast("double")
            prev_s = F.last(known_s, ignorenulls=True).over(back)
            next_v = F.first(inp, ignorenulls=True).over(fwd).cast("double")
            next_s = F.first(known_s, ignorenulls=True).over(fwd)
            interp = prev_v + (next_v - prev_v) * (s - prev_s) / (next_s - prev_s)
            col = F.when(inp.isNotNull(), inp.cast("double")).otherwise(interp)
        elif op == "$derivative":
            # (Δ input / Δ sort-value) over the window's end points;
            # Mongo requires an explicit window for $derivative
            if frame is None:
                raise PipelineCompileError("$derivative requires a window")
            s, unit_ms = _numeric_sort_expr(sort_spec, oparg.get("unit"), df)
            inp = compile_expr(oparg["input"], df.schema).cast("double")
            num = F.last(inp).over(wf) - F.first(inp).over(wf)
            den = (F.last(s).over(wf) - F.first(s).over(wf)).cast("double")
            if unit_ms:
                den = den / F.lit(unit_ms)
            col = F.when(den != 0, num / den)
        elif op == "$integral":
            # trapezoidal integral: per-row contribution (pairing each row
            # with its predecessor) summed over the frame. Correct only
            # when the frame's lower bound is unbounded — every in-frame
            # pair is then fully inside the frame.
            if not lo_unbounded:
                raise PipelineCompileError(
                    "$integral requires a window with an unbounded lower bound"
                )
            s, unit_ms = _numeric_sort_expr(sort_spec, oparg.get("unit"), df)
            inp = compile_expr(oparg["input"], df.schema).cast("double")
            contrib = (inp + F.lag(inp).over(w)) * (s - F.lag(s).over(w)).cast("double") / 2
            if unit_ms:
                contrib = contrib / F.lit(unit_ms)
            iw = (
                wf
                if frame is not None
                else w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
                if order_cols
                else wf
            )
            col = F.sum(contrib).over(iw)
        elif op in ("$minN", "$maxN"):
            # Mongo ignores nulls for minN/maxN (collect_list drops them)
            inp = compile_expr(oparg["input"], df.schema)
            n = int(oparg["n"])
            arr = F.sort_array(F.collect_list(inp).over(wf), asc=op == "$minN")
            col = F.slice(arr, 1, n)
        elif op in ("$firstN", "$lastN"):
            # frame-order head/tail; struct-wrap keeps nulls (Mongo does)
            if not order_cols:
                raise PipelineCompileError(f"{op} requires sortBy")
            inp = compile_expr(oparg["input"], df.schema)
            n = int(oparg["n"])
            arr = F.transform(
                F.collect_list(F.struct(inp.alias("__v"))).over(wf),
                lambda s: s["__v"],
            )
            if op == "$firstN":
                col = F.slice(arr, F.lit(1), F.lit(n))
            else:
                col = F.slice(
                    arr,
                    F.greatest(F.lit(1), F.size(arr) - F.lit(n) + 1),
                    F.lit(n),
                )
        elif op in ("$top", "$bottom", "$topN", "$bottomN"):
            # own sortBy (independent of the window's sortBy), same
            # sorted-struct scaffold as the $group accumulators
            sort_by = oparg["sortBy"]
            ascs = _sortby_ascs(sort_by)
            keys = [
                compile_expr(f"${f}", df.schema).alias(f"__k{i}")
                for i, f in enumerate(sort_by)
            ]
            outv = compile_expr(oparg["output"], df.schema).alias("__o")
            coll = F.collect_list(F.struct(*keys, outv)).over(wf)
            if all(a == ascs[0] for a in ascs):
                arr = F.sort_array(coll, asc=ascs[0])
            else:
                # mixed directions (round 8): per-key comparator sort
                arr = F.array_sort(coll, _sortby_comparator(ascs))
            n = 1 if op in ("$top", "$bottom") else int(oparg["n"])
            if op in ("$bottom", "$bottomN"):
                picked = F.slice(
                    arr,
                    F.greatest(F.lit(1), F.size(arr) - F.lit(n) + 1),
                    F.lit(n),
                )
            else:
                picked = F.slice(arr, F.lit(1), F.lit(n))
            vals = F.transform(picked, lambda s: s["__o"])
            col = vals.getItem(0) if op in ("$top", "$bottom") else vals
        elif op == "$expMovingAvg":
            # EMA is a sequential recurrence (E_t = α·x_t + (1-α)·E_{t-1})
            # with no numerically stable closed form over Spark windows —
            # the one $setWindowFields operator that genuinely needs the
            # UDF path: Arrow-batched applyInPandas per partition key,
            # sorted in pandas, pandas ewm(adjust=False) = Mongo's exact
            # recurrence. Without partitionBy the chunk-carry
            # formulation parallelizes the single global sequence
            # (range chunks + geometric carry — _exp_moving_avg_chunked).
            alpha = oparg.get("alpha")
            if alpha is None:
                n_param = oparg.get("N")
                if not n_param:
                    raise PipelineCompileError("$expMovingAvg needs N or alpha")
                alpha = 2.0 / (int(n_param) + 1)
            if not order_cols:
                raise PipelineCompileError("$expMovingAvg requires sortBy")
            df = _exp_moving_avg(
                df, part_cols, sort_spec, compile_expr(oparg["input"], df.schema),
                float(alpha), name,
            )
            continue
        else:
            raise PipelineCompileError(f"unsupported window operator: {op}")
        df = df.withColumn(name, col)
    return df


def _exp_moving_avg(
    df: DataFrame,
    part_cols: list[Column],
    sort_spec: Mapping[str, Any],
    inp: Column,
    alpha: float,
    out_name: str,
) -> DataFrame:
    """EMA recurrence via applyInPandas per partition key.

    The recurrence E_t = α·x_t + (1-α)·E_{t-1} is sequential in sort
    order, so each ``partitionBy`` key runs as one sequential pandas
    group — parallel ACROSS keys, which is the right shape when keys
    are plentiful (collecting per-key carry state, as the chunked path
    does, would not scale to millions of keys). WITHOUT ``partitionBy``
    the chunk-carry formulation (``_exp_moving_avg_chunked``) takes
    over instead of degenerating to a single sequential task."""
    from pyspark.sql import types as _T

    if out_name in df.columns:
        df = df.drop(out_name)
    if not part_cols:
        # the one-sequential-task shape is gone: the unpartitioned case
        # runs the chunk-carry formulation (parallel chunk-local EMA +
        # geometric carry combine) instead of a single pandas group
        return _exp_moving_avg_chunked(df, sort_spec, inp, alpha, out_name)
    orig_cols = list(df.columns)
    work = df.withColumn(
        "__ema_part", part_cols[0] if part_cols else F.lit(0)
    ).withColumn("__ema_in", inp.cast("double"))
    sort_fields = list(sort_spec.items())
    for i, (fld, _d) in enumerate(sort_fields):
        work = work.withColumn(f"__ema_s{i}", compile_expr(f"${fld}", df.schema))
    schema = _T.StructType(
        list(work.schema.fields) + [_T.StructField(out_name, _T.DoubleType())]
    )
    s_names = [f"__ema_s{i}" for i in range(len(sort_fields))]
    ascending = [d in (1, True) for _f, d in sort_fields]

    def ema(pdf):
        pdf = pdf.sort_values(s_names, ascending=ascending, kind="mergesort")
        pdf[out_name] = pdf["__ema_in"].ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
        return pdf

    out = work.groupBy("__ema_part").applyInPandas(ema, schema=schema)
    return out.select(*orig_cols, out_name)


def _exp_moving_avg_chunked(
    df: DataFrame,
    sort_spec: Mapping[str, Any],
    inp: Column,
    alpha: float,
    out_name: str,
) -> DataFrame:
    """Global (unpartitioned) EMA without the single-sequential-task
    bound: a two-pass chunk-carry formulation.

    Range-partition the rows by the sort key into P chunks (equal sort
    keys never split). Pass 1 computes, per chunk, the CLOSING state of
    a chunk-local adjust=False EMA (one parallel scan). The driver then
    folds the P closing states into the carry entering each chunk —
    P scalar ops, the only sequential work left. Pass 2 recomputes the
    chunk-local series and corrects it with the carry:

        E_t = (E'_t − (1-α)^{p_t}·x_first) + (1-α)^{p_t}·C

    where E'_t is the chunk-local pandas ``ewm(adjust=False)`` series
    (whose first non-null input x_first got FULL weight — the
    subtraction strips that and re-weights it α, turning E'_t into the
    pure in-chunk contribution), p_t counts non-null inputs up to t in
    the chunk, and C is the EMA carried in from all previous chunks
    (first chunk: E_t = E'_t verbatim). ignore_na/Mongo semantics hold:
    null inputs emit the running EMA and don't decay it (p_t doesn't
    advance), and rows before any value are null.

    Cost: one range shuffle + two Arrow-batched scans + a P-row collect
    — wall clock is bounded by the largest chunk, not the dataset.
    Chunk boundaries only affect float rounding (≤ ulps), not values.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as _T

    if out_name in df.columns:
        df = df.drop(out_name)
    orig_cols = list(df.columns)
    work = df.withColumn("__ema_in", inp.cast("double"))
    sort_fields = list(sort_spec.items())
    for i, (fld, _d) in enumerate(sort_fields):
        work = work.withColumn(f"__ema_s{i}", compile_expr(f"${fld}", df.schema))
    scols = [
        F.col(f"__ema_s{i}").asc() if d in (1, True) else F.col(f"__ema_s{i}").desc()
        for i, (_f, d) in enumerate(sort_fields)
    ]
    n_chunks = max(2, work.sparkSession.sparkContext.defaultParallelism)
    # eager localCheckpoint, not persist: the chunk ids must be
    # computed exactly once (both downstream passes read them), and the
    # blocks are reclaimed when the result is released instead of
    # pinning the cache for the session
    chunked = (
        work.repartitionByRange(n_chunks, *scols)
        .sortWithinPartitions(*scols)
        .withColumn("__ema_chunk", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    beta = 1.0 - alpha

    def _fold_batches(it):
        """Chunk-local EMA state folded across the partition's Arrow
        batches: yields (batch_pdf, e_series, p_series, chunk_id) with
        state (last EMA, non-null count, first value) carried over."""
        e0, cnt, x_first, chunk_id = None, 0, None, None
        for pdf in it:
            x = pdf["__ema_in"]
            if chunk_id is None and len(pdf):
                chunk_id = int(pdf["__ema_chunk"].iloc[0])
            # continue the recurrence from e0 by prepending it as a
            # pseudo-row (full weight == "initial state"), then dropping
            seed = [] if e0 is None else [e0]
            series = pd.concat(
                [pd.Series(seed, dtype="float64"), x], ignore_index=True
            ).ewm(alpha=alpha, adjust=False, ignore_na=True).mean()[len(seed):]
            series.index = x.index
            p = x.notna().cumsum() + cnt
            if x.notna().any():
                if x_first is None:
                    x_first = float(x.dropna().iloc[0])
                last = series.dropna()
                e0 = float(last.iloc[-1]) if len(last) else e0
                cnt = int(p.iloc[-1])
            yield pdf, series, p, chunk_id

    def stats(it):
        e0, cnt, x_first, chunk_id = None, 0, None, None
        for pdf, series, p, cid in _fold_batches(it):
            chunk_id = cid
            if pdf["__ema_in"].notna().any():
                if x_first is None:
                    x_first = float(pdf["__ema_in"].dropna().iloc[0])
                e0 = float(series.dropna().iloc[-1])
                cnt = int(p.iloc[-1])
        if chunk_id is not None:
            yield pd.DataFrame(
                {
                    "chunk": [chunk_id],
                    "cnt": [cnt],
                    "e_end": [np.nan if e0 is None else e0],
                    "x_first": [np.nan if x_first is None else x_first],
                }
            )

    per_chunk = chunked.mapInPandas(
        stats, "chunk int, cnt long, e_end double, x_first double"
    ).collect()
    carries: dict[int, float | None] = {}
    carry: float | None = None
    for r in sorted(per_chunk, key=lambda r: r["chunk"]):
        carries[r["chunk"]] = carry
        if r["cnt"] > 0:
            if carry is None:
                carry = r["e_end"]
            else:
                decay = beta ** r["cnt"]
                carry = (r["e_end"] - decay * r["x_first"]) + decay * carry

    schema = _T.StructType(
        list(chunked.schema.fields) + [_T.StructField(out_name, _T.DoubleType())]
    )

    def correct(it):
        x_first = None
        for pdf, series, p, chunk_id in _fold_batches(it):
            x = pdf["__ema_in"]
            if x_first is None and x.notna().any():
                x_first = float(x.dropna().iloc[0])
            c = carries.get(chunk_id) if chunk_id is not None else None
            if c is None:
                pdf[out_name] = series
            else:
                decay = np.power(beta, p.to_numpy(dtype="float64"))
                local = series.to_numpy(dtype="float64") - decay * (
                    x_first if x_first is not None else 0.0
                )
                pdf[out_name] = np.where(
                    p.to_numpy() > 0, local + decay * c, c
                )
            yield pdf

    out = chunked.mapInPandas(correct, schema=schema)
    return out.select(*orig_cols, out_name)


def _numeric_sort_expr(sort_spec: Any, unit: str | None, df: DataFrame):
    """The single ascending sortBy field as a numeric Column (epoch
    millis when a time unit applies) + the unit's millis factor — shared
    by $linearFill/$derivative/$integral and range windows."""
    _UNIT_MS = {
        "millisecond": 1, "second": 1_000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000,
    }
    if not isinstance(sort_spec, Mapping) or len(sort_spec) != 1:
        raise PipelineCompileError("this window operator requires sortBy on exactly one field")
    (sfield, sdir), = sort_spec.items()
    if sdir not in (1, True):
        raise PipelineCompileError("this window operator requires ascending sortBy")
    s = compile_expr(f"${sfield}", df.schema)
    from pyspark.sql import types as _T

    sdt = df.schema[sfield].dataType if sfield in df.columns else None
    if unit is not None:
        if unit not in _UNIT_MS:
            raise PipelineCompileError(f"unsupported unit {unit!r} (calendar units are irregular)")
        return F.unix_millis(s.cast("timestamp")).cast("double"), _UNIT_MS[unit]
    if isinstance(sdt, (_T.TimestampType, _T.DateType)):
        return F.unix_millis(s.cast("timestamp")).cast("double"), None
    return s.cast("double"), None


_DENSIFY_UNITS = {
    "millisecond": "millisecond",
    "second": "second",
    "minute": "minute",
    "hour": "hour",
    "day": "day",
    "week": "day",  # Spark intervals have no week unit; step ×7 below
    "month": "month",
    "quarter": "month",  # step ×3 below
    "year": "year",
}

# multiplier folded into the step for units Spark intervals lack
# ("interval {step} 7 day" is a ParseException, not a 7-day unit)
_DENSIFY_STEP_MULT = {"week": 7, "quarter": 3}


def _densify(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """$densify: add documents at `step` intervals of `field` where
    values are missing. Scaffold plan: per-partition (or global) bounds →
    `sequence()` + explode generates the step points distributed, an
    anti-join drops points that already exist, and a union puts the
    generated rows (all other columns null) alongside the originals.
    No driver-side loops — the scaffold is tiny (bounds per group), the
    anti-join/union shuffle on the densify keys only.

    bounds: "full" (global [min,max]), "partition" (per-partition
    [min,max]), or [lower, upper) literals as in Mongo."""
    field = arg["field"]
    if "." in field:
        raise PipelineCompileError("$densify on nested paths not supported")
    rng = arg.get("range") or {}
    step = rng.get("step")
    bounds = rng.get("bounds")
    unit = rng.get("unit")
    parts = list(arg.get("partitionByFields", []))
    if step is None or bounds is None:
        raise PipelineCompileError("$densify requires range.step and range.bounds")
    if unit is not None and unit not in _DENSIFY_UNITS:
        raise PipelineCompileError(f"unsupported $densify unit: {unit!r}")

    fcol = F.col(field)
    part_cols = [F.col(p) for p in parts]

    if isinstance(bounds, str) and bounds == "full":
        mm = df.agg(F.min(fcol).alias("__lo"), F.max(fcol).alias("__hi"))
        base = (
            df.select(*part_cols).distinct().crossJoin(F.broadcast(mm))
            if parts
            else mm
        )
        half_open = False
    elif isinstance(bounds, str) and bounds == "partition":
        if not parts:
            raise PipelineCompileError('$densify bounds "partition" needs partitionByFields')
        base = df.groupBy(*part_cols).agg(F.min(fcol).alias("__lo"), F.max(fcol).alias("__hi"))
        half_open = False
    elif isinstance(bounds, (list, tuple)) and len(bounds) == 2:
        lo, hi = bounds
        sel = df.select(*part_cols).distinct() if parts else df.limit(1).select(F.lit(1).alias("__one"))
        base = sel.select(
            *part_cols, F.lit(lo).alias("__lo"), F.lit(hi).alias("__hi")
        )
        half_open = True  # Mongo array bounds are [lower, upper)
    else:
        raise PipelineCompileError(f"invalid $densify bounds: {bounds!r}")

    if unit:
        mult = _DENSIFY_STEP_MULT.get(unit, 1)
        interval = F.expr(f"interval {int(step) * mult} {_DENSIFY_UNITS[unit]}")
        pts = F.sequence(F.col("__lo"), F.col("__hi"), interval)
    else:
        pts = F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
    scaffold = base.select(*parts, F.explode(pts).alias(field))
    if half_open:
        scaffold = scaffold.where(F.col(field) < F.lit(bounds[1]))
    existing = df.select(*parts, field).distinct()
    new_rows = scaffold.join(existing, on=parts + [field], how="left_anti")
    return df.unionByName(new_rows, allowMissingColumns=True)


def _fill(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """$fill: fill null values per `output` spec — {value: expr} constant
    fill, {method: "locf"} last-observation-carried-forward (window
    last(ignorenulls)), {method: "linear"} linear interpolation between
    the surrounding non-null observations (two window passes; leading/
    trailing nulls stay null, as in Mongo). All native window functions —
    one shuffle on partitionBy."""
    from pyspark.sql import Window

    partition = arg.get("partitionBy")
    parts = (
        [compile_expr(partition, df.schema)]
        if partition is not None
        else [F.col(p) for p in arg.get("partitionByFields", [])]
    )
    sort_spec = arg.get("sortBy", {})
    order_cols = parse_sort_keys(sort_spec) if sort_spec else []
    output = arg.get("output", {})
    methods = [
        spec["method"]
        for spec in output.values()
        if isinstance(spec, Mapping) and "method" in spec
    ]
    if methods and not order_cols:
        raise PipelineCompileError("$fill with method requires sortBy")

    back = Window.partitionBy(*parts).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy(*parts).orderBy(*order_cols).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    for name, spec in output.items():
        if not isinstance(spec, Mapping) or len(spec) != 1:
            raise PipelineCompileError(f"$fill output {name!r} must be {{value}} or {{method}}")
        col = F.col(name)
        if "value" in spec:
            df = df.withColumn(
                name, F.coalesce(col, compile_expr(spec["value"], df.schema))
            )
            continue
        method = spec["method"]
        if method == "locf":
            df = df.withColumn(name, F.last(col, ignorenulls=True).over(back))
        elif method == "linear":
            if len(sort_spec) != 1:
                raise PipelineCompileError("$fill linear requires a single sortBy field")
            (sfield, sdir), = sort_spec.items()
            if sdir not in (1, True):
                raise PipelineCompileError("$fill linear requires ascending sortBy")
            s = F.col(sfield).cast("double")
            known_s = F.when(col.isNotNull(), s)
            prev_v = F.last(col, ignorenulls=True).over(back).cast("double")
            prev_s = F.last(known_s, ignorenulls=True).over(back)
            next_v = F.first(col, ignorenulls=True).over(fwd).cast("double")
            next_s = F.first(known_s, ignorenulls=True).over(fwd)
            interp = prev_v + (next_v - prev_v) * (s - prev_s) / (next_s - prev_s)
            df = df.withColumn(
                name,
                F.when(col.isNotNull(), col.cast("double")).otherwise(interp),
            )
        else:
            raise PipelineCompileError(f"unsupported $fill method: {method!r}")
    return df


def _bucket_scalar_sql(v: Any) -> str | None:
    """SQL literal text for a $bucket boundary/default, or None when the
    value doesn't render to the same literal the ``F.lit`` form builds
    (callers then keep the per-boundary Column path). int → INT/BIGINT
    exactly as py4j widens, finite float → double via shortest-repr,
    str → escaped single-quoted literal."""
    import math

    if isinstance(v, bool):
        return None
    if isinstance(v, int):
        return str(v) if -(2**63) <= v < 2**63 else None
    if isinstance(v, float):
        return repr(v) + "D" if math.isfinite(v) else None
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    return None


def _bucket(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """$bucket: explicit boundaries → CASE-chain bucket key + group.
    Documents outside the boundaries go to `default` (error if absent,
    as in Mongo)."""
    group_by = compile_expr(arg["groupBy"], df.schema)
    bounds = list(arg["boundaries"])
    if len(bounds) < 2:
        raise PipelineCompileError("$bucket requires at least 2 boundaries")
    default = arg.get("default")
    lits = [_bucket_scalar_sql(b) for b in bounds]
    d_lit = _bucket_scalar_sql(default) if default is not None else None
    if all(s is not None for s in lits) and (default is None or d_lit):
        # whole CASE chain as ONE parsed expression over the
        # materialized `__bsrc` key (round 14, guide §1: the chained
        # F.when loop paid several round trips per boundary) — the
        # parsed tree matches the chained form branch for branch
        g = "`__bsrc`"
        whens = " ".join(
            f"WHEN ({g} >= {lo} AND {g} < {hi}) THEN {lo}"
            for lo, hi in zip(lits, lits[1:])
        )
        els = d_lit if d_lit is not None else (
            f"raise_error(concat('$bucket: value ',"
            f" coalesce(CAST({g} AS STRING), 'null'),"
            f" ' outside boundaries and no default specified'))"
        )
        df = df.withColumn("__bsrc", group_by)
        bucket = F.expr(f"CASE {whens} ELSE {els} END")
    else:
        bucket = None
        for lo, hi in zip(bounds, bounds[1:]):
            cond = (group_by >= F.lit(lo)) & (group_by < F.lit(hi))
            bucket = (
                F.when(cond, F.lit(lo))
                if bucket is None
                else bucket.when(cond, F.lit(lo))
            )
        if default is not None:
            bucket = bucket.otherwise(F.lit(default))
        else:
            # Mongo errors when a document falls outside the boundaries
            # and no default is given; raise lazily per-row (no extra
            # job, fires distributed at execution time)
            bucket = bucket.otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("$bucket: value "),
                        F.coalesce(group_by.cast("string"), F.lit("null")),
                        F.lit(" outside boundaries and no default specified"),
                    )
                )
            )
    out_spec = arg.get("output", {"count": {"$sum": 1}})
    out = df.withColumn("__bucket", bucket).drop("__bsrc")
    # $bucket groups are few and HUGE by construction — N-accumulators
    # in `output` must take the bounded prefilter (bucket key = group
    # key), never the whole-bucket collect form
    out, aggs = _compile_group_aggs(out, out_spec, [F.col("__bucket")])
    return (
        out.groupBy(F.col("__bucket").alias("_id"))
        .agg(*aggs)
        .orderBy(F.col("_id").asc_nulls_first())
    )


# Above this row count, $bucketAuto switches from the exact global-ntile
# plan (single-partition sort window — fine for histogram-sized inputs,
# a straggler at raw-table scale) to approx-quantile boundaries
# (distributed sketch, one pass, no global sort).
_BUCKET_AUTO_EXACT_MAX_ROWS = 2_000_000

# Mongo $bucketAuto granularity preferred-number series (values per
# decade; boundaries snap to member × 10^k). E48/E96/E192 omitted —
# they raise rather than approximate.
_R40 = [1.0, 1.06, 1.12, 1.18, 1.25, 1.32, 1.4, 1.5, 1.6, 1.7, 1.8,
        1.9, 2.0, 2.12, 2.24, 2.36, 2.5, 2.65, 2.8, 3.0, 3.15, 3.35,
        3.55, 3.75, 4.0, 4.25, 4.5, 4.75, 5.0, 5.3, 5.6, 6.0, 6.3,
        6.7, 7.1, 7.5, 8.0, 8.5, 9.0, 9.5]
_R80 = sorted(_R40 + [1.03, 1.09, 1.15, 1.22, 1.28, 1.36, 1.45, 1.55,
                      1.65, 1.75, 1.85, 1.95, 2.06, 2.18, 2.3, 2.43,
                      2.58, 2.72, 2.9, 3.07, 3.25, 3.45, 3.65, 3.87,
                      4.12, 4.37, 4.62, 4.87, 5.15, 5.45, 5.8, 6.15,
                      6.5, 6.9, 7.3, 7.75, 8.25, 8.75, 9.25, 9.75])
_GRANULARITY_SERIES = {
    "R5": [1.0, 1.6, 2.5, 4.0, 6.3],
    "R10": [1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0],
    "R20": [1.0, 1.12, 1.25, 1.4, 1.6, 1.8, 2.0, 2.24, 2.5, 2.8,
            3.15, 3.55, 4.0, 4.5, 5.0, 5.6, 6.3, 7.1, 8.0, 9.0],
    "R40": _R40,
    "R80": _R80,
    "1-2-5": [1.0, 2.0, 5.0],
    "E6": [1.0, 1.5, 2.2, 3.3, 4.7, 6.8],
    "E12": [1.0, 1.2, 1.5, 1.8, 2.2, 2.7, 3.3, 3.9, 4.7, 5.6, 6.8, 8.2],
    "E24": [1.0, 1.1, 1.2, 1.3, 1.5, 1.6, 1.8, 2.0, 2.2, 2.4, 2.7,
            3.0, 3.3, 3.6, 3.9, 4.3, 4.7, 5.1, 5.6, 6.2, 6.8, 7.5,
            8.2, 9.1],
}


def _snap_series(x: float, granularity: str, up: bool) -> float:
    """Round ``x`` to the preferred-number series: smallest series value
    ≥ x (up) or largest ≤ x (down). 0 stays 0; POWERSOF2 uses powers of
    two. Requires x ≥ 0 (Mongo restriction)."""
    import math as _m

    if x < 0:
        raise PipelineCompileError(
            "$bucketAuto granularity requires non-negative groupBy values"
        )
    if x == 0:
        return 0.0
    if granularity == "POWERSOF2":
        e = _m.log2(x)
        k = _m.ceil(e) if up else _m.floor(e)
        if up and 2.0 ** k < x:
            k += 1
        if not up and 2.0 ** k > x:
            k -= 1
        return float(2.0 ** k)
    series = _GRANULARITY_SERIES.get(granularity)
    if series is None:
        raise PipelineCompileError(
            f"unsupported $bucketAuto granularity: {granularity!r}"
        )
    decade = _m.floor(_m.log10(x))
    # search this decade and its neighbors (float-edge safety)
    candidates = [
        m * 10.0 ** k for k in (decade - 1, decade, decade + 1) for m in series
    ]
    eps = x * 1e-12
    if up:
        return min(c for c in candidates if c >= x - eps)
    return max(c for c in candidates if c <= x + eps)


def _bucket_index_col(bounds) -> Column:
    """Bucket index for ``__gb`` against sorted double boundaries —
    count of boundaries ≤ value — as ONE parsed expression (round 14,
    guide §1: the per-boundary ``F.lit`` + lambda form paid a py4j
    round trip per edge; the parsed tree is identical). Non-finite
    boundaries fall back to the per-element form."""
    from anser_spark.operators.similarity import float_array_lit, float_array_sql

    bsql = float_array_sql(bounds) if bounds else None
    if bsql is not None:
        return F.expr(
            f"aggregate({bsql}, 0, (acc, b) -> acc +"
            f" (CASE WHEN CAST(`__gb` AS DOUBLE) >= b THEN 1 ELSE 0 END))"
        )
    barr = float_array_lit(bounds) if bounds else F.array()
    if not bounds:
        return F.lit(0)
    return F.aggregate(
        barr, F.lit(0),
        lambda acc, b: acc
        + F.when(F.col("__gb").cast("double") >= b, 1).otherwise(0),
    )


def _bucket_auto(df: DataFrame, arg: Mapping[str, Any]) -> DataFrame:
    """$bucketAuto: equal-population buckets with min/max per bucket.

    Small inputs (≤ _BUCKET_AUTO_EXACT_MAX_ROWS): exact ntile over a
    global sort window — exactly even populations, SQL-oracle-able.
    Large inputs: percentile_approx boundaries (distributed t-digest-ish
    sketch; Mongo itself only 'attempts to evenly distribute'), then a
    scan-side bucket assignment — no single-partition sort anywhere.
    Duplicate quantile boundaries collapse (fewer buckets), as in Mongo.
    """
    from pyspark.sql import Window

    group_by = compile_expr(arg["groupBy"], df.schema)
    n = int(arg["buckets"])
    out_spec = arg.get("output", {"count": {"$sum": 1}})
    tagged = df.withColumn("__gb", group_by)

    granularity = arg.get("granularity")
    if granularity is not None:
        # Mongo granularity: equal-population raw boundaries snapped to
        # the preferred-number series — first edge rounds DOWN from the
        # min, every other edge (incl. the max) rounds UP; duplicate
        # snapped edges collapse. Bucket _ids are the SERIES edges, not
        # data min/max, and buckets are [lo, hi) with the last edge
        # covering the max.
        qs = [i / n for i in range(1, n)]
        stats = tagged.agg(
            F.min(F.col("__gb").cast("double")).alias("lo"),
            F.max(F.col("__gb").cast("double")).alias("hi"),
            F.percentile_approx(F.col("__gb").cast("double"), qs, 10_000).alias("bs"),
        ).first()
        if stats["lo"] is None:
            return tagged.limit(0).select(
                F.struct(
                    F.lit(None).cast("double").alias("min"),
                    F.lit(None).cast("double").alias("max"),
                ).alias("_id"),
                *[F.lit(None).alias(name) for name in out_spec],
            )
        edges = [_snap_series(float(stats["lo"]), granularity, up=False)]
        for b in list(stats["bs"] or []) + [float(stats["hi"])]:
            e = _snap_series(float(b), granularity, up=True)
            if e <= edges[-1]:
                continue
            edges.append(e)
        if edges[-1] <= float(stats["hi"]):  # max must fall INSIDE
            edges.append(_snap_series(float(stats["hi"]) * (1 + 1e-9),
                                      granularity, up=True))
        tiled = tagged.withColumn("__tile", _bucket_index_col(edges[1:-1]))
        from anser_spark.operators.similarity import float_array_lit

        lo_arr = float_array_lit(edges[:-1])
        hi_arr = float_array_lit(edges[1:])
        tiled, aggs = _compile_group_aggs(tiled, out_spec, [F.col("__tile")])
        return (
            tiled.groupBy("__tile")
            .agg(*aggs)
            .select(
                F.struct(
                    F.element_at(lo_arr, F.col("__tile") + 1).alias("min"),
                    F.element_at(hi_arr, F.col("__tile") + 1).alias("max"),
                ).alias("_id"),
                *[F.col(name) for name in out_spec],
            )
            .orderBy(F.col("_id.min"))
        )

    if tagged.count() <= _BUCKET_AUTO_EXACT_MAX_ROWS:
        tiled = tagged.withColumn(
            "__tile", F.ntile(n).over(Window.orderBy(F.col("__gb")))
        )
    else:
        qs = [i / n for i in range(1, n)]
        bounds = tagged.agg(
            F.percentile_approx(F.col("__gb").cast("double"), qs, 10_000)
        ).first()[0]
        distinct_bounds = sorted(set(b for b in bounds if b is not None))
        # bucket index = number of boundaries ≤ value (0..len(bounds))
        tiled = tagged.withColumn(
            "__tile", _bucket_index_col(distinct_bounds)
        )
    tiled, aggs = _compile_group_aggs(tiled, out_spec, [F.col("__tile")])
    return (
        tiled.groupBy("__tile")
        .agg(F.min("__gb").alias("__min"), F.max("__gb").alias("__max"), *aggs)
        .select(
            F.struct(F.col("__min").alias("min"), F.col("__max").alias("max")).alias("_id"),
            *[F.col(name) for name in out_spec],
        )
        .orderBy(F.col("_id.min"))
    )


# $facet packs each sub-pipeline's entire output into ONE row — Mongo
# caps that document at 16 MB and errors past it.  Two guards (round 9
# ADVICE refined the round-8 row-only cap):
#   - a BYTE cap at Mongo's 16 MB, measured as the summed to_json
#     octet length of the leg's documents (a close, cheap stand-in for
#     BSON size) — a few large documents now error like Mongo instead
#     of slipping under the row count;
#   - a ROW backstop whose limit(N+1) bounds the collect buffer BEFORE
#     it builds, so a runaway unaggregated leg raises cleanly instead
#     of OOMing one executor.  Mongo has no row limit, so legs of many
#     tiny documents that sum under 16 MB were wrongly rejected by the
#     round-8 cap — the backstop is now session-configurable via
#     ``spark.anser.facet.maxRowsPerLeg`` for pipelines that legally
#     carry >100k small facet documents.
_FACET_MAX_ROWS_PER_LEG = 100_000
_FACET_MAX_BYTES_PER_LEG = 16 * 1024 * 1024
_FACET_ROWS_CONF = "spark.anser.facet.maxRowsPerLeg"


def _facet(
    df: DataFrame,
    arg: Mapping[str, Any],
    resolve: Callable[[str], DataFrame] | None,
    sink: Callable[[str, DataFrame, Mapping[str, Any] | None], None] | None,
) -> DataFrame:
    """$facet: run sub-pipelines over the same input; one row whose
    fields are arrays of each sub-pipeline's documents. The input plan
    fans out to N branches — at scale callers should persist upstream if
    the branches are expensive.  Each leg is capped at Mongo's 16 MB
    (summed to_json bytes) with a ``spark.anser.facet.maxRowsPerLeg``
    row backstop that bounds the collect buffer before it builds: past
    either, the query errors cleanly, as Mongo does."""
    facets = []
    cap = _FACET_MAX_ROWS_PER_LEG
    try:
        cap = int(df.sparkSession.conf.get(_FACET_ROWS_CONF, str(cap)))
    except (ValueError, TypeError):
        pass
    byte_cap = _FACET_MAX_BYTES_PER_LEG
    for name, stages in arg.items():
        sub = compile_pipeline(df, stages, resolve, sink)
        doc = F.struct(*[F.col(c) for c in sub.columns])
        capped = sub.limit(cap + 1)
        packed = capped.agg(
            F.collect_list(doc).alias(name),
            F.count(F.lit(1)).alias("__n"),
            F.coalesce(
                F.sum(F.octet_length(F.to_json(doc))), F.lit(0)
            ).alias("__bytes"),
        ).select(
            F.when(
                F.col("__n") > cap,
                F.raise_error(F.lit(
                    f"$facet: sub-pipeline {name!r} produced more than "
                    f"{cap} documents — the facet output document would "
                    "exceed the engine row backstop (raise "
                    f"{_FACET_ROWS_CONF} if the leg legally sums under "
                    "16 MB); aggregate or $limit inside the facet"
                )),
            ).when(
                F.col("__bytes") > byte_cap,
                F.raise_error(F.lit(
                    f"$facet: sub-pipeline {name!r} output exceeds 16 MB "
                    "(Mongo's facet document limit, measured as summed "
                    "JSON bytes); aggregate or $limit inside the facet"
                )),
            ).otherwise(F.col(name)).alias(name)
        )
        facets.append(packed)
    out = facets[0]
    for other in facets[1:]:
        out = out.crossJoin(other)
    return out


class Aggregation:
    """Fluent wrapper mirroring the reference aggregationWrapper
    (db/wrapper.go:522-577): Hint is advisory; All/One/Iter execute."""

    def __init__(
        self,
        collection: Any,
        pipeline: Sequence[Mapping[str, Any]],
        collation: str | None = None,
    ) -> None:
        self._collection = collection
        self._pipeline = list(pipeline)
        self._hint: Any = None
        self._collation = collation  # Spark collation name (round 7)

    def hint(self, hint: Any) -> "Aggregation":
        self._hint = hint
        return self

    def _resolver(self) -> Callable[[str], DataFrame] | None:
        coll = self._collection
        if isinstance(coll, DataFrame):
            return None
        db = coll.engine.db(coll.db_name)

        def resolve(name: str) -> DataFrame:
            return db.collection(name).df()

        return resolve

    def _sink(self):
        coll = self._collection
        if isinstance(coll, DataFrame):
            return None
        db = coll.engine.db(coll.db_name)

        def sink(name: str, df: DataFrame, options: Mapping[str, Any] | None) -> None:
            """$out = full replace; $merge = MERGE by key with Mongo's
            whenMatched (replace | keepExisting | merge | fail) and
            whenNotMatched (insert | discard | fail) modes — one
            distributed plan, copy-on-write rewrite."""
            opts = dict(options or {})
            target_db = (
                coll.engine.db(opts["db"]) if opts.get("db") else db
            )
            target = target_db.collection(name)
            mode = opts.get("mode", "out")
            if mode == "out" or not target.exists():
                target._rewrite(df)
                return
            on = opts.get("on", "_id")
            on = list(on) if isinstance(on, (list, tuple)) else [on]
            when_matched = opts.get("whenMatched", "replace")
            when_not_matched = opts.get("whenNotMatched", "insert")
            base = target.df()
            matched_keys = base.select(on).join(df.select(on), on=on, how="inner")
            if when_matched == "fail" or when_not_matched == "fail":
                n_matched = matched_keys.count()
                if when_matched == "fail" and n_matched:
                    raise ValueError(f"$merge whenMatched=fail: {n_matched} matches")
                if when_not_matched == "fail":
                    n_new = df.join(base.select(on), on=on, how="left_anti").count()
                    if n_new:
                        raise ValueError(f"$merge whenNotMatched=fail: {n_new} unmatched")
            if when_matched == "replace":
                kept_base = base.join(df.select(on), on=on, how="left_anti")
                incoming_matched = df.join(base.select(on), on=on, how="left_semi")
            elif when_matched == "keepExisting":
                kept_base = base
                incoming_matched = df.limit(0)
            elif when_matched == "merge":
                # overlay incoming non-null fields onto the existing doc
                upd = df.select(
                    *[F.col(k) for k in on],
                    *[
                        F.col(c).alias(f"__new_{c}")
                        for c in df.columns
                        if c not in on
                    ],
                )
                overlaid = base.join(upd, on=on, how="inner")
                for c in df.columns:
                    if c in on:
                        continue
                    if c in base.columns:
                        overlaid = overlaid.withColumn(
                            c, F.coalesce(F.col(f"__new_{c}"), F.col(c))
                        )
                    else:
                        overlaid = overlaid.withColumn(c, F.col(f"__new_{c}"))
                overlaid = overlaid.drop(*[f"__new_{c}" for c in df.columns if c not in on])
                kept_base = base.join(df.select(on), on=on, how="left_anti").unionByName(
                    overlaid, allowMissingColumns=True
                )
                incoming_matched = df.limit(0)
            elif isinstance(when_matched, (list, tuple)):
                # whenMatched PIPELINE (Mongo): stages run against the
                # EXISTING doc with the incoming doc's `let` variables
                # bound (default let = {new: $$ROOT} ⇒ $$new); let
                # expressions are evaluated against the INCOMING doc
                # (CURRENT rebound to it, like Mongo). Restricted to
                # $set/$addFields/$unset/$replaceWith as in Mongo. One
                # joined plan, still a single rewrite.
                from pyspark.sql import types as _T

                upd = df.select(
                    *[F.col(c).alias(f"__new_{c}") for c in df.columns]
                )
                key_cond = functools_reduce_and(
                    [base[k].eqNullSafe(F.col(f"__new_{k}")) for k in on]
                )
                overlaid = base.join(upd, on=key_cond, how="inner")
                new_struct = F.struct(
                    *[F.col(f"__new_{c}").alias(c) for c in df.columns]
                )
                let_spec = opts.get("let") or {"new": "$$ROOT"}
                new_type = _T.StructType(list(df.schema.fields))
                let_env = {"CURRENT": new_struct, "CURRENT_TYPE": new_type,
                           "ROOT": new_struct}
                env = {
                    vname: compile_expr(vexpr, overlaid.schema, let_env)
                    for vname, vexpr in let_spec.items()
                }
                for st in when_matched:
                    sop, sarg = next(iter(st.items()))
                    if sop in ("$set", "$addFields"):
                        for fname, fexpr in sarg.items():
                            overlaid = overlaid.withColumn(
                                fname,
                                compile_expr(fexpr, overlaid.schema, dict(env)),
                            )
                    elif sop == "$unset":
                        names = [sarg] if isinstance(sarg, str) else list(sarg)
                        overlaid = overlaid.drop(*[n for n in names if n in overlaid.columns])
                    elif sop in ("$replaceRoot", "$replaceWith"):
                        root_expr = sarg["newRoot"] if sop == "$replaceRoot" else sarg
                        col = compile_expr(root_expr, overlaid.schema, dict(env))
                        overlaid = overlaid.select(col.alias("__root")).select("__root.*")
                    else:
                        raise PipelineCompileError(
                            f"$merge whenMatched pipeline does not allow {sop}"
                        )
                overlaid = overlaid.drop(
                    *[f"__new_{c}" for c in df.columns if f"__new_{c}" in overlaid.columns]
                )
                kept_base = base.join(df.select(on), on=on, how="left_anti").unionByName(
                    overlaid, allowMissingColumns=True
                )
                incoming_matched = df.limit(0)
            else:
                raise PipelineCompileError(f"unsupported whenMatched mode: {when_matched}")
            incoming_new = (
                df.join(base.select(on), on=on, how="left_anti")
                if when_not_matched == "insert"
                else df.limit(0)
            )
            merged = kept_base.unionByName(
                incoming_matched, allowMissingColumns=True
            ).unionByName(incoming_new, allowMissingColumns=True)
            target._rewrite(merged)

        return sink

    def to_df(self) -> DataFrame:
        from anser_spark.functions.collation import use_collation

        base = (
            self._collection
            if isinstance(self._collection, DataFrame)
            else self._collection.df()
        )
        with use_collation(self._collation):
            return compile_pipeline(
                base, self._pipeline, self._resolver(), self._sink()
            )

    def all(self) -> list[dict[str, Any]]:
        return [r.asDict(recursive=True) for r in self.to_df().collect()]

    def one(self) -> dict[str, Any]:
        from anser_spark.engine import NotFoundError

        rows = self.to_df().take(1)
        if not rows:
            raise NotFoundError("aggregation returned no documents")
        return rows[0].asDict(recursive=True)

    def iter(self) -> Iterator[dict[str, Any]]:
        for row in self.to_df().toLocalIterator():
            yield row.asDict(recursive=True)

    def explain(self, verbosity: str = "queryPlanner") -> dict:
        """Mongo-shaped explain document (plans/query.explain_doc);
        Spark explain modes print the raw plan instead, as before."""
        if verbosity in ("formatted", "extended", "codegen", "cost", "simple"):
            self.to_df().explain(verbosity)
            return {}
        from anser_spark.plans.query import explain_doc

        ns = (
            str(self._collection.namespace)
            if hasattr(self._collection, "namespace")
            else "<dataframe>"
        )
        return explain_doc(self.to_df(), ns, verbosity)
