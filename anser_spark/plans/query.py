"""Fluent lazy query — the reference's queryWrapper semantics
(db/wrapper.go:373-520): `Find(q)` accumulates (filter, projection,
sort, limit, skip, hint) with no I/O; execution happens at an action
(`all/one/iter/count`). That deferred-execution shape is exactly Spark's:
`to_df()` compiles the accumulated state to a DataFrame and Catalyst
plans it (filter/projection reach the Parquet scan as pushed
filters/pruned columns — verified in tests via explain()).
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from anser_spark.functions.filters import compile_filter, extract_text_spec, resolve_field
from anser_spark.functions.sort import parse_sort_keys

__all__ = ["Query"]

# skip() beyond this depth warns and points at seek() — offset still
# produces and discards every skipped row, keyset pagination doesn't
_DEEP_SKIP_WARN = 100_000


def explain_doc(df: DataFrame, namespace: str, verbosity: str = "queryPlanner") -> dict:
    """Mongo-shaped explain document built from Spark's EXECUTED plan
    (post-Catalyst, post-AQE-initial): the `winningPlan` chain maps
    physical nodes to Mongo-style stage names, `scans` surfaces what
    actually reached Parquet (pushed filters + pruned read schema —
    the evidence that predicate/projection pushdown happened),
    `joins`/`exchanges` expose the physical join strategies and the
    shuffle count. ``verbosity="executionStats"`` additionally runs
    the plan once and reports ``nReturned`` (the Mongo field name).
    The raw Spark plan rides along as ``sparkPlan``."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()

    # longest/most-specific markers first — matching is startswith, so
    # "SortMergeJoin" must be tried before "Sort"
    _STAGE_MAP = [
        ("TakeOrderedAndProject", "SORT_LIMIT"),
        ("CollectLimit", "LIMIT"),
        ("GlobalLimit", "LIMIT"),
        ("LocalLimit", "LIMIT"),
        ("SortMergeJoin", "JOIN_SORT_MERGE"),
        ("SortAggregate", "GROUP"),
        ("Sort", "SORT"),
        ("HashAggregate", "GROUP"),
        ("ObjectHashAggregate", "GROUP"),
        ("BroadcastHashJoin", "JOIN_BROADCAST_HASH"),
        ("ShuffledHashJoin", "JOIN_SHUFFLED_HASH"),
        ("BroadcastNestedLoopJoin", "JOIN_NESTED_LOOP"),
        ("CartesianProduct", "JOIN_NESTED_LOOP"),
        ("Window", "WINDOW"),
        ("Generate", "UNWIND"),
        ("Filter", "FILTER"),
        ("Project", "PROJECTION"),
        ("Exchange", "SHUFFLE"),
        ("FileScan parquet", "SCAN_PARQUET"),
        ("Scan parquet", "SCAN_PARQUET"),
    ]

    stages: list[str] = []
    joins: list[str] = []
    scans: list[dict] = []
    exchanges = 0
    for raw_line in plan.splitlines():
        # strip tree-drawing prefix and the *(n) codegen-stage marker so
        # node names anchor at the start ("Filter ..." matches FILTER;
        # "DataFilters: [...]" inside a scan line does not)
        line = re.sub(r"^[\s+:\-]*(?:\*\(\d+\)\s*)?", "", raw_line)
        for marker, stage in _STAGE_MAP:
            if line.startswith(marker):
                if not stages or stages[-1] != stage:
                    stages.append(stage)
                if stage.startswith("JOIN"):
                    joins.append(stage)
                if stage == "SHUFFLE":
                    exchanges += 1
                if stage == "SCAN_PARQUET":
                    scan: dict = {}
                    m = re.search(r"PushedFilters: \[([^\]]*)\]", line)
                    if m:
                        scan["pushedFilters"] = [
                            f.strip() for f in m.group(1).split(",") if f.strip()
                        ]
                    m = re.search(r"ReadSchema: (\S+)", line)
                    if m:
                        scan["readSchema"] = m.group(1)
                    scans.append(scan)
                break

    # winningPlan: Mongo's nested inputStage chain, outermost first
    winning: dict | None = None
    for stage in stages:
        node = {"stage": stage}
        if winning is None:
            winning = node
        else:
            tail = winning
            while "inputStage" in tail:
                tail = tail["inputStage"]
            tail["inputStage"] = node

    out = {
        "queryPlanner": {
            "namespace": namespace,
            "winningPlan": winning or {"stage": "EOF"},
            "scans": scans,
            "joins": joins,
            "shuffles": exchanges,
            # codegen stages print as *(n) prefixes in this format
            "wholeStageCodegen": bool(re.search(r"\*\(\d+\)", plan))
            or "WholeStageCodegen" in plan,
        },
        "sparkPlan": plan,
    }
    if verbosity == "executionStats":
        out["executionStats"] = {"nReturned": df.count()}
    return out


class Query:
    """Lazy find() query over a Collection (or raw DataFrame)."""

    def __init__(self, collection: Any, query: Mapping[str, Any] | None = None) -> None:
        self._collection = collection
        self._filter = query
        self._projection: Mapping[str, Any] | None = None
        self._sort: Sequence[str] | None = None
        self._limit: int | None = None
        self._skip: int | None = None
        self._seek: dict[str, Any] | None = None
        self._hint: Any = None
        self._collation: str | None = None

    # -- fluent builders (db/wrapper.go:385-389) -----------------------
    def select(self, projection: Mapping[str, Any]) -> "Query":
        """Mongo projection doc: {f:1,...} inclusion (keeps _id unless
        `_id: 0`), {f:0,...} exclusion (reference db/wrapper.go:386)."""
        self._projection = projection
        return self

    def sort(self, *keys: str) -> "Query":
        """`-`/`+`-prefixed keys per the reference getSort
        (db/wrapper.go:620-638)."""
        self._sort = keys
        return self

    def limit(self, n: int) -> "Query":
        self._limit = n
        return self

    def skip(self, n: int) -> "Query":
        """OFFSET-style skip. Fine at pagination depths humans use; at
        deep offsets every skipped row is still produced and discarded
        (true in Mongo too). Past _DEEP_SKIP_WARN a warning points at
        ``seek()`` — the keyset form whose predicate pushes down to the
        scan instead."""
        if n and n > _DEEP_SKIP_WARN:
            import logging

            logging.getLogger(__name__).warning(
                "skip(%d) is deep paging: every skipped row is still "
                "produced and discarded. Use .seek(last_doc) keyset "
                "pagination instead — its predicate pushes down to the "
                "scan.", n,
            )
        self._skip = n
        return self

    def seek(self, last: Mapping[str, Any]) -> "Query":
        """Keyset (seek-style) pagination — the deep-paging alternative
        to ``skip``: pass the LAST document of the previous page (or
        just its sort-key fields); compiles to a lexicographic
        strictly-after predicate over the sort keys, which Catalyst
        pushes to the parquet scan (footer min/max pruning) — page N
        costs the same as page 1, vs ``offset``'s produce-and-discard.

        Requires a ``sort()`` whose keys form a TOTAL order (include a
        unique tiebreak key, e.g. ``_id``) — the same requirement every
        keyset-pagination scheme has. Null sort-key values follow the
        engine's sort order (nulls first on ascending, last on
        descending)."""
        self._seek = dict(last)
        return self

    def hint(self, hint: Any) -> "Query":
        """Index hints are advisory only — Catalyst plans (SURVEY.md §2.3)."""
        self._hint = hint
        return self

    def collation(self, spec: Mapping[str, Any] | None) -> "Query":
        """Collation (round 7: REAL, via Spark's native ICU collations):
        ``{'locale': L}`` (tertiary), ``strength: 2`` (case-insensitive,
        ``L_CI``) and ``strength: 1`` (case+accent-insensitive,
        ``L_CI_AI``) apply to string filter comparisons and string sort
        keys — JVM-side collated comparison, no UDFs.  Options ICU
        cannot express (caseFirst, numericOrdering, ...) raise instead
        of silently returning differently-ordered results
        (functions/collation.py)."""
        from anser_spark.functions.collation import spark_collation_name

        self._collation = spark_collation_name(spec)
        return self

    # -- compilation ---------------------------------------------------
    def _base_df(self) -> DataFrame:
        if isinstance(self._collection, DataFrame):
            return self._collection
        return self._collection.df()

    def _wants_text_score(self) -> bool:
        """True when this query actually CONSUMES the ``$text``
        relevance — a ``{"$meta": "textScore"}`` projection value or
        sort key. The scan path's BM25 literals cost a full corpus
        stats aggregate at build time (round 14, guide §1.2: don't
        compute things you throw away); when the score is never read,
        the match predicate alone answers the query."""
        for key in self._sort or []:
            if isinstance(key, Mapping):
                for v in key.values():
                    if isinstance(v, Mapping) and v.get("$meta") == "textScore":
                        return True
        for v in (self._projection or {}).values():
            if isinstance(v, Mapping) and v.get("$meta") == "textScore":
                return True
        return False

    def _text_filtered(self, df: DataFrame) -> tuple[DataFrame, bool]:
        """Apply the filter, handling a top-level legacy ``$text``
        clause: matching docs are kept and the BM25 relevance lands in
        the hidden ``__textScore`` column for ``{"$meta": "textScore"}``
        projections/sorts. Returns (frame, had_text)."""
        spec, residual = extract_text_spec(self._filter)
        if spec is None:
            return df.where(compile_filter(self._filter, df.schema)), False
        text_col, stats_loader, language = None, None, "none"
        coll = self._collection
        if not isinstance(coll, DataFrame) and hasattr(coll, "_text_index_info"):
            if hasattr(coll, "_weighted_bm25_for"):
                # round 11: a weighted multi-field index governs this
                # $text — postings path (field-tagged table, one
                # pushed-down lookup over all fields) when fresh, scan
                # path with per-field index stats otherwise; a STALE
                # weighted index keeps the fields/language intent with
                # inline per-field stats (the single-field contract)
                weighted = coll._weighted_bm25_for(df)
                if weighted is not None:
                    from anser_spark.operators.ranking import (
                        text_match_weighted_frame,
                        text_match_weighted_postings,
                    )

                    d, fresh = weighted
                    out = (
                        text_match_weighted_postings(
                            df, spec, d, score_col="__textScore"
                        )
                        if fresh else None
                    )
                    if out is None:
                        pred, score = text_match_weighted_frame(
                            df, spec, d["weights"],
                            d.get("default_language", "none"),
                            stats_loader=(
                                coll._weighted_stats_loader(d)
                                if fresh else None
                            ),
                            need_score=self._wants_text_score(),
                        )
                        out = df.withColumn(
                            "__textScore", score.cast("double")
                        ).where(pred)
                    if residual:
                        out = out.where(compile_filter(residual, out.schema))
                    return out, True
            # round 9: a fresh postings-bearing bm25 index answers the
            # whole $text clause from the inverted index (point lookup
            # + bounded join — no corpus scan); ineligible shapes fall
            # through to the scan path below
            if hasattr(coll, "_fresh_bm25_index"):
                d = coll._fresh_bm25_index(df)
                if d is not None and d.get("postings_dir"):
                    from anser_spark.operators.ranking import (
                        text_match_postings,
                    )

                    out = text_match_postings(
                        df, spec, d, score_col="__textScore"
                    )
                    if out is not None:
                        if residual:
                            out = out.where(
                                compile_filter(residual, out.schema)
                            )
                        return out, True
            text_col, stats_loader, language = coll._text_index_info(df)
        if text_col is None:
            if "text" not in df.columns:
                raise ValueError(
                    "$text needs a bm25 search index or a column named "
                    "'text' on the collection"
                )
            text_col = "text"
        from anser_spark.operators.ranking import _TOKS_FOLD, _TOKS_RAW, text_match_frame

        pred, score, df = text_match_frame(
            df, spec, text_col, stats_loader, default_language=language,
            need_score=self._wants_text_score(),
        )
        df = df.withColumn("__textScore", score.cast("double")).where(
            F.coalesce(pred, F.lit(False))
        )
        df = df.drop(_TOKS_RAW, _TOKS_FOLD)
        if residual:
            df = df.where(compile_filter(residual, df.schema))
        return df, True

    def _sort_cols(self, schema: Any = None) -> list[Column]:
        order: list[Column] = []
        for key in self._sort or []:
            if isinstance(key, Mapping):
                for name, v in key.items():
                    if isinstance(v, Mapping) and v.get("$meta") == "textScore":
                        # Mongo $meta sort: descending relevance
                        order.append(F.col("__textScore").desc())
                    else:
                        order.extend(parse_sort_keys({name: v}, schema))
            else:
                order.extend(parse_sort_keys(key, schema))
        return order

    def _seek_pairs(self) -> list[tuple[str, bool]]:
        pairs: list[tuple[str, bool]] = []
        flat: list[Any] = []
        for key in self._sort or []:
            # sort() accepts both sort("a", "-b") and sort(["a", "-b"])
            if isinstance(key, (list, tuple)):
                flat.extend(key)
            else:
                flat.append(key)
        for key in flat:
            if isinstance(key, Mapping):
                for name, v in key.items():
                    if isinstance(v, Mapping):
                        # a $meta (relevance) sort key cannot carry a
                        # keyset value — silently paging by the other
                        # keys would skip/repeat rows
                        raise ValueError(
                            "seek() cannot page a $meta-sorted query: "
                            "relevance scores are not stable seek keys"
                        )
                    # mirror parse_sort_keys: any numeric < 0 is
                    # descending (floats arrive from JSON/JS sort docs)
                    pairs.append(
                        (str(name), not (isinstance(v, (int, float)) and v < 0))
                    )
            else:
                k = str(key)
                if not k or k.lstrip("-+") == "$natural":
                    continue
                if k.startswith("-"):
                    pairs.append((k[1:], False))
                else:
                    pairs.append((k.lstrip("+"), True))
        return pairs

    def _seek_predicate(self, schema) -> Column:
        """Lexicographic strictly-after predicate over the sort keys:
        OR over key positions i of (keys[:i] null-safe-equal last) AND
        (keys[i] strictly after last[i] in its sort direction).

        Under an active collation (round 8) string sort keys compare
        COLLATED — both the strict-after comparison and the tie-prefix
        equality — so pages follow the same total order the sort uses.
        The collated predicate cannot prune parquet footers (binary
        min/max), the same trade Mongo makes when no collated index
        exists; the filter still runs JVM-side in codegen."""
        from anser_spark.functions.collation import collate_if_string
        from anser_spark.functions.filters import field_type

        assert self._seek is not None
        pairs = self._seek_pairs()
        if not pairs:
            raise ValueError("seek() requires a sort() with at least one key")
        missing = [n for n, _ in pairs if n not in self._seek]
        if missing:
            raise ValueError(
                f"seek() document is missing sort-key fields {missing}"
            )
        pred = F.lit(False)
        eq_prefix = F.lit(True)
        for name, asc in pairs:
            col = collate_if_string(
                resolve_field(name), field_type(schema, name)
            )
            v = self._seek[name]
            if v is None:
                # asc: nulls first → everything non-null comes after;
                # desc: nulls last → nothing comes after a null
                strict = col.isNotNull() if asc else F.lit(False)
            elif asc:
                strict = col > F.lit(v)
            else:
                # desc sorts nulls last → they come after any value
                strict = (col < F.lit(v)) | col.isNull()
            pred = pred | (eq_prefix & strict)
            eq_prefix = eq_prefix & col.eqNullSafe(F.lit(v))
        return pred

    def to_df(self) -> DataFrame:
        """Compile to a DataFrame. Order of application mirrors server
        execution: filter → seek → sort → skip → limit → projection."""
        from anser_spark.functions.collation import use_collation

        with use_collation(self._collation):
            return self._to_df_collated()

    def _to_df_collated(self) -> DataFrame:
        df, had_text = self._text_filtered(self._base_df())
        if self._seek is not None:
            df = df.where(self._seek_predicate(df.schema))
        order = self._sort_cols(df.schema)
        if order:
            df = df.orderBy(*order)
        if self._skip:
            df = df.offset(self._skip)
        if self._limit is not None and self._limit > 0:
            df = df.limit(self._limit)
        if self._projection:
            df = _apply_projection(df, self._projection)
        if had_text and "__textScore" in df.columns:
            df = df.drop("__textScore")  # hidden unless meta-projected
        return df

    # -- actions (db/wrapper.go:452-520) -------------------------------
    def all(self) -> list[dict[str, Any]]:
        return [r.asDict(recursive=True) for r in self.to_df().collect()]

    def one(self) -> dict[str, Any]:
        """First match; NotFoundError when none (reference
        ResolveCursorOne, db/wrapper.go:579-597)."""
        from anser_spark.engine import NotFoundError

        # take(1) applies the limit without mutating the builder: a later
        # .all()/.count() on this Query must not inherit limit=1
        rows = self.to_df().take(1)
        if not rows:
            raise NotFoundError(f"no document matches {self._filter!r}")
        return rows[0].asDict(recursive=True)

    def iter(self) -> Iterator[dict[str, Any]]:
        """Cursor-style iteration — edges only; engine internals stay
        DataFrame-shaped (SURVEY.md §1.2)."""
        for row in self.to_df().toLocalIterator():
            yield row.asDict(recursive=True)

    def count(self) -> int:
        from anser_spark.functions.collation import use_collation

        with use_collation(self._collation):
            return self._count_collated()

    def _count_collated(self) -> int:
        if self._seek is not None and self._collation is not None:
            raise ValueError(
                "seek() keyset pagination under a non-simple collation is "
                "not supported (see to_df)"
            )
        df, _had_text = self._text_filtered(self._base_df())
        if self._seek is not None:
            df = df.where(self._seek_predicate())
        if self._skip:
            df = df.offset(self._skip)
        if self._limit is not None and self._limit > 0:
            df = df.limit(self._limit)
        return df.count()

    def explain(self, verbosity: str = "queryPlanner") -> dict:
        """Mongo-shaped explain document (see ``explain_doc``). Pass a
        Spark explain mode ("formatted"/"extended"/"codegen"/"cost"/
        "simple") to print the raw Spark plan instead, as before."""
        if verbosity in ("formatted", "extended", "codegen", "cost", "simple"):
            self.to_df().explain(verbosity)
            return {}
        ns = (
            str(self._collection.namespace)
            if hasattr(self._collection, "namespace")
            else "<dataframe>"
        )
        return explain_doc(self.to_df(), ns, verbosity)


def _proj_op_col(df: DataFrame, name: str, spec: Mapping[str, Any]) -> Column:
    """Mongo projection OPERATORS on an array field: ``$slice`` (first/
    last n, or [skip, limit] incl. negative skip-from-end) and
    ``$elemMatch`` (array of just the FIRST element matching a query
    doc, null when none — Mongo omits the field)."""
    from anser_spark.functions.filters import _element_predicate, field_type

    col = resolve_field(name)
    if "$slice" in spec:
        arg = spec["$slice"]
        sz = F.size(col)
        if isinstance(arg, (list, tuple)):
            skip, limit = int(arg[0]), int(arg[1])
            if limit <= 0:
                raise ValueError("$slice limit must be positive")
            start = (
                F.lit(skip + 1) if skip >= 0
                else F.greatest(F.lit(1), sz + F.lit(skip + 1))
            )
            return F.slice(col, start, F.lit(limit)).alias(name)
        n = int(arg)
        if n >= 0:
            return F.slice(col, 1, n).alias(name)
        start = F.greatest(F.lit(1), sz + F.lit(n + 1))
        return F.slice(col, start, F.lit(-n)).alias(name)
    cond = spec["$elemMatch"]
    dt = field_type(df.schema, name)
    elem_dt = dt.elementType if isinstance(dt, T.ArrayType) else None
    matched = F.filter(
        col,
        lambda e: F.coalesce(
            _element_predicate(e, cond, elem_dt), F.lit(False)
        ),
    )
    return F.when(F.size(matched) > 0, F.slice(matched, 1, 1)).alias(name)


def _apply_projection(df: DataFrame, projection: Mapping[str, Any]) -> DataFrame:
    ops: dict[str, Mapping[str, Any]] = {}
    metas: dict[str, Mapping[str, Any]] = {}
    incl: dict[str, Any] = {}
    excl: set[str] = set()
    for k, v in projection.items():
        if k.endswith(".$"):
            raise ValueError(
                "the positional '.$' projection is not supported — use "
                "{field: {'$elemMatch': ...}} instead"
            )
        if isinstance(v, Mapping):
            if v.get("$meta") == "textScore":
                metas[k] = v
            elif "$slice" in v or "$elemMatch" in v:
                ops[k] = v
            else:
                raise ValueError(f"unsupported projection spec for {k!r}: {v!r}")
        elif v in (0, False):
            excl.add(k)
        else:
            incl[k] = v
    if incl and excl - {"_id"}:
        raise ValueError("cannot mix inclusion and exclusion projections (except _id)")

    def _plain(name: str) -> Column:
        if "." in name:
            return resolve_field(name).alias(name.replace(".", "_"))
        return F.col(name)

    # Mongo quirk: $slice WITHOUT any plain inclusion keeps ALL other
    # fields (minus exclusions); $elemMatch and plain inclusions use
    # ordinary inclusion semantics
    elem_ops = {k for k, v in ops.items() if "$elemMatch" in v}
    if incl or metas or elem_ops:
        names = list(dict.fromkeys([*incl, *metas, *ops]))
        if "_id" in df.columns and "_id" not in excl and "_id" not in names:
            names.insert(0, "_id")
        cols: list[Column] = []
        for name in names:
            if name in metas:
                cols.append(F.col("__textScore").alias(name))
            elif name in ops:
                cols.append(_proj_op_col(df, name, ops[name]))
            else:
                cols.append(_plain(name))
        return df.select(*cols)
    if ops:  # $slice-only: every column, sliced fields replaced
        cols = [
            _proj_op_col(df, c, ops[c]) if c in ops else F.col(c)
            for c in df.columns
            if c not in excl
        ]
        return df.select(*cols)
    if excl:
        return df.drop(*[c for c in excl if c in df.columns])
    return df
