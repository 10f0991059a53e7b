"""Fluent lazy query — the reference's queryWrapper semantics
(db/wrapper.go:373-520): `Find(q)` accumulates (filter, projection,
sort, limit, skip, hint) with no I/O; execution happens at an action
(`all/one/iter/count`). That deferred-execution shape is exactly Spark's:
`to_df()` compiles the accumulated state to a DataFrame and Catalyst
plans it (filter/projection reach the Parquet scan as pushed
filters/pruned columns — verified in tests via explain()).
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anser_spark.functions.filters import compile_filter, resolve_field
from anser_spark.functions.sort import parse_sort_keys

__all__ = ["Query"]


class Query:
    """Lazy find() query over a Collection (or raw DataFrame)."""

    def __init__(self, collection: Any, query: Mapping[str, Any] | None = None) -> None:
        self._collection = collection
        self._filter = query
        self._projection: Mapping[str, Any] | None = None
        self._sort: Sequence[str] | None = None
        self._limit: int | None = None
        self._skip: int | None = None
        self._hint: Any = None

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
        self._skip = n
        return self

    def hint(self, hint: Any) -> "Query":
        """Index hints are advisory only — Catalyst plans (SURVEY.md §2.3)."""
        self._hint = hint
        return self

    # -- compilation ---------------------------------------------------
    def _base_df(self) -> DataFrame:
        if isinstance(self._collection, DataFrame):
            return self._collection
        return self._collection.df()

    def to_df(self) -> DataFrame:
        """Compile to a DataFrame. Order of application mirrors server
        execution: filter → sort → skip → limit → projection."""
        df = self._base_df()
        pred = compile_filter(self._filter, df.schema)
        df = df.where(pred)
        order = parse_sort_keys(self._sort)
        if order:
            df = df.orderBy(*order)
        if self._skip:
            df = df.offset(self._skip)
        if self._limit is not None and self._limit > 0:
            df = df.limit(self._limit)
        if self._projection:
            df = _apply_projection(df, self._projection)
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
        df = self._base_df()
        df = df.where(compile_filter(self._filter, df.schema))
        if self._skip:
            df = df.offset(self._skip)
        if self._limit is not None and self._limit > 0:
            df = df.limit(self._limit)
        return df.count()

    def explain(self, mode: str = "formatted") -> None:
        self.to_df().explain(mode)


def _apply_projection(df: DataFrame, projection: Mapping[str, Any]) -> DataFrame:
    incl = {k: v for k, v in projection.items() if v not in (0, False)}
    excl = {k for k, v in projection.items() if v in (0, False)}
    if incl and excl - {"_id"}:
        raise ValueError("cannot mix inclusion and exclusion projections (except _id)")
    if incl:
        names = list(incl)
        if "_id" in df.columns and "_id" not in excl and "_id" not in names:
            names.insert(0, "_id")
        cols: list[Column] = []
        for name in names:
            if "." in name:
                cols.append(resolve_field(name).alias(name.replace(".", "_")))
            else:
                cols.append(F.col(name))
        return df.select(*cols)
    if excl:
        return df.drop(*[c for c in excl if c in df.columns])
    return df
