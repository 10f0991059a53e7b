"""Sort-key string parser — port of the reference's ``getSort`` semantics
(reference db/wrapper.go:620-638): string keys with ``-``/``+`` prefix map
to per-key descending/ascending order; empty/invalid keys are skipped.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import types as T

from anser_spark.functions.filters import field_type, resolve_field

__all__ = ["parse_sort_keys"]


def parse_sort_keys(
    keys: Sequence[str] | Mapping[str, int] | str | None,
    schema: T.StructType | None = None,
) -> list[Column]:
    """``("-a", "b")`` ⇒ [a DESC, b ASC]; also accepts a Mongo sort doc
    ``{"a": -1, "b": 1}`` (pipeline ``$sort`` form).

    Mongo sorts nulls first on ascending, last on descending; mirror that
    explicitly so results are deterministic across engines.

    When a collation is active (find ``collation()`` / aggregate
    option) and ``schema`` is provided, string-typed sort keys order by
    the ICU collation instead of binary — pass the frame's schema from
    call sites that honor collation.
    """
    from anser_spark.functions.collation import active_collation, collate_if_string

    def _field(name: str) -> Column:
        col = resolve_field(name)
        if schema is not None and active_collation() is not None:
            col = collate_if_string(col, field_type(schema, name))
        return col

    if keys is None:
        return []
    if isinstance(keys, str):
        keys = [keys]
    out: list[Column] = []
    if isinstance(keys, Mapping):
        for name, direction in keys.items():
            if name == "$natural":
                # Mongo natural order = storage order, which carries no
                # semantic guarantee; here scan order plays that role,
                # so ±$natural compiles to no sort key (documented
                # divergence: -1 does not reverse the scan)
                continue
            if isinstance(direction, Mapping) and direction.get("$meta") in (
                "textScore", "searchScore", "vectorSearchScore"
            ):
                # Mongo $meta sort: descending by the relevance column
                # the most recent $text/$search stage materialized
                from anser_spark.functions.expressions import active_score_field

                out.append(resolve_field(active_score_field()).desc_nulls_last())
                continue
            col = _field(name)
            out.append(col.desc_nulls_last() if direction < 0 else col.asc_nulls_first())
        return out
    for key in keys:
        if not key:
            continue
        if key.lstrip("-+") == "$natural":
            continue  # storage order — no sort key (see Mapping branch)
        if key.startswith("-"):
            name = key[1:]
            if not name:
                continue
            out.append(_field(name).desc_nulls_last())
        else:
            if key.startswith("+"):
                key = key[1:]
            if not key:
                continue
            out.append(_field(key).asc_nulls_first())
    return out
