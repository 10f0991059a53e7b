"""Mongo collation → Spark ICU collation bridge (round 7).

The reference forwards collation documents opaquely to the server
(reference db/wrapper.go options pass-through); with no server the
comparison semantics must be produced here.  Spark 4 ships ICU collation
support natively (``expr COLLATE en_CI`` / ``F.collate``), so the common
Mongo collations map to real JVM-side collated comparisons — no UDFs,
whole-stage codegen intact:

    {'locale': 'simple'}            → binary (UTF8_BINARY, the default)
    {'locale': L}                   → L            (tertiary strength,
                                                    Mongo's default 3)
    {'locale': L, 'strength': 2}    → L_CI         (case-insensitive)
    {'locale': L, 'strength': 1}    → L_CI_AI      (case- and
                                                    accent-insensitive)

Strength 4/5 collapse to tertiary (identical to Mongo for all-text
comparisons — the extra levels only split punctuation/identical-rank
ties).  Non-default ``caseLevel``, ``caseFirst``, ``numericOrdering``,
``alternate`` or ``backwards`` raise: correct-by-rejection rather than
silently returning differently-ordered results.

Where collation applies (matching Mongo):
    - find/$match string comparisons: implicit equality, ``$eq $ne $gt
      $gte $lt $lte $in $nin $all`` against string-typed fields;
    - string ARRAY elements (round 8): the implicit contains-equality,
      ``$in``/``$all``/range ops over ``array<string>`` fields, and
      ``$elemMatch`` element comparisons, all collate per element;
    - sort keys over string-typed fields (find ``sort()`` and pipeline
      ``$sort``), via :func:`parse_sort_keys`'s ``schema`` parameter.
Documented divergences (COVERAGE.md): ``$regex`` stays binary (Mongo
also ignores collation for regex unless the index provides it).

Scale note: a collated comparison cannot push down to parquet footers
(no collated min/max) — identical to Mongo, where a collation-less
index cannot serve a collated query.  The filter still runs JVM-side in
whole-stage codegen.
"""

from __future__ import annotations

import contextlib
from collections.abc import Mapping
from contextvars import ContextVar
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "spark_collation_name",
    "use_collation",
    "active_collation",
    "collate_if_string",
]

# Options Mongo defines with their default values — any non-default
# value for an option we cannot express raises.
_DEFAULTS = {
    "caseLevel": False,
    "caseFirst": "off",
    "numericOrdering": False,
    "alternate": "non-ignorable",
    "maxVariable": None,   # only meaningful with alternate=shifted
    "backwards": False,
    "normalization": False,  # ICU normalizes internally; accept both
}


# Mongo locales are BCP-47 (alpha-2 regions: en_US, pt_BR); Spark's ICU
# collation names use ISO-3166 ALPHA-3 (en_USA, pt_BRA). Common regions
# mapped below; an unknown region falls back to the base language — the
# documented approximation (regional tailorings rarely change ordering
# for the text this engine compares).
_REGION_A2_TO_A3 = {
    "US": "USA", "GB": "GBR", "CA": "CAN", "AU": "AUS", "NZ": "NZL",
    "IN": "IND", "BR": "BRA", "PT": "PRT", "DE": "DEU", "AT": "AUT",
    "CH": "CHE", "FR": "FRA", "BE": "BEL", "MX": "MEX", "ES": "ESP",
    "AR": "ARG", "SA": "SAU", "CN": "CHN", "TW": "TWN", "HK": "HKG",
    "JP": "JPN", "KR": "KOR", "RU": "RUS", "ZA": "ZAF", "NL": "NLD",
    "IT": "ITA", "SE": "SWE", "NO": "NOR", "DK": "DNK", "FI": "FIN",
    "PL": "POL", "TR": "TUR",
}


_SUPPORTED: frozenset[str] | None = None


def _supported_collations() -> frozenset[str] | None:
    """Names Spark's CollationFactory actually accepts, read once from
    the active session's ``collations()`` TVF.  None when no session is
    active yet (pure name construction still works; Spark raises its
    own COLLATION_INVALID_NAME at analysis if the guess was wrong)."""
    global _SUPPORTED
    if _SUPPORTED is not None:
        return _SUPPORTED
    from pyspark.errors import PySparkException
    from pyspark.sql import SparkSession

    try:
        spark = SparkSession.getActiveSession()
        if spark is None:
            return None
        _SUPPORTED = frozenset(
            r["NAME"] for r in spark.sql("SELECT NAME FROM collations()").collect()
        )
    except PySparkException:  # TVF absent on older runtimes → no
        return None           # validation; Spark raises its own
    return _SUPPORTED         # COLLATION_INVALID_NAME at analysis


def _spark_locale(locale: str) -> str:
    """Normalize a Mongo BCP-47 locale to a Spark ICU collation base
    name: 'en' → 'en'; 'en_US'/'en-US' → 'en_USA' when Spark supports
    that regional tailoring; script subtags, unknown regions, and
    regions Spark's ICU build has no separate tailoring for drop to
    the base language (documented approximation — regional tailorings
    rarely change ordering)."""
    parts = locale.replace("-", "_").split("_")
    base = parts[0]
    if len(parts) >= 2:
        region = parts[1]
        cand = None
        if region.upper() in _REGION_A2_TO_A3 and region.isupper():
            cand = f"{base}_{_REGION_A2_TO_A3[region]}"
        elif len(region) == 3 and region.isupper():
            cand = f"{base}_{region}"  # already alpha-3
        if cand is not None:
            supported = _supported_collations()
            if supported is None or cand in supported:
                return cand
        # script subtag (Hans/Hant/Latn/...), unknown or untailored
        # region → base language
    return base


def spark_collation_name(spec: Mapping[str, Any] | None) -> str | None:
    """Translate a Mongo collation document to a Spark collation name,
    or ``None`` for binary comparison.  Raises ``ValueError`` for
    options whose semantics Spark's ICU collations cannot reproduce."""
    if not spec:
        return None
    unknown = set(spec) - ({"locale", "strength"} | set(_DEFAULTS))
    if unknown:
        raise ValueError(f"unsupported collation options: {sorted(unknown)}")
    for opt, default in _DEFAULTS.items():
        if opt in spec and spec[opt] != default and not (
            opt == "normalization"  # ICU always normalizes — superset, accept
        ):
            raise ValueError(
                f"unsupported collation option {opt}={spec[opt]!r} "
                "(only the default is expressible)"
            )
    locale = spec.get("locale")
    if not locale or not isinstance(locale, str):
        raise ValueError("collation requires a 'locale' string")
    if locale == "simple":
        if spec.get("strength", 3) not in (3, 4, 5):
            raise ValueError(
                "locale 'simple' is binary comparison; strength "
                f"{spec['strength']} is not expressible — use a real locale"
            )
        return None
    strength = spec.get("strength", 3)
    base = _spark_locale(locale)
    if strength == 1:
        return f"{base}_CI_AI"
    if strength == 2:
        return f"{base}_CI"
    if strength in (3, 4, 5):
        return base
    raise ValueError(f"collation strength must be 1-5, got {strength!r}")


_ACTIVE: ContextVar[str | None] = ContextVar("anser_collation", default=None)


def active_collation() -> str | None:
    return _ACTIVE.get()


@contextlib.contextmanager
def use_collation(name: str | None):
    """Scope an active Spark collation over a compile (filter + sort
    construction happens inside; execution is unaffected — the collation
    is baked into the emitted Column expressions)."""
    token = _ACTIVE.set(name)
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def collate_if_string(col: Column, dt: T.DataType | None) -> Column:
    """Wrap ``col`` in the active collation when the field is
    string-typed (``F.collate`` analyzes only over strings)."""
    name = _ACTIVE.get()
    if name is None or not isinstance(dt, T.StringType):
        return col
    return F.collate(col, name)


def collate_expr_if_string(df, col: Column) -> tuple[Column, bool]:
    """Like :func:`collate_if_string` for a computed expression whose
    type isn't statically known: analyze the expression against ``df``
    and wrap when it is a string.  Returns ``(column, wrapped)`` — a
    wrapped GROUPING key's output should be normalized back with
    :func:`decollate` so the collation does not leak into downstream
    schemas (implicit-collation mismatches)."""
    name = _ACTIVE.get()
    if name is None:
        return col, False
    dt = df.select(col.alias("__collate_probe")).schema[0].dataType
    if not isinstance(dt, T.StringType):
        return col, False
    return F.collate(col, name), True


def decollate(col: Column) -> Column:
    """Strip a non-default collation from a string column (back to the
    binary default) so result schemas stay collation-free."""
    return F.collate(col, "UTF8_BINARY")
