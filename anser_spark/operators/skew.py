"""Skew-handling join utilities for 100 TB-scale keys.

AQE's skew-join splitting (enabled in session defaults) handles most
cases at runtime; explicit salting remains the tool when one side has a
handful of pathological hot keys AND the other side is too big to
broadcast. ``salted_join`` replicates the small side R times and sprays
the big side's hot rows across R sub-keys — turning one straggler task
into R even ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "top_keys"]


def top_keys(df: DataFrame, key: str, n: int = 20) -> list:
    """The n heaviest keys (one aggregation — run on a sample at scale)."""
    rows = df.groupBy(key).count().orderBy(F.col("count").desc()).limit(n).collect()
    return [r[key] for r in rows]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``salt`` sub-keys.

    big:   gets a random salt in [0, salt) per row.
    small: replicated ``salt`` times (explode of a literal range —
           bounded, never a shuffle of the big side beyond the join's own).
    The join key becomes (on, salt), so one hot key's rows land in
    ``salt`` different tasks instead of one straggler.
    """
    big_salted = big.withColumn("__salt", (F.rand() * salt).cast("int"))
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_rep, on=[on, "__salt"], how=how)
    return out.drop("__salt")
