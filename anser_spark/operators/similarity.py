"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side dot
product (zip_with + aggregate), then TakeOrdered(k). No Python, no
shuffle beyond the top-k reduction; at 100 TB this is the bandwidth-bound
floor and the correctness oracle for the ANN path.

Scale path: random-hyperplane LSH — each vector gets a b-bit signature
(sign of dot with b fixed random hyperplanes); candidates share a
signature (or a signature band). Turns all-pairs O(n²) into a bucketed
join; recall tunes with bands/bits.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot_col",
    "norm_col",
    "float_array_lit",
    "float_array_sql",
    "sql_ident",
    "with_norm",
    "cosine_top_k",
    "random_hyperplanes",
    "lsh_bucket_candidates",
    "embedding_near_dup_pairs",
]


def float_array_sql(values) -> str | None:
    """SQL text of a constant ``array<double>`` literal, or None when it
    can't be rendered (empty, or non-finite values — SQL has no inf/nan
    double literals). ``repr()`` of a finite Python float round-trips
    bit-exactly through the SQL parser's double parsing (shortest-repr
    IEEE-754 property, verified incl. -0.0/denormals/DBL_MAX)."""
    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return "array(" + ",".join(repr(v) + "D" for v in vals) + ")"
    return None


def float_array_lit(values) -> Column:
    """A constant ``array<double>`` literal built in ONE expression-
    construction call. ``F.array(*[F.lit(x) ...])`` costs a py4j round
    trip per element — at embedding dimensions (64–768) and per-centroid
    literals this was the dominant QUERY-CONSTRUCTION cost of the vector
    paths (guide §1: measured 2.06s → 0.28s for 10×512 elements);
    non-finite values fall back to the per-element form."""
    sql = float_array_sql(values)
    if sql is not None:
        return F.expr(sql)
    return F.array(*[F.lit(float(v)) for v in values])


def sql_ident(name: str) -> str:
    """Backtick-quote a (possibly dotted) column path for SQL snippets."""
    return ".".join(
        "`" + seg.replace("`", "``") + "`" for seg in name.split(".")
    )


def dot_col(a: Column | str, b: Column | str) -> Column:
    # accumulate in double regardless of element type (float32 embeddings).
    # str operands are SQL snippets: building the lambda form below costs
    # ~13 py4j round trips (~40ms) per construct; one F.expr is a single
    # round trip with the SAME expression tree (round 14, guide §1 —
    # measured 0.44s → 0.005s per 10 constructs), which matters because
    # the vector paths construct dozens of these per query
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
            f"CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
        )
    if isinstance(a, str):
        a = F.expr(a)
    if isinstance(b, str):
        b = F.expr(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(
            f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + "
            f"CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
        )
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, norm_col(F.col(vec_col)))


def cosine_top_k(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query is folded into the plan as an array literal; Catalyst
    executes scan → project(cosine) → TakeOrderedAndProject(k): the
    optimal single-pass plan (per-partition top-k, then driver merge of
    k·numPartitions rows — never a global sort).
    """
    vsql = sql_ident(vec_col)
    qlit = float_array_sql(query) or float_array_lit(query)
    qnorm = math.sqrt(sum(x * x for x in query)) or 1.0
    cos = dot_col(vsql, qlit) / (norm_col(vsql) * F.lit(qnorm))
    return (
        df.select(F.col(id_col), F.round(cos, round_to).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def random_hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-less random hyperplanes (stdlib RNG; no numpy
    needed at plan-build time)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def _signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Pack sign(v·h_i) bits into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_lit = float_array_lit(plane)
        bit = F.when(dot_col(vec, plane_lit) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def _signature_arrow(
    df: DataFrame,
    dim: int,
    vec_col: str,
    id_col: str,
    bits: int,
    seed: int,
) -> DataFrame:
    """Arrow-batched hyperplane signatures: one numpy matmul per batch
    (``n × dim @ dim × bits``) instead of ``bits`` separate JVM
    dot-product aggregates per row.

    Round-3 bake-off at sf0.1 (64 bits): ~0.65s vs ~3.2s steady-state
    for the full near-dup query — matmul beats per-element expression
    trees by ~5× here. Same hyperplanes (seeded), same >= 0 sign rule;
    float64 accumulation order differs from the sequential JVM fold, so
    a dot product within ~1e-15 of zero could flip a bit — candidates
    are verified with exact cosine downstream either way."""
    import numpy as np
    import pandas as pd

    planes = np.array(random_hyperplanes(dim, bits, seed), dtype=np.float64)
    id_type = dict(df.dtypes)[id_col]

    def batches(it):
        for pdf in it:
            m = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (m @ planes.T) >= 0
            sig = np.zeros(len(pdf), dtype=np.uint64)
            for i in range(bits):
                sig |= signs[:, i].astype(np.uint64) << np.uint64(i)
            yield pd.DataFrame({id_col: pdf[id_col], "__sig": sig.view(np.int64)})

    return df.select(id_col, vec_col).mapInPandas(
        batches, f"{id_col} {id_type}, __sig long"
    )


def lsh_bucket_candidates(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    method: str = "arrow",
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing any LSH signature band.

    bits/bands tune recall vs candidate volume: more bands → higher
    recall, more candidates. One explode(bands) + one shuffle on
    (band, band-bits) — the all-pairs join never materializes.
    ``method``: 'arrow' (numpy matmul signatures, bake-off winner) or
    'column' (pure JVM expressions)."""
    rows = bits // bands
    if method == "arrow":
        sig = _signature_arrow(df, dim, vec_col, id_col, bits, seed)
    else:
        planes = random_hyperplanes(dim, bits, seed)
        sig = df.select(
            F.col(id_col), _signature_col(F.col(vec_col), planes).alias("__sig")
        )
    mask = (1 << rows) - 1

    banded = (
        sig.select(
            id_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned(F.col("__sig"), b * rows)
                            .bitwiseAND(F.lit(mask))
                            .alias("bval"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select(id_col, "bk.band", "bk.bval")
        # both sides of the self-join read this — eager localCheckpoint
        # computes the 64 dot products per vector once, stores the
        # result (spillable), and releases it with the frame instead of
        # pinning the cache for the session
        .localCheckpoint(eager=True)
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bval") == F.col("b.bval"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def cosine_similarity_join(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """EXACT all-pairs similarity join (id_a < id_b, cosine ≥ threshold).

    O(n²) — the correctness oracle for the LSH path and the right tool
    for bounded subsets (a candidate bucket, one partition key's worth).
    Callers at scale must pre-filter/bucket the input.

    Each row's norm is computed ONCE in the per-row projection (round
    14, guide §1.2 per-task work): inlining ``norm_col`` in the cosine
    expression re-ran both norm aggregates per PAIR inside the O(n²)
    join condition — n² extra array folds for n values. Same
    expression, same fold order, same multiply/divide sequence, so the
    cosine doubles are bit-identical."""
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        norm_col(sql_ident(vec_col)).alias("__norm_a"),
    )
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        norm_col(sql_ident(vec_col)).alias("__norm_b"),
    )
    return (
        va.join(vb, va["id_a"] < vb["id_b"])
        .withColumn(
            "cosine",
            dot_col("__va", "__vb")
            / (F.col("__norm_a") * F.col("__norm_b")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", round_to).alias("cosine"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH candidates verified
    with exact cosine ≥ threshold. Returns (id_a, id_b, cosine).

    Norms ride the per-row vector projections (round 14): computed once
    per document instead of once per candidate pair — bit-identical
    cosine (same fold, same op order), strictly less work."""
    cand = lsh_bucket_candidates(df, dim, vec_col, id_col, bits, bands, seed)
    vecs = df.select(F.col(id_col), F.col(vec_col))
    va = vecs.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        norm_col(sql_ident(vec_col)).alias("__norm_a"),
    )
    vb = vecs.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        norm_col(sql_ident(vec_col)).alias("__norm_b"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine",
            dot_col("__va", "__vb")
            / (F.col("__norm_a") * F.col("__norm_b")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
