"""IVF (inverted-file) approximate nearest neighbor — the
coarse-quantizer scale path for similarity search, complementing the
hyperplane-LSH variant in operators/similarity.

Shape (classic IVF-Flat):
  1. train: k-means centroids over a sample (pyspark.ml KMeans — runs
     distributed; the sample bound keeps training cheap at 100 TB).
  2. index: one pass assigning every vector to its nearest centroid
     (JVM-side expression over a broadcast centroid literal array) —
     written out partitioned by centroid id, so a probe reads only
     matching partitions.
  3. query: score the query against centroids (driver-side, k is small),
     pick nprobe nearest lists, brute-force ONLY those lists with the
     exact cosine kernel from operators/similarity.

Recall/latency tunes with (k, nprobe); nprobe=k degrades to exact
brute force.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anser_spark.operators.similarity import dot_col, norm_col

__all__ = ["IVFIndex", "ivf_train", "ivf_assign", "ivf_top_k"]


@dataclass
class IVFIndex:
    centroids: list[list[float]]  # k x dim
    vec_col: str
    id_col: str


def ivf_train(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    seed: int = 42,
    max_iter: int = 10,
) -> IVFIndex:
    """Train centroids with distributed k-means (pyspark.ml).

    ``sample_fraction`` bounds training cost at scale (centroid quality
    needs only a sample); None trains on everything.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df
    if sample_fraction:
        train = df.sample(fraction=sample_fraction, seed=seed)
    train = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(train)
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return IVFIndex(centroids=centroids, vec_col=vec_col, id_col=id_col)


def _nearest_centroid_col(vec, centroids: list[list[float]]):
    """Index of the nearest centroid (euclidean) as a pure expression.

    Each centroid's distance appears exactly ONCE, in an array; argmin is
    array_position of the min. (A chained when(best_dist < d, ...) fold
    embeds the previous best-distance tree twice per step — exponential
    expression growth that stalls Catalyst beyond k≈10.)"""
    dists = F.array(*[_sq_dist(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sq_dist(vec, centroid: list[float]):
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, clit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(df: DataFrame, index: IVFIndex, out: str = "centroid_id") -> DataFrame:
    """One scan: tag every vector with its inverted-list id. Persist or
    write partitioned by ``out`` so probes prune lists at the source."""
    return df.withColumn(out, _nearest_centroid_col(F.col(index.vec_col), index.centroids))


def ivf_top_k(
    assigned: DataFrame,
    index: IVFIndex,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    centroid_col: str = "centroid_id",
    round_to: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest inverted lists, exact cosine inside."""
    qnorm = math.sqrt(sum(x * x for x in query)) or 1.0

    def dist(c: list[float]) -> float:
        return sum((a - b) ** 2 for a, b in zip(query, c))

    order = sorted(range(len(index.centroids)), key=lambda i: dist(index.centroids[i]))
    probe = order[: max(1, nprobe)]
    qlit = F.array(*[F.lit(float(x)) for x in query])
    vec = F.col(index.vec_col)
    cos = dot_col(vec, qlit) / (norm_col(vec) * F.lit(qnorm))
    return (
        assigned.where(F.col(centroid_col).isin(probe))
        .select(F.col(index.id_col), F.round(cos, round_to).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(index.id_col))
        .limit(k)
    )
