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

from anser_spark.operators.similarity import (
    dot_col,
    float_array_lit,
    float_array_sql,
    norm_col,
    sql_ident,
)

__all__ = [
    "IVFIndex",
    "ivf_train",
    "ivf_train_sample",
    "ivf_assign",
    "ivf_top_k",
    "ivf_knn_join",
]


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


def ivf_train_sample(
    df: DataFrame,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_sample: int = 100_000,
    seed: int = 42,
    max_iter: int = 10,
) -> IVFIndex:
    """Train centroids with numpy Lloyd's over a bounded driver sample.

    Centroid quality only ever needs a sample — so even at 100 TB the
    right plan is ONE distributed limit to pull ≤``max_sample`` vectors
    to the driver and iterate in vectorized numpy (milliseconds),
    rather than paying a distributed ML pipeline's per-iteration job
    overhead. Round-3 bake-off vs :func:`ivf_train` (pyspark.ml) on
    the sf0.1 gate: the fit cost drops from ~1.5s to ~20ms with equal
    recall (and identical ivf_top_k results at nprobe=k, which is
    exact for any centroid placement). k-means++ seeding, seeded rng,
    empty clusters re-seeded from the farthest points.
    """
    import numpy as np

    # Arrow transfer (toPandas) instead of pickled-row collect(): the
    # same rows arrive as float64 ndarrays at ~2x the speed (measured
    # 0.30 -> 0.15s at 20k x 64-dim; values bit-identical — doubles
    # cross Arrow exactly)
    sample = df.select(vec_col).limit(int(max_sample)).toPandas()
    x = np.array(
        [np.asarray(v, dtype=np.float64) for v in sample[vec_col]],
        dtype=np.float64,
    )
    if len(x) < k:
        raise ValueError(f"need at least k={k} vectors to train, got {len(x)}")
    rng = np.random.RandomState(seed)
    # k-means++ init with an incremental running min: bit-identical to
    # re-deriving the min over all chosen centers per step (same values,
    # same rng draws), but O(k·n) instead of O(k²·n)
    centers = [x[rng.randint(len(x))]]
    d2 = ((x - centers[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = x[rng.choice(len(x), p=probs)]
        centers.append(nxt)
        d2 = np.minimum(d2, ((x - nxt) ** 2).sum(axis=1))
    c = np.array(centers)
    xn = (x * x).sum(axis=1)
    for _ in range(max_iter):
        # argmin ||x-c||² == argmin (||c||² - 2 x·c): one matmul, no
        # n×k×d temporary
        d = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
        assign = d.argmin(axis=1)
        new_c = c.copy()
        # one stable argsort replaces k boolean masks; slices of the
        # gathered array see the same rows in the same order, so the
        # means (and the trained centroids) are bit-identical
        order = np.argsort(assign, kind="stable")
        xs = x[order]
        bounds = np.searchsorted(assign[order], np.arange(k + 1))
        worst = None  # farthest point: constant within one iteration
        for j in range(k):
            lo, hi = bounds[j], bounds[j + 1]
            if hi > lo:
                new_c[j] = xs[lo:hi].mean(axis=0)
            else:  # re-seed an empty cluster from the farthest point
                if worst is None:
                    worst = x[(d.min(axis=1) + xn).argmax()]
                new_c[j] = worst
        if np.allclose(new_c, c):
            c = new_c
            break
        c = new_c
    return IVFIndex(
        centroids=[list(map(float, row)) for row in c], vec_col=vec_col, id_col=id_col
    )


def _nearest_centroid_col(vec, centroids: list[list[float]]):
    """Index of the nearest centroid (euclidean) as a pure expression.

    Each centroid's distance appears exactly ONCE, in an array; argmin is
    array_position of the min. (A chained when(best_dist < d, ...) fold
    embeds the previous best-distance tree twice per step — exponential
    expression growth that stalls Catalyst beyond k≈10.)"""
    dists = _dists_array(vec, centroids)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _dists_array(vec, centroids: list[list[float]]):
    """array<double> of per-centroid squared distances — built as ONE
    F.expr when ``vec`` is a column-path string and every centroid is
    finite (round 14, guide §1): the per-element/per-lambda py4j form
    cost ~55ms per centroid to CONSTRUCT at 64 dims; the SQL text form
    is one round trip for the whole array with an identical expression
    tree. Falls back to the Column form otherwise."""
    if isinstance(vec, str):
        sqls = [_sq_dist_sql(vec, c) for c in centroids]
        if all(s is not None for s in sqls):
            return F.expr("array(" + ",".join(sqls) + ")")
        vec = F.expr(vec)
    return F.array(*[_sq_dist(vec, c) for c in centroids])


def _sq_dist_sql(vec_sql: str, centroid: list[float]) -> str | None:
    clit = float_array_sql(centroid)
    if clit is None:
        return None
    return (
        f"aggregate(zip_with({vec_sql}, {clit}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        f"0.0D, (acc, v) -> acc + v)"
    )


def _sq_dist(vec, centroid: list[float]):
    clit = float_array_lit(centroid)
    return F.aggregate(
        F.zip_with(vec, clit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(df: DataFrame, index: IVFIndex, out: str = "centroid_id") -> DataFrame:
    """One scan: tag every vector with its inverted-list id. Persist or
    write partitioned by ``out`` so probes prune lists at the source."""
    return df.withColumn(
        out, _nearest_centroid_col(sql_ident(index.vec_col), index.centroids)
    )


def ivf_assign_dist(
    df: DataFrame,
    index: IVFIndex,
    cell_out: str = "__cell",
    dist_out: str = "__dist",
) -> DataFrame:
    """One scan: nearest-centroid id AND its squared euclidean distance
    (the assignment-drift statistic's input, round 12). The
    per-centroid distances array is computed exactly once per row —
    same expression-growth reasoning as :func:`_nearest_centroid_col`."""
    dists = _dists_array(sql_ident(index.vec_col), index.centroids)
    return (
        df.withColumn("__dists", dists)
        .withColumn(
            cell_out,
            (
                F.array_position(F.col("__dists"), F.array_min("__dists"))
                - 1
            ).cast("int"),
        )
        .withColumn(dist_out, F.array_min("__dists"))
        .drop("__dists")
    )


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
    vsql = sql_ident(index.vec_col)
    qlit = float_array_sql(query) or float_array_lit(query)
    cos = dot_col(vsql, qlit) / (norm_col(vsql) * F.lit(qnorm))
    return (
        assigned.where(F.col(centroid_col).isin(probe))
        .select(F.col(index.id_col), F.round(cos, round_to).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(index.id_col))
        .limit(k)
    )


def _probe_cells_col(vec, centroids: list[list[float]], nprobe: int):
    """The nprobe nearest centroid ids as an array<int> expression:
    (distance, id) structs array_sorted ONCE, then sliced — every
    per-centroid distance is evaluated exactly once per row (same
    expression-growth reasoning as _nearest_centroid_col)."""
    pairs = F.arrays_zip(
        _dists_array(vec, centroids),
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
    )
    ordered = F.array_sort(pairs)  # struct order: by distance, then id
    return F.transform(
        F.slice(ordered, 1, max(1, nprobe)), lambda s: s["1"].cast("int")
    )


def ivf_knn_join(
    queries: DataFrame,
    assigned: DataFrame,
    index: IVFIndex,
    k: int = 10,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str | None = None,
    centroid_col: str = "centroid_id",
    round_to: int = 4,
) -> DataFrame:
    """KNN JOIN: for EVERY query vector in ``queries``, the top-k
    nearest corpus vectors — the batch shape of :func:`ivf_top_k`
    (embedding a new document batch and linking each to its corpus
    neighbors), where per-query driver-side probing would mean one
    Spark job per row.

    Plan shape: each query row computes its ``nprobe`` nearest
    centroids as ONE array expression, explodes to (query, cell), and
    equi-joins the corpus on the cell id — cost ≈ |batch| · nprobe/nlist
    · |corpus| candidate pairs instead of the |batch| · |corpus|
    cross join; AQE broadcasts the (small) exploded query side. Exact
    cosine inside the probed lists, per-query top-k via one
    window on query_id (k is small, the heap never materializes more
    than the candidates). nprobe=nlist degrades to the exact KNN join.

    Returns (query_id, <corpus id>, cosine, rank), rank 1..k."""
    from pyspark.sql.window import Window

    qvec = query_vec_col or index.vec_col
    cells = _probe_cells_col(sql_ident(qvec), index.centroids, nprobe)
    probes = queries.select(
        F.col(query_id_col),
        F.col(qvec).alias("__qvec"),
        F.explode(cells).alias(centroid_col),
    )
    vsql = sql_ident(index.vec_col)
    qn = norm_col("__qvec")
    cos = dot_col("__qvec", vsql) / (
        F.greatest(norm_col(vsql), F.lit(1e-30)) * F.greatest(qn, F.lit(1e-30))
    )
    scored = probes.join(assigned, centroid_col).select(
        query_id_col,
        F.col(index.id_col),
        F.round(cos, round_to).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(index.id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(query_id_col, "rank")
    )
