"""Semantic deduplication (SemDeDup-style): k-means clustering over an
embedding column, then cosine near-duplicate pruning WITHIN each
cluster only — the pairwise cost is O(sum of cluster sizes squared),
never O(n^2) over the corpus.

Method follows Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540): cluster
with k-means, then inside each cluster drop all but one member of every
group of points whose pairwise cosine similarity exceeds ``eps``,
keeping the member LEAST similar to its cluster centroid (the paper's
choice — it preserves the cluster's outer shell, which carries the most
diverse examples).  Ties break on the id column for determinism.

Scale design (100 TB lens):
- Clustering reuses the IVF machinery (`operators/ivf.py`): centroids
  train on a sample via pyspark.ml KMeans, assignment is one
  scan-speed Column expression — no per-row Python.
- The only shuffle is the groupBy(cluster) feeding Arrow-batched
  `applyInPandas`; each task sees one cluster's vectors as a numpy
  matrix and does one BLAS matmul for the similarity matrix.
- Cluster size is bounded: clusters above ``max_cluster_size`` are
  deterministically sub-sharded by an id hash before the pairwise pass
  (documented recall trade: near-dups split across shards of the same
  oversized cluster are not compared — the same bound the paper's
  per-cluster batching applies). Choose k ≈ n / desired_cluster_size.

Beyond-reference component (no mongodb/anser analogue): part of the
training-data pipeline surface alongside operators/dedup.py (exact,
MinHash/LSH, SimHash) — this one catches *semantic* duplicates exact
and lexical methods miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from anser_spark.operators.ivf import IVFIndex, ivf_assign, ivf_train

__all__ = ["semantic_dedup"]


def semantic_dedup(
    df: DataFrame,
    eps: float = 0.93,
    index: IVFIndex | None = None,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float | None = None,
    max_cluster_size: int = 20_000,
    seed: int = 42,
    keep_flag: bool = False,
) -> DataFrame:
    """Return ``df`` with semantic near-duplicates removed (or, with
    ``keep_flag=True``, all rows plus a ``semdedup_keep`` boolean and
    their ``cluster_id`` — the audit form).

    Pass a pre-trained ``index`` (e.g. from a persisted collection
    search index) to skip training; otherwise k-means trains here on
    ``sample_fraction`` of the data (None = all of it).
    """
    caller_cols = list(df.columns)
    if index is None:
        index = ivf_train(
            df, k=k, vec_col=vec_col, id_col=id_col,
            sample_fraction=sample_fraction, seed=seed,
        )
    centroids = index.centroids
    assigned = ivf_assign(df, index, out="cluster_id")

    # bound the per-task pairwise matrix: deterministic sub-shard of
    # oversized clusters via an id hash (xxhash64 is seed-stable)
    shard_mod = F.pmod(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)),
        F.greatest(
            F.lit(1),
            F.ceil(
                F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
                / F.lit(max_cluster_size)
            ),
        ),
    )
    assigned = assigned.withColumn("__shard", shard_mod.cast("int"))

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in assigned.schema.fields
    ) + ", semdedup_keep boolean"

    def prune(pdf):
        import numpy as np

        if len(pdf) <= 1:
            pdf = pdf.copy()
            pdf["semdedup_keep"] = True
            return pdf
        cid = int(pdf["cluster_id"].iloc[0])
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0.0] = 1e-30
        Xn = X / norms[:, None]
        c = np.asarray(centroids[cid], dtype=np.float64)
        c = c / (np.linalg.norm(c) or 1e-30)
        csim = Xn @ c
        # paper's keep rule: traverse least-centroid-similar first; a
        # row survives only if no already-kept row is eps-close
        order = np.lexsort((pdf[id_col].astype(str).to_numpy(), csim))
        sims = Xn @ Xn.T
        keep = np.zeros(len(pdf), dtype=bool)
        kept: list[int] = []
        for i in order:
            if not kept or float(np.max(sims[i, kept])) < eps:
                keep[i] = True
                kept.append(i)
        pdf = pdf.copy()
        pdf["semdedup_keep"] = keep
        return pdf

    flagged = assigned.groupBy("cluster_id", "__shard").applyInPandas(
        prune, schema=out_schema
    )
    if keep_flag:
        return flagged.drop("__shard")
    # pruned form returns EXACTLY the caller's columns — cluster_id is
    # part of the keep_flag audit form only
    return flagged.where(F.col("semdedup_keep")).select(*caller_cols)
