"""Product quantization (PQ) for embedding columns — the standard
billion-scale ANN compression (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011; the IVF-PQ
layout is FAISS's workhorse index).

The d-dim vector splits into ``m`` subvectors; each subvector is
replaced by the id of its nearest centroid from a 2^nbits-entry
per-subspace codebook. A 768-dim float32 embedding (3 KB) becomes m=96
one-byte codes (96 B) — 32× smaller — and query-time scoring needs no
reconstruction: asymmetric distance computation (ADC) precomputes one
(m × 2^nbits) lookup table per QUERY, then every candidate's distance
is m table lookups.

Scale design (100 TB lens):
- Codebooks train on a bounded driver SAMPLE (same reasoning as
  `ivf_train_sample`: codebook quality needs a sample, not the corpus)
  with vectorized numpy Lloyd's per subspace — m small k-means runs.
- Encoding is one Arrow-batched mapInPandas pass: per batch, m argmin
  matmuls (batch × 2^nbits per subspace). No shuffle.
- ADC scoring is another Arrow pass: the per-query LUT is built ONCE
  driver-side (m · 2^nbits floats, broadcast as a closure literal) and
  each batch scores via numpy fancy-indexing — candidates never
  reconstruct, floats never leave the executors.
- Composes with IVF (`ivfpq_top_k`): probe nprobe inverted lists, ADC
  only within them — the classic IVF-PQ two-level index.

Distances are approximations (codebook resolution bounds the error);
`pq_top_k(..., rerank=N)` optionally re-scores the top-N ADC
candidates exactly against the original vectors — the standard
recall-restoring refinement step, one bounded join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from anser_spark.operators.similarity import (
    float_array_lit,
    float_array_sql,
    sql_ident,
)

__all__ = [
    "PQCodebooks",
    "pq_train_sample",
    "pq_encode",
    "pq_top_k",
    "ivfpq_top_k",
    "pq_adc_scores",
]


@dataclass
class PQCodebooks:
    codebooks: list[list[list[float]]]  # m × ksub × dsub
    vec_col: str
    id_col: str

    @property
    def m(self) -> int:
        return len(self.codebooks)

    @property
    def ksub(self) -> int:
        return len(self.codebooks[0])

    @property
    def dsub(self) -> int:
        return len(self.codebooks[0][0])


def _kmeans(x, k, rng, max_iter=12):
    import numpy as np

    # k-means++ with an INCREMENTAL running min — recomputing distances
    # to every chosen center per step is O(k²·n) and dominates training
    # time at k=256; the running min is bit-identical (same values, same
    # rng draws) and O(k·n)
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
        # group members with ONE stable argsort instead of k full-array
        # boolean masks (the masks were ~half the Lloyd cost at k=256).
        # Stable sort keeps index order within each cluster, and a slice
        # of the gathered C-contiguous array reduces in the same row
        # order as x[assign == j] did — means are bit-identical.
        order = np.argsort(assign, kind="stable")
        xs = x[order]
        bounds = np.searchsorted(assign[order], np.arange(k + 1))
        worst = None  # farthest point: constant within one iteration
        for j in range(k):
            lo, hi = bounds[j], bounds[j + 1]
            if hi > lo:
                new_c[j] = xs[lo:hi].mean(axis=0)
            else:
                if worst is None:
                    worst = x[(d.min(axis=1) + xn).argmax()]
                new_c[j] = worst
        if np.allclose(new_c, c):
            return new_c
        c = new_c
    return c


def pq_train_sample(
    df: DataFrame,
    m: int = 8,
    nbits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_sample: int = 100_000,
    seed: int = 42,
) -> PQCodebooks:
    """Train m per-subspace codebooks (2^nbits entries each) on a
    bounded driver sample. Requires dim % m == 0.

    The sample is a SEEDED PSEUDO-RANDOM slice (round 14, r13 ADVICE):
    ordering by ``xxhash64(id, seed)`` before the limit is a
    deterministic permutation, so the seed actually governs sample
    selection — a bare ``.limit(n)`` took the first partitions' rows,
    and on a corpus ordered by ingest time or cluster the codebooks
    trained on a skewed slice (bounded-beam recall degraded).

    The top-``max_sample`` selection happens on NARROW ``(id, hash)``
    rows (guide §2.3/§8: decide with lightweight proxies, move payloads
    once): a TakeOrdered carrying the vector column holds a
    ``max_sample``-deep heap of ~dim·8-byte payload rows per task and
    merges partitions·max_sample of them in one task — at 768 dims and
    the default 100k sample that is ~600 MB per task heap, where the
    narrow pass is ~1.6 MB. The narrow pass yields the hash CUTOFF of
    the winning set; the payload pass then re-scans with the scalar
    ``hash <= cutoff`` filter (≈max_sample survivors, only ties extra)
    so its TakeOrdered heap sees ~max_sample rows total — no join, no
    broadcast, one extra column-pruned job."""
    import numpy as np

    if id_col in df.columns:
        h = F.xxhash64(F.col(id_col), F.lit(int(seed)))
        cut = (
            df.select(h.alias("__pq_sample_h"))
            .orderBy("__pq_sample_h")
            .limit(int(max_sample))
            .agg(F.max("__pq_sample_h"), F.count("*"))
            .first()
        )
        src = df
        if cut[1] and int(cut[1]) >= int(max_sample):
            # a full top-max_sample exists below the cutoff; ties at
            # the cutoff are resolved by the (hash, id) sort below
            src = df.where(h <= F.lit(int(cut[0])))
        rows = (
            src.orderBy(h, F.col(id_col))
            .limit(int(max_sample))
            .select(vec_col)
            .toPandas()  # Arrow transfer: ~2x a pickled-row collect,
            # same rows in the same order, doubles bit-identical
        )
    else:
        rows = df.select(vec_col).limit(int(max_sample)).toPandas()
    x = np.array(
        [np.asarray(v, dtype=np.float64) for v in rows[vec_col]],
        dtype=np.float64,
    )
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m}")
    ksub = 1 << nbits
    if len(x) < ksub:
        raise ValueError(f"need at least {ksub} sample vectors, got {len(x)}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        books.append([list(map(float, c)) for c in _kmeans(sub, ksub, rng)])
    return PQCodebooks(codebooks=books, vec_col=vec_col, id_col=id_col)


def pq_encode(df: DataFrame, cb: PQCodebooks, out: str = "pq_codes") -> DataFrame:
    """One Arrow pass: each vector → array<int> of m codebook ids."""
    m, dsub = cb.m, cb.dsub
    books = cb.codebooks
    vec_col = cb.vec_col

    in_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{in_schema}, `{out}` array<int>"

    def encode(batches):
        import numpy as np

        B = [np.asarray(b, dtype=np.float64) for b in books]  # m × ksub × dsub
        Bn = [np.einsum("kd,kd->k", b, b) for b in B]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                # argmin ||s - c||² = argmin (||c||² - 2 s·c)
                d = Bn[j][None, :] - 2.0 * (sub @ B[j].T)
                codes[:, j] = d.argmin(axis=1)
            pdf = pdf.copy()
            pdf[out] = list(codes)
            yield pdf

    return df.mapInPandas(encode, schema=out_schema)


def _adc_lut(query, cb: PQCodebooks):
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    dsub = cb.dsub
    lut = np.empty((cb.m, cb.ksub), dtype=np.float64)
    for j in range(cb.m):
        sub = q[j * dsub : (j + 1) * dsub]
        B = np.asarray(cb.codebooks[j], dtype=np.float64)
        lut[j] = ((B - sub[None, :]) ** 2).sum(axis=1)
    return lut


def pq_adc_scores(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    similarity: str = "cosine",
    id_col: str = "id",
    codes_col: str = "__codes",
    norm_col: str = "__norm",
) -> DataFrame:
    """ADC over a codes-bearing index table, in the SIMILARITY SPACE of
    Atlas ``$vectorSearch`` — returns ``(id, __adc)`` where HIGHER is
    better, so the caller's shortlist is a plain descending top-k for
    every metric.

    The LUT is metric-appropriate: inner-product sublookups for
    "cosine"/"dotProduct" (the per-subspace ``q_j · c`` dot products sum
    to the approximate full dot product; cosine then divides by the
    STORED vector norm — one double riding next to the codes, so the
    scoring pass never touches the float vectors), and negated squared
    L2 for "euclidean". Column pruning is the point at 100 TB: the pass
    selects only (id, codes[, norm]) — parquet never materializes the
    vector column for candidates that the rerank won't touch.
    """
    import numpy as np

    q = np.asarray([float(x) for x in query], dtype=np.float64)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    lut = np.empty((m, len(codebooks[0])), dtype=np.float64)
    for j in range(m):
        sub = q[j * dsub : (j + 1) * dsub]
        B = np.asarray(codebooks[j], dtype=np.float64)
        if similarity == "euclidean":
            lut[j] = -((B - sub[None, :]) ** 2).sum(axis=1)
        else:
            lut[j] = B @ sub
    lut_list = lut.tolist()
    use_norm = similarity == "cosine"
    cols = [id_col, codes_col] + ([norm_col] if use_norm else [])
    id_dt = df.schema[id_col].dataType.simpleString()

    def score(batches):
        import numpy as np

        L = np.asarray(lut_list)
        mi = np.arange(L.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray([np.asarray(c) for c in pdf[codes_col]])
            s = L[mi[None, :], codes].sum(axis=1)
            if use_norm:
                s = s / np.maximum(pdf[norm_col].to_numpy(), 1e-30)
            out = pdf[[id_col]].copy()
            out["__adc"] = s
            yield out

    return df.select(*cols).mapInPandas(
        score, schema=f"`{id_col}` {id_dt}, __adc double"
    )


def pq_top_k(
    encoded: DataFrame,
    cb: PQCodebooks,
    query: list[float],
    k: int = 10,
    codes_col: str = "pq_codes",
    rerank: int = 0,
) -> DataFrame:
    """ADC top-k by approximate squared L2: one Arrow scoring pass over
    the codes (the per-query LUT is a closure literal — m·2^nbits
    floats), then TakeOrdered. ``rerank=N`` re-scores the top-N
    candidates exactly on the original vector column first — the
    standard refinement; N is bounded, so the exact pass is tiny."""
    lut_list = _adc_lut(query, cb).tolist()
    id_col = cb.id_col

    def score(batches):
        import numpy as np

        lut = np.asarray(lut_list)
        mi = np.arange(lut.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.asarray([np.asarray(c) for c in pdf[codes_col]])
            out = pdf[[id_col]].copy()
            out["adc_dist"] = lut[mi[None, :], codes].sum(axis=1)
            yield out

    scored = encoded.mapInPandas(
        score, schema=f"`{id_col}` {encoded.schema[id_col].dataType.simpleString()}, adc_dist double"
    )
    if not rerank:
        return scored.orderBy("adc_dist", id_col).limit(k)
    shortlist = scored.orderBy("adc_dist", id_col).limit(int(rerank))
    qsql = float_array_sql(query)
    if qsql is not None:
        # one-round-trip construction; same expression tree as the
        # lambda form below (round 14, guide §1)
        exact_dist = F.expr(
            f"aggregate(zip_with({sql_ident(cb.vec_col)}, {qsql}, "
            f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)"
        )
    else:
        exact_dist = F.aggregate(
            F.zip_with(
                F.col(cb.vec_col),
                float_array_lit(query),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    exact = (
        encoded.join(F.broadcast(shortlist.select(id_col)), id_col)
        .withColumn("exact_dist", exact_dist)
    )
    return exact.select(id_col, "exact_dist").orderBy("exact_dist", id_col).limit(k)


def ivfpq_top_k(
    assigned_encoded: DataFrame,
    ivf_centroids: list[list[float]],
    cb: PQCodebooks,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    centroid_col: str = "centroid_id",
    codes_col: str = "pq_codes",
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ: prune to the nprobe nearest inverted lists (partition
    filter on the centroid column — pushed down when the dataset is
    written partitioned by it), then ADC inside. The FAISS IVFPQ shape:
    list pruning bounds candidates, PQ bounds bytes per candidate."""

    def d2(c):
        return sum((a - b) ** 2 for a, b in zip(query, c))

    probe = sorted(range(len(ivf_centroids)), key=lambda i: d2(ivf_centroids[i]))[
        : max(1, int(nprobe))
    ]
    pruned = assigned_encoded.where(F.col(centroid_col).isin([int(p) for p in probe]))
    return pq_top_k(pruned, cb, query, k=k, codes_col=codes_col, rerank=rerank)
