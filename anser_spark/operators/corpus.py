"""Corpus management for LLM training pipelines: deterministic
train/val/test splitting and train-vs-eval decontamination.

Both operators are pure DataFrame plans over deterministic hash / set
algebra, so they are exactly reproducible by the DuckDB oracle gates
and stable across re-runs — the properties a 100 TB corpus build needs
for resumability and audit.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anser_spark.operators.dedup import shingle_postings_arrow

__all__ = [
    "hash_split",
    "stratified_sample",
    "temperature_mix",
    "weighted_sample",
    "contaminated_pairs",
    "decontaminate",
    "with_shuffle_key",
    "clean_lines",
    "dedup_lines",
    "shuffle_shards",
]

_BUCKETS = 1 << 16


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Mapping[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashing the document
    id: bucket = first 4 hex digits of md5(salt || id) (65536 buckets),
    split = the weight interval the bucket falls in.

    Hash-based splitting is the scale-correct form of random splitting:
    no RNG state, no shuffle, membership is a pure projection computed
    at scan speed, and a document keeps its split across incremental
    corpus builds (append-only growth never reshuffles old docs —
    exactly why md5(id) beats ``rand()`` here). ``salt`` derives
    independent splits from the same corpus.

    ``weights`` is an ordered mapping name → weight (normalized;
    default {'train': .9, 'val': .05, 'test': .05}); interval edges are
    ``floor(cum_weight * 65536)`` so the oracle reproduces them in
    integer math.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    weights = dict(weights)
    if not weights or any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be a non-empty mapping of non-negative weights")
    total = float(sum(weights.values()))
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        edge = int(cum * _BUCKETS)
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out_col = last if expr is None else expr.otherwise(last)
    return df.withColumn("__bucket", bucket).withColumn(split_col, out_col)


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a document iff its md5
    bucket falls under its stratum's rate (``bucket < rate * 65536``).

    The language-/source-rebalancing primitive of corpus curation as a
    pure filter projection — no RNG, no shuffle, no sampleBy state;
    the same (corpus, rates, salt) always selects the same documents,
    and raising a stratum's rate strictly grows its sample (nested
    samples, because the kept bucket range only widens). Strata absent
    from ``rates`` get ``default_rate``.
    """
    for name, r in rates.items():
        if not (0.0 <= float(r) <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0, 1]")
    if not (0.0 <= float(default_rate) <= 1.0):
        raise ValueError("default_rate must be in [0, 1]")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    edge: Column = F.lit(int(float(default_rate) * _BUCKETS))
    for name, r in rates.items():
        edge = F.when(F.col(strata_col) == name, F.lit(int(float(r) * _BUCKETS))).otherwise(
            edge
        )
    return df.where(bucket < edge)


def temperature_mix(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    total_rows: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted corpus re-balancing — the multinomial
    mixing rule of multilingual/multi-source pretraining (share of
    stratum i ∝ n_i^(1/T); Lample & Conneau 2019 §3.1). T=1 keeps
    natural proportions, T→∞ approaches uniform over strata, T<1
    sharpens toward the big strata.

    Realized as per-stratum rates over the deterministic md5-bucket
    filter (:func:`stratified_sample`): rate_i = min(1, share_i ·
    N / n_i), rounded to 6 decimals so an SQL twin reproduces the
    integer bucket edges. Downsampling only — a stratum whose target
    exceeds its size keeps all rows (no upsampling/repetition;
    epoch-level repetition is the trainer's concern, not the
    sampler's).

    Cost: ONE count aggregate (one row per stratum, driver-side
    bounded by stratum cardinality) + one filter scan. No RNG state,
    no shuffle of the data itself; same (corpus, T, salt) always
    selects the same documents.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    rows = (
        df.groupBy(F.col(strata_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    counts = {r["__k"]: int(r["__n"]) for r in rows if r["__k"] is not None}
    if not counts:
        return df.limit(0)
    powed = {k: n ** (1.0 / temperature) for k, n in counts.items()}
    z = sum(powed[k] for k in sorted(powed))  # fixed order: stable float sum
    n_total = float(total_rows if total_rows is not None else sum(counts.values()))
    rates = {
        k: round(min(1.0, (powed[k] / z) * n_total / n), 6)
        for k, n in counts.items()
    }
    return stratified_sample(
        df, rates, strata_col=strata_col, id_col=id_col,
        default_rate=0.0, salt=salt,
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep each document
    with probability ``min(1, rate · weight)`` — quality-weighted
    corpus curation (sample high-quality documents at a higher rate)
    with the same properties as the other corpus operators: no RNG
    state (the coin is the document's md5 bucket, so membership is a
    pure scan-speed filter), exactly reproducible by a SQL oracle, and
    MONOTONE — raising ``rate`` or a document's weight only ever ADDS
    documents to the sample (the kept bucket range widens), which is
    what makes incremental corpus rebuilds append-only.

    ``weight_col`` is a column name or Column of non-negative weights
    (e.g. a quality score in [0, 1]); the inclusion threshold is
    ``floor(min(1, rate·w) · 65536)`` in integer math so the oracle
    reproduces the edge exactly.
    """
    if not (0.0 <= float(rate)):
        raise ValueError("rate must be non-negative")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("long")
    p = F.least(F.lit(1.0), F.lit(float(rate)) * w.cast("double"))
    edge = F.floor(p * F.lit(float(_BUCKETS))).cast("long")
    return df.where(bucket < edge)


def contaminated_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """(train_id, test_id, n_shared) for every train/eval pair sharing
    at least ``min_shared`` distinct word ``k``-grams — the standard
    n-gram-overlap eval-contamination check.

    Plan: each side becomes a flat (id, shingle-hash) posting list —
    the explode and a 64-bit shingle hash are fused into the Arrow
    batch (:func:`shingle_postings_arrow`), so no strings or arrays
    cross the Arrow boundary. The eval set is tiny next to a training
    corpus, so Spark broadcasts its postings and the check runs as one
    scan over the train side — no all-pairs comparison ever exists.
    """
    tr = shingle_postings_arrow(
        train.select(F.col(id_col).alias("train_id"), text_col), "train_id", text_col, k
    )
    te = shingle_postings_arrow(
        test.select(F.col(id_col).alias("test_id"), text_col), "test_id", text_col, k
    )
    return (
        tr.join(F.broadcast(te), "__tok")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Drop every training document contaminated by the eval set (≥
    ``min_shared`` shared ``k``-grams with ANY eval doc): one left-anti
    join against the contaminated-id set."""
    bad = contaminated_pairs(train, test, id_col, text_col, k, min_shared).select(
        F.col("train_id").alias(id_col)
    )
    return train.join(bad.distinct(), on=id_col, how="left_anti")


def with_shuffle_key(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    out: str = "shuffle_key",
) -> DataFrame:
    """Deterministic global-shuffle key for training-order
    randomization: the full 128-bit md5(salt || id) as a hex string —
    sorting (or range-partitioning) by it is a reproducible uniform
    permutation of the corpus.

    This is the scale-correct form of "shuffle the dataset": no RNG
    state, no `orderBy(rand())` (whose per-task draws are neither
    stable under retries nor reproducible across runs), and writers
    shard it without a global sort via
    ``df.repartitionByRange(n, shuffle_key)`` + per-partition local
    sort — each output shard is an independent contiguous slice of the
    permutation. A new ``salt`` is a fresh epoch-independent permutation.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.withColumn(out, key)


def _line_norm(line: Column) -> Column:
    """Dedup-match normalization: case-fold, trim, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(line)), r"\s+", " ")


def clean_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_words: int = 3,
    require_terminal_punct: bool = False,
    blocklist: list[str] | None = None,
    out: str = "clean_text",
) -> DataFrame:
    """C4-style line-level document cleaning (Raffel et al. 2020 §2.2):
    drop lines with fewer than ``min_words`` words, optionally lines
    without terminal punctuation (``.!?"``), optionally lines containing
    any (case-insensitive) ``blocklist`` phrase — then reassemble the
    document from the surviving lines in order.

    Entirely pure Column HOFs (filter over the split array) — NO
    shuffle, NO explode: at 100 TB this is scan-speed row-local work,
    which is why line cleaning runs *before* the corpus-wide dedup
    pass. Adds ``n_lines`` / ``n_kept_lines`` counters and the ``out``
    column; empty documents yield 0/0 and an empty string.
    """
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), sep)

    def keep(line: Column) -> Column:
        words = F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != "")
        cond = F.size(words) >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & F.trim(line).rlike(r'[.!?"]\s*$')
        for phrase in blocklist or []:
            cond = cond & ~F.lower(line).contains(phrase.lower())
        return cond

    kept = F.filter(lines, keep)
    return df.select(
        *df.columns,
        F.size(F.filter(lines, lambda l: F.trim(l) != "")).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, sep).alias(out),
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    out: str = "dedup_text",
) -> DataFrame:
    """Corpus-wide line/paragraph-level exact dedup (the CCNet/C4
    pre-processing step): every normalized line is kept only at its
    FIRST occurrence across the whole corpus — first = smallest
    ``(id_col, line position)``, so the result is deterministic and
    incremental re-runs keep the same survivors.

    Scale shape: posexplode → groupBy the line's xxhash64 with a
    ``min(struct(id, pos))`` winner (partial aggregation combines
    map-side, so a boilerplate line occurring a billion times shuffles
    one pre-combined row per map partition — this is why it's an agg,
    not a window over the hash, which would sort the full duplicate
    set); winners join back on the 8-byte hash; surviving lines
    re-assemble per document with ``array_agg`` sorted by position.
    Shuffled bytes are (hash, id, pos) triples plus each KEPT line
    once; duplicate line text never travels twice.

    Output: input columns + ``n_lines`` / ``n_kept_lines`` + ``out``
    (documents whose every line was seen before come back with an
    empty string — filter on ``n_kept_lines`` to drop them).
    """
    lines = (
        df.select(
            F.col(id_col).alias("__did"),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
            ).alias("__pos", "__line"),
        )
        .where(F.trim(F.col("__line")) != "")
        .withColumn("__h", F.xxhash64(_line_norm(F.col("__line"))))
    )
    winners = lines.groupBy("__h").agg(
        F.min(F.struct("__did", "__pos")).alias("__w")
    )
    kept = lines.join(winners, "__h").where(
        (F.col("__did") == F.col("__w.__did")) & (F.col("__pos") == F.col("__w.__pos"))
    )
    rebuilt = kept.groupBy("__did").agg(
        F.count(F.lit(1)).alias("n_kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias(out),
    )
    counts = (
        lines.groupBy("__did")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .withColumnRenamed("__did", id_col)
    )
    return (
        df.join(counts, id_col, "left")
        .join(rebuilt.withColumnRenamed("__did", id_col), id_col, "left")
        .fillna({"n_lines": 0, "n_kept_lines": 0})
        .fillna({out: ""})
    )


def shuffle_shards(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Materialize the deterministic shuffle as ``num_shards`` range
    shards, each locally sorted by the key — the layout a sharded
    training-data writer consumes. One range-partitioning exchange,
    no global sort."""
    keyed = with_shuffle_key(df, id_col, salt)
    return keyed.repartitionByRange(num_shards, F.col("shuffle_key")).sortWithinPartitions(
        "shuffle_key"
    )
