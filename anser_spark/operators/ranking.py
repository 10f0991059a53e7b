"""Corpus ranking: BM25 scoring over a document table.

The retrieval primitive of a training-data pipeline (mining documents
relevant to a seed set, dataset search, quality-weighted sampling).
Built scale-first:

- Corpus statistics (N, avgdl, per-term document frequencies) come from
  ONE aggregate job whose result is a constant-size row collected to
  the driver — the same "small side becomes a literal" reasoning as a
  broadcast join, valid at any corpus size because its width is
  O(query terms), not O(corpus).
- Scoring is then a single pure-Column scan (term frequencies via
  array HOFs, no Python, no shuffle); top-k goes through Spark's
  TakeOrdered path.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bm25_score",
    "bm25_score_expr",
    "bm25_top_k",
    "rank_fusion",
    "parse_text_search",
    "text_match",
    "text_match_frame",
    "text_match_postings",
    "search_text_postings",
    "search_phrase_postings",
    "search_autocomplete_postings",
    "phrase_positions_pred",
    "term_positions",
    "count_text_postings",
    "analyze_terms",
    "ENGLISH_STOPWORDS",
]


# Snowball English stopword list (public domain, snowballstem.org) —
# the same list Mongo's 'english' analyzer suppresses.
# Analyzer pipeline versions, stamped into persisted bm25 indexes at
# build time (engine.create_search_index) and compared at load/status:
# bump a language's tag whenever its tokenizer, stopword list, fold
# table, or stemmer changes incompatibly — the round-7→8 s-stemmer →
# Porter2 swap silently invalidated every english term table, which is
# exactly the failure this stamp now surfaces as `stale`.
# english bumped v1→v2 round 13: apostrophe edge-case order fixed to
# match libstemmer (exception1/hop-3 on the raw token, leading-'
# strip inside the prelude) — indexes built under v1 read as stale
ANALYZER_VERSION = {"none": "ws-lower-v1", "english": "snowball-porter2-v2"}

ENGLISH_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their
theirs themselves what which who whom this that these those am is are
was were be been being have has had having do does did doing would
should could ought i'm you're he's she's it's we're they're i've you've
we've they've i'd you'd he'd she'd we'd they'd i'll you'll he'll she'll
we'll they'll isn't aren't wasn't weren't hasn't haven't hadn't doesn't
don't didn't won't wouldn't shan't shouldn't can't cannot couldn't
mustn't let's that's who's what's here's there's when's where's why's
how's a an the and but if or because as until while of at by for with
about against between into through during before after above below to
from up down in out on off over under again further then once here
there when where why how all any both each few more most other some
such no nor not only own same so than too very
""".split())


# Common Latin diacritic foldings (one-to-one only — F.translate is a
# char map; multi-char foldings like ae/ss stay unfolded, documented).
_FOLD_SRC = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿāăąćĉċčďēĕėęěĝğġģĥĩīĭįĵķĺļľńņňōŏőŕŗřśŝşšţťũūŭůűųŵŷźżž"
_FOLD_DST = "aaaaaaceeeeiiiinooooouuuuyyaaaccccdeeeeegggghiiiijklllnnnooorrrssssttuuuuuuwyzzz"
assert len(_FOLD_SRC) == len(_FOLD_DST)
_FOLD_TABLE = str.maketrans(_FOLD_SRC, _FOLD_DST)


def sidecar_rows(
    spark,
    dirs,
    eq: Mapping[str, Any] | None = None,
    isin: Mapping[str, list] | None = None,
    prefix_any: tuple[str, list[str]] | None = None,
    columns: list[str] | None = None,
) -> list[dict] | None:
    """Point/prefix lookups on a small parquet SIDECAR (term/stats
    tables) as a driver-local pyarrow read with predicate pushdown —
    no Spark job. A query-time stats lookup returns O(query terms)
    rows and already collects to the driver; launching a distributed
    job per lookup charged every indexed text query ~0.1-1s of pure
    job-scheduling overhead (round 14, guide §1.2: fix the per-query
    work after the algorithm). The term tables are written
    range-partitioned and sorted by term, so parquet row-group
    statistics prune the read to the matching groups — the same
    pushdown the Spark scan relied on.

    Returns a list of dict rows, or None when the local path cannot
    serve (non-local dir, pyarrow failure, or total size above
    ``spark.anser.index.sidecarLocalReadMaxBytes``, default 256 MiB —
    a vocabulary table big enough to want a cluster scan gets one):
    callers fall back to the Spark read they used before.
    """
    import os

    if isinstance(dirs, str):
        dirs = [dirs]
    try:
        max_bytes = int(
            spark.conf.get(
                "spark.anser.index.sidecarLocalReadMaxBytes",
                str(256 * 1024 * 1024),
            )
        )
    except Exception:
        max_bytes = 256 * 1024 * 1024
    total = 0
    paths: list[str] = []
    try:
        for d in dirs:
            d = str(d)
            if d.startswith("file:"):
                d = d[len("file:"):]
            if not os.path.isdir(d):
                return None
            for root, _sub, files in os.walk(d):
                for f in sorted(files):
                    if f.startswith((".", "_")):
                        continue
                    p = os.path.join(root, f)
                    total += os.path.getsize(p)
                    if total > max_bytes:
                        return None
                    paths.append(p)
    except OSError:
        return None
    if not paths:
        return []
    try:
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        data = ds.dataset(paths, format="parquet")
        flt = None

        def _and(a, b):
            return b if a is None else a & b

        for k, v in (eq or {}).items():
            flt = _and(flt, ds.field(k) == v)
        for k, v in (isin or {}).items():
            flt = _and(flt, ds.field(k).isin(list(v)))
        if prefix_any is not None:
            col, prefixes = prefix_any
            p = None
            for t in prefixes:
                e = pc.starts_with(ds.field(col), str(t))
                p = e if p is None else (p | e)
            if p is not None:
                flt = _and(flt, p)
        tbl = data.to_table(filter=flt, columns=columns)
        return tbl.to_pylist()
    except Exception:
        return None


def terms_lookup_rows(
    spark, terms_dir, terms: list, field: str | None = None
) -> list:
    """``(term[, field] → df)`` point lookup on a term-stats sidecar:
    driver-local pyarrow read when possible, the original pushed-down
    Spark read otherwise. Row access stays ``r["term"]``-shaped for
    both paths."""
    rows = sidecar_rows(
        spark,
        str(terms_dir),
        eq=({"field": field} if field is not None else None),
        isin={"term": list(terms)},
    )
    if rows is not None:
        return rows
    tbl = spark.read.parquet(str(terms_dir))
    if field is not None:
        tbl = tbl.where(F.col("field") == F.lit(field))
    return tbl.where(F.col("term").isin(list(terms))).collect()


def terms_df_sum(
    spark,
    terms_dir,
    terms: list | None = None,
    field: str | None = None,
    prefixes: list | None = None,
) -> int:
    """Σ df over a term-table lookup (the postings cost gate's input):
    same local-read-with-fallback contract as
    :func:`terms_lookup_rows`; ``prefixes`` switches the match to
    prefix-OR (the autocomplete cost shape)."""
    rows = sidecar_rows(
        spark,
        str(terms_dir),
        eq=({"field": field} if field is not None else None),
        isin=({"term": list(terms)} if terms is not None else None),
        prefix_any=(("term", list(prefixes)) if prefixes else None),
        columns=["df"],
    )
    if rows is not None:
        return sum(int(r["df"]) for r in rows)
    tbl = spark.read.parquet(str(terms_dir))
    if field is not None:
        tbl = tbl.where(F.col("field") == F.lit(field))
    if terms is not None:
        tbl = tbl.where(F.col("term").isin(list(terms)))
    if prefixes:
        cond = None
        for t in prefixes:
            c = F.col("term").startswith(F.lit(t))
            cond = c if cond is None else (cond | c)
        tbl = tbl.where(cond)
    return int(
        tbl.agg(F.coalesce(F.sum("df"), F.lit(0)).alias("s")).collect()[0]["s"]
    )


def _fold_py(s: str) -> str:
    return s.translate(_FOLD_TABLE)


def _fold_col(col):
    return F.translate(col, _FOLD_SRC, _FOLD_DST)


def _sqlstr(s: str) -> str:
    """SQL single-quoted string literal (default parser escaping)."""
    return "'" + str(s).replace("\\", "\\\\").replace("'", "\\'") + "'"


def _sqlident(name: str) -> str:
    """Dotted path → backtick-quoted identifier chain — parses to the
    same UnresolvedAttribute as ``F.col(name)``."""
    return ".".join(
        "`" + p.replace("`", "``") + "`" for p in str(name).split(".")
    )


def _stem_tokens(col):
    """Arrow-batched Snowball ('Porter2') stemming of a token-array
    column — the ONE Python touchpoint in the analyzer (the split and
    stopword filter stay pure Column).  The module-level memo in
    stemmer.py persists across batches AND tasks (Python workers are
    reused), so with Zipf-distributed vocabulary the stemmer runs
    roughly once per distinct word per worker lifetime.  The same
    :func:`porter2_stem` function analyzes query terms driver-side, so
    the two sides can never drift."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from anser_spark.functions.stemmer import porter2_stem_cached

    def _stem(batch):
        def stem_list(toks):
            if toks is None:
                return None
            return [porter2_stem_cached(t) for t in toks]

        return batch.map(stem_list)

    # real annotation objects (the module's future-annotations mode
    # would stringify inline hints beyond pyspark's resolver)
    _stem.__annotations__ = {"batch": pd.Series, "return": pd.Series}
    return pandas_udf(_stem, T.ArrayType(T.StringType()))(col)


def analyze_terms(
    terms: list[str], language: str = "none", preserve_case: bool = False
) -> list[str]:
    """Driver-side query-term analysis matching :func:`_tokens`:
    'none' lowercases; 'english' also re-tokenizes each term on the
    document charset (so 'big-data' splits like the docs do), drops
    stopwords, then Snowball-stems (:func:`porter2_stem` — round 8;
    'running' now conflates with 'run').  ``preserve_case`` is the
    $caseSensitive analyzer: tokens keep their case (stopwords are
    still dropped case-insensitively, as Mongo's case-sensitive
    tokenizer does), and the stemmer sees the case-preserved token —
    lowercase suffix rules simply don't fire on 'RUNNING', matching
    libstemmer's behavior.  Idempotence warning: stemming is NOT
    idempotent against the stopword list (e.g. 'owns' stems to 'own',
    which IS a stopword) — analyze exactly once; scoring entry points
    take ``analyzed=True`` to skip re-analysis."""
    import re as _re

    from anser_spark.functions.stemmer import porter2_stem

    out = list(terms) if preserve_case else [t.lower() for t in terms]
    if language == "english":
        split = []
        for t in out:
            # same charset as the doc tokenizer's [^\p{L}\p{N}']+ —
            # \w is unicode-aware in Python (minus the underscore)
            split.extend(
                w for w in _re.split(r"(?:[^\w']|_)+", t) if w
            )
        out = [
            porter2_stem(t)
            for t in split
            if t.lower() not in ENGLISH_STOPWORDS
        ]
    return out


def _tokens(text_col: str, language: str = "none", preserve_case: bool = False):
    """Tokenize a text column.  'none' (default): whitespace split +
    lowercase — the engine's historical analyzer, shared by the BM25
    index builder.  'english': split on non-alphanumerics, drop
    Snowball stopwords, Snowball-stem (Mongo's 'english' analyzer; the
    stemmer is the round-8 Porter2 implementation in
    functions/stemmer.py, applied through one Arrow-batched kernel —
    split + stopword filter stay pure Column).  ``preserve_case`` is
    the $caseSensitive variant: no lowercasing, stopwords dropped
    case-insensitively, stemming on the case-preserved token."""
    # the whole split/filter tree rides as ONE parsed SQL snippet (one
    # py4j round trip): the Column form cost ~10 round trips per call —
    # and the english stopword isin alone ~170 literal conversions —
    # at dozens of constructions per text query (round 14, guide §1.2).
    # Identical expression trees, bit-identical tokens.
    if language == "english":
        base = f"trim({_sqlident(text_col)})"
        if not preserve_case:
            base = f"lower({base})"
        pat = _sqlstr(r"[^\p{L}\p{N}']+")
        raw = f"filter(split({base}, {pat}), t -> t != '')"
        stops = ", ".join(_sqlstr(w) for w in sorted(ENGLISH_STOPWORDS))
        kept = f"filter({raw}, w -> NOT (lower(w) IN ({stops})))"
        return _stem_tokens(F.expr(kept))
    if language != "none":
        raise ValueError(
            f"unsupported $text language {language!r}: 'none' (exact "
            "tokens) and 'english' (stopwords + Snowball stemming) are "
            "implemented"
        )
    return F.expr(_tokens_sql(text_col, preserve_case))


def _tokens_sql(text_col: str, preserve_case: bool = False) -> str:
    """SQL snippet of the 'none'-analyzer token stream (whitespace
    split + lowercase) — the string form lets consumers embed it in a
    larger single-round-trip expression (e.g. the BM25 score)."""
    base = f"trim({_sqlident(text_col)})"
    if not preserve_case:
        base = f"lower({base})"
    ws_pat = _sqlstr(r"\s+")
    return f"filter(split({base}, {ws_pat}), t -> t != '')"


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    language: str = "none",
    analyzed: bool = False,
) -> DataFrame:
    """Per-document BM25 score for a bag of query terms.

    Standard Robertson/Sparck-Jones BM25 with the +1 idf smoothing
    (Lucene's formulation): idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    score = Σ_t idf·tf·(k1+1) / (tf + k1·(1 - b + b·|d|/avgdl)).

    Returns (id_col, n_tokens, score). Two scans total: one constant-
    width stats aggregate, one scoring scan.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = (
        [t.lower() for t in query_terms]
        if analyzed  # caller already ran analyze_terms — never re-stem
        else analyze_terms(query_terms, language)
    )
    if not terms:
        raise ValueError("query_terms are all stopwords under this language")
    toks = _tokens(text_col, language)
    base = df.select(F.col(id_col), toks.alias("__toks"))
    def _tf(term: str):
        # single-arg lambda: a 2-arg filter lambda would receive the
        # element INDEX as its second argument (PySpark arity dispatch)
        return F.size(F.filter(F.col("__toks"), lambda w: w == F.lit(term)))

    tf_cols = [_tf(t).alias(f"__tf{i}") for i, t in enumerate(terms)]
    scored = base.select(id_col, F.size("__toks").alias("n_tokens"), *tf_cols)

    # one job, one constant-size row: corpus size, average doc length,
    # and document frequency of every query term
    stats = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("n_tokens").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 0.0)
    if n_docs == 0:
        return scored.select(id_col, "n_tokens", F.lit(0.0).alias("score"))
    idfs = [
        math.log(1.0 + (n_docs - stats[f"__df{i}"] + 0.5) / (stats[f"__df{i}"] + 0.5))
        for i in range(len(terms))
    ]
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("n_tokens") / F.lit(avgdl)
    )
    score = None
    for i, idf in enumerate(idfs):
        tf = F.col(f"__tf{i}").cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return scored.select(id_col, "n_tokens", score.alias("score"))


def bm25_score_expr(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: tuple[int, float, dict] | None = None,
    language: str = "none",
    analyzed: bool = False,
    toks_col: str | None = None,
    fold: bool = False,
    with_pred: bool = False,
) -> F.Column:
    """BM25 as a pure Column EXPRESSION over ``df``'s text column — the
    zero-join form: corpus stats (N, avgdl, per-term df) come from the
    same ONE constant-width aggregate as :func:`bm25_score`, folded in
    as literals; term frequencies evaluate inline in the consuming
    plan. A $search stage built on this is a single scan of the corpus
    (no score-frame self-join — at 100 TB that join was a corpus-wide
    shuffle on the id column). Term count is O(query), so the repeated
    tokenize-per-term stays a few codegen'd expressions.

    ``stats`` supplies PRECOMPUTED ``(n_docs, avgdl, {term: df})`` — a
    persistent bm25 search index (``Collection.create_search_index``)
    resolves them with a point lookup on its term table, skipping the
    corpus aggregate entirely; terms absent from the map get df=0
    (maximal idf, matching the aggregate's answer for an unseen term).

    score > 0 ⟺ the document contains ≥1 query term (idf is strictly
    positive under the +1 smoothing), so the expression doubles as the
    match predicate. ``with_pred=True`` (round 14) returns
    ``(score, pred)`` where ``pred`` is that same predicate as ONE
    cheap ``exists(toks, isin)`` — semantically identical to
    ``score > 0`` incl. the n_docs/avgdl edge cases, but when Catalyst
    pushes the filter below the score projection (alias substitution
    re-inlines the token stream per term) the pushed condition then
    tokenizes once per row instead of ~2·|terms|+1 times — measured
    13 → 2 tokenizations/row on the 3-term hybrid gate's text leg.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = (
        [t.lower() for t in query_terms]
        if analyzed  # caller already ran analyze_terms — never re-stem
        else analyze_terms(query_terms, language)
    )
    if not terms:
        # all stopwords: nothing to score, nothing matches
        return (F.lit(0.0), F.lit(False)) if with_pred else F.lit(0.0)
    # the expression references the token array once per term; under
    # the 'english' analyzer tokenization is a stopword filter + stem
    # transform per evaluation, so callers that can materialize the
    # array ONCE per row pass its column name via ``toks_col``.
    # Round 14 (guide §1.2): whenever the token stream is SQL-
    # representable (a toks_col name, or the 'none' analyzer inline)
    # the whole score builds as ONE parsed snippet — the per-term
    # Column loop cost ~10 round trips per term per construction.
    # Literal doubles render via repr(): bit-exact through the SQL
    # parser (see similarity.float_array_sql).
    toks_sql: str | None = None
    if toks_col:
        toks_sql = _sqlident(toks_col)
    elif language == "none":
        toks_sql = _tokens_sql(text_col)
    toks = F.col(toks_col) if toks_col else _tokens(text_col, language)
    if fold and not toks_col:
        # diacritic-insensitive scoring: fold the inline stream (a
        # pre-materialized toks_col is already folded; callers fold
        # the query terms)
        toks = F.transform(toks, _fold_col)
        if toks_sql is not None:
            toks_sql = (
                f"transform({toks_sql}, t -> translate(t, "
                f"{_sqlstr(_FOLD_SRC)}, {_sqlstr(_FOLD_DST)}))"
            )

    def _tf(term: str):
        # single-arg lambda via closure: a default-arg lambda would have
        # arity 2 and PySpark would pass the element INDEX as the second
        # argument (the same dispatch trap bm25_score documents)
        return F.size(F.filter(toks, lambda w: w == F.lit(term)))

    def _tf_sql(term: str) -> str:
        return f"size(filter({toks_sql}, w -> w = {_sqlstr(term)}))"

    if stats is None:
        if toks_sql is not None:
            agg_cols = [
                F.expr(f"avg(size({toks_sql}))").alias("avgdl"),
                *[
                    F.expr(
                        f"sum(CAST(({_tf_sql(t)} > 0) AS BIGINT))"
                    ).alias(f"__df{i}")
                    for i, t in enumerate(terms)
                ],
            ]
        else:
            agg_cols = [
                F.avg(F.size(toks)).alias("avgdl"),
                *[
                    F.sum((_tf(t) > 0).cast("long")).alias(f"__df{i}")
                    for i, t in enumerate(terms)
                ],
            ]
        agg = df.agg(F.count(F.lit(1)).alias("n"), *agg_cols).collect()[0]
        n_docs, avgdl = agg["n"], float(agg["avgdl"] or 0.0)
        dfs = [agg[f"__df{i}"] for i in range(len(terms))]
    else:
        n_docs, avgdl, df_map = stats
        dfs = [int(df_map.get(t, 0)) for t in terms]
    if n_docs == 0 or avgdl == 0.0:
        # score>0 can never hold — the paired pred must agree
        return (F.lit(0.0), F.lit(False)) if with_pred else F.lit(0.0)
    idfs = [
        math.log(1.0 + (n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5))
        for i in range(len(terms))
    ]
    if toks_sql is not None:
        norm_sql = (
            f"{float(k1)!r}D * ({float(1.0 - b)!r}D + {float(b)!r}D * "
            f"CAST(size({toks_sql}) AS DOUBLE) / {float(avgdl)!r}D)"
        )
        parts = []
        for i, t in enumerate(terms):
            tf = f"CAST({_tf_sql(t)} AS DOUBLE)"
            parts.append(
                f"{float(idfs[i])!r}D * {tf} * {float(k1 + 1.0)!r}D"
                f" / ({tf} + {norm_sql})"
            )
        score: F.Column = F.expr(" + ".join(parts))
    else:
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.size(toks).cast("double") / F.lit(avgdl)
        )
        score = None
        for i, t in enumerate(terms):
            tf = _tf(t).cast("double")
            part = F.lit(idfs[i]) * tf * F.lit(k1 + 1.0) / (tf + norm)
            score = part if score is None else score + part
    if with_pred:
        # ∃ term with tf>0 ⟺ Σ idf·tf·…>0 (idf strictly positive under
        # the +1 smoothing, tf ≥ 0) — one exists over the shared stream
        uniq = list(dict.fromkeys(terms))
        if toks_sql is not None:
            pred = F.expr(
                f"exists({toks_sql}, w -> w IN "
                f"({', '.join(_sqlstr(t) for t in uniq)}))"
            )
        else:
            pred = F.exists(toks, lambda w: w.isin(uniq))
        return score, pred
    return score


def rank_fusion(
    ranked: dict,
    key: str,
    weights: dict | None = None,
    rrf_k: int = 60,
    rank_col: str = "rank",
    out: str = "fused_score",
) -> DataFrame:
    """Reciprocal-rank fusion of named ranked lists (the $rankFusion /
    hybrid-search combiner): fused(doc) = Σ_p w_p / (rrf_k + rank_p),
    summing over the pipelines that ranked the doc.

    ``ranked``: name → DataFrame carrying ``key`` and a 1-based
    ``rank_col``. Returns one row per doc in ANY list: (key,
    <name>_rank …, out), fused score descending is the hybrid ranking.

    RRF only consumes ranks, never raw scores — which is what makes
    fusing heterogeneous scorers (BM25 vs cosine) principled. The
    inputs are top-k lists (bounded by construction), so the
    full-outer-join chain is a few broadcast-size frames, not a
    corpus-scale shuffle.
    """
    if not ranked:
        raise ValueError("rank_fusion requires at least one ranked input")
    weights = dict(weights or {})
    if any(w < 0 for w in weights.values()):
        raise ValueError("rank_fusion weights must be non-negative")
    fused: DataFrame | None = None
    for name, df in ranked.items():
        leg = df.select(F.col(key), F.col(rank_col).cast("long").alias(f"{name}_rank"))
        fused = leg if fused is None else fused.join(leg, on=key, how="full_outer")
    score = None
    for name in ranked:
        w = float(weights.get(name, 1.0))
        part = F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(w) / (F.lit(float(rrf_k)) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return fused.withColumn(out, score)


def parse_text_search(search: str) -> tuple[list[str], list[str], list[str]]:
    """Split a legacy ``$text`` ``$search`` string per Mongo's grammar:
    double-quoted phrases must ALL appear, ``-``-prefixed terms must
    NOT appear, remaining terms are OR'd. Phrase words also join the
    scoring terms (Mongo scores them like ordinary terms).

    Returns ``(terms, phrases, negated)``."""
    import re as _re

    phrases = [p for p in _re.findall(r'"([^"]*)"', search) if p.strip()]
    rest = _re.sub(r'"[^"]*"', " ", search)
    terms: list[str] = []
    negated: list[str] = []
    for tok in rest.split():
        if tok.startswith("-") and len(tok) > 1:
            negated.append(tok[1:])
        else:
            terms.append(tok)
    for p in phrases:
        terms.extend(p.split())
    return terms, phrases, negated


def text_match(
    df: DataFrame,
    spec: Mapping[str, Any],
    text_col: str = "text",
    stats_loader: Callable[[list[str]], tuple[int, float, dict]] | None = None,
    default_language: str = "none",
    need_score: bool = True,
) -> tuple[F.Column, F.Column]:
    pred, score, _df = text_match_frame(
        df, spec, text_col, stats_loader, default_language,
        materialize=False, need_score=need_score,
    )
    return pred, score


_TOKS_RAW = "__textToksRaw"
_TOKS_FOLD = "__textToksFold"


class _TextQuery:
    """Analyzed form of a legacy ``$text`` spec — ONE derivation shared
    by the scan path (:func:`text_match_frame`) and the inverted-
    postings path (:func:`text_match_postings`), so the two can never
    drift on analyzer semantics."""

    __slots__ = (
        "search", "case_sensitive", "folding", "language",
        "terms", "phrases", "negated", "raw_terms", "score_terms",
    )


def _analyze_text_spec(
    spec: Mapping[str, Any], default_language: str = "none"
) -> _TextQuery:
    search = spec.get("$search")
    if not isinstance(search, str) or not search.strip():
        raise ValueError("$text requires a non-empty $search string")
    unknown = set(spec) - {
        "$search", "$caseSensitive", "$language", "$diacriticSensitive"
    }
    if unknown:
        raise ValueError(f"unsupported $text options: {sorted(unknown)}")
    q = _TextQuery()
    q.search = search
    q.case_sensitive = bool(spec.get("$caseSensitive", False))
    # Mongo (text index v3+) defaults to diacritic-INSENSITIVE; folding
    # covers the common one-to-one Latin accents (multi-char foldings
    # like ae/ss are a documented subset gap).
    q.folding = not bool(spec.get("$diacriticSensitive", False))
    language = spec.get("$language", default_language) or "none"
    if language in ("en", "english"):
        language = "english"
    elif language != "none":
        raise ValueError(
            f"unsupported $text $language {language!r}: 'none' and "
            "'english' are implemented"
        )
    q.language = language
    terms, phrases, negated = parse_text_search(search)
    if not terms and not negated:
        raise ValueError(f"$text $search has no searchable terms: {search!r}")
    # analyze query terms with the document analyzer (stopwords drop
    # out; stems align with the stemmed token stream).  The
    # case-sensitive path (round 8, ADVICE) still applies the language
    # analyzer — as Mongo's case-sensitive tokenizer does — via the
    # case-PRESERVING variant.
    q.raw_terms = list(terms)
    if not q.case_sensitive:
        terms = analyze_terms(terms, language)
        negated = analyze_terms(negated, language)
    elif language == "english":
        terms = analyze_terms(terms, language, preserve_case=True)
        negated = analyze_terms(negated, language, preserve_case=True)
    q.terms, q.phrases, q.negated = terms, phrases, negated
    # relevance scores the CASE-FOLDED stream (documented), so its
    # terms must be the case-insensitive analysis of the ORIGINAL
    # query terms (review round 8)
    if q.case_sensitive and language == "english":
        q.score_terms = sorted(
            {t.lower() for t in analyze_terms(q.raw_terms, language)}
        )
    else:
        q.score_terms = sorted({t.lower() for t in terms})
    if q.folding:
        q.score_terms = sorted({_fold_py(t) for t in q.score_terms})
    return q


def text_match_frame(
    df: DataFrame,
    spec: Mapping[str, Any],
    text_col: str = "text",
    stats_loader: Callable[[list[str]], tuple[int, float, dict]] | None = None,
    default_language: str = "none",
    materialize: bool = True,
    need_score: bool = True,
) -> tuple[F.Column, F.Column, DataFrame]:
    # Like text_match but, when `materialize` is set, returns a
    # PREPARED frame carrying the analyzed token stream as hidden
    # columns (__textToksRaw / __textToksFold) that the predicate and
    # score reference instead of re-tokenizing per term — under the
    # 'english' analyzer tokenization is a stopword filter + stem
    # transform, so evaluating it once per ROW instead of once per
    # term-reference matters. Callers apply pred/score against the
    # returned frame and drop the hidden columns when done.
    """Legacy ``{$text: {$search: ...}}`` query operator (the find
    surface the reference accepts verbatim, db/interface.go:26) mapped
    onto the BM25 machinery: returns ``(pred, score)`` where ``pred``
    selects matching documents (any positive term, all phrases, no
    negated term) and ``score`` is the BM25 relevance that
    ``{"$meta": "textScore"}`` projections/sorts read.

    ``stats_loader(terms)`` supplies precomputed ``(n_docs, avgdl,
    {term: df})`` — a persistent bm25 search index resolves it with a
    point lookup so no corpus aggregate runs at query time.

    Language analysis (round 7; stemmer upgraded round 8): ``$language``
    (or the index's ``default_language``) selects the analyzer —
    'none' = exact lowercased tokens (default), 'english'/'en' =
    Snowball stopword removal + Snowball ENGLISH (Porter2) stemming
    (functions/stemmer.py) on BOTH documents and query terms, so
    'running' matches 'run' and stopword-only queries match nothing,
    as in Mongo.  ``$caseSensitive`` still applies the analyzer (the
    case-preserving variant), as Mongo's case-sensitive tokenizer does.
    Documented divergences: relevance is BM25 (not Mongo's tf-idf —
    ordering may differ; for case-sensitive english queries relevance
    is computed on the case-folded stream), phrase matching is
    raw-substring (unstemmed), and ``$diacriticSensitive`` folds the
    common one-to-one Latin accents only (no full Unicode
    normalization; multi-char foldings like ae/ss stay unfolded).
    """
    # ONE shared derivation with the postings path (round 9): terms /
    # negation / phrases analyzed by the document analyzer, score terms
    # over the case-folded (and, by default, diacritic-folded) stream —
    # see _analyze_text_spec for the semantics notes.
    q = _analyze_text_spec(spec, default_language)
    case_sensitive, folding, language = q.case_sensitive, q.folding, q.language
    terms, phrases, negated = q.terms, q.phrases, q.negated
    score_terms = q.score_terms

    # prepare the shared token columns (materialized mode): the
    # analyzed stream and/or its folded form, each computed once per
    # row; the case-sensitive predicate's surface split stays inline
    prepared = df
    need_fold = folding and (bool(score_terms) or not case_sensitive)
    need_raw = need_fold or (
        (not folding) and (bool(score_terms) or not case_sensitive)
    )
    if materialize and need_raw:
        prepared = prepared.withColumn(_TOKS_RAW, _tokens(text_col, language))
    if materialize and need_fold:
        prepared = prepared.withColumn(
            _TOKS_FOLD, F.transform(F.col(_TOKS_RAW), _fold_col)
        )

    def _analyzed_toks():
        if materialize:
            return F.col(_TOKS_FOLD if folding else _TOKS_RAW)
        toks = _tokens(text_col, language)
        return F.transform(toks, _fold_col) if folding else toks

    # need_score=False (round 14): the caller proved the relevance is
    # never consumed (no $meta textScore projection/sort), so skip the
    # stats resolution — on the no-index scan path that's a full
    # corpus tokenize+aggregate job at query-build time for literals
    # the plan would prune anyway.
    if score_terms and need_score:
        stats = stats_loader(score_terms) if stats_loader is not None else None
        score = bm25_score_expr(
            prepared, score_terms, text_col=text_col, stats=stats,
            language=language, analyzed=True,
            toks_col=(
                (_TOKS_FOLD if folding else _TOKS_RAW)
                if materialize else None
            ),
            fold=folding,
        )
    else:
        score = F.lit(0.0)  # negation/stopword-only query

    if case_sensitive:
        # case-preserving token stream: for 'english' this is the full
        # analyzer (charset split + stopwords + stemming) on unlowered
        # text; for 'none' the historical unlowered whitespace split.
        # Computed inline (not materialized): the case-sensitive path
        # is rare and its term count small.
        toks = _tokens(text_col, language, preserve_case=True)
        if folding:
            toks = F.transform(toks, _fold_col)
        qterm = _fold_py if folding else (lambda t: t)
        contains = lambda p: (  # noqa: E731
            _fold_col(F.col(text_col)) if folding else F.col(text_col)
        ).contains(F.lit(qterm(p)))
    else:
        toks = _analyzed_toks()
        qterm = (
            (lambda t: _fold_py(t.lower())) if folding
            else (lambda t: t.lower())
        )
        contains = lambda p: (  # noqa: E731
            _fold_col(F.lower(F.col(text_col))) if folding
            else F.lower(F.col(text_col))
        ).contains(F.lit(qterm(p)))

    def has_any(ts: list[str]) -> F.Column:
        # ONE exists over the shared token stream (≡ OR of has(t)):
        # when Catalyst pushes the predicate below the score projection
        # it substitutes the token alias per reference, so the per-term
        # OR form re-tokenized the row once per term in the pushed
        # filter (round 14 — the same re-inlining bm25_score_expr's
        # with_pred documents)
        vals = [qterm(t) for t in ts]
        return F.exists(toks, lambda w: w.isin(vals))

    pred = None
    if terms:
        pred = has_any(terms)
    for p in phrases:
        pred = contains(p) if pred is None else (pred & contains(p))
    if negated:
        neg = ~F.coalesce(has_any(negated), F.lit(False))
        pred = neg if pred is None else (pred & neg)
    if not terms and not phrases and (negated or language == "english"):
        # Mongo: a $search with nothing positive left — only negated
        # terms, or terms that were all stopwords — matches nothing.
        # Phrase-only queries keep their raw-substring predicate.
        pred = F.lit(False)
    return F.coalesce(pred, F.lit(False)), score, prepared


def text_match_weighted_frame(
    df: DataFrame,
    spec: Mapping[str, Any],
    weights: Mapping[str, float],
    default_language: str = "none",
    stats_loader: Callable[[list[str]], Mapping[str, Any]] | None = None,
    need_score: bool = True,
    k1: float = 1.2,
    b: float = 0.75,
) -> tuple[F.Column, F.Column]:
    """Multi-field weighted ``$text`` — the Mongo text-index shape
    ``{weights: {title: 3, body: 1}}`` (reference accepts these
    queries verbatim, db/interface.go:26; round-9..10 rejected them at
    index build). Semantics: a document matches when ANY weighted
    field matches the term/phrase/negation predicate (negated terms
    exclude on ANY field, phrases must appear in SOME field, Mongo's
    multi-field contract); relevance = Σ_field weight × BM25_field,
    where BM25_field uses that field's own avgdl and per-term document
    frequencies with the shared corpus size. (Mongo weights its tf-idf
    variant the same way; this engine's relevance metric is BM25
    throughout — the documented divergence.)

    ``stats_loader(score_terms)`` returns ``{"n_docs": N, "fields":
    {f: {"avgdl": a, "df": {term: df}}}}`` precomputed by a weighted
    bm25 index (point lookups on its field-tagged term table). None ⇒
    one inline constant-width aggregate per field (the index-less/
    stale path). ``need_score=False`` (mutation-targeting predicates)
    skips scoring entirely — no stats work at all.

    Pure Column — the stage stays a single scan. Case-sensitive and
    diacritic options follow the single-field path's analyzer rules.
    """
    q = _analyze_text_spec(spec, default_language)
    fields = sorted(weights)

    def per_field(fname: str):
        if q.case_sensitive:
            toks = _tokens(fname, q.language, preserve_case=True)
        else:
            toks = _tokens(fname, q.language)
        if q.folding:
            toks = F.transform(toks, _fold_col)
        return toks

    if q.case_sensitive:
        qterm = _fold_py if q.folding else (lambda t: t)
    else:
        qterm = (
            (lambda t: _fold_py(t.lower())) if q.folding
            else (lambda t: t.lower())
        )

    def has_any(fname: str, ts: list) -> F.Column:
        # one exists per FIELD over its shared stream (≡ OR of per-term
        # equality) — the pushed-down filter then tokenizes each field
        # once instead of once per (field, term) pair (round 14)
        vals = [qterm(t) for t in ts]
        return F.exists(per_field(fname), lambda w: w.isin(vals))

    def contains(fname: str, p: str) -> F.Column:
        body = F.col(fname) if q.case_sensitive else F.lower(F.col(fname))
        if q.folding:
            body = _fold_col(body)
        return body.contains(F.lit(qterm(p)))

    pred = None
    if q.terms:
        pos = None
        for fname in fields:
            h = has_any(fname, q.terms)
            pos = h if pos is None else (pos | h)
        pred = pos
    for p in q.phrases:
        any_f = None
        for fname in fields:
            c = contains(fname, p)
            any_f = c if any_f is None else (any_f | c)
        pred = any_f if pred is None else (pred & any_f)
    if q.negated:
        any_f = None
        for fname in fields:
            h = F.coalesce(has_any(fname, q.negated), F.lit(False))
            any_f = h if any_f is None else (any_f | h)
        neg = ~any_f
        pred = neg if pred is None else (pred & neg)
    if not q.terms and not q.phrases and (
        q.negated or q.language == "english"
    ):
        pred = F.lit(False)

    score = F.lit(0.0)
    if q.score_terms and need_score:
        stats = (
            stats_loader(q.score_terms) if stats_loader is not None
            else None
        )
        for fname in fields:
            fstats = None
            if stats is not None:
                fs = (stats.get("fields") or {}).get(fname) or {}
                fstats = (
                    int(stats["n_docs"]),
                    float(fs.get("avgdl") or 0.0),
                    dict(fs.get("df") or {}),
                )
            part = bm25_score_expr(
                df, q.score_terms, text_col=fname, k1=k1, b=b,
                stats=fstats, language=q.language, analyzed=True,
                fold=q.folding,
            )
            # a NULL field contributes 0, not NULL — a doc matching on
            # one field must not lose its whole score to another
            # field's missing value (the postings twin's tf=0
            # arithmetic lands on exactly 0.0 the same way)
            score = score + F.lit(float(weights[fname])) * F.coalesce(
                part, F.lit(0.0)
            )
    return F.coalesce(pred, F.lit(False)), score


def weighted_stats_loader(spark, index: Mapping[str, Any]):
    """``stats_loader(score_terms)`` for the weighted scan path: one
    pushed-down point lookup on the field-tagged term table → per-field
    df maps + the stored avgdl (no corpus aggregate at query time; the
    single-field loader's contract, field-tagged)."""
    n_docs = int(index["n_docs"])
    terms_dir = str(index["terms_dir"])
    fmeta = dict(index.get("fields") or {})

    def loader(terms: list[str]) -> dict[str, Any]:
        rows = terms_lookup_rows(
            spark, terms_dir, [t.lower() for t in terms]
        )
        per: dict[str, dict] = {
            f: {
                "avgdl": float((fmeta.get(f) or {}).get("avgdl") or 0.0),
                "df": {},
            }
            for f in fmeta
        }
        for r in rows:
            per.setdefault(r["field"], {"avgdl": 0.0, "df": {}})["df"][
                r["term"]
            ] = r["df"]
        return {"n_docs": n_docs, "fields": per}

    return loader


def text_match_weighted_postings(
    df: DataFrame,
    spec: Mapping[str, Any],
    index: Mapping[str, Any],
    score_col: str = "__textScore",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame | None:
    """Weighted multi-field ``$text`` answered from a FIELD-TAGGED
    postings table: rows are ``(id, field, term, term_fold, tf,
    n_tokens)`` where ``n_tokens`` is the FIELD's token count —
    one pushed-down term lookup over all fields at once (the layout
    keeps ``term_fold`` leading, so footer pruning is unchanged), one
    bounded groupBy pivoting (field × term) tf cells, the weighted
    BM25 sum as literals-folded arithmetic, one join back on the id.
    Bit parity with :func:`text_match_weighted_frame` is differential-
    tested. None when the postings can't serve the shape (same rules
    as :func:`text_match_postings`), including phrase queries — the
    multi-field substring predicate needs the original columns, which
    the join-back provides, so phrases ARE served (applied over the
    bounded candidates)."""
    postings_dir = index.get("postings_dir")
    if not postings_dir or not _postings_enabled(df.sparkSession):
        return None
    weights = {
        str(f): float(w) for f, w in (index.get("weights") or {}).items()
    }
    if not weights:
        return None
    index_language = index.get("default_language", "none") or "none"
    if index_language == "en":
        index_language = "english"
    q = _analyze_text_spec(spec, index_language)
    if q.case_sensitive or q.language != index_language:
        return None
    if not q.terms:
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns or any(
        f not in df.columns for f in weights
    ):
        return None
    n_docs = int(index["n_docs"])
    if n_docs == 0:
        return df.where(F.lit(False)).withColumn(score_col, F.lit(0.0))
    fields = sorted(weights)
    favg = {
        f: float(
            ((index.get("fields") or {}).get(f) or {}).get("avgdl") or 0.0
        )
        for f in fields
    }

    spark = df.sparkSession
    tcol = "term_fold" if q.folding else "term"
    qterm = (
        (lambda t: _fold_py(t.lower())) if q.folding
        else (lambda t: t.lower())
    )
    qterms = q.score_terms
    cost_terms = list(qterms)
    lookup_terms = set(qterms)
    if q.folding:
        cost_terms = sorted({t.lower() for t in q.terms})
        lookup_terms |= set(cost_terms)
    rows = terms_lookup_rows(spark, index["terms_dir"], list(lookup_terms))
    df_map = {(r["field"], r["term"]): r["df"] for r in rows}
    if not _postings_cost_ok(
        spark,
        sum(
            int(df_map.get((f, t), 0))
            for f in fields for t in cost_terms
        ),
        n_docs,
        index_language,
    ):
        return None

    postings = read_layered_table(
        spark,
        [str(index["postings_dir"])]
        + [str(p) for p in (index.get("postings_deltas") or [])],
        list(index.get("postings_tombs") or []),
        "id",
    )
    aggs: list = []
    for fi, fname in enumerate(fields):
        aggs.append(
            F.max(
                F.when(F.col("field") == F.lit(fname), F.col("n_tokens"))
            ).alias(f"__ntok{fi}")
        )
        for ti, t in enumerate(qterms):
            aggs.append(
                F.sum(
                    F.when(
                        (F.col("field") == F.lit(fname))
                        & (F.col(tcol) == F.lit(t)),
                        F.col("tf"),
                    ).otherwise(F.lit(0))
                ).alias(f"__tf{fi}_{ti}")
            )
    cand = (
        postings.where(F.col(tcol).isin(list(qterms)))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    # float-sum association mirrors the scan path EXACTLY (per-field
    # inner sum over terms, then the weighted outer sum over fields in
    # the same sorted order) — bit parity is the differential contract
    score = F.lit(0.0)
    for fi, fname in enumerate(fields):
        if favg[fname] == 0.0:
            continue  # scan's bm25_score_expr contributes 0.0 likewise
        norm = F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b)
            * F.coalesce(F.col(f"__ntok{fi}"), F.lit(0)).cast("double")
            / F.lit(favg[fname])
        )
        fscore = None
        for ti, t in enumerate(qterms):
            dfi = int(df_map.get((fname, t), 0))
            idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
            tf = F.col(f"__tf{fi}_{ti}").cast("double")
            part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
            fscore = part if fscore is None else fscore + part
        score = score + F.lit(float(weights[fname])) * fscore
    cand = cand.select("__postkey", score.alias(score_col))

    if q.negated:
        neg_terms = sorted({qterm(t) for t in q.negated})
        if neg_terms:
            neg = (
                postings.where(F.col(tcol).isin(neg_terms))
                .select(F.col("id").alias("__negkey"))
                .distinct()
            )
            cand = cand.join(
                neg, cand["__postkey"] == neg["__negkey"], "left_anti"
            )

    out = df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")
    for p in q.phrases:
        any_f = None
        for fname in fields:
            body = (
                _fold_col(F.lower(F.col(fname))) if q.folding
                else F.lower(F.col(fname))
            )
            c = body.contains(F.lit(qterm(p)))
            any_f = c if any_f is None else (any_f | c)
        out = out.where(any_f)
    return out


def read_layered_table(
    spark, dirs: list[str], tombs: list[str], id_col: str
) -> DataFrame:
    """A persisted index table assembled from generation-stamped
    layers with TOMBSTONES applied (round 11 — update/remove-aware
    incremental refresh). ``dirs[i]`` is layer generation ``i`` (the
    base table is generation 0, each staged delta one higher); each
    tombstone parquet carries ``(__tomb_id, __tomb_gen)`` rows written
    by the refresh that invalidated those documents, where
    ``__tomb_gen`` is one past the highest layer that existed at write
    time. A row survives iff no tombstone names its id with a STRICTLY
    HIGHER generation — so a document updated at refresh k loses its
    old rows (layers < k) but keeps the re-inserted rows the same
    refresh published (layer k), and a later update kills those in
    turn. The tombstone side is bounded by the documents mutated since
    the last compaction, so the anti-join broadcasts; compaction folds
    tombstoned rows away physically and resets the generations."""
    if not tombs:
        return spark.read.parquet(*dirs)
    table = None
    for i, d in enumerate(dirs):
        layer = spark.read.parquet(d).withColumn("__layer", F.lit(i))
        table = layer if table is None else table.unionByName(layer)
    tomb = spark.read.parquet(*[str(t) for t in tombs])
    return table.join(
        F.broadcast(tomb),
        (table[id_col] == tomb["__tomb_id"])
        & (tomb["__tomb_gen"] > table["__layer"]),
        "left_anti",
    ).drop("__layer")


def _postings_frame(
    spark, index: Mapping[str, Any], raw: bool = False
) -> DataFrame:
    """The index's postings as one frame: the base range-partitioned
    table plus any staged incremental-refresh delta directories (round
    10 — a refresh publishes its delta atomically with the definition
    swap; each delta is itself range-sorted, so footer pruning holds
    per directory until compaction folds them back together), minus
    any tombstoned documents (round 11 — an update/remove refresh
    invalidates the mutated ids' old rows without rewriting the
    table; see :func:`read_layered_table`).

    ``raw=True`` reads the RAW-TOKEN SIDECAR a stemmed ('english')
    index stores beside its analyzed postings (round 11): same row
    layout over the 'none'-analyzer token stream, so phrase /
    autocomplete / moreLikeThis — whose query terms are raw lowered
    tokens — answer from the index under a stemmed analyzer too. The
    sidecar's delta layers advance in lockstep with the main table's,
    so the shared tombstone generations apply to both."""
    base_key, deltas_key = (
        ("raw_postings_dir", "raw_postings_deltas") if raw
        else ("postings_dir", "postings_deltas")
    )
    dirs = [str(index[base_key])] + [
        str(p) for p in (index.get(deltas_key) or [])
    ]
    return read_layered_table(
        spark, dirs, list(index.get("postings_tombs") or []), "id"
    )


def _postings_cost_ok(spark, sum_df: int, n_docs: int, language: str) -> bool:
    """Cost-based postings-vs-scan choice (round 10). The term-table
    point lookup returns every query term's document frequency BEFORE
    a plan is chosen, so the choice can be informed: the postings path
    costs ~Σ df(term) postings rows plus a join back over that many
    candidates, while the scan path costs one corpus pass — pure
    Column for the 'none' analyzer, but an Arrow-batched Porter2
    kernel for 'english' (an order of magnitude heavier per row). When
    Σ df approaches the corpus size (stopword-like terms under a
    'none'-language index, where nothing suppresses them), the bounded
    join-back stops being bounded and the single scan wins. Both paths
    are differential-tested bit-exact, so the switch is invisible.

    ``spark.anser.text.postingsMaxDfFrac`` overrides the default
    break-even fraction (0.5 of the corpus for 'none', 4.0 for
    'english' — the stemmer kernel keeps postings cheaper well past
    Σ df = corpus). Corpora under 1000 documents always take the
    postings path (both plans are trivially cheap there, and a stable
    choice keeps small-fixture plans deterministic); the conf override
    applies regardless, so the choice stays testable."""
    try:
        frac_conf = str(
            spark.conf.get("spark.anser.text.postingsMaxDfFrac", "")
        )
    except Exception:
        frac_conf = ""
    if frac_conf:
        frac = float(frac_conf)
    elif n_docs < 1000:
        return True
    else:
        frac = 4.0 if language == "english" else 0.5
    return sum_df <= frac * max(1, n_docs)


def _postings_enabled(spark) -> bool:
    """Operational escape hatch: ``spark.anser.text.usePostings=false``
    forces every $text/$search query back to the scan path (e.g. to
    rule the postings table in or out while debugging relevance, or
    when an index is suspected corrupt) — no rebuild required."""
    try:
        return str(
            spark.conf.get("spark.anser.text.usePostings", "true")
        ).lower() != "false"
    except Exception:  # conf access never blocks a query
        return True


def text_match_postings(
    df: DataFrame,
    spec: Mapping[str, Any],
    index: Mapping[str, Any],
    score_col: str = "__textScore",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame | None:
    """Answer a legacy ``$text`` query from a persisted INVERTED
    POSTINGS table (round 9) instead of scanning the corpus.

    ``index`` is a fresh bm25 search-index definition carrying
    ``postings_dir`` (parquet of ``(id, term, term_fold, tf,
    n_tokens)``, range-partitioned and sorted by ``term_fold``),
    ``terms_dir`` (the ``(term, df)`` stats table), ``n_docs``,
    ``avgdl``, ``id_col``, and ``default_language``.

    Physical shape — the 100 TB design this exists for:

    1. postings filtered by an ``isin`` over the O(query) analyzed
       terms — a PUSHED-DOWN point lookup that parquet min/max footers
       prune to a handful of files (the build sorts by folded term);
    2. one groupBy over those matching postings (bounded by the query
       terms' document frequencies, not the corpus) producing per-doc
       term frequencies + token counts;
    3. the BM25 expression over that bounded frame — idf literals from
       the same term-table point lookup the scan path uses;
    4. one join back to the collection on the unique id (negated terms
       subtract via a left_anti against their own postings lookup;
       phrases filter the joined candidates by raw substring, exactly
       the scan path's predicate).

    No corpus scan, no Python stemmer kernel, no window — query cost is
    O(Σ df(query term)).  Returns the matched frame (original columns +
    ``score_col``) or **None when the postings path cannot reproduce
    the scan path bit-for-bit**, in which case the caller falls back to
    :func:`text_match_frame`:

    - no ``postings_dir`` in the index (pre-round-9 index, or the
      collection had no unique id at build time);
    - ``$caseSensitive`` (postings store the case-folded analysis);
    - a query ``$language`` that differs from the index's analyzer;
    - no positive analyzed terms (phrase words that are all stopwords,
      or negation-only — the scan path's corpus predicates apply).

    Score parity with the scan path is exact: same analyzed terms in
    the same sorted order, same idf lookups, same float-sum
    association — differential-tested in tests/test_round9.py.  Row
    ORDER is not preserved (the join shuffles); Mongo makes no order
    guarantee for unsorted $text matches either.
    """
    postings_dir = index.get("postings_dir")
    if not postings_dir or not _postings_enabled(df.sparkSession):
        return None
    index_language = index.get("default_language", "none") or "none"
    if index_language == "en":
        index_language = "english"
    q = _analyze_text_spec(spec, index_language)
    if q.case_sensitive or q.language != index_language:
        return None
    if not q.terms:
        return None  # phrase-only/negation-only: corpus predicate
    id_col = index.get("id_col", "_id")
    text_col = index.get("path", "text")
    if id_col not in df.columns or text_col not in df.columns:
        return None

    n_docs = int(index["n_docs"])
    avgdl = float(index["avgdl"])
    if n_docs == 0 or avgdl == 0.0:
        return df.where(F.lit(False)).withColumn(score_col, F.lit(0.0))

    spark = df.sparkSession
    postings = _postings_frame(spark, index)
    tcol = "term_fold" if q.folding else "term"
    qterm = (
        (lambda t: _fold_py(t.lower())) if q.folding
        else (lambda t: t.lower())
    )
    # q.score_terms already lowered+folded+deduped+sorted; for the
    # non-case-sensitive path it equals {qterm(t) for t in q.terms}
    qterms = q.score_terms

    # idf literals: the SAME term-table point lookup the scan path's
    # stats_loader performs (folded terms absent from the raw term
    # table read df=0 → maximal idf, matching the documented
    # scan-with-index behavior)
    # round 11 (ADVICE fix): under diacritic folding the SCORE lookup
    # keys folded terms against the raw term column (df=0 → maximal
    # idf, the documented scan-with-index parity), but the COST gate
    # must not inherit that zero — Σ df would read 0 and the gate would
    # never decline stopword-hot folded queries. Gate on the unfolded
    # lowered terms' dfs instead (one combined bounded lookup).
    cost_terms = list(qterms)
    lookup_terms = set(qterms)
    if q.folding:
        cost_terms = sorted({t.lower() for t in q.terms})
        lookup_terms |= set(cost_terms)
    rows = terms_lookup_rows(spark, index["terms_dir"], list(lookup_terms))
    df_map = {r["term"]: r["df"] for r in rows}
    if not _postings_cost_ok(
        spark,
        sum(int(df_map.get(t, 0)) for t in cost_terms),
        n_docs,
        index_language,
    ):
        return None  # stopword-hot terms: the single scan is cheaper

    tf_aggs = [
        F.sum(
            F.when(F.col(tcol) == F.lit(t), F.col("tf")).otherwise(F.lit(0))
        ).alias(f"__tf{i}")
        for i, t in enumerate(qterms)
    ]
    cand = (
        postings.where(F.col(tcol).isin(list(qterms)))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(F.max("n_tokens").alias("__ntok"), *tf_aggs)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("__ntok").cast("double") / F.lit(avgdl)
    )
    score = None
    for i, t in enumerate(qterms):
        dfi = int(df_map.get(t, 0))
        idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
        tf = F.col(f"__tf{i}").cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    cand = cand.select("__postkey", score.alias(score_col))

    if q.negated:
        neg_terms = sorted({qterm(t) for t in q.negated})
        if neg_terms:
            neg = (
                postings.where(F.col(tcol).isin(neg_terms))
                .select(F.col("id").alias("__negkey"))
                .distinct()
            )
            cand = cand.join(
                neg, cand["__postkey"] == neg["__negkey"], "left_anti"
            )

    out = df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")

    # phrases: the scan path's raw-substring predicate, evaluated only
    # over the bounded candidate set
    for p in q.phrases:
        body = (
            _fold_col(F.lower(F.col(text_col))) if q.folding
            else F.lower(F.col(text_col))
        )
        out = out.where(body.contains(F.lit(qterm(p))))
    return out


def search_text_postings(
    df: DataFrame,
    terms: list[str],
    path: str,
    index: Mapping[str, Any],
    score_field: str = "score",
    k1: float = 1.2,
    b: float = 0.75,
    raw: bool = False,
    field: str | None = None,
) -> DataFrame | None:
    """The ``$search`` ``text`` operator answered from a persisted
    inverted postings table (round 9) — same physical shape as
    :func:`text_match_postings` (pushed-down term point lookup, one
    bounded groupBy, one join back) but with the $search surface's
    semantics: ``terms`` arrive ALREADY analyzed (duplicates preserved —
    ``bm25_score_expr`` scores a repeated query term twice, so the sum
    here iterates the same list in the same order for bit parity), the
    match predicate is "any analyzed term present" (score > 0), and no
    diacritic folding applies (parity with the scan path's unfolded
    token stream).  Returns the matched frame (df columns +
    ``score_field`` carrying the raw BM25 — callers apply Atlas
    boost/constant score options on top), or None when the index can't
    serve this operator (no postings, path mismatch, or the collection
    frame lacks the id column). ``raw=True`` (round 11) answers from a
    stemmed index's RAW-TOKEN SIDECAR — the moreLikeThis route, whose
    extracted terms are raw lowered tokens; idf still resolves from
    the analyzed term table, the scan path's stats_loader contract.

    ``field`` (round 12): serve from a WEIGHTED multi-field index's
    field-tagged tables by filtering every lookup to ``WHERE field =
    <field>`` — the postings then behave exactly like a single-field
    index for that field (the caller supplies the field's own avgdl in
    the adapted ``index`` mapping)."""
    postings_dir = index.get("postings_dir")
    if not postings_dir or not terms or not _postings_enabled(df.sparkSession):
        return None
    if raw and not (
        index.get("raw_postings_dir") and index.get("raw_terms_dir")
    ):
        return None
    if str(index.get("path", "text")) != path:
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    n_docs = int(index["n_docs"])
    avgdl = float(index["avgdl"])
    if n_docs == 0 or avgdl == 0.0:
        return df.where(F.lit(False)).withColumn(score_field, F.lit(0.0))

    spark = df.sparkSession
    distinct = list(dict.fromkeys(terms))
    rows = terms_lookup_rows(
        spark, index["terms_dir"], [t.lower() for t in distinct], field=field
    )
    df_map = {r["term"]: r["df"] for r in rows}
    if raw:
        # mirror the phrase/autocomplete paths: a weighted index's
        # raw terms table is field-tagged, and the cost gate must
        # sum df for the queried field only (round-13 ADVICE —
        # latent until moreLikeThis routes through the field view)
        cost = terms_df_sum(
            spark, index["raw_terms_dir"], list(distinct), field=field
        )
        cost_lang = "none"
    else:
        cost = sum(int(v) for v in df_map.values())
        cost_lang = str(index.get("default_language", "none") or "none")
    if not _postings_cost_ok(spark, int(cost), n_docs, cost_lang):
        return None  # stopword-hot terms: the single scan is cheaper

    postings = _postings_frame(spark, index, raw=raw)
    if field is not None:
        postings = postings.where(F.col("field") == F.lit(field))
    tf_aggs = [
        F.sum(
            F.when(F.col("term") == F.lit(t), F.col("tf")).otherwise(F.lit(0))
        ).alias(f"__tf{i}")
        for i, t in enumerate(distinct)
    ]
    cand = (
        postings.where(F.col("term").isin(distinct))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(F.max("n_tokens").alias("__ntok"), *tf_aggs)
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("__ntok").cast("double") / F.lit(avgdl)
    )
    slot = {t: i for i, t in enumerate(distinct)}
    score = None
    for t in terms:  # ORIGINAL order incl. duplicates (see docstring)
        dfi = int(df_map.get(t, 0))
        idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
        tf = F.col(f"__tf{slot[t]}").cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    cand = cand.select("__postkey", score.alias(score_field))
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def search_text_postings_multi(
    df: DataFrame,
    terms: list[str],
    fields: list[str],
    index: Mapping[str, Any],
    score_field: str = "score",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame | None:
    """Atlas MULTI-path ``text`` (``path: [f1, f2, …]``) answered from
    a WEIGHTED index's field-tagged postings (round 12): one
    pushed-down term lookup across the requested fields, one bounded
    groupBy pivoting (field × term) tf cells, score = Σ per-field BM25
    in the REQUEST's field order with each field's own stats — the
    inline multi-path compile's float-sum association exactly
    ($search text over a path list is an UNWEIGHTED sum; the index's
    legacy $text weights do not apply here). A candidate with no
    postings in some field contributes 0 for it, as the scan's
    ``coalesce(bm25, 0)`` does. None when the postings can't serve
    the shape (same rules as :func:`search_text_postings`)."""
    postings_dir = index.get("postings_dir")
    if not postings_dir or not terms or not fields or not _postings_enabled(
        df.sparkSession
    ):
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    fmeta = index.get("fields") or {}
    if any(f not in fmeta for f in fields):
        return None
    n_docs = int(index["n_docs"])
    if n_docs == 0:
        return df.where(F.lit(False)).withColumn(score_field, F.lit(0.0))
    favg = {
        f: float((fmeta.get(f) or {}).get("avgdl") or 0.0) for f in fields
    }

    spark = df.sparkSession
    distinct = list(dict.fromkeys(terms))
    rows = sidecar_rows(
        spark,
        str(index["terms_dir"]),
        isin={
            "field": [str(f) for f in dict.fromkeys(fields)],
            "term": [t.lower() for t in distinct],
        },
    )
    if rows is None:
        rows = (
            spark.read.parquet(str(index["terms_dir"]))
            .where(
                F.col("field").isin([str(f) for f in dict.fromkeys(fields)])
                & F.col("term").isin([t.lower() for t in distinct])
            )
            .collect()
        )
    df_map = {(r["field"], r["term"]): r["df"] for r in rows}
    cost = sum(int(v) for v in df_map.values())
    cost_lang = str(index.get("default_language", "none") or "none")
    if not _postings_cost_ok(spark, int(cost), n_docs, cost_lang):
        return None

    postings = _postings_frame(spark, index).where(
        F.col("field").isin(list(dict.fromkeys(fields)))
    )
    aggs: list = []
    for fi, fname in enumerate(fields):
        aggs.append(
            F.max(
                F.when(F.col("field") == F.lit(fname), F.col("n_tokens"))
            ).alias(f"__ntok{fi}")
        )
        for ti, t in enumerate(distinct):
            aggs.append(
                F.sum(
                    F.when(
                        (F.col("field") == F.lit(fname))
                        & (F.col("term") == F.lit(t)),
                        F.col("tf"),
                    ).otherwise(F.lit(0))
                ).alias(f"__tf{fi}_{ti}")
            )
    cand = (
        postings.where(F.col("term").isin(distinct))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    slot = {t: i for i, t in enumerate(distinct)}
    score = None
    for fi, fname in enumerate(fields):  # REQUEST order (float parity)
        if favg[fname] == 0.0:
            # the scan's bm25_score_expr contributes 0.0 likewise
            part_f = F.lit(0.0)
        else:
            norm = F.lit(k1) * (
                F.lit(1.0 - b)
                + F.lit(b)
                * F.coalesce(F.col(f"__ntok{fi}"), F.lit(0)).cast("double")
                / F.lit(favg[fname])
            )
            fscore = None
            for t in terms:  # ORIGINAL order incl. duplicates
                dfi = int(df_map.get((fname, t), 0))
                idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
                tf = F.col(f"__tf{fi}_{slot[t]}").cast("double")
                p = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
                fscore = p if fscore is None else fscore + p
            part_f = fscore
        score = part_f if score is None else score + part_f
    cand = cand.select("__postkey", score.alias(score_field)).where(
        F.col(score_field) > 0
    )
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def term_positions(toks, term: str):
    """0-based positions of ``term`` in a token-array column — the
    scan-path twin of the postings table's stored ``positions`` (round
    10): both sides of the phrase differential compute the same
    predicate over the same numbers."""
    idx = F.transform(
        toks, lambda w, i: F.when(w == F.lit(term), i)
    )
    return F.filter(idx, lambda x: x.isNotNull())


def phrase_positions_pred(pos_cols: list, slop: int):
    """Ordered sloppy-phrase predicate over per-term position arrays:
    ∃ p₁<p₂<…<p_k (one from each term's array, in phrase order) with
    span p_k − p₁ − (k−1) ≤ ``slop``.  ``slop=0`` is exact adjacency —
    identical to the word-boundary regex the scan path uses (tokens
    are whitespace-split, so a regex match aligns with a token run).
    Round 11: slop>0 defaults to the Lucene move-distance semantics
    (:func:`phrase_positions_pred_unordered`); THIS in-order variant
    remains behind the ``$search phrase`` ``ordered: true`` option and
    serves the slop=0 / sequential-autocomplete paths, where the two
    semantics coincide.

    Compiles to k nested EXISTS higher-order functions — pure Column,
    O(Π tf) per row worst case, evaluated only over bounded phrase
    candidates (docs containing every phrase term)."""
    k = len(pos_cols)
    if k == 0:
        return F.lit(False)
    if k == 1:
        return F.size(pos_cols[0]) > 0
    budget = slop + k - 1

    def rest(i, p_prev, p0):
        if i == k:
            return F.lit(True)
        return F.exists(
            pos_cols[i],
            lambda p: (p > p_prev)
            & ((p - p0) <= F.lit(budget))
            & rest(i + 1, p, p0),
        )

    return F.exists(pos_cols[0], lambda p0: rest(1, p0, p0))


def phrase_positions_pred_unordered(
    terms: list[str], pos_of: Mapping[str, Any], slop: int
):
    """Lucene-compatible SLOPPY phrase predicate (round 11; VERDICT
    r10 Wrong-list #4): a document matches when the query terms can be
    assigned DISTINCT document positions whose offset-adjusted values
    fit a window of width ``slop`` — max_i(p_i − i) − min_i(p_i − i) ≤
    slop, Lucene's move-distance formulation. Out-of-order terms are
    admitted once the slop covers the transposition cost: query
    "spark data" matches a document saying "data spark" at slop ≥ 2
    (adjusted positions differ by 2), which the ordered predicate
    silently rejected at any slop.

    ``pos_of`` maps each distinct term to its position-array Column.
    Duplicate query terms are exact, not approximate: occurrences of
    the same term are assigned strictly increasing positions, each
    within its own offset-shifted window slice — for interval
    constraints ordered by offset, an increasing assignment exists iff
    ANY valid assignment exists (the intervals are sorted translates
    of one window), so the nested-EXISTS greedy is complete.

    Window starts are enumerated from the union of adjusted position
    values (a minimal window's left edge always touches one), so the
    whole predicate stays pure Column — O(Σtf × Πtf) worst case per
    row, evaluated only over bounded candidates. ``slop=0`` and, for
    two-term phrases, ``slop=1`` coincide with the ordered predicate
    (transposition costs 2)."""
    uniq = list(dict.fromkeys(terms))
    if not uniq:
        return F.lit(False)
    if len(terms) == 1:
        return F.size(pos_of[terms[0]]) > 0
    offsets = {
        t: [i for i, x in enumerate(terms) if x == t] for t in uniq
    }

    def _shift(o: int):
        # single-arg lambda via closure — a default-arg lambda has
        # arity 2 and PySpark would pass the element INDEX as the
        # second argument (the dispatch trap bm25_score documents)
        return lambda p: p - F.lit(o)

    adj = [
        F.transform(pos_of[t], _shift(o))
        for t in uniq
        for o in offsets[t]
    ]
    cands = F.array_distinct(F.concat(*adj)) if len(adj) > 1 else adj[0]

    def term_pred(w, t):
        offs = offsets[t]

        def rest(j, prev):
            if j == len(offs):
                return F.lit(True)
            o = offs[j]  # local per recursion level — safe to close over
            return F.exists(
                pos_of[t],
                lambda p: (p > prev)
                & (p >= w + F.lit(o))
                & (p <= w + F.lit(o + slop))
                & rest(j + 1, p),
            )

        return rest(0, F.lit(-1))

    def window_ok(w):
        pred = None
        for t in uniq:
            tp = term_pred(w, t)
            pred = tp if pred is None else pred & tp
        return pred

    return F.exists(cands, window_ok)


def search_phrase_postings(
    df: DataFrame,
    terms: list[str],
    slop: int,
    path: str,
    index: Mapping[str, Any],
    score_field: str = "score",
    k1: float = 1.2,
    b: float = 0.75,
    ordered: bool = False,
    field: str | None = None,
) -> DataFrame | None:
    """The ``$search`` ``phrase`` operator answered from a postings
    table that stores term POSITIONS (round 10): candidates = docs
    carrying every phrase term (pushed-down term lookup + one bounded
    groupBy, the :func:`search_text_postings` shape), adjacency/slop
    decided by :func:`phrase_positions_pred` over the stored position
    arrays, scores = BM25 over the phrase's constituent terms — all
    bit-exact with the scan compile, which previously was the only
    plan (an O(corpus) pass per phrase query).  None when the index
    can't serve it: no positions stored, a non-'none' analyzer (phrase
    terms are raw whitespace-lowered tokens — a stemmed index indexes
    different strings), path mismatch, postings disabled, or the cost
    gate prefers the scan. ``field`` (round 12) filters a weighted
    multi-field index's field-tagged tables to one path — the
    single-field contract over that field."""
    postings_dir = index.get("postings_dir")
    if (
        not postings_dir
        or not index.get("postings_positions")
        or not terms
        or not _postings_enabled(df.sparkSession)
    ):
        return None
    raw = (index.get("default_language", "none") or "none") != "none"
    if raw and not (
        index.get("raw_postings_dir") and index.get("raw_terms_dir")
    ):
        return None  # pre-round-11 stemmed index: scan path serves it
    if str(index.get("path", "text")) != path:
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    n_docs = int(index["n_docs"])
    avgdl = float(index["avgdl"])
    if n_docs == 0 or avgdl == 0.0:
        return df.where(F.lit(False)).withColumn(score_field, F.lit(0.0))

    spark = df.sparkSession
    distinct = list(dict.fromkeys(terms))
    # score idf ALWAYS resolves from the analyzed term table — the scan
    # path's stats_loader does exactly that, and under a stemmed index
    # a raw phrase token absent from the stemmed stems reads df=0
    # (maximal idf), the documented scan-with-index behavior
    rows = terms_lookup_rows(
        spark, index["terms_dir"], list(distinct), field=field
    )
    df_map = {r["term"]: r["df"] for r in rows}
    if raw:
        # the COST gate, by contrast, must see the raw-token document
        # frequencies — the candidates come from the raw sidecar
        cost = terms_df_sum(
            spark, index["raw_terms_dir"], list(distinct), field=field
        )
    else:
        cost = sum(int(v) for v in df_map.values())
    if not _postings_cost_ok(spark, int(cost), n_docs, "none"):
        return None

    aggs: list = [F.max("n_tokens").alias("__ntok")]
    for i, t in enumerate(distinct):
        aggs.append(
            F.max(
                F.when(F.col("term") == F.lit(t), F.col("positions"))
            ).alias(f"__pos{i}")
        )
        aggs.append(
            F.sum(
                F.when(F.col("term") == F.lit(t), F.col("tf")).otherwise(
                    F.lit(0)
                )
            ).alias(f"__tf{i}")
        )
    phrase_postings = _postings_frame(spark, index, raw=raw)
    if field is not None:
        phrase_postings = phrase_postings.where(
            F.col("field") == F.lit(field)
        )
    cand = (
        phrase_postings
        .where(F.col("term").isin(list(distinct)))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    slot = {t: i for i, t in enumerate(distinct)}
    if ordered or not slop:
        # slop=0 is exact adjacency — identical under both semantics,
        # and the ordered nested-EXISTS is the cheaper compile
        pred = phrase_positions_pred(
            [F.col(f"__pos{slot[t]}") for t in terms], int(slop)
        )
    else:
        # round 11 default: Lucene move-distance slop (admits
        # out-of-order terms once slop covers the transposition cost)
        pred = phrase_positions_pred_unordered(
            terms,
            {t: F.col(f"__pos{slot[t]}") for t in distinct},
            int(slop),
        )
    cand = cand.where(F.coalesce(pred, F.lit(False)))
    norm = F.lit(k1) * (
        F.lit(1.0 - b)
        + F.lit(b) * F.col("__ntok").cast("double") / F.lit(avgdl)
    )
    score = None
    for t in terms:  # ORIGINAL order incl. duplicates (bm25 parity)
        dfi = int(df_map.get(t, 0))
        idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
        tf = F.col(f"__tf{slot[t]}").cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    cand = cand.select("__postkey", score.alias(score_field))
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def search_autocomplete_postings(
    df: DataFrame,
    terms: list[str],
    order: str,
    path: str,
    index: Mapping[str, Any],
    score_field: str = "score",
    field: str | None = None,
) -> DataFrame | None:
    """The ``$search`` ``autocomplete`` operator answered from the
    postings table (round 10): every query term must PREFIX some token
    — a ``StartsWith`` filter pushed to the postings scan (the table is
    range-sorted by folded term, so prefix ranges footer-prune) — and
    ``tokenOrder: "sequential"`` additionally requires consecutive hit
    positions, decided by :func:`phrase_positions_pred` over the UNION
    of each prefix's matched-token position arrays. Candidates are
    bounded by Σ df(prefix-matched terms); the same cost gate as the
    term paths sends stopword-hot prefixes back to the scan (Σ df read
    from the term table with one small aggregate — no driver term
    list). Scores are the Atlas constant 1 (edge-gram scores are
    index-internal; the scan compile does the same). A stemmed
    ('english') index serves this through its RAW-TOKEN SIDECAR (round
    11 — query terms are raw lowered tokens, which the sidecar stores
    verbatim). None when the index can't serve it: stemmed without a
    sidecar, path mismatch, postings disabled, sequential without
    stored positions, or the cost gate."""
    postings_dir = index.get("postings_dir")
    if not postings_dir or not terms or not _postings_enabled(df.sparkSession):
        return None
    raw = (index.get("default_language", "none") or "none") != "none"
    if raw and not (
        index.get("raw_postings_dir") and index.get("raw_terms_dir")
    ):
        return None
    if str(index.get("path", "text")) != path:
        return None
    if order == "sequential" and not index.get("postings_positions"):
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    n_docs = int(index["n_docs"])
    if n_docs == 0:
        return df.where(F.lit(False)).withColumn(
            score_field, F.lit(1.0)
        )

    spark = df.sparkSession
    conds = [F.col("term").startswith(F.lit(t)) for t in terms]
    any_cond = conds[0]
    for c in conds[1:]:
        any_cond = any_cond | c
    # round 12: weighted-index field view filters the cost lookup
    sum_df = terms_df_sum(
        spark,
        index["raw_terms_dir"] if raw else index["terms_dir"],
        field=field,
        prefixes=list(terms),
    )
    if not _postings_cost_ok(spark, int(sum_df), n_docs, "none"):
        return None

    aggs: list = []
    for i, cond in enumerate(conds):
        if order == "sequential":
            aggs.append(
                F.sort_array(
                    F.flatten(
                        F.collect_list(F.when(cond, F.col("positions")))
                    )
                ).alias(f"__pos{i}")
            )
        else:
            aggs.append(
                F.max(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(
                    f"__hit{i}"
                )
            )
    ac_postings = _postings_frame(spark, index, raw=raw)
    if field is not None:
        ac_postings = ac_postings.where(F.col("field") == F.lit(field))
    cand = (
        ac_postings
        .where(any_cond)
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    if order == "sequential":
        pred = phrase_positions_pred(
            [F.col(f"__pos{i}") for i in range(len(terms))], 0
        )
    else:
        pred = None
        for i in range(len(terms)):
            one = F.col(f"__hit{i}") == F.lit(1)
            pred = one if pred is None else pred & one
    cand = cand.where(F.coalesce(pred, F.lit(False))).select(
        "__postkey", F.lit(1.0).alias(score_field)
    )
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def search_phrase_postings_multi(
    df: DataFrame,
    terms: list[str],
    slop: int,
    fields: list[str],
    index: Mapping[str, Any],
    score_field: str = "score",
    k1: float = 1.2,
    b: float = 0.75,
    ordered: bool = False,
) -> DataFrame | None:
    """Atlas MULTI-path ``phrase`` (``path: [f1, f2, …]``) answered
    from a WEIGHTED index's field-tagged, positions-bearing postings
    (round 13): candidates come from one pushed-down term lookup
    across the requested fields, the sloppy-phrase position predicate
    runs PER FIELD over each field's own stored position arrays, a
    document matches when ANY field satisfies the phrase, and the
    score is the Σ over matched fields of that field's constituent-
    term BM25 (field avgdl + field-tagged idf) in the REQUEST's field
    order — the inline multi-path compile's float-sum association
    exactly. A stemmed ('english') index serves this through its
    field-tagged raw-token sidecar (phrase terms are raw lowered
    tokens) with idf resolved from the ANALYZED term table, the same
    split as :func:`search_phrase_postings`. None when the postings
    can't serve the shape (no positions, missing sidecar, unindexed
    field, postings disabled, or the cost gate prefers the scan)."""
    postings_dir = index.get("postings_dir")
    if (
        not postings_dir
        or not index.get("postings_positions")
        or not terms
        or not fields
        or not _postings_enabled(df.sparkSession)
    ):
        return None
    raw = (index.get("default_language", "none") or "none") != "none"
    if raw and not (
        index.get("raw_postings_dir") and index.get("raw_terms_dir")
    ):
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    fmeta = index.get("fields") or {}
    if any(f not in fmeta for f in fields):
        return None
    n_docs = int(index["n_docs"])
    if n_docs == 0:
        return df.where(F.lit(False)).withColumn(score_field, F.lit(0.0))
    favg = {
        f: float((fmeta.get(f) or {}).get("avgdl") or 0.0) for f in fields
    }

    spark = df.sparkSession
    distinct = list(dict.fromkeys(terms))
    uniq_fields = list(dict.fromkeys(fields))
    # idf ALWAYS resolves from the analyzed term table — the scan
    # twin's per-field stats lookups do exactly that (under a stemmed
    # index a raw phrase token absent from the stems reads df=0)
    rows = sidecar_rows(
        spark,
        str(index["terms_dir"]),
        isin={
            "field": [str(f) for f in uniq_fields],
            "term": list(distinct),
        },
    )
    if rows is None:
        rows = (
            spark.read.parquet(str(index["terms_dir"]))
            .where(
                F.col("field").isin([str(f) for f in uniq_fields])
                & F.col("term").isin(list(distinct))
            )
            .collect()
        )
    df_map = {(r["field"], r["term"]): r["df"] for r in rows}
    if raw:
        # the COST gate must see the raw-token document frequencies —
        # the candidates come from the raw sidecar
        raw_rows = sidecar_rows(
            spark,
            str(index["raw_terms_dir"]),
            isin={
                "field": [str(f) for f in uniq_fields],
                "term": list(distinct),
            },
            columns=["df"],
        )
        if raw_rows is not None:
            cost = sum(int(r["df"]) for r in raw_rows)
        else:
            cost = (
                spark.read.parquet(str(index["raw_terms_dir"]))
                .where(
                    F.col("field").isin([str(f) for f in uniq_fields])
                    & F.col("term").isin(list(distinct))
                )
                .agg(F.coalesce(F.sum("df"), F.lit(0)).alias("s"))
                .collect()[0]["s"]
            )
    else:
        cost = sum(int(v) for v in df_map.values())
    if not _postings_cost_ok(spark, int(cost), n_docs, "none"):
        return None

    postings = _postings_frame(spark, index, raw=raw).where(
        F.col("field").isin(uniq_fields)
    )
    slot = {t: i for i, t in enumerate(distinct)}
    aggs: list = []
    for fi, fname in enumerate(fields):
        aggs.append(
            F.max(
                F.when(F.col("field") == F.lit(fname), F.col("n_tokens"))
            ).alias(f"__ntok{fi}")
        )
        for ti, t in enumerate(distinct):
            here = (F.col("field") == F.lit(fname)) & (
                F.col("term") == F.lit(t)
            )
            aggs.append(
                F.max(F.when(here, F.col("positions"))).alias(
                    f"__pos{fi}_{ti}"
                )
            )
            aggs.append(
                F.sum(
                    F.when(here, F.col("tf")).otherwise(F.lit(0))
                ).alias(f"__tf{fi}_{ti}")
            )
    cand = (
        postings.where(F.col("term").isin(distinct))
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    pred = None
    score = None
    for fi, fname in enumerate(fields):  # REQUEST order (float parity)
        if ordered or not slop:
            raw_pred = phrase_positions_pred(
                [F.col(f"__pos{fi}_{slot[t]}") for t in terms], int(slop)
            )
        else:
            raw_pred = phrase_positions_pred_unordered(
                terms,
                {t: F.col(f"__pos{fi}_{slot[t]}") for t in distinct},
                int(slop),
            )
        pred_f = F.coalesce(raw_pred, F.lit(False))
        pred = pred_f if pred is None else (pred | pred_f)
        if favg[fname] == 0.0:
            # the scan's bm25_score_expr contributes 0.0 likewise
            part_f = F.lit(0.0)
        else:
            norm = F.lit(k1) * (
                F.lit(1.0 - b)
                + F.lit(b)
                * F.coalesce(F.col(f"__ntok{fi}"), F.lit(0)).cast("double")
                / F.lit(favg[fname])
            )
            fscore = None
            for t in terms:  # ORIGINAL order incl. duplicates
                dfi = int(df_map.get((fname, t), 0))
                idf = math.log(1.0 + (n_docs - dfi + 0.5) / (dfi + 0.5))
                tf = F.col(f"__tf{fi}_{slot[t]}").cast("double")
                p = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
                fscore = p if fscore is None else fscore + p
            # an unmatched field contributes 0 — the scan twin's
            # when(pred_f, bm25).otherwise(0)
            part_f = F.when(pred_f, fscore).otherwise(F.lit(0.0))
        score = part_f if score is None else score + part_f
    cand = cand.where(pred).select(
        "__postkey", score.alias(score_field)
    )
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def search_autocomplete_postings_multi(
    df: DataFrame,
    terms: list[str],
    order: str,
    fields: list[str],
    index: Mapping[str, Any],
    score_field: str = "score",
) -> DataFrame | None:
    """Atlas MULTI-path ``autocomplete`` (``path: [f1, f2, …]``)
    answered from a WEIGHTED index's field-tagged postings (round 13):
    every query term must prefix some token of the SAME field, and a
    document matches when ANY requested field satisfies that (with
    ``tokenOrder: "sequential"`` requiring consecutive hit positions
    within the field) — the per-field AND / cross-field OR the inline
    multi-path compile evaluates. Scores are the Atlas constant 1.
    A stemmed index serves this through its field-tagged raw-token
    sidecar. None when the postings can't serve the shape (same rules
    as :func:`search_autocomplete_postings`)."""
    postings_dir = index.get("postings_dir")
    if (
        not postings_dir
        or not terms
        or not fields
        or not _postings_enabled(df.sparkSession)
    ):
        return None
    raw = (index.get("default_language", "none") or "none") != "none"
    if raw and not (
        index.get("raw_postings_dir") and index.get("raw_terms_dir")
    ):
        return None
    if order == "sequential" and not index.get("postings_positions"):
        return None
    id_col = index.get("id_col", "_id")
    if id_col not in df.columns:
        return None
    fmeta = index.get("fields") or {}
    if any(f not in fmeta for f in fields):
        return None
    n_docs = int(index["n_docs"])
    if n_docs == 0:
        return df.where(F.lit(False)).withColumn(score_field, F.lit(1.0))

    spark = df.sparkSession
    uniq_fields = list(dict.fromkeys(fields))
    conds = [F.col("term").startswith(F.lit(t)) for t in terms]
    any_cond = conds[0]
    for c in conds[1:]:
        any_cond = any_cond | c
    mdir = str(index["raw_terms_dir"] if raw else index["terms_dir"])
    mrows = sidecar_rows(
        spark,
        mdir,
        isin={"field": [str(f) for f in uniq_fields]},
        prefix_any=("term", list(terms)),
        columns=["df"],
    )
    if mrows is not None:
        sum_df = sum(int(r["df"]) for r in mrows)
    else:
        sum_df = (
            spark.read.parquet(mdir)
            .where(F.col("field").isin([str(f) for f in uniq_fields]))
            .where(any_cond)
            .agg(F.coalesce(F.sum("df"), F.lit(0)).alias("s"))
            .collect()[0]["s"]
        )
    if not _postings_cost_ok(spark, int(sum_df), n_docs, "none"):
        return None

    aggs: list = []
    for fi, fname in enumerate(fields):
        for i, cond in enumerate(conds):
            here = (F.col("field") == F.lit(fname)) & cond
            if order == "sequential":
                aggs.append(
                    F.sort_array(
                        F.flatten(
                            F.collect_list(
                                F.when(here, F.col("positions"))
                            )
                        )
                    ).alias(f"__pos{fi}_{i}")
                )
            else:
                aggs.append(
                    F.max(
                        F.when(here, F.lit(1)).otherwise(F.lit(0))
                    ).alias(f"__hit{fi}_{i}")
                )
    ac_postings = _postings_frame(spark, index, raw=raw).where(
        F.col("field").isin(uniq_fields)
    )
    cand = (
        ac_postings.where(any_cond)
        .groupBy(F.col("id").alias("__postkey"))
        .agg(*aggs)
    )
    pred = None
    for fi in range(len(fields)):
        if order == "sequential":
            pred_f = phrase_positions_pred(
                [F.col(f"__pos{fi}_{i}") for i in range(len(terms))], 0
            )
        else:
            pred_f = None
            for i in range(len(terms)):
                one = F.col(f"__hit{fi}_{i}") == F.lit(1)
                pred_f = one if pred_f is None else pred_f & one
        pred_f = F.coalesce(pred_f, F.lit(False))
        pred = pred_f if pred is None else (pred | pred_f)
    cand = cand.where(pred).select(
        "__postkey", F.lit(1.0).alias(score_field)
    )
    return df.join(
        cand, F.col(id_col) == F.col("__postkey"), "inner"
    ).drop("__postkey")


def count_text_postings(
    spark, terms: list[str], index: Mapping[str, Any],
    field: str | None = None,
) -> int | None:
    """``$searchMeta``'s count of documents matching a ``text``
    operator, answered ENTIRELY from the postings table — no corpus
    access at all (round 9): distinct ids among the postings of the
    O(query) analyzed terms.  None when the index carries no
    postings. ``field`` (round 12) filters a weighted multi-field
    index's field-tagged postings to one path."""
    postings_dir = index.get("postings_dir")
    if not postings_dir or not terms or not _postings_enabled(spark):
        return None
    distinct = list(dict.fromkeys(terms))
    postings = _postings_frame(spark, index)
    if field is not None:
        postings = postings.where(F.col("field") == F.lit(field))
    return (
        postings
        .where(F.col("term").isin(distinct))
        .select("id")
        .distinct()
        .count()
    )


def bm25_top_k(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Top-k BM25 matches, deterministically ordered (score desc, id) —
    compiles to TakeOrderedAndProject, no full sort."""
    scored = bm25_score(df, query_terms, id_col, text_col, **kwargs)
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
