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
]


def _tokens(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
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
    terms = [t.lower() for t in query_terms]
    toks = _tokens(text_col)
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
    match predicate.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = _tokens(text_col)

    def _tf(term: str):
        # single-arg lambda via closure: a default-arg lambda would have
        # arity 2 and PySpark would pass the element INDEX as the second
        # argument (the same dispatch trap bm25_score documents)
        return F.size(F.filter(toks, lambda w: w == F.lit(term)))

    tf_exprs = [_tf(t) for t in terms]
    if stats is None:
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.size(toks)).alias("avgdl"),
            *[
                F.sum((tf > 0).cast("long")).alias(f"__df{i}")
                for i, tf in enumerate(tf_exprs)
            ],
        ).collect()[0]
        n_docs, avgdl = agg["n"], float(agg["avgdl"] or 0.0)
        dfs = [agg[f"__df{i}"] for i in range(len(terms))]
    else:
        n_docs, avgdl, df_map = stats
        dfs = [int(df_map.get(t, 0)) for t in terms]
    if n_docs == 0 or avgdl == 0.0:
        return F.lit(0.0)
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.size(toks).cast("double") / F.lit(avgdl)
    )
    score = None
    for i, _t in enumerate(terms):
        idf = math.log(1.0 + (n_docs - dfs[i] + 0.5) / (dfs[i] + 0.5))
        tf = tf_exprs[i].cast("double")
        part = F.lit(idf) * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
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
) -> tuple[F.Column, F.Column]:
    """Legacy ``{$text: {$search: ...}}`` query operator (the find
    surface the reference accepts verbatim, db/interface.go:26) mapped
    onto the BM25 machinery: returns ``(pred, score)`` where ``pred``
    selects matching documents (any positive term, all phrases, no
    negated term) and ``score`` is the BM25 relevance that
    ``{"$meta": "textScore"}`` projections/sorts read.

    ``stats_loader(terms)`` supplies precomputed ``(n_docs, avgdl,
    {term: df})`` — a persistent bm25 search index resolves it with a
    point lookup so no corpus aggregate runs at query time.

    Documented divergences: relevance is BM25 (not Mongo's tf-idf
    weighting — ordering may differ), no stemming or language analyzer
    (``$language`` accepted and ignored beyond validation), and
    ``$diacriticSensitive`` is always effectively True (no folding).
    """
    search = spec.get("$search")
    if not isinstance(search, str) or not search.strip():
        raise ValueError("$text requires a non-empty $search string")
    unknown = set(spec) - {
        "$search", "$caseSensitive", "$language", "$diacriticSensitive"
    }
    if unknown:
        raise ValueError(f"unsupported $text options: {sorted(unknown)}")
    case_sensitive = bool(spec.get("$caseSensitive", False))
    terms, phrases, negated = parse_text_search(search)
    if not terms and not negated:
        raise ValueError(f"$text $search has no searchable terms: {search!r}")

    score_terms = sorted({t.lower() for t in terms})
    if score_terms:
        stats = stats_loader(score_terms) if stats_loader is not None else None
        score = bm25_score_expr(df, score_terms, text_col=text_col, stats=stats)
    else:
        score = F.lit(0.0)  # negation-only query (Mongo returns nothing)

    if case_sensitive:
        toks = F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
        has = lambda term: F.exists(toks, lambda w: w == F.lit(term))  # noqa: E731
        contains = lambda p: F.col(text_col).contains(F.lit(p))  # noqa: E731
    else:
        toks = _tokens(text_col)
        has = lambda term: F.exists(  # noqa: E731
            toks, lambda w: w == F.lit(term.lower())
        )
        contains = lambda p: F.lower(F.col(text_col)).contains(  # noqa: E731
            F.lit(p.lower())
        )

    pred = None
    if terms:
        pos = None
        for t in terms:
            pos = has(t) if pos is None else (pos | has(t))
        pred = pos
    for p in phrases:
        pred = contains(p) if pred is None else (pred & contains(p))
    for t in negated:
        neg = ~F.coalesce(has(t), F.lit(False))
        pred = neg if pred is None else (pred & neg)
    if not terms and negated:
        # Mongo: a $search of only negated terms matches nothing
        pred = F.lit(False)
    return F.coalesce(pred, F.lit(False)), score


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
