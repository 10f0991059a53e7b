"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All pure Column expressions (JVM-side, whole-stage codegen, no Python
UDFs) — at 100 TB these run at scan speed and never shuffle unless the
caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count_col",
    "with_token_count",
    "with_quality_score",
    "quality_metrics",
    "with_language_id",
    "with_fingerprint",
    "winnow_fingerprints_col",
    "with_winnow_fingerprints",
    "winnow_similarity_col",
    "text_stats",
    "text_profile",
    "repetition_metrics",
    "scrub_pii",
    "pii_metrics",
    "chunk_documents",
    "LANG_STOPWORDS",
    "gopher_rules",
    "PII_PATTERNS",
]


#: (key → built Column / Column bundle). Unresolved Column expressions
#: are immutable and session-independent, and each composite builder
#: here costs tens-to-hundreds of py4j round trips (~0.5ms each) per
#: construction — the profile gates rebuild them on every invocation
#: (round 14, guide §1.2). Keys carry the FULL parameterization.
_EXPR_MEMO: dict = {}


def _memo(key, build):
    val = _EXPR_MEMO.get(key)
    if val is None:
        val = build()
        if len(_EXPR_MEMO) > 2048:
            _EXPR_MEMO.clear()
        _EXPR_MEMO[key] = val
    return val


def token_count_col(text: Column) -> Column:
    """Whitespace tokenization; empty string → 0 tokens."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish sub-word proxy: split on whitespace AND word/punct
    boundaries (letters runs, digit runs, single punct), the standard
    cheap stand-in for tokenizer-based counts."""
    return F.size(
        F.filter(
            F.split(text, r"(?<=\W)|(?=\W)"),
            lambda t: F.trim(t) != "",
        )
    )


def with_token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(
        out,
        _memo(("tokcount", text_col), lambda: token_count_col(F.col(text_col))),
    )


# ~10 high-frequency stopwords per language; enough signal for a
# coarse n-gram/stopword language-ID heuristic on word-salad text.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "人", "这"],
}


def _stopword_hits(text: Column, words: list[str]) -> Column:
    """Count of stopword occurrences, as whole words."""
    pattern = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(1)))


def with_language_id(df: DataFrame, text_col: str = "text", out: str = "lang_id") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language whole-word
    stopword hit counts; 'und' (undetermined) when no hits at all."""

    def build():
        text = F.col(text_col)
        hits = {
            lang: _stopword_hits(text, words)
            for lang, words in LANG_STOPWORDS.items()
        }
        best = F.greatest(*hits.values())
        expr = F.lit("und")
        # iterate in fixed order; first language reaching the max wins
        for lang in reversed(list(LANG_STOPWORDS)):
            expr = F.when(
                (hits[lang] == best) & (best > 0), F.lit(lang)
            ).otherwise(expr)
        return expr

    return df.withColumn(out, _memo(("langid", text_col), build))


def with_quality_score(df: DataFrame, text_col: str = "text", out: str = "quality") -> DataFrame:
    """Composite [0,1] quality heuristic: length band, punctuation ratio,
    stopword ratio, mean word length band — the standard cheap filters a
    pretraining pipeline applies before expensive scoring."""

    def build():
        text = F.col(text_col)
        n_chars = F.length(text)
        n_tokens = token_count_col(text)
        n_punct = F.length(text) - F.length(
            F.regexp_replace(text, r"[\p{Punct}]", "")
        )
        punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
        all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
        stop_ratio = F.when(
            n_tokens > 0, _stopword_hits(text, all_stop) / n_tokens
        ).otherwise(F.lit(0.0))
        mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
        length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
        punct_score = F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
        word_len_score = F.when(
            (mean_word_len >= 3) & (mean_word_len <= 12), 1.0
        ).otherwise(0.3)
        stop_score = F.least(stop_ratio * 3, F.lit(1.0))
        return F.round(
            length_score * 0.3 + punct_score * 0.2
            + word_len_score * 0.3 + stop_score * 0.2,
            6,
        )

    return df.withColumn(out, _memo(("quality", text_col), build))


def _quality_component_cols(text: Column) -> dict[str, Column]:
    """The SQL-expressible quality components, shared by
    quality_metrics and text_profile so both emit identical values."""
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[\p{Punct}]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return {
        "punct_ratio": F.round(punct_ratio, 4),
        "mean_word_len": F.round(mean_word_len, 4),
        "length_score": F.round(length_score, 4),
        "en_stop_hits": _stopword_hits(text, LANG_STOPWORDS["en"]),
    }


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The SQL-expressible components of the quality heuristic as
    individual columns (n_tokens, punct_ratio, mean_word_len,
    length_score, en_stop_hits) — the value-hash-oracle-able subset of
    with_quality_score (whose composite weighting stays heuristic)."""
    cols = _memo(
        ("quality_metrics", text_col),
        lambda: [
            token_count_col(F.col(text_col)).alias("n_tokens"),
            *[
                c.alias(name)
                for name, c in _quality_component_cols(F.col(text_col)).items()
            ],
        ],
    )
    return df.select(*df.columns, *cols)


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher/MassiveText repetition-free quality RULES as boolean
    flags plus the conjunctive ``gopher_keep`` (Rae et al. 2021 §A1.1
    heuristics, the standard pretraining pre-filter):

    - word count in [min_words, max_words]
    - mean word length in [min_mean_word_len, max_mean_word_len]
    - symbol-to-word ratio (#, …, ...) ≤ max_symbol_ratio
    - ≤ max_bullet_frac of lines start with a bullet, ≤
      max_ellipsis_frac end with an ellipsis
    - ≥ min_alpha_frac of words contain an alphabetic character
    - ≥ min_stop_hits stop-word occurrences

    Pure Column arithmetic — ONE scan, zero shuffles, zero Python; at
    100 TB this is a map-only pass the scan fuses with projections.
    (The defaults lower min_words vs the paper's 50 so synthetic short
    docs exercise both branches; thresholds are parameters.)

    The word/line arrays are materialized ONCE per row as hidden
    columns and every rule references them (round 14): the inline form
    re-split the text per rule reference — ~15 tokenizations per row —
    and the conjunctive ``gopher_keep``, built from the rule
    EXPRESSIONS, re-inlined all of them a second time (~30 total).
    Rules now land in one projection and ``gopher_keep`` ANDs the rule
    COLUMNS; values are bit-identical."""
    bundle = _memo(
        (
            "gopher", text_col, min_words, max_words, min_mean_word_len,
            max_mean_word_len, max_symbol_ratio, max_bullet_frac,
            max_ellipsis_frac, min_alpha_frac, min_stop_hits,
        ),
        lambda: _gopher_exprs(
            text_col, min_words, max_words, min_mean_word_len,
            max_mean_word_len, max_symbol_ratio, max_bullet_frac,
            max_ellipsis_frac, min_alpha_frac, min_stop_hits,
        ),
    )
    hidden, flag_cols, keep = bundle
    prepared = df.withColumns(hidden)
    out = prepared.withColumns(flag_cols)
    return out.withColumn("gopher_keep", keep).drop(
        "__gopher_words", "__gopher_lines"
    )


def _gopher_exprs(
    text_col: str,
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_alpha_frac: float,
    min_stop_hits: int,
):
    """Build gopher_rules' Column bundle (hidden cols, coalesced rule
    flags, keep conjunction) — memoized per full parameterization."""
    text = F.col(text_col)
    words = F.col("__gopher_words")
    lines_col = F.col("__gopher_lines")
    n_words = F.size(words)
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0.0), lambda acc, w: acc + F.length(w)
        ) / n_words,
    ).otherwise(F.lit(0.0))
    # symbol OCCURRENCES (#, "...", "\u2026") per the paper's ratio
    n_symbols = (
        (F.length(text) - F.length(F.regexp_replace(text, r"#", "")))
        + (F.size(F.split(text, r"\.\.\.")) - F.lit(1))
        + (F.size(F.split(text, "\u2026")) - F.lit(1))
    )
    lines = lines_col
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[\u2022\-\*]"))
        ) / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"(\.\.\.|\u2026)$"),
            )
        ) / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    stop_hits = _stopword_hits(text, all_stop)

    rules = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": F.when(
            n_words > 0, n_symbols / n_words <= max_symbol_ratio
        ).otherwise(F.lit(False)),
        "rule_bullets": bullet_frac <= max_bullet_frac,
        "rule_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "rule_alpha_words": alpha_frac >= min_alpha_frac,
        "rule_stopwords": stop_hits >= min_stop_hits,
    }
    hidden = {
        "__gopher_words": _word_array(text),
        "__gopher_lines": F.filter(
            F.split(text, r"\n"), lambda ln: F.trim(ln) != ""
        ),
    }
    flag_cols = {
        name: F.coalesce(col, F.lit(False)) for name, col in rules.items()
    }
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return hidden, flag_cols, keep


def with_fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """64-bit content fingerprint over normalized text (case-folded,
    whitespace-collapsed) — the exact-dedup key."""
    return df.withColumn(
        out,
        _memo(
            ("fingerprint", text_col),
            lambda: F.xxhash64(
                F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
            ),
        ),
    )


def winnow_fingerprints_col(
    text: Column, k: int = 8, w: int = 4, hash_chars: int = 16
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 — the MOSS algorithm): the standard local fingerprinting
    scheme whose selected-hash SET is guaranteed to overlap for any two
    documents sharing a substring of length ≥ ``k + w - 1``.

    Pipeline, all inside ONE pure-Column expression (no shuffle, no
    Python — per-row work parallelizes with the scan):

      1. normalize: case-fold + strip every non-alphanumeric char, so
         fingerprints are whitespace/punctuation-insensitive;
      2. hash every character ``k``-gram → first ``hash_chars`` hex
         digits of md5 (md5 chosen deliberately: DuckDB computes the
         identical digest, making the whole operator value-hash
         oracle-able end to end);
      3. slide a window of ``w`` consecutive hashes, keeping each
         window's minimum (lexicographic on hex = order on the digest);
      4. distinct + sort → the document's fingerprint set.

    Returns an ``array<string>`` column. Documents whose normalized
    text has fewer than ``k`` chars fingerprint to an empty array; with
    fewer than ``w`` k-grams a single window over all of them still
    yields one fingerprint (the winnowing guarantee: every non-trivial
    doc is represented).

    .. warning:: This one-Column form is the SEMANTIC SPEC, fine for
       short strings and unit tests.  On real documents use
       :func:`with_winnow_fingerprints`: higher-order-function lambdas
       evaluate interpreted, re-computing the inlined normalization and
       gram array PER ELEMENT — O(len²) — where the DataFrame form
       materializes them once per row and stays O(len·w).
    """
    # null text fingerprints to the empty set (coalesce before length:
    # greatest() ignores nulls, so an unguarded null would otherwise
    # flow through sequence/md5 into a [null] fingerprint array)
    norm = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), "[^a-z0-9]+", "")
    m = F.length(norm) - F.lit(k) + F.lit(1)  # number of k-grams
    grams = F.when(m < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
            lambda i: F.substring(F.md5(norm.substr(i, F.lit(k))), 1, hash_chars),
        )
    )
    n_windows = F.greatest(m - F.lit(w) + F.lit(1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(grams, j, w)),
    )
    return F.when(m < 1, F.array().cast("array<string>")).otherwise(
        F.array_sort(F.array_distinct(mins))
    )


def with_winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    out: str = "fingerprints",
    k: int = 8,
    w: int = 4,
    hash_chars: int = 16,
) -> DataFrame:
    """DataFrame form of :func:`winnow_fingerprints_col` — USE THIS ON
    REAL DATA.  The one-Column form nests the normalization and the
    k-gram array inside ``transform`` lambdas; Spark evaluates
    higher-order-function lambdas interpreted and re-computes any
    non-attribute subexpression PER ELEMENT, which turns the
    normalization regex and the gram hashing quadratic in document
    length (measured: a single sf0.1 partition ran >12 min; this form
    runs the same data in seconds).  Materializing ``norm`` and
    ``grams`` as intermediate columns pins them to one evaluation per
    row — each is referenced more than once downstream, so Catalyst's
    CollapseProject keeps the projections stacked instead of inlining
    the expensive expressions back into the lambdas."""
    norm_c, grams_c = f"__wnorm_{out}", f"__wgrams_{out}"
    df = df.withColumn(
        norm_c,
        F.regexp_replace(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))), "[^a-z0-9]+", ""
        ),
    )
    nc = F.col(norm_c)
    m = F.length(nc) - F.lit(k) + F.lit(1)
    df = df.withColumn(
        grams_c,
        F.when(m < 1, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda i: F.substring(F.md5(nc.substr(i, F.lit(k))), 1, hash_chars),
            )
        ),
    )
    g = F.col(grams_c)
    n_windows = F.greatest(F.size(g) - F.lit(w) + F.lit(1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows), lambda j: F.array_min(F.slice(g, j, w))
    )
    df = df.withColumn(
        out,
        F.when(F.size(g) < 1, F.array().cast("array<string>")).otherwise(
            F.array_sort(F.array_distinct(mins))
        ),
    )
    return df.drop(norm_c, grams_c)


def winnow_similarity_col(a: Column, b: Column) -> Column:
    """Jaccard similarity of two winnowing fingerprint sets — the MOSS
    match score. Pure Column (array_intersect/union on sorted sets)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass per-document stats frame (id columns preserved)."""
    df = with_token_count(df, text_col)
    df = df.withColumn("n_chars_calc", F.length(F.col(text_col)))
    df = with_quality_score(df, text_col)
    df = with_language_id(df, text_col)
    df = with_fingerprint(df, text_col)
    return df


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """text_stats + the quality component metrics fused into ONE
    projection (Catalyst collapses the whole chain into a single
    Project over a single FileScan — no join, no shuffle). At 100 TB
    every extra pass over the documents table is hours of scan time;
    profile-style consumers should use this instead of joining
    text_stats with quality_metrics on the id column."""
    base = text_stats(df, text_col)
    comps = _quality_component_cols(F.col(text_col))
    return base.select(
        *base.columns, *[c.alias(name) for name, c in comps.items()]
    )


def _word_array(text: Column) -> Column:
    """Lower-cased whitespace tokens with empties dropped."""
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 2,
) -> DataFrame:
    """Gopher-style repetition filters: duplicate-word fraction and
    top-n-gram fraction per document (Rae et al. 2021 §A1.1 use these to
    drop boilerplate/spam before pretraining).

    Unigram stats are pure Column HOFs (scan-speed). The top-n-gram
    frequency needs per-(doc, gram) counts, done as explode +
    two-level groupBy — ONE wide shuffle on (id, gram) with map-side
    partial aggregation, then a tiny per-id agg and an id-keyed join
    back. Never O(len²) per document, so arbitrarily long documents are
    safe at 100 TB.
    """
    # NULL text degrades to the same all-zeros row as empty text (size()
    # of a NULL array would otherwise leak NULL into n_tokens while the
    # coalesced fractions read 0.0 — mixed NULL/0 output)
    toks = _memo(
        ("rep_toks", text_col),
        lambda: _word_array(F.coalesce(F.col(text_col), F.lit(""))),
    )
    base = df.select(F.col(id_col), toks.alias("__toks"))

    # Integer outputs are emitted as BIGINT everywhere (F.size is int32,
    # F.sum is int64): a uniform width keeps the frame's serialized form
    # identical to an ANSI-SQL twin, where sum() may widen differently.
    uni = base.select(
        id_col,
        F.size("__toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("long").alias("n_distinct_tokens"),
    )

    n = F.size("__toks")
    starts = F.when(
        n >= ngram_n, F.sequence(F.lit(1), n - ngram_n + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        id_col,
        F.explode(
            F.transform(
                starts,
                lambda i: F.concat_ws(" ", F.slice(F.col("__toks"), i, ngram_n)),
            )
        ).alias("gram"),
    )
    gram_stats = (
        grams.groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_gram_count"), F.sum("c").alias("n_grams"))
    )

    joined = uni.join(gram_stats, id_col, "left")
    n_tok = F.col("n_tokens")
    top_c = (
        F.coalesce(F.col("top_gram_count"), F.lit(0))
        .cast("long")
        .alias("top_gram_count")
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams")
    return joined.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        F.when(n_tok > 0, F.round(1.0 - F.col("n_distinct_tokens") / n_tok, 4))
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        top_c,
        n_grams,
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.round(F.col("top_gram_count") / F.col("n_grams"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("top_gram_frac"),
    )


# (name, regex, replacement) — patterns restricted to syntax with
# identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# ASCII \d, \b, bounded repetition, alternation, character classes.
# The ipv4 octet alternation rejects invalid octets (999.999.999.999
# no longer matches). Known limitation, documented rather than fixed:
# a dotted version string "1.2.3.4.5" still scrubs its "1.2.3.4"
# prefix, because the only guard is a lookaround and RE2 (the DuckDB
# oracle engine) has none — parity with the oracle wins over that edge.
_IPV4_OCTET = r"(25[0-5]|2[0-4]\d|1?\d?\d)"
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", rf"\b{_IPV4_OCTET}(\.{_IPV4_OCTET}){{3}}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text", out: str | None = None) -> DataFrame:
    """Redact emails, IPv4 addresses, and US-style phone numbers with
    typed placeholders — chained regexp_replace, pure Column, scan
    speed. Email runs first so its digits/dots can't be half-eaten by
    the ipv4/phone passes."""
    def build():
        col = F.col(text_col)
        for _, pattern, repl in PII_PATTERNS:
            col = F.regexp_replace(col, pattern, repl)
        return col

    return df.withColumn(out or text_col, _memo(("scrub_pii", text_col), build))


def pii_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document pre-scrub PII match counts (n_emails, n_ipv4,
    n_phones) — the audit half of scrub_pii. Each pattern counts
    independently over the ORIGINAL text (scrub_pii chains replacements
    in order, so e.g. digits inside an email are never re-counted by
    the phone pass there) — overlapping matches can therefore
    double-count in the audit; the counts are a per-category signal,
    not a partition of the text."""
    counts = _memo(
        ("pii_metrics", text_col),
        lambda: [
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
            ).alias(f"n_{name}")
            for name, pattern, _ in PII_PATTERNS
        ],
    )
    return df.select(*df.columns, *counts)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> DataFrame:
    """Split documents into ~``chunk_tokens``-token windows with
    ``overlap`` tokens of context carried between consecutive chunks —
    the standard training-data chunking pass (beyond-reference
    component, same family as sequence packing in operators/packing).

    Output: one row per chunk with (all original columns except the
    text, ``chunk_id`` position, ``chunk_text``, ``chunk_n_tokens``).
    Whitespace tokenization (the engine's token_count_col convention).

    Scale shape: everything is JVM Column work in ONE scan — split once,
    slice each window out of the token array, posexplode. No Python on
    the data path, no shuffle at all (chunking is embarrassingly
    row-local); chunks-per-doc is ceil(n/step), bounded by document
    length, never materialized driver-side. Empty/whitespace-only
    documents yield zero chunks; chunks shorter than ``min_tokens``
    (the final sliver of a document) are dropped.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    n_chunks = F.when(
        n <= F.lit(0), F.lit(0)
    ).otherwise(
        # a doc shorter than the overlap still yields its single chunk
        F.greatest(
            F.ceil((n - F.lit(overlap)) / F.lit(step)).cast("int"), F.lit(1)
        )
    )
    starts = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    chunks = F.when(
        n_chunks > 0,
        F.filter(
            F.transform(
                starts,
                lambda i: F.slice(toks, i * F.lit(step) + 1, chunk_tokens),
            ),
            lambda c: F.size(c) >= F.lit(min_tokens),
        ),
    ).otherwise(F.array().cast("array<array<string>>"))
    keep = [c for c in df.columns if c != text_col]
    # materialize the token/chunk arrays as real columns BEFORE the HOF
    # consumers — interpreted lambdas re-evaluate inlined subexpressions
    # per element (SCALE.md: the O(len²) trap)
    staged = df.select(*df.columns, chunks.alias("__chunks"))
    out = staged.select(
        *keep, F.posexplode("__chunks").alias("chunk_id", "__ctoks")
    )
    return out.select(
        *keep,
        "chunk_id",
        F.array_join("__ctoks", " ").alias("chunk_text"),
        F.size("__ctoks").alias("chunk_n_tokens"),
    )
