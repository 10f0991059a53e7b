"""$text differential fuzzer (round 8, verdict item 8 — the
diacritic/mixed-language leg).

Random corpora of mixed-case, accented, morphologically-varied words x
random ``$text`` specs ($language none/'en'/'english', $caseSensitive,
$diacriticSensitive, positive terms + phrases + negations) checked
against a pure-Python oracle that re-implements the documented
semantics from scratch: tokenization (whitespace vs the english
charset split), stopword removal (case-insensitive), stemming, the
one-to-one diacritic fold, phrase raw-substring matching, negation,
and the match-nothing rules.  The oracle shares only DATA with the
engine (the stopword set, the fold table) plus ``porter2_stem``, which
is itself differential-tested against an independently generated SQL
twin in test_stemmer.py — the tokenizer, analyzer plumbing, predicate
assembly, and fold/case interaction are all independently derived
here.
"""

import os
import random
import re

from anser_spark.operators.ranking import (
    ENGLISH_STOPWORDS,
    _FOLD_TABLE,
    parse_text_search,
    text_match,
)
from anser_spark.functions.stemmer import porter2_stem

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))

# morphological families + stopwords + accent pairs + apostrophes —
# built so query terms hit docs through stemming ('running'~'run'),
# folding ('café'~'cafe'), case ('Spark'~'spark'), or not at all
_VOCAB = [
    "running", "run", "runs", "runner", "ponies", "pony", "query",
    "queries", "data", "data's", "café", "cafe", "cafés", "résumé",
    "resume", "naïve", "naive", "merge", "merged", "merges", "spark",
    "cluster", "clusters", "the", "and", "is", "très", "tres",
]


def _mutate_case(rng, w):
    r = rng.random()
    if r < 0.25:
        return w.upper()
    if r < 0.45:
        return w.capitalize()
    return w


def _gen_doc(rng):
    if rng.random() < 0.06:
        return None
    n = rng.randint(2, 7)
    return " ".join(_mutate_case(rng, rng.choice(_VOCAB)) for _ in range(n))


def _fold(s):
    return s.translate(_FOLD_TABLE)


_EN_SPLIT = re.compile(r"(?:[^\w']|_)+", re.UNICODE)


def _analyze(tokens, language, preserve_case):
    """Oracle twin of the engine's analyzer for a list of raw tokens."""
    out = list(tokens) if preserve_case else [t.lower() for t in tokens]
    if language == "english":
        split = []
        for t in out:
            split.extend(w for w in _EN_SPLIT.split(t) if w)
        out = [
            porter2_stem(t)
            for t in split
            if t.lower() not in ENGLISH_STOPWORDS
        ]
    return out


def _doc_tokens(text, language, case_sensitive, folding):
    if text is None:
        return None
    base = text.strip() if case_sensitive else text.strip().lower()
    if language == "english":
        toks = [t for t in _EN_SPLIT.split(base) if t]
        toks = [t for t in toks if t.lower() not in ENGLISH_STOPWORDS]
        toks = [porter2_stem(t) for t in toks]
    else:
        toks = base.split()
    if folding:
        toks = [_fold(t) for t in toks]
    return toks


def _oracle_match(text, terms, phrases, negated, language,
                  case_sensitive, folding):
    """Pure-Python re-derivation of text_match_frame's predicate."""
    if not case_sensitive:
        qterms = _analyze(terms, language, preserve_case=False)
        qneg = _analyze(negated, language, preserve_case=False)
    elif language == "english":
        qterms = _analyze(terms, language, preserve_case=True)
        qneg = _analyze(negated, language, preserve_case=True)
    else:
        qterms, qneg = list(terms), list(negated)

    if case_sensitive:
        def qt(t):
            return _fold(t) if folding else t
    else:
        def qt(t):
            return _fold(t.lower()) if folding else t.lower()

    if not qterms and not phrases and (qneg or language == "english"):
        return False
    toks = _doc_tokens(text, language, case_sensitive, folding)
    if toks is None:
        return False

    pred = None
    if qterms:
        pred = any(qt(t) in toks for t in qterms)
    for p in phrases:
        hay = text if case_sensitive else text.lower()
        if folding:
            hay = _fold(hay)
        c = qt(p) in hay
        pred = c if pred is None else (pred and c)
    for t in qneg:
        n = qt(t) not in toks
        pred = n if pred is None else (pred and n)
    return bool(pred)


def test_text_diacritic_mixed_language_fuzz(spark):
    rng = random.Random(SEED + 81)
    trials = 8
    for trial in range(trials):
        rows = [(f"d{i}", _gen_doc(rng)) for i in range(40)]
        df = spark.createDataFrame(rows, "_id string, text string")

        # random spec: 1-3 positive terms, maybe a phrase lifted from a
        # live doc, maybe a negation; random language/case/diacritic
        pos = [_mutate_case(rng, rng.choice(_VOCAB))
               for _ in range(rng.randint(1, 3))]
        parts = list(pos)
        phrase = None
        if rng.random() < 0.5:
            src = rng.choice([t for _i, t in rows if t])
            words = src.split()
            k = rng.randint(0, max(0, len(words) - 2))
            phrase = " ".join(words[k:k + 2])
            parts.append(f'"{phrase}"')
        if rng.random() < 0.5:
            parts.append("-" + rng.choice(_VOCAB))
        search = " ".join(parts)

        spec = {"$search": search}
        lang_pick = rng.choice([None, "none", "en", "english"])
        if lang_pick is not None:
            spec["$language"] = lang_pick
        if rng.random() < 0.4:
            spec["$caseSensitive"] = True
        if rng.random() < 0.4:
            spec["$diacriticSensitive"] = True

        language = "english" if lang_pick in ("en", "english") else "none"
        case_sensitive = bool(spec.get("$caseSensitive", False))
        folding = not spec.get("$diacriticSensitive", False)

        pred, _score = text_match(df, spec)
        got = sorted(r["_id"] for r in df.filter(pred).collect())

        terms, phrases, negated = parse_text_search(search)
        exp = sorted(
            i for i, t in rows
            if _oracle_match(t, terms, phrases, negated, language,
                             case_sensitive, folding)
        )
        assert got == exp, (trial, spec, got, exp)
