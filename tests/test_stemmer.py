"""Snowball English (Porter2) stemmer — round 8.

Three layers of evidence:
1. a curated vector list of known Snowball english outputs covering
   every rule family (exceptions, regions, each step);
2. a differential between the Python stemmer and its generated DuckDB
   SQL twin (the correctness-gate oracle) over random words + the test
   corpus vocabulary — the two backends are generated from the same
   suffix tables, and this test pins them together;
3. the engine surface: $text english now conflates 'running'→'run'
   (the r7 recall gap), and $caseSensitive applies the case-preserving
   analyzer (ADVICE r7).
"""

import random
import string

import duckdb
import pytest

from anser_spark.functions.stemmer import porter2_stem, porter2_sql


# Known Snowball english outputs — each comment names the rule exercised
VECTORS = {
    # exception1 + invariants
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "atlas": "atlas", "andes": "andes",
    # exception2 (stop after step 1a)
    "inning": "inning", "outing": "outing", "proceed": "proceed",
    "exceed": "exceed", "succeed": "succeed", "exceeding": "exceed",
    # step 0 (apostrophe suffixes)
    # ('twas: the only vowel sits immediately before the s → 1a keeps it
    "dog's": "dog", "dogs'": "dog", "'twas": "twas",
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "tie",
    "cries": "cri", "caress": "caress", "cats": "cat", "gas": "gas",
    "gaps": "gap", "kiwis": "kiwi", "us": "us", "miss": "miss",
    # step 1b (eed / ed / ing + fixups)
    "agreed": "agre", "feed": "feed", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "failing": "fail", "filing": "file",
    "running": "run", "knitting": "knit", "hoping": "hope",
    # step 1c (y → i)
    "happy": "happi", "cry": "cri", "by": "by", "say": "say",
    "saying": "say", "crying": "cri",
    # step 2
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "format",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    "communism": "communism", "activate": "activ",
    # step 5 + special R1 prefixes
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll", "generate": "generat",
    "generalization": "general", "general": "general",
    "communication": "communic", "arsenal": "arsenal",
    "argument": "argument", "agreement": "agreement",
    # short words / no-ops
    "a": "a", "be": "be", "ran": "ran", "best": "best", "": "",
    # apostrophe edges (round 13, verified against libstemmer via
    # PostgreSQL): exception1 and the ≤2-char exit judge the RAW token;
    # the leading-' strip happens inside the prelude, after both
    "'a": "'a",      # 2 chars raw → untouched, apostrophe and all
    "'g'": "g",      # 3 chars → prelude strips lead ', step 0 the tail
    "'sky": "ski",   # exception1 does NOT match through an apostrophe
    "''s": "",       # prelude ' + step-0 's consume everything
}


def test_porter2_vectors():
    bad = [(w, e, porter2_stem(w)) for w, e in VECTORS.items()
           if porter2_stem(w) != e]
    assert not bad, bad


def test_porter2_libstemmer_vectors():
    """5,877 word→stem pairs frozen from an INDEPENDENT Snowball
    english implementation (PostgreSQL 15's libstemmer build, driven
    through ``ts_lexize`` over a bare snowball dictionary, round 13) —
    corpus vocabulary, curated suffix-family words, the english
    stopword list, and 6k random apostrophe-heavy strings. This breaks
    the generated-twin shared-bug risk the SQL differential alone
    carries: the expected stems came from code that shares nothing
    with ours. (The one excluded shape: words that stem to the empty
    string, where the PG wrapper returns the input instead.)"""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "data", "snowball_vectors.tsv"
    )
    bad = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            w, s = line.rstrip("\n").split("\t")
            got = porter2_stem(w)
            if got != s:
                bad.append((w, s, got))
    assert not bad, (len(bad), bad[:20])


def test_porter2_sql_differential():
    """The generated DuckDB SQL twin must agree with the Python stemmer
    on every input: corpus vocabulary, the vector list, and 6000 random
    apostrophe-heavy strings (seeded)."""
    con = duckdb.connect()
    toks = con.execute("""
      select distinct lower(tok) from (
        select unnest(regexp_split_to_array(text, '[^a-zA-Z0-9'']+')) as tok
        from read_parquet('/root/testdata/sf0.01/documents.parquet')
      ) where tok <> ''
    """).fetchall()
    words = [t[0] for t in toks] + list(VECTORS)
    rng = random.Random(8)
    words += ["".join(rng.choice("abcdefgyY'") for _ in range(rng.randint(1, 12)))
              for _ in range(3000)]
    words += ["".join(rng.choice(string.ascii_lowercase + "'")
                      for _ in range(rng.randint(1, 15)))
              for _ in range(3000)]
    con.execute("create table t(word varchar)")
    con.executemany("insert into t values (?)", [(w,) for w in words])
    got = con.execute(f"select word, {porter2_sql('t.word')} from t").fetchall()
    py = {w: porter2_stem(w) for w in set(words)}
    bad = [(w, py[w], g) for w, g in got if g != py[w]]
    assert not bad, bad[:10]


def test_porter2_never_raises():
    rng = random.Random(99)
    for _ in range(2000):
        w = "".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 10)))
        s = porter2_stem(w.lower())
        assert isinstance(s, str)


# ---------------------------------------------------------------------------
# engine surface
# ---------------------------------------------------------------------------


def _mk(engine, docs):
    c = engine.db("st8").collection("d")
    c.insert_many(docs)
    return c


def _ids(rows):
    return sorted(r["_id"] for r in rows)


def test_text_english_snowball_recall(engine):
    # the r7 gap: 'running' must now match a search for 'run'
    c = _mk(engine, [
        {"_id": 1, "text": "He was running fast."},
        {"_id": 2, "text": "A run in the park."},
        {"_id": 3, "text": "Walking slowly."},
    ])
    got = c.find({"$text": {"$search": "run", "$language": "english"}}).all()
    assert _ids(got) == [1, 2]
    got = c.find({"$text": {"$search": "runs", "$language": "english"}}).all()
    assert _ids(got) == [1, 2]


def test_text_case_sensitive_english_applies_analyzer(engine):
    # ADVICE r7: $caseSensitive must still stem and drop stopwords
    c = _mk(engine, [
        {"_id": 1, "text": "Running the tests"},
        {"_id": 2, "text": "running the tests"},
        {"_id": 3, "text": "RUNNING THE TESTS"},
    ])
    q = {"$text": {"$search": "Running", "$language": "english",
                   "$caseSensitive": True}}
    # 'Running' stems to 'Run' case-preserved; only doc 1 has that case
    assert _ids(c.find(q).all()) == [1]
    q2 = {"$text": {"$search": "running", "$language": "english",
                    "$caseSensitive": True}}
    assert _ids(c.find(q2).all()) == [2]
    # stopword-only query matches nothing even case-sensitively
    q3 = {"$text": {"$search": "The", "$language": "english",
                    "$caseSensitive": True}}
    assert _ids(c.find(q3).all()) == []


# ---------------------------------------------------------------------------
# $text analyzer fuzz (round 8): random accented/case/language shapes vs
# a pure-Python evaluator of Mongo's documented $text semantics.  The
# stemmer itself is shared (pinned independently by the vector list and
# the SQL differential above); the fuzz exercises the COLUMN pipeline —
# tokenization, stopword filtering, folding, case sensitivity, negation.
# ---------------------------------------------------------------------------

import os
import re

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))

_WORDS = ["running", "run", "runs", "pony", "ponies", "dáta", "data",
          "Café", "cafe", "the", "queries", "query", "Tables", "táble",
          "spark", "SPARK", "mérge", "merge"]


def _ref_tokens(text, language, case_sensitive):
    from anser_spark.functions.stemmer import porter2_stem
    from anser_spark.operators.ranking import ENGLISH_STOPWORDS

    if language == "english":
        base = text.strip() if case_sensitive else text.strip().lower()
        toks = [w for w in re.split(r"(?:[^\w']|_)+", base) if w]
        return [porter2_stem(w) for w in toks
                if w.lower() not in ENGLISH_STOPWORDS]
    base = text.strip() if case_sensitive else text.strip().lower()
    return [w for w in base.split() if w]


def _ref_match(text, terms, negated, language, case_sensitive, folding):
    from anser_spark.operators.ranking import _fold_py
    from anser_spark.operators.ranking import analyze_terms

    if language == "english":
        qterms = analyze_terms(terms, "english", preserve_case=case_sensitive)
        qneg = analyze_terms(negated, "english", preserve_case=case_sensitive)
    elif case_sensitive:
        qterms, qneg = terms, negated
    else:
        qterms = [t.lower() for t in terms]
        qneg = [t.lower() for t in negated]
    toks = _ref_tokens(text, language, case_sensitive)
    if folding:
        toks = [_fold_py(t) for t in toks]
        qterms = [_fold_py(t if case_sensitive else t.lower()) for t in qterms]
        qneg = [_fold_py(t if case_sensitive else t.lower()) for t in qneg]
    elif not case_sensitive:
        qterms = [t.lower() for t in qterms]
        qneg = [t.lower() for t in qneg]
    pos = any(t in toks for t in qterms) if qterms else None
    neg = any(t in toks for t in qneg)
    if pos is None:
        # nothing positive left (negation-only or all-stopword query)
        return False
    return pos and not neg


def test_text_analyzer_fuzz(engine):
    rng = random.Random(SEED + 91)
    c = engine.db("txf").collection("docs")
    docs = []
    for i in range(80):
        docs.append({"_id": i,
                     "text": " ".join(rng.choice(_WORDS)
                                      for _ in range(rng.randint(2, 8)))})
    c.insert_many(docs)
    for trial in range(10):
        language = rng.choice(["english", "none"])
        case_sensitive = rng.random() < 0.3
        diacritic_sensitive = rng.random() < 0.3
        terms = [rng.choice(_WORDS) for _ in range(rng.randint(1, 3))]
        negated = [rng.choice(_WORDS)] if rng.random() < 0.4 else []
        search = " ".join(terms + ["-" + n for n in negated])
        spec = {"$search": search}
        if language == "english":
            spec["$language"] = "english"
        if case_sensitive:
            spec["$caseSensitive"] = True
        if diacritic_sensitive:
            spec["$diacriticSensitive"] = True
        try:
            got = sorted(r["_id"] for r in c.find({"$text": spec}).all())
        except ValueError:
            # no searchable terms after negation-only parse — skip shape
            continue
        exp = sorted(d["_id"] for d in docs
                     if _ref_match(d["text"], terms, negated, language,
                                   case_sensitive,
                                   not diacritic_sensitive))
        assert got == exp, (trial, spec, got[:10], exp[:10])


def test_porter2_uppercase_guard():
    # the algorithm is defined over lowercase; mixed-case tokens pass
    # through UNCHANGED (review round 8: the capital-Y consonant marker
    # corrupted genuine capitals: 'Yellow'->'yellow', 'SONY'->'SONi')
    from anser_spark.functions.stemmer import porter2_stem

    for w in ("Yellow", "SONY", "DAY", "NYC", "RUNNING", "Apple"):
        assert porter2_stem(w) == w, w
    assert porter2_stem("yellow") == "yellow"
    assert porter2_stem("running") == "run"


def test_porter2_sql_uppercase_guard_parity():
    import duckdb

    from anser_spark.functions.stemmer import porter2_sql, porter2_stem

    words = ["Yellow", "SONY", "DAY", "RUNNING", "Apple", "running",
             "ponies", "McDonald", "iPhone", "'Twas"]
    sql = porter2_sql("w")
    got = dict(duckdb.execute(
        f"SELECT w, {sql} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall())
    for w in words:
        assert got[w] == porter2_stem(w), (w, got[w], porter2_stem(w))
