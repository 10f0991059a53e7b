"""Snowball English ("Porter2") stemmer — pure Python, implemented from
the published algorithm (M.F. Porter, snowballstem.org/algorithms/
english/stemmer.html; the successor of Porter 1980).  This is the
analyzer Mongo's ``$text`` english language uses (via libstemmer), so
implementing it closes the round-7 recall gap the interim s-stemmer
left ('running' now conflates with 'run').

Design notes for the engine:

- ``porter2_stem(word)`` is the single source of truth.  The executor
  side applies it through an Arrow-batched kernel with a per-batch memo
  (natural-language token streams repeat heavily — the memo turns the
  per-token cost into a dict hit); the driver side (query-term
  analysis) calls it directly.  Matching both sides through ONE
  function removes the analyzer-twin drift risk the old
  _s_stem_py/_s_stem_col pair carried.
- ``porter2_sql(expr)`` emits a DuckDB SQL scalar expression computing
  the SAME function, generated from the same suffix tables — the
  correctness-gate oracle runs it inside DuckDB so the driver can
  hash-compare stemmed results end-to-end.  A pytest differential runs
  both over every distinct token in the test corpus plus a curated
  Snowball vector list.

The stemmer expects lowercase input (the analyzer lowercases first;
Mongo's case-sensitive path also stems the case-folded token — see
ranking.py).  Non-ASCII letters pass through untouched (the english
stemmer is defined over a-z; the analyzer's diacritic folding happens
separately).
"""

from __future__ import annotations

__all__ = ["porter2_stem", "porter2_stem_cached", "porter2_sql"]

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

# exceptional forms, applied to the whole word before anything else
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# after step 1a these words stop the algorithm unchanged
_EXCEPTION2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed")
)

# step 2/3/4 suffix → replacement tables, longest-match-first.
# (suffix, replacement, condition) — condition is None, "l" (preceded
# by l), "li" (preceded by a valid li-ending), "st" (preceded by s or
# t), or "R2" (suffix must also be in R2).
_STEP2 = [
    ("ization", "ize", None), ("ational", "ate", None),
    ("fulness", "ful", None), ("ousness", "ous", None),
    ("iveness", "ive", None), ("tional", "tion", None),
    ("biliti", "ble", None), ("lessli", "less", None),
    ("entli", "ent", None), ("ation", "ate", None),
    ("alism", "al", None), ("aliti", "al", None),
    ("ousli", "ous", None), ("iviti", "ive", None),
    ("fulli", "ful", None), ("enci", "ence", None),
    ("anci", "ance", None), ("abli", "able", None),
    ("izer", "ize", None), ("ator", "ate", None),
    ("alli", "al", None), ("bli", "ble", None),
    ("ogi", "og", "l"), ("li", "", "li"),
]
_STEP3 = [
    ("ational", "ate", None), ("tional", "tion", None),
    ("alize", "al", None), ("icate", "ic", None), ("iciti", "ic", None),
    ("ative", "", "R2"), ("ical", "ic", None), ("ness", "", None),
    ("ful", "", None),
]
_STEP4 = [
    ("ement", "", None), ("ance", "", None), ("ence", "", None),
    ("able", "", None), ("ible", "", None), ("ment", "", None),
    ("ant", "", None), ("ent", "", None), ("ism", "", None),
    ("ate", "", None), ("iti", "", None), ("ous", "", None),
    ("ive", "", None), ("ize", "", None), ("ion", "", "st"),
    ("al", "", None), ("er", "", None), ("ic", "", None),
]


def _is_vowel(word: str, i: int) -> bool:
    # capital Y marks a consonant-y (set in the prelude)
    return word[i] in _VOWELS


def _mark_regions(word: str) -> tuple[int, int]:
    """R1 = after the first non-vowel following a vowel (with the
    gener/commun/arsen prefix exception); R2 = same rule applied after
    R1.  Positions are indexes into ``word``; len(word) = null region."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(≠ w,x,Y) at the end, or
    (b) the word is vowel + non-vowel (a 2-letter word)."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n < 3:
        return False
    return (
        not _is_vowel(word, n - 3)
        and _is_vowel(word, n - 2)
        and not _is_vowel(word, n - 1)
        and word[n - 1] not in "wxY"
    )


def _contains_vowel(word: str, start: int, end: int) -> bool:
    return any(_is_vowel(word, i) for i in range(start, end))


# cross-batch stem cache for the executor-side Arrow kernel: worker
# processes are reused across tasks, and natural-language vocabulary is
# Zipf-distributed, so a module-level memo turns most stems into dict
# hits after the first few batches.  Bounded: cleared wholesale at the
# cap (vocabularies that large are adversarial; a reset just re-warms).
_STEM_CACHE: dict[str, str] = {}
_STEM_CACHE_CAP = 250_000


def porter2_stem_cached(word: str) -> str:
    s = _STEM_CACHE.get(word)
    if s is None:
        if len(_STEM_CACHE) >= _STEM_CACHE_CAP:
            _STEM_CACHE.clear()
        s = porter2_stem(word)
        _STEM_CACHE[word] = s
    return s


def porter2_stem(word: str) -> str:
    """Snowball English stem of a lowercase word.  Words of ≤ 2 letters
    and non-a-z-only inputs with no applicable suffix come back
    unchanged; the function never raises on arbitrary strings.

    Words containing an UPPERCASE letter return unchanged: the
    algorithm is defined over lowercase a-z (libstemmer requires the
    caller to fold case first), and the internal capital-Y
    consonant-marker would otherwise corrupt genuine capitals
    ('Yellow' → 'yellow', 'SONY' → 'SONi').  The case-preserving
    ``$caseSensitive`` analyzer depends on this guard — suffix rules
    simply don't fire on 'RUNNING'."""
    if any("A" <= ch <= "Z" for ch in word):
        return word
    # Snowball order (english.sbl: ``exception1 or not hop 3 or (do
    # prelude ...)``, verified round 13 against PostgreSQL's libstemmer
    # build): exception1 matches the RAW token, the ≤2-char early exit
    # counts the raw token too (apostrophes included), and the leading
    # apostrophe strips inside the prelude — so "'a" stays "'a" and
    # "'g'" stems to "g" ("'g'" hops the length gate at 3 chars).
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc
    if len(word) <= 2:
        return word
    if word.startswith("'"):
        word = word[1:]

    # prelude: mark consonant-y as Y (initial y, or y after a vowel —
    # checked against the REWRITTEN previous char, so 'yy' marks only
    # the first)
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _mark_regions(word)

    # step 0: ' / 's / 's'  (longest first)
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if a vowel exists NOT immediately before the s
        if _contains_vowel(word, 0, len(word) - 2):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # step 1b
    step1b_hit = False
    for suf in ("eedly", "eed"):
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + "ee"
            step1b_hit = True
            break
    if not step1b_hit:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _contains_vowel(stem, 0, len(stem)):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _ends_short_syllable(word):
                        # the word is "short": R1 is null AND it ends
                        # in a short syllable → restore e (hop → hope)
                        word += "e"
                break

    # step 1c: y/Y → i when preceded by a non-vowel that isn't the
    # first letter
    if (
        len(word) > 2
        and word[-1] in "yY"
        and not _is_vowel(word, len(word) - 2)
    ):
        word = word[:-1] + "i"

    # step 2 (suffix in R1)
    for suf, rep, cond in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "l":
                    if len(word) > len(suf) and word[-len(suf) - 1] == "l":
                        word = word[: -len(suf)] + rep
                elif cond == "li":
                    if (
                        len(word) > len(suf)
                        and word[-len(suf) - 1] in _LI_ENDING
                    ):
                        word = word[: -len(suf)] + rep
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 3 (suffix in R1; 'ative' additionally in R2)
    for suf, rep, cond in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                if cond == "R2":
                    if len(word) - len(suf) >= r2:
                        word = word[: -len(suf)] + rep
                else:
                    word = word[: -len(suf)] + rep
            break

    # step 4 (suffix in R2)
    for suf, rep, cond in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                if cond == "st":
                    if len(word) > len(suf) and word[-len(suf) - 1] in "st":
                        word = word[: -len(suf)]
                else:
                    word = word[: -len(suf)]
            break

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1
            and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) > 1 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


# ---------------------------------------------------------------------------
# DuckDB SQL compilation — the correctness-gate oracle's twin
# ---------------------------------------------------------------------------
#
# The same algorithm, emitted as ONE scalar SQL expression.  SQL has no
# let-binding, so a naive nested expansion of the 9 sequential passes
# would duplicate each pass's text at every reference and blow up
# exponentially; instead each pass runs inside
# ``list_transform([state], p -> next_state)[1]`` — a single-element
# list lambda IS a let-binder, so every pass's text appears exactly
# once and the whole stemmer is ~15 KB of SQL.  State is a struct
# {w: word, r1, r2, d: early-exit result or NULL}.  A pytest
# differential runs this against :func:`porter2_stem` over the full
# test-corpus vocabulary.

_VOWEL_RE = "[aeiouy]"  # capital Y (consonant marker) intentionally out
_SHORT_RE = "([^aeiouy][aeiouy][^aeiouywxY]|^[aeiouy][^aeiouy])$"


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _in_list(expr: str, values) -> str:
    return f"{expr} IN ({', '.join(_sq(v) for v in values)})"


def _chop(w: str, k: int, add: str = "") -> str:
    """SQL for w[:-k] + add."""
    out = f"substr({w}, 1, length({w}) - {k})"
    return f"({out} || {_sq(add)})" if add else out


def _suffix_case(w: str, r: str, table, region: str) -> str:
    """Longest-match suffix CASE for steps 2/3/4: first (longest)
    matching suffix wins; region/precede conditions failing → no-op."""
    whens = []
    for suf, rep, cond in table:
        k = len(suf)
        guard = f"length({w}) - {k} >= {r}"
        if cond == "l":
            guard += f" AND substr({w}, length({w}) - {k}, 1) = 'l'"
        elif cond == "li":
            guard += (
                f" AND {_in_list(f'substr({w}, length({w}) - {k}, 1)', sorted(_LI_ENDING))}"
            )
        elif cond == "st":
            guard += f" AND substr({w}, length({w}) - {k}, 1) IN ('s', 't')"
        elif cond == "R2":
            # table region is R1; 'ative' additionally needs R2
            guard += f" AND length({w}) - {k} >= {region}"
        whens.append(
            f"WHEN right({w}, {k}) = {_sq(suf)} THEN "
            f"(CASE WHEN {guard} THEN {_chop(w, k, rep)} ELSE {w} END)"
        )
    return f"(CASE {' '.join(whens)} ELSE {w} END)"


def porter2_sql(expr: str) -> str:
    """DuckDB SQL scalar expression computing ``porter2_stem(expr)``.
    ``expr`` must be a varchar expression holding a LOWERCASE token; it
    is referenced exactly once."""
    V = _VOWEL_RE

    def let(value: str, var: str, body: str) -> str:
        return f"list_transform([{value}], {var} -> {body})[1]"

    # ---- P1: exception1/short-word early exit on the RAW token, then
    # prelude (strip leading ', y-mark) — the Snowball order (round 13;
    # see porter2_stem)
    w0 = "CASE WHEN substr(t0, 1, 1) = '''' THEN substr(t0, 2) ELSE t0 END"
    exc1 = " ".join(
        f"WHEN {_sq(k)} THEN {_sq(v)}" for k, v in _EXCEPTION1.items()
    )
    p1 = let(
        w0, "w0",
        "{'w': regexp_replace(CASE WHEN substr(w0, 1, 1) = 'y' "
        "THEN 'Y' || substr(w0, 2) ELSE w0 END, "
        rf"'({V})y', '\1Y', 'g'), "
        f"'d': CASE t0 {exc1} "
        f"ELSE (CASE WHEN length(t0) <= 2 THEN t0 END) END}}",
    )

    # ---- P2: mark R1/R2 (gener/commun/arsen prefix exception)
    m = f"regexp_extract(w, '^.*?{V}[^aeiouy]')"
    r1 = (
        "CASE WHEN substr(w, 1, 5) = 'gener' THEN 5 "
        "WHEN substr(w, 1, 6) = 'commun' THEN 6 "
        "WHEN substr(w, 1, 5) = 'arsen' THEN 5 "
        f"WHEN {m} = '' THEN length(w) ELSE length({m}) END"
    )
    m2 = f"regexp_extract(substr(w, r1x + 1), '^.*?{V}[^aeiouy]')"
    p2 = let(
        "struct_extract(p1, 'w')", "w",
        let(
            r1, "r1x",
            "{'w': w, 'r1': r1x, "
            f"'r2': CASE WHEN {m2} = '' THEN length(w) "
            f"ELSE r1x + length({m2}) END, "
            "'d': struct_extract(p1, 'd')}",
        ),
    )

    def state(body_w: str, extra: str = "") -> str:
        # carry r1/r2/d through a pass that only rewrites w
        return (
            "{'w': " + body_w + ", 'r1': struct_extract(%s, 'r1'), "
            "'r2': struct_extract(%s, 'r2'), 'd': struct_extract(%s, 'd')"
            + extra + "}"
        )

    # ---- P3a: step 0 — longest of 's' / 's / '
    p3a = (
        "CASE WHEN right(w, 3) = '''s''' THEN " + _chop("w", 3)
        + " WHEN right(w, 2) = '''s' THEN " + _chop("w", 2)
        + " WHEN right(w, 1) = '''' THEN " + _chop("w", 1)
        + " ELSE w END"
    )

    # ---- P3b: step 1a
    p3b = (
        "CASE WHEN right(w, 4) = 'sses' THEN " + _chop("w", 2)
        + " WHEN right(w, 3) IN ('ied', 'ies') THEN (CASE WHEN length(w) > 4 "
        f"THEN {_chop('w', 2)} ELSE {_chop('w', 1)} END)"
        + " WHEN right(w, 2) IN ('us', 'ss') THEN w"
        + f" WHEN right(w, 1) = 's' AND regexp_matches(substr(w, 1, "
        f"length(w) - 2), '{V}') THEN {_chop('w', 1)}"
        + " ELSE w END"
    )

    # ---- P3c: exception2 — stop unchanged after step 1a
    p3c_d = (
        "coalesce(struct_extract(s, 'd'), CASE WHEN "
        + _in_list("struct_extract(s, 'w')", sorted(_EXCEPTION2))
        + " THEN struct_extract(s, 'w') END)"
    )

    # ---- P4a: step 1b search (f marks an ed/edly/ing/ingly deletion)
    def vowel_stem(k: int) -> str:
        return f"regexp_matches(substr(w, 1, length(w) - {k} ), '{V}')"

    eed = (
        "WHEN right(w, 5) = 'eedly' THEN (CASE WHEN length(w) - 5 >= r1 "
        f"THEN {_chop('w', 5, 'ee')} ELSE w END) "
        "WHEN right(w, 3) = 'eed' THEN (CASE WHEN length(w) - 3 >= r1 "
        f"THEN {_chop('w', 3, 'ee')} ELSE w END) "
    )
    ed_w, ed_f = [], []
    for suf in ("ingly", "edly", "ing", "ed"):
        k = len(suf)
        cond = f"right(w, {k}) = {_sq(suf)} AND {vowel_stem(k)}"
        ed_w.append(f"WHEN {cond} THEN {_chop('w', k)}")
        ed_f.append(f"WHEN {cond} THEN 1")
    p4a_w = f"CASE {eed}{' '.join(ed_w)} ELSE w END"
    p4a_f = f"CASE {' '.join(ed_f)} ELSE 0 END"

    # ---- P4b: step 1b fixups after deletion
    doubles = _in_list("right(w, 2)", _DOUBLES)
    p4b = (
        "CASE WHEN f = 1 THEN (CASE "
        "WHEN right(w, 2) IN ('at', 'bl', 'iz') THEN (w || 'e') "
        f"WHEN {doubles} THEN {_chop('w', 1)} "
        f"WHEN r1 >= length(w) AND regexp_matches(w, '{_SHORT_RE}') "
        "THEN (w || 'e') "
        "ELSE w END) ELSE w END"
    )

    # ---- P5: step 1c
    p5 = (
        "CASE WHEN length(w) > 2 AND right(w, 1) IN ('y', 'Y') "
        "AND substr(w, length(w) - 1, 1) NOT IN "
        "('a', 'e', 'i', 'o', 'u', 'y') "
        f"THEN ({_chop('w', 1)} || 'i') ELSE w END"
    )

    # ---- P9: step 5 + postlude + early-exit merge
    w1 = _chop("w", 1)
    p9 = (
        "coalesce(struct_extract(s, 'd'), replace("
        "CASE WHEN right(w, 1) = 'e' AND (length(w) - 1 >= r2 OR "
        f"(length(w) - 1 >= r1 AND NOT regexp_matches({w1}, "
        f"'{_SHORT_RE}'))) THEN {w1} "
        "WHEN right(w, 2) = 'll' AND length(w) - 1 >= r2 "
        f"THEN {w1} ELSE w END, 'Y', 'y'))"
    )

    # assemble the pass chain; each pass body binds w/r1/r2 (+f) once
    def wpass(cur: str, body_w: str) -> str:
        # rewrite only w, carrying the rest of the state through
        inner = let(
            "struct_extract(s, 'w')", "w",
            let(
                "struct_extract(s, 'r1')", "r1",
                "{'w': " + body_w + ", 'r1': r1, "
                "'r2': struct_extract(s, 'r2'), "
                "'d': struct_extract(s, 'd')}",
            ),
        )
        return let(cur, "s", inner)

    cur = let("tin", "t0", p1)         # {'w','d'}; tin bound at return
    cur = let(cur, "p1", p2)           # + r1/r2
    cur = wpass(cur, p3a)
    cur = wpass(cur, p3b)
    cur = let(
        cur, "s",
        "{'w': struct_extract(s, 'w'), 'r1': struct_extract(s, 'r1'), "
        "'r2': struct_extract(s, 'r2'), 'd': " + p3c_d + "}",
    )
    # step 1b needs the fired flag alongside the new word
    cur = let(
        cur, "s",
        let(
            "struct_extract(s, 'w')", "w",
            let(
                "struct_extract(s, 'r1')", "r1",
                "{'w': " + p4a_w + ", 'f': " + p4a_f + ", 'r1': r1, "
                "'r2': struct_extract(s, 'r2'), "
                "'d': struct_extract(s, 'd')}",
            ),
        ),
    )
    cur = let(
        cur, "s",
        let(
            "struct_extract(s, 'w')", "w",
            let(
                "struct_extract(s, 'r1')", "r1",
                let(
                    "struct_extract(s, 'f')", "f",
                    "{'w': " + p4b + ", 'r1': r1, "
                    "'r2': struct_extract(s, 'r2'), "
                    "'d': struct_extract(s, 'd')}",
                ),
            ),
        ),
    )
    cur = wpass(cur, p5)
    cur = wpass(cur, _suffix_case("w", "r1", _STEP2, "struct_extract(s, 'r2')"))
    cur = wpass(cur, _suffix_case("w", "r1", _STEP3, "struct_extract(s, 'r2')"))
    cur = wpass(
        cur,
        _suffix_case("w", "struct_extract(s, 'r2')", _STEP4,
                     "struct_extract(s, 'r2')"),
    )
    cur = let(
        cur, "s",
        let(
            "struct_extract(s, 'w')", "w",
            let(
                "struct_extract(s, 'r1')", "r1",
                let("struct_extract(s, 'r2')", "r2", p9),
            ),
        ),
    )
    # uppercase guard — same rule as porter2_stem: the algorithm is
    # defined over lowercase; a capitalized token passes through
    return let(
        expr, "tin",
        f"CASE WHEN regexp_matches(tin, '[A-Z]') THEN tin ELSE {cur} END",
    )
