"""Collation differential fuzzer (round 8, verdict item 8).

Random en-locale collation specs (strength 1/2/3) x filter/sort/group/
distinct shapes over generated mixed-case accented strings, checked
against a pure-Python ICU model.  The model is exact for the generated
alphabet by construction: each base letter carries at most ONE possible
accent (é à ü ç), so an ICU comparison decomposes into the three
classic levels with no accent-vs-accent or tailoring ambiguity —

    primary   = accent- and case-folded text   (strength 1 key)
    secondary = per-position accent marks       (+ strength 2)
    tertiary  = per-position case bits          (+ strength 3; ICU
                caseFirst=off sorts lowercase first)

Prior coverage was goldens + ASCII differentials; this adds seeded
randomized shapes (>=6 trials x 4 shapes, alternate-seed clean).
"""

import os
import random
import unicodedata

from anser_spark.functions.collation import spark_collation_name, use_collation
from anser_spark.plans.pipeline import compile_pipeline
from anser_spark.plans.query import Query

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))

_ACCENTED = {"e": "é", "a": "à", "u": "ü", "c": "ç"}


def _gen_word(rng):
    base = "".join(rng.choice("abceu") for _ in range(rng.randint(1, 5)))
    out = []
    for ch in base:
        if ch in _ACCENTED and rng.random() < 0.3:
            ch = _ACCENTED[ch]
        if rng.random() < 0.4:
            ch = ch.upper()
        out.append(ch)
    return "".join(out)


def _strip(s):
    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if not unicodedata.combining(c)
    )


def _key(s, strength):
    primary = _strip(s.casefold())
    if strength == 1:
        return (primary,)
    nfd = unicodedata.normalize("NFD", s.casefold())
    accents = []
    for c in nfd:
        if unicodedata.combining(c):
            accents[-1] = 1
        else:
            accents.append(0)
    if strength == 2:
        return (primary, tuple(accents))
    case = tuple(1 if c.isupper() else 0 for c in _strip(s))
    return (primary, tuple(accents), case)


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "_id long, name string, v long")


def test_collation_filter_sort_fuzz(spark):
    rng = random.Random(SEED + 71)
    for trial in range(6):
        rows = [(i, _gen_word(rng), rng.randint(0, 9)) for i in range(60)]
        df = _mk_df(spark, rows)
        strength = rng.choice([1, 2, 3])
        spec = {"locale": rng.choice(["en", "en_US"]), "strength": strength}
        key = lambda s: _key(s, strength)  # noqa: E731

        # equality filter
        probe = rng.choice(rows)[1]
        got = sorted(r["_id"] for r in
                     Query(df, {"name": probe}).collation(spec).all())
        exp = sorted(i for i, n, _v in rows if key(n) == key(probe))
        assert got == exp, (trial, "eq", spec, probe, got, exp)

        # $in filter
        probes = [rng.choice(rows)[1] for _ in range(3)]
        got = sorted(r["_id"] for r in
                     Query(df, {"name": {"$in": probes}}).collation(spec).all())
        pk = {key(p) for p in probes}
        exp = sorted(i for i, n, _v in rows if key(n) in pk)
        assert got == exp, (trial, "in", spec, probes, got, exp)

        # range filter ($gt) — decided by the leveled key model
        probe = rng.choice(rows)[1]
        got = sorted(r["_id"] for r in
                     Query(df, {"name": {"$gt": probe}}).collation(spec).all())
        exp = sorted(i for i, n, _v in rows if key(n) > key(probe))
        assert got == exp, (trial, "gt", spec, probe, got, exp)

        # total sort (name under collation, _id tiebreak)
        got = [r["_id"] for r in
               Query(df, {}).sort(["name", "_id"]).collation(spec).all()]
        exp = [i for i, _n, _v in
               sorted(rows, key=lambda r: (key(r[1]), r[0]))]
        assert got == exp, (trial, "sort", spec, got[:8], exp[:8])


def test_collation_group_distinct_fuzz(spark):
    rng = random.Random(SEED + 72)
    for trial in range(6):
        rows = [(i, _gen_word(rng), rng.randint(0, 9)) for i in range(50)]
        df = _mk_df(spark, rows)
        strength = rng.choice([1, 2, 3])
        name = spark_collation_name({"locale": "en", "strength": strength})
        key = lambda s: _key(s, strength)  # noqa: E731

        with use_collation(name):
            out = compile_pipeline(df, [{"$group": {
                "_id": "$name", "n": {"$sum": 1}, "s": {"$sum": "$v"},
            }}], None, None)
        got = {key(r["_id"]): (r["n"], r["s"]) for r in out.collect()}

        classes = {}
        for i, n, v in rows:
            c, s = classes.get(key(n), (0, 0))
            classes[key(n)] = (c + 1, s + v)
        assert got == classes, (trial, strength)

        # distinct under collation = number of equivalence classes
        with use_collation(name):
            out = compile_pipeline(df, [
                {"$group": {"_id": "$name"}},
                {"$count": "n"},
            ], None, None)
        assert out.collect()[0]["n"] == len(classes), (trial, strength)


def test_collation_array_elements_fuzz(spark):
    # round 8: collation applies to string comparisons INSIDE arrays
    # (implicit contains-equality, $in, $all, range ops), as in Mongo
    rng = random.Random(SEED + 73)
    for trial in range(6):
        rows = [
            (i, [_gen_word(rng) for _ in range(rng.randint(0, 4))])
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "_id long, tags array<string>")
        strength = rng.choice([1, 2, 3])
        spec = {"locale": "en", "strength": strength}
        key = lambda s: _key(s, strength)  # noqa: E731
        pool = [w for _i, ws in rows for w in ws] or ["a"]

        probe = rng.choice(pool)
        got = sorted(r["_id"] for r in
                     Query(df, {"tags": probe}).collation(spec).all())
        exp = sorted(i for i, ws in rows
                     if any(key(w) == key(probe) for w in ws))
        assert got == exp, (trial, "contains", spec, probe, got, exp)

        probes = [rng.choice(pool) for _ in range(2)]
        got = sorted(r["_id"] for r in
                     Query(df, {"tags": {"$in": probes}}).collation(spec).all())
        pk = {key(p) for p in probes}
        exp = sorted(i for i, ws in rows if any(key(w) in pk for w in ws))
        assert got == exp, (trial, "in", spec, probes, got, exp)

        got = sorted(r["_id"] for r in
                     Query(df, {"tags": {"$all": probes}}).collation(spec).all())
        exp = sorted(i for i, ws in rows
                     if all(any(key(w) == key(p) for w in ws) for p in probes))
        assert got == exp, (trial, "all", spec, probes, got, exp)

        probe = rng.choice(pool)
        got = sorted(r["_id"] for r in
                     Query(df, {"tags": {"$gt": probe}}).collation(spec).all())
        exp = sorted(i for i, ws in rows
                     if any(key(w) > key(probe) for w in ws))
        assert got == exp, (trial, "gt", spec, probe, got, exp)


def test_collation_window_partitions(spark):
    # round 8: $setWindowFields partitionBy/sortBy honor the active
    # collation — 'ALPHA' and 'alpha' land in one partition at
    # strength 2, and sortBy orders collated
    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, "ALPHA", 20), (3, "beta", 5),
         (4, "àlpha", 30), (5, "Beta", 7)],
        "_id long, g string, v long",
    )
    name = spark_collation_name({"locale": "en", "strength": 2})
    with use_collation(name):
        out = {r["_id"]: r for r in compile_pipeline(df, [
            {"$setWindowFields": {
                "partitionBy": "$g",
                "sortBy": {"v": 1},
                "output": {"rk": {"$documentNumber": {}},
                           "tot": {"$sum": "$v"}},
            }}], None, None).collect()}
    # strength 2 is accent-SENSITIVE: àlpha is its own partition
    assert out[1]["tot"] == 30 and out[2]["tot"] == 30  # alpha+ALPHA
    assert out[4]["tot"] == 30 and out[4]["rk"] == 1    # àlpha alone
    assert out[3]["tot"] == 12 and out[5]["tot"] == 12  # beta+Beta
    assert (out[1]["rk"], out[2]["rk"]) == (1, 2)       # v-ordered
    # strength 1 folds accents too: all three alphas together
    name1 = spark_collation_name({"locale": "en", "strength": 1})
    with use_collation(name1):
        out = {r["_id"]: r for r in compile_pipeline(df, [
            {"$setWindowFields": {
                "partitionBy": "$g",
                "output": {"tot": {"$sum": "$v"}},
            }}], None, None).collect()}
    assert out[1]["tot"] == out[2]["tot"] == out[4]["tot"] == 60


def test_collation_graph_lookup(spark):
    # round 8: $graphLookup traversal equality collates — a manager
    # chain stored with case drift still links up case-insensitively
    emps = spark.createDataFrame(
        [("Ann", None), ("bob", "ANN"), ("Cat", "Bob")],
        "name string, boss string",
    )
    name = spark_collation_name({"locale": "en", "strength": 2})
    with use_collation(name):
        out = {r["name"]: r for r in compile_pipeline(emps, [
            {"$graphLookup": {
                "from": "emps",
                "startWith": "$boss",
                "connectFromField": "boss",
                "connectToField": "name",
                "as": "chain",
            }}], lambda _n: emps, None).collect()}
    assert sorted(d["name"] for d in out["Cat"]["chain"]) == ["Ann", "bob"]
    assert [d["name"] for d in out["bob"]["chain"]] == ["Ann"]
    # binary default: the case-drifted links do NOT match
    out = {r["name"]: r for r in compile_pipeline(emps, [
        {"$graphLookup": {
            "from": "emps",
            "startWith": "$boss",
            "connectFromField": "boss",
            "connectToField": "name",
            "as": "chain",
        }}], lambda _n: emps, None).collect()}
    assert out["Cat"]["chain"] == [] and out["bob"]["chain"] == []


def test_collation_elem_match_subdoc_equality(spark):
    # review round 8: $elemMatch subdocument DIRECT equality collates
    # like the operator-form comparisons already did
    df = spark.createDataFrame(
        [(1, [("José",)]), (2, [("jose",)]), (3, [("other",)])],
        "_id long, items array<struct<name:string>>",
    )
    got = sorted(r["_id"] for r in Query(
        df, {"items": {"$elemMatch": {"name": "jose"}}}
    ).collation({"locale": "en", "strength": 1}).all())
    assert got == [1, 2]
    # binary default: only the exact form
    got = sorted(r["_id"] for r in Query(
        df, {"items": {"$elemMatch": {"name": "jose"}}}).all())
    assert got == [2]
