"""Property-based invariants of the filter compiler (hypothesis):

1. TOTALITY — for any filter F, every document is in exactly one of
   find(F) / find({$nor: [F]}) (Mongo's negation partitions the
   collection; three-valued SQL logic would silently drop null-field
   docs from both sides without the compiler's coalesce discipline).
2. IDEMPOTENCE — compiling the same filter twice yields identical
   results (no hidden state in the compiler).
"""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pyspark.sql import types as T  # noqa: E402

from anser_spark.functions.filters import compile_filter  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)

ROWS = [
    {"_id": i, "n": n, "s": s, "arr": a}
    for i, (n, s, a) in enumerate(
        [
            (None, None, None),
            (0, "", []),
            (5, "alpha", [1, 2]),
            (-3, "beta", [5]),
            (42, "alpha", [1, 1, 2]),
            (7, None, [None, 3]),
            (None, "gamma", []),
        ]
    )
]

leaf_values = st.sampled_from([None, 0, 5, 42, "alpha", "beta"])

comparison = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])

field = st.sampled_from(["n", "s", "arr", "missing_field"])


def simple_cond(draw):
    f = draw(field)
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return {f: draw(leaf_values)}
    if kind == 1:
        return {f: {draw(comparison): draw(leaf_values)}}
    if kind == 2:
        return {f: {"$in": draw(st.lists(leaf_values, max_size=3))}}
    if kind == 3:
        return {f: {"$exists": draw(st.booleans())}}
    return {f: {"$size": draw(st.integers(0, 3))}}


@st.composite
def filters(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return simple_cond(draw)
    op = draw(st.sampled_from(["$and", "$or", "$nor"]))
    subs = draw(
        st.lists(filters(depth=depth - 1), min_size=1, max_size=2)
    )
    return {op: subs}


@pytest.fixture(scope="module")
def pdf(spark):
    return spark.createDataFrame(ROWS, SCHEMA).cache()


@given(flt=filters())
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_negation_partitions_collection(pdf, flt):
    matched = {r["_id"] for r in pdf.where(compile_filter(flt, SCHEMA)).collect()}
    negated = {
        r["_id"]
        for r in pdf.where(compile_filter({"$nor": [flt]}, SCHEMA)).collect()
    }
    all_ids = {r["_id"] for r in ROWS}
    assert matched | negated == all_ids, f"dropped docs for {flt!r}"
    assert matched & negated == set(), f"double-matched docs for {flt!r}"


@given(flt=filters())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compile_is_deterministic(pdf, flt):
    a = {r["_id"] for r in pdf.where(compile_filter(flt, SCHEMA)).collect()}
    b = {r["_id"] for r in pdf.where(compile_filter(flt, SCHEMA)).collect()}
    assert a == b


def test_collation_ci_matches_lowercase_oracle(spark):
    """For pure-ASCII data, strength-2 'en' collation equality must
    agree exactly with lower()-normalized binary equality (ICU and
    ASCII case folding coincide there) — a seeded differential over
    random case-mangled strings for $eq, $in, $gte and sort order."""
    import random

    from anser_spark.plans.query import Query

    rng = random.Random(77)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

    def mangle(w):
        return "".join(ch.upper() if rng.random() < 0.5 else ch for ch in w)

    rows = [(i, mangle(rng.choice(words))) for i in range(120)]
    rows += [(200, None)]
    df = spark.createDataFrame(rows, "_id long, w string")
    ci = {"locale": "en", "strength": 2}
    for trial in range(8):
        probe = mangle(rng.choice(words))
        got = sorted(
            r["_id"] for r in Query(df, {"w": probe}).collation(ci).all()
        )
        want = sorted(
            i for i, w in rows if w is not None and w.lower() == probe.lower()
        )
        assert got == want, (trial, probe)
        pool = [mangle(rng.choice(words)) for _ in range(2)]
        got_in = sorted(
            r["_id"]
            for r in Query(df, {"w": {"$in": pool}}).collation(ci).all()
        )
        want_in = sorted(
            i for i, w in rows
            if w is not None and w.lower() in {p.lower() for p in pool}
        )
        assert got_in == want_in, (trial, pool)
        got_ge = sorted(
            r["_id"]
            for r in Query(df, {"w": {"$gte": probe}}).collation(ci).all()
        )
        want_ge = sorted(
            i for i, w in rows if w is not None and w.lower() >= probe.lower()
        )
        assert got_ge == want_ge, (trial, probe)
    # sort order: collated sort == sort by (lower(w), _id)
    order = [
        r["_id"]
        for r in Query(df, {"w": {"$ne": None}}).sort(["w", "_id"]).collation(ci).all()
    ]
    want_order = [
        i for i, w in sorted(
            ((i, w) for i, w in rows if w is not None),
            key=lambda t: (t[1].lower(), t[0]),
        )
    ]
    assert order == want_order


def test_collation_ci_group_matches_lowercase_oracle(spark):
    """$group under strength-2 collation vs a Python lower()-keyed
    groupby on ASCII data: group COUNTS must agree and each reported
    _id must be a member of its equivalence class."""
    import random

    from anser_spark.plans.pipeline import Aggregation

    rng = random.Random(31)
    words = ["red", "green", "blue", "cyan"]
    rows = [
        (i, "".join(c.upper() if rng.random() < 0.5 else c for c in rng.choice(words)))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "_id long, w string")
    agg = Aggregation(
        df, [{"$group": {"_id": "$w", "n": {"$sum": 1}}}], "en_CI"
    )
    got = {r["_id"].lower(): r["n"] for r in agg.all()}
    want = {}
    for _i, w in rows:
        want[w.lower()] = want.get(w.lower(), 0) + 1
    assert got == want
