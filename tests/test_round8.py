"""Round-8 bounded-state sweep + mixed-direction sortBy.

Covers the three residual O(group)-state paths the r7 verdict found —
N-accumulators reached via $bucket / $bucketAuto / decorrelated-$lookup
$group, and $firstN/$lastN everywhere — plus the lifted mixed-direction
sortBy restriction on $top/$bottom/$topN/$bottomN, and the ADVICE seek()
float-direction fix.  Every bounded path is both value-checked against a
pure-Python Mongo-semantics reference AND plan-asserted (the executed
plan must contain the salted Window prefilter, not a bare whole-group
collect_list).
"""

import os
import random

import pytest

from anser_spark.plans.pipeline import compile_pipeline


SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))


def _bson_key(v):
    return (0,) if v is None else (1, v)


def ref_sorted(members, sort_by):
    """Mixed-direction sortBy ordering with Mongo null placement (nulls
    smallest): repeated stable sorts from the last key to the first."""
    ordered = list(members)
    for field, asc in reversed(sort_by):
        ordered.sort(key=lambda m: _bson_key(m.get(field)), reverse=not asc)
    return ordered


def _window_in_plan(df) -> bool:
    return "Window" in df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# mixed-direction sortBy — $top/$bottom/$topN/$bottomN
# ---------------------------------------------------------------------------


def make_rows(rng, n=90):
    return [
        {
            "_id": i,
            "g": rng.choice(["x", "y", "z", None]),
            "a": rng.choice([None, rng.randint(-9, 9)]),
            "b": rng.choice([None, rng.randint(0, 5)]),
        }
        for i in range(n)
    ]


def _mk_df(spark, rows):
    return spark.createDataFrame(
        [(r["_id"], r["g"], r["a"], r["b"]) for r in rows],
        "_id long, g string, a long, b long",
    )


def test_group_mixed_direction_sortby_fuzz(spark):
    # 6 seeded trials x keyed/global over {a asc, b desc, _id tiebreak}
    # permutations — vs the pure-Python mixed-sortBy reference
    rng = random.Random(SEED + 81)
    mism = []
    for trial in range(6):
        rows = make_rows(rng)
        df = _mk_df(spark, rows)
        d1, d2 = rng.choice([1, -1]), rng.choice([1, -1])
        sort_by = {"a": d1, "b": -d1, "_id": d2}
        sb = [(k, v == 1) for k, v in sort_by.items()]
        n = rng.randint(1, 4)
        gid = None if trial % 2 else "$g"
        stage = {"$group": {"_id": gid, **{
            "t": {"$top": {"sortBy": sort_by, "output": "$_id"}},
            "b": {"$bottom": {"sortBy": sort_by, "output": "$_id"}},
            "tn": {"$topN": {"sortBy": sort_by, "output": "$_id", "n": n}},
            "bn": {"$bottomN": {"sortBy": sort_by, "output": "$_id", "n": n}},
        }}}
        out = compile_pipeline(df, [stage], None, None)
        assert _window_in_plan(out)
        got = {r["_id"]: r.asDict() for r in out.collect()}
        groups = {}
        for r in rows:
            groups.setdefault(r["g"] if gid else None, []).append(r)
        for key, members in groups.items():
            ordered = ref_sorted(members, sb)
            grow = got[key]
            exp = {
                "t": ordered[0]["_id"],
                "b": ordered[-1]["_id"],
                "tn": [m["_id"] for m in ordered[:n]],
                "bn": [m["_id"] for m in ordered[-n:]],
            }
            for name, e in exp.items():
                if grow[name] != e:
                    mism.append((trial, key, name, e, grow[name]))
    assert not mism, mism[:5]


def test_window_mixed_direction_sortby(spark):
    # the collect-form fallback ($setWindowFields accumulator) must give
    # the same mixed-direction ordering as the grouped prefilter path
    rng = random.Random(SEED + 82)
    rows = make_rows(rng, n=40)
    df = _mk_df(spark, rows)
    out = compile_pipeline(df, [
        {"$setWindowFields": {
            "partitionBy": "$g",
            "output": {"tn": {"$topN": {
                "sortBy": {"a": 1, "_id": -1}, "output": "$_id", "n": 3}}},
        }},
    ], None, None).collect()
    groups = {}
    for r in rows:
        groups.setdefault(r["g"], []).append(r)
    for r in out:
        ordered = ref_sorted(groups[r["g"]], [("a", True), ("_id", False)])
        assert r["tn"] == [m["_id"] for m in ordered[:3]]


# ---------------------------------------------------------------------------
# $firstN/$lastN — bounded, and deterministic after $sort
# ---------------------------------------------------------------------------


def test_group_firstn_lastn_after_sort_fuzz(spark):
    # $sort + $firstN/$lastN: the bounded path orders candidates by a
    # scan-order id captured after the range sort, so the result is the
    # EXACT first/last n in sorted order — Mongo's documented idiom.
    # Keyed and global forms, 4 seeded trials each.
    rng = random.Random(SEED + 83)
    mism = []
    for trial in range(4):
        rows = make_rows(rng, n=150)
        df = _mk_df(spark, rows).repartition(8)
        n = rng.randint(1, 3)
        gid = None if trial % 2 else "$g"
        out = compile_pipeline(df, [
            {"$sort": {"b": 1, "_id": 1}},
            {"$group": {"_id": gid,
                        "f": {"$firstN": {"input": "$a", "n": n}},
                        "l": {"$lastN": {"input": "$a", "n": n}}}},
        ], None, None)
        assert _window_in_plan(out)
        got = {r["_id"]: r.asDict() for r in out.collect()}
        groups = {}
        for r in rows:
            groups.setdefault(r["g"] if gid else None, []).append(r)
        for key, members in groups.items():
            ordered = sorted(members, key=lambda m: (_bson_key(m["b"]),
                                                     m["_id"]))
            exp_f = [m["a"] for m in ordered[:n]]
            exp_l = [m["a"] for m in ordered[-n:]]
            if got[key]["f"] != exp_f or got[key]["l"] != exp_l:
                mism.append((trial, key, exp_f, got[key]["f"],
                             exp_l, got[key]["l"]))
    assert not mism, mism[:5]


def test_group_firstn_keeps_nulls_and_short_groups(spark):
    df = spark.createDataFrame(
        [("x", None), ("x", 1), ("y", 2)], "g string, a long")
    out = {r["_id"]: r for r in compile_pipeline(df, [
        {"$sort": {"a": 1}},
        {"$group": {"_id": "$g",
                    "f": {"$firstN": {"input": "$a", "n": 5}},
                    "l": {"$lastN": {"input": "$a", "n": 5}}}},
    ], None, None).collect()}
    # n larger than the group: whole group, nulls KEPT (Mongo rule)
    assert out["x"]["f"] == [None, 1] and out["x"]["l"] == [None, 1]
    assert out["y"]["f"] == [2]


# ---------------------------------------------------------------------------
# N-accumulators via $bucket / $bucketAuto / decorrelated $lookup $group
# ---------------------------------------------------------------------------


def test_bucket_topn_bounded_and_correct(spark):
    rng = random.Random(SEED + 84)
    rows = make_rows(rng, n=120)
    df = _mk_df(spark, rows)
    bounds = [-10, 0, 3, 10]
    out = compile_pipeline(df, [
        {"$match": {"a": {"$ne": None}}},
        {"$bucket": {"groupBy": "$a", "boundaries": bounds,
                     "output": {
                         "n": {"$sum": 1},
                         "tn": {"$topN": {"sortBy": {"b": 1, "_id": 1},
                                          "output": "$_id", "n": 3}},
                         "mx": {"$maxN": {"input": "$b", "n": 2}},
                     }}},
    ], None, None)
    # the salted window prefilter must be in the executed plan — the
    # whole-bucket collect form was the r7 verdict's reachable OOM
    assert _window_in_plan(out)
    got = {r["_id"]: r.asDict() for r in out.collect()}
    buckets = {}
    for r in rows:
        if r["a"] is None:
            continue
        for lo, hi in zip(bounds, bounds[1:]):
            if lo <= r["a"] < hi:
                buckets.setdefault(lo, []).append(r)
    assert set(got) == set(buckets)
    for lo, members in buckets.items():
        ordered = ref_sorted(members, [("b", True), ("_id", True)])
        assert got[lo]["n"] == len(members)
        assert got[lo]["tn"] == [m["_id"] for m in ordered[:3]]
        nums = sorted((m["b"] for m in members if m["b"] is not None),
                      reverse=True)
        assert sorted(got[lo]["mx"], reverse=True) == nums[:2]


def test_bucket_auto_minn_bounded_and_correct(spark):
    rng = random.Random(SEED + 85)
    rows = [{"_id": i, "v": rng.randint(0, 999)} for i in range(200)]
    df = spark.createDataFrame([(r["_id"], r["v"]) for r in rows],
                               "_id long, v long")
    out = compile_pipeline(df, [
        {"$bucketAuto": {"groupBy": "$v", "buckets": 4,
                         "output": {
                             "n": {"$sum": 1},
                             "mn": {"$minN": {"input": "$v", "n": 2}},
                         }}},
    ], None, None)
    assert _window_in_plan(out)
    got = out.collect()
    assert sum(r["n"] for r in got) == len(rows)
    for r in got:
        # each bucket's minN must be the 2 smallest values ≥ its min
        assert r["mn"][0] == r["_id"]["min"]
        assert len(r["mn"]) == min(2, r["n"]) and sorted(r["mn"]) == r["mn"]


def test_lookup_decorrelated_group_topn_bounded(spark):
    rng = random.Random(SEED + 86)
    local = [{"_id": i, "k": rng.choice([1, 2, 3])} for i in range(8)]
    foreign = [{"fid": j, "fk": rng.choice([1, 2, 4]),
                "fv": rng.randint(0, 9)} for j in range(60)]
    ldf = spark.createDataFrame([(r["_id"], r["k"]) for r in local],
                                "_id long, k long")
    fdf = spark.createDataFrame(
        [(r["fid"], r["fk"], r["fv"]) for r in foreign],
        "fid long, fk long, fv long")
    out = compile_pipeline(ldf, [
        {"$lookup": {"from": "f", "let": {"lk": "$k"},
                     "pipeline": [
                         {"$match": {"$expr": {"$eq": ["$$lk", "$fk"]}}},
                         {"$group": {"_id": None,
                                     "tn": {"$topN": {
                                         "sortBy": {"fv": -1, "fid": 1},
                                         "output": "$fid", "n": 3}},
                                     "s": {"$sum": "$fv"}}},
                     ],
                     "as": "m"}},
    ], lambda name: fdf, None)
    assert _window_in_plan(out)
    got = {r["_id"]: r["m"] for r in out.collect()}
    for d in local:
        ms = [f for f in foreign if f["fk"] == d["k"]]
        if not ms:
            assert got[d["_id"]] == []
            continue
        ordered = ref_sorted(ms, [("fv", False), ("fid", True)])
        (m,) = got[d["_id"]]
        assert m["tn"] == [x["fid"] for x in ordered[:3]]
        assert m["s"] == sum(x["fv"] for x in ms)


# ---------------------------------------------------------------------------
# ADVICE fixes
# ---------------------------------------------------------------------------


def test_seek_float_sort_direction(engine):
    # {'v': -1.0} (float direction, common from JSON) must page
    # DESCENDING — previously the seek predicate paged ascending while
    # the sort descended, silently repeating/skipping rows
    coll = engine.db("r8").collection("seekf")
    coll.insert_many([{"_id": i, "v": i % 7} for i in range(20)])
    q = coll.find({}).sort({"v": -1.0, "_id": -1.0}).limit(5)
    page1 = q.all()
    expect = sorted(
        ({"_id": i, "v": i % 7} for i in range(20)),
        key=lambda d: (d["v"], d["_id"]), reverse=True)
    assert [(d["v"], d["_id"]) for d in page1] == \
        [(d["v"], d["_id"]) for d in expect[:5]]
    last = page1[-1]
    page2 = coll.find({}).sort({"v": -1.0, "_id": -1.0}) \
        .seek({"v": last["v"], "_id": last["_id"]}).limit(5).all()
    assert [(d["v"], d["_id"]) for d in page2] == \
        [(d["v"], d["_id"]) for d in expect[5:10]]


def test_image_stats_grayscale_decoder(spark):
    # a plugged-in decoder returning a 2-D grayscale array (PIL 'L'
    # mode) must produce stats, not an executor IndexError
    import numpy as np

    from anser_spark.operators.multimodal import extract_image_stats

    def decode(payload):
        if not payload:
            return None
        side = payload[0]
        if side == 0:
            return np.zeros((2, 2))  # bad shape guard: 0-d is rejected below
        return np.full((side, side), 100, dtype=np.uint8)  # 2-D grayscale

    df = spark.createDataFrame(
        [("a", bytearray([4])), ("b", bytearray([2])), ("c", None)],
        "media_id string, payload binary")
    got = {r["media_id"]: r for r in
           extract_image_stats(df, decode=decode).collect()}
    assert got["a"]["width"] == 4 and got["a"]["height"] == 4
    assert got["a"]["channels"] == 3
    assert abs(got["a"]["mean_lum"] - 100.0) < 1e-6
    assert abs(got["a"]["mean_r"] - 100.0) < 1e-6
    assert got["c"]["width"] is None


def test_image_stats_bad_decoder_shape_is_null(spark):
    import numpy as np

    from anser_spark.operators.multimodal import extract_image_stats

    df = spark.createDataFrame(
        [("a", bytearray([1]))], "media_id string, payload binary")
    got = extract_image_stats(
        df, decode=lambda p: np.zeros((3,))).collect()[0]
    assert got["width"] is None  # 1-D array → rejected to null row


# ---------------------------------------------------------------------------
# $facet output guard + pipeline $skip deep-paging warning
# ---------------------------------------------------------------------------


def test_facet_leg_over_cap_raises(spark, monkeypatch):
    import anser_spark.plans.pipeline as P

    monkeypatch.setattr(P, "_FACET_MAX_ROWS_PER_LEG", 10)
    df = spark.range(50).selectExpr("id as _id", "id % 3 as g")
    # an aggregating leg stays fine; the unaggregated one must raise
    ok = compile_pipeline(df, [{"$facet": {
        "agg": [{"$group": {"_id": "$g", "n": {"$sum": 1}}}],
    }}], None, None).collect()
    assert len(ok) == 1 and len(ok[0]["agg"]) == 3
    bad = compile_pipeline(df, [{"$facet": {
        "raw": [{"$project": {"_id": 1}}],
    }}], None, None)
    with pytest.raises(Exception, match="facet.*more than 10 documents"):
        bad.collect()


def test_pipeline_skip_deep_warning(spark, caplog):
    import logging

    df = spark.range(5).selectExpr("id as _id")
    with caplog.at_level(logging.WARNING, logger="anser_spark.plans.pipeline"):
        out = compile_pipeline(df, [{"$sort": {"_id": 1}},
                                    {"$skip": 200_000}], None, None)
    assert any("deep paging" in r.message for r in caplog.records)
    assert out.count() == 0  # still executes correctly


def test_search_geo_shape_and_polygon_geometry(spark, tmp_path):
    # round 8: $search geoShape (within/intersects/disjoint over point
    # fields) and geoWithin GeoJSON Polygon/MultiPolygon geometry —
    # even-odd ray casting incl. holes
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "gs"))
    c = eng.db("t").collection("places")
    c.insert_many([
        {"_id": "in", "loc": [2.0, 2.0]},
        {"_id": "hole", "loc": [5.0, 5.0]},     # inside the hole
        {"_id": "out", "loc": [20.0, 20.0]},
        {"_id": "in2", "loc": [8.0, 8.5]},
        {"_id": "nul", "loc": None},
    ])
    # 10x10 square with a 4..6 square hole
    poly = {
        "type": "Polygon",
        "coordinates": [
            [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
            [[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]],
        ],
    }
    ids = lambda rows: sorted(r["_id"] for r in rows)  # noqa: E731
    got = c.pipe([
        {"$search": {"geoShape": {"path": "loc", "relation": "within",
                                  "geometry": poly}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert ids(got) == ["in", "in2"]
    got = c.pipe([
        {"$search": {"geoShape": {"path": "loc", "relation": "disjoint",
                                  "geometry": poly}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert ids(got) == ["hole", "out"]  # null loc is neither

    # geoWithin geometry form + MultiPolygon (two disjoint squares)
    multi = {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]]],
            [[[7, 7], [9, 7], [9, 9], [7, 9], [7, 7]]],
        ],
    }
    got = c.pipe([
        {"$search": {"geoWithin": {"path": "loc", "geometry": multi}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert ids(got) == ["in", "in2"]

    # intersects == within for points; unknown relation raises
    got = c.pipe([
        {"$search": {"geoShape": {"path": "loc", "relation": "intersects",
                                  "geometry": poly}}},
        {"$project": {"_id": 1}},
    ]).all()
    assert ids(got) == ["in", "in2"]
    import pytest as _pytest

    from anser_spark.plans.pipeline import PipelineCompileError
    with _pytest.raises(PipelineCompileError, match="relation"):
        c.pipe([{"$search": {"geoShape": {
            "path": "loc", "relation": "touches", "geometry": poly}}}]).all()
    with _pytest.raises(PipelineCompileError, match="LineString|geometry"):
        c.pipe([{"$search": {"geoShape": {
            "path": "loc", "relation": "within",
            "geometry": {"type": "LineString",
                         "coordinates": [[0, 0], [1, 1]]}}}}]).all()


def test_expr_reference_to_removed_field_is_null(spark, tmp_path):
    # round 8 (seed-2468 update fuzzer): a pipeline-update stage that
    # references a field a PREVIOUS stage $unset must see Mongo's
    # missing→null, not an UNRESOLVED_COLUMN AnalysisException
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([{"_id": 1, "x": 5.0, "s": "alpha"}])
    c.update_all({"s": "alpha"}, [
        {"$unset": "x"},
        {"$set": {"y": {"$multiply": ["$x", 0.0]}}},
    ])
    row = c.find_one({"_id": 1})
    assert "x" not in row or row["x"] is None
    assert row["y"] is None  # missing operand → null, as in Mongo

    # same rule in a plain aggregation $project over an unknown field
    out = c.pipe([
        {"$project": {"_id": 1, "z": {"$ifNull": ["$nofield", 7]}}},
    ]).all()
    assert out[0]["z"] == 7


def test_expr_missing_path_tails_and_case(spark, tmp_path):
    # review round 8b: (a) a dotted tail through a scalar or a
    # previously-folded void field is ALSO Mongo-missing → null, not an
    # AnalysisException; (b) the static fold resolves struct fields
    # case-insensitively like Spark's default column resolution
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([{"_id": 1, "Name": "x", "num": 5.0}])
    out = c.pipe([
        {"$set": {"a": "$missing"}},       # a becomes void
        {"$set": {"b": "$a.c"}},           # dotted tail through void
        {"$set": {"d": "$num.sub"}},       # dotted tail through scalar
        {"$set": {"e": "$name"}},          # case-insensitive resolve
    ]).all()
    row = out[0]
    assert row["b"] is None and row["d"] is None
    assert row["e"] == "x"


def test_search_geojson_altitude_positions(spark, tmp_path):
    # review round 8b: RFC 7946 positions may carry a third (altitude)
    # element — accepted and ignored
    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("pts")
    c.insert_many([{"_id": "a", "loc": [1.0, 1.0]},
                   {"_id": "b", "loc": [20.0, 20.0]}])
    poly = {"type": "Polygon",
            "coordinates": [[[0, 0, 5], [10, 0, 5], [10, 10, 5],
                             [0, 10, 5], [0, 0, 5]]]}
    got = sorted(r["_id"] for r in c.pipe([
        {"$search": {"geoShape": {"path": "loc", "relation": "within",
                                  "geometry": poly}}},
        {"$project": {"_id": 1}}]).all())
    assert got == ["a"]


def test_bm25_prestamp_none_index_not_stale(spark, tmp_path):
    # review round 8b: a pre-stamp 'none'-language index is still exact
    # (the ws-lower analyzer never changed) — must NOT read stale;
    # a pre-stamp 'english' one must
    import json
    import os

    from anser_spark.engine import Engine

    eng = Engine(spark, workdir=str(tmp_path / "w"))
    c = eng.db("t").collection("d")
    c.insert_many([{"_id": 1, "text": "alpha beta"}])
    for name, lang, want_stale in (("n0", "none", False),
                                   ("e0", "english", True)):
        c.create_search_index(name, {"kind": "bm25", "path": "text",
                                     "default_language": lang})
        p = os.path.join(c._search_index_dir(), f"{name}.json")
        with open(p) as fh:
            d = json.load(fh)
        del d["analyzer_version"]  # simulate a pre-round-8 index
        with open(p, "w") as fh:
            json.dump(d, fh)
        assert c.search_index_status(name)["stale"] is want_stale, name
