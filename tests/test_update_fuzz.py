"""Randomized update-compiler consistency check: seeded random update
documents applied two ways — compiled via apply_update vs a pure-Python
reference implementing Mongo's documented update semantics — and
compared row by row."""

import math
import os
import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from anser_spark.functions.filters import compile_filter
from anser_spark.functions.updates import apply_update

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ]
)


def make_rows(rng, count=25):
    rows = []
    for i in range(count):
        rows.append(
            {
                "_id": f"d{i:03d}",
                "n": rng.choice([None, -3, 0, 7, 42]),
                "x": rng.choice([None, 0.5, 2.0]),
                "s": rng.choice([None, "alpha", "beta"]),
                "arr": rng.choice([[], [1], [1, 2, 3], [5, 5, 2]]),
            }
        )
    return rows


def rand_update(rng):
    choice = rng.randrange(15)
    if choice == 0:
        return {"$set": {"n": rng.choice([0, 9]), "s": "set!"}}
    if choice == 1:
        return {"$set": {"brand_new": rng.choice(["v", "w"])}}
    if choice == 2:
        return {"$inc": {"n": rng.choice([-2, 1, 10])}}
    if choice == 3:
        return {"$mul": {"x": rng.choice([0.0, 2.0])}}
    if choice == 4:
        return {"$min": {"n": rng.choice([-10, 5, 50])}}
    if choice == 5:
        return {"$max": {"n": rng.choice([-10, 5, 50])}}
    if choice == 6:
        return {"$push": {"arr": rng.choice([0, 9])}}
    if choice == 7:
        return {"$addToSet": {"arr": rng.choice([1, 9])}}
    if choice == 8:
        return {"$pull": {"arr": rng.choice([1, 5])}}
    if choice == 9:
        return {"$pop": {"arr": rng.choice([1, -1])}}
    # round-5 widening: $unset / $rename / $pullAll / $push modifiers /
    # $setOnInsert-on-update (must be a no-op outside upserts)
    if choice == 10:
        return {"$unset": {rng.choice(["s", "x"]): ""}}
    if choice == 11:
        return {"$rename": {"s": "s_renamed"}}
    if choice == 12:
        return {"$pullAll": {"arr": rng.choice([[1, 5], [2], []])}}
    if choice == 13:
        each = [rng.choice([6, 7]), rng.choice([8, 9])]
        mods = {"$each": each}
        if rng.random() < 0.6:
            mods["$slice"] = rng.choice([-3, 0, 2, 10])
        return {"$push": {"arr": mods}}
    return {"$setOnInsert": {"n": 999}}


def rand_filter(rng):
    return rng.choice(
        [
            None,
            {"n": {"$gte": 0}},
            {"s": "alpha"},
            {"arr": {"$size": 3}},
            {"x": None},
        ]
    )


def ref_apply(doc, update):
    doc = dict(doc)
    for op, fields in update.items():
        for path, value in fields.items():
            cur = doc.get(path)
            if op == "$set":
                doc[path] = value
            elif op == "$inc":
                doc[path] = (cur or 0) + value
            elif op == "$mul":
                doc[path] = (cur or 0) * value
            elif op == "$min":
                doc[path] = value if cur is None else min(cur, value)
            elif op == "$max":
                doc[path] = value if cur is None else max(cur, value)
            elif op == "$push":
                if isinstance(value, dict) and "$each" in value:
                    base = (cur or []) + list(value["$each"])
                    if "$slice" in value:
                        n = value["$slice"]
                        base = base[:n] if n >= 0 else base[n:]
                    doc[path] = base
                else:
                    doc[path] = (cur or []) + [value]
            elif op == "$addToSet":
                base = cur or []
                doc[path] = base + ([] if value in base else [value])
            elif op == "$pull":
                doc[path] = [v for v in (cur or []) if v != value]
            elif op == "$pop":
                base = cur or []
                doc[path] = base[:-1] if value == 1 else base[1:]
            elif op == "$unset":
                # fixed-schema divergence: a partially-matched $unset
                # nulls the column (documented); all-matched column
                # drops happen at the engine layer, not apply_update
                doc[path] = None
            elif op == "$rename":
                doc[value] = doc.get(path)
                doc[path] = None
            elif op == "$pullAll":
                doc[path] = [v for v in (cur or []) if v not in value]
            elif op == "$setOnInsert":
                pass  # only applies on upsert-insert, never on update
    return doc


def ref_match(doc, flt):
    if not flt:
        return True
    for key, cond in flt.items():
        v = doc.get(key)
        if isinstance(cond, dict):
            for op, arg in cond.items():
                if op == "$gte":
                    if v is None or not v >= arg:
                        return False
                elif op == "$size":
                    if not isinstance(v, list) or len(v) != arg:
                        return False
        elif cond is None:
            if v is not None:
                return False
        elif v != cond:
            return False
    return True


def norm(value):
    if isinstance(value, float) and math.isnan(value):
        return "nan"
    return value


def rand_pipeline_update(rng):
    """Random Mongo 4.2 pipeline-form update (list of stages)."""
    stages = []
    for _ in range(rng.choice([1, 1, 2])):
        kind = rng.randrange(5)
        if kind == 0:
            stages.append(
                {"$set": {"n": {"$add": ["$n", rng.choice([1, -4, 10])]}}}
            )
        elif kind == 1:
            stages.append(
                {"$set": {"y": {"$multiply": ["$x", rng.choice([2.0, 0.0])]}}}
            )
        elif kind == 2:
            stages.append({"$unset": rng.choice(["s", ["s", "x"]])})
        elif kind == 3:
            stages.append(
                {"$addFields": {"tag": {
                    "$cond": [{"$gte": ["$n", 0]}, "pos", "neg"]
                }}}
            )
        else:
            stages.append({"$set": {"s": {"$literal": "stamped"}}})
    return stages


def ref_apply_pipeline(doc, stages):
    """Pure-Python Mongo semantics for the stage subset above: $add /
    $multiply return null on a null operand; $gte uses BSON order
    (null < numbers); $unset nulls the column (fixed-schema caveat)."""
    doc = dict(doc)
    for stage in stages:
        (name, arg), = stage.items()
        if name in ("$set", "$addFields"):
            for path, expr in arg.items():
                (op, operands), = expr.items()
                if op == "$add":
                    vals = [doc.get(o[1:]) if isinstance(o, str) else o for o in operands]
                    doc[path] = None if any(v is None for v in vals) else sum(vals)
                elif op == "$multiply":
                    vals = [doc.get(o[1:]) if isinstance(o, str) else o for o in operands]
                    doc[path] = None if any(v is None for v in vals) else vals[0] * vals[1]
                elif op == "$cond":
                    test, then, els = operands
                    (top, targs), = test.items()
                    assert top == "$gte"
                    v = doc.get(targs[0][1:])
                    ok = v is not None and v >= targs[1]  # null < numbers
                    doc[path] = then if ok else els
                elif op == "$literal":
                    doc[path] = operands
        elif name == "$unset":
            for p in [arg] if isinstance(arg, str) else arg:
                doc[p] = None
    return doc


def test_pipeline_update_fuzz(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "11")))
    for trial in range(20):
        rows = make_rows(rng)
        df = spark.createDataFrame(rows, SCHEMA)
        stages = rand_pipeline_update(rng)
        flt = rand_filter(rng)
        pred = compile_filter(flt, SCHEMA)
        out = apply_update(df, pred, stages, SCHEMA)
        got = {r["_id"]: r.asDict() for r in out.collect()}
        for doc in rows:
            expected = (
                ref_apply_pipeline(doc, stages) if ref_match(doc, flt) else dict(doc)
            )
            actual = got[doc["_id"]]
            for key, want in expected.items():
                have = actual.get(key)
                assert norm(have) == norm(want), (
                    f"trial {trial}: stages {stages!r} filter {flt!r} "
                    f"doc {doc['_id']}: field {key!r} got {have!r} want {want!r}"
                )


def test_update_fuzz(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "7")))
    for trial in range(25):
        rows = make_rows(rng)
        df = spark.createDataFrame(rows, SCHEMA)
        update = rand_update(rng)
        flt = rand_filter(rng)
        pred = compile_filter(flt, SCHEMA)
        out = apply_update(df, pred, update, SCHEMA)
        got = {r["_id"]: r.asDict() for r in out.collect()}
        for doc in rows:
            expected = ref_apply(doc, update) if ref_match(doc, flt) else dict(doc)
            actual = got[doc["_id"]]
            for key, want in expected.items():
                have = actual.get(key)
                assert norm(have) == norm(want), (
                    f"trial {trial}: update {update!r} filter {flt!r} "
                    f"doc {doc['_id']}: field {key!r} got {have!r} want {want!r}"
                )


def test_pipeline_upsert_fuzz(engine):
    """Round-7 mutation-surface matrix: the UPSERT insert path runs the
    random stage list over the doc synthesized from the filter's
    equality fields (fields referenced by the stages but absent from
    the filter behave as missing→null, per the round-7 null-seeding
    fix) — vs the same pure-Python evaluator. 6 seeded trials."""
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "11")) + 3)
    spark = engine.spark
    coll = engine.db("fuzzdb").collection("ups")
    coll._rewrite(spark.createDataFrame(make_rows(rng, 5), SCHEMA))
    for trial in range(6):
        stages = rand_pipeline_update(rng)
        q = {"_id": f"zz{trial:02d}"}
        if rng.random() < 0.5:
            q["n"] = rng.choice([1, 5])
        info = coll.upsert(q, stages)
        assert info.updated == 1
        expected = ref_apply_pipeline(dict(q), stages)
        row = coll.find_id(q["_id"]).one()
        for key, want in expected.items():
            assert norm(row.get(key)) == norm(want), (
                f"trial {trial}: stages {stages!r} q {q!r}: "
                f"field {key!r} got {row.get(key)!r} want {want!r}"
            )


def test_pipeline_find_and_modify_fuzz(engine):
    """Round-7 mutation-surface matrix: findAndModify with a pipeline
    update, return_new both ways — the returned doc is the pre-image
    (return_new=False) or the stage output (True), and the stored doc
    always carries the stage output. 6 seeded trials."""
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "11")) + 9)
    spark = engine.spark
    for trial in range(6):
        rows = make_rows(rng, 8)
        coll = engine.db("fuzzdb").collection(f"fam{trial}")
        coll._rewrite(spark.createDataFrame(rows, SCHEMA))
        stages = rand_pipeline_update(rng)
        target = rng.choice(rows)
        return_new = rng.random() < 0.5
        out = coll.find_and_modify(
            query={"_id": target["_id"]}, update=stages,
            return_new=return_new,
        )
        expected_new = ref_apply_pipeline(dict(target), stages)
        compare = expected_new if return_new else dict(target)
        for key, want in compare.items():
            assert norm(out.get(key)) == norm(want), (
                f"trial {trial} return_new={return_new}: stages "
                f"{stages!r}: field {key!r} got {out.get(key)!r} "
                f"want {want!r}"
            )
        stored = coll.find_id(target["_id"]).one()
        for key, want in expected_new.items():
            assert norm(stored.get(key)) == norm(want), (
                f"trial {trial} stored: field {key!r} got "
                f"{stored.get(key)!r} want {want!r}"
            )
