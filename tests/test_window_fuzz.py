"""Seeded differential fuzzer for $setWindowFields (VERDICT r5 item 4):
random window outputs (aggregates with documents/range frames, rank
family, $shift, $locf, $linearFill, $expMovingAvg) compared row-by-row
against a pure-Python evaluator implementing Mongo's documented window
semantics.  Sort keys are unique within each partition so frame
membership is deterministic on both sides."""

import math
import os
import random

import pytest

from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("p", T.StringType()),
        T.StructField("t", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("w", T.DoubleType()),
    ]
)


def make_rows(rng, n_parts=3, per_part=12):
    rows = []
    i = 0
    for pi in range(n_parts):
        ts = rng.sample(range(100), per_part)  # unique sort keys
        for t in ts:
            rows.append(
                {
                    "_id": i,
                    "p": chr(ord("A") + pi),
                    "t": t,
                    "v": rng.choice([None, -2.0, 0.0, 1.5, 7.0, 42.0]),
                    "w": rng.choice([-1.0, 0.5, 2.0, 10.0]),
                }
            )
            i += 1
    return rows


BOUNDS = ["unbounded", "current", -3, -1, 0, 1, 2]


def rand_frame(rng):
    kind = rng.randrange(3)
    if kind == 0:
        return None  # whole-partition default
    lo = rng.choice(BOUNDS)
    hi = rng.choice(BOUNDS)

    def v(b, low):
        if b == "unbounded":
            return -math.inf if low else math.inf
        if b == "current":
            return 0
        return b

    if v(lo, True) > v(hi, False):
        lo, hi = hi, lo
    if lo == "unbounded" and hi == "unbounded":
        pass
    if kind == 1:
        return {"documents": [lo, hi]}
    return {"range": [lo, hi]}


def rand_outputs(rng):
    outs = {}
    for k in range(rng.choice([1, 2, 3])):
        name = f"o{k}"
        choice = rng.randrange(10)
        if choice == 0:
            outs[name] = {"$sum": "$v", "window": rand_frame(rng)}
        elif choice == 1:
            outs[name] = {"$avg": "$v", "window": rand_frame(rng)}
        elif choice == 2:
            outs[name] = {
                rng.choice(["$min", "$max"]): "$v", "window": rand_frame(rng)
            }
        elif choice == 3:
            outs[name] = {"$count": {}, "window": rand_frame(rng)}
        elif choice == 4:
            outs[name] = {
                rng.choice(["$first", "$last"]): "$v",
                "window": rand_frame(rng),
            }
        elif choice == 5:
            outs[name] = {rng.choice(["$rank", "$denseRank", "$documentNumber"]): {}}
        elif choice == 6:
            outs[name] = {
                "$shift": {
                    "output": "$w",
                    "by": rng.choice([-2, -1, 1, 2]),
                    "default": rng.choice([None, -99.0]),
                }
            }
        elif choice == 7:
            outs[name] = {rng.choice(["$locf", "$linearFill"]): "$v"}
        elif choice == 8:
            outs[name] = {
                "$stdDevPop" if rng.random() < 0.5 else "$stdDevSamp": "$w",
                "window": rand_frame(rng),
            }
        else:
            outs[name] = {"$expMovingAvg": {"input": "$w", "N": rng.choice([2, 5])}}
        if outs[name].get("window") is None:
            outs[name].pop("window", None)
    return outs


# ---- pure-Python Mongo-window-semantics reference evaluator ----------


def frame_indices(frame, i, docs):
    n = len(docs)
    if frame is None:
        return list(range(n))  # Mongo default: whole partition
    if "documents" in frame:
        lo, hi = frame["documents"]
        lo = 0 if lo == "unbounded" else max(0, i + (0 if lo == "current" else lo))
        hi = n - 1 if hi == "unbounded" else min(
            n - 1, i + (0 if hi == "current" else hi)
        )
        return list(range(lo, hi + 1)) if lo <= hi else []
    lo, hi = frame["range"]
    base = docs[i]["t"]
    lo_v = -math.inf if lo == "unbounded" else base + (0 if lo == "current" else lo)
    hi_v = math.inf if hi == "unbounded" else base + (0 if hi == "current" else hi)
    return [j for j in range(n) if lo_v <= docs[j]["t"] <= hi_v]


def ref_one(op, oparg, frame, i, docs):
    n = len(docs)
    if op == "$documentNumber":
        return i + 1
    if op == "$rank":
        return 1 + sum(1 for j in range(n) if docs[j]["t"] < docs[i]["t"])
    if op == "$denseRank":
        return len({docs[j]["t"] for j in range(n) if docs[j]["t"] <= docs[i]["t"]})
    if op == "$shift":
        j = i + oparg["by"]
        return docs[j]["w"] if 0 <= j < n else oparg.get("default")
    if op == "$locf":
        for j in range(i, -1, -1):
            if docs[j]["v"] is not None:
                return docs[j]["v"]
        return None
    if op == "$linearFill":
        if docs[i]["v"] is not None:
            return docs[i]["v"]
        prev = next((j for j in range(i - 1, -1, -1) if docs[j]["v"] is not None), None)
        nxt = next((j for j in range(i + 1, n) if docs[j]["v"] is not None), None)
        if prev is None or nxt is None:
            return None
        x0, y0 = docs[prev]["t"], docs[prev]["v"]
        x1, y1 = docs[nxt]["t"], docs[nxt]["v"]
        return y0 + (y1 - y0) * (docs[i]["t"] - x0) / (x1 - x0)
    if op == "$expMovingAvg":
        alpha = 2.0 / (oparg["N"] + 1)
        ema = None
        for j in range(i + 1):
            x = docs[j]["w"]
            ema = x if ema is None else alpha * x + (1 - alpha) * ema
        return ema

    idx = frame_indices(frame, i, docs)
    if op == "$count":
        return len(idx)
    if op in ("$first", "$last"):
        if not idx:
            return None
        return docs[idx[0 if op == "$first" else -1]]["v"]
    vals = [docs[j]["v" if oparg == "$v" else "w"] for j in idx]
    nn = [x for x in vals if x is not None]
    if op == "$sum":
        return sum(nn) if nn else 0
    if op == "$avg":
        return sum(nn) / len(nn) if nn else None
    if op == "$min":
        return min(nn) if nn else None
    if op == "$max":
        return max(nn) if nn else None
    if op in ("$stdDevPop", "$stdDevSamp"):
        if not nn or (op == "$stdDevSamp" and len(nn) < 2):
            return None
        mean = sum(nn) / len(nn)
        var = sum((x - mean) ** 2 for x in nn)
        var /= len(nn) if op == "$stdDevPop" else (len(nn) - 1)
        return math.sqrt(var)
    raise AssertionError(op)


def ref_swf(rows, outputs):
    from collections import defaultdict

    parts = defaultdict(list)
    for r in rows:
        parts[r["p"]].append(r)
    expect = {}
    for docs in parts.values():
        docs = sorted(docs, key=lambda d: d["t"])
        for i, d in enumerate(docs):
            out = {}
            for name, spec in outputs.items():
                spec = dict(spec)
                frame = spec.pop("window", None)
                (op, oparg), = spec.items()
                out[name] = ref_one(op, oparg, frame, i, docs)
            expect[d["_id"]] = out
    return expect


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        return a == pytest.approx(b, rel=1e-9, abs=1e-9)
    return a == b


def test_window_fuzz_time_range(spark):
    # range frames with a time `unit` over a TIMESTAMP sortBy: rows at
    # hour t, bounds in hours — the reference frame is the same numeric
    # interval over t
    import datetime

    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "17")))
    from anser_spark.plans.pipeline import compile_pipeline

    schema = T.StructType(
        [
            T.StructField("_id", T.LongType()),
            T.StructField("p", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("t", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("w", T.DoubleType()),
        ]
    )
    base = datetime.datetime(2026, 1, 1)
    for trial in range(8):
        rows = make_rows(rng)
        for r in rows:
            r["ts"] = base + datetime.timedelta(hours=r["t"])
        df = spark.createDataFrame(rows, schema)
        outputs = {}
        for k in range(rng.choice([1, 2])):
            frame = rand_frame(rng)
            if frame is None or "documents" in frame:
                frame = {"range": [rng.choice(BOUNDS), "unbounded"]}
            frame = {"range": frame["range"], "unit": "hour"}
            op = rng.choice(["$sum", "$avg", "$min", "$max", "$count"])
            outputs[f"o{k}"] = {
                op: {} if op == "$count" else "$v", "window": frame
            }
        stage = {
            "$setWindowFields": {
                "partitionBy": "$p",
                "sortBy": {"ts": 1},
                "output": outputs,
            }
        }
        got = {
            r["_id"]: r.asDict()
            for r in compile_pipeline(df, [stage], None, None).collect()
        }
        ref_outputs = {
            name: {**{op: a for op, a in spec.items() if op != "window"},
                   "window": {"range": spec["window"]["range"]}}
            for name, spec in outputs.items()
        }
        expect = ref_swf(rows, ref_outputs)
        for _id, want in expect.items():
            for name, wv in want.items():
                hv = got[_id][name]
                assert close(hv, wv), (
                    f"trial {trial}: output {name} {outputs[name]!r} "
                    f"doc {_id}: got {hv!r} want {wv!r}"
                )


def test_window_fuzz(spark):
    rng = random.Random(int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "13")))
    from anser_spark.plans.pipeline import compile_pipeline

    for trial in range(20):
        rows = make_rows(rng)
        df = spark.createDataFrame(rows, SCHEMA)
        outputs = rand_outputs(rng)
        stage = {
            "$setWindowFields": {
                "partitionBy": "$p",
                "sortBy": {"t": 1},
                "output": outputs,
            }
        }
        got = {
            r["_id"]: r.asDict()
            for r in compile_pipeline(df, [stage], None, None).collect()
        }
        expect = ref_swf(rows, outputs)
        for _id, want in expect.items():
            for name, wv in want.items():
                hv = got[_id][name]
                assert close(hv, wv), (
                    f"trial {trial}: output {name} {outputs[name]!r} "
                    f"doc {_id}: got {hv!r} want {wv!r}"
                )
