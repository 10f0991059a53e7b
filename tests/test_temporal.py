"""asof_join / interval_join: correctness vs hand-computed matches and
a pandas merge_asof cross-check; plan checks (no nested-loop join)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anser_spark.operators.temporal import asof_join, interval_join


def _t(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture()
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", _t(9, 30), 100.0), ("A", _t(10, 0), 101.0),
         ("B", _t(9, 45), 50.0), ("A", _t(8, 0), 99.0)],
        "sym string, ts timestamp, px double")
    quotes = spark.createDataFrame(
        [("A", _t(9, 0), 1.0), ("A", _t(9, 30), 2.0), ("A", _t(9, 59), 3.0),
         ("B", _t(9, 50), 4.0)],
        "sym string, ts timestamp, bid double")
    return trades, quotes


def test_asof_backward_inclusive(quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join(trades, quotes, on="ts", by="sym")
    got = {(r["sym"], r["ts"]): r["bid"] for r in out.collect()}
    assert got[("A", _t(9, 30))] == 2.0   # inclusive tie → the 9:30 quote
    assert got[("A", _t(10, 0))] == 3.0
    assert got[("A", _t(8, 0))] is None   # before any quote
    assert got[("B", _t(9, 45))] is None  # B's only quote is later
    assert out.count() == trades.count()  # left semantics


def test_asof_strict_and_tolerance(quotes_trades):
    trades, quotes = quotes_trades
    strict = asof_join(trades, quotes, on="ts", by="sym", strict=True)
    got = {(r["sym"], r["ts"]): r["bid"] for r in strict.collect()}
    assert got[("A", _t(9, 30))] == 1.0   # strict < skips the 9:30 quote

    tol = asof_join(trades, quotes, on="ts", by="sym",
                    tolerance=F.expr("INTERVAL 5 MINUTES"))
    got = {(r["sym"], r["ts"]): r["bid"] for r in tol.collect()}
    assert got[("A", _t(10, 0))] == 3.0   # 1 min back: within tolerance
    assert got[("A", _t(9, 30))] == 2.0   # 0 back
    # (8:00 has no match at all)
    assert got[("A", _t(8, 0))] is None


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    n_l, n_r = 300, 120
    lpdf = pd.DataFrame({
        "k": rng.randint(0, 5, n_l),
        "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10_000, n_l), unit="s"),
    }).sort_values(["t"], ignore_index=True)
    rpdf = pd.DataFrame({
        "k": rng.randint(0, 5, n_r),
        "t": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10_000, n_r), unit="s"),
        "v": rng.rand(n_r),
    }).sort_values(["t"], ignore_index=True)
    # pandas merge_asof requires sorted by on-key
    expected = pd.merge_asof(lpdf, rpdf, on="t", by="k", direction="backward")
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                  on="t", by="k")
        .toPandas().sort_values(["t", "k"], ignore_index=True)
    )
    exp = expected.sort_values(["t", "k"], ignore_index=True)
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(
        got["v"].reset_index(drop=True), exp["v"].reset_index(drop=True),
        check_names=False)


def test_asof_plan_has_no_nested_loop(quotes_trades):
    trades, quotes = quotes_trades
    plan = asof_join(trades, quotes, on="ts", by="sym")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join(spark):
    points = spark.createDataFrame(
        [(1, _t(9, 15)), (2, _t(9, 45)), (3, _t(11, 0)), (4, _t(9, 0))],
        "pid int, ts timestamp")
    iv = spark.createDataFrame(
        [("w1", _t(9, 0), _t(9, 30)), ("w2", _t(9, 20), _t(10, 0)),
         ("w3", _t(12, 0), _t(13, 0))],
        "wid string, t0 timestamp, t1 timestamp")
    out = interval_join(points, iv, "ts", "t0", "t1", bucket="15 minutes")
    got = sorted((r["pid"], r["wid"]) for r in out.collect())
    # 9:15 ∈ w1; 9:45 ∈ w2; 9:00 ∈ w1 (inclusive start); 11:00 ∈ nothing
    assert got == [(1, "w1"), (2, "w2"), (4, "w1")]


def test_asof_null_field_not_resurrected(spark):
    # The matched (latest) right row has a null field: that null must
    # survive — carrying columns independently would resurrect v=10
    # from the older row and emit a (v=10, tag='new') row that never
    # existed on the right side.
    left = spark.createDataFrame([(1, _t(3),)], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(1), 10.0, "old"), (1, _t(2), None, "new")],
        "k int, ts timestamp, v double, tag string")
    row = asof_join(left, right, on="ts", by="k").collect()[0]
    assert row["tag"] == "new" and row["v"] is None


def test_interval_join_non_utc_session_tz(spark):
    # bucket seconds must be timezone-independent; with the epoch
    # parsed as a session-tz string, Asia/Tokyo yields bsecs=-28800
    # for a 1-hour bucket (silently wrong widths / DIVIDE_BY_ZERO).
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        points = spark.createDataFrame(
            [(1, _t(9, 15)), (3, _t(11, 0))], "pid int, ts timestamp")
        iv = spark.createDataFrame(
            [("w1", _t(9, 0), _t(9, 30))], "wid string, t0 timestamp, t1 timestamp")
        out = interval_join(points, iv, "ts", "t0", "t1", bucket="1 hour")
        assert [(r["pid"], r["wid"]) for r in out.collect()] == [(1, "w1")]
        spark.conf.set("spark.sql.session.timeZone", "Europe/Paris")
        assert [(r["pid"], r["wid"]) for r in out.collect()] == [(1, "w1")]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_interval_join_with_keys_and_plan(spark):
    points = spark.createDataFrame(
        [("u1", _t(9, 15)), ("u2", _t(9, 15))], "uid string, ts timestamp")
    iv = spark.createDataFrame(
        [("u1", "s1", _t(9, 0), _t(10, 0))],
        "uid string, sid string, t0 timestamp, t1 timestamp")
    out = interval_join(points, iv, "ts", "t0", "t1", by="uid", bucket="30 minutes")
    rows = out.collect()
    assert [(r["uid"], r["sid"]) for r in rows] == [("u1", "s1")]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
