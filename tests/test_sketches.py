"""HLL sketch distinct counting + exact heavy hitters."""

import pytest
from pyspark.sql import functions as F

from anser_spark.operators.sketches import (
    approx_distinct,
    heavy_hitters,
    hll_distinct,
    hll_merge_estimate,
)


@pytest.fixture(scope="module")
def events(spark):
    import os
    td = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    from anser_spark.sources.readers import read_parquet_table
    return read_parquet_table(spark, os.path.join(td, "events.parquet"))


def test_hll_distinct_close_to_exact(events):
    exact = events.select("user_id").distinct().count()
    est = hll_distinct(events, "user_id").collect()[0]["distinct_est"]
    assert abs(est - exact) / exact < 0.05


def test_hll_sketches_merge(events):
    # per-event-type sketches merged == global estimate (mergeability:
    # the incremental-stats property that matters at scale)
    per_type = hll_distinct(events, "user_id", by="event_type")
    merged = hll_merge_estimate(per_type).collect()[0]["distinct_est"]
    direct = hll_distinct(events, "user_id").collect()[0]["distinct_est"]
    assert merged == direct  # same sketch contents, merge is lossless


def test_approx_distinct_grouped(events):
    out = {r["event_type"]: r["distinct_est"]
           for r in approx_distinct(events, "user_id", by="event_type").collect()}
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type")
                            .agg(F.countDistinct("user_id").alias("n")).collect()}
    for t, e in exact.items():
        assert abs(out[t] - e) / e < 0.1


def test_heavy_hitters_exact(events):
    top = heavy_hitters(events, "event_type", k=2).collect()
    exact = (events.groupBy("event_type").count()
             .orderBy(F.col("count").desc(), F.col("event_type")).collect())
    assert [(r["value"], r["freq"]) for r in top] == \
           [(r["event_type"], r["count"]) for r in exact[:2]]


def test_heavy_hitters_grouped(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c")],
        "g string, v string")
    out = heavy_hitters(df, "v", k=1, by="g").collect()
    got = {r["g"]: (r["value"], r["freq"]) for r in out}
    assert got == {"g1": ("a", 2), "g2": ("c", 1)}
