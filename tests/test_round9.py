"""Round 9: $facet byte cap + configurable row backstop, and the
inverted-postings $text index query path."""

import pytest

from pyspark.sql import functions as F

from anser_spark.plans.pipeline import compile_pipeline


# ---------------------------------------------------------------------------
# $facet: 16 MB byte cap (Mongo analogue) + configurable row backstop
# ---------------------------------------------------------------------------


def test_facet_byte_cap_raises(spark, monkeypatch):
    import anser_spark.plans.pipeline as P

    # a handful of large documents: under any row cap, over the bytes
    monkeypatch.setattr(P, "_FACET_MAX_BYTES_PER_LEG", 10_000)
    df = spark.range(5).selectExpr(
        "id as _id", "repeat('x', 10000) as blob"
    )
    bad = compile_pipeline(df, [{"$facet": {
        "raw": [{"$project": {"_id": 1, "blob": 1}}],
    }}], None, None)
    with pytest.raises(Exception, match="exceeds 16 MB"):
        bad.collect()
    # an aggregating leg over the same input stays fine
    ok = compile_pipeline(df, [{"$facet": {
        "n": [{"$count": "n"}],
    }}], None, None).collect()
    assert ok[0]["n"][0]["n"] == 5


def test_facet_row_cap_is_session_configurable(spark, monkeypatch):
    import anser_spark.plans.pipeline as P

    monkeypatch.setattr(P, "_FACET_MAX_ROWS_PER_LEG", 10)
    df = spark.range(50).selectExpr("id as _id")
    stages = [{"$facet": {"raw": [{"$project": {"_id": 1}}]}}]
    with pytest.raises(Exception, match="more than 10 documents"):
        compile_pipeline(df, stages, None, None).collect()
    # raising the session conf admits the same leg (sums far under 16MB)
    spark.conf.set("spark.anser.facet.maxRowsPerLeg", "1000")
    try:
        out = compile_pipeline(df, stages, None, None).collect()
        assert len(out[0]["raw"]) == 50
    finally:
        spark.conf.unset("spark.anser.facet.maxRowsPerLeg")
