import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

from anser_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark("anser-spark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", "4"))
    yield session


DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("activated", T.BooleanType()),
        T.StructField("priority", T.LongType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("version", T.IntegerType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("owner", T.StringType()),
                    T.StructField("repo", T.StringType()),
                    T.StructField("attempt", T.IntegerType()),
                ]
            ),
        ),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("scores", T.ArrayType(T.DoubleType())),
    ]
)


def _ts(day: int) -> datetime.datetime:
    return datetime.datetime(2026, 1, day, 12, 0, 0)


DOCS = [
    ("a1", "success", True, 10, _ts(1), 0, ("alice", "repo1", 1), ["red", "blue"], [0.5, 0.9]),
    ("a2", "failed", False, 5, _ts(2), 1, ("bob", "repo1", 2), ["blue"], [0.1]),
    ("a3", "started", True, None, _ts(3), 2, (None, "repo2", 1), [], []),
    ("a4", "success", False, 99, _ts(4), 3, ("carol", "repo2", 3), ["green", "red"], [0.7]),
    ("a5", "undispatched", True, -1, _ts(5), 4, ("dave", "repo3", 1), ["blue", "green", "red"], [0.2, 0.8]),
    ("a6", "failed", True, 42, _ts(6), 5, ("erin", "repo3", 2), ["yellow"], [0.99, 0.01]),
]


@pytest.fixture(scope="session")
def docs_df(spark):
    return spark.createDataFrame(DOCS, DOC_SCHEMA)


@pytest.fixture()
def engine(spark, tmp_path):
    from anser_spark.engine import Engine

    return Engine(spark, workdir=str(tmp_path / "work"), sources={"tpch": TESTDATA})


@pytest.fixture()
def doc_collection(engine, docs_df):
    coll = engine.db("appdb").collection("docs")
    coll._rewrite(docs_df)
    return coll
