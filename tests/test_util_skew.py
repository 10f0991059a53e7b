"""bsonutil analogue + skew-handling join utilities."""

from dataclasses import dataclass, field

import pytest
from pyspark.sql import functions as F

from anser_spark.bsonutil import (
    get_dotted_key_name,
    model_columns,
    must_have_tag,
    row_to_model,
    tag,
)
from anser_spark.operators.skew import salted_join, top_keys


@dataclass
class TaskModel:
    task_id: str = field(metadata={"bson": "_id"})
    status: str = "new"
    priority: int = field(default=0, metadata={"bson": "prio"})


def test_dotted_key_name():
    assert get_dotted_key_name("a", "b", "c") == "a.b.c"


def test_tag_and_must_have_tag():
    assert tag(TaskModel, "task_id") == "_id"
    assert tag(TaskModel, "status") == "status"
    assert tag(TaskModel, "ghost") == ""
    assert must_have_tag(TaskModel, "priority") == "prio"
    with pytest.raises(KeyError):
        must_have_tag(TaskModel, "ghost")


def test_model_columns_and_row_to_model():
    assert model_columns(TaskModel) == {"task_id": "_id", "status": "status", "priority": "prio"}
    m = row_to_model(TaskModel, {"_id": "t1", "status": "done", "prio": 5, "extra": 1})
    assert m == TaskModel(task_id="t1", status="done", priority=5)


def test_top_keys_and_salted_join(spark):
    # skewed big side: key 1 is 80% of rows
    big = spark.createDataFrame(
        [(1, i) for i in range(800)] + [(k, 0) for k in range(2, 202)], ["k", "v"]
    )
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 202)], ["k", "name"])
    assert top_keys(big, "k", 1) == [1]
    joined = salted_join(big, small, on="k", salt=4)
    assert joined.count() == 1000  # same result as a plain join
    plain = big.join(small, "k").count()
    assert joined.count() == plain
    # all hot-key rows kept the right dim value
    hot = joined.where(F.col("k") == 1).select("name").distinct().collect()
    assert [r["name"] for r in hot] == ["dim1"]
