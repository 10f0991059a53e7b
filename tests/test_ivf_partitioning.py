"""IVF ANN index + partitioned-collection pruning."""

import pytest
from pyspark.sql import functions as F

from anser_spark.operators.ivf import ivf_assign, ivf_top_k, ivf_train
from anser_spark.operators.similarity import cosine_top_k


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_full_probe_equals_brute_force(emb):
    index = ivf_train(emb, k=8, max_iter=5)
    assert len(index.centroids) == 8 and len(index.centroids[0]) == 64
    assigned = ivf_assign(emb, index).persist()
    # every vector got a list id in range
    stats = assigned.agg(
        F.min("centroid_id"), F.max("centroid_id"), F.count(F.lit(1))
    ).first()
    assert 0 <= stats[0] and stats[1] <= 7 and stats[2] == 500
    query = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    exact = [r["vec_id"] for r in cosine_top_k(emb, query, k=10, round_to=4).collect()]
    full_probe = [r["vec_id"] for r in ivf_top_k(assigned, index, query, k=10, nprobe=8).collect()]
    assert full_probe == exact  # nprobe=k degrades to exact search


def test_ivf_partial_probe_recall(emb):
    index = ivf_train(emb, k=8, max_iter=5)
    assigned = ivf_assign(emb, index).persist()
    query = [float(x) for x in emb.where("vec_id = 7").first()["embedding"]]
    exact = [r["vec_id"] for r in cosine_top_k(emb, query, k=10, round_to=4).collect()]
    probed = [r["vec_id"] for r in ivf_top_k(assigned, index, query, k=10, nprobe=3).collect()]
    # the query vector itself lives in a probed list → top-1 always found
    assert probed[0] == 7
    recall = len(set(probed) & set(exact)) / 10
    assert recall >= 0.3  # random-ish embeddings: partial probe keeps some


def test_partitioned_collection_prunes(engine, docs_df):
    coll = engine.db("appdb").collection("pdocs")
    coll.set_partitioning("status")
    coll._rewrite(docs_df)
    # partition columns round-trip through the pointer-swap layout
    assert coll.partition_columns() == ["status"]
    assert coll.count() == 6
    df = coll.find({"status": "failed"}).to_df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "status" in plan.split("PartitionFilters")[1][:200]
    assert df.count() == 2
    # mutations preserve partitioning
    coll.update_all({"status": "failed"}, {"$set": {"activated": False}})
    assert coll.count() == 6
    assert coll.find({"status": "failed", "activated": False}).count() == 2
