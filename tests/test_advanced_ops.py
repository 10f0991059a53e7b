"""Positional array updates (arrayFilters), $lookup pipeline form,
$graphLookup."""

import pytest

from anser_spark.functions.updates import UpdateCompileError
from anser_spark.plans.pipeline import PipelineCompileError


def get(coll, _id):
    return coll.find_id(_id).one()


def test_positional_all_elements(doc_collection):
    # $[] — every element
    doc_collection.update_all({"_id": "a1"}, {"$mul": {"scores.$[]": 10}})
    assert get(doc_collection, "a1")["scores"] == [5.0, 9.0]


def test_positional_with_array_filters(doc_collection):
    # $[s] with arrayFilters — only matching elements
    doc_collection.update_all(
        {"_id": "a5"},
        {"$set": {"scores.$[s]": 0.0}},
        array_filters=[{"s": {"$lt": 0.5}}],
    )
    assert get(doc_collection, "a5")["scores"] == [0.0, 0.8]
    # unmatched rows untouched
    assert get(doc_collection, "a1")["scores"] == [0.5, 0.9]


def test_positional_inc_min_max(doc_collection):
    doc_collection.update_all({"_id": "a1"}, {"$inc": {"scores.$[]": 1}})
    assert get(doc_collection, "a1")["scores"] == [1.5, 1.9]
    doc_collection.update_all({"_id": "a1"}, {"$min": {"scores.$[]": 1.6}})
    assert get(doc_collection, "a1")["scores"] == [1.5, 1.6]
    doc_collection.update_all({"_id": "a1"}, {"$max": {"scores.$[]": 1.55}})
    assert get(doc_collection, "a1")["scores"] == [1.55, 1.6]


def test_positional_missing_filter_raises(doc_collection):
    with pytest.raises(Exception, match="arrayFilters"):
        doc_collection.update_all({"_id": "a1"}, {"$set": {"scores.$[q]": 1.0}})


def test_lookup_pipeline_form(engine):
    # correlated sub-pipeline: customer's expensive orders only
    out = (
        engine.db("tpch")
        .collection("customer")
        .pipe(
            [
                {"$match": {"c_custkey": {"$lt": 20}}},
                {
                    "$lookup": {
                        "from": "orders",
                        "let": {"ck": "$c_custkey"},
                        "pipeline": [
                            {"$match": {
                                "$expr": {"$eq": ["$$ck", "$o_custkey"]},
                                "o_totalprice": {"$gt": 300000.0},
                            }},
                            {"$project": {"o_orderkey": 1, "o_totalprice": 1}},
                        ],
                        "as": "big_orders",
                    }
                },
                {"$project": {"c_custkey": 1, "n_big": {"$size": "$big_orders"}}},
            ]
        )
        .all()
    )
    assert len(out) == 20
    # cross-check one customer against a direct query
    direct = (
        engine.db("tpch")
        .collection("orders")
        .find({"o_custkey": out[0]["c_custkey"], "o_totalprice": {"$gt": 300000.0}})
        .count()
    )
    assert out[0]["n_big"] == direct
    assert all(r["n_big"] >= 0 for r in out)


def test_lookup_pipeline_correlated_requires_expr(engine):
    # a $$var reference with no {$match: {$expr}} stage to key the join
    # is rejected (it would be a cross join); fully uncorrelated
    # pipelines are legal and broadcast (test_round2.py)
    with pytest.raises(PipelineCompileError, match="expr|match"):
        engine.db("tpch").collection("customer").pipe(
            [{"$lookup": {
                "from": "orders",
                "let": {"ck": "$c_custkey"},
                "pipeline": [{"$addFields": {"k": "$$ck"}}, {"$limit": 2}],
                "as": "x",
            }}]
        ).to_df()
    # uncorrelated form succeeds and attaches the same array everywhere
    out = engine.db("tpch").collection("nation").pipe(
        [
            {"$match": {"n_nationkey": 0}},
            {"$lookup": {"from": "region", "pipeline": [{"$limit": 2}], "as": "x"}},
        ]
    ).all()
    assert len(out) == 1 and len(out[0]["x"]) == 2


@pytest.fixture()
def graph_collection(engine, spark):
    coll = engine.db("graph").collection("employees")
    coll._rewrite(
        spark.createDataFrame(
            [
                ("ceo", None),
                ("vp1", "ceo"),
                ("vp2", "ceo"),
                ("mgr1", "vp1"),
                ("eng1", "mgr1"),
                ("eng2", "mgr1"),
            ],
            ["name", "reports_to"],
        )
    )
    return coll


def test_graph_lookup(graph_collection):
    # walk the reporting chain upward from each employee
    out = graph_collection.pipe(
        [
            {"$match": {"name": "eng1"}},
            {"$graphLookup": {
                "from": "employees",
                "startWith": "$reports_to",
                "connectFromField": "reports_to",
                "connectToField": "name",
                "as": "chain",
                "depthField": "depth",
            }},
        ]
    ).all()
    assert len(out) == 1
    chain = {c["name"]: c["depth"] for c in out[0]["chain"]}
    assert chain == {"mgr1": 0, "vp1": 1, "ceo": 2}


def test_graph_lookup_no_matches(graph_collection):
    out = graph_collection.pipe(
        [
            {"$match": {"name": "ceo"}},
            {"$graphLookup": {
                "from": "employees",
                "startWith": "$reports_to",
                "connectFromField": "reports_to",
                "connectToField": "name",
                "as": "chain",
            }},
        ]
    ).all()
    assert out[0]["chain"] == []


def test_graph_lookup_downward(graph_collection):
    # all reports (direct + transitive) of vp1
    out = graph_collection.pipe(
        [
            {"$match": {"name": "vp1"}},
            {"$graphLookup": {
                "from": "employees",
                "startWith": "$name",
                "connectFromField": "name",
                "connectToField": "reports_to",
                "as": "reports",
            }},
        ]
    ).all()
    names = sorted(r["name"] for r in out[0]["reports"])
    assert names == ["eng1", "eng2", "mgr1"]
