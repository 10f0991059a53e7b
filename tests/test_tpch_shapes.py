"""TPC-H-shaped pipelines expressed in the Mongo dialect, each
differential-checked against DuckDB SQL over the same parquet — broad
evidence that the pipeline compiler composes correctly on classic OLAP
shapes (conditional aggregation, disjunctive pushdown, group-having
semi-joins, distinct counts, promo-share arithmetic).  Shapes are
adapted to the synthetic schema (no partsupp/shipmode columns; dates
span 1995-2001).
"""

import datetime
import os

import pytest

duckdb = pytest.importorskip("duckdb")

TD = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def _sql(q):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "part", "supplier", "nation"):
        con.execute(
            f"create view {t} as select * from '{TD}/{t}.parquet'"
        )
    return con.execute(q).fetchall()


def _rows(out, *cols, nd=4):
    def norm(v):
        return round(v, nd) if isinstance(v, float) else v

    return [tuple(norm(r[c]) for c in cols) for r in out]


def test_q6_shape_filtered_revenue(engine):
    # q6: pure scan-filter-aggregate with a band predicate
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {
            "l_shipdate": {"$gte": datetime.datetime(1996, 1, 1),
                           "$lt": datetime.datetime(1997, 1, 1)},
            "l_discount": {"$gte": 0.02, "$lte": 0.06},
            "l_quantity": {"$lt": 24},
        }},
        {"$group": {"_id": None,
                    "revenue": {"$sum": {"$multiply": ["$l_extendedprice", "$l_discount"]}},
                    "n": {"$sum": 1}}},
        {"$project": {"_id": 0, "revenue": {"$round": ["$revenue", 4]}, "n": 1}},
    ]).all()
    exp = _sql("""
        select round(sum(l_extendedprice*l_discount), 4), count(*)::bigint
        from lineitem
        where l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01'
          and l_discount between 0.02 and 0.06 and l_quantity < 24
    """)
    assert _rows(got, "revenue", "n") == exp


def test_q12_shape_conditional_agg(engine):
    # q12 adapted: orders joined to lineitem, counting high/low priority
    # orders per linestatus — CASE aggregation over a fused join
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_shipdate": {"$gte": datetime.datetime(1996, 1, 1),
                                   "$lt": datetime.datetime(1997, 1, 1)}}},
        {"$lookup": {"from": "orders", "localField": "l_orderkey",
                     "foreignField": "o_orderkey", "as": "o"}},
        {"$unwind": "$o"},
        {"$group": {
            "_id": "$l_linestatus",
            "high": {"$sum": {"$cond": [
                {"$in": ["$o.o_orderpriority", ["1-URGENT", "2-HIGH"]]}, 1, 0]}},
            "low": {"$sum": {"$cond": [
                {"$in": ["$o.o_orderpriority", ["1-URGENT", "2-HIGH"]]}, 0, 1]}},
        }},
        {"$sort": {"_id": 1}},
    ]).all()
    exp = _sql("""
        select l_linestatus,
               sum(case when o_orderpriority in ('1-URGENT','2-HIGH') then 1 else 0 end)::bigint,
               sum(case when o_orderpriority in ('1-URGENT','2-HIGH') then 0 else 1 end)::bigint
        from lineitem join orders on l_orderkey = o_orderkey
        where l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01'
        group by 1 order by 1 nulls first
    """)
    assert _rows(got, "_id", "high", "low") == exp


def test_q14_shape_promo_share(engine):
    # q14: promo revenue share — join + conditional sum / total sum
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_shipdate": {"$gte": datetime.datetime(1996, 3, 1),
                                   "$lt": datetime.datetime(1996, 9, 1)}}},
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$group": {"_id": None,
                    "promo": {"$sum": {"$cond": [
                        {"$eq": ["$p.p_type", "PROMO"]},
                        {"$multiply": ["$l_extendedprice",
                                       {"$subtract": [1, "$l_discount"]}]},
                        0]}},
                    "total": {"$sum": {"$multiply": ["$l_extendedprice",
                                                    {"$subtract": [1, "$l_discount"]}]}}}},
        {"$project": {"_id": 0, "promo_share": {"$round": [
            {"$multiply": [100.0, {"$divide": ["$promo", "$total"]}]}, 4]}}},
    ]).all()
    exp = _sql("""
        select round(100.0 * sum(case when p_type = 'PROMO'
                     then l_extendedprice*(1-l_discount) else 0 end)
               / sum(l_extendedprice*(1-l_discount)), 4)
        from lineitem join part on l_partkey = p_partkey
        where l_shipdate >= '1996-03-01' and l_shipdate < '1996-09-01'
    """)
    assert _rows(got, "promo_share") == exp


def test_q16_shape_distinct_suppliers(engine):
    # q16 adapted: distinct supplier count per brand via lineitem⋈part
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$match": {"p.p_size": {"$lte": 15}}},
        {"$group": {"_id": "$p.p_brand",
                    "supplier_cnt": {"$addToSet": "$l_suppkey"}}},
        {"$project": {"supplier_cnt": {"$size": "$supplier_cnt"}}},
        {"$sort": {"supplier_cnt": -1, "_id": 1}},
        {"$limit": 5},
    ]).all()
    exp = _sql("""
        select p_brand, count(distinct l_suppkey)::int as sc
        from lineitem join part on l_partkey = p_partkey
        where p_size <= 15
        group by 1 order by sc desc, p_brand limit 5
    """)
    assert _rows(got, "_id", "supplier_cnt") == exp


def test_q19_shape_disjunctive_predicates(engine):
    # q19: OR-of-ANDs across join sides — exercises boolean pushdown
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$match": {"$or": [
            {"p.p_brand": "Brand#1", "p.p_size": {"$lte": 10},
             "l_quantity": {"$gte": 1, "$lte": 20}},
            {"p.p_brand": "Brand#2", "p.p_size": {"$lte": 20},
             "l_quantity": {"$gte": 10, "$lte": 30}},
        ]}},
        {"$group": {"_id": None,
                    "revenue": {"$sum": {"$multiply": ["$l_extendedprice",
                                                       {"$subtract": [1, "$l_discount"]}]}},
                    "n": {"$sum": 1}}},
        {"$project": {"_id": 0, "revenue": {"$round": ["$revenue", 4]}, "n": 1}},
    ]).all()
    exp = _sql("""
        select round(sum(l_extendedprice*(1-l_discount)), 4), count(*)::bigint
        from lineitem join part on l_partkey = p_partkey
        where (p_brand = 'Brand#1' and p_size <= 10 and l_quantity between 1 and 20)
           or (p_brand = 'Brand#2' and p_size <= 20 and l_quantity between 10 and 30)
    """)
    assert _rows(got, "revenue", "n") == exp


def test_q18_shape_group_having_topk(engine):
    # q18: large-quantity orders — group-having feeding a join + top-k
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$group": {"_id": "$l_orderkey", "qty": {"$sum": "$l_quantity"}}},
        {"$match": {"qty": {"$gt": 150}}},
        {"$lookup": {"from": "orders", "localField": "_id",
                     "foreignField": "o_orderkey", "as": "o"}},
        {"$unwind": "$o"},
        {"$project": {"qty": 1, "o_totalprice": "$o.o_totalprice",
                      "o_custkey": "$o.o_custkey"}},
        {"$sort": {"o_totalprice": -1, "_id": 1}},
        {"$limit": 10},
    ]).all()
    exp = _sql("""
        with big as (
          select l_orderkey, sum(l_quantity) as qty from lineitem
          group by 1 having sum(l_quantity) > 150)
        select l_orderkey, qty, o_totalprice, o_custkey
        from big join orders on l_orderkey = o_orderkey
        order by o_totalprice desc, l_orderkey limit 10
    """)
    assert _rows(got, "_id", "qty", "o_totalprice", "o_custkey") == exp


def test_q15_shape_top_supplier_window(engine):
    # q15: revenue per supplier, keep the max via $setWindowFields
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_shipdate": {"$gte": datetime.datetime(1996, 1, 1),
                                   "$lt": datetime.datetime(1996, 4, 1)}}},
        {"$group": {"_id": "$l_suppkey",
                    "revenue": {"$sum": {"$multiply": ["$l_extendedprice",
                                                       {"$subtract": [1, "$l_discount"]}]}}}},
        {"$setWindowFields": {"sortBy": {"revenue": -1},
                              "output": {"mx": {"$max": "$revenue",
                                                "window": {"documents":
                                                           ["unbounded", "unbounded"]}}}}},
        {"$match": {"$expr": {"$eq": ["$revenue", "$mx"]}}},
        {"$project": {"_id": 1, "revenue": {"$round": ["$revenue", 4]}}},
    ]).all()
    exp = _sql("""
        with rev as (
          select l_suppkey, sum(l_extendedprice*(1-l_discount)) as revenue
          from lineitem
          where l_shipdate >= '1996-01-01' and l_shipdate < '1996-04-01'
          group by 1)
        select l_suppkey, round(revenue, 4)
        from (select *, max(revenue) over () as mx from rev)
        where revenue = mx
        order by 1
    """)
    assert _rows(got, "_id", "revenue") == exp
