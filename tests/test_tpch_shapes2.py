"""The remaining TPC-H query shapes (q2 q8 q9 q11 q13 q17 q20 q21 q22)
expressed as Mongo aggregation pipelines, differential-checked against
DuckDB SQL over the same parquet — completing the 22-query sweep started
in test_tpch_shapes.py (q1/3/5/7/10 are driver gates, q4 in
test_round5c).  Shapes adapted to the synthetic schema: no partsupp
table (supplier-side quantities stand in for stock), no
receiptdate/commitdate (l_returnflag = 'R' stands in for "late").

Shape inventory exercised here:
  q2  correlated scalar max subquery (pipeline $lookup + $group)
  q8  7-table join with conditional-share aggregation per year
  q9  profit expression over a 4-table join, grouped (nation, year)
  q11 group + global-threshold scalar subquery (uncorrelated $lookup)
  q13 left-join count distribution (including empty groups)
  q17 correlated per-part average threshold
  q20 join → group-having → join back (nested semi-join flattening)
  q21 EXISTS + NOT EXISTS double correlation (semi + anti fusion)
  q22 global-average filter + anti-join on orders
"""

import datetime
import os

import pytest

duckdb = pytest.importorskip("duckdb")

TD = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")

TABLES = ("lineitem", "orders", "customer", "part", "supplier", "nation", "region")


def _sql(q):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{TD}/{t}.parquet'")
    return con.execute(q).fetchall()


def _rows(out, *cols, nd=4):
    def norm(v):
        return round(v, nd) if isinstance(v, float) else v

    return [tuple(norm(r[c]) for c in cols) for r in out]


def test_q2_shape_correlated_max(engine):
    # q2's core shape: pick rows equal to a correlated aggregate —
    # suppliers holding their nation's max acctbal, within one region
    got = engine.db("tpch").collection("supplier").pipe([
        {"$lookup": {"from": "nation", "localField": "s_nationkey",
                     "foreignField": "n_nationkey", "as": "n"}},
        {"$unwind": "$n"},
        {"$lookup": {"from": "region", "localField": "n.n_regionkey",
                     "foreignField": "r_regionkey", "as": "r"}},
        {"$unwind": "$r"},
        {"$match": {"r.r_name": "ASIA"}},
        {"$lookup": {"from": "supplier", "let": {"nk": "$s_nationkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$eq": ["$$nk", "$s_nationkey"]}}},
                         {"$group": {"_id": None, "mx": {"$max": "$s_acctbal"}}},
                     ],
                     "as": "m"}},
        {"$unwind": "$m"},
        {"$match": {"$expr": {"$eq": ["$s_acctbal", "$m.mx"]}}},
        {"$project": {"_id": 0, "s_name": 1, "n_name": "$n.n_name"}},
        {"$sort": {"s_name": 1}},
    ]).all()
    exp = _sql("""
        select s_name, n_name
        from supplier s join nation on s_nationkey = n_nationkey
                        join region on n_regionkey = r_regionkey
        where r_name = 'ASIA'
          and s_acctbal is not distinct from
              (select max(s2.s_acctbal) from supplier s2
               where s2.s_nationkey = s.s_nationkey)
        order by s_name nulls first
    """)
    # multiset compare: duplicate (incl. null) s_name sort keys make
    # tie order engine-specific
    nkey = lambda t: tuple((v is not None, v) for v in t)  # noqa: E731
    assert sorted(_rows(got, "s_name", "n_name"), key=nkey) == sorted(exp, key=nkey)
    assert len(got) > 0


def test_q8_shape_market_share(engine):
    # q8: the national market share among one region's customers, per
    # order year — a 7-table join feeding a conditional-share $group
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "orders", "localField": "l_orderkey",
                     "foreignField": "o_orderkey", "as": "o"}},
        {"$unwind": "$o"},
        {"$lookup": {"from": "customer", "localField": "o.o_custkey",
                     "foreignField": "c_custkey", "as": "c"}},
        {"$unwind": "$c"},
        {"$lookup": {"from": "nation", "localField": "c.c_nationkey",
                     "foreignField": "n_nationkey", "as": "cn"}},
        {"$unwind": "$cn"},
        {"$lookup": {"from": "region", "localField": "cn.n_regionkey",
                     "foreignField": "r_regionkey", "as": "cr"}},
        {"$unwind": "$cr"},
        {"$match": {"cr.r_name": "AMERICA"}},
        {"$lookup": {"from": "supplier", "localField": "l_suppkey",
                     "foreignField": "s_suppkey", "as": "s"}},
        {"$unwind": "$s"},
        {"$lookup": {"from": "nation", "localField": "s.s_nationkey",
                     "foreignField": "n_nationkey", "as": "sn"}},
        {"$unwind": "$sn"},
        {"$addFields": {"vol": {"$multiply": [
            "$l_extendedprice", {"$subtract": [1, "$l_discount"]}]}}},
        {"$group": {"_id": {"$year": "$o.o_orderdate"},
                    "share_num": {"$sum": {"$cond": [
                        {"$eq": ["$sn.n_name", "NATION_7"]}, "$vol", 0]}},
                    "share_den": {"$sum": "$vol"}}},
        {"$project": {"share": {"$round": [
            {"$divide": ["$share_num", "$share_den"]}, 6]}}},
        {"$sort": {"_id": 1}},
    ]).all()
    exp = _sql("""
        select year(o_orderdate) as y,
               round(sum(case when sn.n_name = 'NATION_7'
                         then l_extendedprice*(1-l_discount) else 0 end)
                     / sum(l_extendedprice*(1-l_discount)), 6)
        from lineitem
          join orders   on l_orderkey = o_orderkey
          join customer on o_custkey = c_custkey
          join nation cn on c_nationkey = cn.n_nationkey
          join region   on cn.n_regionkey = r_regionkey
          join supplier on l_suppkey = s_suppkey
          join nation sn on s_nationkey = sn.n_nationkey
        where r_name = 'AMERICA'
        group by 1 order by 1 nulls first
    """)
    assert _rows(got, "_id", "share", nd=6) == exp
    assert len(got) >= 5


def test_q9_shape_profit_by_nation_year(engine):
    # q9 adapted (no partsupp): profit = revenue - 10% retail cost,
    # for widget-named parts, grouped by supplier nation and year
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$match": {"p.p_name": {"$regex": "widget"}}},
        {"$lookup": {"from": "orders", "localField": "l_orderkey",
                     "foreignField": "o_orderkey", "as": "o"}},
        {"$unwind": "$o"},
        {"$lookup": {"from": "supplier", "localField": "l_suppkey",
                     "foreignField": "s_suppkey", "as": "s"}},
        {"$unwind": "$s"},
        {"$lookup": {"from": "nation", "localField": "s.s_nationkey",
                     "foreignField": "n_nationkey", "as": "n"}},
        {"$unwind": "$n"},
        {"$group": {"_id": {"nation": "$n.n_name",
                            "year": {"$year": "$o.o_orderdate"}},
                    "profit": {"$sum": {"$subtract": [
                        {"$multiply": ["$l_extendedprice",
                                       {"$subtract": [1, "$l_discount"]}]},
                        {"$multiply": [0.1, "$p.p_retailprice", "$l_quantity"]},
                    ]}}}},
        {"$project": {"_id": 0, "nation": "$_id.nation", "year": "$_id.year",
                      "profit": {"$round": ["$profit", 4]}}},
        {"$sort": {"nation": 1, "year": 1}},
    ]).all()
    exp = _sql("""
        select n_name, year(o_orderdate) as y,
               round(coalesce(sum(l_extendedprice*(1-l_discount)
                                  - 0.1*p_retailprice*l_quantity), 0), 4)
        from lineitem
          join part on l_partkey = p_partkey
          join orders on l_orderkey = o_orderkey
          join supplier on l_suppkey = s_suppkey
          join nation on s_nationkey = n_nationkey
        where p_name like '%widget%'
        group by 1, 2 order by 1 nulls first, 2 nulls first
    """)
    assert _rows(got, "nation", "year", "profit") == exp
    assert len(got) > 10


def test_q11_shape_global_threshold(engine):
    # q11's shape: per-group totals kept only above a fraction of the
    # GLOBAL total — scalar subquery via an uncorrelated pipeline $lookup
    # (threshold 0.05: discriminates at every sf — sf0.1/sf1 max nation
    # share is 0.056, so 0.1 selected nothing there)
    got = engine.db("tpch").collection("supplier").pipe([
        {"$group": {"_id": "$s_nationkey", "bal": {"$sum": "$s_acctbal"}}},
        {"$lookup": {"from": "supplier",
                     "pipeline": [{"$group": {"_id": None,
                                              "tot": {"$sum": "$s_acctbal"}}}],
                     "as": "g"}},
        {"$unwind": "$g"},
        {"$match": {"$expr": {"$gt": ["$bal", {"$multiply": [0.05, "$g.tot"]}]}}},
        {"$project": {"bal": {"$round": ["$bal", 4]}}},
        {"$sort": {"_id": 1}},
    ]).all()
    exp = _sql("""
        select s_nationkey, round(sum(s_acctbal), 4) as bal
        from supplier
        group by 1
        having sum(s_acctbal) > (select 0.05 * sum(s_acctbal) from supplier)
        order by 1
    """)
    assert _rows(got, "_id", "bal") == exp
    assert len(got) > 0


def test_q13_shape_count_distribution(engine):
    # q13: distribution of per-customer order counts, INCLUDING the
    # zero-order customers a left join preserves
    got = engine.db("tpch").collection("customer").pipe([
        {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ck", "$o_custkey"]},
                             {"$ne": ["$o_orderpriority", "1-URGENT"]},
                         ]}}},
                     ],
                     "as": "os"}},
        {"$project": {"c_count": {"$size": "$os"}}},
        {"$group": {"_id": "$c_count", "custdist": {"$sum": 1}}},
        {"$sort": {"custdist": -1, "_id": -1}},
    ]).all()
    exp = _sql("""
        select c_count, count(*)::bigint as custdist from (
          select c_custkey, count(o_orderkey)::bigint as c_count
          from customer left join orders
            on c_custkey = o_custkey
           and (o_orderpriority is null or o_orderpriority <> '1-URGENT')
          group by 1
        ) group by 1 order by 2 desc, 1 desc
    """)
    assert _rows(got, "_id", "custdist") == exp
    assert len(got) > 3


def test_q17_shape_correlated_avg(engine):
    # q17: lineitems far below their part's average quantity — a
    # correlated per-part average, then a global revenue aggregate
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$match": {"p.p_brand": "Brand#13"}},
        {"$lookup": {"from": "lineitem", "let": {"pk": "$l_partkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$eq": ["$$pk", "$l_partkey"]}}},
                         {"$group": {"_id": None, "aq": {"$avg": "$l_quantity"}}},
                     ],
                     "as": "a"}},
        {"$unwind": "$a"},
        {"$match": {"$expr": {"$lt": ["$l_quantity",
                                      {"$multiply": [0.5, "$a.aq"]}]}}},
        {"$group": {"_id": None,
                    "avg_yearly": {"$sum": {"$divide": ["$l_extendedprice", 7.0]}},
                    "n": {"$sum": 1}}},
        {"$project": {"_id": 0, "avg_yearly": {"$round": ["$avg_yearly", 4]}, "n": 1}},
    ]).all()
    exp = _sql("""
        select round(sum(l_extendedprice) / 7.0, 4), count(*)::bigint
        from lineitem l join part on l_partkey = p_partkey
        where p_brand = 'Brand#13'
          and ((l_quantity is null
                and (select avg(l2.l_quantity) from lineitem l2
                     where l2.l_partkey = l.l_partkey) is not null)
               or l_quantity < (select 0.5 * avg(l2.l_quantity)
                                from lineitem l2
                                where l2.l_partkey = l.l_partkey))
    """)
    assert _rows(got, "avg_yearly", "n") == exp


def test_q20_shape_group_having_join_back(engine):
    # q20 flattened (no partsupp): suppliers that shipped a large total
    # quantity of widget parts — join, group-having, then join the
    # qualifying keys back to the supplier dimension
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$lookup": {"from": "part", "localField": "l_partkey",
                     "foreignField": "p_partkey", "as": "p"}},
        {"$unwind": "$p"},
        {"$match": {"p.p_name": {"$regex": "widget"}}},
        {"$group": {"_id": "$l_suppkey", "qty": {"$sum": "$l_quantity"}}},
        {"$match": {"qty": {"$gt": 400}}},
        {"$lookup": {"from": "supplier", "localField": "_id",
                     "foreignField": "s_suppkey", "as": "s"}},
        {"$unwind": "$s"},
        {"$project": {"_id": 0, "s_name": "$s.s_name",
                      "qty": {"$round": ["$qty", 4]}}},
        {"$sort": {"s_name": 1}},
    ]).all()
    exp = _sql("""
        select s_name, round(qty, 4) from (
          select l_suppkey, sum(l_quantity) as qty
          from lineitem join part on l_partkey = p_partkey
          where p_name like '%widget%'
          group by 1 having sum(l_quantity) > 400
        ) join supplier on l_suppkey = s_suppkey
        order by 1
    """)
    # compare as sorted multisets: scale fixtures replicate suppliers
    # with DUPLICATE s_name values, so order-by-name is nondeterministic
    # among ties (engines break them differently — a fixture artifact)
    nkey = lambda t: tuple((v is not None, v) for v in t)  # noqa: E731
    assert sorted(_rows(got, "s_name", "qty"), key=nkey) == sorted(exp, key=nkey)
    assert len(got) > 0


def test_q21_shape_exists_not_exists(engine):
    # q21 adapted (l_returnflag 'R' = the fault marker): the only
    # faulting supplier on a multi-supplier order — EXISTS(another
    # supplier's line) AND NOT EXISTS(another supplier's faulting line),
    # both as correlated pipeline lookups the compiler fuses to
    # left_semi / left_anti joins
    got = engine.db("tpch").collection("lineitem").pipe([
        {"$match": {"l_returnflag": "R"}},
        {"$lookup": {"from": "lineitem",
                     "let": {"ok": "$l_orderkey", "sk": "$l_suppkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ok", "$l_orderkey"]},
                             {"$ne": ["$$sk", "$l_suppkey"]},
                         ]}}},
                     ],
                     "as": "others"}},
        {"$match": {"others": {"$ne": []}}},
        {"$unset": "others"},
        {"$lookup": {"from": "lineitem",
                     "let": {"ok": "$l_orderkey", "sk": "$l_suppkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ok", "$l_orderkey"]},
                             {"$ne": ["$$sk", "$l_suppkey"]},
                             {"$eq": ["$l_returnflag", "R"]},
                         ]}}},
                     ],
                     "as": "other_faults"}},
        {"$match": {"other_faults": {"$size": 0}}},
        {"$unset": "other_faults"},
        {"$group": {"_id": "$l_suppkey", "numwait": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ]).all()
    exp = _sql("""
        select l1.l_suppkey, count(*)::bigint as numwait
        from lineitem l1
        where l1.l_returnflag = 'R'
          and exists (select 1 from lineitem l2
                      where l2.l_orderkey = l1.l_orderkey
                        and l2.l_suppkey <> l1.l_suppkey)
          and not exists (select 1 from lineitem l3
                          where l3.l_orderkey = l1.l_orderkey
                            and l3.l_suppkey <> l1.l_suppkey
                            and l3.l_returnflag = 'R')
        group by 1 order by 1
    """)
    assert _rows(got, "_id", "numwait") == exp
    assert len(got) > 0


def test_q22_shape_global_avg_anti_join(engine):
    # q22: rich-but-inactive customers — acctbal above the global
    # positive average (uncorrelated scalar) and no orders (anti-join)
    got = engine.db("tpch").collection("customer").pipe([
        {"$lookup": {"from": "customer",
                     "pipeline": [
                         {"$match": {"c_acctbal": {"$gt": 0.0}}},
                         {"$group": {"_id": None, "ab": {"$avg": "$c_acctbal"}}},
                     ],
                     "as": "g"}},
        {"$unwind": "$g"},
        {"$match": {"$expr": {"$gt": ["$c_acctbal", "$g.ab"]}}},
        {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ck", "$o_custkey"]},
                             {"$eq": ["$o_orderpriority", "1-URGENT"]},
                         ]}}},
                     ],
                     "as": "os"}},
        {"$match": {"os": {"$size": 0}}},
        {"$group": {"_id": "$c_mktsegment",
                    "numcust": {"$sum": 1},
                    "totacctbal": {"$sum": "$c_acctbal"}}},
        {"$project": {"numcust": 1,
                      "totacctbal": {"$round": ["$totacctbal", 4]}}},
        {"$sort": {"_id": 1}},
    ]).all()
    exp = _sql("""
        select c_mktsegment, count(*)::bigint, round(sum(c_acctbal), 4)
        from customer c
        where c_acctbal > (select avg(c_acctbal) from customer
                           where c_acctbal > 0)
          and not exists (select 1 from orders
                          where o_custkey = c_custkey
                            and o_orderpriority = '1-URGENT')
        group by 1 order by 1 nulls first
    """)
    assert _rows(got, "_id", "numcust", "totacctbal") == exp
    assert len(got) > 0


# ---------------------------------------------------------------------------
# Targeted coverage for the two compiler features these shapes drove out:
# decorrelated $group inside a correlated $lookup, and correlated
# non-equality (theta) $match conditions.
# ---------------------------------------------------------------------------


def test_lookup_group_compound_id_and_empty_match(engine):
    # compound _id inside the correlated $group; an outer row with no
    # matching foreign docs must get an EMPTY array (empty-input $group
    # emits nothing in Mongo too)
    got = engine.db("tpch").collection("supplier").pipe([
        {"$lookup": {"from": "lineitem", "let": {"sk": "$s_suppkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$sk", "$l_suppkey"]},
                             {"$gt": ["$l_quantity", 49]},
                         ]}}},
                         {"$group": {"_id": {"rf": "$l_returnflag",
                                             "ls": "$l_linestatus"},
                                     "n": {"$sum": 1}}},
                     ],
                     "as": "by_flag"}},
        {"$project": {"s_suppkey": 1, "k": {"$size": "$by_flag"}}},
        {"$sort": {"s_suppkey": 1}},
    ]).all()
    # FILTER: an unmatched left-join row yields the (NULL, NULL) struct,
    # which DuckDB's count(distinct) counts as a value — but Mongo's
    # empty-match $lookup gives an empty array, i.e. 0 (the skewed
    # fixture, where some suppliers have no qty>49 rows, exposed this)
    exp = _sql("""
        select s_suppkey,
               count(distinct (l_returnflag, l_linestatus))
                   filter (where l_suppkey is not null)::bigint
        from supplier left join lineitem
          on s_suppkey = l_suppkey and l_quantity > 49
        group by 1 order by 1
    """)
    assert [(r["s_suppkey"], r["k"]) for r in got] == [
        (a, b if b is not None else 0) for a, b in exp
    ]


def test_lookup_group_distinct_only(engine):
    # $group with no accumulators = per-key distinct
    got = engine.db("tpch").collection("supplier").pipe([
        {"$lookup": {"from": "lineitem", "let": {"sk": "$s_suppkey"},
                     "pipeline": [
                         {"$match": {"$expr": {"$eq": ["$$sk", "$l_suppkey"]}}},
                         {"$group": {"_id": "$l_returnflag"}},
                     ],
                     "as": "flags"}},
        {"$project": {"s_suppkey": 1, "k": {"$size": "$flags"}}},
        {"$sort": {"s_suppkey": 1}},
    ]).all()
    exp = _sql("""
        select s_suppkey,
               (count(distinct l_returnflag)
                + case when count(*) filter (where l_returnflag is null) > 0
                       then 1 else 0 end)::bigint
        from supplier join lineitem on s_suppkey = l_suppkey
        group by 1 order by 1
    """)
    assert [(r["s_suppkey"], r["k"]) for r in got] == exp


def test_lookup_theta_array_form(engine):
    # correlated inequality WITHOUT semi/anti/unwind fusion: the plain
    # array form regroups per outer row — order totals above the
    # customer's own acctbal
    got = engine.db("tpch").collection("customer").pipe([
        {"$match": {"c_custkey": {"$lt": 30}}},
        {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey",
                                               "ab": "$c_acctbal"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ck", "$o_custkey"]},
                             {"$gt": ["$o_totalprice", "$$ab"]},
                         ]}}},
                     ],
                     "as": "big"}},
        {"$project": {"c_custkey": 1, "n": {"$size": "$big"}}},
        {"$sort": {"c_custkey": 1}},
    ]).all()
    exp = _sql("""
        select c_custkey, count(o_orderkey)::bigint
        from customer left join orders
          on c_custkey = o_custkey
         and ((o_totalprice is not null and c_acctbal is null)
              or o_totalprice > c_acctbal)
        where c_custkey < 30
        group by 1 order by 1
    """)
    assert [(r["c_custkey"], r["n"]) for r in got] == exp


def test_lookup_theta_unwind_fused(engine):
    # correlated inequality + fused $unwind (inner-join form)
    got = engine.db("tpch").collection("customer").pipe([
        {"$match": {"c_custkey": {"$lt": 10}}},
        {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey",
                                               "ab": "$c_acctbal"},
                     "pipeline": [
                         {"$match": {"$expr": {"$and": [
                             {"$eq": ["$$ck", "$o_custkey"]},
                             {"$gt": ["$o_totalprice", "$$ab"]},
                         ]}}},
                     ],
                     "as": "o"}},
        {"$unwind": "$o"},
        {"$project": {"_id": 0, "c_custkey": 1, "ok": "$o.o_orderkey"}},
        {"$sort": {"c_custkey": 1, "ok": 1}},
    ]).all()
    exp = _sql("""
        select c_custkey, o_orderkey
        from customer join orders
          on c_custkey = o_custkey
         and ((o_totalprice is not null and c_acctbal is null)
              or o_totalprice > c_acctbal)
        where c_custkey < 10
        order by 1, 2
    """)
    assert [(r["c_custkey"], r["ok"]) for r in got] == exp


def test_lookup_theta_after_group_raises(engine):
    from anser_spark.plans.pipeline import PipelineCompileError

    with pytest.raises(PipelineCompileError):
        engine.db("tpch").collection("customer").pipe([
            {"$lookup": {"from": "orders", "let": {"ck": "$c_custkey",
                                                   "ab": "$c_acctbal"},
                         "pipeline": [
                             {"$match": {"$expr": {"$and": [
                                 {"$eq": ["$$ck", "$o_custkey"]},
                                 {"$gt": ["$o_totalprice", "$$ab"]},
                             ]}}},
                             {"$group": {"_id": None, "n": {"$sum": 1}}},
                         ],
                         "as": "o"}},
        ]).to_df()
