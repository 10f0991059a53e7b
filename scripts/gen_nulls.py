"""Generate a NULL-HEAVY variant of a scale fixture for the round-7
null rehearsal.  NOT driver data — a local fixture written to
.scratch/ (gitignored).

The driver fixtures have essentially no nulls outside `documents`, so
the TPC-H differential shapes never exercise null semantics at table
scale (the seeded fuzzers cover nulls only on 10-row frames).  This
variant nulls ~25% of NON-KEY columns — measures, dates, flags,
strings used in filters/aggregates — deterministically (hash of the
row's primary key), so Spark and the DuckDB oracle read the same
parquet and the differential stays meaningful.

Join/group KEY columns stay non-null on purpose: the engine's $lookup
uses Mongo null-match semantics (eqNullSafe — null local matches null
foreign) while a SQL `JOIN ON =` drops nulls, so null keys make the
two oracles diverge BY DESIGN, not by defect; that divergence is
covered (and asserted) by the seeded lookup fuzzers instead.

Usage: python scripts/gen_nulls.py [src_dir] [out_dir]
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf001nulls"

# table -> (key expr for the deterministic hash, nullable columns)
PLAN = {
    "lineitem": (
        "l_orderkey * 31 + l_linenumber",
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate", "l_commitdate",
         "l_receiptdate"],
    ),
    "orders": (
        "o_orderkey",
        ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ),
    "customer": (
        "c_custkey",
        ["c_name", "c_acctbal", "c_mktsegment"],
    ),
    "part": ("p_partkey", ["p_name", "p_size", "p_retailprice", "p_type"]),
    "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
    "nation": ("n_nationkey", ["n_comment"]),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for fname in sorted(os.listdir(SRC)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[:-8]
        src_path = os.path.join(SRC, fname)
        out_path = os.path.join(OUT, fname)
        if table not in PLAN:
            shutil.copyfile(src_path, out_path)
            continue
        key, cols = PLAN[table]
        desc = con.execute(f"DESCRIBE SELECT * FROM '{src_path}'").fetchall()
        have = {r[0] for r in desc}
        reps = ", ".join(
            # per-column offset in the hash → different rows null out
            # different columns (a row rarely goes all-null)
            f"CASE WHEN hash(({key}) * 131 + {i}) % 100 < 25 "
            f"THEN NULL ELSE {c} END AS {c}"
            for i, c in enumerate(cols)
            if c in have
        )
        if not reps:
            shutil.copyfile(src_path, out_path)
            continue
        con.execute(
            f"COPY (SELECT * REPLACE ({reps}) FROM '{src_path}') "
            f"TO '{out_path}' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) - count({cols[0]}) FROM '{out_path}'"
        ).fetchone()[0]
        print(f"{table}: nulled ~25% of {len(cols)} cols "
              f"(e.g. {cols[0]}: {n} nulls)")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
