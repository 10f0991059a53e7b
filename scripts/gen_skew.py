"""Generate a SKEWED variant of a scale fixture for the round-7 skew
rehearsal (VERDICT r6 next-step #3).  NOT driver data — a local perf
fixture written to .scratch/sf1skew (gitignored).

The sf1/sf3 fixtures are uniform on their join/group keys; this variant
plants pathological hot keys so join-shuffle, $group, $topN, and window
paths face real skew:

- lineitem: ~30% of rows reassigned to ONE hot l_orderkey (an existing
  order, so orders⋈lineitem joins stay referentially valid), and the
  same 30% to one hot l_suppkey / l_partkey.
- events:   ~30% of rows reassigned to ONE hot user_id (the window /
  sessionization partition key).

Reassignment is deterministic (hash of the row's own keys), so the
fixture is reproducible and the DuckDB differential oracle reads the
same skewed parquet.  All other tables are copied unchanged.

Usage: python scripts/gen_skew.py [src_dir] [out_dir]
"""

import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1skew"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    hot_order = con.execute(
        f"SELECT min(o_orderkey) FROM '{SRC}/orders.parquet'"
    ).fetchone()[0]
    hot_supp = con.execute(
        f"SELECT min(s_suppkey) FROM '{SRC}/supplier.parquet'"
    ).fetchone()[0]
    hot_part = con.execute(
        f"SELECT min(p_partkey) FROM '{SRC}/part.parquet'"
    ).fetchone()[0]
    hot_user = con.execute(
        f"SELECT min(user_id) FROM '{SRC}/events.parquet'"
    ).fetchone()[0]

    # ~30% of lineitem rows hammered onto one order/supplier/part key;
    # hash() of the row's own keys keeps it deterministic
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN hash(l_orderkey * 31 + l_linenumber) % 10 < 3
                     THEN {hot_order} ELSE l_orderkey END AS l_orderkey,
                CASE WHEN hash(l_orderkey * 31 + l_linenumber) % 10 < 3
                     THEN {hot_supp} ELSE l_suppkey END AS l_suppkey,
                CASE WHEN hash(l_orderkey * 31 + l_linenumber) % 10 < 3
                     THEN {hot_part} ELSE l_partkey END AS l_partkey
            )
            FROM '{SRC}/lineitem.parquet'
        ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
    """)

    # ~30% of events onto one user (window partition / session key).
    # Events carry ns-timestamps Spark-side; DuckDB rewrites them as
    # tz-naive µs which the engine's reader handles either way.
    con.execute(f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN hash(event_id) % 10 < 3
                     THEN {hot_user} ELSE user_id END AS user_id
            )
            FROM '{SRC}/events.parquet'
        ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
    """)

    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "documents", "embeddings",
    ):
        src = f"{SRC}/{t}.parquet"
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copyfile(src, dst)

    for t in ("lineitem", "events"):
        top = con.execute(f"""
            SELECT col, n, round(100.0 * n / total, 1) AS pct FROM (
                SELECT {'l_orderkey' if t == 'lineitem' else 'user_id'} AS col,
                       count(*) AS n,
                       (SELECT count(*) FROM '{OUT}/{t}.parquet') AS total
                FROM '{OUT}/{t}.parquet' GROUP BY 1 ORDER BY 2 DESC LIMIT 1
            )
        """).fetchone()
        print(f"{t}: hottest key {top[0]} owns {top[1]} rows ({top[2]}%)")


if __name__ == "__main__":
    main()
