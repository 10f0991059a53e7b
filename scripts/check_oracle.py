"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same parquet tables, compare row count / column names / values.

Usage: python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _kind(s: pd.Series) -> str:
    """Canonical dtype class. The driver's value hash serializes values,
    so int64 1000 and float64 1000.0 hash DIFFERENTLY even though they
    compare equal — the local gate must treat a class mismatch as a
    failure, never coerce across classes (the r4 `repetition_metrics`
    miss: np.allclose certified a gate the driver's exact hash rejected).
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    # object columns: classify by the first non-null value
    for v in s:
        if v is None or (isinstance(v, float) and v != v):
            continue
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return "object"
    return "empty"


def _canon_values(s: pd.Series, kind: str) -> pd.Series:
    """Exact, representation-faithful canonical form per value."""
    if kind == "int":
        # unify widths; nulls (shouldn't appear in int cols, but nullable
        # Int64 allows them) render as a sentinel
        return s.astype("Int64").map(lambda v: "∅" if pd.isna(v) else str(int(v)))
    if kind == "float":
        # bit-exact: hex round-trips the double; NaN is its own token
        return s.astype("float64").map(
            lambda v: "nan" if v != v else float(v).hex()
        )
    if kind == "bool":
        return s.map(lambda v: "∅" if pd.isna(v) else str(bool(v)))
    if kind == "datetime":
        return pd.to_datetime(s).astype("datetime64[ns]").map(
            lambda v: "∅" if pd.isna(v) else v.isoformat()
        )
    return s.map(lambda v: "∅" if v is None else str(v))


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} != {len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}")
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return problems
    for col in a.columns:
        av, bv = a[col], b[col]
        ka, kb = _kind(av), _kind(bv)
        if "empty" in (ka, kb) and len(a) == 0:
            continue
        if ka != kb and "empty" not in (ka, kb):
            problems.append(
                f"column {col!r}: dtype class mismatch spark={ka}({av.dtype}) "
                f"vs oracle={kb}({bv.dtype}) — values may still be equal, but "
                f"the driver's hash serializes dtype-sensitively"
            )
            continue
        kind = ka if ka != "empty" else kb
        ca, cb = _canon_values(av, kind), _canon_values(bv, kind)
        if not ca.equals(cb):
            neq = (ca.values != cb.values)
            idx = int(np.argmax(neq))
            problems.append(
                f"column {col!r}: {int(neq.sum())} differing values "
                f"(first at row {idx}: {av.iloc[idx]!r} vs {bv.iloc[idx]!r})"
            )
    return problems


def main() -> int:
    args = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    import __spark_entry__ as ent
    from anser_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown gate(s): {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"okROWS {name}: {len(spark_pdf)} rows (no oracle — rows-only check)")
            continue
        try:
            duck_pdf = con.execute(sql).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(spark_pdf)} rows match")
    # smoke: entry()
    try:
        n = ent.entry(spark).count()
        print(f"ok   entry(): {n} rows")
        if n <= 0:
            failures += 1
    except Exception as exc:  # noqa: BLE001
        print(f"FAIL entry(): {exc}")
        failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {len(qs) - failures}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
