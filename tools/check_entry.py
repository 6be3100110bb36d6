"""Local stand-in for the driver's correctness gate: run every
queries() entry in Spark and its oracle_sql() in DuckDB at sf0.01,
compare row count + column names + order-insensitive values.

Canonicalization mirrors the driver: BOTH result sets round-trip
through pandas (Spark via toPandas(), DuckDB via .df()), so dtype
artifacts the driver would see (e.g. DuckDB HUGEINT -> float64 ->
"10025.0") fail here too instead of being masked by a laxer local
stringifier (round-1 lesson: pivot_status_by_flag passed locally but
hash-failed on the driver).

Usage: PYTHONPATH=/root/repo python tools/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from entity_resolution_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    """Stringify one pandas cell the way the driver's hash sees it."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return str(v)
    try:
        import pandas as pd

        if v is pd.NaT or (isinstance(v, pd._libs.missing.NAType)):
            return "∅"
    except Exception:  # noqa: BLE001
        pass
    return str(v)


def _canon_pdf(pdf):
    """pandas DataFrame -> (sorted rows of canon cells, sorted col names)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows), list(cols)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark(app_name="check_entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            # the driver still canonicalizes rows-only results — make
            # sure the pandas path doesn't hard-error (round-1 lesson:
            # media_features array column broke the driver's sort)
            try:
                s_pdf.sort_values(by=list(s_pdf.columns))
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: rows-only canon error: {type(e).__name__}: {str(e)[:200]}")
                failures += 1
                continue
            print(f"ROWS  {name}: {len(s_pdf)} rows (no oracle — rows-only)")
            continue
        try:
            d_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        s_canon, s_names = _canon_pdf(s_pdf)
        d_canon, d_names = _canon_pdf(d_pdf)
        if [n.lower() for n in s_names] != [n.lower() for n in d_names]:
            print(f"FAIL  {name}: schema mismatch spark={s_names} duckdb={d_names}")
            failures += 1
            continue
        if len(s_canon) != len(d_canon):
            print(f"FAIL  {name}: rowcount spark={len(s_canon)} duckdb={len(d_canon)}")
            failures += 1
            continue
        if s_canon != d_canon:
            diff = [i for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff:
                print(f"      spark : {s_canon[i]}")
                print(f"      duckdb: {d_canon[i]}")
            failures += 1
            continue
        print(f"OK    {name}: {len(s_canon)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
