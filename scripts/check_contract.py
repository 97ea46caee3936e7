"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB over the same parquet dir and
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort key stringifies per cell: a NaN-bearing float column yields
    # mixed str/float cells ('NaN' vs 1.0) which are unsortable as raw
    # tuples — sorted() would crash the whole gate with a TypeError
    # instead of counting one failure (r4 review)
    normed = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda t: tuple((str(type(c)), str(c)) for c in t)), [
        cols[i] for i in order
    ]


def run_check(spark, sf_dir: str, only: set[str] | None = None) -> int:
    """Returns the number of failing queries; prints one line per query."""
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    # twins that pin data-derived literals (IVF kmeans centroids) must be
    # built against the SAME parquet this gate compares on; the driver's
    # own gate runs at sf0.01, which is the unexported default.  Restore
    # the prior value afterwards: a leaked override would silently retarget
    # every LATER oracle_sql() call in this process (r5 review).
    prev_oracle_sf = os.environ.get("SPARK_GRAFT_ORACLE_SF")
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir
    try:
        oracles = entry_mod.oracle_sql()
    finally:
        if prev_oracle_sf is None:
            os.environ.pop("SPARK_GRAFT_ORACLE_SF", None)
        else:
            os.environ["SPARK_GRAFT_ORACLE_SF"] = prev_oracle_sf
    failures = 0
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            # a typo'd filter must not silently check nothing and exit 0
            print(f"FAIL unknown query name(s): {', '.join(unknown)}")
            failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:200]}")
            failures += 1
            continue
        sn, scols_s = norm_rows(scols, [tuple(r) for r in srows])
        dn, dcols_s = norm_rows(dcols, drows)
        if scols_s != dcols_s:
            print(f"FAIL {name}: columns {scols_s} vs {dcols_s}")
            failures += 1
            continue
        if len(sn) != len(dn):
            print(f"FAIL {name}: rowcount {len(sn)} vs {len(dn)}")
            failures += 1
            continue
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL {name}: values differ; first diffs: {diff}")
            failures += 1
            continue
        print(f"OK   {name}: {len(sn)} rows")
    print("FAILURES:", failures)
    return failures


def main() -> int:
    from manga_translator_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app="contract", master="local[8]")
    try:
        return 1 if run_check(spark, sf_dir, only) else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
