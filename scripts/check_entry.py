"""Pre-validate every queries()/oracle_sql() pair against DuckDB —
a local replica of the driver's correctness protocol (row count +
column names + order-insensitive value comparison)."""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from logmetrics_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "timestamp"):  # datetime
        return int(v.timestamp())
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def main():
    spark = get_spark(
        "check_entry",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            # LSH entries persist their shingle/signature tables for
            # the duration of the query; don't accumulate all entries'
            # cached blocks across the sweep
            spark.catalog.clearCache()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            if len(srows) == 0:
                failures.append((name, "rows-only query returned 0 rows"))
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck] {name}: {str(e)[:300]}")
            continue
        ok = True
        if len(srows) != len(orows):
            failures.append((name, f"row count {len(srows)} vs {len(orows)}"))
            ok = False
        if sorted(c.lower() for c in scols) != sorted(ocols):
            failures.append((name, f"columns {scols} vs {rel.columns}"))
            ok = False
        if ok:
            sidx = [scols.index(c) for c in sorted(scols, key=str.lower)]
            oidx = [[c.lower() for c in rel.columns].index(c) for c in sorted(ocols)]
            sset = sorted(tuple(norm(r[i]) for i in sidx) for r in srows)
            oset = sorted(tuple(norm(r[i]) for i in oidx) for r in orows)
            if sset != oset:
                diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                failures.append((name, f"value mismatch, first diffs: {diff}"))
                ok = False
        print(f"[{'OK  ' if ok else 'FAIL'}] {name}: {len(srows)} rows")
    print()
    if failures:
        print("FAILURES:")
        for n, msg in failures:
            print(f"  {n}: {msg[:400]}")
        sys.exit(1)
    print(f"ALL {len([n for n in qs if not ONLY or n in ONLY])} QUERIES VALIDATED")
    spark.stop()


if __name__ == "__main__":
    main()
