"""Strict driver-hash replica: in-ORDER, dtype-sensitive comparison of
every queries()/oracle_sql() pair (scripts/check_entry.py is the
lenient order-insensitive gate). STRICT-OK means even a row-order-
sensitive hash would match; ORDER-ONLY entries rely on the driver
hash being order-insensitive (verified empirically in round 1: several
unordered entries were hash-green). TYPE/VALUE-DIFF is a real bug.
"""
import sys, math
import duckdb
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod
from logmetrics_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
ONLY = sys.argv[1:] or None
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = get_spark("strict", master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
bad = []
for name, fn in qs.items():
    if ONLY and name not in ONLY: continue
    if name not in oracles:
        print(f"[rows-only] {name}"); continue
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = sdf.collect()
    # per-query cache hygiene (same as check_entry/bench): several
    # builders persist corpus-sized intermediates lazily; without a
    # clear, a 57-query single-session sweep accumulates them all
    spark.catalog.clearCache()
    rel = con.sql(oracles[name])
    odf = rel.df()   # mimics driver-style fetch (hugeint->float64 etc)
    ocols = list(odf.columns)
    # sort columns by name (driver contract)
    s_order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    o_order = sorted(range(len(ocols)), key=lambda i: ocols[i].lower())
    smat = [tuple(r[i] for i in s_order) for r in srows]
    omat = [tuple(odf.iloc[j, i] for i in o_order) for j in range(len(odf))]
    def normv(v):
        if hasattr(v, "timestamp"): return ("ts", int(v.timestamp()))
        if isinstance(v, float):
            if math.isnan(v): return ("nan",)
            return ("f", repr(round(v, 9)))
        try:
            import numpy as np
            if isinstance(v, (np.integer,)): return ("i", int(v))
            if isinstance(v, (np.floating,)): return ("f", repr(round(float(v), 9)))
        except Exception: pass
        if isinstance(v, int): return ("i", v)
        return ("o", str(v))
    smat2 = [tuple(normv(v) for v in r) for r in smat]
    omat2 = [tuple(normv(v) for v in r) for r in omat]
    inorder = smat2 == omat2
    unordered = sorted(map(str, smat2)) == sorted(map(str, omat2))
    tag = "STRICT-OK" if inorder else ("ORDER-ONLY" if unordered else "TYPE/VALUE-DIFF")
    if not inorder:
        bad.append(name)
        # show first diff
        for a, b in zip(smat2, omat2):
            if a != b:
                print(f"  first diff: spark={a} duck={b}"); break
    print(f"[{tag}] {name} ({len(smat2)} rows)")
print("NON-STRICT:", bad)
spark.stop()
