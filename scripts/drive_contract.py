"""Simulate the driver: smoke entry() + oracle-compare every query at sf0.01."""
import sys, time
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("drive")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

if len(sys.argv) == 1:  # full run: include the smoke check
    t0 = time.time()
    df = e.entry(spark)
    rows = df.collect()
    print(f"SMOKE entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.columns}")
    for r in rows[:3]: print("  ", r)

import os
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for name in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')")

qs, oracles = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} with oracles")
def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = {}
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_numeric_dtype(col): out[c] = col.astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(col): out[c] = col.astype(str)
        else: out[c] = col.astype(str)
    res = pd.DataFrame(out)
    return res.sort_values(by=list(res.columns), kind="mergesort").reset_index(drop=True) if len(res) else res

only = sys.argv[1:]  # optional name substrings to filter
fails = 0
for name, fn in sorted(qs.items()):
    if only and not any(s in name for s in only):
        continue
    t0 = time.time()
    try:
        got = fn(spark, SF).toPandas()
    except Exception as ex:
        print(f"FAIL {name}: query raised {ex}"); fails += 1; continue
    if name in oracles:
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}"); fails += 1; continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols spark={list(g.columns)} duck={list(w.columns)}"); fails += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} duck={len(w)}"); fails += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, atol=1e-5, rtol=1e-5)
        except AssertionError as ex:
            print(f"FAIL {name}: values differ: {str(ex)[:200]}"); fails += 1; continue
        print(f"OK   {name}: {len(g)} rows oracle-match ({time.time()-t0:.1f}s)")
    else:
        print(f"OK   {name}: {len(got)} rows (rows-only) ({time.time()-t0:.1f}s)")
print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
