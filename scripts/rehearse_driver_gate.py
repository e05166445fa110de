"""Full driver-gate rehearsal.

Runs EVERY registered query against its DuckDB oracle at sf0.01 under a
BARE SparkSession — none of session.py's conf pins — to catch anything
that silently depends on our session (the r01 TIMESTAMP_NTZ failure
mode). This is the closest local approximation of the driver's own
CORRECTNESS gate; run before ending a round:

    python scripts/rehearse_driver_gate.py

Expect the final summary line to read `fails: [] errs: []`.
"""
import math, sys, traceback
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.driver.memory", "48g")
         .config("spark.sql.shuffle.partitions", "32")
         .appName("rehearsal").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import duckdb
import __spark_entry__ as e
qs, osql = e.queries(), e.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float(v)
    if hasattr(v, "item"):
        return canon(v.item())
    return v

fails, errs = [], []
for name, fn in qs.items():
    try:
        sdf = fn(spark, "/root/testdata/sf0.01")
        cols = sorted(sdf.columns)
        s = sorted([tuple(canon(r[c]) for c in cols) for r in sdf.collect()],
                   key=lambda r: tuple((x is None, str(x)) for x in r))
        if name in osql:
            ocols = [c[0] for c in con.execute(f"SELECT * FROM ({osql[name]}) q LIMIT 0").description]
            idx = [ocols.index(c) for c in sorted(ocols)]
            d = sorted([tuple(canon(r[i]) for i in idx) for r in con.execute(osql[name]).fetchall()],
                       key=lambda r: tuple((x is None, str(x)) for x in r))
            ok = s == d
            if not ok:
                fails.append(name)
            print(("OK   " if ok else "FAIL ") + name, flush=True)
        else:
            print(f"ROWS {name} ({len(s)})", flush=True)
    except Exception:
        errs.append(name)
        print("ERR  " + name, flush=True)
        traceback.print_exc()

print("\n=== SUMMARY ===")
print("total:", len(qs), "fails:", fails, "errs:", errs)
