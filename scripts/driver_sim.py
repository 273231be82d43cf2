"""Simulate the driver's gate: FOREIGN SparkSession (no engine confs),
__spark_entry__.queries() wrapped fns, DuckDB oracle compare with the
strict canon from scripts/check_oracle.py, over the first N registry keys."""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("driver-sim-gate")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em
sys.path.insert(0, "/root/repo/scripts")
import check_oracle as co

N = int(sys.argv[1]) if len(sys.argv) > 1 else 54
SF = "/root/testdata/sf0.01"
qs = em.queries(); oracles = em.oracle_sql()
con = co.duck_con(SF)
keys = list(qs)[:N]
n_pass = n_fail = n_rows = 0
for k in keys:
    t0 = time.time()
    try:
        sdf = qs[k](spark, SF).toPandas()
    except Exception as e:
        print(f"FAIL {k}: spark raised {type(e).__name__}: {e}", flush=True)
        n_fail += 1; continue
    if k not in oracles:
        n_rows += 1; print(f"rows {k}: {len(sdf)}", flush=True); continue
    try:
        ddf = con.sql(oracles[k]).df()
    except Exception as e:
        print(f"FAIL {k}: duckdb raised {e}", flush=True); n_fail += 1; continue
    probs = co.compare(k, sdf, ddf)
    if probs:
        print(f"FAIL {k}: " + "; ".join(probs), flush=True); n_fail += 1
    else:
        n_pass += 1; print(f"ok   {k} [{time.time()-t0:.1f}s]", flush=True)
print(f"\n{n_pass} ok, {n_fail} FAIL, {n_rows} rows-only of {len(keys)}")
