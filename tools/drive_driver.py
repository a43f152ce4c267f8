# Simulate the verify driver: fresh process, import __spark_entry__ by path,
# run entry() smoke at sf0.001, then each queries() vs oracle_sql() at sf0.01.
import sys, importlib.util, time
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate())

t0 = time.time()
df = mod.entry(spark)
rows = df.collect()
print(f"SMOKE entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={df.schema.simpleString()}")
for r in rows[:3]:
    print("  ", r)

import duckdb
con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

qs, os_ = mod.queries(), mod.oracle_sql()
print(f"queries: {sorted(qs)}; oracles: {sorted(os_)}")
for name, fn in sorted(qs.items()):
    sdf = fn(spark, sf).toPandas()
    if name in os_:
        odf = con.execute(os_[name]).df()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        match_cols = scols == ocols
        match_rows = len(sdf) == len(odf)
        # order-insensitive value compare
        a = sdf[scols].sort_values(scols).reset_index(drop=True)
        b = odf[ocols].sort_values(ocols).reset_index(drop=True)
        exact = all((a[c].to_numpy() == b[c].to_numpy()).all() for c in scols)
        print(f"  {name}: rows={len(sdf)} cols_match={match_cols} rowcount_match={match_rows} values_exact={exact}")
    else:
        print(f"  {name}: rows-only rows={len(sdf)}")
