"""Drive the driver contract end-to-end the way the verify driver does."""
import sys, os, math
sys.path.insert(0, "/root/repo")
from decimal import Decimal
from datetime import date, datetime
import duckdb
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]").appName("driver-sim")
         .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. entry smoke at sf0.001
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry: {len(rows)} rows, schema={df.columns}, first={rows[0]}")

# 2. queries vs oracle_sql at sf0.01
sf_dir = "/root/testdata/sf0.01"
qs, oracles = entrymod.queries(), entrymod.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(v):
    if isinstance(v, Decimal): v = float(v)
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime): return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date): return v.isoformat()
    return v

fails = 0
for name in sorted(qs):
    sdf = qs[name](spark, sf_dir)
    srows = sdf.collect()
    if name not in oracles:
        print(f"{name}: rows-only, {len(srows)} rows"); continue
    cur = con.execute(oracles[name]); ocols = [d[0] for d in cur.description]; orows = cur.fetchall()
    scols = sdf.columns
    ok_schema = sorted(scols) == sorted(ocols)
    si = [scols.index(c) for c in sorted(scols)]; oi = [ocols.index(c) for c in sorted(ocols)]
    sset = sorted((tuple(norm(r[i]) for i in si) for r in srows), key=repr)
    oset = sorted((tuple(norm(r[i]) for i in oi) for r in orows), key=repr)
    ok = ok_schema and len(sset)==len(oset) and sset == oset
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows, schema_ok={ok_schema})")
    if not ok:
        fails += 1
        for a,b in zip(sset[:3], oset[:3]):
            if a!=b: print("  spark :",a,"\n  oracle:",b)
# 3. probe: determinism — run flagship twice, identical results
a = qs["daily_top_titles"](spark, sf_dir).collect()
b = qs["daily_top_titles"](spark, sf_dir).collect()
print("determinism probe:", "STABLE" if a == b else "UNSTABLE")
# 4. probe: bad sf_dir → clean error?
try:
    qs["daily_top_titles"](spark, "/root/testdata/nope").collect()
    print("bad-dir probe: NO ERROR (unexpected)")
except Exception as e:
    print("bad-dir probe: raises", type(e).__name__, str(e).split("\n")[0][:80])
print("FAILS:", fails)
