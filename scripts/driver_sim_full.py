"""Full driver simulation: EVERY queries() entry on a vanilla
SparkSession (no tuned confs), compared to its oracle_sql() via DuckDB,
at the sf dir given as argv[1] (default /root/testdata/sf0.01)
with the driver-style exact comparator. Rows-only queries are executed
and schema-checked. This is the strongest local approximation of the
round driver's t2 gate."""
import importlib.util, sys, time
sys.path.insert(0, "/root/repo")
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
# vanilla SQL confs; the JVM size alone is pinned (local-mode default is a
# 1g driver heap, which OOMs on the sf0.1 fact tables — the round driver's
# own session is not heap-starved, so emulating 1g would test the wrong thing)
spark = (SparkSession.builder.master("local[8]")
         .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = mod.entry(spark); assert len(df.collect()) > 0
q = mod.queries(); oracles = mod.oracle_sql()
import duckdb
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
duck = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
from tests.parity import assert_frames_match
n_match = n_rowsonly = 0
fails = []
timings = {}
t0 = time.time()
for name in sorted(q):
    tq = time.time()
    try:
        spdf = q[name](spark, sf).toPandas()
        if name in oracles and oracles[name]:
            assert_frames_match(spdf, duck.execute(oracles[name]).df(), name)
            n_match += 1
        else:
            assert len(spdf.columns) > 0
            n_rowsonly += 1
    except Exception as e:
        fails.append((name, str(e)[:200]))
    timings[name] = round(time.time() - tq, 3)
print(f"FULL DRIVER-SIM: {n_match} hash-match + {n_rowsonly} rows-only "
      f"of {len(q)} | fails={len(fails)} | {round(time.time()-t0,1)}s")
for f in fails: print("FAIL:", f)

# per-query cost artifact: Spark execution + oracle + compare per entry
# (first-touch entries also pay one-time fixture staging); top offenders
# drive the optimization loop the round verdicts ask for
import json
with open("/root/repo/TIMINGS.json", "w") as fh:
    json.dump({"sf": sf, "total_sec": round(time.time() - t0, 1),
               "per_query_sec": timings}, fh, indent=1, sort_keys=True)
top = sorted(timings.items(), key=lambda kv: -kv[1])[:20]
print("TOP-20 SLOWEST:", ", ".join(f"{k}={v}s" for k, v in top))
