"""Driver simulation: consume __spark_entry__ exactly per contract at sf0.01."""
import sys, hashlib, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "6g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# 1. entry smoke
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2. queries vs oracle at sf0.01
import duckdb
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

Q, O = E.queries(), E.oracle_sql()
print(f"{len(Q)} queries, {len(O)} oracles")
assert set(O) <= set(Q), "oracle keys must be subset of query keys"
only = set(sys.argv[1:])  # optional: check just these query names
fails = []
for name in sorted(only or Q):
    sdf = Q[name](spark, "/root/testdata/sf0.01")
    scols = sorted(sdf.columns)
    srows = sorted((tuple(norm(r[c]) for c in scols) for r in sdf.collect()), key=repr)
    if name not in O:
        print(f"  {name}: rows-only, {len(srows)} rows"); continue
    res = con.execute(O[name])
    dcols = sorted(d[0] for d in res.description)
    draws = res.fetchall()
    dmap = {d[0]: i for i, d in enumerate(res.description)}
    drows = sorted((tuple(norm(r[dmap[c]]) for c in dcols) for r in draws), key=repr)
    match = scols == dcols and srows == drows
    h = lambda rs: hashlib.sha1(repr(rs).encode()).hexdigest()[:12]
    print(f"  {name}: rows {len(srows)}/{len(drows)} cols_match={scols==dcols} hash {h(srows)}/{h(drows)} -> {'MATCH' if match else 'MISMATCH'}")
    if not match: fails.append(name)
print("RESULT:", "ALL MATCH" if not fails else f"FAILED: {fails}")
sys.exit(1 if fails else 0)
