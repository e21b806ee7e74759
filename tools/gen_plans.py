import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions","8")
    .config("spark.sql.adaptive.enabled","true")
    .config("spark.driver.memory","6g")
    .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as E
Q = E.queries()

def explain(df):
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")

HEADLINERS = {
    "flagship_preprocess": "Every mapper fuses into one narrow codegen'd pass; "
        "the n_chars filter is pushed into the parquet scan.",
    "join_revenue_by_nation": "Dimension tables broadcast (no fact shuffle for "
        "the join); only the final small rollup exchanges.",
    "agg_pricing_summary": "Map-side partial HashAggregate before the single "
        "exchange on the 2-value grouping key.",
    "dedup_lsh_pairs": "Narrow signature compute, explode to band buckets, one "
        "equi-join on the bucket key — O(docs x bands).",
    "dedup_exact": "One exchange keyed on the content digest.",
    "join_shipping_priority": "Customer dimension broadcasts; at this SF AQE "
        "broadcasts the filtered orders side too (no fact shuffle at all), "
        "while at scale the lineitem-orders equi-join shuffles once on the "
        "shared orderkey. The rank<=10 filter collapses into "
        "TakeOrderedAndProject - no global sort.",
    "fewshot_jinja": "Each (num_shots+1)-row group folds into ONE row via a "
        "JVM-side collect_list hash-agg (map-side partial, one exchange on "
        "the contiguous group id — no global sort), then a single "
        "MapInPandas stage renders thousands of groups per Arrow batch. "
        "Python appears exactly once, after the data is already "
        "group-per-row small.",
    "dedup_ngram_jaccard": "Shingles hash to 8-byte keys before the ONE "
        "exchange on the shingle; the hub-frequency cap is a count window "
        "over that same partitioning and the per-shingle pair-generation "
        "groupBy reuses it too — the cap adds zero extra shuffles of the "
        "inverted index.",
    "dedup_simhash_pairs": "Exact Hamming-ball pairs by pigeonhole banding: "
        "token hashes projected once (no per-bit md5 re-evaluation), band "
        "equi-join, map-side bit_count verify BEFORE the dedup shuffle — "
        "no cartesian product, O(docs x bands) join input.",
}

STATIC = """\
## stream_sessionize (streaming/stateful.py)

Bounded replay of the events table (plus one sentinel event per user
past the gap, so every real session closes in-stream):
`applyInPandasWithState` keyed on user_id over ONE exchange —
`FlatMapGroupsInPandasWithState` with O(users) state rows, no global
sort, `trigger(availableNow=True)` so the query drains and terminates
itself.  All files land in micro-batch 0 (no read limits configured),
and the stateful fn sorts each user's rows within the batch, so the
replay write can be parallel.

```
FlatMapGroupsInPandasWithState [user_id ...] (state: [last_us, start_us, n, total])
+- Sort [user_id]                       <- partition-local, for grouping
   +- Exchange hashpartitioning(user_id)
      +- StreamingRelation parquet
```

## with_row_index (core/order.py)

Catalyst-native two-phase global index: a tiny per-partition
(min monotonic id, count) aggregate, then a broadcast join of the
KB-sized offset table — no Python/RDD round-trip, whole-stage codegen
throughout, the input scans once (persisted across the two phases).

```
BroadcastHashJoin on __pid__          <- offsets table (one row/partition)
+- InMemoryTableScan [v, __pid__, __mid__]
      +- * Project [spark_partition_id(), monotonically_increasing_id()]
         +- (input)
```

## embedding_near_dup, large-corpus path (functions/dedup.py)

Above BROADCAST_LIMIT the mapper explodes each vector into
(table, bucket) hyperplane-LSH keys — all `num_tables * num_bits`
signature dots computed as one BLAS matmul per Arrow batch — and
equi-joins bucket-mates: a plain shuffled hash join on the bucket key,
O(docs x tables), no CartesianProduct anywhere (plan-asserted by
test_near_dup_lsh_path_above_limit); exact cosine reranks candidates
in one einsum per Arrow batch.  The O(n^2) expression join survives
only behind exact=True.
"""
out = ["# PLANS — physical plans of the headline queries",
       "",
       "Generated from the live Catalyst plans at sf0.001 (plan shape is",
       "scale-invariant; AQE adjusts partitioning at runtime).  `*` marks",
       "whole-stage-codegen'd operators.  Regenerate with",
       "`python tools/gen_plans.py`.", ""]
for name, note in HEADLINERS.items():
    plan = explain(Q[name](spark, "/root/testdata/sf0.001"))
    tree = plan.split("\n\n")[0]  # tree section only
    out.append(f"## {name}\n\n{note}\n\n```\n{tree}\n```\n")
out.append(STATIC)
open("/root/repo/PLANS.md","w").write("\n".join(out))
print("written", len("\n".join(out)), "chars")
