"""Exact substring dedup + corpus cardinality audit: find every
duplicated >=8-word span across the corpus (Lee et al. 2021
ExactSubstr, distributed as window hashing), cluster fuzzy duplicates
end-to-end, and sketch the distinct-shingle cardinality before/after.

Run: python examples/exact_substring_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.sketches import kmv_sketch
from smashed_spark.functions.substring import DuplicatedSpansMapper


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "words", F.split("text", " ")
    )

    # 1. duplicated spans: one wide exchange on the window hash, one
    #    narrow per-doc exchange for the island merge (xxhash64 keys)
    spans = DuplicatedSpansMapper(width=8).map(docs)
    spans.cache()
    n_spans = spans.count()
    covered = spans.agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("w")
    ).first()["w"]
    print(f"duplicated spans: {n_spans} covering {covered or 0} words")

    # 2. apply the removal (RemoveDuplicatedSpansMapper): cut every
    #    NON-FIRST occurrence, keeping one copy corpus-wide — the same
    #    window hashing, plus a first-occurrence rank riding the one
    #    wide exchange
    from smashed_spark.functions.substring import (
        RemoveDuplicatedSpansMapper,
    )

    cleaned = RemoveDuplicatedSpansMapper(width=8).map(docs).cache()
    kept = cleaned.agg(F.sum(F.size("clean_words"))).first()[0]
    total = docs.agg(F.sum(F.size("words"))).first()[0]
    print(f"kept {kept}/{total} words after span removal")

    # 3. audit: distinct 5-gram cardinality before vs after, by KMV
    #    sketch (one bounded top-k job each — no giant distinct)
    def shingles(col):
        return F.array_join(F.slice(F.split(col, " "), 1, 5), " ")

    before = kmv_sketch(
        docs.select(F.col("text").alias("t")), "t", k=256,
        hash_expr=shingles(F.col("t")),
    )
    after = kmv_sketch(
        cleaned.select(F.col("clean_text").alias("t")), "t", k=256,
        hash_expr=shingles(F.col("t")),
    )
    print(
        f"distinct leading-5-gram estimate: {before.estimate()} -> "
        f"{after.estimate()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
