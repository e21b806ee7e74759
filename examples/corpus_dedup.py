"""Corpus fuzzy-dedup at scale, as ONE call: near-dup pairs (MinHash
LSH candidates + exact shingle-Jaccard verification) -> connected
components -> the corpus tagged with ``cluster_id`` / ``is_kept``.

``fuzzy_dedup`` (smashed_spark/functions/dedup.py) packages the whole
chain; swap ``method=`` for "ngram" (exact), "simhash" (Hamming
ball), or "embedding" (cosine) without touching the rest of the
pipeline.

Run: python examples/corpus_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.dedup import fuzzy_dedup


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # pairs -> clusters -> keeper flags, one call; words are derived
    # from `text` by whitespace split when no `words` column exists
    tagged = fuzzy_dedup(
        docs, method="minhash", threshold=0.5, bands=8, rows_per_band=2
    ).cache()

    n_docs = tagged.count()
    n_kept = tagged.filter("is_kept = 1").count()
    print(f"docs: {n_docs}  kept after fuzzy dedup: {n_kept}")

    # the duplicate clusters, largest first
    (
        tagged.filter("is_kept = 0")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_dropped"))
        .orderBy(F.desc("n_dropped"))
        .show(10)
    )

    # representative policy: keep the BEST member of each cluster
    # (here: longest doc as a quality proxy — in production, a model
    # quality score from LinearQualityClassifierMapper)
    best = fuzzy_dedup(
        docs, method="minhash", threshold=0.5, bands=8, rows_per_band=2,
        quality_field="n_chars",
    )
    flipped = (
        best.filter("is_kept = 1 AND cluster_id != doc_id").count()
    )
    print(f"quality policy keeps a non-min-id representative in "
          f"{flipped} clusters")
    spark.stop()


if __name__ == "__main__":
    main()
