"""Corpus near-dedup at scale: MinHash signatures -> LSH candidate
pairs -> exact Jaccard verification on the candidates only.

Run: python examples/corpus_dedup.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.dedup import (
    MinHashLSHPairsMapper,
    MinHashMapper,
    NGramJaccardPairsMapper,
)


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

    # 1. narrow signature computation (no shuffle)
    signed = MinHashMapper(num_hashes=16).map(docs)
    # 2. LSH banding: candidates cost O(docs x bands), never O(docs^2)
    candidates = MinHashLSHPairsMapper(
        "doc_id", bands=4, rows_per_band=4
    ).map(signed)
    print(f"LSH candidate pairs: {candidates.count()}")

    # 3. verify candidates with exact Jaccard (broadcast the candidate
    #    set; it is tiny relative to the corpus)
    exact = NGramJaccardPairsMapper("doc_id", threshold=0.5).map(docs)
    verified = candidates.join(
        exact, ["id_a", "id_b"], "inner"
    )
    verified.orderBy(F.desc("jaccard")).show(10)
    spark.stop()


if __name__ == "__main__":
    main()
