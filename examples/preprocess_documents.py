"""Document preprocessing end-to-end: filter -> split -> window ->
prompt (the reference's README pipeline shape, Spark-first).

Run: python examples/preprocess_documents.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from smashed_spark import Pipeline
from smashed_spark.operators import (
    ChangeFieldsMapper,
    FillTextPromptMapper,
    FilterMapper,
    SingleSequenceStriderMapper,
    TextToWordsMapper,
    WordsToTextMapper,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    pipe = Pipeline(
        [
            FilterMapper("n_chars", ">=", 100),
            ChangeFieldsMapper(keep_fields=["doc_id", "lang", "text"]),
            TextToWordsMapper("text", splitter="ws"),
            SingleSequenceStriderMapper("text", max_length=64, stride=64),
            WordsToTextMapper("text"),
            FillTextPromptMapper("[{lang}] {text}", "prompt"),
        ]
    )
    out = pipe.map(docs)
    out.explain("formatted")  # one fused narrow plan, filters pushed down
    out.select("doc_id", "prompt").show(5, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
