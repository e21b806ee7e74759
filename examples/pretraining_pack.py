"""Pretraining-data packing two ways: tokenize the corpus, then
(a) slice the concatenated stream into fixed context-length blocks
(PackSequencesMapper — GPT-style pretraining), and
(b) bin-pack whole documents without splitting (BinPackSequencesMapper
— SFT-style), comparing block utilization.

Run: python examples/pretraining_pack.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.packing import (
    BinPackSequencesMapper,
    PackSequencesMapper,
)
from smashed_spark.functions.wordpiece import tiny_bert_tokenizer
from smashed_spark.operators.hf_tokenize import TokenizerMapper


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # 1. tokenize (hermetic WordPiece; swap in a real HF tokenizer in
    #    production — same mapper)
    tok = TokenizerMapper(
        tiny_bert_tokenizer(model_max_length=4096),
        input_field="text",
        return_attention_mask=False,
    ).map(docs)

    BLOCK = 128

    # 2a. pretraining: slice the doc_id-ordered stream into BLOCK-token
    #     training rows; docs cross boundaries, nothing is padded
    packed = PackSequencesMapper(
        tokens_field="input_ids",
        order_by=["doc_id"],
        block_size=BLOCK,
        separator=3,  # [SEP] as the document boundary
    ).map(tok)
    full = packed.filter(F.col("n_tokens") == BLOCK).count()
    total = packed.count()
    print(f"stream packing: {total} blocks ({full} full)")

    # 2b. SFT: whole documents only; utilization = fraction of block
    #     capacity actually filled
    bins = BinPackSequencesMapper(
        tokens_field="input_ids",
        key_field="doc_id",
        block_size=BLOCK,
        num_groups=16,
    ).map(tok)
    stats = bins.agg(
        F.count(F.lit(1)).alias("bins"),
        F.sum(F.col("oversize").cast("int")).alias("oversize"),
        F.round(
            F.sum("n_tokens")
            / (F.count(F.lit(1)) * BLOCK),
            4,
        ).alias("utilization"),
    ).first()
    print(
        f"bin packing: {stats.bins} bins, {stats.oversize} oversize, "
        f"utilization {stats.utilization}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
