"""QA prompting with the SQuAD train recipe and the built-in
deterministic WordPiece tokenizer (swap in any HF tokenizer).

Run: python examples/qa_prompting.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from smashed_spark.functions.wordpiece import tiny_bert_tokenizer
from smashed_spark.recipes.squad import SquadPromptTrainRecipe


def main() -> None:
    spark = SparkSession.builder.master("local[*]").getOrCreate()
    df = spark.createDataFrame(
        [
            (
                ["hello world this is a test", "hi there"],
                ["this is"],
                ["this is"],
            )
        ],
        "context: array<string>, answers: array<string>, "
        "evidences: array<string>",
    )
    recipe = SquadPromptTrainRecipe(
        tokenizer=tiny_bert_tokenizer(),
        source_template="{context}",
        context_length=4,
        context_stride=4,
        target_template="{labels}",
    )
    recipe.map(df).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
