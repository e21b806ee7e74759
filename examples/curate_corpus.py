"""End-to-end training-data curation: quality + repetition filter ->
language ID -> PII redaction -> exact dedup -> fuzzy dedup (one-call
LSH -> verify -> cluster -> keep representatives) -> train/test
decontamination -> token-budget selection (r7) -> weighted remix ->
quota/split composition -> deterministic training-shard export ->
token accounting.  The whole
chain is lazy: one logical plan, and every narrow step fuses; the
only shuffles are the dedup aggregations, the LSH bucket join, the
clustering rounds, and the per-shard rank.

Run: python examples/curate_corpus.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.cleaning import GopherQualityFilterMapper
from smashed_spark.functions.dedup import ExactDedupMapper, fuzzy_dedup
from smashed_spark.functions.textstats import (
    DecontaminateMapper,
    LangIdMapper,
    PiiRedactMapper,
    QualityScoreMapper,
    RepetitionStatsMapper,
    TokenCountMapper,
)
from smashed_spark.sources.loaders import (
    hash_split,
    quota_sample,
    sample_mix,
    select_under_token_budget,
)
from smashed_spark.sources.sinks import shard_for_training


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1-3. narrow, scan-speed: quality gate, language tag, PII scrub
    pipe = (
        QualityScoreMapper("text")
        >> LangIdMapper("text")
        >> PiiRedactMapper("text")
        >> TokenCountMapper("text")
        >> RepetitionStatsMapper()  # Gopher repetition signals
        # the canned Gopher document rules (published thresholds,
        # min_words lowered for this short-doc synthetic corpus);
        # rejections stay auditable via gopher_reason
        >> GopherQualityFilterMapper(min_words=30)
    )
    scored = pipe.map(docs).filter(
        (F.col("gopher_keep") == 1)
        & (F.col("q_score") >= 0.3)
        & (F.col("rep_dup_2gram_frac") < 0.9)
    ).drop("gopher_keep", "gopher_reason")

    # 3.5 model-based quality scoring (r7): bootstrap a hashed-BoW
    #     linear classifier from the heuristic scores (weak labels:
    #     top slice = positive, bottom slice = negative — the
    #     DCLM-style pattern), then score EVERY doc at scan speed and
    #     keep the model's keeps.  The fit collects a bounded sample;
    #     scoring is a narrow aggregate fold, no shuffle.
    from smashed_spark.functions.classifier import (
        LinearQualityClassifierMapper,
        fit_quality_classifier,
    )

    with_words = scored.withColumn("words", F.split("text", " "))
    w, b = fit_quality_classifier(
        with_words.filter(F.col("q_score") >= 0.7),
        with_words.filter(F.col("q_score") < 0.5),
        dims=1024,
        epochs=80,
    )
    scored = (
        LinearQualityClassifierMapper(w, bias=b, threshold=0.4)
        .map(with_words)
        .filter(F.col("model_q_keep") == 1)
        .drop("words", "model_q_keep")
    )

    # 4. exact dedup (one shuffle on the content digest)
    deduped = ExactDedupMapper().map(scored)

    # 5. near-dedup, one call: LSH candidates -> exact-Jaccard verify
    #    -> connected components -> keep each cluster's representative
    #    (dropping the higher id of every raw PAIR over-deletes chains:
    #    a-b + b-c would drop both b and c)
    tagged = fuzzy_dedup(
        deduped, threshold=0.5, bands=8, rows_per_band=2
    )
    survivors = tagged.filter("is_kept = 1").drop(
        "cluster_id", "is_kept"
    ).withColumn("words", F.split("text", " "))
    with_words = survivors

    # 6. decontaminate against a benchmark slice (broadcast semi-join)
    benchmark = with_words.filter(F.col("doc_id") % 97 == 0)
    clean = DecontaminateMapper(
        benchmark, shingle_size=8, mode="drop"
    ).map(survivors)

    # 6.5 token-budget selection (r7): keep the highest-quality docs
    #     whose cumulative token count fits the training budget —
    #     greedy by q_score, doc_id tiebreak; the prefix sum runs on a
    #     slim (key, score, tokens) projection and only the keep flag
    #     joins back.  BEFORE the remix: epoch oversampling duplicates
    #     keys, and budget-fitting decides the corpus, epochs multiply
    #     it.
    clean = select_under_token_budget(
        clean,
        200_000,
        tokens_field="n_ws_tokens",
        score_field="q_score",
        key_field="doc_id",
        drop=True,
    )

    # 7. weighted remix: oversample the high-quality slice 2x, keep
    #    half of the rest (seeded Bernoulli + union: fully narrow)
    hi = clean.filter(F.col("q_score") >= 0.6)
    rest = clean.filter(F.col("q_score") < 0.6)
    mixed = sample_mix([hi, rest], [2.0, 0.5], seed=41)

    # 8. composition controls: at most 200 docs per (lang, source)
    #    bucket, then an append-stable train/val/test split — both
    #    keyed on doc_id hashes, so re-running never reshuffles rows
    mixed = quota_sample(mixed, ["lang", "source"], 200, "doc_id")
    mixed = hash_split(
        mixed, {"train": 0.98, "val": 0.01, "test": 0.01}, "doc_id"
    )

    # 9. deterministic shard export for the training split: hash
    #    shard + seeded within-shard order, reproducible end to end
    train = shard_for_training(
        mixed.filter("split = 'train'"), "doc_id", n_shards=8
    )
    n_shards = train.select("shard").distinct().count()
    print(f"train split exported as {n_shards} rank-ordered shards")

    # 10. account
    stats = mixed.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_ws_tokens").alias("tokens"),
        F.sum("n_pii_email").alias("emails_redacted"),
    )
    stats.show()
    spark.stop()


if __name__ == "__main__":
    main()
