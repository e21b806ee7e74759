"""Model-based quality scoring end-to-end: fit a reference unigram LM
and a hashed-BoW classifier on splits of the corpus, score every
document at scan speed (both scorers are narrow ``aggregate`` folds
over plan-literal tables — zero exchanges, no UDFs), then fit the best
documents under a token budget.

The CCNet / DCLM shape: perplexity-vs-reference + a learned quality
score -> rank -> greedy budget selection.  Then (r9) the DSIR
alternative on the same corpus: importance RESAMPLING toward the
reference distribution — preserves diversity where the hard rank
cutoff collapses onto the mode.

Run: python examples/quality_scoring.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions import (
    LinearQualityClassifierMapper,
    UnigramLogProbMapper,
    fit_quality_classifier,
    fit_unigram_logprob_table,
)
from smashed_spark.sources import select_under_token_budget


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "n_chars")
        .withColumn("words", F.split("text", " "))
    )

    # "reference" = the longest documents (a stand-in for a curated
    # corpus); "rejects" = the shortest
    ref = docs.filter(F.col("n_chars") >= 400)
    rej = docs.filter(F.col("n_chars") < 150)

    table = fit_unigram_logprob_table(ref, dims=2048)
    weights, bias = fit_quality_classifier(
        ref, rej, dims=2048, epochs=80
    )

    scored = UnigramLogProbMapper(table).map(docs)
    scored = LinearQualityClassifierMapper(weights, bias=bias).map(scored)
    # composite rank: classifier score, perplexity as tiebreak signal
    scored = scored.withColumn(
        "quality_rank",
        F.col("model_q_score") - F.coalesce(F.col("word_ppl"), F.lit(1e9)) / 1e6,
    ).withColumn("n_tok", F.size("words"))

    picked = select_under_token_budget(
        scored, 20_000, tokens_field="n_tok",
        score_field="quality_rank", key_field="doc_id", drop=True,
    )
    stats = picked.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tok").alias("tokens"),
        F.round(F.avg("model_q_score"), 3).alias("avg_q"),
        F.round(F.avg("word_ppl"), 1).alias("avg_ppl"),
    ).collect()[0]
    base = docs.agg(
        F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    print(
        f"selected {stats.docs}/{base.docs} docs ({stats.tokens} tokens "
        f"under the 20k budget), avg quality {stats.avg_q}, "
        f"avg word-ppl {stats.avg_ppl}"
    )

    # DSIR (r9): resample 100 docs toward a CONTENT-defined target —
    # a slice whose unigram profile genuinely skews (docs rich in one
    # token; the synthetic corpus shares a single vocabulary across
    # lang/source labels, so a label-defined target carries no
    # signal).  Importance weights are one narrow fold; the draw is
    # seeded Gumbel-top-k (TakeOrderedAndProject; only k rows move).
    from smashed_spark.functions import dsir_select

    docs_l = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "words", F.split("text", " ")
    )
    hits = F.size(F.filter("words", lambda w: w == F.lit("vector")))
    rate = hits / F.greatest(F.size("words"), F.lit(1))
    target = docs_l.filter(rate >= 0.06)
    dsir = dsir_select(docs_l, target, 100, dims=2048, seed=11)
    d = dsir.agg(F.round(F.avg(rate), 4).alias("r")).collect()[0]
    b = docs_l.agg(F.round(F.avg(rate), 4).alias("r")).collect()[0]
    print(
        f"DSIR toward vector-heavy docs: resampled avg 'vector' "
        f"token rate {d.r} vs corpus {b.r} — importance resampling "
        "pulls the sample toward the target distribution without a "
        "hard filter"
    )

    # attribute sidecar (r9): persist the scores once (bytes/doc), so
    # the NEXT recipe change re-joins instead of re-scoring the corpus
    import tempfile

    from smashed_spark.sources.attributes import (
        join_attributes,
        write_attributes,
    )

    side = tempfile.mkdtemp(prefix="qs_attrs_") + "/attrs"
    cols = write_attributes(
        scored, side,
        attribute_fields=["model_q_score", "word_ppl", "quality_rank"],
    )
    rejoined = join_attributes(docs.select("doc_id", "text"), side)
    print(
        f"sidecar: wrote {cols} for {rejoined.count()} docs; re-curation "
        "is now a broadcast join, not a scoring scan"
    )
    spark.stop()


if __name__ == "__main__":
    main()
