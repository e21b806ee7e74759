"""Web-corpus hygiene (r9 family): URL canonicalization (r12) ->
URL host/domain extraction ->
domain blocklist -> per-domain caps (template-farm control) ->
compression-ratio + heuristic quality signals -> per-source
quality-threshold calibration (keep the best 60% of EACH source).

Everything before the per-domain cap is narrow column algebra riding
the scan; the cap is one WindowGroupLimit, and calibration adds one
slim (source, score) exchange plus a KB-sized thresholds broadcast.

The synthetic corpus has no URL column, so one is derived
deterministically from (source, doc_id) — the pipeline shape is what
this example demonstrates.

Run: python examples/web_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.calibrate import select_top_fraction
from smashed_spark.functions.textstats import (
    CompressionRatioMapper,
    QualityScoreMapper,
)
from smashed_spark.functions.web import DomainFilterMapper, UrlHostMapper
from smashed_spark.sources.loaders import quota_sample


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # synthesize a URL per doc: a handful of hosts per source, so the
    # per-domain cap has something to cap
    docs = docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )

    # 0. canonicalize the URL (r12): mixed-case hosts, tracking
    # params, default ports, fragments, and trailing slashes all
    # collapse — this is what makes md5(canon_url) a usable dedup key
    # across crawls.  Narrow regexp/array algebra, rides the scan.
    from smashed_spark.functions.web import UrlCanonicalMapper

    docs = UrlCanonicalMapper("url", output_field="url_c").map(docs)
    docs = docs.drop("url").withColumnRenamed("url_c", "url")

    # 1. hosts + registered domains (narrow regexp, rides the scan).
    # Production would pass the real Mozilla PSL snapshot here —
    # suffixes= takes a sequence or a one-column DataFrame (e.g.
    # spark.read.text of the list) and compiles it into per-depth
    # in-plan literals, still zero joins/exchanges:
    #   UrlHostMapper("url", suffixes=psl_df).map(docs)
    curated = UrlHostMapper("url").map(docs)

    # 2. domain blocklist — literal tier folds into the scan's filters
    curated = DomainFilterMapper(
        domain_field="domain", blocklist=["example.org"]
    ).map(curated)

    # 3. per-domain cap: compose with the existing quota sampler
    # (WindowGroupLimit — no full sort); deterministic by doc_id
    curated = quota_sample(
        curated, group_by=["host"], max_per_group=300, key_field="doc_id"
    )

    # 4. quality signals: heuristic score + zlib repetitiveness
    curated = (QualityScoreMapper("text") >> CompressionRatioMapper()).map(
        curated
    )

    # 5. keep the best 60% of each source by q_score (approx tier:
    # mergeable GK sketch — the 100 TB path)
    kept = select_top_fraction(
        curated, "q_score", 0.6, by="source", keep_field="keep",
        threshold_field="src_cutoff",
    )

    kept.groupBy("source").agg(
        F.count("*").alias("docs"),
        F.sum("keep").alias("kept"),
        F.round(F.avg("compression_ratio"), 4).alias("avg_zratio"),
        F.round(F.first("src_cutoff"), 4).alias("cutoff"),
    ).orderBy("source").show(truncate=False)

    # 6. the audit: profile the curated output (two bounded jobs for
    # every column — the before/after numbers a recipe owner records)
    from smashed_spark.functions.profile import profile_corpus

    profile_corpus(
        kept, columns=["domain", "q_score", "compression_ratio", "keep"]
    ).select(
        "column", "n_nulls", "est_distinct", "min_value", "max_value",
        F.round("mean", 4).alias("mean"),
    ).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
