"""Temporal joins over the events table: as-of enrichment (for each
"alert" event, the user's latest prior "reading" event) and a bucketed
range join (events matched to value bands) — the two join shapes Spark
has no native operator for, expressed with one exchange each.

Run: python examples/temporal_joins.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from smashed_spark.functions.asof import RangeJoinMapper, asof_join


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from smashed_spark.plans.registry import load

    events = load(spark, sf_dir, "events")

    # split the stream: even event ids are periodic readings, odd are
    # alerts needing the freshest reading at the time they fired
    readings = events.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "ts", F.col("value").alias("reading")
    )
    alerts = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts"
    )
    enriched = asof_join(
        alerts,
        readings,
        on="ts",
        by=["user_id"],
        tolerance=F.expr("INTERVAL 2 HOURS"),
    )
    n = enriched.count()
    fresh = enriched.filter(F.col("reading_asof").isNotNull()).count()
    print(f"alerts: {n}; with a reading within 2h: {fresh}")

    # band events by value via the bucketed range join
    # clamp the top band to the observed max: an open-ended 1e9 bound
    # would span 10^8 buckets at width 10 and RangeJoinMapper's
    # fan-out guard raises on exactly that misuse
    vmax = events.agg(F.max("value")).collect()[0][0] + 1.0
    bands = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 50.0), ("high", 50.0, vmax)],
        "band: string, start: double, end: double",
    )
    banded = RangeJoinMapper(
        bands, point_field="value", bucket_width=10.0, how="left"
    ).map(events.select("event_id", "value"))
    banded.groupBy("band").count().orderBy("band").show()

    # the STREAMING shape of the same enrichment: match each alert
    # with readings up to 2h BEFORE it, over two unbounded streams —
    # interval_join installs the watermarks + two-sided time bound
    # that keep join state bounded (run here in its batch mode; the
    # identical call works on readStream frames)
    from smashed_spark.streaming.joins import interval_join

    paired = interval_join(
        alerts,
        readings.withColumnRenamed("ts", "reading_ts"),
        on="user_id",
        left_ts="ts",
        right_ts="reading_ts",
        before="2 hours",
        after="0 seconds",
        how="left_outer",
    )
    n_pairs = paired.filter(F.col("reading").isNotNull()).count()
    print(f"interval_join: {n_pairs} (alert, reading-within-2h) pairs")
    spark.stop()


if __name__ == "__main__":
    main()
