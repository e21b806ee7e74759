"""Sink helpers round-trip."""

from smashed_spark.plans.registry import load
from smashed_spark.sources.sinks import write_csv, write_jsonl, write_parquet


def test_partitioned_parquet_roundtrip(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "documents")
    out = str(tmp_path / "docs")
    write_parquet(df, out, partition_by=["lang"], mode="overwrite")
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning: filtering on lang must prune at planning time
    pruned = back.filter("lang = 'en'")
    assert pruned.count() == df.filter("lang = 'en'").count()


def test_jsonl_csv_roundtrip(spark, sf_dir, tmp_path):
    df = load(spark, sf_dir, "documents").select("doc_id", "lang")
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    write_jsonl(df, jp, compression=None)
    write_csv(df, cp)
    assert spark.read.json(jp).count() == df.count()
    assert spark.read.csv(cp, header=True).count() == df.count()
