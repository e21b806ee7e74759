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


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """write_orc -> OrcLoaderMapper round-trip, value-exact, with the
    predicate reaching the ORC scan (PushedFilters)."""
    from smashed_spark.sources.loaders import OrcLoaderMapper
    from smashed_spark.sources.sinks import write_orc

    df = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    out = str(tmp_path / "orc_docs")
    write_orc(df, out, mode="overwrite")
    paths = spark.createDataFrame([(out,)], "path: string")
    back = OrcLoaderMapper("path").map(paths)
    assert back.count() == df.count()
    assert (
        back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
    )
    plan = (
        back.filter("n_chars > 400")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_chars" in plan.split(
        "PushedFilters"
    )[1][:80]


def test_shard_for_training_deterministic_and_partition_invariant(spark):
    """Shard + rank are pure functions of keys: identical across
    repartitionings, shards are balanced-ish, ranks are 1..len(shard),
    and the order hash differs from the shard hash (the within-shard
    order is a shuffle, not key order)."""
    from smashed_spark.sources.sinks import shard_for_training

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(200)], "doc_id: bigint, text: string"
    )
    a = {
        (r.doc_id): (r.shard, r.shard_rank)
        for r in shard_for_training(df, "doc_id", 4, seed=5).collect()
    }
    b = {
        (r.doc_id): (r.shard, r.shard_rank)
        for r in shard_for_training(
            df.repartition(7), "doc_id", 4, seed=5
        ).collect()
    }
    assert a == b
    shards = {}
    for doc, (s, r) in a.items():
        shards.setdefault(s, []).append(r)
    assert set(shards) == {0, 1, 2, 3}
    for s, ranks in shards.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # within-shard rank order must not equal key order (it's a seeded
    # shuffle): find one shard where ascending rank != ascending key
    scrambled = any(
        [d for d, (s, _) in sorted(a.items()) if s == sh]
        != [
            d
            for d, _ in sorted(
                ((d, r) for d, (s, r) in a.items() if s == sh),
                key=lambda t: t[1],
            )
        ]
        for sh in shards
    )
    assert scrambled


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Shard directories materialize with rank-ordered rows inside."""
    from smashed_spark.sources.sinks import (
        shard_for_training,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "doc_id: bigint, text: string"
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, "doc_id", 4, seed=5, mode="overwrite")
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert set(back.select("shard").distinct().toPandas()["shard"]) == {
        0, 1, 2, 3,
    }
    want = {
        (r.doc_id, r.shard, r.shard_rank)
        for r in shard_for_training(df, "doc_id", 4, seed=5).collect()
    }
    got = {
        (r.doc_id, r.shard, r.shard_rank) for r in back.collect()
    }
    assert got == want


def test_shard_for_training_edges(spark):
    """n_shards=1 degenerates to a single ranked shard; duplicate keys
    land in the same shard with consecutive ranks (identical rows are
    interchangeable); n_shards<1 rejected."""
    import pytest as _pytest

    from smashed_spark.sources.sinks import shard_for_training

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "doc_id: bigint, text: string"
    )
    one = shard_for_training(df, "doc_id", 1, seed=5).collect()
    assert {r.shard for r in one} == {0}
    assert sorted(r.shard_rank for r in one) == [1, 2, 3]
    dup_rows = [r for r in one if r.doc_id == 1]
    assert len({r.shard for r in dup_rows}) == 1
    assert abs(dup_rows[0].shard_rank - dup_rows[1].shard_rank) == 1
    with _pytest.raises(ValueError, match="n_shards"):
        shard_for_training(df, "doc_id", 0)


def test_shard_for_training_duplicate_keys_different_payloads(spark):
    """Duplicate keys with DIFFERENT payloads: shard/order hashes are
    pure functions of the key, so without the content tiebreak their
    relative rank would be partition-arrival order.  The xxhash64
    content tiebreak makes each (key, payload) row's rank a pure
    function of the data — identical across repartitionings."""
    from smashed_spark.sources.sinks import shard_for_training

    rows = [(i % 10, f"payload-{i}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    ranks = {}
    for n_parts in (1, 3, 17):
        got = {
            (r.doc_id, r.text): (r.shard, r.shard_rank)
            for r in shard_for_training(
                df.repartition(n_parts), "doc_id", 4, seed=5
            ).collect()
        }
        ranks[n_parts] = got
    assert ranks[1] == ranks[3] == ranks[17]
    # every row got a distinct (shard, rank) slot
    assert len(set(ranks[1].values())) == 60
