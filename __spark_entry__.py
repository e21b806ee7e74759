"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — every oracle-checked operator query (SURVEY.md §2).
``oracle_sql()`` — matching DuckDB SQL per query name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document-preprocessing pipeline at sf0.001."""
    from smashed_spark.plans import queries as _q  # noqa: F401  (registers)
    from smashed_spark.plans.registry import QUERIES

    return QUERIES["flagship_preprocess"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from smashed_spark.plans import queries as _q  # noqa: F401  (registers)
    from smashed_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from smashed_spark.plans import queries as _q  # noqa: F401  (registers)
    from smashed_spark.plans.registry import oracles

    return oracles()
