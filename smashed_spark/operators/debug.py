"""Test-double mappers (reference: src/smashed/mappers/debug.py:8-72).

``MockMapper`` adds ``value`` to every column (reference debug.py:56-61
``k: v + value``) — the pipeline-test workhorse (reference
tests/test_pipeline.py:70-77).  Array columns get the value appended
(reference pipeline tests chain ``+[1]``-style list appenders)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..core.mapper import SparkMapper


class MockMapper(SparkMapper):
    def __init__(self, value: int = 1) -> None:
        self.value = value
        super().__init__()

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field in df.schema.fields:
            col = F.col(field.name)
            if isinstance(field.dataType, ArrayType):
                out[field.name] = F.concat(col, F.array(F.lit(self.value)))
            elif isinstance(field.dataType, StringType):
                out[field.name] = F.concat(col, F.lit(str(self.value)))
            else:
                out[field.name] = col + F.lit(self.value)
        return df.withColumns(out)
