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


class DebugSingleMapper(SparkMapper):
    """Print/inspect rows as they flow (reference debug.py:8-30 inserts
    a breakpoint; a distributed engine can't stop a debugger in an
    executor, so this logs a row sample driver-side at plan time and
    passes data through unchanged)."""

    def __init__(self, n_rows: int = 1) -> None:
        self.n_rows = n_rows
        super().__init__()

    def apply(self, df: DataFrame) -> DataFrame:
        for row in df.take(self.n_rows):
            print(f"[DebugSingleMapper] {row.asDict()}")
        return df


class DebugBatchedMapper(DebugSingleMapper):
    """Batch-shaped debug view (reference debug.py:33-53): shows the
    dict-of-lists form of the first rows."""

    def apply(self, df: DataFrame) -> DataFrame:
        rows = [r.asDict() for r in df.take(self.n_rows)]
        if rows:
            batch = {k: [r[k] for r in rows] for k in rows[0]}
            print(f"[DebugBatchedMapper] {batch}")
        return df


class BatchMockMapper(MockMapper):
    """Batched variant of MockMapper (reference debug.py:64-72) — same
    column arithmetic; kept for API parity (batch vs single is an
    execution detail the Spark rebuild erases)."""
