"""Event sessionization: gap-based session assignment and session
rollups over an event stream table.

Beyond the reference surface (it has no event-time semantics); the
standard large-scale pattern: windows are PARTITIONED BY user, so the
sort is per-user within a hash-shuffled partition — fully parallel, no
global sort, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


class SessionizeMapper(SparkMapper):
    """Assign a per-user session index: a new session starts when the
    gap to the previous event exceeds ``gap_minutes``."""

    def __init__(
        self,
        user_field: str = "user_id",
        ts_field: str = "ts",
        id_field: str = "event_id",
        gap_minutes: int = 30,
        session_field: str = "session_idx",
    ) -> None:
        self.user_field = user_field
        self.ts_field = ts_field
        self.id_field = id_field
        self.gap_minutes = gap_minutes
        self.session_field = session_field
        super().__init__(
            input_fields=[user_field, ts_field, id_field],
            output_fields=[session_field],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        w = Window.partitionBy(self.user_field).orderBy(
            self.ts_field, self.id_field
        )
        prev_ts = F.lag(self.ts_field).over(w)
        # compare at microsecond precision: cast("long") truncates to
        # whole seconds, so a 1800.5 s gap would (wrongly) not break a
        # 30-min session while a microsecond-exact oracle would.
        # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike
        # with NO zone resolution — an NTZ->LTZ cast would give the two
        # ends of a DST-straddling gap different offsets and skew the
        # gap by an hour under a non-UTC session timezone
        gap_us = F.timestamp_diff(
            "MICROSECOND", prev_ts, F.col(self.ts_field)
        )
        brk = F.when(
            prev_ts.isNull() | (gap_us > self.gap_minutes * 60 * 1_000_000),
            1,
        ).otherwise(0)
        running = Window.partitionBy(self.user_field).orderBy(
            self.ts_field, self.id_field
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return df.withColumn(
            self.session_field, F.sum(brk).over(running).cast("bigint")
        )


class SessionStatsMapper(SessionizeMapper):
    """Sessionize, then roll up per (user, session): event count, span
    seconds, total value."""

    def __init__(self, value_field: str | None = "value", **kwargs) -> None:
        super().__init__(**kwargs)
        self.value_field = value_field
        if value_field:
            # declared so a missing column fails with the mapper's
            # plan-time contract error, not a raw unresolved-column one
            self.input_fields = (*self.input_fields, value_field)

    def apply(self, df: DataFrame) -> DataFrame:
        sessions = super().apply(df)
        value_aggs = (
            [F.round(F.sum(self.value_field), 6).alias("total_value")]
            if self.value_field
            else []
        )
        return sessions.groupBy(
            self.user_field, self.session_field
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer microseconds then floor-divide: exact in any
            # engine (casting each timestamp to seconds first truncates
            # fractional parts inconsistently); timestamp_diff is
            # zone-independent on NTZ inputs (see apply above)
            (
                F.timestamp_diff(
                    "MICROSECOND",
                    F.min(self.ts_field),
                    F.max(self.ts_field),
                )
                / F.lit(1_000_000)
            ).cast("bigint").alias("span_seconds"),
            *value_aggs,
        )
