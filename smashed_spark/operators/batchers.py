"""Consecutive-row batching (reference: src/smashed/mappers/batchers.py).

``FixedBatchSizeMapper`` packs each run of ``batch_size`` consecutive
rows (in an explicit order) into ONE row whose fields are lists —
dict-of-lists, the reference's batch shape (SURVEY.md §2.5).

Order sensitivity: the reference consumes rows in encounter order; a
DataFrame has none, so an explicit ``order_by`` key is required
(SURVEY.md §7 risk 1).

Scale notes
-----------
* Default path ranks rows with a window over ``order_by`` — an
  un-partitioned window is a single-task sort, fine for test scale.
* ``contiguous_key=True`` declares that the (single) ``order_by``
  column already holds dense 0-based consecutive ints: the group id is
  then ``key div batch_size`` — a plain hash aggregate, fully parallel,
  the 100 TB path.  Ingest can guarantee this with
  ``core.order.with_row_index``.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


class FixedBatchSizeMapper(SparkMapper):
    def __init__(
        self,
        batch_size: Union[int, str],
        keep_last: bool = True,
        order_by: Sequence[str] = (),
        contiguous_key: bool = False,
    ) -> None:
        if batch_size == "max":
            self.batch_size: Union[int, None] = None
        else:
            try:
                self.batch_size = int(batch_size)
                assert self.batch_size > 0
            except (AssertionError, ValueError, TypeError):
                raise ValueError(
                    "batch_size must be a positive integer or 'max', "
                    f"not '{batch_size}' (type: {type(batch_size)})"
                )
        if not isinstance(keep_last, bool):
            raise ValueError(f"keep_last must be a boolean, not {keep_last}")
        if not order_by:
            raise ValueError(
                "order_by is required: Spark DataFrames are unordered, and "
                "batching is order-sensitive"
            )
        if contiguous_key and len(order_by) != 1:
            raise ValueError("contiguous_key requires a single order_by column")
        self.keep_last = keep_last
        self.order_by: List[str] = list(order_by)
        self.contiguous_key = contiguous_key
        super().__init__(input_fields=self.order_by)

    def apply(self, df: DataFrame) -> DataFrame:
        value_cols = df.columns
        if self.batch_size is None:
            gid = F.lit(0)
        elif self.contiguous_key:
            gid = (F.col(self.order_by[0]) / self.batch_size).cast("bigint")
        else:
            w = Window.orderBy(*self.order_by)
            rn = F.row_number().over(w) - F.lit(1)
            gid = F.floor(rn / self.batch_size)
        df = df.withColumn("__gid__", gid)

        sort_key = F.struct(*[F.col(c) for c in self.order_by])
        aggs = [
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(sort_key.alias("k"), F.col(c).alias("v")))
                ),
                lambda s: s.getField("v"),
            ).alias(c)
            for c in value_cols
        ]
        out = df.groupBy("__gid__").agg(*aggs)
        if not self.keep_last and self.batch_size is not None:
            out = out.filter(F.size(F.col(value_cols[0])) == self.batch_size)
        return out.drop("__gid__")
