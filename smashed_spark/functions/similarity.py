"""Approximate nearest-neighbor search over an embedding column.

Two tiers:

* :class:`CosineTopK` — brute-force exact top-k: cross join queries ×
  corpus, rank with a window partitioned *by query* (parallel across
  queries, no global sort).  The baseline and the verifier.
* :class:`HyperplaneLSHTopK` — random-hyperplane LSH (Charikar 2002):
  sign-bit signatures from deterministic pseudo-random hyperplanes,
  multi-probe via several independent tables; candidates only join
  within matching buckets, then exact cosine re-ranks.  Cost scales
  with bucket occupancy instead of corpus size — the 100 TB path.

The hyperplanes are generated from a hash of (table, bit, dim) so both
driver restarts and the DuckDB oracle can reproduce them without
shipping any state.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper
from .hashing import cosine_similarity


class CosineTopK(SparkMapper):
    """Exact cosine top-k neighbors for each query vector.

    ``queries_filter`` limits the query side (e.g. ``vec_id < 100``);
    the corpus side stays full.  The corpus side is broadcast when
    small; for large corpora the cross join shuffles corpus partitions
    across queries — exact kNN is inherently O(Q×N), which is why the
    LSH variant exists.
    """

    def __init__(
        self,
        id_field: str = "vec_id",
        vector_field: str = "embedding",
        k: int = 5,
        queries_filter: Optional[str] = None,
        exclude_self: bool = True,
    ) -> None:
        self.id_field = id_field
        self.vector_field = vector_field
        self.k = k
        self.queries_filter = queries_filter
        self.exclude_self = exclude_self
        super().__init__(input_fields=[id_field, vector_field])

    def apply(self, df: DataFrame) -> DataFrame:
        corpus = df.select(
            F.col(self.id_field).alias("__cid__"),
            F.col(self.vector_field).alias("__cv__"),
        )
        queries = df
        if self.queries_filter:
            queries = df.filter(self.queries_filter)
        queries = queries.select(
            F.col(self.id_field).alias("__qid__"),
            F.col(self.vector_field).alias("__qv__"),
        )
        joined = queries.crossJoin(corpus)
        if self.exclude_self:
            joined = joined.filter(F.col("__qid__") != F.col("__cid__"))
        sim = cosine_similarity(F.col("__qv__"), F.col("__cv__"))
        scored = joined.select(
            F.col("__qid__").alias("query_id"),
            F.col("__cid__").alias("neighbor_id"),
            F.round(sim, 6).alias("sim"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "neighbor_id", "sim", "rank")
        )


def _hyperplane_component(table: int, bit: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = F.xxhash64(F.lit(table), F.lit(bit), F.lit(dim))
    return (h % 10_000).cast("double") / 5_000.0 - F.lit(1.0)


class HyperplaneLSHTopK(SparkMapper):
    """Approximate cosine top-k via random-hyperplane LSH.

    Each of ``num_tables`` independent tables assigns a
    ``num_bits``-bit bucket signature (sign of dot with each
    hyperplane).  Vectors join only within (table, bucket); exact
    cosine then ranks candidates and keeps k per query.  Recall grows
    with tables; cost per table is bucket-local.
    """

    def __init__(
        self,
        id_field: str = "vec_id",
        vector_field: str = "embedding",
        k: int = 5,
        num_bits: int = 8,
        num_tables: int = 4,
        queries_filter: Optional[str] = None,
        exclude_self: bool = True,
    ) -> None:
        self.id_field = id_field
        self.vector_field = vector_field
        self.k = k
        self.num_bits = num_bits
        self.num_tables = num_tables
        self.queries_filter = queries_filter
        self.exclude_self = exclude_self
        super().__init__(input_fields=[id_field, vector_field])

    def _signature(self, vec: Column, table: int, dims: int) -> Column:
        bits = []
        for b in range(self.num_bits):
            dot = F.lit(0.0)
            for d in range(dims):
                dot = dot + F.element_at(vec, d + 1).cast(
                    "double"
                ) * _hyperplane_component(table, b, d)
            bits.append(F.when(dot >= 0, F.lit(2 ** b)).otherwise(F.lit(0)))
        out = bits[0]
        for x in bits[1:]:
            out = out + x
        return out.cast("bigint")

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import ArrayType

        dtype = df.schema[self.vector_field].dataType
        assert isinstance(dtype, ArrayType)
        # dims must be known to build the plan: probe one row (tiny
        # driver-side action, OK — schema carries no array length)
        dims = len(
            df.select(self.vector_field).limit(1).collect()[0][0]
        )

        vec = F.col(self.vector_field)
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    self._signature(vec, t, dims).alias("bucket"),
                )
                for t in range(self.num_tables)
            ]
        )
        base = df.select(
            F.col(self.id_field).alias("__id__"),
            vec.alias("__v__"),
            F.explode(tables).alias("__tb__"),
        ).select(
            "__id__",
            "__v__",
            F.col("__tb__").getField("table").alias("__t__"),
            F.col("__tb__").getField("bucket").alias("__b__"),
        )
        queries = base
        if self.queries_filter:
            ids = df.filter(self.queries_filter).select(
                F.col(self.id_field).alias("__id__")
            )
            queries = base.join(F.broadcast(ids), "__id__")
        l = queries.alias("l")
        r = base.alias("r")
        cand = (
            l.join(
                r,
                (F.col("l.__t__") == F.col("r.__t__"))
                & (F.col("l.__b__") == F.col("r.__b__")),
            )
            .select(
                F.col("l.__id__").alias("query_id"),
                F.col("r.__id__").alias("neighbor_id"),
                F.col("l.__v__").alias("__qv__"),
                F.col("r.__v__").alias("__cv__"),
            )
        )
        if self.exclude_self:
            cand = cand.filter(F.col("query_id") != F.col("neighbor_id"))
        cand = cand.dropDuplicates(["query_id", "neighbor_id"])
        sim = cosine_similarity(F.col("__qv__"), F.col("__cv__"))
        scored = cand.select(
            "query_id", "neighbor_id", F.round(sim, 6).alias("sim")
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= self.k)
            .select("query_id", "neighbor_id", "sim", "rank")
        )
