"""Type-conversion mappers (reference: src/smashed/mappers/types.py).

Casts recurse into arrays (reference ``RecurseOpMixIn._recursive_op``,
types.py:31-40) — Spark's ``cast`` does the same through ``ArrayType``
natively, so these stay pure Column expressions.
"""

from __future__ import annotations

from typing import Any, Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType

from ..core.mapper import SparkMapper

# Python type -> Spark DDL element type (reference HF_CAST_DICT,
# types.py:19-24 uses int64/float32/bool/string)
_CAST_DDL = {
    int: "bigint",
    float: "double",
    bool: "boolean",
    str: "string",
}


def _nested_ddl(dtype: DataType, target: str) -> str:
    """Rebuild the DDL of ``dtype`` with scalar leaves replaced by
    ``target`` (reference recursive cast, types.py:31-40)."""
    if isinstance(dtype, ArrayType):
        return f"array<{_nested_ddl(dtype.elementType, target)}>"
    return target


class CastMapper(SparkMapper):
    """Cast fields to a Python type, recursing into arrays
    (reference types.py:43-161)."""

    def __init__(self, cast_map: Dict[str, type]) -> None:
        for t in cast_map.values():
            if t not in _CAST_DDL:
                raise ValueError(f"Unsupported cast target {t}")
        self.cast_map = dict(cast_map)
        super().__init__(
            input_fields=list(cast_map.keys()),
            output_fields=list(cast_map.keys()),
        )

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field, pytype in self.cast_map.items():
            ddl = _nested_ddl(df.schema[field].dataType, _CAST_DDL[pytype])
            out[field] = F.col(field).cast(ddl)
        return df.withColumns(out)


class BinarizerMapper(SparkMapper):
    """``int(value > threshold)``, recursing into arrays
    (reference types.py:164-179)."""

    def __init__(self, field: str, threshold: float) -> None:
        self.field = field
        self.threshold = threshold
        super().__init__(input_fields=[field], output_fields=[field])

    def apply(self, df: DataFrame) -> DataFrame:
        dtype = df.schema[self.field].dataType
        col = F.col(self.field)

        def binarize(c: Column) -> Column:
            return (c > F.lit(self.threshold)).cast("bigint")

        if isinstance(dtype, ArrayType):
            if isinstance(dtype.elementType, ArrayType):
                new = F.transform(col, lambda xs: F.transform(xs, binarize))
            else:
                new = F.transform(col, binarize)
        else:
            new = binarize(col)
        return df.withColumn(self.field, new)


class LookupMapper(SparkMapper):
    """Map values through a literal dict (reference types.py:182-203).

    Scale: the lookup table is a driver-side literal folded into the plan
    as a ``map`` expression — no join, no shuffle, no broadcast needed
    (it rides along inside whole-stage codegen).  Key/value homogeneity
    enforced like the reference.
    """

    def __init__(self, field_name: str, lookup_table: Dict[Any, Any]) -> None:
        source_types = {type(k) for k in lookup_table.keys()}
        target_types = {type(v) for v in lookup_table.values()}
        if len(source_types) > 1:
            raise ValueError(
                f"Lookup source values must be of the same type, got {source_types}"
            )
        if len(target_types) > 1:
            raise ValueError(
                f"Lookup target values must be of the same type, got {target_types}"
            )
        self.field_name = field_name
        self.lookup_table = dict(lookup_table)
        super().__init__(input_fields=[field_name], output_fields=[field_name])

    def apply(self, df: DataFrame) -> DataFrame:
        pairs = []
        for k, v in self.lookup_table.items():
            pairs.extend([F.lit(k), F.lit(v)])
        mapping = F.create_map(*pairs)
        # the reference recurses into list fields (RecurseOpMixIn,
        # types.py:31-40): every element is looked up
        dtype = df.schema[self.field_name].dataType
        col = F.col(self.field_name)
        if isinstance(dtype, ArrayType):
            if isinstance(dtype.elementType, ArrayType):
                new = F.transform(
                    col, lambda xs: F.transform(xs, lambda x: mapping[x])
                )
            else:
                new = F.transform(col, lambda x: mapping[x])
        else:
            new = mapping[col]
        return df.withColumn(self.field_name, new)


class OneHotMapper(SparkMapper):
    """int label -> one-hot ``array<bigint>`` of ``num_classes``
    (reference types.py:206-222)."""

    def __init__(self, num_classes: int, field_name: str) -> None:
        self.num_classes = num_classes
        self.field_name = field_name
        super().__init__(input_fields=[field_name], output_fields=[field_name])

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.field_name)
        onehot = F.transform(
            F.sequence(F.lit(0), F.lit(self.num_classes - 1)),
            lambda i: (i == col).cast("bigint"),
        )
        return df.withColumn(self.field_name, onehot)
