"""Field-level projections (reference: src/smashed/mappers/fields.py).

All pure Column-expression mappers: narrow transformations, fully
whole-stage-codegen'd, zero Python per row.  ``EnumerateFieldMapper``
is the exception — it is the reference's one genuinely *stateful*
operator (fields.py:134-196) and becomes a distinct+window dictionary
encode plus a broadcast join here.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


class ChangeFieldsMapper(SparkMapper):
    """Keep XOR drop fields (reference fields.py:17-67;
    ``always_remove_columns`` semantics at base/interfaces.py:54-59)."""

    def __init__(
        self,
        keep_fields: Optional[Sequence[str]] = None,
        drop_fields: Optional[Sequence[str]] = None,
        raise_on_missing: bool = True,
    ) -> None:
        if (keep_fields is not None) == (drop_fields is not None):
            raise ValueError("Must specify `keep_fields` or `drop_fields`")
        self.keep_fields = list(dict.fromkeys(keep_fields)) if keep_fields else None
        self.drop_fields = list(dict.fromkeys(drop_fields)) if drop_fields else None
        self.raise_on_missing = raise_on_missing
        super().__init__(
            input_fields=(self.keep_fields or self.drop_fields)
            if raise_on_missing
            else None,
        )

    def apply(self, df: DataFrame) -> DataFrame:
        if self.keep_fields is not None:
            cols = [c for c in self.keep_fields if self.raise_on_missing or c in df.columns]
            return df.select(*cols)
        return df.drop(*[c for c in self.drop_fields or [] if c in df.columns])


class RenameFieldsMapper(SparkMapper):
    """Rename via map; ``remove_rest`` drops unmapped columns
    (reference fields.py:70-100)."""

    def __init__(
        self, rename_fields_map: Dict[str, str], remove_rest: bool = False
    ) -> None:
        self.rename_fields_map = dict(rename_fields_map)
        self.remove_rest = remove_rest
        super().__init__(
            input_fields=list(rename_fields_map.keys()),
            output_fields=list(rename_fields_map.values()),
        )

    def apply(self, df: DataFrame) -> DataFrame:
        if self.remove_rest:
            df = df.select(*self.rename_fields_map.keys())
        return df.withColumnsRenamed(self.rename_fields_map)


class MakeFieldMapper(SparkMapper):
    """Add a constant field; ``shape_like`` repeats the constant to match
    another array column's length (reference fields.py:103-131)."""

    def __init__(
        self, field_name: str, value: Any, shape_like: Optional[str] = None
    ) -> None:
        self.field_name = field_name
        self.value = value
        self.shape_like = shape_like
        super().__init__(
            input_fields=[shape_like] if shape_like else None,
            output_fields=[field_name],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        if self.shape_like is not None:
            col = F.array_repeat(F.lit(self.value), F.size(F.col(self.shape_like)))
        else:
            col = F.lit(self.value)
        return df.withColumn(self.field_name, col)


class EnumerateFieldMapper(SparkMapper):
    """Assign integer ids to a field's values (reference fields.py:134-196).

    ``same_id_for_repeated=True``: dictionary-encode — each distinct value
    gets the id of its first appearance in ``order_by`` order (the
    reference uses encounter order of its sequential scan; Spark needs the
    explicit total order, SURVEY.md §7 risk 1).

    Scale: the distinct-values dictionary is built with a hash aggregate
    (map-side partial on ``min(order)``), ranked with a window over the
    *dictionary* (small), and joined back.  The join side is marked
    ``broadcast`` — dictionaries (language codes, sources, categories) are
    tiny relative to the fact table.  For high-cardinality fields drop the
    broadcast hint via ``broadcast_dictionary=False``.

    ``same_id_for_repeated=False``: a running counter — the row index
    itself in ``order_by`` order.
    """

    def __init__(
        self,
        field_to_enumerate: str,
        destination_field: Optional[str] = None,
        same_id_for_repeated: bool = True,
        order_by: Optional[Sequence[str]] = None,
        broadcast_dictionary: bool = True,
    ) -> None:
        self.enum_field = field_to_enumerate
        self.dest_field = destination_field or field_to_enumerate
        self.same_id_for_repeated = same_id_for_repeated
        self.order_by: List[str] = list(order_by or [])
        self.broadcast_dictionary = broadcast_dictionary
        super().__init__(
            input_fields=[self.enum_field], output_fields=[self.dest_field]
        )

    def apply(self, df: DataFrame) -> DataFrame:
        order_cols = self.order_by or [self.enum_field]
        if self.same_id_for_repeated:
            first_seen = df.groupBy(self.enum_field).agg(
                F.min(F.struct(*order_cols)).alias("__first_seen__")
            )
            w = Window.orderBy("__first_seen__")
            dictionary = first_seen.select(
                F.col(self.enum_field).alias("__enum_key__"),
                (F.row_number().over(w) - F.lit(1)).alias("__enum_id__"),
            )
            if self.broadcast_dictionary:
                dictionary = F.broadcast(dictionary)
            out = df.join(
                dictionary, df[self.enum_field] == dictionary["__enum_key__"], "left"
            ).drop("__enum_key__")
            cols = [c for c in df.columns if c != self.dest_field]
            return out.select(*cols, F.col("__enum_id__").alias(self.dest_field))
        # unique running counter in explicit order
        w = Window.orderBy(*order_cols)
        out = df.withColumn("__enum_id__", F.row_number().over(w) - F.lit(1))
        cols = [c for c in df.columns if c != self.dest_field]
        return out.select(*cols, F.col("__enum_id__").alias(self.dest_field))
