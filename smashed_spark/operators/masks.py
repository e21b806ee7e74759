"""Mask <-> indices/ranges conversions (reference:
src/smashed/mappers/masks.py).

The reference uses numpy per row; here everything is higher-order array
expressions — JVM-side, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..core.mapper import SparkMapper


class IndicesToMaskMapper(SparkMapper):
    """Indices list -> 0/1 mask sized like a reference field
    (reference masks.py:9-59)."""

    def __init__(
        self,
        mask_field_name: str,
        reference_field_name: str,
        locations_field_name: str,
        mask_off_value: int = 0,
        mask_fill_value: int = 1,
    ) -> None:
        self.mask_field_name = mask_field_name
        self.reference_field_name = reference_field_name
        self.locations_field_name = locations_field_name
        self.mask_off_value = mask_off_value
        self.mask_fill_value = mask_fill_value
        super().__init__(
            input_fields=(locations_field_name, reference_field_name),
            output_fields=(mask_field_name,),
        )

    def _positions(self, df: DataFrame) -> Column:
        size = F.size(F.col(self.reference_field_name))
        return F.when(size > 0, F.sequence(F.lit(0), size - 1)).otherwise(
            F.array().cast("array<integer>")
        )

    def _locs(self, df: DataFrame) -> Column:
        # reference accepts a bare int or a list of indices
        locs = F.col(self.locations_field_name)
        if not isinstance(
            df.schema[self.locations_field_name].dataType, ArrayType
        ):
            locs = F.array(locs)
        return locs

    def apply(self, df: DataFrame) -> DataFrame:
        locs = self._locs(df)
        mask = F.transform(
            self._positions(df),
            lambda i: F.when(
                F.array_contains(locs, i.cast("bigint")),
                F.lit(self.mask_fill_value),
            ).otherwise(F.lit(self.mask_off_value)),
        )
        return df.withColumn(self.mask_field_name, mask)


class RangeToMaskMapper(IndicesToMaskMapper):
    """``[start, end)`` pair(s) -> mask (reference masks.py:62-87).

    Accepts a single pair (``array<long>``) or a list of pairs.  The
    reference returns an all-*zeros* mask (not ``mask_off_value``) when
    the ranges list is empty — quirk preserved.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        locs = F.col(self.locations_field_name)
        dtype = df.schema[self.locations_field_name].dataType
        if isinstance(dtype, ArrayType) and not isinstance(
            dtype.elementType, ArrayType
        ):
            locs = F.array(locs)  # single [start, end] pair -> list of pairs

        def in_any_range(i: Column) -> Column:
            return F.exists(
                locs,
                lambda p: (p.getItem(0) <= i) & (i < p.getItem(1)),
            )

        mask = F.transform(
            self._positions(df),
            lambda i: F.when(
                in_any_range(i.cast("bigint")), F.lit(self.mask_fill_value)
            ).otherwise(F.lit(self.mask_off_value)),
        )
        empty_mask = F.array_repeat(
            F.lit(0), F.size(F.col(self.reference_field_name))
        )
        out = F.when(F.size(F.col(self.locations_field_name)) == 0, empty_mask).otherwise(
            mask
        )
        return df.withColumn(self.mask_field_name, out)


class MaskToIndicesMapper(SparkMapper):
    """Mask -> list of indices where the mask is ``mask_fill_value``
    (reference masks.py:90-143).  ``enforce_single_location`` returns the
    single index as a scalar and raises when the count differs from 1."""

    def __init__(
        self,
        mask_field_name: str,
        locations_field_name: str,
        mask_off_value: int = 0,
        mask_fill_value: int = 1,
        enforce_single_location: bool = False,
    ) -> None:
        self.mask_field_name = mask_field_name
        self.locations_field_name = locations_field_name
        self.mask_off_value = mask_off_value
        self.mask_fill_value = mask_fill_value
        self.enforce_single_location = enforce_single_location
        super().__init__(
            input_fields=(mask_field_name,),
            output_fields=(locations_field_name,),
        )

    def _locs(self) -> Column:
        mask = F.col(self.mask_field_name)
        size = F.size(mask)
        positions = F.when(size > 0, F.sequence(F.lit(0), size - 1)).otherwise(
            F.array().cast("array<integer>")
        )
        return F.filter(
            positions,
            lambda i: F.element_at(mask, i + 1) == F.lit(self.mask_fill_value),
        ).cast("array<bigint>")

    def apply(self, df: DataFrame) -> DataFrame:
        locs = self._locs()
        if self.enforce_single_location:
            guard = F.assert_true(
                F.size(locs) == 1,
                F.concat(
                    F.lit(
                        "Expected exactly one location for mask field "
                        f"'{self.mask_field_name}' but got "
                    ),
                    F.size(locs).cast("string"),
                ),
            )
            value = F.when(guard.isNull(), F.element_at(locs, 1))
        else:
            value = locs
        return df.withColumn(self.locations_field_name, value)


class MaskToRangeMapper(MaskToIndicesMapper):
    """Mask -> consecutive ``[start, end)`` ranges (reference
    masks.py:146-178, numpy diff/split).

    Native formulation: run starts are fill-positions whose predecessor
    is not fill; run ends are fill-positions whose successor is not fill;
    zip them into pairs.
    """

    def apply(self, df: DataFrame) -> DataFrame:
        mask = F.col(self.mask_field_name)
        size = F.size(mask)
        positions = F.when(size > 0, F.sequence(F.lit(0), size - 1)).otherwise(
            F.array().cast("array<integer>")
        )
        fill = F.lit(self.mask_fill_value)

        def is_fill(i: Column) -> Column:
            return F.element_at(mask, i + 1) == fill

        starts = F.filter(
            positions,
            lambda i: is_fill(i)
            & ((i == 0) | (F.element_at(mask, i) != fill)),
        )
        ends = F.filter(
            positions,
            lambda i: is_fill(i)
            & ((i == size - 1) | (F.element_at(mask, i + 2) != fill)),
        )
        ranges = F.zip_with(
            starts,
            ends,
            lambda s, e: F.array(s.cast("bigint"), (e + 1).cast("bigint")),
        )
        if self.enforce_single_location:
            guard = F.assert_true(
                F.size(ranges) == 1,
                F.concat(
                    F.lit(
                        "Expected exactly one location for mask field "
                        f"'{self.mask_field_name}' but got "
                    ),
                    F.size(ranges).cast("string"),
                ),
            )
            value = F.when(guard.isNull(), F.element_at(ranges, 1))
        else:
            value = ranges
        return df.withColumn(self.locations_field_name, value)
