"""Shape operators: flatten, unpack (explode), striders
(reference: src/smashed/mappers/shape.py).

These are the reference's signature N:M cardinality-changing moves
(SURVEY.md §2.6).  All are built on ``explode``/``posexplode`` +
higher-order array functions — narrow transformations with no shuffle,
so they scale linearly with partition count.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..core.mapper import SparkMapper


class FlattenMapper(SparkMapper):
    """Flatten arbitrarily-deep nested list fields to 1-D (reference
    shape.py:8-33: loops ``chain.from_iterable`` while the head is a
    list).  Depth is schema-static in Spark, so "while nested" becomes
    repeat-``F.flatten``-until-scalar-element at plan time."""

    def __init__(self, field: Union[str, Sequence[str]]) -> None:
        self.fields_to_flatten = [field] if isinstance(field, str) else list(field)
        super().__init__(
            input_fields=self.fields_to_flatten,
            output_fields=self.fields_to_flatten,
        )

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field in self.fields_to_flatten:
            dtype = df.schema[field].dataType
            col = F.col(field)
            while isinstance(dtype, ArrayType) and isinstance(
                dtype.elementType, ArrayType
            ):
                col = F.flatten(col)
                dtype = dtype.elementType
            out[field] = col
        return df.withColumns(out)


class UnpackingMapper(SparkMapper):
    """Explode parallel list-fields into one row per element (reference
    shape.py:36-173).  Non-unpacked fields are ``"drop"``-ped or
    ``"repeat"``-ed.

    Reference semantics detail: parallel fields are zipped, so the output
    cardinality per row is the MINIMUM of the unpacked fields' lengths
    (Python ``zip`` truncates) — hence an explicit index explode over
    ``least(sizes)`` rather than ``arrays_zip`` (which null-pads to the
    longest).
    """

    _DRP_EXTRA = "drop"
    _RPT_EXTRA = "repeat"

    def __init__(
        self,
        fields_to_unpack: Optional[Sequence[str]] = None,
        fields_to_ignore: Optional[Sequence[str]] = None,
        ignored_behavior: Optional[str] = None,
    ) -> None:
        if fields_to_unpack is not None and fields_to_ignore is not None:
            raise ValueError(
                "Must specify only one of `fields_to_unpack` or `fields_to_ignore`"
            )
        if (
            fields_to_unpack is not None or fields_to_ignore is not None
        ) and ignored_behavior not in {self._DRP_EXTRA, self._RPT_EXTRA}:
            raise ValueError(
                "When specifying `fields_to_unpack` or `fields_to_ignore`, "
                f"`ignored_behavior` must be one of {self._DRP_EXTRA} or "
                f"{self._RPT_EXTRA} but got {ignored_behavior} instead!"
            )
        self.fields_to_unpack = (
            list(dict.fromkeys(fields_to_unpack)) if fields_to_unpack else None
        )
        self.fields_to_ignore = (
            list(dict.fromkeys(fields_to_ignore)) if fields_to_ignore else None
        )
        self.ignore_behavior = ignored_behavior
        io_fields = (*(fields_to_unpack or []), *(fields_to_ignore or []))
        super().__init__(input_fields=io_fields, output_fields=())

    def _should_unpack(self, field_name: str) -> bool:
        if self.fields_to_unpack is not None:
            return field_name in self.fields_to_unpack
        if self.fields_to_ignore is not None:
            return field_name not in self.fields_to_ignore
        return True

    def apply(self, df: DataFrame) -> DataFrame:
        unpack = [c for c in df.columns if self._should_unpack(c)]
        if not unpack:
            raise ValueError("No fields to unpack!")
        others = [c for c in df.columns if c not in unpack]

        sizes = [F.size(F.col(c)) for c in unpack]
        n = sizes[0] if len(sizes) == 1 else F.least(*sizes)
        # guard: sequence(0, -1) would count DOWN; emit empty array instead
        idx_arr = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<integer>")
        )
        idx = "__unpack_idx__"
        exploded = df.withColumn(idx, F.explode(idx_arr))
        unpacked_cols = [
            F.element_at(F.col(c), F.col(idx) + 1).alias(c) for c in unpack
        ]
        if self.ignore_behavior == self._RPT_EXTRA:
            return exploded.select(*unpacked_cols, *others)
        return exploded.select(*unpacked_cols)


class SingleSequenceStriderMapper(SparkMapper):
    """Emit one row per window ``v[i:i+max_length]`` stepping ``stride``
    over the strided field(s); rows shorter than ``max_length`` pass
    through unchanged (reference shape.py:176-247).

    Deliberate deviation: the reference's ``_transform_single`` with
    ``keep_last=True`` yields a short row TWICE (the ``seq_len <
    max_length`` branch yields the sample, then ``range(0, seq_len+1,
    stride)`` still yields a whole-array window), and also emits a
    trailing *empty* window whenever ``seq_len`` is a multiple of
    ``stride``.  Both are artifacts of a missing early-return
    (reference shape.py:221-237), not useful semantics; this mapper
    emits each short row once and no empty windows.

    Spark plan: ``posexplode`` of the start-offset sequence, then
    ``F.slice`` per strided field — non-strided fields duplicate
    automatically.  Narrow op; output row count grows by the window
    factor but never shuffles.
    """

    def __init__(
        self,
        field_to_stride: Union[str, Sequence[str]],
        max_length: int,
        stride: Optional[int] = None,
        keep_last: bool = False,
    ) -> None:
        self.fields_to_stride = (
            [field_to_stride]
            if isinstance(field_to_stride, str)
            else list(dict.fromkeys(field_to_stride))
        )
        self.max_length = max_length
        self.keep_last = keep_last
        self.stride = stride or max_length
        super().__init__(
            input_fields=self.fields_to_stride,
            output_fields=self.fields_to_stride,
        )

    @property
    def ref_field(self) -> str:
        return self.fields_to_stride[0]

    _POS = "__stride_pos__"
    _START = "__stride_start__"

    def _exploded(self, df: DataFrame) -> DataFrame:
        seq_len = F.size(F.col(self.ref_field))
        tail = 0 if self.keep_last else self.max_length
        # short rows pass through as a single whole-array window
        starts = F.when(
            seq_len < F.lit(self.max_length), F.array(F.lit(0))
        ).otherwise(
            F.sequence(F.lit(0), seq_len - F.lit(tail), F.lit(self.stride))
        )
        return df.select(
            "*", F.posexplode(starts).alias(self._POS, self._START)
        )

    def apply(self, df: DataFrame) -> DataFrame:
        cols = df.columns
        exploded = self._exploded(df)
        out_cols = [
            F.slice(
                F.col(c), F.col(self._START) + 1, F.lit(self.max_length)
            ).alias(c)
            if c in self.fields_to_stride
            else F.col(c)
            for c in cols
        ]
        return exploded.select(*out_cols)


class SingleSequenceStriderMapperWithLocations(SingleSequenceStriderMapper):
    """Strider that tracks whether each window overlaps any ``[start,
    end)`` span in ``field_with_locations``; windows with no overlap get
    their fields substituted from ``fields_replacement_map`` (reference
    shape.py:250-294).

    The reference accumulates ``cum_len`` as the sum of emitted window
    lengths; with its fixed ``keep_last=False`` every window before the
    check is exactly ``max_length`` long (or the row passes through
    whole), so ``cum_len == window_index * max_length``.
    """

    def __init__(
        self,
        field_to_stride: Union[str, Sequence[str]],
        max_length: int,
        field_with_locations: str,
        fields_replacement_map: Optional[Dict[str, Any]] = None,
        stride: Optional[int] = None,
    ) -> None:
        super().__init__(
            field_to_stride=field_to_stride,
            max_length=max_length,
            stride=stride,
        )
        self.field_with_locations = field_with_locations
        self.fields_replacement_map = dict(fields_replacement_map or {})
        self.input_fields += (field_with_locations, *self.fields_replacement_map)

    _INLOC = "__in_locations__"

    def apply(self, df: DataFrame) -> DataFrame:
        cols = df.columns
        exploded = self._exploded(df)

        window = F.slice(
            F.col(self.ref_field), F.col(self._START) + 1, F.lit(self.max_length)
        )
        cum_len = F.col(self._POS) * F.lit(self.max_length)
        end_stride = cum_len + F.size(window)

        def overlaps(loc: Column) -> Column:
            start, end = loc.getItem(0), loc.getItem(1)
            return ((cum_len <= start) & (start < end_stride)) | (
                (cum_len < end) & (end <= end_stride)
            )

        # materialize the flag BEFORE the select that overwrites the
        # strided column: inside that select, Spark's lateral column
        # alias resolution would bind ref_field to the freshly sliced
        # window, silently double-slicing end_stride's size() input
        exploded = exploded.withColumn(
            self._INLOC,
            F.exists(F.col(self.field_with_locations), overlaps),
        )
        in_locations = F.col(self._INLOC)

        out_cols = []
        for c in cols:
            col: Column = F.col(c)
            if c in self.fields_to_stride:
                col = F.slice(
                    col, F.col(self._START) + 1, F.lit(self.max_length)
                )
            if c in self.fields_replacement_map:
                col = F.when(in_locations, col).otherwise(
                    F.lit(self.fields_replacement_map[c])
                )
            out_cols.append(col.alias(c))
        return exploded.select(*out_cols)
