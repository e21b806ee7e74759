"""Tokenization-adjacent per-row mappers that need no external model:
unicode filtering, padding, truncation (reference:
src/smashed/mappers/tokenize.py:230-342).

The HF-tokenizer-backed ``TokenizerMapper`` lives in
``python_tier.py`` (pandas_udf path); these three are pure Column
expressions except ``ValidUnicodeMapper`` (needs ``unicodedata``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ..core.mapper import SparkMapper


class ValidUnicodeMapper(SparkMapper):
    """Replace tokens composed entirely of the given unicode categories
    with ``replace_token`` (reference tokenize.py:232-271).

    No native unicode-category function exists in Spark SQL, so this is
    an Arrow-batched pandas UDF (the sanctioned Python-tier escape
    hatch; still vectorized transfer, no per-row py4j).
    """

    def __init__(
        self,
        input_fields: List[str],
        unicode_categories: List[str],
        replace_token: str,
    ) -> None:
        self.unicode_categories = list(unicode_categories)
        self.replace_token = replace_token
        super().__init__(input_fields=input_fields, output_fields=input_fields)

    def apply(self, df: DataFrame) -> DataFrame:
        cats = set(self.unicode_categories)
        replace = self.replace_token

        @pandas_udf(ArrayType(StringType()))
        def fix(col: pd.Series) -> pd.Series:
            import unicodedata

            def one(tokens):
                if tokens is None:
                    return None
                return [
                    replace
                    if all(unicodedata.category(ch) in cats for ch in tok)
                    else tok
                    for tok in tokens
                ]

            return col.apply(one)

        return df.withColumns({f: fix(F.col(f)) for f in self.input_fields})


class PaddingMapper(SparkMapper):
    """Pad list fields to ``pad_to_length`` with ``pad_value``; error if
    any sequence is longer (reference tokenize.py:274-331)."""

    def __init__(
        self,
        pad_to_length: int,
        pad_value: Any,
        fields_to_pad: Optional[List[str]] = None,
    ) -> None:
        self.pad_to_length = pad_to_length
        self.pad_value = pad_value
        self.fields_to_pad = list(fields_to_pad) if fields_to_pad else None
        super().__init__(input_fields=self.fields_to_pad or ())

    def apply(self, df: DataFrame) -> DataFrame:
        fields = (
            self.fields_to_pad
            if self.fields_to_pad is not None
            else [
                f.name
                for f in df.schema.fields
                if isinstance(f.dataType, ArrayType)
            ]
        )
        out = {}
        for f in fields:
            col = F.col(f)
            size = F.size(col)
            n = F.lit(self.pad_to_length)
            guard = F.assert_true(
                size <= n,
                F.concat(
                    F.lit(
                        "PaddingMapper expects every input sequence to be "
                        "less than or equal to the `pad_to_length`: "
                    ),
                    size.cast("string"),
                    F.lit(f" > {self.pad_to_length}"),
                ),
            )
            padded = F.concat(
                col, F.array_repeat(F.lit(self.pad_value), n - size)
            )
            out[f] = F.when(guard.isNull(), padded)
        return df.withColumns(out)


class TruncateSingleFieldMapper(SparkMapper):
    """``data[k][:v]`` per field (reference tokenize.py:334-342); works
    on arrays (``F.slice``) and strings (``F.substring``)."""

    def __init__(self, fields_to_truncate: Dict[str, int]) -> None:
        self.fields_to_truncate = dict(fields_to_truncate)
        super().__init__(
            input_fields=list(fields_to_truncate),
            output_fields=list(fields_to_truncate),
        )

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field, n in self.fields_to_truncate.items():
            dtype = df.schema[field].dataType
            if isinstance(dtype, ArrayType):
                out[field] = F.slice(F.col(field), 1, n)
            else:
                out[field] = F.substring(F.col(field), 1, n)
        return df.withColumns(out)
