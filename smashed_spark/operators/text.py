"""Text mappers (reference: src/smashed/mappers/text.py +
utils/wordsplitter.py).

The reference's word splitters wrap HF ``tokenizers`` pre-tokenizers;
their semantics are regular languages, so here they compile to native
``regexp_extract_all`` / ``split`` expressions — JVM-side, no Python:

* ``ws``    — split on whitespace runs (HF ``WhitespaceSplit``)
* ``plus``  — word/punctuation boundaries, pattern ``\\w+|[^\\w\\s]+``
              (HF ``Whitespace``)
* ``trail`` — like ``plus`` but each token keeps its trailing whitespace
              (reference wordsplitter.py:81-96)
* ``blingfire`` — requires the blingfire native lib; unavailable here,
  raises ImportError at construction (import-gated per environment).

``FtfyMapper`` needs the ``ftfy`` library (pandas_udf path; raises at
construction when missing).
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..core.mapper import SparkMapper

_WS = r"\s+"
_PLUS = r"\w+|[^\w\s]+"
_TRAIL = r"(?:\w+|[^\w\s]+)\s*"
# blingfire-like Unicode word segmentation: letter runs (with marks,
# digits and inner apostrophes), digit runs, and each remaining
# non-space symbol as its own token.  An APPROXIMATION of the
# reference's blingfire backend (the lib is absent here and its exact
# model is not replicable), for users who need Unicode-aware
# splitting beyond \w (which is ASCII-ish for this purpose).
_UNICODE = (
    r"[\p{L}\p{M}][\p{L}\p{M}\p{Nd}'’]*"
    r"|\p{Nd}+"
    r"|[^\p{L}\p{M}\p{Nd}\s]"
)


class TextToWordsMapper(SparkMapper):
    """Split text field(s) into word lists (reference text.py:67-93)."""

    def __init__(
        self,
        fields: Union[str, Sequence[str]],
        splitter: str = "plus",
    ) -> None:
        if splitter == "blingfire":
            raise ImportError(
                "blingfire is not available in this environment; "
                "use splitter='unicode' (a blingfire-like Unicode "
                "segmentation) or 'ws'|'plus'|'trail'"
            )
        if splitter not in ("ws", "plus", "trail", "unicode"):
            raise ValueError(f"Unknown splitter: {splitter}")
        self.fields = [fields] if isinstance(fields, str) else list(fields)
        self.splitter = splitter
        super().__init__(input_fields=self.fields, output_fields=self.fields)

    def _split(self, col: Column) -> Column:
        if self.splitter == "ws":
            # WhitespaceSplit: tokens are maximal non-ws runs; drop empties
            return F.filter(F.split(col, _WS), lambda t: t != "")
        pattern = {
            "plus": _PLUS,
            "trail": _TRAIL,
            "unicode": _UNICODE,
        }[self.splitter]
        return F.regexp_extract_all(col, F.lit(pattern), 0)

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field in self.fields:
            dtype = df.schema[field].dataType
            col = F.col(field)
            if isinstance(dtype, ArrayType):
                out[field] = F.transform(col, self._split)
            else:
                out[field] = self._split(col)
        return df.withColumns(out)


class WordsToTextMapper(SparkMapper):
    """Join word list(s) with ``joiner`` (reference text.py:96-114);
    nested lists join element-wise."""

    def __init__(
        self, fields: Union[str, Sequence[str]], joiner: str = " "
    ) -> None:
        self.fields = [fields] if isinstance(fields, str) else list(fields)
        self.joiner = joiner
        super().__init__(input_fields=self.fields, output_fields=self.fields)

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field in self.fields:
            dtype = df.schema[field].dataType
            col = F.col(field)
            if isinstance(dtype, ArrayType) and isinstance(
                dtype.elementType, ArrayType
            ):
                out[field] = F.transform(
                    col, lambda w: F.array_join(w, self.joiner)
                )
            else:
                out[field] = F.array_join(col, self.joiner)
        return df.withColumns(out)


class FtfyMapper(SparkMapper):
    """``ftfy.fix_text`` on text fields (reference text.py:16-64).
    Python-tier: Arrow-batched pandas UDF with the ftfy config built
    driver-side and shipped in the closure."""

    def __init__(
        self, input_fields: Union[str, List[str]], **ftfy_kwargs
    ) -> None:
        try:
            import ftfy  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "ftfy is not installed; FtfyMapper unavailable"
            ) from e
        self.fields = (
            [input_fields] if isinstance(input_fields, str) else list(input_fields)
        )
        self.ftfy_kwargs = dict(ftfy_kwargs)
        super().__init__(input_fields=self.fields, output_fields=self.fields)

    def apply(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        kwargs = self.ftfy_kwargs

        @pandas_udf(StringType())
        def fix(col: pd.Series) -> pd.Series:
            import ftfy

            config = ftfy.TextFixerConfig(**kwargs)
            return col.map(
                lambda t: ftfy.fix_text(t, config=config) if t is not None else None
            )

        return df.withColumns({f: fix(F.col(f)) for f in self.fields})
