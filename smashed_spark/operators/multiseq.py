"""Multi-sequence operators: special-token padding, label masking,
greedy sequence packing (reference: src/smashed/mappers/multiseq.py).

All operators here work on a column holding a *list of sequences*
(``array<array<T>>``) within each row.  Everything is higher-order
Column expressions — per-row, narrow, no shuffle — except nothing:
even the greedy bin-packing scan is an ``F.aggregate`` fold.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper


def find_special_token_ids(tokenizer) -> Tuple[List[int], List[int], List[int]]:
    """Probe a HF tokenizer for BOS/SEP/EOS id-lists by tokenizing two
    sentinel int subclasses and splitting the result (the trick at
    reference multiseq.py:50-89)."""

    class _First(int):
        pass

    class _Second(int):
        pass

    input_ids = tokenizer.build_inputs_with_special_tokens([_First()], [_Second()])
    bos: List[int] = []
    sep: List[int] = []
    eos: List[int] = []
    bucket = bos
    for token in input_ids:
        if isinstance(token, _First):
            bucket = sep
        elif isinstance(token, _Second):
            bucket = eos
        else:
            bucket.append(int(token))
    return bos, sep, eos


class TokensSequencesPaddingMapper(SparkMapper):
    """Insert BOS/SEP/EOS id-lists between the sequences of a
    list-of-sequences field (reference multiseq.py:27-103): the first
    sequence gets BOS prepended, the last gets EOS appended, every
    non-last gets SEP appended.

    Special ids come either from explicit ``bos``/``sep``/``eos`` lists
    or probed from a HF ``tokenizer`` (reference's sentinel-int trick).
    """

    def __init__(
        self,
        tokenizer=None,
        input_field: str = "input_ids",
        bos: Optional[Sequence[int]] = None,
        sep: Optional[Sequence[int]] = None,
        eos: Optional[Sequence[int]] = None,
    ) -> None:
        if tokenizer is not None:
            b, s, e = find_special_token_ids(tokenizer)
            bos, sep, eos = bos or b, sep or s, eos or e
        if bos is None or sep is None or eos is None:
            raise ValueError(
                "Provide either a tokenizer or explicit bos/sep/eos id lists"
            )
        self.input_field = input_field
        self.bos = list(bos)
        self.sep = list(sep)
        self.eos = list(eos)
        super().__init__(input_fields=[input_field], output_fields=[input_field])

    def _edges(self) -> Tuple[Column, Column, Column]:
        """(prefix for i==0, suffix for last, suffix for non-last)."""
        empty = F.array().cast("array<bigint>")
        lit_arr = lambda xs: (  # noqa: E731
            F.array(*[F.lit(x) for x in xs]).cast("array<bigint>") if xs else empty
        )
        return lit_arr(self.bos), lit_arr(self.eos), lit_arr(self.sep)

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.input_field)
        n = F.size(col)
        bos, eos, sep = self._edges()
        empty = F.array().cast("array<bigint>")
        padded = F.transform(
            col,
            lambda seq, i: F.concat(
                F.when(i == 0, bos).otherwise(empty),
                seq.cast("array<bigint>"),
                F.when(i == n - 1, eos).otherwise(sep),
            ),
        )
        return df.withColumn(self.input_field, padded)


class AttentionMaskSequencePaddingMapper(TokensSequencesPaddingMapper):
    """Same, but pads with 1s (reference multiseq.py:106-125)."""

    def __init__(
        self,
        tokenizer=None,
        input_field: str = "attention_mask",
        bos: Optional[Sequence[int]] = None,
        sep: Optional[Sequence[int]] = None,
        eos: Optional[Sequence[int]] = None,
    ) -> None:
        super().__init__(
            tokenizer=tokenizer, input_field=input_field, bos=bos, sep=sep, eos=eos
        )
        self.bos = [1 for _ in self.bos]
        self.sep = [1 for _ in self.sep]
        self.eos = [1 for _ in self.eos]


class TokenTypeIdsSequencePaddingMapper(TokensSequencesPaddingMapper):
    """Same, but pads with each sequence's *first symbol* — and, per the
    reference (multiseq.py:128-169), separators go at the *start* of
    non-first sequences, EOS at the end of the last."""

    def __init__(
        self,
        tokenizer=None,
        input_field: str = "token_type_ids",
        bos: Optional[Sequence[int]] = None,
        sep: Optional[Sequence[int]] = None,
        eos: Optional[Sequence[int]] = None,
    ) -> None:
        super().__init__(
            tokenizer=tokenizer, input_field=input_field, bos=bos, sep=sep, eos=eos
        )

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.input_field)
        n = F.size(col)
        empty = F.array().cast("array<bigint>")

        def repeat_first(seq: Column, times: int) -> Column:
            first = F.coalesce(F.element_at(seq, 1), F.lit(0)).cast("bigint")
            return F.array_repeat(first, times) if times else empty

        padded = F.transform(
            col,
            lambda seq, i: F.concat(
                F.when(i == 0, repeat_first(seq, len(self.bos))).otherwise(
                    repeat_first(seq, len(self.sep))
                ),
                seq.cast("array<bigint>"),
                F.when(i == n - 1, repeat_first(seq, len(self.eos))).otherwise(
                    empty
                ),
            ),
        )
        return df.withColumn(self.input_field, padded)


class MakeAttentionMaskMapper(SparkMapper):
    """Mask of 1s shaped like a list-of-sequences field
    (reference multiseq.py:172-194)."""

    def __init__(
        self,
        input_field: str = "input_ids",
        output_field: str = "attention_mask",
    ) -> None:
        self.input_field = input_field
        self.output_field = output_field
        super().__init__(input_fields=[input_field], output_fields=[output_field])

    def apply(self, df: DataFrame) -> DataFrame:
        masks = F.transform(
            F.col(self.input_field),
            lambda seq: F.array_repeat(F.lit(1), F.size(seq)),
        )
        return df.withColumn(self.output_field, masks)


class LabelsMaskerMapper(SparkMapper):
    """Mask subsets of a labels sequence, multiplying rows (reference
    multiseq.py:197-295).

    * ``"all"`` — identity.
    * ``"one"`` — one output row per label position, all other positions
      masked to ``label_mask_id`` (``posexplode`` + indexed transform).
    * ``"sample"`` — partition the label positions into chunks of
      ``max(int(n*sample_prob), 1)`` in pseudo-random order and emit one
      row per chunk.  The reference uses *unseeded* ``random.shuffle``
      (multiseq.py:280 — nondeterministic); this rebuild derives the
      permutation from ``xxhash64(labels, position, seed)`` so results
      are reproducible and oracle-testable (SURVEY.md §7 risk 4).
    """

    def __init__(
        self,
        labels_field: str = "labels",
        strategy: str = "all",
        sample_prob: Optional[float] = None,
        label_mask_id: int = -100,
        seed: int = 42,
    ) -> None:
        if strategy not in ("all", "one", "sample"):
            raise ValueError(f"Unknown strategy {strategy}")
        if strategy == "sample" and sample_prob is None:
            raise ValueError("no `sample_prob` provided for `sample` strategy")
        if strategy == "one" and sample_prob is not None:
            raise ValueError("Do not provide `sample_prob` for `one` strategy")
        self.labels_field = labels_field
        self.strategy = strategy
        self.sample_prob = sample_prob or 0.0
        self.label_mask_id = label_mask_id
        self.seed = seed
        super().__init__(input_fields=[labels_field], output_fields=[labels_field])

    def apply(self, df: DataFrame) -> DataFrame:
        if self.strategy == "all":
            return df
        labels = F.col(self.labels_field)
        mask_id = F.lit(self.label_mask_id)
        others = [c for c in df.columns if c != self.labels_field]

        if self.strategy == "one":
            exploded = df.select(
                "*", F.posexplode(labels).alias("__keep_pos__", "__keep_val__")
            )
            new_labels = F.transform(
                labels,
                lambda l, j: F.when(j == F.col("__keep_pos__"), l).otherwise(
                    mask_id
                ),
            )
            return exploded.select(
                *[F.col(c) for c in others],
                new_labels.alias(self.labels_field),
            ).select(*df.columns)

        # strategy == "sample"
        n = F.size(labels)
        slice_size = F.greatest(
            F.floor(n * F.lit(self.sample_prob)).cast("int"), F.lit(1)
        )
        positions = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<integer>")
        )
        # deterministic pseudo-shuffle: sort positions by a content hash
        perm = F.transform(
            F.array_sort(
                F.transform(
                    positions,
                    lambda p: F.struct(
                        F.xxhash64(labels, p, F.lit(self.seed)).alias("h"),
                        p.alias("p"),
                    ),
                )
            ),
            lambda s: s.getField("p"),
        )
        n_chunks = F.ceil(n / slice_size).cast("int")
        chunk_idx = F.when(
            n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
        ).otherwise(F.array().cast("array<integer>"))
        exploded = df.select("*", F.explode(chunk_idx).alias("__chunk__"))
        active = F.slice(perm, F.col("__chunk__") * slice_size + 1, slice_size)
        new_labels = F.transform(
            labels,
            lambda l, i: F.when(F.array_contains(active, i), l).otherwise(mask_id),
        )
        return exploded.select(
            *[F.col(c) for c in others], new_labels.alias(self.labels_field)
        ).select(*df.columns)


class MultiSequenceStriderMapper(SparkMapper):
    """Greedy bin-packing of consecutive sequences (reference
    multiseq.py:298-449): pack sequences into one output row until
    ``max_stride_count`` sequences or ``max_length`` cumulative tokens
    (+ ``extra_length_per_seq`` headroom) would be exceeded.

    The sequential scan is an ``F.aggregate`` fold over the sequence
    positions producing each position's *group start*; group boundaries
    then explode into one row per packed window.  Per-row computation,
    no shuffle, JVM-side.
    """

    def __init__(
        self,
        max_stride_count: int,
        length_reference_field: str,
        fields_to_stride: Optional[List[str]] = None,
        max_length: Optional[int] = None,
        extra_length_per_seq: Optional[int] = None,
        tokenizer=None,
    ) -> None:
        self.max_stride_count = max_stride_count
        self.length_reference_field = length_reference_field
        self.fields_to_stride = list(fields_to_stride) if fields_to_stride else None
        self.max_length = max_length
        if extra_length_per_seq is None:
            if tokenizer is not None:
                bos, sep, eos = find_special_token_ids(tokenizer)
                extra_length_per_seq = 2 * max(len(bos), len(sep), len(eos))
            else:
                extra_length_per_seq = 0
        self.extra_length_per_seq = extra_length_per_seq
        super().__init__(
            input_fields=[length_reference_field],
            output_fields=[length_reference_field],
        )

    def _should_stride(self, field: str) -> bool:
        return self.fields_to_stride is None or field in self.fields_to_stride

    def apply(self, df: DataFrame) -> DataFrame:
        ref = F.col(self.length_reference_field)
        n = F.size(ref)
        extra = F.lit(self.extra_length_per_seq)
        max_len = F.lit(
            self.max_length if self.max_length is not None else (1 << 62)
        ).cast("bigint")
        max_cnt = F.lit(self.max_stride_count)

        lengths = F.transform(ref, lambda s: F.size(s).cast("bigint") + extra)
        if self.max_length is not None:
            guard = F.assert_true(
                F.forall(lengths, lambda l: l <= max_len),
                F.lit(
                    "Current sequence is longer than the maximum stride "
                    f"length (max_length={self.max_length})"
                ),
            )
            lengths = F.when(guard.isNull(), lengths)

        positions = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<integer>")
        )
        # fold: acc = struct(start of current group, cumulative length,
        # group-start per position so far)
        init = F.struct(
            F.lit(0).alias("start"),
            F.lit(0).cast("bigint").alias("cum"),
            F.array().cast("array<integer>").alias("starts"),
        )

        def step(acc: Column, pos: Column) -> Column:
            cur = F.element_at(lengths, pos + 1)
            too_long = (acc.getField("cum") + cur) > max_len
            too_many = (pos - acc.getField("start")) >= max_cnt
            brk = too_long | too_many
            new_start = F.when(brk, pos).otherwise(acc.getField("start"))
            new_cum = F.when(brk, cur).otherwise(acc.getField("cum") + cur)
            return F.struct(
                new_start.alias("start"),
                new_cum.alias("cum"),
                F.concat(
                    acc.getField("starts"), F.array(new_start)
                ).alias("starts"),
            )

        group_starts = F.aggregate(
            positions, init, step, lambda acc: acc.getField("starts")
        )
        # distinct group starts in order; each window is [start, next_start)
        starts = F.array_distinct(group_starts)
        bounds = F.zip_with(
            starts,
            F.concat(F.slice(starts, 2, F.greatest(F.size(starts) - 1, F.lit(0))),
                     F.array(n.cast("integer"))),
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        )
        # an empty reference array has no group starts; without a guard
        # zip_with null-pads against [n] and the row would come out with
        # null strided fields — the reference instead passes the row
        # through with its empty lists (multiseq.py batch loop), i.e.
        # one (0, 0) window
        bounds = F.when(n > 0, bounds).otherwise(
            F.array(
                F.struct(
                    F.lit(0).cast("integer").alias("s"),
                    F.lit(0).cast("integer").alias("e"),
                )
            )
        )
        exploded = df.select("*", F.explode(bounds).alias("__win__"))
        s = F.col("__win__").getField("s")
        e = F.col("__win__").getField("e")
        out_cols = []
        for c in df.columns:
            col = F.col(c)
            if self._should_stride(c):
                col = F.slice(col, s + 1, e - s)
            out_cols.append(col.alias(c))
        return exploded.select(*out_cols)


class SingleValueToSequenceMapper(SparkMapper):
    """Scalar label list -> per-sequence label sequences
    (reference multiseq.py:452-516): strategies ``first``/``last``/``all``."""

    def __init__(
        self,
        single_value_field: str,
        like_field: str = "input_ids",
        strategy: str = "first",
        padding_id: Any = -100,
    ) -> None:
        if strategy not in ("first", "last", "all"):
            raise ValueError(f"Strategy {strategy} is not supported")
        self.labels_field_name = single_value_field
        self.like_field_name = like_field
        self.strategy = strategy
        self.padding_id = padding_id
        super().__init__(
            input_fields=(single_value_field, like_field),
            output_fields=(single_value_field, like_field),
        )

    def apply(self, df: DataFrame) -> DataFrame:
        pad = F.lit(self.padding_id)

        def make_seq(label: Column, seq: Column) -> Column:
            size = F.size(seq)
            if self.strategy == "first":
                return F.concat(
                    F.array(label), F.array_repeat(pad, size - 1)
                )
            if self.strategy == "last":
                return F.concat(
                    F.array_repeat(pad, size - 1), F.array(label)
                )
            return F.array_repeat(label, size)

        out = F.zip_with(
            F.col(self.labels_field_name), F.col(self.like_field_name), make_seq
        )
        return df.withColumn(self.labels_field_name, out)


class SequencesConcatenateMapper(SparkMapper):
    """Flatten list-of-sequences -> single sequence (reference
    multiseq.py:519-547); ``concat_fields=None`` means every
    array-of-array column."""

    def __init__(self, concat_fields: Optional[List[str]] = None) -> None:
        self.concat_fields = list(concat_fields) if concat_fields else None
        super().__init__(input_fields=self.concat_fields or ())

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import ArrayType

        out = {}
        for f in df.schema.fields:
            if self.concat_fields is None:
                eligible = isinstance(f.dataType, ArrayType) and isinstance(
                    f.dataType.elementType, ArrayType
                )
            else:
                eligible = f.name in self.concat_fields
            if eligible:
                out[f.name] = F.flatten(F.col(f.name))
        return df.withColumns(out)
