"""Collators: pad ragged nested lists to rectangular shape (reference:
src/smashed/mappers/collators.py:318-482).

In the reference, a collator runs after batching, so each row holds a
*batch*: fields are lists of (lists of) sequences.  Padding is per-row
and cross-element within the row — pure higher-order array expressions,
depth 2 and 3 handled natively (the reference's recursive
``_pad_recursive``, collators.py:350-421, generalizes to any depth; the
reference test surface and HF usage never exceed 3).

``TensorCollatorMapper`` (torch tensors, reference collators.py:162-296)
is a client-edge concern: tensors only exist after ``collect()``.  It is
provided for API parity and requires torch at construction.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..core.mapper import SparkMapper


class BaseCollator(SparkMapper):
    """Shared config (reference collators.py:41-105)."""

    def __init__(
        self,
        pad_to_length: Optional[Union[int, Sequence[int]]] = None,
        pad_to_multiple_of: Optional[int] = None,
        fields_pad_ids: Optional[Mapping[str, Union[int, float]]] = None,
        unk_fields_pad_id: Optional[int] = None,
        left_pad_fields: Optional[Sequence[str]] = None,
    ) -> None:
        self.fields_pad_ids = dict(fields_pad_ids or {})
        self.pad_to_length = pad_to_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.unk_fields_pad_id = unk_fields_pad_id
        self.left_pad_fields = list(left_pad_fields or [])
        super().__init__()

    def _get_padding_value(self, field_name: str) -> Union[int, float]:
        if field_name in self.fields_pad_ids:
            return self.fields_pad_ids[field_name]
        if self.unk_fields_pad_id is not None:
            return self.unk_fields_pad_id
        raise ValueError(
            f"Must specify a padding value for field {field_name} "
            "or provide a unk_fields_pad_id attribute to the mapper "
            "to handle unrecognized fields"
        )


def _round_up(dim: Column, multiple: Optional[int]) -> Column:
    if multiple is None:
        return dim
    m = F.lit(multiple)
    return (F.ceil(dim / m) * m).cast("int")


class ListCollatorMapper(BaseCollator):
    """Rectangularize ragged nested list fields (reference
    collators.py:318-475): pad to the longest element (default), to a
    fixed ``pad_to_length`` (error if longer), or to the next
    ``pad_to_multiple_of``; right-pad by default, ``left_pad_fields``
    pad from the left."""

    def _pad_depth2(
        self, col: Column, pad: Column, pad_right: bool
    ) -> Column:
        inner_max = F.coalesce(
            F.array_max(F.transform(col, F.size)), F.lit(0)
        )
        if self.pad_to_multiple_of is not None:
            target = _round_up(inner_max, self.pad_to_multiple_of)
        elif self.pad_to_length is not None:
            n = F.lit(int(self.pad_to_length))
            guard = F.assert_true(
                inner_max <= n,
                F.lit(
                    "ListCollatorMapper expects every input sequence to be "
                    f"shorter than pad_to_length={self.pad_to_length}"
                ),
            )
            target = F.when(guard.isNull(), n)
        else:
            target = inner_max

        def pad_seq(s: Column) -> Column:
            filler = F.array_repeat(pad, target - F.size(s))
            return (
                F.concat(s, filler) if pad_right else F.concat(filler, s)
            )

        return F.transform(col, pad_seq)

    def _pad_depth3(
        self, col: Column, pad: Column, pad_right: bool
    ) -> Column:
        # shape dims: (outer, max subseq count, max token len)
        dim2 = F.coalesce(F.array_max(F.transform(col, F.size)), F.lit(0))
        dim3 = F.coalesce(
            F.array_max(
                F.flatten(
                    F.transform(col, lambda s: F.transform(s, F.size))
                )
            ),
            F.lit(0),
        )
        if self.pad_to_multiple_of is not None:
            dim2 = _round_up(dim2, self.pad_to_multiple_of)
            dim3 = _round_up(dim3, self.pad_to_multiple_of)
        elif self.pad_to_length is not None:
            n = F.lit(int(self.pad_to_length))
            guard = F.assert_true(
                (dim2 <= n) & (dim3 <= n),
                F.lit(
                    "ListCollatorMapper expects every input sequence to be "
                    f"shorter than pad_to_length={self.pad_to_length}"
                ),
            )
            dim2 = F.when(guard.isNull(), n)
            dim3 = n

        empty_inner = F.array().cast("array<bigint>")

        def pad_inner(s: Column) -> Column:
            filler = F.array_repeat(pad, dim3 - F.size(s))
            return (
                F.concat(s.cast("array<bigint>"), filler)
                if pad_right
                else F.concat(filler, s.cast("array<bigint>"))
            )

        def pad_mid(sub: Column) -> Column:
            missing = F.transform(
                F.array_repeat(F.lit(0), dim2 - F.size(sub)),
                lambda _: empty_inner,
            )
            grown = (
                F.concat(sub, missing) if pad_right else F.concat(missing, sub)
            )
            return F.transform(grown, pad_inner)

        return F.transform(col, pad_mid)

    def apply(self, df: DataFrame) -> DataFrame:
        out = {}
        for field in df.schema.fields:
            dtype = field.dataType
            if not isinstance(dtype, ArrayType):
                continue
            if not isinstance(dtype.elementType, ArrayType):
                continue  # depth 1: nothing to rectangularize
            pad = F.lit(self._get_padding_value(field.name))
            pad_right = field.name not in self.left_pad_fields
            col = F.col(field.name)
            if isinstance(dtype.elementType.elementType, ArrayType):
                out[field.name] = self._pad_depth3(col, pad, pad_right)
            else:
                out[field.name] = self._pad_depth2(col, pad, pad_right)
        return df.withColumns(out)


# pad ids a HF-style tokenizer implies for its standard output fields
# (reference FromTokenizerMixIn, collators.py:113-160)
def _tokenizer_pad_ids(tokenizer) -> dict:
    return {
        "input_ids": getattr(tokenizer, "pad_token_id", None) or 0,
        "attention_mask": 0,
        "token_type_ids": getattr(tokenizer, "pad_token_type_id", None) or 0,
        "overflow_to_sample_mapping": 0,
        "special_tokens_mask": 0,
        "offset_mapping": 0,
        "length": 0,
    }


class FromTokenizerListCollatorMapper(ListCollatorMapper):
    """ListCollator pre-seeded with pad ids from a tokenizer
    (reference collators.py:478-482)."""

    def __init__(
        self,
        tokenizer,
        pad_to_length: Optional[Union[int, Sequence[int]]] = None,
        pad_to_multiple_of: Optional[int] = None,
        fields_pad_ids: Optional[Mapping[str, int]] = None,
        unk_fields_pad_id: Optional[int] = None,
    ) -> None:
        merged = {**_tokenizer_pad_ids(tokenizer), **(fields_pad_ids or {})}
        super().__init__(
            pad_to_length=pad_to_length,
            pad_to_multiple_of=pad_to_multiple_of,
            fields_pad_ids=merged,
            unk_fields_pad_id=unk_fields_pad_id,
        )


def _shape_of(x) -> list:
    """Max dimension sizes of a ragged nested list, per depth."""
    if not isinstance(x, (list, tuple)):
        return []
    dims = [len(x)]
    inner = [_shape_of(e) for e in x]
    depth = max((len(s) for s in inner), default=0)
    for d in range(depth):
        dims.append(max((s[d] for s in inner if len(s) > d), default=0))
    return dims


def _filled(dims: list, pad):
    if not dims:
        return pad
    return [_filled(dims[1:], pad) for _ in range(dims[0])]


def _pad_nested(x, dims: list, pad, left: bool):
    if not dims:
        return x
    items = (
        [_pad_nested(e, dims[1:], pad, left) for e in x]
        if dims[1:]
        else list(x)
    )
    fill = _filled(dims[1:], pad) if dims[1:] else pad
    pads = [fill] * (dims[0] - len(items))
    return pads + items if left else items + pads


def pad_batch(
    seqs: Sequence,
    pad: Union[int, float],
    pad_to_length: Optional[Union[int, Sequence[int]]] = None,
    pad_to_multiple_of: Optional[int] = None,
    left: bool = False,
) -> list:
    """Rectangularize one batch of (arbitrarily nested) ragged
    sequences: every ragged dimension pads to the batch max — or to
    ``pad_to_length`` / the next ``pad_to_multiple_of`` — right-padded
    unless ``left`` (reference collators.py:162-296 semantics, shared
    by the tensor collator's stack step)."""
    py = [s.tolist() if hasattr(s, "tolist") else s for s in seqs]
    dims: list = []
    for s in py:
        sh = _shape_of(s)
        dims = [
            max(a, b)
            for a, b in zip(
                dims + [0] * (len(sh) - len(dims)),
                sh + [0] * (len(dims) - len(sh)),
            )
        ]
    if pad_to_length is not None:
        want = (
            [pad_to_length] * len(dims)
            if isinstance(pad_to_length, int)
            else list(pad_to_length)
        )
        for i, w in enumerate(want[: len(dims)]):
            if dims[i] > w:
                raise ValueError(
                    f"sequence dim {i} is {dims[i]} > pad_to_length {w}"
                )
            dims[i] = w
    if pad_to_multiple_of:
        m = pad_to_multiple_of
        dims = [int(math.ceil(d / m) * m) for d in dims]
    return [_pad_nested(s, dims, pad, left) for s in py]


class TensorCollatorMapper(BaseCollator):
    """Tensor collation (reference collators.py:162-296) is client-edge:
    torch tensors exist only after ``collect()``/``toPandas()``.  The
    padding math is real (:meth:`collate` pads and stacks one batch into
    tensors, matching the reference's test goldens); only the *in-plan*
    ``apply`` is refused — inside Spark plans use ListCollatorMapper."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "torch is not installed; TensorCollatorMapper unavailable — "
                "use ListCollatorMapper and convert at the client edge"
            ) from e
        super().__init__(*args, **kwargs)

    def collate(self, batch: Mapping[str, Sequence]) -> dict:
        """Pad + stack one collected batch: ``{field: [seq, ...]}`` ->
        ``{field: torch.Tensor}`` (reference collators.py:190-296)."""
        import torch

        out = {}
        for field, seqs in batch.items():
            out[field] = torch.tensor(
                pad_batch(
                    seqs,
                    self._get_padding_value(field),
                    pad_to_length=self.pad_to_length,
                    pad_to_multiple_of=self.pad_to_multiple_of,
                    left=field in self.left_pad_fields,
                )
            )
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "TensorCollatorMapper is a client-edge operation; "
            "use ListCollatorMapper inside Spark plans"
        )


class FromTokenizerTensorCollatorMapper(TensorCollatorMapper):
    """Tensor collator pre-seeded with tokenizer pad ids (reference
    collators.py:299-315).  Client-edge / torch-gated like its parent."""

    def __init__(self, tokenizer, **kwargs) -> None:
        merged = {
            **_tokenizer_pad_ids(tokenizer),
            **(kwargs.pop("fields_pad_ids", None) or {}),
        }
        super().__init__(fields_pad_ids=merged, **kwargs)
