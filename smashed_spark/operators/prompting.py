"""Prompting mappers: budgeted multi-field truncation and prompt
filling (reference: src/smashed/mappers/prompting.py).

The truncation-length allocation algebra (``uniform`` proportional
floor, ``longest`` cut-longest-first redistribution — reference
prompting.py:217-275) compiles to a handful of Column expressions: the
field count is static, so the whole computation is scalar arithmetic on
``F.size`` values inside whole-stage codegen.  Golden outputs from
reference tests/test_prompting.py:15-55 are pinned in
tests/test_prompting.py.
"""

from __future__ import annotations

from string import Formatter
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper


def _uniform_lens(lens: List[Column], max_len: Column) -> List[Column]:
    """Proportional-floor allocation (reference prompting.py:217-232):
    ``floor(len_i * max_len / total)`` when over budget, else unchanged."""
    total = lens[0]
    for l in lens[1:]:
        total = total + l
    over = total > max_len
    return [
        F.when(
            over, F.floor(l.cast("double") * max_len / total).cast("bigint")
        ).otherwise(l)
        for l in lens
    ]


def _longest_lens(lens: List[Column], max_len: Column) -> List[Column]:
    """Cut-longest-first allocation (reference prompting.py:234-275)."""
    k = len(lens)
    total = lens[0]
    for l in lens[1:]:
        total = total + l
    target = F.floor(max_len / F.lit(k)).cast("bigint")
    longer = [F.when(l > target, l - target).otherwise(F.lit(0)) for l in lens]
    # budget to redistribute among the above-target sequences
    saved = [F.when(l < target, target - l).otherwise(F.lit(0)) for l in lens]
    extra = max_len - target * F.lit(k)
    for s in saved:
        extra = extra + s
    redistributed = _uniform_lens(longer, extra)
    allocated = [
        F.when(l > target, target + r).otherwise(l)
        for l, r in zip(lens, redistributed)
    ]
    # no truncation needed at all
    return [
        F.when(total <= max_len, l).otherwise(a) for l, a in zip(lens, allocated)
    ]


class TruncateMultipleFieldsMapper(SparkMapper):
    """Budgeted truncation of several list fields to a shared
    ``max_length`` minus preserved fields' lengths minus
    ``length_penalty`` (reference prompting.py:151-310)."""

    def __init__(
        self,
        fields_to_truncate: List[str],
        fields_to_preserve: Optional[List[str]] = None,
        tokenizer=None,
        max_length: Optional[int] = None,
        length_penalty: int = 0,
        strategy: str = "longest",
    ) -> None:
        if len(fields_to_truncate) == 0:
            raise ValueError("fields_to_truncate must be non-empty")
        if tokenizer is None and max_length is None:
            raise ValueError("Tokenizer or max_length must be provided.")
        if max_length is None:
            max_length = getattr(tokenizer, "model_max_length", None)
        if not isinstance(max_length, int):
            raise ValueError(
                f"max_length must be an integer, not {max_length} "
                f"({type(max_length)})."
            )
        if strategy not in ("longest", "uniform"):
            raise ValueError(
                f"strategy must be one of 'longest' or 'uniform', not {strategy}"
            )
        # reference sorts + dedups the field tuples (prompting.py:207-208)
        self.fields_to_truncate = tuple(sorted(set(fields_to_truncate)))
        self.fields_to_preserve = tuple(sorted(set(fields_to_preserve or [])))
        self.max_length = max_length - length_penalty
        self.strategy = strategy
        super().__init__(
            input_fields=self.fields_to_truncate + self.fields_to_preserve,
            output_fields=self.fields_to_truncate + self.fields_to_preserve,
        )

    def apply(self, df: DataFrame) -> DataFrame:
        lens = [
            F.size(F.col(f)).cast("bigint") for f in self.fields_to_truncate
        ]
        max_len = F.lit(self.max_length).cast("bigint")
        for f in self.fields_to_preserve:
            max_len = max_len - F.size(F.col(f))
        if self.strategy == "uniform":
            new_lens = _uniform_lens(lens, max_len)
        else:
            new_lens = _longest_lens(lens, max_len)
        out = {
            f: F.slice(F.col(f), 1, F.greatest(n, F.lit(0)).cast("int"))
            for f, n in zip(self.fields_to_truncate, new_lens)
        }
        return df.withColumns(out)


class TruncateMultipleNestedFieldsMapper(TruncateMultipleFieldsMapper):
    """Same, but fields are lists-of-lists: budgets are computed on the
    *flattened* token counts, then each nested list is truncated
    left-to-right to its allocation (reference prompting.py:313-335 +
    utils/shape_utils.py flatten/reconstruct round-trip — reconstruction
    keeps every sub-list boundary, so tails truncated to zero remain as
    empty lists: shape_utils.reconstruct_from_indices:110-112 yields
    ``[[0,1,2],[3,4],[]]`` for budget 5 over ``[[0,1,2],[3,4],[5,6,7]]``).
    """

    def apply(self, df: DataFrame) -> DataFrame:
        lens = [
            F.size(F.flatten(F.col(f))).cast("bigint")
            for f in self.fields_to_truncate
        ]
        max_len = F.lit(self.max_length).cast("bigint")
        for f in self.fields_to_preserve:
            max_len = max_len - F.size(F.flatten(F.col(f)))
        if self.strategy == "uniform":
            new_lens = _uniform_lens(lens, max_len)
        else:
            new_lens = _longest_lens(lens, max_len)

        out = {}
        for f, budget in zip(self.fields_to_truncate, new_lens):
            col = F.col(f)
            # prefix-sum scan: keep for each sub-list the part of the
            # budget remaining after the previous sub-lists
            def take(col=col, budget=budget):
                init = F.struct(
                    F.lit(0).cast("bigint").alias("used"),
                    F.array().cast(df.schema[f].dataType).alias("acc"),
                )

                def step(acc, seq):
                    remaining = F.greatest(
                        budget - acc.getField("used"), F.lit(0)
                    )
                    keep = F.least(F.size(seq).cast("bigint"), remaining)
                    piece = F.slice(seq, 1, keep.cast("int"))
                    # always append, even when the slice is empty: the
                    # reference reconstructs every sub-list boundary
                    new_acc = F.concat(acc.getField("acc"), F.array(piece))
                    return F.struct(
                        (acc.getField("used") + F.size(seq)).alias("used"),
                        new_acc.alias("acc"),
                    )

                return F.aggregate(
                    col, init, step, lambda acc: acc.getField("acc")
                )

            out[f] = take()
        return df.withColumns(out)


def parse_template(template: str) -> List[Tuple[str, Optional[str]]]:
    """Parse a ``"{a} is {b}"`` template into (literal, field) segments
    (reference PromptSegment.from_template, prompting.py:388-401)."""
    return [
        (literal, field) for literal, field, _, _ in Formatter().parse(template)
    ]


class FillTextPromptMapper(SparkMapper):
    """Fill a text template with string fields into one output column
    (reference prompting.py:428-444) — a single ``F.concat``."""

    def __init__(self, prompt_template: str, output_field_name: str) -> None:
        self.prompt_template = prompt_template
        self.output_field_name = output_field_name
        self.segments = parse_template(prompt_template)
        super().__init__(
            input_fields=[f for _, f in self.segments if f],
            output_fields=[output_field_name],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        parts: List[Column] = []
        for literal, field in self.segments:
            if literal:
                parts.append(F.lit(literal))
            if field:
                parts.append(F.col(field).cast("string"))
        return df.withColumn(self.output_field_name, F.concat(*parts))


class FillEncodedPromptMapper(SparkMapper):
    """Fill a template in token-id space (reference prompting.py:447-555):
    literal segments are pre-tokenized driver-side, field segments are
    ``array<bigint>`` columns; output is
    ``bos ++ seg0 ++ field0 ++ ... ++ eos`` plus optional attention-mask
    (1s) and token-type-ids (0s) columns.

    ``tokenizer`` only needs ``encode(text, add_special_tokens=False)``
    and ``bos_token_id``/``eos_token_id`` attributes (any HF-compatible
    or hand-rolled tokenizer works).
    """

    def __init__(
        self,
        template: str,
        tokenizer=None,
        output_prefix: Optional[str] = None,
        output_rename_map: Optional[Dict[str, str]] = None,
        return_attention_mask: bool = True,
        return_token_type_ids: bool = False,
        add_bos_token: bool = True,
        add_eos_token: bool = True,
    ) -> None:
        if output_prefix is not None and output_rename_map is not None:
            raise ValueError(
                "Cannot provide both output_prefix and output_rename_map"
            )
        self.template = template
        self.output_prefix = output_prefix
        self.output_rename_map = dict(output_rename_map or {})
        self.return_attention_mask = return_attention_mask
        self.return_token_type_ids = return_token_type_ids

        def _special(flag: str, enabled: bool) -> List[int]:
            if not enabled:
                return []
            if tokenizer is None:
                raise ValueError(
                    f"Cannot add {flag} token if no tokenizer is provided."
                )
            tid = getattr(tokenizer, f"{flag}_token_id", None)
            return [tid] if tid is not None else []

        self.bos_token_ids = _special("bos", add_bos_token)
        self.eos_token_ids = _special("eos", add_eos_token)

        self.segments: List[Tuple[List[int], Optional[str]]] = []
        for literal, field in parse_template(template):
            ids = (
                tokenizer.encode(literal, add_special_tokens=False)
                if (tokenizer is not None and literal)
                else []
            )
            self.segments.append((list(ids), field))

        super().__init__(
            input_fields=[f for _, f in self.segments if f],
            output_fields=[self.fname("input_ids")],
        )

    def fname(self, field: str) -> str:
        # reference GetTokenizerOutputFieldsAndNamesMixIn.fname
        # (tokenize.py:70-81): prefix joins with "_", rename map raises
        # on unknown fields
        if self.output_prefix:
            return f"{self.output_prefix}_{field}"
        if self.output_rename_map:
            if field in self.output_rename_map:
                return self.output_rename_map[field]
            raise ValueError(f"Field '{field}' is not in the rename map.")
        return field

    def config(self):
        return {
            "template": self.template,
            "bos": self.bos_token_ids,
            "eos": self.eos_token_ids,
            "segments": [(ids, f) for ids, f in self.segments],
            "prefix": self.output_prefix,
            "rename": self.output_rename_map,
            "mask": self.return_attention_mask,
            "type_ids": self.return_token_type_ids,
        }

    @staticmethod
    def _lit_ids(ids: List[int]) -> Column:
        if not ids:
            return F.array().cast("array<bigint>")
        return F.array(*[F.lit(i) for i in ids]).cast("array<bigint>")

    def apply(self, df: DataFrame) -> DataFrame:
        parts: List[Column] = [self._lit_ids(self.bos_token_ids)]
        for ids, field in self.segments:
            if ids:
                parts.append(self._lit_ids(ids))
            if field:
                parts.append(F.col(field).cast("array<bigint>"))
        parts.append(self._lit_ids(self.eos_token_ids))
        encoded = F.concat(*parts)

        out = {self.fname("input_ids"): encoded}
        df = df.withColumns(out)
        ref = F.col(self.fname("input_ids"))
        extras = {}
        if self.return_attention_mask:
            extras[self.fname("attention_mask")] = F.array_repeat(
                F.lit(1), F.size(ref)
            )
        if self.return_token_type_ids:
            extras[self.fname("token_type_ids")] = F.array_repeat(
                F.lit(0), F.size(ref)
            )
        return df.withColumns(extras) if extras else df
