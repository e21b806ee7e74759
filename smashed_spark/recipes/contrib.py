"""Contrib mappers (reference: src/smashed/contrib/squad.py and
contrib/sse.py) — QA-dataset helpers.

All pure Column expressions.  ``ConcatenateContextMapper`` is
schema-polymorphic (string / list / list-of-lists) like the reference's
runtime polymorphism, resolved statically from the column type.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from ..core.mapper import SparkMapper


class ConcatenateContextMapper(SparkMapper):
    """Join str / list[str] / list[list[str]] context into one string
    with section/paragraph/header/document BOS-EOS decorations
    (reference contrib/squad.py:47-139)."""

    def __init__(
        self,
        context_field_name: str = "context",
        section_bos: str = "",
        section_eos: str = "\n",
        paragraph_bos: str = "\n\n",
        paragraph_eos: str = "\n",
        header_bos: Optional[str] = None,
        header_eos: Optional[str] = None,
        document_bos: str = "",
        document_eos: str = "",
    ) -> None:
        self.ctx_fld = context_field_name
        self.sec_bos = section_bos
        self.sec_eos = section_eos
        self.par_bos = paragraph_bos
        self.par_eos = paragraph_eos
        self.hdr_bos = header_bos if header_bos is not None else paragraph_bos
        self.hdr_eos = header_eos if header_eos is not None else paragraph_eos
        self.doc_bos = document_bos
        self.doc_eos = document_eos
        super().__init__(
            input_fields=[context_field_name],
            output_fields=[context_field_name],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        dtype = df.schema[self.ctx_fld].dataType
        col = F.col(self.ctx_fld)
        if not isinstance(dtype, ArrayType):
            return df  # already a string

        if isinstance(dtype.elementType, ArrayType):
            # list of lists: first para of each section is a header
            def section(sec: Column) -> Column:
                pars = F.filter(sec, lambda p: p.isNotNull())
                decorated = F.transform(
                    pars,
                    lambda p, i: F.when(
                        i == 0,
                        F.concat(F.lit(self.hdr_bos), p, F.lit(self.hdr_eos)),
                    ).otherwise(
                        F.concat(F.lit(self.par_bos), p, F.lit(self.par_eos))
                    ),
                )
                return F.array_join(decorated, "")

            body = F.array_join(
                F.transform(F.filter(col, lambda s: s.isNotNull()), section),
                "",
            )
        else:
            body = F.array_join(
                F.transform(
                    F.filter(col, lambda s: s.isNotNull()),
                    lambda s: F.concat(
                        F.lit(self.sec_bos), s, F.lit(self.sec_eos)
                    ),
                ),
                "",
            )
        out = F.concat(F.lit(self.doc_bos), body, F.lit(self.doc_eos))
        return df.withColumn(self.ctx_fld, out)


class UniqueAnswerMapper(SparkMapper):
    """Per-row order-preserving dedup of the answers array (reference
    contrib/squad.py:142-158; Spark's ``array_distinct`` preserves
    first-occurrence order like ``dict.fromkeys``)."""

    def __init__(self, answer_field: str = "answers") -> None:
        self.answer_field = answer_field
        super().__init__()

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.answer_field, F.array_distinct(F.col(self.answer_field))
        )


class AddEvidencesLocationMapper(SparkMapper):
    """``context.find(evidence)`` -> ``[start, end]`` char spans, -1 for
    missing (reference contrib/squad.py:161-195).  Spark's ``instr`` is
    1-based and returns 0 when absent — offsets adjusted to match the
    reference's 0-based ``str.find`` semantics."""

    def __init__(
        self,
        context_field: str = "context",
        evidence_field: str = "evidences",
        location_field: str = "locations",
    ) -> None:
        self.context_field = context_field
        self.evidence_field = evidence_field
        self.location_field = location_field
        super().__init__(
            input_fields=[evidence_field], output_fields=[location_field]
        )

    def apply(self, df: DataFrame) -> DataFrame:
        ctx = F.col(self.context_field)
        ev_col = F.col(self.evidence_field)
        dtype = df.schema[self.evidence_field].dataType
        assert isinstance(dtype, ArrayType)
        if isinstance(dtype.elementType, ArrayType):
            flat = F.flatten(ev_col)
        else:
            flat = ev_col

        def span(e: Column) -> Column:
            start = (F.instr(ctx, e) - 1).cast("bigint")
            end = F.when(start >= 0, start + F.length(e)).otherwise(
                F.lit(-1)
            ).cast("bigint")
            return F.array(start, end)

        return df.withColumn(self.location_field, F.transform(flat, span))


class ReplaceIfNoEvidencePromptMapper(SparkMapper):
    """If no location span was found, replace the target ids with an
    alternative encoded prompt (reference contrib/squad.py:286-315)."""

    def __init__(
        self,
        alternative_ids,
        location_field: str = "locations",
        target_field: str = "labels",
    ) -> None:
        self.alternative_ids = list(alternative_ids)
        self.location_field = location_field
        self.target_field = target_field
        super().__init__(
            input_fields=[location_field, target_field],
            output_fields=[target_field],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        locs = F.col(self.location_field)
        has_evidence = F.exists(
            locs, lambda p: p.getItem(0) >= 0
        )
        alt = F.array(
            *[F.lit(i) for i in self.alternative_ids]
        ).cast("array<bigint>")
        out = F.when(has_evidence, F.col(self.target_field).cast("array<bigint>")).otherwise(alt)
        return df.withColumn(self.target_field, out)


class OneVsOtherAnnotatorMapper(SparkMapper):
    """Split annotations: one annotator -> preds, mean of the rest ->
    label (reference contrib/sse.py:5-38)."""

    def __init__(
        self,
        input_field: str = "annotations",
        label_field: str = "labels",
        preds_field: str = "preds",
        position: int = 0,
    ) -> None:
        self.input_field = input_field
        self.label_field = label_field
        self.preds_field = preds_field
        self.position = position
        super().__init__(
            input_fields=[input_field],
            output_fields=[label_field, preds_field],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        ann = F.col(self.input_field)
        guard = F.assert_true(
            F.size(ann) >= 2,
            F.lit("Expected at least 2 annotations"),
        )
        n = F.size(ann)
        total = F.aggregate(
            ann, F.lit(0.0), lambda acc, v: acc + v.cast("double")
        )
        mine = F.element_at(ann, self.position + 1)
        label = (total - mine) / (n - 1).cast("double")
        return df.withColumns(
            {
                self.preds_field: F.when(guard.isNull(), mine),
                self.label_field: F.when(guard.isNull(), F.round(label, 6)),
            }
        )
