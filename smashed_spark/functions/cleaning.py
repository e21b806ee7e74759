"""Canned cleaning recipes from published corpus-curation pipelines —
the "apply the standard filters" layer on top of the raw signals in
:mod:`.textstats`.

* :class:`GopherQualityFilterMapper` — the Gopher quality rules (Rae
  et al. 2021, app. A1.1): word-count band, mean-word-length band,
  symbol/ellipsis caps, alphabetic-word minimum, repetition caps.
* :class:`C4CleanMapper` — C4's line-level cleaning (Raffel et al.
  2020 §2.2): keep only lines that end in terminal punctuation and
  have enough words; drop documents mentioning boilerplate markers or
  containing code braces; drop too-short documents.

Both are NARROW (column expressions over the text / line arrays — no
shuffle, scan-speed at any corpus size) and deterministic, so the
driver-side replay oracles in tests/test_cleaning.py pin the exact
semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper


class GopherQualityFilterMapper(SparkMapper):
    """Gopher's document quality rules as one boolean verdict.

    Emits ``keep_field`` (1/0) and — so rejections are auditable —
    ``reason_field`` with the FIRST failed rule's name ('' when kept);
    set ``drop=True`` to filter instead of tag.  Thresholds are the
    published defaults, overridable per instance:

    * 50 <= word count <= 100_000
    * 3 <= mean word length <= 10
    * <= 90% of lines start with a bullet, <= 30% end with an ellipsis
      (the paper's asymmetric pair; single-line docs fail outright on
      a bullet/ellipsis line)
    * >= 80% of words contain at least one alphabetic character
    * symbol ratio: '#' or '...' occurrences / words <= 0.1

    All checks are per-row expressions over ``text_field``; compose
    :class:`~.textstats.RepetitionStatsMapper` upstream for the
    repetition-fraction rules (they need the 2-gram aggregate) and
    filter on its columns alongside ``keep_field``.
    """

    def __init__(
        self,
        text_field: str = "text",
        keep_field: str = "gopher_keep",
        reason_field: str = "gopher_reason",
        min_words: int = 50,
        max_words: int = 100_000,
        min_mean_word_len: float = 3.0,
        max_mean_word_len: float = 10.0,
        max_bullet_line_frac: float = 0.9,
        max_ellipsis_line_frac: float = 0.3,
        min_alpha_word_frac: float = 0.8,
        max_symbol_ratio: float = 0.1,
        drop: bool = False,
    ) -> None:
        self.text_field = text_field
        self.keep_field = keep_field
        self.reason_field = reason_field
        self.min_words = min_words
        self.max_words = max_words
        self.min_mean_word_len = min_mean_word_len
        self.max_mean_word_len = max_mean_word_len
        self.max_bullet_line_frac = max_bullet_line_frac
        self.max_ellipsis_line_frac = max_ellipsis_line_frac
        self.min_alpha_word_frac = min_alpha_word_frac
        self.max_symbol_ratio = max_symbol_ratio
        self.drop = drop
        super().__init__(
            input_fields=[text_field],
            # drop mode removes the tag columns again (filter-only)
            output_fields=() if drop else (keep_field, reason_field),
        )

    def apply(self, df: DataFrame) -> DataFrame:
        text = F.col(self.text_field)
        words = F.filter(
            F.split(text, r"\s+"), lambda w: F.length(w) > 0
        )
        n_words = F.size(words)
        mean_len = F.when(
            n_words > 0,
            F.aggregate(
                words,
                F.lit(0).cast("bigint"),
                lambda acc, w: acc + F.length(w),
            ).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0))
        lines = F.split(text, "\n")
        n_lines = F.size(lines)
        bullet_frac = (
            F.size(
                F.filter(
                    lines,
                    lambda ln: F.trim(ln).rlike(r"^([\*\-•])"),
                )
            ).cast("double")
            / n_lines
        )
        ellipsis_frac = (
            F.size(
                F.filter(
                    lines,
                    lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"),
                )
            ).cast("double")
            / n_lines
        )
        alpha_frac = F.when(
            n_words > 0,
            F.size(
                F.filter(words, lambda w: w.rlike(r"[A-Za-z]"))
            ).cast("double")
            / n_words,
        ).otherwise(F.lit(0.0))
        hash_count = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
        dots = (
            F.length(text)
            - F.length(F.replace(text, F.lit("..."), F.lit("")))
        ) / 3
        symbol_ratio = F.when(
            n_words > 0, (hash_count + dots).cast("double") / n_words
        ).otherwise(F.lit(0.0))

        # first failed rule wins (CASE evaluates in order)
        reason = (
            F.when(n_words < self.min_words, F.lit("too_few_words"))
            .when(n_words > self.max_words, F.lit("too_many_words"))
            .when(
                mean_len < self.min_mean_word_len,
                F.lit("mean_word_len_low"),
            )
            .when(
                mean_len > self.max_mean_word_len,
                F.lit("mean_word_len_high"),
            )
            .when(
                bullet_frac > self.max_bullet_line_frac,
                F.lit("bullet_lines"),
            )
            .when(
                ellipsis_frac > self.max_ellipsis_line_frac,
                F.lit("ellipsis_lines"),
            )
            .when(
                alpha_frac < self.min_alpha_word_frac,
                F.lit("non_alpha_words"),
            )
            .when(
                symbol_ratio > self.max_symbol_ratio,
                F.lit("symbol_ratio"),
            )
            .otherwise(F.lit(""))
        )
        out = df.withColumn(self.reason_field, reason).withColumn(
            self.keep_field,
            (F.col(self.reason_field) == "").cast("int"),
        )
        if self.drop:
            out = out.filter(F.col(self.keep_field) == 1).drop(
                self.keep_field, self.reason_field
            )
        return out


class C4CleanMapper(SparkMapper):
    """C4's cleaning (Raffel et al. 2020 §2.2), line level + document
    level, as a narrow rewrite:

    * keep only lines that end in terminal punctuation
      (``.!?"``' — the C4 rule) AND have at least ``min_line_words``
      words (the paper's 5); the surviving lines re-join with
      newlines into ``clean_field``;
    * drop the whole document when the (lowercased) text contains any
      ``taboo_markers`` substring (default: the C4 boilerplate set —
      'lorem ipsum', 'terms of use', 'privacy policy', 'cookie
      policy', 'uses cookies') or a curly brace (code);
    * drop documents with fewer than ``min_doc_lines`` surviving
      lines (the paper drops pages under 3 sentences; surviving
      terminal-punctuated lines are the sentence proxy here).

    Emits ``clean_field`` + ``keep_field`` (``drop=True`` filters and
    replaces ``text_field`` with the cleaned text instead).  Document
    sentences/lines never cross rows, so everything is per-row column
    algebra — no shuffle at any scale.
    """

    TABOO = (
        "lorem ipsum",
        "terms of use",
        "privacy policy",
        "cookie policy",
        "uses cookies",
    )

    def __init__(
        self,
        text_field: str = "text",
        clean_field: str = "c4_text",
        keep_field: str = "c4_keep",
        min_line_words: int = 5,
        min_doc_lines: int = 3,
        taboo_markers: Optional[Sequence[str]] = None,
        drop: bool = False,
    ) -> None:
        self.text_field = text_field
        self.clean_field = clean_field
        self.keep_field = keep_field
        self.min_line_words = min_line_words
        self.min_doc_lines = min_doc_lines
        self.taboo_markers = tuple(
            taboo_markers if taboo_markers is not None else self.TABOO
        )
        self.drop = drop
        super().__init__(
            input_fields=[text_field],
            # drop mode folds the cleaned text back into text_field
            output_fields=() if drop else (clean_field, keep_field),
        )

    def _line_ok(self, ln: Column) -> Column:
        t = F.trim(ln)
        n = F.size(F.filter(F.split(t, r"\s+"), lambda w: F.length(w) > 0))
        return t.rlike("[.!?\"']$") & (n >= self.min_line_words)

    def apply(self, df: DataFrame) -> DataFrame:
        text = F.col(self.text_field)
        cleaned = F.array_join(
            F.filter(F.split(text, "\n"), self._line_ok), "\n"
        )
        lower = F.lower(text)
        taboo = F.lit(False)
        for m in self.taboo_markers:
            taboo = taboo | lower.contains(m)
        taboo = taboo | text.contains("{") | text.contains("}")
        n_clean_lines = F.when(
            F.length(F.col(self.clean_field)) > 0,
            F.size(F.split(F.col(self.clean_field), "\n")),
        ).otherwise(F.lit(0))
        out = df.withColumn(self.clean_field, cleaned).withColumn(
            self.keep_field,
            (
                ~taboo & (n_clean_lines >= self.min_doc_lines)
            ).cast("int"),
        )
        if self.drop:
            out = (
                out.filter(F.col(self.keep_field) == 1)
                .drop(self.text_field, self.keep_field)
                .withColumnRenamed(self.clean_field, self.text_field)
            )
        return out
