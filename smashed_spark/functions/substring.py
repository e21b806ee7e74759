"""Exact duplicated-substring detection across a document corpus.

The reference has no cross-document operators at all (its mappers are
row-local; see src/smashed/mappers/*), so this module is part of the
beyond-reference curation engine, alongside functions/dedup.py.  The
semantics follow the ExactSubstr deduplication of Lee et al. 2021
("Deduplicating Training Data Makes Language Models Better"): find
every substring of at least ``width`` tokens that occurs more than
once in the corpus, then merge the hits into maximal per-document
spans so callers can cut them out.

Spark-first design (vs. the paper's single-node suffix array)
-------------------------------------------------------------
A suffix array over 100 TB of text cannot be built on one node; the
distributed equivalent is *fixed-width window hashing*: slide a
``width``-word window with stride ``stride`` over each document and
hash each window.  Two facts make this exact, not approximate:

* every duplicated substring of >= ``width`` words contains at least
  one complete window occurring elsewhere (stride 1), so recall is
  total at window granularity;
* merging overlapping duplicated windows per document reconstructs
  the maximal duplicated spans, exactly what ExactSubstr removes.

Cost model at scale: the window explode multiplies rows by roughly
``words/stride`` — the dominant term — and the duplicate count needs
ONE wide shuffle keyed by the window hash (the MapReduce shape of the
paper's "group by substring" formulation).  The span merge is a second,
per-document shuffle over only the *duplicated* windows (usually a
tiny fraction of the corpus).  Hub windows (boilerplate repeated
millions of times) make a skewed hash partition; the per-key work is a
plain count, so AQE-spillable — and ``stride > 1`` trades window-level
recall (a duplicated substring is only guaranteed to be caught once it
spans ``width + stride - 1`` words) for a 1/stride cost cut.

Hashing: ``xxhash64`` by default (8-byte shuffle keys, JVM-side,
fastest); ``md5`` optionally for engine-portable parity with the
DuckDB oracle gates (functions/hashing.py documents the convention).
Collisions: a 64-bit hash over ~2^40 windows (100 TB) has a ~2^-34
per-pair false-dup probability — acceptable for curation; callers who
need certainty can re-verify flagged spans textually downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


class DuplicatedWindowsMapper(SparkMapper):
    """Flag every ``width``-word window (stride ``stride``) whose hash
    occurs at least ``min_count`` times in the whole corpus.

    Output rows: one per *duplicated* window —
    ``(…id_field, pos, win_hash, n_occ)`` where ``pos`` is the 0-based
    word offset of the window start and ``n_occ`` its global
    occurrence count.  Non-duplicated windows are dropped.

    Plan shape: narrow window explode, then ONE exchange keyed by the
    window hash (a count-over-partition window — the same
    single-exchange idiom as the hub cap in dedup.py).
    """

    def __init__(
        self,
        id_field: str = "doc_id",
        words_field: str = "words",
        width: int = 8,
        stride: int = 1,
        min_count: int = 2,
        hash_fn: str = "xxhash64",
        pos_field: str = "pos",
        hash_field: str = "win_hash",
        count_field: str = "n_occ",
    ) -> None:
        if width < 1:
            raise ValueError("width must be >= 1")
        if stride < 1:
            raise ValueError("stride must be >= 1")
        if min_count < 2:
            raise ValueError("min_count must be >= 2 (1 matches everything)")
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
        self.id_field = id_field
        self.words_field = words_field
        self.width = width
        self.stride = stride
        self.min_count = min_count
        self.hash_fn = hash_fn
        self.pos_field = pos_field
        self.hash_field = hash_field
        self.count_field = count_field
        super().__init__(
            input_fields=[id_field, words_field],
            output_fields=[pos_field, hash_field, count_field],
        )

    def _windows(self, df: DataFrame) -> DataFrame:
        """(id, pos, win_hash) for every window — narrow explode."""
        words = F.col(self.words_field)
        # number of windows: floor((n - width) / stride) + 1 when
        # n >= width, else 0; start positions are 0, stride, 2*stride…
        n_win = F.floor(
            (F.size(words) - F.lit(self.width)) / F.lit(self.stride)
        ) + 1
        starts = F.when(
            F.size(words) >= self.width,
            F.transform(
                F.sequence(F.lit(0), n_win.cast("int") - 1),
                lambda i: i * self.stride,
            ),
        ).otherwise(F.array().cast("array<integer>"))
        win_text = lambda p: F.array_join(  # noqa: E731
            F.slice(words, p + 1, self.width), " "
        )
        hasher = F.xxhash64 if self.hash_fn == "xxhash64" else F.md5
        # hash BEFORE the explode: exploding (pos, hash) pairs keeps the
        # exploded rows 12 bytes wide instead of carrying the words
        # array through the explode (or joining back to re-slice)
        pairs = F.transform(
            starts,
            lambda p: F.struct(
                p.alias("p"), hasher(win_text(p)).alias("h")
            ),
        )
        out = (
            df.select(self.id_field, F.explode(pairs).alias("__w__"))
            .select(
                self.id_field,
                F.col("__w__.p").alias(self.pos_field),
                F.col("__w__.h").alias(self.hash_field),
            )
        )
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        wins = self._windows(df)
        # global occurrence count: one exchange on the hash; no
        # collect_list (a hub window would blow a list buffer, a plain
        # count spills fine)
        occ = Window.partitionBy(self.hash_field)
        out = wins.withColumn(
            self.count_field, F.count(F.lit(1)).over(occ)
        )
        return out.where(F.col(self.count_field) >= self.min_count)


class DuplicatedSpansMapper(DuplicatedWindowsMapper):
    """Merge overlapping duplicated windows per document into maximal
    duplicated spans — the removable units of Lee et al.'s ExactSubstr.

    Output rows: ``(…id_field, span_start, span_end, n_windows)`` with
    ``span_start`` inclusive / ``span_end`` exclusive 0-based word
    offsets and ``n_windows`` the number of duplicated windows merged
    into the span.  Classic island detection: per document, a window
    starting at ``pos`` covers ``[pos, pos + width)``; a new island
    starts when ``pos`` exceeds the running maximum end.

    Plan shape: the parent's one wide exchange, then one narrow
    per-document exchange over duplicated windows only.
    """

    def __init__(
        self,
        *args,
        span_start_field: str = "span_start",
        span_end_field: str = "span_end",
        span_windows_field: str = "n_windows",
        **kwargs,
    ) -> None:
        super().__init__(*args, **kwargs)
        self.span_start_field = span_start_field
        self.span_end_field = span_end_field
        self.span_windows_field = span_windows_field
        self.output_fields = (
            span_start_field,
            span_end_field,
            span_windows_field,
        )

    def apply(self, df: DataFrame) -> DataFrame:
        wins = super().apply(df)
        return merge_windows_to_spans(
            wins,
            self.id_field,
            self.pos_field,
            self.width,
            self.span_start_field,
            self.span_end_field,
            self.span_windows_field,
        )


def merge_windows_to_spans(
    wins: DataFrame,
    id_field: str,
    pos_field: str,
    width: int,
    start_field: str = "span_start",
    end_field: str = "span_end",
    windows_field: str = "n_windows",
) -> DataFrame:
    """Classic per-document island merge: a window starting at ``pos``
    covers ``[pos, pos + width)``; a new island starts when ``pos``
    exceeds the running maximum end.  One narrow per-document exchange
    over the (already filtered) duplicated windows."""
    byid = Window.partitionBy(id_field).orderBy(pos_field)
    run = byid.rowsBetween(Window.unboundedPreceding, -1)
    end = F.col(pos_field) + F.lit(width)
    prev_max_end = F.max(end).over(run)
    brk = F.when(
        prev_max_end.isNull() | (F.col(pos_field) > prev_max_end), 1
    ).otherwise(0)
    island = F.sum(brk).over(
        byid.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        wins.withColumn("__island__", island)
        .groupBy(id_field, "__island__")
        .agg(
            F.min(pos_field).alias(start_field),
            (F.max(pos_field) + F.lit(width)).alias(end_field),
            F.count(F.lit(1)).alias(windows_field),
        )
        .drop("__island__")
    )


class RemoveDuplicatedSpansMapper(DuplicatedWindowsMapper):
    """Apply ExactSubstr (Lee et al. 2021) — the removal step: cut
    every NON-FIRST occurrence of a duplicated window from the text,
    keeping exactly one copy corpus-wide (the minimum ``(doc, pos)``
    occurrence), or per document with ``scope="document"`` (the
    self-repetition trimmer: a window repeated WITHIN a document keeps
    its first in-document occurrence — Gopher-style repetition
    removal as an edit, not just a signal).

    Output: the input columns plus ``clean_words_field`` /
    ``clean_text_field`` (the words surviving the cuts, re-joined) and
    ``removed_field`` (words removed).  Overlapping kept/removed
    windows resolve in favor of removal — exact span cuts, the paper's
    behavior; content at a cut boundary may lose a kept window's
    overlap.

    Plan shape: the parent's narrow window explode, ONE wide exchange
    on the window hash carrying both the occurrence count and the
    first-occurrence rank (two window functions over the SAME
    partitioning — no extra shuffle), an island merge per doc, then
    one broadcast-or-shuffled join of the KB-per-doc span lists back
    onto the corpus and a narrow index-filter rebuild of the words.
    """

    def __init__(
        self,
        *args,
        scope: str = "corpus",
        clean_words_field: str = "clean_words",
        clean_text_field: str = "clean_text",
        removed_field: str = "n_removed_words",
        **kwargs,
    ) -> None:
        if scope not in ("corpus", "document"):
            raise ValueError("scope must be 'corpus' or 'document'")
        super().__init__(*args, **kwargs)
        self.scope = scope
        self.clean_words_field = clean_words_field
        self.clean_text_field = clean_text_field
        self.removed_field = removed_field
        self.output_fields = (
            clean_words_field,
            clean_text_field,
            removed_field,
        )

    def apply(self, df: DataFrame) -> DataFrame:
        wins = self._windows(df)
        if self.scope == "corpus":
            key = [self.hash_field]
        else:  # document scope: repetition WITHIN a doc
            key = [self.id_field, self.hash_field]
        occ = Window.partitionBy(*key)
        first = Window.partitionBy(*key).orderBy(
            F.col(self.id_field).asc(), F.col(self.pos_field).asc()
        )
        flagged = wins.withColumn(
            self.count_field, F.count(F.lit(1)).over(occ)
        ).withColumn("__rank__", F.row_number().over(first))
        removable = flagged.where(
            (F.col(self.count_field) >= self.min_count)
            & (F.col("__rank__") >= 2)
        )
        spans = merge_windows_to_spans(
            removable, self.id_field, self.pos_field, self.width
        )
        per_doc = spans.groupBy(self.id_field).agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            ).alias("__spans__")
        )
        out = df.join(per_doc, self.id_field, "left")
        words = F.col(self.words_field)
        spans_col = F.coalesce(
            F.col("__spans__"),
            F.array().cast("array<struct<s:bigint,e:bigint>>"),
        )
        kept = F.filter(
            words,
            lambda w, i: ~F.exists(
                spans_col, lambda sp: (i >= sp["s"]) & (i < sp["e"])
            ),
        )
        return (
            out.withColumn(self.clean_words_field, kept)
            .withColumn(
                self.clean_text_field,
                F.array_join(F.col(self.clean_words_field), " "),
            )
            .withColumn(
                self.removed_field,
                (F.size(words) - F.size(F.col(self.clean_words_field))).cast(
                    "bigint"
                ),
            )
            .drop("__spans__")
        )


class DedupParagraphsMapper(SparkMapper):
    """Corpus-wide exact paragraph dedup (the RefinedWeb / Falcon
    curation step): split every document on ``sep``, drop every
    repeated occurrence of a paragraph — the FIRST occurrence in
    ``(id, position)`` order survives, deterministically — and
    reassemble the surviving paragraphs in document order.

    Output: the input row set with ``text_field`` rewritten and a
    ``removed_field`` count of dropped paragraphs (documents whose
    every paragraph was dropped keep an empty string — callers filter
    on content length downstream, matching reference-style filter
    composition).

    Plan shape: paragraph explode (narrow), ONE wide exchange on the
    paragraph hash where ``row_number() == 1`` keeps the first
    occurrence (WindowGroupLimit prunes each map partition to its
    local first before the shuffle sort), then ONE per-document
    exchange to reassemble.  Short paragraphs below ``min_chars`` are
    exempt from dedup (headers, separators — the RefinedWeb
    convention) and always kept.
    """

    def __init__(
        self,
        id_field: str = "doc_id",
        text_field: str = "text",
        sep: str = "\n",
        min_chars: int = 0,
        removed_field: str = "n_removed",
    ) -> None:
        self.id_field = id_field
        self.text_field = text_field
        self.sep = sep
        self.min_chars = min_chars
        self.removed_field = removed_field
        super().__init__(
            input_fields=[id_field, text_field],
            output_fields=[removed_field],
        )

    @property
    def _sep_pattern(self) -> str:
        """``F.split`` takes a Java regex; the separator is a LITERAL
        (reassembly uses it verbatim), so escape every non-alphanumeric
        char — sep='.' must split on dots, not on every character."""
        import re

        return re.escape(self.sep)

    def apply(self, df: DataFrame) -> DataFrame:
        paras = df.select(
            self.id_field,
            F.posexplode(
                F.split(
                    F.col(self.text_field), F.lit(self._sep_pattern), -1
                )
            ).alias("__i__", "__p__"),
        )
        exempt = F.length("__p__") < self.min_chars
        # exempt (short) paragraphs never enter the hash shuffle — this
        # is also the skew guard: empty/boilerplate one-liners are the
        # hub keys of a real corpus, and with min_chars > 0 they stay
        # out of the wide exchange entirely
        shortp = paras.where(exempt)
        # partition by the hash AND the paragraph text: the hash drives
        # shuffle distribution (8-byte key prefix), the text column only
        # disambiguates within a bucket — so a 64-bit collision between
        # two DISTINCT paragraphs (expected by the birthday bound at
        # ~10^11 paragraphs / 100 TB) cannot merge them.  This keeps the
        # operator's contract EXACT, unlike the window hashing in
        # DuplicatedWindowsMapper whose docstring states and accepts a
        # collision tolerance.
        w = Window.partitionBy(F.xxhash64("__p__"), "__p__").orderBy(
            self.id_field, "__i__"
        )
        # a pure rank filter, so Spark compiles it to WindowGroupLimit:
        # each map task pre-prunes to its local first occurrence per
        # hash before the shuffle-side sort
        firsts = (
            paras.where(~exempt)
            .withColumn("__rn__", F.row_number().over(w))
            .where(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        kept = shortp.unionAll(firsts)
        out = kept.groupBy(self.id_field).agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__i__", "__p__"))
                    ),
                    lambda s: s["__p__"],
                ),
                self.sep,
            ).alias("__text__"),
            F.count(F.lit(1)).alias("__n_kept__"),
        )
        other_cols = [
            c
            for c in df.columns
            if c not in (self.id_field, self.text_field)
        ]
        n_paras = F.size(
            F.split(F.col(self.text_field), F.lit(self._sep_pattern), -1)
        ).cast("bigint")
        carried = df.select(
            self.id_field, *other_cols, n_paras.alias("__n_paras__")
        )
        return (
            # left join: a document whose every paragraph was removed
            # still comes back (empty text, all paragraphs counted)
            carried.join(out, self.id_field, "left")
            .withColumn(
                self.text_field, F.coalesce(F.col("__text__"), F.lit(""))
            )
            .withColumn(
                self.removed_field,
                F.col("__n_paras__")
                - F.coalesce(F.col("__n_kept__"), F.lit(0)),
            )
            .select(
                self.id_field,
                self.text_field,
                *other_cols,
                self.removed_field,
            )
        )
