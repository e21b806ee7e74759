"""Oracle-checked queries exercising the mapper operators
(SURVEY.md §2 coverage) over the driver testdata tables.

Conventions:
* every computed column is aliased identically in the Spark pipeline
  and the DuckDB oracle SQL;
* doubles are rounded to 6 places on both sides (hash-stable);
* each query includes a deterministic ORDER-insensitive result (the
  driver sorts before hashing), so no ORDER BY is needed for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fields import (
    ChangeFieldsMapper,
    EnumerateFieldMapper,
    MakeFieldMapper,
    RenameFieldsMapper,
)
from ..operators.filters import FilterMapper
from ..operators.masks import (
    IndicesToMaskMapper,
    MaskToRangeMapper,
)
from ..operators.shape import (
    FlattenMapper,
    SingleSequenceStriderMapper,
    UnpackingMapper,
)
from ..operators.tokenize import PaddingMapper, TruncateSingleFieldMapper
from ..operators.types import (
    BinarizerMapper,
    CastMapper,
    LookupMapper,
    OneHotMapper,
)
from .registry import load, query


def _with_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a `words` array column (whitespace split)."""
    return load(spark, sf_dir, "documents").withColumn(
        "words", F.split(F.col("text"), " ")
    )

# ---------------------------------------------------------------------------
# M0 — projection / filter family (reference fields.py, filters.py)
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT event_id AS id, user_id, event_type, ROUND(value, 6) AS val,
           event_type AS g_et, user_id AS g_uid,
           to_json(flatten([[event_type], [CAST(user_id AS VARCHAR)]]))
               AS pair
    FROM events WHERE value >= 50.0 AND contains(event_type, 'i')
    """,
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterMapper (numeric >= AND 'in'/contains semantics) >>
    GlomMapper >> FlattenMapper >> ChangeFieldsMapper >>
    RenameFieldsMapper.  Family gate: also certifies the former
    ``filter_in_contains`` gate's substring operator (folded in round
    5) and — since round 9, when ``glom_path`` rotated out to free a
    slot for ``streaming_ingest_dedup`` under the driver's 50-query
    cap — GlomMapper's native tuple/dotted path tiers (``g_et`` /
    ``g_uid``) and FlattenMapper (``pair``)."""
    from ..operators.glom import GlomMapper
    from ..operators.shape import FlattenMapper

    df = load(spark, sf_dir, "events").withColumn(
        "meta",
        F.struct(
            F.col("event_type").alias("l"),
            F.struct(F.col("user_id").alias("s")).alias("inner"),
        ),
    ).withColumn(
        "pair",
        F.array(
            F.array("event_type"),
            F.array(F.col("user_id").cast("string")),
        ),
    )
    pipe = (
        FilterMapper("value", ">=", 50.0)
        >> FilterMapper("event_type", "in", "i")
        >> GlomMapper({"g_et": ("meta", "l"), "g_uid": "meta.inner.s"})
        >> FlattenMapper("pair")
        >> ChangeFieldsMapper(
            keep_fields=[
                "event_id", "user_id", "event_type", "value",
                "g_et", "g_uid", "pair",
            ]
        )
        >> RenameFieldsMapper({"event_id": "id", "value": "val"})
    )
    out = pipe.map(df)
    return out.withColumn("val", F.round("val", 6))


# enumerate_field rotated out late round 9 (slot freed for
# dsir_select under the driver's 50-query cap): EnumerateFieldMapper
# and MakeFieldMapper now certify inside cast_binarize below — same
# documents table, same first-seen dictionary-encode semantics.


# ---------------------------------------------------------------------------
# types family (reference types.py)
# ---------------------------------------------------------------------------


@query(
    "cast_binarize",
    oracle="""
    SELECT d.doc_id, CAST(d.n_chars AS DOUBLE) AS n_chars_f,
           CAST(d.n_chars > 500 AS BIGINT) AS is_long,
           to_json(list_transform(range(0, 16),
                                  i -> CAST(i = d.n_chars % 16 AS BIGINT)))
               AS onehot,
           CASE d.lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'fr' THEN 3
                WHEN 'es' THEN 4 ELSE NULL END AS lang_code,
           e.lang_id, 1 AS flag
    FROM documents d
    JOIN (
        SELECT lang, ROW_NUMBER() OVER (ORDER BY MIN(doc_id)) - 1 AS lang_id
        FROM documents GROUP BY lang
    ) e USING (lang)
    """,
)
def q_cast_binarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CastMapper + BinarizerMapper + OneHotMapper + LookupMapper.
    Family gate: the one-hot column certifies the former ``one_hot``
    gate, the lang_code column the former ``lookup_map`` gate (both
    folded in round 5 to stay under the driver's 50-query cap), and —
    since late round 9, when ``enumerate_field`` rotated out to free a
    slot for ``dsir_select`` — EnumerateFieldMapper's first-seen
    dictionary encode (``lang_id``, reference fields.py:134-196) and
    MakeFieldMapper's constant field (``flag``)."""
    df = load(spark, sf_dir, "documents")
    df = df.withColumn("is_long", F.col("n_chars"))
    df = BinarizerMapper("is_long", 500).map(df)
    df = df.withColumn("onehot", (F.col("n_chars") % 16).cast("bigint"))
    df = OneHotMapper(16, "onehot").map(df)
    df = df.withColumn("lang_code", F.col("lang"))
    df = LookupMapper("lang_code", {"en": 1, "de": 2, "fr": 3, "es": 4}).map(
        df
    )
    df = CastMapper({"n_chars": float}).map(df)
    df = RenameFieldsMapper({"n_chars": "n_chars_f"}).map(df)
    df = (
        EnumerateFieldMapper(
            "lang", destination_field="lang_id", order_by=["doc_id"]
        )
        >> MakeFieldMapper("flag", 1)
    ).map(df)
    df = df.withColumn("lang_id", F.col("lang_id").cast("bigint"))
    return ChangeFieldsMapper(
        keep_fields=[
            "doc_id", "n_chars_f", "is_long", "onehot", "lang_code",
            "lang_id", "flag",
        ]
    ).map(df)


# ---------------------------------------------------------------------------
# shape family — explode / stride / flatten (reference shape.py)
# ---------------------------------------------------------------------------


@query(
    "unpack_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS words FROM documents
    """,
)
def q_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UnpackingMapper with repeat semantics (reference shape.py:36-173)."""
    df = _with_words(spark, sf_dir).select("doc_id", "words")
    return UnpackingMapper(
        fields_to_unpack=["words"], ignored_behavior="repeat"
    ).map(df)


# ---------------------------------------------------------------------------
# masks family (reference masks.py)
# ---------------------------------------------------------------------------


@query(
    "masks_family",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), m AS (
        SELECT doc_id, doc_id % len(words) AS loc, len(words) AS n FROM w
    )
    SELECT doc_id,
           to_json(list_transform(range(0, n),
                   i -> CASE WHEN i = loc THEN 1 ELSE 0 END)) AS mask,
           to_json([[loc, loc + 1]]) AS ranges,
           to_json(list_transform(range(0, n),
               i -> CASE WHEN i >= loc AND i < least(loc + 3, n)
                    THEN 1 ELSE 0 END)) AS mask3,
           to_json(list_filter(range(0, n), i -> i % 3 = doc_id % 3)) AS locs3
    FROM m
    """,
)
def q_masks_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four mask directions in one pipeline (reference masks.py):
    IndicesToMask -> MaskToRange round-trip, RangeToMask over a
    [start, end) pair list, MaskToIndices over a striped mask."""
    from ..operators.masks import MaskToIndicesMapper, RangeToMaskMapper

    df = _with_words(spark, sf_dir).withColumn(
        "locs", F.array(F.col("doc_id") % F.size("words"))
    )
    pipe = IndicesToMaskMapper(
        mask_field_name="mask",
        reference_field_name="words",
        locations_field_name="locs",
    ) >> MaskToRangeMapper(mask_field_name="mask", locations_field_name="ranges")
    out = pipe.map(df)

    n = F.size("words")
    s = (F.col("doc_id") % n).cast("bigint")
    out = out.withColumn(
        "ranges_in", F.array(F.array(s, F.least(s + 3, n.cast("bigint"))))
    )
    out = RangeToMaskMapper(
        mask_field_name="mask3",
        reference_field_name="words",
        locations_field_name="ranges_in",
    ).map(out)

    mask_in = F.transform(
        F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<integer>")
        ),
        lambda i: F.when(
            i % 3 == F.col("doc_id") % 3, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    out = out.withColumn("mask_in", mask_in)
    out = MaskToIndicesMapper(
        mask_field_name="mask_in", locations_field_name="locs3"
    ).map(out)
    return out.select(
        "doc_id",
        F.col("mask").cast("array<bigint>"),
        "ranges",
        "mask3",
        "locs3",
    )


# ---------------------------------------------------------------------------
# truncate / pad (reference tokenize.py:274-342)
# ---------------------------------------------------------------------------


@query(
    "truncate_family",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS wa FROM documents
    ), lens AS (
        SELECT doc_id, wa, list_slice(wa, 1, 12) AS wb,
               len(wa) AS la, least(len(wa), 12) AS lb
        FROM w
    ), alloc AS (
        SELECT *,
               greatest(la - 10, 0) + greatest(lb - 10, 0) AS sum_longer,
               greatest(10 - la, 0) + greatest(10 - lb, 0) AS extra
        FROM lens
    ), fin AS (
        SELECT doc_id, wa, wb,
            CASE WHEN la + lb <= 20 THEN la
                 WHEN la <= 10 THEN la
                 ELSE 10 + CASE WHEN sum_longer > extra
                     THEN CAST(floor(greatest(la - 10, 0) * extra / sum_longer) AS BIGINT)
                     ELSE greatest(la - 10, 0) END
            END AS na,
            CASE WHEN la + lb <= 20 THEN lb
                 WHEN lb <= 10 THEN lb
                 ELSE 10 + CASE WHEN sum_longer > extra
                     THEN CAST(floor(greatest(lb - 10, 0) * extra / sum_longer) AS BIGINT)
                     ELSE greatest(lb - 10, 0) END
            END AS nb
        FROM alloc
    ), nest AS (
        SELECT doc_id, list_slice(wa, 1, 3) AS s1,
               list_slice(wa, 4, 6) AS s2, list_slice(wa, 7, 9) AS s3
        FROM w
    ), k AS (
        SELECT doc_id, s1, s2, s3, least(len(s1), 5) AS k1 FROM nest
    ), k2 AS (
        SELECT *, least(len(s2), 5 - k1) AS kk2 FROM k
    ), k3 AS (
        SELECT *, least(len(s3), 5 - k1 - kk2) AS kk3 FROM k2
    )
    SELECT f.doc_id,
           to_json(list_resize(list_slice(f.wa, 1, 8), 8, 'PAD')) AS words,
           to_json(list_slice(f.wa, 1, f.na)) AS a,
           to_json(list_slice(f.wb, 1, f.nb)) AS b,
           to_json([list_slice(n.s1, 1, n.k1), list_slice(n.s2, 1, n.kk2),
                    list_slice(n.s3, 1, n.kk3)]) AS nested
    FROM fin f JOIN k3 n ON f.doc_id = n.doc_id
    """,
)
def q_truncate_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full truncation surface in one pipeline: TruncateSingleField
    + Padding (reference tokenize.py:274-342), TruncateMultipleFields
    'longest' budget 20 (prompting.py:234-275), and
    TruncateMultipleNestedFields flattened budget 5 (prompting.py:
    313-335) — each on its own column of the same documents scan."""
    from ..operators.prompting import (
        TruncateMultipleFieldsMapper,
        TruncateMultipleNestedFieldsMapper,
    )

    from ..core.parallel import ensure_min_parallelism

    # r16 opt: widen the one-task scan before the slice/pad/truncate
    # array algebra (guide §2.5); per-doc outputs, order-independent
    df = ensure_min_parallelism(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).withColumn("words", F.split(F.col("text"), " ")).select(
        "doc_id",
        "words",
        F.col("words").alias("a"),
        F.slice(F.col("words"), 1, 12).alias("b"),
        F.array(
            F.slice("words", 1, 3),
            F.slice("words", 4, 3),
            F.slice("words", 7, 3),
        ).alias("nested"),
    )
    pipe = (
        TruncateSingleFieldMapper({"words": 8})
        >> PaddingMapper(8, "PAD", fields_to_pad=["words"])
        >> TruncateMultipleFieldsMapper(
            fields_to_truncate=["a", "b"], max_length=20, strategy="longest"
        )
        >> TruncateMultipleNestedFieldsMapper(
            fields_to_truncate=["nested"], max_length=5, strategy="uniform"
        )
    )
    return pipe.map(df).select("doc_id", "words", "a", "b", "nested")


# ---------------------------------------------------------------------------
# batching / order-sensitive grouping (reference batchers.py)
# ---------------------------------------------------------------------------


# gate slot freed round 9 for diversity_select: this exact mapper
# call (FixedBatchSizeMapper(10, order_by=["doc_id"],
# contiguous_key=True) on documents) runs verbatim as the first stage
# of the collate_pad_longest gate, whose oracle groups by doc_id // 10
# the same way — the batcher family stays driver-certified there.
def q_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedBatchSizeMapper over the dense doc_id key — the scalable
    contiguous-key path (plain hash aggregate, no global sort)."""
    from ..operators.batchers import FixedBatchSizeMapper

    df = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return FixedBatchSizeMapper(
        10, order_by=["doc_id"], contiguous_key=True
    ).map(df)


# ---------------------------------------------------------------------------
# prompting family (reference prompting.py)
# ---------------------------------------------------------------------------


# prompt_family rotated out round 14 (slot freed so the round-13
# flagship snapshot_lifecycle fits inside the driver's 50-query
# record): FillTextPromptMapper and FillEncodedPromptMapper now
# certify inside multiseq_family below — same documents scan, same
# per-doc column algebra, outputs renamed prompt/p_ids/p_am to avoid
# colliding with the multiseq input_ids/attention_mask columns.


@query(
    "multiseq_family",
    oracle="""
    SELECT doc_id,
           'doc ' || doc_id || ' [' || lang || ']: ' || source AS prompt,
           to_json([CAST(1 AS BIGINT), 1, doc_id % 10, doc_id % 7])
               AS p_ids,
           to_json([1, 1, 1, 1]) AS p_am,
           to_json([101, doc_id, doc_id + 1, 102, doc_id + 2, 103])
               AS input_ids,
           to_json([1, 1, 1, 1, 1, 1]) AS attention_mask,
           to_json([[1, 1, 1, 1], [1, 1]]) AS am_pad,
           to_json([[CAST(0 AS BIGINT), 0, 0],
                    [doc_id % 2, doc_id % 2, doc_id % 2]]) AS tt_pad,
           to_json([[doc_id % 5, CAST(-100 AS BIGINT)], [doc_id % 7]])
               AS labels,
           to_json([[doc_id % 5, doc_id % 5], [doc_id % 7]]) AS labels_all
    FROM documents
    """,
)
def q_multiseq_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-sequence surface in one pipeline over synthetic
    two-sequence rows: AttentionMaskSequencePadding +
    TokenTypeIdsSequencePadding (reference multiseq.py:106-169),
    TokensSequencesPadding >> MakeAttentionMask >> SequencesConcatenate
    (multiseq.py:27-103, 172-194, 519-547), and SingleValueToSequence
    'first'/'all' (multiseq.py:452-516).

    Since round 14 (prompt_family rotated out under the driver's
    50-query record) this gate also certifies FillTextPromptMapper
    (reference prompting.py:151-231) and FillEncodedPromptMapper
    (prompting.py:447-555) on the same scan: the literal segment
    'q: ' tokenizes to two [UNK] pieces under the tiny vocab; field
    ids concatenate after (columns prompt / p_ids / p_am)."""
    from ..functions.wordpiece import tiny_bert_tokenizer
    from ..operators.prompting import (
        FillEncodedPromptMapper,
        FillTextPromptMapper,
    )
    from ..operators.multiseq import (
        AttentionMaskSequencePaddingMapper,
        MakeAttentionMaskMapper,
        SequencesConcatenateMapper,
        SingleValueToSequenceMapper,
        TokensSequencesPaddingMapper,
        TokenTypeIdsSequencePaddingMapper,
    )

    base = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.array(
            (F.col("doc_id") % 10).cast("bigint"),
            (F.col("doc_id") % 7).cast("bigint"),
        ).alias("ids"),
    )
    prompt_pipe = FillTextPromptMapper(
        "doc {doc_id} [{lang}]: {source}", "prompt"
    ) >> FillEncodedPromptMapper("q: {ids}", tokenizer=tiny_bert_tokenizer())
    base = (
        prompt_pipe.map(base)
        .withColumnRenamed("input_ids", "p_ids")
        .withColumnRenamed("attention_mask", "p_am")
        .select("doc_id", "prompt", "p_ids", "p_am")
    )

    labels = F.array(
        (F.col("doc_id") % 5).cast("bigint"),
        (F.col("doc_id") % 7).cast("bigint"),
    )
    df = base.select(
        "doc_id",
        "prompt",
        "p_ids",
        "p_am",
        F.array(F.array(F.lit(1), F.lit(1)), F.array(F.lit(1)))
        .cast("array<array<bigint>>")
        .alias("attention_mask"),
        F.array(
            F.array(F.lit(0), F.lit(0)),
            F.array(F.col("doc_id") % 2),
        )
        .cast("array<array<bigint>>")
        .alias("token_type_ids"),
        labels.alias("labels"),
        labels.alias("labels_all"),
    )
    pad_pipe = AttentionMaskSequencePaddingMapper(
        bos=[101], sep=[102], eos=[103]
    ) >> TokenTypeIdsSequencePaddingMapper(bos=[101], sep=[102], eos=[103])
    out = (
        pad_pipe.map(df)
        .withColumnRenamed("attention_mask", "am_pad")
        .withColumnRenamed("token_type_ids", "tt_pad")
    )

    two_seq = F.array(
        F.array(F.col("doc_id"), F.col("doc_id") + 1),
        F.array(F.col("doc_id") + 2),
    )
    out = out.withColumn("input_ids", two_seq).withColumn(
        "like_ids", two_seq.cast("array<array<bigint>>")
    )
    tok_pipe = (
        TokensSequencesPaddingMapper(bos=[101], sep=[102], eos=[103])
        >> MakeAttentionMaskMapper()
        >> SequencesConcatenateMapper(["input_ids"])
        >> SingleValueToSequenceMapper(
            "labels", like_field="like_ids", strategy="first"
        )
        >> SingleValueToSequenceMapper(
            "labels_all", like_field="like_ids", strategy="all"
        )
    )
    out = tok_pipe.map(out)
    return out.select(
        "doc_id",
        "prompt",
        "p_ids",
        "p_am",
        "input_ids",
        F.flatten("attention_mask").alias("attention_mask"),
        "am_pad",
        "tt_pad",
        "labels",
        "labels_all",
    )


# labels_mask_one rotated out round 10 (slot freed for
# diversity_select under the driver's 50-query cap):
# LabelsMaskerMapper strategy='one' (reference multiseq.py:197-295)
# now certifies inside multiseq_stride_pack below — the masker runs
# over each packed window's per-sequence lengths, so the
# position-explode + one-hot-unmask semantics ride the same oracle
# (the recursive-CTE walk gains a label/UNNEST tail stage, exactly
# the CTE the retired labels_mask_one gate used).


@query(
    "multiseq_stride_pack",
    oracle="""
    WITH RECURSIVE
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    sq AS (
        SELECT doc_id,
               list_transform(words[1:9],
                   t -> range(1, greatest(least(length(t), 10), 1) + 1)) AS seqs
        FROM w
    ),
    seq AS (
        SELECT doc_id, g - 1 AS pos, len(seqs[g]) AS l
        FROM (SELECT doc_id, seqs,
                     unnest(generate_series(1, len(seqs))) AS g FROM sq)
    ),
    walk(doc_id, pos, start, cum) AS (
        SELECT doc_id, 0, 0, l FROM seq WHERE pos = 0
        UNION ALL
        SELECT s.doc_id, s.pos,
               CASE WHEN wk.cum + s.l > 12 OR s.pos - wk.start >= 4
                    THEN s.pos ELSE wk.start END,
               CASE WHEN wk.cum + s.l > 12 OR s.pos - wk.start >= 4
                    THEN s.l ELSE wk.cum + s.l END
        FROM walk wk JOIN seq s ON s.doc_id = wk.doc_id AND s.pos = wk.pos + 1
    ),
    win AS (
        SELECT doc_id, start, max(pos) + 1 AS e
        FROM walk GROUP BY doc_id, start
    ),
    packed AS (
        SELECT win.doc_id AS doc_id,
               sq.seqs[win.start + 1 : win.e] AS seqs
        FROM win JOIN sq USING (doc_id)
    ),
    lab AS (
        SELECT doc_id, seqs,
               list_transform(seqs, s -> CAST(len(s) AS BIGINT)) AS labels
        FROM packed
    )
    SELECT doc_id, to_json(seqs) AS seqs,
           to_json(list_transform(range(0, len(labels)),
                          j -> CASE WHEN j = pos THEN labels[j + 1]
                               ELSE -100 END)) AS labels
    FROM lab, UNNEST(range(0, len(labels))) AS t(pos)
    """,
)
def q_multiseq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MultiSequenceStriderMapper greedy packing (reference
    multiseq.py:298-449): pack up to 4 sequences / 12 cumulative tokens
    per window.  The sequential greedy fold is mirrored in the oracle
    by a recursive CTE walking positions per doc and resetting the
    running (start, cum) at each break — both length- and count-driven
    breaks are exercised (sequence sizes vary with word length).

    Family gate since round 10: LabelsMaskerMapper strategy='one'
    (reference multiseq.py:197-295, the retired ``labels_mask_one``
    gate) runs over each packed window's per-sequence lengths — the
    position explode multiplies cardinality and the -100 one-hot
    unmask is checked value-for-value by the oracle's UNNEST tail."""
    from ..operators.multiseq import (
        LabelsMaskerMapper,
        MultiSequenceStriderMapper,
    )

    from ..core.parallel import ensure_min_parallelism

    # r16 opt: widen the one-task scan before the nested-array stride/
    # mask algebra; output is keyed per doc_id (no encounter-order
    # dependence), so the round-robin exchange is value-neutral
    # (r17: a 64 KB/task size cap was probed and LOST here — 0.89 ->
    # 0.97 min-of-7; the nested stride/mask algebra amortizes full
    # width.  Don't re-try.)
    df = ensure_min_parallelism(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).withColumn("words", F.split(F.col("text"), " ")).select(
        "doc_id",
        F.transform(
            F.slice(F.col("words"), 1, 9),
            lambda w: F.sequence(
                F.lit(1),
                F.greatest(F.least(F.length(w), F.lit(10)), F.lit(1)),
            ),
        ).alias("seqs"),
    )
    out = MultiSequenceStriderMapper(
        max_stride_count=4,
        max_length=12,
        length_reference_field="seqs",
        fields_to_stride=["seqs"],
    ).map(df)
    out = out.withColumn(
        "labels",
        F.transform(F.col("seqs"), lambda s: F.size(s).cast("bigint")),
    )
    return LabelsMaskerMapper(strategy="one").map(out)


@query(
    "words_unicode",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           array_to_string(
               list_slice(
                   list_filter(string_split_regex(text, '\\s+'), t -> t != ''),
                   1, 5),
               ' ') AS t,
           to_json(list_transform(words,
               t -> CASE WHEN length(t) <= 3 THEN '_W_' ELSE t END)) AS words
    FROM documents JOIN w USING (doc_id)
    """,
)
def q_words_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextToWords(ws) >> TruncateSingleField >> WordsToText (reference
    text.py:67-114) plus ValidUnicodeMapper (tokenize.py:232-271) on a
    parallel words column: short words are uppercased first, so exactly
    the all-'Lu' tokens (length <= 3, all-alpha corpus) get replaced."""
    from ..operators.text import TextToWordsMapper, WordsToTextMapper
    from ..operators.tokenize import ValidUnicodeMapper

    from ..core.parallel import ensure_min_parallelism

    # r16 opt: widen the one-task scan before the split/case/unicode
    # per-row work (guide §2.5); per-doc outputs, order-independent
    df = ensure_min_parallelism(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).withColumn("words", F.split(F.col("text"), " ")).select(
        "doc_id",
        F.col("text").alias("t"),
        F.transform(
            F.col("words"),
            lambda w: F.when(F.length(w) <= 3, F.upper(w)).otherwise(w),
        ).alias("words"),
    )
    pipe = (
        TextToWordsMapper("t", splitter="ws")
        >> TruncateSingleFieldMapper({"t": 5})
        >> WordsToTextMapper("t")
        >> ValidUnicodeMapper(
            input_fields=["words"],
            unicode_categories=["Lu"],
            replace_token="_W_",
        )
    )
    return pipe.map(df).select("doc_id", "t", "words")


# ---------------------------------------------------------------------------
# flagship — a realistic document-preprocessing pipeline composing the
# mapper families end-to-end (filter -> split -> stride -> prompt)
# ---------------------------------------------------------------------------


@query(
    "flagship_preprocess",
    oracle="""
    WITH f AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\\s+'), t -> t != '')
                   AS words
        FROM documents WHERE n_chars >= 100
    ), s AS (
        SELECT doc_id, lang, list_slice(words, st + 1, st + 16) AS win
        FROM (
            SELECT doc_id, lang, words,
                   CASE WHEN len(words) < 16 THEN [0]
                        ELSE range(0, len(words) - 15, 16) END AS starts
            FROM f
        ), UNNEST(starts) AS t(st)
    )
    SELECT doc_id, lang,
           'lang=' || lang || ' text=' || array_to_string(win, ' ') AS prompt,
           len(win) AS n_tokens
    FROM s
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter >> TextToWords >> Strider >> WordsToText >> FillTextPrompt:
    the reference's signature pipeline shape (README example), one fused
    narrow Catalyst plan — no shuffle anywhere."""
    from ..operators.text import TextToWordsMapper, WordsToTextMapper

    df = load(spark, sf_dir, "documents")
    pipe = (
        FilterMapper("n_chars", ">=", 100)
        >> ChangeFieldsMapper(keep_fields=["doc_id", "lang", "text"])
        >> RenameFieldsMapper({"text": "win"})
        >> TextToWordsMapper("win", splitter="ws")
        >> SingleSequenceStriderMapper("win", max_length=16, stride=16)
        >> MakeFieldMapper("n_tokens", 0)
    )
    out = pipe.map(df)
    out = out.withColumn("n_tokens", F.size("win").cast("bigint"))
    out = WordsToTextMapper("win").map(out)
    from ..operators.prompting import FillTextPromptMapper

    out = FillTextPromptMapper("lang={lang} text={win}", "prompt").map(out)
    return out.select("doc_id", "lang", "prompt", "n_tokens")


# ---------------------------------------------------------------------------
# python tier — jinja rendering, tokenization, collation
# ---------------------------------------------------------------------------


@query(
    "fewshot_jinja",
    oracle="""
    WITH r AS (
        SELECT doc_id,
               'lang=' || lang || ' n=' || n_chars AS rendered,
               source AS tgt
        FROM documents
    )
    SELECT string_agg(rendered, ';' ORDER BY doc_id) AS src,
           string_agg(tgt, '|' ORDER BY doc_id) AS tgts
    FROM r GROUP BY doc_id // 3 HAVING count(*) = 3
    """,
)
def q_fewshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jinja family as ONE composed gate (round-5 fold that freed a
    registry slot for sketch_distinct): JinjaMapper (reference
    promptsource.py:313-354) renders a source+target template per row
    inside Arrow-batched mapInPandas, then FewShotJinjaMapper
    (promptsource.py:357-470) packs 2 shots + 1 sample per consecutive
    group FROM THE RENDERED FIELD — so a rendering bug and a packing
    bug both surface in the same oracle."""
    from ..operators.jinja import FewShotJinjaMapper, JinjaMapper

    df = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "source"
    )
    df = JinjaMapper(
        "lang={{lang}} n={{n_chars}}|||{{source}}",
        source_field_name="rendered",
        target_field_name="tgt",
    ).map(df)
    out = FewShotJinjaMapper(
        "{% for s in __shots__ %}{{s.rendered}};{% endfor %}{{rendered}}"
        "|||{% for s in __shots__ %}{{s.tgt}}|{% endfor %}{{tgt}}",
        num_shots=2,
        order_by=["doc_id"],
        contiguous_key=True,
        output_source_field_name="src",
        output_target_field_name="tgts",
    ).map(df)
    return out.select("src", "tgts")


@query(
    "tokenize_wordpiece",
    oracle="""
    SELECT doc_id,
           to_json(list_concat([CAST(2 AS BIGINT)],
               list_concat(
                   list_transform(string_split(text, ' '),
                       w -> CASE WHEN w = 'a' THEN CAST(8 AS BIGINT)
                                 WHEN w = 'the' THEN 15
                                 ELSE 1 END),
                   [CAST(3 AS BIGINT)]))) AS input_ids
    FROM documents
    """,
)
def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TokenizerMapper with the deterministic WordPiece tokenizer
    (reference tokenize.py:84-229); oracle derived from the tiny vocab
    (every corpus word maps to one piece)."""
    from ..core.parallel import ensure_min_parallelism
    from ..functions.wordpiece import tiny_bert_tokenizer
    from ..operators.hf_tokenize import TokenizerMapper

    # r16 opt: single-row-group scan -> one task; spread the per-word
    # WordPiece expression tree across cores (guide §2.5)
    df = ensure_min_parallelism(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    out = TokenizerMapper(
        tiny_bert_tokenizer(model_max_length=4096),
        input_field="text",
        return_attention_mask=False,
    ).map(df)
    return out.select("doc_id", "input_ids")


@query(
    "collate_pad_longest",
    oracle="""
    WITH b AS (
        SELECT doc_id // 10 AS gid, doc_id,
               list_transform(string_split(text, ' '),
                              w -> CAST(length(w) AS BIGINT)) AS ids
        FROM documents
    ), g AS (
        SELECT list(doc_id ORDER BY doc_id) AS doc_id,
               list(ids ORDER BY doc_id) AS ids,
               max(len(ids)) AS m
        FROM b GROUP BY gid
    )
    SELECT to_json(doc_id) AS doc_id,
           to_json(list_transform(ids,
               s -> s || list_transform(range(0, m - len(s)),
                                        x -> CAST(0 AS BIGINT)))) AS ids
    FROM g
    """,
)
def q_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FixedBatchSize >> ListCollator pad-to-longest
    (reference collators.py:318-475).  Also the driver certification
    for FixedBatchSizeMapper itself since round 9 (the freed
    batch_fixed_size gate ran the identical first stage)."""
    from ..operators.batchers import FixedBatchSizeMapper
    from ..operators.collators import ListCollatorMapper

    df = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            F.split("text", " "), lambda w: F.length(w).cast("bigint")
        ).alias("ids"),
    )
    pipe = FixedBatchSizeMapper(
        10, order_by=["doc_id"], contiguous_key=True
    ) >> ListCollatorMapper(unk_fields_pad_id=0)
    return pipe.map(df)


# register the beyond-reference and round-2 coverage query blocks;
# scale block first so the driver's 50-query correctness cap certifies
# the dedup/ANN/sessionization rows before anything else can crowd
# them out (round-2 lesson: registration order is certification order)
from . import queries_scale, queries_more  # noqa: E402,F401
