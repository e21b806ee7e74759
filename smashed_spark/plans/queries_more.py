"""Round-2 gate queries: oracle coverage for operators that round 1
left unit-only (VERDICT.md operator table) — masks, multiseq padding
variants, nested truncation, unicode filtering, encode/decode, encoded
prompts, located striding, glom paths — plus a second TPC-H-shaped
join headliner.

Same conventions as queries.py; array outputs are JSON-wrapped on both
sides by the registry / explicit ``to_json`` in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import load, query


def _words(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").withColumn(
        "words", F.split(F.col("text"), " ")
    )


# ---------------------------------------------------------------------------
# masks family (reference masks.py:62-143) — the two directions the
# round-1 gate didn't cover
# ---------------------------------------------------------------------------


@query(
    "range_to_mask",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    m AS (SELECT doc_id, len(words) AS n, doc_id % len(words) AS s FROM w)
    SELECT doc_id,
           to_json(list_transform(range(0, n),
               i -> CASE WHEN i >= s AND i < least(s + 3, n)
                    THEN 1 ELSE 0 END)) AS mask
    FROM m
    """,
)
def q_range_to_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeToMaskMapper (reference masks.py:62-87): a [start, end)
    pair list painted onto a words-shaped mask."""
    from ..operators.masks import RangeToMaskMapper

    df = _words(spark, sf_dir)
    n = F.size("words")
    s = (F.col("doc_id") % n).cast("bigint")
    df = df.withColumn(
        "ranges", F.array(F.array(s, F.least(s + 3, n.cast("bigint"))))
    )
    out = RangeToMaskMapper(
        mask_field_name="mask",
        reference_field_name="words",
        locations_field_name="ranges",
    ).map(df)
    return out.select("doc_id", "mask")


@query(
    "mask_to_indices",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           to_json(list_filter(range(0, len(words)),
                               i -> i % 3 = doc_id % 3)) AS locs
    FROM w
    """,
)
def q_mask_to_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaskToIndicesMapper (reference masks.py:90-143): mask -> index
    list of the fill positions."""
    from ..operators.masks import MaskToIndicesMapper

    df = _words(spark, sf_dir)
    n = F.size("words")
    mask = F.transform(
        F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
            F.array().cast("array<integer>")
        ),
        lambda i: F.when(
            i % 3 == F.col("doc_id") % 3, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    df = df.withColumn("mask", mask)
    out = MaskToIndicesMapper(
        mask_field_name="mask", locations_field_name="locs"
    ).map(df)
    return out.select("doc_id", "locs")


# ---------------------------------------------------------------------------
# multiseq padding variants (reference multiseq.py:106-169, 452-516)
# ---------------------------------------------------------------------------


@query(
    "attention_type_padding",
    oracle="""
    SELECT doc_id,
           to_json([[1, 1, 1, 1], [1, 1]]) AS attention_mask,
           to_json([[CAST(0 AS BIGINT), 0, 0],
                    [doc_id % 2, doc_id % 2, doc_id % 2]]) AS token_type_ids
    FROM documents
    """,
)
def q_attention_type_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AttentionMaskSequencePadding (1s at bos/sep/eos slots) and
    TokenTypeIdsSequencePadding (repeat first symbol; sep at START of
    non-first sequences) over synthetic two-sequence rows."""
    from ..operators.multiseq import (
        AttentionMaskSequencePaddingMapper,
        TokenTypeIdsSequencePaddingMapper,
    )

    df = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array(F.array(F.lit(1), F.lit(1)), F.array(F.lit(1)))
        .cast("array<array<bigint>>")
        .alias("attention_mask"),
        F.array(
            F.array(F.lit(0), F.lit(0)),
            F.array(F.col("doc_id") % 2),
        )
        .cast("array<array<bigint>>")
        .alias("token_type_ids"),
    )
    pipe = AttentionMaskSequencePaddingMapper(
        bos=[101], sep=[102], eos=[103]
    ) >> TokenTypeIdsSequencePaddingMapper(bos=[101], sep=[102], eos=[103])
    out = pipe.map(df)
    return out.select("doc_id", "attention_mask", "token_type_ids")


@query(
    "single_value_seq",
    oracle="""
    SELECT doc_id,
           to_json([[doc_id % 5, CAST(-100 AS BIGINT)], [doc_id % 7]])
               AS labels,
           to_json([[doc_id % 5, doc_id % 5], [doc_id % 7]]) AS labels_all
    FROM documents
    """,
)
def q_single_value_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SingleValueToSequenceMapper strategies 'first' and 'all'
    (reference multiseq.py:452-516)."""
    from ..operators.multiseq import SingleValueToSequenceMapper

    labels = F.array(
        (F.col("doc_id") % 5).cast("bigint"),
        (F.col("doc_id") % 7).cast("bigint"),
    )
    like = F.array(
        F.array(F.col("doc_id"), F.col("doc_id") + 1),
        F.array(F.col("doc_id") + 2),
    ).cast("array<array<bigint>>")
    df = load(spark, sf_dir, "documents").select(
        "doc_id",
        labels.alias("labels"),
        labels.alias("labels_all"),
        like.alias("input_ids"),
    )
    pipe = SingleValueToSequenceMapper(
        "labels", like_field="input_ids", strategy="first"
    ) >> SingleValueToSequenceMapper(
        "labels_all", like_field="input_ids", strategy="all"
    )
    out = pipe.map(df)
    return out.select("doc_id", "labels", "labels_all")


# ---------------------------------------------------------------------------
# nested truncation (reference prompting.py:313-335 + shape_utils)
# ---------------------------------------------------------------------------


@query(
    "truncate_nested",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    s AS (
        SELECT doc_id, list_slice(words, 1, 3) AS s1,
               list_slice(words, 4, 6) AS s2,
               list_slice(words, 7, 9) AS s3
        FROM w
    ), k AS (
        SELECT doc_id, s1, s2, s3, least(len(s1), 5) AS k1 FROM s
    ), k2 AS (
        SELECT *, least(len(s2), 5 - k1) AS kk2 FROM k
    ), k3 AS (
        SELECT *, least(len(s3), 5 - k1 - kk2) AS kk3 FROM k2
    )
    SELECT doc_id,
           to_json([list_slice(s1, 1, k1), list_slice(s2, 1, kk2),
                    list_slice(s3, 1, kk3)]) AS nested
    FROM k3
    """,
)
def q_truncate_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TruncateMultipleNestedFieldsMapper: flattened budget 5 over three
    word sub-lists; zero-budget tails stay as [] (reference
    shape_utils.reconstruct_from_indices)."""
    from ..operators.prompting import TruncateMultipleNestedFieldsMapper

    df = _words(spark, sf_dir).select(
        "doc_id",
        F.array(
            F.slice("words", 1, 3),
            F.slice("words", 4, 3),
            F.slice("words", 7, 3),
        ).alias("nested"),
    )
    out = TruncateMultipleNestedFieldsMapper(
        fields_to_truncate=["nested"], max_length=5, strategy="uniform"
    ).map(df)
    return out.select("doc_id", "nested")


# ---------------------------------------------------------------------------
# unicode filtering (reference tokenize.py:232-271)
# ---------------------------------------------------------------------------


@query(
    "valid_unicode",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           to_json(list_transform(words,
               t -> CASE WHEN length(t) <= 3 THEN '_W_' ELSE t END)) AS words
    FROM w
    """,
)
def q_valid_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ValidUnicodeMapper: short words are uppercased first, so exactly
    the all-'Lu' tokens (length <= 3, all-alpha corpus) get replaced."""
    from ..operators.tokenize import ValidUnicodeMapper

    df = _words(spark, sf_dir).withColumn(
        "words",
        F.transform(
            F.col("words"),
            lambda w: F.when(F.length(w) <= 3, F.upper(w)).otherwise(w),
        ),
    )
    out = ValidUnicodeMapper(
        input_fields=["words"],
        unicode_categories=["Lu"],
        replace_token="_W_",
    ).map(df)
    return out.select("doc_id", "words")


# ---------------------------------------------------------------------------
# encode / decode round trip (reference prompting.py:36-148, decoding.py)
# ---------------------------------------------------------------------------


@query(
    "encode_decode",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           to_json(list_transform(words,
               t -> CASE WHEN t = 'a' THEN CAST(8 AS BIGINT)
                         WHEN t = 'the' THEN 15 ELSE 1 END)) AS ids,
           array_to_string(list_transform(words,
               t -> CASE WHEN t = 'a' THEN 'a' WHEN t = 'the' THEN 'the'
                    ELSE '[UNK]' END), ' ') AS decoded
    FROM w
    """,
)
def q_encode_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EncodeFieldsMapper (no special tokens) then DecodingMapper on a
    copy: the tiny-vocab corpus maps every word to one piece, so both
    directions have exact oracles."""
    from ..functions.wordpiece import tiny_bert_tokenizer
    from ..operators.hf_tokenize import DecodingMapper, EncodeFieldsMapper

    tok = tiny_bert_tokenizer(model_max_length=4096)
    df = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").alias("ids"), F.col("text").alias("decoded")
    )
    pipe = EncodeFieldsMapper(["ids", "decoded"], tok) >> DecodingMapper(
        tok, fields=["decoded"]
    )
    return pipe.map(df).select("doc_id", "ids", "decoded")


@query(
    "fill_encoded_prompt",
    oracle="""
    SELECT doc_id,
           to_json([CAST(1 AS BIGINT), 1, doc_id % 10, doc_id % 7])
               AS input_ids,
           to_json([1, 1, 1, 1]) AS attention_mask
    FROM documents
    """,
)
def q_fill_encoded_prompt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FillEncodedPromptMapper: the literal segment 'q: ' tokenizes to
    two [UNK] pieces under the tiny vocab; field ids concatenate after
    (reference prompting.py:447-555)."""
    from ..functions.wordpiece import tiny_bert_tokenizer
    from ..operators.prompting import FillEncodedPromptMapper

    df = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.array(
            (F.col("doc_id") % 10).cast("bigint"),
            (F.col("doc_id") % 7).cast("bigint"),
        ).alias("ids"),
    )
    out = FillEncodedPromptMapper(
        "q: {ids}", tokenizer=tiny_bert_tokenizer()
    ).map(df)
    return out.select("doc_id", "input_ids", "attention_mask")


# ---------------------------------------------------------------------------
# located striding (reference shape.py:250-294)
# ---------------------------------------------------------------------------


@query(
    "strider_locations",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    s AS (
        SELECT doc_id, words,
               CASE WHEN len(words) < 5 THEN [0]
                    ELSE range(0, len(words) - 4, 5) END AS starts
        FROM w
    ), x AS (
        SELECT doc_id, list_slice(words, st + 1, st + 5) AS win, st
        FROM s, UNNEST(starts) AS t(st)
    )
    SELECT doc_id, to_json(win) AS win,
           CASE WHEN (st <= 3 AND 3 < st + len(win))
                  OR (st < 6 AND 6 <= st + len(win))
                THEN 'keep' ELSE 'drop' END AS tag
    FROM x
    """,
)
def q_strider_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SingleSequenceStriderMapperWithLocations: windows overlapping the
    [3, 6) span keep their tag, others get the replacement.  With
    stride == max_length the window's token range is [st, st+len)."""
    from ..operators.shape import SingleSequenceStriderMapperWithLocations

    df = _words(spark, sf_dir).select(
        "doc_id",
        "words",
        F.array(
            F.array(F.lit(3).cast("bigint"), F.lit(6).cast("bigint"))
        ).alias("locs"),
        F.lit("keep").alias("tag"),
    )
    out = SingleSequenceStriderMapperWithLocations(
        field_to_stride="words",
        max_length=5,
        field_with_locations="locs",
        fields_replacement_map={"tag": "drop"},
    ).map(df)
    return out.select("doc_id", F.col("words").alias("win"), "tag")


# ---------------------------------------------------------------------------
# glom path extraction (reference glom.py:51-71)
# ---------------------------------------------------------------------------


@query(
    "glom_path",
    oracle="""
    SELECT doc_id, lang AS glang, source AS gsrc FROM documents
    """,
)
def q_glom_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GlomMapper native tier: tuple path and dotted path over nested
    structs compile to plain column accesses."""
    from ..operators.glom import GlomMapper

    df = load(spark, sf_dir, "documents").withColumn(
        "meta",
        F.struct(
            F.col("lang").alias("l"),
            F.struct(F.col("source").alias("s")).alias("inner"),
        ),
    )
    out = GlomMapper(
        {"glang": ("meta", "l"), "gsrc": "meta.inner.s"}
    ).map(df)
    return out.select("doc_id", "glang", "gsrc")


# ---------------------------------------------------------------------------
# relational analytics: TPC-H Q3-shaped shipping priority
# ---------------------------------------------------------------------------


@query(
    "join_shipping_priority",
    oracle="""
    WITH r AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01'
          AND l.l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 3, 4
    )
    SELECT l_orderkey, revenue, o_orderdate, o_orderpriority, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY revenue DESC, l_orderkey) AS rank
        FROM r
    ) WHERE rank <= 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: the customer dimension broadcasts (the fact side
    never shuffles for it), lineitem joins orders on the shuffle key
    both sides already share, and the final top-10 ranks a tiny
    aggregated set — rounded revenue makes the order engine-stable."""
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01"
    )
    lineitem = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01"
    )
    joined = (
        lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    )
    agg = joined.groupBy(
        "l_orderkey", "o_orderdate", "o_orderpriority"
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "rank"
        )
    )


# ---------------------------------------------------------------------------
# sources / sinks round-trips (reference loaders.py:100-192) and the
# skew utilities (core/skew.py) — previously unit-only
# ---------------------------------------------------------------------------


@query(
    "csv_roundtrip",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_csv sink then CsvLoaderMapper (reference loaders.py:139-168):
    the full write/read cycle must preserve every row and value."""
    import tempfile

    from ..sources.loaders import CsvLoaderMapper
    from ..sources.sinks import write_csv

    out_dir = tempfile.mkdtemp(prefix="smashed_csv_") + "/docs"
    df = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    write_csv(df, out_dir, mode="overwrite")
    paths = spark.createDataFrame([(out_dir,)], "path: string")
    loaded = CsvLoaderMapper("path").map(paths)
    return loaded.select(
        F.col("doc_id").cast("bigint"),
        "lang",
        F.col("n_chars").cast("bigint"),
    )


@query(
    "jsonl_roundtrip",
    oracle="""
    SELECT doc_id, lang, source, text FROM documents
    """,
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_jsonl (gzip) then JsonlLoaderMapper (reference
    loaders.py:171-192): lossless typed round-trip through JSON lines."""
    import tempfile

    from ..sources.loaders import JsonlLoaderMapper
    from ..sources.sinks import write_jsonl

    out_dir = tempfile.mkdtemp(prefix="smashed_jsonl_") + "/docs"
    df = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    write_jsonl(df, out_dir, mode="overwrite")
    paths = spark.createDataFrame([(out_dir,)], "path: string")
    loaded = JsonlLoaderMapper("path").map(paths)
    return loaded.select("doc_id", "lang", "source", "text")


@query(
    "concat_sources",
    oracle="""
    SELECT doc_id, lang FROM documents WHERE n_chars > 500
    UNION ALL
    SELECT doc_id, lang FROM documents WHERE n_chars <= 100
    """,
)
def q_concat_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concatenate_datasets (reference combine_strategy='concatenate',
    loaders.py:100-116)."""
    from ..sources.loaders import concatenate_datasets

    docs = load(spark, sf_dir, "documents")
    a = docs.filter("n_chars > 500").select("doc_id", "lang")
    b = docs.filter("n_chars <= 100").select("doc_id", "lang")
    return concatenate_datasets([a, b])


@query(
    "interleave_sources",
    oracle="""
    WITH a AS (
        SELECT doc_id, lang, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
               0 AS src
        FROM documents WHERE n_chars > 500
    ), b AS (
        SELECT doc_id, lang, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rn,
               1 AS src
        FROM documents WHERE n_chars <= 100
    ), u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
    n AS (SELECT least((SELECT count(*) FROM a),
                       (SELECT count(*) FROM b)) AS m)
    SELECT doc_id, lang, CAST(rn * 2 + src AS BIGINT) AS ord
    FROM u, n WHERE rn < m
    """,
)
def q_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """interleave_datasets round-robin (reference
    combine_strategy='interleave'): row i of each source alternating,
    stopping with the shortest source; the explicit order column is the
    downstream ordering key."""
    from ..sources.loaders import INTERLEAVE_ORDER, interleave_datasets

    docs = load(spark, sf_dir, "documents")
    a = docs.filter("n_chars > 500").select("doc_id", "lang")
    b = docs.filter("n_chars <= 100").select("doc_id", "lang")
    out = interleave_datasets(
        [a, b], order_by=["doc_id"], keep_order_column=True
    )
    return out.select(
        "doc_id", "lang", F.col(INTERLEAVE_ORDER).cast("bigint").alias("ord")
    )


@query(
    "skew_salted_agg",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_groupby_agg two-phase aggregation: partials on
    (key, salt), algebraic re-merge on the key — byte-identical to the
    direct group-by, immune to hot keys."""
    from ..core.skew import salted_groupby_agg

    out = salted_groupby_agg(
        load(spark, sf_dir, "events"),
        ["user_id"],
        {"n_events": ("event_id", "count"), "total_value": ("value", "sum")},
        num_salts=8,
    )
    return out.withColumn("total_value", F.round("total_value", 6))


@query(
    "skew_salted_join",
    oracle="""
    SELECT c.c_nationkey AS nationkey,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_join: dimension replicated num_salts times, fact scattered
    uniformly, equi-join on (key, salt) — result equals the direct join
    even under key skew."""
    from ..core.skew import salted_join

    orders = load(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    joined = salted_join(orders, customer, on="custkey", num_salts=8)
    return joined.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
