"""Fixed-block sequence packing — the pretraining data-prep step that
concatenates every document's token stream (in a stable corpus order,
with an optional per-document separator) and slices the result into
fixed-size training blocks, documents crossing block boundaries.

The reference stops at per-document batching/striding
(src/smashed/mappers/batchers.py, shape.py — SingleSequenceStrider
packs *within* a document); cross-document packing is the missing
last step every LLM pretraining pipeline runs (GPT-style "chunk the
concatenated corpus into context-length blocks"), so it belongs to
the beyond-reference curation engine.

Scale design
------------
The only global computation is an exclusive prefix sum of token
counts in corpus order — done shuffle-free with the same two-phase
trick as ``core.order.with_row_index``: range-partitioned sort, ONE
tiny per-partition aggregate collected to the driver (one row per
partition), broadcast offsets back, and a *partition-local* running
window for the within-partition part.  No single-task window, no
O(corpus) driver state.

Block assembly is then embarrassingly parallel: each document knows
its global token span ``[start, start+n)``, explodes into at most
``ceil(n/B)+1`` (block, fragment) rows — a bounded fan-out, narrow —
and one shuffle on ``block_id`` reassembles blocks, each fragment
list tiny (≤ B tokens total per block).

Determinism: given a total ``order_by`` key, output blocks are
bit-stable across runs and cluster sizes — which is what makes the
DuckDB gate oracle possible, and what reproducible-training users
need.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..core.mapper import SparkMapper


def with_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    col_name: str = "__prefix__",
    require_unique: bool = True,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_by`` order,
    computed scalably: global range-partitioned sort, per-partition
    totals collected to the driver (one row per partition — KB-sized),
    cumulative offsets broadcast back, partition-local running-sum
    window for the intra-partition part.

    ``order_by`` must be a TOTAL key: with ties the within-partition
    row order (and therefore each tied row's prefix value) is
    arbitrary, and callers that join the result back by key fan out.
    With ``require_unique`` (default) duplicate keys raise
    ``ValueError`` — checked for free inside the already-run
    per-partition aggregate (range partitioning maps equal keys to the
    same partition, so a per-partition count vs count-distinct
    comparison sees every duplicate).
    """
    df = df.orderBy(*order_by)
    spark = df.sparkSession
    in_cols = df.columns
    # pin the partitioning so phase 1 (per-partition totals) and
    # phase 2 (per-row assembly) can never see different partition
    # boundaries (same discipline as core/order.with_row_index)
    tagged = df.withColumn(
        "__pid__", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    aggs = [F.sum(value_col).alias("__psum__")]
    if require_unique:
        # count_distinct skips NULLs, so count NULL-keyed rows apart:
        # a NULL order key is its own totality violation (it cannot be
        # deterministically ordered), not a "duplicate"
        any_null = None
        for c in order_by:
            cond = F.col(c).isNull()
            any_null = cond if any_null is None else (any_null | cond)
        aggs += [
            F.count(F.lit(1)).alias("__cnt__"),
            F.count_distinct(
                *[F.col(c) for c in order_by]
            ).alias("__dcnt__"),
            F.sum(any_null.cast("bigint")).alias("__nnull__"),
        ]
    sizes = tagged.groupBy("__pid__").agg(*aggs).collect()
    if require_unique:
        n_null = sum(r["__nnull__"] or 0 for r in sizes)
        if n_null:
            raise ValueError(
                f"with_prefix_sum: order_by {list(order_by)} has "
                f"{n_null} NULL-keyed row(s); a NULL key cannot be "
                "totally ordered. Filter or fill the key column, or "
                "pass require_unique=False if ties are acceptable."
            )
        n_dup = sum(
            r["__cnt__"] - r["__dcnt__"] for r in sizes
        )
        if n_dup:
            raise ValueError(
                f"with_prefix_sum: order_by {list(order_by)} is not a "
                f"total key ({n_dup} duplicate row(s)); prefix offsets "
                "would be ambiguous and key joins would fan out. "
                "Add a tiebreaker column or pass require_unique=False "
                "if ties are acceptable."
            )
    acc = 0
    offset_rows = []
    for r in sorted(sizes, key=lambda r: r["__pid__"]):
        offset_rows.append((r["__pid__"], acc))
        acc += r["__psum__"] or 0
    offsets = spark.createDataFrame(
        offset_rows, "__pid__: int, __off__: bigint"
    )
    run = Window.partitionBy("__pid__").orderBy(
        *[F.col(c) for c in order_by]
    ).rowsBetween(Window.unboundedPreceding, -1)
    out = tagged.join(F.broadcast(offsets), "__pid__").withColumn(
        col_name,
        (
            F.col("__off__")
            + F.coalesce(F.sum(value_col).over(run), F.lit(0))
        ).cast("bigint"),
    )
    return out.select(*in_cols, col_name)


class PackSequencesMapper(SparkMapper):
    """Concatenate every row's ``tokens_field`` array in ``order_by``
    order (appending ``separator`` after each document when given) and
    emit fixed ``block_size`` blocks:
    ``(block_id, n_tokens, n_docs, tokens)``.

    The trailing partial block is emitted too (callers who want only
    full blocks filter ``n_tokens == block_size``); empty documents
    contribute nothing unless a separator is set.
    """

    def __init__(
        self,
        tokens_field: str = "input_ids",
        order_by: Sequence[str] = ("doc_id",),
        block_size: int = 1024,
        separator: Optional[object] = None,
        block_field: str = "block_id",
        out_field: str = "tokens",
    ) -> None:
        if block_size < 1:
            raise ValueError("block_size must be >= 1")
        if not order_by:
            raise ValueError(
                "order_by is required: packing is order-sensitive"
            )
        self.tokens_field = tokens_field
        self.order_by = list(order_by)
        self.block_size = block_size
        self.separator = separator
        self.block_field = block_field
        self.out_field = out_field
        super().__init__(
            input_fields=[tokens_field, *order_by],
            output_fields=[block_field, "n_tokens", "n_docs", out_field],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        B = self.block_size
        toks: Column = F.col(self.tokens_field)
        if self.separator is not None:
            toks = F.concat(
                toks, F.array(F.lit(self.separator))
            )
        work = df.select(*self.order_by, toks.alias("__t__")).withColumn(
            "__n__", F.size("__t__").cast("bigint")
        )
        work = work.filter(F.col("__n__") > 0)
        # prefix-sum on a SLIM (key, count) projection — ~16 bytes/row —
        # then join the start offsets back by key: the wide token
        # payload crosses an exchange only twice (this join + the block
        # agg), instead of riding the range sort AND the prefix-sum
        # window shuffle too
        counts = with_prefix_sum(
            work.select(*self.order_by, "__n__"),
            "__n__",
            self.order_by,
            "__start__",
        ).select(*self.order_by, "__start__")
        work = work.join(counts, self.order_by)

        # fragment explode: document [start, start+n) overlaps blocks
        # start div B .. (start+n-1) div B — ceil(n/B)+1 rows at most
        first_b = F.expr(f"__start__ div {B}")
        last_b = F.expr(f"(__start__ + __n__ - 1) div {B}")
        frags = (
            work.withColumn(
                "__b__", F.explode(F.sequence(first_b, last_b))
            )
            .withColumn(
                "__s__",  # global start of this fragment
                F.greatest(F.col("__start__"), F.col("__b__") * B),
            )
            .withColumn(
                "__e__",  # global end (exclusive)
                F.least(
                    F.col("__start__") + F.col("__n__"),
                    (F.col("__b__") + 1) * B,
                ),
            )
            .select(
                F.col("__b__"),
                F.col("__s__"),
                F.slice(
                    "__t__",
                    (F.col("__s__") - F.col("__start__") + 1).cast("int"),
                    (F.col("__e__") - F.col("__s__")).cast("int"),
                ).alias("__frag__"),
            )
        )
        # ONE shuffle on block_id; fragments are struct-sorted by their
        # global start offset (codegen'd binary compare), then flattened
        out = (
            frags.groupBy(F.col("__b__").alias(self.block_field))
            .agg(
                F.flatten(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__s__", "__frag__"))
                        ),
                        lambda s: s["__frag__"],
                    )
                ).alias(self.out_field),
                F.count(F.lit(1)).alias("n_docs"),
            )
            .withColumn(
                "n_tokens", F.size(self.out_field).cast("bigint")
            )
        )
        return out.select(
            self.block_field, "n_tokens", "n_docs", self.out_field
        )


class BinPackSequencesMapper(SparkMapper):
    """Pack WHOLE documents into capacity-``block_size`` bins without
    splitting any document — the SFT/instruction-tuning variant of
    packing (examples must stay intact; contrast
    :class:`PackSequencesMapper`, which slices the pretraining stream).

    Algorithm: documents are hash-assigned to ``num_groups``
    independent groups (``xxhash64(key) % num_groups``), and each
    group runs first-fit-decreasing — docs sorted by (len desc, key),
    each placed into the first bin with room.  FFD is the classic
    11/9·OPT + 1 bin-packing heuristic; running it per group instead
    of globally is the distribution trade: packing quality degrades
    only by the per-group tail (one under-full bin per group), while
    the work parallelizes over groups.  Output is DETERMINISTIC
    regardless of input partitioning: group assignment and in-group
    order depend only on row keys.

    Documents longer than ``block_size`` get a singleton bin flagged
    ``oversize = true`` (callers filter or truncate upstream).  Every
    document with at least one token lands in exactly one bin;
    documents with EMPTY or null token arrays are excluded up front
    (they have nothing to pack) — count them with
    ``df.where(F.size(col) <= 0)`` if the audit needs them.

    Output: ``(pack_id, n_tokens, n_docs, oversize, doc_ids, tokens)``
    with ``pack_id = gid * 2^40 + local_bin_index`` (globally unique,
    stable).

    ``hash_fn`` picks the group hash: ``"xxhash64"`` (default —
    JVM-native, fastest) or ``"md5"`` (the engine-portable convention
    of functions/hashing.py: first 8 hex chars of ``md5(cast(key as
    string))`` as an integer — replayable bit-identically in DuckDB
    and in driver-side Python, which is what the gate oracle does).

    Plan: one exchange on the group id, one Arrow-batched
    applyInPandas stage (the sequential first-fit state is why this is
    the Python tier — it has no column-algebra form).
    """

    def __init__(
        self,
        tokens_field: str = "input_ids",
        key_field: str = "doc_id",
        block_size: int = 1024,
        num_groups: int = 256,
        pack_field: str = "pack_id",
        hash_fn: str = "xxhash64",
    ) -> None:
        if block_size < 1:
            raise ValueError("block_size must be >= 1")
        if num_groups < 1:
            raise ValueError("num_groups must be >= 1")
        if hash_fn not in ("xxhash64", "md5"):
            raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
        self.tokens_field = tokens_field
        self.key_field = key_field
        self.block_size = block_size
        self.num_groups = num_groups
        self.pack_field = pack_field
        self.hash_fn = hash_fn
        super().__init__(
            input_fields=[tokens_field, key_field],
            output_fields=[
                pack_field,
                "n_tokens",
                "n_docs",
                "oversize",
                "doc_ids",
                "tokens",
            ],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            LongType,
            StructField,
            StructType,
        )

        elem_type = df.schema[self.tokens_field].dataType.elementType
        key_type = df.schema[self.key_field].dataType
        B = self.block_size
        G = self.num_groups
        tok_field = self.tokens_field
        key_field = self.key_field
        pack_field = self.pack_field

        schema = StructType(
            [
                StructField(pack_field, LongType()),
                StructField("n_tokens", LongType()),
                StructField("n_docs", LongType()),
                StructField("oversize", BooleanType()),
                StructField("doc_ids", ArrayType(key_type)),
                StructField("tokens", ArrayType(elem_type)),
            ]
        )

        def pack_group(pdf):
            import pandas as pd

            gid = int(pdf["__gid__"].iloc[0])
            docs = sorted(
                zip(pdf[key_field], pdf[tok_field]),
                key=lambda kv: (-len(kv[1]), kv[0]),
            )
            bins = []  # (ids, toks, total)
            for k, t in docs:
                t = list(t)
                n = len(t)
                if n > B:
                    bins.append(([k], t, n, True))
                    continue
                for b in bins:
                    if not b[3] and b[2] + n <= B:
                        b[0].append(k)
                        b[1].extend(t)
                        b[2] += n
                        break
                else:
                    bins.append([[k], t, n, False])
            return pd.DataFrame(
                {
                    pack_field: [
                        gid * (1 << 40) + i for i in range(len(bins))
                    ],
                    "n_tokens": [b[2] for b in bins],
                    "n_docs": [len(b[0]) for b in bins],
                    "oversize": [bool(b[3]) for b in bins],
                    "doc_ids": [b[0] for b in bins],
                    "tokens": [b[1] for b in bins],
                }
            )

        if self.hash_fn == "xxhash64":
            group_hash = F.xxhash64(F.col(key_field))
        else:
            from .hashing import portable_hash32

            group_hash = portable_hash32(F.col(key_field).cast("string"))
        work = df.select(
            key_field,
            tok_field,
            F.pmod(group_hash, F.lit(G)).cast("bigint").alias("__gid__"),
        ).where(F.size(tok_field) > 0)
        return work.groupBy("__gid__").applyInPandas(pack_group, schema)
