"""Deterministic byte-pair-encoding (BPE) tokenization: fit merge
rules on the corpus, then count (or emit) tokens at Arrow speed —
so token-budget selection and packing operate on numbers that track
how training actually tokenizes, instead of whitespace counts.  The
reference tokenizes via HuggingFace (env-gated here, SURVEY §2.6);
this is the hermetic, dependency-free tier — same spirit as the
hermetic WordPiece (wordpiece.py), but LEARNED from the corpus.

Fit (:func:`fit_bpe_merges`) is the classic Sennrich et al. 2016
word-type algorithm with two Spark-scale bounds:

* word-type counts come from ONE ``groupBy(word)`` exchange (map-side
  partial), then the driver keeps the ``max_word_types`` most
  frequent types (ties broken by word — deterministic, and the
  ordering is computed IN Spark via one TakeOrdered, so at most
  ``max_word_types`` rows ever reach the driver);
* the merge loop is driver-side over that bounded table with
  INCREMENTAL pair-count maintenance (exact counts + a pair->word
  inverted index + a lazy-deletion heap): each merge touches only the
  words containing the merged pair, so 8k+ merges over the 50k-type
  cap fit in seconds, independent of corpus size.

Determinism: counts are exact (partition-invariant); the most
frequent pair ties break lexicographically.  Same corpus, any
partitioning -> same merges, test-pinned.

Encoding (:class:`BpeTokenCountMapper`) applies the merge ranks
greedily per word (lowest-rank pair first — standard BPE inference)
inside ONE Arrow-batched pandas UDF; the merge table ships in the
UDF closure (a few KB for typical ``num_merges``).  Unseen
characters fall back to one token each, so counts are defined for
any input.  The plan stays narrow — zero exchanges (plan-pinned).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper

__all__ = [
    "fit_bpe_merges",
    "bpe_encode_word",
    "bpe_ranks",
    "bpe_vocab",
    "save_bpe_merges",
    "load_bpe_merges",
    "BpeTokenCountMapper",
]

_EOW = "</w>"

_BPE_FORMAT_VERSION = 1


def bpe_encode_word(
    word: str, ranks: Dict[Tuple[str, str], int]
) -> List[str]:
    """Greedy BPE inference for one word: repeatedly merge the
    lowest-rank adjacent pair.  Pure function shared by the mapper's
    UDF and any caller that wants the tokens driver-side."""
    if not word:
        return []
    symbols = list(word) + [_EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i:best_i + 2] = [
            symbols[best_i] + symbols[best_i + 1]
        ]
    return symbols


def fit_bpe_merges(
    corpus: DataFrame,
    words_field: str = "words",
    num_merges: int = 512,
    max_word_types: int = 50_000,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    One exchange (word-type counts, map-side partial) + one
    TakeOrdered of ``max_word_types`` rows; the merge loop runs on
    the driver over the bounded type table.  Word types beyond the
    cap are dropped FROM THE FIT only (rare types barely influence
    pair counts); encoding still covers them via character fallback.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if max_word_types < 1:
        raise ValueError(
            f"max_word_types must be >= 1, got {max_word_types}"
        )
    rows = (
        corpus.select(F.explode(words_field).alias("__w__"))
        .where(F.col("__w__").isNotNull() & (F.col("__w__") != ""))
        .groupBy("__w__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        # deterministic bounded driver table: most frequent first,
        # ties by word — TakeOrdered, not a full sort
        .orderBy(F.col("__c__").desc(), F.col("__w__"))
        .limit(max_word_types)
        .collect()
    )
    vocab: List[Tuple[List[str], int]] = [
        (list(r["__w__"]) + [_EOW], r["__c__"]) for r in rows
    ]
    # Incremental pair-count maintenance (the classic fast-BPE fit):
    # a from-scratch recount per merge is O(types x word_len) PER
    # MERGE — hours at 32k merges.  Instead keep (a) exact pair
    # counts, (b) a pair -> word-index SUPERSET index (stale members
    # are harmless: their subtract-all/add-all cancels), and (c) a
    # lazy-deletion heap of (-count, pair) entries validated against
    # the live count on pop.  Each merge touches only the words that
    # contain the merged pair.  Selection rule is unchanged — highest
    # count, lexicographically smallest pair on ties — so the merges
    # are bit-identical to the recount formulation (test-pinned
    # against a from-scratch replay in tests/test_bpe.py).
    import heapq

    pairs: Dict[Tuple[str, str], int] = {}
    where: Dict[Tuple[str, str], set] = {}
    for wi, (symbols, cnt) in enumerate(vocab):
        for i in range(len(symbols) - 1):
            p = (symbols[i], symbols[i + 1])
            pairs[p] = pairs.get(p, 0) + cnt
            where.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pairs.items()]
    heapq.heapify(heap)
    merges: List[Tuple[str, str]] = []
    while len(merges) < num_merges and heap:
        negc, best = heapq.heappop(heap)
        if pairs.get(best) != -negc:
            continue  # stale entry — count changed since push
        if -negc < 2:
            break  # nothing repeats: further merges are memorization
        a, b = best
        merges.append(best)
        merged = a + b
        del pairs[best]
        touched: set = set()
        for wi in where.pop(best, ()):  # superset of containing words
            symbols, cnt = vocab[wi]
            # subtract ALL pairs of the old word, remerge, add ALL
            # pairs of the new word: unrelated pairs cancel exactly,
            # so staleness in `where` costs time, never correctness
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                c = pairs.get(p)
                if c is not None:
                    if c - cnt <= 0:
                        del pairs[p]
                    else:
                        pairs[p] = c - cnt
                    touched.add(p)
            i = 0
            while i < len(symbols) - 1:
                if symbols[i] == a and symbols[i + 1] == b:
                    symbols[i:i + 2] = [merged]
                else:
                    i += 1
            for i in range(len(symbols) - 1):
                p = (symbols[i], symbols[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
                where.setdefault(p, set()).add(wi)
                touched.add(p)
        for p in touched:
            c = pairs.get(p)
            if c:
                heapq.heappush(heap, (-c, p))
    return merges


def bpe_ranks(
    merges: List[Tuple[str, str]]
) -> Dict[Tuple[str, str], int]:
    """Merge list -> rank lookup for :func:`bpe_encode_word` (rank =
    fit order; lower merges first)."""
    return {tuple(m): i for i, m in enumerate(merges)}


def bpe_vocab(
    merges: List[Tuple[str, str]], base_chars: Sequence[str] = ()
) -> List[str]:
    """Token vocabulary implied by a merge table: the (sorted,
    deduped) base characters + the end-of-word marker + every merged
    symbol in RANK ORDER (deduped keeping first occurrence — two merge
    paths can produce the same surface string).  ``base_chars`` is
    caller-supplied (the fit corpus' character set) because the merge
    table alone doesn't record characters that never merged."""
    seen = set()
    out: List[str] = []
    for tok in sorted(set(base_chars)):
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    if _EOW not in seen:
        seen.add(_EOW)
        out.append(_EOW)
    for a, b in merges:
        tok = a + b
        if tok not in seen:
            seen.add(tok)
            out.append(tok)
    return out


def save_bpe_merges(
    merges: List[Tuple[str, str]],
    path: str,
    base_chars: Sequence[str] = (),
) -> None:
    """Persist a fitted merge table under ``path`` (local or s3 via
    io_utils — the bloom/cms convention: a corpus-fit tokenizer is a
    driver artifact like persisted centroids, reusable across
    jobs/engines).  Writes ``merges.json`` — versioned, JSON-escaped
    (symbols may contain any character; the GPT-2 space-separated
    merges.txt format cannot carry them unambiguously) — and the
    derived :func:`bpe_vocab` as ``vocab.json``."""
    import json

    from ..sources.io_utils import open_file_for_write

    payload = {
        "format_version": _BPE_FORMAT_VERSION,
        "eow": _EOW,
        "num_merges": len(merges),
        "merges": [[a, b] for a, b in merges],
    }
    with open_file_for_write(f"{path}/merges.json", "w") as f:
        f.write(json.dumps(payload))
    with open_file_for_write(f"{path}/vocab.json", "w") as f:
        f.write(json.dumps(bpe_vocab(merges, base_chars)))


def load_bpe_merges(path: str) -> List[Tuple[str, str]]:
    """Load a merge table persisted by :func:`save_bpe_merges` —
    encode parity with the in-memory fit is test-pinned.  Refuses
    unknown format versions instead of misreading them."""
    import json

    from ..sources.io_utils import open_file_for_read

    with open_file_for_read(f"{path}/merges.json", "r") as f:
        payload = json.loads(f.read())
    version = payload.get("format_version")
    if version != _BPE_FORMAT_VERSION:
        raise ValueError(
            f"load_bpe_merges: unsupported format_version {version!r} "
            f"(this build reads {_BPE_FORMAT_VERSION})"
        )
    if payload.get("eow") != _EOW:
        raise ValueError(
            f"load_bpe_merges: end-of-word marker {payload.get('eow')!r} "
            f"does not match this build's {_EOW!r} — encodings would "
            "silently diverge"
        )
    merges = [tuple(m) for m in payload["merges"]]
    if any(len(m) != 2 for m in merges):
        raise ValueError("load_bpe_merges: malformed merge entry")
    return merges


class BpeTokenCountMapper(SparkMapper):
    """Count (and optionally emit) BPE tokens per row using fitted
    merges — ONE Arrow-batched pandas UDF over the words array, zero
    exchanges.  Characters never seen at fit time fall back to one
    token each, so every input has a defined count."""

    def __init__(
        self,
        merges: Sequence[Tuple[str, str]],
        words_field: str = "words",
        count_field: str = "n_bpe_tokens_learned",
        tokens_field: Optional[str] = None,
    ) -> None:
        if not merges:
            raise ValueError("merges must be non-empty (fit_bpe_merges)")
        self.merges = [tuple(m) for m in merges]
        self.words_field = words_field
        self.count_field = count_field
        self.tokens_field = tokens_field
        super().__init__(
            input_fields=[words_field],
            output_fields=[count_field]
            + ([tokens_field] if tokens_field else []),
        )

    def config(self) -> dict:
        return {
            "merges": ["\x00".join(m) for m in self.merges],
            "words_field": self.words_field,
            "count_field": self.count_field,
            "tokens_field": self.tokens_field,
        }

    def apply(self, df: DataFrame) -> DataFrame:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        ranks = {m: i for i, m in enumerate(self.merges)}
        want_tokens = self.tokens_field is not None

        def _encode_fn(words_ser):
            def one(words):
                if words is None:
                    return None
                toks: List[str] = []
                for w in words:
                    if w:
                        toks += bpe_encode_word(w, ranks)
                return toks

            return words_ser.map(one)

        # `from __future__ import annotations` stringifies hints;
        # assign real objects (the CompressionRatioMapper precedent)
        _encode_fn.__annotations__ = {
            "words_ser": pd.Series, "return": pd.Series
        }
        _enc = pandas_udf(_encode_fn, "array<string>")
        toks = _enc(F.col(self.words_field))
        if want_tokens:
            out = df.withColumn(self.tokens_field, toks)
            return out.withColumn(
                self.count_field,
                F.when(
                    F.col(self.tokens_field).isNotNull(),
                    F.size(self.tokens_field).cast("bigint"),
                ),
            )

        def _count_fn(words_ser):
            def one(words):
                if words is None:
                    return None
                n = 0
                for w in words:
                    if w:
                        n += len(bpe_encode_word(w, ranks))
                return n

            return words_ser.map(one)

        _count_fn.__annotations__ = {
            "words_ser": pd.Series, "return": pd.Series
        }
        _cnt = pandas_udf(_count_fn, "long")
        return df.withColumn(
            self.count_field, _cnt(F.col(self.words_field))
        )
