"""Model-based quality filtering: a fasttext-style linear classifier
over hashed bag-of-words features, scored at SCAN SPEED as pure column
expressions, plus a bounded driver-side fit.

The modern curation stacks (DCLM, FineWeb-Edu) put a cheap learned
quality model between the heuristic filters and dedup: this module is
that step re-expressed Spark-first.  Scoring is
``sigmoid(bias + mean_w weights[h(w) mod dims])`` — one narrow
``aggregate`` fold per row, no shuffle, no UDF, whole-stage-codegen
friendly; the weight table rides the plan as a folded array literal
(``dims`` ≤ 64k ⇒ ≤ 512 KB of plan, the practical ceiling for
word-level quality models).  The fit collects a BOUNDED labeled sample
(``sample_cap`` per class, chosen by hash order — one
TakeOrderedAndProject pass per class, collecting only the top-k) and
runs deterministic full-batch logistic gradient descent in numpy: the
same bounded-driver-fit pattern as IVFCosineTopK's quantizer.

Hashing follows the repo convention: ``md5`` (portable — the DuckDB
oracle replays scores bit-for-bit) or ``xxhash64`` (production fast
path; fit-side featurization runs THROUGH Spark, so either family
works without a Python xxhash dependency).

Beyond the reference surface (allenai/smashed has no model-based
filtering).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.mapper import SparkMapper

#: plan-literal ceiling for the weight array (512 KB of doubles)
MAX_NARROW_DIMS = 65536


def _feature_index(word: Column, dims: int, hash_fn: str) -> Column:
    from .hashing import portable_hash32

    w = F.lower(word)
    h = F.xxhash64(w) if hash_fn == "xxhash64" else portable_hash32(w)
    return F.pmod(h, F.lit(dims)).cast("int")


class LinearQualityClassifierMapper(SparkMapper):
    """Score every row with a hashed-BoW linear model:
    ``score_field = sigmoid(bias + sum_w weights[h(lower(w)) mod dims]
    / max(n_words, 1))`` over ``words_field``.  Narrow column algebra
    — the classifier runs at scan speed on 100 TB with zero exchanges.

    With ``threshold`` set, also emits ``keep_field`` 0/1 (compose
    FilterMapper or ``.filter`` downstream to drop; this mapper only
    tags, matching GopherQualityFilterMapper's contract).
    """

    def __init__(
        self,
        weights: Sequence[float],
        bias: float = 0.0,
        words_field: str = "words",
        score_field: str = "model_q_score",
        threshold: Optional[float] = None,
        keep_field: str = "model_q_keep",
        hash_fn: str = "md5",
    ) -> None:
        if not weights:
            raise ValueError("weights must be non-empty")
        if len(weights) > MAX_NARROW_DIMS:
            raise ValueError(
                f"dims={len(weights)} exceeds MAX_NARROW_DIMS="
                f"{MAX_NARROW_DIMS} (the weight array is a plan "
                "literal); hash into fewer buckets — word-level "
                "quality models rarely benefit past 2^14"
            )
        if hash_fn not in ("md5", "xxhash64"):
            raise ValueError("hash_fn must be 'md5' or 'xxhash64'")
        self.weights = [float(x) for x in weights]
        self.bias = float(bias)
        self.words_field = words_field
        self.score_field = score_field
        self.threshold = threshold
        self.keep_field = keep_field
        self.hash_fn = hash_fn
        out = [score_field] + ([keep_field] if threshold is not None else [])
        super().__init__(
            input_fields=[words_field], output_fields=out
        )

    def apply(self, df: DataFrame) -> DataFrame:
        dims = len(self.weights)
        # CreateArray over foldable literals constant-folds into ONE
        # ArrayType literal: element_at against it is a codegen-time
        # lookup, not a per-row array build
        warr = F.array(*[F.lit(x) for x in self.weights])
        # NULL words carry no weight — the fit's sampling convention,
        # and a hard requirement inside the lambda: element_at with a
        # NULL index poisons the whole aggregate to NULL even under
        # coalesce (Spark HOF null-propagation quirk, pinned in
        # tests/test_selection.py), which would silently un-score any
        # doc with one NULL token
        words = F.filter(
            F.col(self.words_field), lambda w: w.isNotNull()
        )
        total = F.aggregate(
            words,
            F.lit(0.0),
            lambda acc, w: acc
            + F.element_at(
                warr, _feature_index(w, dims, self.hash_fn) + F.lit(1)
            ),
        )
        n = F.greatest(F.size(words), F.lit(1))
        z = F.lit(self.bias) + total / n
        score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        out = df.withColumn(self.score_field, score)
        if self.threshold is not None:
            out = out.withColumn(
                self.keep_field,
                (F.col(self.score_field) >= F.lit(self.threshold)).cast(
                    "int"
                ),
            )
        return out


def fit_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    words_field: str = "words",
    dims: int = 4096,
    seed: int = 17,
    epochs: int = 200,
    lr: float = 1.0,
    l2: float = 1e-4,
    sample_cap: int = 20_000,
    hash_fn: str = "md5",
) -> Tuple[List[float], float]:
    """Fit (weights, bias) for :class:`LinearQualityClassifierMapper`
    from a labeled sample: ``positives`` (high-quality exemplars, e.g.
    a curated reference corpus) vs ``negatives`` (raw/rejected docs).

    Bounded by construction: at most ``sample_cap`` docs per class are
    collected, chosen by HASH ORDER (``orderBy(md5(words))`` + limit —
    compiles to TakeOrderedAndProject, a per-partition top-k plus a
    driver merge, never a full sort materialization), so the sample —
    and therefore the model — is a pure function of the data,
    independent of partition layout, and source-unbiased (a bare
    ``limit`` would take first-partition rows).  Docs are featurized
    THROUGH Spark with the same hash family the scorer uses, so the
    fit is hash-consistent for md5 AND xxhash64 without a Python-side
    hash implementation.  Driver side: dense mean-of-
    feature matrices (``2 x sample_cap x dims`` float32 — 640 MB at
    the caps, the documented ceiling) + deterministic full-batch
    logistic gradient descent (seeded init, fixed epoch count — the
    same data always yields the same model).
    """
    if dims < 1 or dims > MAX_NARROW_DIMS:
        raise ValueError(f"need 1 <= dims <= {MAX_NARROW_DIMS}")
    import numpy as np

    def featurize(df: DataFrame) -> "np.ndarray":
        rows = (
            df.select(
                F.transform(
                    F.col(words_field),
                    lambda w: _feature_index(w, dims, hash_fn),
                ).alias("__idx__"),
                F.md5(
                    F.concat_ws("\x1f", F.col(words_field))
                ).alias("__ord__"),
            )
            .orderBy("__ord__")
            .limit(sample_cap)
            .drop("__ord__")
            .collect()
        )
        X = np.zeros((len(rows), dims), dtype=np.float32)
        for i, r in enumerate(rows):
            idx = r["__idx__"] or []
            if not idx:
                continue
            np.add.at(X[i], np.asarray(idx, dtype=np.int64), 1.0)
            X[i] /= len(idx)
        return X

    Xp, Xn = featurize(positives), featurize(negatives)
    if len(Xp) == 0 or len(Xn) == 0:
        raise ValueError(
            "fit_quality_classifier: both classes need at least one "
            "non-empty document"
        )
    # X stays float32 (memory bound); the matmuls promote to float64
    # against the float64 weight vector
    X = np.concatenate([Xp, Xn])
    y = np.concatenate(
        [np.ones(len(Xp)), np.zeros(len(Xn))]
    )
    rng = np.random.default_rng(seed)
    w = rng.normal(0.0, 0.01, size=dims)
    b = 0.0
    n = len(X)
    for _ in range(epochs):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / n + l2 * w)
        b -= lr * float(g.mean())
    return [float(v) for v in w], float(b)


def _gram_stream(words: Column, ngram: int) -> Column:
    """The token stream an n-gram LM scores: NULL words removed (the
    'carry no count' contract + the HOF NULL-index quirk), then, for
    ``ngram > 1``, every CONSECUTIVE n-gram joined with a space —
    with repetition and in order, unlike hashing.word_shingles (which
    dedups for set-similarity).  Arrays shorter than ``ngram`` yield
    an empty stream (no gram exists, score NULL downstream)."""
    ws = F.filter(words, lambda w: w.isNotNull())
    if ngram == 1:
        return ws
    cnt = F.size(ws) - F.lit(ngram - 1)
    return F.when(
        cnt > 0,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(ws, i, ngram)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def fit_unigram_logprob_table(
    corpus: DataFrame,
    words_field: str = "words",
    dims: int = 4096,
    alpha: float = 1.0,
    hash_fn: str = "md5",
    ngram: int = 1,
) -> List[float]:
    """Fit a hashed-unigram log-probability table on a REFERENCE
    corpus (e.g. curated high-quality text) for
    :class:`UnigramLogProbMapper` — the CCNet-style perplexity-proxy
    quality signal: documents whose words are improbable under the
    reference model score low.

    Fully distributed and exact — no sample cap needed: the fit is
    word COUNTS, so it is one explode + groupBy on the hash bucket
    (map-side combine; at most ``dims`` result rows cross the wire)
    over however much reference text you have.  Deterministic by
    construction (exact counts are partition-invariant).  Bucket ``b``
    gets ``log((count_b + alpha) / (total + alpha * dims))`` —
    add-alpha smoothing, so unseen buckets (and hence OOV words) carry
    a floor probability instead of -inf.  Hash collisions merge word
    counts (the hashed-BoW trade-off, same as the classifier); grow
    ``dims`` to taste, plan-literal-bounded at ``MAX_NARROW_DIMS``.

    ``ngram > 1`` (late r9) fits over consecutive space-joined word
    n-grams instead — the CCNet direction: a hashed-BIGRAM table
    sees local word order a unigram model cannot (scrambled text
    scores like prose under unigrams, not under bigrams).  Same cost
    shape: one explode + bucket-count exchange, <= dims rows
    collected.  Score with ``UnigramLogProbMapper(table,
    ngram=2)`` — the table and scorer must agree on ``ngram``,
    ``dims`` and ``hash_fn``.
    """
    import math

    if dims < 1 or dims > MAX_NARROW_DIMS:
        raise ValueError(f"need 1 <= dims <= {MAX_NARROW_DIMS}")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (smoothing mass)")
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")
    rows = (
        corpus.select(
            F.explode(
                F.transform(
                    _gram_stream(F.col(words_field), ngram),
                    lambda w: _feature_index(w, dims, hash_fn),
                )
            ).alias("__b__")
        )
        .where(F.col("__b__").isNotNull())  # NULL words carry no count
        .groupBy("__b__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .collect()
    )
    counts = [0] * dims
    for r in rows:
        counts[r["__b__"]] = r["__c__"]
    total = sum(counts)
    denom = total + alpha * dims
    return [math.log((c + alpha) / denom) for c in counts]


class UnigramLogProbMapper(SparkMapper):
    """Score every row with a reference unigram language model:
    ``logprob_field = mean_w table[h(lower(w)) mod dims]`` over
    ``words_field`` plus the perplexity proxy ``ppl_field =
    exp(-mean)`` (lower = more reference-like).  Rows with no words
    get NULL for both — a 0-token doc has no perplexity; filter or
    coalesce explicitly downstream.

    Narrow column algebra like the linear classifier: the table rides
    the plan as one folded array literal and the score is one
    ``aggregate`` fold — scan speed, zero exchanges, no UDF.  CCNet
    (Wenzek et al. 2020) buckets documents by reference-LM perplexity
    exactly like this (theirs is a 5-gram KenLM; the hashed unigram
    table is the Spark-native scan-speed proxy — combine with the
    repetition/Gopher signals which catch what unigrams can't).

    ``ngram=2`` (late r9) scores consecutive space-joined bigrams
    against a table fit with the same ``ngram`` — one step toward
    CCNet's higher-order model at identical plan cost (the gram
    stream is built inline by the same fold; still zero exchanges).
    Docs with fewer than ``ngram`` words have no gram to score and
    get NULL.
    """

    def __init__(
        self,
        table: Sequence[float],
        words_field: str = "words",
        logprob_field: str = "mean_word_logprob",
        ppl_field: str = "word_ppl",
        hash_fn: str = "md5",
        ngram: int = 1,
    ) -> None:
        if not table:
            raise ValueError("table must be non-empty")
        if len(table) > MAX_NARROW_DIMS:
            raise ValueError(
                f"dims={len(table)} exceeds MAX_NARROW_DIMS="
                f"{MAX_NARROW_DIMS} (the table is a plan literal)"
            )
        if hash_fn not in ("md5", "xxhash64"):
            raise ValueError("hash_fn must be 'md5' or 'xxhash64'")
        if ngram < 1:
            raise ValueError(f"ngram must be >= 1, got {ngram}")
        self.table = [float(x) for x in table]
        self.words_field = words_field
        self.logprob_field = logprob_field
        self.ppl_field = ppl_field
        self.hash_fn = hash_fn
        self.ngram = ngram
        super().__init__(
            input_fields=[words_field],
            output_fields=[logprob_field, ppl_field],
        )

    def apply(self, df: DataFrame) -> DataFrame:
        dims = len(self.table)
        tarr = F.array(*[F.lit(x) for x in self.table])
        # NULL words skipped inside _gram_stream, matching the fit
        # (and dodging the HOF NULL-index poisoning quirk — see
        # LinearQualityClassifier); ngram>1 folds over the joined
        # consecutive-gram stream instead
        words = _gram_stream(F.col(self.words_field), self.ngram)
        total = F.aggregate(
            words,
            F.lit(0.0),
            lambda acc, w: acc
            + F.element_at(
                tarr, _feature_index(w, dims, self.hash_fn) + F.lit(1)
            ),
        )
        n = F.size(words)
        mean = F.when(n > 0, total / n)
        return df.withColumn(self.logprob_field, mean).withColumn(
            self.ppl_field, F.exp(-F.col(self.logprob_field))
        )
