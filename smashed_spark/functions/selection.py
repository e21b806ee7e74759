"""DSIR-style data selection (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"): pick raw-corpus
documents whose hashed-unigram statistics look like a TARGET corpus,
by importance resampling rather than top-k filtering — resampling
preserves the target DISTRIBUTION (diversity included) where a hard
quality cutoff collapses onto the mode.  The reference has no
selection surface (additive, SURVEY.md §2.10).

Three composable pieces, all deterministic:

* :func:`with_importance_logweight` — per-doc log importance weight
  ``sum_w [log p_target(w) - log p_raw(w)]`` over the existing
  hashed-unigram tables (:func:`~smashed_spark.functions.classifier.
  fit_unigram_logprob_table` fit twice, once per corpus, same dims +
  hash_fn so buckets align).  The two tables fold into ONE difference
  array plan literal and the score is a single ``aggregate``
  fold — scan speed, zero exchanges, no UDF (the classifier-family
  pattern).

* :func:`gumbel_top_k` — sampling WITHOUT replacement proportional
  to ``exp(logw)`` via the Gumbel-max trick: per-row seeded Gumbel
  noise ``g = -ln(-ln(u))`` added to the log-weight, then global
  top-k.  ``u`` derives from ``md5(id ':' seed)`` (portable_hash32),
  so the draw is a pure function of the data + seed —
  partition-layout-invariant, reproducible, SQL-replayable.  The
  top-k compiles to ``TakeOrderedAndProject``: per-partition top-k
  then a driver merge of k rows — never a global sort, never a full
  exchange; k rows is the only thing that moves.

* :func:`dsir_select` — the one-call composition: fit both tables,
  weight, resample.

Scale notes: table fits are one bucket-count exchange each (<= dims
rows collected — the fit's own contract); weighting is narrow; the
resample moves k rows.  At 10^9 docs selecting 10^7, the driver merge
holds k full rows — if k rows of full documents exceed driver
comfort, call ``gumbel_top_k`` on a slim ``(id, logw)`` projection
yourself and broadcast-semi-join the k ids back against the corpus
(both pieces compose from this module + ``F.broadcast``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .classifier import (
    MAX_NARROW_DIMS,
    _feature_index,
    _gram_stream,
    fit_unigram_logprob_table,
)
from .hashing import portable_hash32

__all__ = [
    "with_importance_logweight",
    "gumbel_top_k",
    "dsir_select",
]


def with_importance_logweight(
    df: DataFrame,
    target_table: Sequence[float],
    raw_table: Sequence[float],
    words_field: str = "words",
    weight_field: str = "dsir_logw",
    hash_fn: str = "md5",
    ngram: int = 1,
) -> DataFrame:
    """Add the DSIR log importance weight: ``sum over grams of
    (target_logprob[bucket] - raw_logprob[bucket])``.  Empty word
    arrays get 0.0 (an empty product of ratios); NULL word entries
    contribute nothing.  Both tables must share ``dims``, ``hash_fn``
    and ``ngram`` with this call — the paper's feature space is
    hashed n-grams (``ngram=2`` adds the word-order signal)."""
    if len(target_table) != len(raw_table):
        raise ValueError(
            f"table dims differ: target={len(target_table)} "
            f"raw={len(raw_table)} — fit both with the same dims"
        )
    dims = len(target_table)
    if dims == 0 or dims > MAX_NARROW_DIMS:
        raise ValueError(f"need 1 <= dims <= {MAX_NARROW_DIMS}")
    diff = [float(t) - float(r) for t, r in zip(target_table, raw_table)]
    darr = F.array(*[F.lit(x) for x in diff])
    # NULL words are filtered BEFORE the fold (the fit's "NULL words
    # carry no count" contract) — and necessarily so: inside a
    # higher-order-function lambda, `coalesce(element_at(arr, NULL))`
    # still poisons the whole aggregate to NULL (Spark lambda
    # null-propagation quirk, pinned in tests/test_selection.py).
    # _gram_stream does the filtering (and gram joining for ngram>1).
    words = _gram_stream(F.col(words_field), ngram)
    logw = F.aggregate(
        words,
        F.lit(0.0),
        lambda acc, w: acc
        + F.element_at(darr, _feature_index(w, dims, hash_fn) + F.lit(1)),
    )
    return df.withColumn(
        weight_field, F.coalesce(logw, F.lit(0.0))
    )


def gumbel_top_k(
    df: DataFrame,
    k: int,
    weight_field: str = "dsir_logw",
    id_field: str = "doc_id",
    seed: int = 13,
    key_field: Optional[str] = None,
) -> DataFrame:
    """Draw ``k`` rows without replacement with probability
    proportional to ``exp(weight_field)`` — the Gumbel-max trick:
    rank by ``logw - ln(-ln(u))`` with ``u`` a seeded per-row uniform
    from ``md5(id ':' seed)``.  Deterministic given (data, seed),
    partition-layout-invariant, and the plan is
    ``TakeOrderedAndProject`` (per-partition top-k + k-row driver
    merge — no global sort/exchange).

    A NULL ``id_field`` raises in-plan (it cannot seed a draw); a
    NULL weight raises too — score upstream or filter explicitly
    (silently ranking NULL-weight rows last would hide scoring bugs).
    Ties (astronomically unlikely with real weights) break by id for
    full determinism.  ``key_field`` optionally exposes the perturbed
    key for audit."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    id_col = F.col(id_field)
    guarded_id = F.when(
        id_col.isNull(),
        F.raise_error(
            F.lit(
                f"gumbel_top_k: id_field {id_field!r} has a NULL — a "
                "NULL id cannot seed a deterministic draw. Filter or "
                "fill the id column."
            )
        ),
    ).otherwise(id_col)
    w = F.col(weight_field).cast("double")
    guarded_w = F.when(
        w.isNull() | F.isnan(w),
        F.raise_error(
            F.lit(
                f"gumbel_top_k: weight_field {weight_field!r} has a "
                "NULL/NaN-free contract — score rows upstream or "
                "filter them before resampling."
            )
        ),
    ).otherwise(w)
    # u in (0, 1): (h32 + 0.5) / 2^32 — never exactly 0 or 1, so the
    # double log is always finite
    u = (
        portable_hash32(
            F.concat(guarded_id.cast("string"), F.lit(f":{seed}"))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    key = guarded_w - F.log(-F.log(u))
    out = df
    name = key_field or "__gumbel_key__"
    out = out.withColumn(name, key)
    out = out.orderBy(F.col(name).desc(), id_col).limit(k)
    if key_field is None:
        out = out.drop(name)
    return out


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    words_field: str = "words",
    dims: int = 4096,
    alpha: float = 1.0,
    hash_fn: str = "md5",
    id_field: str = "doc_id",
    seed: int = 13,
    weight_field: str = "dsir_logw",
    ngram: int = 1,
) -> DataFrame:
    """One-call DSIR: fit hashed n-gram tables on the target and raw
    corpora (two bounded fit jobs), weight every raw doc, Gumbel-top-k
    resample.  Returns the selected rows of ``raw_df`` with
    ``weight_field`` attached.

    The raw-side table is fit on ``raw_df`` itself (the paper's
    formulation — the denominator is the proposal distribution the
    sample actually comes from)."""
    target_table = fit_unigram_logprob_table(
        target_df, words_field=words_field, dims=dims, alpha=alpha,
        hash_fn=hash_fn, ngram=ngram,
    )
    raw_table = fit_unigram_logprob_table(
        raw_df, words_field=words_field, dims=dims, alpha=alpha,
        hash_fn=hash_fn, ngram=ngram,
    )
    weighted = with_importance_logweight(
        raw_df, target_table, raw_table,
        words_field=words_field, weight_field=weight_field,
        hash_fn=hash_fn, ngram=ngram,
    )
    return gumbel_top_k(
        weighted, k, weight_field=weight_field, id_field=id_field,
        seed=seed,
    )
