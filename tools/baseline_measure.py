"""Head-to-head throughput: the REFERENCE library (running natively —
single-process Python over a list of dicts, its own `map` interface)
vs smashed_spark (local[N]) on IDENTICAL rows and IDENTICAL operator
chains.

BASELINE.md records that the reference publishes no performance
numbers, so this measures them: the reference source at
/root/reference/src runs under tools/ref_shims (tiny stand-ins for its
utility deps, validated by passing the reference's own unit tests —
see ref_shims/README.md).  The shim layer is validated by the
reference's own tests (29/29 dependency-free tests pass); on top of
that, EVERY workload's full output is cross-checked equal between the
two engines before timing, so both engines are provably doing the
same work.

Writes BASELINE_MEASURED.json:
  {workload: {rows, ref_sec, spark_sec, speedup}}

Usage: python tools/baseline_measure.py [out_json]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
sys.path.insert(0, "/root/reference/src")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("BASELINE_REPLICATE", "20"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_rows():
    """Deterministic rows derived from the documents table: token-id
    sequences from word hashes (no tokenizer dependency)."""
    import hashlib

    import pyarrow.parquet as pq

    texts = (
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    rows = []
    i = 0
    for rep in range(REPLICATE):
        for t in texts:
            words = t.split()
            ids = [
                int(hashlib.md5(w.encode()).hexdigest()[:6], 16) % 30000
                for w in words[:48]
            ]
            half = max(len(ids) // 2, 1)
            rows.append(
                {
                    "row_id": i,
                    "input_ids": [ids[:half], ids[half:] or [0]],
                    "attention_mask": [[1] * half, [1] * (len(ids) - half or 1)],
                    "packed_a": ids[:8],
                    "packed_b": [x * 2 for x in ids[:8]],
                    "locs": sorted({ids[0] % 8, ids[1] % 8, ids[2] % 8}),
                    "n": len(words),
                    "text": t,
                }
            )
            i += 1
    return rows


class FakeBertTokenizer:
    """BERT-shaped special-token layout; both engines' padding mappers
    probe it identically via build_inputs_with_special_tokens."""

    def build_inputs_with_special_tokens(self, a, b=None):
        if b is None:
            return [101] + list(a) + [102]
        return [101] + list(a) + [102] + list(b) + [102]


def ref_chains():
    from smashed.mappers import (
        AttentionMaskSequencePaddingMapper,
        FillTextPromptMapper,
        FilterMapper,
        IndicesToMaskMapper,
        MaskToIndicesMapper,
        SequencesConcatenateMapper,
        SingleSequenceStriderMapper,
        TokensSequencesPaddingMapper,
        UnpackingMapper,
    )

    tok = FakeBertTokenizer()
    return {
        "multiseq_pad_concat": (
            TokensSequencesPaddingMapper(tok, input_field="input_ids")
            >> AttentionMaskSequencePaddingMapper(
                tok, input_field="attention_mask"
            )
            >> SequencesConcatenateMapper(
                concat_fields=["input_ids", "attention_mask"]
            )
        ),
        "unpack_explode": UnpackingMapper(
            fields_to_unpack=["packed_a", "packed_b"],
            ignored_behavior="repeat",
        ),
        "filter_rows": FilterMapper("n", ">=", 40),
        "masks_roundtrip": (
            IndicesToMaskMapper(
                mask_field_name="mask",
                reference_field_name="packed_a",
                locations_field_name="locs",
            )
            >> MaskToIndicesMapper(
                mask_field_name="mask",
                locations_field_name="locs2",
            )
        ),
        "strider_windows": SingleSequenceStriderMapper(
            field_to_stride="packed_a", max_length=4, stride=2
        ),
        "fill_prompt": FillTextPromptMapper(
            prompt_template="Question: {text}\nAnswer:",
            output_field_name="prompt",
        ),
    }


def spark_chains():
    from smashed_spark.operators.filters import FilterMapper
    from smashed_spark.operators.prompting import FillTextPromptMapper
    from smashed_spark.operators.masks import (
        IndicesToMaskMapper,
        MaskToIndicesMapper,
    )
    from smashed_spark.operators.multiseq import (
        AttentionMaskSequencePaddingMapper,
        SequencesConcatenateMapper,
        TokensSequencesPaddingMapper,
    )
    from smashed_spark.operators.shape import (
        SingleSequenceStriderMapper,
        UnpackingMapper,
    )

    tok = FakeBertTokenizer()
    return {
        "multiseq_pad_concat": (
            TokensSequencesPaddingMapper(tok, input_field="input_ids")
            >> AttentionMaskSequencePaddingMapper(
                tok, input_field="attention_mask"
            )
            >> SequencesConcatenateMapper(
                concat_fields=["input_ids", "attention_mask"]
            )
        ),
        "unpack_explode": UnpackingMapper(
            fields_to_unpack=["packed_a", "packed_b"],
            ignored_behavior="repeat",
        ),
        "filter_rows": FilterMapper("n", ">=", 40),
        "masks_roundtrip": (
            IndicesToMaskMapper(
                mask_field_name="mask",
                reference_field_name="packed_a",
                locations_field_name="locs",
            )
            >> MaskToIndicesMapper(
                mask_field_name="mask",
                locations_field_name="locs2",
            )
        ),
        "strider_windows": SingleSequenceStriderMapper(
            field_to_stride="packed_a", max_length=4, stride=2
        ),
        "fill_prompt": FillTextPromptMapper(
            prompt_template="Question: {text}\nAnswer:",
            output_field_name="prompt",
        ),
    }


WORKLOAD_COLS = {
    "multiseq_pad_concat": ["row_id", "input_ids", "attention_mask"],
    "unpack_explode": ["row_id", "packed_a", "packed_b"],
    "filter_rows": ["row_id", "n"],
    "masks_roundtrip": ["row_id", "mask", "locs2"],
    "strider_windows": ["row_id", "packed_a"],
    "fill_prompt": ["row_id", "prompt"],
}


def canon(recs, cols):
    # a missing column is a bug in the workload spec or the mapper,
    # not a field to silently skip — KeyError must surface
    return sorted(
        tuple(json.dumps(r[c]) for c in cols) for r in recs
    )


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else "BASELINE_MEASURED.json"
    rows = build_rows()
    print(f"# {len(rows)} rows from {SF_DIR} x{REPLICATE}", file=sys.stderr)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("baseline-measure")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS), 8)))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sdf_base = spark.createDataFrame(rows).repartition(int(CPUS)).cache()
    sdf_base.count()  # materialize once; both engines then start warm

    refs, sparks = ref_chains(), spark_chains()
    result = {}
    for name in refs:
        cols = WORKLOAD_COLS[name]

        # FULL-output cross-check before timing: run both engines over
        # every row and compare the workload's columns value-for-value
        # (a sample check would miss divergence in the tail)
        ref_full = refs[name].map([dict(r) for r in rows])
        spark_full = [
            r.asDict(recursive=True)
            for r in sparks[name].map(sdf_base).select(*[
                c for c in cols
            ]).collect()
        ]
        if canon(ref_full, cols) != canon(spark_full, cols):
            print(f"# {name}: OUTPUT MISMATCH — not timing", file=sys.stderr)
            result[name] = {"error": "output_mismatch"}
            continue
        n_ref, n_spark = len(ref_full), len(spark_full)

        # timing — SYMMETRIC discipline: both engines get best-of-2 on
        # pre-built inputs.  Reference input dicts are copied OUTSIDE
        # the timed region (its mappers mutate rows in place).  Spark
        # is forced through the noop sink: a count() would let Catalyst
        # PRUNE the per-row expressions of row-count-preserving chains
        # and time nothing; noop executes the full plan and discards
        # the rows executor-side (no driver collect to bias the other
        # way).
        ref_best = None
        for _ in range(2):
            fresh = [dict(r) for r in rows]
            t0 = time.perf_counter()
            refs[name].map(fresh)
            dt = time.perf_counter() - t0
            ref_best = dt if ref_best is None else min(ref_best, dt)

        spark_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            sparks[name].map(sdf_base).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            spark_best = dt if spark_best is None else min(spark_best, dt)
        result[name] = {
            "rows_in": len(rows),
            "rows_out_ref": n_ref,
            "rows_out_spark": n_spark,
            "ref_sec": round(ref_best, 3),
            "spark_sec": round(spark_best, 3),
            "speedup": round(ref_best / spark_best, 2),
        }
        print(f"# {name}: {result[name]}", file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
