"""Property-style randomized tests: the Column-expression
implementations must agree with direct pure-Python ports of the
reference algorithms on hundreds of seeded-random inputs.

(Each property batches all its examples through ONE DataFrame — Spark
job startup would dominate a per-example hypothesis loop.)
"""

from math import floor

from smashed_spark.operators.masks import MaskToRangeMapper, RangeToMaskMapper
from smashed_spark.operators.prompting import TruncateMultipleFieldsMapper

# -- pure-Python ports of the reference allocation algorithms
# (reference prompting.py:217-275) used as the property oracle --------------


def _uniform(lens, max_len):
    total = sum(lens)
    if total <= max_len:
        return list(lens)
    return [floor(l * max_len / total) for l in lens]


def _longest(lens, max_len):
    if sum(lens) <= max_len:
        return list(lens)
    k = len(lens)
    target = max_len // k
    longer = [l - target if l > target else 0 for l in lens]
    extra = max_len - target * k + sum(target - l for l in lens if l < target)
    redis = _uniform(longer, extra)
    return [
        target + r if l > target else l for l, r in zip(lens, redis)
    ]


def test_truncation_matches_reference_algorithm(spark):
    import random

    rng = random.Random(42)
    # few distinct budgets: budget is mapper config, so each distinct
    # value costs one Spark job per strategy
    budgets = [3, 5, 10, 20, 35, 80]
    cases = [
        ([rng.randint(0, 40) for _ in range(3)], rng.choice(budgets))
        for _ in range(200)
    ]
    # group cases by max_len since it is mapper config, not data
    by_max = {}
    for lens, max_len in cases:
        by_max.setdefault(max_len, []).append(lens)
    for strategy, py_algo in (("uniform", _uniform), ("longest", _longest)):
        for max_len, lens_list in by_max.items():
            rows = [
                tuple(list(range(n)) for n in lens) for lens in lens_list
            ]
            df = spark.createDataFrame(
                rows, "a: array<bigint>, b: array<bigint>, c: array<bigint>"
            )
            out = (
                TruncateMultipleFieldsMapper(
                    ["a", "b", "c"], max_length=max_len, strategy=strategy
                )
                .map(df)
                .collect()
            )
            for lens, row in zip(lens_list, out):
                got = [len(row.a), len(row.b), len(row.c)]
                want = [max(n, 0) for n in py_algo(lens, max_len)]
                assert got == want, (strategy, lens, max_len, got, want)


def test_mask_range_roundtrip_property(spark):
    import random

    rng = random.Random(7)
    rows = []
    for _ in range(200):
        n = rng.randint(1, 20)
        mask = [rng.choice([0, 1]) for _ in range(n)]
        rows.append((mask,))
    df = spark.createDataFrame(rows, "m: array<bigint>")
    pipe = MaskToRangeMapper("m", "r")
    ranged = pipe.map(df).collect()
    # reconstruct the mask from the ranges and compare
    back_rows = [(r.m, r.r) for r in ranged]
    df2 = spark.createDataFrame(
        back_rows, "m: array<bigint>, r: array<array<bigint>>"
    )
    out = RangeToMaskMapper("m2", "m", "r").map(df2).collect()
    for row in out:
        assert row.m2 == row.m, (row.m, row.r, row.m2)
