"""Mask mappers — goldens ported from reference tests/test_masks.py
(14-token sample)."""

import pytest

from smashed_spark.operators.masks import (
    IndicesToMaskMapper,
    MaskToIndicesMapper,
    MaskToRangeMapper,
    RangeToMaskMapper,
)

IDS = [101, 3312, 5863, 7585, 7226, 2368, 3781, 1012, 2003, 1996, 2149, 2343, 1012, 102]
PEOPLE_MASK = [0, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
ORGS_MASK = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0]


def test_indices_to_mask(spark):
    df = spark.createDataFrame(
        [(IDS, [1, 2, 3, 4, 5, 6, 7, 8])],
        "input_ids: array<bigint>, people: array<bigint>",
    )
    out = (
        IndicesToMaskMapper("people_mask", "input_ids", "people")
        .map(df)
        .collect()[0]
    )
    assert out.people_mask == PEOPLE_MASK


def test_range_to_mask(spark):
    df = spark.createDataFrame(
        [(IDS, [[1, 9]], [[10, 11]])],
        "input_ids: array<bigint>, people: array<array<bigint>>, "
        "orgs: array<array<bigint>>",
    )
    pipe = RangeToMaskMapper(
        "people_mask", "input_ids", "people"
    ) >> RangeToMaskMapper("orgs_mask", "input_ids", "orgs")
    out = pipe.map(df).collect()[0]
    assert out.people_mask == PEOPLE_MASK
    assert out.orgs_mask == ORGS_MASK


def test_range_to_mask_single_pair_and_empty(spark):
    df = spark.createDataFrame(
        [(IDS, [1, 9])], "input_ids: array<bigint>, people: array<bigint>"
    )
    out = RangeToMaskMapper("m", "input_ids", "people").map(df).collect()[0]
    assert out.m == PEOPLE_MASK
    # empty ranges -> all zeros (reference masks.py:66-69 quirk)
    df2 = spark.createDataFrame(
        [([1, 2, 3], [])],
        "input_ids: array<bigint>, people: array<array<bigint>>",
    )
    out2 = (
        RangeToMaskMapper("m", "input_ids", "people", mask_off_value=9)
        .map(df2)
        .collect()[0]
    )
    assert out2.m == [0, 0, 0]


def test_mask_to_indices(spark):
    df = spark.createDataFrame([(PEOPLE_MASK,)], "people_mask: array<bigint>")
    out = MaskToIndicesMapper("people_mask", "people").map(df).collect()[0]
    assert out.people == [1, 2, 3, 4, 5, 6, 7, 8]


def test_mask_to_indices_enforce_single(spark):
    df = spark.createDataFrame([(ORGS_MASK,)], "m: array<bigint>")
    out = (
        MaskToIndicesMapper("m", "loc", enforce_single_location=True)
        .map(df)
        .collect()[0]
    )
    assert out.loc == 10
    df2 = spark.createDataFrame([(PEOPLE_MASK,)], "m: array<bigint>")
    with pytest.raises(Exception):
        MaskToIndicesMapper("m", "loc", enforce_single_location=True).map(
            df2
        ).collect()


def test_mask_to_range(spark):
    df = spark.createDataFrame(
        [(PEOPLE_MASK, ORGS_MASK)],
        "people_mask: array<bigint>, orgs_mask: array<bigint>",
    )
    pipe = MaskToRangeMapper("people_mask", "people") >> MaskToRangeMapper(
        "orgs_mask", "orgs"
    )
    out = pipe.map(df).collect()[0]
    assert out.people == [[1, 9]]
    assert out.orgs == [[10, 11]]


def test_mask_to_range_multiple_runs(spark):
    df = spark.createDataFrame(
        [([1, 1, 0, 1, 0, 1, 1],)], "m: array<bigint>"
    )
    out = MaskToRangeMapper("m", "r").map(df).collect()[0]
    assert out.r == [[0, 2], [3, 4], [5, 7]]
