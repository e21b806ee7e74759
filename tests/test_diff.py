"""Corpus snapshot diff (functions/diff.py): status/attribution
replays, NULL semantics, in-plan guards, and the plan-shape
contract (one exchange per side, shared by guard and join)."""

import pytest

from smashed_spark.functions.diff import corpus_diff, diff_summary

OLD = [
    (1, "alpha", "en", 10),
    (2, "beta", "en", 20),
    (3, "gamma", "de", 30),
    (4, "delta", None, 40),
    (5, "epsilon", "fr", 50),
]
NEW = [
    (1, "alpha", "en", 10),          # unchanged
    (2, "beta EDITED", "en", 27),    # changed: n_chars, text
    (3, "gamma", "en", 30),          # changed: lang
    (4, "delta", None, 40),          # unchanged (NULL == NULL)
    (6, "zeta", "en", 60),           # added; 5 removed
]
SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"


def _mk(spark, rows, schema=SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_statuses_and_attribution(spark):
    out = {
        r["doc_id"]: (r["diff_status"], list(r["changed_fields"]))
        for r in corpus_diff(_mk(spark, OLD), _mk(spark, NEW)).collect()
    }
    assert out == {
        1: ("unchanged", []),
        2: ("changed", ["n_chars", "text"]),  # sorted field names
        3: ("changed", ["lang"]),
        4: ("unchanged", []),
        5: ("removed", []),
        6: ("added", []),
    }


def test_null_value_vs_value_is_a_change(spark):
    out = corpus_diff(
        _mk(spark, [(1, "a", "en", 1)]),
        _mk(spark, [(1, "a", None, 1)]),
    ).collect()[0]
    assert out["diff_status"] == "changed"
    assert list(out["changed_fields"]) == ["lang"]


def test_compare_fields_subset_and_validation(spark):
    o, n = _mk(spark, OLD), _mk(spark, NEW)
    out = {
        r["doc_id"]: r["diff_status"]
        for r in corpus_diff(o, n, compare_fields=["text"]).collect()
    }
    assert out[3] == "unchanged"  # lang difference not compared
    assert out[2] == "changed"
    with pytest.raises(ValueError, match="missing key"):
        corpus_diff(o.drop("doc_id"), n)
    with pytest.raises(ValueError, match="missing compare"):
        corpus_diff(o, n, compare_fields=["nope"])
    with pytest.raises(ValueError, match="overlap"):
        corpus_diff(o, n, compare_fields=["doc_id"])
    with pytest.raises(ValueError, match="collides"):
        corpus_diff(o, n, status_field="text")
    with pytest.raises(ValueError, match="non-empty"):
        corpus_diff(o, n, key_fields=[])


def test_duplicate_and_null_keys_raise_in_plan(spark):
    o = _mk(spark, OLD)
    dup = _mk(spark, NEW + [(6, "zeta2", "en", 61)])
    with pytest.raises(Exception, match="not unique"):
        corpus_diff(o, dup).collect()
    withnull = _mk(spark, NEW + [(None, "ghost", "en", 0)])
    with pytest.raises(Exception, match="NULL key"):
        corpus_diff(o, withnull).collect()
    # ... and on the OLD side too
    with pytest.raises(Exception, match="not unique"):
        corpus_diff(dup, o).collect()


def test_multi_key_and_summary(spark):
    schema = "src string, doc_id bigint, text string"
    o = _mk(
        spark,
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
        schema,
    )
    n = _mk(
        spark,
        [("a", 1, "x"), ("a", 2, "Y2"), ("b", 2, "w")],
        schema,
    )
    diff = corpus_diff(o, n, key_fields=("src", "doc_id"))
    out = {
        (r["src"], r["doc_id"]): r["diff_status"] for r in diff.collect()
    }
    assert out == {
        ("a", 1): "unchanged",
        ("a", 2): "changed",
        ("b", 1): "removed",
        ("b", 2): "added",
    }
    summary = {
        (r["src"], r["diff_status"]): r["n"]
        for r in diff_summary(diff, group_by=("src",)).collect()
    }
    assert summary == {
        ("a", "unchanged"): 1,
        ("a", "changed"): 1,
        ("b", "removed"): 1,
        ("b", "added"): 1,
    }
    plain = {
        r["diff_status"]: r["n"] for r in diff_summary(diff).collect()
    }
    assert plain == {
        "unchanged": 1,
        "changed": 1,
        "removed": 1,
        "added": 1,
    }


def test_plan_one_exchange_per_side(spark):
    diff = corpus_diff(_mk(spark, OLD), _mk(spark, NEW))
    plan = diff._sc._jvm.PythonSQLUtils.explainString(
        diff._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    # plain-equality join keys let the duplicate-key guard window
    # RIDE the join's key partitioning: exactly one exchange per
    # snapshot, none added by the guards (a null-safe join would
    # re-exchange both sides on coalesced keys)
    assert tree.count("Exchange (") == 2, plan
    assert "SortMergeJoin FullOuter" in tree, plan
