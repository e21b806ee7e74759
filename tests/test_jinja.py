"""Jinja mappers (reference: src/smashed/mappers/promptsource.py
semantics; template split on |||, stripped)."""

import pytest

from smashed_spark.operators.jinja import FewShotJinjaMapper, JinjaMapper


def test_jinja_source_target(spark):
    df = spark.createDataFrame(
        [("What is 2+2?", "4"), ("Capital of France?", "Paris")],
        "question: string, answer: string",
    )
    out = (
        JinjaMapper("Q: {{question}}\nA: |||{{answer}}")
        .map(df)
        .orderBy("question")
        .collect()
    )
    assert out[0].source == "Q: Capital of France?\nA:"
    assert out[0].target == "Paris"
    # merge semantics: original columns survive
    assert out[0].question == "Capital of France?"


def test_jinja_no_target(spark):
    df = spark.createDataFrame([("hi",)], "q: string")
    out = JinjaMapper("say {{q}}").map(df)
    assert "target" not in out.columns
    assert out.collect()[0].source == "say hi"


def test_jinja_multiple_targets(spark):
    df = spark.createDataFrame([("x",)], "q: string")
    out = (
        JinjaMapper("{{q}}|||a|||b", return_multiple_targets=True)
        .map(df)
        .collect()[0]
    )
    assert out.source == "x" and out.target == ["a", "b"]


def test_jinja_missing_field_raises(spark):
    df = spark.createDataFrame([("x",)], "q: string")
    with pytest.raises(ValueError):
        JinjaMapper("{{q}} {{nope}}").map(df)


def test_fewshot_jinja(spark):
    df = spark.createDataFrame(
        [(i, f"q{i}", f"a{i}") for i in range(6)],
        "i: bigint, q: string, a: string",
    )
    tmpl = (
        "{% for s in __shots__ %}{{s.q}}>{{s.a}};{% endfor %}{{q}}|||{{a}}"
    )
    out = (
        FewShotJinjaMapper(tmpl, num_shots=2, order_by=["i"])
        .map(df)
        .collect()
    )
    got = sorted((r.source, r.target) for r in out)
    assert got == [
        ("q0>a0;q1>a1;q2", "a2"),
        ("q3>a3;q4>a4;q5", "a5"),
    ]


def test_fewshot_tolerates_unorderable_payload_columns(spark):
    """A map-typed (unorderable) column must not break the group fold:
    ordering compares only the order_by columns (array_sort comparator),
    never the payload — sort_array over the whole struct would fail
    analysis here."""
    df = spark.createDataFrame(
        [(i, f"q{i}", f"a{i}", {"k": f"v{i}"}) for i in range(6)],
        "i: bigint, q: string, a: string, meta: map<string,string>",
    )
    tmpl = (
        "{% for s in __shots__ %}{{s.q}}>{{s.a}};{% endfor %}{{q}}|||{{a}}"
    )
    out = (
        FewShotJinjaMapper(tmpl, num_shots=2, order_by=["i"])
        .map(df)
        .collect()
    )
    got = sorted((r.source, r.target) for r in out)
    assert got == [
        ("q0>a0;q1>a1;q2", "a2"),
        ("q3>a3;q4>a4;q5", "a5"),
    ]


def test_fewshot_keep_last(spark):
    df = spark.createDataFrame(
        [(i, f"q{i}") for i in range(4)], "i: bigint, q: string"
    )
    tmpl = "{% for s in __shots__ %}{{s.q}};{% endfor %}{{q}}"
    # groups of 3: [0,1,2] full, [3] partial
    drop = FewShotJinjaMapper(tmpl, num_shots=2, order_by=["i"]).map(df)
    assert drop.count() == 1
    keep = FewShotJinjaMapper(
        tmpl, num_shots=2, keep_last=True, order_by=["i"]
    ).map(df)
    got = sorted(r.source for r in keep.collect())
    assert got == ["q0;q1;q2", "q3"]


def test_fewshot_max(spark):
    df = spark.createDataFrame(
        [(i, f"q{i}") for i in range(3)], "i: bigint, q: string"
    )
    tmpl = "{% for s in __shots__ %}{{s.q}};{% endfor %}{{q}}"
    out = FewShotJinjaMapper(tmpl, num_shots="max", order_by=["i"]).map(df)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].source == "q0;q1;q2"


def test_fewshot_validation():
    with pytest.raises(KeyError):
        FewShotJinjaMapper("{{q}}", num_shots=2, order_by=["i"])
    with pytest.raises(ValueError):
        FewShotJinjaMapper(
            "{{__shots__}}{{q}}", num_shots=-2, order_by=["i"]
        )
