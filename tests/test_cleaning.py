"""Canned cleaning recipes (Gopher quality rules, C4 line cleaning):
semantics pinned by driver-side Python replays on synthetic docs plus
plan checks (narrow — no exchange, no Python stage)."""

import re

import pytest
from pyspark.sql import functions as F

from smashed_spark.functions.cleaning import (
    C4CleanMapper,
    GopherQualityFilterMapper,
)


def _gopher_oracle(text, m):
    words = [w for w in re.split(r"\s+", text) if w]
    n = len(words)
    mean_len = sum(len(w) for w in words) / n if n else 0.0
    lines = text.split("\n")
    bullets = sum(
        1 for ln in lines if re.match(r"^([\*\-•])", ln.strip())
    ) / len(lines)
    ellipsis = sum(
        1 for ln in lines if re.search(r"(\.\.\.|…)$", ln.strip())
    ) / len(lines)
    alpha = (
        sum(1 for w in words if re.search(r"[A-Za-z]", w)) / n if n else 0.0
    )
    sym = (text.count("#") + text.count("...")) / n if n else 0.0
    if n < m.min_words:
        return "too_few_words"
    if n > m.max_words:
        return "too_many_words"
    if mean_len < m.min_mean_word_len:
        return "mean_word_len_low"
    if mean_len > m.max_mean_word_len:
        return "mean_word_len_high"
    if bullets > m.max_bullet_line_frac:
        return "bullet_lines"
    if ellipsis > m.max_ellipsis_line_frac:
        return "ellipsis_lines"
    if alpha < m.min_alpha_word_frac:
        return "non_alpha_words"
    if sym > m.max_symbol_ratio:
        return "symbol_ratio"
    return ""


GOPHER_DOCS = [
    " ".join(f"word{i}" for i in range(60)),                 # clean
    "short doc",                                             # too few
    " ".join("aa" for _ in range(60)),                       # mean len low
    " ".join("x" * 12 for _ in range(60)),                   # mean len high
    "\n".join("* bullet line here ok" for _ in range(4)),    # bullets
    "\n".join(
        [" ".join(f"wordy{i}" for i in range(20)) + " ..."] * 4
    ),                                                       # ellipsis ends
    " ".join("123" for _ in range(60)),                      # non-alpha
    " ".join(
        f"word{i} #" if i % 5 == 0 else f"word{i}" for i in range(60)
    ),                                                       # symbols
]


def test_gopher_rules_match_python_replay(spark):
    m = GopherQualityFilterMapper(min_words=12)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOPHER_DOCS)],
        "doc_id: bigint, text: string",
    )
    got = {
        r.doc_id: (r.gopher_keep, r.gopher_reason)
        for r in m.map(df).collect()
    }
    for i, t in enumerate(GOPHER_DOCS):
        want = _gopher_oracle(t, m)
        assert got[i] == (int(want == ""), want), (i, t[:40])
    # the fixture exercises every rule at least once plus a keeper
    assert {r for _, r in got.values()} >= {
        "", "too_few_words", "mean_word_len_low", "mean_word_len_high",
        "bullet_lines", "ellipsis_lines", "non_alpha_words",
        "symbol_ratio",
    }
    kept = GopherQualityFilterMapper(min_words=12, drop=True).map(df)
    assert kept.count() == sum(1 for k, _ in got.values() if k)
    assert "gopher_keep" not in kept.columns


def _c4_oracle(text, m):
    lines = []
    for ln in text.split("\n"):
        t = ln.strip()
        words = [w for w in re.split(r"\s+", t) if w]
        if re.search("[.!?\"']$", t) and len(words) >= m.min_line_words:
            lines.append(ln)
    clean = "\n".join(lines)
    lower = text.lower()
    taboo = any(mk in lower for mk in m.taboo_markers) or (
        "{" in text or "}" in text
    )
    return clean, int((not taboo) and len(lines) >= m.min_doc_lines)


C4_DOCS = [
    "This is a good first sentence right here.\n"
    "Another proper line follows here too!\n"
    "And a third full sentence closes it out.\n"
    "no punct line",
    "Too short.",
    "This mentions lorem ipsum somewhere in the text, sadly.\n"
    "More good text follows here now.\n"
    "And even more text follows after that.",
    "function() { return 1; } is code.\nBut this line is fine here.",
    'He said "stop right there my friend!"\nShort.\n'
    "A third line that ends quite well.",
    "ends with an ellipsis but long enough to pass...\n"
    "and a normal closing sentence right here.",
]


def test_c4_cleaning_matches_python_replay(spark):
    m = C4CleanMapper()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(C4_DOCS)],
        "doc_id: bigint, text: string",
    )
    got = {
        r.doc_id: (r.c4_text, r.c4_keep) for r in m.map(df).collect()
    }
    for i, t in enumerate(C4_DOCS):
        assert got[i] == _c4_oracle(t, m), (i, t[:40])
    # taboo and brace docs rejected, 3-sentence doc kept, 2-line
    # survivor rejected by the min_doc_lines (sentence-count) rule
    assert got[0][1] == 1 and got[2][1] == 0 and got[3][1] == 0
    assert got[4][1] == 0 and got[5][1] == 0
    dropped = C4CleanMapper(drop=True).map(df)
    assert dropped.count() == sum(1 for _, k in got.values() if k)
    # drop mode replaces text with the cleaned lines
    assert "c4_text" not in dropped.columns
    assert {
        r.text for r in dropped.collect()
    } == {c for (c, k) in got.values() if k}


def test_cleaning_plans_are_narrow(spark):
    df = spark.createDataFrame(
        [(0, "A fine sentence here.\nAnother one follows now.")],
        "doc_id: bigint, text: string",
    )
    for mapper in (GopherQualityFilterMapper(), C4CleanMapper()):
        out = mapper.map(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan, plan
        for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert bad not in plan, plan
