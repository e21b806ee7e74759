"""Physical-plan linting — the repo's design-for-scale checklist as
a library.

Every operator family here ships with plan-spy tests asserting "ONE
exchange", "no Python eval in the hot path", "filters reached the
scan".  This module makes those assertions a public, reusable API so
a pipeline author can hold THEIR composed plan to the same contract:

* :func:`plan_report` — one dict describing the physical plan: node
  counts (exchanges by kind, joins by strategy, scans, sorts, Python
  eval nodes), per-scan pushed filters / read schemas, and a list of
  WARNINGS for the patterns that melt down at 100 TB:
  - a cartesian product or condition-free broadcast nested loop
    (O(n*m) — almost always an accidental join key mismatch);
  - row-at-a-time Python eval (``BatchEvalPython``) — the 10-100x
    slow path vs Arrow (``ArrowEvalPython``/``mapInPandas``), which
    is NOT warned (it is the documented legitimate tier here);
  - a global sort (single-partition ordering of the full dataset);
  - a parquet scan whose ``PushedFilters`` is empty while the plan
    filters on its columns above it — the filter runs after IO
    instead of inside it.
* :func:`assert_plan` — the test-side contract: bound the exchange
  count, forbid node types, require warnings-free plans; raises with
  the offending plan excerpt.

Static analysis only — it reads the executed plan, it never runs the
query.  AQE re-plans at runtime (an ``AdaptiveSparkPlan`` is
inspected through its initial plan), so treat counts as the
pre-runtime shape: what Catalyst INTENDS, which is what code review
should hold opinions about.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

# node-name markers in executedPlan().toString()
_PYTHON_ROW = "BatchEvalPython"
_PYTHON_ARROW = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
_CARTESIAN = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _plans(df: DataFrame) -> tuple:
    qe = df._jdf.queryExecution()
    formatted = df._sc._jvm.PythonSQLUtils.explainString(qe, "formatted")
    return qe.executedPlan().toString(), formatted


def plan_report(df: DataFrame) -> Dict[str, object]:
    """Inspect ``df``'s physical plan; returns counts, per-scan
    pushdown details, and scale warnings (see module docstring)."""
    plan, formatted = _plans(df)
    # the formatted tree is the FIRST block; node details repeat the
    # node names below it (the round-9 lesson: "Scan parquet" appears
    # in both, so counting must stay inside one representation)
    counts = {
        # SHUFFLE exchanges only: BroadcastExchange is not a shuffle
        # (the whole point of broadcasting) and ReusedExchange REMOVES
        # one — counting either would fail a max_exchanges=0 contract
        # on exactly the plans that honor it (the repo's own plan-spy
        # convention: tests/test_plan_quality.py)
        "exchanges": len(
            re.findall(r"(?<!Broadcast)(?<!Reused)Exchange ", plan)
        ),
        "exchanges_hash": plan.count("Exchange hashpartitioning"),
        "exchanges_range": plan.count("Exchange rangepartitioning"),
        "exchanges_single": plan.count("Exchange SinglePartition"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "scans": plan.count("Scan "),
        "sorts": plan.count("Sort ["),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "shuffled_hash_joins": plan.count("ShuffledHashJoin"),
        "cartesian_products": sum(plan.count(m) for m in _CARTESIAN),
        "python_row_evals": plan.count(_PYTHON_ROW),
        "python_arrow_evals": sum(plan.count(m) for m in _PYTHON_ARROW),
        "windows": plan.count("Window ["),
        "adaptive": "AdaptiveSparkPlan" in plan,
    }

    # per-scan pushdown visibility from the formatted details — one
    # block per "Location:" line (a scan whose predicate is entirely
    # non-pushable, e.g. a Python UDF filter, has NO PushedFilters
    # line at all; that must still surface as an empty-pushdown scan)
    scans: List[Dict[str, str]] = []
    loc_starts = [m.start() for m in re.finditer(r"Location:", formatted)]
    for i, start in enumerate(loc_starts):
        end = (
            loc_starts[i + 1] if i + 1 < len(loc_starts) else len(formatted)
        )
        block = formatted[start:end]
        pf = re.search(r"PushedFilters: \[(?P<filters>[^\]]*)\]", block)
        rs = re.search(r"ReadSchema: (?P<rs>.*)", block)
        scans.append(
            {
                "location": block.split("\n")[0][:200],
                "pushed_filters": pf.group("filters") if pf else "",
                "read_schema": rs.group("rs")[:300] if rs else "",
            }
        )

    warnings: List[str] = []
    if counts["cartesian_products"]:
        warnings.append(
            "cartesian/nested-loop join in the plan — O(n*m) row "
            "pairs; check the join keys (a type mismatch or missing "
            "equi-condition is the usual cause)"
        )
    if counts["python_row_evals"]:
        warnings.append(
            "row-at-a-time Python eval (BatchEvalPython) — 10-100x "
            "slower than Arrow; convert the UDF to a pandas_udf or "
            "express it in pyspark.sql.functions"
        )
    # a global sort materializes a total order: Sort with global=true
    # (printed as 'Sort [...], true,') outside TakeOrderedAndProject.
    # Non-greedy across the key list: a sort KEY may itself contain
    # ']' (e.g. arr#5[0]), which a [^\]]* class would stop at and
    # miss the match entirely
    if re.search(r"Sort \[.*?\], true, ", plan):
        warnings.append(
            "global sort in the plan — a full-dataset total order "
            "(single-partition final stage); at corpus scale prefer "
            "TakeOrderedAndProject (limit), sortWithinPartitions, or "
            "an explicit order column"
        )
    # an actual Filter NODE in the formatted TREE (first block) — a
    # bare substring test would match the scan's own
    # 'PushedFilters:'/'PartitionFilters:' metadata and fire on
    # filterless plans
    tree = formatted.split("\n\n")[0]
    has_filter_node = re.search(r"\bFilter \(\d+\)", tree) is not None
    if scans and any(
        s["pushed_filters"] == "" for s in scans
    ) and has_filter_node:
        warnings.append(
            "a scan has no pushed filters while the plan filters "
            "above it — if the predicate references scanned columns, "
            "it is running AFTER IO; check for casts/UDFs wrapping "
            "the filter column"
        )
    return {
        "counts": counts,
        "scans": scans,
        "warnings": warnings,
        "plan": plan,
    }


def assert_plan(
    df: DataFrame,
    max_exchanges: Optional[int] = None,
    forbid: Sequence[str] = (),
    warnings_free: bool = False,
) -> Dict[str, object]:
    """Raise ``AssertionError`` (with the offending plan excerpt)
    unless the physical plan satisfies the contract; returns the
    :func:`plan_report` on success so callers can assert further."""
    report = plan_report(df)  # one plan materialization, reused below
    plan = report["plan"]
    counts = report["counts"]
    if max_exchanges is not None:
        total = counts["exchanges"]
        if total > max_exchanges:
            raise AssertionError(
                f"plan has {total} exchanges, contract allows "
                f"{max_exchanges}:\n{plan[:3000]}"
            )
    for marker in forbid:
        if marker in plan:
            raise AssertionError(
                f"forbidden node {marker!r} in plan:\n{plan[:3000]}"
            )
    if warnings_free and report["warnings"]:
        raise AssertionError(
            f"plan warnings: {report['warnings']}\n{plan[:3000]}"
        )
    return report
