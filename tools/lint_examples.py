#!/usr/bin/env python
"""Run every example script with lint hooks on all DataFrame actions:
each plan is checked for row-at-a-time Python evals (BatchEvalPython)
immediately before it executes — the r13 extension of the gate-wide
sweep (tests/test_plan_quality.py) to demo code, so an example cannot
quietly regress into the Python-eval tier while still "working".

One process for the whole sweep: spark.stop()/getOrCreate() cycles
SparkContexts inside a single JVM, so the per-example cost is the
example, not a JVM boot.

Usage: python tools/lint_examples.py [sf_dir] [example.py ...]
Exits non-zero listing offenders.  Used by
tests/test_plan_quality.py::test_no_row_python_eval_in_example_plans.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OFFENDERS = []
_CURRENT = {"example": "?"}


def _lint(df) -> None:
    from smashed_spark.core.lint import plan_report

    try:
        counts = plan_report(df)["counts"]
    except Exception:
        return  # e.g. a frame tied to an already-stopped context
    if counts["python_row_evals"]:
        OFFENDERS.append(
            (_CURRENT["example"], counts["python_row_evals"])
        )


def _install_hooks() -> None:
    import pyspark.sql.classic.dataframe as cdf
    import pyspark.sql.readwriter as crw

    # TRAP 23: patch the CLASSIC classes — the pyspark.sql.DataFrame
    # base's methods are overridden there and patching the base does
    # nothing in Spark 4
    def wrap_action(fn):
        def g(self, *a, **k):
            _lint(self)
            return fn(self, *a, **k)

        return g

    for name in ("collect", "show", "count", "toPandas", "toLocalIterator"):
        setattr(
            cdf.DataFrame, name, wrap_action(getattr(cdf.DataFrame, name))
        )

    def wrap_write(fn):
        def g(self, *a, **k):
            df = getattr(self, "_df", None)
            if df is not None:
                _lint(df)
            return fn(self, *a, **k)

        return g

    for name in ("save", "parquet", "json", "csv", "orc", "text"):
        setattr(
            crw.DataFrameWriter,
            name,
            wrap_write(getattr(crw.DataFrameWriter, name)),
        )


def main() -> None:
    import glob
    import runpy

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    paths = sys.argv[2:] or sorted(
        glob.glob(os.path.join(REPO, "examples", "*.py"))
    )
    # the py4j JVM is launched by the FIRST SparkContext and its heap
    # (-Xmx from spark.driver.memory) persists across the stop()/
    # getOrCreate() cycles the examples do — bootstrap it at 6g, or
    # the 15th example inherits the 1g default and dies mid-broadcast
    from pyspark.sql import SparkSession

    SparkSession.builder.master("local[4]").config(
        "spark.driver.memory", "6g"
    ).config("spark.ui.enabled", "false").getOrCreate().stop()
    _install_hooks()
    failed = []
    for path in paths:
        name = os.path.basename(path)
        _CURRENT["example"] = name
        print(f"== {name}", flush=True)
        argv_prev = sys.argv
        sys.argv = [path, sf_dir]
        try:
            runpy.run_path(path, run_name="__main__")
        except SystemExit as e:
            if e.code not in (0, None):
                failed.append((name, f"exit {e.code}"))
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failed.append((name, f"{type(e).__name__}: {e}"))
        finally:
            sys.argv = argv_prev
    import json

    results = {}
    for path in paths:
        name = os.path.basename(path)
        results[name] = {
            "python_row_evals": sum(
                n for ex, n in OFFENDERS if ex == name
            ),
            "error": next((msg for ex, msg in failed if ex == name), None),
        }
    # machine-readable per-example verdicts as the FINAL stdout line
    # (consumed by tests/test_plan_quality.py's parametrized sweep)
    print("RESULTS: " + json.dumps(results))
    if OFFENDERS:
        print(f"LINT OFFENDERS: {OFFENDERS}", file=sys.stderr)
    if failed:
        print(f"FAILED EXAMPLES: {failed}", file=sys.stderr)
    if OFFENDERS or failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
