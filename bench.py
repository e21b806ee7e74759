#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a FULL execution: a noop-sink write (r6),
which evaluates every output column of every row JVM-side without
driver-side result blowup.  (Earlier rounds timed `count()`, which
lets Catalyst prune final projections — and can eliminate entire
join-on-unique-key pipelines — so those rounds' absolute numbers
undercount expression cost; see PLANS.md round-6 notes.)  Timed
`$SPARK_GRAFT_BENCH_REPS` times (default 5 since r11 — the
clean-host bench-of-record floor; 3 reps let warmup outliers through)
with per-query session isolation.  "queries" holds
the per-query minimum — the noise-resistant estimator (single shots
swing up to 40% from host/VM noise).  Raw per-rep timings (for
separating regressions from noise round-over-round) are written to the
sidecar `$SPARK_GRAFT_BENCH_REPS_PATH` (default BENCH_REPS.json) and
echoed to stderr; they are deliberately kept OFF the stdout JSON line so
it stays within the driver's tail-capture buffer.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("smashed_spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # Session-startup warmup so no query is charged for one-time
    # infrastructure: JVM/codegen + parquet reader, the Python worker
    # pool (first pandas stage pays worker spawn + numpy/pandas import),
    # and the Structured Streaming engine (first streaming query pays
    # engine + state-store-provider init).  All three are per-session
    # costs that amortize to nothing at scale.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    def _warm_pandas(batches):
        yield from batches

    spark.range(1000).mapInPandas(_warm_pandas, "id long").count()
    import shutil as _sh
    import tempfile as _tf

    _wdir = _tf.mkdtemp(prefix="smashed_warm_")
    spark.range(8).selectExpr(
        "id AS user_id", "timestamp'2026-01-01' AS ts", "0.0 AS value"
    ).write.parquet(_wdir + "/src")
    try:
        from smashed_spark.streaming.stateful import run_sessionize_bounded

        _stream = spark.readStream.schema(
            "user_id bigint, ts timestamp, value double"
        ).parquet(_wdir + "/src")
        run_sessionize_bounded(_stream, "smashed_warm_sessions")
        spark.catalog.dropTempView("smashed_warm_sessions")
    except Exception:
        pass  # streaming warmup is best-effort
    _sh.rmtree(_wdir, ignore_errors=True)

    queries = entry_mod.queries()
    # Dev aid: SPARK_GRAFT_BENCH_ONLY="a,b,c" restricts the run to the
    # named queries (the driver never sets it, so per-round runs are full).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        queries = {k: v for k, v in queries.items() if k in keep}
    import gc
    import glob
    import shutil
    import tempfile

    def isolate() -> None:
        """Clear cross-query session debris so one query's leftovers
        (cached tables, streaming state, temp-dir writes, unreleased
        broadcasts) don't tax the next query's timing — BENCH_r02
        showed 2-4x regressions on byte-identical code from exactly
        this shared-session pressure."""
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:
                pass
        spark.catalog.clearCache()
        for d in glob.glob(tempfile.gettempdir() + "/smashed_*"):
            shutil.rmtree(d, ignore_errors=True)
        gc.collect()  # drops py4j refs -> JVM ContextCleaner reclaims
        spark.sparkContext._jvm.System.gc()

    # best-of-N per query: single-shot timings on this host swing up to
    # 40% run-to-run from neighbor/VM noise (observed 51-72 s totals on
    # identical code); the per-query minimum is the standard
    # noise-resistant estimator of the query's actual cost.  Default
    # raised 3 -> 5 in r11 (the clean-host bench of record): three reps
    # still let a warmup outlier through often enough that rounds 8-10
    # each carried 1.3-1.4x phantom "regressions" on untouched code.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    # r13 host-noise guard: BENCH_r11/r12 driver records were both
    # captured at loadavg 6-8 and overstated the engine ~18% vs the
    # same-code idle-host run.  Defend the record: wait (bounded) for
    # the 1-min loadavg to drop below the threshold before timing, and
    # if the cap expires while still loaded, stamp an explicit
    # host_noise verdict into the artifact so a hot run is identifiable
    # without cross-referencing anything else.
    idle_below = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOAD", "4.0"))
    idle_cap = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "300"))
    waited = 0.0
    while os.getloadavg()[0] >= idle_below and waited < idle_cap:
        print(
            f"# waiting for idle host: loadavg {os.getloadavg()[0]:.2f} "
            f">= {idle_below} ({waited:.0f}/{idle_cap:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(10)
        waited += 10
    load_start = os.getloadavg()
    host_noise = load_start[0] >= idle_below
    timings: dict[str, float] = {}
    raw: dict[str, list[float]] = {}
    for name in sorted(queries):
        fn = queries[name]
        best = -1.0
        raw[name] = []
        for _ in range(reps):
            isolate()
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # r6: noop sink, not count() — count lets Catalyst
                # prune every column expression above the last
                # join/agg (and can ELIMINATE left joins against
                # unique-keyed aggregates outright, zeroing a whole
                # pipeline's measured cost); the noop sink evaluates
                # every output column of every row JVM-side and
                # writes nothing, so the timing covers the plan the
                # driver's value-comparison actually executes
                df.write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 4)
                raw[name].append(dt)
                best = dt if best < 0 else min(best, dt)
            except Exception as e:  # keep benching the rest
                print(f"# {name}: FAILED {e}", file=sys.stderr)
                break
        timings[name] = best
        if best >= 0:
            # no row-count reporting pass: an untimed count() would
            # re-execute every query once more (~1/3 extra wall on the
            # driver's per-round run); the correctness gate, not the
            # bench, owns row counts
            print(f"# {name}: {best:.3f}s", file=sys.stderr)

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 4)
    # r15 host normalization (r14 VERDICT ask #5): this host's speed
    # drifts up to ~1.2x round-to-round with zero code change (PLANS.md
    # r14 bench analysis derived the factor by hand).  A pinned control
    # set of single-stage queries whose code has not changed since the
    # r13 record — and their r13-record seconds — lets every artifact
    # carry its own host factor: median(this_run / r13_record) over the
    # controls.  total_normalized = total / host_factor is the
    # cross-round-comparable number; judges should read per-query
    # deltas against host_factor, not raw.  If a control's code ever
    # changes, REPIN its reference here in the same commit.
    control_ref = {
        "filter_project": 0.1514,
        "unpack_explode": 0.1734,
        "masks_family": 0.5289,
    }
    ratios = sorted(
        ok[name] / ref
        for name, ref in control_ref.items()
        if ok.get(name, -1) > 0
    )
    # the references are sf0.1-record seconds — the factor is
    # meaningless at other scales; and a factor from a PARTIAL
    # control set (a control query failed this run) would silently
    # skew normalized totals, so all controls must have run
    host_factor = (
        round(statistics.median(ratios), 4)
        if len(ratios) == len(control_ref) and sf == "0.1"
        else None
    )
    # Per-rep raw timings go to a sidecar file (and stderr), NOT the
    # stdout JSON: round 4 put "reps" on the stdout line, which grew past
    # the driver's tail-capture buffer, truncated the head of the line,
    # and cost the round its entire bench signal (BENCH_r04 parsed:null).
    # The machine-readable contract is the compact object below as the
    # FINAL stdout line.
    reps_path = os.environ.get("SPARK_GRAFT_BENCH_REPS_PATH", "BENCH_REPS.json")
    try:
        with open(reps_path, "w") as f:
            json.dump({"reps": raw, "sf": sf, "reps_per_query": reps}, f, indent=1)
    except OSError as e:
        print(f"# reps sidecar write failed: {e}", file=sys.stderr)
    print(f"# reps: {json.dumps(raw)}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # machine-readable methodology marker: rounds <= 5
                # timed `count()` (Catalyst could prune narrow
                # pipelines out of the measurement — see PLANS.md r6
                # notes), rounds >= 6 time a full-plan noop-sink
                # write.  Tooling comparing rounds across this
                # boundary must not read the step as a regression.
                "action": "noop",
                # bench-of-record metadata (r11): per-query MIN over
                # this many reps, host load captured at both ends so a
                # noisy-host run is identifiable from the artifact alone
                "reps_per_query": reps,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                # r13: True iff the idle-wait cap expired while the
                # 1-min loadavg was still >= the threshold — timings in
                # this artifact were taken on a loaded host and
                # overstate the engine's cost
                "host_noise": host_noise,
                "idle_wait_sec": round(waited, 1),
                # r15: per-artifact host factor from the pinned
                # control set (median this-run/r13-record over
                # filter_project, unpack_explode, masks_family) and
                # the host-equivalent total.  1.0 = the r13 record's
                # host speed; see the comment at control_ref.
                "host_factor": host_factor,
                "total_normalized": (
                    round(total / host_factor, 4)
                    if host_factor
                    else None
                ),
                "control_queries": sorted(control_ref),
                "methodology_note": (
                    "PLANS.md 'Round-6 measurement fix: noop-sink "
                    "timing' + 'Round-6 bench host-noise forensics'"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
