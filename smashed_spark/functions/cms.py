"""Deterministic, md5-portable Count-Min sketch — approximate
per-key FREQUENCY, completing the mergeable-sketch family (KMV =
distinct counts, Bloom = membership, CMS = frequency).  The reference
has no aggregation surface at all (additive, SURVEY.md §2.10); Spark
has no frequency sketch beyond ``freqItems`` (whose output is
item-set-only, carries no counts, and is not mergeable across
batches).

Where it pays at 100 TB: a running ingest pipeline wants "roughly how
often has this domain / token / digest appeared so far" without
keeping an exact per-key table (unbounded state) and without
re-scanning history.  A CMS is a FIXED-size driver artifact
(``depth × width`` int64 counters) that merges by element-wise
addition — fit one per micro-batch, add into the running sketch as
the batch commits, exactly like the Bloom OR-merge.  Guarantees are
one-sided: estimates NEVER undercount (Cormode & Muthukrishnan 2005
— every counter a key hashes to received all of its increments), and
overcount by at most ``e/width × N`` with probability ``1 −
e^-depth`` (N = total weight).  One-sidedness is what makes the
heavy-hitter composition sound: "estimate >= threshold" yields a
SUPERSET of the truly-hot keys, and ONE exact candidate-filtered
confirm pass (the core/skew.py ``hot_keys`` pattern, with the CMS
replacing the non-mergeable ``freqItems`` probe) removes the false
positives — no hot key can be missed.

Determinism + portability: row ``j``'s counter index derives from ONE
md5 per key via Kirsch-Mitzenmacher double hashing — ``h1 =
md5[0:8]``, ``h2 = md5[8:16] | 1``, ``pos_j = (h1 + j*h2) % width``
— the same convention as functions/bloom.py, byte-identical in
DuckDB (test-pinned), so fits are partition-invariant and
SQL-replayable.

Plan shape: the fit is ONE exchange on the (row, position) counter
key — map-side partial counts/sums fold each partition before the
shuffle — and collects at most ``depth × width`` non-zero counter
rows (the shuffle and the collect are bounded by the sketch
GEOMETRY, not the corpus).  Estimation computes positions JVM-side
(whole-stage codegen) and gathers counters in ONE vectorized numpy
pass inside an Arrow-batched pandas UDF, the Bloom-probe shape.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CountMinSketch",
    "fit_cms",
    "with_cms_estimate",
    "load_cms",
]

_MAX_COUNTERS = 1 << 24  # 128 MiB of int64 counters — driver artifact
_MAX_DEPTH = 16


def _portable_key_str(value) -> str:
    """Driver-side rendering matching Spark's CAST(col AS STRING) for
    the portably-renderable types.  bool precedes int (bool IS an
    int in Python, but Spark renders booleans as true/false)."""
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    raise TypeError(
        f"CountMinSketch.estimate: cannot portably render a "
        f"{type(value).__name__} key the way Spark's CAST(... AS "
        "STRING) did at fit time (Java Double.toString has no "
        "reliable Python replica); pre-format the key column to "
        "string at fit time or use with_cms_estimate."
    )


class CountMinSketch:
    """The fitted counter matrix + its parameters.  ``counts`` is a
    numpy int64 array of shape ``(depth, width)``.  ``total`` is the
    summed weight the sketch absorbed (the N in the error bound).
    Mergeable via :meth:`merge` (element-wise add — exactly the
    sketch of the concatenated streams)."""

    def __init__(self, counts, depth: int, width: int, salt: int,
                 total: int):
        import numpy as np

        self.counts = np.asarray(counts, dtype=np.int64).reshape(
            (depth, width)
        )
        self.depth = int(depth)
        self.width = int(width)
        self.salt = int(salt)
        self.total = int(total)
        _check_geometry(self.depth, self.width)

    def estimate(self, value) -> int:
        """Point estimate: min over the key's counter per row —
        never below the true weight of ``value``.  The key is
        formatted to match Spark's ``CAST(col AS STRING)`` (the fit
        side): str passes through, int/bool use Spark's rendering.
        Floats are REFUSED — Java's ``Double.toString`` cannot be
        replicated reliably from Python, and a formatting mismatch
        would consult the wrong counters and silently undercount
        (breaking the one-sided contract).  Pre-format float keys to
        strings at fit time, or use :func:`with_cms_estimate`, which
        shares the fit's JVM cast."""
        import hashlib

        import numpy as np

        dig = hashlib.md5(
            f"{_portable_key_str(value)}:cms:{self.salt}".encode()
        ).hexdigest()
        h1 = int(dig[0:8], 16)
        h2 = int(dig[8:16], 16) | 1
        idx = [(h1 + j * h2) % self.width for j in range(self.depth)]
        return int(
            np.min(self.counts[np.arange(self.depth), idx])
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        """Stream-concatenation sketch (element-wise add).
        Parameters must match exactly — differing geometry/salt would
        silently break the never-undercount contract."""
        if (
            self.depth != other.depth
            or self.width != other.width
            or self.salt != other.salt
        ):
            raise ValueError(
                "cannot merge CMS sketches with different "
                "(depth, width, salt): "
                f"({self.depth}, {self.width}, {self.salt}) vs "
                f"({other.depth}, {other.width}, {other.salt})"
            )
        return CountMinSketch(
            self.counts + other.counts,
            self.depth,
            self.width,
            self.salt,
            self.total + other.total,
        )

    def save(self, path: str) -> None:
        from ..sources.io_utils import open_file_for_write

        with open_file_for_write(f"{path}/meta.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "depth": self.depth,
                        "width": self.width,
                        "salt": self.salt,
                        "total": self.total,
                    }
                )
            )
        with open_file_for_write(f"{path}/counts.bin", "wb") as f:
            f.write(self.counts.astype("<i8").tobytes())


def load_cms(path: str) -> CountMinSketch:
    import numpy as np

    from ..sources.io_utils import open_file_for_read

    with open_file_for_read(f"{path}/meta.json", "r") as f:
        meta = json.loads(f.read())
    with open_file_for_read(f"{path}/counts.bin", "rb") as f:
        counts = np.frombuffer(f.read(), dtype="<i8").copy()
    return CountMinSketch(
        counts, meta["depth"], meta["width"], meta["salt"],
        meta["total"],
    )


def _check_geometry(depth: int, width: int) -> None:
    if not 1 <= depth <= _MAX_DEPTH:
        raise ValueError(f"depth must be 1..{_MAX_DEPTH}, got {depth}")
    if width < 1 or depth * width > _MAX_COUNTERS:
        raise ValueError(
            f"width must be >= 1 with depth*width <= {_MAX_COUNTERS} "
            f"(128 MiB of counters), got depth={depth} width={width}"
        )


def _position_cols(
    col: Column, depth: int, width: int, salt: int
) -> list:
    """Counter indexes via the shared md5 Kirsch-Mitzenmacher helper
    (functions/hashing.py ``km_positions``, tag ``cms``) — one
    implementation serves fit, estimate, and the DuckDB replay, so
    they can never diverge."""
    from .hashing import km_positions

    return km_positions(col, depth, width, "cms", salt)


def fit_cms(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 1 << 16,
    salt: int = 0,
    weight: "str | None" = None,
) -> CountMinSketch:
    """Fit the sketch over the non-NULL values of ``df[col]`` — ONE
    exchange on the (row, counter) key with map-side partial
    aggregation, then a bounded collect of at most ``depth × width``
    non-zero counter rows.  ``weight`` names an optional bigint/
    double-castable column summed instead of counting rows (e.g. a
    per-doc token count, so the sketch tracks token mass per key);
    NULL weights contribute 0, negative weights are refused in-plan
    (they would break the never-undercount contract).  Deterministic
    and partition-invariant: addition is commutative and the
    positions are pure md5 arithmetic (test-pinned)."""
    import numpy as np

    _check_geometry(depth, width)
    pos = _position_cols(F.col(col), depth, width, salt)
    base = df.where(F.col(col).isNotNull())
    if weight is None:
        w = F.lit(1).cast("bigint")
    else:
        w = F.when(
            F.col(weight) < 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fit_cms: negative weight in {weight!r} ("
                    ),
                    F.col(weight).cast("string"),
                    F.lit(
                        "); negative increments would break the "
                        "never-undercount contract."
                    ),
                )
            ).cast("bigint"),
        ).otherwise(F.coalesce(F.col(weight).cast("bigint"), F.lit(0)))
    pairs = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), p.alias("p")
                    )
                    for j, p in enumerate(pos)
                ]
            )
        ).alias("jp"),
        w.alias("__w__"),
    )
    rows = (
        pairs.groupBy(
            F.col("jp.j").alias("j"), F.col("jp.p").alias("p")
        )
        .agg(F.sum("__w__").alias("c"))
        .collect()
    )
    counts = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        counts[int(r["j"]), int(r["p"])] = int(r["c"])
    # every matrix row received every increment, so row 0's mass IS
    # the absorbed total
    total = int(counts[0].sum())
    return CountMinSketch(counts, depth, width, salt, total)


def with_cms_estimate(
    df: DataFrame,
    col: str,
    sketch: CountMinSketch,
    out: str = "cms_count",
) -> DataFrame:
    """Append the sketch's frequency estimate for ``df[col]`` —
    positions computed JVM-side (whole-stage codegen), counters
    gathered in ONE vectorized numpy pass inside an Arrow-batched
    pandas UDF (the counter matrix rides the closure like the Bloom
    bitmap / injected centroids).  NULL keys estimate NULL.  The
    estimate never undercounts a key the sketch absorbed; keys never
    seen estimate >= 0 (whatever collisions deposited)."""
    import pandas as pd
    from pyspark.sql.types import LongType
    from pyspark.sql.functions import pandas_udf

    if out in df.columns:
        raise ValueError(f"output column {out!r} already exists")
    counts = sketch.counts
    depth = sketch.depth

    def gather(pos_ser: pd.Series) -> pd.Series:
        import numpy as np

        # stay in int64 end-to-end: a float64 staging buffer would
        # round counters above 2^53 and could UNDERcount, breaking
        # the one-sided contract
        vals = np.zeros(len(pos_ser), dtype="int64")
        ok = (~pos_ser.isna()).to_numpy()
        if ok.any():
            arr_ok = np.stack(pos_ser[ok].to_numpy()).astype("int64")
            vals[ok] = counts[
                np.arange(depth)[None, :], arr_ok
            ].min(axis=1)
        ser = pd.Series(vals, dtype="Int64")
        ser[~ok] = pd.NA
        return ser

    gather.__annotations__ = {
        "pos_ser": pd.Series, "return": pd.Series
    }
    gather_udf = pandas_udf(gather, LongType())
    pos = _position_cols(
        F.col(col), sketch.depth, sketch.width, sketch.salt
    )
    pos_arr = F.when(
        F.col(col).isNotNull(), F.array(*pos)
    )
    return df.withColumn(out, gather_udf(pos_arr))
