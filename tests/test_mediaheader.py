"""Pure-header media metadata (operators/multimodal.py r13): the
native Column tier, the stdlib deep tier, tier equality, and the
DuckDB blob-slice replay of the shared expression generator.
"""

import io
import struct
import wave

import pytest

from smashed_spark.operators.multimodal import (
    MEDIA_HEADER_FIELDS,
    DeepMediaHeaderMapper,
    MediaHeaderMapper,
    media_header_expr,
    parse_media_header,
    synth_gif,
    synth_jpeg,
    synth_png,
    synth_wav,
)

CASES = {
    # name -> (bytes, expected 7-tuple)
    "png": (
        synth_png(640, 480),
        ("png", 640, 480, None, None, None, None),
    ),
    "png_big": (
        synth_png(70000, 3),  # exceeds u16: exercises the BE u32 path
        ("png", 70000, 3, None, None, None, None),
    ),
    "gif": (
        synth_gif(320, 200),
        ("gif", 320, 200, None, None, None, None),
    ),
    "wav": (
        synth_wav(2, 44100, 16, 44100),  # 1 s stereo
        ("wav", None, None, 2, 44100, 16, 1000),
    ),
    "wav_8k_mono": (
        synth_wav(1, 8000, 8, 4000),  # 0.5 s
        ("wav", None, None, 1, 8000, 8, 500),
    ),
    "jpeg": (
        synth_jpeg(1024, 768),
        ("jpeg", 1024, 768, None, None, None, None),
    ),
    # corrupt branches: magic present, header truncated -> format only
    "png_truncated": (
        synth_png(640, 480)[:10],
        ("png", None, None, None, None, None, None),
    ),
    "wav_truncated": (
        synth_wav(1, 8000, 8, 100)[:20],
        ("wav", None, None, None, None, None, None),
    ),
    # no magic at all
    "garbage": (b"not media at all", (None,) * 7),
    "empty": (b"", (None,) * 7),
}

# the native Column tier cannot reach jpeg dims / chunk-walked wav;
# these fields are NULL there by contract
NATIVE_NULL = {
    "jpeg": {"width", "height"},
}


def test_parse_media_header_cases():
    for name, (raw, want) in CASES.items():
        assert parse_media_header(raw) == want, name
    assert parse_media_header(None) == (None,) * 7


def test_wav_synth_matches_stdlib_wave_writer():
    """The canonical layout the native tier assumes is exactly what
    Python's stdlib wave module writes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00" * (44100 * 4))
    assert buf.getvalue() == synth_wav(2, 44100, 16, 44100)


def test_noncanonical_wav_deep_tier_only():
    """A LIST chunk between fmt and data breaks the fixed 44-byte
    layout: native tier yields NULL audio fields, deep tier walks the
    chunks and parses fully."""
    canon = synth_wav(1, 16000, 16, 1600)
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    noncanon = canon[:36] + lst + canon[36:]
    # patch the RIFF size for honesty (not read by either tier)
    noncanon = (
        noncanon[:4]
        + struct.pack("<I", len(noncanon) - 8)
        + noncanon[8:]
    )
    got = parse_media_header(noncanon)
    assert got == ("wav", None, None, 1, 16000, 16, 100)


def test_odd_sized_chunk_word_alignment():
    """RIFF chunks are word-aligned: an odd-sized chunk is followed by
    a pad byte the walk must skip."""
    canon = synth_wav(1, 8000, 8, 80)
    odd = b"note" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    raw = canon[:36] + odd + canon[36:]
    assert parse_media_header(raw) == ("wav", None, None, 1, 8000, 8, 10)


def _expected_native(name, want):
    masked = list(want)
    for i, f in enumerate(MEDIA_HEADER_FIELDS):
        if f in NATIVE_NULL.get(want[0] or "", set()):
            masked[i] = None
    return tuple(masked)


def test_native_tier_spark(spark):
    rows = [(name, raw) for name, (raw, _) in CASES.items()]
    df = spark.createDataFrame(rows, "name string, media binary")
    out = MediaHeaderMapper("media").map(df)
    got = {
        r["name"]: tuple(
            r[f"media_{f}"] for f in MEDIA_HEADER_FIELDS
        )
        for r in out.collect()
    }
    for name, (_, want) in CASES.items():
        assert got[name] == _expected_native(name, want), name


def test_deep_tier_spark_and_tier_equality(spark):
    rows = [(name, raw) for name, (raw, _) in CASES.items()]
    df = spark.createDataFrame(rows, "name string, media binary")
    out = DeepMediaHeaderMapper("media", prefix="deep").map(
        MediaHeaderMapper("media").map(df)
    )
    for r in out.collect():
        want = CASES[r["name"]][1]
        deep = tuple(r[f"deep_{f}"] for f in MEDIA_HEADER_FIELDS)
        assert deep == want, r["name"]
        # wherever the native tier produced a value it must equal deep
        for f in MEDIA_HEADER_FIELDS:
            nat = r[f"media_{f}"]
            if nat is not None:
                assert nat == r[f"deep_{f}"], (r["name"], f)


def test_native_tier_is_pure_column_algebra(spark):
    """No Python evaluation in the native tier's plan."""
    from smashed_spark.core.lint import plan_report

    df = spark.createDataFrame([("a", b"x")], "name string, media binary")
    rep = plan_report(MediaHeaderMapper("media").map(df))
    assert rep["counts"]["python_row_evals"] == 0
    assert rep["counts"]["python_arrow_evals"] == 0


def test_duckdb_dialect_replays_spark_parse(spark, tmp_path):
    """The generator's DuckDB dialect, blob-slicing the SAME parquet
    bytes, reproduces the Spark tier field-for-field — the no-drift
    guarantee the correctness gate builds on."""
    duckdb = pytest.importorskip("duckdb")
    rows = [(name, raw) for name, (raw, _) in CASES.items()]
    df = spark.createDataFrame(rows, "name string, media binary")
    path = str(tmp_path / "media.parquet")
    df.coalesce(1).write.parquet(path)

    spark_out = {
        r["name"]: tuple(r[f"media_{f}"] for f in MEDIA_HEADER_FIELDS)
        for r in MediaHeaderMapper("media").map(
            spark.read.parquet(path)
        ).collect()
    }
    exprs = ", ".join(
        f"{media_header_expr('media', f, 'duckdb')} AS {f}"
        for f in MEDIA_HEADER_FIELDS
    )
    con = duckdb.connect()
    duck_out = {
        row[0]: row[1:]
        for row in con.execute(
            f"SELECT name, {exprs} FROM parquet_scan('{path}/*.parquet')"
        ).fetchall()
    }
    assert set(duck_out) == set(spark_out)
    for name in spark_out:
        assert duck_out[name] == spark_out[name], name


def test_media_header_expr_refusals():
    with pytest.raises(ValueError, match="unknown field"):
        media_header_expr("b", "nope")
    with pytest.raises(ValueError, match="unknown dialect"):
        media_header_expr("b", "width", "postgres")
