"""Multimodal columns: images / audio / video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested.  Since r13, HEADER metadata
(format, dimensions, audio geometry, duration) is REAL too, no codec
needed: PNG/GIF/canonical-WAV headers are fixed-offset struct parses
expressed as native Column algebra (:class:`MediaHeaderMapper`,
DuckDB-replayable), with a stdlib Python tier for variable-offset
layouts (:class:`DeepMediaHeaderMapper`: JPEG SOF walk, RIFF chunk
walk).  Only pixel/sample DECODE remains env-blocked (PIL/av/soundfile
absent): :class:`ImageDecodeMapper`'s decode step is import-gated, and
where no codec exists a clearly-marked deterministic fake derives
pseudo-metadata from the bytes so that pipeline shape stays
exercisable end-to-end.

Scale notes
-----------
* Binary payloads stay columnar (parquet binary), transferred to Python
  via Arrow only in the mapInPandas decode step.
* ``maxRecordsPerBatch`` bounds decode-batch memory: images of ~1 MB at
  the default 10k records/batch would be 10 GB per batch — callers
  should set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to a few
  hundred for media tables (documented, not silently overridden).
* Frame sampling / resizing emit one row per frame via the N:M
  mapInPandas contract — no driver involvement.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.mapper import SparkMapper
from ..core.ship import ensure_shipped


class BinaryMetadataMapper(SparkMapper):
    """Cheap native metadata for a binary column: byte length + md5.
    Pure Column expressions — no Python, runs at scan speed."""

    def __init__(
        self, binary_field: str, prefix: Optional[str] = None
    ) -> None:
        self.binary_field = binary_field
        self.prefix = prefix or binary_field
        super().__init__(input_fields=[binary_field])

    def apply(self, df: DataFrame) -> DataFrame:
        col = F.col(self.binary_field)
        return df.withColumns(
            {
                f"{self.prefix}_n_bytes": F.length(col).cast("bigint"),
                f"{self.prefix}_md5": F.md5(col),
            }
        )


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return True
    except ImportError:
        return False


IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


class ImageDecodeMapper(SparkMapper):
    """Decode an image binary column into metadata (width/height/mode).

    With PIL installed this is a real decode; without it, a
    DETERMINISTIC FAKE derives pseudo-dimensions from the content hash
    (clearly marked: ``mode='FAKE'``) so the Arrow plumbing and schema
    are still exercised.  Raise instead by passing
    ``require_codec=True``.
    """

    def __init__(
        self,
        binary_field: str = "image",
        output_field: str = "image_meta",
        require_codec: bool = False,
    ) -> None:
        self.binary_field = binary_field
        self.output_field = output_field
        self.require_codec = require_codec
        if require_codec and not _try_pil():
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed"
            )
        super().__init__(
            input_fields=[binary_field], output_fields=[output_field]
        )

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        in_field = self.binary_field
        out_field = self.output_field
        fields = [f for f in df.schema.fields if f.name != out_field]
        schema = StructType(fields + [StructField(out_field, IMAGE_META_SCHEMA)])
        out_cols = [f.name for f in schema.fields]
        use_pil = _try_pil()

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                metas = []
                for raw in pdf[in_field]:
                    if raw is None:
                        metas.append(None)
                        continue
                    if use_pil:
                        import io

                        from PIL import Image

                        # corrupt/non-image bytes yield a NULL meta,
                        # never a task failure: at corpus scale a few
                        # truncated blobs are a certainty, and one
                        # must not kill a 100 TB decode job (filter
                        # `meta IS NULL` downstream to quarantine).
                        # Catch ONLY decode-shaped errors
                        # (UnidentifiedImageError is an OSError;
                        # truncated streams raise OSError/ValueError/
                        # SyntaxError; oversized images raise
                        # DecompressionBombError) — a genuine
                        # programming fault still fails the task
                        # loudly instead of masquerading as bad data.
                        try:
                            with Image.open(io.BytesIO(raw)) as img:
                                metas.append(
                                    {
                                        "width": img.width,
                                        "height": img.height,
                                        "mode": img.mode,
                                    }
                                )
                        except (
                            OSError,
                            SyntaxError,
                            ValueError,
                            Image.DecompressionBombError,
                        ):
                            metas.append(None)
                    else:
                        # deterministic fake: dimensions from content hash
                        h = hashlib.md5(raw).digest()
                        metas.append(
                            {
                                "width": 64 + h[0] % 64,
                                "height": 64 + h[1] % 64,
                                "mode": "FAKE",
                            }
                        )
                data = {c: pdf[c] for c in pdf.columns if c != out_field}
                data[out_field] = metas
                yield pd.DataFrame({c: data[c] for c in out_cols})

        return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Pure-header media metadata (r13): PNG / GIF / canonical-WAV headers are
# fixed-offset struct parses — no codec library needed, expressible as
# plain Column algebra (JVM-side, scan speed) AND replayable in DuckDB
# via hex/substring blob slicing.  The expression generator below emits
# BOTH dialects from one table of offsets/magics, so the gate oracle
# can never drift from the operator.  Real pixel/sample DECODE still
# needs PIL/av/soundfile (env-blocked here); header metadata does not.
# ---------------------------------------------------------------------------

MEDIA_HEADER_FIELDS = (
    "format",
    "width",
    "height",
    "channels",
    "sample_rate_hz",
    "bits_per_sample",
    "duration_ms",
)


def _hx(col: str, off: int, ln: int, dialect: str) -> str:
    """Uppercase hex of bytes [off, off+ln), 1-indexed, both dialects.
    Spark slices the blob then hexes; DuckDB (no blob substring in 1.0)
    hexes the whole blob and slices the hex string at doubled offsets —
    same bytes either way."""
    if dialect == "spark":
        return f"hex(substring({col}, {off}, {ln}))"
    return f"substring(hex({col}), {(off - 1) * 2 + 1}, {ln * 2})"


def _be(col: str, off: int, ln: int, dialect: str) -> str:
    """Big-endian unsigned int at a fixed byte offset."""
    h = _hx(col, off, ln, dialect)
    if dialect == "spark":
        return f"CAST(conv({h}, 16, 10) AS BIGINT)"
    return f"CAST(('0x' || {h}) AS BIGINT)"


def _le(col: str, off: int, ln: int, dialect: str) -> str:
    """Little-endian unsigned int: per-byte extraction recombined —
    identical arithmetic in both dialects."""
    parts = [
        f"({_be(col, off + i, 1, dialect)} * {256 ** i})" for i in range(ln)
    ]
    return "(" + " + ".join(parts) + ")"


def media_header_expr(col: str, field: str, dialect: str = "spark") -> str:
    """SQL expression (Spark or DuckDB dialect) extracting one header
    field from a media binary column.

    Semantics (shared by both dialects and by the Python deep tier):

    * ``format`` is detected from the MAGIC alone ('png'/'gif'/'wav'/
      'jpeg', else NULL) — a truncated PNG is still format 'png' with
      NULL dimensions, which is what a quarantine filter wants to see.
    * Dimension/audio fields additionally require the full fixed-offset
      header: PNG >= 24 bytes (IHDR w/h at 17/21, big-endian u32), GIF
      >= 10 (logical-screen w/h at 7/9, little-endian u16), WAV the
      CANONICAL 44-byte layout ('fmt ' at 13, fmt size 16/PCM, 'data'
      at 37).  Non-canonical WAVs (extra chunks) and JPEG (variable
      marker offsets) are NULL here — that is the deep tier's job
      (:class:`DeepMediaHeaderMapper`).
    * ``duration_ms`` = data bytes * 1000 / byte rate, integer division.
    """
    if field not in MEDIA_HEADER_FIELDS:
        raise ValueError(
            f"media_header_expr: unknown field {field!r} "
            f"(one of {MEDIA_HEADER_FIELDS})"
        )
    d = dialect
    if d not in ("spark", "duckdb"):
        raise ValueError(f"media_header_expr: unknown dialect {dialect!r}")
    n = f"length({col})" if d == "spark" else f"octet_length({col})"
    is_png = f"({n} >= 8 AND {_hx(col, 1, 8, d)} = '89504E470D0A1A0A')"
    is_gif = (
        f"({n} >= 6 AND {_hx(col, 1, 6, d)} IN "
        "('474946383761', '474946383961'))"
    )
    is_wav = (
        f"({n} >= 12 AND {_hx(col, 1, 4, d)} = '52494646' "
        f"AND {_hx(col, 9, 4, d)} = '57415645')"
    )
    is_jpeg = f"({n} >= 3 AND {_hx(col, 1, 3, d)} = 'FFD8FF')"
    wav_canon = (
        f"({is_wav} AND {n} >= 44 "
        f"AND {_hx(col, 13, 4, d)} = '666D7420' "
        f"AND {_le(col, 17, 4, d)} = 16 "
        f"AND {_hx(col, 37, 4, d)} = '64617461')"
    )
    if field == "format":
        return (
            f"CASE WHEN {is_png} THEN 'png' WHEN {is_gif} THEN 'gif' "
            f"WHEN {is_wav} THEN 'wav' WHEN {is_jpeg} THEN 'jpeg' "
            "ELSE NULL END"
        )
    if field == "width":
        return (
            f"CASE WHEN {is_png} AND {n} >= 24 THEN {_be(col, 17, 4, d)} "
            f"WHEN {is_gif} AND {n} >= 10 THEN {_le(col, 7, 2, d)} "
            "ELSE NULL END"
        )
    if field == "height":
        return (
            f"CASE WHEN {is_png} AND {n} >= 24 THEN {_be(col, 21, 4, d)} "
            f"WHEN {is_gif} AND {n} >= 10 THEN {_le(col, 9, 2, d)} "
            "ELSE NULL END"
        )
    if field == "channels":
        return f"CASE WHEN {wav_canon} THEN {_le(col, 23, 2, d)} ELSE NULL END"
    if field == "sample_rate_hz":
        return f"CASE WHEN {wav_canon} THEN {_le(col, 25, 4, d)} ELSE NULL END"
    if field == "bits_per_sample":
        return f"CASE WHEN {wav_canon} THEN {_le(col, 35, 2, d)} ELSE NULL END"
    # duration_ms: data chunk size at 41, byte rate at 29; guard 0
    div = "DIV" if d == "spark" else "//"
    return (
        f"CASE WHEN {wav_canon} AND {_le(col, 29, 4, d)} > 0 "
        f"THEN ({_le(col, 41, 4, d)} * 1000) {div} {_le(col, 29, 4, d)} "
        "ELSE NULL END"
    )


class MediaHeaderMapper(SparkMapper):
    """Native-tier media header metadata: format + dimensions + audio
    geometry from fixed-offset header parses — pure Column algebra
    (whole-stage codegen, no Python, no codec), one pass at scan speed.

    Covers PNG / GIF / canonical (44-byte) WAV fully and detects JPEG
    by magic; JPEG dimensions and non-canonical WAV layouts need a
    variable-offset walk — chain :class:`DeepMediaHeaderMapper` for
    those rows (``width IS NULL AND format IN ('jpeg','wav')``).
    Every expression is generated by :func:`media_header_expr`, which
    also emits the DuckDB form — the correctness gate replays the parse
    byte-for-byte via blob slicing."""

    def __init__(
        self, binary_field: str = "media", prefix: str = "media"
    ) -> None:
        self.binary_field = binary_field
        self.prefix = prefix
        super().__init__(input_fields=[binary_field])

    def apply(self, df: DataFrame) -> DataFrame:
        p = self.prefix
        cols = {}
        for field in MEDIA_HEADER_FIELDS:
            expr = media_header_expr(self.binary_field, field, "spark")
            typ = "string" if field == "format" else "bigint"
            cols[f"{p}_{field}"] = F.expr(expr).cast(typ)
        return df.withColumns(cols)


class DeepMediaHeaderMapper(SparkMapper):
    """Python-tier media header metadata for the layouts fixed offsets
    can't reach: JPEG dimensions (SOF marker walk) and non-canonical
    WAV (RIFF chunk walk).  PNG/GIF parse here too (same struct
    offsets), so the tier is standalone — the native tier's results
    must equal this tier's wherever both produce a value (test-pinned).

    Arrow-batched ``mapInPandas`` — pure stdlib ``struct`` arithmetic
    over header bytes, no codec import, a few hundred ns per row.
    Corrupt/truncated bytes yield NULLs, never task failures."""

    def __init__(
        self, binary_field: str = "media", prefix: str = "deep"
    ) -> None:
        self.binary_field = binary_field
        self.prefix = prefix
        super().__init__(input_fields=[binary_field])

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        in_field = self.binary_field
        p = self.prefix
        fields = list(df.schema.fields) + [
            StructField(f"{p}_format", StringType()),
            StructField(f"{p}_width", LongType()),
            StructField(f"{p}_height", LongType()),
            StructField(f"{p}_channels", LongType()),
            StructField(f"{p}_sample_rate_hz", LongType()),
            StructField(f"{p}_bits_per_sample", LongType()),
            StructField(f"{p}_duration_ms", LongType()),
        ]
        schema = StructType(fields)
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                metas = [parse_media_header(raw) for raw in pdf[in_field]]
                data = {c: pdf[c] for c in pdf.columns}
                for i, name in enumerate(MEDIA_HEADER_FIELDS):
                    data[f"{p}_{name}"] = [m[i] for m in metas]
                yield pd.DataFrame({c: data[c] for c in out_cols})

        return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic media-byte synthesizers — stdlib only, REAL headers
# (valid magic, offsets, CRC where the format has one).  Fixture
# generators for pipeline tests and the correctness gate: the engine
# never calls these, parsers must recover exactly what they encode.
# ---------------------------------------------------------------------------


def synth_png(width: int, height: int) -> bytes:
    """Minimal valid PNG prelude: signature + IHDR (real CRC).  Not a
    decodable image (no IDAT) — header-complete, which is what the
    header tier reads."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def synth_gif(width: int, height: int) -> bytes:
    """GIF89a header + logical screen descriptor + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def synth_wav(
    channels: int, rate: int, bits: int, n_frames: int
) -> bytes:
    """Canonical 44-byte-header PCM WAV with a zeroed data chunk —
    byte-identical layout to what the stdlib ``wave`` writer produces
    (test-pinned)."""
    import struct

    block_align = channels * bits // 8
    data = b"\x00" * (n_frames * block_align)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16,
            1,
            channels,
            rate,
            rate * block_align,
            block_align,
            bits,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_jpeg(width: int, height: int) -> bytes:
    """JPEG skeleton: SOI + APP0/JFIF + SOF0 + EOI.  Header-parseable
    (the SOF walk finds real dimensions at a marker-determined offset),
    not decodable (no scan data)."""
    import struct

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        struct.pack(">BHH", 8, height, width)
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return (
        b"\xff\xd8"
        + b"\xff\xe0"
        + struct.pack(">H", len(app0) + 2)
        + app0
        + b"\xff\xc0"
        + struct.pack(">H", len(sof0) + 2)
        + sof0
        + b"\xff\xd9"
    )


# JPEG start-of-frame markers that carry dimensions: C0-CF minus the
# non-frame C4 (DHT), C8 (JPG extension), CC (DAC)
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_media_header(raw):
    """(format, width, height, channels, sample_rate_hz,
    bits_per_sample, duration_ms) from header bytes — stdlib only.
    Shared by :class:`DeepMediaHeaderMapper` and its tests."""
    import struct

    nul = (None,) * 6
    if raw is None:
        return (None,) + nul
    raw = bytes(raw)
    n = len(raw)
    if n >= 8 and raw[:8] == b"\x89PNG\r\n\x1a\n":
        if n >= 24:
            w, h = struct.unpack(">II", raw[16:24])
            return ("png", w, h, None, None, None, None)
        return ("png",) + nul
    if n >= 6 and raw[:6] in (b"GIF87a", b"GIF89a"):
        if n >= 10:
            w, h = struct.unpack("<HH", raw[6:10])
            return ("gif", w, h, None, None, None, None)
        return ("gif",) + nul
    if n >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        channels = rate = bits = byte_rate = data_size = None
        pos = 12
        while pos + 8 <= n:
            cid = raw[pos:pos + 4]
            size = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
            body = raw[pos + 8:pos + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                _, channels, rate, byte_rate, _, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        dur = (
            data_size * 1000 // byte_rate
            if data_size is not None and byte_rate
            else None
        )
        return ("wav", None, None, channels, rate, bits, dur)
    if n >= 3 and raw[:3] == b"\xff\xd8\xff":
        pos = 2
        while pos + 4 <= n:
            if raw[pos] != 0xFF:
                break
            marker = raw[pos + 1]
            if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers carry no length
                continue
            seglen = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
            if marker in _JPEG_SOF_MARKERS:
                if pos + 9 <= n:
                    h, w = struct.unpack(">HH", raw[pos + 5:pos + 9])
                    return ("jpeg", w, h, None, None, None, None)
                break
            if seglen < 2:
                break
            pos += 2 + seglen
        return ("jpeg",) + nul
    return (None,) + nul


class FrameSampleMapper(SparkMapper):
    """Sample N pseudo-frames per video binary: N:M mapInPandas emitting
    one row per sampled frame with ``frame_idx`` and a frame-content
    digest.  Real frame extraction (ffmpeg/OpenCV) is stubbed — the
    deterministic fake slices the byte stream so batch shapes, schema,
    and cardinality behavior are all real.
    """

    def __init__(
        self,
        binary_field: str = "video",
        num_frames: int = 4,
        frame_field: str = "frame_idx",
        digest_field: str = "frame_digest",
    ) -> None:
        self.binary_field = binary_field
        self.num_frames = num_frames
        self.frame_field = frame_field
        self.digest_field = digest_field
        super().__init__(input_fields=[binary_field])

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        in_field = self.binary_field
        frame_field = self.frame_field
        digest_field = self.digest_field
        num_frames = self.num_frames
        fields = list(df.schema.fields) + [
            StructField(frame_field, IntegerType()),
            StructField(digest_field, StringType()),
        ]
        schema = StructType(fields)
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict(orient="records"):
                    raw = rec[in_field]
                    if raw is None:
                        continue
                    n = len(raw)
                    for i in range(num_frames):
                        # STUB: real impl would seek to frame i/num_frames
                        s = (n * i) // num_frames
                        e = (n * (i + 1)) // num_frames
                        rows.append(
                            {
                                **rec,
                                frame_field: i,
                                digest_field: hashlib.md5(
                                    raw[s:e]
                                ).hexdigest(),
                            }
                        )
                yield pd.DataFrame(
                    {c: [r.get(c) for r in rows] for c in out_cols}
                )

        return df.mapInPandas(run, schema=schema)


class AudioFeatureMapper(SparkMapper):
    """Extract cheap audio features from a binary column.  Real codec
    (soundfile/librosa) stubbed; the fake computes byte-level energy
    statistics so the numeric feature plumbing is real."""

    def __init__(
        self,
        binary_field: str = "audio",
        prefix: str = "audio",
    ) -> None:
        self.binary_field = binary_field
        self.prefix = prefix
        super().__init__(input_fields=[binary_field])

    def apply(self, df: DataFrame) -> DataFrame:
        ensure_shipped(df.sparkSession)
        in_field = self.binary_field
        p = self.prefix
        fields = list(df.schema.fields) + [
            StructField(f"{p}_n_bytes", LongType()),
            StructField(f"{p}_mean_level", LongType()),
        ]
        schema = StructType(fields)
        out_cols = [f.name for f in schema.fields]

        def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
            import numpy as np

            for pdf in batches:
                n_bytes, mean_level = [], []
                for raw in pdf[in_field]:
                    if raw is None:
                        n_bytes.append(None)
                        mean_level.append(None)
                        continue
                    arr = np.frombuffer(raw, dtype=np.uint8)
                    n_bytes.append(len(raw))
                    # STUB: real impl decodes PCM and computes RMS
                    mean_level.append(int(arr.mean()) if len(arr) else 0)
                data = {c: pdf[c] for c in pdf.columns}
                data[f"{p}_n_bytes"] = n_bytes
                data[f"{p}_mean_level"] = mean_level
                yield pd.DataFrame({c: data[c] for c in out_cols})

        return df.mapInPandas(run, schema=schema)
