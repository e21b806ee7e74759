"""Multimodal columns: images / audio / video as opaque ``binary``
columns with typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, partitioning,
UDF signatures — is real and tested; the codec step (actual JPEG/wav
decode) is stubbed behind an import-try because the media libraries
are not in this container.  Where no codec exists, a clearly-marked
deterministic fake derives metadata from the bytes so the pipeline
shape is exercisable end-to-end.

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
