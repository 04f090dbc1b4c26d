"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference handles non-text media by reference only (IIIF image URIs,
mp3 metadata via mutagen — SURVEY X15); a 100 TB training-data pipeline
additionally needs the binary payloads in-table. Design:

- payloads are ``binary`` columns with a typed metadata struct alongside
  (mime, byte size, checksum) — Spark shuffles/persists them like any
  column; ``spark.read.format("binaryFile")`` is the scan path,
- decode / feature-extraction / frame-sampling run as Arrow-batched
  ``mapInPandas`` UDTFs — one Python roundtrip per batch, schema fixed
  up front,
- the actual codec work is pluggable AND opportunistic: when Pillow is
  importable the default image decoder is the real ``_pil_image_decode``
  (PIL imported executor-side inside the UDF — driver and executors are
  assumed to share an environment, true in local mode and any
  uniformly-provisioned cluster); otherwise it falls back to a
  clearly-marked deterministic fake (seeded from the payload checksum)
  that keeps every piece of Spark plumbing — schemas, batching,
  partitioning — real and testable. Pass ``decoder=...`` to plug a
  custom one in; ``strict=True`` raises NotImplementedError instead of
  silently faking when no real decoder exists.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha1", StringType(), True),
        StructField("content", BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mode", StringType(), True),
        StructField("mean_luma", DoubleType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset_bytes", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def read_media_dir(spark: SparkSession, path: str, mime: Optional[str] = None) -> DataFrame:
    """binaryFile scan → MEDIA_SCHEMA rows (one task per file group; Spark
    handles listing/splitting; pushdown on path/length works).

    Note: Spark's binaryFile source skips zero-length files entirely —
    empty payloads never reach the table.
    """
    df = spark.read.format("binaryFile").load(path)
    return df.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("media_id"),
        F.lit(mime).alias("mime"),
        F.col("length").alias("n_bytes"),
        F.sha1(F.col("content")).alias("sha1"),
        F.col("content"),
    )


def _fake_image_decode(content: bytes) -> dict:
    """DETERMINISTIC FAKE (real image libs absent in this environment):
    pseudo-dimensions/luma seeded from the payload hash. Replace with a
    PIL-backed decoder in production."""
    h = hashlib.sha1(content or b"").digest()
    return {
        "width": 64 + h[0] * 8,
        "height": 64 + h[1] * 8,
        "mode": "RGB" if h[2] % 2 == 0 else "L",
        "mean_luma": round(h[3] / 255.0, 6),
    }


def have_pil() -> bool:
    """Is Pillow importable here? (driver-side probe; environments are
    assumed uniform, so executor workers see the same answer)."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _pil_image_decode(content: bytes) -> dict:
    """REAL decoder — auto-selected when Pillow is importable. The import
    lives inside the function so the check happens executor-side at batch
    time, never at module import."""
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(content))
    img.load()
    luma = ImageStat.Stat(img.convert("L")).mean[0]
    return {
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "mean_luma": round(luma / 255.0, 6),
    }


def default_image_decoder() -> Callable[[bytes], dict]:
    """Real (PIL) decoder when available, deterministic fake otherwise."""
    return _pil_image_decode if have_pil() else _fake_image_decode


def decode_images(
    media_df: DataFrame,
    decoder: Optional[Callable[[bytes], dict]] = None,
    strict: bool = False,
) -> DataFrame:
    """Binary images → typed metadata via Arrow-batched mapInPandas."""
    if strict and decoder is None and not have_pil():
        raise NotImplementedError(
            "No real image decoder available in this environment; "
            "pass decoder= (e.g. PIL-based) or use the deterministic fake"
        )
    dec = decoder or default_image_decoder()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = dec(row.content)
                out.append({"media_id": row.media_id, **meta})
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return media_df.select("media_id", "content").mapInPandas(
        fn, schema=IMAGE_META_SCHEMA
    )


AUDIO_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)


def _wav_audio_decode(content: bytes) -> dict:
    """REAL audio metadata decoder for RIFF/WAVE payloads (stdlib
    ``wave`` — no external codec needed): channels, sample rate, frame
    count, duration. The X15 analogue (the reference reads mp3 duration
    via mutagen, ref: ina/classes.py:104-106) for the in-table payload
    path. Raises on non-WAV bytes — callers fall back to the fake."""
    import io
    import wave

    with wave.open(io.BytesIO(content)) as w:
        n = w.getnframes()
        rate = w.getframerate()
        return {
            "n_channels": w.getnchannels(),
            "sample_rate": rate,
            "n_samples": n,
            "duration_s": round(n / rate, 6) if rate else None,
        }


def _fake_audio_decode(content: bytes) -> dict:
    """DETERMINISTIC FAKE for non-WAV formats (mp3/ogg codecs absent in
    this environment): pseudo-metadata seeded from the payload hash."""
    h = hashlib.sha1(content or b"").digest()
    rate = 8000 * (1 + h[0] % 6)
    n = 1000 * (1 + h[1]) + h[2]
    return {
        "n_channels": 1 + h[3] % 2,
        "sample_rate": rate,
        "n_samples": n,
        "duration_s": round(n / rate, 6),
    }


def decode_audio(
    media_df: DataFrame,
    decoder: Optional[Callable[[bytes], dict]] = None,
) -> DataFrame:
    """Binary audio → typed metadata via Arrow-batched mapInPandas.
    RIFF/WAVE payloads decode for real (stdlib); anything else falls
    back to the deterministic fake unless ``decoder`` overrides."""

    def default(content: bytes) -> dict:
        if (content or b"")[:4] == b"RIFF":
            return _wav_audio_decode(content)
        return _fake_audio_decode(content)

    dec = decoder or default

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                out.append({"media_id": row.media_id, **dec(row.content)})
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return media_df.select("media_id", "content").mapInPandas(
        fn, schema=AUDIO_META_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("content", BinaryType(), True),
    ]
)


def _fake_image_resize(content: bytes, max_side: int) -> dict:
    """DETERMINISTIC FAKE resize: pseudo-dims from the fake decode scaled
    to fit max_side (aspect preserved, integer floor); 'pixels' are a
    byte-slice proportional to the area ratio — the shape (smaller
    payload out, dims attached) is real, the codec is not."""
    meta = _fake_image_decode(content)
    w, h = meta["width"], meta["height"]
    scale = min(max_side / w, max_side / h, 1.0)
    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
    keep = max(int(len(content or b"") * (nw * nh) / (w * h)), 1)
    return {"width": nw, "height": nh, "content": (content or b"\0")[:keep]}


def _pil_image_resize(content: bytes, max_side: int) -> dict:
    """REAL resize (Pillow thumbnail, aspect-preserving), re-encoded PNG."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(content))
    img.load()
    img.thumbnail((max_side, max_side))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return {"width": img.width, "height": img.height, "content": buf.getvalue()}


def resize_images(
    media_df: DataFrame,
    max_side: int = 256,
    resizer: Optional[Callable[[bytes, int], dict]] = None,
    strict: bool = False,
) -> DataFrame:
    """Aspect-preserving downscale to fit ``max_side`` — the standard
    pre-embedding normalization step. Arrow-batched mapInPandas; real
    Pillow path auto-selected when importable, deterministic fake
    otherwise (same contract as :func:`decode_images`)."""
    if strict and resizer is None and not have_pil():
        raise NotImplementedError(
            "No real image resizer available; pass resizer= or accept the "
            "deterministic fake"
        )
    rez = resizer or (_pil_image_resize if have_pil() else _fake_image_resize)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                r = rez(row.content, max_side)
                out.append({"media_id": row.media_id, **r})
            yield pd.DataFrame(
                out, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media_df.select("media_id", "content").mapInPandas(
        fn, schema=RESIZED_SCHEMA
    )


def sample_frames(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic frame sampling: n evenly-spaced byte-range slices per
    payload (the real path swaps the slicer for a pyav keyframe reader;
    the fan-out shape — one row in, n rows out — is the true plumbing)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = row.content or b""
                step = max(len(content) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(content) - 1, 0))
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": i,
                            "offset_bytes": off,
                            "frame": content[off : off + step],
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media_df.select("media_id", "content").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )


def byte_histogram_features(media_df: DataFrame, bins: int = 16) -> DataFrame:
    """Feature extraction stub with real vectorized shape: normalized
    byte-value histogram per payload (numpy over Arrow batches — the same
    batch contract a real embedding model would use)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = np.frombuffer(row.content or b"", dtype=np.uint8)
                if arr.size:
                    hist = np.histogram(arr, bins=bins, range=(0, 256))[0]
                    feats = (hist / arr.size).round(6).tolist()
                else:
                    feats = [0.0] * bins
                out.append({"media_id": row.media_id, "features": feats})
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media_df.select("media_id", "content").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )
