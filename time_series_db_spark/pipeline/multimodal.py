"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY-mandated pipeline ops): image/audio/video payloads are
opaque ``BINARY`` columns with a typed metadata struct alongside. Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` transforms — the Spark-side contract (schema, batch
shape, partitioning) is real and tested; the codec itself is a STUB
because no image/audio library ships in this container.

Stub policy: ``decode_fn="fake"`` (default) derives deterministic
pseudo-metadata from the payload bytes so pipelines are end-to-end
testable against a SQL oracle; ``decode_fn="pil"`` raises
``NotImplementedError`` at the exact point a real decoder would slot in.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; payload columns are only deserialized in
the UDF process (Spark never materializes them JVM-side beyond the
column vector); partitioning is inherited from the scan, so decode
parallelism == input splits.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("source", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("n_pixels", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def documents_as_media(df: DataFrame, media_type: str = "image") -> DataFrame:
    """Adapt the ``documents`` table into the media schema (payload =
    UTF-8 bytes of ``text``) — the test stand-in for a real binary
    ingest; a production source reads parquet with a true BINARY column."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.col("source"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def _fake_image_meta(payload: bytes) -> tuple[int, int, int]:
    """Deterministic pseudo-decode: dimensions derived from payload size.

    STUB — a real implementation would parse the image header (PIL /
    libvips). Kept arithmetic-simple so the DuckDB oracle can mirror it.
    """
    n = len(payload)
    width = n % 64 + 1
    height = n // 64 % 64 + 1
    return width, height, 3


def decode_image_meta(media: DataFrame, decode_fn: str = "fake") -> DataFrame:
    """Extract (width, height, channels, n_pixels) per image payload via
    Arrow-batched ``mapInPandas``."""
    if decode_fn == "pil":
        raise NotImplementedError(
            "real image decoding requires PIL/libvips, not present in this "
            "container — slot the codec in here"
        )
    if decode_fn != "fake":
        raise ValueError(f"unknown decode_fn: {decode_fn}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_image_meta(p) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                    "channels": pd.Series([d[2] for d in dims], dtype="int64"),
                    "n_pixels": pd.Series(
                        [d[0] * d[1] * d[2] for d in dims], dtype="int64"
                    ),
                }
            )

    return media.select("media_id", "content").mapInPandas(_decode, DECODE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling stub: emit one row per sampled "frame" (a
    ``every_n_bytes`` slice of the payload, capped at ``max_frames``).

    Demonstrates the 1→N ``mapInPandas`` shape a video frame sampler
    needs (output rows ≠ input rows); the slicing stands in for
    keyframe extraction.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                n_frames = min(max(len(payload) // every_n_bytes, 1), max_frames)
                for i in range(n_frames):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(chunk))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(_sample, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms_q", LongType()),
    ]
)


def extract_audio_features(media: DataFrame, decode_fn: str = "fake") -> DataFrame:
    """Audio feature extraction (sample rate / duration / quantized RMS)
    via Arrow-batched ``mapInPandas`` — the audio analog of
    :func:`decode_image_meta`.

    ``decode_fn="fake"`` treats the payload as 16 kHz 8-bit PCM and
    computes an integer RMS proxy (sum of squared bytes div n, integer
    math so the DuckDB oracle can mirror it exactly); ``decode_fn=
    "librosa"`` raises at the codec slot-in point.
    """
    if decode_fn == "librosa":
        raise NotImplementedError(
            "real audio decoding requires librosa/ffmpeg, not present in "
            "this container — slot the codec in here"
        )
    if decode_fn != "fake":
        raise ValueError(f"unknown decode_fn: {decode_fn}")

    RATE = 16_000

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["content"]):
                n = len(payload)
                sq = sum(b * b for b in payload)
                rows.append(
                    (mid, RATE, n, n * 1000 // RATE, sq // n if n else 0)
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "n_samples",
                         "duration_ms", "rms_q"],
            ).astype("int64")

    return media.select("media_id", "content").mapInPandas(_extract, AUDIO_SCHEMA)
