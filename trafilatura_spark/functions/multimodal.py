"""Multimodal (image/audio/video) column handling.

The north-rule corpus interleaves text and media: media spans carry an
opaque ``media_ref``.  At production scale the bytes live in an object
store / Iceberg binary column; this module provides the Spark-side
plumbing — schemas, explode/join shape, Arrow-batched Pandas UDF
signatures, partitioning — as REAL, tested code, with the codec step
isolated behind ``_decode_*`` functions.

The image/audio libraries are not available in this sandbox (and are a
per-deployment choice), so the codecs are stubbed exactly as the round
brief requires: a clearly-marked ``NotImplementedError`` for real
payloads plus a deterministic fake format (``FAKE0`` header) so the whole
pipeline is exercisable end-to-end in tests and benchmarks.
"""

from __future__ import annotations

import pandas as pd

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F, types as T

FAKE_MAGIC = b"FAKE0"

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("position", T.IntegerType(), False),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("mean_luma", T.FloatType(), True),
    T.StructField("phash", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("ts_ms", T.IntegerType(), False),
    T.StructField("frame_phash", T.StringType(), False),
])


def media_table(documents: DataFrame) -> DataFrame:
    """Explode the interleaved spans table into one row per media span —
    the join key against the binary payload store."""
    return (
        documents
        .select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                F.col("s.offset").alias("position"))
    )


def fake_media_bytes(media_ref: str, kind: str = "image") -> bytes:
    """Deterministic stand-in payload: FAKE0 header + md5-derived
    dimensions + pseudo-pixel digest.  Lets every pipeline stage run
    without codec libraries."""
    h = hashlib.md5(media_ref.encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    channels = 3
    n_frames = 1 if kind == "image" else 1 + h[2] % 32
    return (FAKE_MAGIC + struct.pack("<IIII", width, height, channels,
                                     n_frames) + h)


def with_fake_payloads(media: DataFrame, kind: str = "image") -> DataFrame:
    """Attach deterministic fake binary payloads (test/bench path; in
    production this is a broadcast-free join against the blob table)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def gen(refs: pd.Series) -> pd.Series:
        return refs.map(lambda r: fake_media_bytes(r, kind))

    return media.withColumn("content", gen("media_ref"))


def _decode_image(content: bytes) -> tuple[int, int, int, float, str]:
    """Codec seam.  Real deployments plug Pillow/opencv here."""
    if content[:5] == FAKE_MAGIC:
        width, height, channels, _ = struct.unpack_from("<IIII", content, 5)
        digest = content[21:]
        mean_luma = digest[0] / 255.0
        return width, height, channels, mean_luma, digest[:8].hex()
    raise NotImplementedError(
        "real image codecs are not bundled in this environment; "
        "plug a decoder into trafilatura_spark.functions.multimodal._decode_image")


def _decode_video_frames(content: bytes, every_ms: int):
    """Codec seam for video frame sampling."""
    if content[:5] == FAKE_MAGIC:
        _, _, _, n_frames = struct.unpack_from("<IIII", content, 5)
        digest = content[21:]
        for i in range(n_frames):
            fh = hashlib.md5(digest + i.to_bytes(4, "little")).hexdigest()
            yield i, i * every_ms, fh[:16]
        return
    raise NotImplementedError(
        "real video codecs are not bundled in this environment; "
        "plug a decoder into "
        "trafilatura_spark.functions.multimodal._decode_video_frames")


def image_features(media_with_bytes: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction.  Per-item errors become
    `error` rows (same never-fail-the-task contract as extraction)."""
    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    w, h, c, luma, phash = _decode_image(bytes(content))
                    rows.append((ref, w, h, c, luma, phash, None))
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    rows.append((ref, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])
    return media_with_bytes.select("media_ref", "content") \
        .mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def frame_samples(media_with_bytes: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (flatMap
    shape — mapInPandas yields more rows than it consumes)."""
    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    for idx, ts, phash in _decode_video_frames(
                            bytes(content), every_ms):
                        rows.append((ref, idx, ts, phash))
                except Exception:
                    continue
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              FRAME_SAMPLE_SCHEMA.fields])
    return media_with_bytes.select("media_ref", "content") \
        .mapInPandas(batches, FRAME_SAMPLE_SCHEMA)
