"""Multimodal (image/audio/video) column handling.

The north-rule corpus interleaves text and media: media spans carry an
opaque ``media_ref``.  At production scale the bytes live in an object
store / Iceberg binary column; this module provides the Spark-side
plumbing — schemas, explode/join shape, Arrow-batched Pandas UDF
signatures, partitioning — as REAL, tested code, with the codec step
isolated behind ``_decode_*`` functions.

The image/audio libraries are not available in this sandbox (and are a
per-deployment choice), so compressed codecs (JPEG/PNG/H.264) remain
stubbed exactly as the round brief requires: a clearly-marked
``NotImplementedError`` plus a deterministic fake format (``FAKE0``
header) so the whole pipeline is exercisable end-to-end.  Three REAL
pure-stdlib decoders now sit in front of that seam — uncompressed
24-bit BMP and binary PPM (P6) with full pixel decode (Rec.601 luma,
8x8 average-hash), and GIF header parsing (dimensions only) — so the
Arrow-batched decode stage is exercised over genuine image bytes, not
just the fake header."""

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
    T.StructField("codec", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("mean_luma", T.FloatType(), True),
    T.StructField("luma_sum", T.LongType(), True),
    T.StructField("phash", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("codec", T.StringType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("peak", T.IntegerType(), True),
    T.StructField("sq_sum", T.LongType(), True),
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


def real_media_bytes(media_ref: str) -> bytes:
    """Deterministic REAL image payload: md5(media_ref) picks the
    container (BMP / PPM / GIF) and the pixel pattern.

    BMP/PPM carry a grayscale gradient luma(x, y) = base + x + y with
    base = h[2]//2 and w, h multiples of 8 no larger than 24, so every
    value stays < 256 (no wraparound) and the decoded features —
    luma_sum, 8x8 average-hash — have closed forms an external oracle
    can reproduce from the generator contract alone.  GIF payloads are
    a valid header + trailer (the decoder parses dimensions only)."""
    h = hashlib.md5(media_ref.encode()).digest()
    fmt = h[5] % 3
    if fmt == 2:  # GIF89a: logical screen descriptor, no color table
        return (b"GIF89a" + struct.pack("<HH", 16 + h[0], 16 + h[1])
                + bytes((0x70, 0, 0)) + b"\x3b")
    bx, by = 1 + h[0] % 3, 1 + h[1] % 3
    w, hgt = 8 * bx, 8 * by
    base = h[2] // 2
    if fmt == 1:  # PPM P6, top-down row-major RGB
        out = bytearray(b"P6\n%d %d\n255\n" % (w, hgt))
        for y in range(hgt):
            for x in range(w):
                out += bytes((base + x + y,)) * 3
        return bytes(out)
    # BMP: 24-bit uncompressed, bottom-up rows padded to 4 bytes
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(hgt - 1, -1, -1):
        for x in range(w):
            rows += bytes((base + x + y,)) * 3  # B == G == R
        rows += b"\x00" * pad
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, hgt, 1, 24, 0,
                          len(rows), 2835, 2835, 0, 0)
            + bytes(rows))


def real_audio_bytes(media_ref: str) -> bytes:
    """Deterministic REAL audio payload: mono 16-bit PCM WAV whose
    sawtooth samples s_i = ((i*step + off) % 2048) - 1024 (step, off,
    length and rate all md5-derived) give the decoded features —
    n_samples, peak, sum of squares — closed forms an external oracle
    can reproduce from the generator contract alone."""
    h = hashlib.md5(media_ref.encode()).digest()
    rate = 4000 + 100 * (h[6] % 5)
    n = 200 + h[0] * 2
    step, off = 1 + h[2], 8 * h[3]
    pcm = struct.pack("<%dh" % n,
                      *(((i * step + off) % 2048) - 1024 for i in range(n)))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def with_real_audio_payloads(media: DataFrame) -> DataFrame:
    """Attach deterministic REAL WAV payloads."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def gen(refs: pd.Series) -> pd.Series:
        return refs.map(real_audio_bytes)

    return media.withColumn("content", gen("media_ref"))


def real_video_bytes(media_ref: str) -> bytes:
    """Deterministic REAL video payload: a minimal AVI (RIFF) container
    holding 2-7 uncompressed DIB frames (BGR bottom-up, padded rows —
    the BMP pixel-array layout).  Frame f carries the gradient
    luma(x, y) = base_f + x + y with base_f = (h[2] + 5f) % 128, so
    per-frame average-hashes have the same closed forms as the BMP
    generator's."""
    h = hashlib.md5(media_ref.encode()).digest()
    bx, by = 1 + h[7] % 3, 1 + h[8] % 3
    w, hgt = 8 * bx, 8 * by
    n_frames = 2 + h[9] % 6
    period_us = (20 + h[10] % 30) * 1000
    pad = (-(w * 3)) % 4
    frames = []
    for f in range(n_frames):
        base = (h[2] + 5 * f) % 128
        rows = bytearray()
        for y in range(hgt - 1, -1, -1):
            for x in range(w):
                rows += bytes((base + x + y,)) * 3
            rows += b"\x00" * pad
        frames.append(bytes(rows))
    avih = struct.pack("<IIIIIIIIII", period_us, 0, 0, 0, n_frames, 0,
                       1, 0, w, hgt) + b"\x00" * 16
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    for fr in frames:
        movi += b"00db" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi += b"\x00"
    body = (b"AVI " + b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl"
            + hdrl + b"LIST" + struct.pack("<I", len(movi)) + movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def with_real_video_payloads(media: DataFrame) -> DataFrame:
    """Attach deterministic REAL AVI payloads."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def gen(refs: pd.Series) -> pd.Series:
        return refs.map(real_video_bytes)

    return media.withColumn("content", gen("media_ref"))


def with_real_payloads(media: DataFrame) -> DataFrame:
    """Attach deterministic REAL image payloads (BMP/PPM/GIF mix) —
    the test/bench path exercising the actual decoders."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def gen(refs: pd.Series) -> pd.Series:
        return refs.map(real_media_bytes)

    return media.withColumn("content", gen("media_ref"))


def with_fake_payloads(media: DataFrame, kind: str = "image") -> DataFrame:
    """Attach deterministic fake binary payloads (test/bench path; in
    production this is a broadcast-free join against the blob table)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def gen(refs: pd.Series) -> pd.Series:
        return refs.map(lambda r: fake_media_bytes(r, kind))

    return media.withColumn("content", gen("media_ref"))


def _average_hash(lumas: list[list[int]], w: int, h: int) -> str:
    """8x8 average-hash over a top-down luma grid: bit (i, j) is set
    when block (i, j)'s mean luma exceeds the whole-image mean
    (compared in exact integer arithmetic: block_sum * w * h >
    total_sum * block_pixels).  Bit k = j*8 + i; rendered as two
    zero-padded 32-bit hex halves (hi || lo) to stay sign-safe."""
    total = sum(map(sum, lumas))
    hi = lo = 0
    for j in range(8):
        y0, y1 = j * h // 8, (j + 1) * h // 8
        for i in range(8):
            x0, x1 = i * w // 8, (i + 1) * w // 8
            bs = sum(sum(lumas[y][x0:x1]) for y in range(y0, y1))
            if bs * w * h > total * ((y1 - y0) * (x1 - x0)):
                k = j * 8 + i
                if k >= 32:
                    hi |= 1 << (k - 32)
                else:
                    lo |= 1 << k
    return "%08x%08x" % (hi, lo)


def _luma_features(lumas: list[list[int]], w: int, h: int):
    total = sum(map(sum, lumas))
    return (total / (w * h) / 255.0, total, _average_hash(lumas, w, h))


def decode_lumas(content: bytes):
    """Full pixel decode: (codec, width, height, top-down Rec.601 luma
    rows).  The single shared pixel reader behind both the feature
    stage (:func:`image_features` aggregates the grid away) and the
    resize stage (:mod:`.resize` needs every pixel) — fix a decoder
    edge here once and both pipelines move together.

    BMP (24-bit uncompressed, bottom-up or negative-height top-down)
    and binary PPM (P6, maxval <= 255, comment-tolerant) decode;
    header-only formats (GIF) and compressed codecs raise
    ``NotImplementedError`` — the deployment seam."""
    if content[:2] == b"BM":
        off = struct.unpack_from("<I", content, 10)[0]
        w, hgt = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        compression = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or compression != 0 or w <= 0 or hgt == 0:
            raise NotImplementedError(f"BMP variant bpp={bpp} "
                                      f"compression={compression} "
                                      "unsupported")
        top_down, h = hgt < 0, abs(hgt)
        stride = (w * 3 + 3) & ~3
        if len(content) < off + stride * h:
            raise ValueError("truncated BMP pixel array")
        lumas = []
        for row in range(h):
            src = row if top_down else h - 1 - row
            o = off + src * stride
            lumas.append([(299 * content[o + 3 * x + 2]
                           + 587 * content[o + 3 * x + 1]
                           + 114 * content[o + 3 * x]) // 1000
                          for x in range(w)])
        return "bmp", w, h, lumas
    if content[:2] == b"P6":
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(content) and content[pos:pos + 1].isspace():
                pos += 1
            if content[pos:pos + 1] == b"#":
                pos = content.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(content) and not content[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(content[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255 or w <= 0 or h <= 0:
            raise NotImplementedError(f"PPM maxval={maxval} unsupported")
        if len(content) < pos + 3 * w * h:
            raise ValueError("truncated PPM raster")
        lumas = [[(299 * content[o] + 587 * content[o + 1]
                   + 114 * content[o + 2]) // 1000
                  for x in range(w)
                  for o in (pos + 3 * (y * w + x),)]
                 for y in range(h)]
        return "ppm", w, h, lumas
    raise NotImplementedError(
        "full pixel decode supports uncompressed BMP/PPM only; plug a "
        "decoder into trafilatura_spark.functions.multimodal.decode_lumas")


def _decode_bmp(content: bytes):
    """Uncompressed 24-bit BMP → feature tuple (shared pixel reader)."""
    codec, w, h, lumas = decode_lumas(content)
    mean, total, phash = _luma_features(lumas, w, h)
    return codec, w, h, 3, mean, total, phash


def _decode_ppm(content: bytes):
    """Binary PPM (P6) → feature tuple (shared pixel reader)."""
    codec, w, h, lumas = decode_lumas(content)
    mean, total, phash = _luma_features(lumas, w, h)
    return codec, w, h, 3, mean, total, phash


def _decode_image(content: bytes):
    """Codec dispatch: (codec, width, height, channels, mean_luma,
    luma_sum, phash).  BMP/PPM decode fully; GIF yields header
    dimensions only; FAKE0 is the deterministic test format.  Anything
    else (JPEG/PNG/...) is the deployment seam — real installs plug
    Pillow/opencv here."""
    if content[:2] == b"BM":
        return _decode_bmp(content)
    if content[:2] == b"P6":
        return _decode_ppm(content)
    if content[:5] in (b"GIF87", b"GIF89"):
        w, h = struct.unpack_from("<HH", content, 6)
        return "gif", w, h, None, None, None, None
    if content[:5] == FAKE_MAGIC:
        width, height, channels, _ = struct.unpack_from("<IIII", content, 5)
        digest = content[21:]
        return ("fake", width, height, channels, digest[0] / 255.0, None,
                digest[:8].hex())
    raise NotImplementedError(
        "compressed image codecs are not bundled in this environment; "
        "plug a decoder into trafilatura_spark.functions.multimodal._decode_image")


def _decode_wav(content: bytes):
    """RIFF/WAVE 16-bit PCM decoder (any channel count, chunk-walking
    so extra chunks like LIST are skipped).  Pure stdlib."""
    if content[8:12] != b"WAVE":
        raise ValueError("RIFF container is not WAVE")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits} unsupported (PCM16 only); "
            "plug a decoder into trafilatura_spark.functions.multimodal._decode_audio")
    n = len(data) // 2
    samples = struct.unpack("<%dh" % n, data[:2 * n])
    return ("wav", rate, channels, n,
            max(abs(s) for s in samples) if samples else 0,
            sum(s * s for s in samples))


def _decode_audio(content: bytes):
    """Codec dispatch: (codec, sample_rate, channels, n_samples, peak,
    sq_sum).  WAV/PCM16 decodes fully; compressed audio (MP3/AAC/OGG)
    is the deployment seam."""
    if content[:4] == b"RIFF":
        return _decode_wav(content)
    raise NotImplementedError(
        "compressed audio codecs are not bundled in this environment; "
        "plug a decoder into trafilatura_spark.functions.multimodal._decode_audio")


def audio_features(media_with_bytes: DataFrame) -> DataFrame:
    """Arrow-batched audio decode + feature extraction, same per-item
    error isolation contract as image_features."""
    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    codec, rate, ch, n, peak, sq = _decode_audio(
                        bytes(content))
                    rows.append((ref, codec, rate, ch, n, peak, sq, None))
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    rows.append((ref, None, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              AUDIO_FEATURES_SCHEMA.fields])
    return media_with_bytes.select("media_ref", "content") \
        .mapInPandas(batches, AUDIO_FEATURES_SCHEMA)


def _parse_avi(content: bytes):
    """Minimal AVI (RIFF) walk: returns (width, height, n_frames,
    period_us, [frame byte ranges]) for uncompressed '..db' streams.
    Compressed ('..dc') frames hit the codec seam."""
    if content[8:12] != b"AVI ":
        raise ValueError("RIFF container is not AVI")
    avih, frames = None, []

    def walk(lo: int, hi: int) -> None:
        nonlocal avih
        pos = lo
        while pos + 8 <= hi:
            cid = content[pos:pos + 4]
            size = struct.unpack_from("<I", content, pos + 4)[0]
            body_lo = pos + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + size)
            elif cid == b"avih":
                avih = struct.unpack_from("<IIIIIIIIII", content, body_lo)
            elif cid[2:4] == b"db":
                frames.append((body_lo, body_lo + size))
            elif cid[2:4] == b"dc":
                raise NotImplementedError(
                    "compressed AVI streams are not bundled in this "
                    "environment; plug a decoder into trafilatura_spark."
                    "functions.multimodal._decode_video_frames")
            pos = body_lo + size + (size & 1)

    walk(12, 8 + struct.unpack_from("<I", content, 4)[0])
    if avih is None:
        raise ValueError("missing avih header")
    period_us, n_frames, w, h = avih[0], avih[4], avih[8], avih[9]
    return w, h, n_frames, period_us, frames


def _decode_video_frames(content: bytes, every_ms: int):
    """Video frame sampling.  Real path: AVI with uncompressed DIB
    frames (BGR bottom-up padded rows — the BMP pixel-array layout),
    one 8x8 average-hash per sampled frame, sampled every
    max(1, every_ms*1000 // period_us) frames.  FAKE0 is the
    deterministic test format; compressed codecs are the seam."""
    if content[:4] == b"RIFF":
        w, h, _, period_us, frames = _parse_avi(content)
        if w <= 0 or h <= 0:
            raise ValueError("bad AVI dimensions")
        step = max(1, (every_ms * 1000) // max(period_us, 1))
        stride = (w * 3 + 3) & ~3
        for i in range(0, len(frames), step):
            lo, hi = frames[i]
            if hi - lo < stride * h:
                raise ValueError("truncated DIB frame")
            lumas = [[(299 * content[o + 3 * x + 2]
                       + 587 * content[o + 3 * x + 1]
                       + 114 * content[o + 3 * x]) // 1000
                      for x in range(w)]
                     for row in range(h)
                     for o in (lo + (h - 1 - row) * stride,)]
            yield i, (i * period_us) // 1000, _average_hash(lumas, w, h)
        return
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
                    codec, w, h, c, luma, lsum, phash = _decode_image(
                        bytes(content))
                    rows.append((ref, codec, w, h, c, luma, lsum, phash,
                                 None))
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    rows.append((ref, None, None, None, None, None, None,
                                 None, f"{type(exc).__name__}: {exc}"[:200]))
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
