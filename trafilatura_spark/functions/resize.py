"""Image resize as an Arrow-batched Spark stage (multimodal family).

The round brief's multimodal checklist is decode / feature-extract /
resize / frame-sample; this module is the resize leg.  Box-average
downsampling over the pure-stdlib decoders' pixel grids (uncompressed
24-bit BMP, binary PPM P6 — the same real formats
``multimodal._decode_image`` handles), re-encoding the result as a
24-bit grayscale BMP so the output is itself decodable by
``multimodal.image_features`` — the pipeline shape is therefore
decode → resize → re-encode → (optionally) decode again, all inside
one ``mapInPandas`` stage with per-item error isolation.

Block semantics match ``multimodal._average_hash``'s floor split:
output pixel (X, Y) averages the source block
``x in [X*w//W, (X+1)*w//W), y in [Y*h//H, (Y+1)*h//H)`` with exact
integer arithmetic (``block_sum // block_pixels``), so for the
deterministic gradient generator (luma = base + x + y, w/h multiples
of 8) every resized pixel — and hence the resized luma_sum and
average-hash — has a closed form an external oracle can reproduce
(mirrored in ``__spark_entry__._ORACLE_MEDIA``).  Upscaling (an output
axis larger than the source) would need interpolation and is the
deployment seam, like the compressed codecs: a clearly-raised
``NotImplementedError``.

Reference scope note: the Dart reference has no media pipeline at all
(images survive only as ``graphic`` spans, main_extractor.dart:291-314);
this module is part of the engine's training-data extensions.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, types as T

# the single shared pixel reader (the feature stage aggregates the same
# grid away; fix a decoder edge there and both pipelines move together)
from .multimodal import decode_lumas  # noqa: F401  (re-exported)


def box_resize(lumas: list[list[int]], w: int, h: int,
               out_w: int, out_h: int) -> list[list[int]]:
    """Exact box-average downsample: output (X, Y) is the floor-mean of
    source block [X*w//out_w, (X+1)*w//out_w) x [Y*h//out_h, ...)."""
    if out_w > w or out_h > h or out_w <= 0 or out_h <= 0:
        raise NotImplementedError(
            f"upscaling {w}x{h} -> {out_w}x{out_h} needs interpolation "
            "(deployment seam); box_resize only downsamples")
    out = []
    for yo in range(out_h):
        y0, y1 = yo * h // out_h, (yo + 1) * h // out_h
        row = []
        for xo in range(out_w):
            x0, x1 = xo * w // out_w, (xo + 1) * w // out_w
            bs = sum(sum(lumas[y][x0:x1]) for y in range(y0, y1))
            row.append(bs // ((y1 - y0) * (x1 - x0)))
        out.append(row)
    return out


def encode_bmp_gray(lumas: list[list[int]], w: int, h: int) -> bytes:
    """Top-down luma grid -> 24-bit grayscale BMP (bottom-up, rows
    padded to 4 bytes — the exact layout ``decode_lumas``/
    ``multimodal._decode_bmp`` read back)."""
    pad = (-(w * 3)) % 4
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        for v in lumas[y]:
            rows += bytes((v, v, v))
        rows += b"\x00" * pad
    off = 14 + 40
    return (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                          len(rows), 2835, 2835, 0, 0)
            + bytes(rows))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType(), False),
    T.StructField("codec", T.StringType(), True),
    T.StructField("src_width", T.IntegerType(), True),
    T.StructField("src_height", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("luma_sum", T.LongType(), True),
    T.StructField("phash", T.StringType(), True),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("error", T.StringType(), True),
])


def resize_images(media_with_bytes: DataFrame, out_w: int = 8,
                  out_h: int = 8) -> DataFrame:
    """Arrow-batched decode → box-resize → BMP re-encode.

    Input contract matches ``multimodal.image_features``: columns
    ``media_ref`` + binary ``content``.  Output carries the resized
    dimensions, the resized image's exact luma_sum and 8x8
    average-hash, and the re-encoded BMP bytes (feed them back through
    ``image_features`` for a full decode-resize-decode round trip).
    The ``phash`` column is NULL when either output dimension is below
    8: the average-hash contract is an 8x8 block grid, and hashing a
    sub-8 grid through it pins most bits to 0 — a degenerate value
    that would silently poison near-dup comparisons downstream.
    Per-item failures become ``error`` rows — the same
    never-fail-the-task contract as every decode stage.
    """
    from .multimodal import _average_hash

    hashable = out_w >= 8 and out_h >= 8

    def batches(it):
        import pandas as pd
        for pdf in it:
            rows = []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                try:
                    codec, w, h, lumas = decode_lumas(bytes(content))
                    small = box_resize(lumas, w, h, out_w, out_h)
                    rows.append((
                        ref, codec, w, h, out_w, out_h,
                        sum(map(sum, small)),
                        _average_hash(small, out_w, out_h)
                        if hashable else None,
                        encode_bmp_gray(small, out_w, out_h), None))
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    rows.append((ref, None, None, None, None, None, None,
                                 None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA.fields])

    return media_with_bytes.select("media_ref", "content") \
        .mapInPandas(batches, RESIZED_SCHEMA)
