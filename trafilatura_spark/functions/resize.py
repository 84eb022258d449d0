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

#: Rec.601 integer luma, identical to multimodal's decoders.
def _luma(r: int, g: int, b: int) -> int:
    return (299 * r + 587 * g + 114 * b) // 1000


def decode_lumas(content: bytes):
    """Full pixel grid: (codec, width, height, top-down luma rows).

    BMP (24-bit uncompressed, bottom-up or top-down) and PPM (P6,
    maxval <= 255) decode; header-only formats (GIF) and compressed
    codecs raise ``NotImplementedError`` — resize needs every pixel,
    not just dimensions.
    """
    if content[:2] == b"BM":
        off = struct.unpack_from("<I", content, 10)[0]
        w, hgt = struct.unpack_from("<ii", content, 18)
        bpp = struct.unpack_from("<H", content, 28)[0]
        compression = struct.unpack_from("<I", content, 30)[0]
        if bpp != 24 or compression != 0 or w <= 0 or hgt == 0:
            raise NotImplementedError(
                f"BMP variant bpp={bpp} compression={compression} "
                "unsupported")
        top_down, h = hgt < 0, abs(hgt)
        stride = (w * 3 + 3) & ~3
        if len(content) < off + stride * h:
            raise ValueError("truncated BMP pixel array")
        lumas = []
        for row in range(h):
            src = row if top_down else h - 1 - row
            o = off + src * stride
            lumas.append([_luma(content[o + 3 * x + 2],
                                content[o + 3 * x + 1],
                                content[o + 3 * x]) for x in range(w)])
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
        pos += 1
        w, h, maxval = fields
        if maxval > 255 or w <= 0 or h <= 0:
            raise NotImplementedError(f"PPM maxval={maxval} unsupported")
        if len(content) < pos + 3 * w * h:
            raise ValueError("truncated PPM raster")
        lumas = [[_luma(content[o], content[o + 1], content[o + 2])
                  for x in range(w)
                  for o in (pos + 3 * (y * w + x),)]
                 for y in range(h)]
        return "ppm", w, h, lumas
    raise NotImplementedError(
        "resize needs a full pixel decode; only uncompressed BMP/PPM are "
        "bundled — plug a decoder into "
        "trafilatura_spark.functions.resize.decode_lumas")


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
    Per-item failures become ``error`` rows — the same
    never-fail-the-task contract as every decode stage.
    """
    from .multimodal import _average_hash

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
                        _average_hash(small, out_w, out_h),
                        encode_bmp_gray(small, out_w, out_h), None))
                except Exception as exc:  # noqa: BLE001 — isolate per item
                    rows.append((ref, None, None, None, None, None, None,
                                 None, None,
                                 f"{type(exc).__name__}: {exc}"[:200]))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              RESIZED_SCHEMA.fields])

    return media_with_bytes.select("media_ref", "content") \
        .mapInPandas(batches, RESIZED_SCHEMA)
