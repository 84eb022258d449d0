"""Image resize (multimodal family): exact box-average semantics,
BMP round trip, closed-form parity with the deterministic generator,
and the Spark decode->resize->re-encode->decode pipeline."""

import hashlib
import struct

import pytest

from trafilatura_spark.functions.multimodal import (
    _average_hash, image_features, media_table, real_media_bytes,
    with_real_payloads)
from trafilatura_spark.functions.resize import (
    box_resize, decode_lumas, encode_bmp_gray, resize_images)


def _gray_bmp(lumas):
    h, w = len(lumas), len(lumas[0])
    return encode_bmp_gray(lumas, w, h)


# ---------------------------------------------------------------- unit math

def test_box_resize_exact_floor_means():
    # 4x2 -> 2x1: blocks are 2x2; floor of the mean, exact integers
    lumas = [[0, 1, 10, 20],
             [2, 3, 30, 41]]
    assert box_resize(lumas, 4, 2, 2, 1) == [[(0 + 1 + 2 + 3) // 4,
                                              (10 + 20 + 30 + 41) // 4]]


def test_box_resize_uneven_blocks_use_floor_split():
    # 5 -> 2 along x: blocks [0,2) and [2,5) (floor split, like the
    # average-hash grid) — unequal sizes, each averaged over its own size
    lumas = [[10, 20, 30, 40, 50]]
    assert box_resize(lumas, 5, 1, 2, 1) == [[15, 40]]


def test_box_resize_constant_is_constant():
    lumas = [[7] * 24 for _ in range(16)]
    assert box_resize(lumas, 24, 16, 8, 8) == [[7] * 8 for _ in range(8)]


def test_box_resize_identity_at_same_size():
    lumas = [[1, 2], [3, 4]]
    assert box_resize(lumas, 2, 2, 2, 2) == lumas


def test_box_resize_upscale_is_the_seam():
    with pytest.raises(NotImplementedError):
        box_resize([[1]], 1, 1, 2, 2)


# ------------------------------------------------------------- encode/decode

def test_bmp_gray_round_trip_exact():
    # gray pixels (v,v,v) survive Rec.601 exactly: (299+587+114)v//1000 = v
    lumas = [[0, 1, 127, 254, 255, 9, 64, 200],
             [255, 254, 128, 3, 17, 90, 31, 77]]
    codec, w, h, back = decode_lumas(_gray_bmp(lumas))
    assert (codec, w, h) == ("bmp", 8, 2)
    assert back == lumas


def test_decode_lumas_matches_feature_decoder_on_generator_bytes():
    # same pixel read as multimodal._decode_bmp/_decode_ppm: luma_sum of
    # the full grid equals the feature decoders' closed-form total
    for ref in ("m-1-0", "m-2-0", "m-4-0", "m-5-1", "m-7-0", "m-8-2"):
        content = real_media_bytes(ref)
        if content[:5] in (b"GIF87", b"GIF89"):
            with pytest.raises(NotImplementedError):
                decode_lumas(content)
            continue
        codec, w, h, lumas = decode_lumas(content)
        d = hashlib.md5(ref.encode()).digest()
        base = d[2] // 2
        assert sum(map(sum, lumas)) == (
            w * h * base + h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2))


def test_resized_gradient_has_closed_form():
    # generator gradient luma = base + x + y; block (X, Y) of size bx*by
    # sums to bx*by*base + by*Sx + bx*Sy -> resized pixel is its floor
    # mean (the formula the DuckDB oracle mirrors)
    ref = next(r for r in (f"m-{i}-0" for i in range(1, 50))
               if hashlib.md5(r.encode()).digest()[5] % 3 < 2)
    content = real_media_bytes(ref)
    codec, w, h, lumas = decode_lumas(content)
    bx, by = w // 8, h // 8
    d = hashlib.md5(ref.encode()).digest()
    base = d[2] // 2
    small = box_resize(lumas, w, h, 8, 8)
    for Y in range(8):
        for X in range(8):
            bs = (bx * by * base
                  + by * (bx * bx * X + bx * (bx - 1) // 2)
                  + bx * (by * by * Y + by * (by - 1) // 2))
            assert small[Y][X] == bs // (bx * by)


def test_decode_lumas_rejects_fake_and_unknown():
    with pytest.raises(NotImplementedError):
        decode_lumas(b"FAKE0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        decode_lumas(b"\x89PNG\r\n\x1a\n")


def test_decode_lumas_truncated_bmp_raises_value_error():
    lumas = [[5] * 8 for _ in range(8)]
    blob = _gray_bmp(lumas)
    with pytest.raises(ValueError):
        decode_lumas(blob[:-10])


def test_decode_lumas_top_down_bmp():
    # negative height = top-down rows; build one by hand
    w, h = 4, 2
    pad = (-(w * 3)) % 4
    rows = bytearray()
    grid = [[1, 2, 3, 4], [5, 6, 7, 8]]
    for y in range(h):  # top-down: row 0 first
        for v in grid[y]:
            rows += bytes((v, v, v))
        rows += b"\x00" * pad
    off = 14 + 40
    blob = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0,
                          len(rows), 2835, 2835, 0, 0) + bytes(rows))
    assert decode_lumas(blob) == ("bmp", w, h, grid)


# ------------------------------------------------------------ Spark pipeline

def test_resize_images_pipeline_round_trip(spark, sf_dir):
    docs_path = f"{sf_dir}/documents.parquet"
    from __spark_entry__ import synthesize_documents_df
    media = media_table(synthesize_documents_df(spark, sf_dir)).limit(40)
    resized = resize_images(with_real_payloads(media)).cache()
    rows = {r["media_ref"]: r for r in resized.collect()}
    assert rows, "no media rows at this sf"
    n_ok = 0
    for ref, r in rows.items():
        d = hashlib.md5(ref.encode()).digest()
        if d[5] % 3 == 2:  # GIF: pixel decode is the seam -> error row
            assert r["error"] is not None and "NotImplementedError" in r["error"]
            continue
        n_ok += 1
        assert r["error"] is None
        assert (r["width"], r["height"]) == (8, 8)
        assert r["src_width"] == 8 * (1 + d[0] % 3)
        assert r["src_height"] == 8 * (1 + d[1] % 3)
        # exact closed-form luma_sum of the resized grid
        bx, by = r["src_width"] // 8, r["src_height"] // 8
        base = d[2] // 2
        expect = sum(
            (bx * by * base
             + by * (bx * bx * X + bx * (bx - 1) // 2)
             + bx * (by * by * Y + by * (by - 1) // 2)) // (bx * by)
            for X in range(8) for Y in range(8))
        assert r["luma_sum"] == expect
    if n_ok == 0:
        pytest.skip("all sampled refs hashed to GIF")

    # re-encoded BMPs decode back through the FEATURE stage with the
    # same luma_sum and phash (decode -> resize -> encode -> decode)
    back = image_features(
        resized.filter("error is null").select("media_ref", "content"))
    for r in back.collect():
        src = rows[r["media_ref"]]
        assert r["error"] is None
        assert (r["width"], r["height"], r["codec"]) == (8, 8, "bmp")
        assert r["luma_sum"] == src["luma_sum"]
        assert r["phash"] == src["phash"]
    resized.unpersist()


def test_resize_images_error_isolation(spark):
    import pandas as pd
    pdf = pd.DataFrame({
        "media_ref": ["good", "bad"],
        "content": [_gray_bmp([[9] * 8 for _ in range(8)]), b"\x00\x01"],
    })
    out = {r["media_ref"]: r
           for r in resize_images(spark.createDataFrame(pdf)).collect()}
    assert out["good"]["error"] is None
    assert out["good"]["luma_sum"] == 9 * 64
    assert out["bad"]["error"] is not None


def test_sub8_output_has_null_phash(spark):
    """An 8x8-block average-hash over a sub-8 grid is degenerate (most
    bits pinned 0), so resize_images reports phash NULL there instead
    of a value that would poison near-dup comparisons."""
    import pandas as pd
    pdf = pd.DataFrame({
        "media_ref": ["a"],
        "content": [_gray_bmp([[x + y for x in range(16)]
                               for y in range(16)])],
    })
    row = resize_images(spark.createDataFrame(pdf),
                        out_w=4, out_h=4).collect()[0]
    assert row["error"] is None
    assert (row["width"], row["height"]) == (4, 4)
    assert row["phash"] is None
    assert row["luma_sum"] is not None
