"""Multimodal plumbing, streaming extraction, and discovery operators."""

import pytest
from pyspark.sql import functions as F

from trafilatura_spark.functions.multimodal import (
    FAKE_MAGIC,
    fake_media_bytes,
    frame_samples,
    image_features,
    media_table,
    with_fake_payloads,
)
from trafilatura_spark.sources.corpus import synthesize_documents_df


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = synthesize_documents_df(spark, sf_dir)
    m = media_table(docs)
    m.cache()
    m.count()
    return m


def test_media_table_shape(media, doc_rows):
    expected = sum(doc_id % 3 for doc_id, *_ in doc_rows)
    assert media.count() == expected
    row = media.filter(F.col("doc_id") == "2").orderBy("position").collect()
    assert [r["media_ref"] for r in row] == ["m-2-0", "m-2-1"]


def test_image_features_deterministic(spark, media):
    import hashlib
    feats = image_features(with_fake_payloads(media)).cache()
    assert feats.filter(F.col("error").isNotNull()).count() == 0
    r = feats.filter(F.col("media_ref") == "m-2-0").first()
    h = hashlib.md5(b"m-2-0").digest()
    assert r["width"] == 64 + h[0] * 4
    assert r["height"] == 64 + h[1] * 4
    assert r["channels"] == 3
    assert r["phash"] == h[:8].hex()


def test_real_payload_hits_stub(spark, media):
    """Non-fake bytes must surface as per-item error rows, not task
    failures, and the error names the NotImplementedError stub."""
    bad = media.limit(2).withColumn("content", F.lit(b"\x89PNG\r\n"))
    rows = image_features(bad).collect()
    assert len(rows) == 2
    assert all(r["error"] and "NotImplementedError" in r["error"] for r in rows)


def test_frame_samples(spark, media):
    vids = with_fake_payloads(media.limit(10), kind="video")
    frames = frame_samples(vids, every_ms=500).collect()
    assert frames
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rs in by_ref.items():
        idxs = sorted(x["frame_idx"] for x in rs)
        assert idxs == list(range(len(rs)))
        assert all(x["ts_ms"] == x["frame_idx"] * 500 for x in rs)
        n_frames = 1 + fake_media_bytes(ref, "video")[7] % 32 if False else None
    # determinism across runs
    again = frame_samples(vids, every_ms=500).collect()
    assert sorted(map(tuple, frames)) == sorted(map(tuple, again))


def test_streaming_extraction(spark, sf_dir, tmp_path):
    from trafilatura_spark.settings import Options
    from trafilatura_spark.streaming.extract_stream import (
        start_extraction_stream,
    )
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    synthesize_documents_df(spark, sf_dir).limit(100) \
        .write.parquet(src)
    opts = Options(fast=True, comments=False, with_metadata=False,
                   min_extracted_size=5, min_output_size=1)
    q = start_extraction_stream(spark, src, out, chk, opts,
                                available_now=True)
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    assert res.count() == 100
    assert res.filter(F.col("status") != "ok").count() == 0
    # restart with no new files → no duplicates (checkpoint exactly-once)
    q2 = start_extraction_stream(spark, src, out, chk, opts,
                                 available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100


def test_discovery_sitemap_and_feeds(spark):
    from trafilatura_spark.sources.discovery import (
        extract_feed_urls,
        extract_sitemap_urls,
        filter_known,
    )
    sm = spark.createDataFrame(
        [("s1", "<urlset><url><loc>https://a/1</loc></url>"
                 "<url><loc>https://a/2</loc></url></urlset>")],
        ["source", "xml"])
    urls = extract_sitemap_urls(sm).orderBy("pos").collect()
    assert [(r["pos"], r["url"]) for r in urls] == [
        (0, "https://a/1"), (1, "https://a/2")]

    feed = spark.createDataFrame(
        [("f1", '<rss><item><link>https://a/x</link></item></rss>'),
         ("f2", '<feed><link rel="alternate" href="https://a/y"/></feed>'),
         ("f3", '{"version": "https://jsonfeed.org/1", "items": '
                '[{"url": "https://a/z"}]}')],
        ["source", "xml"])
    got = {r["url"] for r in extract_feed_urls(feed).collect()}
    # json-feed extraction also picks up the version url — same-domain
    # filtering is a separate stage; assert the item urls are present
    assert {"https://a/x", "https://a/y", "https://a/z"} <= got

    known = spark.createDataFrame([("https://a/1",)], ["url"])
    left = filter_known(extract_sitemap_urls(sm), known)
    assert {r["url"] for r in left.collect()} == {"https://a/2"}


def test_windowed_metrics_stream(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F
    from trafilatura_spark.settings import Options
    from trafilatura_spark.streaming.extract_stream import (
        extract_stream, read_documents_stream)
    from trafilatura_spark.streaming.stateful import (
        windowed_extraction_metrics)
    src = str(tmp_path / "min")
    synthesize_documents_df(spark, sf_dir).limit(80).write.parquet(src)
    stream = extract_stream(
        read_documents_stream(spark, src),
        Options(fast=True, comments=False, with_metadata=False,
                min_extracted_size=5, min_output_size=1))
    # event time synthesized from doc_id (deterministic, spread over 3 min)
    stream = stream.withColumn(
        "event_time",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")) +
        F.make_interval(secs=(F.col("doc_id").cast("long") % 180)))
    metrics = windowed_extraction_metrics(stream)
    q = (metrics.writeStream.format("memory").queryName("winmetrics")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # append mode only emits closed windows; run a second batch with no new
    # data to advance the watermark is not possible on file source, so
    # check the state store instead via complete-mode rerun
    q2 = (windowed_extraction_metrics(stream)
          .writeStream.format("memory").queryName("winmetrics2")
          .outputMode("complete").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    rows = spark.sql("select * from winmetrics2 order by window_start").collect()
    assert rows
    assert sum(r["docs"] for r in rows) == 80
    assert all(0.0 <= r["fallback_rate"] <= 1.0 for r in rows)


def test_stateful_url_frontier(spark, tmp_path):
    import pandas as pd
    from trafilatura_spark.streaming.stateful import (
        URL_EVENT_SCHEMA, dedup_urls_stateful)
    src = str(tmp_path / "urls")
    import datetime
    t0 = datetime.datetime(2026, 1, 1)
    batch1 = [("h1", "u1", t0), ("h1", "u2", t0), ("h2", "u1", t0)]
    spark.createDataFrame(batch1, URL_EVENT_SCHEMA).write.parquet(src)
    stream = (spark.readStream.schema(URL_EVENT_SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    chk = str(tmp_path / "chk")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (dedup_urls_stateful(stream)
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", chk)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    got1 = {(r["host"], r["url"]): r["accepted"]
            for r in spark.read.parquet(sink).collect()}
    assert got1 == {("h1", "u1"): True, ("h1", "u2"): True,
                    ("h2", "u1"): True}
    # second batch: duplicate u1 on h1 must be rejected via persisted state
    batch2 = [("h1", "u1", t0), ("h1", "u3", t0)]
    spark.createDataFrame(batch2, URL_EVENT_SCHEMA) \
        .write.mode("append").parquet(src)
    run_once()
    rows2 = [r for r in spark.read.parquet(sink).collect()]
    assert (("h1", "u1"), False) in {((r["host"], r["url"]), r["accepted"])
                                     for r in rows2}
    assert (("h1", "u3"), True) in {((r["host"], r["url"]), r["accepted"])
                                    for r in rows2}


def test_discovery_on_reference_resources(spark):
    """Run the discovery operators over the reference's own resource
    fixtures (test/resources/*.xml|atom|rss|json)."""
    import gzip
    import pathlib
    res = pathlib.Path("/root/reference/test/resources")
    if not res.exists():
        pytest.skip("resources missing")
    from trafilatura_spark.sources.discovery import (
        extract_feed_urls, extract_hreflang_urls, extract_sitemap_urls,
        guess_sitemap_urls)

    def df_of(name, text):
        return spark.createDataFrame([(name, text)], ["source", "xml"])

    sm = (res / "sitemap.xml").read_text()
    urls = {r["url"] for r in
            extract_sitemap_urls(df_of("sm", sm)).collect()}
    assert urls and all(u.startswith("http") for u in urls)

    sm_gz = gzip.decompress((res / "sitemap.xml.gz").read_bytes()).decode()
    urls_gz = {r["url"] for r in
               extract_sitemap_urls(df_of("smgz", sm_gz)).collect()}
    assert urls_gz == urls  # same sitemap, compressed

    atom = (res / "feed1.atom").read_text()
    atom_urls = {r["url"] for r in
                 extract_feed_urls(df_of("a", atom)).collect()}
    assert "http://example.org/" in atom_urls

    rss = (res / "feed2.rss").read_text()
    rss_urls = {r["url"] for r in extract_feed_urls(df_of("r", rss)).collect()}
    assert any("example" in u for u in rss_urls)

    jf = (res / "feed.json").read_text()
    json_urls = {r["url"] for r in extract_feed_urls(df_of("j", jf)).collect()}
    assert json_urls

    hre = (res / "sitemap-hreflang.xml").read_text()
    de = {r["url"] for r in
          extract_hreflang_urls(df_of("h", hre), lang="de").collect()}
    assert "http://www.example.com/deutsch/page.html" in de
    assert all("/english/" not in u for u in de)

    guesses = guess_sitemap_urls("https://example.org/some/page")
    assert guesses[0] == "https://example.org/sitemap.xml"
    assert "https://example.org/sitemap_index.xml" in guesses


# -- real pure-stdlib codecs (BMP / PPM / GIF header) --------------------------

def _hand_bmp(pixels, top_down):
    """Assemble a 24-bit BMP from a top-down row-major [[(r,g,b)]] grid
    by hand — independent of real_media_bytes."""
    import struct
    h, w = len(pixels), len(pixels[0])
    pad = (-(w * 3)) % 4
    rows = bytearray()
    order = pixels if top_down else pixels[::-1]
    for row in order:
        for r, g, b in row:
            rows += bytes((b, g, r))
        rows += b"\x00" * pad
    off = 54
    return (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h if not top_down else -h,
                          1, 24, 0, len(rows), 0, 0, 0, 0) + bytes(rows))


def test_decode_bmp_hand_assembled():
    from trafilatura_spark.functions.multimodal import _decode_image
    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
          [(10, 20, 30), (0, 0, 0), (255, 255, 255)]]
    lumas = [(299 * r + 587 * g + 114 * b) // 1000
             for row in px for r, g, b in row]
    want_sum = sum(lumas)
    for top_down in (False, True):
        codec, w, h, c, mean, lsum, phash = _decode_image(
            _hand_bmp(px, top_down))
        assert (codec, w, h, c) == ("bmp", 3, 2, 3)
        assert lsum == want_sum
        assert abs(mean - want_sum / 6 / 255.0) < 1e-9
    # orientation must not change any feature
    a = _decode_image(_hand_bmp(px, False))
    b = _decode_image(_hand_bmp(px, True))
    assert a == b


def test_decode_ppm_with_comment():
    from trafilatura_spark.functions.multimodal import _decode_image
    body = bytes(v for v in (5, 5, 5, 250, 250, 250, 100, 100, 100,
                             200, 200, 200))
    ppm = b"P6\n# a comment line\n2 2\n255\n" + body
    codec, w, h, c, mean, lsum, phash = _decode_image(ppm)
    assert (codec, w, h, c) == ("ppm", 2, 2, 3)
    assert lsum == 5 + 250 + 100 + 200
    assert len(phash) == 16


def test_decode_gif_header_only():
    from trafilatura_spark.functions.multimodal import _decode_image
    gif = b"GIF89a" + (300).to_bytes(2, "little") + (70).to_bytes(2, "little") \
        + bytes((0x70, 0, 0)) + b"\x3b"
    assert _decode_image(gif) == ("gif", 300, 70, None, None, None, None)


def test_decode_rejects_unsupported_variants():
    import struct
    import pytest as _pytest
    from trafilatura_spark.functions.multimodal import _decode_image
    # 8-bit BMP -> NotImplementedError (the codec seam)
    bad = (b"BM" + struct.pack("<IHHI", 60, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0)
           + b"\x00" * 8)
    with _pytest.raises(NotImplementedError):
        _decode_image(bad)
    # truncated 24-bit BMP -> ValueError (corrupt, not unsupported)
    trunc = _hand_bmp([[(1, 2, 3)]], False)[:-2]
    with _pytest.raises(ValueError):
        _decode_image(trunc)
    # 16-bit PPM -> NotImplementedError
    with _pytest.raises(NotImplementedError):
        _decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_real_payload_generator_round_trip():
    """real_media_bytes -> _decode_image must agree with the generator's
    closed forms (the same contract the DuckDB oracle mirrors)."""
    import hashlib
    from trafilatura_spark.functions.multimodal import (
        _decode_image, real_media_bytes)
    seen = set()
    for i in range(40):
        ref = f"m-{i}-0"
        hd = hashlib.md5(ref.encode()).digest()
        codec, w, h, c, mean, lsum, phash = _decode_image(
            real_media_bytes(ref))
        seen.add(codec)
        if codec == "gif":
            assert (w, h) == (16 + hd[0], 16 + hd[1])
            continue
        bx, by, base = 1 + hd[0] % 3, 1 + hd[1] % 3, hd[2] // 2
        assert (w, h, c) == (8 * bx, 8 * by, 3)
        assert lsum == (w * h * base + h * (w * (w - 1) // 2)
                        + w * (h * (h - 1) // 2))
        # independent naive average-hash over the generator's luma grid
        lumas = [[base + x + y for x in range(w)] for y in range(h)]
        total = sum(map(sum, lumas))
        bits = 0
        for j in range(8):
            for i2 in range(8):
                bs = sum(lumas[y][x]
                         for y in range(j * by, (j + 1) * by)
                         for x in range(i2 * bx, (i2 + 1) * bx))
                if bs * w * h > total * bx * by:
                    bits |= 1 << (j * 8 + i2)
        assert phash == "%016x" % bits
    assert seen == {"bmp", "ppm", "gif"}


def test_image_features_real_payloads_spark(spark, media):
    from trafilatura_spark.functions.multimodal import (
        image_features, with_real_payloads)
    feats = image_features(with_real_payloads(media.limit(30))).collect()
    assert len(feats) == 30
    assert all(r["error"] is None for r in feats)
    assert {r["codec"] for r in feats} <= {"bmp", "ppm", "gif"}
    for r in feats:
        if r["codec"] in ("bmp", "ppm"):
            assert r["luma_sum"] > 0 and len(r["phash"]) == 16


# -- real WAV/PCM16 audio codec ------------------------------------------------

def _hand_wav(samples, rate=8000, channels=1, extra_chunk=False):
    """Assemble a PCM16 WAV by hand — independent of real_audio_bytes.
    extra_chunk inserts an odd-sized LIST chunk before fmt to exercise
    chunk walking + word alignment."""
    import struct
    pcm = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * 2 * channels,
                      2 * channels, 16)
    chunks = b""
    if extra_chunk:
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_hand_assembled():
    from trafilatura_spark.functions.multimodal import _decode_audio
    samples = [0, 100, -200, 32767, -32768, 5]
    for extra in (False, True):
        codec, rate, ch, n, peak, sq = _decode_audio(
            _hand_wav(samples, rate=44100, extra_chunk=extra))
        assert (codec, rate, ch, n) == ("wav", 44100, 1, 6)
        assert peak == 32768
        assert sq == sum(s * s for s in samples)


def test_decode_wav_stereo():
    from trafilatura_spark.functions.multimodal import _decode_audio
    codec, rate, ch, n, peak, sq = _decode_audio(
        _hand_wav([10, -20, 30, -40], rate=16000, channels=2))
    assert (codec, ch, n) == ("wav", 2, 4)  # n counts interleaved samples
    assert (peak, sq) == (40, 100 + 400 + 900 + 1600)


def test_decode_audio_unsupported_and_corrupt():
    import struct
    import pytest as _pytest
    from trafilatura_spark.functions.multimodal import _decode_audio
    # IEEE-float WAV -> NotImplementedError (the codec seam)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 16)
    flt = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"data" + struct.pack("<I", 0))
    with _pytest.raises(NotImplementedError):
        _decode_audio(flt)
    # mp3 magic -> NotImplementedError
    with _pytest.raises(NotImplementedError):
        _decode_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00")
    # RIFF without data chunk -> ValueError (corrupt)
    nodata = (b"RIFF" + struct.pack("<I", 4 + 8 + 16) + b"WAVE"
              + b"fmt " + struct.pack("<I", 16)
              + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16))
    with _pytest.raises(ValueError):
        _decode_audio(nodata)


def test_real_audio_generator_round_trip():
    import hashlib
    from trafilatura_spark.functions.multimodal import (
        _decode_audio, real_audio_bytes)
    for i in range(25):
        ref = f"m-{i}-1"
        h = hashlib.md5(ref.encode()).digest()
        codec, rate, ch, n, peak, sq = _decode_audio(real_audio_bytes(ref))
        assert (codec, ch) == ("wav", 1)
        assert rate == 4000 + 100 * (h[6] % 5)
        assert n == 200 + h[0] * 2
        step, off = 1 + h[2], 8 * h[3]
        want = [((k * step + off) % 2048) - 1024 for k in range(n)]
        assert peak == max(abs(s) for s in want)
        assert sq == sum(s * s for s in want)


def test_audio_features_spark(spark, media):
    from trafilatura_spark.functions.multimodal import (
        audio_features, with_real_audio_payloads)
    rows = audio_features(with_real_audio_payloads(media.limit(20))).collect()
    assert len(rows) == 20
    assert all(r["error"] is None and r["codec"] == "wav" for r in rows)
    assert all(r["sq_sum"] > 0 and r["n_samples"] >= 200 for r in rows)


# -- real AVI video codec (uncompressed DIB frames) ----------------------------

def _hand_avi(frames_px, period_us=40000):
    """Assemble a minimal AVI by hand from top-down [[(r,g,b)]] frame
    grids — independent of real_video_bytes."""
    import struct
    h, w = len(frames_px[0]), len(frames_px[0][0])
    pad = (-(w * 3)) % 4
    frames = []
    for px in frames_px:
        rows = bytearray()
        for row in px[::-1]:  # bottom-up
            for r, g, b in row:
                rows += bytes((b, g, r))
            rows += b"\x00" * pad
        frames.append(bytes(rows))
    avih = struct.pack("<IIIIIIIIII", period_us, 0, 0, 0, len(frames), 0,
                       1, 0, w, h) + b"\x00" * 16
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi"
    for fr in frames:
        movi += b"00db" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi += b"\x00"
    body = (b"AVI " + b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl"
            + hdrl + b"LIST" + struct.pack("<I", len(movi)) + movi)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_avi_hand_assembled():
    from trafilatura_spark.functions.multimodal import (
        _average_hash, _decode_video_frames)
    f0 = [[(255, 255, 255), (0, 0, 0)], [(10, 10, 10), (200, 200, 200)]]
    f1 = [[(0, 0, 0), (0, 0, 0)], [(0, 0, 0), (255, 255, 255)]]
    out = list(_decode_video_frames(_hand_avi([f0, f1], period_us=33000), 0))
    assert [o[0] for o in out] == [0, 1]
    assert [o[1] for o in out] == [0, 33]
    for (idx, ts, ph), px in zip(out, (f0, f1)):
        lumas = [[(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in row]
                 for row in px]
        assert ph == _average_hash(lumas, 2, 2)


def test_decode_avi_compressed_hits_seam():
    import struct
    import pytest as _pytest
    from trafilatura_spark.functions.multimodal import _decode_video_frames
    avih = struct.pack("<IIIIIIIIII", 40000, 0, 0, 0, 1, 0, 1, 0, 2, 2) \
        + b"\x00" * 16
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"movi" + b"00dc" + struct.pack("<I", 4) + b"\x00" * 4
    body = (b"AVI " + b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl"
            + hdrl + b"LIST" + struct.pack("<I", len(movi)) + movi)
    with _pytest.raises(NotImplementedError):
        list(_decode_video_frames(b"RIFF" + struct.pack("<I", len(body))
                                  + body, 0))


def test_real_video_generator_round_trip():
    import hashlib
    from trafilatura_spark.functions.multimodal import (
        _average_hash, _decode_video_frames, real_video_bytes)
    for i in range(20):
        ref = f"m-{i}-2"
        h = hashlib.md5(ref.encode()).digest()
        bx, by = 1 + h[7] % 3, 1 + h[8] % 3
        w, hgt = 8 * bx, 8 * by
        n_frames = 2 + h[9] % 6
        period_us = (20 + h[10] % 30) * 1000
        out = list(_decode_video_frames(real_video_bytes(ref), 0))
        assert len(out) == n_frames
        for idx, ts, ph in out:
            assert ts == (idx * period_us) // 1000
            base = (h[2] + 5 * idx) % 128
            lumas = [[base + x + y for x in range(w)] for y in range(hgt)]
            assert ph == _average_hash(lumas, w, hgt)
        # sampling every two frame periods keeps even indices only
        out2 = list(_decode_video_frames(real_video_bytes(ref),
                                         2 * period_us // 1000))
        assert [o[0] for o in out2] == list(range(0, n_frames, 2))


def test_frame_samples_real_avi_spark(spark, media):
    from trafilatura_spark.functions.multimodal import (
        frame_samples, with_real_video_payloads)
    vids = with_real_video_payloads(media.limit(12))
    rows = frame_samples(vids, every_ms=0).collect()
    assert len(rows) >= 24  # >= 2 frames per ref
    assert all(len(r["frame_phash"]) == 16 for r in rows)
    again = frame_samples(vids, every_ms=0).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_parse_avi_adversarial_inputs_terminate():
    """Malformed chunk sizes must not hang or loop the RIFF walker
    (the bug class ADVICE found in the WARC parser): every crafted
    input either parses, raises, or yields nothing — in bounded time."""
    import struct
    from trafilatura_spark.functions.multimodal import (
        _decode_video_frames, _parse_avi)
    avih = struct.pack("<IIIIIIIIII", 40000, 0, 0, 0, 1, 0, 1, 0, 2, 2) \
        + b"\x00" * 16
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih

    def wrap(movi_payload: bytes) -> bytes:
        body = (b"AVI " + b"LIST" + struct.pack("<I", 4 + len(hdrl))
                + b"hdrl" + hdrl + b"LIST"
                + struct.pack("<I", 4 + len(movi_payload)) + b"movi"
                + movi_payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    crafted = [
        # chunk size overruns the buffer
        wrap(b"00db" + struct.pack("<I", 0xFFFFFFF0) + b"\x00" * 8),
        # zero-size chunks repeated (progress must still be >= 8/step)
        wrap((b"00db" + struct.pack("<I", 0)) * 64),
        # truncated header: size field cut mid-chunk
        wrap(b"00db" + b"\x01"),
        # frame range shorter than stride*h
        wrap(b"00db" + struct.pack("<I", 3) + b"\x00" * 3),
        # deeply nested LISTs (recursion must fail cleanly, not hang)
        wrap(b"".join(b"LIST" + struct.pack("<I", 4 + 12 * d) + b"mov0"
                      for d in range(63, -1, -1))),
        # not an AVI at all
        b"RIFF" + struct.pack("<I", 4) + b"WAVE",
        # empty movi
        wrap(b""),
    ]
    for content in crafted:
        try:
            list(_decode_video_frames(content, 0))
        except Exception:
            pass  # any exception is fine; hanging/looping is not


def test_average_hash_property_vs_avi_round_trip():
    """Property: for arbitrary small frame grids, hand-assembled AVI →
    _decode_video_frames reproduces _average_hash of the Rec.601 lumas
    (pixel-array layout: bottom-up rows, BGR, 4-byte padding)."""
    from hypothesis import given, settings, strategies as st
    from trafilatura_spark.functions.multimodal import (
        _average_hash, _decode_video_frames)

    px = st.tuples(st.integers(0, 255), st.integers(0, 255),
                   st.integers(0, 255))

    @settings(max_examples=30, deadline=None)
    @given(st.integers(1, 3), st.integers(1, 3),
           st.integers(1, 3), st.data())
    def prop(bx, by, n_frames, data):
        w, h = 8 * bx, 8 * by
        frames = [data.draw(st.lists(st.lists(px, min_size=w, max_size=w),
                                     min_size=h, max_size=h))
                  for _ in range(n_frames)]
        out = list(_decode_video_frames(_hand_avi(frames, period_us=25000),
                                        0))
        assert [o[0] for o in out] == list(range(n_frames))
        assert [o[1] for o in out] == [i * 25 for i in range(n_frames)]
        for (_, _, ph), grid in zip(out, frames):
            lumas = [[(299 * r + 587 * g + 114 * b) // 1000
                      for r, g, b in row] for row in grid]
            assert ph == _average_hash(lumas, w, h)

    prop()
