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
         ("f2", '<feed><link rel="alternate" href="https://a/y"/></feed>')],
        ["source", "xml"])
    got = {r["url"] for r in extract_feed_urls(feed).collect()}
    assert got == {"https://a/x", "https://a/y"}

    known = spark.createDataFrame([("https://a/1",)], ["url"])
    left = filter_known(extract_sitemap_urls(sm), known)
    assert {r["url"] for r in left.collect()} == {"https://a/2"}
