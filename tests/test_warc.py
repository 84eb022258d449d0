"""WARC source (ISO 28500): record parser + distributed reader + job e2e.

Fixtures are synthesized in-test from the spec — no external data.
Shapes covered: plain file, Common Crawl-style member-per-record gzip,
whole-file gzip, chunked HTTP payload, repeat captures of one URI,
non-response records interleaved, trailing garbage.
"""

import gzip

from trafilatura_spark.sources.warc import (iter_warc_records, read_warc,
                                            warc_html_records)

ARTICLE = ("<html><head><title>t</title></head><body><article>"
           "<p>First paragraph with plenty of content so the default "
           "extraction size gates pass without any relaxation at all, "
           "mirroring the reference thresholds.</p>"
           "<p>Second paragraph, also long enough to carry the document "
           "over the output minimum applied after the cascade runs.</p>"
           "</article></body></html>")


def _record(warc_type: str, uri: str | None, body: bytes,
            extra: dict | None = None) -> bytes:
    heads = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
    if uri:
        heads.append(b"WARC-Target-URI: " + uri.encode())
    heads.append(b"WARC-Date: 2017-10-27T04:32:00Z")
    for k, v in (extra or {}).items():
        heads.append(f"{k}: {v}".encode())
    heads.append(b"Content-Length: " + str(len(body)).encode())
    return b"\r\n".join(heads) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_response(payload: bytes, headers: bytes = b"") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            + headers + b"\r\n" + payload)


def _sample_records() -> list:
    html = ARTICLE.encode()
    chunked = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
               b"Transfer-Encoding: chunked\r\n\r\n"
               + hex(len(html))[2:].encode() + b"\r\n" + html
               + b"\r\n0\r\n\r\n")
    return [
        _record("warcinfo", None, b"software: test\r\n"),
        _record("request", "http://a.example/one",
                b"GET /one HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        _record("response", "http://a.example/one", _http_response(html)),
        _record("response", "http://b.example/two", chunked),
        _record("metadata", "http://a.example/one", b"via: test\r\n"),
        # repeat capture of the same URI -> doc_id gets a #1 suffix
        _record("response", "http://a.example/one", _http_response(html)),
    ]


def _sample_warc() -> bytes:
    return b"".join(_sample_records()) + b"not a record"


def test_iter_warc_records_plain_and_gzip_variants():
    raw = _sample_warc()
    plain = list(iter_warc_records(raw))
    assert [h.get("warc-type") for h, _ in plain] == \
        ["warcinfo", "request", "response", "response", "metadata",
         "response"]
    # whole-file gzip
    assert [h.get("warc-type") for h, _ in iter_warc_records(
        gzip.compress(raw))] == [h.get("warc-type") for h, _ in plain]
    # Common Crawl style: one gzip member per record
    members = b"".join(gzip.compress(r) for r in _sample_records())
    got = [h.get("warc-type") for h, _ in iter_warc_records(members)]
    assert got == [h.get("warc-type") for h, _ in plain]


def test_warc_html_records_payloads_and_chunked():
    recs = list(warc_html_records(_sample_warc()))
    assert [(u, len(p) > 0) for u, _, p in recs] == [
        ("http://a.example/one", True),
        ("http://b.example/two", True),
        ("http://a.example/one", True),
    ]
    # chunked framing removed: payload is exactly the html
    assert recs[1][2] == ARTICLE.encode()
    assert recs[0][2].endswith(b"</html>")


def test_warc_truncated_and_garbage_are_tolerated():
    assert list(iter_warc_records(b"")) == []
    assert list(iter_warc_records(b"random bytes, no records")) == []
    # malformed Content-Length ends the walk instead of raising
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: NaN\r\n\r\nx"
    assert list(iter_warc_records(bad)) == []
    # record that claims more bytes than remain: body is truncated short
    trunc = (b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n"
             b"\r\nshort")
    [(h, body)] = list(iter_warc_records(trunc))
    assert body == b"short"
    # NEGATIVE Content-Length: before the guard, i = body_start + length
    # went negative, bytes.find clamped it to 0, and the same record was
    # re-yielded forever — one corrupt record must end the walk, not
    # wedge the executor task
    neg = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://evil.example/\r\n"
           b"Content-Length: -99999\r\n\r\n" + b"x" * 64)
    assert list(iter_warc_records(neg)) == []
    # ...including when a valid record follows the corrupt one: the
    # remainder cannot be delimited, so the walk still terminates
    assert len(list(iter_warc_records(neg + _sample_warc()))) <= 6


def test_build_warc_emits_deterministic_record_ids():
    """Every record carries the mandatory WARC-Record-ID (ISO 28500
    §5.2), deterministic from (uri, date, payload) so archives stay
    reproducible — two builds of the same pages are byte-identical."""
    from trafilatura_spark.sources.warc import build_warc
    pages = [("http://a.example/x", "<p>one</p>"),
             ("http://a.example/y", "<p>two</p>")]
    blob = build_warc(pages, compress=False)
    ids = [h.get("warc-record-id") for h, _ in iter_warc_records(blob)]
    assert len(ids) == 2 and all(
        i and i.startswith("<urn:uuid:") and i.endswith(">") for i in ids)
    assert ids[0] != ids[1]
    assert blob == build_warc(pages, compress=False)
    # different payload -> different id
    blob2 = build_warc([("http://a.example/x", "<p>changed</p>")],
                       compress=False)
    [(h2, _)] = list(iter_warc_records(blob2))
    assert h2["warc-record-id"] != ids[0]


def test_write_warc_overwrites_stale_shards(spark, tmp_path):
    """Re-running into the same directory must not leave shards from a
    prior wider run for read_warc to silently mix in (parquet-sink
    overwrite semantics)."""
    from trafilatura_spark.sources.warc import write_warc
    out = str(tmp_path / "arch")
    wide = spark.createDataFrame(
        [(f"http://s{i}.example/", "<p>old</p>") for i in range(8)],
        ["url", "html"]).repartition(8)
    assert write_warc(wide, out) == 8
    narrow = spark.createDataFrame(
        [("http://new.example/", "<p>new</p>")], ["url", "html"]).coalesce(1)
    assert write_warc(narrow, out) == 1
    got = {r["doc_id"] for r in read_warc(spark, out).collect()}
    assert got == {"http://new.example/"}


def test_read_warc_to_extraction_e2e(spark, tmp_path):
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "a.warc").write_bytes(_sample_warc())
    (warc_dir / "b.warc.gz").write_bytes(gzip.compress(_sample_warc()))

    docs = read_warc(spark, str(warc_dir))
    rows = {r["doc_id"] for r in docs.collect()}
    # 3 response records per file; the repeat capture of a.example/one
    # inside each file gets a shard-salted #<md5(path)[:8]>-1 suffix, so
    # the two files' repeats do NOT collide in doc_id space
    import re
    repeats = {r for r in rows if "#" in r}
    assert len(repeats) == 2 and all(
        re.fullmatch(r"http://a\.example/one#[0-9a-f]{8}-1", r)
        for r in repeats)
    assert rows - repeats == {"http://a.example/one",
                              "http://b.example/two"}
    assert docs.count() == 6

    from trafilatura_spark.operators.pipeline import extract_documents
    from trafilatura_spark.settings import Options
    ex = extract_documents(docs, Options(with_metadata=True)).collect()
    assert len(ex) == 6
    assert all(r["status"] == "ok" for r in ex)
    texts = {s["text"] for r in ex for s in r["spans"]}
    assert any("First paragraph" in t for t in texts)


def test_job_cli_warc_input(spark, tmp_path):
    from trafilatura_spark.job import main as job_main
    warc_dir = tmp_path / "warcs"
    warc_dir.mkdir()
    (warc_dir / "a.warc.gz").write_bytes(gzip.compress(_sample_warc()))
    out, prog = str(tmp_path / "out"), str(tmp_path / "prog")
    rc = job_main(["--input", str(warc_dir), "--input-format", "warc",
                   "--output", out, "--progress", prog,
                   "--run-id", "w1", "--buckets", "2", "--wave-size", "2"])
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert got.filter("status = 'ok'").count() == 3


def test_write_warc_roundtrip(spark, tmp_path):
    """write_warc (crawl-archiving sink) -> read_warc -> the same pages:
    the round trip that lets a crawl's --backup pages become a
    re-extractable Common Crawl-shaped archive."""
    from trafilatura_spark.sources.warc import write_warc

    pages = [(f"http://site{i}.example/p", f"<html><body><p>page {i} body"
              f"</p></body></html>") for i in range(20)]
    df = spark.createDataFrame(pages, ["url", "html"]).repartition(4)
    out = str(tmp_path / "archive")
    n = write_warc(df, out)
    assert n == 20
    shards = sorted((tmp_path / "archive").glob("part-*.warc.gz"))
    assert 1 <= len(shards) <= 4

    docs = read_warc(spark, out)
    got = {r["doc_id"]: r["spans"][0]["text"] for r in docs.collect()}
    assert got == {u: h for u, h in pages}


try:
    from hypothesis import given, settings as hyp_settings, strategies as st
    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    _URI = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/._-%?=&#é中",
        min_size=1, max_size=60).map(lambda s: "http://h.example/" + s)
    _HTML = st.text(max_size=400)

    @given(st.lists(st.tuples(_URI, _HTML), min_size=1, max_size=8),
           st.booleans())
    @hyp_settings(max_examples=120, deadline=None)
    def test_build_warc_roundtrips_through_parser(pairs, compress):
        """build_warc -> iter/warc_html_records must recover every
        (uri, payload) pair in order, for arbitrary unicode URIs and
        payload text (incl. text containing CRLF and WARC/-like bytes),
        with and without member-per-record gzip."""
        from trafilatura_spark.sources.warc import (build_warc,
                                                    warc_html_records)
        blob = build_warc(pairs, compress=compress)
        got = [(u, p) for u, _d, p in warc_html_records(blob)]
        want = [(u.encode("utf-8", "replace").decode("latin-1"),
                 h.encode("utf-8", "replace")) for u, h in pairs]
        assert got == want


def test_inflate_salvages_truncated_gzip_members():
    """A truncated .warc.gz (interrupted transfer) must yield the
    complete members before the cut instead of failing the task."""
    import gzip

    from trafilatura_spark.sources.warc import _inflate, build_warc

    blob = build_warc([("http://a.example/", "<p>a</p>"),
                       ("http://b.example/", "<p>b</p>")], compress=True)
    # cut inside the SECOND member: first record survives
    cut = blob[:len(gzip.compress(b"x")) and len(blob) - 7]
    got = _inflate(cut)
    assert b"http://a.example/" in got
    recs = list(iter_warc_records(cut))
    assert len(recs) == 1
    # trailing garbage after valid members: members still decode
    got2 = _inflate(blob + b"\x00garbage tail")
    assert b"http://a.example/" in got2 and b"http://b.example/" in got2
    # pure garbage starting with the gzip magic: empty, no raise
    assert _inflate(b"\x1f\x8bnot really gzip") == b""


def test_chunked_header_without_framing_keeps_payload():
    """Archives that store DECODED bodies but keep the chunked header
    must not lose the page (previously _dechunk returned b'')."""
    from trafilatura_spark.sources.warc import warc_html_records

    html = b"<!DOCTYPE html><p>already decoded</p>"
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + html)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x.example/\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           + http + b"\r\n\r\n")
    [(uri, _d, payload)] = list(warc_html_records(rec))
    assert payload == html
    # and 'chunked' elsewhere in the head must NOT trigger dechunking
    http2 = (b"HTTP/1.1 200 OK\r\nX-Note: chunked mention\r\n\r\n" + html)
    rec2 = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://y.example/\r\n"
            b"Content-Length: " + str(len(http2)).encode() + b"\r\n\r\n"
            + http2 + b"\r\n\r\n")
    [(_u, _d2, payload2)] = list(warc_html_records(rec2))
    assert payload2 == html


def test_read_warc_isolates_corrupt_shard(spark, tmp_path):
    """One undecodable .warc.gz in a directory must not fail the scan —
    the good shard's rows still come through."""
    import gzip

    from trafilatura_spark.sources.warc import build_warc, read_warc

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "good.warc.gz").write_bytes(
        build_warc([("http://ok.example/", "<p>fine</p>")], compress=True))
    (wdir / "bad.warc.gz").write_bytes(b"\x1f\x8b\x00corrupt beyond help")
    rows = read_warc(spark, str(wdir)).collect()
    assert [r["doc_id"] for r in rows] == ["http://ok.example/"]
