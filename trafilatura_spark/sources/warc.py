"""WARC (Web ARChive, ISO 28500) source: the container format of
Common Crawl-scale corpora — the canonical input shape for a 100 TB
extraction run.

Pure-stdlib record parser (the environment ships no warcio): a WARC
file is a sequence of records, each ``WARC/1.x`` header block +
``Content-Length``-delimited body, separated by CRLFCRLF; Common Crawl
files additionally gzip each record as its own member, which
``gzip.decompress`` (multi-member aware) handles transparently, as
does a whole-file gzip.  ``response`` records carry an HTTP response
as the body: status line + headers, CRLFCRLF, then the page payload.

Distribution model mirrors ``job.read_html_dir``: a ``binaryFile``
scan (one row per .warc/.warc.gz) fans out to an Arrow stage that
parses records and emits one documents-row per response record —
``doc_id`` = WARC-Target-URI (suffixed with the record offset on
repeat captures of the same URI, so downstream doc_id keys stay
unique), ``spans`` = the single-chunk html span shared by every
raw-HTML ingestion path.  gzip members are not splittable, so the
parallelism unit is the file — exactly how Common Crawl shards its
corpus (~1 GB per file, thousands of files per crawl).

The reference's closest surface is the --input-dir file pipeline
(cli_utils.dart:270-360); WARC is an engine extension past the
reference (its --archived flag consumes a live web service instead,
cli.dart:62-64 — documented N/A).
"""

from __future__ import annotations

import gzip as _gzip

_CRLF2 = b"\r\n\r\n"


def _inflate(raw: bytes) -> bytes:
    """Whole-file or member-per-record gzip → plain bytes (pass-through
    for uncompressed input).

    Tolerant of truncated/corrupt archives: an interrupted transfer
    (EOFError) or trailing garbage (BadGzipFile) must not fail the
    whole Spark task for a thousands-of-files crawl — the salvage path
    decodes complete gzip members one by one and returns what decoded,
    which for the Common Crawl member-per-record layout recovers every
    record before the corruption point."""
    if raw[:2] != b"\x1f\x8b":
        return raw
    try:
        return _gzip.decompress(raw)  # multi-member aware
    except Exception:  # noqa: BLE001 - salvage complete members below
        import zlib
        out = []
        pos = 0
        while pos < len(raw) and raw[pos:pos + 2] == b"\x1f\x8b":
            d = zlib.decompressobj(31)
            try:
                chunk = d.decompress(raw[pos:])
            except zlib.error:
                break
            if not d.eof:
                break  # final member truncated: drop it
            out.append(chunk)
            pos = len(raw) - len(d.unused_data)
        return b"".join(out)


def _parse_header_block(block: bytes) -> dict:
    """WARC named fields: 'Name: value' lines after the version line;
    names are case-insensitive (spec §4)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n")[1:]:
        name, sep, value = line.partition(b":")
        if sep:
            headers[name.strip().lower().decode("latin-1")] = \
                value.strip().decode("latin-1", "replace")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Minimal HTTP/1.1 chunked-transfer decoder (archived responses
    occasionally retain the on-the-wire framing)."""
    out = []
    i = 0
    n = len(body)
    while i < n:
        eol = body.find(b"\r\n", i)
        if eol < 0:
            break
        size_token = body[i:eol].split(b";")[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[eol + 2:eol + 2 + size])
        i = eol + 2 + size + 2  # chunk + its trailing CRLF
    return b"".join(out)


def iter_warc_records(raw: bytes):
    """Yield (headers, body bytes) per WARC record.  Tolerant scan:
    a record with a malformed Content-Length ends the file walk (the
    remainder cannot be delimited) rather than raising."""
    data = _inflate(raw)
    i = 0
    n = len(data)
    while i < n:
        start = data.find(b"WARC/", i)
        if start < 0:
            return
        head_end = data.find(_CRLF2, start)
        if head_end < 0:
            return
        headers = _parse_header_block(data[start:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length cannot delimit the remainder — and left
            # unchecked, i = body_start + length can go negative, which
            # bytes.find clamps to 0, re-yielding the same record forever
            # (one corrupt record in untrusted input must not wedge a
            # task).  End the walk like any other malformed length.
            return
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        yield headers, body
        # force forward progress even if a hostile header combination
        # slips past the guards above
        i = max(body_start + length, head_end + 4)


def warc_html_records(raw: bytes):
    """Yield (target_uri, warc_date, html_bytes) for each ``response``
    record whose HTTP payload is present.  Chunked transfer encoding is
    decoded; other encodings (gzip content-encoding) ride through
    ``decode_file``'s magic-byte sniff downstream."""
    for headers, body in iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        uri = headers.get("warc-target-uri")
        if not uri:
            continue
        split = body.find(_CRLF2)
        if split < 0:
            continue
        http_head = body[:split].lower()
        payload = body[split + 4:]
        # the chunked flag must be ON the transfer-encoding line (a
        # substring match anywhere in the head would also fire on e.g.
        # a cookie value containing 'chunked')
        chunked = any(
            line.startswith(b"transfer-encoding:") and b"chunked" in line
            for line in http_head.split(b"\r\n"))
        if chunked:
            dechunked = _dechunk(payload)
            # archives written by tools that store DECODED bodies keep
            # the chunked header but no framing — _dechunk then reads a
            # bogus size token and yields nothing; fall back to the raw
            # payload instead of silently emitting an empty page
            payload = dechunked if dechunked else payload
        yield uri, headers.get("warc-date", ""), payload


def read_warc(spark, input_path: str, glob: str = "*.warc*"):
    """Directory (or file) of WARC archives → documents(doc_id, spans).

    Same contract as ``job.read_html_dir``: feed the result straight to
    ``run_extraction``/``extract_documents``.  doc_id is the
    WARC-Target-URI; repeat captures of one URI get a
    ``#<shard>-<n>`` suffix (shard = md5 of the archive path, so the
    suffix stays unique even when the same URI repeats in two different
    shards).  First captures keep the bare URI: like Common Crawl's own
    index, a URI that is captured once per shard in MULTIPLE shards
    yields one row per shard with the same doc_id — global first-capture
    uniqueness would require a corpus-wide shuffle and is the caller's
    dedup stage (``functions.dedup.exact_duplicates``), not the reader's.
    """
    from .corpus import DOCUMENTS_SCHEMA, single_html_span
    from .loading import decode_file

    binary = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob)
              .load(input_path)
              .select("path", "content"))

    def to_docs(batches):
        import hashlib
        import pandas as pd
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                shard = hashlib.md5(str(path).encode()).hexdigest()[:8]
                seen: dict[str, int] = {}
                try:
                    for uri, _date, payload in warc_html_records(
                            bytes(content)):
                        k = seen.get(uri, 0)
                        seen[uri] = k + 1
                        doc_id = uri if k == 0 else f"{uri}#{shard}-{k}"
                        rows.append(
                            (doc_id, single_html_span(decode_file(payload))))
                except Exception:  # noqa: BLE001 — isolate per shard: one
                    # undecodable archive must not fail the whole task
                    # (records yielded before the failure are kept)
                    continue
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return binary.mapInPandas(to_docs, DOCUMENTS_SCHEMA)


def build_warc(records, date: str = "1970-01-01T00:00:00Z",
               compress: bool = True) -> bytes:
    """Serialize (uri, html_text) pairs into WARC response records —
    one gzip member per record when ``compress`` (the Common Crawl
    layout, so shards stay record-seekable).  ``date`` is caller-fixed:
    archives must be reproducible from their inputs alone — the
    mandatory WARC-Record-ID (ISO 28500 §5.2) is therefore a
    deterministic urn:uuid derived from (uri, date, payload md5) rather
    than a random uuid4."""
    import hashlib
    import uuid

    out = []
    for uri, html in records:
        payload = html.encode("utf-8", "replace")
        digest = hashlib.md5(
            uri.encode("utf-8", "replace") + b"\x00" + date.encode()
            + b"\x00" + payload).hexdigest()
        record_id = f"<urn:uuid:{uuid.UUID(digest)}>"
        http = (b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Content-Length: " + str(len(payload)).encode()
                + b"\r\n\r\n" + payload)
        rec = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: " + record_id.encode() + b"\r\n"
               b"WARC-Target-URI: " + uri.encode("utf-8", "replace") + b"\r\n"
               b"WARC-Date: " + date.encode() + b"\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode()
               + b"\r\n\r\n" + http + b"\r\n\r\n")
        out.append(_gzip.compress(rec) if compress else rec)
    return b"".join(out)


def write_warc(df, output_dir: str, url_col: str = "url",
               html_col: str = "html",
               date: str = "1970-01-01T00:00:00Z") -> int:
    """Archive a (url, html) DataFrame as per-partition .warc.gz shards
    under ``output_dir`` — the crawl-archiving counterpart of
    ``read_warc`` (round-trip tested).  Each task writes one
    ``part-<partition>.warc.gz`` with member-per-record gzip.

    Executors write via ``open()``: on a multi-node cluster
    ``output_dir`` must be a shared mount (the same assumption as any
    local-path sink); an HDFS/S3 deployment would swap this seam for
    the Hadoop FileSystem API without touching the record builder.
    Returns the number of archived pages.
    """
    import glob as _glob
    import os

    os.makedirs(output_dir, exist_ok=True)
    # overwrite semantics, matching the parquet backup sink: a re-run
    # with fewer partitions must not leave stale shards from the prior
    # run for read_warc to silently mix in
    for stale in _glob.glob(os.path.join(output_dir, "part-*.warc.gz")) + \
            _glob.glob(os.path.join(output_dir, "*.tmp")):
        os.remove(stale)
    sel = df.select(url_col, html_col)

    def archive(pid, it):
        import tempfile

        rows = [(r[0], r[1]) for r in it if r[1] is not None]
        if rows:
            blob = build_warc(rows, date=date, compress=True)
            path = os.path.join(output_dir, f"part-{pid:05d}.warc.gz")
            # write-temp + atomic rename: a speculative or retried task
            # attempt racing the original on the shared mount must not
            # interleave writes into one corrupt gzip stream (the
            # parquet sink gets this from Hadoop's commit protocol;
            # racers here converge on one complete shard)
            fd, tmp = tempfile.mkstemp(dir=output_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        yield len(rows)

    return sum(sel.rdd.mapPartitionsWithIndex(archive).collect())
