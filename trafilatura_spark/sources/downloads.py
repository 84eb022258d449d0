"""HTTP fetching with a pluggable transport.

Re-expression of /root/reference/lib/src/downloads.dart: Response record
(28-78), request dispatch with UA/cookie config and size gates (110-165),
retry-status list (23-26), suitability check (168-178), fetchUrl /
fetchResponse (191-247), isLivePage (249).

Networking is deliberately injected: ``transport(method, url, headers,
timeout) -> (status, headers, bytes)``.  The default transport uses the
stdlib ``urllib`` (no third-party deps); tests and offline environments
inject fakes.  The batch north rule never fetches (input is a table); the
Spark form :func:`fetch_binary_documents` exists for streaming-ingest
pipelines and partitions by host for politeness.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from .loading import decode_file

USER_AGENT = "trafilatura-spark/0.1 (+batch extraction engine)"
DEFAULT_HEADERS = {"User-Agent": USER_AGENT}

# downloads.dart:23-26 forceStatus
RETRY_STATUSES = frozenset(
    [429, 499, 500, 502, 503, 504, 509, 520, 521, 522, 523, 524, 525, 526,
     527, 530, 598])

MAX_FILE_SIZE = 20_000_000
MIN_FILE_SIZE = 200


@dataclass
class Response:
    """downloads.dart:28-78."""

    data: bytes | None
    status: int
    url: str
    headers: dict = field(default_factory=dict)
    html: str | None = None

    @property
    def has_data(self) -> bool:
        return bool(self.data)

    def decode_data(self, decode: bool) -> None:
        if decode and self.data is not None:
            self.html = decode_file(self.data)

    def as_dict(self) -> dict:
        return {"data": self.data, "status": self.status, "url": self.url,
                "headers": self.headers, "html": self.html}


def default_transport(method: str, url: str, headers: dict,
                      timeout: int, max_bytes: int = MAX_FILE_SIZE + 1):
    """stdlib urllib transport; returns (status, headers, bytes).
    ``max_bytes`` bounds the read (one byte past the configured cap so the
    caller's size gate can DETECT oversize instead of silently truncating
    when config raises MAX_FILE_SIZE)."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers, method=method)
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        body = b"" if method == "HEAD" else resp.read(max_bytes)
        return resp.status, dict(resp.headers), body


def _send_request(url: str, transport, config: dict | None,
                  with_headers: bool = False) -> Response | None:
    """downloads.dart:110-165: UA/cookie headers, timeout, size gates;
    any failure → None (never raises)."""
    config = config or {}
    headers = dict(DEFAULT_HEADERS)
    if config.get("USER_AGENTS"):
        headers["User-Agent"] = config["USER_AGENTS"][0]
    if config.get("COOKIE"):
        headers["Cookie"] = config["COOKIE"]
    timeout = int(config.get("DOWNLOAD_TIMEOUT", 30))
    max_size = int(config.get("MAX_FILE_SIZE", MAX_FILE_SIZE))
    try:
        try:
            status, resp_headers, body = transport("GET", url, headers,
                                                   timeout, max_size + 1)
        except TypeError:
            # legacy 4-arg transports (pluggable test doubles)
            status, resp_headers, body = transport("GET", url, headers,
                                                   timeout)
        if body is not None and len(body) > max_size:
            return None
        resp = Response(bytes(body) if body is not None else None, int(status),
                        url)
        if with_headers:
            resp.headers = dict(resp_headers or {})
        return resp
    except Exception:
        return None


def _is_suitable_response(response: Response, config: dict | None) -> bool:
    """downloads.dart:168-178: status 200 + acceptable length."""
    config = config or {}
    if response.status != 200:
        return False
    n = len(response.html or (response.data or b""))
    lo = int(config.get("MIN_FILE_SIZE", MIN_FILE_SIZE))
    hi = int(config.get("MAX_FILE_SIZE", MAX_FILE_SIZE))
    return lo <= n <= hi


def fetch_response(url: str, decode: bool = False, with_headers: bool = False,
                   config: dict | None = None,
                   transport=default_transport) -> Response | None:
    """downloads.dart:228-247."""
    response = _send_request(url, transport, config, with_headers)
    if response is None:
        return None
    response.decode_data(decode)
    return response


def fetch_url(url: str, config: dict | None = None,
              transport=default_transport, max_retries: int = 2,
              retry_sleep: float = 0.0) -> str | None:
    """downloads.dart:191-224 with the forceStatus retry list."""
    for attempt in range(max_retries + 1):
        response = fetch_response(url, decode=True, config=config,
                                  transport=transport)
        if response is None:
            return None
        if response.status in RETRY_STATUSES and attempt < max_retries:
            if retry_sleep:
                time.sleep(retry_sleep)
            continue
        if response.has_data and _is_suitable_response(response, config):
            return response.html
        return None
    return None


def is_live_page(url: str, transport=default_transport) -> bool:
    """HEAD probe (downloads.dart:249)."""
    try:
        status, _, _ = transport("HEAD", url, dict(DEFAULT_HEADERS), 10)
        return int(status) < 400
    except Exception:
        return False


# -- Spark form ---------------------------------------------------------------

def fetch_binary_documents(urls_df, url_col: str = "url",
                           transport=default_transport,
                           config: dict | None = None,
                           partitions: int | None = None):
    """(url) → (url, status, content) via an Arrow-batched stage.

    When politeness is on (config SLEEP_TIME > 0) or the caller sizes
    ``partitions``, the input is repartitioned by host so each task owns
    its hosts and a per-host interval limiter serializes their requests
    (politeness analog of the reference's per-domain round-robin,
    cli_utils.dart:379-406); otherwise the stage stays shuffle-free."""
    from pyspark.sql import functions as F, types as T

    schema = T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
    ])

    # politeness: the reference sleeps between consecutive fetches of one
    # domain (cli_utils.dart:379-406 rate limiting).  That only holds if
    # (a) every URL of a host lands in ONE task — so politeness forces
    # the host repartition even when the caller didn't size it — and
    # (b) the in-task limiter tracks per-host last-request TIMES (hash
    # partitioning interleaves hosts within a task, so a same-host-as-
    # previous-row check never fires on [a,b,a,b] sequences)
    sleep_time = float((config or {}).get("SLEEP_TIME", 0))

    df = urls_df
    if partitions:
        df = df.repartition(partitions,
                            F.parse_url(F.col(url_col), F.lit("HOST")))
    elif sleep_time > 0:
        df = df.repartition(F.parse_url(F.col(url_col), F.lit("HOST")))

    def batches(it):
        import time as _time
        from urllib.parse import urlparse

        import pandas as pd
        last_req: dict = {}      # host -> monotonic time of last request
        for pdf in it:
            rows = []
            for url in pdf[url_col]:
                if sleep_time > 0:
                    host = urlparse(url).netloc
                    prev = last_req.get(host)
                    now = _time.monotonic()
                    if prev is not None and now - prev < sleep_time:
                        _time.sleep(sleep_time - (now - prev))
                    last_req[host] = _time.monotonic()
                resp = _send_request(url, transport, config)
                if resp is None:
                    rows.append((url, None, None))
                else:
                    rows.append((url, resp.status, resp.data))
            yield pd.DataFrame(rows, columns=["url", "status", "content"])

    return df.select(F.col(url_col).alias("url")).mapInPandas(batches, schema)
