"""Binary → text document loading: decompression + encoding detection.

Re-expression of /root/reference/lib/src/utils.dart:62-162
(handleCompressedFile / isUtf8 / detectEncoding / decodeFile) for both
single documents and Spark binary columns.  At corpus scale the decode
runs as one Arrow-batched stage in front of extraction (raw crawl bytes
→ str), keeping the whole ingest path in the same narrow map.
"""

from __future__ import annotations

import pandas as pd

import gzip
import zlib

from pyspark.sql import DataFrame, functions as F, types as T

GZIP_MAGIC = b"\x1f\x8b"
ZLIB_MAGICS = (b"\x78\x01", b"\x78\x5e", b"\x78\x9c", b"\x78\xda")


def handle_compressed_file(data: bytes) -> bytes:
    """Magic-number sniff + decompress; returns input on any failure
    (utils.dart:62-92)."""
    try:
        if data[:2] == GZIP_MAGIC:
            return gzip.decompress(data)
        if data[:2] in ZLIB_MAGICS:
            return zlib.decompress(data)
    except Exception:
        pass
    return data


def is_utf8(data: bytes) -> bool:
    """utils.dart:95-102."""
    try:
        data.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


def detect_encoding(data: bytes) -> list[str]:
    """UTF-8 first, Latin-1 fallback (utils.dart:105-123; the Dart port
    has no chardet either)."""
    guesses = []
    if is_utf8(data):
        guesses.append("utf-8")
    guesses.append("latin-1")
    return guesses


def decode_file(data: bytes) -> str:
    """Bytes → str with decompression, encoding cascade and
    malformed-char replacement (utils.dart:128-162)."""
    data = handle_compressed_file(data)
    for enc in detect_encoding(data):
        try:
            return data.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return data.decode("utf-8", errors="replace")


def decode_binary_documents(df: DataFrame, content_col: str = "content",
                            out_col: str = "html") -> DataFrame:
    """Spark stage: binary column → decoded text column (Arrow-batched)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def dec(col: pd.Series) -> pd.Series:
        return col.map(lambda b: decode_file(bytes(b)) if b is not None else None)

    return df.withColumn(out_col, dec(content_col))
