"""Stateful streaming operators: windowed metrics + crawl-frontier state.

Completes the streaming story (SURVEY.md §2.12):

- :func:`windowed_extraction_metrics` — event-time windowed quality
  metrics over the extraction stream with a watermark for late data
  (plain watermark + window aggregation, fully JVM-side).
- :func:`dedup_urls_stateful` — the reference's ``UrlStore`` known-set
  (cli_utils.dart:43-114) as an ``applyInPandasWithState`` operator:
  per-host state carries the seen-URL set and a politeness quota; late
  arrivals of already-seen URLs are dropped exactly-once per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

URL_EVENT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("event_time", T.TimestampType(), False),
])

FRONTIER_OUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("accepted", T.BooleanType(), False),
])

FRONTIER_STATE_SCHEMA = T.StructType([
    T.StructField("seen", T.ArrayType(T.StringType()), True),
    T.StructField("emitted", T.IntegerType(), True),
])


def windowed_extraction_metrics(extracted_stream: DataFrame,
                                time_col: str = "event_time",
                                window: str = "1 minute",
                                watermark: str = "2 minutes") -> DataFrame:
    """Per-window docs / fallback-rate / empty-rate with late-data bound."""
    return (
        extracted_stream
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"))
        .agg(F.count("*").alias("docs"),
             F.sum(F.when(F.col("tier").isin("baseline", "readability",
                                             "justext"), 1).otherwise(0)
                   ).alias("fallback_docs"),
             F.sum(F.when(F.col("status") == "empty", 1).otherwise(0)
                   ).alias("empty_docs"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "docs",
                (F.col("fallback_docs") / F.col("docs")).alias("fallback_rate"),
                (F.col("empty_docs") / F.col("docs")).alias("empty_rate"))
    )


def _frontier_fn(key, pdf_iter, state):
    """Per-host frontier state: seen-URL set + emitted-count quota."""
    import pandas as pd

    quota = 100
    if state.exists:
        seen_list, emitted = state.get
        seen = set(seen_list or [])
    else:
        seen, emitted = set(), 0
    rows = []
    for pdf in pdf_iter:
        for url in pdf["url"]:
            if url in seen or emitted >= quota:
                rows.append((key[0], url, False))
            else:
                seen.add(url)
                emitted += 1
                rows.append((key[0], url, True))
    state.update((sorted(seen), emitted))
    yield pd.DataFrame(rows, columns=["host", "url", "accepted"])


def dedup_urls_stateful(url_stream: DataFrame) -> DataFrame:
    """UrlStore analog over a stream of (host, url, event_time)."""
    return (
        url_stream
        .groupBy("host")
        .applyInPandasWithState(
            _frontier_fn,
            outputStructType=FRONTIER_OUT_SCHEMA,
            stateStructType=FRONTIER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
