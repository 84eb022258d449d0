"""Structured Streaming corpus dedup against a persistent store.

The continuous-ingestion shape end-to-end: document drops land as
files, each micro-batch is deduplicated AGAINST the signature store
(only the batch pays signature cost —
:func:`functions.dedup.dedup_corpus_incremental`), survivors append to
the output table and to the store so the NEXT micro-batch sees them.
Cross-batch state lives in the store parquet, not in Spark streaming
state — the same store a batch `job.py --mode dedup --signature-store`
run maintains, so batch and streaming ingestion interleave freely.

Delivery semantics (foreachBatch is at-least-once): the output table
is written BEFORE the store append, and a replayed micro-batch first
drops ids already present in the store.  Crash windows therefore leave
the STORE consistent (ids are appended exactly once) while the OUTPUT
may carry duplicate rows for the replayed batch — downstream readers
that care should dedup by id, or read the store's docs/ table, which
is exactly-once at id level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEDUP_STREAM_SCHEMA = "doc_id long, text string"


def read_text_stream(spark: SparkSession, input_path: str,
                     schema: str = DEDUP_STREAM_SCHEMA,
                     max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of (doc_id, text) parquet drops."""
    return (
        spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def make_dedup_batch_fn(output_path: str, store_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.5,
                        max_bucket_size: int | None = None):
    """foreachBatch callback: dedup the micro-batch vs the store,
    append survivors to ``output_path`` and to the store."""
    from ..functions.dedup import (dedup_corpus, dedup_corpus_incremental,
                                   minhash_signatures)
    docs_path = os.path.join(store_dir, "docs")
    sigs_path = os.path.join(store_dir, "sigs")

    def _process(batch: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException
        spark = batch.sparkSession
        try:
            store_docs = spark.read.parquet(docs_path)
        except AnalysisException:
            # PATH_NOT_FOUND only: the first batch bootstraps the store.
            # Any OTHER read failure (corrupt footer, permissions) must
            # propagate — bootstrapping over a store that EXISTS but
            # failed to read would silently re-admit every duplicate
            # and append colliding ids
            store_docs = None
        if store_docs is not None:
            # replay safety: a re-delivered micro-batch finds its ids
            # already appended — drop them instead of double-counting
            batch = batch.join(
                store_docs.select(id_col), id_col, "left_anti")
            store_sigs = spark.read.parquet(sigs_path)
            accepted, labels, _ = dedup_corpus_incremental(
                batch, store_docs, store_sigs, id_col=id_col,
                text_col=text_col, threshold=threshold,
                max_bucket_size=max_bucket_size)
        else:
            accepted, labels = dedup_corpus(
                batch, id_col=id_col, text_col=text_col,
                strategy="minhash", threshold=threshold,
                max_bucket_size=max_bucket_size)
        # three consumers (output, store docs, store sigs).  persist()
        # is NOT enough here: the docs append fires refreshByPath on
        # docs_path, which invalidates any cached plan that reads it —
        # accepted's lineage does (the replay anti-join) — so the sigs
        # write would recompute against a docs listing that already
        # contains this batch and anti-join its own rows away.
        # localCheckpoint truncates the lineage to a leaf, immune to
        # the refresh, and runs the pair pipeline exactly once.
        accepted = accepted.localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(output_path)
        accepted.write.mode("append").parquet(docs_path)
        sig_source = accepted.filter(F.col(text_col).isNotNull()
                                     & (F.length(text_col) > 0))
        minhash_signatures(sig_source, id_col, text_col) \
            .write.mode("append").parquet(sigs_path)
        labels.unpersist()

    return _process


def start_dedup_stream(spark: SparkSession, input_path: str,
                       output_path: str, checkpoint_path: str,
                       store_dir: str, id_col: str = "doc_id",
                       text_col: str = "text",
                       schema: str = DEDUP_STREAM_SCHEMA,
                       threshold: float = 0.5,
                       max_bucket_size: int | None = None,
                       max_files_per_trigger: int = 8,
                       available_now: bool = False):
    """Wire source → foreachBatch dedup-vs-store → output + store.
    ``available_now=True`` drains the backlog and stops (how tests and
    catch-up runs drive it)."""
    stream = read_text_stream(spark, input_path, schema,
                              max_files_per_trigger)
    writer = (
        stream.writeStream
        .foreachBatch(make_dedup_batch_fn(output_path, store_dir,
                                          id_col, text_col, threshold,
                                          max_bucket_size))
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
