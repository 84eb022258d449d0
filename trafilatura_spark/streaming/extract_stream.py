"""Structured Streaming extraction.

The north rule is a batch job, but the reference ships crawling/feed
components (SURVEY.md §2.12) whose Spark-native analog is a stream:
documents arrive continuously (crawler output landing as files / Kafka),
the SAME mapInPandas extraction operator runs on each micro-batch, and
the sink is an append-only span table with exactly-once file-sink
semantics via the checkpoint location.

The extraction operator is stateless per document, so it composes with
readStream unchanged — watermarks/stateful ops are only needed for
cross-document operators (e.g. windowed dedup), which stay downstream
batch jobs over the output table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.pipeline import EXTRACTED_SCHEMA, make_extract_batches
from ..settings import Options
from ..sources.corpus import DOCUMENTS_SCHEMA


def read_documents_stream(spark: SparkSession, input_path: str,
                          max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream of documents(doc_id, spans) parquet drops."""
    return (
        spark.readStream
        .schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def extract_stream(documents: DataFrame,
                   options: Options | None = None) -> DataFrame:
    """Streaming extraction: identical operator, streaming plan."""
    options = options or Options()
    return documents.mapInPandas(make_extract_batches(options),
                                 EXTRACTED_SCHEMA)


def start_extraction_stream(spark: SparkSession, input_path: str,
                            output_path: str, checkpoint_path: str,
                            options: Options | None = None,
                            available_now: bool = False):
    """Wire source → extract → parquet sink.  ``available_now=True``
    drains the current backlog and stops (batch-on-stream semantics —
    also how tests drive it)."""
    stream = extract_stream(read_documents_stream(spark, input_path), options)
    writer = (
        stream.writeStream
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
