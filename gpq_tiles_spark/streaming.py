"""Incremental / streaming ingest.

The reference has NO unbounded-streaming semantics — its "streaming" is
bounded-memory batch (SURVEY.md §2.8, reference ADR-001). The engine
therefore offers two incremental idioms:

* ``incremental_extract`` — Structured Streaming over a document directory
  with ``Trigger.AvailableNow``: each run drains exactly the files not yet
  seen (checkpointed by the stream itself), extracts features, and appends
  to a staging parquet. Combined with ``checkpoint.convert_with_checkpoints``
  this gives snapshot-to-snapshot incremental tiling.
* ``windowed_event_counts`` — a genuine Structured Streaming aggregation
  (event-time window + watermark) over an events stream, demonstrating the
  engine's late-data handling for live telemetry use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import FEATURES_SCHEMA, _extract_batches


def incremental_extract(spark: SparkSession, docs_dir: str, staging_dir: str,
                        checkpoint_dir: str, doc_schema=None) -> None:
    """Drain new document files -> append extracted features to staging.

    Runs as Trigger.AvailableNow: returns when the current snapshot of the
    directory is fully processed; re-running processes only new files.
    """
    if doc_schema is None:
        doc_schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(doc_schema)
        .parquet(docs_dir)
        .select("doc_id", "spans")
        .mapInPandas(_extract_batches, schema=FEATURES_SCHEMA)
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes") -> DataFrame:
    """Event-time windowed counts with late-data watermark (works on a
    streaming OR batch events DataFrame with (ts, event_type))."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
