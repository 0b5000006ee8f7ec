"""Structured Streaming ingest: incremental index maintenance + windowed
event analytics.

The reference is pure batch (SURVEY.md §2.10), so streaming here serves
the engine's own operational needs: new web pages arrive continuously and
the index must absorb them without a full rebuild.

- ``stream_doc_terms``: readStream over a documents directory ->
  tokenize -> explode -> per-micro-batch (doc_id, term, tf) deltas,
  appended via foreachBatch into a staging postings-delta table that
  ``index_build.compact_index`` merges into the main index (the SPIMI
  byte-concat merge reused verbatim — deltas are just more runs; global
  stats frozen Lucene-segment-style until a full rebuild, see its
  docstring; tested in test_index_bm25.py::test_compact_index).
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


def stream_append_runs_index(spark: SparkSession, input_dir: str,
                             index_path: str, checkpoint_dir: str,
                             mode: str = "simple", num_shards: int | None = None,
                             avgdl: float | None = None,
                             schema: str = DOCS_STREAM_SCHEMA):
    """File-source stream -> merge-free ATOMIC appends straight into a
    written runs index (no delta-table hop, no compaction needed to
    query): each micro-batch runs index_build.append_runs_index with a
    lineage-keyed batch id ``stream-<id>``.

    Exactly-once END TO END: the checkpointed file source re-delivers a
    micro-batch after a crash/restart with the SAME batch id, and the
    append layer makes the replay safe in every crash position — batch
    fully committed -> no-op (lineage says so); batch partially
    committed -> staged bytes resume to the identical index; batch never
    staged -> a normal append. Impacts bake the index's FROZEN bake
    avgdl (index_meta.json via bake_stats — NOT the live doc_stats
    value, which moves with every appended batch and would bake each
    micro-batch's block maxes at a different scale than queries decode
    at; frozen Lucene-segment contract; periodic stats refresh =
    rebuild, as everywhere)."""
    if avgdl is None:
        _, avgdl = ib.bake_stats(spark, index_path)
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ib.append_runs_index(
            spark, index_path, batch_df, avgdl, mode=mode,
            num_shards=num_shards, batch_id=f"stream-{batch_id}",
        )

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_append_positional_runs_index(spark: SparkSession,
                                        input_dir: str, index_path: str,
                                        checkpoint_dir: str,
                                        mode: str = "simple",
                                        num_shards: int | None = None,
                                        schema: str = DOCS_STREAM_SCHEMA):
    """Positional twin of stream_append_runs_index: each micro-batch
    runs index_build.append_positional_runs_index with the lineage-keyed
    batch id ``stream-<id>`` — exactly-once end to end by the same
    argument (fully committed replay -> lineage no-op; partial -> staged
    bytes resume; never staged -> normal append). No stats caveat at all:
    positions are doc-local, so streamed phrase hits are identical to a
    from-scratch build's. The index must carry the ``docs`` sidecar
    (write_positional_runs_index(..., docs=...)) — disjointness is
    enforced per micro-batch like everywhere else."""
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ib.append_positional_runs_index(
            spark, index_path, batch_df, mode=mode,
            num_shards=num_shards, batch_id=f"stream-{batch_id}",
        )

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EMB_STREAM_SCHEMA = "vec_id long, embedding array<float>"


def stream_append_ann_index(spark: SparkSession, input_dir: str,
                            index_path: str, checkpoint_dir: str,
                            schema: str = EMB_STREAM_SCHEMA):
    """ANN twin: each micro-batch of vectors runs
    similarity.append_ann_index under the frozen-quantizer contract (new
    vectors assigned to the EXISTING centroids and encoded with the
    EXISTING codebooks — content-identical to a re-encode, recall drift
    under distribution shift is the recluster/rebuild event, see
    append_ann_index's drift guard). Exactly-once via the same
    lineage-keyed ``stream-<id>`` batch ids; per-cell (vectors, codes)
    unit pairs commit atomically, and the ANN readers refuse torn
    in-flight state, so a crashed micro-batch is repaired on the next
    trigger before anything is served."""
    from cer_for_mti_spark.operators import similarity

    emb = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        similarity.append_ann_index(
            spark, index_path, batch_df,
            batch_id=f"stream-{batch_id}",
        )

    return (
        emb.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
_SESSION_STATE_SCHEMA = "start long, end long, n long, total double"


def sessionize_stream(events_stream: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "30 minutes") -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session windows with an inactivity gap. A session closes when
    the event-time gap exceeds `gap_seconds` (emitted on the next batch
    that proves the gap) or when the state times out past the watermark.

    This is the engine's demonstration of arbitrary stateful processing —
    the shape the reference's doc-boundary key-change scan (SURVEY.md W4)
    would take if its input were unbounded. State per key is O(1) (the
    open session's aggregates), so 10^9 users shard across executors by
    the groupBy key with no skew beyond the user-activity distribution."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        user_id = key[0]
        if state.hasTimedOut:
            start, end, n, total = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(end, unit="s")],
                "n_events": [n], "total_value": [total],
            })
            return
        rows = []
        ts_all, val_all = [], []
        for pdf in pdfs:
            ts_all.extend(int(t.timestamp()) for t in pdf["ts"])
            val_all.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts_all)), key=lambda i: ts_all[i])
        cur = list(state.get) if state.exists else None
        early = None  # open session strictly BEFORE the carried state's
        for i in order:
            t, v = ts_all[i], val_all[i]
            if cur is not None and t < cur[0]:
                # cross-batch late event older than the open session:
                # within gap of its start -> extend the session backwards;
                # a full gap before it -> it belongs to an earlier session
                if cur[0] - t <= gap_seconds:
                    cur[0] = t
                else:
                    if early is None:
                        early = [t, t, 0, 0.0]
                    elif t - early[1] > gap_seconds:
                        rows.append(early)
                        early = [t, t, 0, 0.0]
                    early[1] = max(early[1], t)
                    early[2] += 1
                    early[3] += v
                    continue
            elif cur is None:
                cur = [t, t, 0, 0.0]
            elif t - cur[1] > gap_seconds:
                rows.append(cur)
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += v
        if early is not None:
            # events are sorted, so early ends before cur starts; merge if
            # the late batch closed the gap, else emit it as its own session
            if cur is not None and cur[0] - early[1] <= gap_seconds:
                cur[0] = early[0]
                cur[2] += early[2]
                cur[3] += early[3]
            else:
                rows.append(early)
        if cur is not None:
            state.update(tuple(cur))
            state.setTimeoutTimestamp(cur[1] * 1000 + gap_seconds * 1000)
        if rows:
            yield pd.DataFrame({
                "user_id": [user_id] * len(rows),
                "session_start": [pd.Timestamp(r[0], unit="s") for r in rows],
                "session_end": [pd.Timestamp(r[1], unit="s") for r in rows],
                "n_events": [r[2] for r in rows],
                "total_value": [r[3] for r in rows],
            })

    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, SESSION_SCHEMA, _SESSION_STATE_SCHEMA,
            "append", GroupStateTimeout.EventTimeTimeout,
        )
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
