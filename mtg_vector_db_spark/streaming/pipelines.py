"""Streaming forms of the engine's pipelines.

The reference is entirely batch (SURVEY.md §2.10); these are the clearly
flagged extensions that let the same logical plans run incrementally:

* :func:`streaming_ingest` — the ingestion DAG as readStream+foreachBatch:
  each micro-batch runs the batch dedup/embed pipeline against the current
  sink state (the standard idempotent-upsert pattern).
* :func:`hourly_event_counts` — watermarked tumbling-window aggregation
  over an event stream; the batch query r08_events_hourly is its exact
  batch equivalent (same window spec), which is how we test it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import DataStreamWriter


def hourly_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling 1-hour event-time windows with late-data watermark.
    Works on both streaming and batch frames (same plan, two runners)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per key (``session_window`` — dynamic
    windows that close after ``gap`` of inactivity). Batch and streaming
    share the plan; streaming adds the watermark so state for closed
    sessions is dropped. Session bounds come back as epoch-micros longs
    (exact integers — stable for cross-engine comparison)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


def streaming_ingest(
    spark: SparkSession,
    source_dir: str,
    docs_path: str,
    rejected_path: str,
    schema: str,
    checkpoint: str,
) -> DataStreamWriter:
    """Incremental ingestion: watch ``source_dir`` for JSON batches, run
    the batch dedup against the sink's current state per micro-batch, and
    append. Start with ``.trigger(availableNow=True)`` for catch-up runs."""
    from mtg_vector_db_spark.operators.ingest import dedup_against

    stream = spark.readStream.schema(schema).json(source_dir)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        try:
            existing = s.read.parquet(docs_path)
        except Exception:
            existing = None
        new_rows, rejected = dedup_against(batch_df, existing, key="card_name")
        new_rows.write.mode("append").parquet(docs_path)
        if rejected.limit(1).count() > 0:
            rejected.withColumn("reject_reason", F.lit("duplicate")).write.mode(
                "append"
            ).parquet(rejected_path)

    return (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
    )


def running_user_totals(
    events: DataFrame,
    timeout_minutes: int = 60,
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (event_count, value_total) emitted on every
    micro-batch, with state evicted after ``timeout_minutes`` of processing
    -time inactivity — the pattern for stateful logic session_window/window
    can't express (counters, custom sessionization, CDC-style merge).

    On a batch DataFrame this falls back to a plain groupBy aggregation
    with identical output (the testable equivalence).
    """
    if not events.isStreaming:
        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
