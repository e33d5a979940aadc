"""Structured Streaming operators (SURVEY.md §2.9).

The reference is strictly batch (luigi DAG over files `[U]`); its
temporal analytics translate 1:1 to event-time streaming. Every
transformation here is **engine-agnostic**: it takes a DataFrame that
may come from `spark.read` or `spark.readStream` and returns the
transformed frame — the same code path is exercised in batch by the
catalog queries (operators/relational.py stream_* keys) and under a
real `readStream` + `trigger(availableNow)` in
tests/test_streaming.py.

Watermarks bound state: an aggregation over a 10^12-row unbounded
crawl stream only works if late data has a horizon; `withWatermark`
plus append output is what lets the state store evict closed windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, src_dir: str, max_files: int = 1) -> DataFrame:
    """File-source stream of events-shaped parquet: the local stand-in
    for a Kafka/Kinesis crawl feed; `maxFilesPerTrigger` forces
    multi-batch incremental execution."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_dir)
    )


def tumbling_daily(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Per-day tumbling counts with late-data watermark (A5's streaming
    twin). Append-mode-compatible: emits a window only once closed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("day"), "user_id", "n_events")
    )


def sliding_counts(
    events: DataFrame, size: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window activity smoothing."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", size, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (changeset-reconstruction analog
    `[U: chronology]`): events within ``gap`` of each other fuse into
    one session row."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (SURVEY.md §2.9 'applyInPandasWithState
    for custom stateful operators'): per-user running event count and
    value total maintained in the state store across micro-batches.
    Emits the updated running totals for every user seen in a batch —
    the arbitrary-state shape that windows/sessions can't express
    (cross-batch monotone accumulators, custom eviction policies)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd  # noqa: PLC0415 (worker-side import)

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful re-crawl dedup: first event per event_id wins, state
    bounded by the watermark (`dropDuplicatesWithinWatermark` — the
    url-re-crawl dedup analog for the pages stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
