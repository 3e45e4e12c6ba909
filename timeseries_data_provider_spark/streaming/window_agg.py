"""Streaming windowed aggregation with watermarking.

The reference has no aggregation at all and its ingest-time stamping
makes late data impossible (SURVEY.md §2.1 "late data: N/A BY
CONSTRUCTION"). The moment the engine ingests *event*-timestamped data
(any real deployment), it needs exactly this: tumbling-window rollups
with a watermark bounding state. This is the canonical Structured
Streaming pattern — incremental, state-bounded, scales with
(series x open windows), not with data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_runtime_confs
from .ingest import METRICS_SCHEMA


def windowed_rollup_stream(
    spark: SparkSession,
    table_path: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    slide: str | None = None,
    session_gap: str | None = None,
) -> DataFrame:
    """Streaming windowed avg/min/max/count per series over the metrics
    table, tolerating up to ``watermark`` of event-time lateness.

    Window shape: tumbling by default; pass ``slide`` for sliding
    (overlapping) windows, or ``session_gap`` for data-driven session
    windows (window closes after a gap of inactivity). Returns an
    unstarted streaming DataFrame; attach a sink with ``writeStream``
    (append mode emits a window once the watermark passes its end).
    """
    ensure_runtime_confs(spark)  # the NTZ->timestamp cast needs UTC
    stream = spark.readStream.schema(METRICS_SCHEMA).parquet(table_path)
    if session_gap is not None:
        win = F.session_window("time", session_gap)
    elif slide is not None:
        win = F.window("time", window, slide)
    else:
        win = F.window("time", window)
    return (
        stream
        # watermark needs an instant-typed column; the UTC session tz
        # this cast depends on is ENFORCED below via
        # ensure_runtime_confs, not assumed (review finding: a
        # non-UTC session would reinterpret the NTZ stamps and merge
        # DST-fold windows)
        .withColumn("time", F.col("time").cast("timestamp"))
        .withWatermark("time", watermark)
        .groupBy(win.alias("w"), "name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("avg_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "name",
            "n",
            "avg_v",
            "min_v",
            "max_v",
        )
    )


def dedup_stream(
    spark: SparkSession,
    table_path: str,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming deduplication: drop re-deliveries of the same
    ``keys`` tuple arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark``). This is the streaming
    counterpart of the batch dedup family (operators/dedup.py) and the
    standard at-least-once → effectively-once repair for an ingest bus
    that may re-deliver samples.

    State is bounded: one entry per distinct key seen in the last
    ``watermark`` of event time — independent of total stream length,
    which is what makes it safe on an unbounded 100 TB/day feed
    (a plain dropDuplicates on a stream would grow state forever).
    """
    ensure_runtime_confs(spark)  # the NTZ->timestamp cast needs UTC
    stream = spark.readStream.schema(METRICS_SCHEMA).parquet(table_path)
    return (
        stream.withColumn("time", F.col("time").cast("timestamp"))
        .withWatermark("time", watermark)
        .dropDuplicatesWithinWatermark(keys or ["name", "time"])
    )


def ensure_metrics_table(spark: SparkSession, table_path: str) -> None:
    """Schema DDL analog (reference index.js:39-45 createDatabase +
    :194-204 addSchema): declare the metrics table upfront by writing an
    empty partitioned parquet skeleton if the path does not exist."""
    import os

    if os.path.isdir(table_path):
        return
    empty = spark.createDataFrame([], METRICS_SCHEMA)
    empty.write.mode("ignore").partitionBy("name").parquet(table_path)
