"""Streaming windowed aggregation + watermark (SURVEY.md §2.1
streaming-only row): tumbling windows emit exactly-once per window in
append mode once the watermark passes."""

from __future__ import annotations

from datetime import datetime

from timeseries_data_provider_spark.streaming.ingest import METRICS_SCHEMA
from timeseries_data_provider_spark.streaming.window_agg import (
    ensure_metrics_table,
    windowed_rollup_stream,
)


def test_ensure_metrics_table(spark, tmp_path):
    path = str(tmp_path / "m")
    ensure_metrics_table(spark, path)
    df = spark.read.schema(METRICS_SCHEMA).parquet(path)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["name", "time", "value"]


def test_windowed_rollup_stream(spark, tmp_path):
    path = str(tmp_path / "metrics")
    rows = [
        ("cpu", datetime(2024, 1, 1, 0, 0, 10), 1.0),
        ("cpu", datetime(2024, 1, 1, 0, 0, 50), 3.0),
        ("cpu", datetime(2024, 1, 1, 0, 1, 10), 10.0),
        # an event 30 min later advances the watermark far enough to
        # close and emit the earlier windows
        ("cpu", datetime(2024, 1, 1, 0, 30, 0), 99.0),
    ]
    spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).partitionBy("name").parquet(path)

    out = windowed_rollup_stream(
        spark, path, window="1 minute", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["w_start"].minute, r["name"]): (r["n"], r["avg_v"], r["min_v"], r["max_v"])
        for r in spark.sql("SELECT * FROM winagg").collect()
    }
    # windows 00:00 and 00:01 are emitted (watermark passed); the 00:30
    # window stays open in state
    assert got[(0, "cpu")] == (2, 2.0, 1.0, 3.0)
    assert got[(1, "cpu")] == (1, 10.0, 10.0, 10.0)
    assert (30, "cpu") not in got
    q.stop()
