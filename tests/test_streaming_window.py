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


def test_sliding_and_session_windows(spark, tmp_path):
    path = str(tmp_path / "m2")
    rows = [
        ("cpu", datetime(2024, 1, 1, 0, 0, 30), 2.0),
        ("cpu", datetime(2024, 1, 1, 0, 1, 30), 4.0),
        ("cpu", datetime(2024, 1, 1, 0, 30, 0), 99.0),  # watermark push
    ]
    spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).partitionBy("name").parquet(path)

    def run(name, **kw):
        out = windowed_rollup_stream(spark, path, watermark="5 minutes", **kw)
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return spark.sql(f"SELECT * FROM {name}").collect()

    # sliding: 2-minute window sliding by 1 minute — the :30s point
    # lands in two windows (23:59-00:01 and 00:00-00:02)
    sliding = run("sl", window="2 minutes", slide="1 minute")
    covering = [r for r in sliding if any(
        r["w_start"].minute == m and r["n"] >= 1 for m in (59, 0, 1))]
    point1_windows = [
        r for r in sliding if r["w_start"].hour == 0 and r["w_start"].minute in (59, 0)
        and r["w_end"].minute in (1, 2) and r["n"] >= 1
    ]
    assert len([r for r in sliding if r["n"] == 2]) >= 1  # overlap window holds both points

    # session windows: gap 2 minutes → the :30s and 1:30s points merge
    # into ONE session; the 0:30:00 point is its own (still-open) session
    sessions = run("se", session_gap="2 minutes")
    assert len(sessions) == 1
    s = sessions[0]
    assert s["n"] == 2 and s["min_v"] == 2.0 and s["max_v"] == 4.0


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


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    from timeseries_data_provider_spark.streaming.window_agg import dedup_stream

    path = str(tmp_path / "m3")
    t0 = datetime(2024, 1, 1, 0, 0, 10)
    rows = [
        ("cpu", t0, 1.0),
        ("cpu", t0, 1.0),  # exact re-delivery -> dropped
        ("cpu", datetime(2024, 1, 1, 0, 0, 50), 3.0),
        ("mem", t0, 7.0),  # same time, different series -> kept
    ]
    spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).partitionBy("name").parquet(path)

    out = dedup_stream(spark, path, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedupstream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = sorted(
        (r["name"], r["time"], r["value"])
        for r in spark.sql("SELECT * FROM dedupstream").collect()
    )
    assert got == sorted(
        [("cpu", t0, 1.0), ("cpu", datetime(2024, 1, 1, 0, 0, 50), 3.0), ("mem", t0, 7.0)]
    )
    q.stop()
