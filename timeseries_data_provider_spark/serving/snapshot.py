"""JSON snapshot sink for serving (the north-star "Structured Streaming
+ JSON sink" pattern): materialize per-series recent points and latest
values as JSON so a point-lookup serving tier never touches Spark.

At scale this runs as a ``foreachBatch`` step of the ingest stream; the
snapshot is bounded (last N points per series), so writing it is O(|series| x N)
regardless of table size — the heavy lifting (top-N per series) is the
rank-filter window pattern, shuffled once on the series key.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recent_points(metrics: DataFrame, n: int = 100) -> DataFrame:
    """Last ``n`` points per series (rank-filter — no global sort).
    Ties on time break on value (review finding: time-only ordering
    made the rank-N boundary nondeterministic across executions —
    remaining ties are full-duplicate rows, interchangeable by
    construction), so identical data always publishes the identical
    snapshot."""
    w = Window.partitionBy("name").orderBy(
        F.col("time").desc(), F.col("value").desc()
    )
    return (
        metrics.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select(
            "name",
            F.unix_millis(F.col("time").cast("timestamp")).alias("ms"),
            "value",
        )
    )


def write_json_snapshot(
    metrics: DataFrame, out_dir: str, n: int = 100
) -> None:
    """Write the snapshot as one JSON-lines directory per series
    (partitioned write; each partition dir is independently servable)."""
    (
        recent_points(metrics, n)
        .repartition("name")
        .sortWithinPartitions("name", "ms")
        .write.mode("overwrite")
        .partitionBy("name")
        .json(out_dir)
    )


def read_snapshot_series(out_dir: str, name: str) -> list[dict]:
    """Serving-tier read: plain-file JSON, no Spark involved."""
    rows: list[dict] = []
    for path in sorted(glob.glob(os.path.join(out_dir, f"name={name}", "*.json"))):
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    rows.append(json.loads(line))
    rows.sort(key=lambda r: r["ms"])
    return rows
