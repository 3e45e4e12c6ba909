"""Schema-normalizing loaders for the driver testdata tables.

The testdata (TESTDATA.md) stores some timestamp columns as parquet
TIMESTAMP(NANOS, isAdjustedToUTC=false) (``events.ts``,
``lineitem.l_shipdate``) which Spark's parquet reader rejects natively.
With ``spark.sql.legacy.parquet.nanosAsLong=true`` those columns arrive
as raw int64 nanoseconds; :func:`load_table` converts them to
``TIMESTAMP_NTZ`` via ``timestamp_micros(ns div 1000)`` — integer
division truncates ns → µs exactly as DuckDB does when reading the same
files, so both engines see identical wall-clock values.

Scale note: the ns→µs conversion is an *expression* on the column, so a
filter written against the converted column would NOT push down to the
parquet scan. Operators that range-scan on time therefore filter on the
raw int64 nanos first (predicate + row-group stats pushdown both work on
plain int64) and convert after the filter — see
``operators/core.py:query_range``.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import ensure_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

NS_SUFFIX = "__ns"


@lru_cache(maxsize=256)
def _ns_timestamp_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) in the file at *path*."""
    import pyarrow.parquet as pq

    cols = []
    schema = pq.read_schema(path)
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            cols.append(field.name)
    return tuple(cols)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    keep_raw_ns: bool = False,
) -> DataFrame:
    """Load one testdata table with normalized timestamp columns.

    ns-timestamp columns are converted to TIMESTAMP_NTZ. With
    ``keep_raw_ns=True`` the raw int64 nanos are additionally kept as
    ``<col>__ns`` so time-range operators can push predicates down to
    the parquet scan (see module docstring).
    """
    ensure_runtime_confs(spark)
    path = table_path(sf_dir, name)
    df = spark.read.parquet(path)
    for col in _ns_timestamp_columns(path):
        converted = F.timestamp_micros(F.expr(f"`{col}` div 1000")).cast(
            "timestamp_ntz"
        )
        if keep_raw_ns:
            df = df.withColumn(col + NS_SUFFIX, F.col(col))
        df = df.withColumn(col, converted)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql use)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_bucketed(
    df,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a frame as a bucketed managed table.

    Bucketing pre-shuffles data by the join/agg key at WRITE time, so
    every later equi-join or aggregation on ``bucket_cols`` between
    co-bucketed tables runs with ZERO exchange — the decisive layout
    choice for repeatedly-joined 100 TB fact tables (pay the shuffle
    once, not per query). Verified in tests/test_layout.py: a join of
    two co-bucketed tables plans as SortMergeJoin with no Exchange.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    row_group_bytes: int | None = None,
) -> None:
    """Persist a frame RANGE-CLUSTERED on ``cluster_cols``: global
    range partitioning (repartitionByRange — one sampling pass + one
    shuffle) followed by an in-file sort on the same columns, so every
    file AND every parquet row group covers a narrow, disjoint slice
    of the clustering key space. Point lookups and range scans on the
    clustering columns then skip almost everything via footer min/max
    stats — the complementary layout to ``write_bucketed`` (bucketing
    co-locates equi-JOIN keys but randomizes order inside buckets, so
    it wins joins and loses range scans; range clustering is the
    reverse). This is the layout that makes ``rp_topk(fetch_by_id=
    True)``-style id fetches and time-slice reads cheap at 100 TB.

    ``row_group_bytes`` caps parquet row-group size (the
    ``parquet.block.size`` writer option) — smaller groups = finer
    skipping granularity at slightly more footer overhead (the knob to
    turn when fetches decode too much; see BASELINE.md §C rp row).
    Skipping is MEASURED, not assumed: tests/test_layout.py pins
    decoded-row counts via planstats.scan_stats on clustered vs
    unclustered copies of the same data.
    """
    out = df.repartitionByRange(num_files, *cluster_cols)
    out = out.sortWithinPartitions(*cluster_cols)
    writer = out.write.mode("overwrite")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)
