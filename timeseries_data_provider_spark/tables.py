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

import json
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


def widen_for_python(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Repartition a frame about to enter a per-row Python (Arrow)
    stage so the stage scales with CORES, not input splits. The local
    testdata tables are single parquet files — one split — which
    serializes a mapInPandas codec/build pass onto one task (r11
    finding: q64's scan-PDF chain ran 16 s on one core that way). At
    real scale inputs arrive in thousands of splits and this is a
    conditional NO-OP: the repartition fires only when the frame has
    fewer partitions than the session's parallelism, so no shuffle is
    added to the 100 TB plan."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


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


def sample_zorder_boundaries(
    df: DataFrame,
    cluster_cols: list[str],
    bits: int = 6,
    sample_rows: int = 20_000,
    seed: int = 7,
) -> dict[str, list]:
    """Per-column quantile-bucket boundaries for the Z-order curve:
    one DETERMINISTIC-SEED sampled collect (bounded by
    ``sample_rows`` regardless of table size) -> ``2^bits - 1``
    boundary values per column. Persisted by ``write_zorder`` so
    ``append_zorder`` buckets NEW data with the SAME curve."""
    n_buckets = 1 << bits
    frac_df = df.select(*cluster_cols)
    total = frac_df.count()
    if total == 0:
        return {c: [] for c in cluster_cols}
    frac = min(1.0, (sample_rows * 1.05) / max(total, 1))
    sampled = frac_df.sample(fraction=frac, seed=seed).limit(
        sample_rows
    ).collect()
    out: dict[str, list] = {}
    for c in cluster_cols:
        vals = sorted(r[c] for r in sampled if r[c] is not None)
        if vals:
            # n_buckets-1 boundary values at even sample ranks
            out[c] = [
                vals[min(len(vals) - 1, (i * len(vals)) // n_buckets)]
                for i in range(1, n_buckets)
            ]
        else:
            out[c] = []
    return out


def zorder_value(
    df: DataFrame,
    cluster_cols: list[str],
    bits: int = 6,
    sample_rows: int = 20_000,
    seed: int = 7,
    boundaries: dict[str, list] | None = None,
) -> DataFrame:
    """Attach a ``__z`` column: the Morton (Z-order) interleave of
    per-column RANK BUCKETS, the multi-dimensional clustering key
    (public technique: Morton 1966; the OSS Delta/Iceberg OPTIMIZE
    ZORDER strategy). Each cluster column is bucketed into ``2^bits``
    quantile buckets via DETERMINISTIC-SEED sampled boundaries
    (sample size is bounded by ``sample_rows`` per column — a driver
    collect that does not grow with the table), then the bucket ids'
    bits are interleaved JVM-side (plain shift/or expressions, no
    UDF). Works for any orderable column type — boundaries are just
    sampled values, so strings bucket as well as numbers.

    Why rank buckets and not raw value bits: raw-bit interleaving is
    dominated by the widest-range column and collapses for strings;
    rank buckets give every column equal weight in the curve (the
    approach Delta OSS uses via range_partition_id).
    """
    if not cluster_cols:
        raise ValueError("zorder_value: need at least one column")
    if bits * len(cluster_cols) > 62:
        raise ValueError(
            f"zorder_value: {bits} bits x {len(cluster_cols)} columns "
            "overflows a long"
        )
    n_buckets = 1 << bits
    if boundaries is None:
        boundaries = sample_zorder_boundaries(
            df, cluster_cols, bits=bits, sample_rows=sample_rows,
            seed=seed,
        )
    zcol = F.lit(0).cast("long")
    for ci, c in enumerate(cluster_cols):
        bounds = boundaries.get(c) or []
        barr = F.array(*[F.lit(b) for b in bounds]) if bounds else None
        if barr is None:
            bucket = F.lit(0).cast("long")
        else:
            # bucket = #boundaries <= value (NULLs -> bucket 0): an
            # O(n_buckets) fold over literal boundaries, all JVM
            bucket = F.aggregate(
                barr,
                F.lit(0).cast("long"),
                lambda acc, b: acc
                + F.when(F.col(c) >= b, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                ),
            )
        b = F.coalesce(bucket, F.lit(0).cast("long"))
        # interleave: bit i of column ci lands at position
        # i*len(cols)+ci in the z-value
        for i in range(bits):
            zcol = zcol + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)),
                i * len(cluster_cols) + ci,
            ).cast("long")
    return df.withColumn("__z", zcol)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the Hadoop FS API — meta
    sidecar I/O must work wherever the data path does (local, HDFS,
    S3A), not just on the driver's local disk."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return (
        hpath.getFileSystem(spark._jsc.hadoopConfiguration()),
        hpath,
    )


def write_zorder(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    bits: int = 6,
    row_group_bytes: int | None = None,
) -> None:
    """Persist a frame Z-ORDER clustered on ``cluster_cols``: rows
    near each other on the Morton curve land in the same file/row
    group, so footer min/max stats prune scans filtered on ANY of the
    clustering columns — the multi-column complement to
    ``write_range_clustered`` (which wins on its leading column and
    does nothing for the others). The 100 TB use case: the events
    fact filtered sometimes by series name, sometimes by time —
    one layout serves both predicates at ~sqrt selectivity each
    instead of one perfectly and the other not at all. Pruning is
    MEASURED, not assumed: tests/test_layout.py pins decoded-row
    counts on both single-column predicates against a linear layout.
    """
    boundaries = sample_zorder_boundaries(df, cluster_cols, bits=bits)
    out = zorder_value(
        df, cluster_cols, bits=bits, boundaries=boundaries
    )
    out = out.repartitionByRange(num_files, "__z").sortWithinPartitions(
        "__z"
    )
    out = out.drop("__z")
    # persist the curve so appends bucket with the SAME boundaries —
    # JSON covers the supported boundary types (numbers, strings).
    # Crash-safety order (ADVICE r10): the overwrite DELETES the
    # directory (including the previous meta), so the new meta is
    # staged in the PARENT directory — outside the blast radius —
    # BEFORE the data write, and renamed in only after it commits. A
    # crash in the window leaves the staged file next to the table for
    # manual recovery instead of a meta-less layout. All meta I/O goes
    # through the Hadoop FS API so non-local paths (HDFS/S3) work the
    # same as the data path.
    meta = {
        "cluster_cols": list(cluster_cols),
        "bits": bits,
        "boundaries": boundaries,
    }
    spark = df.sparkSession
    fs, hpath = _hadoop_fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    staged = jpath(
        hpath.getParent(), f"._zorder_meta.{hpath.getName()}.staged"
    )
    stream = fs.create(staged, True)
    stream.write(json.dumps(meta).encode("utf-8"))
    stream.close()
    writer = out.write.mode("overwrite")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)
    dst = jpath(hpath, "_zorder_meta.json")
    if fs.exists(dst):
        fs.delete(dst, False)
    if not fs.rename(staged, dst):
        raise IOError(
            f"write_zorder: could not move staged meta {staged} -> {dst}"
        )


def append_zorder(
    df: DataFrame,
    path: str,
    num_files: int = 8,
    row_group_bytes: int | None = None,
) -> None:
    """Append a batch into an existing Z-order layout WITHOUT
    rewriting settled files: new rows bucket with the layout's
    PERSISTED boundaries (``_zorder_meta.json``), so they land on the
    same curve and scans keep pruning across old + new files — the
    incremental-maintenance form (the signature-index / IVF-append
    scale rule: settled data is never re-read). Distribution drift
    degrades locality gracefully (new values past the old boundary
    range pile into the edge buckets); a rebuild (``write_zorder``)
    resamples. Sort-order caveat: parquet's append cannot interleave
    new rows into old files, so pruning quality is per-FILE-SET —
    each append's files cover narrow curve ranges of their own."""
    spark = df.sparkSession
    fs, hpath = _hadoop_fs(spark, path)
    meta_path = spark._jvm.org.apache.hadoop.fs.Path(
        hpath, "_zorder_meta.json"
    )
    if not fs.exists(meta_path):
        raise FileNotFoundError(
            f"append_zorder: {path} has no _zorder_meta.json — the "
            "layout was written without write_zorder, or a crash "
            "interrupted it (look for a ._zorder_meta.*.staged file "
            "next to the directory); rebuild with write_zorder"
        )
    stream = fs.open(meta_path)
    try:
        meta = json.loads(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()
    out = zorder_value(
        df,
        meta["cluster_cols"],
        bits=meta["bits"],
        boundaries=meta["boundaries"],
    )
    out = out.repartitionByRange(num_files, "__z").sortWithinPartitions(
        "__z"
    )
    out = out.drop("__z")
    writer = out.write.mode("append")
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", row_group_bytes)
    writer.parquet(path)
