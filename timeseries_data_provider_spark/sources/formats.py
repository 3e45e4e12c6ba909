"""File-format connectors: schema-enforced readers/writers for
parquet, ORC, CSV, and JSON-lines.

The reference has no file formats at all — storage lives inside
InfluxDB (SURVEY.md §2.1 "Scans/sources/sinks: File formats: none in
reference"); the engine's native table format is partitioned Parquet.
These connectors cover interchange with external producers/consumers.

Scale rules encoded here:
- **Schema is always explicit for row formats.** CSV/JSON schema
  inference is a full extra pass over the data (at 100 TB, a full
  extra scan) and can infer differently between samples — readers
  require a StructType for csv/json and never infer.
- **Columnar in, columnar out.** parquet/orc get predicate pushdown,
  column pruning, and row-group skipping; csv/json parse every byte of
  every row regardless of projection. `convert_to_parquet` is the
  ingest-time normalization step: pay the row-format parse once,
  partition by the query key, and every later scan is pruned columnar
  I/O.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

COLUMNAR = ("parquet", "orc")
ROW_FORMATS = ("csv", "json")
FORMATS = COLUMNAR + ROW_FORMATS


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read *path* as *fmt*. Columnar formats carry their own schema;
    row formats REQUIRE one (no inference pass — see module docstring).
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    if fmt in ROW_FORMATS and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference would scan the "
            "data twice and is non-deterministic under sampling"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").csv(path)
    return getattr(reader, fmt)(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write *df* to *path* as *fmt*, optionally hive-partitioned —
    partition directories give even row formats partition pruning."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def convert_to_parquet(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dest_path: str,
    schema: StructType | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Ingest-time normalization: parse a row-format drop once, write
    the engine's native partitioned parquet, return the parquet-backed
    frame. All downstream reads then get pushdown + pruning."""
    df = read_source(spark, src_path, src_fmt, schema)
    write_sink(df, dest_path, "parquet", partition_by=partition_by)
    out = spark.read.parquet(dest_path)
    if schema is not None:
        # review finding: partition columns are directory-encoded and
        # re-INFERRED on read-back ('2024' comes back as INT and moves
        # to the end), silently breaking the explicit-schema contract
        # this module enforces. Restore the declared types and order.
        out = out.select(
            *[F.col(f.name).cast(f.dataType) for f in schema.fields]
        )
    return out
