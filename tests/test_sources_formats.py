"""Format-connector roundtrips: every supported format preserves the
exact rows, row formats refuse to run without a schema, and converted
parquet regains pushdown."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from timeseries_data_provider_spark import tables
from timeseries_data_provider_spark.sources import formats
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events(spark):
    # timestamps normalized to µs; drop none — full-fidelity roundtrip
    return tables.load_table(spark, SF_SMOKE, "events").orderBy("event_id")


def _rows(df):
    return [tuple(r) for r in df.orderBy("event_id").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_preserves_rows(spark, events, tmp_path, fmt):
    path = str(tmp_path / fmt)
    # CSV cannot represent nested/ts-ntz faithfully without casts: keep
    # the scalar columns and stringify the timestamp explicitly
    df = events.select(
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"),
        "user_id",
        "value",
        "props",
    )
    formats.write_sink(df, path, fmt)
    back = formats.read_source(spark, path, fmt, schema=df.schema)
    assert _rows(back) == _rows(df)


def test_row_formats_require_schema(spark, tmp_path):
    for fmt in ("csv", "json"):
        with pytest.raises(ValueError, match="explicit schema"):
            formats.read_source(spark, str(tmp_path), fmt)


def test_convert_to_parquet_restores_pushdown(spark, events, tmp_path):
    src = str(tmp_path / "drop.json")
    dest = str(tmp_path / "native")
    df = events.select("event_id", "event_type", "value")
    formats.write_sink(df, src, "json")
    native = formats.convert_to_parquet(
        spark, src, "json", dest, schema=df.schema,
        partition_by=["event_type"],
    )
    assert native.count() == df.count()
    # partition pruning + filter pushdown visible in the plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        native.filter(
            (F.col("event_type") == "click") & (F.col("value") > 0.5)
        ).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "event_type" in plan
    assert "PushedFilters" in plan and "GreaterThan(value,0.5)" in plan
