"""Reference edge-semantics unit tests (SURVEY.md §5 item 3) on tiny
hand-built frames: inclusive range bounds (index.js:106), strict-<
retention (index.js:273), time-ASC limit, epoch-ms truncation
(index.js:122 parseInt), null handling, lookup-join drop semantics
(index.js:103), plus loader schema normalization across every table."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from tests.conftest import SF_SMOKE

EV_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ts", TimestampNTZType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 1, 1.0),
        ("a", datetime(2024, 1, 1, 0, 0, 1), 2, 2.0),
        ("a", datetime(2024, 1, 1, 0, 0, 2), 3, 3.0),
        ("b", datetime(2024, 1, 1, 0, 0, 1), 4, 4.0),
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_range_bounds_inclusive_both_ends(tiny):
    from timeseries_data_provider_spark.operators import core

    out = core.query_range(
        tiny, "a", "2024-01-01 00:00:00", "2024-01-01 00:00:01"
    )
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]


def test_limit_is_time_asc_earliest_n(tiny):
    from timeseries_data_provider_spark.operators import core

    out = core.query_range(
        tiny, "a", "2024-01-01 00:00:00", "2024-01-01 00:01:00", max_points=2
    )
    assert [r["event_id"] for r in out.orderBy("ts").collect()] == [1, 2]


def test_retention_strict_less_than(tiny):
    from timeseries_data_provider_spark.operators import core

    n = core.expired_count(tiny, "2024-01-01 00:00:01").collect()[0]["n"]
    assert n == 1  # only the :00 rows; :01 NOT expired (strict <)
    kept = core.retention_filter(tiny, "2024-01-01 00:00:01")
    assert sorted(r["event_id"] for r in kept.collect()) == [2, 3, 4]


def test_epoch_ms_truncates(spark):
    from timeseries_data_provider_spark.operators import core

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 0, 0, 0, 999_999), 1, 1.0)], EV_SCHEMA
    )
    ms = df.select(core.epoch_ms(F.col("ts")).alias("ms")).collect()[0]["ms"]
    assert ms == 1704067200999  # floor to ms, like parseInt(format("x"))
    assert isinstance(ms, int)


def test_lookup_join_drops_unknown_inner_keeps_left(spark, tiny):
    from timeseries_data_provider_spark.operators import core

    dim = spark.createDataFrame(
        [("a", 1)], ["event_type", "weight"]
    )
    inner = core.lookup_join(tiny, dim, "event_type")
    assert {r["event_type"] for r in inner.collect()} == {"a"}  # b dropped
    left = core.lookup_join(tiny, dim, "event_type", how="left")
    got = {r["event_type"]: r["weight"] for r in left.collect()}
    assert got["b"] is None  # kept with null dim


def test_json_scalar_null_on_garbage(spark):
    from timeseries_data_provider_spark.operators import core

    df = spark.createDataFrame(
        [("{\"k\": 2.5}",), ("not json",), ("{\"other\": 1}",)], ["props"]
    )
    vals = [
        r["k_val"]
        for r in core.json_scalar(df, "props", "$.k").collect()
    ]
    assert vals == [2.5, None, None]


def test_loader_normalizes_every_table(spark):
    from timeseries_data_provider_spark import tables

    for name in tables.TABLES:
        df = tables.load_table(spark, SF_SMOKE, name)
        assert df.count() > 0, name
        # no leftover raw int64-nanos timestamp columns
        for f in df.schema.fields:
            assert not f.name.endswith(tables.NS_SUFFIX)
        if name == "events":
            assert str(df.schema["ts"].dataType) in (
                "TimestampNTZType()",
                "TimestampType()",
            )
        if name == "lineitem":
            assert "Timestamp" in str(df.schema["l_shipdate"].dataType)


def test_search_series_matches_distinct(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    ev = tables.load_table(spark, SF_SMOKE, "events")
    names = sorted(r["name"] for r in core.search_series(ev).collect())
    assert names == ["click", "error", "purchase", "signup", "view"]


def test_query_range_raw_ns_clamps_far_future_bounds(spark):
    """Bounds past the int64-ns horizon (2262-04-11) — e.g. serving's
    open-ended 9999-12-31 default — must clamp, not raise (review
    finding: F.lit overflowed with NumberFormatException on the
    pushdown branch only)."""
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    ev = tables.load_table(spark, SF_SMOKE, "events", keep_raw_ns=True)
    out = core.query_range(
        ev, "click", "1970-01-01 00:00:00", "9999-12-31 00:00:00"
    )
    n = out.count()
    assert n == ev.filter("event_type = 'click'").count() and n > 0


def test_scaled_long_overflow_raises_not_saturates(spark):
    import pytest as _pytest

    from timeseries_data_provider_spark.operators import windows

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 1.0e13)],
        ["event_type", "event_id", "value"],
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    with _pytest.raises(Exception, match="_scaled_long overflow"):
        windows.moving_avg(df, n=2).collect()


def test_scaled_long_guard_is_null_transparent(spark):
    # ADVICE r5: assert_true raises on a NULL condition, so a NULL
    # series value used to abort moving_avg with a spurious overflow
    # error. NULLs must propagate (skipped by the window sums).
    from timeseries_data_provider_spark.operators import windows

    df = spark.createDataFrame(
        [("a", 1, 2.0), ("a", 2, None), ("a", 3, 4.0)],
        "event_type string, event_id int, value double",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    rows = {
        r["event_id"]: r["mov_avg"]
        for r in windows.moving_avg(df, n=3).collect()
    }
    assert len(rows) == 3  # no spurious '_scaled_long overflow'
    # windowed sum skips the NULL, count covers all rows in frame
    assert rows[3] is not None
