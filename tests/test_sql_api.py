"""Spark SQL API parity: the engine's tables register as views and the
declared semantics are reachable through ``spark.sql`` too (users of
the reference may prefer SQL; both front-ends hit the same Catalyst
plans)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    from timeseries_data_provider_spark.tables import register_views

    register_views(spark, SF_SMOKE)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_matches_dataframe_range_scan(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    sql = spark.sql(
        """
        SELECT value, ts FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP_NTZ '2024-01-02 00:00:00'
          AND ts <= TIMESTAMP_NTZ '2024-01-03 00:00:00'
        """
    )
    ev = tables.load_table(spark, SF_SMOKE, "events", keep_raw_ns=True)
    df = core.query_range(
        ev, "click", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    ).select("value", "ts")
    assert _rows(sql) == _rows(df)


def test_sql_matches_dataframe_time_bucket(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import aggregates

    sql = spark.sql(
        """
        SELECT event_type, date_format(ts, 'yyyy-MM-dd') AS d,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_v,
               MIN(value) AS min_v, MAX(value) AS max_v
        FROM events GROUP BY 1, 2
        """
    )
    df = aggregates.time_bucket(tables.load_table(spark, SF_SMOKE, "events"))
    assert _rows(sql) == _rows(df)


def test_sql_matches_dataframe_topk(spark):
    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import windows

    sql = spark.sql(
        """
        SELECT * FROM (
          SELECT event_type, event_id, value,
                 CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id) AS BIGINT)
                   AS rn
          FROM events) t WHERE rn <= 5
        """
    )
    df = windows.topk_per_group(
        tables.load_table(spark, SF_SMOKE, "events"), k=5
    )
    assert _rows(sql) == _rows(df)
