"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps operator names (SURVEY.md §2) to callables
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent run by the driver at sf=0.01 for row-count + schema +
value-hash comparison. Every computed column is aliased identically on
both sides; float aggregates go through exact DECIMAL sums (see
timeseries_data_provider_spark/functions/numeric.py) so value hashes are
bit-stable across engines and partitionings.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timeseries_data_provider_spark import tables  # noqa: E402
from timeseries_data_provider_spark.operators import (  # noqa: E402
    aggregates,
    core,
    joins,
    windows,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def _t(spark: SparkSession, sf_dir: str, name: str, **kw) -> DataFrame:
    return tables.load_table(spark, sf_dir, name, **kw)


# ---------------------------------------------------------------------------
# reference-surface queries (SURVEY.md §2 rows O2-O16)


def q01_search_series(spark, sf):
    return core.search_series(_t(spark, sf, "events"))


def q02_range_scan(spark, sf):
    return core.query_range(
        _t(spark, sf, "events", keep_raw_ns=True),
        "click",
        "2024-01-02 00:00:00",
        "2024-01-03 00:00:00",
    ).select("value", "ts")


def q03_ordered_limit(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.filter(F.col("event_type") == "view")
        .orderBy("ts", "event_id")
        .limit(100)
        .select("event_id", "value", "ts")
    )


def q04_epoch_ms(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.orderBy("event_id")
        .limit(50)
        .select("event_id", core.epoch_ms(F.col("ts")).alias("ms"))
    )


def q05_fanout_in(spark, sf):
    ev = _t(spark, sf, "events", keep_raw_ns=True)
    return core.query_range(
        ev, ["click", "view"], "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    ).select("event_type", "event_id", "value")


def q06_table_shape(spark, sf):
    ev = _t(spark, sf, "events")
    return core.table_shape(
        ev.filter(F.col("event_type") == "purchase")
        .orderBy("ts", "event_id")
        .limit(200)
    )


def q07_retention_count(spark, sf):
    return core.expired_count(_t(spark, sf, "events"), "2024-01-05 00:00:00")


def q08_lookup_join(spark, sf):
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    return (
        core.lookup_join(c, n, c.c_nationkey == n.n_nationkey)
        .orderBy("c_custkey")
        .limit(100)
        .select("c_custkey", "c_name", "n_name")
    )


def q16_json_extract(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        core.json_scalar(ev, "props", "$.k")
        .orderBy("event_id")
        .limit(100)
        .select("event_id", "k_val")
    )


# ---------------------------------------------------------------------------
# [EXT] aggregates / windows / joins


def q09_time_bucket(spark, sf):
    return aggregates.time_bucket(_t(spark, sf, "events"))


def q10_lag_delta(spark, sf):
    return windows.lag_delta(_t(spark, sf, "events")).orderBy("event_id").limit(500)


def q11_topk_per_group(spark, sf):
    return windows.topk_per_group(_t(spark, sf, "events"), k=5)


def q12_join_revenue(spark, sf):
    return joins.revenue_by_status(
        _t(spark, sf, "orders"), _t(spark, sf, "lineitem")
    )


def q13_semi_join(spark, sf):
    return joins.customers_with_orders(
        _t(spark, sf, "customer"), _t(spark, sf, "orders")
    )


def q13b_anti_join(spark, sf):
    return joins.customers_without_orders(
        _t(spark, sf, "customer"), _t(spark, sf, "orders")
    )


def q14_intersect(spark, sf):
    return joins.nation_keys_intersect(
        _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    )


def q14b_except(spark, sf):
    return joins.nation_keys_except(
        _t(spark, sf, "customer"), _t(spark, sf, "supplier")
    )


def q15_rollup(spark, sf):
    return aggregates.rollup_counts(_t(spark, sf, "lineitem"))


def q15b_cube(spark, sf):
    return aggregates.cube_counts(_t(spark, sf, "lineitem"))


def q17_dedup_counts(spark, sf):
    return aggregates.dedup_counts(_t(spark, sf, "documents"))


def q18_text_stats(spark, sf):
    return aggregates.text_stats(_t(spark, sf, "documents"))


def q19_moving_avg(spark, sf):
    return windows.moving_avg(_t(spark, sf, "events"), n=5)


def q20_sessionize(spark, sf):
    return windows.sessionize(_t(spark, sf, "events"), gap_minutes=30)


def q21_asof_join(spark, sf):
    return joins.asof_join_last_error(_t(spark, sf, "events"))


def q22_range_join(spark, sf):
    return joins.clicks_before_purchase(_t(spark, sf, "events"), minutes=10)


# ---------------------------------------------------------------------------
# driver contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: time-bucket rollup (the canonical time-series op) at
    sf0.001."""
    return q09_time_bucket(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return {
        "q01_search_series": q01_search_series,
        "q02_range_scan": q02_range_scan,
        "q03_ordered_limit": q03_ordered_limit,
        "q04_epoch_ms": q04_epoch_ms,
        "q05_fanout_in": q05_fanout_in,
        "q06_table_shape": q06_table_shape,
        "q07_retention_count": q07_retention_count,
        "q08_lookup_join": q08_lookup_join,
        "q09_time_bucket": q09_time_bucket,
        "q10_lag_delta": q10_lag_delta,
        "q11_topk_per_group": q11_topk_per_group,
        "q12_join_revenue": q12_join_revenue,
        "q13_semi_join": q13_semi_join,
        "q13b_anti_join": q13b_anti_join,
        "q14_intersect": q14_intersect,
        "q14b_except": q14b_except,
        "q15_rollup": q15_rollup,
        "q15b_cube": q15b_cube,
        "q16_json_extract": q16_json_extract,
        "q17_dedup_counts": q17_dedup_counts,
        "q18_text_stats": q18_text_stats,
        "q19_moving_avg": q19_moving_avg,
        "q20_sessionize": q20_sessionize,
        "q21_asof_join": q21_asof_join,
        "q22_range_join": q22_range_join,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q01_search_series": "SELECT DISTINCT event_type AS name FROM events",
        "q02_range_scan": """
            SELECT value, ts FROM events
            WHERE event_type = 'click'
              AND ts >= TIMESTAMP '2024-01-02 00:00:00'
              AND ts <= TIMESTAMP '2024-01-03 00:00:00'
        """,
        "q03_ordered_limit": """
            SELECT event_id, value, ts FROM events
            WHERE event_type = 'view'
            ORDER BY ts, event_id LIMIT 100
        """,
        "q04_epoch_ms": """
            SELECT event_id, epoch_ms(ts) AS ms FROM events
            ORDER BY event_id LIMIT 50
        """,
        "q05_fanout_in": """
            SELECT event_type, event_id, value FROM events
            WHERE event_type IN ('click', 'view')
              AND ts >= TIMESTAMP '2024-01-01 00:00:00'
              AND ts <= TIMESTAMP '2024-02-01 00:00:00'
        """,
        "q06_table_shape": """
            SELECT event_type AS target, value, ts FROM events
            WHERE event_type = 'purchase'
            ORDER BY ts, event_id LIMIT 200
        """,
        "q07_retention_count": """
            SELECT COUNT(*) AS n FROM events
            WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
        """,
        "q08_lookup_join": """
            SELECT c.c_custkey, c.c_name, n.n_name
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            ORDER BY c.c_custkey LIMIT 100
        """,
        "q09_time_bucket": """
            SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, COUNT(*) AS n,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                         / COUNT(*), 6) AS avg_v,
                   MIN(value) AS min_v, MAX(value) AS max_v
            FROM events GROUP BY 1, 2
        """,
        "q10_lag_delta": """
            SELECT event_id,
                   value - LAG(value) OVER
                     (PARTITION BY event_type ORDER BY ts, event_id) AS delta
            FROM events ORDER BY event_id LIMIT 500
        """,
        "q11_topk_per_group": """
            SELECT * FROM (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rn
              FROM events) t
            WHERE rn <= 5
        """,
        "q12_join_revenue": """
            SELECT o.o_orderstatus,
                   CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                                 AS DECIMAL(28,6))) AS DOUBLE) AS revenue
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "q13_semi_join": """
            SELECT COUNT(*) AS n FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        """,
        "q13b_anti_join": """
            SELECT COUNT(*) AS n FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
        """,
        "q14_intersect": """
            SELECT c_nationkey AS k FROM customer
            INTERSECT
            SELECT s_nationkey AS k FROM supplier
        """,
        "q14b_except": """
            SELECT c_nationkey AS k FROM customer
            EXCEPT
            SELECT s_nationkey AS k FROM supplier
        """,
        "q15_rollup": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q15b_cube": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                     AS sum_price
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        "q16_json_extract": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val
            FROM events ORDER BY event_id LIMIT 100
        """,
        "q17_dedup_counts": """
            SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq
            FROM documents
        """,
        "q18_text_stats": """
            SELECT lang, COUNT(*) AS n,
                   CAST(FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "q19_moving_avg": """
            SELECT event_id,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6)))
                              OVER w AS DOUBLE)
                         / COUNT(*) OVER w, 6) AS mov_avg
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        """,
        "q20_sessionize": """
            WITH x AS (
              SELECT user_id,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
            FROM x GROUP BY user_id
        """,
        "q21_asof_join": """
            SELECT c.event_id, c.value AS click_value, e.value AS err_value
            FROM (SELECT * FROM events WHERE event_type = 'click') c
            ASOF LEFT JOIN
                 (SELECT * FROM events WHERE event_type = 'error') e
              ON c.user_id = e.user_id AND c.ts >= e.ts
        """,
        "q22_range_join": """
            SELECT p.event_id, COUNT(c.event_id) AS n_clicks
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id
             AND c.ts >= p.ts - INTERVAL 10 MINUTE
             AND c.ts <= p.ts
            GROUP BY p.event_id
        """,
    }
