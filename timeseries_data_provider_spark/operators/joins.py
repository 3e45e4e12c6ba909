"""[EXT] Join family. The reference's only join is the broadcast point
lookup (operators/core.py:lookup_join, reference index.js:28-32); these
add the equi / semi / anti / set / as-of / range joins a real engine
needs (SURVEY.md §2.1 "Joins").

Scale notes per operator are inline; the common themes:
- small side → ``F.broadcast`` (no shuffle of the big side);
- big-big equi join → sort-merge on the key, AQE handles skew;
- as-of join → expressed as union + running ``last_value`` so it costs
  ONE shuffle (by key) instead of a range cross-join;
- range join → equi key first (user), range predicate second, so the
  physical plan is a sort-merge join with a residual range filter, not
  a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import stable_sum


def revenue_by_status(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-ish revenue rollup over the orders ⋈ lineitem join.

    Big-big equi join → sort-merge; the aggregate re-uses the join
    output without an extra shuffle only if keys align, otherwise the
    two-phase hash agg keeps shuffle volume at one row per group per
    task. Revenue summed exactly (DECIMAL) for reproducibility.
    """
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    return j.groupBy("o_orderstatus").agg(
        stable_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            "revenue",
        )
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi-join count (EXISTS). left_semi never materializes order
    columns — minimal shuffle payload."""
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_semi",
        ).agg(F.count(F.lit(1)).alias("n"))
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join count (NOT EXISTS semantics — null-safe, unlike SQL
    NOT IN)."""
    return (
        customer.join(
            orders.select("o_custkey"),
            customer.c_custkey == F.col("o_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n"))
    )


def nation_keys_intersect(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """INTERSECT (distinct) of customer vs supplier nation keys."""
    return customer.select(F.col("c_nationkey").alias("k")).intersect(
        supplier.select(F.col("s_nationkey").alias("k"))
    )


def nation_keys_except(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.
    ``subtract`` is Spark's EXCEPT DISTINCT (bag-semantics ``exceptAll``
    would keep duplicated left keys)."""
    return customer.select(F.col("c_nationkey").alias("k")).subtract(
        supplier.select(F.col("s_nationkey").alias("k"))
    )


def orders_customers_full_outer(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """FULL OUTER join coverage: row / matched-side counts over
    orders ⟗ customer."""
    j = orders.join(
        customer, orders.o_custkey == customer.c_custkey, "full_outer"
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_orderkey").alias("n_orders"),
        F.count("c_custkey").alias("n_customers"),
    )


def region_nation_cross(region: DataFrame, nation: DataFrame) -> DataFrame:
    """Explicit CROSS JOIN coverage (tiny dims only — a guarded
    operation at scale; Spark requires crossJoin to be explicit, which
    is itself the safety property)."""
    j = region.crossJoin(nation)
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("r_regionkey") * F.col("n_nationkey")).cast("long")
        ).alias("s"),
    )


def semi_anti_counts(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi- AND anti-join coverage in one result row: customers with /
    without orders (EXISTS / NOT EXISTS). Both genuine left_semi /
    left_anti plans; the two 1-row aggregates combine with a trivial
    cross join."""
    semi = customers_with_orders(customer, orders).select(
        F.col("n").alias("n_with")
    )
    anti = customers_without_orders(customer, orders).select(
        F.col("n").alias("n_without")
    )
    return semi.crossJoin(anti)


def nation_keys_set_ops(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """INTERSECT and EXCEPT coverage in one tagged result: nation keys
    in both customer and supplier ('both'), and customer-only keys
    ('cust_only')."""
    both = nation_keys_intersect(customer, supplier).select(
        "k", F.lit("both").alias("op")
    )
    only = nation_keys_except(customer, supplier).select(
        "k", F.lit("cust_only").alias("op")
    )
    return both.unionByName(only)


def outer_cross_stats(
    orders: DataFrame,
    customer: DataFrame,
    region: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """FULL OUTER and explicit CROSS join coverage in one result row
    (both sides are 1-row aggregates; combining them is a trivial cross
    join of singletons)."""
    fo = orders_customers_full_outer(orders, customer)
    cx = region_nation_cross(region, nation).select(
        F.col("n").alias("n_cross"), F.col("s").alias("s_cross")
    )
    return fo.crossJoin(cx)


def asof_join_last_error(events: DataFrame) -> DataFrame:
    """As-of join: for every 'click', the most recent (ts' <= ts)
    'error' value of the same user.

    Implemented as the union + running-last trick: tag both sides, sort
    by (ts, side) with the error side first so an error at the exact
    same timestamp is visible (inclusive as-of, matching DuckDB
    ``ASOF LEFT JOIN ... ON l.ts >= r.ts``), then
    ``last(err_value, ignorenulls)`` over an unbounded-preceding window
    per user. ONE shuffle on user_id — versus the naive range-join
    formulation which is quadratic per user. This is the standard
    scalable as-of pattern (also how pandas merge_asof/QuestDB ASOF
    behave semantically).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.col("value").alias("click_value"),
        F.lit(1).alias("side"), F.lit(None).cast("double").alias("err_in"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("side"), F.col("value").alias("err_in"),
    )
    u = clicks.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("err_value", F.last("err_in", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("event_id", "click_value", "err_value")
    )


def clicks_before_purchase(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Range join: per 'purchase', count same-user 'clicks' in the
    trailing window [ts - minutes, ts].

    Equi key (user_id) + range residual → sort-merge join, NOT a
    cartesian. Left join so zero-click purchases appear with n=0.
    """
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    j = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {minutes} MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return j.groupBy("event_id").agg(F.count("c_event_id").alias("n_clicks"))
