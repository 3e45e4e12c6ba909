"""[EXT] Time-series resampling: gap-fill onto a regular grid,
PromQL-style rate, and series pivoting.

The reference returns raw points and leaves resampling to Grafana
(SURVEY.md §2.1); these are the server-side equivalents its users need
once series outgrow ``maxDataPoints``.

Scale notes: gap-fill is the union + running-last formulation (one
shuffle on the series key — same pattern as the as-of join, not a
per-grid-point probe); rate is a single window pass; pivot uses an
explicit column list so Spark skips the extra distinct-values job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import DEC


def gap_fill(
    events: DataFrame,
    step_seconds: int = 3600,
    series_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Forward-fill each series onto a regular ``step_seconds`` grid
    spanning [min(ts), max(ts)] of that series.

    Grid value = the most recent sample at-or-before the grid instant
    (inclusive, like the as-of join). Implementation: canonicalize
    samples per (series, second), union the generated grid with the
    samples, then ``last(value, ignorenulls)`` over an
    unbounded-preceding window — one shuffle on the series key.
    """
    ep = F.unix_seconds(F.col(time_col).cast("timestamp"))
    # canonical sample per (series, epoch-second): max(value), making
    # fill deterministic under same-second duplicates
    samples = (
        events.select(
            F.col(series_col).alias("name"), ep.alias("es"), F.col(value_col)
        )
        .groupBy("name", "es")
        .agg(F.max(value_col).alias("v"))
        .select("name", "es", "v", F.lit(0).alias("src"))
    )
    bounds = samples.groupBy("name").agg(
        F.min("es").alias("e0"), F.max("es").alias("e1")
    )
    grid = bounds.select(
        "name",
        F.explode(
            F.sequence(F.col("e0"), F.col("e1"), F.lit(step_seconds))
        ).alias("es"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("src"),
    )
    u = samples.unionByName(grid)
    w = (
        Window.partitionBy("name")
        .orderBy("es", "src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("fv", F.last("v", ignorenulls=True).over(w))
        .filter(F.col("src") == 1)
        .select(
            "name",
            F.col("es").cast("long").alias("grid_es"),
            F.col("fv").alias("v_fill"),
        )
    )


def rate(
    events: DataFrame,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-series instantaneous rate: Δvalue / Δseconds vs the previous
    point (PromQL ``rate``-style derivative). NULL for each series'
    first point."""
    w = Window.partitionBy(series_col).orderBy(time_col, id_col)
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt = (us - F.lag(us).over(w)).cast("double") / F.lit(1_000_000.0)
    return events.select(
        F.col(id_col),
        F.round(dv / dt, 6).alias("rate"),
    )


def pivot_series(
    events: DataFrame,
    series_values: list[str],
    series_col: str = "event_type",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Day × series wide matrix of exact value sums (one column per
    series). Explicit ``series_values`` keeps the plan single-pass and
    the output schema deterministic."""
    return (
        events.groupBy(
            F.date_format(F.col(time_col), "yyyy-MM-dd").alias("d")
        )
        .pivot(series_col, series_values)
        .agg(F.sum(F.col(value_col).cast(DEC)).cast("double"))
    )
