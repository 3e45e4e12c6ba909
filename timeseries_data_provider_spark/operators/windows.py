"""[EXT] Window-function operators (SURVEY.md §2.1 "Window functions:
ABSENT" in the reference) — deltas, moving averages, per-group top-k,
sessionization. All are single-shuffle plans: one exchange on the
partition key, then sorted window evaluation inside each partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import DEC


def _series_window(series_col: str, time_col: str, id_col: str):
    return Window.partitionBy(series_col).orderBy(time_col, id_col)


def lag_delta(
    events: DataFrame,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Point-to-point delta per series — the rate/derivative primitive
    Grafana users expect. Deterministic: order tie-broken on id."""
    w = _series_window(series_col, time_col, id_col)
    return events.select(
        F.col(id_col),
        (F.col(value_col) - F.lag(value_col).over(w)).alias("delta"),
    )


def topk_per_group(
    events: DataFrame,
    k: int = 5,
    series_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k rows per series by value (row_number ≤ k, id tie-break).

    Scale: rank-filter pattern — no global sort; each series sorts
    within its shuffle partition only.
    """
    w = Window.partitionBy(series_col).orderBy(
        F.col(value_col).desc(), F.col(id_col)
    )
    return (
        events.select(
            series_col,
            id_col,
            value_col,
            # long, matching ANSI ROW_NUMBER() (BIGINT) for oracle parity
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= k)
    )


def moving_avg(
    events: DataFrame,
    n: int = 5,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Trailing n-row moving average per series.

    Exactness: the windowed SUM runs over DECIMAL so sliding-window
    accumulator strategies can't introduce float drift (see
    functions/numeric.py).
    """
    w = _series_window(series_col, time_col, id_col).rowsBetween(-(n - 1), 0)
    return events.select(
        F.col(id_col),
        F.round(
            F.sum(F.col(value_col).cast(DEC)).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("mov_avg"),
    )


def rolling_zscore(
    events: DataFrame,
    n: int = 20,
    min_points: int = 5,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Rolling z-score anomaly signal per series: (x - trailing mean) /
    trailing stddev over the last ``n`` rows.

    Variance is computed explicitly from DECIMAL-exact sum and
    sum-of-squares (``(Σx² - (Σx)²/n) / (n-1)``) instead of a built-in
    stddev aggregate — built-ins use engine-specific accumulation
    (Welford vs naive) whose float results differ across engines, which
    would break reproducibility and oracle hashing. NULL until
    ``min_points`` and when variance degenerates."""
    w = _series_window(series_col, time_col, id_col).rowsBetween(-(n - 1), 0)
    v = F.col(value_col)
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum(v.cast(DEC)).over(w).cast("double")
    s2 = F.sum((v * v).cast(DEC)).over(w).cast("double")
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    z = F.when(
        (cnt >= min_points) & (var > 0),
        F.round((v - mean) / F.sqrt(var), 6),
    )
    return events.select(F.col(id_col), z.alias("z"))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gaps-and-islands session count per user: a new session starts
    when the gap to the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(time_col, id_col)
    prev = F.lag(time_col).over(w)
    flag = F.when(
        prev.isNull()
        | (F.col(time_col) > prev + F.expr(f"INTERVAL {gap_minutes} MINUTES")),
        1,
    ).otherwise(0)
    return (
        events.select(F.col(user_col), flag.alias("new_session"))
        .groupBy(user_col)
        .agg(F.sum("new_session").alias("n_sessions"))
    )
