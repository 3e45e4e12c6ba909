"""[EXT] Window-function operators (SURVEY.md §2.1 "Window functions:
ABSENT" in the reference) — deltas, moving averages, per-group top-k,
sessionization. All are single-shuffle plans: one exchange on the
partition key, then sorted window evaluation inside each partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _series_window(series_col: str, time_col: str, id_col: str):
    return Window.partitionBy(series_col).orderBy(time_col, id_col)


def _scaled_long(col: Column, scale: float = 1e6) -> Column:
    """Quantize a double to an integer long (floor of col*scale).

    Long sums in window frames are exact, order-independent, and stay in
    the vectorized aggregate path. The earlier DECIMAL(28,6) formulation
    was equally exact but ~7x slower per windowed sum (decimal window
    accumulators fall off the primitive fast path — measured round 1,
    VERDICT r1 finding #2). ``floor`` (not round/cast) because floor of
    a double is a single IEEE operation with identical semantics in
    every engine, so oracle hashes match bit-for-bit; double->long CAST
    truncates in Spark but rounds in DuckDB, and ROUND goes through
    decimal-string representation in Spark.
    """
    scaled = col * F.lit(scale)
    # Saturation guard (review finding): Spark floor() on a double
    # beyond int64 silently SATURATES at Long.MAX — a series carrying
    # large counters (|v| >= ~9.2e12 here, or ~3.04e6 through the
    # squared term of the z-score) would corrupt every windowed sum
    # with no error. The in-plan assert turns silent garbage into a
    # named failure; callers needing larger domains should rescale.
    # NULL-transparent (ADVICE r5): assert_true RAISES when its
    # condition is NULL, so a NULL series value must satisfy the guard
    # explicitly — NULLs propagate through the scaled sum and are
    # skipped by the window aggregates, exactly as before the guard.
    chk = F.assert_true(
        col.isNull() | (F.abs(scaled) < F.lit(9.223372036854775e18)),
        F.concat(
            F.lit("_scaled_long overflow: |value * scale| exceeds "
                  "int64 for value "),
            col.cast("string"),
        ),
    )
    return F.when(chk.isNull(), F.floor(scaled).cast("long"))


def _windowed_avg(v: Column, frame) -> Column:
    """THE trailing-average expression (scaled-long exact): shared by
    moving_avg and rolling_stats so the standalone and composed
    operators cannot diverge (review finding — the bodies used to be
    copy-pasted; same sharing rule as aggregates._approx_ok)."""
    s = F.sum(_scaled_long(v)).over(frame).cast("double")
    return F.round(s / F.lit(1e6) / F.count(F.lit(1)).over(frame), 6)


def _windowed_z(v: Column, frame, min_points: int) -> Column:
    """THE rolling z-score expression (explicit integer-exact
    sum/sum-of-squares variance): shared by rolling_zscore and
    rolling_stats — see _windowed_avg."""
    cnt = F.count(F.lit(1)).over(frame)
    s1 = F.sum(_scaled_long(v)).over(frame).cast("double") / F.lit(1e6)
    s2 = F.sum(_scaled_long(v * v)).over(frame).cast("double") / F.lit(1e6)
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    return F.when(
        (cnt >= min_points) & (var > 0),
        F.round((v - mean) / F.sqrt(var), 6),
    )


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

    Exactness: the windowed SUM runs over scaled longs (``_scaled_long``)
    so sliding-window accumulator strategies can't introduce float
    drift, while staying on the primitive window fast path.
    """
    w = _series_window(series_col, time_col, id_col).rowsBetween(-(n - 1), 0)
    return events.select(
        F.col(id_col),
        _windowed_avg(F.col(value_col), w).alias("mov_avg"),
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

    Variance is computed explicitly from integer-exact sum and
    sum-of-squares (``(Σx² - (Σx)²/n) / (n-1)``) instead of a built-in
    stddev aggregate — built-ins use engine-specific accumulation
    (Welford vs naive) whose float results differ across engines, which
    would break reproducibility and oracle hashing. Both sums quantize
    to scaled longs (see ``_scaled_long``): exact, order-independent,
    and on the vectorized window path. NULL until ``min_points`` and
    when variance degenerates."""
    w = _series_window(series_col, time_col, id_col).rowsBetween(-(n - 1), 0)
    return events.select(
        F.col(id_col),
        _windowed_z(F.col(value_col), w, min_points).alias("z"),
    )


def lag_rate(
    events: DataFrame,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-series delta AND instantaneous rate (Δvalue / Δseconds) in
    one pass — ``lag_delta`` and ``resample.rate`` share the same window
    spec, so computing both costs a single shuffle + sort (Catalyst
    plans one Window operator). NULL for each series' first point."""
    w = _series_window(series_col, time_col, id_col)
    v = F.col(value_col)
    us = F.unix_micros(F.col(time_col).cast("timestamp"))
    dv = v - F.lag(value_col).over(w)
    dt = (us - F.lag(us).over(w)).cast("double") / F.lit(1_000_000.0)
    return events.select(
        F.col(id_col),
        dv.alias("delta"),
        F.round(dv / dt, 6).alias("rate"),
    )


def rolling_stats(
    events: DataFrame,
    n_avg: int = 5,
    n_z: int = 20,
    min_points: int = 5,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Trailing moving average (``n_avg`` frame) and rolling z-score
    (``n_z`` frame) in one pass: both frames share the window partition
    and sort, so Catalyst evaluates them after ONE shuffle + sort (two
    Window operators over the same ordering — no re-exchange). Sums are
    scaled-long exact (``_scaled_long``)."""
    base = _series_window(series_col, time_col, id_col)
    wa = base.rowsBetween(-(n_avg - 1), 0)
    wz = base.rowsBetween(-(n_z - 1), 0)
    v = F.col(value_col)
    return events.select(
        F.col(id_col),
        _windowed_avg(v, wa).alias("mov_avg"),
        _windowed_z(v, wz, min_points).alias("z"),
    )


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
