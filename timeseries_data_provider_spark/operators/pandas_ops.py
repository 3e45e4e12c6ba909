"""[EXT] Operators whose semantics the built-in expression language
genuinely cannot express — recursive/stateful per-series computations —
implemented as Arrow-batched grouped pandas UDFs (``applyInPandas``).

This is the deliberate escape hatch of the architecture (README "no
Python in the hot path" — EXCEPT here, where the recurrence forces it):
one shuffle on the series key, then each series is processed as a
columnar pandas frame, vectorized, never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def ewma(
    events: DataFrame,
    alpha: float = 0.3,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially weighted moving average per series:
    ``y_1 = x_1; y_t = alpha * x_t + (1 - alpha) * y_{t-1}`` (recursive
    — not expressible with SQL window frames, which cannot reference
    their own output). Rounded to 6 so results are float-stable.

    The recurrence is spelled out as explicit IEEE-double steps
    (``alpha * x + one_minus * y``, ``one_minus`` computed once as
    ``1.0 - alpha``) rather than ``pandas.ewm`` so the DuckDB
    recursive-CTE oracle — which performs the literally identical
    float operations in the identical order — reproduces every y_t
    bit-for-bit (pandas.ewm's internal weighted-average formulation
    differs by ~1 ulp per step, enough to flip a 6-decimal rounding).
    """
    one_minus = 1.0 - alpha

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([time_col, id_col])
        x = pdf[value_col].to_numpy(dtype="float64")
        y = np.empty_like(x)
        if len(x):
            acc = x[0]
            y[0] = acc
            for i in range(1, len(x)):
                acc = alpha * x[i] + one_minus * acc
                y[i] = acc
        return pd.DataFrame(
            {"event_id": pdf[id_col].astype("int64"), "ewma": np.round(y, 6)}
        )

    return events.groupBy(series_col).applyInPandas(compute, EWMA_SCHEMA)


LTTB_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)


def lttb_downsample(
    events: DataFrame,
    n_out: int = 100,
    series_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    y_scale: int = 1000,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series — the
    visually-faithful alternative to LIMIT/averaging that Grafana-class
    UIs use (the reference capped at ``maxDataPoints`` by truncation,
    index.js:106; LTTB keeps the shape of the series).

    Inherently sequential per series (each pick depends on the previous
    pick), so it lives in the applyInPandas escape hatch with a
    vectorized per-bucket area computation.

    Engine-portable determinism: x is the per-series sample rank (sorted
    by time, id — the equal-spacing LTTB variant), y is quantized to
    ``floor(value * y_scale)``, and triangle areas are compared after
    multiplying through by the next-bucket count (a positive constant
    per step, so the argmax is unchanged) — every comparison is exact
    int64 arithmetic, reproducible bit-for-bit by the DuckDB
    recursive-CTE oracle (q48). Interior points i in [1, n-2] fall in
    bucket ``((i-1)*(n_out-2)) // (n-2)``. Ties → smallest index.
    Returns the selected (name, event_id, value) points.
    """
    import numpy as np

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([time_col, id_col]).reset_index(drop=True)
        n = len(pdf)
        name = pdf[series_col].iloc[0]
        if n <= n_out:
            return pd.DataFrame(
                {
                    "name": name,
                    "event_id": pdf[id_col].astype("int64"),
                    "value": pdf[value_col].astype("float64"),
                }
            )
        m = n_out - 2  # interior buckets
        yi = np.floor(
            pdf[value_col].to_numpy(dtype="float64") * y_scale
        ).astype("int64")
        # Overflow guard (review finding): the area terms below are
        # numpy int64 products — they WRAP silently past 2^63 (DuckDB
        # would raise, so the documented bit-for-bit oracle parity
        # would break too). Conservative bound over every term:
        # |a*cnt - sx| <= 2*n*cnt_max, |yi - ay| <= 2*max|yi|, second
        # term smaller — 8*n*cnt_max*max|yi| covers the sum. Exact
        # Python-int arithmetic, so the check itself cannot overflow.
        cnt_max = (n - 2 + m - 1) // m + 1
        max_abs_y = int(np.abs(yi).max())
        if 8 * n * cnt_max * max(1, max_abs_y) >= 2**63:
            raise ValueError(
                f"lttb_downsample: int64 area arithmetic would overflow "
                f"(n={n}, max|value*y_scale|={max_abs_y}); reduce "
                f"y_scale or pre-scale the value column"
            )
        interior = np.arange(1, n - 1, dtype="int64")
        b_of = ((interior - 1) * m) // (n - 2)
        # per-bucket [start, end) offsets into `interior` (b_of is sorted)
        starts = np.searchsorted(b_of, np.arange(m))
        ends = np.searchsorted(b_of, np.arange(m), side="right")
        picked = [0]
        a = 0
        for b in range(m):
            idxs = interior[starts[b] : ends[b]]
            if b < m - 1:
                nidx = interior[starts[b + 1] : ends[b + 1]]
                cnt = len(nidx)
                sx = int(nidx.sum())
                sy = int(yi[nidx].sum())
            else:
                cnt, sx, sy = 1, n - 1, int(yi[n - 1])
            ay = int(yi[a])
            areas = np.abs(
                (a * cnt - sx) * (yi[idxs] - ay)
                - (a - idxs) * (sy - ay * cnt)
            )
            a = int(idxs[int(np.argmax(areas))])
            picked.append(a)
        picked.append(n - 1)
        sel = pdf.iloc[picked]
        return pd.DataFrame(
            {
                "name": name,
                "event_id": sel[id_col].astype("int64"),
                "value": sel[value_col].astype("float64"),
            }
        )

    return events.groupBy(series_col).applyInPandas(compute, LTTB_SCHEMA)
