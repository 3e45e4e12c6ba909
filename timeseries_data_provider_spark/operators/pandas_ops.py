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
    ``y_t = alpha * x_t + (1 - alpha) * y_{t-1}`` (recursive — not
    expressible with SQL window frames, which cannot reference their own
    output). Rounded to 6 so results are float-stable."""

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([time_col, id_col])
        y = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {"event_id": pdf[id_col].astype("int64"), "ewma": y.round(6)}
        )

    return events.groupBy(series_col).applyInPandas(compute, EWMA_SCHEMA)
