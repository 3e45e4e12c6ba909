"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.1 "Stateful ops"): a per-series streaming EWMA whose
state (the running average) survives across micro-batches.

This is the template for any custom sketch/accumulator the built-in
streaming aggregates can't express: state is a tiny fixed-width tuple
per key, so state store size scales with |series|, not data volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("name", StringType()),
        StructField("n_seen", LongType()),
        StructField("ewma", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("ewma", DoubleType()),
    ]
)


def streaming_ewma(stream: DataFrame, alpha: float = 0.3) -> DataFrame:
    """Per-series streaming EWMA over a metrics stream
    ``(name, time, value)``; emits one (name, n_seen, ewma) row per
    series per micro-batch that saw data."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (name,) = key
        if state.exists:
            n_seen, y = state.get
        else:
            n_seen, y = 0, None
        for pdf in pdfs:
            for v in pdf.sort_values("time")["value"]:
                y = float(v) if y is None else alpha * float(v) + (1 - alpha) * y
                n_seen += 1
        state.update((n_seen, y))
        yield pd.DataFrame(
            {"name": [name], "n_seen": [n_seen], "ewma": [round(y, 6)]}
        )

    return stream.groupBy("name").applyInPandasWithState(
        update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
