"""Skew mitigation for joins: key salting.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime and is the first line of defense. Salting is the
explicit fallback for the cases AQE can't fix — e.g. a single hot key
joined against a non-broadcastable dimension: the hot side gets a
random-ish salt in [0, factor), the other side is replicated across all
salts, and the join key becomes (key, salt), spreading one hot key over
``factor`` reducers.

The salt must be DETERMINISTIC (reproducibility, speculative-retry
safety) — derived from stable row columns via xxhash64, never rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, salt_from: list[str] | None, factor: int, col_name: str = "__salt"
) -> DataFrame:
    """Add a deterministic salt column in [0, factor).

    ``salt_from``: columns whose hash spreads the rows (pick columns
    that vary within the hot key, e.g. the row id). ``pmod`` keeps the
    result non-negative."""
    cols = [F.col(c) for c in (salt_from or [])]
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*cols), F.lit(factor)).cast("int")
    )


def replicate_for_salt(
    df: DataFrame, factor: int, col_name: str = "__salt"
) -> DataFrame:
    """Replicate every row once per salt value (the dimension side of a
    salted join)."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    ).withColumn(col_name, F.col(col_name).cast("int"))


def salted_join(
    hot: DataFrame,
    dim: DataFrame,
    on: list[str],
    factor: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join where ``hot`` has skewed keys: join on (keys + salt),
    with ``dim`` replicated ``factor``x. Equivalent result to
    ``hot.join(dim, on, how)`` for inner/left joins; the shuffle for
    each hot key is spread over ``factor`` partitions."""
    h = with_salt(hot, salt_from or on, factor)
    d = replicate_for_salt(dim, factor)
    return h.join(d, on + ["__salt"], how).drop("__salt")
