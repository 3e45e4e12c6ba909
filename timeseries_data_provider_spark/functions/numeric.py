"""Order-independent float aggregation helpers.

Summing float64 is not associative: a distributed SUM's result depends
on partitioning, so two runs (or Spark vs an oracle engine) can differ
in the low bits — which breaks exact value-hash comparison and makes
results non-reproducible. The fix: quantize each addend to a DECIMAL
before summing. Decimal addition is exact and order-independent, so the
aggregate is bit-stable under any partitioning, then one final cast back
to double. Cost: negligible (decimal sum is still a JVM-side hash-agg;
no shuffle shape change).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def stable_sum(col: Column, alias: str) -> Column:
    """Exact, order-independent SUM of a double column (as double)."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def stable_avg(col: Column, alias: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum / count, rounded."""
    return F.round(
        F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)), scale
    ).alias(alias)
