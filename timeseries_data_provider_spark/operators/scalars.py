"""Scalar-function surface coverage (SURVEY.md §2.1 "String / date /
math / JSON scalar functions"): compact queries exercising the function
families the reference touched (date formatting index.js:12, epoch-ms
index.js:122, JSON extraction config.js.dist:28) plus the standard
string/date kit a SQL user expects. All JVM expressions, all inside
whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def part_string_features(part: DataFrame) -> DataFrame:
    """substr/upper/replace/length/contains over the part dimension."""
    return part.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("head"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_s"),
        F.length("p_type").cast("long").alias("type_len"),
        F.when(F.col("p_name").like("%a%"), 1).otherwise(0)
        .cast("long")
        .alias("has_a"),
        F.concat_ws("|", "p_brand", "p_type").alias("tag"),
    )


def orders_by_month(orders: DataFrame) -> DataFrame:
    """extract(year/month) rollup with an exact total."""
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("total"),
    )
