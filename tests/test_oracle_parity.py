"""Mirror of the driver's t2 correctness gate: run every ``queries()``
entry on Spark and its ``oracle_sql()`` on DuckDB over the same parquet,
then compare row count, column names, and exact values (columns sorted
by name, rows sorted) — the same canonicalization the driver hashes.

Runs at sf0.001 for speed; the driver runs sf0.01. Set
TDPS_TEST_SF=/root/testdata/sf0.01 to run the full t2 locally.
"""

from __future__ import annotations

import math
import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE, register_duck_views

SF_DIR = os.environ.get("TDPS_TEST_SF", SF_SMOKE)

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def canon(df_pandas):
    """Driver-style canonical form: columns sorted by name, rows sorted."""
    import pandas as pd

    df = df_pandas[sorted(df_pandas.columns)].copy()
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )
    return df


def values_equal(a, b) -> bool:
    if a is b:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        pytest.skip(f"{name}: no oracle (rows-only check)")
    register_duck_views(duck, SF_DIR)

    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(ORACLES[name]).fetchdf()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} "
        f"oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    )

    a, b = canon(sdf), canon(odf)
    for col in a.columns:
        av, bv = list(a[col]), list(b[col])
        mism = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(av, bv))
            if not (
                (x is None and y is None)
                or (_isnan(x) and _isnan(y))
                or values_equal(x, y)
            )
        ]
        assert not mism, f"{name}.{col}: {len(mism)} mismatches, first 5: {mism[:5]}"


def _isnan(x) -> bool:
    try:
        return x is None or (isinstance(x, float) and math.isnan(x))
    except TypeError:
        return False


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
