"""Property-based oracle tests (SURVEY.md §5 item 6): random time
ranges / limits / series subsets against DuckDB on `events`. Catches
boundary semantics (inclusive/exclusive, tie-breaks, empty ranges) that
fixed queries miss."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMOKE

SERIES = ["click", "view", "purchase", "signup", "error"]

# events at sf0.001 span 2024-01-01 .. 2024-01-31
DAYS = st.integers(min_value=0, max_value=31)
SECS = st.integers(min_value=0, max_value=86_399)


@pytest.fixture(scope="module")
def duck_events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    d1=DAYS, s1=SECS, span_h=st.integers(min_value=0, max_value=200),
    names=st.lists(st.sampled_from(SERIES), min_size=1, max_size=3, unique=True),
    limit=st.one_of(st.none(), st.integers(min_value=0, max_value=500)),
)
def test_random_range_scan(spark, duck_events, d1, s1, span_h, names, limit):
    from datetime import datetime, timedelta

    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    t_from = datetime(2024, 1, 1) + timedelta(days=d1, seconds=s1)
    t_to = t_from + timedelta(hours=span_h)
    f = t_from.strftime("%Y-%m-%d %H:%M:%S")
    t = t_to.strftime("%Y-%m-%d %H:%M:%S")

    ev = tables.load_table(spark, SF_SMOKE, "events", keep_raw_ns=True)
    sdf = core.query_range(ev, names, f, t, limit).select(
        "event_id", "value"
    )
    spark_rows = sorted(tuple(r) for r in sdf.collect())

    in_list = ", ".join(f"'{n}'" for n in names)
    limit_sql = f"LIMIT {limit}" if limit is not None else ""
    oracle_rows = sorted(
        duck_events.execute(
            f"""
            SELECT event_id, value FROM (
              SELECT * FROM events
              WHERE event_type IN ({in_list})
                AND ts >= TIMESTAMP '{f}' AND ts <= TIMESTAMP '{t}'
              ORDER BY ts, event_id {limit_sql})
            """
        ).fetchall()
    )
    assert spark_rows == oracle_rows


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(d=DAYS, s=SECS)
def test_random_retention_cutoff(spark, duck_events, d, s):
    from datetime import datetime, timedelta

    from timeseries_data_provider_spark import tables
    from timeseries_data_provider_spark.operators import core

    cutoff = datetime(2024, 1, 1) + timedelta(days=d, seconds=s)
    cs = cutoff.strftime("%Y-%m-%d %H:%M:%S")
    ev = tables.load_table(spark, SF_SMOKE, "events")
    n_spark = core.expired_count(ev, cs).collect()[0]["n"]
    n_oracle = duck_events.execute(
        f"SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '{cs}'"
    ).fetchone()[0]
    assert n_spark == n_oracle


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(
                ["footer", "banner", "alpha", "beta", "gamma",
                 "delta x", "", "  spaced  "]
            ),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    min_df=st.integers(min_value=1, max_value=4),
)
def test_line_dedup_matches_python_reference(spark, docs, min_df):
    """line_dedup vs an independent in-Python reference over random
    multi-line documents (duplicate lines within and across docs,
    empty lines, whitespace-only lines)."""
    from timeseries_data_provider_spark.operators import dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]

    # reference: df = number of DISTINCT docs containing the line
    from collections import Counter

    df_count = Counter()
    for i, text in rows:
        for line in set(text.split("\n")):
            df_count[line] += 1
    expect = {}
    for i, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if df_count[l] < min_df]
        expect[i] = (len(lines), len(kept), "\n".join(kept))

    out = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in dedup.line_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), min_df=min_df
        ).collect()
    }
    assert out == expect
