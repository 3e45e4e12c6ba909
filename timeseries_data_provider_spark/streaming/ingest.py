"""Metrics collector: the reference's 1-second scheduler tick
(/root/reference/index.js:225-284) as a Structured Streaming job.

Mapping (SURVEY.md §3.2):
- ``setInterval(..., 1000)`` (index.js:225)        → rate source +
  ``trigger(processingTime='1 second')`` driving ``foreachBatch``.
- per-source due-check vs lastRun+interval (index.js:238) → driver-side
  state dict, exactly like the reference's ``proxyCollection``
  (index.js:215-223). Driver state is the right place: the source list
  is config-sized (not data-sized); promotion to
  ``applyInPandasWithState`` only pays off with millions of sources.
- axios fetch + transformResponse (index.js:242-246) → pluggable
  fetcher (urllib default) + SourceConfig.extract; null samples dropped
  (index.js:246), per-source failures isolated (index.js:259-263).
- writePoints with no timestamp (index.js:250-257) → append of
  ``(name, time=now, value)`` — ingest-time stamping preserved, so
  event-time == processing-time and late data cannot exist (SURVEY §1.1).
- autoRemove (index.js:268-282) → retention due-check in the same tick,
  strict ``<`` cutoff (see retention.py).

The sink is a parquet table partitioned by ``name`` (+ ``date`` derived
from the ingest time at scale): partition pruning then serves the
reference's per-measurement queries (index.js:106) without touching
other series.
"""

from __future__ import annotations

import time as _time
import urllib.request
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from .config import SourceConfig
from .retention import apply_retention

METRICS_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("time", TimestampNTZType(), False),
        StructField("value", DoubleType(), False),
    ]
)


def default_fetcher(source: SourceConfig) -> str:
    """HTTP GET via stdlib (reference used axios, index.js:242)."""
    req = urllib.request.Request(source.url, method=source.method or "GET")
    with urllib.request.urlopen(req, timeout=10) as resp:  # noqa: S310
        return resp.read().decode("utf-8")


@dataclass
class _SourceState:
    """Mirror of the reference's per-proxy scheduler state
    (index.js:218-222: lastRun / lastRemove)."""

    last_run: float = 0.0
    last_remove: float = 0.0


class MetricsCollector:
    """Periodic HTTP poll → append to the metrics table.

    ``run_streaming`` drives it with a real Structured Streaming query;
    ``tick`` is the testable core (one scheduler tick at a given time).
    """

    def __init__(
        self,
        spark: SparkSession,
        sources: list[SourceConfig],
        table_path: str,
        fetcher: Callable[[SourceConfig], str] | None = None,
        now: Callable[[], float] | None = None,
    ) -> None:
        self.spark = spark
        self.sources = sources
        self.table_path = table_path
        self.fetcher = fetcher or default_fetcher
        self.now = now or _time.time
        # active && interval > 0, reference index.js:215-217
        self.state: dict[str, _SourceState] = {
            s.name: _SourceState()
            for s in sources
            if s.active and s.interval > 0
        }

    # -- one scheduler tick (index.js:226-284) ---------------------------

    def tick(self, tick_time: float | None = None) -> int:
        """Run one tick; returns number of samples written."""
        t = self.now() if tick_time is None else tick_time
        rows: list[tuple[str, datetime, float]] = []
        for source in self.sources:
            st = self.state.get(source.name)
            if st is None:
                continue  # inactive (index.js:103 / :215-217)
            # collection due-check (index.js:238)
            if t - st.last_run >= source.interval:
                st.last_run = t
                try:
                    body = self.fetcher(source)
                    value = source.extract(body)
                    if value is not None:  # null guard, index.js:246
                        ts = datetime.fromtimestamp(t, tz=timezone.utc).replace(
                            tzinfo=None
                        )
                        rows.append((source.name, ts, float(value)))
                except Exception as exc:  # isolation, index.js:259-263
                    print(f"[collector] {source.name}: {exc}")
            # retention due-check (index.js:269)
            if (
                source.remove_interval
                and source.remove_age
                and t - st.last_remove >= source.remove_interval
            ):
                st.last_remove = t
                try:
                    apply_retention(
                        self.spark,
                        self.table_path,
                        source.name,
                        source.remove_age,
                        now_epoch=t,
                    )
                except Exception as exc:
                    print(f"[retention] {source.name}: {exc}")
        if rows:
            batch = self.spark.createDataFrame(rows, METRICS_SCHEMA)
            (
                batch.coalesce(1)
                .write.mode("append")
                .partitionBy("name")
                .parquet(self.table_path)
            )
        return len(rows)

    # -- streaming driver ------------------------------------------------

    def run_streaming(
        self,
        trigger_seconds: int = 1,
        checkpoint_dir: str | None = None,
    ):
        """Start the collector as a Structured Streaming query (rate
        source paces the ticks; all work happens in foreachBatch on the
        driver, like the reference's single event loop)."""
        stream = (
            self.spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .load()
        )

        def process(batch_df: DataFrame, batch_id: int) -> None:
            self.tick()

        writer = (
            stream.writeStream.foreachBatch(process)
            .trigger(processingTime=f"{trigger_seconds} seconds")
        )
        if checkpoint_dir:
            writer = writer.option("checkpointLocation", checkpoint_dir)
        return writer.start()


def read_metrics(spark: SparkSession, table_path: str) -> DataFrame:
    """Read the metrics table (partition-pruned scans on ``name``)."""
    return spark.read.schema(METRICS_SCHEMA).parquet(table_path)


def collector_replay(
    spark: SparkSession,
    n_ticks: int = 60,
    base_epoch: int = 1_000_000_000,
    table_path: str | None = None,
) -> DataFrame:
    """Deterministic replay of the collector scheduler for correctness
    scoring: drives ``MetricsCollector.tick`` — the REAL due-check,
    fetch, extract, null-guard, failure-isolation, and parquet-append
    code — through a fixed trace of ``n_ticks`` 1-second ticks, then
    returns the per-source summary of what actually landed in the
    table. Because every input is closed-form, a SQL oracle can
    recompute the expected counts/sums/timestamps from scratch, giving
    the collector path (reference index.js:238 cadence, :246 null
    guard, :250-257 ingest-time write, :259-263 failure isolation) a
    driver-scorable correctness row (VERDICT r3 item 1).

    The planted trace:

    - ``a``/``b``/``c`` (interval 2/3/5): plain cadence — the
      due-check ``t - last_run >= interval`` over 1 s ticks fires at
      exactly ``i % interval == 0``.
    - ``d`` (interval 4): the fetched body is missing the JSON key on
      every other fire → ``extract`` returns None → sample dropped
      (index.js:246), BUT the fire consumed the slot (last_run is
      stamped before the fetch, index.js:239) → rows at ``i % 8 == 0``.
    - ``e`` (interval 6): the fetcher RAISES on every other fire →
      isolated per-source (index.js:259-263), slot consumed → rows at
      ``i % 12 == 0``.
    - ``x`` (inactive) and ``z`` (interval 0): excluded at startup
      (index.js:215-217) → no rows at all.

    Each fired sample's value is ``ord*100 + i`` (ord = 1..5 for
    a..e) and its ingest-time stamp is the tick's epoch second, so
    sum/min/max are exactly reproducible. Returns
    (name, n_points, sum_value, first_ms, last_ms).

    SIDE EFFECT AT CONSTRUCTION (ADVICE r4): the ``n_ticks`` replay —
    44 tiny parquet appends at the default trace — executes EAGERLY
    when this function is called, not when the returned DataFrame is
    evaluated; explain-only tooling that constructs every declared
    query pays the writes (which is why bench.py lists q65 in
    NON_BENCH). With ``table_path=None`` the table lands in a mkdtemp
    directory that is removed at interpreter exit (atexit) — it cannot
    be removed earlier because the returned DataFrame reads it lazily.
    """
    import atexit
    import json as _json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.session import ensure_runtime_confs

    # Every other declared query forces the runtime confs via the table
    # loader; this one takes no tables, so force them here — the
    # first_ms/last_ms math (unix_millis over a cast NTZ) requires
    # spark.sql.session.timeZone=UTC on driver-owned sessions.
    ensure_runtime_confs(spark)

    if table_path is None:
        table_path = tempfile.mkdtemp(prefix="tdps_collector_replay_")
        atexit.register(shutil.rmtree, table_path, True)

    ords = {"a": 1, "b": 2, "c": 3, "d": 4, "e": 5}
    sources = [
        SourceConfig(name="a", interval=2),
        SourceConfig(name="b", interval=3),
        SourceConfig(name="c", interval=5),
        SourceConfig(name="d", interval=4),
        SourceConfig(name="e", interval=6),
        SourceConfig(name="x", active=False, interval=2),
        SourceConfig(name="z", interval=0),
    ]
    cur = {"i": 0}

    def fetcher(source: SourceConfig) -> str:
        i = cur["i"]
        if source.name == "e" and (i // 6) % 2 == 1:
            raise RuntimeError("planted fetch failure (isolation path)")
        if source.name == "d" and (i // 4) % 2 == 1:
            return "{}"  # missing key -> extract None -> null guard
        return _json.dumps({"count": ords[source.name] * 100 + i})

    collector = MetricsCollector(
        spark, sources, table_path, fetcher=fetcher
    )
    for i in range(n_ticks):
        cur["i"] = i
        collector.tick(float(base_epoch + i))

    ms = F.unix_millis(F.col("time").cast("timestamp"))
    return read_metrics(spark, table_path).groupBy("name").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("value").cast("bigint").alias("sum_value"),
        F.min(ms).alias("first_ms"),
        F.max(ms).alias("last_ms"),
    )
