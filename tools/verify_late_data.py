#!/usr/bin/env python
"""Late-data end-to-end drive of the watermarked streaming rollup
(VERDICT r4 #8 — the stretch item completing the streaming story that
tools/verify_streaming.py started).

The reference stamps samples at INGEST time (index.js:250-257), so late
data cannot exist in its world (SURVEY §1.1 "N/A BY CONSTRUCTION").
This script feeds EVENT-timestamped data — with planted stragglers —
through the shipped ``windowed_rollup_stream`` (streaming/window_agg.py)
and pins the three behaviors a watermarked aggregation must show:

1. a straggler arriving batches later but INSIDE the watermark horizon
   still lands in its (still-open) event-time window;
2. a straggler BEYOND the watermark is dropped — the closed window is
   never revised and append mode emits each window exactly once;
3. state stays bounded: closed windows leave the state store.

Timeline (window = 1 minute, watermark = 2 minutes, series "cpu";
the file source makes each parquet append its own microbatch, and
Spark computes batch N's watermark from data through batch N-1):

  B1  10:00:10 v=1, 10:00:20 v=2        → W1 [10:00,10:01) open
  B2  10:00:40 v=4  (LATE, wm=09:58:20 → accepted into W1)
      10:03:30 v=8                       → advances max event time
  B3  10:10:00 v=16                      → wm=10:01:30 closes W1:
                                           EMIT W1 n=3 avg=7/3
  B4  10:00:50 v=32 (TOO LATE, wm=10:08 → dropped)
      10:20:00 v=64                      → EMIT W2 [10:03,10:04) n=1
  B5  10:30:00 v=128                     → EMIT W3 [10:10,10:11) n=1;
      a trailing batch at wm=10:28 also closes [10:20,10:21) — only
      [10:30,10:31) stays open

Run:  python tools/verify_late_data.py
Exit 0 and "LATE DATA E2E: PASS"; output checked in at
tools/verify_late_data_output.txt.
"""

from __future__ import annotations

import sys
import tempfile
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from timeseries_data_provider_spark.session import get_spark
from timeseries_data_provider_spark.streaming.ingest import METRICS_SCHEMA
from timeseries_data_provider_spark.streaming.window_agg import (
    windowed_rollup_stream,
)

CHECKS: list[tuple[str, bool]] = []


def check(name: str, ok: bool) -> None:
    CHECKS.append((name, ok))
    print(f"  [{'ok' if ok else 'FAIL'}] {name}")


def ts(hh: int, mm: int, ss: int) -> datetime:
    return datetime(2024, 1, 1, hh, mm, ss)


def main() -> int:
    spark = get_spark("tdps-late-data-e2e")
    table = tempfile.mkdtemp(prefix="tdps_late_src_")
    ckpt = tempfile.mkdtemp(prefix="tdps_late_ckpt_")

    def append(rows) -> None:
        spark.createDataFrame(
            [("cpu", t, float(v)) for t, v in rows], METRICS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(table)

    # the stream must exist before the first file lands? No — the file
    # source picks up pre-existing files in batch 0; seed B1 first so
    # the demo starts with data.
    append([(ts(10, 0, 10), 1), (ts(10, 0, 20), 2)])

    agg = windowed_rollup_stream(
        spark, table, window="1 minute", watermark="2 minutes"
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("late_demo")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        query.processAllAvailable()
        emitted = spark.sql("SELECT * FROM late_demo").collect()
        check("B1: open window emits nothing yet", len(emitted) == 0)

        # B2: straggler for W1 (inside watermark) + window-W2 event
        append([(ts(10, 0, 40), 4), (ts(10, 3, 30), 8)])
        query.processAllAvailable()

        # B3: advance watermark past W1's end -> W1 emits
        append([(ts(10, 10, 0), 16)])
        query.processAllAvailable()
        rows = {
            r["w_start"].strftime("%H:%M"): r
            for r in spark.sql("SELECT * FROM late_demo").collect()
        }
        w1 = rows.get("10:00")
        check("B3: W1 emitted after watermark passed", w1 is not None)
        check(
            "B3: within-watermark straggler counted (n=3, avg=7/3)",
            w1 is not None
            and w1["n"] == 3
            and abs(w1["avg_v"] - 7.0 / 3.0) < 1e-12
            and w1["min_v"] == 1.0
            and w1["max_v"] == 4.0,
        )

        # B4: too-late straggler (beyond watermark) + advance further
        append([(ts(10, 0, 50), 32), (ts(10, 20, 0), 64)])
        query.processAllAvailable()
        # B5: close W3
        append([(ts(10, 30, 0), 128)])
        query.processAllAvailable()

        final = spark.sql(
            "SELECT * FROM late_demo ORDER BY w_start"
        ).collect()
        w1_rows = [r for r in final if r["w_start"] == ts(10, 0, 0)]
        check(
            "B4: too-late straggler dropped — W1 emitted exactly once, "
            "still n=3 (v=32 nowhere)",
            len(w1_rows) == 1
            and w1_rows[0]["n"] == 3
            and all(r["max_v"] != 32.0 for r in final),
        )
        check(
            "B4/B5: later windows emitted once closed "
            "([10:03] n=1 v=8, [10:10] n=1 v=16)",
            {(r["w_start"].strftime("%H:%M"), r["n"], r["avg_v"]) for r in final}
            >= {("10:03", 1, 8.0), ("10:10", 1, 16.0)},
        )
        # processAllAvailable runs a trailing microbatch with the B5
        # watermark (10:28), which legitimately closes [10:20,10:21)
        # too — only [10:30,10:31) is still inside the horizon
        check(
            "window still inside the watermark horizon ([10:30]) "
            "not emitted",
            all(r["w_start"] < ts(10, 30, 0) for r in final),
        )

        progress = query.lastProgress
        state = (progress or {}).get("stateOperators") or []
        n_state = state[0]["numRowsTotal"] if state else None
        check(
            "state bounded to open windows (numRowsTotal <= 2)",
            n_state is not None and n_state <= 2,
        )
        wm = ((progress or {}).get("eventTime") or {}).get("watermark", "")
        check("watermark advanced to 10:28 (10:30 - 2m)", "10:28:00" in wm)
    finally:
        query.stop()
        spark.stop()

    failed = [n for n, ok in CHECKS if not ok]
    print(
        f"\nLATE DATA E2E: {'PASS' if not failed else 'FAIL'} "
        f"({len(CHECKS) - len(failed)}/{len(CHECKS)} checks)"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
