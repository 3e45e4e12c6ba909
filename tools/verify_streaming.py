#!/usr/bin/env python
"""End-to-end live drive of the reference's full loop (VERDICT r1 #8):

    fake HTTP metric endpoints
      -> MetricsCollector.run_streaming (real Structured Streaming,
         rate source, 1 s trigger — reference index.js:225-284)
      -> parquet metrics table partitioned by name (with one source's
         retention firing mid-run, index.js:268-282)
      -> serving.http_server over a real socket with Basic Auth
      -> /search + /query (timeseries AND table shapes) via urllib
         (reference index.js:52-157)

Run:  python tools/verify_streaming.py
Exit 0 and a "STREAMING E2E: PASS" line mean every stage worked; the
captured output is checked in at tools/verify_streaming_output.txt.

Everything here exercises code shipped in the package — the only
test-local pieces are the fake endpoint and the assertions.
"""

from __future__ import annotations

import base64
import json
import sys
import tempfile
import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from timeseries_data_provider_spark.serving import http_server
from timeseries_data_provider_spark.serving.grafana import search
from timeseries_data_provider_spark.session import get_spark
from timeseries_data_provider_spark.streaming.config import SourceConfig
from timeseries_data_provider_spark.streaming.ingest import (
    MetricsCollector,
    read_metrics,
)

RUN_SECONDS = 60  # upper bound; the run stops as soon as the target state is seen


def start_fake_endpoint() -> tuple[ThreadingHTTPServer, dict[str, int]]:
    """A metrics endpoint in the shape the reference polls
    (config.js.dist:25-35: JSON body carrying a scalar `count`).
    /cpu and /mem return monotonically increasing counters; /flaky
    alternates success and HTTP 500 to exercise per-source failure
    isolation (index.js:259-263)."""
    hits = {"cpu": 0, "mem": 0, "flaky": 0}

    class Endpoint(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:
            pass

        def do_GET(self) -> None:
            kind = self.path.strip("/")
            hits[kind] = hits.get(kind, 0) + 1
            if kind == "flaky" and hits[kind] % 2 == 0:
                self.send_response(500)
                self.end_headers()
                return
            body = json.dumps({"count": hits[kind] * 10}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = ThreadingHTTPServer(("127.0.0.1", 0), Endpoint)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, hits


def http_json(url: str, payload: dict | None = None, auth: str | None = None):
    req = urllib.request.Request(
        url, method="GET" if payload is None else "POST"
    )
    if payload is not None:
        req.data = json.dumps(payload).encode()
        req.add_header("Content-Type", "application/json")
    if auth:
        req.add_header(
            "Authorization", "Basic " + base64.b64encode(auth.encode()).decode()
        )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as exc:
        return exc.code, exc.read().decode(errors="replace")[:200]


def main() -> int:
    checks: list[tuple[str, bool, str]] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        checks.append((name, bool(ok), detail))
        print(f"  [{'ok' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))

    endpoint, hits = start_fake_endpoint()
    base = f"http://127.0.0.1:{endpoint.server_address[1]}"
    spark = get_spark("tdps-streaming-e2e")
    tmp = Path(tempfile.mkdtemp(prefix="tdps_e2e_"))
    table = str(tmp / "metrics")

    sources = [
        SourceConfig(name="cpu", interval=1, url=f"{base}/cpu"),
        SourceConfig(name="mem", interval=2, url=f"{base}/mem"),
        SourceConfig(name="flaky", interval=1, url=f"{base}/flaky"),
        # retention fires mid-run: age 8 s checked every 3 s. The age
        # must exceed the WORST-CASE micro-batch latency on a loaded
        # host (observed 6 s under contention): with age < tick
        # latency, a retention pass can transiently delete every row
        # before the next append lands, and the harness times out
        # waiting to observe survivors — a scheduling artifact, not an
        # engine defect (the pruning assertion only needs min(time) to
        # move, which age 8 s still proves).
        SourceConfig(
            name="cpu_retained",
            interval=1,
            url=f"{base}/cpu",
            remove_interval=3,
            remove_age=8,
        ),
        SourceConfig(name="ghost", active=False, interval=1, url=f"{base}/cpu"),
    ]

    # warm the JVM + parquet writer path so the first micro-batch does
    # not eat 9 s of the run (observed cold-start on this container)
    spark.createDataFrame([("warm", 0.0)], "name string, value double").write.mode(
        "overwrite"
    ).parquet(str(tmp / "warm"))

    print(f"== stage 1: streaming collect (1 s trigger, up to {RUN_SECONDS} s)")
    collector = MetricsCollector(spark, sources, table)
    query = collector.run_streaming(
        trigger_seconds=1, checkpoint_dir=str(tmp / "ckpt")
    )
    def table_stats() -> dict[str, tuple[int, object]]:
        # the table dir only exists after the first tick's write;
        # concurrent reads during a retention swap see either the old or
        # the new partition, but a file can still vanish between Spark's
        # listing and its read — treat both as transient reader retries
        try:
            return {
                r["name"]: (r["n"], r["t0"])
                for r in read_metrics(spark, table)
                .groupBy("name")
                .agg(F.count("*").alias("n"), F.min("time").alias("t0"))
                .collect()
            }
        except Exception:
            return {}

    # run until the interesting state is OBSERVED (≥3 ticks, and
    # retention has pruned cpu_retained's oldest rows while keeping
    # survivors) rather than sleeping a fixed time: a fixed stop can
    # interrupt mid-tick between a retention pass and its append,
    # making the final counts an artifact of stop timing
    deadline = time.time() + RUN_SECONDS
    stats: dict[str, tuple[int, object]] = {}
    while time.time() < deadline:
        stats = table_stats()
        cpu = stats.get("cpu", (0, None))
        ret = stats.get("cpu_retained", (0, None))
        if (
            cpu[0] >= 3
            and ret[0] > 0
            and ret[1] is not None
            and cpu[1] is not None
            and ret[1] > cpu[1]
        ):
            break
        time.sleep(2)
    query.stop()
    query.awaitTermination(30)
    # assert on the OBSERVED loop state, not a post-stop re-read: a tick
    # interrupted by stop() may have completed its retention pass but
    # not its append, which would make final counts stop-timing noise

    rows = sum(v[0] for v in stats.values())
    by_name = {k: v[0] for k, v in stats.items()}
    print(f"  collected {rows} samples: {by_name}")
    # host contention makes the exact tick count unpredictable (the
    # cold run saw micro-batches fall behind by seconds); assert the
    # cadence CONTRACT, not wall-clock throughput
    check("multiple ticks ran", by_name.get("cpu", 0) >= 3, f"{rows} rows")
    check(
        "mem interval=2 polls <= cpu interval=1",
        0 < by_name.get("mem", 0) <= by_name.get("cpu", 0),
    )
    check(
        "flaky isolation: some succeed, job alive",
        0 < by_name.get("flaky", 99) < by_name.get("cpu", 0) + 2,
    )
    check("inactive source never polled", "ghost" not in by_name)
    part_dirs = sorted(
        p.name for p in Path(table).iterdir() if p.name.startswith("name=")
    )
    check(
        "table partitioned by name",
        all(d.startswith("name=") for d in part_dirs) and len(part_dirs) >= 3,
        ",".join(part_dirs),
    )
    # cpu and cpu_retained poll the same endpoint on the same cadence;
    # retention (age 4 s, every 3 s) must have deleted cpu_retained's
    # oldest rows, so its earliest surviving timestamp is strictly later
    cpu_t0, ret_t0 = stats.get("cpu", (0, None))[1], stats.get(
        "cpu_retained", (0, None)
    )[1]
    check(
        "retention pruned oldest cpu_retained rows",
        cpu_t0 is not None and ret_t0 is not None and ret_t0 > cpu_t0,
        f"cpu min={cpu_t0} cpu_retained min={ret_t0}",
    )

    print("== stage 2: Grafana serving over the collected table")
    metrics = read_metrics(spark, table)
    auth = {"enabled": True, "username": "grafana", "password": "s3cret"}
    known = set(search(metrics))
    server, _ = http_server.serve(metrics, known, auth_config=auth)
    port = server.server_address[1]
    url = f"http://127.0.0.1:{port}"

    code, _ = http_json(f"{url}/", auth=None)
    check("health without creds -> 401", code == 401)
    code, body = http_json(f"{url}/", auth="grafana:s3cret")
    check("health with creds -> ok", code == 200 and body == {"status": "ok"})
    code, body = http_json(f"{url}/search", payload={}, auth="grafana:s3cret")
    check(
        "/search lists collected series",
        code == 200 and set(body) == known and "cpu" in body,
        f"code={code} body={body}",
    )
    payload = {
        "range": {"from": "1970-01-01T00:00:00Z", "to": "2100-01-01T00:00:00Z"},
        "maxDataPoints": 5,
        "targets": [
            {"target": "cpu", "type": "timeseries"},
            {"target": "mem", "type": "table"},
            {"target": "nope", "type": "timeseries"},
        ],
    }
    code, body = http_json(f"{url}/query", payload=payload, auth="grafana:s3cret")
    ts = [b for b in body if b.get("target") == "cpu"]
    tbl = [b for b in body if b.get("type") == "table"]
    check("/query -> 200", code == 200)
    check(
        "timeseries shape: value-ms pairs, capped by maxDataPoints",
        len(ts) == 1
        and 0 < len(ts[0]["datapoints"]) <= 5
        and all(len(p) == 2 for p in ts[0]["datapoints"]),
        f"{len(ts[0]['datapoints']) if ts else 0} points",
    )
    check(
        "datapoints time-ascending",
        bool(ts)
        and ts[0]["datapoints"] == sorted(ts[0]["datapoints"], key=lambda p: p[1]),
    )
    check(
        "table shape: [Target, Value, Time] rows for mem",
        len(tbl) == 1 and all(r[0] == "mem" for r in tbl[0]["rows"]),
        f"{len(tbl[0]['rows']) if tbl else 0} rows",
    )
    check("unknown target dropped", not any(b.get("target") == "nope" for b in body))
    # epoch-ms range form (Grafana also sends numbers — VERDICT r1 #9)
    payload_ms = dict(payload, range={"from": 0, "to": 4102444800000})
    code, body_ms = http_json(
        f"{url}/query", payload=payload_ms, auth="grafana:s3cret"
    )
    ts_ms = [b for b in body_ms if b.get("target") == "cpu"]
    check(
        "epoch-ms range equals ISO range",
        code == 200 and ts_ms and ts_ms[0]["datapoints"] == ts[0]["datapoints"],
    )

    server.shutdown()
    endpoint.shutdown()
    spark.stop()

    failed = [c for c in checks if not c[1]]
    print(
        f"\nSTREAMING E2E: {'PASS' if not failed else 'FAIL'} "
        f"({len(checks) - len(failed)}/{len(checks)} checks)"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
