"""Grafana wire-contract tests (SURVEY.md §5 item 4): golden shapes for
/search, timeseries and table responses, epoch-ms ints, stubs, auth,
unknown-target drop, multi-table union (divergence from reference defect
index.js:131), end-to-end over real HTTP."""

from __future__ import annotations

import json
import urllib.request

import pytest

from timeseries_data_provider_spark.serving import grafana
from timeseries_data_provider_spark.serving.http_server import serve


@pytest.fixture(scope="module")
def metrics(spark):
    from datetime import datetime

    rows = [
        ("cpu", datetime(2024, 1, 1, 0, 0, s), float(s)) for s in range(10)
    ] + [
        ("mem", datetime(2024, 1, 1, 0, 0, s), 100.0 + s) for s in range(10)
    ]
    from timeseries_data_provider_spark.streaming.ingest import METRICS_SCHEMA

    return spark.createDataFrame(rows, METRICS_SCHEMA)


PAYLOAD = {
    "targets": [{"target": "cpu", "type": "timeseries"}],
    "range": {"from": "2024-01-01 00:00:02", "to": "2024-01-01 00:00:05"},
    "maxDataPoints": 100,
}


def test_timeseries_shape(metrics):
    out = grafana.handle_query(PAYLOAD, metrics, known_series={"cpu", "mem"})
    assert out == [
        {
            "target": "cpu",
            "datapoints": [
                # inclusive bounds both ends (index.js:106); epoch-ms ints
                [2.0, 1704067202000],
                [3.0, 1704067203000],
                [4.0, 1704067204000],
                [5.0, 1704067205000],
            ],
        }
    ]
    assert all(
        isinstance(ms, int) for _, ms in out[0]["datapoints"]
    )


def test_max_points_time_asc(metrics):
    p = dict(PAYLOAD, maxDataPoints=2)
    out = grafana.handle_query(p, metrics, known_series={"cpu"})
    # LIMIT keeps the EARLIEST n (time-ASC order, index.js:106)
    assert out[0]["datapoints"] == [[2.0, 1704067202000], [3.0, 1704067203000]]


def test_table_shape_and_union(metrics):
    p = {
        "targets": [
            {"target": "cpu", "type": "table"},
            {"target": "mem", "type": "table"},
        ],
        "range": {"from": "2024-01-01 00:00:00", "to": "2024-01-01 00:00:01"},
    }
    out = grafana.handle_query(p, metrics, known_series={"cpu", "mem"})
    assert len(out) == 1
    table = out[0]
    assert table["type"] == "table"
    assert table["columns"] == grafana.TABLE_COLUMNS
    # rows from BOTH table targets (reference clobbered all but the last)
    assert [r for r in table["rows"] if r[0] == "cpu"] == [
        ["cpu", 0.0, 1704067200000],
        ["cpu", 1.0, 1704067201000],
    ]
    assert [r for r in table["rows"] if r[0] == "mem"] == [
        ["mem", 100.0, 1704067200000],
        ["mem", 101.0, 1704067201000],
    ]


def test_unknown_target_dropped(metrics):
    p = {
        "targets": [{"target": "nope", "type": "timeseries"}],
        "range": PAYLOAD["range"],
    }
    assert grafana.handle_query(p, metrics, known_series={"cpu"}) == []


def test_duplicate_target_emitted_once(metrics):
    # same target twice in one payload → one series, not doubled rows
    # (ADVICE r1: names list used to grow per occurrence)
    p = dict(
        PAYLOAD,
        targets=[
            {"target": "cpu", "type": "timeseries"},
            {"target": "cpu", "type": "table"},
        ],
    )
    out = grafana.handle_query(p, metrics, known_series={"cpu"})
    assert len(out) == 1
    assert out[0]["target"] == "cpu"  # first occurrence's type wins
    assert out[0]["datapoints"] == [
        [2.0, 1704067202000],
        [3.0, 1704067203000],
        [4.0, 1704067204000],
        [5.0, 1704067205000],
    ]


def test_epoch_ms_range_bounds(metrics):
    # Grafana also sends epoch-ms range values (numbers or numeric
    # strings) — must behave exactly like the ISO form (VERDICT r1 #9)
    iso = grafana.handle_query(PAYLOAD, metrics, known_series={"cpu"})
    for form in (
        {"from": 1704067202000, "to": 1704067205000},
        {"from": "1704067202000", "to": "1704067205000"},
    ):
        p = dict(PAYLOAD, range=form)
        assert grafana.handle_query(p, metrics, known_series={"cpu"}) == iso


def test_stubs():
    assert grafana.annotations() == []
    assert grafana.tag_keys() == []
    assert grafana.tag_values() == []


def test_auth_validator():
    v = grafana.basic_auth_validator(
        {"enabled": True, "username": "u", "password": "p"}
    )
    assert v("u", "p") and not v("u", "x") and not v("x", "p")
    assert grafana.basic_auth_validator({"enabled": False})("any", "thing")


def _post(port, path, payload, auth=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    if auth:
        import base64

        req.add_header(
            "Authorization",
            "Basic " + base64.b64encode(auth.encode()).decode(),
        )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_end_to_end(metrics):
    server, _ = serve(
        metrics,
        {"cpu", "mem"},
        auth_config={"enabled": True, "username": "u", "password": "p"},
    )
    port = server.server_address[1]
    try:
        code, _ = _post(port, "/query", PAYLOAD)
        assert code == 401  # no credentials
        code, body = _post(port, "/search", {}, auth="u:p")
        assert (code, body) == (200, ["cpu", "mem"])
        code, body = _post(port, "/query", PAYLOAD, auth="u:p")
        assert code == 200
        assert body[0]["target"] == "cpu"
        assert body[0]["datapoints"][0] == [2.0, 1704067202000]
        code, body = _post(port, "/annotations", {}, auth="u:p")
        assert (code, body) == (200, [])
        # malformed body → 500 with an error message (divergence 2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/query",
            data=b"{not json",
            method="POST",
        )
        import base64

        req.add_header(
            "Authorization", "Basic " + base64.b64encode(b"u:p").decode()
        )
        try:
            urllib.request.urlopen(req)
            raised = False
        except urllib.error.HTTPError as e:
            raised = e.code == 500 and "error" in json.loads(e.read())
        assert raised
    finally:
        server.shutdown()
