"""WARC crawl-archive source (sources/warc).

Covers: plain + gzip-member roundtrip, multi-record files, HTTP
response splitting, hostile inputs (bad magic, bad Content-Length,
missing separators), every-offset truncation fuzz of the error
contract, and the Spark fan-out (response rows only, parse errors
named with the archive id).
"""

import gzip

import pandas as pd
import pytest

from timeseries_data_provider_spark.sources import warc as W

HTML = b"<html><body><p>Hello crawl.</p></body></html>"


def _archive(gzip_members=True, status=200):
    return W.encode_warc(
        [
            {"type": "warcinfo", "uri": None, "body": b"software: t\r\n"},
            {
                "type": "request",
                "uri": "http://example.com/1",
                "body": b"GET /1 HTTP/1.1\r\n\r\n",
            },
            {
                "type": "response",
                "uri": "http://example.com/1",
                "body": W.http_response_bytes(HTML, status),
            },
        ],
        gzip_members=gzip_members,
    )


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    recs = list(W.iter_warc_records(_archive(gzip_members=gz)))
    assert [r["warc-type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
    ]
    assert recs[2]["warc-target-uri"] == "http://example.com/1"
    status, hh, payload = W.parse_http_response(recs[2]["body"])
    assert status == 200
    assert hh["content-type"] == "text/html"
    assert payload == HTML


def test_gzip_members_are_independent():
    # Common Crawl layout: each record its own member — decompressing
    # only the first member must yield exactly the first record
    blob = _archive(gzip_members=True)
    import zlib

    d = zlib.decompressobj(wbits=31)
    first = d.decompress(blob)
    assert first.startswith(b"WARC/1.0\r\n")
    (rec,) = W.iter_warc_records(first)
    assert rec["warc-type"] == "warcinfo"


def test_deterministic_output():
    assert _archive() == _archive()


def test_http_status_variants():
    recs = list(W.iter_warc_records(_archive(status=404)))
    status, _, _ = W.parse_http_response(recs[2]["body"])
    assert status == 404


def test_hostile_inputs():
    with pytest.raises(ValueError, match="version"):
        list(W.iter_warc_records(b"NOTWARC/1.0\r\nfoo: 1\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(
            W.iter_warc_records(
                b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
            )
        )
    with pytest.raises(ValueError, match="gzip"):
        list(W.iter_warc_records(b"\x1f\x8bgarbage"))
    # body length pointing past EOF
    bad = b"WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort\r\n\r\n"
    with pytest.raises(ValueError, match="exceeds"):
        list(W.iter_warc_records(bad))
    with pytest.raises(ValueError, match="status"):
        W.parse_http_response(b"HTTP/1.1 abc OK\r\n\r\n")
    with pytest.raises(ValueError, match="terminator"):
        W.parse_http_response(b"HTTP/1.1 200 OK\r\n")


def test_truncation_fuzz():
    # every prefix either parses a clean record subset or raises
    # ValueError — never a crash, never a silent wrong record
    blob = _archive(gzip_members=False)
    full = list(W.iter_warc_records(blob))
    for cut in range(len(blob)):
        try:
            got = list(W.iter_warc_records(blob[:cut]))
        except ValueError:
            continue
        assert got == full[: len(got)]


@pytest.mark.parametrize("gz", [True, False], ids=["gz", "plain"])
def test_member_index_range_fetchable(spark, gz):
    # THE invariant: every (offset, comp_length) row is an
    # independently fetchable slice that decodes to exactly its record
    blob = _archive(gzip_members=gz)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [blob]})
    )
    rows = sorted(
        W.warc_member_index(df).collect(),
        key=lambda r: r["member_idx"],
    )
    assert [r["warc_type"] for r in rows] == [
        "warcinfo",
        "request",
        "response",
    ]
    assert rows[2]["url"] == "http://example.com/1"
    for r in rows:
        sl = blob[r["offset"] : r["offset"] + r["comp_length"]]
        raw = gzip.decompress(sl) if gz else sl
        assert len(raw) == r["record_bytes"]
        (rec,) = W.iter_warc_records(raw)
        assert rec["warc-type"] == r["warc_type"]
    # offsets tile the archive exactly
    assert rows[0]["offset"] == 0
    assert (
        rows[-1]["offset"] + rows[-1]["comp_length"] == len(blob)
    )


def test_gzip_member_iter_hostile():
    with pytest.raises(ValueError, match="truncated gzip"):
        list(W.iter_gzip_members(_archive()[:20]))
    with pytest.raises(ValueError, match="bad gzip member"):
        list(W.iter_gzip_members(b"\x1f\x8bbad" + b"x" * 40))
    with pytest.raises(ValueError, match="not a gzip member"):
        list(W.iter_gzip_members(b"plain bytes, no magic"))


def test_spark_fanout(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [3, 13, 20], "text": ["alpha beta", "gone", "x y z"]}
        )
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in W.warc_responses(W.synth_warc_corpus(docs)).collect()
    }
    assert set(rows) == {3, 13, 20}
    r = rows[3]
    assert r["url"] == "http://example3.com/doc/3"
    assert r["http_status"] == 200
    assert r["mime"] == "text/html"
    assert r["n_records"] == 3
    assert bytes(r["body"]) == b"<html><body><p>alpha beta</p></body></html>"
    assert rows[13]["http_status"] == 404  # 13 % 13 == 0
    assert rows[20]["url"] == "http://example6.com/doc/20"


def test_spark_parse_error_names_archive(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [b"junk bytes"]})
    )
    with pytest.raises(Exception, match="archive 7"):
        W.warc_responses(df).collect()


def test_read_warc_files(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    (p / "a.warc.gz").write_bytes(_archive())
    (p / "b.warc.gz").write_bytes(_archive(status=404))
    out = W.read_warc_files(spark, str(p)).collect()
    assert len(out) == 2
    assert sorted(r["http_status"] for r in out) == [200, 404]
    assert all(bytes(r["body"]) == HTML for r in out)
