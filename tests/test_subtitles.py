"""Subtitle parsing (operators/subtitles).

Covers: SRT + WebVTT dialects (comma vs dot millis, optional hours,
identifiers, header/NOTE/STYLE blocks, cue settings, inline tags,
multi-line cues), malformed-block skipping, the Spark fan-out, and
transcript collapsing."""

import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import subtitles as SUB

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello <i>world</i>.

2
00:00:04,000 --> 00:00:06,000
Second line,
continued here.

broken block without timestamps

3
01:02:03,004 --> 01:02:04,000
After an hour.
"""

VTT = """WEBVTT - with a header comment

NOTE this is a note block

STYLE
::cue { color: lime }

00:01.000 --> 00:03.000 align:start position:10%
<c.yellow>Tagged</c> cue one

id-7
00:04.500 --> 00:06.250
Cue two
"""


def test_srt_cues():
    cues, skipped = SUB.parse_cues(SRT)
    assert skipped == 1
    assert [c["text"] for c in cues] == [
        "Hello world.",
        "Second line, continued here.",
        "After an hour.",
    ]
    assert cues[0]["start_ms"] == 1000 and cues[0]["end_ms"] == 3500
    assert cues[2]["start_ms"] == 3_723_004


def test_vtt_cues():
    cues, skipped = SUB.parse_cues(VTT)
    assert skipped == 0
    assert [c["text"] for c in cues] == ["Tagged cue one", "Cue two"]
    assert cues[0]["start_ms"] == 1000
    assert cues[1]["start_ms"] == 4500 and cues[1]["end_ms"] == 6250


def test_backwards_cue_skipped():
    bad = "1\n00:00:05,000 --> 00:00:01,000\nnegative\n"
    cues, skipped = SUB.parse_cues(bad)
    assert cues == [] and skipped == 1


def test_empty_body_skipped():
    cues, skipped = SUB.parse_cues("1\n00:00:01,000 --> 00:00:02,000\n<i></i>\n")
    assert cues == [] and skipped == 1


def test_spark_fanout_and_transcripts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "body": [SRT, VTT]})
    )
    cues = SUB.subtitle_cues(df)
    rows = cues.collect()
    assert len(rows) == 5
    assert all(r["n_skipped"] == (1 if r["doc_id"] == 1 else 0) for r in rows)
    tr = {r["doc_id"]: r.asDict() for r in SUB.transcripts(cues).collect()}
    assert tr[1]["text"] == (
        "Hello world.\nSecond line, continued here.\nAfter an hour."
    )
    assert tr[1]["n_cues"] == 3
    assert tr[1]["duration_ms"] == 3_724_000
    assert tr[2]["text"] == "Tagged cue one\nCue two"
