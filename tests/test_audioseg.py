"""Audio segmentation (operators/audioseg).

Covers: exact segment boundaries on planted tone/silence layouts,
the gap-bridging rule, short-segment dropping, all-silent/all-voiced
edges, partial final frames, and the Spark fan-out over real WAV and
FLAC containers."""

import numpy as np
import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import audioseg, flac, multimodal

RATE = 8000
SPF = RATE * 20 // 1000  # 160 samples per 20 ms frame


def _clip(pattern):
    """pattern: list of (n_frames, amplitude) runs -> sample array."""
    parts = []
    for n, amp in pattern:
        parts.append(np.full(n * SPF, amp, dtype=np.int64))
    return np.concatenate(parts) if parts else np.zeros(0, np.int64)


def test_basic_boundaries():
    s = _clip([(5, 0), (10, 1000), (20, 0), (10, 1000), (5, 0)])
    segs, dropped = audioseg.segment_samples(s, RATE)
    assert dropped == 0
    assert [(g["start_ms"], g["end_ms"]) for g in segs] == [
        (100, 300),
        (700, 900),
    ]
    assert all(g["peak_abs"] == 1000 for g in segs)
    assert all(g["n_frames"] == 10 for g in segs)


def test_gap_bridging():
    # 200 ms min_gap = 10 frames: an 8-frame silence is bridged,
    # a 12-frame one splits
    s = _clip([(10, 1000), (8, 0), (10, 1000), (12, 0), (10, 1000)])
    segs, _ = audioseg.segment_samples(s, RATE)
    assert len(segs) == 2
    assert segs[0]["start_ms"] == 0 and segs[0]["end_ms"] == 560
    assert segs[1]["start_ms"] == 800


def test_short_segments_dropped():
    # min_segment 100 ms = 5 frames: a 3-frame blip drops
    s = _clip([(3, 1000), (20, 0), (10, 1000)])
    segs, dropped = audioseg.segment_samples(s, RATE)
    assert dropped == 1
    assert len(segs) == 1 and segs[0]["start_ms"] == 460


def test_edges():
    assert audioseg.segment_samples(_clip([(20, 0)]), RATE) == ([], 0)
    segs, _ = audioseg.segment_samples(_clip([(10, 1000)]), RATE)
    assert [(g["start_ms"], g["end_ms"]) for g in segs] == [(0, 200)]
    # empty clip
    assert audioseg.segment_samples(np.zeros(0), RATE) == ([], 0)
    # partial final frame participates
    s = np.concatenate([_clip([(5, 0)]), np.full(80, 1000, np.int64)])
    with_partial, _ = audioseg.segment_samples(
        s, RATE, min_segment_ms=20
    )
    assert with_partial and with_partial[0]["end_ms"] == len(s) * 1000 // RATE


def test_threshold_is_energy_not_amplitude():
    # amplitude 100 -> energy 10_000 == threshold -> SILENT (<=)
    s = _clip([(10, 100)])
    assert audioseg.segment_samples(s, RATE)[0] == []
    s = _clip([(10, 101)])
    assert len(audioseg.segment_samples(s, RATE)[0]) == 1


def test_spark_fanout_wav_and_flac(spark):
    s = _clip([(5, 0), (10, 900), (20, 0), (10, 900)])
    blobs = [
        (1, multimodal.encode_wav(s, sample_rate=RATE)),
        (2, flac.encode_flac(s, sample_rate=RATE)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["doc_id", "payload"])
    )
    rows = audioseg.audio_segments(
        df, codec_setup=flac.register
    ).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # identical samples through two containers -> identical segments
    for doc in (1, 2):
        segs = sorted(by_doc[doc], key=lambda r: r["seg_idx"])
        assert [(r["start_ms"], r["end_ms"]) for r in segs] == [
            (100, 300),
            (700, 900),
        ]
    # registry cleanup (the flac test-suite rule)
    multimodal.AUDIO_CODECS.pop(b"fLaC", None)
