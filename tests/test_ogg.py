"""Ogg container metadata (operators/ogg).

Covers: Vorbis/Opus identification headers, granule-based duration
math (incl. the Opus 48 kHz + pre-skip rule), FLAC-in-Ogg mapping,
multiplexed streams, hostile inputs, every-offset truncation fuzz,
and the Spark fan-out."""

import struct

import numpy as np
import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import flac, ogg


def test_vorbis_meta():
    blob = ogg.encode_ogg(
        "vorbis", sample_rate=44100, channels=2, total_samples=88200
    )
    m = ogg.decode_ogg_meta(blob)
    assert m["codec"] == "vorbis"
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["duration_ms"] == 2000
    assert m["n_streams"] == 1 and m["n_pages"] == 4


def test_opus_meta_preskip_rule():
    blob = ogg.encode_ogg(
        "opus", sample_rate=48000, channels=1,
        total_samples=96000, pre_skip=312,
    )
    m = ogg.decode_ogg_meta(blob)
    assert m["codec"] == "opus" and m["channels"] == 1
    assert m["pre_skip"] == 312
    # granules are 48 kHz minus pre-skip regardless of input rate
    assert m["duration_ms"] == 2000


def test_flac_in_ogg_mapping():
    # RFC-mapping BOS: 0x7f 'FLAC' maj min nheaders(2) + native fLaC
    si = flac.encode_flac(np.zeros(16, dtype=np.int64), sample_rate=22050)
    native = si[: 4 + 4 + 34]  # magic + STREAMINFO block
    body = b"\x7fFLAC\x01\x00\x00\x01" + native
    page0 = ogg._page(body, serial=3, seq=0, granule=0, htype=0x02)
    page1 = ogg._page(b"\x00", serial=3, seq=1, granule=22050, htype=0x04)
    m = ogg.decode_ogg_meta(page0 + page1)
    assert m["codec"] == "flac"
    assert m["sample_rate"] == 22050 and m["channels"] == 1
    assert m["duration_ms"] == 1000


def test_multiplexed_counts_streams():
    blob = ogg.encode_ogg("vorbis", extra_stream=True)
    m = ogg.decode_ogg_meta(blob)
    assert m["n_streams"] == 2
    assert m["codec"] == "vorbis"  # primary = first BOS


def test_unknown_bos_codec():
    page = ogg._page(b"weird codec id", serial=1, seq=0, granule=0, htype=2)
    m = ogg.decode_ogg_meta(page)
    assert m["codec"] == "unknown"
    assert m["duration_ms"] is None


def test_hostile_inputs():
    with pytest.raises(ValueError, match="capture"):
        ogg.decode_ogg_meta(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="no pages"):
        ogg.decode_ogg_meta(b"")
    # declared segment bigger than the file
    hdr = b"OggS" + struct.pack("<BBqIIIB", 0, 2, 0, 1, 0, 0, 1) + b"\xff"
    with pytest.raises(ValueError, match="truncated page body"):
        ogg.decode_ogg_meta(hdr + b"x")
    # truncated vorbis ident
    page = ogg._page(b"\x01vorbis" + b"\x00" * 3, serial=1, seq=0,
                     granule=0, htype=2)
    with pytest.raises(ValueError, match="vorbis id"):
        ogg.decode_ogg_meta(page)


def test_truncation_fuzz():
    blob = ogg.encode_ogg("opus")
    full = ogg.decode_ogg_meta(blob)["n_pages"]
    for cut in range(len(blob)):
        try:
            m = ogg.decode_ogg_meta(blob[:cut])
        except ValueError:
            continue
        assert m["n_pages"] <= full


def test_spark_fanout(spark):
    blobs = [
        (1, ogg.encode_ogg("vorbis", total_samples=44100)),
        (2, ogg.encode_ogg("opus", total_samples=48000, channels=2)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["doc_id", "payload"])
    )
    rows = {r["doc_id"]: r.asDict() for r in ogg.ogg_features(df).collect()}
    assert rows[1]["codec"] == "vorbis" and rows[1]["duration_ms"] == 1000
    assert rows[2]["codec"] == "opus" and rows[2]["duration_ms"] == 1000
