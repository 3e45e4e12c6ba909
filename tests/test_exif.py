"""EXIF APP1 metadata (operators/exif).

Covers: APP1 roundtrip through a REAL in-repo JPEG (marker walk must
skip SOI/APP0/DQT/DHT/SOF and stop at SOS), IFD0 + Exif sub-IFD + GPS
IFD fields, exact micro-degree GPS math incl. hemisphere signs and
zero-denominator guards, no-EXIF JPEGs returning None, hostile marker
structure, every-offset truncation fuzz, and the Spark Arrow pass."""

import numpy as np
import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import exif, jpeg


def _jpeg_with_exif(**kw):
    img = jpeg.encode_baseline_jpeg(np.full((8, 8), 128, dtype=np.uint8))
    return exif.insert_app1(img, exif.build_exif_app1(**kw))


def test_roundtrip_through_real_jpeg():
    j = _jpeg_with_exif(
        make="Cam3",
        model="M2",
        orientation=5,
        datetime="2026:02:03 04:05:06",
        width=640,
        height=480,
        gps=(("N", 51, 30, 30, 1), ("W", 0, 7, 3930, 100)),
    )
    m = exif.exif_from_jpeg(j)
    assert m["make"] == "Cam3" and m["model"] == "M2"
    assert m["orientation"] == 5
    assert m["datetime"] == "2026:02:03 04:05:06"
    assert m["exif_width"] == 640 and m["exif_height"] == 480
    # 51 deg 30' 30" N = 51.5083333... -> floor at micro
    assert m["gps_lat_micro"] == 51_508_333
    # 0 deg 7' 39.30" W = 0.1275833... -> -127583 (toward zero)
    assert m["gps_lon_micro"] == -127_583
    # the host JPEG still decodes
    d = jpeg.decode_baseline_jpeg(j)
    assert d["width"] == 8 and d["height"] == 8


def test_exif_survives_decode_and_vice_versa():
    # no-EXIF JPEG: None, not an error
    img = jpeg.encode_baseline_jpeg(np.zeros((8, 8), dtype=np.uint8))
    assert exif.exif_from_jpeg(img) is None


def test_south_east_signs():
    j = _jpeg_with_exif(gps=(("S", 33, 51, 0, 1), ("E", 151, 12, 0, 1)))
    m = exif.exif_from_jpeg(j)
    assert m["gps_lat_micro"] == -33_850_000
    assert m["gps_lon_micro"] == 151_200_000


def test_minimal_fields_only():
    j = _jpeg_with_exif(make="X", model="Y")
    m = exif.exif_from_jpeg(j)
    assert m["make"] == "X"
    assert m["exif_width"] is None
    assert m["gps_lat_micro"] is None


def test_zero_denominator_guard():
    assert exif._gps_microdeg([(1, 0), (0, 1), (0, 1)], "N") is None
    assert exif._gps_microdeg([(1, 1), (0, 1)], "N") is None
    assert exif._gps_microdeg([(1, 1), (0, 1), (0, 1)], "Q") is None


def test_big_endian_tiff_block():
    # hand-built MM block: orientation only
    import struct

    ifd = struct.pack(">H", 1)
    ifd += struct.pack(">HHI", 274, 3, 1) + struct.pack(">H", 6) + b"\x00\x00"
    ifd += struct.pack(">I", 0)
    buf = b"MM\x00*" + struct.pack(">I", 8) + ifd
    assert exif.parse_exif_tiff(buf)["orientation"] == 6


def test_hostile_inputs():
    with pytest.raises(ValueError, match="SOI"):
        exif.exif_from_jpeg(b"nope")
    with pytest.raises(ValueError, match="TIFF magic"):
        exif.parse_exif_tiff(b"XXXXXXXX")
    with pytest.raises(ValueError, match="truncated"):
        exif.parse_exif_tiff(b"II*")
    # APP1 whose declared length exceeds the file
    bad = b"\xff\xd8\xff\xe1\xff\xff" + b"Exif\x00\x00"
    with pytest.raises(ValueError, match="truncated marker"):
        exif.exif_from_jpeg(bad)


def test_truncation_fuzz():
    j = _jpeg_with_exif(gps=(("N", 1, 2, 3, 4), ("E", 5, 6, 7, 8)))
    for cut in range(2, len(j)):
        try:
            exif.exif_from_jpeg(j[:cut])
        except ValueError:
            continue
        # clean None is fine (walk hit end / SOS before APP1 parse)


def test_spark_features(spark):
    blobs = [
        (1, _jpeg_with_exif(make="A", orientation=3)),
        (2, jpeg.encode_baseline_jpeg(np.zeros((8, 8), dtype=np.uint8))),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["doc_id", "payload"])
    )
    rows = {r["doc_id"]: r.asDict() for r in exif.exif_features(df).collect()}
    assert rows[1]["make"] == "A" and rows[1]["orientation"] == 3
    assert rows[2]["make"] is None and rows[2]["orientation"] is None
