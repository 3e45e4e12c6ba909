"""OLE2 / CFB container walk (sources/cfb): stream enumeration and
format routing for legacy Office payloads, with cycle/bounds guards
against crafted containers. Per-format text stays the named gap
(no independent OLE2 implementation in this container to validate a
text decoder against — the container layer is spec-mechanical and
verified by construction + hostility)."""

import struct

import numpy as np
import pytest

from timeseries_data_provider_spark.sources import cfb

RNG = np.random.default_rng(7)
SMALL = bytes(RNG.integers(0, 256, 100, dtype=np.uint8))  # mini path
MID = bytes(RNG.integers(0, 256, 5000, dtype=np.uint8))  # FAT path
BIG = bytes(RNG.integers(0, 256, 70000, dtype=np.uint8))


def test_roundtrip_mini_and_fat_paths():
    blob = cfb.encode_cfb(
        [
            ("WordDocument", MID),
            ("1Table", SMALL),
            ("Data", BIG),
            ("Empty", b""),
        ]
    )
    streams = dict(cfb.cfb_streams(blob))
    assert streams["WordDocument"] == MID
    assert streams["1Table"] == SMALL
    assert streams["Data"] == BIG
    assert streams["Empty"] == b""


def test_many_small_streams():
    items = [
        (f"s{i:02d}", bytes([i]) * (i + 1)) for i in range(40)
    ]
    got = dict(cfb.cfb_streams(cfb.encode_cfb(items)))
    assert got == dict(items)


@pytest.mark.parametrize(
    "marker,kind",
    [
        ("WordDocument", "doc"),
        ("Workbook", "xls"),
        ("Book", "xls"),
        ("PowerPoint Document", "ppt"),
        ("__properties_version1.0", "msg"),
        ("SomethingElse", "unknown"),
    ],
)
def test_routing_by_stream_inventory(marker, kind):
    blob = cfb.encode_cfb([(marker, SMALL)])
    assert cfb.cfb_kind(blob)["kind"] == kind


def test_hostile_containers_loud():
    with pytest.raises(ValueError, match="magic"):
        cfb.cfb_streams(b"PK\x03\x04 not ole2" + bytes(600))
    good = cfb.encode_cfb([("WordDocument", MID)])
    # truncation mid-container: sector reads go out of bounds
    with pytest.raises(ValueError, match="cfb"):
        cfb.cfb_streams(good[: len(good) // 2])
    # unsupported version
    bad = bytearray(good)
    struct.pack_into("<H", bad, 26, 7)
    with pytest.raises(ValueError, match="version"):
        cfb.cfb_streams(bytes(bad))


def test_fat_cycle_is_bounded():
    # craft a FAT whose chain loops: sector 0 -> 0 forever
    good = bytearray(cfb.encode_cfb([("WordDocument", BIG)]))
    # FAT sectors live at the end; make every entry point at 0
    ssz = 512
    n = (len(good) - 512) // ssz
    # find a FAT sector (filled with little-endian ints < n or ENDOF)
    # and stomp its first entries into a loop
    (first_dir,) = struct.unpack_from("<I", good, 48)
    (fat0,) = struct.unpack_from("<I", good, 76)  # first DIFAT entry
    off = (fat0 + 1) * ssz
    for k in range(8):
        struct.pack_into("<I", good, off + 4 * k, 0)
    with pytest.raises(ValueError, match="chain|cycle|bounds"):
        cfb.cfb_streams(bytes(good))


def test_directory_cycle_is_bounded():
    good = bytearray(cfb.encode_cfb([("A", SMALL), ("B", SMALL)]))
    (first_dir,) = struct.unpack_from("<I", good, 48)
    dir_off = (first_dir + 1) * 512
    # entry 1 ("A"): make its right-sibling point at itself
    struct.pack_into("<I", good, dir_off + 128 + 72, 1)
    with pytest.raises(ValueError, match="cycle|too deep"):
        cfb.cfb_streams(bytes(good))


def test_cfb_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, None],
            "payload": [
                cfb.encode_cfb([("WordDocument", MID), ("1Table", SMALL)]),
                cfb.encode_cfb([("Workbook", SMALL)]),
                None,
            ],
        }
    )
    out = (
        cfb.cfb_features(spark.createDataFrame(rows))
        .orderBy("doc_id")
        .collect()
    )
    assert [r["kind"] for r in out] == ["doc", "xls"]
    assert out[0]["n_streams"] == 2
    assert "WordDocument" in out[0]["stream_names"]
    assert out[0]["total_bytes"] == len(MID) + len(SMALL)


def test_truncated_header_named_error():
    # r12: a sub-512-byte payload (real crawl damage) must raise the
    # module's named ValueError, not leak struct.error — quarantine
    # routing keys on the ValueError contract
    blob = cfb.encode_cfb([("WordDocument", b"x" * 100)])
    for cut in (9, 200, 511):
        with pytest.raises(ValueError, match="truncated header"):
            cfb.cfb_streams(blob[:cut])
