"""Legacy Excel .xls SST text (sources/xls): BIFF8 record walk with
the Continue-split string rule — including the mid-string width
switch behind a fresh grbit byte, the format's hardest shape."""

import struct

import pytest

from timeseries_data_provider_spark.sources import cfb, xls

SS = ["alpha", "beta with naïve", "gamma", "Ωmega utf16"]
WANT = "alpha\nbeta with naïve\ngamma\nΩmega utf16"


def test_sst_roundtrip_plain():
    m = xls.xls_text(xls.encode_xls(SS))
    assert m["text"] == WANT
    assert m["n_strings"] == 4 and m["n_label_cells"] == 4


def test_continue_split_between_strings():
    # raw Continue boundary at a structure edge (after 'alpha':
    # 8-byte SST header + 3-byte string header + 5 chars = 16)
    m = xls.xls_text(xls.encode_xls(SS, split_sst_at=16))
    assert m["text"] == WANT


def test_continue_split_mid_string_with_width_switch():
    # the boundary lands INSIDE 'beta with naïve'; the continuation
    # re-encodes the remainder as UTF-16 behind a fresh grbit —
    # decode must re-read the width flag at the boundary
    m = xls.xls_text(
        xls.encode_xls(SS, split_sst_at=22, switch_width_on_continue=True)
    )
    assert m["text"] == WANT


def test_rich_and_ext_blocks_skipped():
    # hand-build one string carrying rgRun and ExtRst blocks: the
    # declared sizes must be skipped, not decoded as text
    s = "plain"
    body = struct.pack("<II", 1, 1)
    body += struct.pack("<HB", len(s), 0x0C)  # fRich | fExt
    body += struct.pack("<H", 2)  # cRun
    body += struct.pack("<I", 6)  # cbExtRst
    body += s.encode("latin-1")
    body += b"\xde\xad\xbe\xef" * 2  # rgRun
    body += b"\x00" * 6  # ExtRst
    rec = struct.pack("<HHH", 0x0809, 2, 0x0600)
    rec += struct.pack("<HH", 0x00FC, len(body)) + body
    rec += struct.pack("<HH", 0x000A, 0)
    blob = cfb.encode_cfb([("Workbook", rec)])
    assert xls.xls_text(blob)["text"] == "plain"


def test_biff5_inline_labels_extract():
    # the pre-SST era (r12 late): LABEL/RSTRING byte strings through
    # the CODEPAGE encoding, unique first-appearance order
    out = xls.xls_text(
        xls.encode_xls_biff5(["héllo", "wörld", "héllo", "düp"])
    )
    assert out == {
        "n_strings": 3,
        "n_label_cells": 4,
        "text": "héllo\nwörld\ndüp",
    }
    rich = xls.xls_text(
        xls.encode_xls_biff5(["rïch one", "two"], rich=True)
    )
    assert rich["text"] == "rïch one\ntwo"
    # the CODEPAGE record is honored, not assumed
    assert (
        xls.xls_text(xls.encode_xls_biff5(["süß"], codepage=850))[
            "text"
        ]
        == "süß"
    )


def test_biff5_named_scope_boundaries():
    # BIFF5 FilePass is the XOR era — named, never junk-decrypted
    blob = xls.encode_xls_biff5(["x"])
    wb = bytearray(dict(cfb.cfb_streams(blob))["Book"])
    fp = struct.pack("<HHHH", 0x002F, 4, 0x1234, 0x5678)
    wb2 = wb[:8] + fp + wb[8:]
    with pytest.raises(NotImplementedError, match="XOR"):
        xls.xls_text(cfb.encode_cfb([("Book", bytes(wb2))]))
    # BIFF2-4 stays named
    wb3 = bytearray(wb)
    struct.pack_into("<H", wb3, 4, 0x0400)
    with pytest.raises(NotImplementedError, match="BIFF"):
        xls.xls_text(cfb.encode_cfb([("Book", bytes(wb3))]))
    # truncated LABEL is loud
    wb4 = bytearray(dict(cfb.cfb_streams(blob))["Book"])
    at = bytes(wb4).find(struct.pack("<H", 0x0204))
    struct.pack_into("<H", wb4, at + 2, 6)  # rlen below header size
    with pytest.raises(ValueError, match="LABEL"):
        xls.xls_text(cfb.encode_cfb([("Book", bytes(wb4[: at + 10]))]))


def test_biff8_encrypted_named_scope():
    # BIFF8 XOR obfuscation stays the named gap
    rec = struct.pack("<HHH", 0x0809, 2, 0x0600)
    rec += struct.pack("<HH", 0x002F, 4) + b"\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError, match="XOR"):
        xls.xls_text(cfb.encode_cfb([("Workbook", rec)]))


def test_hostile_loud():
    with pytest.raises(ValueError, match="Workbook"):
        xls.xls_text(cfb.encode_cfb([("WordDocument", b"\x00" * 64)]))
    # record overrun
    rec = struct.pack("<HH", 0x0809, 999) + b"xx"
    with pytest.raises(ValueError, match="overruns"):
        xls.xls_text(cfb.encode_cfb([("Workbook", rec)]))
    # SST claiming more strings than its bytes carry
    body = struct.pack("<II", 5, 5) + struct.pack("<HB", 4, 0) + b"ab"
    rec = struct.pack("<HHH", 0x0809, 2, 0x0600)
    rec += struct.pack("<HH", 0x00FC, len(body)) + body
    with pytest.raises(ValueError, match="truncated"):
        xls.xls_text(cfb.encode_cfb([("Workbook", rec)]))


def test_xls_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, None],
            "payload": [xls.encode_xls(["a", "b"]), None],
        }
    )
    out = xls.xls_features(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["text"] == "a\nb" and out[0]["n_label_cells"] == 2
