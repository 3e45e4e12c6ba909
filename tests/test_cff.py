"""CFF charset parsing (operators/cff.py, r13) — the FontFile3 leg
of the no-ToUnicode Type0 recovery (VERDICT r12 item 4)."""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (house import style)
import pytest

from timeseries_data_provider_spark.operators import cff, pdf, sfnt


def test_non_cid_glyph_names_to_unicode():
    names = ["A", "space", "uni4E2D", "comma", "notamapping", "five",
             "u1D11E"]
    font = cff.encode_cff(glyph_names=names)
    f = cff.parse_cff(font)
    assert f["n_glyphs"] == 8 and not f["is_cid"]
    t = cff.cid_to_unicode_table(font)
    # unknown names degrade to no text, never garbage
    assert t == {1: "A", 2: " ", 3: "中", 4: ",", 6: "5",
                 7: "\U0001D11E"}


def test_cid_keyed_charset_and_named_gap():
    font = cff.encode_cff(cids=[100, 7, 42])
    f = cff.parse_cff(font)
    assert f["is_cid"] and f["charset"] == [0, 100, 7, 42]
    # bare CID-keyed CFF has no Unicode source: named None
    assert cff.cid_to_unicode_table(font) is None
    m = cff.cid_to_gid(font)
    assert m == {0: 0, 100: 1, 7: 2, 42: 3}


def test_otto_composition_roundtrip():
    cids = [55, 66, 77]
    cp_to_gid = {ord("H"): 1, ord("i"): 2, ord("!"): 3}
    font = cff.encode_otto_cff(cp_to_gid, cids)
    uni = sfnt.gid_to_unicode(font)
    c2g = cff.cid_to_gid(cff.otto_cff(font))
    assert "".join(uni[c2g[c]] for c in cids) == "Hi!"


def test_hostile_inputs_named_errors():
    good = cff.encode_cff(glyph_names=["A"])
    with pytest.raises(ValueError, match="not a CFF"):
        cff.parse_cff(b"\x02nonsense")
    with pytest.raises(ValueError, match="INDEX|truncated|bounds"):
        cff.parse_cff(good[:10])
    # charset offset past the end
    bad = bytearray(good)
    at = bad.find(bytes([29]))  # first 5-byte int = charset offset
    struct.pack_into(">i", bad, at + 1, len(good) + 99)
    with pytest.raises(ValueError, match="charset offset"):
        cff.parse_cff(bytes(bad))
    with pytest.raises(ValueError, match="OTTO"):
        cff.otto_cff(good)
    with pytest.raises(ValueError, match="exactly one"):
        cff.encode_cff(glyph_names=["A"], cids=[1])


def test_ros_cid_to_unicode_ranges():
    # r14 (VERDICT item 3): the transcribed Adobe-Japan1-0 ranges —
    # proportional Latin tracks ASCII, the kana blocks track Unicode
    # order with exactly matching span lengths
    t = cff.ros_cid_to_unicode("Adobe", "Japan1")
    assert t[1] == " " and t[41] == "H" and t[95] == "~"
    assert t[842] == "ぁ" and t[924] == "ん"  # hiragana
    assert t[925] == "ァ" and t[1010] == "ヶ"  # katakana
    assert len(t) == 95 + 83 + 86
    assert cff.ros_cid_to_unicode("Adobe", "GB1") is None
    assert cff.ros_cid_to_unicode("Adobe", "Identity") is None


def test_bare_cid_cff_adobe_japan1_text_recovery():
    # a bare CID-keyed Type1C under Adobe-Japan1 with NO ToUnicode:
    # the only Unicode source is the predefined ordering — ASCII and
    # kana both recover; the Identity ordering still yields None
    text = "Hello" + "こんにちは"  # + こんにちは
    inv = {c: k for k, c in cff.ros_cid_to_unicode(
        "Adobe", "Japan1").items()}
    cids = sorted(inv[c] for c in set(text))
    blob = cff.encode_cff(cids=cids, ros=("Adobe", "Japan1", 6))
    f = cff.parse_cff(blob)
    assert f["is_cid"] and f["ros"][:2] == ("Adobe", "Japan1")
    table = cff.cid_to_unicode_table(blob)
    assert table is not None
    got = "".join(sorted(table[inv[c]] for c in set(text)))
    assert got == "".join(sorted(set(text)))
    # CIDs the charset does not carry are absent from the table
    assert all(k in cids for k in table)
    # Identity ordering: still the named no-text gap
    assert cff.cid_to_unicode_table(
        cff.encode_cff(cids=[1, 2, 3])
    ) is None


def test_pdf_bare_cid_ros_end_to_end():
    # the planted-PDF chain (q64's seventh font-rotation arm):
    # Identity-H + CIDFontType0 + bare CID-keyed FontFile3 under
    # Adobe-Japan1, codes = Adobe-Japan1 CIDs, no ToUnicode anywhere
    lines = [["Hello ROS world!", "Punct ,.;: and digits 0123"]]
    blob = pdf.encode_pdf(
        lines, title="ros", cid=True, cid_tounicode=False,
        cid_fontfile3="cff_ros",
    )
    m = pdf.extract_pdf(blob)
    assert "Hello ROS world!" in m["text"]
    assert "Punct ,.;: and digits 0123" in m["text"]
    # out-of-range text in the fixture writer is loud
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Adobe-Japan1"):
        pdf.encode_pdf(
            [["café"]], cid=True, cid_tounicode=False,
            cid_fontfile3="cff_ros",
        )


def test_index_last_offset_one_past_end_is_loud():
    # r14 (ADVICE): an INDEX whose final offset points one byte past
    # the data must raise the named error, not silently truncate the
    # final entry. count=1, offSize=1, offsets (1, 4) but only 2
    # data bytes follow -> last entry claims 3 bytes, 2 exist.
    blob = struct.pack(">HB", 1, 1) + bytes([1, 4]) + b"ab"
    with pytest.raises(ValueError, match="INDEX entry offsets"):
        cff._read_index(blob, 0)
    # the exact-fit form (offsets 1, 3) parses
    ok = struct.pack(">HB", 1, 1) + bytes([1, 3]) + b"ab"
    entries, _end = cff._read_index(ok, 0)
    assert entries == [b"ab"]


def test_pdf_fontfile3_extraction_end_to_end():
    lines = [["Hello CFF world!", "Numbers 0123 and punct ,.;"]]
    want = "Hello CFF world!\nNumbers 0123 and punct ,.;"
    for form in ("cff", "otto"):
        blob = pdf.encode_pdf(
            lines, cid=True, cid_tounicode=False, cid_fontfile3=form
        )
        assert pdf.extract_pdf(blob)["text"] == want, form
    # bare CID-keyed CFF: the named no-text gap — empty, not garbage
    blob = pdf.encode_pdf(
        lines, cid=True, cid_tounicode=False, cid_fontfile3="cff_cid"
    )
    assert pdf.extract_pdf(blob)["text"] == ""
    # damaged FontFile3 never kills extraction
    blob = pdf.encode_pdf(
        lines, cid=True, cid_tounicode=False, cid_fontfile3="cff"
    )
    broken = blob.replace(b"\x01\x00\x04\x04", b"\x09\x00\x04\x04", 1)
    assert pdf.extract_pdf(broken)["text"] == ""
