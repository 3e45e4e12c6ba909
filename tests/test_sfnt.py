"""TrueType cmap parsing (operators/sfnt.py): the glyph-id →
Unicode bridge for no-ToUnicode Type0 PDF fonts (r12)."""

from __future__ import annotations

import struct

import pytest

from timeseries_data_provider_spark.operators import sfnt


def test_format4_and_12_invert_exactly():
    text = "Hello, Wrd! naïve —€"
    cp_to_gid = {ord(c): i + 1 for i, c in enumerate(dict.fromkeys(text))}
    astral = {**cp_to_gid, 0x1D11E: 99}
    for fmt, mapping in ((4, cp_to_gid), (12, astral)):
        font = sfnt.encode_cmap_font(mapping, fmt)
        assert sfnt.gid_to_unicode(font) == {
            g: chr(cp) for cp, g in mapping.items()
        }, fmt


def test_multi_codepoint_segments_and_delta_wrap():
    # consecutive cp->gid runs collapse into one segment; idDelta is
    # (gid - cp) mod 65536, exercising the wrap for gid < cp
    m = {c: c - 60 for c in range(65, 91)}
    m.update({c: c + 500 for c in range(0x400, 0x410)})
    font = sfnt.encode_cmap_font(m, 4)
    assert sfnt.gid_to_unicode(font) == {
        g: chr(cp) for cp, g in m.items()
    }


def test_shared_glyph_lowest_codepoint_wins():
    font = sfnt.encode_cmap_font({0x41: 7, 0x61: 7, 0x42: 8}, 4)
    inv = sfnt.gid_to_unicode(font)
    assert inv[7] == "A" and inv[8] == "B"


def _multi_record_font(records):
    """Build a one-table sfnt whose cmap carries several encoding
    records: records = [((plat, enc), subtable_bytes), ...]."""
    hdr = 4 + 8 * len(records)
    offs, bodies, at = [], b"", hdr
    for _, body in records:
        offs.append(at)
        bodies += body
        at += len(body)
    cmap = struct.pack(">HH", 0, len(records))
    for ((plat, enc), _), off in zip(records, offs):
        cmap += struct.pack(">HHI", plat, enc, off)
    cmap += bodies
    return (
        b"\x00\x01\x00\x00"
        + struct.pack(">HHHH", 1, 16, 0, 0)
        + b"cmap"
        + struct.pack(">III", 0, 28, len(cmap))
        + cmap
    )


def _fmt4_body(mapping):
    # encode_cmap_font layout: header(12) + dir(16) + cmap hdr(4)
    # + one enc record(8), subtable after — slice it back out
    return sfnt.encode_cmap_font(mapping, 4)[40:]


def test_variation_selector_record_does_not_shadow_bmp_table():
    # real CJK/emoji fonts carry (0,5) format-14 variation-sequence
    # records beside (3,1); selecting (0,5) dropped the page's text
    # (VERDICT r12 finding #1)
    f14 = struct.pack(">HII", 14, 10, 0)  # empty format-14 stub
    font = _multi_record_font(
        [((0, 5), f14), ((3, 1), _fmt4_body({0x41: 7, 0x42: 8}))]
    )
    assert sfnt.gid_to_unicode(font) == {7: "A", 8: "B"}


def test_best_first_fallback_on_damaged_top_subtable():
    # a (3,10) record pointing at garbage outranks (3,1), but the
    # parser now falls back instead of dropping the font's text
    garbage = struct.pack(">H", 12) + b"\xff" * 4  # truncated fmt-12
    font = _multi_record_font(
        [((3, 1), _fmt4_body({0x61: 3})), ((3, 10), garbage)]
    )
    assert sfnt.gid_to_unicode(font) == {3: "a"}


def test_only_variation_selector_record_is_a_named_error():
    f14 = struct.pack(">HII", 14, 10, 0)
    font = _multi_record_font([((0, 5), f14)])
    with pytest.raises(ValueError, match="no Unicode cmap"):
        sfnt.gid_to_unicode(font)


def test_hostile_inputs_named_errors():
    good = sfnt.encode_cmap_font({0x41: 1}, 4)
    with pytest.raises(ValueError, match="not a TrueType"):
        sfnt.gid_to_unicode(b"nonsense bytes here")
    with pytest.raises(ValueError, match="cmap|truncated"):
        sfnt.gid_to_unicode(good[:20])
    # reversed segment (start > end) is loud, not an infinite loop
    bad = bytearray(good)
    # find the format-4 subtable: header(12) + record(16) + cmap
    # header(4) + enc record(8) + 14 = ends array start
    ends_at = 12 + 16 + 4 + 8 + 14
    struct.pack_into(">H", bad, ends_at, 0x0030)  # end < start 0x41
    with pytest.raises(ValueError, match="reversed"):
        sfnt.gid_to_unicode(bytes(bad))
    # mapping-count guard on a crafted format-12 group
    huge = sfnt.encode_cmap_font({0x41: 1}, 12)
    hb = bytearray(huge)
    at = len(huge) - 12
    struct.pack_into(">III", hb, at, 0, 0x10FFFF, 1)
    with pytest.raises(ValueError, match="guard"):
        sfnt.gid_to_unicode(bytes(hb))
    # unsupported subtable format is named
    fb = bytearray(good)
    struct.pack_into(">H", fb, 12 + 16 + 4 + 8, 6)
    with pytest.raises(ValueError, match="format 6"):
        sfnt.gid_to_unicode(bytes(fb))
