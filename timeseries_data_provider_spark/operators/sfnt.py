"""TrueType/OpenType ``cmap`` table parsing — the glyph-id →
Unicode bridge for PDF Type0 fonts that ship NO /ToUnicode CMap.

Real PDFs very commonly embed an Identity-H Type0 font (codes ARE
glyph indices) without a ToUnicode map; their text was unrecoverable
at this tier (the named gap at operators/pdf.py). The embedded font
program itself (FontFile2, a TrueType sfnt) carries the inverse
fact: its ``cmap`` table maps Unicode → glyph id. Inverting that
table recovers text for every glyph reachable from a codepoint —
the pdftotext/MuPDF fallback strategy, built here from the public
OpenType spec (formats 4 and 12, the two that matter: every
TrueType font carries a format-4 BMP table; supplementary planes
ride format 12).

Hostile-input posture: all reads bounds-checked; segment walks are
count-capped so a crafted cmap cannot loop an executor; malformed
tables raise named ValueErrors (a damaged font then simply yields
no text through pdf.py's tolerant font fallback).

Public-knowledge basis: OpenType spec (Microsoft/ISO 14496-22,
public) ``cmap`` chapter. Reference parity: index.js has no
document surface; [EXT] SURVEY §2 (VERDICT r11 next-round item 5).
"""

from __future__ import annotations

import struct

__all__ = ["gid_to_unicode", "encode_cmap_font"]

_MAX_MAPPINGS = 1 << 17  # generous: real fonts are < 66k glyphs


def _subtable_candidates(data: bytes) -> list[int]:
    """Rank the cmap encoding records and return their absolute
    subtable offsets best-first: full-repertoire Unicode (3/10, 0/4
    or 0/6 — format 12) beats BMP (3/1 or 0/0..3 — format 4).
    (0,5) is EXCLUDED: that record is the format-14 Unicode
    *variation-sequences* subtable, not a codepoint map — ranking it
    shadowed perfectly good (3,1)/(0,3) tables in real CJK/emoji
    fonts (VERDICT r12 finding #1). The caller walks the list and
    falls back on parse failure, so a damaged top-ranked subtable
    no longer drops the whole font's text."""
    if len(data) < 12 or data[:4] not in (
        b"\x00\x01\x00\x00",
        b"OTTO",
        b"true",
    ):
        raise ValueError("sfnt: not a TrueType/OpenType font")
    (num_tables,) = struct.unpack_from(">H", data, 4)
    if num_tables > 512:
        raise ValueError("sfnt: implausible table count")
    cmap_off = cmap_len = None
    for i in range(num_tables):
        rec = 12 + 16 * i
        if rec + 16 > len(data):
            raise ValueError("sfnt: truncated table directory")
        tag = data[rec : rec + 4]
        if tag == b"cmap":
            cmap_off, cmap_len = struct.unpack_from(
                ">II", data, rec + 8
            )
            break
    if cmap_off is None:
        raise ValueError("sfnt: no cmap table")
    if cmap_off + 4 > len(data):
        raise ValueError("sfnt: cmap offset out of bounds")
    _, n_enc = struct.unpack_from(">HH", data, cmap_off)
    if n_enc > 64:
        raise ValueError("sfnt: implausible encoding-record count")
    ranked = []  # (-rank, record index, subtable offset)
    for i in range(n_enc):
        rec = cmap_off + 4 + 8 * i
        if rec + 8 > len(data):
            raise ValueError("sfnt: truncated encoding records")
        plat, enc, off = struct.unpack_from(">HHI", data, rec)
        rank = None
        if (plat, enc) == (3, 10) or (plat, enc) in ((0, 4), (0, 6)):
            rank = 2  # full Unicode repertoire (format 12)
        elif (plat, enc) == (3, 1) or (plat == 0 and enc <= 3):
            rank = 1  # Unicode BMP (format 4)
        if rank is not None:
            ranked.append((-rank, i, cmap_off + off))
    if not ranked:
        raise ValueError("sfnt: no Unicode cmap subtable")
    ranked.sort()
    return [off for _, _, off in ranked]


def gid_to_unicode(font: bytes) -> dict[int, str]:
    """Invert the font's Unicode cmap: glyph id -> character. When
    several codepoints share a glyph, the LOWEST codepoint wins
    (deterministic; the common case is case-insensitive or
    compatibility duplicates where any choice reads fine).

    Candidates are tried best-first; a subtable that fails to parse
    (unsupported format, truncation) falls back to the next one, so
    one bad record can't shadow a usable table."""
    err: ValueError | None = None
    for sub in _subtable_candidates(font):
        try:
            return _invert_subtable(font, sub)
        except ValueError as e:
            err = e
    raise err if err is not None else ValueError(
        "sfnt: no Unicode cmap subtable"
    )


def _invert_subtable(font: bytes, sub: int) -> dict[int, str]:
    if sub + 4 > len(font):
        raise ValueError("sfnt: subtable offset out of bounds")
    (fmt,) = struct.unpack_from(">H", font, sub)
    out: dict[int, str] = {}

    def put(gid: int, cp: int) -> None:
        if gid == 0 or cp in (0xFFFF, 0xFFFE):
            return
        prev = out.get(gid)
        if prev is None or ord(prev) > cp:
            out[gid] = chr(cp)

    if fmt == 4:
        length, _lang, seg_x2 = struct.unpack_from(
            ">HHH", font, sub + 2
        )
        seg = seg_x2 // 2
        if seg == 0 or sub + length > len(font) or length < 16:
            raise ValueError("sfnt: malformed format-4 subtable")
        words = struct.unpack_from(
            f">{(length - 14) // 2}H", font, sub + 14
        )
        # words: end[seg], pad, start[seg], delta[seg], rangeOff[seg],
        # then the glyph id array
        if len(words) < 4 * seg + 1:
            raise ValueError("sfnt: format-4 arrays truncated")
        ends = words[:seg]
        starts = words[seg + 1 : 2 * seg + 1]
        deltas = words[2 * seg + 1 : 3 * seg + 1]
        ro_base = 3 * seg + 1
        total = 0
        for i in range(seg):
            s, e = starts[i], ends[i]
            if s > e:
                raise ValueError("sfnt: format-4 segment reversed")
            total += e - s + 1
            if total > _MAX_MAPPINGS:
                raise ValueError("sfnt: cmap mapping count exceeds guard")
            ro = words[ro_base + i]
            for c in range(s, e + 1):
                if ro == 0:
                    gid = (c + deltas[i]) & 0xFFFF
                else:
                    # spec: *(idRangeOffset[i]/2 + (c-start) +
                    # &idRangeOffset[i]) — in word-index terms
                    wi = ro_base + i + ro // 2 + (c - s)
                    if wi >= len(words):
                        raise ValueError(
                            "sfnt: format-4 glyph index out of bounds"
                        )
                    gid = words[wi]
                    if gid != 0:
                        gid = (gid + deltas[i]) & 0xFFFF
                put(gid, c)
    elif fmt == 12:
        if sub + 16 > len(font):
            raise ValueError("sfnt: truncated format-12 header")
        (n_groups,) = struct.unpack_from(">I", font, sub + 12)
        if sub + 16 + 12 * n_groups > len(font):
            raise ValueError("sfnt: format-12 groups out of bounds")
        total = 0
        for g in range(n_groups):
            s, e, gid0 = struct.unpack_from(
                ">III", font, sub + 16 + 12 * g
            )
            if s > e or e > 0x10FFFF:
                raise ValueError("sfnt: format-12 group malformed")
            total += e - s + 1
            if total > _MAX_MAPPINGS:
                raise ValueError("sfnt: cmap mapping count exceeds guard")
            for c in range(s, e + 1):
                put(gid0 + (c - s), c)
    else:
        raise ValueError(f"sfnt: cmap subtable format {fmt}")
    return out


def encode_cmap_font(
    cp_to_gid: dict[int, int], fmt: int = 4
) -> bytes:
    """Fixture writer: a minimal sfnt carrying ONE table — a cmap
    with a (3,1) format-4 or (3,10) format-12 Unicode subtable for
    the given codepoint -> glyph-id mapping. Format 4 writes one
    segment per RUN of consecutive codepoints with consecutive gids
    (so multi-codepoint segments and the idDelta wrap both get
    exercised), plus the mandatory 0xFFFF terminator."""
    items = sorted(cp_to_gid.items())
    if fmt == 12:
        groups = []
        for cp, gid in items:
            if groups and cp == groups[-1][1] + 1 and gid == groups[-1][2] + (
                groups[-1][1] - groups[-1][0]
            ) + 1:
                groups[-1] = (groups[-1][0], cp, groups[-1][2])
            else:
                groups.append((cp, cp, gid))
        body = struct.pack(
            ">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups)
        )
        for s, e, g0 in groups:
            body += struct.pack(">III", s, e, g0)
        sub = body
        plat_enc = (3, 10)
    elif fmt == 4:
        segs = []  # (start, end, gid0)
        for cp, gid in items:
            if cp > 0xFFFE:
                raise ValueError("format 4 is BMP-only")
            if segs and cp == segs[-1][1] + 1 and gid == segs[-1][2] + (
                segs[-1][1] - segs[-1][0]
            ) + 1:
                segs[-1] = (segs[-1][0], cp, segs[-1][2])
            else:
                segs.append((cp, cp, gid))
        segs.append((0xFFFF, 0xFFFF, 0))  # terminator, maps to .notdef
        seg = len(segs)
        ends = b"".join(struct.pack(">H", e) for _, e, _ in segs)
        starts = b"".join(struct.pack(">H", s) for s, _, _ in segs)
        deltas = b"".join(
            struct.pack(">H", (g - s) & 0xFFFF) for s, _, g in segs
        )
        ros = struct.pack(">H", 0) * seg
        body = (
            struct.pack(
                ">HHHHHHH",
                4,
                16 + 8 * seg,
                0,
                seg * 2,
                2,  # searchRange etc: parsers ignore these
                1,
                0,
            )
            + ends
            + b"\x00\x00"
            + starts
            + deltas
            + ros
        )
        sub = body
        plat_enc = (3, 1)
    else:
        raise ValueError(f"encode_cmap_font: format {fmt}")
    cmap = (
        struct.pack(">HH", 0, 1)
        + struct.pack(">HHI", plat_enc[0], plat_enc[1], 12)
        + sub
    )
    font = (
        b"\x00\x01\x00\x00"
        + struct.pack(">HHHH", 1, 16, 0, 0)
        + b"cmap"
        + struct.pack(">III", 0, 28, len(cmap))
        + cmap
    )
    return font
