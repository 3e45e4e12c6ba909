"""Compressed RTF (LZFu) — the [MS-OXRTFCP] scheme carried by
Outlook's PR_RTF_COMPRESSED (1009/0102) property.

Real Outlook messages very commonly store their body ONLY as
compressed RTF (no plain/Unicode body property), so this codec is
what completes the email tier: ``sources/msg.py`` routes a
decompressed body through the existing RTF parser
(``sources/rtf.py``). The scheme is LZ77 over a 4,096-byte circular
dictionary PRE-SEEDED with a 207-byte RTF-flavored prefix (so the
boilerplate ``{\\rtf1\\ansi...`` header compresses to dictionary
references from byte one), 16-bit big-endian references of 12-bit
offset + 4-bit length-minus-2, LSB-first control bits, and a
custom-seeded CRC32 over the compressed payload. The uncompressed
passthrough form (``MELA`` COMPTYPE) appears in the wild too and is
handled.

Hostile-input posture: header/size/CRC mismatches and truncated
streams raise named ValueErrors (quarantine-routable); the
decompressor is bounds-checked and cannot over-allocate past the
declared RAWSIZE guard.

Public-knowledge basis: [MS-OXRTFCP] v20211116 (open specification).
Reference parity: index.js has no document surface; [EXT] SURVEY §2
(VERDICT r11 next-round item 3).
"""

from __future__ import annotations

import struct

__all__ = ["lzfu_decompress", "lzfu_compress", "INIT_DICT"]

# [MS-OXRTFCP] §2.1.2.2: the 207-byte initial dictionary content
INIT_DICT = (
    b"{\\rtf1\\ansi\\mac\\deff0\\deftab720{\\fonttbl;}"
    b"{\\f0\\fnil \\froman \\fswiss \\fmodern \\fscript "
    b"\\fdecor MS Sans SerifSymbolArialTimes New RomanCourier"
    b"{\\colortbl\\red0\\green0\\blue0\r\n\\par "
    b"\\pard\\plain\\f0\\fs20\\b\\i\\u\\tab\\tx"
)
assert len(INIT_DICT) == 207, len(INIT_DICT)

_DICT_SIZE = 4096
_COMP_LZFU = 0x75465A4C  # 'LZFu'
_COMP_MELA = 0x414C454D  # 'MELA' (uncompressed passthrough)

# CRC32 per [MS-OXRTFCP] §2.1.3.2: the standard 0xEDB88320
# reflected table, but seeded with 0 and with NO final complement —
# NOT zlib.crc32 (which is ~crc(~0)), so the table is built here.
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (0xEDB88320 ^ (_c >> 1)) if _c & 1 else (_c >> 1)
    _CRC_TABLE.append(_c)


def _crc(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c & 0xFFFFFFFF


def lzfu_decompress(blob: bytes, max_raw: int = 1 << 26) -> bytes:
    """Decompress a PR_RTF_COMPRESSED value to raw RTF bytes.

    Header (§2.1.3.1): COMPSIZE (u32le, bytes following this field),
    RAWSIZE (u32le), COMPTYPE (u32le, 'LZFu' or 'MELA'), CRC (u32le,
    over the payload; MUST be 0 for MELA). Stream ends at the
    dictionary reference whose offset equals the current write
    position (§2.1.2.4) — RAWSIZE is advisory and real writers top
    it with slack, so the end marker governs."""
    if len(blob) < 16:
        raise ValueError("lzfu: truncated header (< 16 bytes)")
    comp_size, raw_size, comp_type, crc = struct.unpack_from(
        "<IIII", blob, 0
    )
    if comp_size + 4 > len(blob):
        raise ValueError(
            f"lzfu: COMPSIZE {comp_size} exceeds payload "
            f"({len(blob)} bytes total)"
        )
    if raw_size > max_raw:
        raise ValueError(f"lzfu: RAWSIZE {raw_size} exceeds guard")
    payload = blob[16 : comp_size + 4]
    if comp_type == _COMP_MELA:
        # §2.1.3.1.3: uncompressed; CRC MUST be 0
        if crc != 0:
            raise ValueError("lzfu: MELA form carries nonzero CRC")
        return payload[:raw_size]
    if comp_type != _COMP_LZFU:
        raise ValueError(
            f"lzfu: unknown COMPTYPE 0x{comp_type:08x}"
        )
    if _crc(payload) != crc:
        raise ValueError("lzfu: CRC mismatch (damaged stream)")

    d = bytearray(_DICT_SIZE)
    d[: len(INIT_DICT)] = INIT_DICT
    wpos = len(INIT_DICT)
    out = bytearray()
    i, n = 0, len(payload)
    while True:
        if i >= n:
            raise ValueError("lzfu: stream ended without end marker")
        control = payload[i]
        i += 1
        for bit in range(8):
            if control & (1 << bit):
                if i + 2 > n:
                    raise ValueError("lzfu: truncated reference")
                ref = (payload[i] << 8) | payload[i + 1]
                i += 2
                off = ref >> 4
                length = (ref & 0x0F) + 2
                if off == wpos % _DICT_SIZE:
                    return bytes(out)
                for k in range(length):
                    b = d[(off + k) % _DICT_SIZE]
                    out.append(b)
                    d[wpos % _DICT_SIZE] = b
                    wpos += 1
                    if len(out) > max_raw:
                        raise ValueError(
                            "lzfu: output exceeds guard"
                        )
            else:
                if i >= n:
                    raise ValueError("lzfu: truncated literal")
                b = payload[i]
                i += 1
                out.append(b)
                d[wpos % _DICT_SIZE] = b
                wpos += 1
                if len(out) > max_raw:
                    raise ValueError("lzfu: output exceeds guard")


def lzfu_compress(data: bytes, mode: str = "lzfu") -> bytes:
    """Fixture writer: emit a PR_RTF_COMPRESSED value. ``mode``
    'lzfu' runs a greedy longest-match against the circular
    dictionary (including the pre-seeded RTF prefix — the header of
    any real document compresses to references), 'mela' writes the
    uncompressed passthrough form."""
    if mode == "mela":
        payload = data
        hdr = struct.pack(
            "<IIII", len(payload) + 12, len(data), _COMP_MELA, 0
        )
        return hdr + payload
    if mode != "lzfu":
        raise ValueError(f"lzfu_compress: mode {mode!r}")

    d = bytearray(_DICT_SIZE)
    d[: len(INIT_DICT)] = INIT_DICT
    wpos = len(INIT_DICT)
    tokens: list[tuple[bool, bytes]] = []
    i, n = 0, len(data)
    while i < n:
        # greedy longest match (2..17 bytes) against the VALID
        # region of the dictionary (never the uninitialized tail —
        # deterministic for any conforming decoder). The 2-byte
        # anchor scan rides bytes.find (C-rate); self-overlapping
        # runs are legal for the decoder (byte-at-a-time copy) but
        # the fixture stays conservative and stops at the write head
        best_len, best_off = 0, 0
        limit = min(17, n - i)
        valid = min(wpos, _DICT_SIZE)
        if limit >= 2:
            window = bytes(d[:valid])
            anchor = data[i : i + 2]
            wh = wpos % _DICT_SIZE
            pos = window.find(anchor)
            while pos != -1:
                # a match ANCHORED on the write head is unusable
                # once the dictionary wraps: offset == wh IS the
                # end marker (§2.1.2.4), and an anchor whose second
                # byte sits at wh matches a stale byte the decoder
                # will have just overwritten (r12 review finding —
                # silently truncated/corrupted round-trips past
                # ~3.9 KB)
                if pos == wh or (pos + 1) % _DICT_SIZE == wh:
                    pos = window.find(anchor, pos + 1)
                    continue
                length = 2
                while length < limit:
                    at = (pos + length) % _DICT_SIZE
                    if at == wpos % _DICT_SIZE or at >= valid:
                        break
                    if d[at] != data[i + length]:
                        break
                    length += 1
                if length > best_len:
                    best_len, best_off = length, pos
                if best_len == limit:
                    break
                pos = window.find(anchor, pos + 1)
        if best_len >= 2:
            tokens.append(
                (
                    True,
                    struct.pack(
                        ">H", (best_off << 4) | (best_len - 2)
                    ),
                )
            )
            for k in range(best_len):
                d[wpos % _DICT_SIZE] = data[i + k]
                wpos += 1
            i += best_len
        else:
            tokens.append((False, data[i : i + 1]))
            d[wpos % _DICT_SIZE] = data[i]
            wpos += 1
            i += 1
    # end marker: a reference whose offset is the current write pos
    tokens.append(
        (True, struct.pack(">H", (wpos % _DICT_SIZE) << 4))
    )
    payload = bytearray()
    for g in range(0, len(tokens), 8):
        group = tokens[g : g + 8]
        control = 0
        for bit, (is_ref, _) in enumerate(group):
            if is_ref:
                control |= 1 << bit
        payload.append(control)
        for _, tok in group:
            payload.extend(tok)
    hdr = struct.pack(
        "<IIII",
        len(payload) + 12,
        len(data),
        _COMP_LZFU,
        _crc(bytes(payload)),
    )
    return hdr + bytes(payload)
