"""Hand-assembled CFB containers (r13, VERDICT r12 item 3 — the
independent-fixture posture for the self-validated OLE2 tier).

No independent OLE2 implementation exists in this container, so the
next-best independence is a SECOND writer that shares no code with
``sources/cfb``'s fixture writer: every byte below is laid out
directly from the [MS-CFB] §2 structure tables (header fields at
their spec offsets, DIFAT slots, FAT/miniFAT entries, 128-byte
directory entries) and from [MS-DOC]'s FIB/CLX offsets — inside the
test, with struct.pack only. If the reader and the in-repo writer
shared a transcription error in these layouts, a fixture built from
the spec's own offsets would expose it."""

from __future__ import annotations

import struct

from timeseries_data_provider_spark.sources import cfb, doc

_FREE = 0xFFFFFFFF
_END = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD


def _header(
    n_fat: int,
    first_dir: int,
    first_minifat: int,
    n_minifat: int,
    difat0: int,
) -> bytes:
    h = bytearray(512)
    h[0:8] = bytes.fromhex("d0cf11e0a1b11ae1")
    struct.pack_into("<HHHHH", h, 24, 0x3E, 3, 0xFFFE, 9, 6)
    struct.pack_into("<I", h, 40, 0)  # v3: no dir-sector count
    struct.pack_into("<I", h, 44, n_fat)
    struct.pack_into("<I", h, 48, first_dir)
    struct.pack_into("<I", h, 56, 4096)  # mini stream cutoff
    struct.pack_into("<I", h, 60, first_minifat)
    struct.pack_into("<I", h, 64, n_minifat)
    struct.pack_into("<I", h, 68, _END)  # no DIFAT sectors
    struct.pack_into("<I", h, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", h, 76 + 4 * i, difat0 if i == 0 else _FREE
        )
    return bytes(h)


def _dir_entry(
    name: str,
    typ: int,
    start: int,
    size: int,
    left: int = _FREE,
    right: int = _FREE,
    child: int = _FREE,
) -> bytes:
    e = bytearray(128)
    nm = name.encode("utf-16-le") + b"\x00\x00"
    e[: len(nm)] = nm
    struct.pack_into("<H", e, 64, len(nm))
    e[66] = typ
    e[67] = 1  # black
    struct.pack_into("<III", e, 68, left, right, child)
    struct.pack_into("<I", e, 116, start)
    struct.pack_into("<Q", e, 120, size)
    return bytes(e)


def _fat_sector(entries: list[int]) -> bytes:
    out = entries + [_FREE] * (128 - len(entries))
    return struct.pack("<128I", *out)


def test_handbuilt_doc_regular_sectors():
    # layout: sector 0 FAT, 1 directory, 2-10 WordDocument (4608 B),
    # 11-18 0Table (4096 B) — both streams above the 4096 mini
    # cutoff, so the FAT path alone carries them
    text = "Hand-built CFB fixture.\rSecond line."
    raw = text.encode("cp1252")
    wd = bytearray(9 * 512)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 10, 0)  # fWhichTblStm = 0
    struct.pack_into("<I", wd, 76, len(text))  # ccpText
    struct.pack_into("<I", wd, 418, 64)  # fcClx (into 0Table)
    wd[1024 : 1024 + len(raw)] = raw
    # CLX at 0Table offset 64: Pcdt marker, lcbPlcPcd, PlcPcd with
    # one compressed piece at fc = 2*1024 (8-bit pieces halve fc)
    plc = struct.pack("<II", 0, len(text)) + struct.pack(
        "<HIH", 0, 0x40000000 | (1024 * 2), 0
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", wd, 422, len(clx))  # lcbClx
    table = bytearray(8 * 512)
    table[64 : 64 + len(clx)] = clx

    fat = [_FATSECT, _END]
    fat += list(range(3, 11)) + [_END]  # WordDocument 2..10
    fat += list(range(12, 19)) + [_END]  # 0Table 11..18
    dirsec = (
        _dir_entry("Root Entry", 5, _END, 0, child=1)
        + _dir_entry("WordDocument", 2, 2, 9 * 512, left=2)
        + _dir_entry("0Table", 2, 11, 8 * 512)
        + bytes(128)
    )
    blob = (
        _header(1, 1, _END, 0, 0)
        + _fat_sector(fat)
        + dirsec
        + bytes(wd)
        + bytes(table)
    )
    streams = dict(cfb.cfb_streams(blob))
    assert set(streams) == {"WordDocument", "0Table"}
    got = doc.doc_text(blob)
    assert got["text"] == "Hand-built CFB fixture.\nSecond line."
    assert got["n_pieces"] == 1


def test_handbuilt_minifat_small_stream():
    # layout: sector 0 FAT, 1 directory, 2 miniFAT, 3 mini stream.
    # "Tiny" is 100 bytes -> two 64-byte mini sectors via miniFAT
    payload = bytes(range(100))
    mini = bytearray(512)
    mini[:100] = payload
    fat = [_FATSECT, _END, _END, _END]
    minifat = [1, _END] + [_FREE] * 126
    dirsec = (
        _dir_entry("Root Entry", 5, 3, 512, child=1)
        + _dir_entry("Tiny", 2, 0, 100)
        + bytes(128)
        + bytes(128)
    )
    blob = (
        _header(1, 1, 2, 1, 0)
        + _fat_sector(fat)
        + dirsec
        + struct.pack("<128I", *minifat)
        + bytes(mini)
    )
    streams = dict(cfb.cfb_streams(blob))
    assert streams["Tiny"] == payload


def test_handbuilt_utf16_piece_and_table1():
    # fWhichTblStm = 1 (1Table) + an UNCOMPRESSED (UTF-16LE) piece
    text = "Unicode 中文 piece"
    raw = text.encode("utf-16-le")
    wd = bytearray(9 * 512)
    struct.pack_into("<H", wd, 0, 0xA5EC)
    struct.pack_into("<H", wd, 10, 0x0200)  # fWhichTblStm = 1
    struct.pack_into("<I", wd, 76, len(text))
    struct.pack_into("<I", wd, 418, 0)
    wd[2048 : 2048 + len(raw)] = raw
    plc = struct.pack("<II", 0, len(text)) + struct.pack(
        "<HIH", 0, 2048, 0
    )
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", wd, 422, len(clx))
    table = bytearray(8 * 512)
    table[: len(clx)] = clx
    fat = [_FATSECT, _END]
    fat += list(range(3, 11)) + [_END]
    fat += list(range(12, 19)) + [_END]
    dirsec = (
        _dir_entry("Root Entry", 5, _END, 0, child=1)
        + _dir_entry("WordDocument", 2, 2, 9 * 512, left=2)
        + _dir_entry("1Table", 2, 11, 8 * 512)
        + bytes(128)
    )
    blob = (
        _header(1, 1, _END, 0, 0)
        + _fat_sector(fat)
        + dirsec
        + bytes(wd)
        + bytes(table)
    )
    got = doc.doc_text(blob)
    assert got["text"] == text


def test_handbuilt_xls_biff8_sst_width_switch():
    # BIFF8 Workbook assembled from [MS-XLS] record layouts: an SST
    # whose second string splits MID-STRING across a Continue record
    # and SWITCHES width (UTF-16 -> compressed) at the boundary —
    # the format's hardest rule — inside a hand-built CFB
    import struct as _s

    def rec(rtype, body):
        return _s.pack("<HH", rtype, len(body)) + body

    s1 = "Alpha"
    # "Ω-mega": 2 UTF-16 chars in the SST record, 4 compressed chars
    # in the Continue (fresh grbit 0x00)
    sst_head = _s.pack("<II", 2, 2)
    str1 = _s.pack("<HB", len(s1), 0) + s1.encode("latin-1")
    str2_head = _s.pack("<HB", 6, 1) + "Ω-".encode("utf-16-le")
    cont = b"\x00" + b"mega"
    wb = (
        rec(0x0809, _s.pack("<HH", 0x0600, 0x0005))
        + rec(0x00FC, sst_head + str1 + str2_head)
        + rec(0x003C, cont)
        + rec(0x00FD, _s.pack("<HHHI", 0, 0, 15, 1))  # LABELSST
        + rec(0x000A, b"")  # EOF
    )
    wb = wb.ljust(9 * 512, b"\x00")  # regular-sector stream
    fat = [_FATSECT, _END] + list(range(3, 11)) + [_END]
    dirsec = (
        _dir_entry("Root Entry", 5, _END, 0, child=1)
        + _dir_entry("Workbook", 2, 2, 9 * 512)
        + bytes(128)
        + bytes(128)
    )
    blob = (
        _header(1, 1, _END, 0, 0) + _fat_sector(fat) + dirsec + wb
    )
    from timeseries_data_provider_spark.sources import xls

    got = xls.xls_text(blob)
    assert got["text"].splitlines() == ["Alpha", "Ω-mega"]
    assert got["n_label_cells"] == 1


def test_handbuilt_msg_property_streams():
    # MAPI property streams ([MS-OXMSG] naming) through the miniFAT
    # path of a hand-built CFB: subject as 001F UTF-16LE, body as
    # 001E 8-bit
    subject = "Hand subject 中".encode("utf-16-le")
    body = b"Eight-bit body text."
    # mini stream: subject at mini sector 0.., body after (64-byte
    # mini sectors)
    n_sub = (len(subject) + 63) // 64
    n_body = (len(body) + 63) // 64
    mini = bytearray(64 * (n_sub + n_body))
    mini[: len(subject)] = subject
    mini[64 * n_sub : 64 * n_sub + len(body)] = body
    mini = mini.ljust(512, b"\x00")
    minifat = (
        list(range(1, n_sub)) + [_END]
        + list(range(n_sub + 1, n_sub + n_body)) + [_END]
    )
    minifat += [_FREE] * (128 - len(minifat))
    fat = [_FATSECT, _END, _END, _END]
    dirsec = (
        _dir_entry("Root Entry", 5, 3, len(mini), child=1)
        + _dir_entry(
            "__substg1.0_0037001F", 2, 0, len(subject), left=2
        )
        + _dir_entry(
            "__substg1.0_1000001E", 2, n_sub, len(body)
        )
        + bytes(128)
    )
    import struct as _s

    blob = (
        _header(1, 1, 2, 1, 0)
        + _fat_sector(fat)
        + dirsec
        + _s.pack("<128I", *minifat)
        + bytes(mini)
    )
    from timeseries_data_provider_spark.sources import msg

    got = msg.msg_text(blob)
    assert got["subject"] == "Hand subject 中"
    assert got["text"] == "Eight-bit body text."
