"""Legacy Excel .xls text extraction — [MS-XLS] BIFF8 SST over the
CFB container (sources/cfb).

Excel 97-2003 binaries keep every cell string ONCE in the workbook-
global SST (shared string table); cells reference it by index
(LABELSST). For a text corpus the SST *is* the text, so extraction
walks the BIFF record stream of the ``Workbook`` stream and decodes
the SST — including the format's hardest rule: a ``Continue`` record
may split the SST anywhere, and when the split lands MID-STRING the
continuation begins with a fresh grbit byte that may SWITCH the
character width (compressed 8-bit <-> UTF-16LE) for the remaining
characters ([MS-XLS] §2.5.293 XLUnicodeRichExtendedString +
§2.4.58). Rich-text runs and ExtRst phonetic blocks are skipped by
their declared sizes (raw across continues, per spec).

Contract: one line per unique SST string, table order; LABELSST
cells are counted (n_label_cells) to evidence the strings are
referenced. BIFF5/BIFF7 workbooks (Excel 5.0/95, BOF version
0x0500 — the pre-SST era, r12 late) extract their inline
LABEL/RSTRING byte strings through the CODEPAGE record's encoding
instead (unique, first-appearance order — the same contract);
BIFF2-4 stays the named gap. Record/segment overruns are loud.
FilePass RC4 v1.1 and RC4 CryptoAPI workbooks decrypt through
sources/offcrypto (r12 — empty/VelvetSweatshop defaults plus
caller candidates); XOR obfuscation stays the named gap.
Same stated verification posture as sources/doc (self-written
fixtures; typed record stream fails loud).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources import cfb

__all__ = ["xls_text", "encode_xls", "xls_features"]

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_FILEPASS = 0x002F
_CODEPAGE = 0x0042
_LABEL = 0x0204  # BIFF5 inline string cell
_RSTRING = 0x00D6  # BIFF5 rich string cell (runs skipped)


class _Segments:
    """Cursor over the SST record's data segments (the SST body plus
    each Continue body). ``read`` crosses boundaries raw;
    ``read_chars`` re-reads a grbit byte at each boundary it crosses
    mid-string — the BIFF8 rule."""

    def __init__(self, segs: list[bytes]):
        self.segs = segs
        self.si = 0
        self.off = 0

    def _avail(self) -> int:
        return len(self.segs[self.si]) - self.off

    def _advance(self) -> None:
        while self.si < len(self.segs) and self._avail() == 0:
            self.si += 1
            self.off = 0
            if self.si >= len(self.segs):
                raise ValueError("xls: SST truncated mid-structure")

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self._advance()
            take = min(n, self._avail())
            seg = self.segs[self.si]
            out += seg[self.off : self.off + take]
            self.off += take
            n -= take
        return bytes(out)

    def read_chars(self, cch: int, high: bool) -> str:
        parts: list[str] = []
        while cch > 0:
            if self._avail() == 0:
                # continuation boundary mid-string: fresh grbit
                self._advance()
                high = bool(self.read(1)[0] & 0x01)
            width = 2 if high else 1
            n_here = min(cch, self._avail() // width)
            if n_here == 0:
                raise ValueError(
                    "xls: character split inside a UTF-16 unit"
                )
            raw = self.read(n_here * width)
            parts.append(
                raw.decode("utf-16-le" if high else "latin-1", "replace")
            )
            cch -= n_here
        return "".join(parts)


def _parse_sst(segs: list[bytes]) -> list[str]:
    cur = _Segments(segs)
    cur.read(4)  # cstTotal
    (cst_unique,) = struct.unpack("<I", cur.read(4))
    if cst_unique > 10_000_000:
        raise ValueError("xls: unreasonable SST count")
    out: list[str] = []
    for _ in range(cst_unique):
        (cch,) = struct.unpack("<H", cur.read(2))
        grbit = cur.read(1)[0]
        high = bool(grbit & 0x01)
        rich = bool(grbit & 0x08)
        ext = bool(grbit & 0x04)
        c_run = struct.unpack("<H", cur.read(2))[0] if rich else 0
        cb_ext = struct.unpack("<I", cur.read(4))[0] if ext else 0
        out.append(cur.read_chars(cch, high))
        if c_run:
            cur.read(4 * c_run)  # rgRun: raw across continues
        if cb_ext:
            cur.read(cb_ext)
    return out


def xls_text(
    blob: bytes, passwords: tuple[str, ...] | None = None
) -> dict:
    """{n_strings, n_label_cells, text} — one line per unique SST
    string. ``blob`` is the whole CFB container. A FilePass-
    protected (RC4 v1.1 or CryptoAPI) workbook decrypts through
    sources/offcrypto first (r12) — the empty password and Excel's
    VelvetSweatshop default are tried, plus ``passwords``; XOR
    obfuscation and real passwords raise named errors."""
    streams = dict(cfb.cfb_streams(blob))
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError("xls: no Workbook stream")
    return _workbook_text(wb, passwords, decrypted=False)


def _workbook_text(
    wb: bytes,
    passwords: tuple[str, ...] | None,
    decrypted: bool,
) -> dict:
    pos = 0
    n = len(wb)
    strings: list[str] = []
    n_label = 0
    sst_segs: list[bytes] | None = None
    biff = 0  # 8 or 5 once BOF is seen
    codec = "cp1252"  # BIFF5 byte-string codepage (CODEPAGE record)
    seen: set[str] = set()

    def flush() -> None:
        nonlocal sst_segs, strings
        if sst_segs is not None:
            strings = _parse_sst(sst_segs)
            sst_segs = None

    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        pos += 4
        if rlen > n - pos:
            raise ValueError(f"xls: record {rtype:#06x} overruns")
        body = wb[pos : pos + rlen]
        pos += rlen
        if rtype == _CONTINUE and sst_segs is not None:
            sst_segs.append(body)
            continue
        flush()  # any non-Continue record closes an open SST run
        if rtype == _BOF:
            if len(body) >= 2:
                (vers,) = struct.unpack_from("<H", body, 0)
                if vers == 0x0600:
                    biff = biff or 8
                elif vers == 0x0500:
                    # BIFF5/BIFF7 (Excel 5.0/95, r12 late): no SST —
                    # strings live inline in LABEL/RSTRING cells
                    biff = biff or 5
                else:
                    raise NotImplementedError(
                        f"xls: BIFF version {vers:#06x} (BIFF8 and "
                        "BIFF5/7; the pre-CFB BIFF2-4 era is a "
                        "named gap)"
                    )
        elif rtype == _FILEPASS:
            if decrypted:
                continue  # plaintext pass: the record is vestigial
            if biff == 5:
                raise NotImplementedError(
                    "xls: BIFF5 FilePass (XOR-obfuscation era)"
                )
            from timeseries_data_provider_spark.sources import (
                offcrypto,
            )

            cands = offcrypto.DEFAULT_PASSWORDS + tuple(
                passwords or ()
            )
            return _workbook_text(
                offcrypto.decrypt_xls_workbook(wb, cands),
                passwords,
                decrypted=True,
            )
        elif rtype == _SST:
            sst_segs = [body]
        elif rtype == _LABELSST:
            n_label += 1
        elif rtype == _CODEPAGE and biff == 5 and len(body) >= 2:
            (cp,) = struct.unpack_from("<H", body, 0)
            try:
                import codecs

                codecs.lookup(f"cp{cp}")
                codec = f"cp{cp}"
            except LookupError:
                codec = "latin-1"  # unknown page: kept safe
        elif rtype in (_LABEL, _RSTRING) and biff == 5:
            # row(2) col(2) ixfe(2) cch(2) + byte string; RSTRING
            # appends formatting runs after the text (skipped)
            if len(body) < 8:
                raise ValueError("xls: truncated LABEL record")
            (cch,) = struct.unpack_from("<H", body, 6)
            if 8 + cch > len(body):
                raise ValueError("xls: LABEL string overruns record")
            s = body[8 : 8 + cch].decode(codec, "replace")
            n_label += 1
            if s not in seen:
                seen.add(s)
                strings.append(s)
    flush()
    if biff == 0:
        raise ValueError("xls: no BOF record (not a BIFF stream)")
    text = "\n".join(s for s in strings if s)
    return {
        "n_strings": len(strings),
        "n_label_cells": n_label,
        "text": text,
    }


def encode_xls_biff5(
    strings: list[str],
    codepage: int = 1252,
    rich: bool = False,
) -> bytes:
    """Fixture writer (r12 late): a BIFF5 Workbook — BOF(0x0500) +
    CODEPAGE + one LABEL (or RSTRING with a dummy run, ``rich``)
    cell per string + EOF, inside the Excel-5-era ``Book`` stream.
    Duplicate strings exercise the unique-order contract."""
    rec = bytearray()
    rec += struct.pack("<HHHH", _BOF, 4, 0x0500, 0x0005)
    rec += struct.pack("<HHH", _CODEPAGE, 2, codepage)
    for i, s in enumerate(strings):
        enc = s.encode(f"cp{codepage}")
        if rich:
            body = (
                struct.pack("<HHHH", i, 0, 0, len(enc))
                + enc
                + bytes([1])  # one formatting run
                + struct.pack("<BB", 0, 0)
            )
            rec += struct.pack("<HH", _RSTRING, len(body)) + body
        else:
            body = struct.pack("<HHHH", i, 0, 0, len(enc)) + enc
            rec += struct.pack("<HH", _LABEL, len(body)) + body
    rec += struct.pack("<HH", _EOF, 0)
    return cfb.encode_cfb([("Book", bytes(rec))])


def encode_xls(
    strings: list[str],
    split_sst_at: int | None = None,
    switch_width_on_continue: bool = False,
) -> bytes:
    """Fixture writer: BOF + SST (+ Continue splits) + one LABELSST
    per string + EOF inside a Workbook stream. ``split_sst_at``
    forces a Continue boundary after that many SST-body bytes:
    WITHOUT ``switch_width_on_continue`` the split is raw and must
    land BETWEEN strings (the spec's structure-boundary split); with
    it, the split lands mid-string and the continuation re-encodes
    the remainder at the other width behind a fresh grbit byte — the
    hardest real-world shape and the decoder rule under test."""
    body = bytearray()
    body += struct.pack("<II", len(strings), len(strings))
    boundary_parts: list[bytes] = []
    for s in strings:
        try:
            enc = s.encode("latin-1")
            high = 0
        except UnicodeEncodeError:
            enc = s.encode("utf-16-le")
            high = 1
        if (
            split_sst_at is not None
            and switch_width_on_continue
            and not high
            and len(body) + 3 < split_sst_at
            and len(body) + 3 + len(enc) > split_sst_at
        ):
            # split this compressed string and continue it as UTF-16
            n_before = split_sst_at - (len(body) + 3)
            head = s[:n_before]
            tail = s[n_before:]
            body += struct.pack("<HB", len(s), 0)
            body += head.encode("latin-1")
            boundary_parts.append(bytes(body))
            body = bytearray()
            body += b"\x01" + tail.encode("utf-16-le")
            continue
        body += struct.pack("<HB", len(s), high) + enc
    boundary_parts.append(bytes(body))
    records = bytearray()
    records += struct.pack("<HHH", _BOF, 2, 0x0600)
    first = boundary_parts[0]
    if split_sst_at is not None and not switch_width_on_continue:
        first, rest = first[:split_sst_at], first[split_sst_at:]
        records += struct.pack("<HH", _SST, len(first)) + first
        records += struct.pack("<HH", _CONTINUE, len(rest)) + rest
    else:
        records += struct.pack("<HH", _SST, len(first)) + first
    for part in boundary_parts[1:]:
        records += struct.pack("<HH", _CONTINUE, len(part)) + part
    for i in range(len(strings)):
        records += struct.pack(
            "<HHHHHI", _LABELSST, 10, i, 0, 0, i
        )
    records += struct.pack("<HH", _EOF, 0)
    return cfb.encode_cfb([("Workbook", bytes(records))])


def xls_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched .xls extraction: (id, n_strings, n_label_cells,
    text, n_chars). ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged inputs instead of
    killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        single_row_features,
    )

    return single_row_features(
        df,
        xls_text,
        [
            ("n_strings", "long"),
            ("n_label_cells", "long"),
            ("text", "string"),
            ("n_chars", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
        derive={"n_chars": lambda m: len(m["text"])},
    )


