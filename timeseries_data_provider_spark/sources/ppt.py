"""Legacy PowerPoint .ppt text extraction — [MS-PPT] atom walk over
the CFB container (sources/cfb).

PowerPoint 97-2003 binaries store their text in the ``PowerPoint
Document`` stream as a tree of records ("atoms"): an 8-byte header
(recVer/recInstance u16, recType u16, recLen u32) where container
records nest children in their payload. Slide text lives in exactly
two leaf atom types ([MS-PPT] §2.9): ``TextCharsAtom`` (0x0FA0,
UTF-16LE) and ``TextBytesAtom`` (0x0FA8, one byte per char in the
cp1252 range) — collecting them in stream order is the standard
text-dump approach (what catppt and every indexer does).

Contract: one line per text atom, stream order (which follows slide
order in real files); CR inside an atom (PowerPoint's line break)
becomes newline; bounds-checked, depth-capped named errors on
crafted records; encrypted documents (``CryptSession10Container``
present) raise the named NotImplementedError. Same verification
posture as sources/doc (self-written fixtures; typed record walk
fails loud on mis-transcribed offsets).
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources import cfb

__all__ = ["ppt_text", "encode_ppt", "ppt_features"]

_TEXT_CHARS = 0x0FA0
_TEXT_BYTES = 0x0FA8
_CRYPT = 0x2F14  # CryptSession10Container


def _walk(data: bytes, out: list[str], depth: int = 0) -> None:
    if depth > 32:
        raise ValueError("ppt: record nesting too deep")
    pos = 0
    n = len(data)
    while pos + 8 <= n:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, pos)
        pos += 8
        if rlen > n - pos:
            raise ValueError(
                f"ppt: record {rtype:#06x} overruns the stream"
            )
        body = data[pos : pos + rlen]
        pos += rlen
        if rtype == _CRYPT:
            raise NotImplementedError(
                "ppt: encrypted document (CryptSession10 handler)"
            )
        if rtype == _TEXT_CHARS:
            out.append(
                body.decode("utf-16-le", "replace").replace("\r", "\n")
            )
        elif rtype == _TEXT_BYTES:
            out.append(
                body.decode("cp1252", "replace").replace("\r", "\n")
            )
        elif (ver_inst & 0x000F) == 0x000F:
            # recVer 0xF marks a CONTAINER: recurse into its payload
            _walk(body, out, depth + 1)


def ppt_text(blob: bytes) -> dict:
    """{n_atoms, n_chars, text} — one line per text atom, stream
    order. ``blob`` is the whole CFB container."""
    streams = dict(cfb.cfb_streams(blob))
    doc = streams.get("PowerPoint Document")
    if doc is None:
        raise ValueError("ppt: no 'PowerPoint Document' stream")
    out: list[str] = []
    _walk(doc, out)
    text = "\n".join(s.strip("\n") for s in out if s.strip())
    return {"n_atoms": len(out), "n_chars": len(text), "text": text}


def encode_ppt(lines: list[str]) -> bytes:
    """Fixture writer: a Document container holding one text atom per
    line — TextBytesAtom when cp1252-clean, TextCharsAtom otherwise
    (the real writers' rule)."""
    atoms = bytearray()
    for s in lines:
        try:
            body = s.encode("cp1252")
            rtype = _TEXT_BYTES
        except UnicodeEncodeError:
            body = s.encode("utf-16-le")
            rtype = _TEXT_CHARS
        atoms += struct.pack("<HHI", 0x0000, rtype, len(body)) + body
    document = struct.pack("<HHI", 0x000F, 0x03E8, len(atoms)) + bytes(
        atoms
    )
    return cfb.encode_cfb([("PowerPoint Document", document)])


def ppt_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched .ppt extraction: (id, n_atoms, text, n_chars). ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged inputs instead of
    killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        single_row_features,
    )

    return single_row_features(
        df,
        ppt_text,
        [
            ("n_atoms", "long"),
            ("text", "string"),
            ("n_chars", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


