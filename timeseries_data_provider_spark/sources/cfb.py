"""OLE2 / Compound File Binary container walk — stdlib+struct.

Legacy Office documents (.doc/.xls/.ppt), Outlook .msg and many
installers ship as CFB containers (MS-CFB, a public Microsoft
specification): a FAT filesystem-in-a-file of 512/4096-byte sectors
holding a directory tree of named streams. This module walks the
container — the ROUTING tier a crawl pipeline needs to identify and
dissect these payloads (which streams exist decides what the file
is: ``WordDocument`` -> .doc, ``Workbook`` -> .xls, ``PowerPoint
Document`` -> .ppt, ``__properties_version1.0`` -> .msg) and to hand
stream bytes to downstream tiers. Per-format TEXT extraction lives
in the sibling modules ``doc.py``/``ppt.py``/``xls.py``/``msg.py``
(MS-DOC piece tables, PPT atoms, XLS SST, .msg property streams);
their open risk — no independent OLE2 implementation in this
container to cross-validate against — is stated in each module.

Hostile-input posture: FAT/mini-FAT chain walks are cycle-bounded
(a crafted loop raises the named error, never hangs an executor),
sector reads are bounds-checked, stream sizes honor the
archives.MAX_MEMBER guard, and directory recursion is depth-capped.

Public-knowledge basis: [MS-CFB] v20240423 (open specification).
Reference parity: index.js has no document surface; [EXT] SURVEY §2.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources.archives import MAX_MEMBER

__all__ = [
    "cfb_streams",
    "cfb_kind",
    "encode_cfb",
    "cfb_features",
]

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC
_NOSTREAM = 0xFFFFFFFF


def _chain(fat: list[int], start: int, what: str) -> list[int]:
    """Follow a FAT chain from ``start``; cycle/bounds-guarded."""
    out: list[int] = []
    s = start
    limit = len(fat) + 1
    while s != _ENDOFCHAIN:
        if s >= len(fat) or len(out) > limit:
            raise ValueError(f"cfb: broken {what} chain")
        out.append(s)
        s = fat[s]
    return out


def _parse(blob: bytes):
    if blob[:8] != MAGIC:
        raise ValueError("cfb: bad magic")
    if len(blob) < 512:
        # The 512-byte header (incl. the 109-entry DIFAT at offset 76)
        # must be fully present; without this check a truncated crawl
        # payload leaks struct.error instead of the module's named
        # ValueError contract (which quarantine routing keys on).
        raise ValueError("cfb: truncated header (< 512 bytes)")
    (
        minor,
        major,
        bo,
        sshift,
        mshift,
    ) = struct.unpack_from("<HHHHH", blob, 24)
    if bo != 0xFFFE:
        raise ValueError("cfb: bad byte-order mark")
    if (major, sshift) not in ((3, 9), (4, 12)):
        raise ValueError(f"cfb: version {major} shift {sshift}")
    ssz = 1 << sshift  # 512 or 4096
    msz = 1 << mshift  # 64
    (n_dir,) = struct.unpack_from("<I", blob, 40)
    (first_dir,) = struct.unpack_from("<I", blob, 48)
    (mini_cutoff,) = struct.unpack_from("<I", blob, 56)
    (first_minifat,) = struct.unpack_from("<I", blob, 60)
    (n_minifat,) = struct.unpack_from("<I", blob, 64)
    (first_difat,) = struct.unpack_from("<I", blob, 68)
    (n_difat,) = struct.unpack_from("<I", blob, 72)

    def sector(i: int) -> bytes:
        off = (i + 1) * ssz
        if off + ssz > len(blob):
            raise ValueError(f"cfb: sector {i} out of bounds")
        return blob[off : off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = list(struct.unpack_from("<109I", blob, 76))
    d = first_difat
    seen = 0
    while d not in (_ENDOFCHAIN, _FREESECT):
        if seen > n_difat + 16:
            raise ValueError("cfb: broken DIFAT chain")
        sec = sector(d)
        entries = struct.unpack(f"<{ssz // 4}I", sec)
        difat.extend(entries[:-1])
        d = entries[-1]
        seen += 1
    fat: list[int] = []
    for fs in difat:
        if fs in (_FREESECT, _ENDOFCHAIN):
            continue
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    def read_chain(start: int, what: str) -> bytes:
        return b"".join(sector(s) for s in _chain(fat, start, what))

    dir_bytes = read_chain(first_dir, "directory")
    minifat: list[int] = []
    if first_minifat not in (_ENDOFCHAIN, _FREESECT):
        mf = read_chain(first_minifat, "mini-FAT")
        minifat = list(
            struct.unpack(f"<{len(mf) // 4}I", mf)
        )
    entries = []
    for off in range(0, len(dir_bytes) - 127, 128):
        e = dir_bytes[off : off + 128]
        (name_len,) = struct.unpack_from("<H", e, 64)
        typ = e[66]
        if typ == 0 or name_len < 2 or name_len > 64:
            entries.append(None)
            continue
        name = e[: name_len - 2].decode("utf-16-le", "replace")
        (child,) = struct.unpack_from("<I", e, 76)
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        entries.append(
            {
                "name": name,
                "type": typ,  # 1 storage, 2 stream, 5 root
                "left": struct.unpack_from("<I", e, 68)[0],
                "right": struct.unpack_from("<I", e, 72)[0],
                "child": child,
                "start": start,
                "size": size,
            }
        )
    if not entries or entries[0] is None or entries[0]["type"] != 5:
        raise ValueError("cfb: missing root directory entry")
    root = entries[0]
    mini_stream = (
        read_chain(root["start"], "mini-stream")
        if root["size"] and root["start"] != _ENDOFCHAIN
        else b""
    )

    def stream_bytes(e: dict) -> bytes:
        size = e["size"]
        if size > MAX_MEMBER:
            raise ValueError(f"cfb: stream {e['name']} exceeds guard")
        if size == 0:
            return b""
        if size < mini_cutoff and e is not root:
            chunks = []
            for s in _chain(minifat, e["start"], "mini"):
                off = s * msz
                if off + msz > len(mini_stream):
                    raise ValueError("cfb: mini sector out of bounds")
                chunks.append(mini_stream[off : off + msz])
            return b"".join(chunks)[:size]
        return read_chain(e["start"], e["name"])[:size]

    return entries, stream_bytes


def cfb_streams(blob: bytes) -> list[tuple[str, bytes]]:
    """(path, bytes) per stream, storages flattened with '/'
    separators, in red-black-tree traversal order (deterministic).
    Cycle- and depth-guarded against crafted directories."""
    entries, stream_bytes = _parse(blob)
    out: list[tuple[str, bytes]] = []
    visited: set[int] = set()

    def walk(idx: int, prefix: str, depth: int) -> None:
        if idx == _NOSTREAM or idx >= len(entries):
            return
        if idx in visited or depth > 64:
            raise ValueError("cfb: directory cycle or too deep")
        visited.add(idx)
        e = entries[idx]
        if e is None:
            return
        walk(e["left"], prefix, depth + 1)
        if e["type"] == 2:
            out.append((prefix + e["name"], stream_bytes(e)))
        elif e["type"] == 1:
            walk(e["child"], prefix + e["name"] + "/", depth + 1)
        walk(e["right"], prefix, depth + 1)

    walk(entries[0]["child"], "", 0)
    return out


_KIND_STREAMS = [
    ("WordDocument", "doc"),
    ("Workbook", "xls"),
    ("Book", "xls"),
    ("PowerPoint Document", "ppt"),
    ("__properties_version1.0", "msg"),
    ("EncryptedPackage", "encrypted-ooxml"),
]


def cfb_kind(blob: bytes) -> dict:
    """Route a CFB payload by its stream inventory: {kind, streams
    (names), n_streams, total_bytes}. Per-format text extraction is
    the named gap — raising here keeps mis-processing loud."""
    streams = cfb_streams(blob)
    names = [n for n, _ in streams]
    kind = "unknown"
    for marker, k in _KIND_STREAMS:
        if any(n == marker or n.endswith("/" + marker) for n in names):
            kind = k
            break
    return {
        "kind": kind,
        "streams": names,
        "n_streams": len(names),
        "total_bytes": sum(len(b) for _, b in streams),
    }


def encode_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Fixture writer: a version-3 (512-byte-sector) container with
    the given root-level streams. Small streams route through the
    mini stream (< 4096 bytes), large ones through the FAT — both
    read paths get exercised. Directory tree is a simple left-spine
    (legal: the spec requires a tree, balance is a SHOULD)."""
    ssz, msz, cutoff = 512, 64, 4096
    big: list[bytes] = []  # regular sectors, index = position
    # --- build stream payloads
    mini_parts: list[bytes] = []
    minifat: list[int] = []
    dir_entries: list[dict] = []
    for name, data in streams:
        if len(data) < cutoff:
            start = len(minifat)
            nsec = max(1, -(-len(data) // msz))
            for k in range(nsec):
                mini_parts.append(
                    data[k * msz : (k + 1) * msz].ljust(msz, b"\x00")
                )
                minifat.append(
                    start + k + 1 if k < nsec - 1 else _ENDOFCHAIN
                )
            dir_entries.append(
                {"name": name, "start": start, "size": len(data),
                 "mini": True}
            )
        else:
            dir_entries.append(
                {"name": name, "data": data, "size": len(data),
                 "mini": False}
            )
    mini_stream = b"".join(mini_parts)

    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        if not data:
            return _ENDOFCHAIN
        nsec = -(-len(data) // ssz)
        first = len(big)
        for k in range(nsec):
            big.append(
                data[k * ssz : (k + 1) * ssz].ljust(ssz, b"\x00")
            )
            fat.append(
                first + k + 1 if k < nsec - 1 else _ENDOFCHAIN
            )
        return first

    for e in dir_entries:
        if not e["mini"]:
            e["start"] = add_chain(e["data"])
    mini_start = add_chain(mini_stream)
    minifat_bytes = b"".join(
        struct.pack("<I", v) for v in minifat
    )
    minifat_start = add_chain(minifat_bytes)
    n_minifat_sectors = (
        -(-len(minifat_bytes) // ssz) if minifat_bytes else 0
    )
    # --- directory: root + left-spine of streams
    dents = bytearray()

    def dent(name, typ, left, right, child, start, size):
        nm = name.encode("utf-16-le")[:62]
        e = bytearray(128)
        e[: len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, left)
        struct.pack_into("<I", e, 72, right)
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start & 0xFFFFFFFF)
        struct.pack_into("<Q", e, 120, size)
        dents.extend(e)

    dent(
        "Root Entry", 5, _NOSTREAM, _NOSTREAM,
        1 if dir_entries else _NOSTREAM,
        mini_start, len(mini_stream),
    )
    for k, e in enumerate(dir_entries):
        nxt = k + 2 if k + 1 < len(dir_entries) else _NOSTREAM
        dent(
            e["name"], 2, _NOSTREAM, nxt, _NOSTREAM,
            e["start"], e["size"],
        )
    dir_start = add_chain(bytes(dents))
    # --- FAT sectors themselves
    n_data = len(big)
    n_fat = 1
    while (n_data + n_fat) * 4 > n_fat * ssz:
        n_fat += 1
    fat_start = len(big)
    for k in range(n_fat):
        fat.append(_FATSECT)
    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    fat_bytes = fat_bytes.ljust(n_fat * ssz, b"\xff")
    for k in range(n_fat):
        big.append(fat_bytes[k * ssz : (k + 1) * ssz])
    # --- header
    hdr = bytearray(512)
    hdr[:8] = MAGIC
    struct.pack_into("<HHHHH", hdr, 24, 0x3E, 3, 0xFFFE, 9, 6)
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, cutoff)
    struct.pack_into(
        "<I", hdr, 60,
        minifat_start if minifat_bytes else _ENDOFCHAIN,
    )
    struct.pack_into("<I", hdr, 64, n_minifat_sectors)
    struct.pack_into("<I", hdr, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", hdr, 72, 0)
    if n_fat > 109:
        raise ValueError(
            "encode_cfb: container needs a DIFAT chain (fixture "
            "writer caps at 109 FAT sectors ≈ 13 MB)"
        )
    difat = [fat_start + k for k in range(n_fat)]
    difat += [_FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", hdr, 76, *difat)
    return bytes(hdr) + b"".join(big)


def cfb_features(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched routing: (id, kind, n_streams, total_bytes,
    stream_names) per container. ``errors="quarantine"`` adds
    (err_class, err_msg) side rows for damaged containers instead
    of killing the task (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        extraction_envelope,
    )

    def per_row(rid: int, blob: bytes) -> list[dict]:
        m = cfb_kind(blob)
        return [
            {
                "kind": m["kind"],
                "n_streams": m["n_streams"],
                "total_bytes": m["total_bytes"],
                "stream_names": m["streams"],
            }
        ]

    return extraction_envelope(
        df,
        per_row,
        [
            ("kind", "string"),
            ("n_streams", "long"),
            ("total_bytes", "long"),
            ("stream_names", "array<string>"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )
