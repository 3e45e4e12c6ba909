"""Matroska / WebM (EBML) container metadata — stdlib-only.

MKV/WebM is the other container a crawled video corpus routes on
(WebM is the <video>-tag format; MKV the archival one). Like
operators/mp4.py this is the METADATA tier: doctype, duration,
per-track type/codec/dimensions — the routing fields an ingest
pipeline filters and shards by before any codec runs. Frame decode
stays the registered-codec boundary (VP8/VP9/AV1/Opus are codec
libraries, not container work).

Public-knowledge basis: the EBML RFC 8794 (variable-length integers,
element framing) and the public Matroska element registry
(matroska.org spec; element IDs below). No reference-repo surface —
the reference (index.js:1-290) has no media path; [EXT] scope per
SURVEY §2.

EBML framing: every element is <id-vint><size-vint><payload>. A
vint's leading-zero count in the FIRST byte gives its total length
(1-8 bytes); element IDs keep the marker bit, data sizes clear it.
An all-ones size is "unknown" (streaming) — accepted only on Segment
(the one element real muxers leave unsized), where the payload runs
to end-of-file; anywhere else it raises, because an unsized interior
element makes bounds-checking impossible.

Scale shape: per-file independent walk over the HEAD of the file
(Info + Tracks precede Clusters in every real muxer's output;
Clusters are skipped without reading their bytes), O(header) not
O(file) — the same envelope as mp4.decode_video_meta. Arrow fan-out
one row per track via ``track_features``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "decode_mkv_meta",
    "encode_mkv_skeleton",
    "track_features",
    "synth_mkv_media",
]

# Matroska element IDs (public registry)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_MUXING_APP = 0x4D80
_WRITING_APP = 0x5741
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675

_TRACK_TYPES = {1: "video", 2: "audio", 17: "subtitle"}

MAX_HEADER_WALK = 64 * 1024 * 1024  # hostile-size guard


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int, bool]:
    """Read one EBML vint at ``pos``. Returns (value, new_pos,
    is_unknown). ``keep_marker`` True for element IDs (the length
    marker bit is part of the ID), False for sizes (cleared)."""
    if pos >= len(data):
        raise ValueError("ebml: truncated vint")
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: vint longer than 8 bytes")
    length = 1
    mask = 0x80
    while not (first & mask):
        length += 1
        mask >>= 1
    if pos + length > len(data):
        raise ValueError("ebml: truncated vint body")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length, False
    value = raw & ~(mask << (8 * (length - 1)))
    unknown = value == (1 << (7 * length)) - 1
    return value, pos + length, unknown


def _iter_elements(
    data: bytes, pos: int, end: int
) -> Iterator[tuple[int, int, int]]:
    """Yield (element_id, payload_start, payload_end) for the
    children of [pos, end). Bounds-checked against the parent."""
    while pos < end:
        eid, pos, _ = _read_vint(data, pos, keep_marker=True)
        size, pos, unknown = _read_vint(data, pos, keep_marker=False)
        if unknown:
            if eid != _SEGMENT:
                raise ValueError(
                    f"ebml: unknown-size element 0x{eid:X} outside Segment"
                )
            yield eid, pos, end
            return
        if pos + size > end:
            raise ValueError(
                f"ebml: element 0x{eid:X} size {size} exceeds parent"
            )
        yield eid, pos, pos + size
        pos += size


def _uint(data: bytes) -> int:
    if len(data) > 8:
        raise ValueError("ebml: uint wider than 8 bytes")
    return int.from_bytes(data, "big")


def _float(data: bytes) -> float:
    if len(data) == 4:
        return struct.unpack(">f", data)[0]
    if len(data) == 8:
        return struct.unpack(">d", data)[0]
    raise ValueError(f"ebml: float of width {len(data)}")


def _string(data: bytes) -> str:
    return data.decode("utf-8", "replace").rstrip("\x00")


def decode_mkv_meta(payload: bytes) -> dict:
    """Parse the metadata head of an MKV/WebM file: doctype,
    timestamp scale, duration (exact integer ms via floor), muxing
    app, and one dict per TrackEntry (number, type, codec, video
    dims / audio rate+channels). Cluster payloads are never read."""
    if len(payload) < 4:
        raise ValueError("ebml: truncated file")
    walk_end = min(len(payload), MAX_HEADER_WALK)
    out: dict = {
        "doctype": None,
        "timescale_ns": 1_000_000,  # Matroska default
        "duration_ms": None,
        "muxing_app": None,
        "tracks": [],
    }
    duration_ticks: float | None = None
    saw_header = False
    saw_segment = False
    for eid, s, e in _iter_elements(payload, 0, walk_end):
        if eid == _EBML_HEADER:
            saw_header = True
            for cid, cs, ce in _iter_elements(payload, s, e):
                if cid == _DOCTYPE:
                    out["doctype"] = _string(payload[cs:ce])
        elif eid == _SEGMENT:
            saw_segment = True
            for cid, cs, ce in _iter_elements(payload, s, e):
                if cid == _INFO:
                    for iid, is_, ie in _iter_elements(payload, cs, ce):
                        if iid == _TIMESTAMP_SCALE:
                            out["timescale_ns"] = _uint(payload[is_:ie])
                        elif iid == _DURATION:
                            duration_ticks = _float(payload[is_:ie])
                        elif iid == _MUXING_APP:
                            out["muxing_app"] = _string(payload[is_:ie])
                elif cid == _TRACKS:
                    for tid, ts, te in _iter_elements(payload, cs, ce):
                        if tid == _TRACK_ENTRY:
                            out["tracks"].append(
                                _parse_track(payload, ts, te)
                            )
                elif cid == _CLUSTER:
                    break  # metadata precedes clusters; stop the walk
    if not saw_header or not saw_segment:
        raise ValueError("ebml: not a Matroska file (header/segment)")
    if duration_ticks is not None:
        out["duration_ms"] = int(
            duration_ticks * out["timescale_ns"] // 1_000_000
        )
    return out


def _parse_track(payload: bytes, s: int, e: int) -> dict:
    t: dict = {
        "track_number": None,
        "track_type": None,
        "codec_id": None,
        "width": None,
        "height": None,
        "sample_rate_milli": None,
        "channels": None,
    }
    for cid, cs, ce in _iter_elements(payload, s, e):
        if cid == _TRACK_NUMBER:
            t["track_number"] = _uint(payload[cs:ce])
        elif cid == _TRACK_TYPE:
            code = _uint(payload[cs:ce])
            t["track_type"] = _TRACK_TYPES.get(code, str(code))
        elif cid == _CODEC_ID:
            t["codec_id"] = _string(payload[cs:ce])
        elif cid == _VIDEO:
            for vid, vs, ve in _iter_elements(payload, cs, ce):
                if vid == _PIXEL_WIDTH:
                    t["width"] = _uint(payload[vs:ve])
                elif vid == _PIXEL_HEIGHT:
                    t["height"] = _uint(payload[vs:ve])
        elif cid == _AUDIO:
            for aid, as_, ae in _iter_elements(payload, cs, ce):
                if aid == _SAMPLING_FREQ:
                    t["sample_rate_milli"] = int(
                        _float(payload[as_:ae]) * 1000
                    )
                elif aid == _CHANNELS:
                    t["channels"] = _uint(payload[as_:ae])
    return t


# -- test/fixture writer ----------------------------------------------


def _vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _vint_size(size: int) -> bytes:
    # smallest width whose value space holds ``size`` (excluding the
    # all-ones "unknown" pattern)
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:
            return (size | (1 << (7 * length))).to_bytes(length, "big")
    raise ValueError("ebml: size too large for a vint")


def _el(eid: int, payload: bytes) -> bytes:
    return _vint_id(eid) + _vint_size(len(payload)) + payload


def _uint_el(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def encode_mkv_skeleton(
    doctype: str = "matroska",
    timescale_ns: int = 1_000_000,
    duration_ticks: float | None = None,
    tracks: list[dict] | None = None,
    unknown_segment_size: bool = False,
) -> bytes:
    """Build a metadata-only Matroska skeleton (EBML header +
    Segment(Info, Tracks)) — the fixture writer for roundtrip tests
    and the q34 branch. ``unknown_segment_size`` emits the streaming
    Segment (all-ones size vint) real muxers produce."""
    header = _el(_EBML_HEADER, _el(_DOCTYPE, doctype.encode()))
    info = _el(_TIMESTAMP_SCALE, timescale_ns.to_bytes(4, "big"))
    if duration_ticks is not None:
        info += _el(_DURATION, struct.pack(">d", float(duration_ticks)))
    info += _el(_MUXING_APP, b"tdps-synth")
    seg_body = _el(_INFO, info)
    entries = b""
    for t in tracks or []:
        body = _uint_el(_TRACK_NUMBER, t["track_number"])
        body += _uint_el(_TRACK_TYPE, t["type_code"])
        body += _el(_CODEC_ID, t["codec_id"].encode())
        if t.get("width") is not None:
            body += _el(
                _VIDEO,
                _uint_el(_PIXEL_WIDTH, t["width"])
                + _uint_el(_PIXEL_HEIGHT, t["height"]),
            )
        if t.get("sample_rate") is not None:
            body += _el(
                _AUDIO,
                _el(_SAMPLING_FREQ, struct.pack(">d", t["sample_rate"]))
                + _uint_el(_CHANNELS, t.get("channels", 1)),
            )
        entries += _el(_TRACK_ENTRY, body)
    seg_body += _el(_TRACKS, entries)
    if unknown_segment_size:
        seg = _vint_id(_SEGMENT) + b"\xff" + seg_body
    else:
        seg = _el(_SEGMENT, seg_body)
    return header + seg


def track_features(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow 1->N fan-out: one row per track of each MKV blob, plus
    the file-level doctype/duration on every row — the routing frame
    a video ingest tier filters/shards on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [],
                "doctype": [],
                "duration_ms": [],
                "track_number": [],
                "track_kind": [],
                "codec": [],
                "width": [],
                "height": [],
                "sample_rate_milli": [],
                "channels": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                meta = decode_mkv_meta(bytes(blob))
                for t in meta["tracks"]:
                    out[id_col].append(int(rid))
                    out["doctype"].append(meta["doctype"])
                    out["duration_ms"].append(meta["duration_ms"])
                    out["track_number"].append(t["track_number"])
                    out["track_kind"].append(t["track_type"])
                    out["codec"].append(t["codec_id"])
                    out["width"].append(t["width"])
                    out["height"].append(t["height"])
                    out["sample_rate_milli"].append(
                        t["sample_rate_milli"]
                    )
                    out["channels"].append(t["channels"])
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, doctype string, duration_ms long, "
        "track_number long, track_kind string, codec string, "
        "width long, height long, sample_rate_milli long, channels long"
    )
    return df.select(id_col, blob_col).mapInPandas(run, schema)


def synth_mkv_media(ids: DataFrame) -> DataFrame:
    """Deterministic MKV/WebM skeletons per doc_id — q34's 'mkv'
    branch input. Closed-form fields the oracle recomputes:

    - doctype: webm when id%2==0 else matroska
    - duration_ms = 1000 + 7*id (timescale 1 ms/tick; float64 holds
      these integers exactly, so floor is exact)
    - video track 1: V_VP8/V_VP9/V_MPEG4/ISO/AVC by id%3,
      320+id%16 x 240+id%8
    - audio track 2 when id%2==0: A_OPUS/A_VORBIS by id%4==0,
      48000 vs 44100 Hz, 2 vs 1 channels
    - even ids use the unknown-size (streaming) Segment form"""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id in pdf["doc_id"].astype("int64"):
                doc_id = int(doc_id)
                tracks = [
                    {
                        "track_number": 1,
                        "type_code": 1,
                        "codec_id": (
                            "V_VP8",
                            "V_VP9",
                            "V_MPEG4/ISO/AVC",
                        )[doc_id % 3],
                        "width": 320 + doc_id % 16,
                        "height": 240 + doc_id % 8,
                    }
                ]
                if doc_id % 2 == 0:
                    tracks.append(
                        {
                            "track_number": 2,
                            "type_code": 2,
                            "codec_id": (
                                "A_OPUS" if doc_id % 4 == 0 else "A_VORBIS"
                            ),
                            "sample_rate": (
                                48000.0 if doc_id % 4 == 0 else 44100.0
                            ),
                            "channels": 2 if doc_id % 4 == 0 else 1,
                        }
                    )
                payload = encode_mkv_skeleton(
                    doctype="webm" if doc_id % 2 == 0 else "matroska",
                    duration_ticks=float(1000 + 7 * doc_id),
                    tracks=tracks,
                    unknown_segment_size=doc_id % 2 == 0,
                )
                out["doc_id"].append(doc_id)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return ids.select("doc_id").mapInPandas(
        synth, "doc_id long, payload binary"
    )
