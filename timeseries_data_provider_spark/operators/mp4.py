"""[EXT] ISO-BMFF (MP4/MOV) container-metadata codec: the video tier
of the multimodal pipeline treats clips as opaque binary + TYPED
METADATA, and this module makes the metadata REAL — a stdlib-only box
parser over the public ISO/IEC 14496-12 base-media format (ftyp /
moov / mvhd / trak / tkhd / mdia / mdhd / hdlr / stbl / stsd), the
part of MP4 that needs no codec library. Frame DECODE stays a plug-in
(entropy-coded H.264/HEVC genuinely needs libav — the documented
``NotImplementedError`` boundary in operators/multimodal.py); what a
100 TB video-corpus build actually filters and routes on — track
count, codec fourcc, dimensions, duration, brand — is all here.

``build_skeleton`` emits a minimal well-formed metadata-only
container (ftyp + moov, no mdat) so tests and the declared q34 branch
exercise the parser on REAL box structure with closed-form field
values the SQL oracle recomputes.

Scope (honest): top-level and moov-subtree box walking, 32/64-bit box
sizes, mvhd/tkhd/mdhd version 0 and 1, first-entry stsd codec fourcc.
Fragmented MP4 (moof) carries its duration in per-fragment boxes —
reported as duration 0 here, named in the dict via ``fragmented``.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in
    [start, end); 64-bit sizes (size==1) and to-end (size==0)
    handled; malformed sizes raise ValueError."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = struct.unpack(">I", data[pos : pos + 4])[0]
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated 64-bit box header")
            size = struct.unpack(">Q", data[pos + 8 : pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(
                f"mp4: box {tag!r} claims size {size} beyond its "
                "container"
            )
        yield tag, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, tag: bytes):
    for t, b, e in _boxes(data, start, end):
        if t == tag:
            return b, e
    return None


def _fixed16(v: int) -> int:
    return v >> 16


def _need(b: int, e: int, n: int, tag: str) -> None:
    # explicit body-length check: a truncated box mid-payload would
    # otherwise SILENTLY slice into the next box's bytes (the payload
    # is contiguous, so short slices only fail at end-of-buffer)
    if e - b < n:
        raise ValueError(
            f"mp4: {tag} body {e - b} bytes, needs {n} (truncated)"
        )


def _parse_mvhd(data: bytes, b: int, e: int) -> tuple[int, int]:
    _need(b, e, 1, "mvhd")
    version = data[b]
    if version == 1:
        _need(b, e, 32, "mvhd v1")
        ts, dur = struct.unpack(">IQ", data[b + 20 : b + 32])
    else:
        _need(b, e, 20, "mvhd")
        ts, dur = struct.unpack(">II", data[b + 12 : b + 20])
    if ts == 0:
        raise ValueError("mp4: mvhd timescale 0")
    return ts, dur


def _parse_tkhd(data: bytes, b: int, e: int) -> tuple[int, int, int, int]:
    _need(b, e, 1, "tkhd")
    version = data[b]
    if version == 1:
        _need(b, e, 96, "tkhd v1")
        track_id = struct.unpack(">I", data[b + 20 : b + 24])[0]
        dur = struct.unpack(">Q", data[b + 28 : b + 36])[0]
    else:
        _need(b, e, 84, "tkhd")
        track_id = struct.unpack(">I", data[b + 12 : b + 16])[0]
        dur = struct.unpack(">I", data[b + 20 : b + 24])[0]
    w, h = struct.unpack(">II", data[e - 8 : e])
    return track_id, dur, _fixed16(w), _fixed16(h)


def _parse_hdlr(data: bytes, b: int) -> bytes:
    return data[b + 8 : b + 12]


def _parse_stsd_codec(data: bytes, b: int, e: int) -> str | None:
    _need(b, e, 8, "stsd")
    n = struct.unpack(">I", data[b + 4 : b + 8])[0]
    if n == 0:
        return None
    # first sample entry is a normal box right after the entry count
    for tag, _eb, _ee in _boxes(data, b + 8, e):
        return tag.decode("latin-1")
    return None


def decode_video_meta(payload: bytes) -> dict:
    """Parse an ISO-BMFF container's metadata:
    {format, major_brand, timescale, duration_ms, n_tracks,
    fragmented, tracks: [{track_id, kind, codec, width, height,
    duration_ms}]}. Raises ValueError on malformed boxes and on
    non-BMFF payloads — INCLUDING truncated fixed-size box bodies,
    which surface from struct/index errors inside the field parsers:
    corpus-triage code classifies on ValueError, same contract as
    ``decode_baseline_jpeg`` (review finding)."""
    try:
        return _decode_video_meta(payload)
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"mp4: truncated or corrupt payload ({ex})"
        ) from ex


def _decode_video_meta(payload: bytes) -> dict:
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp (not an ISO-BMFF container)")
    end = len(payload)
    major = None
    moov = None
    fragmented = False
    for tag, b, e in _boxes(payload, 0, end):
        if tag == b"ftyp":
            major = payload[b : b + 4].decode("latin-1").strip()
        elif tag == b"moov":
            moov = (b, e)
        elif tag == b"moof":
            fragmented = True
    if moov is None:
        raise ValueError("mp4: no moov box (metadata not present)")
    mb, me = moov
    mvhd = _find(payload, mb, me, b"mvhd")
    if mvhd is None:
        raise ValueError("mp4: moov without mvhd")
    ts, dur = _parse_mvhd(payload, mvhd[0], mvhd[1])
    tracks = []
    for tag, b, e in _boxes(payload, mb, me):
        if tag != b"trak":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        if tkhd is None or mdia is None:
            raise ValueError("mp4: trak missing tkhd/mdia")
        track_id, tdur, w, h = _parse_tkhd(payload, tkhd[0], tkhd[1])
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        kind_fourcc = (
            _parse_hdlr(payload, hdlr[0]) if hdlr else b"????"
        )
        kind = {b"vide": "video", b"soun": "audio"}.get(
            kind_fourcc, kind_fourcc.decode("latin-1")
        )
        codec = None
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf:
            stbl = _find(payload, minf[0], minf[1], b"stbl")
            if stbl:
                stsd = _find(payload, stbl[0], stbl[1], b"stsd")
                if stsd:
                    codec = _parse_stsd_codec(
                        payload, stsd[0], stsd[1]
                    )
        tracks.append(
            {
                "track_id": track_id,
                "kind": kind,
                "codec": codec,
                "width": w or None,
                "height": h or None,
                "duration_ms": (tdur * 1000) // ts,
            }
        )
    return {
        "format": "mp4",
        "major_brand": major,
        "timescale": ts,
        "duration_ms": (dur * 1000) // ts,
        "n_tracks": len(tracks),
        "fragmented": fragmented,
        "tracks": tracks,
    }


# --------------------------------------------------------------------------
# metadata-only skeleton builder (tests + the declared q34 branch)

def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


_MATRIX = struct.pack(
    ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
)


def _mvhd(timescale: int, duration: int, next_track: int) -> bytes:
    body = (
        b"\x00\x00\x00\x00"  # version/flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10  # reserved
        + _MATRIX
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", next_track)
    )
    return _box(b"mvhd", body)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    body = (
        b"\x00\x00\x00\x07"  # version 0, flags: enabled|in-movie|preview
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", track_id)
        + b"\x00" * 4
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100 if w == 0 else 0, 0)
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16)
    )
    return _box(b"tkhd", body)


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _box(
        b"hdlr",
        b"\x00" * 8 + handler + b"\x00" * 12 + name + b"\x00",
    )


def _mdhd(timescale: int, duration: int) -> bytes:
    body = (
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration)
        + struct.pack(">HH", 0x55C4, 0)  # language 'und', pre_defined
    )
    return _box(b"mdhd", body)


def _stsd(codec: bytes) -> bytes:
    # one minimal sample entry: 6 reserved bytes + data_reference_index
    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1))
    return _box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + entry)


def _trak(
    track_id: int,
    duration: int,
    handler: bytes,
    codec: bytes,
    w: int = 0,
    h: int = 0,
    timescale: int = 1000,
) -> bytes:
    stbl = _box(b"stbl", _stsd(codec))
    minf = _box(b"minf", stbl)
    mdia = _box(
        b"mdia",
        _mdhd(timescale, duration) + _hdlr(handler, b"tdps") + minf,
    )
    return _box(b"trak", _tkhd(track_id, duration, w, h) + mdia)


def build_skeleton(
    duration_ms: int,
    width: int,
    height: int,
    video_codec: bytes = b"mp4v",
    audio_codec: bytes = b"mp4a",
    timescale: int = 1000,
) -> bytes:
    """Minimal metadata-only MP4 (ftyp + moov with one video and one
    audio track, no mdat). With ``timescale=1000`` every duration
    field IS milliseconds — the closed-form regime the q34 branch's
    oracle recomputes."""
    dur = (duration_ms * timescale) // 1000
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp42"
    )
    moov = _box(
        b"moov",
        _mvhd(timescale, dur, 3)
        + _trak(1, dur, b"vide", video_codec, width, height, timescale)
        + _trak(2, dur, b"soun", audio_codec, 0, 0, timescale),
    )
    return ftyp + moov
