"""MP3 frame-header metadata — stdlib-only.

MP3 is the most common crawled audio format; what an audio-corpus
ingest tier needs from it is ROUTING metadata — duration, bitrate,
sample rate, channel mode, tag size — all derivable from the fixed
4-byte frame headers without touching a single Huffman bit. Payload
decode (MDCT/Huffman) is a genuine codec-library boundary, exactly
like VP8 lossy (vp8l.py:23) — named, not hidden.

Public-knowledge basis: the MPEG-1/2 audio frame header layout
(ISO/IEC 11172-3 / 13818-3, widely documented), the public bitrate/
samplerate index tables, and the ID3v2 tag structure (id3.org):
``ID3`` + version + flags + a 28-bit SYNCSAFE length (7 bits per
byte — the quirk that breaks naive parsers).

Duration is exact integer math: every frame contributes a fixed
sample count (Layer I: 384; Layer II: 1152; Layer III: 1152 for
MPEG-1, 576 for MPEG-2/2.5), so duration_ms = total_samples * 1000
// rate — no float, engine-portable if ever oracle-scored.

Real-world tolerance: crawled MP3s routinely end mid-frame
(truncated downloads) or carry trailing tags. After at least one
clean frame, a bad or partial header STOPS the walk and sets
``clean_eof=False`` instead of raising (a real decoder resyncs);
garbage at the very start raises the named error. FREE-FORMAT
streams (bitrate index 0 — r11) discover their fixed frame size by
scanning to the next matching sync word; a single-frame free stream
is undiscoverable by construction and raises the named error.

Scale shape: per-row independent, linear in bytes (a 4-byte read per
frame, payload skipped by size), Arrow fan-out via ``mp3_features``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = [
    "decode_mp3_meta",
    "id3_tags",
    "encode_mp3_skeleton",
    "mp3_features",
]

# bitrate tables in kbps, indexed [version_group][layer][idx]; 0 =
# "free format" (named unsupported), 15 = illegal
_BITRATES_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BITRATES_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_RATES = {
    3: (44100, 48000, 32000),  # MPEG-1
    2: (22050, 24000, 16000),  # MPEG-2
    0: (11025, 12000, 8000),  # MPEG-2.5
}
_CHANNELS = {0: 2, 1: 2, 2: 2, 3: 1}  # stereo/joint/dual/mono
_VERSION_NAME = {3: "1", 2: "2", 0: "2.5"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


_ID3_TEXT = {"TIT2": "title", "TPE1": "artist", "TALB": "album"}
_ID3_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def id3_tags(payload: bytes) -> dict:
    """Title/artist/album from an ID3v2.2-2.4 tag (id3.org): frame
    walk with per-version size semantics (v2.4 syncsafe, v2.3 plain
    BE, v2.2 3-byte ids/sizes) and the text-frame encoding byte
    (latin-1 / utf-16 BOM / utf-16be / utf-8). Absent tag or fields
    -> Nones; a corrupt frame stops the walk (tags are advisory —
    never fail the file over them)."""
    out = {"title": None, "artist": None, "album": None}
    if payload[:3] != b"ID3" or len(payload) < 10:
        return out
    ver = payload[3]
    tag_end = 10 + _syncsafe(payload[6:10])
    pos = 10
    if payload[5] & 0x40:  # extended header: skip by its own size
        if ver >= 4:
            pos += _syncsafe(payload[10:14])
        else:
            pos += 4 + int.from_bytes(payload[10:14], "big")
    id_len, sz_len, fl_len = (3, 3, 0) if ver == 2 else (4, 4, 2)
    names = (
        {"TT2": "title", "TP1": "artist", "TAL": "album"}
        if ver == 2
        else _ID3_TEXT
    )
    while pos + id_len + sz_len + fl_len <= min(tag_end, len(payload)):
        fid = payload[pos : pos + id_len]
        if fid.strip(b"\x00") == b"":
            break  # padding
        try:
            fid_s = fid.decode("ascii")
        except UnicodeDecodeError:
            break
        raw_sz = payload[pos + id_len : pos + id_len + sz_len]
        if ver >= 4:
            size = _syncsafe(raw_sz)
        else:
            size = int.from_bytes(raw_sz, "big")
        pos += id_len + sz_len + fl_len
        body = payload[pos : pos + size]
        if len(body) != size:
            break
        pos += size
        field = names.get(fid_s)
        if field and body:
            enc = _ID3_ENCODINGS.get(body[0])
            if enc:
                out[field] = (
                    body[1:]
                    .decode(enc, "replace")
                    .rstrip("\x00")
                    .strip()
                    or None
                )
    return out


def _parse_header(b: bytes, free_base: int | None = None) -> dict:
    """One 4-byte frame header -> fields + frame byte length.
    Raises ValueError on non-frame bytes (callers decide whether
    that is fatal or end-of-stream). ``free_base``: the discovered
    PADDING-FREE frame size for a free-format stream (bitrate index
    0 — ISO 11172-3 leaves the size undeclared; decode_mp3_meta
    discovers it by resync scan); without it a free-format header
    stays the named NotImplementedError."""
    h = int.from_bytes(b, "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mp3: bad frame sync")
    ver_code = (h >> 19) & 3
    if ver_code == 1:
        raise ValueError("mp3: reserved version")
    layer_code = (h >> 17) & 3
    if layer_code == 0:
        raise ValueError("mp3: reserved layer")
    layer = 4 - layer_code  # code 3 -> Layer I, 1 -> Layer III
    br_idx = (h >> 12) & 0xF
    if br_idx == 15:
        raise ValueError("mp3: illegal bitrate index")
    free = br_idx == 0
    if free and free_base is None:
        raise NotImplementedError(
            "mp3: free-format bitrate (frame size is undeclared; "
            "decode_mp3_meta discovers it by resync scan)"
        )
    sr_idx = (h >> 10) & 3
    if sr_idx == 3:
        raise ValueError("mp3: reserved sample-rate index")
    rate = _RATES[ver_code][sr_idx]
    padding = (h >> 9) & 1
    channels = _CHANNELS[(h >> 6) & 3]
    if layer == 1:
        samples = 384
        slots = 12
    elif layer == 2:
        samples = 1152
        slots = 144
    else:
        samples = 1152 if ver_code == 3 else 576
        slots = 144 if ver_code == 3 else 72
    if free:
        size = free_base + padding * (4 if layer == 1 else 1)
        # nominal rate DERIVED from the discovered size (inverting
        # the size formula) — free format is constant-size by spec
        if layer == 1:
            bitrate = (size // 4 - padding) * rate // slots
        else:
            bitrate = (size - padding) * rate // slots
    else:
        table = _BITRATES_V1 if ver_code == 3 else _BITRATES_V2
        bitrate = table[layer][br_idx] * 1000
        if layer == 1:
            size = (slots * bitrate // rate + padding) * 4
        else:
            size = slots * bitrate // rate + padding
    return {
        "version": _VERSION_NAME[ver_code],
        "layer": layer,
        "bitrate": bitrate,
        "rate": rate,
        "channels": channels,
        "samples": samples,
        "size": size,
        "free": free,
    }


def _discover_free_size(payload: bytes, pos: int) -> int:
    """Free-format frame size discovery (ISO 11172-3: bitrate index
    0 streams keep one fixed size): scan for the NEXT sync word whose
    header matches the first frame's version/layer/rate and is itself
    free-format. Returns the padding-free base size; undiscoverable
    (single-frame or corrupt) streams raise the named error."""
    h = int.from_bytes(payload[pos : pos + 4], "big")
    key = ((h >> 19) & 3, (h >> 17) & 3, (h >> 10) & 3)
    slot = 4 if ((h >> 17) & 3) == 3 else 1
    padding0 = (h >> 9) & 1
    lo = pos + 24  # header + smallest plausible side info
    hi = min(len(payload) - 4, pos + 8192)  # largest sane frame
    for q in range(lo, hi + 1):
        if payload[q] != 0xFF or (payload[q + 1] & 0xE0) != 0xE0:
            continue
        h2 = int.from_bytes(payload[q : q + 4], "big")
        if (
            ((h2 >> 19) & 3, (h2 >> 17) & 3, (h2 >> 10) & 3) == key
            and (h2 >> 12) & 0xF == 0
        ):
            return (q - pos) - padding0 * slot
    raise ValueError(
        "mp3: free-format frame size undiscoverable (no matching "
        "resync within 8192 bytes)"
    )


def decode_mp3_meta(payload: bytes) -> dict:
    """Walk an MP3 file's frame headers: returns version/layer,
    sample rate, channels, frame count, exact duration_ms,
    bitrate_kbps (the constant rate for CBR, the byte-weighted mean
    for VBR), id3v2_bytes, and clean_eof (False when the stream ends
    mid-frame or in unparseable trailing bytes)."""
    pos = 0
    id3_bytes = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("mp3: truncated ID3v2 header")
        id3_bytes = 10 + _syncsafe(payload[6:10])
        if payload[5] & 0x10:  # footer flag
            id3_bytes += 10
        pos = id3_bytes
        if pos > len(payload):
            raise ValueError("mp3: ID3v2 size exceeds file")
    if pos + 4 > len(payload):
        raise ValueError("mp3: no room for a frame header")
    try:
        first = _parse_header(payload[pos : pos + 4])  # start clean
        free_base = None
    except NotImplementedError:
        # free format (r11): discover the fixed frame size by resync
        free_base = _discover_free_size(payload, pos)
        first = _parse_header(payload[pos : pos + 4], free_base)
    n_frames = 0
    total_samples = 0
    total_bytes = 0
    bitrates = set()
    clean = True
    rate = first["rate"]
    while pos + 4 <= len(payload):
        try:
            h = _parse_header(payload[pos : pos + 4], free_base)
        except (ValueError, NotImplementedError):
            clean = False
            break
        if h["free"] != first["free"]:
            clean = False  # declared<->free switch mid-stream
            break
        if h["rate"] != rate and n_frames > 0:
            clean = False  # mid-stream rate change: stop, don't mix
            break
        if pos + h["size"] > len(payload):
            clean = False  # truncated final frame
            break
        n_frames += 1
        total_samples += h["samples"]
        total_bytes += h["size"]
        bitrates.add(h["bitrate"])
        pos += h["size"]
    if pos != len(payload) and clean:
        clean = False  # trailing non-frame bytes (APE/ID3v1 tags)
    if n_frames == 0:
        raise ValueError("mp3: no complete frame")
    if first["free"]:
        # free format is constant-rate by spec; padding wobble makes
        # per-frame derived rates differ by one slot — report the
        # exact byte-weighted mean and never flag it VBR
        kbps = total_bytes * 8 * rate // (total_samples * 1000)
        bitrates = {kbps * 1000}
    elif len(bitrates) == 1:
        kbps = next(iter(bitrates)) // 1000
    else:
        # byte-weighted mean, floored: bytes*8 / seconds / 1000
        kbps = total_bytes * 8 * rate // (total_samples * 1000)
    return {
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": rate,
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": total_samples * 1000 // rate,
        "bitrate_kbps": kbps,
        "vbr": len(bitrates) > 1,
        "free_format": first["free"],
        "id3v2_bytes": id3_bytes,
        "clean_eof": clean,
        **id3_tags(payload),
    }


def encode_mp3_skeleton(
    n_frames: int = 10,
    bitrate_idx: int = 9,
    rate_idx: int = 0,
    version: int = 3,
    layer: int = 3,
    mono: bool = False,
    id3_size: int = 0,
    bitrate_indices: list[int] | None = None,
    tags: dict | None = None,
    free_size: int | None = None,
) -> bytes:
    """Fixture writer: CBR (or per-frame ``bitrate_indices`` VBR)
    frames with zeroed payloads, optionally preceded by an ID3v2.4
    tag — zero-filled padding of ``id3_size`` bytes and/or real
    utf-8 text frames from ``tags`` ({title, artist, album}).
    ``free_size``: write FREE-FORMAT frames (bitrate index 0) of this
    fixed byte size instead of table-rate frames."""
    out = bytearray()
    frames = b""
    if tags:
        rev = {"title": b"TIT2", "artist": b"TPE1", "album": b"TALB"}
        for k, fid in rev.items():
            v = tags.get(k)
            if v is None:
                continue
            body = b"\x03" + v.encode("utf-8")
            n = len(body)
            frames += fid + bytes(
                [
                    (n >> 21) & 0x7F,
                    (n >> 14) & 0x7F,
                    (n >> 7) & 0x7F,
                    n & 0x7F,
                ]
            ) + b"\x00\x00" + body
    if id3_size or frames:
        content = len(frames) + id3_size
        out += b"ID3\x04\x00\x00"
        out += bytes(
            [
                (content >> 21) & 0x7F,
                (content >> 14) & 0x7F,
                (content >> 7) & 0x7F,
                content & 0x7F,
            ]
        )
        out += frames + b"\x00" * id3_size
    if free_size is not None:
        idxs = [0] * n_frames
    else:
        idxs = bitrate_indices or [bitrate_idx] * n_frames
    layer_code = 4 - layer
    for idx in idxs:
        h = (
            (0x7FF << 21)
            | (version << 19)
            | (layer_code << 17)
            | (1 << 16)  # no CRC
            | (idx << 12)
            | (rate_idx << 10)
            | ((3 if mono else 0) << 6)
        )
        hb = h.to_bytes(4, "big")
        if free_size is not None:
            size = free_size
        else:
            size = _parse_header(hb)["size"]
        out += hb + b"\x00" * (size - 4)
    return bytes(out)


def mp3_features(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched metadata pass: one row per MP3 with the routing
    fields (duration/bitrate/rate/channels/frames/tag size/clean-eof
    flag)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [],
                "version": [],
                "layer": [],
                "sample_rate": [],
                "channels": [],
                "n_frames": [],
                "duration_ms": [],
                "bitrate_kbps": [],
                "vbr": [],
                "free_format": [],
                "id3v2_bytes": [],
                "clean_eof": [],
                "title": [],
                "artist": [],
                "album": [],
            }
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                m = decode_mp3_meta(bytes(blob))
                out[id_col].append(int(rid))
                for k in m:
                    out[k].append(m[k])
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, version string, layer long, sample_rate long, "
        "channels long, n_frames long, duration_ms long, "
        "bitrate_kbps long, vbr boolean, free_format boolean, "
        "id3v2_bytes long, "
        "clean_eof boolean, title string, artist string, album string"
    )
    return df.select(id_col, blob_col).mapInPandas(run, schema)
