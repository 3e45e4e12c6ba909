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
sizes, mvhd/tkhd/mdhd version 0 and 1, first-entry stsd codec fourcc,
and the full sample-table tier (stts/stsc/stsz/stz2/stco/co64) — the
part that turns metadata routing into actual video INGESTION routing:
at 100 TB the question is "which byte ranges of which objects do I
fetch", and that is exactly what per-sample offsets/sizes answer.
``iter_samples`` exposes the per-sample (offset, size, dts) stream as
the plug-in contract for a frame decoder. Fragmented MP4 (moof)
carries its sample runs in per-fragment trun boxes — reported as
duration 0 / no sample tables here, named via ``fragmented``.
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


def _full_box_count(data: bytes, b: int, e: int, tag: str) -> int:
    """Entry count of a full box (4-byte version/flags + 4-byte count),
    with the count bounded later by explicit _need checks so a hostile
    count cannot drive an allocation the body doesn't back."""
    _need(b, e, 8, tag)
    return struct.unpack(">I", data[b + 4 : b + 8])[0]


def _parse_stts(data: bytes, b: int, e: int) -> list[tuple[int, int]]:
    n = _full_box_count(data, b, e, "stts")
    _need(b, e, 8 + 8 * n, "stts entries")
    return [
        struct.unpack(">II", data[b + 8 + 8 * k : b + 16 + 8 * k])
        for k in range(n)
    ]


def _parse_stsc(data: bytes, b: int, e: int) -> list[tuple[int, int]]:
    """(first_chunk, samples_per_chunk) entries; first_chunk must be
    1-based and strictly increasing (ISO 14496-12 8.7.4)."""
    n = _full_box_count(data, b, e, "stsc")
    _need(b, e, 8 + 12 * n, "stsc entries")
    out = []
    prev = 0
    for k in range(n):
        fc, spc, _sdi = struct.unpack(
            ">III", data[b + 8 + 12 * k : b + 20 + 12 * k]
        )
        if fc <= prev:
            raise ValueError(
                f"mp4: stsc first_chunk {fc} not increasing from {prev}"
            )
        prev = fc
        out.append((fc, spc))
    if out and out[0][0] != 1:
        raise ValueError("mp4: stsc does not start at chunk 1")
    return out


def _parse_stsz(data: bytes, b: int, e: int):
    """Returns (const_size, count, sizes): fixed-size tracks carry
    const_size != 0 and sizes None; variable-size tracks the reverse."""
    _need(b, e, 12, "stsz")
    const = struct.unpack(">I", data[b + 4 : b + 8])[0]
    count = struct.unpack(">I", data[b + 8 : b + 12])[0]
    if const:
        return const, count, None
    _need(b, e, 12 + 4 * count, "stsz sizes")
    sizes = [
        struct.unpack(">I", data[b + 12 + 4 * k : b + 16 + 4 * k])[0]
        for k in range(count)
    ]
    return 0, count, sizes


def _parse_stz2(data: bytes, b: int, e: int):
    _need(b, e, 12, "stz2")
    field = data[b + 7]
    count = struct.unpack(">I", data[b + 8 : b + 12])[0]
    if field == 16:
        _need(b, e, 12 + 2 * count, "stz2 sizes")
        sizes = [
            struct.unpack(">H", data[b + 12 + 2 * k : b + 14 + 2 * k])[0]
            for k in range(count)
        ]
    elif field == 8:
        _need(b, e, 12 + count, "stz2 sizes")
        sizes = list(data[b + 12 : b + 12 + count])
    elif field == 4:
        _need(b, e, 12 + (count + 1) // 2, "stz2 sizes")
        sizes = []
        for k in range(count):
            byte = data[b + 12 + k // 2]
            sizes.append(byte >> 4 if k % 2 == 0 else byte & 0xF)
    else:
        raise ValueError(f"mp4: stz2 field size {field} (must be 4/8/16)")
    return 0, count, sizes


def _parse_stco(data: bytes, b: int, e: int, wide: bool) -> list[int]:
    n = _full_box_count(data, b, e, "co64" if wide else "stco")
    width = 8 if wide else 4
    _need(b, e, 8 + width * n, "chunk offsets")
    fmt = ">Q" if wide else ">I"
    return [
        struct.unpack(
            fmt, data[b + 8 + width * k : b + 8 + width * (k + 1)]
        )[0]
        for k in range(n)
    ]


def _chunk_spc(stsc: list[tuple[int, int]], n_chunks: int):
    """Yield samples_per_chunk for 1-based chunks 1..n_chunks."""
    for c in range(1, n_chunks + 1):
        spc = 0
        for fc, s in stsc:
            if fc <= c:
                spc = s
            else:
                break
        yield spc


def _parse_sample_tables(data: bytes, sb: int, se: int):
    """Parse an stbl's sample tables into
    {count, const_size, sizes, deltas, stsc, offsets} or None when the
    track carries none (metadata-only skeletons, fragmented files).
    Partial tables are a malformed file -> ValueError."""
    stts = _find(data, sb, se, b"stts")
    stsc = _find(data, sb, se, b"stsc")
    stsz = _find(data, sb, se, b"stsz")
    stz2 = _find(data, sb, se, b"stz2")
    stco = _find(data, sb, se, b"stco")
    co64 = _find(data, sb, se, b"co64")
    have = [
        x is not None
        for x in (stts, stsc, stsz or stz2, stco or co64)
    ]
    if not any(have):
        return None
    if not all(have):
        raise ValueError(
            "mp4: incomplete sample tables (need stts+stsc+"
            "stsz/stz2+stco/co64 together)"
        )
    if stsz is not None:
        const, count, sizes = _parse_stsz(data, *stsz)
    else:
        const, count, sizes = _parse_stz2(data, *stz2)
    deltas = _parse_stts(data, *stts)
    if sum(c for c, _d in deltas) != count:
        raise ValueError(
            "mp4: stts covers "
            f"{sum(c for c, _d in deltas)} samples, stsz claims {count}"
        )
    offsets = (
        _parse_stco(data, *stco, wide=False)
        if stco is not None
        else _parse_stco(data, *co64, wide=True)
    )
    return {
        "count": count,
        "const_size": const,
        "sizes": sizes,
        "deltas": deltas,
        "stsc": _parse_stsc(data, *stsc),
        "offsets": offsets,
    }


def _sample_summary(tables: dict | None) -> dict:
    """O(n_chunks + stsc entries) per-track summary — no per-sample
    expansion, so a hostile const-size stsz claiming 2^32 samples
    costs arithmetic, not memory."""
    if tables is None:
        return {
            "n_samples": None,
            "n_chunks": None,
            "sample_bytes": None,
            "first_sample_off": None,
            "last_sample_off": None,
        }
    count = tables["count"]
    sizes = tables["sizes"]
    const = tables["const_size"]
    offsets = tables["offsets"]
    sample_bytes = const * count if sizes is None else sum(sizes)
    first = last = None
    if count and not offsets:
        # stsz claims samples but stco/co64 has zero chunks: malformed
        # HERE too, not just in iter_samples — the routing tier and
        # the ingestion tier must agree on what is decodable (review
        # finding: this case used to summarize as n_chunks=0 quietly)
        raise ValueError(
            f"mp4: sample tables place only 0 of {count} samples "
            "in 0 chunks"
        )
    if count and offsets:
        first = offsets[0]
        remaining = count
        start = 0  # index of the chunk's first sample
        for c0, spc in enumerate(_chunk_spc(tables["stsc"], len(offsets))):
            take = min(spc, remaining)
            if take and remaining <= spc:
                # last sample lives in this chunk at index take-1
                if sizes is None:
                    last = offsets[c0] + const * (take - 1)
                else:
                    last = offsets[c0] + sum(
                        sizes[start : start + take - 1]
                    )
                remaining = 0
                break
            remaining -= take
            start += take
        if remaining:
            raise ValueError(
                f"mp4: sample tables place only {count - remaining} of "
                f"{count} samples in {len(offsets)} chunks"
            )
    return {
        "n_samples": count,
        "n_chunks": len(offsets),
        "sample_bytes": sample_bytes,
        "first_sample_off": first,
        "last_sample_off": last,
    }


def iter_samples(payload: bytes, track_id: int):
    """Per-sample iterator over one track's sample tables — the
    plug-in contract for a frame decoder: yields
    {index, chunk, offset, size, dts} lazily in decode order (dts in
    mdhd-timescale units). This is the 100 TB ingestion primitive:
    the byte ranges to fetch, without reading any media bytes.
    Raises ValueError for unknown track ids and tables-less tracks."""
    try:
        found = _find_track_stbl(payload, track_id)
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"mp4: truncated or corrupt payload ({ex})"
        ) from ex
    tables = _parse_sample_tables(payload, *found)
    if tables is None:
        raise ValueError(
            f"mp4: track {track_id} has no sample tables "
            "(metadata-only or fragmented)"
        )
    sizes = tables["sizes"]
    const = tables["const_size"]
    offsets = tables["offsets"]
    delta_iter = (
        d for c, d in tables["deltas"] for _ in range(c)
    )
    idx = 0
    dts = 0
    remaining = tables["count"]
    for c0, spc in enumerate(_chunk_spc(tables["stsc"], len(offsets))):
        pos = offsets[c0]
        for _ in range(min(spc, remaining)):
            size = const if sizes is None else sizes[idx]
            yield {
                "index": idx,
                "chunk": c0 + 1,
                "offset": pos,
                "size": size,
                "dts": dts,
            }
            pos += size
            dts += next(delta_iter)
            idx += 1
            remaining -= 1
        if not remaining:
            break
    if remaining:
        raise ValueError(
            f"mp4: sample tables place only {idx} of "
            f"{tables['count']} samples in {len(offsets)} chunks"
        )


def _find_track_stbl(payload: bytes, track_id: int) -> tuple[int, int]:
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp (not an ISO-BMFF container)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box (metadata not present)")
    for tag, b, e in _boxes(payload, *moov):
        if tag != b"trak":
            continue
        tkhd = _find(payload, b, e, b"tkhd")
        mdia = _find(payload, b, e, b"mdia")
        if tkhd is None or mdia is None:
            raise ValueError("mp4: trak missing tkhd/mdia")
        tid = _parse_tkhd(payload, tkhd[0], tkhd[1])[0]
        if tid != track_id:
            continue
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        stbl = minf and _find(payload, minf[0], minf[1], b"stbl")
        if not stbl:
            raise ValueError(f"mp4: track {track_id} has no stbl")
        return stbl
    raise ValueError(f"mp4: no track with id {track_id}")


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
        summary = _sample_summary(None)
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf:
            stbl = _find(payload, minf[0], minf[1], b"stbl")
            if stbl:
                stsd = _find(payload, stbl[0], stbl[1], b"stsd")
                if stsd:
                    codec = _parse_stsd_codec(
                        payload, stsd[0], stsd[1]
                    )
                summary = _sample_summary(
                    _parse_sample_tables(payload, stbl[0], stbl[1])
                )
        tracks.append(
            {
                "track_id": track_id,
                "kind": kind,
                "codec": codec,
                "width": w or None,
                "height": h or None,
                "duration_ms": (tdur * 1000) // ts,
                **summary,
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


def _full(tag: bytes, body: bytes) -> bytes:
    return _box(tag, b"\x00\x00\x00\x00" + body)


def _stts_box(entries: list[tuple[int, int]]) -> bytes:
    body = struct.pack(">I", len(entries)) + b"".join(
        struct.pack(">II", c, d) for c, d in entries
    )
    return _full(b"stts", body)


def _stsc_box(entries: list[tuple[int, int]]) -> bytes:
    body = struct.pack(">I", len(entries)) + b"".join(
        struct.pack(">III", fc, spc, 1) for fc, spc in entries
    )
    return _full(b"stsc", body)


def _stsz_box(const: int, count: int, sizes: list[int] | None) -> bytes:
    body = struct.pack(">II", const, count)
    if not const:
        body += b"".join(struct.pack(">I", s) for s in sizes)
    return _full(b"stsz", body)


def _stco_box(offsets: list[int], wide: bool) -> bytes:
    fmt = ">Q" if wide else ">I"
    body = struct.pack(">I", len(offsets)) + b"".join(
        struct.pack(fmt, o) for o in offsets
    )
    return _full(b"co64" if wide else b"stco", body)


def skeleton_video_tables(n: int, dur: int) -> bytes:
    """Closed-form VARIABLE-size sample tables (sizes 100+j, 4 samples
    per chunk with an explicit partial-final stsc entry, 32-bit stco,
    data at 10000): chunk c starts at 10000 + 400c + 4c(4c-1)/2, the
    last sample at 10000 + 100(n-1) + (n-1)(n-2)/2 — every field is
    doc_id math an SQL oracle recomputes."""
    sizes = [100 + j for j in range(n)]
    if n > 1:
        d = dur // n
        stts = [(n - 1, d), (1, dur - (n - 1) * d)]
    else:
        stts = [(1, dur)]
    full, rem = divmod(n, 4)
    if full == 0:
        stsc = [(1, rem)]
    elif rem:
        stsc = [(1, 4), (full + 1, rem)]
    else:
        stsc = [(1, 4)]
    n_chunks = full + (1 if rem else 0)
    offsets = [
        10000 + sum(sizes[: 4 * c]) for c in range(n_chunks)
    ]
    return (
        _stts_box(stts)
        + _stsc_box(stsc)
        + _stsz_box(0, n, sizes)
        + _stco_box(offsets, wide=False)
    )


def skeleton_audio_tables(n: int, delta: int = 50) -> bytes:
    """Closed-form CONST-size tables (128-byte samples, 8 per chunk
    with the partial last chunk implied by the sample count — the
    other legal stsc shape — 64-bit co64 offsets, data at 50000):
    chunk c starts at 50000 + 1024c, the last sample at
    50000 + 128(n-1)."""
    n_chunks = -(-n // 8)
    offsets = [50000 + 128 * 8 * c for c in range(n_chunks)]
    return (
        _stts_box([(n, delta)])
        + _stsc_box([(1, 8)])
        + _stsz_box(128, n, None)
        + _stco_box(offsets, wide=True)
    )


def _trak(
    track_id: int,
    duration: int,
    handler: bytes,
    codec: bytes,
    w: int = 0,
    h: int = 0,
    timescale: int = 1000,
    sample_tables: bytes = b"",
) -> bytes:
    stbl = _box(b"stbl", _stsd(codec) + sample_tables)
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
    video_samples: int = 0,
    audio_samples: int = 0,
) -> bytes:
    """Minimal metadata-only MP4 (ftyp + moov with one video and one
    audio track, no mdat). With ``timescale=1000`` every duration
    field IS milliseconds — the closed-form regime the q34 branch's
    oracle recomputes. ``video_samples``/``audio_samples`` > 0 add
    full sample tables (see ``skeleton_video_tables`` /
    ``skeleton_audio_tables`` for the two closed-form layouts —
    variable-size/stco and const-size/co64)."""
    dur = (duration_ms * timescale) // 1000
    ftyp = _box(
        b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp42"
    )
    vtab = (
        skeleton_video_tables(video_samples, dur) if video_samples else b""
    )
    atab = (
        skeleton_audio_tables(audio_samples) if audio_samples else b""
    )
    moov = _box(
        b"moov",
        _mvhd(timescale, dur, 3)
        + _trak(
            1, dur, b"vide", video_codec, width, height, timescale,
            sample_tables=vtab,
        )
        + _trak(
            2, dur, b"soun", audio_codec, 0, 0, timescale,
            sample_tables=atab,
        ),
    )
    return ftyp + moov
