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
the plug-in contract for a frame decoder.

Fragmented MP4 (r8): the moof/traf tier is parsed too —
mvex/trex track defaults, mfhd sequence numbers, tfhd (explicit
base-data-offset or default-base-is-moof), tfdt v0/v1 decode times,
and trun sample runs with any mix of per-sample/default
durations/sizes — so ``iter_fragment_samples`` yields the same
(offset, size, dts) stream for streaming-style files, and
``decode_video_meta`` fills the per-track summary from the fragment
walk when the moov sample tables are absent. The traf-chaining
base-offset default (neither flag present: base = end of the
preceding traf's data, §8.8.7) is implemented too (r9) — the common
multi-track CMAF layout; a chain through an undecodable preceding
traf is a named ValueError.
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


def _parse_mdhd_info(data: bytes, b: int, e: int) -> tuple[int, int]:
    """(timescale, duration) from an mdhd — the MEDIA timescale
    fragment durations are denominated in."""
    _need(b, e, 1, "mdhd")
    if data[b] == 1:
        _need(b, e, 32, "mdhd v1")
        ts, dur = struct.unpack(">IQ", data[b + 20 : b + 32])
    else:
        _need(b, e, 20, "mdhd")
        ts, dur = struct.unpack(">II", data[b + 12 : b + 20])
    if ts == 0:
        raise ValueError("mp4: mdhd timescale 0")
    return ts, dur


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


def _parse_stss(data: bytes, b: int, e: int) -> set[int]:
    """Sync-sample table (14496-12 §8.6.2): 1-based sample numbers
    that are keyframes. An ABSENT stss means all samples sync (the
    spec default — handled by the caller); a present-but-empty one
    means none are."""
    n = _full_box_count(data, b, e, "stss")
    _need(b, e, 8 + 4 * n, "stss entries")
    return {
        struct.unpack(">I", data[b + 8 + 4 * k : b + 12 + 4 * k])[0]
        for k in range(n)
    }


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
    stss = _find(data, sb, se, b"stss")
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
        # None = no stss box = every sample is sync (the spec default)
        "sync": _parse_stss(data, *stss) if stss is not None else None,
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
    sync = tables["sync"]
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
                # stss is 1-based; absent box = all sync (spec)
                "sync": True if sync is None else (idx + 1) in sync,
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


# --------------------------------------------------------------------------
# fragmented (moof/traf/trun) tier — ISO 14496-12 8.8

_TFHD_BASE_OFFSET = 0x000001
_TFHD_SDI = 0x000002
_TFHD_DEF_DURATION = 0x000008
_TFHD_DEF_SIZE = 0x000010
_TFHD_DEF_FLAGS = 0x000020
_TFHD_BASE_IS_MOOF = 0x020000

_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_FLAGS = 0x000004
_TRUN_DURATION = 0x000100
_TRUN_SIZE = 0x000200
_TRUN_FLAGS = 0x000400
_TRUN_CTO = 0x000800


def _boxes_with_start(data: bytes, start: int, end: int):
    """Like ``_boxes`` but also yields each box's HEADER start — the
    moof anchor for default-base-is-moof offsets."""
    pos = start
    for tag, b, e in _boxes(data, start, end):
        yield tag, b, e, pos
        pos = e


def _moov_trex(data: bytes, mb: int, me: int) -> dict[int, dict]:
    out: dict[int, dict] = {}
    mvex = _find(data, mb, me, b"mvex")
    if mvex:
        for tag, b, e in _boxes(data, *mvex):
            if tag == b"trex":
                _need(b, e, 24, "trex")
                tid, _sdi, dur, size, fl = struct.unpack(
                    ">IIIII", data[b + 4 : b + 24]
                )
                out[tid] = {"duration": dur, "size": size, "flags": fl}
    return out


def _parse_tfhd(data: bytes, b: int, e: int) -> dict:
    _need(b, e, 8, "tfhd")
    flags = struct.unpack(">I", data[b : b + 4])[0] & 0xFFFFFF
    tid = struct.unpack(">I", data[b + 4 : b + 8])[0]
    p = b + 8
    out = {
        "track_id": tid,
        "flags": flags,
        "base_offset": None,
        "def_duration": None,
        "def_size": None,
        "def_flags": None,
    }
    if flags & _TFHD_BASE_OFFSET:
        _need(p, e, 8, "tfhd base_data_offset")
        out["base_offset"] = struct.unpack(">Q", data[p : p + 8])[0]
        p += 8
    if flags & _TFHD_SDI:
        _need(p, e, 4, "tfhd sdi")
        p += 4
    if flags & _TFHD_DEF_DURATION:
        _need(p, e, 4, "tfhd default duration")
        out["def_duration"] = struct.unpack(">I", data[p : p + 4])[0]
        p += 4
    if flags & _TFHD_DEF_SIZE:
        _need(p, e, 4, "tfhd default size")
        out["def_size"] = struct.unpack(">I", data[p : p + 4])[0]
        p += 4
    if flags & _TFHD_DEF_FLAGS:
        _need(p, e, 4, "tfhd default sample flags")
        out["def_flags"] = struct.unpack(">I", data[p : p + 4])[0]
        p += 4
    return out


def _parse_tfdt(data: bytes, b: int, e: int) -> int:
    _need(b, e, 8, "tfdt")
    if data[b] == 1:
        _need(b, e, 12, "tfdt v1")
        return struct.unpack(">Q", data[b + 4 : b + 12])[0]
    return struct.unpack(">I", data[b + 4 : b + 8])[0]


def _parse_trun(data: bytes, b: int, e: int) -> dict:
    _need(b, e, 8, "trun")
    flags = struct.unpack(">I", data[b : b + 4])[0] & 0xFFFFFF
    count = struct.unpack(">I", data[b + 4 : b + 8])[0]
    p = b + 8
    out = {"data_offset": None, "samples": None, "first_flags": None}
    if flags & _TRUN_DATA_OFFSET:
        _need(p, e, 4, "trun data_offset")
        out["data_offset"] = struct.unpack(">i", data[p : p + 4])[0]
        p += 4
    if flags & _TRUN_FIRST_FLAGS:
        _need(p, e, 4, "trun first-sample-flags")
        out["first_flags"] = struct.unpack(">I", data[p : p + 4])[0]
        p += 4
    per = sum(
        4
        for bit in (_TRUN_DURATION, _TRUN_SIZE, _TRUN_FLAGS, _TRUN_CTO)
        if flags & bit
    )
    _need(p, e, per * count, "trun samples")
    if per == 0:
        # all-default run: no per-sample bytes back the count, so a
        # hostile count=2^32-1 must not materialize a list — return
        # the count and let consumers loop lazily (the same
        # memory-safe posture as the const-size stsz path; review
        # finding)
        out["count"] = count
        out["samples"] = None
        return out
    samples = []
    for _ in range(count):
        dur = size = sfl = None
        if flags & _TRUN_DURATION:
            dur = struct.unpack(">I", data[p : p + 4])[0]
            p += 4
        if flags & _TRUN_SIZE:
            size = struct.unpack(">I", data[p : p + 4])[0]
            p += 4
        if flags & _TRUN_FLAGS:
            sfl = struct.unpack(">I", data[p : p + 4])[0]
            p += 4
        if flags & _TRUN_CTO:
            p += 4  # composition offset: not needed for byte ranges
        samples.append((dur, size, sfl))
    out["count"] = count
    out["samples"] = samples
    return out


def iter_fragment_samples(payload: bytes, track_id: int):
    """Per-sample iterator for FRAGMENTED files: walk every moof's
    traf for ``track_id`` and yield {index, fragment, chunk, offset,
    size, dts, duration, sync} in decode order — the same byte-range
    contract as ``iter_samples`` for streaming-style (DASH/CMAF)
    layouts, dts in mdhd-timescale units (tfdt when present, else
    accumulated). ``sync`` (keyframe) resolves per §8.8.8.1 from
    per-sample flags > trun first-sample-flags > tfhd default > trex
    default. A trex's default_sample_flags field is mandatory in the
    box, so a track WITH a trex always resolves — an all-zero trex
    (sample_is_non_sync_sample = 0) reads as "declared sync" per the
    spec, even when the muxer left it zero carelessly; None is
    reachable only for tracks with no trex at all (no mvex) and no
    tfhd/trun flags. Callers filtering keyframes should treat None
    as unknown, not sync.
    ``chunk`` counts trun runs across the whole track. The traf
    base-offset default CHAINS off the preceding traf's data end
    (ISO/IEC 14496-12 §8.8.7: neither base-data-offset nor
    default-base-is-moof set → first traf anchors at the moof start,
    each subsequent traf at the end of the data defined by the
    preceding track fragment — chaining resets at every moof). To
    resolve the chain, preceding trafs of OTHER tracks have their
    byte geometry walked too (sizes only — their dts timelines are
    ignored); a preceding traf whose geometry is undecodable makes a
    chained base unresolvable, a named ValueError."""
    try:
        yield from _iter_fragment_samples(payload, track_id)
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"mp4: truncated or corrupt payload ({ex})"
        ) from ex


def _iter_fragment_samples(payload: bytes, track_id: int):
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: missing ftyp (not an ISO-BMFF container)")
    moov = _find(payload, 0, len(payload), b"moov")
    trex = _moov_trex(payload, *moov) if moov else {}
    tdef = trex.get(track_id, {})
    idx = 0
    run_no = 0
    dts = 0
    for tag, mb, me, mstart in _boxes_with_start(
        payload, 0, len(payload)
    ):
        if tag != b"moof":
            continue
        mfhd = _find(payload, mb, me, b"mfhd")
        seq = (
            struct.unpack(">I", payload[mfhd[0] + 4 : mfhd[0] + 8])[0]
            if mfhd
            else 0
        )
        first_traf = True
        # end of the PRECEDING traf's data in this moof (the §8.8.7
        # chained default); None = unknowable, with the reason kept
        # so a traf that actually needs the chain can name it
        prev_end: int | None = None
        prev_err: str | None = None
        for t2, tb, te in _boxes(payload, mb, me):
            if t2 != b"traf":
                continue
            tfhd_box = _find(payload, tb, te, b"tfhd")
            if tfhd_box is None:
                raise ValueError("mp4: traf without tfhd")
            tfhd = _parse_tfhd(payload, *tfhd_box)
            is_target = tfhd["track_id"] == track_id
            if tfhd["base_offset"] is not None:
                base = tfhd["base_offset"]
            elif tfhd["flags"] & _TFHD_BASE_IS_MOOF or first_traf:
                # spec default for the FIRST traf is the moof start
                base = mstart
            elif prev_end is not None:
                # second and subsequent trafs chain off the end of
                # the data defined by the preceding track fragment
                base = prev_end
            elif is_target:
                raise ValueError(
                    "mp4: chained traf base-offset unresolvable — "
                    f"preceding traf geometry undecodable ({prev_err})"
                )
            else:
                # a NON-target traf with an unresolvable chained base:
                # its own end is equally unknowable — stay lenient
                # (the pre-chaining behavior ignored other tracks
                # entirely) and carry the reason forward in case a
                # later traf the caller DOES care about chains here
                first_traf = False
                continue
            t_def = tdef if is_target else trex.get(
                tfhd["track_id"], {}
            )
            if is_target:
                tfdt_box = _find(payload, tb, te, b"tfdt")
                if tfdt_box is not None:
                    dts = _parse_tfdt(payload, *tfdt_box)
            cursor = None
            end = base
            try:
                for t3, rb, re_ in _boxes(payload, tb, te):
                    if t3 != b"trun":
                        continue
                    trun = _parse_trun(payload, rb, re_)
                    if trun["data_offset"] is not None:
                        cursor = base + trun["data_offset"]
                    elif cursor is None:
                        cursor = base
                    if is_target:
                        run_no += 1
                    run_samples = (
                        trun["samples"]
                        if trun["samples"] is not None
                        else (
                            (None, None, None)
                            for _ in range(trun["count"])
                        )
                    )
                    for si, (dur, size, sfl) in enumerate(run_samples):
                        if size is None:
                            size = tfhd["def_size"]
                        if size is None:
                            size = t_def.get("size")
                        if size is None:
                            raise ValueError(
                                "mp4: trun sample without a size and "
                                "no tfhd/trex default"
                            )
                        if is_target:
                            if dur is None:
                                dur = tfhd["def_duration"]
                            if dur is None:
                                dur = t_def.get("duration")
                            if dur is None:
                                raise ValueError(
                                    "mp4: trun sample without a "
                                    "duration and no tfhd/trex default"
                                )
                            # sample-flags resolution (§8.8.8.1):
                            # per-sample > trun first-sample-flags
                            # (first sample of the run only) > tfhd
                            # default > trex default; keyframe = NOT
                            # sample_is_non_sync_sample (bit 16).
                            # Unresolvable -> None (a thumbnail tier
                            # must not mistake unknown for sync)
                            if sfl is None and si == 0:
                                sfl = trun["first_flags"]
                            if sfl is None:
                                sfl = tfhd["def_flags"]
                            if sfl is None:
                                sfl = t_def.get("flags")
                            yield {
                                "index": idx,
                                "fragment": seq,
                                "chunk": run_no,
                                "offset": cursor,
                                "size": size,
                                "dts": dts,
                                "duration": dur,
                                "sync": (
                                    None
                                    if sfl is None
                                    else not sfl & 0x00010000
                                ),
                            }
                            dts += dur
                            idx += 1
                        cursor += size
                        if cursor > end:
                            end = cursor
            except (ValueError, IndexError, struct.error) as ex:
                if is_target:
                    raise
                # a hostile/undecodable OTHER-track traf stays ignored
                # (the pre-chaining behavior) unless a later traf
                # needs its data end to resolve a chained base
                prev_end, prev_err = None, str(ex)
            else:
                prev_end, prev_err = end, None
            first_traf = False


def _fragment_summary(payload: bytes, track_id: int) -> dict | None:
    """Per-track summary fields from the fragment walk (used when the
    moov sample tables are absent in a fragmented file): counts,
    bytes, first/last offsets, trun-run count, and TOTAL duration in
    timescale units (the moov duration field is 0 by design in
    fragmented files)."""
    n = 0
    total = 0
    first = last = None
    runs = 0
    dur_end = 0
    for s in _iter_fragment_samples(payload, track_id):
        if n == 0:
            first = s["offset"]
        last = s["offset"]
        n += 1
        total += s["size"]
        runs = s["chunk"]
        dur_end = s["dts"] + s["duration"]
    if n == 0:
        return None
    return {
        "n_samples": n,
        "n_chunks": runs,
        "sample_bytes": total,
        "first_sample_off": first,
        "last_sample_off": last,
        "duration_end": dur_end,
    }


def track_listing(payload: bytes) -> tuple[bool, list]:
    """(fragmented, [(track_id, moov_sample_count or None)]) — the
    LIGHT routing view for fetch-list builders: moov boxes only, no
    fragment walk (``video_sample_ranges`` does exactly one moof pass
    per track itself). Error contract matches decode_video_meta."""
    try:
        if len(payload) < 12 or payload[4:8] != b"ftyp":
            raise ValueError(
                "mp4: missing ftyp (not an ISO-BMFF container)"
            )
        fragmented = False
        moov = None
        for tag, b, e in _boxes(payload, 0, len(payload)):
            if tag == b"moov":
                moov = (b, e)
            elif tag == b"moof":
                fragmented = True
        if moov is None:
            raise ValueError("mp4: no moov box (metadata not present)")
        out = []
        for tag, b, e in _boxes(payload, *moov):
            if tag != b"trak":
                continue
            tkhd = _find(payload, b, e, b"tkhd")
            mdia = _find(payload, b, e, b"mdia")
            if tkhd is None or mdia is None:
                raise ValueError("mp4: trak missing tkhd/mdia")
            tid = _parse_tkhd(payload, tkhd[0], tkhd[1])[0]
            n = None
            minf = _find(payload, mdia[0], mdia[1], b"minf")
            stbl = minf and _find(payload, minf[0], minf[1], b"stbl")
            if stbl:
                tables = _parse_sample_tables(payload, *stbl)
                if tables is not None:
                    n = tables["count"]
            out.append((tid, n))
        return fragmented, out
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"mp4: truncated or corrupt payload ({ex})"
        ) from ex


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
        track_ms = (tdur * 1000) // ts
        moov_samples = summary["n_samples"]
        if fragmented and not summary["n_samples"]:
            # streaming-style file: the moov carries no sample tables
            # (or the zero-ENTRY tables real CMAF muxers emit — the
            # n_samples == 0 case, review finding) and a zero duration
            # by design — fill both from the fragment walk, durations
            # in the MEDIA (mdhd) timescale. Traf base-offset chaining
            # is implemented as of r9, so the former
            # NotImplementedError degradation is gone: every fragment
            # geometry either walks or raises the ValueError the
            # metadata tier's triage contract already names.
            frag = _fragment_summary(payload, track_id)
            if frag is not None:
                mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
                if mdhd is None:
                    raise ValueError("mp4: mdia without mdhd")
                media_ts, _mdur = _parse_mdhd_info(payload, *mdhd)
                dur_end = frag.pop("duration_end")
                summary = frag
                if tdur == 0:
                    track_ms = (dur_end * 1000) // media_ts
        tracks.append(
            {
                "track_id": track_id,
                "kind": kind,
                "codec": codec,
                "width": w or None,
                "height": h or None,
                "duration_ms": track_ms,
                # the raw moov-table count (None when absent): lets a
                # fetch-list builder walk BOTH tiers of a hybrid
                # progressive+fragmented file (review finding)
                "moov_samples": moov_samples,
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


def _stss_box(samples: list[int]) -> bytes:
    body = struct.pack(">I", len(samples)) + b"".join(
        struct.pack(">I", s) for s in samples
    )
    return _full(b"stss", body)


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
    doc_id math an SQL oracle recomputes. r9 late: an stss marks
    every 4th sample sync (1-based 1, 5, 9, ... — keyframe iff
    sample_idx % 4 == 0), the closed form q34's keyframe column
    scores; the audio tables carry NO stss, exercising the all-sync
    spec default."""
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
        + _stss_box([s + 1 for s in range(0, n, 4)])
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


def _trex_box(
    track_id: int,
    default_duration: int,
    default_size: int,
    default_flags: int = 0,
) -> bytes:
    return _full(
        b"trex",
        struct.pack(
            ">IIIII",
            track_id,
            1,
            default_duration,
            default_size,
            default_flags,
        ),
    )


def _tfhd_box(
    track_id: int,
    base_offset: int | None = None,
    def_size: int | None = None,
    base_is_moof: bool = False,
    def_flags: int | None = None,
) -> bytes:
    flags = 0
    tail = b""
    if base_offset is not None:
        flags |= _TFHD_BASE_OFFSET
        tail += struct.pack(">Q", base_offset)
    if def_size is not None:
        flags |= _TFHD_DEF_SIZE
        tail += struct.pack(">I", def_size)
    if def_flags is not None:
        flags |= _TFHD_DEF_FLAGS
        tail += struct.pack(">I", def_flags)
    if base_is_moof:
        flags |= _TFHD_BASE_IS_MOOF
    return _box(
        b"tfhd",
        struct.pack(">I", flags) + struct.pack(">I", track_id) + tail,
    )


def _tfdt_box(base_time: int, version: int = 1) -> bytes:
    if version:
        return _box(
            b"tfdt", b"\x01\x00\x00\x00" + struct.pack(">Q", base_time)
        )
    return _box(
        b"tfdt", b"\x00\x00\x00\x00" + struct.pack(">I", base_time)
    )


def _trun_box(
    samples: list[tuple[int | None, int | None]],
    data_offset: int | None = None,
    per_size: bool = False,
    per_duration: bool = False,
    first_flags: int | None = None,
    per_flags: list[int] | None = None,
) -> bytes:
    flags = 0
    if data_offset is not None:
        flags |= _TRUN_DATA_OFFSET
    if first_flags is not None:
        flags |= _TRUN_FIRST_FLAGS
    if per_duration:
        flags |= _TRUN_DURATION
    if per_size:
        flags |= _TRUN_SIZE
    if per_flags is not None:
        flags |= _TRUN_FLAGS
    body = struct.pack(">I", flags) + struct.pack(">I", len(samples))
    if data_offset is not None:
        body += struct.pack(">i", data_offset)
    if first_flags is not None:
        body += struct.pack(">I", first_flags)
    for i, (dur, size) in enumerate(samples):
        if per_duration:
            body += struct.pack(">I", dur)
        if per_size:
            body += struct.pack(">I", size)
        if per_flags is not None:
            body += struct.pack(">I", per_flags[i])
    return _box(b"trun", body)


def build_fragmented_skeleton(
    width: int,
    height: int,
    n_fragments: int = 2,
    samples_per_fragment: int = 6,
    timescale: int = 1000,
    video_codec: bytes = b"mp4v",
) -> bytes:
    """Closed-form FRAGMENTED (CMAF-style) skeleton: moov with a
    zero-duration track and mvex/trex defaults (25 ticks/sample,
    default size 0), then per fragment f an (mdat-less) moof with
    mfhd seq f+1, tfhd base-data-offset 100000+10000f, tfdt base
    time 500f, and one trun with data_offset 64 — EVEN fragments
    carry per-sample sizes 200+j, ODD fragments rely on a tfhd
    default size of 150+f, so both size sources and the
    tfdt/accumulated-dts paths are exercised. Every field is doc-id-
    free arithmetic tests and oracles recompute:
    sample (f, j): offset = 100064 + 10000f + (200j + j(j-1)/2 even
    | (150+f)j odd), size = (200+j | 150+f), dts = 500f + 25j.

    r11: sample FLAGS plant the CMAF keyframe pattern — keyframe iff
    j == 0 — through two different resolution paths: EVEN fragments
    carry PER-SAMPLE flags (sync 0x02000000 at j=0, non-sync
    0x01010000 after), ODD fragments a tfhd DEFAULT of non-sync plus
    trun FIRST-SAMPLE-FLAGS of sync."""
    spf = samples_per_fragment
    ftyp = _box(
        b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5cmfc"
    )
    mvex = _box(b"mvex", _trex_box(1, 25, 0))
    moov = _box(
        b"moov",
        _mvhd(timescale, 0, 2)
        + _trak(1, 0, b"vide", video_codec, width, height, timescale)
        + mvex,
    )
    out = ftyp + moov
    for f in range(n_fragments):
        if f % 2 == 0:
            tfhd = _tfhd_box(1, base_offset=100_000 + 10_000 * f)
            trun = _trun_box(
                [(None, 200 + j) for j in range(spf)],
                data_offset=64,
                per_size=True,
                per_flags=[
                    0x02000000 if j == 0 else 0x01010000
                    for j in range(spf)
                ],
            )
        else:
            tfhd = _tfhd_box(
                1,
                base_offset=100_000 + 10_000 * f,
                def_size=150 + f,
                def_flags=0x01010000,
            )
            trun = _trun_box(
                [(None, None)] * spf,
                data_offset=64,
                first_flags=0x02000000,
            )
        traf = _box(b"traf", tfhd + _tfdt_box(500 * f) + trun)
        moof = _box(
            b"moof", _full(b"mfhd", struct.pack(">I", f + 1)) + traf
        )
        out += moof
    return out


def build_chained_fragmented_skeleton(
    width: int,
    height: int,
    n_fragments: int = 2,
    samples_per_fragment: int = 3,
    timescale: int = 1000,
) -> bytes:
    """TWO-track fragmented skeleton exercising the §8.8.7 CHAINED
    base-offset default: per fragment f one moof with a video traf
    (track 1, tfhd flags 0 → FIRST traf anchors at the moof start,
    trun data_offset 64, per-sample sizes 100+j, tfdt 500f) followed
    by an audio traf (track 2, tfhd flags 0, trun with NO
    data_offset → base CHAINS to the end of traf 1's data, per-sample
    sizes 40+j, tfdt 300f). trex defaults supply durations (25/10
    ticks). Closed form relative to each moof's start M_f:
    track 1 sample j: offset = M_f + 64 + 100j + j(j-1)/2;
    track 2 sample j: offset = M_f + 64 + Σ_{i<spf}(100+i)
    + 40j + j(j-1)/2. M_f itself depends on box sizes, so tests
    recover it from the parsed moof positions rather than doc-id
    arithmetic (which is why this layout is pytest-pinned, not a q34
    oracle branch)."""
    spf = samples_per_fragment
    ftyp = _box(
        b"ftyp", b"iso5" + struct.pack(">I", 0x200) + b"iso5cmfc"
    )
    mvex = _box(b"mvex", _trex_box(1, 25, 0) + _trex_box(2, 10, 0))
    moov = _box(
        b"moov",
        _mvhd(timescale, 0, 3)
        + _trak(1, 0, b"vide", b"mp4v", width, height, timescale)
        + _trak(2, 0, b"soun", b"mp4a", 0, 0, timescale)
        + mvex,
    )
    out = ftyp + moov
    for f in range(n_fragments):
        traf1 = _box(
            b"traf",
            _tfhd_box(1)
            + _tfdt_box(500 * f)
            + _trun_box(
                [(None, 100 + j) for j in range(spf)],
                data_offset=64,
                per_size=True,
            ),
        )
        traf2 = _box(
            b"traf",
            _tfhd_box(2)
            + _tfdt_box(300 * f)
            + _trun_box(
                [(None, 40 + j) for j in range(spf)],
                per_size=True,
            ),
        )
        out += _box(
            b"moof",
            _full(b"mfhd", struct.pack(">I", f + 1)) + traf1 + traf2,
        )
    return out
