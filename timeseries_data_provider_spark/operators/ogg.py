"""Ogg container metadata (Vorbis / Opus / FLAC-in-Ogg) — stdlib-only.

Ogg is the container for the web's open audio codecs; what an audio
ingest tier needs is the ROUTING metadata — codec, sample rate,
channels, duration — all in page headers and the first packets, no
transform decode required (the MP3-tier posture; Vorbis/Opus payload
decode is the named codec-library boundary).

Public-knowledge basis: the Ogg page format (RFC 3533), the Vorbis I
identification header (xiph.org), the Opus-in-Ogg mapping (RFC 7845),
and the FLAC-to-Ogg mapping (xiph.org). Duration comes from the LAST
page's granule position (RFC 3533 §6: absolute granule position),
interpreted per codec: Vorbis/FLAC granules are PCM samples at the
stream rate; Opus granules are 48 kHz samples minus pre-skip.

Scale shape: page walk is linear in bytes but reads only 27-byte
headers + segment tables (payload skipped by the lacing values); the
identification packet is on page 0 by spec. Per-row independent,
Arrow fan-out via ``ogg_features``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

__all__ = ["decode_ogg_meta", "encode_ogg", "ogg_features"]


def _iter_pages(data: bytes):
    """Yield (header_type, granule, serial, seq, payload) per page."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: bad page capture pattern")
        if pos + 27 > n:
            raise ValueError("ogg: truncated page header")
        (
            version,
            htype,
            granule,
            serial,
            seq,
            _crc,
            nsegs,
        ) = struct.unpack_from("<BBqIIIB", data, pos + 4)
        if version != 0:
            raise ValueError(f"ogg: page version {version}")
        seg_table = data[pos + 27 : pos + 27 + nsegs]
        if len(seg_table) != nsegs:
            raise ValueError("ogg: truncated segment table")
        size = sum(seg_table)
        body = data[pos + 27 + nsegs : pos + 27 + nsegs + size]
        if len(body) != size:
            raise ValueError("ogg: truncated page body")
        yield htype, granule, serial, seq, body
        pos += 27 + nsegs + size


def decode_ogg_meta(payload: bytes) -> dict:
    """Walk an Ogg file's pages: identify the first stream's codec
    from its BOS packet, read rate/channels from the identification
    header, and duration from the last page's granule position.
    Multiplexed files report the FIRST (primary) stream and count the
    others."""
    codec = None
    rate = channels = None
    pre_skip = 0
    primary_serial = None
    last_granule = None
    n_pages = 0
    serials = set()
    for htype, granule, serial, seq, body in _iter_pages(payload):
        n_pages += 1
        serials.add(serial)
        if htype & 0x02 and primary_serial is None:  # first BOS
            primary_serial = serial
            if body[:7] == b"\x01vorbis":
                codec = "vorbis"
                if len(body) < 30:
                    raise ValueError("ogg: truncated vorbis id header")
                channels = body[11]
                (rate,) = struct.unpack_from("<I", body, 12)
            elif body[:8] == b"OpusHead":
                codec = "opus"
                if len(body) < 19:
                    raise ValueError("ogg: truncated OpusHead")
                channels = body[9]
                (pre_skip,) = struct.unpack_from("<H", body, 10)
                # input sample rate is informational; Opus granules
                # are ALWAYS 48 kHz (RFC 7845 section 4)
                (rate,) = struct.unpack_from("<I", body, 12)
            elif body[:5] == b"\x7fFLAC":
                codec = "flac"
                # mapping header: 0x7F 'FLAC' major minor nheaders(BE16)
                # = 9 bytes, then the native fLaC stream head
                si = body[9:]
                if si[:4] != b"fLaC":
                    raise ValueError("ogg: bad FLAC mapping header")
                from . import flac as _flac

                # STREAMINFO is the first metadata block by spec
                blk = si[4 + 4 : 4 + 4 + 34]
                b = _flac._Bits(blk)
                b.read(16)
                b.read(16)
                b.read(24)
                b.read(24)
                rate = b.read(20)
                channels = b.read(3) + 1
            else:
                codec = "unknown"
        if serial == primary_serial and granule >= 0:
            last_granule = granule
    if n_pages == 0:
        raise ValueError("ogg: no pages")
    if codec is None:
        raise ValueError("ogg: no BOS page")
    duration_ms = None
    if last_granule is not None:
        if codec == "opus":
            duration_ms = max(0, last_granule - pre_skip) * 1000 // 48000
        elif rate:
            duration_ms = last_granule * 1000 // rate
    return {
        "codec": codec,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": duration_ms,
        "n_pages": n_pages,
        "n_streams": len(serials),
        "pre_skip": pre_skip,
    }


# -- fixture writer ----------------------------------------------------


def _page(
    body: bytes, serial: int, seq: int, granule: int, htype: int
) -> bytes:
    segs = []
    rest = body
    while True:
        seg = rest[:255]
        rest = rest[255:]
        segs.append(len(seg))
        if len(seg) < 255:
            break
    hdr = b"OggS" + struct.pack(
        "<BBqIIIB", 0, htype, granule, serial, seq, 0, len(segs)
    )
    return hdr + bytes(segs) + body


def encode_ogg(
    codec: str = "vorbis",
    sample_rate: int = 44100,
    channels: int = 2,
    total_samples: int = 44100,
    pre_skip: int = 312,
    n_audio_pages: int = 3,
    extra_stream: bool = False,
) -> bytes:
    """Fixture writer: a BOS identification page + empty audio pages
    whose final granule encodes ``total_samples`` (Opus granules get
    pre_skip added, per the RFC 7845 contract)."""
    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IB", 0, channels)
            + struct.pack("<I", sample_rate)
            + b"\x00" * 16
            + b"\x01"
        )
    elif codec == "opus":
        ident = (
            b"OpusHead"
            + bytes([1, channels])
            + struct.pack("<H", pre_skip)
            + struct.pack("<I", sample_rate)
            + b"\x00\x00\x00"
        )
    else:
        raise ValueError(f"encode_ogg: codec {codec}")
    out = bytearray(_page(ident, serial=7, seq=0, granule=0, htype=0x02))
    if extra_stream:
        out += _page(b"\x80theora-ish", serial=9, seq=0, granule=0, htype=0x02)
    final = total_samples + (pre_skip if codec == "opus" else 0)
    for i in range(n_audio_pages):
        is_last = i == n_audio_pages - 1
        gran = final if is_last else (i + 1) * 1000
        out += _page(
            b"\x00" * 10,
            serial=7,
            seq=i + 1,
            granule=gran,
            htype=0x04 if is_last else 0,
        )
    return bytes(out)


def ogg_features(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched Ogg metadata pass (the mp3_features shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = [
                "codec",
                "sample_rate",
                "channels",
                "duration_ms",
                "n_pages",
                "n_streams",
                "pre_skip",
            ]
            out: dict = {id_col: []}
            for c in cols:
                out[c] = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                m = decode_ogg_meta(bytes(blob))
                out[id_col].append(int(rid))
                for c in cols:
                    out[c].append(m[c])
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, codec string, sample_rate long, channels long, "
        "duration_ms long, n_pages long, n_streams long, pre_skip long"
    )
    return df.select(id_col, blob_col).mapInPandas(run, schema)
