"""[EXT] Baseline TIFF decoder/encoder — stdlib-only.

TIFF is the remaining common crawled raster format with a
stdlib-feasible baseline: the TIFF 6.0 specification's Baseline
profile stores uncompressed (Compression=1), LZW (Compression=5 —
the MSB-first EarlyChange bitstream, a DIFFERENT dialect from the
in-repo GIF LZW's LSB-first deferred-clear one), or PackBits-RLE
(Compression=32773), Deflate (8/32946, r11), or new-style
JPEG-in-TIFF (7, r11 — strips through the in-repo JPEG codec with
JPEGTables abbreviation) strips of 8-bit grayscale, RGB,
PALETTE-indexed (photometric 3 + 16-bit ColorMap, r11), or
PLANAR-configuration-2 RGB (r11 — per-channel strip groups)
samples, with the horizontal-differencing Predictor (tag 317 = 2)
that real photographic LZW TIFFs pair with it. CCITT fax bilevel
strips (Compression 2/3/4 — the archive-scan default) decode
through operators/ccitt (r11 late, JDK-cross-validated T.4/T.6
codes). 16-BIT samples (r11 late, also JDK-cross-validated both
directions) decode in their native byte order — predictor
inversion runs on the 16-bit values — then downconvert >>8 to the
package-wide 8-bit codec contract (the exact inverse of the v*257
upscale; this is a dedup/feature tier, not an editor). 16-BIT
PALETTE INDICES (r13: photometric 3 + BitsPerSample 16 + a
3x65536 ColorMap) look up before any downshift — a 16-bit sample
there is an index, not an intensity. Old-style JPEG fragment
tables (compression 6 WITHOUT JPEGInterchangeFormat — the
interchange-pointer form decodes as of r12, JDK-cross-validated)
stay a named NotImplementedError gap for a registered codec
library.

* ``decode_tiff`` — header (both byte orders: ``II*\\0`` and
  ``MM\\0*``), first IFD walk, baseline tag set (width/length/
  bits/compression/photometric/strips/rows-per-strip/samples/
  planar), strip assembly incl. PackBits expansion, MinIsWhite
  inversion; returns the shared ``{format, width, height, pixels}``
  codec-contract dict so it rides ``media_features`` /
  ``resize_features`` unchanged once registered.
* ``encode_tiff`` — a self-written writer (either byte order,
  optional PackBits, configurable rows-per-strip) used for
  round-trip verification; no reference TIFF library exists in this
  container, so correctness rests on self-roundtrip plus hand-built
  byte streams and truncation fuzz in tests/test_tiff.py (the
  GIF/VP8L verification posture).
* ``register()`` — plugs the decoder into
  ``multimodal.register_image_codec`` under BOTH byte-order magics;
  per-row independent, linear in bytes, zero shuffle — the standard
  codec-tier envelope.

Hostile-input guards mirror the other codecs: canvas cap, strip
bounds checked against the payload, declared sizes cross-checked
against assembled bytes.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXELS = 64 * 1024 * 1024

# baseline tags
_WIDTH = 256
_LENGTH = 257
_BITS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES = 277
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279
_PLANAR = 284
_T4OPTIONS = 292
_T6OPTIONS = 293
_PREDICTOR = 317
_COLORMAP = 320
_JPEGTABLES = 347
_JIF = 513  # JPEGInterchangeFormat (old-style compression 6)
_JIF_LEN = 514

_TYPE_SIZES = {
    1: 1,  # BYTE
    2: 1,  # ASCII
    3: 2,  # SHORT
    4: 4,  # LONG
    5: 8,  # RATIONAL
    6: 1,  # SBYTE
    7: 1,  # UNDEFINED (EXIF uses it for version/maker blobs)
    8: 2,  # SSHORT
    9: 4,  # SLONG
    10: 8,  # SRATIONAL
    11: 4,  # FLOAT
    12: 8,  # DOUBLE
}


def _read_values(buf: bytes, bo: str, typ: int, count: int, raw: bytes):
    """IFD entry values: inline when they fit the 4-byte field, else
    at the offset the field carries."""
    size = _TYPE_SIZES.get(typ)
    if size is None:
        raise NotImplementedError(f"tiff: IFD value type {typ}")
    total = size * count
    if total <= 4:
        data = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        if off + total > len(buf):
            raise ValueError("tiff: IFD value offset out of bounds")
        data = buf[off : off + total]
    if typ == 3:
        return list(struct.unpack(bo + "H" * count, data))
    if typ == 4:
        return list(struct.unpack(bo + "I" * count, data))
    if typ in (1, 2, 7):
        return list(data)
    if typ == 6:
        return list(struct.unpack(bo + "b" * count, data))
    if typ == 8:
        return list(struct.unpack(bo + "h" * count, data))
    if typ == 9:
        return list(struct.unpack(bo + "i" * count, data))
    if typ == 11:
        return list(struct.unpack(bo + "f" * count, data))
    if typ == 12:
        return list(struct.unpack(bo + "d" * count, data))
    # types 5/10 (S)RATIONAL: numerator/denominator pairs
    code = "I" if typ == 5 else "i"
    vals = struct.unpack(bo + code * (2 * count), data)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE, TIFF 6.0 section 9): n in 0..127 -> copy
    n+1 literal bytes; n in -127..-1 -> repeat next byte 1-n times;
    -128 is a no-op."""
    out = bytearray()
    i = 0
    n_in = len(data)
    while i < n_in and len(out) < expected:
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            if i + n + 1 > n_in:
                raise ValueError("tiff: truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        else:
            if i >= n_in:
                raise ValueError("tiff: truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"tiff: PackBits strip expanded to {len(out)} bytes, "
            f"expected {expected}"
        )
    return bytes(out)


def _lzw_decode(
    data: bytes, expected: int | None = None, early_change: int = 1
) -> bytes:
    """TIFF-dialect LZW (TIFF 6.0 section 13 == PDF §7.4.4.2
    LZWDecode): MSB-first bit packing, 9-bit initial width, Clear=256
    / EOI=257, and the EarlyChange rule — the code width bumps one
    code EARLIER than GIF's deferred variant (at next-entry
    511/1023/2047) when ``early_change`` is 1 (PDF's DecodeParms can
    set 0). ``expected``: TIFF strips know their decoded size and
    enforce it; PDF streams pass None (decode to EOI, tolerate a
    missing terminator). ONE implementation for both callers — the
    r11 review found pdf.py had grown a near-identical copy."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = nbits = 0
    pos = 0
    n_in = len(data)
    prev: bytes | None = None

    def next_code():
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= n_in:
                return None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        return code

    while expected is None or len(out) < expected:
        code = next_code()
        if code is None:
            if expected is None:
                break  # stream ran out without EOI — accept (PDF)
            raise ValueError("lzw: stream ended before EOI")
        if code == 257:  # EOI
            break
        if code == 256:  # Clear
            table = table[:258]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"lzw: LZW code {code} after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"lzw: LZW code {code} out of range")
        out += entry
        prev = entry
        # EarlyChange: widen when the NEXT entry would need more bits
        if len(table) + early_change >= (1 << width) and width < 12:
            width += 1
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"lzw: LZW strip expanded to {len(out)} bytes, expected "
            f"{expected}"
        )
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (the test writer): MSB-first, early
    change, clear-on-full at 4094 per the spec."""
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(256, width)  # spec: begin with Clear
    s = b""
    for b in data:
        cand = s + bytes([b])
        if cand in table:
            s = cand
            continue
        put(table[s], width)
        table[cand] = next_code
        next_code += 1
        # width sync: the decoder lags this table by exactly one add
        # (its first post-clear code appends nothing), so the encoder
        # widens at next_code == 2^w where the early-change decoder
        # widens at next-to-add == 2^w - 1 — verified by exhaustive
        # offset search over random/low-entropy/cyclic streams (the
        # +/-1 neighbors both desync)
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = bytes([b])
    if s:
        put(table[s], width)
    put(257, width)  # EOI
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def read_ifd(payload: bytes, bo: str, ifd_off: int) -> dict:
    """One bounds-guarded IFD walk: {tag: values}. Shared by the TIFF
    decoder and the EXIF reader (operators/exif.py) — EXIF IS the
    TIFF IFD structure embedded in a JPEG APP1 segment, with offsets
    relative to the same TIFF header, so one walker serves both. The
    type/count/value decoding rules are tiff 6.0 §2 (``_read_values``);
    typed entries the walker cannot size raise the named error."""
    if ifd_off + 2 > len(payload):
        raise ValueError("tiff: IFD offset out of bounds")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(payload):
        raise ValueError("tiff: truncated IFD")
    tags: dict = {}
    for i in range(n_entries):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", payload, base)
        tags[tag] = _read_values(
            payload, bo, typ, count, payload[base + 8 : base + 12]
        )
    return tags


def decode_tiff(payload: bytes) -> dict:
    """Decode a baseline TIFF (first IFD) to the shared codec dict.
    Supported: 8-bit grayscale (Photometric 0/1) and RGB (2), chunky
    planar config, Compression 1 (none), 5 (LZW incl. the EarlyChange
    rule, with horizontal-differencing Predictor 2), or 32773
    (PackBits), either byte order, any strip layout. Everything else
    raises the named plug-in error."""
    if len(payload) < 8:
        raise ValueError("tiff: truncated header")
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("tiff: bad magic")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    tags = read_ifd(payload, bo, ifd_off)

    def scalar(tag: int, default=None, name: str = "tag"):
        """Named guard for hostile IFD entries: a scalar tag must be a
        non-empty list of INTS (a RATIONAL-typed or count=0 entry
        would otherwise surface as a raw TypeError/IndexError instead
        of the codec contract's loud named errors — review finding)."""
        vals = tags.get(tag)
        if vals is None:
            if default is None:
                raise ValueError(f"tiff: missing {name}")
            return default
        if not vals or not isinstance(vals[0], int):
            raise ValueError(
                f"tiff: {name} entry is empty or non-integer-typed"
            )
        return vals[0]

    width = scalar(_WIDTH, name="ImageWidth")
    height = scalar(_LENGTH, name="ImageLength")
    if width <= 0 or height <= 0 or width * height > MAX_PIXELS:
        raise ValueError(f"tiff: unreasonable canvas {width}x{height}")
    compression = scalar(_COMPRESSION, 1, "Compression")
    if compression not in (1, 2, 3, 4, 5, 6, 7, 8, 32773, 32946):
        raise NotImplementedError(
            f"tiff: compression {compression} (none/CCITT/LZW/JPEG/"
            "Deflate/PackBits only)"
        )
    ccitt = compression in (2, 3, 4)
    predictor = scalar(_PREDICTOR, 1, "Predictor")
    if predictor not in (1, 2) or (ccitt and predictor != 1):
        raise NotImplementedError(
            f"tiff: predictor {predictor} (none/horizontal only, "
            "none with CCITT)"
        )
    photometric = scalar(_PHOTOMETRIC, 1, "Photometric")
    if ccitt:
        allowed = (0, 1)
    elif compression in (6, 7):
        allowed = (0, 1, 2, 3, 6)
    else:
        allowed = (0, 1, 2, 3)
    if photometric not in allowed:
        raise NotImplementedError(
            f"tiff: photometric {photometric} (gray/RGB/palette, plus "
            "YCbCr only inside new-style JPEG strips where the JPEG "
            "decoder performs the conversion; bilevel for CCITT)"
        )
    palette = None
    if photometric == 3:
        cm = tags.get(_COLORMAP)
        if (
            not cm
            or len(cm) % 3
            or len(cm) // 3 not in (256, 65536)
            or not all(isinstance(v, int) for v in cm)
        ):
            raise ValueError(
                "tiff: palette image without a 3x(2^8|2^16) ColorMap"
            )
        # ColorMap stores 16-bit channel blocks (all R, all G, all
        # B); writers map 8-bit values as v*257, so >> 8 inverts it.
        # 256 entries pair with 8-bit indices, 65536 with 16-bit
        # (r13: the 16-bit-palette-index cell, VERDICT r12 item 7)
        palette = (
            np.array(cm, np.uint32).reshape(3, -1).T >> 8
        ).astype(np.uint8)
    spp = scalar(_SAMPLES, 1, "SamplesPerPixel")
    want_spp = 3 if photometric in (2, 6) else 1
    if spp != want_spp:
        raise NotImplementedError(
            f"tiff: {spp} samples/pixel with photometric {photometric} "
            "(extra/alpha samples unsupported)"
        )
    bits = tags.get(_BITS, [1] if ccitt else [8])
    if ccitt:
        want = ([1],)
    elif compression in (6, 7):
        want = ([8],)  # JPEG strips: the baseline codec is 8-bit
    else:
        want = ([8], [16])
    if (
        not bits
        or any(not isinstance(b, int) for b in bits)
        or [bits[0]] not in want
        or any(b != bits[0] for b in bits)
    ):
        raise NotImplementedError(
            f"tiff: bits per sample {bits} "
            f"({'/'.join(str(w[0]) for w in want)} only for "
            f"compression {compression})"
        )
    bits16 = bits[0] == 16
    if palette is not None and len(palette) != 1 << bits[0]:
        raise ValueError(
            f"tiff: ColorMap of {len(palette)} entries does not "
            f"match BitsPerSample {bits[0]}"
        )
    planar = scalar(_PLANAR, 1, "PlanarConfig")
    if planar not in (1, 2):
        raise ValueError(f"tiff: planar configuration {planar}")
    if planar == 2 and (spp != 3 or compression in (6, 7)):
        raise NotImplementedError(
            "tiff: planar configuration 2 only for 3-sample raster "
            "strips (gray is planar-trivial; JPEG strips are chunky)"
        )
    if compression == 6:
        # old-style JPEG (TIFF 6.0 §22, deprecated by Tech Note 2
        # but still in circulation from 90s-era scanners): the
        # interoperable shape points JPEGInterchangeFormat at ONE
        # complete JFIF stream inside the file; the per-strip
        # fragment-table form (JPEGQTables/DC/AC pointers) is the
        # named remainder (r12 late)
        jif = tags.get(_JIF)
        if not jif or not isinstance(jif[0], int):
            raise NotImplementedError(
                "tiff: old-style JPEG without JPEGInterchangeFormat "
                "(the fragment-table form is a named gap)"
            )
        from . import jpeg as _jpeg

        off = jif[0]
        jlen = tags.get(_JIF_LEN)
        end = (
            off + jlen[0]
            if jlen and isinstance(jlen[0], int)
            else len(payload)
        )
        if not 0 <= off < end <= len(payload):
            raise ValueError(
                "tiff: JPEGInterchangeFormat out of bounds"
            )
        dec = _jpeg.decode_baseline_jpeg(payload[off:end])
        px = dec["pixels"]
        got_ch = 1 if px.ndim == 2 else px.shape[2]
        if (dec["width"], dec["height"]) != (width, height):
            raise ValueError(
                f"tiff: old-style JPEG is {dec['width']}x"
                f"{dec['height']}, IFD says {width}x{height}"
            )
        if got_ch != spp:
            raise ValueError(
                f"tiff: old-style JPEG has {got_ch} channels, "
                f"SamplesPerPixel says {spp}"
            )
        if photometric == 0:
            px = 255 - px
        return {
            "format": "tiff",
            "width": width,
            "height": height,
            "pixels": px,
        }
    if _STRIP_OFFSETS not in tags or _STRIP_COUNTS not in tags:
        raise ValueError("tiff: missing strip offsets/byte counts")
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("tiff: strip offset/count length mismatch")
    if not all(
        isinstance(v, int) for v in offsets
    ) or not all(isinstance(v, int) for v in counts):
        raise ValueError("tiff: strip offsets/counts non-integer-typed")
    rows_per_strip = scalar(_ROWS_PER_STRIP, height, "RowsPerStrip")
    if rows_per_strip <= 0:
        raise ValueError("tiff: non-positive RowsPerStrip")
    if compression == 7:
        # new-style JPEG-in-TIFF (TIFF Tech Note 2): each strip is a
        # complete JPEG bitstream, optionally ABBREVIATED — shared
        # DQT/DHT live in the JPEGTables tag and splice in after the
        # strip's SOI. Decoding (incl. the YCbCr->RGB conversion for
        # photometric 6) delegates to the in-repo baseline decoder.
        from . import jpeg as _jpeg

        prefix = b""
        tbl = tags.get(_JPEGTABLES)
        if tbl:
            tb = bytes(v & 0xFF for v in tbl)
            if len(tb) < 4 or tb[:2] != b"\xff\xd8":
                raise ValueError("tiff: malformed JPEGTables")
            prefix = tb[2:-2] if tb[-2:] == b"\xff\xd9" else tb[2:]
        parts = []
        remaining_rows = height
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(payload):
                raise ValueError("tiff: strip out of bounds")
            strip = payload[off : off + cnt]
            if strip[:2] != b"\xff\xd8":
                raise ValueError("tiff: JPEG strip without SOI")
            dec = _jpeg.decode_baseline_jpeg(
                strip[:2] + prefix + strip[2:]
            )
            spx = dec["pixels"]
            n_rows = min(rows_per_strip, remaining_rows)
            got_ch = 1 if spx.ndim == 2 else spx.shape[2]
            if dec["width"] != width or dec["height"] < n_rows:
                raise ValueError(
                    f"tiff: JPEG strip {dec['width']}x{dec['height']} "
                    f"does not cover {width}x{n_rows}"
                )
            if got_ch != spp:
                raise ValueError(
                    f"tiff: JPEG strip has {got_ch} channels, "
                    f"SamplesPerPixel says {spp}"
                )
            parts.append(spx[:n_rows])
            remaining_rows -= n_rows
        if remaining_rows != 0:
            raise ValueError(
                "tiff: strips cover fewer rows than ImageLength"
            )
        px = np.concatenate(parts, axis=0)
        if photometric == 0:
            px = 255 - px
        return {
            "format": "tiff",
            "width": width,
            "height": height,
            "pixels": px,
        }
    if ccitt:
        # CCITT fax (r11 late): Compression 2 = Modified Huffman,
        # 3 = T.4 Group 3 (1D, or 2D when T4Options bit 0 is set),
        # 4 = T.6 Group 4 MMR. Each strip codes its rows
        # independently (the T.6 reference line resets per strip).
        from . import ccitt as _ccitt

        t4opts = scalar(_T4OPTIONS, 0, "T4Options")
        t6opts = scalar(_T6OPTIONS, 0, "T6Options")
        if (compression == 3 and t4opts & 2) or (
            compression == 4 and t6opts & 2
        ):
            raise NotImplementedError(
                "tiff: CCITT uncompressed-mode option"
            )
        parts = []
        remaining_rows = height
        for off, cnt in zip(offsets, counts):
            if off + cnt > len(payload):
                raise ValueError("tiff: strip out of bounds")
            n_rows = min(rows_per_strip, remaining_rows)
            strip = payload[off : off + cnt]
            if compression == 2:
                fax = _ccitt.decode_mh(strip, width, n_rows)
            elif compression == 3:
                fax = _ccitt.decode_g3(
                    strip, width, n_rows, two_d=bool(t4opts & 1)
                )
            else:
                fax = _ccitt.decode_g4(strip, width, n_rows)
            parts.append(fax)
            remaining_rows -= n_rows
        if remaining_rows != 0:
            raise ValueError(
                "tiff: strips cover fewer rows than ImageLength"
            )
        fax = np.concatenate(parts, axis=0)
        # Per TIFF 6.0 the decompressed fax bits ARE the samples
        # (white pel -> 0). Under photometric 0 (WhiteIsZero) sample
        # 0 displays white; under photometric 1 (BlackIsZero) sample
        # 0 displays black, i.e. the image is stored "reversed" and
        # must be inverted relative to photometric 0 (libtiff
        # semantics — the r11 ADVICE catch).
        if photometric == 1:
            px = (fax * 255).astype(np.uint8)
        else:
            px = ((1 - fax) * 255).astype(np.uint8)
        return {
            "format": "tiff",
            "width": width,
            "height": height,
            "pixels": px,
        }

    def decode_strip(off: int, cnt: int, expected: int) -> bytes:
        if off + cnt > len(payload):
            raise ValueError("tiff: strip out of bounds")
        strip = payload[off : off + cnt]
        if compression == 32773:
            return _unpackbits(strip, expected)
        if compression == 5:
            return _lzw_decode(strip, expected)
        if compression in (8, 32946):
            # Adobe Deflate (8) / legacy Deflate (32946): zlib strips
            import zlib

            try:
                strip = zlib.decompress(bytes(strip))
            except zlib.error as e:
                raise ValueError(f"tiff: bad Deflate strip: {e}") from e
            if len(strip) != expected:
                raise ValueError(
                    f"tiff: Deflate strip decoded to {len(strip)} "
                    f"bytes, expected {expected}"
                )
            return strip
        if len(strip) != expected:
            raise ValueError(
                f"tiff: strip carries {len(strip)} bytes, expected "
                f"{expected}"
            )
        return strip

    # sample width: 16-bit rasters decode in their native byte order
    # and downconvert to the package-wide 8-bit codec contract at the
    # END (>>8, the exact inverse of the v*257 upscale convention) —
    # predictor inversion must run on the 16-bit values first
    bps = 2 if bits16 else 1
    dtype = np.dtype(bo + "u2") if bits16 else np.dtype(np.uint8)
    if planar == 2:
        # planar configuration 2 (r11): strips group PER CHANNEL —
        # all of channel 0's strips, then channel 1's, then 2's; each
        # strip carries one sample per pixel
        spc = -(-height // rows_per_strip)  # strips per channel
        if len(offsets) != 3 * spc:
            raise ValueError(
                f"tiff: planar-2 needs {3 * spc} strips "
                f"(3 x {spc}), found {len(offsets)}"
            )
        planes = []
        for c in range(3):
            buf = bytearray()
            remaining_rows = height
            for i in range(spc):
                n_rows = min(rows_per_strip, remaining_rows)
                j = c * spc + i
                buf += decode_strip(
                    offsets[j], counts[j], n_rows * width * bps
                )
                remaining_rows -= n_rows
            planes.append(
                np.frombuffer(bytes(buf), dtype).reshape(
                    height, width
                )
            )
        px = np.stack(planes, axis=-1)
    else:
        row_bytes = width * spp * bps
        raw = bytearray()
        remaining_rows = height
        for off, cnt in zip(offsets, counts):
            n_rows = min(rows_per_strip, remaining_rows)
            raw += decode_strip(off, cnt, n_rows * row_bytes)
            remaining_rows -= n_rows
        if remaining_rows != 0:
            raise ValueError(
                "tiff: strips cover fewer rows than ImageLength"
            )
        px = np.frombuffer(bytes(raw), dtype)
        px = (
            px.reshape(height, width)
            if spp == 1
            else px.reshape(height, width, 3)
        )
    if predictor == 2:
        # horizontal differencing: each sample is stored as the delta
        # from the same sample of the previous pixel — invert with a
        # per-row per-channel cumulative sum mod 2^bits
        mod = 65536 if bits16 else 256
        px = (np.cumsum(px.astype(np.int64), axis=1) % mod).astype(
            dtype
        )
    if photometric == 3:
        # indices look up BEFORE any bit-depth downshift: a 16-bit
        # sample here is a palette INDEX, not an intensity
        px = palette[px]  # (h, w) indices -> (h, w, 3) RGB
    elif bits16:
        px = (px >> 8).astype(np.uint8)
    if photometric == 0:
        # MinIsWhite: invert to the MinIsBlack convention every other
        # decoder in this package emits
        px = 255 - px
    return {
        "format": "tiff",
        "width": width,
        "height": height,
        "pixels": px,
    }


def _packbits(row: bytes) -> bytes:
    """Per-row PackBits encoder (TIFF 6.0 recommends row-bounded
    runs): greedy runs of >= 3 repeats, literals otherwise."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and row[i + nxt] == row[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split a baseline JPEG stream into (abbreviated stream, tables):
    DQT/DHT segments hoisted out, everything else (SOI, SOF, SOS +
    entropy data) kept in order — the JPEGTables abbreviation of TIFF
    Tech Note 2. Segment walk stops at SOS; the entropy-coded tail is
    copied verbatim."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("jpeg stream without SOI")
    body = bytearray(b"\xff\xd8")
    tables = bytearray()
    p = 2
    n = len(stream)
    while p + 4 <= n:
        if stream[p] != 0xFF:
            raise ValueError(f"bad JPEG marker at {p}")
        marker = stream[p + 1]
        (ln,) = struct.unpack(">H", stream[p + 2 : p + 4])
        seg = stream[p : p + 2 + ln]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            body += seg
        p += 2 + ln
        if marker == 0xDA:  # SOS: entropy data follows
            body += stream[p:]
            break
    return bytes(body), bytes(tables)


def encode_tiff(
    width: int,
    height: int,
    pixels: np.ndarray,
    big_endian: bool = False,
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    palette: np.ndarray | None = None,
    jpeg_strips: bool = False,
    jpeg_old: bool = False,
    planar2: bool = False,
    ccitt: str | None = None,
    bits: int = 8,
) -> bytes:
    """Write a real baseline TIFF: 8-bit gray ((h, w) input), RGB
    ((h, w, 3)), or PALETTE-indexed ((h, w) indices + a (256, 3)
    uint8 ``palette`` -> photometric 3 with a 16-bit ColorMap,
    channels mapped v*257 so the decoder's >>8 inverts exactly);
    either byte order, optional PackBits or LZW compression (LZW may
    pair with horizontal-differencing ``predictor=2``, the
    real-world default for photographic TIFFs), strip layout
    controlled by ``rows_per_strip`` (default: one strip).
    ``jpeg_strips`` writes new-style JPEG-in-TIFF (compression 7,
    photometric 6 for RGB): each strip a baseline JPEG with the
    shared DQT/DHT hoisted into the JPEGTables tag (the abbreviated-
    stream form real writers emit); lossy within the in-repo codec's
    derived round-trip bound."""
    if sum((packbits, lzw, deflate, jpeg_strips, jpeg_old,
            ccitt is not None)) > 1:
        raise ValueError(
            "encode_tiff: packbits/lzw/deflate/jpeg_strips/jpeg_old/"
            "ccitt are exclusive"
        )
    if jpeg_old and (palette is not None or planar2 or predictor != 1
                     or bits != 8):
        raise ValueError(
            "encode_tiff: jpeg_old excludes palette/planar2/"
            "predictor/16-bit"
        )
    if ccitt is not None and ccitt not in ("mh", "g3", "g4"):
        raise ValueError(f"encode_tiff: ccitt form {ccitt!r}")
    if ccitt is not None and (
        palette is not None or planar2 or predictor != 1
    ):
        raise ValueError(
            "encode_tiff: ccitt excludes palette/planar2/predictor"
        )
    if jpeg_strips and (palette is not None or predictor != 1):
        raise ValueError(
            "encode_tiff: jpeg_strips excludes palette/predictor"
        )
    if planar2 and (jpeg_strips or palette is not None):
        raise ValueError(
            "encode_tiff: planar2 excludes jpeg_strips/palette"
        )
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff: predictor {predictor}")
    if bits not in (8, 16):
        raise ValueError(f"encode_tiff: bits {bits}")
    if bits == 16 and (jpeg_strips or ccitt is not None):
        raise ValueError(
            "encode_tiff: 16-bit excludes jpeg_strips/ccitt"
        )
    bo = ">" if big_endian else "<"
    px = np.asarray(pixels, np.uint16 if bits == 16 else np.uint8)
    spp = 1 if px.ndim == 2 else px.shape[2]
    if px.shape[:2] != (height, width) or spp not in (1, 3):
        raise ValueError(f"encode_tiff: bad pixel shape {px.shape}")
    if palette is not None:
        palette = np.asarray(palette, np.uint8)
        want_shape = (65536, 3) if bits == 16 else (256, 3)
        if spp != 1 or palette.shape != want_shape:
            raise ValueError(
                "encode_tiff: palette needs (h, w) indices and a "
                f"{want_shape} palette for bits={bits}"
            )
    if predictor == 2:
        # horizontal differencing mod 2^bits (inverted by the
        # decoder's per-row cumulative sum)
        d = px.astype(np.int64)
        d[:, 1:] = d[:, 1:] - d[:, :-1]
        px = (d % (1 << bits)).astype(px.dtype)
    sample_dtype = np.dtype(bo + "u2") if bits == 16 else np.uint8
    rps = rows_per_strip or height
    row_bytes = width * spp * (2 if bits == 16 else 1)
    flat = px.astype(sample_dtype).tobytes()
    strips = []
    jpeg_tables: bytes | None = None
    if jpeg_old:
        # old-style compression 6 (r12 late): ONE complete JFIF
        # stream pointed at by JPEGInterchangeFormat
        from . import jpeg as _jpeg

        strips.append(_jpeg.encode_baseline_jpeg(px))
    elif jpeg_strips:
        from . import jpeg as _jpeg

        first_tables: bytes | None = None
        for top in range(0, height, rps):
            n_rows = min(rps, height - top)
            stream = _jpeg.encode_baseline_jpeg(
                px[top : top + n_rows]
            )
            body, tables = _split_jpeg_tables(stream)
            if first_tables is None:
                first_tables = tables
                jpeg_tables = b"\xff\xd8" + tables + b"\xff\xd9"
            if tables == first_tables:
                # abbreviated stream: shared tables ride JPEGTables
                strips.append(body)
            else:
                # this strip's entropy stats produced DIFFERENT
                # optimal tables — keep them in-strip (legal: local
                # tables override JPEGTables), never mis-decode
                strips.append(stream)
    elif ccitt is not None:
        # bilevel fax strips (r11 late): input is display gray
        # (white = 255); values below 128 become black fax bits.
        # Written as photometric 0 with BitsPerSample 1 — the
        # archive-scanner default layout.
        from . import ccitt as _ccitt

        if spp != 1:
            raise ValueError("encode_tiff: ccitt needs (h, w) gray")
        fax = (px < 128).astype(np.uint8)
        enc = {
            "mh": _ccitt.encode_mh,
            "g3": _ccitt.encode_g3_1d,
            "g4": _ccitt.encode_g4,
        }[ccitt]
        for top in range(0, height, rps):
            strips.append(enc(fax[top : top + min(rps, height - top)]))
    else:

        def pack_chunk(chunk: bytes, n_rows: int, rb: int) -> bytes:
            if packbits:
                return b"".join(
                    _packbits(chunk[r * rb : (r + 1) * rb])
                    for r in range(n_rows)
                )
            if lzw:
                return _lzw_encode(chunk)
            if deflate:
                import zlib

                return zlib.compress(chunk)
            return chunk

        if planar2:
            if spp != 3:
                raise ValueError("encode_tiff: planar2 needs RGB")
            plane_rb = width * (2 if bits == 16 else 1)
            for c in range(3):
                plane = np.ascontiguousarray(
                    px[:, :, c].astype(sample_dtype)
                )
                for top in range(0, height, rps):
                    n_rows = min(rps, height - top)
                    chunk = plane[top : top + n_rows].tobytes()
                    strips.append(pack_chunk(chunk, n_rows, plane_rb))
        else:
            for top in range(0, height, rps):
                n_rows = min(rps, height - top)
                chunk = flat[
                    top * row_bytes : (top + n_rows) * row_bytes
                ]
                strips.append(pack_chunk(chunk, n_rows, row_bytes))

    # two-pass layout: pass 1 sizes every entry's value to place the
    # overflow area and the strip data; pass 2 packs with the real
    # strip offsets known — no in-place patching
    def dim_type(v: int) -> int:
        # TIFF 6.0 allows SHORT or LONG for the dimension tags; a
        # SHORT-only writer crashed on any dimension above 65,535
        # while the decoder happily accepts up to MAX_PIXELS (review
        # finding)
        return 3 if v <= 0xFFFF else 4

    comp_tag = (
        32773
        if packbits
        else 5
        if lzw
        else 8
        if deflate
        else 7
        if jpeg_strips
        else 6
        if jpeg_old
        else {"mh": 2, "g3": 3, "g4": 4}[ccitt]
        if ccitt is not None
        else 1
    )
    entries = [
        (_WIDTH, dim_type(width), [width]),
        (_LENGTH, dim_type(height), [height]),
        (_BITS, 3, [1] if ccitt is not None else [bits] * spp),
        (_COMPRESSION, 3, [comp_tag]),
        (
            _PHOTOMETRIC,
            3,
            [
                0
                if ccitt is not None
                else 3
                if palette is not None
                else 6
                if (jpeg_strips or jpeg_old) and spp == 3
                else 2
                if spp == 3
                else 1
            ],
        ),
        (_STRIP_OFFSETS, 4, None),  # values filled in pass 2
        (_SAMPLES, 3, [spp]),
        (_ROWS_PER_STRIP, dim_type(rps), [rps]),
        (_STRIP_COUNTS, 4, [len(s) for s in strips]),
        (_PLANAR, 3, [2 if planar2 else 1]),
    ]
    if predictor == 2:
        entries.append((_PREDICTOR, 3, [2]))
    if ccitt == "g3":
        entries.append((_T4OPTIONS, 4, [0]))  # 1D, no fill
    elif ccitt == "g4":
        entries.append((_T6OPTIONS, 4, [0]))
    if palette is not None:
        cm = (palette.T.astype(np.uint32) * 257).reshape(-1)
        entries.append((_COLORMAP, 3, [int(v) for v in cm]))
    if jpeg_tables is not None:
        entries.append((_JPEGTABLES, 7, list(jpeg_tables)))
    if jpeg_old:
        entries.append((_JIF, 4, None))  # filled with the stream
        entries.append((_JIF_LEN, 4, [len(strips[0])]))
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * len(entries) + 4
    extra_size = 0
    for tag, typ, values in entries:
        count = len(strips) if values is None else len(values)
        size = _TYPE_SIZES[typ] * count
        if size > 4:
            extra_size += size
    data_off = extra_off + extra_size
    offsets, pos = [], data_off
    for s in strips:
        offsets.append(pos)
        pos += len(s)

    fmt_of = {3: "H", 4: "I", 7: "B"}  # 7 = UNDEFINED (JPEGTables)
    extra = bytearray()
    ifd = bytearray(struct.pack(bo + "H", len(entries)))
    for tag, typ, values in sorted(
        entries, key=lambda e: e[0]
    ):
        if values is None:
            values = offsets
        count = len(values)
        packed = struct.pack(bo + fmt_of[typ] * count, *values)
        if len(packed) <= 4:
            field = packed.ljust(4, b"\x00")
        else:
            field = struct.pack(bo + "I", extra_off + len(extra))
            extra += packed
        ifd += struct.pack(bo + "HHI", tag, typ, count) + field
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    head = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        bo + "I", ifd_off
    )
    return head + bytes(ifd) + bytes(extra) + b"".join(strips)


def register() -> None:
    """Plug the TIFF decoder into the shared image-codec registry
    (idempotent), under both byte-order magics."""
    from . import multimodal

    multimodal.register_image_codec(b"II*\x00", decode_tiff)
    multimodal.register_image_codec(b"MM\x00*", decode_tiff)
