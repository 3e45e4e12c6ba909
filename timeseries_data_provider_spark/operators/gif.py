"""[EXT] GIF decoder/encoder — stdlib-only (VERDICT r8 item 2).

GIF is a top-5 crawled image format and, unlike VP8 lossy, is fully
stdlib-feasible: LZW + palettes, no entropy-coded DCT. This module
implements the public GIF87a/GIF89a format (W3C specification):

* ``decode_gif`` — header + logical screen descriptor, global/local
  color tables, extension-block skipping (with Graphic Control
  Extension transparency capture), FIRST image frame fully decoded
  (variable-width LSB-first LZW with deferred-clear semantics,
  interlace passes), returned in the same ``{format, width, height,
  pixels}`` dict contract as the BMP/PNG/VP8L decoders — so it rides
  ``media_features`` / ``resize_features`` / ``frames_with_meta``
  unchanged once registered.
* ``encode_gif`` — a self-written encoder (real variable-width LZW
  with table growth + clear-on-full, sub-block framing, optional
  interlace) used for round-trip verification; like VP8L, no
  reference GIF library exists in this container, so correctness
  rests on self-roundtrip plus hand-built byte streams in
  tests/test_gif.py (truncation fuzz at every offset included).
* ``register()`` — plugs the decoder into
  ``multimodal.register_image_codec`` under the ``GIF8`` magic; the
  payload stays an opaque binary column until a worker-side Arrow
  batch decodes it, the same scale envelope as every other codec
  (per-row independent, linear in bytes, zero shuffle).

Animation scope: multi-frame GIFs decode their FIRST frame (the
corpus-building semantics — a thumbnail/feature pass wants one
representative raster); frame count is reported so a sampler can
filter. Honest gaps are named ValueErrors, not silent wrong pixels.
"""

from __future__ import annotations

import struct

import numpy as np

# hostile-input cap, same spirit as the PNG/VP8L guards: a 4-byte
# header can claim a canvas the LZW stream never fills
MAX_PIXELS = 64 * 1024 * 1024


class _ByteReader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("gif: truncated stream")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks up to the 0x00 terminator."""
        out = bytearray()
        while True:
            n = self.u8()
            if n == 0:
                return bytes(out)
            out += self.take(n)

    def skip_sub_blocks(self) -> None:
        while True:
            n = self.u8()
            if n == 0:
                return
            self.take(n)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-variant LZW: codes are LSB-first across the concatenated
    sub-block bytes; width starts min_code_size+1 and grows when the
    next table slot reaches 2**width, capping at 12 bits with
    DEFERRED clear (width stays 12 until an explicit clear code —
    the compatibility behavior every real-world decoder implements).
    Decoding stops once ``n_pixels`` indices are produced (trailing
    bits are padding) or at EOI."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"gif: bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table: code -> byte sequence; singles are fixed, dict entries grow
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    bitbuf = 0
    nbits = 0
    di = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if di >= len(data):
                raise ValueError(
                    "gif: LZW stream exhausted before raster complete"
                )
            bitbuf |= data[di] << nbits
            di += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError(f"gif: first code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Variable-width LZW encoder matching ``_lzw_decode``: leading
    clear code, dictionary growth to 4096 then clear-and-restart,
    trailing EOI, LSB-first bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            # the decoder widens when the next slot REACHES 2**width;
            # mirror it exactly or streams desynchronize at 511/1023…
            if next_code >= (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF payload to ``{format, width, height, pixels,
    n_frames}`` — first frame rasterized onto the logical screen
    (background-filled), ``pixels`` (h, w, 3) uint8. Remaining frames
    are COUNTED (descriptor walk, LZW skipped) but not composited —
    the named animation scope."""
    r = _ByteReader(payload)
    sig = r.take(6)
    if sig[:4] != b"GIF8" or sig[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"gif: bad signature {sig!r}")
    sw, sh = r.u16(), r.u16()
    packed = r.u8()
    bg_index = r.u8()
    r.u8()  # pixel aspect ratio
    if sw <= 0 or sh <= 0 or sw * sh > MAX_PIXELS:
        raise ValueError(f"gif: unreasonable canvas {sw}x{sh}")
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(r.take(3 * n), np.uint8).reshape(n, 3)
    transparent: int | None = None
    first: np.ndarray | None = None
    n_frames = 0
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = r.u8()
            if label == 0xF9 and first is None:
                body = r.sub_blocks()
                if len(body) >= 4 and body[0] & 0x01:
                    transparent = body[3]
            else:
                r.skip_sub_blocks()
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
        # image descriptor
        ix, iy, iw, ih = r.u16(), r.u16(), r.u16(), r.u16()
        ipacked = r.u8()
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(r.take(3 * n), np.uint8).reshape(n, 3)
        min_code = r.u8()
        if first is not None:
            r.skip_sub_blocks()
            n_frames += 1
            continue
        if iw <= 0 or ih <= 0 or ix + iw > sw or iy + ih > sh:
            raise ValueError(
                f"gif: frame {iw}x{ih}@({ix},{iy}) exceeds canvas"
            )
        data = r.sub_blocks()
        idx = np.frombuffer(
            bytes(_lzw_decode(data, min_code, iw * ih)), np.uint8
        ).reshape(ih, iw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        pal = lct if lct is not None else gct
        if pal is None:
            raise ValueError("gif: frame has neither local nor global "
                             "color table")
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError(
                f"gif: palette index {int(idx.max())} out of range "
                f"(table has {len(pal)} entries)"
            )
        rgb = pal[idx]
        if transparent is not None and transparent < len(pal):
            # first-frame semantics: transparent pixels show the
            # background color (there is no prior frame to reveal)
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, np.uint8)
            )
            rgb = np.where((idx == transparent)[..., None], bg, rgb)
        # composite onto the logical screen
        if (ix, iy, iw, ih) == (0, 0, sw, sh):
            first = rgb
        else:
            bg = (
                gct[bg_index]
                if gct is not None and bg_index < len(gct)
                else np.zeros(3, np.uint8)
            )
            canvas = np.empty((sh, sw, 3), np.uint8)
            canvas[:] = bg
            canvas[iy : iy + ih, ix : ix + iw] = rgb
            first = canvas
        n_frames += 1
    if first is None:
        raise ValueError("gif: no image frame before trailer")
    return {
        "format": "gif",
        "width": sw,
        "height": sh,
        "pixels": first,
        "n_frames": n_frames,
    }


def encode_gif(
    width: int,
    height: int,
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    n_extra_frames: int = 0,
) -> bytes:
    """Write a real GIF89a: global color table sized to the next
    power of two ≥ len(palette) (min 2), LZW-compressed raster,
    optional interlace, optional ``n_extra_frames`` duplicate frames
    (exercises the animation frame-count path). Round-trips through
    ``decode_gif`` bit-exactly on the first frame."""
    indices = np.asarray(indices, np.uint8).reshape(height, width)
    palette = np.asarray(palette, np.uint8).reshape(-1, 3)
    if int(indices.max(initial=0)) >= len(palette):
        raise ValueError("gif: index out of palette range")
    bits = max(1, (len(palette) - 1).bit_length())
    n = 1 << bits
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += pal.tobytes()
    min_code = max(2, bits)

    def frame(rows: np.ndarray):
        nonlocal out
        out.append(0x2C)
        out += struct.pack("<HHHH", 0, 0, width, height)
        out.append(0x40 if interlace else 0x00)
        if interlace:
            order = []
            for start, step in _INTERLACE_PASSES:
                order.extend(range(start, height, step))
            rows = rows[np.asarray(order)]
        out.append(min_code)
        comp = _lzw_encode(rows.tobytes(), min_code)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)

    frame(indices)
    for _ in range(n_extra_frames):
        frame(indices)
    out.append(0x3B)
    return bytes(out)


def register() -> None:
    """Plug the GIF decoder into the shared image-codec registry
    (idempotent). ``decode_image`` dispatches on the 4-byte ``GIF8``
    magic prefix."""
    from . import multimodal

    multimodal.register_image_codec(b"GIF8", decode_gif)
