"""Real stdlib codecs (BMP/WAV/PNG) + Spark media-decode plumbing.

The reference treats all payloads as opaque JSON bodies (index.js:75-96);
our [EXT] multimodal layer adds typed binary columns with REAL decode for
the formats parseable without codec libraries. These tests pin the byte-
level roundtrips (including BMP row padding and WAV chunk alignment) and
the distributed mapInPandas decode path end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import multimodal as mm


def test_bmp_roundtrip_with_row_padding():
    # width 5 -> row size 15 -> padded to 16: exercises the pad path
    w, h = 5, 3
    px = (np.arange(w * h, dtype=np.int64).reshape(h, w) % 256).astype(np.uint8)
    payload = mm.encode_bmp(w, h, px)
    dec = mm.decode_image(payload)
    assert dec["format"] == "bmp"
    assert (dec["width"], dec["height"]) == (w, h)
    # encoder replicates the scalar across B,G,R; all channels must match
    assert (dec["pixels"] == px[:, :, None]).all()
    # container size: 54-byte headers + padded rows
    assert len(payload) == 54 + ((3 * w + 3) // 4 * 4) * h


def test_bmp_rejects_unsupported_depth():
    payload = bytearray(mm.encode_bmp(2, 2, np.zeros((2, 2), np.uint8)))
    struct.pack_into("<H", payload, 28, 8)  # claim 8 bpp
    with pytest.raises(NotImplementedError):
        mm.decode_image(bytes(payload))


def test_wav_roundtrip():
    samples = np.array([-1024, 0, 1, 1023, -1, 512], dtype=np.int64)
    payload = mm.encode_wav(samples, sample_rate=8000)
    dec = mm.decode_audio(payload)
    assert dec["format"] == "wav"
    assert dec["sample_rate"] == 8000
    assert dec["channels"] == 1
    assert (dec["samples"] == samples).all()
    assert len(payload) == 44 + 2 * len(samples)


def test_wav_skips_unknown_chunks():
    # RIFF allows extra chunks (LIST, fact, ...) before data; the walker
    # must skip them, including the odd-size 2-byte-alignment rule.
    samples = np.array([7, -7, 7], dtype=np.int64)
    base = mm.encode_wav(samples)
    fmt_chunk = base[12:36]
    data_chunk = base[36:]
    junk = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # odd size + pad
    body = fmt_chunk + junk + data_chunk
    payload = struct.pack("<4sI4s", b"RIFF", len(body) + 4, b"WAVE") + body
    dec = mm.decode_audio(payload)
    assert (dec["samples"] == samples).all()


def test_aiff_roundtrip_and_rates():
    rng = np.random.RandomState(11)
    samples = rng.randint(-1024, 1024, 200).astype(np.int16)
    for rate in (8000, 44100, 48000, 96000):
        dec = mm.decode_audio(mm.encode_aiff(samples, rate))
        assert dec["format"] == "aiff"
        assert dec["sample_rate"] == rate  # 80-bit float parsed exact
        assert dec["channels"] == 1
        assert np.array_equal(dec["samples"], samples)
    # routed as audio through the shared sniffer (media_features path)
    assert mm.is_audio_payload(mm.encode_aiff(samples))


def test_aiff_registry_reachable_and_encode_guards():
    # a registered FORM codec must win over the 16-bit-only builtin —
    # the WebP shadowing fix applied to audio (review finding)
    payload = mm.encode_aiff(np.zeros(4, np.int16))
    try:
        mm.register_audio_codec(
            b"FORM",
            lambda p: {
                "format": "aiff24",
                "sample_rate": 1,
                "channels": 1,
                "samples": np.zeros(1, np.int32),
            },
        )
        assert mm.decode_audio(payload)["format"] == "aiff24"
    finally:
        mm.AUDIO_CODECS.pop(b"FORM", None)
    # rate 0 used to hang the mantissa loop; negative died in struct
    for rate in (0, -8000):
        with pytest.raises(ValueError, match="sample_rate"):
            mm.encode_aiff(np.zeros(4, np.int16), rate)
    # zero-channel COMM is malformed, not silently unvalidated
    chan_at = payload.index(b"COMM") + 8
    bad = bytearray(payload)
    bad[chan_at : chan_at + 2] = (0).to_bytes(2, "big")
    with pytest.raises(ValueError, match="zero channels"):
        mm.decode_audio(bytes(bad))


def test_aiff_errors_and_named_gaps():
    good = bytearray(mm.encode_aiff(np.zeros(4, np.int16)))
    # claim a 12-bit depth in COMM -> named plug-in error (8/16/24 are
    # real decoders now)
    bits_at = good.index(b"COMM") + 8 + 6
    bad_bits = bytearray(good)
    bad_bits[bits_at : bits_at + 2] = (12).to_bytes(2, "big")
    with pytest.raises(NotImplementedError, match="8/16/24"):
        mm.decode_audio(bytes(bad_bits))
    # frame-count / sample mismatch
    frames_at = good.index(b"COMM") + 8 + 2
    bad_frames = bytearray(good)
    bad_frames[frames_at : frames_at + 4] = (99).to_bytes(4, "big")
    with pytest.raises(ValueError, match="COMM claims"):
        mm.decode_audio(bytes(bad_frames))
    # truncated SSND body
    with pytest.raises(ValueError, match="truncated"):
        mm.decode_audio(bytes(good[:-3]))


def test_wav_bit_depths_roundtrip():
    # 8-bit unsigned-on-disk / signed-domain, 24-bit packed (odd byte
    # count exercises the RIFF pad rule), IEEE float 32/64
    s8 = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
    dec = mm.decode_audio(mm.encode_wav(s8, bits=8))
    assert dec["bits"] == 8 and (dec["samples"] == s8).all()
    s24 = np.array([-(2**23), -257, 0, 256, 2**23 - 1], dtype=np.int64)
    dec = mm.decode_audio(mm.encode_wav(s24, bits=24))
    assert dec["bits"] == 24 and dec["samples"].dtype == np.int32
    assert (dec["samples"] == s24).all()
    assert len(s24) * 3 % 2 == 1  # the odd-length pad path really ran
    f = np.array([-1.0, -0.5, 0.0, 0.25, 1.0], dtype=np.float64)
    for bits, dt in ((32, np.float32), (64, np.float64)):
        dec = mm.decode_audio(mm.encode_wav(f, bits=bits))
        assert dec["bits"] == bits and dec["samples"].dtype == dt
        assert np.array_equal(dec["samples"], f.astype(dt))
    with pytest.raises(ValueError, match="bits=12"):
        mm.encode_wav(s8, bits=12)


def test_wav_named_gaps_and_hostile():
    base = bytearray(mm.encode_wav(np.zeros(4, np.int64)))
    fmt_at = base.index(b"fmt ") + 8
    bad = bytearray(base)
    bad[fmt_at : fmt_at + 2] = (2).to_bytes(2, "little")  # ADPCM
    with pytest.raises(NotImplementedError, match="fmt=2"):
        mm.decode_audio(bytes(bad))
    # 24-bit data chunk whose byte count is not a multiple of 3
    p24 = bytearray(mm.encode_wav(np.zeros(4, np.int64), bits=24))
    data_at = p24.index(b"data") + 4
    size = int.from_bytes(p24[data_at : data_at + 4], "little")
    p24[data_at : data_at + 4] = (size - 1).to_bytes(4, "little")
    with pytest.raises(ValueError, match="multiple of 3"):
        mm.decode_audio(bytes(p24[:-1]))


def test_aiff_bit_depths_roundtrip():
    s8 = np.array([-128, -1, 0, 1, 127], dtype=np.int64)
    dec = mm.decode_audio(mm.encode_aiff(s8, bits=8))
    assert dec["format"] == "aiff" and dec["bits"] == 8
    assert (dec["samples"] == s8).all()  # AIFF 8-bit is SIGNED
    s24 = np.array([-(2**23), -65536, 0, 513, 2**23 - 1], dtype=np.int64)
    dec = mm.decode_audio(mm.encode_aiff(s24, bits=24))
    assert dec["bits"] == 24 and (dec["samples"] == s24).all()
    with pytest.raises(ValueError, match="bits=12"):
        mm.encode_aiff(s8, bits=12)


def test_aifc_roundtrips_and_gaps():
    s = np.array([-32768, -3, 0, 7, 32767], dtype=np.int64)
    for comp in (b"sowt", b"NONE"):
        dec = mm.decode_audio(mm.encode_aifc(s, 44100, compression=comp))
        assert dec["format"] == "aifc"
        assert dec["sample_rate"] == 44100
        assert dec["bits"] == 16
        assert (dec["samples"] == s).all()
    f = np.array([-1.0, 0.5, 0.0, 0.25], dtype=np.float32)
    dec = mm.decode_audio(mm.encode_aifc(f, compression=b"fl32"))
    assert dec["bits"] == 32 and dec["samples"].dtype == np.float32
    assert np.array_equal(dec["samples"], f)
    # AIFC is routed as audio by the shared sniffer
    assert mm.is_audio_payload(mm.encode_aifc(s))
    # compressed types stay the named register-a-codec boundary
    payload = bytearray(mm.encode_aifc(s))
    comp_at = payload.index(b"COMM") + 8 + 18
    payload[comp_at : comp_at + 4] = b"ima4"
    with pytest.raises(NotImplementedError, match="NONE/sowt/fl32"):
        mm.decode_audio(bytes(payload))
    with pytest.raises(ValueError, match="encode_aifc"):
        mm.encode_aifc(s, compression=b"alac")
    # an AIFC COMM without the compression field is malformed
    aiff16 = bytearray(mm.encode_aiff(s))
    aiff16[8:12] = b"AIFC"
    with pytest.raises(ValueError, match="compression type"):
        mm.decode_audio(bytes(aiff16))


def _g711_wav(fmt_code: int, payload_bytes: bytes) -> bytes:
    """Hand-built mono 8 kHz G.711 WAV (fmt 6 = a-law, 7 = mu-law)."""
    body = (
        struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, fmt_code, 1, 8000, 8000, 1, 8
        )
        + struct.pack("<4sI", b"data", len(payload_bytes))
        + payload_bytes
        + (b"\x00" if len(payload_bytes) & 1 else b"")
    )
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def test_g711_alaw_ulaw_decode_all_bytes():
    # independent reference: the CCITT g711.c formulas, re-derived
    # here (not imported from the module under test)
    def ulaw_ref(b):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 132) << ((u & 0x70) >> 4)
        return (132 - t) if (u & 0x80) else (t - 132)

    def alaw_ref(b):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    all_bytes = bytes(range(256))
    for fmt_code, ref in ((6, alaw_ref), (7, ulaw_ref)):
        dec = mm.decode_audio(_g711_wav(fmt_code, all_bytes))
        assert dec["format"] == "wav"
        assert dec["bits"] == 16  # decoded domain, not container width
        assert dec["sample_rate"] == 8000
        assert list(dec["samples"]) == [ref(b) for b in range(256)]
    # the canonical extremes land in the 16-bit domain
    assert int(np.abs(mm._ULAW_TABLE).max()) == 32124
    assert int(np.abs(mm._ALAW_TABLE).max()) == 32256
    # and the feature path gates them like PCM16 (no rescaling)
    dec = mm.decode_audio(_g711_wav(7, all_bytes))
    assert (mm.samples_i16_domain(dec) == dec["samples"]).all()


def test_wav_extensible_fmt_roundtrip_and_guid_gap():
    # WAVE_FORMAT_EXTENSIBLE (0xFFFE): the fmt chunk real-world
    # multichannel/24-bit WAVs ship with — the effective code lives in
    # the subformat GUID
    s = np.array([-32768, -1, 0, 1, 32767], dtype=np.int64)
    for bits in (16, 24):
        src = s if bits == 16 else s * 256
        dec = mm.decode_audio(mm.encode_wav(src, bits=bits, extensible=True))
        assert dec["bits"] == bits and (dec["samples"] == src).all()
    f = np.array([-1.0, 0.5, 0.25], dtype=np.float32)
    dec = mm.decode_audio(mm.encode_wav(f, bits=32, extensible=True))
    assert dec["samples"].dtype == np.float32
    assert np.array_equal(dec["samples"], f)
    # a non-PCM/float subformat GUID is the named plug-in boundary
    payload = bytearray(mm.encode_wav(s, extensible=True))
    guid_at = payload.index(b"fmt ") + 8 + 24
    payload[guid_at + 4] = 0xDE
    with pytest.raises(NotImplementedError, match="GUID"):
        mm.decode_audio(bytes(payload))
    # truncated extensible fmt chunk is malformed, not misparsed
    short = bytearray(mm.encode_wav(s, extensible=True))
    size_at = short.index(b"fmt ") + 4
    short[size_at : size_at + 4] = (20).to_bytes(4, "little")
    with pytest.raises(ValueError, match="extensible"):
        mm.decode_audio(bytes(short))


def test_wav_stereo_decode_and_downmix_features():
    # interleaved stereo: decode returns the interleaved stream +
    # channels=2; feature_samples downmixes to floor-mean mono frames
    left = np.array([100, -300, 500, -7], dtype=np.int64)
    right = np.array([200, -100, -500, 8], dtype=np.int64)
    inter = np.empty(8, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    dec = mm.decode_audio(mm.encode_wav(inter, channels=2))
    assert dec["channels"] == 2
    assert (dec["samples"] == inter).all()
    mono = mm.feature_samples(dec)
    want = (left + right) // 2  # floor semantics, incl. negative sums
    assert (mono == want).all()
    assert list(want[:2]) == [150, -200]
    # mono passes through downmix untouched
    assert (mm.downmix_mono(inter, 1) == inter).all()
    # encode guard: samples must interleave evenly
    with pytest.raises(ValueError, match="interleave"):
        mm.encode_wav(np.zeros(5, np.int64), channels=2)


def test_audio_features_stereo_gates_on_frames(spark):
    import math

    left = np.array([1000, -1000] * 16, dtype=np.int64)
    right = np.array([500, -500] * 16, dtype=np.int64)
    inter = np.empty(64, dtype=np.int64)
    inter[0::2], inter[1::2] = left, right
    media = spark.createDataFrame(
        [
            (0, bytearray(mm.encode_wav(inter, channels=2))),
            (1, bytearray(mm.encode_wav((left + right) // 2))),
        ],
        "doc_id long, payload binary",
    )
    out = (
        mm.audio_features(media).toPandas().set_index("doc_id").sort_index()
    )
    # the stereo clip gates exactly like its mono downmix: n_samples
    # is FRAMES, and all three features match the mono row
    assert (out.loc[0] == out.loc[1]).all()
    assert out.loc[0]["n_samples"] == 32
    assert out.loc[0]["peak_abs"] == 750
    m = (left + right) // 2
    assert out.loc[0]["rms_milli"] == math.isqrt(
        (1_000_000 * int((m * m).sum())) // 32
    )


def test_audio_features_container_invariant(spark):
    # the SAME waveform shipped at five sample formats must gate
    # identically: features are computed in the 16-bit domain
    rng = np.random.RandomState(3)
    s16 = rng.randint(-32768, 32768, 64).astype(np.int64)
    payloads = {
        0: mm.encode_wav(s16),
        1: mm.encode_wav(s16 >> 8, bits=8),
        2: mm.encode_wav(s16.astype(np.int64) << 8, bits=24),
        3: mm.encode_wav(s16 / 32767.0, bits=32),
        4: mm.encode_aifc(s16, compression=b"sowt"),
        5: mm.encode_aiff(s16 >> 8, bits=8),
    }
    media = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "doc_id long, payload binary",
    )
    out = (
        mm.audio_features(media)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 6
    base = out.loc[0]
    # exact-equal formats: 24-bit <<8 and sowt carry s16 verbatim
    for k in (2, 4):
        assert (out.loc[k] == base).all(), k
    # 8-bit variants lose the low byte identically in WAV and AIFF
    assert (out.loc[1] == out.loc[5]).all()
    assert abs(int(out.loc[1]["peak_abs"]) - int(base["peak_abs"])) < 256
    # float roundtrips within 1 LSB of the 16-bit original
    assert abs(int(out.loc[3]["peak_abs"]) - int(base["peak_abs"])) <= 1
    assert abs(int(out.loc[3]["rms_milli"]) - int(base["rms_milli"])) <= 1000


def test_png_roundtrip_all_filters():
    # h=7 cycles the scanline filter through 0..4 (and wraps): every
    # unfilter path (None/Sub/Up/Average/Paeth) is exercised, through
    # a real DEFLATE stream and real chunk CRCs
    w, h = 6, 7
    rng = np.arange(w * h, dtype=np.int64).reshape(h, w)
    px = ((rng * 37 + 11) % 256).astype(np.uint8)
    payload = mm.encode_png(w, h, px)
    dec = mm.decode_image(payload)
    assert dec["format"] == "png"
    assert (dec["width"], dec["height"]) == (w, h)
    assert dec["bit_depth"] == 8 and dec["color_type"] == 0
    assert (dec["pixels"] == px).all()


def _palette_png(w, h, bit_depth, pal, idx, plte=True):
    import zlib as _z

    stride = -(-w * bit_depth // 8)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter None
        row = bytearray(stride)
        for x in range(w):
            if bit_depth == 8:
                row[x] = idx[y][x]
            else:
                per = 8 // bit_depth
                row[x // per] |= idx[y][x] << (
                    8 - bit_depth * (x % per + 1)
                )
        raw += row
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, 3, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
    if plte:
        out += mm._png_chunk(
            b"PLTE", b"".join(bytes(c) for c in pal)
        )
    out += mm._png_chunk(b"IDAT", _z.compress(bytes(raw)))
    return out + mm._png_chunk(b"IEND", b"")


@pytest.mark.parametrize("bit_depth", [1, 2, 4, 8])
def test_png_palette_decode(bit_depth):
    rng = np.random.RandomState(bit_depth)
    n_colors = min(1 << bit_depth, 9)
    pal = [tuple(int(v) for v in rng.randint(0, 256, 3))
           for _ in range(n_colors)]
    w, h = 11, 5  # odd width exercises the sub-byte padding tail
    idx = rng.randint(0, n_colors, (h, w)).tolist()
    dec = mm.decode_image(_palette_png(w, h, bit_depth, pal, idx))
    assert dec["color_type"] == 3 and dec["bit_depth"] == bit_depth
    want = np.array(pal, np.uint8)[np.array(idx)]
    assert dec["pixels"].shape == (h, w, 3)
    assert np.array_equal(dec["pixels"], want), bit_depth


def test_png_palette_errors():
    pal = [(1, 2, 3)]
    idx = [[0, 0]]
    with pytest.raises(ValueError, match="PLTE"):
        mm.decode_image(_palette_png(2, 1, 8, pal, idx, plte=False))
    # index points past the declared palette
    with pytest.raises(ValueError, match="palette index"):
        mm.decode_image(_palette_png(2, 1, 8, pal, [[0, 1]]))


def test_png_rejects_16bit():
    payload = bytearray(mm.encode_png(2, 2, np.zeros((2, 2), np.uint8)))
    payload[24] = 16  # claim 16-bit depth in IHDR
    with pytest.raises(NotImplementedError):
        mm.decode_image(bytes(payload))


def test_png_header_parse():
    ihdr_body = struct.pack(">IIBBBBB", 640, 480, 8, 6, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr_body
        + b"\x00\x00\x00\x00"  # (fake) CRC — header parse doesn't verify
    )
    dec = mm.decode_image(payload)
    assert dec["format"] == "png"
    assert (dec["width"], dec["height"]) == (640, 480)
    assert dec["bit_depth"] == 8 and dec["color_type"] == 6
    assert dec["pixels"] is None


def test_unknown_formats_raise():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xff\xe0JFIF....")  # JPEG magic
    # FLAC became an in-repo builtin in r9, so the unknown-audio
    # exemplar is now MIDI; fLaC must not raise "unknown" when the
    # builtin is registered, so drop any leaked registration first
    mm.AUDIO_CODECS.pop(b"fLaC", None)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"MThd" + b"\x00" * 32)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"fLaC" + b"\x00" * 32)


def test_media_features_decodes_real_bytes(spark):
    # End-to-end through Spark: synth real files, decode them back, and
    # check a BMP (id%4==0), a PNG (id%4==2), and a WAV (odd) doc
    # against hand math.
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = mm.media_features(mm.synth_media(docs)).toPandas()
    out = out.set_index("doc_id").sort_index()
    assert len(out) == 10

    row = out.loc[4]  # BMP: w=4+4%5=8, h=3+4%4=3
    w, h = 8, 3
    s = sum((4 + x + y) % 256 for x in range(w) for y in range(h))
    assert row["kind"] == "bmp"
    assert (row["width"], row["height"]) == (w, h)
    assert row["feat_milli"] == (1000 * 3 * s) // (3 * w * h)

    row = out.loc[2]  # PNG: w=4+2%5=6, h=3+2%4=5 (filters 0..4)
    w, h = 6, 5
    s = sum((2 + x + y) % 256 for x in range(w) for y in range(h))
    assert row["kind"] == "png"
    assert (row["width"], row["height"]) == (w, h)
    assert row["feat_milli"] == (1000 * s) // (w * h)

    row = out.loc[7]  # WAV: n=64+7%64=71
    n = 71
    sq = sum(((7 * 31 + i * 17) % 2048 - 1024) ** 2 for i in range(n))
    assert row["kind"] == "wav"
    assert row["n_samples"] == n
    assert row["feat_milli"] == (1000 * sq) // n
    assert row["byte_len"] == 44 + 2 * n


def test_resize_nearest_index_math():
    # 4x6 -> 2x3: output (y, x) = source ((y*4)//2, (x*6)//3)
    src = np.arange(24, dtype=np.int64).reshape(4, 6)
    out = mm.resize_nearest(src, out_w=3, out_h=2)
    want = np.array([[src[0, 0], src[0, 2], src[0, 4]],
                     [src[2, 0], src[2, 2], src[2, 4]]])
    assert (out == want).all()
    # upscale repeats neighbors; channel axis rides along
    src3 = np.stack([src, src + 1, src + 2], axis=-1)
    up = mm.resize_nearest(src3, out_w=12, out_h=4)
    assert up.shape == (4, 12, 3)
    assert (up[:, ::2][:, :6] == src3).all()


def test_resize_features_decode_resize_chain(spark):
    # Decode -> nearest resize -> feature through Spark, against hand
    # math replicating the closed-form index mapping for BMP and PNG.
    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = (
        mm.resize_features(mm.synth_media(docs), out_w=4, out_h=4)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 5  # images only; WAVs skipped
    assert set(out["kind"]) == {"bmp", "png"}

    def hand(doc_id):
        w, h = 4 + doc_id % 5, 3 + doc_id % 4
        total = 0
        for y in range(4):
            for x in range(4):
                sy, sx = (y * h) // 4, (x * w) // 4
                total += (doc_id + sx + sy) % 256
        return (1000 * total * (3 if doc_id % 4 == 0 else 1)) // (
            16 * (3 if doc_id % 4 == 0 else 1)
        )

    for doc_id in (0, 2, 4, 6, 8):
        row = out.loc[doc_id]
        assert row["kind"] == ("bmp" if doc_id % 4 == 0 else "png")
        assert row["resized_feat_milli"] == hand(doc_id), doc_id


def test_png_roundtrip_property():
    """Property-based PNG codec roundtrip: random grid sizes and pixel
    contents must survive encode → decode bit-exactly. Catches filter/
    stride/edge bugs (1-pixel rows/cols, all-zero and near-256 values)
    that the fixed-size tests can't."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def roundtrip(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w), dtype=np.int64).astype(
            np.uint8
        )
        dec = mm.decode_image(mm.encode_png(w, h, px))
        assert dec["format"] == "png"
        assert (dec["width"], dec["height"]) == (w, h)
        assert (dec["pixels"] == px).all()

    roundtrip()


def test_wav_roundtrip_property():
    """Property-based WAV roundtrip: random sample counts and values
    (full int16 range, odd/even lengths) survive encode -> decode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    def roundtrip(n, seed, rate):
        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, size=n, dtype=np.int64)
        dec = mm.decode_audio(mm.encode_wav(s, sample_rate=rate))
        assert dec["sample_rate"] == rate
        assert (dec["samples"] == s).all()

    roundtrip()


def test_audio_features_hand_checked(spark):
    import math

    docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    out = (
        mm.audio_features(mm.synth_media(docs))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 5  # odd doc_ids only (WAVs)

    doc_id = 7
    n = 64 + doc_id % 64
    s = [(doc_id * 31 + i * 17) % 2048 - 1024 for i in range(n)]
    sgn = [x for x in (np.sign(s)) if x != 0]
    zc = sum(1 for a, b in zip(sgn, sgn[1:]) if a != b)
    row = out.loc[doc_id]
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == n
    assert row["peak_abs"] == max(abs(x) for x in s)
    assert row["zero_crossings"] == zc
    assert row["rms_milli"] == math.isqrt(
        (1_000_000 * sum(x * x for x in s)) // n
    )


# --- codec plug-in contract (VERDICT r4 #7) --------------------------------

JPEG_MAGIC = b"\xff\xd8\xff"
FLAC_MAGIC = b"fLaC"


def _stub_jpeg_decode(payload: bytes) -> dict:
    """Deterministic fake 'JPEG' codec: 2x3 grid from the payload tail
    bytes — stands in for PIL/libjpeg with a verifiable output."""
    body = payload[len(JPEG_MAGIC):]
    px = np.frombuffer(body[:6], np.uint8).astype(np.int64).reshape(2, 3)
    return {"format": "jpeg", "width": 3, "height": 2, "pixels": px}


def _stub_flac_decode(payload: bytes) -> dict:
    body = payload[len(FLAC_MAGIC):]
    return {
        "format": "flac",
        "sample_rate": 8000,
        "channels": 1,
        "samples": np.frombuffer(body, np.int8).astype(np.int16),
    }


def _register_stub_codecs() -> None:
    """Worker-side setup hook (picklable module-level function)."""
    mm.register_image_codec(JPEG_MAGIC, _stub_jpeg_decode)
    mm.register_audio_codec(FLAC_MAGIC, _stub_flac_decode)


def _unregister_stub_codecs() -> None:
    mm.IMAGE_CODECS.pop(JPEG_MAGIC, None)
    mm.AUDIO_CODECS.pop(FLAC_MAGIC, None)


def test_codec_registry_dispatch_and_validation():
    payload = JPEG_MAGIC + bytes([10, 20, 30, 40, 50, 60])
    try:
        _register_stub_codecs()
        img = mm.decode_image(payload)
        assert img["format"] == "jpeg"
        assert img["pixels"].sum() == 210

        au = mm.decode_audio(FLAC_MAGIC + bytes([1, 2, 3]))
        assert au["format"] == "flac" and au["samples"].tolist() == [1, 2, 3]
        assert mm.is_audio_payload(FLAC_MAGIC + b"x")

        # contract violations fail loudly, naming the missing key
        mm.register_image_codec(b"\x01BAD", lambda p: {"format": "bad"})
        with pytest.raises(ValueError, match="missing keys.*height"):
            mm.decode_image(b"\x01BAD....")
        # shape mismatch is caught too
        mm.register_image_codec(
            b"\x02BAD",
            lambda p: {
                "format": "bad2",
                "width": 9,
                "height": 9,
                "pixels": np.zeros((2, 3), np.uint8),
            },
        )
        with pytest.raises(ValueError, match="shape"):
            mm.decode_image(b"\x02BAD....")
        with pytest.raises(ValueError, match="non-empty bytes"):
            mm.register_image_codec("jpeg", _stub_jpeg_decode)
    finally:
        _unregister_stub_codecs()
        mm.IMAGE_CODECS.pop(b"\x01BAD", None)
        mm.IMAGE_CODECS.pop(b"\x02BAD", None)
    # after unregistration the plug-in point raises again
    with pytest.raises(NotImplementedError, match="register_image_codec"):
        mm.decode_image(payload)


def test_codec_plugin_through_spark_workers(spark):
    """The real distribution test: decode happens in mapInPandas Python
    workers, where a driver-side registration is invisible — the
    codec_setup hook must install the codecs in the worker process."""
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    rows = [
        (1, JPEG_MAGIC + bytes([10, 20, 30, 40, 50, 61])),
        (2, FLAC_MAGIC + bytes([3, 4, 5])),
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
    # without the setup hook the worker has no codec -> job fails.
    # Spark REUSES Python workers across jobs, so a codec an earlier
    # test registered worker-side (e.g. test_jpeg's real decoder)
    # may still be installed — wipe it through the same hook
    # mechanism so this branch is deterministic in any test order.
    def wipe() -> None:
        mm.IMAGE_CODECS.pop(b"\xff\xd8\xff", None)
        mm.AUDIO_CODECS.pop(b"fLaC", None)

    with pytest.raises(Exception, match="register_image_codec|NotImplemented"):
        mm.media_features(df, codec_setup=wipe).collect()

    # nested defs: cloudpickle ships them BY VALUE with the closure —
    # a module-level function of this test file pickles by reference
    # and the worker cannot import it (that's the failure mode the
    # codec_setup contract exists to solve)
    def stub_jpeg(payload: bytes) -> dict:
        body = payload[3:]
        px = (
            np.frombuffer(body[:6], np.uint8).astype(np.int64).reshape(2, 3)
        )
        return {"format": "jpeg", "width": 3, "height": 2, "pixels": px}

    def stub_flac(payload: bytes) -> dict:
        return {
            "format": "flac",
            "sample_rate": 8000,
            "channels": 1,
            "samples": np.frombuffer(payload[4:], np.int8).astype(np.int16),
        }

    def setup() -> None:
        mm.register_image_codec(b"\xff\xd8\xff", stub_jpeg)
        mm.register_audio_codec(b"fLaC", stub_flac)

    out = (
        mm.media_features(df, codec_setup=setup)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    jpeg = out.loc[1]
    assert jpeg["kind"] == "jpeg"
    assert (jpeg["width"], jpeg["height"]) == (3, 2)
    assert jpeg["feat_milli"] == (1000 * (10 + 20 + 30 + 40 + 50 + 61)) // 6
    flac = out.loc[2]
    assert flac["kind"] == "flac"
    assert flac["n_samples"] == 3
    assert flac["feat_milli"] == (1000 * (9 + 16 + 25)) // 3


def test_registered_audio_codec_flows_through_feature_ops(spark):
    """A payload of a REGISTERED audio codec must be routed like WAV by
    every feature operator: audio_features decodes it, resize_features
    skips it (review finding: bare RIFF sniffs crashed/skipped
    registered-codec audio)."""
    import numpy as np

    from timeseries_data_provider_spark.operators import multimodal as mm

    magic = b"tstA"

    def fake_codec(payload: bytes) -> dict:
        return {
            "format": "tsta",
            "sample_rate": 8000,
            "channels": 1,
            "samples": np.array([100, -100, 50], dtype=np.int16),
        }

    def setup():
        # runs INSIDE each worker: registrations live in the worker's
        # module instance, not the driver's
        from timeseries_data_provider_spark.operators import (
            multimodal as wmm,
        )

        wmm.register_audio_codec(magic, fake_codec)

    mm.register_audio_codec(magic, fake_codec)  # driver-side sniffing
    try:
        media = spark.createDataFrame(
            [(1, bytearray(magic + b"xyz"))], ["doc_id", "payload"]
        )
        af = mm.audio_features(media, codec_setup=setup).collect()
        assert len(af) == 1 and af[0]["n_samples"] == 3
        assert af[0]["zero_crossings"] == 2
        rf = mm.resize_features(media, codec_setup=setup).collect()
        assert rf == []  # audio skipped, not crashed
    finally:
        mm.AUDIO_CODECS.pop(magic, None)


def test_webp_header_metadata_decode():
    """WebP container metadata (r6): dims from VP8/VP8L/VP8X chunks,
    header-only contract (pixels None) like truncated-PNG decode."""
    import struct as _struct

    def riff(chunks: bytes) -> bytes:
        return (
            b"RIFF" + _struct.pack("<I", 4 + len(chunks)) + b"WEBP"
            + chunks
        )

    # lossy VP8 keyframe: 3-byte frame tag, sync 9D 01 2A, w/h u16le
    vp8 = b"VP8 " + _struct.pack("<I", 10) + (
        b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + _struct.pack("<HH", 320, 240)
    )
    d = mm.decode_image(riff(vp8))
    assert (d["format"], d["variant"]) == ("webp", "vp8")
    assert (d["width"], d["height"]) == (320, 240)
    assert d["pixels"] is None

    # lossless VP8L: signature 0x2F, then 14-bit (w-1), 14-bit (h-1)
    bits = (99 - 1) | ((77 - 1) << 14)
    vp8l = b"VP8L" + _struct.pack("<I", 5) + bytes([0x2F]) + _struct.pack(
        "<I", bits
    )
    d = mm.decode_image(riff(vp8l))
    assert (d["width"], d["height"], d["variant"]) == (99, 77, "vp8l")

    # extended VP8X: 24-bit (w-1)/(h-1) canvas
    vp8x = b"VP8X" + _struct.pack("<I", 10) + (
        b"\x00" * 4
        + (512 - 1).to_bytes(3, "little")
        + (384 - 1).to_bytes(3, "little")
    )
    d = mm.decode_image(riff(vp8x))
    assert (d["width"], d["height"], d["variant"]) == (512, 384, "vp8x")

    # malformed: named errors
    badsync = b"VP8 " + _struct.pack("<I", 10) + b"\x00" * 10
    with pytest.raises(ValueError, match="sync"):
        mm.decode_image(riff(badsync))
    with pytest.raises(ValueError, match="no VP8"):
        mm.decode_image(riff(b""))
    # WebP is NOT routed to the audio path despite the RIFF magic
    assert not mm.is_audio_payload(riff(vp8))

    # ADVICE r6: a registered full-decode WebP plug-in keyed on the
    # RIFF magic WINS over the built-in header-only decode — the old
    # order silently shadowed registrants and media_features raised
    # ValueError ('decoded to metadata only') on their payloads.
    def full_webp(payload: bytes) -> dict:
        return {
            "format": "webp",
            "width": 2,
            "height": 1,
            "pixels": np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8),
        }

    try:
        mm.register_image_codec(b"RIFF", full_webp)
        d = mm.decode_image(riff(vp8))
        assert d["pixels"] is not None and d["pixels"].shape == (1, 2, 3)
    finally:
        mm.IMAGE_CODECS.pop(b"RIFF", None)
    # with no registrant the built-in header decode still answers
    assert mm.decode_image(riff(vp8))["pixels"] is None
