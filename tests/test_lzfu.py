"""Compressed RTF / LZFu ([MS-OXRTFCP]) — sources/lzfu.py and its
msg.py integration. The decoder is validated against the SPEC'S OWN
worked examples (§3), which exercise the pre-seeded dictionary, the
end marker, and the self-referencing-run copy — independent
cross-validation in the CCITT/JDK sense (the vectors were produced
by Microsoft, not by this repo's encoder)."""

from __future__ import annotations

import struct

import pytest

from timeseries_data_provider_spark.sources import lzfu, msg, rtf

# [MS-OXRTFCP] §3.1: dictionary-reference-heavy document
SPEC_V1 = bytes.fromhex(
    "2d0000002b0000004c5a4675f1c5c7a7"
    "03000a007263706731323542320af320"
    "68656c090020627705b06c647d0a800f"
    "a0"
)
SPEC_V1_RAW = b"{\\rtf1\\ansi\\ansicpg1252\\pard hello world}\r\n"
# §3.2: the WXYZ self-referencing run (a reference that reads bytes
# it is itself writing — the byte-at-a-time copy semantics)
SPEC_V2 = bytes.fromhex(
    "1a0000001c0000004c5a4675e2d44b51"
    "410004205758595a0d6e7d010eb0"
)
SPEC_V2_RAW = b"{\\rtf1 WXYZWXYZWXYZWXYZWXYZ}"


def test_spec_vectors_decode_exactly():
    assert lzfu.lzfu_decompress(SPEC_V1) == SPEC_V1_RAW
    assert lzfu.lzfu_decompress(SPEC_V2) == SPEC_V2_RAW


def test_init_dict_is_207_bytes():
    assert len(lzfu.INIT_DICT) == 207
    assert lzfu.INIT_DICT.startswith(b"{\\rtf1\\ansi\\mac")
    assert lzfu.INIT_DICT.endswith(b"\\tab\\tx")


@pytest.mark.parametrize("mode", ["lzfu", "mela"])
def test_roundtrip_matrix(mode):
    import random

    random.seed(11)
    samples = [
        b"",
        b"{\\rtf1\\ansi Hello body.\\par }",
        b"hello " * 100,
        bytes(range(256)) * 3,
        bytes(random.randrange(256) for _ in range(5000)),
        # long enough to wrap the 4096-byte circular dictionary
        b"{\\rtf1 " + b"wrap the circular dictionary " * 400 + b"}",
    ]
    for s in samples:
        assert (
            lzfu.lzfu_decompress(lzfu.lzfu_compress(s, mode)) == s
        ), (mode, len(s))


def test_compression_uses_the_seeded_dictionary():
    # the boilerplate header is IN the initial dictionary, so a
    # realistic document must compress below raw size
    raw = rtf.encode_rtf(["Some ordinary paragraph of text."] * 5)
    comp = lzfu.lzfu_compress(raw)
    assert len(comp) < len(raw)


def test_hostile_inputs_named_errors():
    good = lzfu.lzfu_compress(b"{\\rtf1 x}")
    with pytest.raises(ValueError, match="truncated header"):
        lzfu.lzfu_decompress(good[:10])
    with pytest.raises(ValueError, match="COMPSIZE"):
        lzfu.lzfu_decompress(good[:20])
    bad_crc = bytearray(good)
    bad_crc[12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        lzfu.lzfu_decompress(bytes(bad_crc))
    bad_type = bytearray(good)
    struct.pack_into("<I", bad_type, 8, 0x12345678)
    with pytest.raises(ValueError, match="COMPTYPE"):
        lzfu.lzfu_decompress(bytes(bad_type))
    huge = bytearray(good)
    struct.pack_into("<I", huge, 4, 1 << 30)
    with pytest.raises(ValueError, match="RAWSIZE"):
        lzfu.lzfu_decompress(bytes(huge))
    # payload cut mid-stream: end marker never arrives
    cut = bytearray(good[: len(good) - 2])
    struct.pack_into("<I", cut, 0, len(cut) - 4)
    struct.pack_into(
        "<I", cut, 12, lzfu._crc(bytes(cut[16:]))
    )
    with pytest.raises(ValueError, match="truncated|end marker"):
        lzfu.lzfu_decompress(bytes(cut))
    # MELA with nonzero CRC violates the MUST
    mela = bytearray(lzfu.lzfu_compress(b"abc", "mela"))
    struct.pack_into("<I", mela, 12, 7)
    with pytest.raises(ValueError, match="MELA"):
        lzfu.lzfu_decompress(bytes(mela))


def test_msg_rtf_only_body_extracts():
    # the r11 named gap: an Outlook message whose body exists ONLY
    # as PR_RTF_COMPRESSED now extracts; text matches the
    # plain-bodied twin exactly
    body = "First line of the memo.\r\nSecond line — naïve text."
    plain = msg.msg_text(msg.encode_msg("Subj", body))
    rtfed = msg.msg_text(
        msg.encode_msg("Subj", body, rtf_body=True)
    )
    assert rtfed["text"] == plain["text"]
    assert rtfed["subject"] == "Subj"
    # and the container really has no plain body stream
    blob = msg.encode_msg("Subj", body, rtf_body=True)
    from timeseries_data_provider_spark.sources import cfb

    names = [n for n, _ in cfb.cfb_streams(blob)]
    assert not any("_1000001F" in n for n in names)
    assert any("_10090102" in n for n in names)


def test_msg_damaged_lzfu_stays_loud_or_quarantines(spark):
    blob = bytearray(msg.encode_msg("S", "body", rtf_body=True))
    # flip a byte inside the compressed payload (CRC catches it)
    at = bytes(blob).find(b"LZFu") + 8
    blob[at] ^= 0xFF
    with pytest.raises(ValueError, match="lzfu"):
        msg.msg_text(bytes(blob))
    df = spark.createDataFrame(
        [(1, bytes(blob)), (2, msg.encode_msg("S2", "ok", rtf_body=True))],
        "doc_id long, payload binary",
    )
    out = msg.msg_features(df, errors="quarantine").collect()
    bad = [r for r in out if r["err_class"] is not None]
    ok = [r for r in out if r["err_class"] is None]
    assert [r["doc_id"] for r in bad] == [1]
    assert "lzfu" in bad[0]["err_msg"]
    assert [r["doc_id"] for r in ok] == [2] and ok[0]["text"] == "ok"


def test_roundtrip_past_dictionary_wrap():
    # r12 review finding (confirmed repro): once the 4,096-byte
    # circular dictionary wrapped, the greedy matcher could anchor a
    # match ON the write head — offset == wh IS the end marker, so
    # the decoder silently truncated; the adjacent anchor read a
    # stale byte. Any body past ~3.9 KB was affected.
    import numpy as np

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "the", "quick"]
    big = " ".join(rng.choice(words, 6000)).encode()
    assert len(big) > 8 * 4096
    assert lzfu.lzfu_decompress(lzfu.lzfu_compress(big)) == big
    # literal-heavy (random) and reference-heavy (repetitive) shapes
    rand = bytes(rng.integers(0, 256, 20000, dtype=np.uint8))
    assert lzfu.lzfu_decompress(lzfu.lzfu_compress(rand)) == rand
    rep = b"{\\rtf1 abcabcabc}" * 3000
    assert lzfu.lzfu_decompress(lzfu.lzfu_compress(rep)) == rep
