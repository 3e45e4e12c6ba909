"""operators/aes — FIPS 197 from scratch (stdlib+numpy), consumed by
the PDF standard security handler's AES revisions.

The cipher tables are DERIVED at import from GF(2^8) arithmetic, so
these tests pin the implementation against the published FIPS 197
appendix vectors first, then prove the scalar and numpy-vectorized
paths agree, then the CBC/ECB/PKCS#7 layers.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators import aes

# FIPS 197 Appendix C (example vectors) and Appendix B (the worked
# cipher example) — public test vectors, transcribed from the spec.
_VEC_128 = (
    bytes(range(16)),
    bytes.fromhex("00112233445566778899aabbccddeeff"),
    bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"),
)
_VEC_256 = (
    bytes(range(32)),
    bytes.fromhex("00112233445566778899aabbccddeeff"),
    bytes.fromhex("8ea2b7ca516745bfeafc49904b496089"),
)
_VEC_B = (
    bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c"),
    bytes.fromhex("3243f6a8885a308d313198a2e0370734"),
    bytes.fromhex("3925841d02dc09fbdc118597196a0b32"),
)


@pytest.mark.parametrize("key,pt,ct", [_VEC_128, _VEC_256, _VEC_B])
def test_fips197_appendix_vectors(key, pt, ct):
    rks = aes.expand_key(key)
    assert aes.encrypt_block(rks, pt) == ct
    assert aes.decrypt_block(rks, ct) == pt


def test_key_expansion_first_last_round_keys():
    # FIPS 197 Appendix A.1: the 128-bit expansion of the Appendix B
    # key — first round key is the key itself; w[40..43] pinned.
    rks = aes.expand_key(_VEC_B[0])
    assert rks[0] == _VEC_B[0]
    assert rks[10] == bytes.fromhex("d014f9a8c9ee2589e13f0cc8b6630ca6")
    assert len(rks) == 11
    assert len(aes.expand_key(bytes(32))) == 15


def test_bad_key_length_loud():
    with pytest.raises(ValueError, match="key length"):
        aes.expand_key(bytes(24))  # 192-bit: not a PDF size


def test_ecb_roundtrip_and_alignment_guard():
    key = bytes(range(16))
    data = bytes(range(48))
    ct = aes.ecb_encrypt(key, data)
    assert aes.ecb_decrypt(key, ct) == data
    with pytest.raises(ValueError, match="block-aligned"):
        aes.ecb_encrypt(key, b"x" * 15)
    with pytest.raises(ValueError, match="block-aligned"):
        aes.ecb_decrypt(key, b"x" * 17)


def test_cbc_roundtrip_padded_and_exact():
    key, iv = bytes(range(16)), bytes(range(100, 116))
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes((i * 7) & 0xFF for i in range(n))
        ct = aes.cbc_encrypt(key, iv, data, pad=True)
        assert len(ct) % 16 == 0 and len(ct) > len(data)
        assert aes.cbc_decrypt(key, iv + ct) == data
    # exact-block mode (the V5 /UE layout): no pad, unpad=False
    blob = bytes(range(32))
    ct = aes.cbc_encrypt(key, iv, blob)
    assert aes.cbc_decrypt(key, iv + ct, unpad=False) == blob


def test_cbc_malformed_padding_tolerated():
    # §7.6.2 note: real files carry broken padding; a bad final byte
    # must strip nothing rather than raise or over-strip
    key, iv = bytes(16), bytes(16)
    pt = bytes(15) + b"\x99"  # 0x99 is not a legal pad count
    ct = aes.cbc_encrypt(key, iv, pt)
    assert aes.cbc_decrypt(key, iv + ct) == pt


def test_cbc_payload_shape_guards():
    with pytest.raises(ValueError, match="CBC payload"):
        aes.cbc_decrypt(bytes(16), bytes(16))  # IV only
    with pytest.raises(ValueError, match="CBC payload"):
        aes.cbc_decrypt(bytes(16), bytes(33))  # misaligned


@settings(max_examples=25, deadline=None)
@given(
    key=st.binary(min_size=16, max_size=16)
    | st.binary(min_size=32, max_size=32),
    data=st.binary(min_size=0, max_size=200),
    iv=st.binary(min_size=16, max_size=16),
)
def test_property_cbc_roundtrip(key, data, iv):
    ct = aes.cbc_encrypt(key, iv, data, pad=True)
    assert aes.cbc_decrypt(key, iv + ct) == data


@settings(max_examples=25, deadline=None)
@given(
    key=st.binary(min_size=16, max_size=16)
    | st.binary(min_size=32, max_size=32),
    blocks=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_property_scalar_vs_vectorized_parity(key, blocks, seed):
    # the numpy InvCipher must agree with the scalar forward cipher:
    # encrypt block-by-block, decrypt as one vectorized ECB batch
    import numpy as np

    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=16 * blocks, dtype=np.uint8)
    rks = aes.expand_key(key)
    ct = b"".join(
        aes.encrypt_block(rks, data[i : i + 16].tobytes())
        for i in range(0, len(data), 16)
    )
    assert aes.ecb_decrypt(key, ct) == data.tobytes()
