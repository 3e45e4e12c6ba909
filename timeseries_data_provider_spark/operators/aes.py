"""AES (FIPS 197) — stdlib+numpy, for the PDF standard security
handler's AES-era revisions (operators/pdf: /AESV2, /AESV3).

The container ships no crypto library beyond hashlib, so the cipher
is implemented from the public FIPS 197 specification. Two shapes:

* ``encrypt_block``/``cbc_encrypt`` — scalar Python. Used by the
  fixture writer and by ISO 32000-2's Algorithm 2.B key-derivation
  hardening loop, both of which touch kilobytes, not corpora.
* ``cbc_decrypt`` — numpy-VECTORIZED across blocks. CBC decryption
  has no chaining dependency (P_i = D(C_i) xor C_{i-1}; every D runs
  independently), so the whole stream decrypts as (n, 16) array ops:
  table-lookup InvSubBytes, a precomputed InvShiftRows permutation,
  and GF(2^8) multiply tables for InvMixColumns. This keeps the
  decode tier array-at-a-time under Arrow fan-out — the same posture
  as the other codecs — instead of a per-byte Python loop.

All tables are DERIVED at import from the field arithmetic (exp/log
over GF(2^8), the affine transform) rather than transcribed, and
pinned against the FIPS 197 appendix vectors in tests/test_aes.py.

Scale shape: per-row independent; no Spark surface of its own (a
cipher, not an operator) — consumed by pdf.py's mapInPandas tier.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "expand_key",
    "encrypt_block",
    "decrypt_block",
    "ecb_encrypt",
    "ecb_decrypt",
    "cbc_encrypt",
    "cbc_decrypt",
]

# -- GF(2^8) tables, derived ------------------------------------------

_EXP = [0] * 510
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    # multiply by the generator 0x03 = x * 2 ^ x
    _x ^= ((_x << 1) ^ (0x1B if _x & 0x80 else 0)) & 0xFF
for _i in range(255, 510):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


_SBOX = [0] * 256
_INV_SBOX = [0] * 256
for _i in range(256):
    _c = 0 if _i == 0 else _EXP[255 - _LOG[_i]]  # mult. inverse
    _b, _r = _c, _c
    for _ in range(4):  # affine transform
        _r = ((_r << 1) | (_r >> 7)) & 0xFF
        _b ^= _r
    _b ^= 0x63
    _SBOX[_i] = _b
    _INV_SBOX[_b] = _i

_RCON = [0] * 11
_v = 1
for _i in range(1, 11):
    _RCON[_i] = _v
    _v = _gmul(_v, 2)

# numpy lookup tables for the vectorized inverse cipher
_NP_INV_SBOX = np.array(_INV_SBOX, dtype=np.uint8)
_NP_MUL = {
    m: np.array([_gmul(b, m) for b in range(256)], dtype=np.uint8)
    for m in (9, 11, 13, 14)
}
# InvShiftRows as a flat permutation: new[r + 4c] = old[r + 4((c-r)%4)]
_INV_SHIFT = np.array(
    [(r + 4 * ((c - r) % 4)) for c in range(4) for r in range(4)],
    dtype=np.intp,
)


def expand_key(key: bytes) -> list[bytes]:
    """FIPS 197 §5.2: round keys as (Nr+1) 16-byte chunks; 128- and
    256-bit keys (the two sizes PDF uses)."""
    nk = len(key) // 4
    if len(key) not in (16, 32):
        raise ValueError(f"aes: key length {len(key)}")
    nr = 10 if nk == 4 else 14
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk == 8 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [
        bytes(b for word in w[4 * r : 4 * r + 4] for b in word)
        for r in range(nr + 1)
    ]


def _mix_column(col: list[int]) -> list[int]:
    a0, a1, a2, a3 = col
    return [
        _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3,
        a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3,
        a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3),
        _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2),
    ]


def encrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """Scalar forward cipher (§5.1) — fixture writer + KDF sizes."""
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    nr = len(round_keys) - 1
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows: new[r + 4c] = old[r + 4((c + r) % 4)]
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < nr:
            out = []
            for c in range(4):
                out += _mix_column(s[4 * c : 4 * c + 4])
            s = out
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
    return bytes(s)


def decrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """Scalar inverse cipher — kept for parity tests; bulk decryption
    goes through the vectorized ``cbc_decrypt``."""
    out = cbc_decrypt_raw(
        b"".join(round_keys), np.frombuffer(block, np.uint8)
    )
    return out.tobytes()


def cbc_decrypt_raw(keyblob: bytes, blocks: np.ndarray) -> np.ndarray:
    """Vectorized InvCipher over an (n*16,) uint8 array of ECB blocks
    (no chaining applied here). ``keyblob`` is the concatenated round
    keys from ``expand_key``."""
    nrk = len(keyblob) // 16
    rks = [
        np.frombuffer(keyblob[16 * r : 16 * r + 16], np.uint8)
        for r in range(nrk)
    ]
    nr = nrk - 1
    s = blocks.reshape(-1, 16).copy()
    s ^= rks[nr]
    for rnd in range(nr - 1, -1, -1):
        s = s[:, _INV_SHIFT]  # InvShiftRows
        s = _NP_INV_SBOX[s]  # InvSubBytes
        s ^= rks[rnd]
        if rnd > 0:  # InvMixColumns (equivalent-order form)
            t = s.reshape(-1, 4, 4)
            a0, a1, a2, a3 = (
                t[:, :, 0],
                t[:, :, 1],
                t[:, :, 2],
                t[:, :, 3],
            )
            m = _NP_MUL
            b0 = m[14][a0] ^ m[11][a1] ^ m[13][a2] ^ m[9][a3]
            b1 = m[9][a0] ^ m[14][a1] ^ m[11][a2] ^ m[13][a3]
            b2 = m[13][a0] ^ m[9][a1] ^ m[14][a2] ^ m[11][a3]
            b3 = m[11][a0] ^ m[13][a1] ^ m[9][a2] ^ m[14][a3]
            s = np.stack([b0, b1, b2, b3], axis=2).reshape(-1, 16)
    return s


def ecb_encrypt(key: bytes, data: bytes) -> bytes:
    """ECB over exact blocks (PDF's /Perms entry is one block)."""
    if len(data) % 16:
        raise ValueError("aes: ECB data not block-aligned")
    rks = expand_key(key)
    return b"".join(
        encrypt_block(rks, data[i : i + 16])
        for i in range(0, len(data), 16)
    )


def ecb_decrypt(key: bytes, data: bytes) -> bytes:
    """ECB inverse over exact blocks (the /Perms verification)."""
    if len(data) % 16:
        raise ValueError("aes: ECB data not block-aligned")
    keyblob = b"".join(expand_key(key))
    return cbc_decrypt_raw(
        keyblob, np.frombuffer(data, np.uint8)
    ).tobytes()


def cbc_encrypt(
    key: bytes, iv: bytes, data: bytes, pad: bool = False
) -> bytes:
    """CBC encrypt (sequential by definition — fixture/KDF sizes).
    ``pad=True`` applies PKCS#7 (always adds 1..16 bytes)."""
    if pad:
        k = 16 - len(data) % 16
        data = data + bytes([k] * k)
    if len(data) % 16:
        raise ValueError("aes: CBC data not block-aligned")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(
            a ^ b for a, b in zip(data[i : i + 16], prev)
        )
        prev = encrypt_block(rks, blk)
        out += prev
    return bytes(out)


def cbc_decrypt(
    key: bytes, iv_and_data: bytes, unpad: bool = True
) -> bytes:
    """CBC decrypt where the FIRST 16 bytes are the IV (the PDF
    string/stream layout). Vectorized: every block's inverse cipher
    runs at once; the chain XOR is one shifted-array op. ``unpad``
    strips PKCS#7 (tolerating the malformed-padding blobs real
    files contain — a bad pad byte strips nothing, §7.6.2 note)."""
    if len(iv_and_data) < 32 or len(iv_and_data) % 16:
        raise ValueError(
            f"aes: CBC payload of {len(iv_and_data)} bytes"
        )
    arr = np.frombuffer(iv_and_data, np.uint8)
    keyblob = b"".join(expand_key(key))
    plain = cbc_decrypt_raw(keyblob, arr[16:])
    prev = arr[:-16].reshape(-1, 16)  # IV + all but last cipher block
    plain ^= prev
    out = plain.tobytes()
    if unpad and out:
        k = out[-1]
        if 1 <= k <= 16 and out[-k:] == bytes([k] * k):
            out = out[:-k]
    return out
