"""Encrypted OOXML ([MS-OFFCRYPTO]) — Standard and Agile schemes.

An encrypted Office 2007+ document is NOT a ZIP: it is an OLE2/CFB
container holding ``EncryptionInfo`` (the scheme descriptor) and
``EncryptedPackage`` (8-byte plaintext size + the encrypted ZIP).
Two schemes cover the real corpus:

* **Standard** (Office 2007; EncryptionInfo version 3.2/4.2 binary
  header): SHA-1 key derivation with 50,000 iterations, AES in ECB
  (the spec's own choice), verifier = AES(random16) with its SHA-1
  hash.
* **Agile** (Office 2010+; version 4.4, XML descriptor): per-scheme
  hash (SHA-1/256/384/512), spin-count iterations, AES-CBC with
  block-key-flavored final hashes; the package decrypts in
  4096-byte segments whose IVs are Hash(keyData salt + LE32(i)).

Passwords: the module tries the EMPTY password and Excel's
documented default ``VelvetSweatshop`` (files encrypted with it
open transparently in Excel — the common crawl case of
"encrypted" workbooks nobody ever typed a password for), plus any
caller-supplied candidates. A real user password raises the named
error — those documents are genuinely unreadable, and a pipeline
routes them to a quarantine sink (``errors='quarantine'``).

Public-knowledge basis: [MS-OFFCRYPTO] v20240423 (open spec).
Reference parity: index.js has no document surface; [EXT] SURVEY
§2 (VERDICT r11 missing item 6 / office.py named gap).
"""

from __future__ import annotations

import base64
import hashlib
import re
import struct
from xml.etree import ElementTree as ET

from timeseries_data_provider_spark.operators import aes as _aes
from timeseries_data_provider_spark.sources import cfb as _cfb

__all__ = [
    "decrypt_ooxml",
    "encrypt_ooxml",
    "decrypt_xls_workbook",
    "encrypt_xls_workbook",
    "DEFAULT_PASSWORDS",
]

DEFAULT_PASSWORDS = ("", "VelvetSweatshop")

_SEGMENT = 4096
_BLOCK_VHI = bytes([0xFE, 0xA7, 0xD2, 0x76, 0x3B, 0x4B, 0x9E, 0x79])
_BLOCK_VHV = bytes([0xD7, 0xAA, 0x0F, 0x6D, 0x30, 0x61, 0x34, 0x4E])
_BLOCK_KEY = bytes([0x14, 0x6E, 0x0B, 0xE7, 0xAB, 0xAC, 0xD0, 0xD6])

_HASHES = {
    "SHA1": hashlib.sha1,
    "SHA256": hashlib.sha256,
    "SHA384": hashlib.sha384,
    "SHA512": hashlib.sha512,
}


def _std_derive_key(password: str, salt: bytes, key_bytes: int) -> bytes:
    """Standard-scheme key derivation (2.3.4.7): 50,000 chained
    SHA-1 rounds over the UTF-16LE password, block 0, then the
    0x36-pad derivation."""
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50_000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    x1 = hashlib.sha1(
        bytes(0x36 ^ b for b in h.ljust(64, b"\x00"))
    ).digest()
    if key_bytes <= len(x1):
        return x1[:key_bytes]
    x2 = hashlib.sha1(
        bytes(0x5C ^ b for b in h.ljust(64, b"\x00"))
    ).digest()
    return (x1 + x2)[:key_bytes]


def _agile_pwd_hash(
    password: str, salt: bytes, spin: int, hash_name: str
) -> bytes:
    H = _HASHES[hash_name]
    h = H(salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = H(struct.pack("<I", i) + h).digest()
    return h

def _agile_block_key(
    pwd_hash: bytes, block: bytes, hash_name: str, key_bytes: int
) -> bytes:
    k = _HASHES[hash_name](pwd_hash + block).digest()
    return k.ljust(key_bytes, b"\x36")[:key_bytes]


def _cbc(key: bytes, iv: bytes, data: bytes, decrypt: bool) -> bytes:
    if decrypt:
        return _aes.cbc_decrypt(key, iv + data, unpad=False)
    return _aes.cbc_encrypt(key, iv, data, pad=False)


def _parse_agile_xml(xml: bytes) -> dict:
    if re.search(rb"<!DOCTYPE", xml, re.IGNORECASE):
        raise ValueError("offcrypto: DOCTYPE in EncryptionInfo")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise ValueError(f"offcrypto: bad agile XML: {e}") from e

    def local(el):
        return el.tag.rsplit("}", 1)[-1]

    key_data = enc_key = None
    for el in root.iter():
        if local(el) == "keyData":
            key_data = el.attrib
        elif local(el) == "encryptedKey":
            enc_key = el.attrib
    if key_data is None or enc_key is None:
        raise ValueError(
            "offcrypto: agile descriptor missing keyData/encryptedKey"
        )

    def field(d, name):
        for k, v in d.items():
            if k.rsplit("}", 1)[-1] == name:
                return v
        raise ValueError(f"offcrypto: agile field {name} missing")

    out = {}
    for tag, d in (("kd", key_data), ("ek", enc_key)):
        out[tag] = {
            "salt": base64.b64decode(field(d, "saltValue")),
            "hash": field(d, "hashAlgorithm").upper().replace("-", ""),
            "key_bytes": int(field(d, "keyBits")) // 8,
            "block": int(field(d, "blockSize")),
            "cipher": field(d, "cipherAlgorithm"),
            "chain": field(d, "cipherChaining"),
        }
        if out[tag]["cipher"] != "AES":
            raise NotImplementedError(
                f"offcrypto: cipher {out[tag]['cipher']}"
            )
        if out[tag]["chain"] != "ChainingModeCBC":
            raise NotImplementedError(
                f"offcrypto: chaining {out[tag]['chain']}"
            )
        if out[tag]["hash"] not in _HASHES:
            raise NotImplementedError(
                f"offcrypto: hash {out[tag]['hash']}"
            )
    out["spin"] = int(field(enc_key, "spinCount"))
    if out["spin"] > 10_000_000:
        raise ValueError("offcrypto: implausible spinCount")
    out["vhi"] = base64.b64decode(
        field(enc_key, "encryptedVerifierHashInput")
    )
    out["vhv"] = base64.b64decode(
        field(enc_key, "encryptedVerifierHashValue")
    )
    out["ekv"] = base64.b64decode(
        field(enc_key, "encryptedKeyValue")
    )
    return out


def _decrypt_agile(
    info_xml: bytes, package: bytes, passwords
) -> bytes:
    a = _parse_agile_xml(info_xml)
    ek, kd = a["ek"], a["kd"]
    iv0 = ek["salt"].ljust(ek["block"], b"\x36")[: ek["block"]]
    for pw in passwords:
        ph = _agile_pwd_hash(pw, ek["salt"], a["spin"], ek["hash"])
        k_vhi = _agile_block_key(
            ph, _BLOCK_VHI, ek["hash"], ek["key_bytes"]
        )
        vin = _cbc(k_vhi, iv0, a["vhi"], decrypt=True)[
            : len(ek["salt"])
        ]
        k_vhv = _agile_block_key(
            ph, _BLOCK_VHV, ek["hash"], ek["key_bytes"]
        )
        want = _cbc(k_vhv, iv0, a["vhv"], decrypt=True)
        got = _HASHES[ek["hash"]](vin).digest()
        if got != want[: len(got)]:
            continue
        k_kv = _agile_block_key(
            ph, _BLOCK_KEY, ek["hash"], ek["key_bytes"]
        )
        package_key = _cbc(k_kv, iv0, a["ekv"], decrypt=True)[
            : kd["key_bytes"]
        ]
        (size,) = struct.unpack("<Q", package[:8])
        body = package[8:]
        out = bytearray()
        H = _HASHES[kd["hash"]]
        for seg in range(0, len(body), _SEGMENT):
            chunk = body[seg : seg + _SEGMENT]
            if len(chunk) % 16:
                chunk = chunk.ljust(
                    (len(chunk) + 15) // 16 * 16, b"\x00"
                )
            iv = H(
                kd["salt"] + struct.pack("<I", seg // _SEGMENT)
            ).digest()[: kd["block"]]
            out += _cbc(package_key, iv, chunk, decrypt=True)
        if size > len(out):
            raise ValueError(
                "offcrypto: declared size exceeds package"
            )
        return bytes(out[:size])
    raise NotImplementedError(
        "offcrypto: encrypted OOXML (password required — tried "
        f"{len(tuple(passwords))} candidates)"
    )


def _decrypt_standard(
    info: bytes, package: bytes, passwords
) -> bytes:
    if len(info) < 12:
        raise ValueError("offcrypto: truncated EncryptionInfo")
    (hdr_flags, hdr_size) = struct.unpack_from("<II", info, 0)
    hdr = info[8 : 8 + hdr_size]
    if len(hdr) < 32:
        raise ValueError("offcrypto: truncated EncryptionHeader")
    alg_id, alg_hash, key_bits = struct.unpack_from("<III", hdr, 8)
    if alg_id not in (0x660E, 0x660F, 0x6610):
        raise NotImplementedError(
            f"offcrypto: standard AlgID 0x{alg_id:x} (AES only)"
        )
    if alg_hash != 0x8004:
        raise NotImplementedError(
            f"offcrypto: standard hash 0x{alg_hash:x} (SHA-1 only)"
        )
    key_bytes = key_bits // 8
    if key_bytes == 24:
        raise NotImplementedError(
            "offcrypto: AES-192 (cipher supports 128/256)"
        )
    ver = info[8 + hdr_size :]
    if len(ver) < 4:
        raise ValueError("offcrypto: truncated EncryptionVerifier")
    (salt_size,) = struct.unpack_from("<I", ver, 0)
    if salt_size != 16 or len(ver) < 4 + 16 + 16 + 4 + 32:
        raise ValueError("offcrypto: malformed verifier block")
    salt = ver[4:20]
    enc_verifier = ver[20:36]
    (vh_size,) = struct.unpack_from("<I", ver, 36)
    enc_vhash = ver[40:72]
    for pw in passwords:
        key = _std_derive_key(pw, salt, key_bytes)
        v = _aes.ecb_decrypt(key, enc_verifier)
        vh = _aes.ecb_decrypt(key, enc_vhash)
        if hashlib.sha1(v).digest()[:vh_size] == vh[:vh_size]:
            (size,) = struct.unpack("<Q", package[:8])
            body = package[8:]
            if len(body) % 16:
                body = body[: len(body) // 16 * 16]
            out = _aes.ecb_decrypt(key, body)
            if size > len(out):
                raise ValueError(
                    "offcrypto: declared size exceeds package"
                )
            return out[:size]
    raise NotImplementedError(
        "offcrypto: encrypted OOXML (password required — tried "
        f"{len(tuple(passwords))} candidates)"
    )


def decrypt_ooxml(
    blob: bytes, passwords: tuple[str, ...] = DEFAULT_PASSWORDS
) -> bytes:
    """Decrypt an encrypted-OOXML CFB container to the plaintext ZIP
    package. Raises the named NotImplementedError when no candidate
    password verifies (a REAL password) and ValueError on damage."""
    streams = dict(_cfb.cfb_streams(blob))
    info = streams.get("EncryptionInfo")
    package = streams.get("EncryptedPackage")
    if info is None or package is None:
        raise ValueError(
            "offcrypto: container carries no EncryptionInfo/"
            "EncryptedPackage streams"
        )
    if len(info) < 8 or len(package) < 8:
        raise ValueError("offcrypto: truncated encryption streams")
    major, minor = struct.unpack_from("<HH", info, 0)
    if (major, minor) == (4, 4):
        return _decrypt_agile(info[8:], package, passwords)
    if minor == 2 and major in (2, 3, 4):
        return _decrypt_standard(info[4:], package, passwords)
    if minor == 3:
        raise NotImplementedError(
            "offcrypto: extensible encryption (version x.3)"
        )
    raise ValueError(
        f"offcrypto: unknown EncryptionInfo version {major}.{minor}"
    )


def encrypt_ooxml(
    zip_bytes: bytes, password: str = "", scheme: str = "agile"
) -> bytes:
    """Fixture writer: wrap a plaintext OOXML ZIP in an encrypted
    CFB container. ``scheme``: 'agile' (SHA-512/AES-128-CBC, spin
    10k — small for test speed, real writers use 100k) or
    'standard' (SHA-1/AES-128-ECB)."""
    import hashlib as _h

    salt = _h.sha1(b"fixture-salt" + zip_bytes[:16]).digest()[:16]
    if scheme == "standard":
        key = _std_derive_key(password, salt, 16)
        verifier = _h.sha1(b"fixture-verifier" + salt).digest()[:16]
        vhash = _h.sha1(verifier).digest()
        csp = "Microsoft Enhanced RSA and AES Cryptographic Provider"
        hdr = (
            struct.pack("<IIIIIIII", 0x24, 0, 0x660E, 0x8004, 128,
                        0x18, 0, 0)
            + csp.encode("utf-16-le")
            + b"\x00\x00"
        )
        ver = (
            struct.pack("<I", 16)
            + salt
            + _aes.ecb_encrypt(key, verifier)
            + struct.pack("<I", 20)
            + _aes.ecb_encrypt(key, vhash.ljust(32, b"\x00"))
        )
        info = (
            struct.pack("<HHI", 4, 2, 0x24)
            + struct.pack("<I", len(hdr))
            + hdr
            + ver
        )
        body = zip_bytes
        if len(body) % 16:
            body = body.ljust((len(body) + 15) // 16 * 16, b"\x00")
        package = struct.pack("<Q", len(zip_bytes)) + _aes.ecb_encrypt(
            key, body
        )
    elif scheme == "agile":
        spin = 10_000
        hname = "SHA512"
        H = _HASHES[hname]
        kd_salt = _h.sha1(b"fixture-kd" + salt).digest()[:16]
        ph = _agile_pwd_hash(password, salt, spin, hname)
        iv0 = salt
        verifier = _h.sha1(b"fixture-vin" + salt).digest()[:16]
        k_vhi = _agile_block_key(ph, _BLOCK_VHI, hname, 16)
        vhi = _cbc(k_vhi, iv0, verifier, decrypt=False)
        k_vhv = _agile_block_key(ph, _BLOCK_VHV, hname, 16)
        vh = H(verifier).digest()
        vhv = _cbc(
            k_vhv, iv0, vh.ljust((len(vh) + 15) // 16 * 16, b"\x00"),
            decrypt=False,
        )
        package_key = _h.sha256(b"fixture-key" + salt).digest()[:16]
        k_kv = _agile_block_key(ph, _BLOCK_KEY, hname, 16)
        ekv = _cbc(k_kv, iv0, package_key, decrypt=False)
        b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
        info_xml = (
            '<encryption xmlns="http://schemas.microsoft.com/office/'
            '2006/encryption" xmlns:p="http://schemas.microsoft.com/'
            'office/2006/keyEncryptor/password">'
            f'<keyData saltSize="16" blockSize="16" keyBits="128" '
            f'hashSize="64" cipherAlgorithm="AES" '
            f'cipherChaining="ChainingModeCBC" '
            f'hashAlgorithm="SHA512" saltValue="{b64(kd_salt)}"/>'
            "<keyEncryptors><keyEncryptor uri=\"http://schemas."
            'microsoft.com/office/2006/keyEncryptor/password">'
            f'<p:encryptedKey spinCount="{spin}" saltSize="16" '
            f'blockSize="16" keyBits="128" hashSize="64" '
            f'cipherAlgorithm="AES" '
            f'cipherChaining="ChainingModeCBC" '
            f'hashAlgorithm="SHA512" saltValue="{b64(salt)}" '
            f'encryptedVerifierHashInput="{b64(vhi)}" '
            f'encryptedVerifierHashValue="{b64(vhv)}" '
            f'encryptedKeyValue="{b64(ekv)}"/>'
            "</keyEncryptor></keyEncryptors></encryption>"
        )
        out = bytearray()
        for seg in range(0, len(zip_bytes), _SEGMENT):
            chunk = zip_bytes[seg : seg + _SEGMENT]
            if len(chunk) % 16:
                chunk = chunk.ljust(
                    (len(chunk) + 15) // 16 * 16, b"\x00"
                )
            iv = H(
                kd_salt + struct.pack("<I", seg // _SEGMENT)
            ).digest()[:16]
            out += _cbc(package_key, iv, chunk, decrypt=False)
        info = struct.pack("<HHI", 4, 4, 0x40) + info_xml.encode()
        package = struct.pack("<Q", len(zip_bytes)) + bytes(out)
    else:
        raise ValueError(f"encrypt_ooxml: scheme {scheme!r}")
    return _cfb.encode_cfb(
        [("EncryptionInfo", info), ("EncryptedPackage", package)]
    )


# ---------------------------------------------------------------------------
# 97-era binary RC4 (FilePass, [MS-OFFCRYPTO] 2.3.6) — the BIFF8
# .xls case. Excel's own "unprotected" default is the password
# VelvetSweatshop, so these files are readable corpus members.

_XLS_BLOCK = 1024
# record types stored plaintext even in an encrypted stream
# ([MS-XLS] 2.2.10): BOF, FilePass, UsrExcl, FileLock,
# InterfaceHdr, RRDInfo, RRDHead
_XLS_PLAIN_RECORDS = {
    0x0809, 0x002F, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138,
}
_XLS_BOUNDSHEET = 0x0085  # its lbPlyPos (first 4 body bytes) plain


def _rc4_keystream(key: bytes, n: int) -> bytes:
    from timeseries_data_provider_spark.operators.pdf import _rc4

    return _rc4(key, b"\x00" * n)


def _rc4_block_key(password: str, salt: bytes, block: int) -> bytes:
    """2.3.6.2: Hfinal = MD5(MD5((MD5(pwd)[:5] + salt) * 16)[:5] +
    LE32(block)); the 128-bit document key for one 1024-byte block."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()
    intermed = hashlib.md5((h0[:5] + salt) * 16).digest()
    return hashlib.md5(
        intermed[:5] + struct.pack("<I", block)
    ).digest()


def _xls_keystream(password: str, salt: bytes, n: int) -> bytes:
    out = bytearray()
    for block in range((n + _XLS_BLOCK - 1) // _XLS_BLOCK):
        key = _rc4_block_key(password, salt, block)
        out += _rc4_keystream(
            key, min(_XLS_BLOCK, n - block * _XLS_BLOCK)
        )
    return bytes(out)


def _xls_verify(password: str, fp_body: bytes) -> bytes | None:
    """FilePass RC4 v1.1 body: salt(16) + verifier(16) + hash(16).
    Returns the salt when the password verifies, else None."""
    salt = fp_body[4:20]
    enc_v, enc_vh = fp_body[20:36], fp_body[36:52]
    ks = _rc4_keystream(_rc4_block_key(password, salt, 0), 32)
    v = bytes(a ^ b for a, b in zip(enc_v, ks[:16]))
    vh = bytes(a ^ b for a, b in zip(enc_vh, ks[16:32]))
    return salt if hashlib.md5(v).digest() == vh else None


def _xls_crypt_mask(wb: bytes) -> bytearray:
    """Per-byte mask: 1 where stream bytes are encrypted. Record
    headers stay plaintext (while consuming keystream), as do the
    protection-block record bodies and BoundSheet8's lbPlyPos."""
    mask = bytearray(len(wb))
    pos, n = 0, len(wb)
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        pos += 4
        if rlen > n - pos:
            raise ValueError(f"xls: record {rtype:#06x} overruns")
        if rtype not in _XLS_PLAIN_RECORDS:
            start = pos
            if rtype == _XLS_BOUNDSHEET:
                start += 4
            for i in range(start, pos + rlen):
                mask[i] = 1
        pos += rlen
    return mask


def decrypt_xls_workbook(
    wb: bytes, passwords: tuple[str, ...] = DEFAULT_PASSWORDS
) -> bytes:
    """Decrypt a FilePass-protected BIFF8 Workbook stream in place
    (headers/protected records untouched); the FilePass record
    remains, marked for the caller to skip. CryptoAPI RC4 (version
    2+) and XOR obfuscation raise named errors."""
    # find the FilePass record (it sits in the stream prologue)
    pos, n = 0, len(wb)
    fp_body = None
    while pos + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", wb, pos)
        if rlen > n - pos - 4:
            raise ValueError("xls: record overruns stream")
        if rtype == 0x002F:
            fp_body = wb[pos + 4 : pos + 4 + rlen]
            break
        pos += 4 + rlen
    if fp_body is None:
        raise ValueError("xls: no FilePass record to decrypt")
    if len(fp_body) < 2:
        raise ValueError("xls: truncated FilePass record")
    (enc_type,) = struct.unpack_from("<H", fp_body, 0)
    if enc_type == 0:
        raise NotImplementedError(
            "xls: XOR obfuscation (FilePass type 0)"
        )
    if enc_type != 1 or len(fp_body) < 52:
        raise ValueError("xls: malformed FilePass record")
    vmaj, vmin = struct.unpack_from("<HH", fp_body, 2)
    if (vmaj, vmin) != (1, 1):
        raise NotImplementedError(
            f"xls: CryptoAPI RC4 (FilePass version {vmaj}.{vmin})"
        )
    # v1.1 body layout: type(2) + version(4) + salt/verifier/hash
    body = fp_body[2:]
    for pw in passwords:
        salt = _xls_verify(pw, body)
        if salt is None:
            continue
        ks = _xls_keystream(pw, salt, len(wb))
        mask = _xls_crypt_mask(wb)
        out = bytearray(wb)
        for i in range(len(out)):
            if mask[i]:
                out[i] ^= ks[i]
        return bytes(out)
    raise NotImplementedError(
        "xls: encrypted workbook (password required — tried "
        f"{len(tuple(passwords))} candidates)"
    )


def encrypt_xls_workbook(wb: bytes, password: str = "") -> bytes:
    """Fixture writer: insert a FilePass (RC4 v1.1) record after the
    BOF record and encrypt the stream under the 1024-byte-block
    document keys."""
    if len(wb) < 4:
        raise ValueError("encrypt_xls_workbook: not a BIFF stream")
    rtype, rlen = struct.unpack_from("<HH", wb, 0)
    if rtype != 0x0809:
        raise ValueError("encrypt_xls_workbook: stream must open BOF")
    salt = hashlib.md5(b"fixture-xls-salt" + wb[:8]).digest()
    verifier = hashlib.md5(b"fixture-xls-v" + salt).digest()
    vhash = hashlib.md5(verifier).digest()
    ks0 = _rc4_keystream(_rc4_block_key(password, salt, 0), 32)
    fp = (
        struct.pack("<HH", 0x002F, 54)
        + struct.pack("<HHH", 1, 1, 1)
        + salt
        + bytes(a ^ b for a, b in zip(verifier, ks0[:16]))
        + bytes(a ^ b for a, b in zip(vhash, ks0[16:32]))
    )
    cut = 4 + rlen
    plain = wb[:cut] + fp + wb[cut:]
    ks = _xls_keystream(password, salt, len(plain))
    mask = _xls_crypt_mask(plain)
    out = bytearray(plain)
    for i in range(len(out)):
        if mask[i]:
            out[i] ^= ks[i]
    return bytes(out)
