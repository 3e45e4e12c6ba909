"""Encrypted OOXML ([MS-OFFCRYPTO]) — Standard and Agile schemes.

An encrypted Office 2007+ document is NOT a ZIP: it is an OLE2/CFB
container holding ``EncryptionInfo`` (the scheme descriptor) and
``EncryptedPackage`` (8-byte plaintext size + the encrypted ZIP).
Two schemes cover the real corpus:

* **RC4 CryptoAPI** ([MS-OFFCRYPTO] 2.3.5, r12): the Office
  XP/2003 "password to open" default for binary .xls/.doc — SHA-1
  block-key derivation (40-bit keys zero-extended per 2.3.5.2),
  EncryptionHeader/Verifier structures, per-block stream rekeying
  (1024 bytes in BIFF8, 512 in Word).
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
import functools
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
    "decrypt_doc_streams",
    "encrypt_doc_streams",
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


@functools.lru_cache(maxsize=256)
def _std_derive_key(password: str, salt: bytes, key_bytes: int) -> bytes:
    """Standard-scheme key derivation (2.3.4.7): 50,000 chained
    SHA-1 rounds over the UTF-16LE password, block 0, then the
    0x36-pad derivation. Memoized per (password, salt, key_bytes) —
    a pure function whose 50k-round spin is the POINT of the KDF;
    any real crypto stack caches the derived key for a repeated
    credential, and a corpus of same-password containers otherwise
    re-pays the full spin per document (r15: the q64 docx/doc
    chains' dominant cost)."""
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    sha1 = hashlib.sha1
    pack = struct.pack
    for i in range(50_000):
        h = sha1(pack("<I", i) + h).digest()
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


@functools.lru_cache(maxsize=256)
def _agile_pwd_hash(
    password: str, salt: bytes, spin: int, hash_name: str
) -> bytes:
    """Memoized like _std_derive_key (pure function; the spin is the
    cost and repeats per same-credential container)."""
    H = _HASHES[hash_name]
    h = H(salt + password.encode("utf-16-le")).digest()
    pack = struct.pack
    for i in range(spin):
        h = H(pack("<I", i) + h).digest()
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
    passwords = tuple(passwords)  # generators must not exhaust
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
        f"{len(passwords)} candidates)"
    )


def _decrypt_standard(
    info: bytes, package: bytes, passwords
) -> bytes:
    passwords = tuple(passwords)  # generators must not exhaust
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
        f"{len(passwords)} candidates)"
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
    passwords = tuple(passwords)  # generators must not exhaust
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
    if enc_type != 1 or len(fp_body) < 6:
        raise ValueError("xls: malformed FilePass record")
    vmaj, vmin = struct.unpack_from("<HH", fp_body, 2)
    capi = None
    if (vmaj, vmin) == (1, 1):
        # v1.1 layout is 54 bytes: type(2) + version(4) +
        # salt/verifier/hash(48) — a shorter record is DAMAGE, not a
        # wrong password (r12 review finding: the old 52-byte guard
        # misrouted truncation to 'password required')
        if len(fp_body) < 54:
            raise ValueError("xls: truncated FilePass v1.1 record")
        body = fp_body[2:]  # version(4) + salt/verifier/hash
    elif vmaj in (2, 3, 4) and vmin == 2:
        # RC4 CryptoAPI ([MS-XLS] 2.2.10.3, r12): same 1024-byte
        # block rekeying, SHA-1 derivation
        capi = _parse_capi_header(fp_body[2:])
    else:
        raise NotImplementedError(
            f"xls: FilePass version {vmaj}.{vmin}"
        )
    for pw in passwords:
        if capi is not None:
            if not _capi_verify(pw, capi):
                continue
            ks = _capi_keystream(
                pw, capi["salt"], len(wb), capi["key_bits"],
                _XLS_BLOCK,
            )
        else:
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
        f"{len(passwords)} candidates)"
    )


def encrypt_xls_workbook(
    wb: bytes, password: str = "", scheme: str = "rc4"
) -> bytes:
    """Fixture writer: insert a FilePass record after the BOF record
    (RC4 v1.1 under ``scheme='rc4'``, CryptoAPI under ``'capi'``)
    and encrypt the stream under the 1024-byte-block document
    keys."""
    if len(wb) < 4:
        raise ValueError("encrypt_xls_workbook: not a BIFF stream")
    rtype, rlen = struct.unpack_from("<HH", wb, 0)
    if rtype != 0x0809:
        raise ValueError("encrypt_xls_workbook: stream must open BOF")
    salt = hashlib.md5(b"fixture-xls-salt" + wb[:8]).digest()
    if scheme == "rc4":
        verifier = hashlib.md5(b"fixture-xls-v" + salt).digest()
        vhash = hashlib.md5(verifier).digest()
        ks0 = _rc4_keystream(_rc4_block_key(password, salt, 0), 32)
        body = (
            struct.pack("<HHH", 1, 1, 1)
            + salt
            + bytes(a ^ b for a, b in zip(verifier, ks0[:16]))
            + bytes(a ^ b for a, b in zip(vhash, ks0[16:32]))
        )
    elif scheme == "capi":
        body = struct.pack("<H", 1) + _encode_capi_filepass_body(
            password, salt
        )
    else:
        raise ValueError(f"encrypt_xls_workbook: scheme {scheme!r}")
    fp = struct.pack("<HH", 0x002F, len(body)) + body
    cut = 4 + rlen
    plain = wb[:cut] + fp + wb[cut:]
    if scheme == "capi":
        ks = _capi_keystream(password, salt, len(plain), 128,
                             _XLS_BLOCK)
    else:
        ks = _xls_keystream(password, salt, len(plain))
    mask = _xls_crypt_mask(plain)
    out = bytearray(plain)
    for i in range(len(out)):
        if mask[i]:
            out[i] ^= ks[i]
    return bytes(out)


# ---------------------------------------------------------------------------
# RC4 CryptoAPI ([MS-OFFCRYPTO] 2.3.5) — the Office XP/2003 default
# for binary .xls/.doc/.ppt "password to open". SHA-1 key derivation
# (H0 = SHA1(salt + password UTF-16LE); block key = SHA1(H0 +
# LE32(block)), 40-bit keys zero-extended to 128 per 2.3.5.2), the
# EncryptionHeader/EncryptionVerifier structure pair, and the same
# per-block stream rekeying as the 97-era scheme (1024 bytes in
# BIFF8, 512 in Word).

_ALG_RC4 = 0x6801
_ALG_SHA1 = 0x8004


def _capi_block_key(
    password: str, salt: bytes, block: int, key_bits: int
) -> bytes:
    h0 = hashlib.sha1(
        salt + password.encode("utf-16-le")
    ).digest()
    hfinal = hashlib.sha1(h0 + struct.pack("<I", block)).digest()
    if key_bits == 40:
        return hfinal[:5] + b"\x00" * 11
    return hfinal[: key_bits // 8]


def _parse_capi_header(body: bytes) -> dict:
    """EncryptionVersionInfo + EncryptionHeaderFlags/Size +
    EncryptionHeader + EncryptionVerifier (2.3.5.1), as carried by
    a BIFF8 FilePass body or a Word/PowerPoint table-stream
    prologue. Returns salt/verifier material + key size."""
    if len(body) < 12:
        raise ValueError("offcrypto: truncated CryptoAPI header")
    vmaj, vmin = struct.unpack_from("<HH", body, 0)
    if vmaj not in (2, 3, 4) or vmin != 2:
        raise ValueError(
            f"offcrypto: not a CryptoAPI header ({vmaj}.{vmin})"
        )
    (hdr_size,) = struct.unpack_from("<I", body, 8)
    if hdr_size < 32 or 12 + hdr_size + 40 > len(body):
        raise ValueError("offcrypto: CryptoAPI header overruns")
    hdr = body[12 : 12 + hdr_size]
    alg_id, alg_hash, key_size = struct.unpack_from("<III", hdr, 8)
    if alg_id != _ALG_RC4:
        raise NotImplementedError(
            f"offcrypto: CryptoAPI AlgID {alg_id:#x} (RC4 only — "
            "AES CryptoAPI routes through the Standard scheme)"
        )
    if alg_hash not in (0, _ALG_SHA1):
        raise NotImplementedError(
            f"offcrypto: CryptoAPI hash {alg_hash:#x}"
        )
    key_bits = key_size or 40
    if key_bits % 8 or not (40 <= key_bits <= 128):
        raise ValueError(
            f"offcrypto: CryptoAPI key size {key_bits}"
        )
    pos = 12 + hdr_size
    (salt_size,) = struct.unpack_from("<I", body, pos)
    if salt_size != 16:
        raise ValueError(
            f"offcrypto: CryptoAPI salt size {salt_size}"
        )
    salt = body[pos + 4 : pos + 20]
    enc_v = body[pos + 20 : pos + 36]
    (vh_size,) = struct.unpack_from("<I", body, pos + 36)
    if vh_size != 20 or pos + 60 > len(body):
        raise ValueError("offcrypto: truncated CryptoAPI verifier")
    enc_vh = body[pos + 40 : pos + 60]
    return {
        "salt": salt,
        "enc_v": enc_v,
        "enc_vh": enc_vh,
        "key_bits": key_bits,
    }


def _capi_verify(password: str, h: dict) -> bool:
    """2.3.5.6: one RC4 stream over verifier + hash, SHA-1 check."""
    key = _capi_block_key(password, h["salt"], 0, h["key_bits"])
    ks = _rc4_keystream(key, 36)
    v = bytes(a ^ b for a, b in zip(h["enc_v"], ks[:16]))
    vh = bytes(a ^ b for a, b in zip(h["enc_vh"], ks[16:36]))
    return hashlib.sha1(v).digest() == vh


def _capi_keystream(
    password: str, salt: bytes, n: int, key_bits: int, block_len: int
) -> bytes:
    out = bytearray()
    for block in range((n + block_len - 1) // block_len):
        key = _capi_block_key(password, salt, block, key_bits)
        out += _rc4_keystream(
            key, min(block_len, n - block * block_len)
        )
    return bytes(out)


def _encode_capi_filepass_body(
    password: str, salt: bytes, key_bits: int = 128
) -> bytes:
    """Fixture writer: EncryptionVersionInfo + header + verifier."""
    csp = "Microsoft Enhanced Cryptographic Provider v1.0\x00".encode(
        "utf-16-le"
    )
    hdr = struct.pack(
        "<IIIIIIII", 0, 0, _ALG_RC4, _ALG_SHA1, key_bits, 1, 0, 0
    ) + csp
    verifier = hashlib.sha1(b"capi-fixture-v" + salt).digest()[:16]
    vh = hashlib.sha1(verifier).digest()
    ks = _rc4_keystream(
        _capi_block_key(password, salt, 0, key_bits), 36
    )
    enc_v = bytes(a ^ b for a, b in zip(verifier, ks[:16]))
    enc_vh = bytes(a ^ b for a, b in zip(vh, ks[16:36]))
    return (
        struct.pack("<HH", 4, 2)
        + struct.pack("<I", 0x0C)  # header flags (fCryptoAPI)
        + struct.pack("<I", len(hdr))
        + hdr
        + struct.pack("<I", 16)
        + salt
        + enc_v
        + struct.pack("<I", 20)
        + enc_vh
    )


# ---------------------------------------------------------------------------
# encrypted Word 97 ([MS-DOC] 2.2.6.2/2.2.6.3) — FIB fEncrypted with
# the RC4 v1.1 or CryptoAPI header at the start of the Table stream.
# In-place stream decryption with 512-byte block rekeying; the
# plaintext ranges (WordDocument bytes 0..0x43, the Table-stream
# header itself) keep their bytes while still occupying keystream
# positions — the same in-place model as the BIFF8 scheme above.

_DOC_BLOCK = 512
_DOC_PLAIN_PREFIX = 0x44


def _doc_keystream(
    password: str, salt: bytes, n: int, capi: dict | None
) -> bytes:
    if capi is not None:
        return _capi_keystream(
            password, salt, n, capi["key_bits"], _DOC_BLOCK
        )
    out = bytearray()
    for block in range((n + _DOC_BLOCK - 1) // _DOC_BLOCK):
        key = _rc4_block_key(password, salt, block)
        out += _rc4_keystream(
            key, min(_DOC_BLOCK, n - block * _DOC_BLOCK)
        )
    return bytes(out)


def decrypt_doc_streams(
    worddoc: bytes,
    table: bytes,
    data: bytes | None = None,
    passwords: tuple[str, ...] = DEFAULT_PASSWORDS,
) -> tuple[bytes, bytes, bytes | None]:
    """Decrypt an fEncrypted Word 97 document in place: returns the
    (WordDocument, Table, Data) streams with the FIB's fEncrypted/
    fObfuscated flags cleared and lKey zeroed so the result parses
    as a plain document. The encryption header size comes from
    FibBase.lKey; version (1,1) selects the MD5/RC4 97-era scheme,
    (2..4, 2) the CryptoAPI scheme. A real password raises the
    named error."""
    passwords = tuple(passwords)  # generators must not exhaust
    if len(worddoc) < 0x44:
        raise ValueError("doc: WordDocument stream too short")
    (flags,) = struct.unpack_from("<H", worddoc, 0x0A)
    if not flags & 0x0100:
        raise ValueError("doc: document is not encrypted")
    if flags & 0x8000:
        raise NotImplementedError(
            "doc: XOR obfuscation (fObfuscated)"
        )
    (lkey,) = struct.unpack_from("<I", worddoc, 0x0E)
    if not 12 <= lkey <= len(table):
        raise ValueError(f"doc: implausible EncryptionHeader {lkey}")
    header = table[:lkey]
    vmaj, vmin = struct.unpack_from("<HH", header, 0)
    capi = None
    if (vmaj, vmin) == (1, 1):
        if lkey < 52:
            raise ValueError("doc: truncated RC4 v1.1 header")
        salt = header[4:20]
        enc_v, enc_vh = header[20:36], header[36:52]
    elif vmaj in (2, 3, 4) and vmin == 2:
        capi = _parse_capi_header(header)
        salt = capi["salt"]
    else:
        raise NotImplementedError(
            f"doc: encryption header version {vmaj}.{vmin}"
        )
    match = None
    for pw in passwords:
        if capi is not None:
            ok = _capi_verify(pw, capi)
        else:
            ks = _rc4_keystream(_rc4_block_key(pw, salt, 0), 32)
            v = bytes(a ^ b for a, b in zip(enc_v, ks[:16]))
            vh = bytes(a ^ b for a, b in zip(enc_vh, ks[16:32]))
            ok = hashlib.md5(v).digest() == vh
        if ok:
            match = pw
            break
    if match is None:
        raise NotImplementedError(
            "doc: encrypted document (password required — tried "
            f"{len(passwords)} candidates)"
        )

    def strip(blob: bytes, plain_end: int) -> bytes:
        ks = _doc_keystream(match, salt, len(blob), capi)
        out = bytearray(a ^ b for a, b in zip(blob, ks))
        out[:plain_end] = blob[:plain_end]
        return bytes(out)

    wd = bytearray(strip(worddoc, _DOC_PLAIN_PREFIX))
    tbl = strip(table, lkey)
    dat = strip(data, 0) if data is not None else None
    # clear fEncrypted/fObfuscated + lKey: downstream FIB parsing
    # sees a plain document
    struct.pack_into("<H", wd, 0x0A, flags & ~0x8100)
    struct.pack_into("<I", wd, 0x0E, 0)
    return bytes(wd), tbl, dat


def encrypt_doc_streams(
    worddoc: bytes,
    table: bytes,
    data: bytes | None = None,
    password: str = "",
    scheme: str = "rc4",
    fc_fixups: tuple = (418,),
) -> tuple[bytes, bytes, bytes | None]:
    """Fixture writer: encrypt plain Word 97 streams under the RC4
    v1.1 (``scheme='rc4'``) or CryptoAPI (``'capi'``) header, set
    fEncrypted + lKey, and prepend the header to the Table stream.
    FIB offsets address the Table stream AS STORED (header
    included), so the fc pointers the fixture materializes are
    rebased by the header length — ``fc_fixups`` lists their FIB
    byte offsets (default: fcClx at 418, the only pointer
    sources/doc.py's fixture writer emits)."""
    if len(worddoc) < 0x44:
        raise ValueError("encrypt_doc_streams: WordDocument short")
    salt = hashlib.md5(b"fixture-doc-salt" + worddoc[:8]).digest()
    capi = None
    if scheme == "rc4":
        verifier = hashlib.md5(b"fixture-doc-v" + salt).digest()
        vhash = hashlib.md5(verifier).digest()
        ks0 = _rc4_keystream(_rc4_block_key(password, salt, 0), 32)
        header = (
            struct.pack("<HH", 1, 1)
            + salt
            + bytes(a ^ b for a, b in zip(verifier, ks0[:16]))
            + bytes(a ^ b for a, b in zip(vhash, ks0[16:32]))
        )
    elif scheme == "capi":
        # the same version+header+verifier blob BIFF8's FilePass
        # carries, minus the BIFF wEncryptionType framing
        header = _encode_capi_filepass_body(password, salt)
        capi = _parse_capi_header(header)
    else:
        raise ValueError(f"encrypt_doc_streams: scheme {scheme!r}")
    wd = bytearray(worddoc)
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    struct.pack_into("<H", wd, 0x0A, flags | 0x0100)
    struct.pack_into("<I", wd, 0x0E, len(header))
    for off in fc_fixups:
        (fc,) = struct.unpack_from("<I", wd, off)
        struct.pack_into("<I", wd, off, fc + len(header))

    def wrap(blob: bytes, plain_end: int) -> bytes:
        ks = _doc_keystream(password, salt, len(blob), capi)
        out = bytearray(a ^ b for a, b in zip(blob, ks))
        out[:plain_end] = blob[:plain_end]
        return bytes(out)

    enc_tbl = header + table
    return (
        wrap(bytes(wd), _DOC_PLAIN_PREFIX),
        wrap(enc_tbl, len(header)),
        wrap(data, 0) if data is not None else None,
    )
