"""Encrypted OOXML ([MS-OFFCRYPTO], sources/offcrypto.py, r12):
Standard (SHA-1/AES-ECB) and Agile (SHA-512/AES-CBC) schemes, the
empty/VelvetSweatshop default passwords, and the office_text
routing. Closes the office.py 'encrypted (password) OOXML' named
gap."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from timeseries_data_provider_spark.sources import (
    cfb,
    offcrypto,
    office,
)

PLAIN = office.encode_docx(
    ["Secret memo line.", "Second — naïve."], title="Enc"
)


@pytest.mark.parametrize("scheme", ["standard", "agile"])
@pytest.mark.parametrize("pw", ["", "VelvetSweatshop"])
def test_default_password_roundtrip(scheme, pw):
    blob = offcrypto.encrypt_ooxml(PLAIN, pw, scheme)
    assert blob[:8] == cfb.MAGIC
    assert b"Secret" not in blob  # really encrypted
    assert offcrypto.decrypt_ooxml(blob) == PLAIN
    # office_text routes CFB-with-EncryptionInfo transparently
    m = office.office_text(blob)
    assert m["text"] == "Secret memo line.\nSecond — naïve."
    assert m["title"] == "Enc" and m["kind"] == "docx"


@pytest.mark.parametrize("scheme", ["standard", "agile"])
def test_real_password_is_named_and_candidates_work(scheme):
    blob = offcrypto.encrypt_ooxml(PLAIN, "hunter2", scheme)
    with pytest.raises(NotImplementedError, match="password required"):
        offcrypto.decrypt_ooxml(blob)
    assert offcrypto.decrypt_ooxml(blob, ("x", "hunter2")) == PLAIN
    assert (
        office.office_text(blob, passwords=("hunter2",))["title"]
        == "Enc"
    )


def test_multisegment_agile_package():
    # > 4096-byte package: every segment gets its own Hash(salt+i) IV
    import hashlib

    big = office.encode_docx(
        [
            f"Paragraph {i}: "
            + hashlib.sha512(str(i).encode()).hexdigest()
            for i in range(200)
        ]
    )
    assert len(big) > 2 * 4096
    blob = offcrypto.encrypt_ooxml(big, "", "agile")
    assert offcrypto.decrypt_ooxml(blob) == big


def test_cfb_kind_routes_encrypted_ooxml():
    blob = offcrypto.encrypt_ooxml(PLAIN, "", "agile")
    assert cfb.cfb_kind(blob)["kind"] == "encrypted-ooxml"


def test_hostile_inputs_named_errors():
    blob = bytearray(offcrypto.encrypt_ooxml(PLAIN, "", "standard"))
    # plain .doc-ish CFB without encryption streams
    with pytest.raises(ValueError, match="EncryptionInfo"):
        offcrypto.decrypt_ooxml(
            cfb.encode_cfb([("WordDocument", b"\x00" * 64)])
        )
    # unknown version word
    at = bytes(blob).find(b"\x04\x00\x02\x00")
    assert at > 0
    bad = bytearray(blob)
    bad[at] = 9
    with pytest.raises(ValueError, match="version"):
        offcrypto.decrypt_ooxml(bytes(bad))
    # extensible encryption is a named scope boundary
    ext = bytearray(blob)
    struct.pack_into("<HH", ext, at, 4, 3)
    with pytest.raises(NotImplementedError, match="extensible"):
        offcrypto.decrypt_ooxml(bytes(ext))
    # agile descriptor with a DOCTYPE is refused before parse
    with pytest.raises(ValueError, match="DOCTYPE"):
        offcrypto._parse_agile_xml(
            b'<!DOCTYPE x [<!ENTITY a "a">]><encryption/>'
        )


def test_spark_features_and_quarantine(spark):
    good = offcrypto.encrypt_ooxml(PLAIN, "", "agile")
    locked = offcrypto.encrypt_ooxml(PLAIN, "hunter2", "standard")
    df = spark.createDataFrame(
        [(1, good), (2, locked)], "doc_id long, payload binary"
    )
    out = office.office_features(df, errors="quarantine").collect()
    ok = [r for r in out if r["err_class"] is None]
    bad = [r for r in out if r["err_class"] is not None]
    assert [r["doc_id"] for r in ok] == [1]
    assert ok[0]["text"] == "Secret memo line.\nSecond — naïve."
    assert [r["doc_id"] for r in bad] == [2]
    assert "password required" in bad[0]["err_msg"]


# -- 97-era FilePass RC4 (.xls) ----------------------------------------

from timeseries_data_provider_spark.sources import xls


def _enc_xls(pw: str) -> bytes:
    plain = xls.encode_xls(["alpha one", "beta — naïve", "gamma"])
    wb = dict(cfb.cfb_streams(plain))["Workbook"]
    return cfb.encode_cfb(
        [("Workbook", offcrypto.encrypt_xls_workbook(wb, pw))]
    )


@pytest.mark.parametrize("pw", ["", "VelvetSweatshop"])
def test_xls_filepass_rc4_default_passwords(pw):
    want = xls.xls_text(
        xls.encode_xls(["alpha one", "beta — naïve", "gamma"])
    )
    blob = _enc_xls(pw)
    # the SST text is really encrypted on disk
    wb = dict(cfb.cfb_streams(blob))["Workbook"]
    assert b"alpha one" not in wb
    assert xls.xls_text(blob) == want


def test_xls_filepass_real_password_and_candidates():
    blob = _enc_xls("secret123")
    with pytest.raises(NotImplementedError, match="password required"):
        xls.xls_text(blob)
    want = xls.xls_text(
        xls.encode_xls(["alpha one", "beta — naïve", "gamma"])
    )
    assert xls.xls_text(blob, passwords=("secret123",)) == want


def test_xls_filepass_named_scope_boundaries():
    import struct as _s

    blob = bytearray(
        dict(cfb.cfb_streams(_enc_xls("")))["Workbook"]
    )
    at = bytes(blob).find(_s.pack("<HH", 0x002F, 54)) + 4
    xor = bytearray(blob)
    _s.pack_into("<H", xor, at, 0)
    with pytest.raises(NotImplementedError, match="XOR"):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(xor))]))
    # a v1.1 body relabeled as CryptoAPI parses loud, not as junk
    capi = bytearray(blob)
    _s.pack_into("<HH", capi, at + 2, 4, 2)
    with pytest.raises(ValueError, match="CryptoAPI"):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(capi))]))
    # an unknown FilePass version stays named
    v9 = bytearray(blob)
    _s.pack_into("<HH", v9, at + 2, 9, 9)
    with pytest.raises(NotImplementedError, match="FilePass version"):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(v9))]))


def test_xls_filepass_block_rekey_across_1024():
    # a workbook whose SST spans multiple 1024-byte RC4 blocks: the
    # per-block document keys must line up exactly
    import hashlib

    strings = [
        f"row {i}: " + hashlib.sha256(str(i).encode()).hexdigest()
        for i in range(60)
    ]
    plain = xls.encode_xls(strings)
    wb = dict(cfb.cfb_streams(plain))["Workbook"]
    assert len(wb) > 3 * 1024
    blob = cfb.encode_cfb(
        [("Workbook", offcrypto.encrypt_xls_workbook(wb, ""))]
    )
    assert xls.xls_text(blob) == xls.xls_text(plain)


# ---------------------------------------------------------------------------
# RC4 CryptoAPI + encrypted Word 97 (r12 late)

from timeseries_data_provider_spark.sources import doc as docmod


@pytest.mark.parametrize("pw", ["", "VelvetSweatshop"])
def test_xls_cryptoapi_default_passwords(pw):
    plain = xls.encode_xls(["aaa", "bbb", "ccc"])
    wb = dict(cfb.cfb_streams(plain))["Workbook"]
    blob = cfb.encode_cfb(
        [("Workbook", offcrypto.encrypt_xls_workbook(wb, pw, "capi"))]
    )
    assert xls.xls_text(blob) == xls.xls_text(plain)


def test_xls_cryptoapi_block_rekey_and_real_password():
    import hashlib as _h

    strings = [
        f"r{i}:" + _h.sha256(str(i).encode()).hexdigest()
        for i in range(60)
    ]
    plain = xls.encode_xls(strings)
    wb = dict(cfb.cfb_streams(plain))["Workbook"]
    assert len(wb) > 3 * 1024  # spans several 1024-byte blocks
    blob = cfb.encode_cfb(
        [("Workbook", offcrypto.encrypt_xls_workbook(wb, "", "capi"))]
    )
    assert xls.xls_text(blob) == xls.xls_text(plain)
    locked = cfb.encode_cfb(
        [("Workbook",
          offcrypto.encrypt_xls_workbook(wb, "hunter2", "capi"))]
    )
    with pytest.raises(NotImplementedError, match="password required"):
        xls.xls_text(locked)
    assert xls.xls_text(locked, passwords=("hunter2",)) == xls.xls_text(
        plain
    )


def _enc_doc(text, pw="", scheme="rc4"):
    plain = docmod.encode_doc(text)
    s = dict(cfb.cfb_streams(plain))
    ewd, etbl, _ = offcrypto.encrypt_doc_streams(
        s["WordDocument"], s["1Table"], None, pw, scheme
    )
    return plain, cfb.encode_cfb(
        [("WordDocument", ewd), ("1Table", etbl)]
    )


@pytest.mark.parametrize("scheme", ["rc4", "capi"])
@pytest.mark.parametrize("pw", ["", "VelvetSweatshop"])
def test_doc_encrypted_roundtrip(scheme, pw):
    text = "Encrypted Word body. Ünïcode 你好.\nSecond par."
    plain, enc = _enc_doc(text, pw, scheme)
    assert docmod.doc_text(enc) == docmod.doc_text(plain)


def test_doc_block_rekey_across_512():
    # pieces pushing the text well past several 512-byte Word
    # blocks: per-block keys and the plaintext FIB prefix line up
    text = "\n".join(f"line {i}: " + "x" * 60 for i in range(40))
    plain, enc = _enc_doc(text, "", "rc4")
    assert len(dict(cfb.cfb_streams(enc))["WordDocument"]) > 2048
    assert docmod.doc_text(enc) == docmod.doc_text(plain)


def test_doc_real_password_named_and_candidates():
    plain, enc = _enc_doc("locked", "hunter2", "capi")
    with pytest.raises(NotImplementedError, match="password required"):
        docmod.doc_text(enc)
    assert docmod.doc_text(enc, passwords=("hunter2",)) == (
        docmod.doc_text(plain)
    )


def test_doc_encrypted_ciphertext_is_opaque():
    text = "needle-phrase that must not appear in ciphertext"
    plain, enc = _enc_doc(text, "", "rc4")
    wd = dict(cfb.cfb_streams(enc))["WordDocument"]
    assert b"needle-phrase" not in wd
    assert b"needle-phrase" not in wd.decode(
        "latin-1"
    ).encode("utf-16-le")


def test_cryptoapi_header_hostile():
    plain = xls.encode_xls(["x"])
    wb = dict(cfb.cfb_streams(plain))["Workbook"]
    enc = offcrypto.encrypt_xls_workbook(wb, "", "capi")
    at = enc.find(struct.pack("<HH", 4, 2))
    assert at > 0
    # AlgID not RC4 -> named (AES CryptoAPI is a different scheme)
    bad = bytearray(enc)
    struct.pack_into("<I", bad, at + 12 + 8, 0x660E)  # AES-128
    with pytest.raises(NotImplementedError, match="AlgID"):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(bad))]))
    # truncated header -> loud
    cut = bytearray(enc[: at + 10])
    with pytest.raises(ValueError):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(cut))]))


def test_truncated_filepass_is_damage_not_password():
    # r12 review finding: a 52/53-byte v1.1 FilePass body passed the
    # malformed-record guard and surfaced as 'password required' —
    # routing DAMAGE to the wrong quarantine bucket
    blob = dict(cfb.cfb_streams(_enc_xls("")))["Workbook"]
    at = blob.find(struct.pack("<HH", 0x002F, 54))
    assert at > 0
    cut = bytearray(blob[: at + 4 + 53])  # 53-byte FilePass body
    struct.pack_into("<H", cut, at + 2, 53)
    with pytest.raises(ValueError, match="truncated FilePass"):
        xls.xls_text(cfb.encode_cfb([("Workbook", bytes(cut))]))


def test_password_candidates_report_survives_generators():
    # r12 review finding: the raise path re-tupled an already-
    # exhausted iterator and reported 'tried 0 candidates'
    blob = offcrypto.encrypt_ooxml(PLAIN, "hunter2", "standard")
    with pytest.raises(
        NotImplementedError, match="tried 2 candidates"
    ):
        offcrypto.decrypt_ooxml(blob, iter(["a", "b"]))
