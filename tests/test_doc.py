"""Legacy Word .doc text extraction (sources/doc): MS-DOC piece
tables over the CFB container. Verification posture is stated in the
module docstring: spec-transcribed offsets + self-written fixtures +
loud-failure design (the typed CLX means wrong offsets error, never
emit silent garbage)."""

import struct

import pytest

from timeseries_data_provider_spark.sources import cfb, doc

TEXT = "Hello legacy Word.\rSecond paragraph with naïve — text."
WANT = "Hello legacy Word.\nSecond paragraph with naïve — text."


@pytest.mark.parametrize("pieces", [1, 3, 7])
@pytest.mark.parametrize("mixed", [False, True])
def test_piece_table_roundtrip(pieces, mixed):
    m = doc.doc_text(doc.encode_doc(TEXT, pieces=pieces, mixed=mixed))
    assert m["text"] == WANT
    assert m["n_pieces"] >= 1


def test_utf16_cp_accounting():
    # CPs are UTF-16 code units: an astral char counts twice; the
    # first fixture draft counted Python chars and read half a
    # surrogate pair
    b = doc.encode_doc("math 𝔸 here", mixed=True, pieces=2)
    assert doc.doc_text(b)["text"] == "math 𝔸 here"


def test_cell_and_row_marks_become_newlines():
    b = doc.encode_doc("a\x07b\x07\rrow two")
    assert doc.doc_text(b)["text"] == "a\nb\n\nrow two"


def test_encrypted_flag_without_header_is_loud():
    # fEncrypted set but no EncryptionHeader (lKey 0): the r12
    # decrypt route fails loud, never parses ciphertext as a FIB
    blob = bytearray(doc.encode_doc("secret"))
    streams = dict(cfb.cfb_streams(bytes(blob)))
    wd = bytearray(streams["WordDocument"])
    flags = struct.unpack_from("<H", wd, 10)[0]
    struct.pack_into("<H", wd, 10, flags | 0x0100)  # fEncrypted
    rebuilt = cfb.encode_cfb(
        [("WordDocument", bytes(wd)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(ValueError, match="EncryptionHeader"):
        doc.doc_text(rebuilt)
    # XOR obfuscation stays the named gap
    struct.pack_into("<H", wd, 10, flags | 0x8100)
    rebuilt = cfb.encode_cfb(
        [("WordDocument", bytes(wd)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(NotImplementedError, match="XOR"):
        doc.doc_text(rebuilt)


def test_hostile_structures_loud():
    with pytest.raises(ValueError, match="WordDocument"):
        doc.doc_text(cfb.encode_cfb([("Workbook", b"\x00" * 2000)]))
    # wrong FIB magic
    streams = dict(cfb.cfb_streams(doc.encode_doc("x")))
    wd = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd, 0, 0x1234)
    bad = cfb.encode_cfb(
        [("WordDocument", bytes(wd)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(ValueError, match="FIB magic"):
        doc.doc_text(bad)
    # CLX whose Pcdt marker is wrong: typed structure catches a
    # mis-pointed fcClx instead of emitting garbage
    wd2 = bytearray(streams["WordDocument"])
    struct.pack_into("<I", wd2, 418, 0)  # fcClx -> zero padding
    bad2 = cfb.encode_cfb(
        [("WordDocument", bytes(wd2)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(ValueError, match="Pcdt|CLX"):
        doc.doc_text(bad2)
    # CLX beyond the table stream
    wd3 = bytearray(streams["WordDocument"])
    struct.pack_into("<I", wd3, 422, 1 << 20)  # lcbClx huge
    bad3 = cfb.encode_cfb(
        [("WordDocument", bytes(wd3)), ("1Table", streams["1Table"])]
    )
    with pytest.raises(ValueError, match="bounds"):
        doc.doc_text(bad3)


def test_table_stream_fallback():
    # fWhichTblStm says 1Table but only 0Table exists (real-world
    # damage): fall back rather than fail
    streams = dict(cfb.cfb_streams(doc.encode_doc("fallback text")))
    rebuilt = cfb.encode_cfb(
        [
            ("WordDocument", streams["WordDocument"]),
            ("0Table", streams["1Table"]),
        ]
    )
    assert doc.doc_text(rebuilt)["text"] == "fallback text"


def test_doc_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, None],
            "payload": [
                doc.encode_doc("one"),
                doc.encode_doc("two\rlines", pieces=2),
                None,
            ],
        }
    )
    out = (
        doc.doc_features(spark.createDataFrame(rows))
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == 2
    assert out[0]["text"] == "one"
    assert out[1]["text"] == "two\nlines" and out[1]["n_pieces"] == 2


def test_synth_doc_corpus_roundtrip(spark):
    # the q64 doc97-column chain (r12 late): piece-table text equals
    # the source text, with 1-in-8 containers arriving encrypted
    # (id 5: RC4 v1.1 empty password; id 13: CryptoAPI Velvet)
    docs = spark.createDataFrame(
        [(5, "RC4 path — naïve 你好."), (13, "CryptoAPI path."),
         (1, "Plain path.\nSecond par.")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in doc.doc_features(doc.synth_doc_corpus(docs)).collect()
    }
    assert rows[1]["text"] == "Plain path.\nSecond par."
    assert rows[5]["text"] == "RC4 path — naïve 你好."
    assert rows[13]["text"] == "CryptoAPI path."
    # the encrypted plants are REALLY encrypted on disk
    blobs = {
        r["doc_id"]: bytes(r["payload"])
        for r in doc.synth_doc_corpus(docs).collect()
    }
    for needle in (b"RC4 path", "RC4 path".encode("utf-16-le")):
        assert needle not in blobs[5]
    for needle in (b"CryptoAPI path",
                   "CryptoAPI path".encode("utf-16-le")):
        assert needle not in blobs[13]
    # plain ASCII stores as fCompressed cp1252 pieces
    assert b"Plain path" in blobs[1]
