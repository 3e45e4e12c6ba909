"""Legacy PowerPoint .ppt text (sources/ppt): the MS-PPT atom walk
over the CFB container — TextCharsAtom/TextBytesAtom collection in
stream order with bounds/depth guards."""

import struct

import pytest

from timeseries_data_provider_spark.sources import cfb, ppt


def test_atom_roundtrip_and_linebreaks():
    b = ppt.encode_ppt(
        ["Title slide", "Bullet with naïve — text", "line\rbroken"]
    )
    m = ppt.ppt_text(b)
    # the non-ASCII line takes the TextBytesAtom cp1252 path; a
    # hypothetical non-cp1252 char would take TextCharsAtom UTF-16
    assert m["text"] == (
        "Title slide\nBullet with naïve — text\nline\nbroken"
    )
    assert m["n_atoms"] == 3


def test_utf16_atom_path():
    b = ppt.encode_ppt(["astral 𝔸 forces UTF-16"])
    assert ppt.ppt_text(b)["text"] == "astral 𝔸 forces UTF-16"


def test_nested_containers_walk():
    inner = struct.pack("<HHI", 0, 0x0FA8, 5) + b"inner"
    mid = struct.pack("<HHI", 0x000F, 0x03EE, len(inner)) + inner
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(mid)) + mid
    blob = cfb.encode_cfb([("PowerPoint Document", doc)])
    assert ppt.ppt_text(blob)["text"] == "inner"


def test_hostile_loud():
    with pytest.raises(ValueError, match="PowerPoint Document"):
        ppt.ppt_text(cfb.encode_cfb([("WordDocument", b"\x00" * 64)]))
    overrun = struct.pack("<HHI", 0, 0x0FA8, 999) + b"xx"
    with pytest.raises(ValueError, match="overruns"):
        ppt.ppt_text(
            cfb.encode_cfb([("PowerPoint Document", overrun)])
        )
    # self-nesting bomb: a container whose payload is itself a
    # container, 40 deep
    atom = struct.pack("<HHI", 0, 0x0FA8, 1) + b"x"
    for _ in range(40):
        atom = struct.pack("<HHI", 0x000F, 0x03E8, len(atom)) + atom
    with pytest.raises(ValueError, match="deep"):
        ppt.ppt_text(cfb.encode_cfb([("PowerPoint Document", atom)]))


def test_encrypted_named():
    doc = struct.pack("<HHI", 0x000F, 0x2F14, 0)
    with pytest.raises(NotImplementedError, match="encrypted"):
        ppt.ppt_text(cfb.encode_cfb([("PowerPoint Document", doc)]))


def test_ppt_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, None],
            "payload": [ppt.encode_ppt(["s1", "s2"]), None],
        }
    )
    out = ppt.ppt_features(spark.createDataFrame(rows)).collect()
    assert len(out) == 1 and out[0]["text"] == "s1\ns2"
    assert out[0]["n_atoms"] == 2
