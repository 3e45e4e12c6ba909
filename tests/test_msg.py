"""Outlook .msg extraction (sources/msg): MAPI property streams over
the CFB walk — subject/from/to/body tags, attachment/recipient
counting, the RTF-compressed-only named gap."""

import pytest

from timeseries_data_provider_spark.sources import cfb, msg


def test_property_roundtrip_and_counts():
    b = msg.encode_msg(
        "Subj — naïve", "Body line.\r\nSecond.", n_attachments=2
    )
    m = msg.msg_text(b)
    assert m["subject"] == "Subj — naïve"
    assert m["text"] == "Body line.\nSecond."
    assert (m["from_name"], m["to"]) == ("Alice", "Bob")
    assert m["n_attachments"] == 2 and m["n_recipients"] == 0
    # the container routes as msg through cfb_kind too
    assert cfb.cfb_kind(b)["kind"] == "msg"


def test_8bit_string_type():
    # type 001E: 8-bit cp1252 strings (older writers)
    streams = [
        ("__substg1.0_0037001E", "caf\xe9".encode("cp1252")),
        ("__substg1.0_1000001E", b"plain body"),
        ("__properties_version1.0", b"\x00" * 32),
    ]
    m = msg.msg_text(cfb.encode_cfb(streams))
    assert m["subject"] == "café" and m["text"] == "plain body"


def test_rtf_only_body_decompresses_and_damage_is_loud():
    # the r11 named gap is CLOSED: a valid LZFu body extracts
    # (tests/test_lzfu.py covers parity with the plain-body twin);
    # a damaged PR_RTF_COMPRESSED stream raises lzfu's named error
    from timeseries_data_provider_spark.sources import lzfu, rtf

    streams = [
        ("__substg1.0_0037001F", "s".encode("utf-16-le")),
        (
            "__substg1.0_10090102",
            lzfu.lzfu_compress(rtf.encode_rtf(["via lzfu"])),
        ),
        ("__properties_version1.0", b"\x00" * 32),
    ]
    m = msg.msg_text(cfb.encode_cfb(streams))
    assert m["text"] == "via lzfu" and m["subject"] == "s"
    streams[1] = ("__substg1.0_10090102", b"\x00" * 16)
    with pytest.raises(ValueError, match="lzfu"):
        msg.msg_text(cfb.encode_cfb(streams))


def test_not_a_msg_loud():
    with pytest.raises(ValueError, match="MAPI"):
        msg.msg_text(cfb.encode_cfb([("WordDocument", b"\x00" * 64)]))


def test_msg_features_spark(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, None],
            "payload": [msg.encode_msg("s", "b"), None],
        }
    )
    out = msg.msg_features(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0]["subject"] == "s" and out[0]["text"] == "b"


def test_synth_msg_corpus_roundtrip(spark):
    # the q64 msg-column chain (r12 late): planted .msg whose body
    # exists ONLY as PR_RTF_COMPRESSED — CFB walk + MAPI decode +
    # LZFu + RTF parse round-trip the source text exactly
    docs = spark.createDataFrame(
        [(1, "Plain line."), (2, "Tabs\there — naïve 你好.\nTwo.")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in msg.msg_features(msg.synth_msg_corpus(docs)).collect()
    }
    assert rows[1]["subject"] == "Msg 1"
    assert rows[1]["text"] == "Plain line."
    assert rows[2]["text"] == "Tabs\there — naïve 你好.\nTwo."
    assert rows[2]["n_chars"] == len("Tabs\there — naïve 你好.\nTwo.")
