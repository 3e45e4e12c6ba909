"""Email extraction (sources/eml): RFC 5322/MIME messages and RFC
4155 mbox archives through the stdlib parser, with the corpus-shaped
contract — plain-body preference, HTML-only routing through the
boilerplate extractor, attachment hand-off, mboxrd quoting."""

import pytest

from timeseries_data_provider_spark.sources import eml


def test_multipart_prefers_plain_and_counts_attachments():
    b = eml.encode_eml(
        "Hello — naïve subject",
        "Line one.\nLine two.",
        html_body="<p>the html alternative is NOT the body</p>",
        attachments=[("a.bin", b"\x00\x01\x02")],
    )
    m = eml.eml_text(b)
    assert m["subject"] == "Hello — naïve subject"  # RFC 2047 path
    assert m["text"].rstrip("\n") == "Line one.\nLine two."
    assert m["n_attachments"] == 1 and m["n_parts"] == 3
    assert m["from_addr"] == "alice@example.com"
    assert eml.eml_attachments(b) == [("a.bin", b"\x00\x01\x02")]


def test_html_only_routes_through_boilerplate_extractor():
    from email.message import EmailMessage

    hm = EmailMessage()
    hm["Subject"] = "h"
    hm["From"] = "x@y"
    hm["To"] = "z@w"
    hm.set_content(
        "<html><body><p>Real paragraph with words here.</p>"
        "<div><a href='/a'>nav</a> <a href='/b'>nav</a></div>"
        "</body></html>",
        subtype="html",
    )
    m = eml.eml_text(hm.as_bytes())
    assert "Real paragraph" in m["text"]
    assert "nav" not in m["text"]  # link-dense block dropped


def test_mbox_split_and_mboxrd_quoting():
    msgs = [
        eml.encode_eml(f"s{i}", f"body {i}\nFrom the start of a line")
        for i in range(3)
    ]
    got = eml.mbox_messages(eml.encode_mbox(msgs))
    assert len(got) == 3
    for i, g in enumerate(got):
        m = eml.eml_text(g)
        assert m["subject"] == f"s{i}"
        # the body's 'From ' line was quoted on write and unquoted
        # exactly once on read
        assert m["text"].rstrip("\n") == (
            f"body {i}\nFrom the start of a line"
        )


def test_base64_and_charset_decode():
    raw = (
        b"Subject: =?iso-8859-1?q?caf=e9?=\r\n"
        b"From: a@b\r\nTo: c@d\r\n"
        b"Content-Type: text/plain; charset=iso-8859-1\r\n"
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        b"Y2Fm6SBhdSBsYWl0\r\n"
    )
    m = eml.eml_text(raw)
    assert m["subject"] == "café"
    assert m["text"].rstrip("\n") == "café au lait"


def test_hostile_loud_and_tolerant_headers():
    with pytest.raises(ValueError, match="header"):
        eml.eml_text(b"\x89PNG binary junk without headers")
    with pytest.raises(ValueError, match="From"):
        eml.mbox_messages(b"not an mbox")
    # a broken encoded-word degrades to the raw value, not a crash
    raw = b"Subject: =?bogus-charset?q?x?=\r\nFrom: a@b\r\n\r\nhi\r\n"
    m = eml.eml_text(raw)
    assert m["subject"] is not None and m["text"].rstrip("\n") == "hi"


def test_eml_and_mbox_features_spark(spark):
    import pandas as pd

    box = eml.encode_mbox(
        [eml.encode_eml(f"s{i}", f"b{i}") for i in range(4)]
    )
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, None],
            "payload": [eml.encode_eml("one", "body"), box, None],
        }
    )
    df = spark.createDataFrame(rows)
    single = eml.eml_features(df.where("doc_id = 1")).collect()
    assert len(single) == 1 and single[0]["subject"] == "one"
    many = (
        eml.mbox_features(df.where("doc_id = 2"))
        .orderBy("msg_idx")
        .collect()
    )
    assert [r["subject"] for r in many] == [f"s{i}" for i in range(4)]
    assert [r["msg_idx"] for r in many] == [0, 1, 2, 3]
