"""Unicode normalization + mojibake repair (operators/normalize).

Covers: cp1252 and latin-1 (C1-range) mojibake repair incl. the
double-encoded case, the no-false-positive rule on clean accented
text (hypothesis property), NFKC folding, control stripping (order:
AFTER repair), the was_changed flag, NULL passthrough, and the Spark
pass."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators import normalize as N


def _mojibake(s: str, codec: str = "cp1252") -> str:
    return s.encode("utf-8").decode(codec)


@pytest.mark.parametrize(
    "clean",
    ["café", "naïve", "über Größe", "日本語テキスト", "€100 — fine"],
)
def test_repair_roundtrip(clean):
    assert N.fix_mojibake(_mojibake(clean, "latin-1")) == clean


def test_cp1252_and_double_encoding():
    assert N.fix_mojibake("cafÃ©") == "café"
    twice = _mojibake(_mojibake("é"))
    assert N.fix_mojibake(twice) == "é"


def test_mixed_codec_damage_repaired():
    # ADVICE r9: one string mixing cp1252-decoded punctuation
    # (U+2019 from 0x92) with a raw C1 hole char (U+009D, one of the
    # five cp1252 holes a latin-1 decode leaves raw) must repair —
    # the old all-or-nothing two-codec fallback failed both encodes
    orig = "x\U0001D11Ey ’quoted’"  # 𝄞 = F0 9D 84 9E carries 0x9D
    moji = orig.encode("utf-8").decode("latin-1")
    # inject cp1252-style damage for the quotes alongside the raw C1s
    mixed = moji.replace("\x80\x99", "\u20ac\u2122")  # 0x80=€ 0x99=™
    assert "\x9d" in mixed and "\u2122" in mixed
    assert N.fix_mojibake(mixed) == orig


@settings(max_examples=80, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
        max_size=40,
    )
)
def test_no_false_positives_property(s):
    # the repair may only fire when a strict utf-8 decode SHRINKS the
    # text; repaired output is always a fixpoint
    out = N.fix_mojibake(s)
    assert N.fix_mojibake(out) == out
    if out != s:
        assert len(out) < len(s)


def test_nfkc_folding():
    assert N.normalize_text("ﬁle ①", form="NFKC") == "file 1"
    # NFC keeps compatibility characters
    assert N.normalize_text("ﬁle", form="NFC") == "ﬁle"


def test_clean_text_spark(spark):
    rows = [
        (1, "cafÃ© visit"),
        (2, "plain text"),
        (3, "ctrl\x00here\x1f!"),
        (4, None),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in N.clean_text(df).collect()
    }
    assert out[1]["text"] == "café visit" and out[1]["was_changed"]
    assert out[2]["text"] == "plain text" and not out[2]["was_changed"]
    assert out[3]["text"] == "ctrlhere!" and out[3]["was_changed"]
    assert out[4]["text"] is None and not out[4]["was_changed"]
    # other columns pass through
    assert set(out[1]) == {"doc_id", "text", "was_changed"}


def test_clean_text_whitespace_collapse(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["  a   b\t c  "]})
    )
    r = N.clean_text(df, collapse_whitespace=True).collect()[0]
    assert r["text"] == "a b c" and r["was_changed"]


def test_repair_precedes_control_strip(spark):
    # latin-1 mojibake of '€' contains a C1 char; stripping first
    # would destroy the repair evidence
    s = "€".encode("utf-8").decode("latin-1")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [s]})
    )
    assert N.clean_text(df).collect()[0]["text"] == "€"
